"""Port of reference tests/test_fuzzing_profile.py (headless: the GUI
drag-drop load path is replaced by ProtocolAnalyzerContainer.from_xml_file)."""

import os
import tempfile

from urh_tpu.coding.encodings import Encoding
from urh_tpu.dsp.modulator import Modulator
from urh_tpu.protocol.container import ProtocolAnalyzerContainer
from urh_tpu.protocol.message import Message
from urh_tpu.util import settings


def test_load_profile(tmp_path):
    filename = str(tmp_path / "test.fuzz.xml")
    mod = Modulator("mod 2")
    mod.parameters[1] = 42

    decoders = [Encoding(["NRZ"]), Encoding(["NRZ-I", settings.DECODING_INVERT])]

    pac = ProtocolAnalyzerContainer()
    pac.messages.append(Message([True, False, False, True], 100,
                                decoder=decoders[0],
                                message_type=pac.default_message_type))
    pac.messages.append(Message([False, False, False, False], 200,
                                decoder=decoders[1],
                                message_type=pac.default_message_type))
    pac.create_fuzzing_label(1, 10, 0)
    pac.to_xml_file(filename, decoders=decoders, participants=[])

    loaded = ProtocolAnalyzerContainer()
    loaded.from_xml_file(filename)

    assert len(loaded.messages) == 2
    assert loaded.messages[1][0] == False  # noqa: E712
    assert len(loaded.protocol_labels) == 1

    os.path.exists(filename)
