"""Headless port of reference tests/test_generator.py::test_generation:
demodulate a capture, decode NRZ-I, re-encode + remodulate through the
generator backend, and demodulate the generated file again."""

import numpy as np
import pytest

from urh_tpu import DemodParams, ProtocolAnalyzer, Signal
from urh_tpu.coding.encodings import Encoding
from urh_tpu.dsp.modulator import Modulator
from urh_tpu.protocol.container import ProtocolAnalyzerContainer
from urh_tpu.protocol.generator import GeneratorBackend
from urh_tpu.util import settings

from tests.golden import REF_DATA, get_path_for_data_file

PROTO = "1011001001011011011011011011011011001000000"


@pytest.mark.skipif(REF_DATA is None, reason="reference test data not available")
def test_generation(tmp_path):
    # 1) load signal, ASK sps=300 center=0.032
    signal = Signal.from_file(get_path_for_data_file("ask.complex"))
    signal.params.modulation = "ASK"
    signal.params.samples_per_symbol = 300
    signal.params.center = 0.032
    proto = ProtocolAnalyzer(signal)
    proto.get_protocol_from_signal()
    assert proto.plain_bits_str[0].startswith(PROTO)

    # 2) NRZ-I decoding inverts every bit
    nrzi = Encoding(["NRZ-I", settings.DECODING_INVERT])
    for msg in proto.messages:
        msg.decoder = nrzi
    proto_inv = proto.decoded_proto_bits_str[0]
    assert all(a != b for a, b in zip(PROTO, proto_inv))

    # 3) move to generator: container keeps the decoded view; encoded_bits
    #    re-applies the encoding for transmission
    container = ProtocolAnalyzerContainer()
    container.insert_protocol_analyzer(0, proto)
    assert "".join(map(str, container.messages[0].plain_bits[:len(PROTO)])) == \
        proto_inv[:len(PROTO)]
    container.messages[0].pause = 0

    # 4) generate the data file
    modulator = Modulator("gen")
    modulator.modulation_type = "ASK"
    modulator.samples_per_symbol = 300
    gen = GeneratorBackend(container, [modulator])
    buffer = gen.prepare_modulation_buffer(gen.total_modulated_samples)
    modulated = gen.modulate_data(buffer)
    filename = str(tmp_path / "test_generator.complex")
    modulated.tofile(filename)

    # 5) reload and re-demodulate (sps=295, center=0.1, tolerance=6, noise=0)
    gen_signal = Signal.from_file(filename)
    assert gen_signal.num_samples == 300 * len(PROTO)
    gen_signal.params = DemodParams(modulation="ASK", samples_per_symbol=295,
                                    center=0.1, tolerance=6, noise_threshold=0)
    gen_proto = ProtocolAnalyzer(gen_signal)
    gen_proto.get_protocol_from_signal()
    assert len(gen_proto.messages) == 1
    gen_bits = gen_proto.plain_bits_str[0]
    assert PROTO.startswith(gen_bits)
