"""awre on real-world captures (port of tests/awre/test_awre_real_protocols.py)."""

import numpy as np

from urh_tpu.awre.format_finder import FormatFinder
from urh_tpu.awre.preprocessor import Preprocessor
from urh_tpu.awre.protocol_generator import ProtocolGenerator
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.labels import FieldType
from urh_tpu.protocol.message import Message

from tests.golden import get_path_for_data_file


def test_format_finding_enocean():
    enocean_protocol = ProtocolAnalyzer(None, filename="x")
    with open(get_path_for_data_file("enocean_bits.txt")) as f:
        for line in f:
            enocean_protocol.messages.append(Message.from_plain_bits_str(line.strip()))
            enocean_protocol.messages[-1].message_type = enocean_protocol.default_message_type

    ff = FormatFinder(enocean_protocol.messages)
    ff.perform_iteration()

    message_types = ff.message_types
    assert len(message_types) == 1

    preamble = message_types[0].get_first_label_with_type(FieldType.Function.PREAMBLE)
    assert preamble.start == 0
    assert preamble.length == 8

    sync = message_types[0].get_first_label_with_type(FieldType.Function.SYNC)
    assert sync.start == 8
    assert sync.length == 4

    checksum = message_types[0].get_first_label_with_type(FieldType.Function.CHECKSUM)
    assert checksum.start == 56
    assert checksum.length == 4

    for function in (FieldType.Function.SRC_ADDRESS, FieldType.Function.DST_ADDRESS,
                     FieldType.Function.LENGTH, FieldType.Function.SEQUENCE_NUMBER):
        assert message_types[0].get_first_label_with_type(function) is None


def test_rwe_sync_detection():
    proto_file = get_path_for_data_file("rwe.proto.xml")
    protocol = ProtocolAnalyzer(None, filename=proto_file)
    protocol.from_xml_file(filename=proto_file, read_bits=True)

    preprocessor = Preprocessor([np.array(msg.plain_bits, dtype=np.uint8)
                                 for msg in protocol.messages])
    possible_syncs = preprocessor.find_possible_syncs()
    assert ProtocolGenerator.to_bits("0x9a7d9a7d") in possible_syncs
    assert ProtocolGenerator.to_bits("0x67686768") in possible_syncs


def test_format_finding_homematic():
    """Port of tests/awre/test_awre_real_protocols.py:132-186 (homematic):
    one FormatFinder iteration recovers the BidCoS field layout."""
    proto_file = get_path_for_data_file("homematic.proto.xml")
    protocol = ProtocolAnalyzer(signal=None, filename=proto_file)
    protocol.message_types = []
    protocol.from_xml_file(filename=proto_file, read_bits=True)
    from urh_tpu.protocol.labels import MessageType
    protocol.message_types = [MessageType("Default")]

    participants = sorted({msg.participant for msg in protocol.messages})
    for msg in protocol.messages:
        msg.message_type = protocol.default_message_type

    ff = FormatFinder(protocol.messages, participants=participants)
    ff.known_participant_addresses.clear()
    ff.perform_iteration()
    assert len(ff.message_types) > 0

    for message_type in ff.message_types:
        preamble = message_type.get_first_label_with_type(FieldType.Function.PREAMBLE)
        assert (preamble.start, preamble.length) == (0, 32)
        sync = message_type.get_first_label_with_type(FieldType.Function.SYNC)
        assert (sync.start, sync.length) == (32, 32)
        length = message_type.get_first_label_with_type(FieldType.Function.LENGTH)
        assert (length.start, length.length) == (64, 8)
        seq = message_type.get_first_label_with_type(FieldType.Function.SEQUENCE_NUMBER)
        assert (seq.start, seq.length) == (72, 8)
        src = message_type.get_first_label_with_type(FieldType.Function.SRC_ADDRESS)
        assert (src.start, src.length) == (96, 24)
        dst = message_type.get_first_label_with_type(FieldType.Function.DST_ADDRESS)
        assert (dst.start, dst.length) == (120, 24)
