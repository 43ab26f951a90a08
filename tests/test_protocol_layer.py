"""Protocol layer tests: labels, message types, views, XML, PCAP(NG)."""

import array
import os
import struct
import tempfile

from urh_tpu.coding.encodings import Encoding, DECODING_INVERT
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.labels import (ChecksumLabel, FieldType, MessageType,
                                     Participant, ProtocolLabel, Rule, Ruleset, Mode)
from urh_tpu.protocol.message import Message


def test_message_type_labels():
    mt = MessageType("test")
    lbl = mt.add_protocol_label_start_length(0, 8, name="preamble",
                                             type=FieldType.from_caption("preamble"))
    assert lbl.is_preamble
    assert lbl.length == 8
    mt.add_protocol_label_start_length(8, 4, name="synchronization",
                                       type=FieldType.from_caption("synchronization"))
    assert mt.num_labels_with_type(FieldType.Function.SYNC) == 1
    assert mt.get_first_label_with_type(FieldType.Function.PREAMBLE).name == "preamble"
    assert mt.unlabeled_ranges == [(12, None)]


def test_checksum_label():
    from urh_tpu.coding.crc import GenericCRC

    mt = MessageType("c")
    ft = FieldType("checksum", FieldType.Function.CHECKSUM)
    lbl = mt.add_protocol_label_start_length(24, 8, name="checksum", type=ft)
    assert isinstance(lbl, ChecksumLabel)
    lbl.checksum = GenericCRC(polynomial="8_ccitt")
    lbl.data_ranges = [[0, 24]]

    msg = Message.from_plain_bits_str("1010101011110000110011000000000")
    msg.message_type = mt
    calculated = lbl.calculate_checksum_for_message(msg, use_decoded_bits=False)
    assert len(calculated) == 8


def test_ruleset():
    msg = Message.from_plain_bits_str("10101010111100001100110000000000")
    r = Rule(start=0, end=7, operator="=", target_value="10101010", value_type=0)
    rs = Ruleset(Mode.all_apply, [r])
    assert rs.applies_for_message(msg)
    r2 = Rule(start=0, end=7, operator="!=", target_value="10101010", value_type=0)
    assert not Ruleset(Mode.all_apply, [r, r2]).applies_for_message(msg)
    assert Ruleset(Mode.atleast_one_applies, [r, r2]).applies_for_message(msg)
    assert not Ruleset(Mode.none_applies, [r, r2]).applies_for_message(msg)


def test_message_views_and_alignment():
    msg = Message.from_plain_bits_str("101010101111")
    assert msg.plain_hex_str == "aaf"
    assert len(msg.plain_ascii_str) == 2

    # label alignment splits hex view at label boundaries
    mt = MessageType("t")
    mt.add_protocol_label_start_length(0, 6, name="head")
    msg.message_type = mt
    assert msg.plain_hex_str == "a8f0"[:len(msg.plain_hex_str)] or len(msg.plain_hex_str) == 4


def test_label_aware_decoding():
    e = Encoding(["inv", DECODING_INVERT])
    msg = Message.from_plain_bits_str("11110000")
    msg.decoder = e
    assert msg.decoded_bits_str == "00001111"
    # exclude a label range from decoding
    mt = MessageType("t")
    lbl = mt.add_protocol_label_start_length(0, 4, name="keep")
    lbl.apply_decoding = False
    msg.message_type = mt
    msg.clear_decoded_bits()
    assert msg.decoded_bits_str == "11111111"  # first 4 bits pass through raw


def test_analyzer_xml_roundtrip():
    pa = ProtocolAnalyzer(None, filename="test.proto.xml")
    pa.messages.append(Message.from_plain_bits_str("10101010111100001111", pause=1000))
    pa.messages.append(Message.from_plain_bits_str("10101010000011110000", pause=500))
    mt = pa.default_message_type
    mt.add_protocol_label_start_length(0, 8, name="preamble",
                                       type=FieldType.from_caption("preamble"))
    for m in pa.messages:
        m.message_type = mt

    participants = [Participant("Alice", "A"), Participant("Bob", "B")]
    pa.messages[0].participant = participants[0]
    decodings = [Encoding(["NRZ"]), Encoding(["inv", DECODING_INVERT])]

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "proto.xml")
        pa.to_xml_file(path, decoders=decodings, participants=participants, write_bits=True)

        pa2 = ProtocolAnalyzer(None, filename="x")
        pa2.from_xml_file(path, read_bits=True)
        assert len(pa2.messages) == 2
        assert pa2.messages[0].plain_bits_str == "10101010111100001111"
        assert pa2.messages[0].pause == 1000
        assert any(len(mt2) == 1 for mt2 in pa2.message_types)


def test_pcapng_export():
    pa = ProtocolAnalyzer(None, filename="x")
    pa.messages.append(Message.from_plain_bits_str("0100000101000010", pause=0))  # "AB"
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.pcapng")
        pa.to_pcapng(path)
        blob = open(path, "rb").read()
        # SHB magic
        assert struct.unpack(">I", blob[:4])[0] == 0x0A0D0D0A
        assert b"AB" in blob


def test_protocol_from_string():
    pa = ProtocolAnalyzer.get_protocol_from_string(["101010/1ms", "11110000"],
                                                   sample_rate=1e6)
    assert len(pa.messages) == 2
    assert pa.messages[0].pause == 1000
    # hex autodetect
    pa = ProtocolAnalyzer.get_protocol_from_string(["abcd"])
    assert pa.messages[0].plain_bits_str == "1010101111001101"


def test_align_messages():
    pa = ProtocolAnalyzer(None, filename="x")
    pa.messages.append(Message.from_plain_bits_str("0011010111"))
    pa.messages.append(Message.from_plain_bits_str("11010111"))
    pa.align_messages("1101", view_type=0)
    assert pa.messages[0].alignment_offset == 0
    assert pa.messages[1].alignment_offset == 2


def test_load_reference_protocol_xml_with_message_types():
    """protocol.proto.xml (2 message types, 18 labeled messages) loads
    with bits, types and label assignments intact."""
    from tests.golden import get_path_for_data_file

    path = get_path_for_data_file("protocol.proto.xml")
    pa = ProtocolAnalyzer(None, filename=path)
    pa.from_xml_file(path, read_bits=True)
    assert len(pa.messages) == 18
    assert len(pa.message_types) == 2
    assert str(pa.messages[0]).startswith("10101010101010101010101010101010")
