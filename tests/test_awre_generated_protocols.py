"""Port of reference tests/awre/test_generated_protocols.py: FormatFinder
end-to-end field recovery on synthesized and recorded protocol files."""

import numpy as np
import pytest

from urh_tpu.awre import auto_assigner as AutoAssigner
from urh_tpu.awre.format_finder import FormatFinder
from urh_tpu.awre.message_type_builder import MessageTypeBuilder
from urh_tpu.awre.preprocessor import Preprocessor
from urh_tpu.awre.protocol_generator import ProtocolGenerator
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.labels import FieldType, MessageType, Participant
from urh_tpu.util.misc import convert_numbers_to_hex_string

from tests.golden import get_path_for_data_file


def clear_message_types(messages):
    mt = MessageType("empty")
    for msg in messages:
        msg.message_type = mt


def get_format_finder_from_protocol_file(filename, clear_participant_addresses=True,
                                         return_messages=False):
    proto_file = get_path_for_data_file(filename)
    protocol = ProtocolAnalyzer(signal=None, filename=proto_file)
    protocol.from_xml_file(filename=proto_file, read_bits=True)
    clear_message_types(protocol.messages)
    ff = FormatFinder(protocol.messages)
    if clear_participant_addresses:
        ff.known_participant_addresses.clear()
    return (ff, protocol.messages) if return_messages else ff


def check_addresses(messages, format_finder, known_participant_addresses):
    """Assign message types from the finder, then re-derive addresses with
    the AutoAssigner and compare against ground truth."""
    for msg_type, indices in format_finder.existing_message_types.items():
        for i in indices:
            messages[i].message_type = msg_type
    participants = list(set(m.participant for m in messages))
    for p in participants:
        p.address_hex = ""
    AutoAssigner.auto_assign_participant_addresses(messages, participants)
    expected = list(map(convert_numbers_to_hex_string,
                        known_participant_addresses.values()))
    for p in participants:
        assert p.address_hex in expected, [q.address_hex for q in participants]


def _assert_standard_fields(mt):
    sync = mt.get_first_label_with_type(FieldType.Function.SYNC)
    assert (sync.start, sync.length) == (0, 16)
    length = mt.get_first_label_with_type(FieldType.Function.LENGTH)
    assert (length.start, length.length) == (16, 8)
    src = mt.get_first_label_with_type(FieldType.Function.SRC_ADDRESS)
    assert (src.start, src.length) == (24, 8)
    seq = mt.get_first_label_with_type(FieldType.Function.SEQUENCE_NUMBER)
    assert (seq.start, seq.length) == (32, 8)


def test_without_preamble():
    alice = Participant("Alice", address_hex="24")
    broadcast = Participant("Broadcast", address_hex="ff")

    mb = MessageTypeBuilder("data")
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.SRC_ADDRESS, 8)
    mb.add_label(FieldType.Function.SEQUENCE_NUMBER, 8)

    pg = ProtocolGenerator([mb.message_type],
                           syncs_by_mt={mb.message_type: "0x8e88"},
                           preambles_by_mt={mb.message_type: "10" * 8},
                           participants=[alice, broadcast])
    for i in range(20):
        data_bits = 16 if i % 2 == 0 else 32
        source = pg.participants[i % 2]
        destination = pg.participants[(i + 1) % 2]
        pg.generate_message(data="1010" * (data_bits // 4), source=source,
                            destination=destination)

    clear_message_types(pg.messages)
    ff = FormatFinder(pg.messages)
    ff.known_participant_addresses.clear()
    ff.run()
    assert len(ff.message_types) == 1
    _assert_standard_fields(ff.message_types[0])


def test_without_preamble_random_data():
    ff = get_format_finder_from_protocol_file("without_ack_random_data.proto.xml")
    ff.run()
    assert len(ff.message_types) == 1
    _assert_standard_fields(ff.message_types[0])


def test_without_preamble_random_data2():
    ff = get_format_finder_from_protocol_file("without_ack_random_data2.proto.xml")
    ff.run()
    assert len(ff.message_types) == 1
    _assert_standard_fields(ff.message_types[0])


def test_with_checksum():
    ff = get_format_finder_from_protocol_file("with_checksum.proto.xml",
                                              clear_participant_addresses=False)
    known = {k: np.array(v) for k, v in ff.known_participant_addresses.items()}
    ff.known_participant_addresses.clear()
    ff.run()
    found = list(map(bytes, map(np.asarray, ff.known_participant_addresses.values())))
    assert bytes(known[0]) in found
    assert bytes(known[1]) in found
    assert len(ff.message_types) == 3


def test_with_only_one_address():
    ff = get_format_finder_from_protocol_file("only_one_address.proto.xml",
                                              clear_participant_addresses=False)
    known = {k: np.array(v) for k, v in ff.known_participant_addresses.items()}
    ff.known_participant_addresses.clear()
    ff.run()
    found = list(map(bytes, map(np.asarray, ff.known_participant_addresses.values())))
    assert bytes(known[0]) in found
    assert bytes(known[1]) in found


def test_with_four_broken():
    ff, messages = get_format_finder_from_protocol_file(
        "four_broken.proto.xml", clear_participant_addresses=False,
        return_messages=True)
    known = {k: np.array(v) for k, v in ff.known_participant_addresses.items()}
    ff.known_participant_addresses.clear()
    ff.run()
    check_addresses(messages, ff, known)
    for i in range(4, len(messages)):
        mt = next(mt for mt, indices in ff.existing_message_types.items()
                  if i in indices)
        assert mt.get_first_label_with_type(
            FieldType.Function.SEQUENCE_NUMBER) is not None


def test_with_one_address_one_message_type():
    ff, messages = get_format_finder_from_protocol_file(
        "one_address_one_mt.proto.xml", clear_participant_addresses=False,
        return_messages=True)
    assert len(messages) == 17
    assert len(ff.hexvectors) == 17
    known = {k: np.array(v) for k, v in ff.known_participant_addresses.items()}
    ff.known_participant_addresses.clear()
    ff.run()
    assert len(ff.message_types) == 1
    found = list(map(bytes, map(np.asarray, ff.known_participant_addresses.values())))
    assert bytes(known[0]) in found
    assert bytes(known[1]) in found


def test_without_preamble_24_messages():
    ff, messages = get_format_finder_from_protocol_file(
        "no_preamble24.proto.xml", clear_participant_addresses=False,
        return_messages=True)
    known = {k: np.array(v) for k, v in ff.known_participant_addresses.items()}
    ff.known_participant_addresses.clear()
    ff.run()
    assert len(ff.message_types) == 1
    found = list(map(bytes, map(np.asarray, ff.known_participant_addresses.values())))
    assert bytes(known[0]) in found
    assert bytes(known[1]) in found


def test_with_three_syncs_different_preamble_lengths():
    ff, messages = get_format_finder_from_protocol_file("three_syncs.proto.xml",
                                                        return_messages=True)
    preprocessor = Preprocessor(ff.get_bitvectors_from_messages(messages))
    sync_words = preprocessor.find_possible_syncs()
    assert "0000010000100000" in sync_words
    assert "0010001000100010" in sync_words
    assert "0110011101100111" in sync_words

    ff.run()
    expected_sync_ends = [32, 24, 40, 24, 32, 24, 40, 24,
                          32, 24, 40, 24, 32, 24, 40, 24]
    assert list(ff.sync_ends)[:len(expected_sync_ends)] == expected_sync_ends


def test_with_four_participants():
    ff, messages = get_format_finder_from_protocol_file(
        "four_participants.proto.xml", clear_participant_addresses=False,
        return_messages=True)
    known = {k: np.array(v) for k, v in ff.known_participant_addresses.items()}
    ff.known_participant_addresses.clear()
    ff.run()
    check_addresses(messages, ff, known)
    assert len(ff.message_types) == 3
