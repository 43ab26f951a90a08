"""Port of reference tests/awre/test_address_engine.py: address inference
from participant-clustered hex vectors (LCS-based candidate mining)."""

import random

import pytest

from urh_tpu.awre.engines.address import AddressEngine
from urh_tpu.awre.format_finder import FormatFinder
from urh_tpu.awre.message_type_builder import MessageTypeBuilder
from urh_tpu.awre.protocol_generator import ProtocolGenerator
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.labels import FieldType, MessageType, Participant
from urh_tpu.util.misc import convert_numbers_to_hex_string

from tests.golden import get_path_for_data_file


def clear_message_types(messages):
    mt = MessageType("empty")
    for msg in messages:
        msg.message_type = mt


@pytest.fixture
def alice():
    return Participant("Alice", "A", address_hex="1234")


@pytest.fixture
def bob():
    return Participant("Bob", "B", address_hex="cafe")


def test_one_participant(alice):
    """Single participant: no addresses can or should be inferred."""
    mb = MessageTypeBuilder("simple_address_test")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.SRC_ADDRESS, 16)

    pg = ProtocolGenerator([mb.message_type],
                           syncs_by_mt={mb.message_type: "0x9a9d"},
                           participants=[alice])
    for data_length, num_messages in {8: 5, 16: 10, 32: 15}.items():
        for i in range(num_messages):
            pg.generate_message(data=pg.decimal_to_bits(22 * i, data_length),
                                source=alice)
    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    address_engine = AddressEngine(ff.hexvectors, ff.participant_indices)
    assert len(address_engine.find_addresses()) == 0


def test_two_participants(alice, bob):
    mb = MessageTypeBuilder("address_two_participants")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.SRC_ADDRESS, 16)
    mb.add_label(FieldType.Function.DST_ADDRESS, 16)

    pg = ProtocolGenerator([mb.message_type],
                           syncs_by_mt={mb.message_type: "0x9a9d"},
                           participants=[alice, bob])
    for i in range(50):
        if i % 2 == 0:
            source, destination, data_length = alice, bob, 8
        else:
            source, destination, data_length = bob, alice, 16
        pg.generate_message(data=pg.decimal_to_bits(4 * i, data_length),
                            source=source, destination=destination)

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    address_engine = AddressEngine(ff.hexvectors, ff.participant_indices)
    address_dict = address_engine.find_addresses()
    assert len(address_dict) == 2
    addresses_1 = list(map(convert_numbers_to_hex_string, address_dict[0]))
    addresses_2 = list(map(convert_numbers_to_hex_string, address_dict[1]))
    for addr in (alice.address_hex, bob.address_hex):
        assert addr in addresses_1
        assert addr in addresses_2

    ff.known_participant_addresses.clear()
    ff.perform_iteration()
    assert len(ff.known_participant_addresses) == 2
    found = list(map(bytes, ff.known_participant_addresses.values()))
    assert bytes([int(h, 16) for h in alice.address_hex]) in found
    assert bytes([int(h, 16) for h in bob.address_hex]) in found

    assert len(ff.message_types) == 1
    mt = ff.message_types[0]
    dst = mt.get_first_label_with_type(FieldType.Function.DST_ADDRESS)
    assert (dst.start, dst.length) == (32, 16)
    src = mt.get_first_label_with_type(FieldType.Function.SRC_ADDRESS)
    assert (src.start, src.length) == (48, 16)


def _ack_protocol(alice, bob, with_type=False):
    mb = MessageTypeBuilder("data")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    if with_type:
        mb.add_label(FieldType.Function.TYPE, 8)
    mb.add_label(FieldType.Function.DST_ADDRESS, 16)
    mb.add_label(FieldType.Function.SRC_ADDRESS, 16)
    mb_ack = MessageTypeBuilder("ack")
    mb_ack.add_label(FieldType.Function.PREAMBLE, 8)
    mb_ack.add_label(FieldType.Function.SYNC, 16)
    mb_ack.add_label(FieldType.Function.LENGTH, 8)
    mb_ack.add_label(FieldType.Function.DST_ADDRESS, 16)

    pg = ProtocolGenerator(
        [mb.message_type, mb_ack.message_type],
        syncs_by_mt={mb.message_type: "0x6768", mb_ack.message_type: "0x6768"},
        participants=[alice, bob])
    random.seed(0)
    for i in range(50):
        if i % 2 == 0:
            source, destination, data_length = alice, bob, 8
        else:
            source, destination, data_length = bob, alice, 16
        pg.generate_message(
            data=pg.decimal_to_bits(random.randint(0, 2 ** (data_length - 1)),
                                    data_length),
            source=source, destination=destination)
        pg.generate_message(data="", message_type=mb_ack.message_type,
                            destination=source, source=destination)
    return pg


def test_two_participants_with_ack_messages(alice, bob):
    pg = _ack_protocol(alice, bob)
    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    address_engine = AddressEngine(ff.hexvectors, ff.participant_indices)
    address_dict = address_engine.find_addresses()
    assert len(address_dict) == 2
    addresses_1 = list(map(convert_numbers_to_hex_string, address_dict[0]))
    addresses_2 = list(map(convert_numbers_to_hex_string, address_dict[1]))
    for addr in (alice.address_hex, bob.address_hex):
        assert addr in addresses_1
        assert addr in addresses_2

    ff.known_participant_addresses.clear()
    ff.perform_iteration()
    assert len(ff.message_types) == 2
    mt = ff.message_types[1]
    dst = mt.get_first_label_with_type(FieldType.Function.DST_ADDRESS)
    assert (dst.start, dst.length) == (32, 16)
    src = mt.get_first_label_with_type(FieldType.Function.SRC_ADDRESS)
    assert (src.start, src.length) == (48, 16)
    mt = ff.message_types[0]
    dst = mt.get_first_label_with_type(FieldType.Function.DST_ADDRESS)
    assert (dst.start, dst.length) == (32, 16)


def test_two_participants_with_ack_messages_and_type(alice, bob):
    pg = _ack_protocol(alice, bob, with_type=True)
    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    address_engine = AddressEngine(ff.hexvectors, ff.participant_indices)
    address_dict = address_engine.find_addresses()
    assert len(address_dict) == 2

    ff.known_participant_addresses.clear()
    ff.perform_iteration()
    assert len(ff.message_types) == 2
    mt = ff.message_types[1]
    dst = mt.get_first_label_with_type(FieldType.Function.DST_ADDRESS)
    assert (dst.start, dst.length) == (40, 16)
    src = mt.get_first_label_with_type(FieldType.Function.SRC_ADDRESS)
    assert (src.start, src.length) == (56, 16)
    mt = ff.message_types[0]
    dst = mt.get_first_label_with_type(FieldType.Function.DST_ADDRESS)
    assert (dst.start, dst.length) == (32, 16)


def test_three_participants_with_ack():
    alice = Participant("Alice", address_hex="1337")
    bob = Participant("Bob", address_hex="4711")
    carl = Participant("Carl", address_hex="cafe")

    mb = MessageTypeBuilder("data")
    mb.add_label(FieldType.Function.PREAMBLE, 16)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.SRC_ADDRESS, 16)
    mb.add_label(FieldType.Function.DST_ADDRESS, 16)
    mb.add_label(FieldType.Function.SEQUENCE_NUMBER, 16)
    mb_ack = MessageTypeBuilder("ack")
    mb_ack.add_label(FieldType.Function.PREAMBLE, 16)
    mb_ack.add_label(FieldType.Function.SYNC, 16)
    mb_ack.add_label(FieldType.Function.LENGTH, 8)
    mb_ack.add_label(FieldType.Function.DST_ADDRESS, 16)

    pg = ProtocolGenerator(
        [mb.message_type, mb_ack.message_type],
        syncs_by_mt={mb.message_type: "0x9a7d", mb_ack.message_type: "0x9a7d"},
        preambles_by_mt={mb.message_type: "10" * 8, mb_ack.message_type: "10" * 8},
        participants=[alice, bob, carl])

    random.seed(0)
    i = -1
    while len(pg.protocol.messages) < 20:
        i += 1
        source = pg.participants[i % len(pg.participants)]
        destination = pg.participants[(i + 1) % len(pg.participants)]
        data_bytes = 8 if i % 2 == 0 else 16
        data = "".join(random.choice("01") for _ in range(data_bytes * 8))
        pg.generate_message(data=data, source=source, destination=destination)
        if "ack" in (mt.name for mt in pg.protocol.message_types):
            pg.generate_message(message_type=1, data="", source=destination,
                                destination=source)

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    ff.known_participant_addresses.clear()
    ff.run()

    # ACKs let the engine assign addresses to participants IN ORDER
    assert convert_numbers_to_hex_string(ff.known_participant_addresses[0]) == "1337"
    assert convert_numbers_to_hex_string(ff.known_participant_addresses[1]) == "4711"
    assert convert_numbers_to_hex_string(ff.known_participant_addresses[2]) == "cafe"


def test_protocol_with_acks_and_checksum():
    proto_file = get_path_for_data_file("ack_frames_with_crc.proto.xml")
    protocol = ProtocolAnalyzer(signal=None, filename=proto_file)
    protocol.from_xml_file(filename=proto_file, read_bits=True)
    clear_message_types(protocol.messages)

    ff = FormatFinder(protocol.messages)
    ff.known_participant_addresses.clear()
    ff.run()
    assert convert_numbers_to_hex_string(ff.known_participant_addresses[0]) == "1337"
    assert convert_numbers_to_hex_string(ff.known_participant_addresses[1]) == "4711"

    for mt in ff.message_types:
        preamble = mt.get_first_label_with_type(FieldType.Function.PREAMBLE)
        assert (preamble.start, preamble.length) == (0, 16)
        sync = mt.get_first_label_with_type(FieldType.Function.SYNC)
        assert (sync.start, sync.length) == (16, 16)
        length = mt.get_first_label_with_type(FieldType.Function.LENGTH)
        assert (length.start, length.length) == (32, 8)


def test_address_engine_on_35_messages():
    proto_file = get_path_for_data_file("35_messages.proto.xml")
    protocol = ProtocolAnalyzer(signal=None, filename=proto_file)
    protocol.from_xml_file(filename=proto_file, read_bits=True)
    clear_message_types(protocol.messages)
    ff = FormatFinder(protocol.messages)
    engine = AddressEngine(ff.hexvectors, ff.participant_indices)
    engine.find()  # smoke: must terminate without error
