"""awre (automatic protocol reverse engineering) tests.

Ports of the key assertions from the reference's tests/awre/ suite:
engines must recover fields from generated labeled protocols.
"""

import random

import numpy as np
import pytest

from urh_tpu.awre.engines.checksum import ChecksumEngine
from urh_tpu.awre.engines.length import LengthEngine
from urh_tpu.awre.engines.sequence_number import SequenceNumberEngine
from urh_tpu.awre.format_finder import FormatFinder
from urh_tpu.awre.message_type_builder import MessageTypeBuilder
from urh_tpu.awre.protocol_generator import ProtocolGenerator
from urh_tpu.coding.crc import GenericCRC
from urh_tpu.coding.encodings import hex2bit
from urh_tpu.protocol.labels import FieldType, MessageType, Participant


def clear_message_types(messages):
    mt = MessageType("empty")
    for msg in messages:
        msg.message_type = mt


# ---------------------------------------------------------------------------
# checksum engine
# ---------------------------------------------------------------------------


def test_find_crc8():
    messages = ["aabbcc7d", "abcdee24", "dacafe33"]
    message_bits = [np.array(hex2bit(msg), dtype=np.uint8) for msg in messages]

    result = ChecksumEngine(message_bits, n_gram_length=8).find()
    assert len(result) == 1
    checksum_range = result[0]
    assert checksum_range.length == 8
    assert checksum_range.start == 24

    reference = GenericCRC()
    reference.set_polynomial_from_hex("0x07")
    assert checksum_range.crc.polynomial == reference.polynomial
    assert checksum_range.message_indices == {0, 1, 2}


def test_find_crc16():
    messages = ["12345678347B", "abcdefffABBD", "cafe1337CE12"]
    message_bits = [np.array(hex2bit(msg), dtype=np.uint8) for msg in messages]

    result = ChecksumEngine(message_bits, n_gram_length=8).find()
    assert len(result) == 1
    checksum_range = result[0]
    assert checksum_range.start == 32
    assert checksum_range.length == 16

    reference = GenericCRC()
    reference.set_polynomial_from_hex("0x8005")
    assert checksum_range.crc.polynomial == reference.polynomial
    assert checksum_range.message_indices == {0, 1, 2}


def test_find_crc32():
    messages = ["deadcafe5D7F3F5A", "47111337E3319242", "beefaffe0DCD0E15"]
    message_bits = [np.array(hex2bit(msg), dtype=np.uint8) for msg in messages]

    result = ChecksumEngine(message_bits, n_gram_length=8).find()
    assert len(result) == 1
    checksum_range = result[0]
    assert checksum_range.start == 32
    assert checksum_range.length == 32

    reference = GenericCRC()
    reference.set_polynomial_from_hex("0x04C11DB7")
    assert checksum_range.crc.polynomial == reference.polynomial
    assert checksum_range.message_indices == {0, 1, 2}


def test_checksum_in_generated_protocol():
    mb = MessageTypeBuilder("data")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.DATA, 32)
    mb.add_checksum_label(16, GenericCRC.from_standard_checksum("CRC16 CCITT"))

    mb2 = MessageTypeBuilder("data2")
    mb2.add_label(FieldType.Function.PREAMBLE, 8)
    mb2.add_label(FieldType.Function.SYNC, 16)
    mb2.add_label(FieldType.Function.LENGTH, 8)
    mb2.add_label(FieldType.Function.DATA, 16)
    mb2.add_checksum_label(16, GenericCRC.from_standard_checksum("CRC16 CCITT"))

    pg = ProtocolGenerator(
        [mb.message_type, mb2.message_type],
        syncs_by_mt={mb.message_type: "0x1234", mb2.message_type: "0x1234"},
    )
    for i in range(5):
        pg.generate_message(data="{0:032b}".format(i), message_type=mb.message_type)
        pg.generate_message(data="{0:016b}".format(i), message_type=mb2.message_type)

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    ff.run()

    assert len(ff.message_types) == 2
    for mt in ff.message_types:
        checksum_label = mt.get_first_label_with_type(FieldType.Function.CHECKSUM)
        assert checksum_label.length == 16
        assert checksum_label.checksum.caption == "CRC16 CCITT"


# ---------------------------------------------------------------------------
# length engine
# ---------------------------------------------------------------------------


def test_length_simple_protocol():
    mb = MessageTypeBuilder("simple_length_test")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)

    num_messages_by_data_length = {8: 5, 16: 10, 32: 15}
    pg = ProtocolGenerator([mb.message_type], syncs_by_mt={mb.message_type: "0x9a9d"})
    random.seed(0)
    for data_length, num_messages in num_messages_by_data_length.items():
        for _ in range(num_messages):
            pg.generate_message(data="".join(random.choice(["0", "1"]) for _ in range(data_length)))

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)

    length_engine = LengthEngine(ff.bitvectors)
    highscored_ranges = length_engine.find(n_gram_length=8)
    assert len(highscored_ranges) == 3

    ff.perform_iteration()
    assert len(ff.message_types) == 1
    assert len(ff.message_types[0]) > 0
    label = ff.message_types[0].get_first_label_with_type(FieldType.Function.LENGTH)
    assert label.start == 24
    assert label.length == 8


def test_length_easy_protocol():
    mb = MessageTypeBuilder("easy_length_test")
    mb.add_label(FieldType.Function.PREAMBLE, 16)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.SEQUENCE_NUMBER, 8)

    num_messages_by_data_length = {32: 10, 64: 15, 16: 5, 24: 7}
    pg = ProtocolGenerator([mb.message_type],
                           preambles_by_mt={mb.message_type: "10" * 8},
                           syncs_by_mt={mb.message_type: "0xcafe"})
    for data_length, num_messages in num_messages_by_data_length.items():
        for i in range(num_messages):
            if i % 4 == 0:
                data = "1" * data_length
            elif i % 4 == 1:
                data = "0" * data_length
            elif i % 4 == 2:
                data = "10" * (data_length // 2)
            else:
                data = "01" * (data_length // 2)
            pg.generate_message(data=data)

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)

    length_engine = LengthEngine(ff.bitvectors)
    highscored_ranges = length_engine.find(n_gram_length=8)
    assert len(highscored_ranges) == 4

    ff.perform_iteration()
    assert len(ff.message_types) == 1
    label = ff.message_types[0].get_first_label_with_type(FieldType.Function.LENGTH)
    assert label.start == 32
    assert label.length == 8


# ---------------------------------------------------------------------------
# sequence number engine
# ---------------------------------------------------------------------------


def test_seqnr_simple_protocol():
    mb = MessageTypeBuilder("simple_seq_test")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.SEQUENCE_NUMBER, 8)

    pg = ProtocolGenerator([mb.message_type], syncs_by_mt={mb.message_type: "0x9a9d"})
    for _ in range(20):
        pg.generate_message(data="0xcafe")

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)

    seq_engine = SequenceNumberEngine(ff.bitvectors, n_gram_length=8)
    highscored_ranges = seq_engine.find()
    assert len(highscored_ranges) == 1

    ff.perform_iteration()
    assert len(ff.message_types) == 1
    assert ff.message_types[0].num_labels_with_type(FieldType.Function.SEQUENCE_NUMBER) == 1
    label = ff.message_types[0].get_first_label_with_type(FieldType.Function.SEQUENCE_NUMBER)
    assert label.start == 24
    assert label.length == 8


def test_seqnr_16bit():
    mb = MessageTypeBuilder("16bit_seq_test")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.SEQUENCE_NUMBER, 16)

    num_messages = 10
    pg = ProtocolGenerator([mb.message_type], syncs_by_mt={mb.message_type: "0x9a9d"},
                           sequence_number_increment=64)
    for _ in range(num_messages):
        pg.generate_message(data="0xcafe")

    bitvectors = FormatFinder.get_bitvectors_from_messages(pg.protocol.messages,
                                                           sync_ends=np.array([24] * num_messages))
    seq_engine = SequenceNumberEngine(bitvectors, n_gram_length=8)
    highscored_ranges = seq_engine.find()
    assert len(highscored_ranges) == 1
    assert highscored_ranges[0].length == 16
    assert highscored_ranges[0].byte_order == "big"


# ---------------------------------------------------------------------------
# address engine + full format finder
# ---------------------------------------------------------------------------


def test_address_engine_two_participants():
    from urh_tpu.awre.engines.address import AddressEngine

    alice = Participant("Alice", "A", address_hex="1234")
    bob = Participant("Bob", "B", address_hex="cafe")

    mb = MessageTypeBuilder("address_two_participants")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.SRC_ADDRESS, 16)
    mb.add_label(FieldType.Function.DST_ADDRESS, 16)

    pg = ProtocolGenerator([mb.message_type], syncs_by_mt={mb.message_type: "0x9a9d"},
                           participants=[alice, bob])
    for i in range(50):
        if i % 2 == 0:
            source, destination = alice, bob
            data_length = 8
        else:
            source, destination = bob, alice
            data_length = 16
        pg.generate_message(data=pg.decimal_to_bits(4 * i, data_length),
                            source=source, destination=destination)

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)

    address_engine = AddressEngine(ff.hexvectors, ff.participant_indices)
    address_dict = address_engine.find_addresses()
    assert len(address_dict) == 2

    def to_hex_set(addresses):
        return {"".join("{0:x}".format(x) for x in np.frombuffer(a, dtype=np.uint8))
                for a in addresses}

    assert "1234" in to_hex_set(address_dict[0])
    assert "cafe" in to_hex_set(address_dict[0])
    assert "1234" in to_hex_set(address_dict[1])
    assert "cafe" in to_hex_set(address_dict[1])

    ff.known_participant_addresses.clear()
    ff.perform_iteration()

    assert len(ff.known_participant_addresses) == 2
    known = [bytes(v) for v in ff.known_participant_addresses.values()]
    assert bytes([0x1, 0x2, 0x3, 0x4]) in known
    assert bytes([0xC, 0xA, 0xF, 0xE]) in known

    assert len(ff.message_types) == 1
    mt = ff.message_types[0]
    dst_addr = mt.get_first_label_with_type(FieldType.Function.DST_ADDRESS)
    assert dst_addr is not None
    assert dst_addr.start == 32
    assert dst_addr.length == 16
    src_addr = mt.get_first_label_with_type(FieldType.Function.SRC_ADDRESS)
    assert src_addr is not None
    assert src_addr.start == 48
    assert src_addr.length == 16


def test_format_finder_preamble_sync():
    mb = MessageTypeBuilder("pre_sync_test")
    mb.add_label(FieldType.Function.PREAMBLE, 16)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)

    pg = ProtocolGenerator([mb.message_type],
                           preambles_by_mt={mb.message_type: "10" * 8},
                           syncs_by_mt={mb.message_type: "0xcafe"})
    random.seed(1)
    for data_length in (8, 16, 32):
        for _ in range(5):
            pg.generate_message(data="".join(random.choice(["0", "1"]) for _ in range(data_length)))

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    ff.run(max_iterations=3)

    mt = ff.message_types[0]
    preamble = mt.get_first_label_with_type(FieldType.Function.PREAMBLE)
    sync = mt.get_first_label_with_type(FieldType.Function.SYNC)
    assert preamble is not None and preamble.start == 0 and preamble.length == 16
    assert sync is not None and sync.start == 16 and sync.length == 16
