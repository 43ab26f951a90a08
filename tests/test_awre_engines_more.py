"""Ports of remaining reference awre engine tests: length (medium protocol,
little-endian 16 bit), sequence number (zeros in first part, absent seqnum,
little-endian), generated CRC16 recovery, CommonRange overlap handling, and
FormatFinder conflict resolution."""

import random

import numpy as np

from urh_tpu.awre.common_range import CommonRange, CommonRangeContainer
from urh_tpu.awre.engines.length import LengthEngine
from urh_tpu.awre.engines.sequence_number import SequenceNumberEngine
from urh_tpu.awre.format_finder import FormatFinder
from urh_tpu.awre.message_type_builder import MessageTypeBuilder
from urh_tpu.awre.protocol_generator import ProtocolGenerator
from urh_tpu.coding.crc import GenericCRC
from urh_tpu.protocol.labels import FieldType, MessageType, Participant


def clear_message_types(messages):
    mt = MessageType("empty")
    for msg in messages:
        msg.message_type = mt


# ------------------------------------------------------------- length engine
def test_length_medium_protocol():
    """Two message types; the length field exists only in one of them."""
    mb1 = MessageTypeBuilder("data")
    mb1.add_label(FieldType.Function.PREAMBLE, 8)
    mb1.add_label(FieldType.Function.SYNC, 8)
    mb1.add_label(FieldType.Function.LENGTH, 8)
    mb1.add_label(FieldType.Function.SEQUENCE_NUMBER, 8)
    mb2 = MessageTypeBuilder("ack")
    mb2.add_label(FieldType.Function.PREAMBLE, 8)
    mb2.add_label(FieldType.Function.SYNC, 8)

    pg = ProtocolGenerator(
        [mb1.message_type, mb2.message_type],
        syncs_by_mt={mb1.message_type: "11110011", mb2.message_type: "11110011"})
    for data_length, num_messages in {8: 5, 16: 10, 32: 5}.items():
        for i in range(num_messages):
            pg.generate_message(data=pg.decimal_to_bits(10 * i, data_length),
                                message_type=mb1.message_type)
            pg.generate_message(message_type=mb2.message_type, data="0xaf")

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    ff.perform_iteration()
    assert len(ff.message_types) == 2
    length_mt = next(mt for mt in ff.message_types
                     if mt.get_first_label_with_type(FieldType.Function.LENGTH))
    length_label = length_mt.get_first_label_with_type(FieldType.Function.LENGTH)
    for i, sync_end in enumerate(ff.sync_ends):
        assert sync_end == 16, i
    assert length_label.start == 16
    assert length_label.length == 8


def test_length_little_endian_16_bit():
    mb = MessageTypeBuilder("little_endian_16_length_test")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 16)

    pg = ProtocolGenerator([mb.message_type],
                           syncs_by_mt={mb.message_type: "0x9a9d"},
                           little_endian=True)
    random.seed(0)
    for data_length, num_messages in {256 * 8: 5, 16: 4, 512: 2}.items():
        for _ in range(num_messages):
            pg.generate_message(
                data="".join(random.choice("01") for _ in range(data_length)))

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    length_engine = LengthEngine(ff.bitvectors)
    highscored_ranges = length_engine.find(n_gram_length=8)
    assert len(highscored_ranges) == 3

    ff.perform_iteration()
    assert len(ff.message_types) == 1
    label = ff.message_types[0].get_first_label_with_type(FieldType.Function.LENGTH)
    assert label.start == 24
    assert label.length == 16


# ------------------------------------------------------ sequence number engine
def test_16bit_seq_nr_with_zeros_in_first_part():
    mb = MessageTypeBuilder("16bit_seq_first_byte_zero_test")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.SEQUENCE_NUMBER, 16)

    num_messages = 10
    pg = ProtocolGenerator([mb.message_type],
                           syncs_by_mt={mb.message_type: "0x9a9d"},
                           sequence_number_increment=1)
    for i in range(num_messages):
        pg.generate_message(data="0xcafe" + "abc" * i)

    bitvectors = FormatFinder.get_bitvectors_from_messages(
        pg.protocol.messages, sync_ends=np.array([24] * num_messages))
    seq_engine = SequenceNumberEngine(bitvectors, n_gram_length=8)
    assert len(seq_engine.find()) == 1

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    ff.perform_iteration()
    assert len(ff.message_types) == 1
    assert ff.message_types[0].num_labels_with_type(
        FieldType.Function.SEQUENCE_NUMBER) == 1
    label = ff.message_types[0].get_first_label_with_type(
        FieldType.Function.SEQUENCE_NUMBER)
    # constant first byte must NOT count as part of the sequence number
    assert label.start == 40
    assert label.length == 8


def test_no_sequence_number():
    """No sequence number label when none exists."""
    alice = Participant("Alice", address_hex="dead")
    bob = Participant("Bob", address_hex="beef")

    mb = MessageTypeBuilder("protocol_with_one_message_type")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.SRC_ADDRESS, 16)
    mb.add_label(FieldType.Function.DST_ADDRESS, 16)

    pg = ProtocolGenerator([mb.message_type],
                           syncs_by_mt={mb.message_type: "0x1337"},
                           participants=[alice, bob])
    for i in range(3):
        source, destination = (alice, bob) if i % 2 == 0 else (bob, alice)
        pg.generate_message(data="", source=source, destination=destination)

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    ff.known_participant_addresses.clear()
    ff.perform_iteration()
    assert len(ff.message_types) == 1
    assert ff.message_types[0].num_labels_with_type(
        FieldType.Function.SEQUENCE_NUMBER) == 0


def test_sequence_number_little_endian_16_bit():
    mb = MessageTypeBuilder("16bit_seq_test")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.SEQUENCE_NUMBER, 16)

    pg = ProtocolGenerator([mb.message_type],
                           syncs_by_mt={mb.message_type: "0x9a9d"},
                           little_endian=True, sequence_number_increment=64)
    for _ in range(8):
        pg.generate_message(data="0xcafe")

    clear_message_types(pg.protocol.messages)
    ff = FormatFinder(pg.protocol.messages)
    ff.perform_iteration()
    assert len(ff.message_types) == 1
    assert ff.message_types[0].num_labels_with_type(
        FieldType.Function.SEQUENCE_NUMBER) == 1
    label = ff.message_types[0].get_first_label_with_type(
        FieldType.Function.SEQUENCE_NUMBER)
    assert label.start == 24
    assert label.length == 16


# ------------------------------------------------------------ checksum engine
def test_find_generated_crc16():
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
        syncs_by_mt={mb.message_type: "0x1234", mb2.message_type: "0x1234"})
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


# ----------------------------------------------------------------- histogram
def test_histogram_common_ranges():
    """The bit-equality histogram must flag the constant preamble+sync
    region as a common range (TestAWREHistograms rendered this visually;
    here we assert the underlying ranges)."""
    from urh_tpu.awre.histogram import Histogram

    mb = MessageTypeBuilder("histo_test")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)

    pg = ProtocolGenerator([mb.message_type], syncs_by_mt={mb.message_type: "0x9a9d"})
    random.seed(0)
    for _ in range(20):
        pg.generate_message(data=pg.decimal_to_bits(random.randint(0, 255), 8))

    ff = FormatFinder(pg.protocol.messages)
    for sync_end in ff.sync_ends:
        assert sync_end == 24

    bitvectors = FormatFinder.get_bitvectors_from_messages(pg.protocol.messages)
    h = Histogram(bitvectors)
    common = h.find_common_ranges(alpha=0.95)
    # preamble+sync (bits 0..24) must be inside one common range
    assert any(rng.start == 0 and rng.end >= 23 for rng in common)


# -------------------------------------------------------------- common range
def test_ensure_not_overlaps():
    test_range = CommonRange(start=4, length=8, value="12345678")
    assert test_range.end == 11

    assert test_range.ensure_not_overlaps(0, 3)[0] == test_range
    assert test_range.ensure_not_overlaps(20, 24)[0] == test_range

    result = test_range.ensure_not_overlaps(2, 6)[0]  # left overlap
    assert (result.start, result.end) == (6, 11)

    result = test_range.ensure_not_overlaps(6, 14)[0]  # right overlap
    assert (result.start, result.end) == (4, 5)

    assert len(test_range.ensure_not_overlaps(3, 14)) == 0  # full overlap

    left, right = test_range.ensure_not_overlaps(6, 9)  # middle overlap
    assert (left.start, left.end) == (4, 5)
    assert (right.start, right.end) == (10, 11)


# ------------------------------------------------- format finder static logic
def test_create_message_types_1():
    rng1 = CommonRange(0, 8, "1" * 8, score=1, field_type="Length")
    rng1.message_indices = {0, 1, 2}
    rng2 = CommonRange(8, 8, "1" * 8, score=1, field_type="Address")
    rng2.message_indices = {0, 1, 2}

    message_types = FormatFinder.create_common_range_containers({rng1, rng2})
    assert len(message_types) == 1
    assert message_types[0] == CommonRangeContainer([rng1, rng2],
                                                    message_indices={0, 1, 2})


def test_create_message_types_2():
    rng1 = CommonRange(0, 8, "1" * 8, score=1, field_type="Length")
    rng1.message_indices = {0, 2, 4, 6, 8, 12}
    rng2 = CommonRange(8, 8, "1" * 8, score=1, field_type="Address")
    rng2.message_indices = {1, 2, 3, 4, 5, 12}
    rng3 = CommonRange(16, 8, "1" * 8, score=1, field_type="Seq")
    rng3.message_indices = {1, 3, 5, 7, 12}

    message_types = FormatFinder.create_common_range_containers({rng1, rng2, rng3})
    assert len(message_types) == 5
    assert CommonRangeContainer([rng1], message_indices={0, 6, 8}) in message_types
    assert CommonRangeContainer([rng1, rng2], message_indices={2, 4}) in message_types
    assert CommonRangeContainer([rng1, rng2, rng3],
                                message_indices={12}) in message_types
    assert CommonRangeContainer([rng2, rng3],
                                message_indices={1, 3, 5}) in message_types
    assert CommonRangeContainer([rng3], message_indices={7}) in message_types


def test_retransform_message_indices():
    sync_ends = np.array([12, 12, 12, 14, 14])
    rng = CommonRange(0, 8, "1" * 8, score=1, field_type="length",
                      message_indices={0, 1, 2, 3, 4})
    retransformed = FormatFinder.retransform_message_indices(
        [rng], [0, 1, 2, 3, 4], sync_ends)
    assert len(retransformed) == 2
    assert CommonRange(12, 8, "1" * 8, score=1, field_type="length",
                       message_indices={0, 1, 2}) in retransformed
    assert CommonRange(14, 8, "1" * 8, score=1, field_type="length",
                       message_indices={3, 4}) in retransformed


def test_handle_no_overlapping_conflict():
    rng1 = CommonRange(0, 8, "1" * 8, score=1, field_type="Length")
    rng1.message_indices = {0, 1, 2}
    rng2 = CommonRange(8, 8, "1" * 8, score=1, field_type="Address")
    rng2.message_indices = {0, 1, 2}

    container = CommonRangeContainer([rng1, rng2], message_indices={0, 1, 2})
    result = FormatFinder.handle_overlapping_conflict([container])
    assert len(result) == 1
    assert len(result[0]) == 2
    assert rng1 in result[0] and rng2 in result[0]
    assert result[0].message_indices == {0, 1, 2}


def test_handle_easy_overlapping_conflict():
    rng1 = CommonRange(8, 8, "1" * 8, score=1, field_type="Length")
    rng1.message_indices = {0, 1, 2}
    rng2 = CommonRange(8, 8, "1" * 8, score=0.8, field_type="Address")
    rng2.message_indices = {0, 1, 2}

    container = CommonRangeContainer([rng1, rng2], message_indices={0, 1, 2})
    result = FormatFinder.handle_overlapping_conflict([container])
    assert len(result) == 1
    assert len(result[0]) == 1
    assert rng1 in result[0]
    assert result[0].message_indices == {0, 1, 2}


def test_handle_medium_overlapping_conflict():
    rng1 = CommonRange(8, 8, "1" * 8, score=1, field_type="Length")
    rng2 = CommonRange(4, 10, "1" * 8, score=0.8, field_type="Address")
    rng3 = CommonRange(15, 20, "1" * 8, score=1, field_type="Seq")
    rng4 = CommonRange(60, 80, "1" * 8, score=0.8, field_type="Type")
    rng5 = CommonRange(70, 90, "1" * 8, score=0.9, field_type="Data")

    container = CommonRangeContainer([rng1, rng2, rng3, rng4, rng5])
    result = FormatFinder.handle_overlapping_conflict([container])
    assert len(result) == 1
    assert len(result[0]) == 3
    assert rng1 in result[0] and rng3 in result[0] and rng5 in result[0]
