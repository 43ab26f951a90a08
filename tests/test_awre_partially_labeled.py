"""Port of reference tests/awre/test_partially_labeled.py: FormatFinder
behavior when some message types / labels already exist."""

import copy
import random

from urh_tpu.awre.format_finder import FormatFinder
from urh_tpu.awre.message_type_builder import MessageTypeBuilder
from urh_tpu.awre.protocol_generator import ProtocolGenerator
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.labels import FieldType, MessageType, Participant


def clear_message_types(messages):
    mt = MessageType("empty")
    for msg in messages:
        msg.message_type = mt


def _message_types_have_same_labels(mt1, mt2):
    if len(mt1) != len(mt2):
        return False
    return all(lbl == mt2[i] for i, lbl in enumerate(mt1))


def _prepare_example_protocol() -> ProtocolAnalyzer:
    alice = Participant("Alice", "A", address_hex="1234")
    bob = Participant("Bob", "B", address_hex="cafe")

    mb = MessageTypeBuilder("data")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
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
    return pg.protocol


def _prepare_simple_example_protocol() -> ProtocolAnalyzer:
    random.seed(0)
    alice = Participant("Alice", "A", address_hex="1234")
    bob = Participant("Bob", "B", address_hex="cafe")

    mb = MessageTypeBuilder("data")
    mb.add_label(FieldType.Function.PREAMBLE, 8)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.TYPE, 8)
    mb.add_label(FieldType.Function.DST_ADDRESS, 16)
    mb.add_label(FieldType.Function.SRC_ADDRESS, 16)

    pg = ProtocolGenerator([mb.message_type],
                           syncs_by_mt={mb.message_type: "0x6768"},
                           participants=[alice, bob])
    for _ in range(10):
        pg.generate_message(
            data="".join(random.choice("01") for _ in range(16)),
            source=alice, destination=bob)
        pg.generate_message(
            data="".join(random.choice("01") for _ in range(8)),
            source=bob, destination=alice)
    return pg.protocol


def test_fully_labeled():
    """For a fully labeled protocol nothing should change."""
    protocol = _prepare_example_protocol()
    message_types = sorted(copy.deepcopy(protocol.message_types),
                           key=lambda x: x.name)
    ff = FormatFinder(protocol.messages)
    ff.perform_iteration()
    assert len(message_types) == len(ff.message_types)
    for mt1, mt2 in zip(message_types, ff.message_types):
        assert _message_types_have_same_labels(mt1, mt2)


def test_one_message_type_empty():
    """Clear the ACK message type; the finder must recover its labels."""
    protocol = _prepare_example_protocol()
    n_message_types = len(protocol.message_types)
    ack_mt = next(mt for mt in protocol.message_types if mt.name == "ack")
    ack_mt.clear()
    assert len(ack_mt) == 0

    ff = FormatFinder(protocol.messages)
    ff.perform_iteration()
    assert n_message_types == len(ff.message_types)
    assert len(ack_mt) == 4, str(ack_mt)


def test_given_address_information():
    """Clear all message types; addresses are recovered from participant info."""
    protocol = _prepare_example_protocol()
    clear_message_types(protocol.messages)

    ff = FormatFinder(protocol.messages)
    ff.perform_iteration()
    assert len(ff.message_types) == 2
    F = FieldType.Function
    for func in (F.PREAMBLE, F.SYNC, F.LENGTH, F.DST_ADDRESS):
        assert ff.message_types[0].get_first_label_with_type(func) is not None
        assert ff.message_types[1].get_first_label_with_type(func) is not None
    assert ff.message_types[0].get_first_label_with_type(F.SRC_ADDRESS) is None
    assert ff.message_types[1].get_first_label_with_type(F.SRC_ADDRESS) is not None


def _run_with_preassigned_label(start: int, length: int):
    protocol = _prepare_simple_example_protocol()
    clear_message_types(protocol.messages)
    ff = FormatFinder(protocol.messages)
    ff.message_types[0].add_protocol_label_start_length(start, length)
    ff.perform_iteration()
    assert len(ff.message_types) == 1
    return ff.message_types[0]


def test_type_part_already_labeled():
    mt = _run_with_preassigned_label(32, 8)  # overlaps TYPE
    F = FieldType.Function
    for func in (F.PREAMBLE, F.SYNC, F.LENGTH, F.DST_ADDRESS, F.SRC_ADDRESS):
        assert mt.get_first_label_with_type(func) is not None, func


def test_length_part_already_labeled():
    mt = _run_with_preassigned_label(24, 8)  # overlaps LENGTH
    F = FieldType.Function
    assert mt.get_first_label_with_type(F.LENGTH) is None
    for func in (F.PREAMBLE, F.SYNC, F.DST_ADDRESS, F.SRC_ADDRESS):
        assert mt.get_first_label_with_type(func) is not None, func


def test_address_part_already_labeled():
    mt = _run_with_preassigned_label(40, 16)  # overlaps DST address
    F = FieldType.Function
    assert mt.get_first_label_with_type(F.DST_ADDRESS) is None
    for func in (F.PREAMBLE, F.SYNC, F.LENGTH, F.SRC_ADDRESS):
        assert mt.get_first_label_with_type(func) is not None, func
