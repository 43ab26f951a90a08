"""ProtocolAnalyzer, auto-assignment and continuous-modulator tests
(ports of tests/test_protocol_analyzer.py, test_auto_assignments.py,
test_continuous_modulator.py)."""

import copy
import time

import numpy as np

import urh_tpu as ut
from urh_tpu.awre import auto_assigner as AutoAssigner
from urh_tpu.dsp.continuous_modulator import ContinuousModulator
from urh_tpu.dsp.modulator import Modulator
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.labels import MessageType, Mode, Participant, Rule, Ruleset
from urh_tpu.protocol.message import Message

from tests.golden import get_path_for_data_file


def test_get_bit_sample_pos():
    signal = ut.Signal.from_file(get_path_for_data_file("ASK_mod.complex"))
    signal.modulation_type = "ASK"
    signal.samples_per_symbol = 100

    pa = ProtocolAnalyzer(signal)
    pa.get_protocol_from_signal()
    assert pa.num_messages == 1
    for i, pos in enumerate(pa.messages[0].bit_sample_pos):
        assert pos < signal.num_samples, i


def test_fsk_freq_detection():
    s = ut.Signal.from_file(get_path_for_data_file("steckdose_anlernen.complex"))
    s.noise_threshold = 0.06
    s.center = 0
    s.samples_per_symbol = 100
    pa = ProtocolAnalyzer(s)
    pa.get_protocol_from_signal()
    assert pa.messages[0].plain_bits_str == (
        "101010101010101010101010101010101001101001111101100110100111110111010010011000010110110101111"
        "010111011011000011000101000010001001101100101111010110100110011100100110000101001110100001111"
        "111101000111001110000101110100100111010110110100001101101101010100011011010001010110011100011"
        "010100010101111110011010011001000000110010011010001000100100100111101110110010011111011100010"
        "10110010100011111101110111000010111100111101001011101101011011010110101011100"
    )

    freq = pa.estimate_frequency_for_one(1e6)
    assert int(freq / 10000) == 1  # freq for 1 is 10K
    freq = pa.estimate_frequency_for_zero(1e6)
    assert int(freq / 10000) == 3  # freq for 0 is 30K


def test_get_rssi_of_message():
    signal = ut.Signal.from_file(get_path_for_data_file("two_participants.complex16s"))
    signal.modulation_type = "FSK"
    signal.samples_per_symbol = 100
    signal.center = -0.0507

    pa = ProtocolAnalyzer(signal)
    pa.get_protocol_from_signal()
    assert pa.num_messages == 18
    messages = pa.messages
    assert messages[0].rssi < messages[1].rssi
    assert messages[1].rssi > messages[2].rssi
    assert messages[2].rssi < messages[3].rssi
    assert messages[-2].rssi < messages[-1].rssi


def test_message_type_assign_by_value():
    protocol = ProtocolAnalyzer(None, filename="x")
    with open(get_path_for_data_file("decoded_bits.txt")) as f:
        for line in f:
            protocol.messages.append(Message.from_plain_bits_str(line.strip()))
            protocol.messages[-1].message_type = protocol.default_message_type
    assert protocol.num_messages == 42
    assert protocol.plain_hex_str[0][16:18] == "2d"

    msg_type = MessageType("autotest")
    msg_type.ruleset = Ruleset(Mode.all_apply, [Rule(8, 15, "=", "9a7d9a7d", 1)])
    msg_type.assigned_by_ruleset = True
    protocol.message_types.append(msg_type)
    protocol.update_auto_message_types()

    matching_indices = [0, 2, 3, 21, 23, 24]
    for i, message in enumerate(protocol.messages):
        if i in matching_indices:
            assert message.message_type == msg_type, str(i)
        else:
            assert message.message_type == protocol.default_message_type, str(i)


def test_assign_participants_by_rssi():
    alice = Participant("Alice", "A")
    bob = Participant("Bob", "B")
    alice.relative_rssi = 1
    bob.relative_rssi = 0

    proto = ProtocolAnalyzer(None, filename="x")
    rssis = [0.65, 0.13, 0.12, 0.73, 0.64, 0.12, 0.12, 0.68]
    for rssi in rssis:
        msg = Message.from_plain_bits_str("101010")
        msg.rssi = rssi
        proto.messages.append(msg)

    AutoAssigner.auto_assign_participants(proto.messages, [alice, bob])
    for msg, rssi in zip(proto.messages, rssis):
        expected = alice if rssi > 0.4 else bob
        assert msg.participant == expected


def test_modulate_continuously():
    NUM_MESSAGES = 20
    BITS_PER_MESSAGE = 100

    mt = MessageType("test")
    messages = [Message([True] * BITS_PER_MESSAGE, 1000, mt) for _ in range(NUM_MESSAGES)]

    modulator = Modulator("Test")
    continuous_modulator = ContinuousModulator(messages, [modulator])
    assert continuous_modulator.current_message_index.value == 0
    assert continuous_modulator.ring_buffer.is_empty

    continuous_modulator.start()
    assert continuous_modulator.process.is_alive()
    for _ in range(300):  # generous: spawned process + jit warm-up under load
        if not continuous_modulator.ring_buffer.is_empty:
            break
        time.sleep(0.1)
    assert not continuous_modulator.ring_buffer.is_empty
    continuous_modulator.stop()
    assert not continuous_modulator.process.is_alive()
