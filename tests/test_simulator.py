"""Stateful simulator E2E over TCP loopback.

Headless port of the reference's tests/test_simulator.py flow: the
simulator receives a message from "Alice" (external, played by the
test over the Network SDR), validates its checksum, then answers with
a message whose sequence-number label is the formula
``item1.sequence_number + 1``.
"""

import socket
import threading
import time

import numpy as np
import pytest

import urh_tpu as ut
from golden import drain_tx_stream
from urh_tpu.coding.crc import GenericCRC
from urh_tpu.core.iq import IQData
from urh_tpu.dev.backend_handler import BackendHandler
from urh_tpu.dev.endless_sender import EndlessSender
from urh_tpu.dev.network_sdr import NetworkSDRInterfacePlugin
from urh_tpu.dsp.modulator import Modulator
from urh_tpu.protocol.labels import ChecksumLabel, FieldType, MessageType, Participant
from urh_tpu.protocol.sniffer import ProtocolSniffer
from urh_tpu.sim.configuration import SimulatorConfiguration
from urh_tpu.sim.expression_parser import SimulatorExpressionParser
from urh_tpu.sim.items import SimulatorMessage, SimulatorProtocolLabel
from urh_tpu.sim.simulator import Simulator
from urh_tpu.util import settings
from urh_tpu.util.project import ProjectManager

TIMEOUT = 0.2

PREAMBLE = "10101010"
SYNC = "1001"


def build_message_type(with_checksum=True):
    mt = MessageType("t")
    mt.add_protocol_label_start_length(0, 8, name="preamble",
                                       type=FieldType.from_caption("preamble"))
    mt.add_protocol_label_start_length(8, 4, name="synchronization",
                                       type=FieldType.from_caption("synchronization"))
    mt.add_protocol_label_start_length(12, 8, name="sequence number",
                                       type=FieldType.from_caption("sequence number"))
    if with_checksum:
        mt.add_protocol_label_start_length(20, 8, name="data")
        cs = mt.add_protocol_label_start_length(28, 8, name="checksum",
                                                type=FieldType("checksum", FieldType.Function.CHECKSUM))
        cs.checksum = GenericCRC(polynomial="8_ccitt")
        cs.data_ranges = [[12, 28]]
    return mt


def wait_for_log_message(simulator, log_message, base_timeout_s=15.0):
    from golden import wait_for_condition

    if wait_for_condition(
            lambda: any(log_message in msg
                        for msg in simulator.log_messages),
            base_timeout_s=base_timeout_s, interval_s=TIMEOUT):
        return True
    raise AssertionError(f'did not receive log message "{log_message}"')


def demodulate_raw(data_bytes, modulator):
    usable = len(data_bytes) // 8 * 8
    if usable == 0:
        return []
    arr = np.frombuffer(data_bytes[:usable], dtype=np.float32).reshape(-1, 2)
    sig = ut.Signal.from_iq(IQData(arr.copy(), skip_conversion=True))
    sig.modulation_type = modulator.modulation_type
    sig.samples_per_symbol = modulator.samples_per_symbol
    sig.noise_threshold = 0.1
    sig.center = 0.0942
    pa = ut.ProtocolAnalyzer(sig)
    pa.get_protocol_from_signal()
    return pa.plain_bits_str


def test_simulation_flow():
    settings.OVERWRITE_RECEIVE_BUFFER_SIZE = 50000
    Modulator.FORCE_DTYPE = np.float32
    try:
        alice = Participant("Alice", "A", simulate=False)
        bob = Participant("Bob", "B", simulate=True)

        pm = ProjectManager()
        pm.participants = [alice, bob]
        from golden import load_factor
        # receive window scales with host load (fixed windows flake)
        pm.simulator_timeout_ms = int(8000 * load_factor())
        pm.simulator_retries = 5
        pm.simulator_num_repeat = 1

        modulator = Modulator("sim")
        modulator.modulation_type = "FSK"
        modulator.samples_per_symbol = 100
        modulator.parameters[0] = 10e3
        modulator.parameters[1] = 20e3
        pm.modulators = [modulator]

        config = SimulatorConfiguration(pm)
        parser = SimulatorExpressionParser(config)
        config.attach_expression_parser(parser)

        # message 1: Alice -> Bob (simulator receives)
        mt1 = build_message_type(with_checksum=True)
        msg1_bits = list(map(int, PREAMBLE + SYNC + "0" * 8 + "0" * 8 + "0" * 8))
        sim_msg1 = SimulatorMessage(bob, msg1_bits, pause=1000, message_type=MessageType("m1"),
                                    source=alice)
        for lbl in mt1:
            sim_lbl = SimulatorProtocolLabel(lbl)
            if lbl.name in ("sequence number", "data"):
                sim_lbl.value_type_index = 1  # live input from Alice
            sim_msg1.insert_child(-1, sim_lbl)

        # message 2: Bob -> Alice (simulator transmits) with formula seq+1
        mt2 = build_message_type(with_checksum=False)
        msg2_bits = list(map(int, PREAMBLE + SYNC + "0" * 8))
        sim_msg2 = SimulatorMessage(alice, msg2_bits, pause=1000, message_type=MessageType("m2"),
                                    source=bob)
        for lbl in mt2:
            sim_lbl = SimulatorProtocolLabel(lbl)
            if lbl.name == "sequence number":
                sim_lbl.value_type_index = 2  # formula
                sim_lbl.formula = "item1.sequence_number + 1"
            sim_msg2.insert_child(-1, sim_lbl)

        config.add_items([sim_msg1, sim_msg2], 0, None)
        assert config.protocol_valid()

        # devices: sniffer RX on a TCP server; sender TX to our socket
        sniffer = ProtocolSniffer(samples_per_symbol=100, center=0.0942, center_spacing=0.1,
                                  noise=0.1, tolerance=2, modulation_type="FSK",
                                  bits_per_symbol=1,
                                  device=NetworkSDRInterfacePlugin.NETWORK_SDR_NAME,
                                  backend_handler=BackendHandler(),
                                  network_raw_mode=True)
        sniffer.rcv_device.set_server_port(0)

        sender = EndlessSender(BackendHandler(), NetworkSDRInterfacePlugin.NETWORK_SDR_NAME)

        # test-side TX sink
        sink = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        sink.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        sink.bind(("", 0))
        sink.listen(1)
        sender.device.set_client_port(sink.getsockname()[1])

        simulator = Simulator(config, pm.modulators, parser, pm, sniffer, sender)
        # network devices have no ready handshake: mark ready directly
        simulator.sniffer_ready = True
        simulator.sender_ready = True

        simulator.start()
        wait_for_log_message(simulator, "Waiting for message")
        rx_port = sniffer.rcv_device.underlying_device.server_port

        conn_holder = {}

        def accept():
            conn, _ = sink.accept()
            conn_holder["conn"] = conn

        acceptor = threading.Thread(target=accept, daemon=True)
        acceptor.start()

        # Alice sends message 1
        alice_tx = NetworkSDRInterfacePlugin(raw_mode=True, sending=True)
        alice_tx.client_port = rx_port

        seq = list(map(int, "00000010"))
        data = list(map(int, "11001101"))
        checksum_label = next(l.label for l in sim_msg1.children
                              if isinstance(l.label, ChecksumLabel))
        checksum = list(checksum_label.calculate_checksum(
            __import__("array").array("B", seq + data)))
        msg1 = list(map(int, PREAMBLE + SYNC)) + seq + data + checksum

        alice_tx.send_raw_data(modulator.modulate(msg1), 1)
        time.sleep(TIMEOUT)
        alice_tx.send_raw_data(IQData(None, np.float32, 1000), 1)

        wait_for_log_message(simulator, "Sending message 2")
        acceptor.join(5)
        assert "conn" in conn_holder, "simulator did not open TX connection"
        conn = conn_holder["conn"]

        # read Bob's answer: drain until it demodulates (condition-based,
        # not a fixed idle window — the TX push may arrive in bursts)
        def answered(raw: bytes) -> bool:
            decoded = demodulate_raw(raw, modulator)
            return len(decoded) >= 1 and decoded[0].startswith(PREAMBLE + SYNC)

        received = drain_tx_stream(conn, answered)
        bits = demodulate_raw(received, modulator)
        assert len(bits) >= 1
        answer = bits[0]
        assert answer.startswith(PREAMBLE + SYNC), answer
        seq_num_reply = int(answer[len(PREAMBLE + SYNC):][:8], 2)
        assert seq_num_reply == int("".join(map(str, seq)), 2) + 1

        simulator.stop()
        sink.close()
    finally:
        settings.OVERWRITE_RECEIVE_BUFFER_SIZE = None
        Modulator.FORCE_DTYPE = None
