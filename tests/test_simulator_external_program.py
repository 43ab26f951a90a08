"""Headless port of the reference's test_external_program_simulator
(tests/test_simulator.py:180-310): a simulation whose transmitted label
value comes from an external program fed the transcript over stdin with a
counter-action value as argv, followed by sleep and trigger-command
actions."""

import os
import socket
import sys
import threading
import time

import numpy as np
import pytest

import urh_tpu as ut
from golden import drain_tx_stream
from urh_tpu.core.iq import IQData
from urh_tpu.dev.backend_handler import BackendHandler
from urh_tpu.dev.endless_sender import EndlessSender
from urh_tpu.dev.network_sdr import NetworkSDRInterfacePlugin
from urh_tpu.dsp.modulator import Modulator
from urh_tpu.protocol.labels import FieldType, MessageType, Participant
from urh_tpu.protocol.sniffer import ProtocolSniffer
from urh_tpu.sim.configuration import SimulatorConfiguration
from urh_tpu.sim.expression_parser import SimulatorExpressionParser
from urh_tpu.sim.items import (SimulatorCounterAction, SimulatorMessage,
                               SimulatorProtocolLabel, SimulatorSleepAction,
                               SimulatorTriggerCommandAction)
from urh_tpu.sim.simulator import Simulator
from urh_tpu.util import settings
from urh_tpu.util.project import ProjectManager

from tests.golden import get_path_for_data_file

TIMEOUT = 0.2
PREAMBLE = "10101010"
SYNC = "1001"


def wait_for_log_message(simulator, log_message, base_timeout_s=15.0):
    from golden import wait_for_condition

    if wait_for_condition(
            lambda: any(log_message in msg
                        for msg in simulator.log_messages),
            base_timeout_s=base_timeout_s, interval_s=TIMEOUT):
        return True
    raise AssertionError(f'did not receive log message "{log_message}"')


def test_external_program_simulator(tmp_path):
    settings.OVERWRITE_RECEIVE_BUFFER_SIZE = 50000
    Modulator.FORCE_DTYPE = np.float32
    try:
        alice = Participant("Alice", "A", simulate=False)
        bob = Participant("Bob", "B", simulate=True)

        from golden import load_factor

        pm = ProjectManager()
        pm.participants = [alice, bob]
        # receive window scales with host load: 8s idle, up to ~64s on a
        # fully contended 2-core box (round-4 flake: fixed windows lie)
        pm.simulator_timeout_ms = int(8000 * load_factor())
        pm.simulator_retries = 5  # load bursts can eat receive windows
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

        # item1: counter (start 3, step 2)
        counter = SimulatorCounterAction()
        counter.start = 3
        counter.step = 2

        # item2: Alice -> Bob, constant bits (simulator receives it)
        mt1 = MessageType("m1")
        msg1_bits = list(map(int, PREAMBLE + SYNC + "0" * 12))
        sim_msg1 = SimulatorMessage(bob, msg1_bits, pause=1000, message_type=mt1,
                                    source=alice)

        # item3: Bob -> Alice with an external-program label over bits 12..17
        mt2 = MessageType("m2")
        msg2_bits = list(map(int, PREAMBLE + SYNC + "0" * 12))
        sim_msg2 = SimulatorMessage(alice, msg2_bits, pause=1000, message_type=mt2,
                                    source=bob)
        ext_label = SimulatorProtocolLabel(
            mt2.add_protocol_label_start_length(12, 10, name="payload"))
        mt2.remove(ext_label.label)
        sim_msg2.insert_child(-1, ext_label)

        config.add_items([counter, sim_msg1, sim_msg2], 0, None)

        ext_program = "{} {} {}".format(
            sys.executable, get_path_for_data_file("external_program_simulator.py"),
            "item{}.counter_value".format(counter.index()))
        ext_label.value_type_index = 3
        ext_label.external_program = ext_program

        # item4: sleep, item5: trigger command creating a file
        sleep_action = SimulatorSleepAction()
        sleep_action.sleep_time = 1e-9
        trigger = SimulatorTriggerCommandAction()
        marker_file = tmp_path / "external_test_marker"
        trigger.command = "touch {}".format(marker_file)
        config.add_items([sleep_action, trigger], 3, None)

        assert not marker_file.exists()

        # devices: network loopback
        sniffer = ProtocolSniffer(
            samples_per_symbol=100, center=0.0942, center_spacing=0.1,
            noise=0.1, tolerance=2, modulation_type="FSK", bits_per_symbol=1,
            device=NetworkSDRInterfacePlugin.NETWORK_SDR_NAME,
            backend_handler=BackendHandler(), network_raw_mode=True)
        sniffer.rcv_device.set_server_port(0)
        sender = EndlessSender(BackendHandler(),
                               NetworkSDRInterfacePlugin.NETWORK_SDR_NAME)

        sink = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        sink.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        sink.bind(("", 0))
        sink.listen(1)
        sender.device.set_client_port(sink.getsockname()[1])

        simulator = Simulator(config, pm.modulators, parser, pm, sniffer, sender)
        simulator.sniffer_ready = True
        simulator.sender_ready = True
        simulator.start()
        wait_for_log_message(simulator, "Waiting for message")

        conn_holder = {}

        def accept():
            conn, _ = sink.accept()
            conn_holder["conn"] = conn

        acceptor = threading.Thread(target=accept, daemon=True)
        acceptor.start()

        # Alice sends message 1 — and re-sends until the simulator
        # acknowledges it (a load burst can expire a receive window
        # after a one-shot send, stranding the flow; the real protocol
        # partner would retransmit too)
        from golden import wait_for_condition

        rx_port = sniffer.rcv_device.underlying_device.server_port
        alice_tx = NetworkSDRInterfacePlugin(raw_mode=True, sending=True)
        alice_tx.client_port = rx_port

        def saw_sending():
            return any("Sending message" in m
                       for m in simulator.log_messages)

        for _ in range(5):
            alice_tx.send_raw_data(
                modulator.modulate(
                    list(map(int, PREAMBLE + SYNC + "0" * 12))), 1)
            time.sleep(TIMEOUT)
            alice_tx.send_raw_data(IQData(None, np.float32, 1000), 1)
            if wait_for_condition(saw_sending, base_timeout_s=5.0,
                                  interval_s=TIMEOUT):
                break
        assert saw_sending(), "simulator never answered Alice's message"
        acceptor.join(15)
        assert "conn" in conn_holder
        conn = conn_holder["conn"]

        # demodulate Bob's transmission: label bits 12..21 must carry the
        # external program's output "10" * counter_value; the counter action
        # (start 3, step 2) has progressed once by the time message 2 is
        # generated, so counter_value == 5
        def demod(raw: bytes) -> list:
            usable = len(raw) // 8 * 8
            if usable == 0:
                return []
            arr = np.frombuffer(raw[:usable], dtype=np.float32).reshape(-1, 2)
            sig = ut.Signal.from_iq(IQData(arr.copy(), skip_conversion=True))
            sig.modulation_type = "FSK"
            sig.samples_per_symbol = 100
            sig.noise_threshold = 0.1
            sig.center = 0.0942
            pa = ut.ProtocolAnalyzer(sig)
            pa.get_protocol_from_signal()
            return pa.plain_bits_str

        received = drain_tx_stream(
            conn, lambda raw: any(len(b) >= 22 for b in demod(raw)))
        decoded = demod(received)
        assert len(decoded) >= 1
        bits = decoded[0]
        assert bits.startswith(PREAMBLE + SYNC), bits
        assert bits[12:22] == "10" * 5, bits

        # wait for the simulation to finish; the trigger command must have run
        from golden import wait_for_condition
        wait_for_condition(lambda: not simulator.is_simulating,
                           base_timeout_s=10.0, interval_s=TIMEOUT)
        assert not simulator.is_simulating, "simulator did not finish"
        assert marker_file.exists(), "trigger command did not run"

        simulator.stop()
        sink.close()
    finally:
        settings.OVERWRITE_RECEIVE_BUFFER_SIZE = None
        Modulator.FORCE_DTYPE = None
