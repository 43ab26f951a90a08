"""rtl_tcp client: codec, parameter registry, link, and receive loop
against a fake rtl_tcp server on a loopback socket (role of
urh/dev/native/RTLSDRTCP.py; wire format per the osmocom rtl_tcp
protocol)."""

import multiprocessing
import socket
import threading
import time

import numpy as np
import pytest

from urh_tpu.dev.device import Device
from urh_tpu.dev.rtl_tcp import (PARAMETERS, RTLSDRTCP, RtlTcpLink,
                                 encode_command, parse_greeting)


class FakeRtlTcpServer:
    """Sends the RTL0 greeting, records 5-byte commands, streams IQ."""

    def __init__(self, tuner_type=5, gain_count=29, stream=b""):
        self.greeting = b"RTL0" + tuner_type.to_bytes(4, "big") \
            + gain_count.to_bytes(4, "big")
        self.stream = stream
        self.commands = []
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        conn, _ = self._srv.accept()
        conn.sendall(self.greeting)
        if self.stream:
            conn.sendall(self.stream)
        conn.settimeout(0.05)
        buf = b""
        end = time.monotonic() + 10
        while time.monotonic() < end:
            try:
                chunk = conn.recv(4096)
            except socket.timeout:
                continue
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            while len(buf) >= 5:
                self.commands.append((buf[0], int.from_bytes(buf[1:5], "big")))
                buf = buf[5:]
        conn.close()

    def close(self):
        self._srv.close()


def test_encode_command_wire_format():
    assert encode_command(0x01, 433920000) == b"\x01" + (433920000).to_bytes(4, "big")
    assert encode_command(0x04, 0) == b"\x04\x00\x00\x00\x00"
    # negative freq correction wraps to u32 (two's complement on the wire)
    assert encode_command(0x05, -42) == b"\x05" + ((-42) & 0xFFFFFFFF).to_bytes(4, "big")


def test_parse_greeting():
    hello = b"RTL0" + (5).to_bytes(4, "big") + (29).to_bytes(4, "big")
    g = parse_greeting(hello)
    assert g == {"tuner": "R820T", "gain_count": 29}
    assert parse_greeting(b"HTTP/1.1 400\r\n") is None
    assert parse_greeting(b"RTL0short") is None


def test_registry_orders_gain_last():
    startup = [p.name for p in PARAMETERS if p.startup]
    assert startup[-1] == "tunerGain"
    assert startup[0] == "centerFreq"
    # every runtime-dispatchable command resolves to a distinct opcode
    opcodes = [p.opcode for p in PARAMETERS]
    assert len(set(opcodes)) == len(opcodes)


def test_link_connect_program_read():
    server = FakeRtlTcpServer(stream=bytes(range(16)))
    try:
        link = RtlTcpLink("127.0.0.1", server.port)
        greeting = link.connect()
        assert greeting["tuner"] == "R820T"
        link.program({"frequency": 433920000, "sample_rate": 2000000,
                      "gain": 300})
        data = b""
        end = time.monotonic() + 5
        while len(data) < 16 and time.monotonic() < end:
            data += link.read()
        assert data == bytes(range(16))
        link.close()
        time.sleep(0.3)
        # order: centerFreq (0x01), sampleRate (0x02), tunerGain (0x04) LAST
        assert server.commands == [(0x01, 433920000), (0x02, 2000000),
                                   (0x04, 300)]
    finally:
        server.close()


def test_link_rejects_non_rtl_tcp_peer():
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)

    def bad_peer():
        conn, _ = srv.accept()
        conn.sendall(b"NOPE" + bytes(8))
        conn.close()

    threading.Thread(target=bad_peer, daemon=True).start()
    link = RtlTcpLink("127.0.0.1", srv.getsockname()[1])
    with pytest.raises(ConnectionError):
        link.connect()
    srv.close()


def test_receive_sync_full_loop():
    """The Device subprocess entry: greeting ack, startup programming,
    runtime retune via ctrl pipe, sample bytes on the data pipe, STOP."""
    payload = bytes((i * 7) % 256 for i in range(64))
    server = FakeRtlTcpServer(stream=payload)
    try:
        data_rx, data_tx = multiprocessing.Pipe(duplex=False)
        ctrl_a, ctrl_b = multiprocessing.Pipe()
        config = {"frequency": 100_000_000, "sample_rate": 1_000_000,
                  "gain": 200}

        t = threading.Thread(
            target=RTLSDRTCP.receive_sync,
            args=(data_tx, ctrl_b, config, "127.0.0.1", server.port),
            daemon=True)
        t.start()

        assert ctrl_a.poll(5)
        hello = ctrl_a.recv()
        assert hello.endswith(":0") and "R820T" in hello

        ctrl_a.send((Device.Command.SET_FREQUENCY.name, 868_000_000))

        received = b""
        end = time.monotonic() + 5
        while len(received) < len(payload) and time.monotonic() < end:
            if data_rx.poll(0.1):
                received += data_rx.recv_bytes()
        assert received == payload

        ctrl_a.send(Device.Command.STOP.name)
        t.join(timeout=5)
        assert not t.is_alive()
        time.sleep(0.3)
        assert (0x01, 100_000_000) in server.commands  # startup freq
        assert (0x01, 868_000_000) in server.commands  # runtime retune
        assert server.commands.index((0x04, 200)) > \
            server.commands.index((0x02, 1_000_000))  # gain after rate
    finally:
        server.close()


def test_bytes_to_iq_centering():
    buf = bytes([0, 255, 128, 127, 9])  # odd length: trailing byte dropped
    iq = RTLSDRTCP.bytes_to_iq(buf)
    assert iq.dtype == np.int8
    np.testing.assert_array_equal(iq, [[-128, 127], [0, -1]])
