"""Device layer tests: ring buffer, network SDR loopback, live sniffer.

Mirrors the reference's hardware-free E2E strategy: the Network SDR
TCP loopback acts as a fake SDR (tests/test_protocol_sniffer.py there).
"""

import socket
import time

import numpy as np
import pytest

from urh_tpu.dev.backend_handler import BackendHandler
from urh_tpu.dev.network_sdr import NetworkSDRInterfacePlugin
from urh_tpu.core.iq import IQData
from urh_tpu.core.signal import Signal
from urh_tpu.dsp.modulator import Modulator
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.sniffer import ProtocolSniffer
from urh_tpu.util import settings
from urh_tpu.util.ringbuffer import RingBuffer


def get_free_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# ---------------------------------------------------------------------------
# ring buffer (mirrors tests/test_ringbuffer.py)
# ---------------------------------------------------------------------------


def test_ringbuffer_push_pop():
    rb = RingBuffer(size=8)
    assert rb.is_empty
    values = np.array([[1, 2], [3, 4], [5, 6]], dtype=np.float32)
    rb.push(values)
    assert len(rb) == 3
    popped = rb.pop(2)
    np.testing.assert_array_equal(popped, values[:2])
    assert len(rb) == 1


def test_ringbuffer_wraparound():
    rb = RingBuffer(size=4)
    a = np.arange(8, dtype=np.float32).reshape(4, 2)
    rb.push(a)
    rb.pop(3)
    b = np.arange(100, 106, dtype=np.float32).reshape(3, 2)
    rb.push(b)
    out = rb.pop(-1)
    np.testing.assert_array_equal(out[0], a[3])
    np.testing.assert_array_equal(out[1:], b)


def test_ringbuffer_overflow_raises():
    rb = RingBuffer(size=2)
    with pytest.raises(ValueError):
        rb.push(np.zeros((3, 2), dtype=np.float32))


def test_ringbuffer_will_fit():
    rb = RingBuffer(size=5)
    assert rb.will_fit(5)
    rb.push(np.zeros((3, 2), dtype=np.float32))
    assert rb.will_fit(2)
    assert not rb.will_fit(3)


# ---------------------------------------------------------------------------
# network SDR raw loopback
# ---------------------------------------------------------------------------


def test_network_sdr_raw_loopback():
    settings.OVERWRITE_RECEIVE_BUFFER_SIZE = 50000
    try:
        receiver = NetworkSDRInterfacePlugin(raw_mode=True, resume_on_full_receive_buffer=True)
        receiver.server_port = 0  # pick free port on bind
        receiver.start_tcp_server_for_receiving()

        sender = NetworkSDRInterfacePlugin(raw_mode=True, sending=True)
        sender.client_port = receiver.server_port

        data = np.arange(64, dtype=np.float32).reshape(32, 2)
        sender.send_raw_data(IQData(data, skip_conversion=True), 1)
        time.sleep(0.5)

        received = np.asarray(receiver.received_data)
        receiver.stop_tcp_server()
        np.testing.assert_array_equal(received, data)
    finally:
        settings.OVERWRITE_RECEIVE_BUFFER_SIZE = None


def test_network_sdr_bit_mode_loopback():
    receiver = NetworkSDRInterfacePlugin(raw_mode=False)
    receiver.server_port = 0
    receiver.start_tcp_server_for_receiving()

    sender = NetworkSDRInterfacePlugin(raw_mode=False, sending=True)
    sender.client_port = receiver.server_port

    from urh_tpu.protocol.message import Message

    msgs = [Message.from_plain_bits_str("10101010", pause=0)]
    sender._send_messages(msgs, [1e6])
    time.sleep(0.5)
    receiver.stop_tcp_server()
    assert receiver.received_bits == ["10101010"]


# ---------------------------------------------------------------------------
# live sniffer E2E over TCP loopback (test_protocol_sniffer.py port)
# ---------------------------------------------------------------------------


def test_protocol_sniffer():
    settings.OVERWRITE_RECEIVE_BUFFER_SIZE = 50000
    try:
        samples_per_symbol = 100
        center = 0.0942
        noise = 0.1
        tolerance = 2
        modulation_type = "FSK"
        sample_rate = 1e6

        sniffer = ProtocolSniffer(samples_per_symbol=samples_per_symbol, center=center,
                                  center_spacing=0.1, noise=noise, tolerance=tolerance,
                                  modulation_type=modulation_type, bits_per_symbol=1,
                                  device=NetworkSDRInterfacePlugin.NETWORK_SDR_NAME,
                                  backend_handler=BackendHandler(),
                                  network_raw_mode=True)
        sniffer.rcv_device.set_server_port(0)

        sniffer.sniff()
        time.sleep(0.1)
        port = sniffer.rcv_device.underlying_device.server_port

        sender = NetworkSDRInterfacePlugin(raw_mode=True, sending=True)
        sender.client_port = port

        data = ["101010", "000111", "1111000"]
        pause = 10 * samples_per_symbol
        modulator = Modulator("test")
        modulator.samples_per_symbol = samples_per_symbol
        modulator.sample_rate = sample_rate
        modulator.modulation_type = modulation_type
        modulator.parameters[1] = 20e3
        modulator.parameters[0] = 10e3

        packages = [modulator.modulate(list(map(int, d)), pause) for d in data]

        # verify the modulation itself demodulates correctly
        pa = ProtocolAnalyzer(None)
        signal = Signal("", "", sample_rate=sample_rate)
        signal.iq_array = IQData.concatenate(packages)
        signal.modulation_type = modulation_type
        signal.samples_per_symbol = samples_per_symbol
        signal.tolerance = tolerance
        signal.noise_threshold = noise
        signal.center = center
        pa.signal = signal
        pa.get_protocol_from_signal()
        assert pa.plain_bits_str == data

        send_data = IQData.concatenate(packages)
        sender.send_raw_data(send_data, 1)
        time.sleep(1)
        # enough trailing silence to flush the last message
        sender.send_raw_data(IQData(None, np.float32, 10 * 2 * samples_per_symbol), 1)
        time.sleep(1)

        sniffer.stop()
        assert sniffer.plain_bits_str == data
    finally:
        settings.OVERWRITE_RECEIVE_BUFFER_SIZE = None


def test_network_sdr_spectrum_mode():
    """Spectrum mode: a tone over TCP shows a peak at its frequency
    (VirtualDevice.spectrum semantics, VirtualDevice.py:751-762)."""
    settings.OVERWRITE_RECEIVE_BUFFER_SIZE = settings.SPECTRUM_BUFFER_SIZE
    try:
        receiver = NetworkSDRInterfacePlugin(raw_mode=True, spectrum=True,
                                             resume_on_full_receive_buffer=True)
        receiver.server_port = 0
        receiver.start_tcp_server_for_receiving()

        sender = NetworkSDRInterfacePlugin(raw_mode=True, sending=True)
        sender.client_port = receiver.server_port

        # +100 kHz tone at 1 MHz sample rate
        n = 4096
        t = np.arange(n)
        tone = np.exp(2j * np.pi * 0.1 * t).astype(np.complex64)
        data = np.column_stack((tone.real, tone.imag)).astype(np.float32)
        sender.send_raw_data(IQData(data, skip_conversion=True), 1)
        time.sleep(0.5)

        buffer = receiver.receive_buffer
        w = np.abs(np.fft.fft(buffer.as_complex64()[:n]))
        freqs = np.fft.fftfreq(len(w), 1 / 1e6)
        peak_freq = freqs[np.argmax(w)]
        receiver.stop_tcp_server()
        assert abs(peak_freq - 100e3) < 2e3, peak_freq
    finally:
        settings.OVERWRITE_RECEIVE_BUFFER_SIZE = None
