"""Live protocol sniffing: device RX -> streaming demod -> messages.

Counterpart of urh/signalprocessing/ProtocolSniffer.py (302 LoC): a
background thread polls the receive device, power-gates incoming
chunks into a rolling buffer, demodulates complete bursts through the
device-accelerated pipeline and emits messages.  Supports adaptive
noise tracking and automatic center detection.
"""

from __future__ import annotations

import os
import time
from datetime import datetime
from threading import Thread

import numpy as np

from urh_tpu.ai.estimate import detect_center
from urh_tpu.core.iq import IQData
from urh_tpu.core.signal import Signal
from urh_tpu.dev.backend_handler import BackendHandler, Backends
from urh_tpu.dev.virtual_device import Mode, VirtualDevice
from urh_tpu.dsp.symbols import grab_pulse_lens
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.message import Message
from urh_tpu.util.events import Event
from urh_tpu.util.logging import logger


class ProtocolSniffer(ProtocolAnalyzer):
    BUFFER_SIZE_MB = 100

    def __init__(self, samples_per_symbol: int, center: float, center_spacing: float,
                 noise: float, tolerance: int, modulation_type: str,
                 bits_per_symbol: int, device: str, backend_handler: BackendHandler,
                 network_raw_mode=False):
        signal = Signal("", "LiveSignal")
        signal.samples_per_symbol = samples_per_symbol
        signal.center = center
        signal.center_spacing = center_spacing
        signal.noise_threshold = noise
        signal.tolerance = tolerance
        signal.silent_set_modulation_type(modulation_type)
        signal.bits_per_symbol = bits_per_symbol
        ProtocolAnalyzer.__init__(self, signal)

        self.started = Event()
        self.stopped = Event()
        self.message_sniffed = Event(int)

        self.network_raw_mode = network_raw_mode
        self.backend_handler = backend_handler
        self.rcv_device = VirtualDevice(self.backend_handler, device, Mode.receive,
                                        resume_on_full_receive_buffer=True,
                                        raw_mode=network_raw_mode)

        signal.iq_array = IQData(None, self.rcv_device.data_type, 0)

        self.sniff_thread = Thread(target=self.check_for_data, daemon=True)

        self.rcv_device.started.connect(self._emit_started)
        self.rcv_device.stopped.connect(self._emit_stopped)

        self._buffer = IQData(None, np.float32, 0)
        self._init_buffer()
        self._current_buffer_index = 0

        self.reading_data = False
        self.adaptive_noise = False
        self.automatic_center = False

        self.pause_length = 0
        self.is_running = False
        self.store_messages = True

        self._sniff_file = ""
        self._store_data = True

    # -- buffer -----------------------------------------------------------
    def _add_to_buffer(self, data: np.ndarray):
        n = len(data)
        if n + self._current_buffer_index > len(self._buffer):
            n = len(self._buffer) - self._current_buffer_index - 1
            logger.warning("Buffer of protocol sniffer is full")
        self._buffer[self._current_buffer_index : self._current_buffer_index + n] = data[:n]
        self._current_buffer_index += n

    def _clear_buffer(self):
        self._current_buffer_index = 0

    def _buffer_is_full(self):
        return self._current_buffer_index >= len(self._buffer) - 2

    def _init_buffer(self):
        self._buffer = IQData(None, self.rcv_device.data_type,
                              int(self.BUFFER_SIZE_MB * 1000 * 1000 / 8))
        self._current_buffer_index = 0

    # -- text output -------------------------------------------------------
    def decoded_to_string(self, view: int, start=0, include_timestamps=True):
        return "\n".join(self.message_to_string(msg, view, include_timestamps)
                         for msg in self.messages[start:])

    def message_to_string(self, message: Message, view: int, include_timestamps=True):
        msg_str_data = []
        if include_timestamps:
            msg_date = datetime.fromtimestamp(message.timestamp)
            msg_str_data.append(msg_date.strftime("[%Y-%m-%d %H:%M:%S.%f]"))
        msg_str_data.append(message.view_to_string(view, decoded=True, show_pauses=False))
        return " ".join(msg_str_data)

    @property
    def sniff_file(self):
        return self._sniff_file

    @sniff_file.setter
    def sniff_file(self, val):
        self._sniff_file = val
        if self._sniff_file:
            self._store_data = False

    @property
    def device_name(self):
        return self.rcv_device.name

    @device_name.setter
    def device_name(self, value: str):
        if value != self.rcv_device.name:
            self.rcv_device.free_data()
            self.rcv_device = VirtualDevice(self.backend_handler, value, Mode.receive,
                                            device_ip="192.168.10.2",
                                            resume_on_full_receive_buffer=True,
                                            raw_mode=self.network_raw_mode)
            self.rcv_device.started.connect(self._emit_started)
            self.rcv_device.stopped.connect(self._emit_stopped)
            self.signal.iq_array = IQData(None, self.rcv_device.data_type, 0)
            self._init_buffer()

    # -- live loop ---------------------------------------------------------
    def sniff(self):
        self.is_running = True
        self.rcv_device.start()
        self.sniff_thread = Thread(target=self.check_for_data, daemon=True)
        self.sniff_thread.start()

    def check_for_data(self):
        old_index = 0
        while self.is_running:
            time.sleep(0.01)
            if self.rcv_device.is_raw_mode:
                current = self.rcv_device.current_index
                if old_index <= current:
                    data = self.rcv_device.data[old_index:current]
                else:
                    data = np.concatenate((self.rcv_device.data[old_index:],
                                           self.rcv_device.data[:current]))
                old_index = current
                self._demodulate_data(data)
            elif self.rcv_device.backend == Backends.network:
                # bits arrive directly from the network device
                for bit_str in list(self.rcv_device.data):
                    msg = Message.from_plain_bits_str(bit_str)
                    msg.decoder = self.decoder
                    self.messages.append(msg)
                    self.message_sniffed.emit(len(self.messages) - 1)
                self.rcv_device.free_data()  # avoid double-storing bits

            if self.sniff_file and not os.path.isdir(self.sniff_file):
                plain_bits_str = self.plain_bits_str
                if plain_bits_str:
                    with open(self.sniff_file, "a") as f:
                        f.write("\n".join(plain_bits_str) + "\n")
            if not self._store_data:
                self.messages.clear()

    def _demodulate_data(self, data):
        """Power-gate and demodulate a received chunk
        (ProtocolSniffer.py:204-283)."""
        if len(data) == 0:
            return
        from urh_tpu.util.metrics import metrics

        with metrics.measure("sniffer.demodulate", len(data)):
            return self._demodulate_data_impl(data)

    def _demodulate_data_impl(self, data):
        data = np.asarray(data)
        power_spectrum = data[:, 0].astype(np.float64) ** 2 + data[:, 1].astype(np.float64) ** 2
        is_above_noise = np.sqrt(np.mean(power_spectrum)) > self.signal.noise_threshold

        if self.adaptive_noise and not is_above_noise:
            self.signal.noise_threshold = (0.9 * self.signal.noise_threshold
                                           + 0.1 * np.sqrt(np.max(power_spectrum)))

        if is_above_noise:
            self._add_to_buffer(data)
            self.pause_length = 0
            if not self._buffer_is_full():
                return
        else:
            self.pause_length += len(data)
            if self.pause_length < 10 * self.signal.samples_per_symbol:
                self._add_to_buffer(data)
                if not self._buffer_is_full():
                    return

        if self._current_buffer_index == 0:
            return

        # burst complete: demodulate it
        self.signal.iq_array = IQData(np.ascontiguousarray(self._buffer[0 : self._current_buffer_index]),
                                      skip_conversion=True)
        self.signal.timestamp = time.time() - (len(self.signal.iq_array) / self.rcv_device.sample_rate)
        self._clear_buffer()
        self.signal._qad = None

        samples_per_symbol = self.signal.samples_per_symbol
        if self.automatic_center:
            self.signal.center = detect_center(self.signal.qad,
                                               max_size=150 * samples_per_symbol)

        ppseq = grab_pulse_lens(self.signal.qad, self.signal.center,
                                self.signal.tolerance, self.signal.modulation_type,
                                self.signal.samples_per_symbol,
                                self.signal.bits_per_symbol, self.signal.center_spacing)

        bit_data, pauses, bit_sample_pos = self._ppseq_to_bits(
            ppseq, samples_per_symbol, self.signal.bits_per_symbol,
            write_bit_sample_pos=True)

        for i, (bits, pause) in enumerate(zip(bit_data, pauses)):
            message_timestamp = self.signal.timestamp + bit_sample_pos[i][0] / self.rcv_device.sample_rate
            message = Message(bits, pause, samples_per_symbol=samples_per_symbol,
                              message_type=self.default_message_type,
                              decoder=self.decoder, timestamp=message_timestamp)
            self.messages.append(message)
            self.message_sniffed.emit(len(self.messages) - 1)

    def stop(self):
        self.is_running = False
        self.rcv_device.stop("Stopping receiving due to user interaction")
        if self.sniff_thread.is_alive():
            self.sniff_thread.join(0.1)
        if self.sniff_thread.is_alive():
            logger.error("Sniff thread is still alive")

    def clear(self):
        self._clear_buffer()
        self.messages.clear()

    def _emit_started(self):
        self.started.emit()

    def _emit_stopped(self):
        self.stopped.emit()
