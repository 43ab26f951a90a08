"""Network SDR: TCP loopback sample/bit streaming device.

Counterpart of urh/plugins/NetworkSDRInterface (454 LoC, sans GUI):
a TCP server receives raw float32 IQ samples (raw mode) or newline-
terminated bit messages; a TCP client sends raw IQ (optionally
continuously from a ring buffer) or bit messages.  This device doubles
as the hardware-free fake SDR for pipeline and simulator tests,
exactly as in the reference test strategy (SURVEY.md section 4).
"""

from __future__ import annotations

import socket
import socketserver
import threading
import time

import numpy as np

from urh_tpu.core.iq import IQData
from urh_tpu.util import settings
from urh_tpu.util.events import Event
from urh_tpu.util.ringbuffer import RingBuffer


from urh_tpu.plugins.manager import SDRPlugin


class NetworkSDRInterfacePlugin(SDRPlugin):
    DATA_TYPE = np.float32
    NETWORK_SDR_NAME = "Network SDR"

    class _TCPHandler(socketserver.BaseRequestHandler):
        def handle(self):
            size = 2 * np.dtype(NetworkSDRInterfacePlugin.DATA_TYPE).itemsize
            received = self.request.recv(65536 * size)
            data = received
            while received:
                received = self.request.recv(65536 * size)
                data += received

            if len(data) == 0:
                return

            if hasattr(self.server, "received_bits"):
                for chunk in filter(None, data.split(b"\n")):
                    self.server.received_bits.append(
                        NetworkSDRInterfacePlugin.bytearray_to_bit_str(chunk)
                    )
            else:
                while len(data) % size != 0:
                    data += self.request.recv(len(data) % size)
                received_arr = np.frombuffer(data, dtype=NetworkSDRInterfacePlugin.DATA_TYPE)
                received_arr = received_arr.reshape((len(received_arr) // 2, 2))

                if len(received_arr) + self.server.current_receive_index >= len(self.server.receive_buffer):
                    self.server.current_receive_index = 0

                self.server.receive_buffer[
                    self.server.current_receive_index : self.server.current_receive_index + len(received_arr)
                ] = received_arr
                self.server.current_receive_index += len(received_arr)

    def __init__(self, raw_mode=False, resume_on_full_receive_buffer=False,
                 spectrum=False, sending=False):
        super().__init__(name="NetworkSDRInterface")
        self.client_ip = settings.read("network_sdr_client_ip", "127.0.0.1", str)
        self.server_ip = ""

        self.samples_to_send = None  # set by VirtualDevice

        self.client_port = settings.read("network_sdr_client_port", 2222, int)
        self.server_port = settings.read("network_sdr_server_port", 4444, int)

        self.is_in_spectrum_mode = spectrum
        self.resume_on_full_receive_buffer = resume_on_full_receive_buffer
        self._is_sending = False
        self._sending_interrupt_requested = False

        self.sending_repeats = 1  # raw mode only
        self.current_sent_sample = 0
        self.current_sending_repeat = 0

        self.sending_is_continuous = False
        self.continuous_send_ring_buffer = None
        self.num_samples_to_send = None

        # events replacing the Qt signals
        self.sending_status_changed = Event(bool)
        self.sending_stop_requested = Event()
        self.current_send_message_changed = Event(int)
        self.send_connection_established = Event()
        self.receive_server_started = Event()
        self.error_occurred = Event(str)

        self.server = None
        self.raw_mode = raw_mode
        if not sending:
            if self.raw_mode:
                num_samples = settings.get_receive_buffer_size(
                    self.resume_on_full_receive_buffer, self.is_in_spectrum_mode
                )
                self.receive_buffer = IQData(None, dtype=self.DATA_TYPE, n=num_samples)
            else:
                self.received_bits = []

    @property
    def is_sending(self) -> bool:
        return self._is_sending

    @is_sending.setter
    def is_sending(self, value: bool):
        if value != self._is_sending:
            self._is_sending = value
            self.sending_status_changed.emit(self._is_sending)

    @property
    def sending_finished(self) -> bool:
        return self.current_sending_repeat >= self.sending_repeats

    @property
    def received_data(self):
        if self.raw_mode:
            return self.receive_buffer[: self.current_receive_index]
        return self.received_bits

    @property
    def current_receive_index(self):
        if self.server is not None and hasattr(self.server, "current_receive_index"):
            return self.server.current_receive_index
        return 0

    @current_receive_index.setter
    def current_receive_index(self, value):
        if self.server is not None and hasattr(self.server, "current_receive_index"):
            self.server.current_receive_index = value

    def free_data(self):
        if self.raw_mode:
            self.current_receive_index = 0
        else:
            self.received_bits[:] = []

    # -- receiving --------------------------------------------------------
    def start_tcp_server_for_receiving(self):
        self.server = socketserver.TCPServer(
            (self.server_ip, self.server_port), self._TCPHandler, bind_and_activate=False
        )
        self.server.allow_reuse_address = True
        self.server.server_bind()
        self.server.server_activate()
        self.server_port = self.server.server_address[1]
        if self.raw_mode:
            self.server.receive_buffer = self.receive_buffer
            self.server.current_receive_index = 0
        else:
            self.server.received_bits = self.received_bits

        self.server_thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.server_thread.start()
        self.receive_server_started.emit()

    def stop_tcp_server(self):
        if self.server is not None:
            self.server.shutdown()
            self.server.server_close()

    # -- sending ----------------------------------------------------------
    @staticmethod
    def send_data(data, sock: socket.socket) -> str:
        try:
            sock.sendall(data)
            return ""
        except Exception as e:
            return str(e)

    def prepare_send_connection(self):
        try:
            sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            sock.connect((self.client_ip, self.client_port))
            return sock
        except Exception as e:
            self.error_occurred.emit("could not establish connection " + str(e))
            return None

    @staticmethod
    def shutdown_socket(sock):
        try:
            sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        sock.close()

    def send_raw_data(self, data, num_repeats: int):
        byte_data = data.to_bytes() if isinstance(data, IQData) else np.asarray(data).tobytes()
        rng = iter(int, 1) if num_repeats <= 0 else range(num_repeats)  # <= 0: forever

        sock = self.prepare_send_connection()
        if sock is None:
            return
        try:
            for _ in rng:
                if self._sending_interrupt_requested:
                    break
                self.send_data(byte_data, sock)
                self.current_sent_sample = len(data)
                self.current_sending_repeat += 1
        finally:
            self.shutdown_socket(sock)

    def send_raw_data_continuously(self, ring_buffer: RingBuffer,
                                   num_samples_to_send: int, num_repeats: int):
        rng = iter(int, 1) if num_repeats <= 0 else range(num_repeats)
        samples_per_iteration = 65536 // 2
        sock = self.prepare_send_connection()
        if sock is None:
            return
        try:
            for _ in rng:
                if self._sending_interrupt_requested:
                    break
                while (num_samples_to_send is None
                       or self.current_sent_sample < num_samples_to_send):
                    while ring_buffer.is_empty and not self._sending_interrupt_requested:
                        time.sleep(0.1)
                    if self._sending_interrupt_requested:
                        break
                    if num_samples_to_send is None:
                        n = samples_per_iteration
                    else:
                        n = max(0, min(samples_per_iteration,
                                       num_samples_to_send - self.current_sent_sample))
                    data = ring_buffer.pop(n, ensure_even_length=True)
                    if len(data) > 0:
                        self.send_data(data.tobytes(), sock)
                        self.current_sent_sample += len(data)

                self.current_sending_repeat += 1
                self.current_sent_sample = 0

            self.current_sent_sample = num_samples_to_send
        finally:
            self.shutdown_socket(sock)

    def _send_messages(self, messages, sample_rates):
        self.is_sending = True
        sock = self.prepare_send_connection()
        if sock is None:
            return
        try:
            for i, msg in enumerate(messages):
                if self._sending_interrupt_requested:
                    break
                wait_time = msg.pause / sample_rates[i]
                self.current_send_message_changed.emit(i)
                error = self.send_data(self.bit_str_to_bytearray(msg.encoded_bits_str) + b"\n", sock)
                if not error:
                    if self._sending_interrupt_requested:
                        break
                    time.sleep(wait_time)
                else:
                    break
        finally:
            self.is_sending = False
            self.shutdown_socket(sock)

    def start_message_sending_thread(self, messages, sample_rates):
        self._sending_interrupt_requested = False
        self.sending_thread = threading.Thread(target=self._send_messages,
                                               args=(messages, sample_rates), daemon=True)
        self.sending_thread.start()
        self.send_connection_established.emit()

    def start_raw_sending_thread(self):
        self._sending_interrupt_requested = False
        if self.sending_is_continuous:
            self.sending_thread = threading.Thread(
                target=self.send_raw_data_continuously,
                args=(self.continuous_send_ring_buffer, self.num_samples_to_send,
                      self.sending_repeats),
                daemon=True)
        else:
            self.sending_thread = threading.Thread(
                target=self.send_raw_data,
                args=(self.samples_to_send, self.sending_repeats), daemon=True)
        self.sending_thread.start()
        self.send_connection_established.emit()

    def stop_sending_thread(self):
        self._sending_interrupt_requested = True
        if hasattr(self, "sending_thread"):
            self.sending_thread.join()
        self.sending_stop_requested.emit()

    @staticmethod
    def bytearray_to_bit_str(arr) -> str:
        return "".join("{:08b}".format(a) for a in arr)

    @staticmethod
    def bit_str_to_bytearray(bits: str) -> bytearray:
        bits += "0" * ((8 - len(bits) % 8) % 8)
        return bytearray(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
