"""Pure-Python rtl_tcp client device (urh/dev/native/RTLSDRTCP.py
counterpart): speaks the osmocom rtl_tcp wire protocol over a socket,
no vendor library needed."""

from __future__ import annotations

import select
import socket

import numpy as np

from urh_tpu.dev.device import Device
from urh_tpu.util.logging import logger


class RTLSDRTCP(Device):
    MAXDATASIZE = 65536
    ENDIAN = "big"
    RTL_TCP_CONSTS = {
        "centerFreq": 0x01,
        "sampleRate": 0x02,
        "tunerGainMode": 0x03,
        "tunerGain": 0x04,
        "freqCorrection": 0x05,
        "tunerIFGain": 0x06,
        "testMode": 0x07,
        "agcMode": 0x08,
        "directSampling": 0x09,
        "offsetTuning": 0x0A,
        "rtlXtalFreq": 0x0B,
        "tunerXtalFreq": 0x0C,
        "gainByIndex": 0x0D,
        "biasTee": 0x0E,
        "bandwidth": 0x40,  # pinkavaj/rtl-sdr only; osmocom ignores it
    }

    DATA_TYPE = np.int8

    TUNER_NAMES = {1: "E4000", 2: "FC0012", 3: "FC0013", 4: "FC2580",
                   5: "R820T", 6: "R828D"}

    @staticmethod
    def receive_sync(data_connection, ctrl_connection, device_number, center_freq,
                     sample_rate, bandwidth, gain, freq_correction,
                     direct_sampling_mode, bias_tee_enabled, device_ip, port):
        sdr = RTLSDRTCP(center_freq, gain, sample_rate, bandwidth, device_number)
        sdr.open(ctrl_connection, device_ip, port)
        if sdr.socket_is_open:
            sdr.device_number = device_number
            sdr.set_parameter("centerFreq", int(center_freq), ctrl_connection)
            sdr.set_parameter("sampleRate", int(sample_rate), ctrl_connection)
            sdr.set_parameter("bandwidth", int(bandwidth), ctrl_connection)
            sdr.set_parameter("freqCorrection", int(freq_correction), ctrl_connection)
            sdr.set_parameter("directSampling", int(direct_sampling_mode), ctrl_connection)
            sdr.set_parameter("biasTee", int(bias_tee_enabled), ctrl_connection)
            # gain last: earlier writes reset it on the dongle
            sdr.set_parameter("tunerGain", int(gain), ctrl_connection)

            exit_requested = False
            while not exit_requested:
                while ctrl_connection.poll():
                    result = sdr.process_command(ctrl_connection.recv(), ctrl_connection)
                    if result == "stop" or result == Device.Command.STOP:
                        exit_requested = True
                        break
                if not exit_requested:
                    data_connection.send_bytes(sdr.read_sync())
            sdr.close()
        else:
            ctrl_connection.send("Could not connect to rtl_tcp:404")
        ctrl_connection.send("close:0")
        data_connection.close()
        ctrl_connection.close()

    def process_command(self, command, ctrl_connection, is_tx=False):
        if command == self.Command.STOP.name:
            return self.Command.STOP

        tag, value = command
        mapping = {
            self.Command.SET_FREQUENCY.name: "centerFreq",
            self.Command.SET_RF_GAIN.name: "tunerGain",
            self.Command.SET_IF_GAIN.name: "tunerIFGain",
            self.Command.SET_SAMPLE_RATE.name: "sampleRate",
            self.Command.SET_BANDWIDTH.name: "bandwidth",
            self.Command.SET_FREQUENCY_CORRECTION.name: "freqCorrection",
            self.Command.SET_DIRECT_SAMPLING_MODE.name: "directSampling",
        }
        if tag in mapping:
            return self.set_parameter(mapping[tag], int(value), ctrl_connection)

    def __init__(self, freq, gain, srate, bandwidth, device_number,
                 resume_on_full_receive_buffer=False):
        super().__init__(center_freq=freq, sample_rate=srate, bandwidth=bandwidth,
                         gain=gain, if_gain=1, baseband_gain=1,
                         resume_on_full_receive_buffer=resume_on_full_receive_buffer)
        self.receive_process_function = self.receive_sync
        self.device_number = device_number
        self.socket_is_open = False
        self.success = 0
        self.port = 1234

    @property
    def receive_process_arguments(self):
        return (self.child_data_conn, self.child_ctrl_conn, self.device_number,
                self.frequency, self.sample_rate, self.bandwidth, self.gain,
                self.freq_correction, self.direct_sampling_mode,
                self.bias_tee_enabled, self.device_ip, self.port)

    def open(self, ctrl_connection, hostname="127.0.0.1", port=1234):
        if self.socket_is_open:
            return
        try:
            self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM, socket.IPPROTO_TCP)
            self.sock.connect((hostname, port))
        except Exception as e:
            self.socket_is_open = False
            ctrl_connection.send("Could not connect to rtl_tcp at {0} [{1}] ({2}):1".format(
                hostname, port, e))
            return False

        try:
            init_data = self.sock.recv(self.MAXDATASIZE)
            if len(init_data) != 12 or init_data[0:4] != b"RTL0":
                return False
            tuner_number = int.from_bytes(init_data[4:8], self.ENDIAN)
            self.tuner = self.TUNER_NAMES.get(tuner_number, "Unknown")
            self.if_gain = int.from_bytes(init_data[8:10], self.ENDIAN)
            self.rf_gain = int.from_bytes(init_data[10:12], self.ENDIAN)
            ctrl_connection.send(
                "Connected to rtl_tcp at {0}[{1}] (Tuner={2}, RF-Gain={3}, IF-Gain={4}):0".format(
                    hostname, port, self.tuner, self.rf_gain, self.if_gain))
        except Exception as e:
            self.socket_is_open = False
            logger.info("not a valid rtl_tcp server at {0}:{1} ({2})".format(hostname, port, e))
            return False

        self.socket_is_open = True

    def close(self):
        if self.socket_is_open:
            self.socket_is_open = False
        return self.sock.close()

    def set_parameter(self, param: str, value: int, ctrl_connection) -> bool:
        if self.socket_is_open:
            msg = self.RTL_TCP_CONSTS[param].to_bytes(1, self.ENDIAN)
            msg += value.to_bytes(4, self.ENDIAN)
            try:
                self.sock.sendall(msg)
            except OSError as e:
                self.sock.close()
                ctrl_connection.send("Could not set parameter {0} {1} ({2}):1".format(param, value, e))
                return True
        return False

    def read_sync(self):
        s_read, _, _ = select.select([self.sock], [], [], 0.1)
        if self.sock in s_read:
            return self.sock.recv(self.MAXDATASIZE)
        return b""

    @staticmethod
    def bytes_to_iq(buffer):
        return np.subtract(np.frombuffer(buffer, dtype=np.int8), 127).reshape((-1, 2), order="C")
