"""Classic PCAP export (urh/dev/PCAP.py counterpart): nanosecond-
resolution global header + per-packet records, link type 147."""

from __future__ import annotations

import struct
import time


class PCAP:
    def __init__(self):
        self.timestamp_sec = None
        self.timestamp_nsec = None

    def reset_timestamp(self):
        self.timestamp_sec = None
        self.timestamp_nsec = None

    def build_global_header(self) -> bytes:
        MAGIC_NUMBER = 0xA1B23C4D  # nanosecond resolution
        self.reset_timestamp()
        return struct.pack(">IHHiIII", MAGIC_NUMBER, 2, 4, 0, 0, 65535, 147)

    def build_packet(self, ts_sec: int, ts_nsec: int, data: bytes) -> bytes:
        if self.timestamp_nsec is None or self.timestamp_sec is None:
            self.timestamp_sec, self.timestamp_nsec = self.get_seconds_nseconds(time.time())
        self.timestamp_sec += int(ts_sec)
        self.timestamp_nsec += int(ts_nsec)
        if self.timestamp_nsec >= 1e9:
            self.timestamp_sec += int(self.timestamp_nsec / 1e9)
            self.timestamp_nsec = int(self.timestamp_nsec % 1e9)
        length = len(data)
        return struct.pack(">IIII", self.timestamp_sec, self.timestamp_nsec, length, length) + data

    def write_packets(self, packets, filename: str, sample_rate: int):
        with open(filename, "wb") as f:
            f.write(self.build_global_header())
        with open(filename, "ab") as f:
            rel_time_offset_ns = 0
            for pkt in packets:
                f.write(self.build_packet(0, rel_time_offset_ns, pkt.decoded_bits_buffer))
                rel_time_offset_ns = pkt.get_duration(sample_rate) * 10 ** 9

    @staticmethod
    def get_seconds_nseconds(timestamp):
        seconds = int(timestamp)
        nseconds = int((timestamp - seconds) * 10 ** 9)
        return seconds, nseconds
