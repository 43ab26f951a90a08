"""Protocol message: one line of demodulated bits plus metadata.

Counterpart of urh/signalprocessing/Message.py (657 LoC), trimmed of Qt.
A message owns its plain bits, pause, timestamps, RSSI, an optional
decoder (urh_tpu.coding.encodings.Encoding) and a message type holding
protocol labels.  Decoded/encoded views are lazy and cached.
"""

from __future__ import annotations

import array
from typing import Optional

import numpy as np


class Message:
    def __init__(
        self,
        plain_bits,
        pause: int,
        message_type=None,
        rssi=0.0,
        modulator_index=0,
        decoder=None,
        fuzz_created=False,
        bit_sample_pos=None,
        bits_per_symbol=1,
        samples_per_symbol=100,
        timestamp=0.0,
        participant=None,
    ):
        self.plain_bits = array.array("B", plain_bits)
        self.pause = int(pause)
        self.message_type = message_type
        self.rssi = float(rssi)
        self.modulator_index = modulator_index
        self.fuzz_created = fuzz_created
        self.bit_sample_pos = bit_sample_pos if bit_sample_pos is not None else array.array("L", [])
        self.bits_per_symbol = bits_per_symbol
        self.samples_per_symbol = samples_per_symbol
        self.timestamp = timestamp
        self.participant = participant

        self._decoder = decoder
        self._decoded_bits = None
        self._encoded_bits = None
        self.decoding_state = 0  # Encoding.ErrorState
        self.decoding_errors = 0

    # -- core views ------------------------------------------------------
    def __len__(self):
        return len(self.plain_bits)

    def __getitem__(self, index):
        return self.plain_bits[index]

    def __setitem__(self, index, value):
        self.plain_bits[index] = value
        self.clear_decoded_bits()
        self.clear_encoded_bits()

    @property
    def decoder(self):
        return self._decoder

    @decoder.setter
    def decoder(self, value):
        self._decoder = value
        self.clear_decoded_bits()
        self.clear_encoded_bits()

    def clear_decoded_bits(self):
        self._decoded_bits = None

    def clear_encoded_bits(self):
        self._encoded_bits = None

    @property
    def decoded_bits(self) -> array.array:
        if self._decoded_bits is None:
            if self._decoder is None:
                self._decoded_bits = self.plain_bits
            else:
                bits, errors, state = self._decoder.code(True, self.plain_bits)
                self._decoded_bits = array.array("B", bits)
                self.decoding_errors = errors
                self.decoding_state = state
        return self._decoded_bits

    @property
    def encoded_bits(self) -> array.array:
        if self._encoded_bits is None:
            if self._decoder is None:
                self._encoded_bits = self.plain_bits
            else:
                self._encoded_bits = array.array("B", self._decoder.encode(self.plain_bits))
        return self._encoded_bits

    # -- string views ----------------------------------------------------
    @staticmethod
    def _bits2str(bits) -> str:
        return "".join("1" if b else "0" for b in bits)

    @staticmethod
    def _bits2hex(bits) -> str:
        if len(bits) == 0:
            return ""
        # pad at the end to nibble boundary (reference pads view-side)
        b = list(bits)
        while len(b) % 4 != 0:
            b.append(0)
        return "".join(
            "{0:x}".format(int("".join(map(str, b[i : i + 4])), 2))
            for i in range(0, len(b), 4)
        )

    @property
    def plain_bits_str(self) -> str:
        return self._bits2str(self.plain_bits)

    @property
    def decoded_bits_str(self) -> str:
        return self._bits2str(self.decoded_bits)

    @property
    def plain_hex_str(self) -> str:
        return self._bits2hex(self.plain_bits)

    @property
    def decoded_hex_str(self) -> str:
        return self._bits2hex(self.decoded_bits)

    @property
    def plain_ascii_str(self) -> str:
        return self._bits2ascii(self.plain_bits)

    @property
    def decoded_ascii_str(self) -> str:
        return self._bits2ascii(self.decoded_bits)

    @staticmethod
    def _bits2ascii(bits) -> str:
        b = list(bits)
        while len(b) % 8 != 0:
            b.append(0)
        return "".join(
            chr(int("".join(map(str, b[i : i + 8])), 2)) for i in range(0, len(b), 8)
        )

    # -- labels ----------------------------------------------------------
    @property
    def labels(self):
        return self.message_type if self.message_type is not None else []

    def get_duration(self, sample_rate: float) -> float:
        if len(self.bit_sample_pos) < 2:
            return (len(self.plain_bits) * self.samples_per_symbol + self.pause) / sample_rate
        return (self.bit_sample_pos[-1] - self.bit_sample_pos[0]) / sample_rate

    def __str__(self):
        return self.plain_bits_str

    def __repr__(self):
        return f"Message({self.plain_bits_str!r}, pause={self.pause})"
