"""ProtocolAnalyzerContainer: protocol management + fuzzing for TX.

Counterpart of urh/signalprocessing/ProtocolAnalyzerContainer.py:
successive / concurrent / exhaustive fuzzing over label fuzz values,
plus a de Bruijn generator for exhaustive coverage sequences
(urh/cythonext/util.pyx:306-340).
"""

from __future__ import annotations

import array
import copy
import itertools
from enum import Enum

import numpy as np

from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.labels import ProtocolLabel
from urh_tpu.protocol.message import Message


class FuzzMode(Enum):
    successive = 0
    concurrent = 1
    exhaustive = 2


def de_bruijn(n: int) -> array.array:
    """Binary de Bruijn sequence B(2, n): every n-bit value appears exactly
    once as a cyclic substring.  Iterative Lyndon-word construction
    (replaces the reference's recursive C implementation)."""
    k = 2
    a = [0] * (k * n)
    sequence = array.array("B", [])

    def db(t, p):
        if t > n:
            if n % p == 0:
                sequence.extend(a[1 : p + 1])
        else:
            a[t] = a[t - p]
            db(t + 1, p)
            for j in range(a[t - p] + 1, k):
                a[t] = j
                db(t + 1, t)

    db(1, 1)
    return sequence


class ProtocolAnalyzerContainer(ProtocolAnalyzer):
    """Manages multiple protocols for the generator and performs fuzzing."""

    def __init__(self):
        super().__init__(None, filename="")
        self.fuzz_pause = 10000

    @property
    def protocol_labels(self):
        result = list(set(lbl for msg in self.messages for lbl in msg.message_type))
        result.sort()
        return result

    @property
    def pauses(self):
        return [msg.pause for msg in self.messages]

    @property
    def multiple_fuzz_labels_per_message(self):
        return any(len(msg.active_fuzzing_labels) > 1 for msg in self.messages)

    def insert_protocol_analyzer(self, index: int, proto_analyzer: ProtocolAnalyzer):
        for msg in reversed(proto_analyzer.messages):
            self.messages.insert(index, Message(
                plain_bits=msg.decoded_bits, pause=msg.pause,
                message_type=copy.copy(msg.message_type), rssi=msg.rssi,
                modulator_index=0, decoder=msg.decoder,
                samples_per_symbol=msg.samples_per_symbol,
                participant=msg.participant, bits_per_symbol=msg.bits_per_symbol))
        if len(self.pauses) > 0:
            self.fuzz_pause = self.pauses[0]

    def duplicate_lines(self, rows: list):
        for row in reversed(rows):
            self.messages.insert(max(rows) + 1, copy.deepcopy(self.messages[row]))

    def fuzz(self, mode: FuzzMode, default_pause=None):
        result = []
        appd_result = result.append
        added_message_indices = []

        for i, msg in enumerate(self.messages):
            labels = msg.active_fuzzing_labels
            appd_result(msg)

            if mode == FuzzMode.successive:
                combinations = [[(l.start, l.end, fuzz_val)]
                                for l in labels for fuzz_val in l.fuzz_values[1:]]
            elif mode == FuzzMode.concurrent:
                num_values = np.max([len(l.fuzz_values) for l in labels]) if labels else 0
                f = lambda index, label: index if index < len(label.fuzz_values) else 0
                combinations = [[(l.start, l.end, l.fuzz_values[f(j, l)]) for l in labels]
                                for j in range(1, num_values)]
            elif mode == FuzzMode.exhaustive:
                pool = [[(l.start, l.end, fv) for fv in l.fuzz_values[1:]] for l in labels]
                combinations = list(itertools.product(*pool)) if labels else []
            else:
                raise ValueError("unknown fuzz mode")

            message_type = copy.copy(msg.message_type)
            for lbl in labels:
                lbl = copy.copy(lbl)
                lbl.fuzz_values = []
                lbl.fuzz_created = True
                message_type[message_type.index(lbl)] = lbl

            for j, combination in enumerate(combinations):
                cpy_bits = msg.plain_bits[:]
                for start, end, fuz_val in combination:
                    cpy_bits[start:end] = array.array("B", map(int, fuz_val))

                pause = default_pause if default_pause is not None else msg.pause
                fuz_msg = Message(plain_bits=cpy_bits, pause=pause, rssi=msg.rssi,
                                  message_type=message_type,
                                  modulator_index=msg.modulator_index,
                                  decoder=msg.decoder, fuzz_created=True,
                                  participant=msg.participant)
                added_message_indices.append(i + j + 1)
                appd_result(fuz_msg)

        self.messages = result
        return added_message_indices

    def fuzz_successive(self, default_pause=None):
        """One label fuzzed at a time; all others stay at their default."""
        return self.fuzz(FuzzMode.successive, default_pause=default_pause)

    def fuzz_concurrent(self, default_pause=None):
        """All labels iterate simultaneously; exhausted labels fall back to
        their first (default) value."""
        return self.fuzz(FuzzMode.concurrent, default_pause=default_pause)

    def fuzz_exhaustive(self, default_pause=None):
        """Cross product of all label fuzz values."""
        return self.fuzz(FuzzMode.exhaustive, default_pause=default_pause)

    def create_fuzzing_label(self, start, end, msg_index) -> ProtocolLabel:
        return self.messages[msg_index].message_type.add_protocol_label(start=start, end=end)

    def set_decoder_for_messages(self, decoder, messages=None):
        raise NotImplementedError("encoding can't be set in generator")

    def to_xml_file(self, filename: str, decoders, participants, tag_name="fuzz_profile",
                    include_message_types=True, write_bits=True, modulators=None):
        super().to_xml_file(filename=filename, decoders=decoders,
                            participants=participants, tag_name=tag_name,
                            include_message_types=include_message_types,
                            write_bits=write_bits, modulators=modulators)

    def from_xml_file(self, filename: str, read_bits=True):
        super().from_xml_file(filename=filename, read_bits=read_bits)

    @classmethod
    def from_string(cls, message_strings, is_hex=False, default_pause=0, sample_rate=1e6):
        pa = ProtocolAnalyzer.get_protocol_from_string(
            message_strings, is_hex=is_hex, default_pause=default_pause,
            sample_rate=sample_rate)
        container = cls()
        container.messages = pa.messages
        return container

    def clear(self):
        self.messages[:] = []
