"""ProtocolAnalyzer: signal -> messages.

Counterpart of urh/signalprocessing/ProtocolAnalyzer.py:227-447.  The
sample-rate stages (quadrature demod, symbol-state mapping) run on
device; the pulse-sequence -> bit conversion is small host work.
"""

from __future__ import annotations

import array

import numpy as np

from urh_tpu.dsp import symbols as _symbols
from urh_tpu.protocol.message import Message

PAUSE_TYPE = -1


def number_to_bits(n: int, length: int):
    return array.array("B", map(int, format(n, f"0{length}b")))


class ProtocolAnalyzer:
    def __init__(self, signal=None):
        self.signal = signal
        self.messages = []
        self.decoder = None
        self.default_message_type = None
        self.name = "Blank"

    @property
    def plain_bits_str(self) -> list:
        return [msg.plain_bits_str for msg in self.messages]

    @property
    def decoded_hex_str(self) -> list:
        return [msg.decoded_hex_str for msg in self.messages]

    @property
    def num_messages(self) -> int:
        return len([m for m in self.messages if m])

    def get_protocol_from_signal(self):
        signal = self.signal
        if signal is None:
            self.messages = None
            return

        self.messages = []
        params = signal.params

        ppseq = _symbols.grab_pulse_lens(
            signal.qad,
            params.center,
            params.tolerance,
            params.modulation,
            params.samples_per_symbol,
            params.bits_per_symbol,
            params.center_spacing,
        )

        bit_data, pauses, bit_sample_pos = self._ppseq_to_bits(
            ppseq,
            params.samples_per_symbol,
            params.bits_per_symbol,
            pause_threshold=params.pause_threshold,
        )
        if params.message_length_divisor > 1 and params.modulation == "ASK":
            self._ensure_message_length_multiple(
                bit_data,
                params.samples_per_symbol,
                pauses,
                bit_sample_pos,
                params.message_length_divisor,
            )

        for i, (bits, pause) in enumerate(zip(bit_data, pauses)):
            middle_bit_pos = bit_sample_pos[i][int(len(bits) / 2)]
            start, end = middle_bit_pos, middle_bit_pos + params.samples_per_symbol
            rssi = np.mean(signal.iq_array.subarray(start, end).magnitudes_normalized)
            timestamp = signal.timestamp + bit_sample_pos[i][0] / params.sample_rate
            self.messages.append(
                Message(
                    bits,
                    pause,
                    message_type=self.default_message_type,
                    samples_per_symbol=params.samples_per_symbol,
                    rssi=rssi,
                    decoder=self.decoder,
                    bit_sample_pos=bit_sample_pos[i],
                    bits_per_symbol=params.bits_per_symbol,
                    timestamp=timestamp,
                )
            )
        return self.messages

    @staticmethod
    def _ensure_message_length_multiple(bit_data, samples_per_symbol, pauses, bit_sample_pos, divisor):
        """Use pause samples as trailing zero bits so ASK message lengths hit a
        multiple of ``divisor`` (ProtocolAnalyzer.py:289-321)."""
        for i in range(len(bit_data)):
            missing_bits = (divisor - (len(bit_data[i]) % divisor)) % divisor
            if missing_bits > 0 and pauses[i] >= samples_per_symbol * missing_bits:
                bit_data[i].extend([0] * missing_bits)
                pauses[i] = pauses[i] - missing_bits * samples_per_symbol
                try:
                    bit_sample_pos[i][-1] = bit_sample_pos[i][-2] + samples_per_symbol
                except IndexError:
                    continue
                bit_sample_pos[i].extend(
                    bit_sample_pos[i][-1] + (k + 1) * samples_per_symbol
                    for k in range(missing_bits - 1)
                )
                bit_sample_pos[i].append(bit_sample_pos[i][-1] + pauses[i])

    @staticmethod
    def _ppseq_to_bits(ppseq, samples_per_symbol: int, bits_per_symbol: int,
                       write_bit_sample_pos=True, pause_threshold=8):
        """Pulse (state, length) runs -> per-message bit arrays + pauses
        (ProtocolAnalyzer.py:323-414)."""
        bit_sampl_pos = array.array("L", [])
        bit_sample_positions = []

        data_bits = array.array("B", [])
        resulting_data_bits = []
        pauses = array.array("L", [])
        start = 0
        total_samples = 0
        there_was_data = False

        samples_per_bit = int(samples_per_symbol / bits_per_symbol)

        if len(ppseq) > 0 and ppseq[0, 0] == PAUSE_TYPE:
            start = 1
            total_samples = int(ppseq[0, 1])

        for i in range(start, len(ppseq)):
            cur_pulse_type = int(ppseq[i, 0])
            num_samples = int(ppseq[i, 1])
            num_symbols_float = num_samples / samples_per_symbol
            num_symbols = int(num_symbols_float)
            if num_symbols_float - num_symbols > 0.5:
                num_symbols += 1

            if cur_pulse_type == PAUSE_TYPE:
                if num_symbols <= pause_threshold or pause_threshold == 0:
                    # short pause -> zero bits (OOK)
                    data_bits.extend([0] * (num_symbols * bits_per_symbol))
                    if write_bit_sample_pos:
                        bit_sampl_pos.extend(
                            total_samples + k * samples_per_bit
                            for k in range(num_symbols * bits_per_symbol)
                        )
                elif not there_was_data:
                    # ignore pause: nothing transmitted before it
                    data_bits = array.array("B", [])
                    bit_sampl_pos = array.array("L", [])
                else:
                    # long pause -> message boundary
                    if write_bit_sample_pos:
                        bit_sampl_pos.append(total_samples)
                        bit_sampl_pos.append(total_samples + num_samples)
                        bit_sample_positions.append(bit_sampl_pos[:])
                        bit_sampl_pos = array.array("L", [])
                    resulting_data_bits.append(data_bits[:])
                    data_bits = array.array("B", [])
                    pauses.append(num_samples)
                    there_was_data = False
            else:
                data_bits.extend(number_to_bits(cur_pulse_type, bits_per_symbol) * num_symbols)
                if not there_was_data and num_symbols > 0:
                    there_was_data = True
                if write_bit_sample_pos:
                    bit_sampl_pos.extend(
                        total_samples + k * samples_per_bit
                        for k in range(num_symbols * bits_per_symbol)
                    )

            total_samples += num_samples

        if there_was_data:
            resulting_data_bits.append(data_bits[:])
            if write_bit_sample_pos:
                bit_sample_positions.append(bit_sampl_pos[:] + array.array("L", [total_samples]))
            pause = int(ppseq[-1, 1]) if ppseq[-1, 0] == PAUSE_TYPE else 0
            pauses.append(pause)

        return resulting_data_bits, pauses, bit_sample_positions

    # -- string parsing (ProtocolAnalyzer.py:842) ------------------------
    @staticmethod
    def get_protocol_from_string(message_strings, is_hex=False, default_pause=0, sample_rate=1e6):
        """Parse lines like ``101010/1ms`` (bits, optional pause suffix)."""
        from urh_tpu.protocol.container import ProtocolAnalyzerContainer

        return ProtocolAnalyzerContainer.from_string(
            message_strings, is_hex=is_hex, default_pause=default_pause, sample_rate=sample_rate
        )


def demodulate(signal, params=None) -> list:
    """One-call demodulation: Signal (or IQ array) -> list of Messages."""
    from urh_tpu.core.signal import Signal

    if not isinstance(signal, Signal):
        signal = Signal.from_iq(signal)
    if params is not None:
        signal.params = params
        signal._qad = None
    analyzer = ProtocolAnalyzer(signal)
    analyzer.get_protocol_from_signal()
    return analyzer.messages
