"""ProtocolAnalyzer: signal -> messages, plus protocol-level operations.

Counterpart of urh/signalprocessing/ProtocolAnalyzer.py (898 LoC).  The
sample-rate stages (quadrature demod, symbol-state mapping) run on
device; the pulse-sequence -> bit conversion and protocol bookkeeping
are host work.  Includes view conversion, message alignment, XML and
PCAP/PCAPNG export and string parsing with pause syntax.
"""

from __future__ import annotations

import array
import copy
import xml.etree.ElementTree as ET
from xml.dom import minidom

import numpy as np

from urh_tpu.coding.encodings import Encoding, hex2bit
from urh_tpu.dsp import symbols as _symbols
from urh_tpu.protocol.labels import MessageType, Participant
from urh_tpu.protocol.message import Message

PAUSE_TYPE = -1
PAUSE_SEP = "/"


def number_to_bits(n: int, length: int):
    return array.array("B", map(int, format(n, f"0{length}b")))


def ascii2bit(ascii_str: str) -> array.array:
    return array.array("B", (int(b) for c in ascii_str for b in "{0:08b}".format(ord(c))))


def aggregate_bits(bits, size=8):
    result = []
    for i in range(0, len(bits), size):
        h = 0
        for j in range(size):
            if i + j < len(bits):
                h = (h << 1) | bits[i + j]
            else:
                h <<= 1
        result.append(h)
    return result


class ProtocolAnalyzer:
    def __init__(self, signal=None, filename=None):
        self.messages = []
        self.signal = signal
        if filename is None:
            self.filename = self.signal.filename if self.signal is not None else ""
        else:
            assert signal is None
            self.filename = filename

        import os

        self._name = os.path.splitext(os.path.basename(self.filename))[0] if self.filename else "Blank"
        self.show = True
        self.decoder = Encoding(["Non Return To Zero (NRZ)"])
        self.message_types = [MessageType("Default")]

    # -- naming / types ---------------------------------------------------
    @property
    def name(self):
        return self.signal.name if self.signal is not None else self._name

    @name.setter
    def name(self, value: str):
        if self.signal is None:
            self._name = value
        else:
            self.signal.name = value

    @property
    def default_message_type(self) -> MessageType:
        if len(self.message_types) == 0:
            self.message_types.append(MessageType("Default"))
        return self.message_types[0]

    @default_message_type.setter
    def default_message_type(self, val: MessageType):
        if len(self.message_types) > 0:
            self.message_types[0] = val
        else:
            self.message_types.append(val)

    @property
    def protocol_labels(self):
        return [lbl for message_type in self.message_types for lbl in message_type]

    def __deepcopy__(self, memo):
        cls = self.__class__
        result = cls.__new__(cls)
        memo[id(self)] = result
        for k, v in self.__dict__.items():
            if k != "signal":
                setattr(result, k, copy.deepcopy(v, memo))
        result.signal = self.signal
        return result

    # -- views ------------------------------------------------------------
    @property
    def plain_bits_str(self) -> list:
        return [msg.plain_bits_str for msg in self.messages]

    @property
    def decoded_proto_bits_str(self) -> list:
        return [msg.decoded_bits_str for msg in self.messages]

    @property
    def plain_hex_str(self) -> list:
        return [msg.plain_hex_str for msg in self.messages]

    @property
    def decoded_hex_str(self) -> list:
        return [msg.decoded_hex_str for msg in self.messages]

    @property
    def decoded_ascii_str(self) -> list:
        return [msg.decoded_ascii_str for msg in self.messages]

    @property
    def num_messages(self) -> int:
        return len([m for m in self.messages if m])

    def clear_decoded_bits(self):
        for msg in self.messages:
            msg.clear_decoded_bits()

    def decoded_to_str_list(self, view_type):
        if view_type == 0:
            return self.decoded_proto_bits_str
        if view_type == 1:
            return self.decoded_hex_str
        return self.decoded_ascii_str

    def plain_to_string(self, view: int, show_pauses=True) -> str:
        time = self.signal.sample_rate if self.signal else None
        return "\n".join(
            msg.view_to_string(view=view, decoded=False, show_pauses=show_pauses,
                               sample_rate=time)
            for msg in self.messages
        )

    def set_decoder_for_messages(self, decoder: Encoding, messages=None):
        messages = messages if messages is not None else self.messages
        self.decoder = decoder
        for message in messages:
            message.decoder = decoder

    # -- demodulation (hot path) -----------------------------------------
    def get_protocol_from_signal(self):
        signal = self.signal
        if signal is None:
            self.messages = None
            return

        if self.messages is not None:
            self.messages[:] = []
        else:
            self.messages = []
        params = signal.params

        # cheapest route to symbol states: int8 fused kernel avoids qad
        # entirely; float32 fused kernel computes both; host path derives
        # states from qad
        states = (signal.fast_symbol_states()
                  if hasattr(signal, "fast_symbol_states") else None)
        qad = None if states is not None and signal._qad is None else signal.qad
        ppseq = _symbols.grab_pulse_lens(
            qad,
            params.center,
            params.tolerance,
            params.modulation,
            params.samples_per_symbol,
            params.bits_per_symbol,
            params.center_spacing,
            precomputed_states=states,
        )

        bit_data, pauses, bit_sample_pos = self._ppseq_to_bits(
            ppseq, params.samples_per_symbol, params.bits_per_symbol,
            pause_threshold=params.pause_threshold,
        )
        if params.message_length_divisor > 1 and params.modulation == "ASK":
            self._ensure_message_length_multiple(
                bit_data, params.samples_per_symbol, pauses, bit_sample_pos,
                params.message_length_divisor,
            )

        for i, (bits, pause) in enumerate(zip(bit_data, pauses)):
            middle_bit_pos = bit_sample_pos[i][int(len(bits) / 2)]
            start, end = middle_bit_pos, middle_bit_pos + params.samples_per_symbol
            rssi = np.mean(signal.iq_array.subarray(start, end).magnitudes_normalized)
            timestamp = signal.timestamp + bit_sample_pos[i][0] / params.sample_rate
            self.messages.append(
                Message(bits, pause,
                        message_type=self.default_message_type,
                        samples_per_symbol=params.samples_per_symbol,
                        rssi=rssi, decoder=self.decoder,
                        bit_sample_pos=bit_sample_pos[i],
                        bits_per_symbol=params.bits_per_symbol,
                        timestamp=timestamp)
            )
        return self.messages

    @staticmethod
    def _ensure_message_length_multiple(bit_data, samples_per_symbol, pauses,
                                        bit_sample_pos, divisor):
        """Use pause samples as trailing zero bits so ASK message lengths hit
        a multiple of ``divisor`` (ProtocolAnalyzer.py:289-321)."""
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

    # -- sample <-> bit mapping (ProtocolAnalyzer.py:416-487) ------------
    def get_samplepos_of_bitseq(self, start_message: int, start_index: int,
                                end_message: int, end_index: int, include_pause: bool):
        try:
            if start_message > end_message:
                start_message, end_message = end_message, start_message
            if start_index >= len(self.messages[start_message].bit_sample_pos) - 1:
                start_index = len(self.messages[start_message].bit_sample_pos) - 1
                if not include_pause:
                    start_index -= 1
            if end_index >= len(self.messages[end_message].bit_sample_pos) - 1:
                end_index = len(self.messages[end_message].bit_sample_pos) - 1
                if not include_pause:
                    end_index -= 1

            start = self.messages[start_message].bit_sample_pos[start_index]
            num_samples = self.messages[end_message].bit_sample_pos[end_index] - start
            return start, num_samples
        except (KeyError, IndexError):
            return -1, -1

    def get_bitseq_from_selection(self, selection_start: int, selection_width: int):
        start_message, start_index, end_message, end_index = -1, -1, -1, -1
        if not self.messages or not self.messages[0].bit_sample_pos:
            return start_message, start_index, end_message, end_index
        if selection_start + selection_width < self.messages[0].bit_sample_pos[0]:
            return start_message, start_index, end_message, end_index

        for i, msg in enumerate(self.messages):
            msg_sample_pos = msg.bit_sample_pos
            if msg_sample_pos[-2] < selection_start:
                continue
            if start_message == -1:
                start_message = i
                for j, sample_pos in enumerate(msg_sample_pos):
                    if sample_pos < selection_start:
                        continue
                    if start_index == -1:
                        start_index = j
                        if msg_sample_pos[-1] - selection_start < selection_width:
                            break
                    elif sample_pos - selection_start > selection_width:
                        return start_message, start_index, i, j
            elif msg_sample_pos[-1] - selection_start < selection_width:
                continue
            else:
                for j, sample_pos in enumerate(msg_sample_pos):
                    if sample_pos - selection_start > selection_width:
                        return start_message, start_index, i, j

        last_message = len(self.messages) - 1
        last_index = len(self.messages[-1].plain_bits) + 1
        return start_message, start_index, last_message, last_index

    # -- editing ----------------------------------------------------------
    def delete_messages(self, msg_start: int, msg_end: int, start: int, end: int,
                        view: int, decoded: bool, update_label_ranges=True):
        removable = []
        for i in range(msg_start, msg_end + 1):
            try:
                bs, be = self.convert_range(start, end, view, 0, decoded, message_indx=i)
                self.messages[i].clear_decoded_bits()
                if update_label_ranges:
                    del self.messages[i][bs : be + 1]
                else:
                    self.messages[i].delete_range_without_label_range_update(bs, be + 1)
                if len(self.messages[i]) == 0:
                    removable.append(i)
            except IndexError:
                continue
        for i in reversed(removable):
            del self.messages[i]
        return removable

    def convert_index(self, index, from_view, to_view, decoded, message_indx=-1):
        if len(self.messages) == 0:
            return 0, 0
        if message_indx == -1:
            message_indx = self.messages.index(max(self.messages, key=len))
        if message_indx >= len(self.messages):
            message_indx = len(self.messages) - 1
        return self.messages[message_indx].convert_index(index, from_view, to_view, decoded)

    def convert_range(self, index1, index2, from_view, to_view, decoded, message_indx=-1):
        if len(self.messages) == 0:
            return 0, 0
        if message_indx == -1:
            message_indx = self.messages.index(max(self.messages, key=len))
        if message_indx >= len(self.messages):
            message_indx = len(self.messages) - 1
        return self.messages[message_indx].convert_range(index1, index2, from_view,
                                                         to_view, decoded)

    def align_messages(self, pattern: str, view_type: int, use_decoded=True):
        if view_type == 0:
            bit_pattern = pattern
        elif view_type == 1:
            bit_pattern = "".join(map(str, hex2bit(pattern)))
        elif view_type == 2:
            bit_pattern = "".join(map(str, ascii2bit(pattern)))
        else:
            raise ValueError(f"unknown view type {view_type}")

        indices = [
            msg.decoded_bits_str.find(bit_pattern) if use_decoded
            else msg.plain_bits_str.find(bit_pattern)
            for msg in self.messages
        ]
        max_index = max(indices) if indices else 0
        for i, msg in enumerate(self.messages):
            msg.alignment_offset = 0 if indices[i] == -1 else max_index - indices[i]

    # -- frequency estimation ---------------------------------------------
    def estimate_frequency_for_one(self, sample_rate: float, nbits=42) -> float:
        return self._estimate_frequency_for_bit(True, sample_rate, nbits)

    def estimate_frequency_for_zero(self, sample_rate: float, nbits=42) -> float:
        return self._estimate_frequency_for_bit(False, sample_rate, nbits)

    def _estimate_frequency_for_bit(self, bit: bool, sample_rate: float, nbits: int) -> float:
        if nbits == 0:
            return 0
        assert self.signal is not None
        frequencies = []
        for i, message in enumerate(self.messages):
            for j, msg_bit in enumerate(message.plain_bits):
                if msg_bit == bit:
                    start, num_samples = self.get_samplepos_of_bitseq(i, j, i, j + 1, False)
                    freq = self.signal.estimate_frequency(start, start + num_samples, sample_rate)
                    frequencies.append(freq)
                    if len(frequencies) == nbits:
                        return np.mean(frequencies)
        return np.mean(frequencies) if frequencies else 0

    def __str__(self):
        return "ProtoAnalyzer " + self.name

    # -- message types -----------------------------------------------------
    def add_new_message_type(self, labels):
        names = set(mt.name for mt in self.message_types)
        i = 0
        while True:
            i += 1
            name = "Message type #" + str(i)
            if name not in names:
                self.message_types.append(
                    MessageType(name=name, iterable=[copy.deepcopy(lbl) for lbl in labels])
                )
                break

    def update_auto_message_types(self):
        for message in self.messages:
            for message_type in filter(
                lambda m: m.assigned_by_ruleset and len(m.ruleset) > 0, self.message_types
            ):
                if message_type.ruleset.applies_for_message(message):
                    message.message_type = message_type
                    break

    def auto_assign_labels(self):
        from urh_tpu.awre.format_finder import FormatFinder

        format_finder = FormatFinder(self.messages)
        format_finder.run(max_iterations=10)
        self.message_types[:] = format_finder.message_types
        for msg_type, indices in format_finder.existing_message_types.items():
            for i in indices:
                self.messages[i].message_type = msg_type

    def eliminate(self):
        self.message_types = None
        self.messages = None
        self.signal = None

    # -- persistence -------------------------------------------------------
    def to_binary(self, filename: str, use_decoded: bool):
        with open(filename, "wb") as f:
            for msg in self.messages:
                bits = msg.decoded_bits if use_decoded else msg.plain_bits
                f.write(bytes(aggregate_bits(bits, size=8)))

    def from_binary(self, filename: str):
        aggregated = np.fromfile(filename, dtype=np.uint8)
        unaggregated = [int(b) for n in aggregated for b in "{0:08b}".format(n)]
        self.messages.append(Message(unaggregated, 0, self.default_message_type))

    def to_xml_tag(self, decodings, participants, tag_name="protocol",
                   include_message_type=False, write_bits=False, messages=None,
                   modulators=None) -> ET.Element:
        root = ET.Element(tag_name)
        messages = self.messages if messages is None else messages

        if modulators is not None:
            from urh_tpu.dsp.modulator import Modulator

            root.append(Modulator.modulators_to_xml_tag(modulators))

        root.append(Encoding.decodings_to_xml_tag(decodings))
        root.append(Participant.participants_to_xml_tag(participants))

        data_tag = ET.SubElement(root, "messages")
        for message in messages:
            data_tag.append(message.to_xml(decoders=decodings,
                                           include_message_type=include_message_type,
                                           write_bits=write_bits))

        if not include_message_type:
            message_types_tag = ET.SubElement(root, "message_types")
            for message_type in self.message_types:
                message_types_tag.append(message_type.to_xml())
        return root

    def to_xml_file(self, filename: str, decoders, participants, tag_name="protocol",
                    include_message_types=False, write_bits=False, modulators=None):
        tag = self.to_xml_tag(decodings=decoders, participants=participants,
                              tag_name=tag_name, include_message_type=include_message_types,
                              write_bits=write_bits, modulators=modulators)
        xmlstr = minidom.parseString(ET.tostring(tag)).toprettyxml(indent="   ")
        with open(filename, "w") as f:
            for line in xmlstr.split("\n"):
                if line.strip():
                    f.write(line + "\n")

    def from_xml_tag(self, root: ET.Element, read_bits=False, participants=None,
                     decodings=None):
        if root is None or len(root) == 0:
            return None

        decoders = Encoding.read_decoders_from_xml_tag(root) if decodings is None else decodings
        if participants is None:
            participants = Participant.read_participants_from_xml_tag(root)

        if read_bits:
            self.messages[:] = []

        try:
            message_types = [MessageType.from_xml(tag)
                             for tag in root.find("message_types").findall("message_type")]
        except AttributeError:
            message_types = []

        for message_type in message_types:
            if message_type not in self.message_types:
                self.message_types.append(message_type)

        try:
            message_tags = root.find("messages").findall("message")
            for i, message_tag in enumerate(message_tags):
                if read_bits:
                    self.messages.append(
                        Message.new_from_xml(tag=message_tag, participants=participants,
                                             decoders=decoders, message_types=self.message_types)
                    )
                else:
                    try:
                        self.messages[i].from_xml(tag=message_tag, participants=participants,
                                                  decoders=decoders,
                                                  message_types=self.message_types)
                    except IndexError:
                        pass
        except AttributeError:
            pass

    def from_xml_file(self, filename: str, read_bits=False):
        try:
            tree = ET.parse(filename)
        except (FileNotFoundError, ET.ParseError):
            return
        self.from_xml_tag(tree.getroot(), read_bits=read_bits)

    def to_pcapng(self, filename: str, hardware_desc_name: str = "", link_type: int = 147):
        from urh_tpu.dev import pcapng

        pcapng.create_pcapng_file(filename=filename, shb_userappl="urh_tpu",
                                  shb_hardware=hardware_desc_name, link_type=link_type)
        pcapng.append_packets_to_pcapng(
            filename=filename,
            packets=(msg.decoded_ascii_buffer for msg in self.messages),
            timestamps=(msg.timestamp for msg in self.messages),
        )

    # -- string parsing (ProtocolAnalyzer.py:842-898) ----------------------
    @staticmethod
    def get_protocol_from_string(message_strings: list, is_hex=None, default_pause=0,
                                 sample_rate=1e6) -> "ProtocolAnalyzer":
        protocol = ProtocolAnalyzer(None)

        def parse_line(line: str):
            # support transcript files, e.g. "1 (A->B): 10101111"
            index = line.rfind(" ")
            line = line[index + 1 :]
            # support pauses like 100101/10s
            try:
                data, pause = line.split(PAUSE_SEP)
            except ValueError:
                data, pause = line, str(default_pause)
            if pause.endswith("ms"):
                pause = float(pause[:-2]) * float(sample_rate) / 1e3
            elif pause.endswith("µs") or pause.endswith("us"):
                pause = float(pause[:-2]) * float(sample_rate) / 1e6
            elif pause.endswith("ns"):
                pause = float(pause[:-2]) * float(sample_rate) / 1e9
            elif pause.endswith("s"):
                pause = float(pause[:-1]) * float(sample_rate)
            else:
                pause = float(pause)
            return data, int(pause)

        if not is_hex:
            for line in filter(None, map(str.strip, message_strings)):
                bits, pause = parse_line(line)
                try:
                    protocol.messages.append(Message.from_plain_bits_str(bits, pause=pause))
                except ValueError:
                    is_hex = True if is_hex is None else is_hex
                    break

        if is_hex:
            protocol.messages.clear()
            lookup = {"{0:0x}".format(i): "{0:04b}".format(i) for i in range(16)}
            for line in filter(None, map(str.strip, message_strings)):
                bits, pause = parse_line(line)
                bit_str = [lookup[bits[i].lower()] for i in range(len(bits))]
                protocol.messages.append(
                    Message.from_plain_bits_str("".join(bit_str), pause=pause)
                )
        return protocol


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
