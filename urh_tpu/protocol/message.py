"""Protocol message: one line of demodulated bits plus metadata.

Counterpart of urh/signalprocessing/Message.py (657 LoC) without Qt.
A message owns its plain bits, pause, timestamp, RSSI, an optional
decoder (urh_tpu.coding.encodings.Encoding) and a message type holding
protocol labels.  Decoded/encoded views are lazy, label-aware (labels
excluded from decoding pass through raw) and cached; hex/ASCII views
align at label boundaries.
"""

from __future__ import annotations

import array
import math
import xml.etree.ElementTree as ET

from urh_tpu.protocol.labels import FieldType, MessageType, Participant, ProtocolLabel


class Message:
    def __init__(self, plain_bits, pause: int, message_type: MessageType = None,
                 rssi=0.0, modulator_index=0, decoder=None, fuzz_created=False,
                 bit_sample_pos=None, bits_per_symbol=1, samples_per_symbol=100,
                 timestamp=0.0, participant=None):
        self._plain_bits = array.array("B", plain_bits)
        self.pause = int(pause)
        self.message_type = message_type if message_type is not None else MessageType("none")
        self.rssi = float(rssi)
        self.modulator_index = modulator_index
        self.fuzz_created = fuzz_created
        self.bit_sample_pos = bit_sample_pos if bit_sample_pos is not None else array.array("L", [])
        self.bits_per_symbol = bits_per_symbol
        self.samples_per_symbol = samples_per_symbol
        self.timestamp = timestamp
        self.participant = participant

        self.align_labels = True
        self.alignment_offset = 0
        self._bit_alignments = []

        self._decoded_bits = None
        self._encoded_bits = None
        self.decoding_state = "success"
        self.decoding_errors = 0
        self._decoder = None
        if decoder is not None:
            self.decoder = decoder

    # -- bits ------------------------------------------------------------
    @property
    def plain_bits(self) -> array.array:
        return self._plain_bits

    @plain_bits.setter
    def plain_bits(self, value):
        self._plain_bits = array.array("B", value)
        self.clear_decoded_bits()
        self.clear_encoded_bits()

    @property
    def active_fuzzing_labels(self):
        return [lbl for lbl in self.message_type if lbl.active_fuzzing]

    @property
    def exclude_from_decoding_labels(self):
        return [lbl for lbl in self.message_type if not lbl.apply_decoding]

    def __getitem__(self, index):
        return self.plain_bits[index]

    def __setitem__(self, index, value):
        self.plain_bits[index] = value
        self.clear_decoded_bits()
        self.clear_encoded_bits()

    def __add__(self, other):
        return self._plain_bits + other._plain_bits

    def __len__(self):
        return len(self.plain_bits)

    def __str__(self):
        return self.bits2string(self.plain_bits)

    def __repr__(self):
        return f"Message({self.plain_bits_str!r}, pause={self.pause})"

    @staticmethod
    def bits2string(bits) -> str:
        return "".join(map(str, bits))

    def insert(self, index: int, item):
        self.plain_bits.insert(index, item)
        self.clear_decoded_bits()
        self.clear_encoded_bits()

    def _remove_labels_for_range(self, index, instant_remove=True):
        """Drop/shift labels affected by a bit-range deletion
        (Message.py:152-185)."""
        if isinstance(index, int):
            index = slice(index, index + 1, 1)
        start = index.start if index.start is not None else 0
        stop = index.stop
        step = index.step if index.step is not None else 1

        removed = []
        for lbl in list(self.message_type):
            if ((start <= lbl.start and stop >= lbl.end)
                    or start <= lbl.start <= stop
                    or (start >= lbl.start and stop <= lbl.end)
                    or lbl.start <= start < lbl.end):
                if instant_remove:
                    self.message_type.remove(lbl)
                removed.append(lbl)
            elif stop - 1 < lbl.start:
                number_elements = len(range(start, stop, step))
                l_cpy = lbl.get_copy()
                l_cpy.start -= number_elements
                l_cpy.end -= number_elements
                if instant_remove:
                    self.message_type.remove(lbl)
                    self.message_type.append(l_cpy)
        return removed

    def __delitem__(self, index):
        self._remove_labels_for_range(index)
        del self.plain_bits[index]
        self.clear_decoded_bits()
        self.clear_encoded_bits()

    def delete_range_without_label_range_update(self, start: int, end: int):
        del self.plain_bits[start:end]
        self.clear_decoded_bits()
        self.clear_encoded_bits()

    # -- decoding --------------------------------------------------------
    @property
    def decoder(self):
        return self._decoder

    @decoder.setter
    def decoder(self, val):
        self._decoder = val
        self.clear_decoded_bits()
        self.clear_encoded_bits()
        if val is not None:
            self.decoding_errors, self.decoding_state = val.analyze(self.plain_bits)

    @property
    def decoded_bits(self) -> array.array:
        """Label-aware decode: ranges under apply_decoding=False labels pass
        through raw (Message.py:260-300)."""
        if self._decoded_bits is None:
            if self._decoder is None:
                self._decoded_bits = self._plain_bits
                return self._decoded_bits
            self._decoded_bits = array.array("B", [])
            start = 0
            code = self._decoder.code
            bits = self.plain_bits
            self.decoding_errors = 0
            states = set()
            self.decoding_state = self._decoder.ErrorState.SUCCESS
            for label in self.exclude_from_decoding_labels:
                decoded, errors, state = code(True, bits[start : label.start])
                states.add(state)
                self._decoded_bits.extend(decoded)
                self.decoding_errors += errors
                if label.start == -1 or label.end == -1:
                    label.start = len(self._decoded_bits)
                    label.end = label.start + (label.end - label.start)
                start = label.start if label.start > start else start
                self._decoded_bits.extend(bits[start : label.end])
                start = label.end if label.end > start else start

            decoded, errors, state = code(True, bits[start:])
            states.add(state)
            self._decoded_bits.extend(decoded)
            self.decoding_errors += errors

            states.discard(self._decoder.ErrorState.SUCCESS)
            if len(states) > 0:
                self.decoding_state = sorted(states)[0]
        return self._decoded_bits

    @decoded_bits.setter
    def decoded_bits(self, val):
        self._decoded_bits = array.array("B", val)

    @property
    def encoded_bits(self) -> array.array:
        if self._encoded_bits is None:
            if self._decoder is None:
                self._encoded_bits = self._plain_bits
                return self._encoded_bits
            self._encoded_bits = array.array("B", [])
            start = 0
            encode = self._decoder.encode
            bits = self.plain_bits
            for label in self.exclude_from_decoding_labels:
                self._encoded_bits.extend(encode(bits[start : label.start]))
                start = label.start if label.start > start else start
                self._encoded_bits.extend(bits[start : label.end])
                start = label.end if label.end > start else start
            self._encoded_bits.extend(encode(bits[start:]))
        return self._encoded_bits

    def clear_decoded_bits(self):
        self._decoded_bits = None

    def clear_encoded_bits(self):
        self._encoded_bits = None

    # -- string and array views ------------------------------------------
    @property
    def plain_bits_str(self) -> str:
        return str(self)

    @property
    def decoded_bits_str(self) -> str:
        return self.bits2string(self.decoded_bits)

    @property
    def encoded_bits_str(self) -> str:
        return self.bits2string(self.encoded_bits)

    @property
    def decoded_bits_buffer(self) -> bytes:
        return self.decoded_bits.tobytes()

    @staticmethod
    def _bit_chains_to_hex(bit_chains) -> array.array:
        result = array.array("B", [])
        for bc in bit_chains:
            bc = bc + array.array("B", [0] * ((4 - len(bc) % 4) % 4))
            result.extend((8 * bc[i] + 4 * bc[i + 1] + 2 * bc[i + 2] + bc[i + 3])
                          for i in range(0, len(bc), 4))
        return result

    @staticmethod
    def _bit_chains_to_ascii(bit_chains) -> array.array:
        result = array.array("B", [])
        for bc in bit_chains:
            bc = bc + array.array("B", [0] * ((8 - len(bc) % 8) % 8))
            result.extend((128 * bc[i] + 64 * bc[i + 1] + 32 * bc[i + 2] + 16 * bc[i + 3]
                           + 8 * bc[i + 4] + 4 * bc[i + 5] + 2 * bc[i + 6] + bc[i + 7])
                          for i in range(0, len(bc), 8))
        return result

    def split(self, decode=True):
        """Bit chains split at label boundaries (for hex/ASCII alignment)."""
        start = 0
        result = []
        message = self.decoded_bits if decode else self.plain_bits
        bit_alignments = set()
        if self.align_labels:
            for l in self.message_type:
                bit_alignments.add(l.start)
                bit_alignments.add(l.end)
        self._bit_alignments = sorted(bit_alignments)
        for pos in self._bit_alignments:
            result.append(message[start:pos])
            start = pos
        result.append(message[start:])
        return result

    @property
    def plain_hex_array(self) -> array.array:
        return self._bit_chains_to_hex(self.split(decode=False))

    @property
    def plain_hex_str(self) -> str:
        return "".join("{0:x}".format(h) for h in self.plain_hex_array)

    @property
    def plain_ascii_array(self) -> array.array:
        return self._bit_chains_to_ascii(self.split(decode=False))

    @property
    def plain_ascii_str(self) -> str:
        return "".join(chr(a) for a in self.plain_ascii_array)

    @property
    def decoded_hex_array(self) -> array.array:
        return self._bit_chains_to_hex(self.split(decode=True))

    @property
    def decoded_hex_str(self) -> str:
        return "".join("{0:x}".format(h) for h in self.decoded_hex_array)

    @property
    def decoded_ascii_array(self) -> array.array:
        return self._bit_chains_to_ascii(self.split(decode=True))

    @property
    def decoded_ascii_str(self) -> str:
        return "".join(chr(a) for a in self.decoded_ascii_array)

    @property
    def decoded_ascii_buffer(self) -> bytes:
        return self.decoded_ascii_array.tobytes()

    # -- index conversion (Message.py:356-424) ---------------------------
    def _get_bit_range_from_hex_or_ascii_index(self, from_index, decoded, is_hex):
        bits = self.decoded_bits if decoded else self.plain_bits
        factor = 4 if is_hex else 8
        for i in range(len(bits)):
            if self._get_hex_ascii_index_from_bit_index(i, to_hex=is_hex)[0] == from_index:
                return i, i + factor - 1
        return factor * from_index, factor * (from_index + 1) - 1

    def _get_hex_ascii_index_from_bit_index(self, bit_index, to_hex):
        factor = 4 if to_hex else 8
        result = 0
        last_alignment = 0
        for ba in self._bit_alignments:
            if ba <= bit_index:
                result += math.ceil((ba - last_alignment) / factor)
                last_alignment = ba
            else:
                break
        result += math.floor((bit_index - last_alignment) / factor)
        return result, result

    def convert_index(self, index, from_view, to_view, decoded):
        # refresh alignments
        self.split(decode=decoded)
        if to_view == from_view:
            return index, index
        if to_view == 0:
            return self._get_bit_range_from_hex_or_ascii_index(index, decoded, is_hex=from_view == 1)
        if to_view == 1:
            if from_view == 0:
                return self._get_hex_ascii_index_from_bit_index(index, to_hex=True)
            if from_view == 2:
                bi = self._get_bit_range_from_hex_or_ascii_index(index, decoded, is_hex=True)[0]
                return self._get_hex_ascii_index_from_bit_index(bi, to_hex=False)
        elif to_view == 2:
            if from_view == 0:
                return self._get_hex_ascii_index_from_bit_index(index, to_hex=False)
            if from_view == 1:
                bi = self._get_bit_range_from_hex_or_ascii_index(index, decoded, is_hex=False)[0]
                return self._get_hex_ascii_index_from_bit_index(bi, to_hex=True)
        raise NotImplementedError("only Bit/Hex/ASCII views")

    def convert_range(self, index1, index2, from_view, to_view, decoded):
        start = self.convert_index(index1, from_view, to_view, decoded)[0]
        end = self.convert_index(index2, from_view, to_view, decoded)[1]
        try:
            return int(start), int(math.ceil(end))
        except TypeError:
            return 0, 0

    def get_byte_length(self, decoded=True) -> int:
        end = len(self.decoded_bits) if decoded else len(self._plain_bits)
        end = self.convert_index(end, 0, 2, decoded=decoded)[0]
        return int(end)

    def get_label_range(self, lbl: ProtocolLabel, view: int, decode: bool,
                        consider_alignment=False):
        a = self.alignment_offset if consider_alignment else 0
        start = self.convert_index(lbl.start + a, 0, view, decoded=decode)[0]
        end = self.convert_index(lbl.end + a, 0, view, decoded=decode)[1]
        return int(start), int(end)

    def get_src_address_from_data(self, decoded=True):
        src_label = next((lbl for lbl in self.message_type
                          if lbl.field_type
                          and lbl.field_type.function == FieldType.Function.SRC_ADDRESS), None)
        if src_label:
            start, end = self.get_label_range(src_label, view=1, decode=decoded)
            return (self.decoded_hex_str if decoded else self.plain_hex_str)[start:end]
        return None

    # -- misc ------------------------------------------------------------
    def get_duration(self, sample_rate) -> float:
        if len(self.bit_sample_pos) < 2:
            raise ValueError("not enough bit samples for calculating duration")
        return (self.bit_sample_pos[-1] - self.bit_sample_pos[0]) / sample_rate

    def view_to_string(self, view, decoded, show_pauses=True, sample_rate=None) -> str:
        if view == 0:
            proto = self.decoded_bits_str if decoded else self.plain_bits_str
        elif view == 1:
            proto = self.decoded_hex_str if decoded else self.plain_hex_str
        elif view == 2:
            proto = self.decoded_ascii_str if decoded else self.plain_ascii_str
        else:
            return None
        if show_pauses:
            return "%s %s" % (proto, self.get_pause_str(sample_rate))
        return proto

    def get_pause_str(self, sample_rate):
        if sample_rate:
            return " [<b>Pause:</b> %s s]" % (self.pause / sample_rate)
        return " [<b>Pause:</b> %d samples]" % self.pause

    @property
    def labels(self):
        return self.message_type

    # -- constructors / persistence ---------------------------------------
    @staticmethod
    def from_plain_bits_str(bits, pause=0) -> "Message":
        return Message(plain_bits=list(map(int, bits)), pause=pause,
                       message_type=MessageType("none"))

    @staticmethod
    def from_plain_hex_str(hex_str, pause=0) -> "Message":
        lut = {"{0:x}".format(i): "{0:04b}".format(i) for i in range(16)}
        bits = "".join(lut[h] for h in hex_str)
        return Message.from_plain_bits_str(bits, pause)

    def to_xml(self, decoders=None, include_message_type=False, write_bits=False) -> ET.Element:
        root = ET.Element("message")
        root.set("message_type_id", self.message_type.id)
        root.set("modulator_index", str(self.modulator_index))
        root.set("pause", str(self.pause))
        root.set("timestamp", str(self.timestamp))
        if write_bits:
            root.set("bits", self.plain_bits_str)
        if decoders:
            try:
                decoding_index = decoders.index(self.decoder)
            except ValueError:
                decoding_index = 0
            root.set("decoding_index", str(decoding_index))
        if self.participant is not None:
            root.set("participant_id", self.participant.id)
        if include_message_type:
            root.append(self.message_type.to_xml())
        return root

    def from_xml(self, tag: ET.Element, participants, decoders=None, message_types=None):
        timestamp = tag.get("timestamp", None)
        if timestamp:
            self.timestamp = float(timestamp)
        part_id = tag.get("participant_id", None)
        message_type_id = tag.get("message_type_id", None)
        self.modulator_index = int(tag.get("modulator_index", self.modulator_index))
        self.pause = int(tag.get("pause", self.pause))
        decoding_index = tag.get("decoding_index", None)
        if decoding_index and decoders is not None:
            try:
                self.decoder = decoders[int(decoding_index)]
            except IndexError:
                pass
        if part_id:
            self.participant = Participant.find_matching(part_id, participants)
        if message_type_id and message_types:
            for message_type in message_types:
                if message_type.id == message_type_id:
                    self.message_type = message_type
                    break
        message_type_tag = tag.find("message_type")
        if message_type_tag is not None:
            self.message_type = MessageType.from_xml(message_type_tag)

    @classmethod
    def new_from_xml(cls, tag: ET.Element, participants, decoders=None, message_types=None):
        assert "bits" in tag.attrib
        result = cls.from_plain_bits_str(bits=tag.get("bits"))
        result.from_xml(tag, participants, decoders=decoders, message_types=message_types)
        return result
