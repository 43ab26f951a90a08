"""Labeled protocol synthesis for awre testing
(urh/awre/ProtocolGenerator.py, sans the LaTeX export helper's GUI
bits): generate messages from message-type field layouts with
length/type/sequence-number/address/checksum auto-fill.
"""

from __future__ import annotations

import math
import struct
from collections import defaultdict

from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.labels import ChecksumLabel, FieldType, MessageType, Participant
from urh_tpu.protocol.message import Message


class ProtocolGenerator:
    DEFAULT_PREAMBLE = "10101010"
    DEFAULT_SYNC = "1001"
    BROADCAST_ADDRESS = "0xffff"

    def __init__(self, message_types: list, participants: list = None,
                 preambles_by_mt=None, syncs_by_mt=None, little_endian=False,
                 length_in_bytes=True, sequence_numbers=None,
                 sequence_number_increment=1, message_type_codes=None):
        self.participants = participants if participants is not None else []

        self.protocol = ProtocolAnalyzer(None)
        self.protocol.message_types = message_types

        self.length_in_bytes = length_in_bytes
        self.little_endian = little_endian

        preambles_by_mt = dict() if preambles_by_mt is None else preambles_by_mt
        self.preambles_by_message_type = defaultdict(lambda: self.DEFAULT_PREAMBLE)
        for mt, preamble in preambles_by_mt.items():
            self.preambles_by_message_type[mt] = self.to_bits(preamble)

        syncs_by_mt = dict() if syncs_by_mt is None else syncs_by_mt
        self.syncs_by_message_type = defaultdict(lambda: self.DEFAULT_SYNC)
        for mt, sync in syncs_by_mt.items():
            self.syncs_by_message_type[mt] = self.to_bits(sync)

        sequence_numbers = dict() if sequence_numbers is None else sequence_numbers
        self.sequence_numbers = defaultdict(lambda: 0)
        self.sequence_number_increment = sequence_number_increment
        for mt, seq in sequence_numbers.items():
            self.sequence_numbers[mt] = seq

        if message_type_codes is None:
            message_type_codes = {mt: i for i, mt in enumerate(self.message_types)}
        self.message_type_codes = message_type_codes

    @property
    def messages(self):
        return self.protocol.messages

    @property
    def message_types(self):
        return self.protocol.message_types

    def _get_address_for_participant(self, participant: Participant):
        if participant is None:
            return self.to_bits(self.BROADCAST_ADDRESS)
        address = ("0x" + participant.address_hex
                   if not participant.address_hex.startswith("0x")
                   else participant.address_hex)
        return self.to_bits(address)

    @staticmethod
    def to_bits(bit_or_hex_str: str):
        if bit_or_hex_str.startswith("0x"):
            lut = {"{0:x}".format(i): "{0:04b}".format(i) for i in range(16)}
            return "".join(lut[c] for c in bit_or_hex_str[2:])
        return bit_or_hex_str

    def decimal_to_bits(self, number: int, num_bits: int) -> str:
        len_formats = {8: "B", 16: "H", 32: "I", 64: "Q"}
        if num_bits not in len_formats:
            raise ValueError(f"invalid length for length field: {num_bits} bits")
        struct_format = ("<" if self.little_endian else ">") + len_formats[num_bits]
        return "".join("{0:08b}".format(b) for b in struct.pack(struct_format, number))

    def generate_message(self, message_type=None, data="0x00",
                         source: Participant = None, destination: Participant = None):
        for participant in (source, destination):
            if isinstance(participant, Participant) and participant not in self.participants:
                self.participants.append(participant)

        if isinstance(message_type, MessageType):
            message_type_index = self.protocol.message_types.index(message_type)
        elif isinstance(message_type, int):
            message_type_index = message_type
        else:
            message_type_index = 0

        data = self.to_bits(data)
        mt = self.protocol.message_types[message_type_index]
        mt.sort()

        bits = []
        start = 0

        data_label_present = mt.get_first_label_with_type(FieldType.Function.DATA) is not None
        if data_label_present:
            message_length = mt[-1].end - 1
        else:
            message_length = mt[-1].end - 1 + len(data)

        checksum_labels = []

        for lbl in mt:
            bits.append("0" * (lbl.start - start))
            len_field = lbl.end - lbl.start

            if isinstance(lbl, ChecksumLabel):
                checksum_labels.append(lbl)
                # NOTE: start is intentionally NOT advanced: the next label's
                # zero padding covers the checksum field, which is filled in
                # after message assembly
                continue

            func = lbl.field_type.function
            if func == FieldType.Function.PREAMBLE:
                preamble = self.preambles_by_message_type[mt]
                assert len(preamble) == len_field
                bits.append(preamble)
                message_length -= len(preamble)
            elif func == FieldType.Function.SYNC:
                sync = self.syncs_by_message_type[mt]
                assert len(sync) == len_field
                bits.append(sync)
                message_length -= len(sync)
            elif func == FieldType.Function.LENGTH:
                value = int(math.ceil(message_length / 8))
                if not self.length_in_bytes:
                    value *= 8
                bits.append(self.decimal_to_bits(value, len_field))
            elif func == FieldType.Function.TYPE:
                bits.append(self.decimal_to_bits(
                    self.message_type_codes[mt] % (2 ** len_field), len_field))
            elif func == FieldType.Function.SEQUENCE_NUMBER:
                bits.append(self.decimal_to_bits(
                    self.sequence_numbers[mt] % (2 ** len_field), len_field))
            elif func == FieldType.Function.DST_ADDRESS:
                dst_bits = self._get_address_for_participant(destination)
                if len(dst_bits) != len_field:
                    raise ValueError(f"length of dst ({len(dst_bits)} bits) != field ({len_field} bits)")
                bits.append(dst_bits)
            elif func == FieldType.Function.SRC_ADDRESS:
                src_bits = self._get_address_for_participant(source)
                if len(src_bits) != len_field:
                    raise ValueError(f"length of src ({len(src_bits)} bits) != field ({len_field} bits)")
                bits.append(src_bits)
            elif func == FieldType.Function.DATA:
                if len(data) != len_field:
                    raise ValueError(f"length of data ({len(data)} bits) != field ({len_field} bits)")
                bits.append(data)

            start = lbl.end

        if not data_label_present:
            bits.append(data)

        msg = Message.from_plain_bits_str("".join(bits))
        msg.message_type = mt
        msg.participant = source
        self.sequence_numbers[mt] += self.sequence_number_increment

        for checksum_label in checksum_labels:
            msg[checksum_label.start : checksum_label.end] = \
                checksum_label.calculate_checksum_for_message(msg, False)

        self.protocol.messages.append(msg)

    def to_file(self, filename: str):
        self.protocol.to_xml_file(filename, [], self.participants, write_bits=True)
