"""MessageType construction from inferred fields
(urh/awre/MessageTypeBuilder.py)."""

from __future__ import annotations

from urh_tpu.protocol.labels import ChecksumLabel, FieldType, MessageType, ProtocolLabel


class MessageTypeBuilder:
    def __init__(self, name: str):
        self.name = name
        self.message_type = MessageType(name)

    def add_label(self, label_type: FieldType.Function, length: int, name: str = None):
        try:
            start = self.message_type[-1].end
            color_index = self.message_type[-1].color_index + 1
        except IndexError:
            start, color_index = 0, 0

        if name is None:
            name = label_type.value

        lbl = ProtocolLabel(name, start, start + length - 1, color_index,
                            field_type=FieldType(label_type.name, label_type))
        self.message_type.append(lbl)

    def add_checksum_label(self, length, checksum, data_start=None, data_end=None,
                           name: str = None):
        label_type = FieldType.Function.CHECKSUM
        try:
            start = self.message_type[-1].end
            color_index = self.message_type[-1].color_index + 1
        except IndexError:
            start, color_index = 0, 0

        if name is None:
            name = label_type.value

        if data_start is None:
            # default: data starts behind sync (or preamble)
            sync_label = self.message_type.get_first_label_with_type(FieldType.Function.SYNC)
            if sync_label:
                data_start = sync_label.end
            else:
                preamble_label = self.message_type.get_first_label_with_type(FieldType.Function.PREAMBLE)
                data_start = preamble_label.end if preamble_label else 0

        if data_end is None:
            data_end = start

        lbl = ChecksumLabel(name, start, start + length - 1, color_index,
                            field_type=FieldType(label_type.name, label_type))
        lbl.data_ranges = [(data_start, data_end)]
        lbl.checksum = checksum
        self.message_type.append(lbl)
