"""ZeroHide: hide long zero sequences in the decoded view
(urh/plugins/ZeroHide counterpart without Qt)."""

from __future__ import annotations


class ZeroHideAction:
    def __init__(self, protocol, following_zeros: int, view: int, zero_hide_offsets: dict):
        self.protocol = protocol
        self.following_zeros = following_zeros
        self.viewtype = view
        self.zero_hide_offsets = zero_hide_offsets
        self.text = "Hide zero sequences >= " + str(following_zeros)

    def redo(self):
        factor = 1 if self.viewtype == 0 else 4 if self.viewtype == 1 else 8
        pa = self.protocol
        self.zero_hide_offsets.clear()
        for i in range(pa.num_messages):
            message = pa.messages[i]
            if self.viewtype == 0:
                data = message.decoded_bits_str
            elif self.viewtype == 1:
                data = message.decoded_hex_str
            else:
                data = message.decoded_ascii_str

            zero_sequences = self._get_zero_seq_indexes(data, self.following_zeros)
            self.zero_hide_offsets[i] = {start: end - start for start, end in zero_sequences}
            for seq in reversed(zero_sequences):
                full_bits = pa.messages[i].decoded_bits
                start = seq[0] * factor
                end = seq[1] * factor
                pa.messages[i].decoded_bits = full_bits[:start] + full_bits[end:]

    def undo(self):
        self.zero_hide_offsets.clear()
        self.protocol.clear_decoded_bits()

    @staticmethod
    def _get_zero_seq_indexes(message: str, following_zeros: int):
        result = []
        if following_zeros > len(message):
            return result

        zero_counter = 0
        for i in range(len(message)):
            if message[i] == "0":
                zero_counter += 1
            else:
                if zero_counter >= following_zeros:
                    result.append((i - zero_counter, i))
                zero_counter = 0

        if zero_counter >= following_zeros:
            result.append((len(message) - zero_counter, len(message)))
        return result


class ZeroHidePlugin:
    name = "ZeroHide"

    def __init__(self):
        from urh_tpu.util import settings

        self.following_zeros = settings.read("following_zeros", 5, int)
        self.zero_hide_offsets = dict()

    def get_action(self, protocol, view: int) -> ZeroHideAction:
        return ZeroHideAction(protocol, self.following_zeros, view, self.zero_hide_offsets)
