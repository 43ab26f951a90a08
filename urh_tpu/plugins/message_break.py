"""MessageBreak: split a message at a bit position (undoable action;
urh/plugins/MessageBreak counterpart without Qt)."""

from __future__ import annotations

import copy

from urh_tpu.protocol.message import Message


class MessageBreakAction:
    def __init__(self, proto_analyzer, msg_nr: int, pos: int):
        self.proto_analyzer = proto_analyzer
        self.msg_nr = msg_nr
        self.pos = pos
        self.orig_messages = copy.deepcopy(proto_analyzer.messages)
        self.text = "Break message behind selection"

    def redo(self):
        message = self.proto_analyzer.messages[self.msg_nr]
        message1 = Message(plain_bits=message.plain_bits[: self.pos], pause=0,
                           rssi=message.rssi, decoder=message.decoder,
                           message_type=message.message_type,
                           samples_per_symbol=message.samples_per_symbol)
        message2 = Message(plain_bits=message.plain_bits[self.pos :], pause=message.pause,
                           rssi=message.rssi, decoder=message.decoder,
                           message_type=message.message_type,
                           samples_per_symbol=message.samples_per_symbol)
        self.proto_analyzer.messages[self.msg_nr] = message1
        self.proto_analyzer.messages.insert(self.msg_nr + 1, message2)

    def undo(self):
        self.proto_analyzer.messages = self.orig_messages


from urh_tpu.plugins.manager import ProtocolPlugin


class MessageBreakPlugin(ProtocolPlugin):
    def __init__(self):
        super().__init__(name="MessageBreak")

    def get_action(self, protocol, msg_nr: int, pos: int, view: int = 0) -> MessageBreakAction:
        pos = protocol.convert_index(pos, view, 0, True, message_indx=msg_nr)[0]
        return MessageBreakAction(protocol, msg_nr, pos)
