"""Simulator flow-graph items.

Counterparts of urh/simulator/Simulator{Item,Message,ProtocolLabel,
Rule,GotoAction,CounterAction,SleepAction,TriggerCommandAction}.py and
Transcript.py: the protocol-simulation flow is a tree of items walked
by the simulation thread.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from enum import Enum

from urh_tpu.protocol.labels import ChecksumLabel, FieldType, MessageType, Participant, ProtocolLabel
from urh_tpu.protocol.message import Message
from urh_tpu.util import misc as util


class SimulatorItem:
    simulator_config = None
    expression_parser = None

    def __init__(self):
        self._parent_item = None
        self._child_items = []
        self.logging_active = True
        self.is_valid = True

    def validate(self):
        return True

    def get_pos(self):
        if self.parent() is not None:
            return self.parent().children.index(self)
        return 0

    def index(self):
        if self.parent() is None:
            return ""
        item = self
        result = str(item.get_pos() + 1)
        while item.parent().parent() is not None:
            item = item.parent()
            result = str(item.get_pos() + 1) + "." + result
        return result

    def insert_child(self, pos, child):
        child.set_parent(self)
        self.children.insert(pos, child)

    def add_child(self, child):
        child.set_parent(self)
        self.children.append(child)

    def delete(self):
        for child in self.children[:]:
            child.set_parent(None)
        self.set_parent(None)

    def parent(self):
        return self._parent_item

    def set_parent(self, value):
        if self.parent() is not None:
            self.parent().children.remove(self)
        self._parent_item = value

    @property
    def children(self):
        return self._child_items

    def child_count(self) -> int:
        return len(self.children)

    def next_sibling(self):
        index = self.get_pos()
        if self.parent() and index < self.parent().child_count() - 1:
            return self.parent().children[index + 1]
        return None

    def prev_sibling(self):
        index = self.get_pos()
        if self.parent() and index > 0:
            return self.parent().children[index - 1]
        return None

    def next(self):
        if self.child_count():
            return self.children[0]
        curr = self
        while curr is not None:
            if curr.next_sibling() is not None:
                return curr.next_sibling()
            curr = curr.parent()
        return None

    def prev(self):
        if self.prev_sibling() is not None:
            curr = self.prev_sibling()
        else:
            return self.parent()
        while curr.child_count():
            curr = curr.children[-1]
        return curr


class ConditionType(Enum):
    IF = "IF"
    ELSE_IF = "ELSE IF"
    ELSE = "ELSE"


class SimulatorRule(SimulatorItem):
    def set_parent(self, value):
        if value is not None:
            assert value.parent() is None
        super().set_parent(value)

    @property
    def has_else_condition(self) -> bool:
        return any(child.type is ConditionType.ELSE for child in self.children)

    def get_first_applying_condition(self):
        return next((child for child in self.children if child.condition_applies), None)

    def next_item(self):
        return next((c.children[0] for c in self.children
                     if c.condition_applies and c.child_count()), self.next_sibling())

    def to_xml(self) -> ET.Element:
        return ET.Element("simulator_rule")

    @classmethod
    def from_xml(cls, tag: ET.Element):
        return SimulatorRule()


class SimulatorRuleCondition(SimulatorItem):
    def __init__(self, type: ConditionType):
        super().__init__()
        self.type = type
        self.condition = ""

    @property
    def condition_applies(self) -> bool:
        if self.type is ConditionType.ELSE:
            return True
        valid, _, node = self.expression_parser.validate_expression(self.condition, is_formula=False)
        assert valid and node is not None
        return self.expression_parser.evaluate_node(node)

    def set_parent(self, value):
        if value is not None:
            assert isinstance(value, SimulatorRule)
        super().set_parent(value)

    def validate(self):
        if self.type is ConditionType.ELSE:
            return True
        result, _, _ = self.expression_parser.validate_expression(self.condition, is_formula=False)
        return result

    def to_xml(self):
        return ET.Element("simulator_rule_condition",
                          attrib={"type": self.type.value, "condition": self.condition})

    @classmethod
    def from_xml(cls, tag: ET.Element):
        result = SimulatorRuleCondition(type=ConditionType(tag.get("type", ConditionType.IF.value)))
        result.condition = tag.get("condition", "")
        return result


class SimulatorMessage(Message, SimulatorItem):
    def __init__(self, destination: Participant, plain_bits, pause: int,
                 message_type: MessageType, decoder=None, source=None, timestamp=None):
        Message.__init__(self, plain_bits, pause, message_type, decoder=decoder,
                         participant=source)
        SimulatorItem.__init__(self)
        if timestamp is not None:
            self.timestamp = timestamp

        self.destination = destination
        self.send_recv_messages = []
        self.repeat = 1

    def set_parent(self, value):
        if value is not None:
            assert value.parent() is None or isinstance(value, SimulatorRuleCondition)
        super().set_parent(value)

    @property
    def source(self):
        return self.participant

    @source.setter
    def source(self, participant):
        self.participant = participant

    @property
    def children(self):
        return self.message_type

    def insert_child(self, pos, child):
        self.children.append(child)
        child.set_parent(self)

    def validate(self):
        return all(child.is_valid for child in self.children)

    @property
    def plain_ascii_str(self) -> str:
        if len(self.send_recv_messages) > 0:
            plain_ascii_array = self.send_recv_messages[-1].plain_ascii_array
        else:
            plain_ascii_array = self.plain_ascii_array
        return "".join(map(chr, plain_ascii_array))

    @property
    def plain_bits_str(self) -> str:
        return (str(self.send_recv_messages[-1]) if len(self.send_recv_messages) > 0
                else str(self))

    def __delitem__(self, index):
        removed_labels = self._remove_labels_for_range(index, instant_remove=False)
        self.simulator_config.delete_items(removed_labels)
        del self.plain_bits[index]

    def to_xml(self, decoders=None, include_message_type=False, write_bits=True) -> ET.Element:
        result = ET.Element("simulator_message", attrib={
            "destination_id": self.destination.id if self.destination else "",
            "repeat": str(self.repeat)})
        result.append(Message.to_xml(self, decoders, include_message_type, write_bits=write_bits))
        return result

    def from_xml(self, tag: ET.Element, participants, decoders=None, message_types=None):
        Message.from_xml(self, tag, participants, decoders, message_types)
        self.destination = Participant.find_matching(tag.get("destination_id", ""), participants)
        try:
            self.repeat = int(tag.get("repeat", "1"))
        except ValueError:
            self.repeat = 1

    @classmethod
    def new_from_xml(cls, tag: ET.Element, participants, decoders=None, message_types=None):
        msg = Message.new_from_xml(tag.find("message"), participants=participants,
                                   decoders=decoders, message_types=message_types)
        destination = Participant.find_matching(tag.get("destination_id", ""), participants)
        return SimulatorMessage(destination, msg.plain_bits, msg.pause, msg.message_type,
                                msg.decoder, msg.participant, timestamp=msg.timestamp)


class SimulatorProtocolLabel(SimulatorItem):
    VALUE_TYPES = ["Constant value", "Live input", "Formula", "External program", "Random value"]

    def __init__(self, label: ProtocolLabel):
        super().__init__()
        self.label = label
        self.value_type_index = 0
        self.external_program = ""
        self.formula = ""
        self.random_min = 0
        self.random_max = self.label.fuzz_maximum - 1

    @property
    def has_live_input(self):
        return not self.is_checksum_label and self.value_type_index == 1

    def get_copy(self):
        return self  # no copy needed in the simulator

    def set_parent(self, value):
        if value is not None:
            assert isinstance(value, SimulatorMessage)
        super().set_parent(value)

    def __lt__(self, other):
        return self.label < other.label

    def __getattr__(self, name):
        if name in ("label",):
            return self.__getattribute__("label")
        return getattr(self.__getattribute__("label"), name)

    def __setattr__(self, key, value):
        if key == "field_type":
            super().__setattr__(key, value)
        try:
            object.__getattribute__(self, "label").__setattr__(key, value)
        except AttributeError:
            super().__setattr__(key, value)

    @property
    def field_type(self) -> FieldType:
        return self.label.field_type

    @field_type.setter
    def field_type(self, val: FieldType):
        if val is None:
            return
        if self.is_checksum_label and val.function != FieldType.Function.CHECKSUM:
            assert isinstance(self.label, ChecksumLabel)
            self.label = self.label.to_label(val)
        elif not self.is_checksum_label and val.function == FieldType.Function.CHECKSUM:
            self.label = ChecksumLabel.from_label(self.label)
            self.value_type_index = 0
        self.label.field_type = val

    @property
    def is_checksum_label(self):
        return isinstance(self.label, ChecksumLabel)

    def validate(self):
        if self.value_type_index == 2:
            result, _, _ = self.expression_parser.validate_expression(self.formula)
            return result
        if self.value_type_index == 3:
            return util.validate_command(self.external_program)
        return True

    def to_xml(self) -> ET.Element:
        result = ET.Element("simulator_label", attrib={
            "value_type_index": str(self.value_type_index),
            "external_program": str(self.external_program),
            "formula": str(self.formula),
            "random_min": str(self.random_min),
            "random_max": str(self.random_max)})
        result.append(self.label.to_xml())
        return result

    @classmethod
    def from_xml(cls, tag: ET.Element, field_types_by_caption=None):
        label_tag = tag.find("label")
        if label_tag is not None:
            label = ProtocolLabel.from_xml(label_tag, field_types_by_caption)
        else:
            label = ChecksumLabel.from_xml(tag.find("checksum_label"), field_types_by_caption)
        result = SimulatorProtocolLabel(label)
        result.value_type_index = int(tag.get("value_type_index", "0"))
        result.external_program = tag.get("external_program", "")
        result.formula = tag.get("formula", "")
        result.random_min = int(tag.get("random_min", "0"))
        result.random_max = int(tag.get("random_max", str(label.fuzz_maximum - 1)))
        return result


class SimulatorGotoAction(SimulatorItem):
    def __init__(self):
        super().__init__()
        self.goto_target = None

    def set_parent(self, value):
        if value is not None:
            assert value.parent() is None or isinstance(value, SimulatorRuleCondition)
        super().set_parent(value)

    @property
    def target(self):
        return self.simulator_config.item_dict[self.goto_target] if self.validate() else None

    def validate(self):
        target = self.simulator_config.item_dict.get(self.goto_target, None)
        return self.is_valid_goto_target(self.goto_target, target)

    def get_valid_goto_targets(self):
        return [key for key, value in self.simulator_config.item_dict.items()
                if value != self and SimulatorGotoAction.is_valid_goto_target(key, value)]

    def to_xml(self) -> ET.Element:
        attributes = dict()
        if self.goto_target is not None:
            attributes["goto_target"] = self.goto_target
        return ET.Element("simulator_goto_action", attrib=attributes)

    @classmethod
    def from_xml(cls, tag: ET.Element):
        result = SimulatorGotoAction()
        result.goto_target = tag.get("goto_target", None)
        return result

    @staticmethod
    def is_valid_goto_target(caption: str, item: SimulatorItem):
        if item is None:
            return False
        if isinstance(item, (SimulatorProtocolLabel, SimulatorRule)):
            return False
        if isinstance(item, SimulatorRuleCondition) and item.type != ConditionType.IF:
            return False
        if isinstance(item, SimulatorCounterAction):
            return False
        if isinstance(item, SimulatorTriggerCommandAction) and caption.endswith("rc"):
            return False
        return True


class SimulatorCounterAction(SimulatorItem):
    def __init__(self):
        super().__init__()
        self.start = 1
        self.step = 1
        self._value = self.start

    @property
    def value(self):
        return self._value

    def reset_value(self):
        self._value = self.start

    def progress_value(self):
        self._value += self.step

    def set_parent(self, value):
        if value is not None:
            assert value.parent() is None or isinstance(value, SimulatorRuleCondition)
        super().set_parent(value)

    def to_xml(self):
        return ET.Element("simulator_counter_action",
                          attrib={"start": str(self.start), "step": str(self.step)})

    @classmethod
    def from_xml(cls, tag):
        result = SimulatorCounterAction()
        result.start = int(tag.get("start", "1"))
        result.step = int(tag.get("step", "1"))
        return result


class SimulatorSleepAction(SimulatorItem):
    def __init__(self):
        super().__init__()
        self.sleep_time = 1.0

    @property
    def caption(self):
        return "Sleep for {}s".format(self.sleep_time)

    def set_parent(self, value):
        if value is not None:
            assert value.parent() is None or isinstance(value, SimulatorRuleCondition)
        super().set_parent(value)

    def to_xml(self):
        return ET.Element("simulator_sleep_action", attrib={"sleep_time": str(self.sleep_time)})

    @classmethod
    def from_xml(cls, tag):
        result = SimulatorSleepAction()
        try:
            result.sleep_time = float(tag.get("sleep_time", "1.0"))
        except ValueError:
            result.sleep_time = 1.0
        return result


class SimulatorTriggerCommandAction(SimulatorItem):
    def __init__(self):
        super().__init__()
        self.command = None
        self.pass_transcript = False
        self.return_code = 0

    def validate(self):
        return util.validate_command(self.command)

    def set_parent(self, value):
        if value is not None:
            assert value.parent() is None or isinstance(value, SimulatorRuleCondition)
        super().set_parent(value)

    def to_xml(self):
        attrib = dict()
        if self.command:
            attrib["command"] = self.command
        attrib["pass_transcript"] = str(int(self.pass_transcript))
        return ET.Element("simulator_trigger_command_action", attrib=attrib)

    @classmethod
    def from_xml(cls, tag):
        result = SimulatorTriggerCommandAction()
        result.command = tag.get("command", None)
        pass_transcript = tag.get("pass_transcript", None)
        if pass_transcript is not None:
            try:
                result.pass_transcript = bool(int(pass_transcript))
            except ValueError:
                pass
        return result


class Transcript:
    FORMAT = "{0} ({1}->{2}): {3}"

    def __init__(self):
        self._data = []

    def append(self, source, destination, msg, index):
        if len(self._data) == 0:
            self._data.append([])
        self._data[-1].append((source, destination, msg, index))

    def start_new_round(self):
        if len(self._data) == 0 or len(self._data[-1]) > 0:
            self._data.append([])

    def clear(self):
        self._data.clear()

    def get_for_all_participants(self, all_rounds: bool, use_bit=True) -> list:
        result = []
        if len(self._data) == 0:
            return result
        rng = (range(len(self._data)) if all_rounds
               else range(len(self._data) - 1, len(self._data)))
        for i in rng:
            for source, destination, msg, msg_index in self._data[i]:
                data = msg.plain_bits_str if use_bit else msg.plain_hex_str
                result.append(self.FORMAT.format(msg_index, source.shortname,
                                                 destination.shortname, data))
            if i != len(self._data) - 1:
                result.append("")
        return result

    def get_for_participant(self, participant) -> str:
        if len(self._data) == 0:
            return ""
        result = []
        for source, destination, msg, _ in self._data[-1]:
            if participant == destination:
                result.append("->" + msg.plain_bits_str)
            elif participant == source:
                result.append("<-" + msg.plain_bits_str)
        return "\n".join(result)
