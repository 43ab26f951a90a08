"""Protocol field model: labels, field types, message types, rulesets.

Counterparts of urh/signalprocessing/{FieldType,ProtocoLabel,
ChecksumLabel,MessageType,Ruleset,Interval,Participant}.py without the
Qt dependencies.  A label is a named [start, end) bit range with a
semantic function; a message type is a sorted list of labels plus an
assignment ruleset; checksum labels carry a GenericCRC/WSPChecksum and
data ranges.
"""

from __future__ import annotations

import array
import ast
import copy
import operator
import random
import uuid
import xml.etree.ElementTree as ET
from enum import Enum

from urh_tpu.coding.crc import GenericCRC
from urh_tpu.coding.wsp import WSPChecksum

NUM_LABEL_COLORS = 32  # palette size used for auto color assignment


class Interval:
    __slots__ = ["data"]

    def __init__(self, start: int, end: int):
        self.data = (start, end)

    @property
    def start(self):
        return self.data[0]

    @property
    def end(self):
        return self.data[1]

    def __hash__(self):
        return hash(self.data)

    def __eq__(self, other):
        return isinstance(other, Interval) and self.data == other.data

    def __lt__(self, other):
        return self.data < (other.data if isinstance(other, Interval) else other)

    def __repr__(self):
        return "{}-{}".format(self.start, self.end)

    def range(self):
        return range(self.start, self.end)

    def __len__(self):
        return len(self.data)

    def overlaps_with(self, other) -> bool:
        return self.start < other.end and other.start < self.end

    def find_common_interval(self, other) -> "Interval":
        """Largest interval contained in both, None when disjoint
        (Interval.py:41-50)."""
        start = max(self.start, other.start)
        end = min(self.end, other.end)
        return Interval(start, end) if start < end else None

    @staticmethod
    def find_greatest(intervals: list) -> "Interval":
        return max(intervals, key=len)


class FieldType:
    __slots__ = ["caption", "function", "display_format_index"]

    class Function(Enum):
        PREAMBLE = "preamble"
        SYNC = "synchronization"
        LENGTH = "length"
        SRC_ADDRESS = "source address"
        DST_ADDRESS = "destination address"
        SEQUENCE_NUMBER = "sequence number"
        TYPE = "type"
        DATA = "data"
        CHECKSUM = "checksum"
        CUSTOM = "custom"

    def __init__(self, caption: str, function: Function, display_format_index: int = None):
        self.caption = caption
        self.function = function
        if display_format_index is None:
            if function in (self.Function.PREAMBLE, self.Function.SYNC):
                self.display_format_index = 0
            elif function in (self.Function.DST_ADDRESS, self.Function.SRC_ADDRESS,
                              self.Function.CHECKSUM):
                self.display_format_index = 1
            elif function in (self.Function.SEQUENCE_NUMBER, self.Function.LENGTH):
                self.display_format_index = 3
            else:
                self.display_format_index = 0
        else:
            self.display_format_index = display_format_index

    def __eq__(self, other):
        return (isinstance(other, FieldType) and self.caption == other.caption
                and self.function == other.function)

    def __repr__(self):
        return "FieldType: {0} - {1} ({2})".format(
            self.function.name, self.caption, self.display_format_index)

    @staticmethod
    def from_caption(caption: str):
        try:
            function = FieldType.Function(caption)
        except ValueError:
            return None
        return FieldType(caption, function)

    @staticmethod
    def default_field_types():
        return [FieldType(f.value, f) for f in FieldType.Function]

    def to_xml(self):
        return ET.Element("field_type", attrib={
            "caption": self.caption,
            "function": self.function.name,
            "display_format_index": str(self.display_format_index),
        })

    @staticmethod
    def from_xml(tag):
        caption = tag.get("caption", "")
        function_str = tag.get("function", "CUSTOM")
        if function_str == "CRC":
            function_str = "CHECKSUM"  # legacy
        try:
            function = FieldType.Function[function_str]
        except KeyError:
            function = FieldType.Function.CUSTOM
        dfi = int(tag.get("display_format_index", -1))
        return FieldType(caption, function, None if dfi == -1 else dfi)


class ProtocolLabel:
    """A named [start, end) bit range with a semantic field function.

    NOTE: the constructor takes an INCLUSIVE end (reference convention,
    ProtocoLabel.py:53); the stored ``end`` is exclusive.
    """

    DISPLAY_FORMATS = ["Bit", "Hex", "ASCII", "Decimal", "BCD"]
    DISPLAY_BIT_ORDERS = ["MSB", "LSB", "LSD"]
    SEARCH_TYPES = ["Number", "Bits", "Hex", "ASCII"]

    __slots__ = ("_name", "start", "end", "apply_decoding", "color_index", "show",
                 "_fuzz_me", "fuzz_values", "fuzz_created", "_field_type",
                 "display_format_index", "display_bit_order_index",
                 "display_endianness", "auto_created", "copied")

    def __init__(self, name: str, start: int, end: int, color_index: int,
                 fuzz_created=False, auto_created=False, field_type: FieldType = None):
        self._name = name
        self.start = start
        self.end = end + 1

        self.apply_decoding = True
        self.color_index = color_index
        self.show = True
        self._fuzz_me = True
        self.fuzz_values = []
        self.fuzz_created = fuzz_created

        self._field_type = FieldType.from_caption(name) if field_type is None else field_type
        self.display_format_index = 0 if field_type is None else field_type.display_format_index
        self.display_bit_order_index = 0
        self.display_endianness = "big"
        self.auto_created = auto_created
        self.copied = False  # copy-on-write marker for generation

    @property
    def name(self):
        if not self._name:
            self._name = "No name"
        return self._name

    @name.setter
    def name(self, val):
        if val:
            self._name = val

    @property
    def fuzz_me(self):
        return self._fuzz_me

    @fuzz_me.setter
    def fuzz_me(self, value):
        self._fuzz_me = bool(value) if not isinstance(value, str) else value == "True"

    @property
    def field_type(self) -> FieldType:
        return self._field_type

    @field_type.setter
    def field_type(self, value: FieldType):
        if value != self._field_type:
            self._field_type = value
            if hasattr(value, "display_format_index"):
                self.display_format_index = value.display_format_index

    @property
    def field_type_function(self):
        return self._field_type.function if self._field_type is not None else None

    @property
    def is_preamble(self) -> bool:
        return self.field_type_function == FieldType.Function.PREAMBLE

    @property
    def is_sync(self) -> bool:
        return self.field_type_function == FieldType.Function.SYNC

    @property
    def length(self) -> int:
        return self.end - self.start

    @property
    def fuzz_maximum(self):
        return 2 ** (self.end - self.start)

    @property
    def active_fuzzing(self) -> bool:
        return bool(self.fuzz_me) and len(self.fuzz_values) > 1

    @property
    def range_complete_fuzzed(self) -> bool:
        return len(self.fuzz_values) == 2 ** (self.end - self.start)

    def get_copy(self):
        if self.copied:
            return self
        result = copy.deepcopy(self)
        result.copied = True
        return result

    def __lt__(self, other):
        if self.start != other.start:
            return self.start < other.start
        if self.end != other.end:
            return self.end < other.end
        if self.name is not None and other.name is not None:
            return len(self.name) < len(other.name)
        return False

    def __eq__(self, other):
        return (self.start == other.start and self.end == other.end
                and self.name == other.name
                and self.field_type_function == other.field_type_function)

    def __hash__(self):
        return hash((self.start, self.end, self.name, self.field_type_function))

    def __repr__(self):
        return "Protocol Label - start: {0} end: {1} name: {2}".format(
            self.start, self.end, self.name)

    def overlaps_with(self, other_label) -> bool:
        return Interval(self.start, self.end).overlaps_with(
            Interval(other_label.start, other_label.end))

    def add_fuzz_value(self):
        cur_val = self.fuzz_values[-1]
        maximum = 2 ** len(cur_val)
        next_val = (int(cur_val, 2) + 1) % maximum
        self.fuzz_values.append("{0:0{1}b}".format(next_val, len(cur_val)))

    def add_decimal_fuzz_value(self, val: int):
        cur_val = self.fuzz_values[-1]
        self.fuzz_values.append("{0:0{1}b}".format(val, len(cur_val)))

    def to_xml(self) -> ET.Element:
        return ET.Element("label", attrib={
            "name": self._name,
            "start": str(self.start),
            "end": str(self.end),
            "color_index": str(self.color_index),
            "apply_decoding": str(self.apply_decoding),
            "show": str(int(bool(self.show))),
            "display_format_index": str(self.display_format_index),
            "display_bit_order_index": str(self.display_bit_order_index),
            "display_endianness": str(self.display_endianness),
            "fuzz_me": str(int(bool(self.fuzz_me))),
            "fuzz_values": ",".join(self.fuzz_values),
            "auto_created": str(self.auto_created),
        })

    @classmethod
    def from_xml(cls, tag: ET.Element, field_types_by_caption=None):
        field_types_by_caption = field_types_by_caption or {}
        name = tag.get("name")
        start, end = int(tag.get("start", 0)), int(tag.get("end", 0)) - 1
        color_index = int(tag.get("color_index", 0))
        result = ProtocolLabel(name=name, start=start, end=end, color_index=color_index)
        result.apply_decoding = tag.get("apply_decoding", "True") == "True"
        try:
            result.show = bool(int(tag.get("show", 0)))
        except ValueError:
            result.show = True
        try:
            result.fuzz_me = bool(int(tag.get("fuzz_me", 0)))
        except ValueError:
            result.fuzz_me = True
        result.fuzz_values = tag.get("fuzz_values", "").split(",")
        result.auto_created = tag.get("auto_created", "False") == "True"
        result.field_type = field_types_by_caption.get(result.name, None)
        result.display_format_index = int(tag.get("display_format_index", 0))
        result.display_bit_order_index = int(tag.get("display_bit_order_index", 0))
        result.display_endianness = tag.get("display_endianness", "big")
        return result


class ChecksumLabel(ProtocolLabel):
    __slots__ = ("_data_ranges", "checksum", "_category")

    class Category(Enum):
        generic = "generic"
        wsp = "Wireless Short Packet (WSP)"

    def __init__(self, name: str, start: int, end: int, color_index: int,
                 field_type: FieldType, fuzz_created=False, auto_created=False,
                 data_range_start=0):
        assert field_type.function == FieldType.Function.CHECKSUM
        super().__init__(name, start, end, color_index, fuzz_created, auto_created, field_type)
        self._category = self.Category.generic
        self._data_ranges = [[data_range_start, self.start]]
        self.checksum = GenericCRC(polynomial=0)

    def calculate_checksum(self, bits) -> array.array:
        return self.checksum.calculate(bits)

    def calculate_checksum_for_message(self, message, use_decoded_bits: bool) -> array.array:
        data = array.array("B", [])
        bits = message.decoded_bits if use_decoded_bits else message.plain_bits
        for data_range in self.data_ranges:
            data.extend(bits[data_range[0] : data_range[1]])
        return self.calculate_checksum(data)

    @property
    def data_ranges(self):
        if self.category == self.Category.wsp:
            return [[12, -4]]
        return self._data_ranges

    @data_ranges.setter
    def data_ranges(self, value):
        self._data_ranges = value

    @property
    def is_generic_crc(self):
        return self.category == self.Category.generic

    @property
    def category(self) -> "ChecksumLabel.Category":
        return self._category

    @category.setter
    def category(self, value):
        if value != self._category:
            self._category = value
            if value == self.Category.generic:
                self.checksum = GenericCRC()
            elif value == self.Category.wsp:
                self.checksum = WSPChecksum()
            else:
                raise ValueError("unknown category")

    def to_label(self, field_type: FieldType) -> ProtocolLabel:
        result = ProtocolLabel(name=self.name, start=self.start, end=self.end - 1,
                               color_index=self.color_index, field_type=field_type,
                               auto_created=self.auto_created, fuzz_created=self.fuzz_created)
        for attr in ("apply_decoding", "show", "fuzz_me", "fuzz_values", "display_format_index"):
            setattr(result, attr, getattr(self, attr))
        return result

    @classmethod
    def from_label(cls, label: ProtocolLabel):
        result = ChecksumLabel(name=label.name, start=label.start, end=label.end - 1,
                               color_index=label.color_index,
                               field_type=FieldType(label.name, FieldType.Function.CHECKSUM),
                               fuzz_created=label.fuzz_created, auto_created=label.auto_created)
        for attr in ("apply_decoding", "show", "fuzz_me", "fuzz_values", "display_format_index"):
            setattr(result, attr, getattr(label, attr))
        return result

    @classmethod
    def from_xml(cls, tag: ET.Element, field_types_by_caption=None):
        field_types_by_caption = field_types_by_caption or {}
        lbl = ProtocolLabel.from_xml(tag, field_types_by_caption)
        if lbl.field_type is None or lbl.field_type.function != FieldType.Function.CHECKSUM:
            checksum_field_type = next(
                (ft for ft in field_types_by_caption.values()
                 if ft.function == FieldType.Function.CHECKSUM),
                FieldType("checksum", FieldType.Function.CHECKSUM, display_format_index=1),
            )
            lbl.field_type = checksum_field_type
        result = cls.from_label(lbl)
        result.data_ranges = ast.literal_eval(tag.get("data_ranges", "[]"))
        result.category = cls.Category[tag.get("category", "generic")]
        crc_tag = tag.find("crc")
        if crc_tag is not None:
            result.checksum = GenericCRC.from_xml(crc_tag)
        wsp_tag = tag.find("wsp_checksum")
        if wsp_tag is not None:
            result.checksum = WSPChecksum.from_xml(wsp_tag)
        return result

    def to_xml(self):
        result = super().to_xml()
        result.tag = "checksum_label"
        result.attrib.update({"data_ranges": str(self.data_ranges),
                              "category": self.category.name})
        result.append(self.checksum.to_xml())
        return result


# ---------------------------------------------------------------------------
# Rulesets (message-type auto assignment)
# ---------------------------------------------------------------------------

OPERATIONS = {
    ">": operator.gt, "<": operator.lt, ">=": operator.ge,
    "<=": operator.le, "=": operator.eq, "!=": operator.ne,
}

OPERATION_DESCRIPTION = {
    ">": "greater", "<": "lower", ">=": "greater equal",
    "<=": "lower equal", "=": "equal", "!=": "not equal",
}


class Mode(Enum):
    all_apply = 0
    atleast_one_applies = 1
    none_applies = 2


class Rule:
    def __init__(self, start: int, end: int, operator: str, target_value: str, value_type: int):
        assert operator in OPERATIONS
        self._start = start
        self._end = end + 1
        self._value_type = value_type  # 0 = Bit, 1 = Hex, 2 = ASCII
        self.operator = operator
        self.target_value = target_value

    @property
    def start(self):
        return int(self._start)

    @start.setter
    def start(self, value):
        self._start = int(value)

    @property
    def end(self):
        return int(self._end)

    @end.setter
    def end(self, value):
        self._end = int(value)

    @property
    def value_type(self):
        return int(self._value_type)

    @value_type.setter
    def value_type(self, value):
        self._value_type = int(value)

    def applies_for_message(self, message):
        data = (message.decoded_bits_str if self.value_type == 0
                else message.decoded_hex_str if self.value_type == 1
                else message.decoded_ascii_str)
        return OPERATIONS[self.operator](data[self.start : self.end], self.target_value)

    @property
    def operator_description(self):
        return OPERATION_DESCRIPTION[self.operator]

    @operator_description.setter
    def operator_description(self, value):
        for key, val in OPERATION_DESCRIPTION.items():
            if val == value:
                self.operator = key
                return

    def to_xml(self) -> ET.Element:
        root = ET.Element("rule")
        root.set("_start", str(self._start))
        root.set("_end", str(self._end))
        root.set("_value_type", str(self._value_type))
        root.set("operator", self.operator)
        root.set("target_value", str(self.target_value))
        return root

    @staticmethod
    def from_xml(tag: ET.Element):
        result = Rule(start=-1, end=-1, operator="=", target_value="", value_type=0)
        for attrib, value in tag.attrib.items():
            if attrib == "_start":
                result._start = int(value)
            elif attrib == "_end":
                result._end = int(value)
            elif attrib == "_value_type":
                result._value_type = int(value)
            else:
                setattr(result, attrib, value)
        return result


class Ruleset(list):
    def __init__(self, mode: Mode = Mode.all_apply, rules=None):
        super().__init__(rules if rules is not None else [])
        self.mode = mode

    def applies_for_message(self, message):
        napplied = sum(rule.applies_for_message(message) for rule in self)
        if self.mode == Mode.all_apply:
            return napplied == len(self)
        if self.mode == Mode.atleast_one_applies:
            return napplied > 0
        if self.mode == Mode.none_applies:
            return napplied == 0
        raise ValueError("unknown mode")

    def to_xml(self) -> ET.Element:
        root = ET.Element("ruleset")
        root.set("mode", str(self.mode.value))
        for rule in self:
            root.append(rule.to_xml())
        return root

    @staticmethod
    def from_xml(tag: ET.Element):
        # reference semantics: a ruleset tag without child rules falls back
        # to the default ruleset
        if tag is not None and len(tag) > 0:
            result = Ruleset(mode=Mode(int(tag.get("mode", 0))))
            for rule in tag.findall("rule"):
                result.append(Rule.from_xml(rule))
            return result
        return Ruleset(mode=Mode.all_apply)


class MessageType(list):
    """A sorted list of protocol labels plus an assignment ruleset."""

    __slots__ = ["name", "show", "_id", "assigned_by_ruleset", "ruleset",
                 "assigned_by_logic_analyzer"]

    def __init__(self, name: str, iterable=None, id=None, ruleset=None):
        super().__init__(iterable if iterable else [])
        self.name = name
        self.show = True
        self._id = str(uuid.uuid4()) if id is None else id
        self.assigned_by_logic_analyzer = False
        self.assigned_by_ruleset = False
        self.ruleset = Ruleset() if ruleset is None else ruleset

    def __hash__(self):
        return hash(super)

    def __repr__(self):
        return self.name + " " + super().__repr__()

    def __eq__(self, other):
        if isinstance(other, MessageType):
            return self.id == other.id
        return super().__eq__(other)

    @property
    def assign_manually(self):
        return not self.assigned_by_ruleset

    @property
    def id(self) -> str:
        return self._id

    def give_new_id(self):
        self._id = str(uuid.uuid4())

    @property
    def checksum_labels(self) -> list:
        return [lbl for lbl in self if isinstance(lbl, ChecksumLabel)]

    @property
    def unlabeled_ranges(self):
        return self._unlabeled_ranges_from_labels(self)

    @staticmethod
    def _unlabeled_ranges_from_labels(labels):
        start = 0
        result = []
        for lbl in labels:
            if lbl.start > start:
                result.append((start, lbl.start))
            start = lbl.end
        result.append((start, None))
        return result

    def unlabeled_ranges_with_other_mt(self, other_message_type):
        labels = sorted(list(self) + list(other_message_type))
        return self._unlabeled_ranges_from_labels(labels)

    def get_first_label_with_type(self, field_type: FieldType.Function) -> ProtocolLabel:
        return next((lbl for lbl in self
                     if lbl.field_type and lbl.field_type.function == field_type), None)

    def num_labels_with_type(self, field_type: FieldType.Function) -> int:
        return len([lbl for lbl in self
                    if lbl.field_type and lbl.field_type.function == field_type])

    def append(self, lbl: ProtocolLabel):
        super().append(lbl)
        self.sort()

    def _create_label(self, name, start, end, color_index, auto_created, field_type):
        if field_type is not None and field_type.function == FieldType.Function.CHECKSUM:
            # data range starts behind preamble/sync if present
            pre_sync_label_ends = [lbl.end for lbl in self if lbl.is_preamble or lbl.is_sync]
            range_start = max(pre_sync_label_ends) if pre_sync_label_ends else 0
            if range_start >= start:
                range_start = 0
            return ChecksumLabel(name=name, start=start, end=end, color_index=color_index,
                                 field_type=field_type, auto_created=auto_created,
                                 data_range_start=range_start)
        return ProtocolLabel(name=name, start=start, end=end, color_index=color_index,
                             field_type=field_type, auto_created=auto_created)

    def add_protocol_label(self, start: int, end: int, name=None, color_ind=None,
                           auto_created=False, type: FieldType = None) -> ProtocolLabel:
        name = "" if not name else name
        used_colors = [p.color_index for p in self]
        avail_colors = [i for i in range(NUM_LABEL_COLORS) if i not in used_colors]
        if color_ind is None:
            color_ind = avail_colors[0] if avail_colors else random.randint(0, NUM_LABEL_COLORS - 1)

        proto_label = self._create_label(name, start, end, color_ind, auto_created, type)
        if proto_label not in self:
            self.append(proto_label)
            self.sort()
        return proto_label

    def add_protocol_label_start_length(self, start: int, length: int, name=None,
                                        color_ind=None, auto_created=False,
                                        type: FieldType = None) -> ProtocolLabel:
        return self.add_protocol_label(start, start + length - 1, name, color_ind,
                                       auto_created, type)

    def add_label(self, lbl: ProtocolLabel, allow_overlapping=True):
        if allow_overlapping or not any(lbl.overlaps_with(o) for o in self):
            added = self.add_protocol_label(lbl.start, lbl.end - 1, name=lbl.name,
                                            color_ind=lbl.color_index, type=lbl.field_type)
            added.display_format_index = lbl.display_format_index
            added.display_bit_order_index = lbl.display_bit_order_index
            if isinstance(lbl, ChecksumLabel) and isinstance(added, ChecksumLabel):
                added.data_ranges = copy.copy(lbl.data_ranges)
                added.category = copy.copy(lbl.category)
                added.checksum = copy.copy(lbl.checksum)

    def remove(self, lbl: ProtocolLabel):
        if lbl in self:
            super().remove(lbl)

    def change_field_type_of_label(self, label: ProtocolLabel, field_type: FieldType):
        if not isinstance(label, ProtocolLabel) and hasattr(label, "field_type"):
            label.field_type = field_type
            return
        is_crc_type = (field_type is not None
                       and field_type.function == FieldType.Function.CHECKSUM)
        if is_crc_type != isinstance(label, ChecksumLabel):
            self[self.index(label)] = self._create_label(
                label.name, label.start, label.end - 1, label.color_index,
                label.auto_created, field_type)
        else:
            label.field_type = field_type

    def to_xml(self) -> ET.Element:
        result = ET.Element("message_type", attrib={
            "name": self.name,
            "id": self.id,
            "assigned_by_ruleset": "1" if self.assigned_by_ruleset else "0",
            "assigned_by_logic_analyzer": "1" if self.assigned_by_logic_analyzer else "0",
        })
        for lbl in self:
            result.append(lbl.to_xml())
        result.append(self.ruleset.to_xml())
        return result

    @staticmethod
    def from_xml(tag: ET.Element):
        field_types_by_caption = {ft.caption: ft for ft in FieldType.default_field_types()}
        name = tag.get("name", "blank")
        id = tag.get("id", None)
        labels = []
        for lbl_tag in tag.findall("label"):
            labels.append(ProtocolLabel.from_xml(lbl_tag, field_types_by_caption))
        for lbl_tag in tag.findall("checksum_label"):
            labels.append(ChecksumLabel.from_xml(lbl_tag, field_types_by_caption))
        result = MessageType(name=name, iterable=labels, id=id,
                             ruleset=Ruleset.from_xml(tag.find("ruleset")))
        result.assigned_by_ruleset = bool(int(tag.get("assigned_by_ruleset", 0)))
        result.assigned_by_logic_analyzer = bool(int(tag.get("assigned_by_logic_analyzer", 0)))
        return result


class Participant:
    __slots__ = ["name", "shortname", "address_hex", "color_index", "show",
                 "simulate", "relative_rssi", "_id"]

    def __init__(self, name: str, shortname: str = None, address_hex: str = None,
                 color_index=0, id: str = None, relative_rssi=0, simulate=False):
        self.name = name if name else "unknown"
        self.shortname = shortname if shortname else (name[0].upper() if len(name) > 0 else "X")
        self.address_hex = address_hex if address_hex else ""
        self.color_index = color_index
        self.show = True
        self.simulate = simulate
        self.relative_rssi = relative_rssi
        self._id = str(uuid.uuid4()) if id is None else id

    def __eq__(self, other):
        return isinstance(other, Participant) and self.id_match(other.id)

    @property
    def id(self):
        return self._id

    def __repr__(self):
        if self.address_hex:
            return "{0} ({1}) [{2}]".format(self.name, self.shortname, self.address_hex)
        return "{0} ({1})".format(self.name, self.shortname)

    def __str__(self):
        return repr(self)

    def id_match(self, id):
        return self._id == id

    def __hash__(self):
        return hash(self.id)

    def __lt__(self, other):
        return isinstance(other, Participant) and self.shortname < other.shortname

    @staticmethod
    def find_matching(participant_id: str, participants: list):
        return next((p for p in participants if p.id_match(participant_id)), None)

    def to_xml(self) -> ET.Element:
        root = ET.Element("participant")
        root.set("name", self.name)
        root.set("shortname", self.shortname)
        root.set("address_hex", self.address_hex)
        root.set("color_index", str(self.color_index))
        root.set("id", str(self.id))
        root.set("relative_rssi", str(self.relative_rssi))
        root.set("simulate", str(int(self.simulate)))
        return root

    @staticmethod
    def from_xml(tag: ET.Element):
        name = tag.get("name", "Empty")
        shortname = tag.get("shortname", "X")
        address_hex = tag.get("address_hex", "")
        color_index = int(tag.get("color_index", 0))
        relative_rssi = int(tag.get("relative_rssi", 0))
        result = Participant(name, shortname=shortname, address_hex=address_hex,
                             color_index=color_index, id=tag.attrib["id"],
                             relative_rssi=relative_rssi)
        result.simulate = bool(int(tag.get("simulate", "0")))
        return result

    @staticmethod
    def participants_to_xml_tag(participants: list) -> ET.Element:
        root = ET.Element("participants")
        for p in participants:
            root.append(p.to_xml())
        return root

    @staticmethod
    def read_participants_from_xml_tag(xml_tag: ET.Element):
        if xml_tag is None:
            return []
        if xml_tag.tag != "participants":
            xml_tag = xml_tag.find("participants")
        if xml_tag is None:
            return []
        return [Participant.from_xml(tag) for tag in xml_tag.findall("participant")]
