"""Common ranges: candidate protocol fields found by awre engines.

Counterpart of urh/awre/CommonRange.py: a CommonRange is a candidate
field (start, length, values, score, applicable message indices) in
bit/hex/byte units; a CommonRangeContainer is the raw equivalent of a
message type.
"""

from __future__ import annotations

import copy
import itertools

import numpy as np

from urh_tpu.coding.crc import GenericCRC


class CommonRange:
    def __init__(self, start, length, value: np.ndarray = None, score=0,
                 field_type="Generic", message_indices=None, range_type="bit",
                 byte_order="big"):
        self.start = start
        self.length = length
        self._byte_order = byte_order
        self.sync_end = 0

        if isinstance(value, str):
            value = np.array(list(map(lambda x: int(x, 16), value)), dtype=np.uint8)

        self.values = [value] if value is not None else []
        self.score = score
        self.field_type = field_type
        self.range_type = range_type.lower()  # bit/hex/byte
        self.message_indices = set() if message_indices is None else set(message_indices)

    @property
    def end(self):
        return self.start + self.length - 1

    def _convert_number(self, n):
        n = int(n)  # plain int: numpy scalars overflow in bit arithmetic
        if self.range_type == "bit":
            return n
        if self.range_type == "hex":
            return n * 4
        if self.range_type == "byte":
            return n * 8
        raise ValueError(f"unknown range type {self.range_type}")

    @property
    def bit_start(self):
        return self._convert_number(self.start) + self.sync_end

    @property
    def bit_end(self):
        return self._convert_number(self.start) + self._convert_number(self.length) - 1 + self.sync_end

    @property
    def length_in_bits(self):
        return self.bit_end - self.bit_start - 1

    @property
    def value(self):
        if len(self.values) == 0:
            return None
        if len(self.values) == 1:
            return self.values[0]
        raise ValueError("this range has multiple values")

    @value.setter
    def value(self, val):
        if len(self.values) == 0:
            self.values = [val]
        elif len(self.values) == 1:
            self.values[0] = val
        else:
            raise ValueError("this range has multiple values")

    @property
    def byte_order(self):
        return "big" if self.byte_order_is_unknown else self._byte_order

    @byte_order.setter
    def byte_order(self, val):
        self._byte_order = val

    @property
    def byte_order_is_unknown(self) -> bool:
        return self._byte_order is None

    def matches(self, start: int, value: np.ndarray):
        return (self.start == start and self.length == len(value)
                and self.value.tobytes() == value.tobytes())

    def __repr__(self):
        result = "{} {}-{} ({} {})".format(self.field_type, self.bit_start,
                                           self.bit_end, self.length, self.range_type)
        result += " Values: " + " ".join(
            "".join("{0:02x}".format(int(x)) for x in v) for v in self.values
        )
        if self.score is not None:
            result += " Score: " + str(self.score)
        result += " Message indices: {" + ",".join(map(str, sorted(self.message_indices))) + "}"
        return result

    def __eq__(self, other):
        if not isinstance(other, CommonRange):
            return False
        return (self.bit_start == other.bit_start and self.bit_end == other.bit_end
                and self.field_type == other.field_type)

    def __hash__(self):
        return hash((self.start, self.length, self.field_type))

    def __lt__(self, other):
        return self.bit_start < other.bit_start

    def overlaps_with(self, other) -> bool:
        if not isinstance(other, CommonRange):
            raise ValueError("need another bit range to compare")
        return self.bit_start < other.bit_end and other.bit_start < self.bit_end

    def _trimmed_copy(self, new_start: int, new_length: int):
        """Deep copy covering [new_start, new_start+new_length) with the
        value sliced accordingly."""
        piece = copy.deepcopy(self)
        offset = new_start - self.start
        piece.start, piece.length = new_start, new_length
        piece.value = self.value[offset: offset + new_length]
        return piece

    def ensure_not_overlaps(self, start: int, end: int):
        """Split/trim this range so it does not overlap [start, end)."""
        # disjoint: keep as is
        if end < self.start or start > self.end:
            return [copy.deepcopy(self)]

        # [start, end) covers the left part only -> keep the right remainder
        if start <= self.start < end < self.end:
            return [self._trimmed_copy(end, self.length - (end - self.start))]

        # covers the right part only -> keep the left remainder
        if self.start < start <= self.end <= end:
            return [self._trimmed_copy(self.start, self.length - (self.end + 1 - start))]

        # strictly inside -> keep both remainders
        if self.start < start and self.end > end:
            return [self._trimmed_copy(self.start, start - self.start),
                    self._trimmed_copy(end + 1, self.end - end)]

        # fully covered -> nothing survives
        return []


class ChecksumRange(CommonRange):
    def __init__(self, start, length, crc: GenericCRC, data_range_start, data_range_end,
                 value: np.ndarray = None, score=0, field_type="Generic",
                 message_indices=None, range_type="bit"):
        super().__init__(start, length, value, score, field_type, message_indices, range_type)
        self.data_range_start = data_range_start
        self.data_range_end = data_range_end
        self.crc = crc

    @property
    def data_range_bit_start(self):
        return self.data_range_start + self.sync_end

    @property
    def data_range_bit_end(self):
        return self.data_range_end + self.sync_end

    def __eq__(self, other):
        return (super().__eq__(other)
                and self.data_range_start == other.data_range_start
                and self.data_range_end == other.data_range_end
                and self.crc == other.crc)

    def __hash__(self):
        return hash((self.start, self.length, self.data_range_start,
                     self.data_range_end, self.crc))

    def __repr__(self):
        return (super().__repr__() + " \t" + "{}".format(self.crc.caption)
                + " Datarange: {}-{} ".format(self.data_range_start, self.data_range_end))


class EmptyCommonRange(CommonRange):
    """Indicates that no common range was found for a field type."""

    def __init__(self, field_type="Generic"):
        super().__init__(0, 0, "")
        self.field_type = field_type

    def __eq__(self, other):
        return isinstance(other, EmptyCommonRange) and other.field_type == self.field_type

    def __repr__(self):
        return "No " + self.field_type

    def __hash__(self):
        return hash(super)


class CommonRangeContainer:
    """The raw equivalent of a message type: a sorted list of ranges."""

    def __init__(self, ranges: list, message_indices: set = None):
        assert isinstance(ranges, list)
        self._ranges = ranges
        self._ranges.sort()
        if message_indices is None:
            self.update_message_indices()
        else:
            self.message_indices = message_indices

    @property
    def ranges_overlap(self) -> bool:
        return self.has_overlapping_ranges(self._ranges)

    def update_message_indices(self):
        if len(self) == 0:
            self.message_indices = set()
        else:
            self.message_indices = set(self[0].message_indices)
            for i in range(1, len(self)):
                self.message_indices.intersection_update(self[i].message_indices)

    def add_range(self, rng: CommonRange):
        self._ranges.append(rng)
        self._ranges.sort()

    def add_ranges(self, ranges: list):
        self._ranges.extend(ranges)
        self._ranges.sort()

    def has_same_ranges(self, ranges: list) -> bool:
        return self._ranges == ranges

    def has_same_ranges_as_container(self, container):
        if not isinstance(container, CommonRangeContainer):
            return False
        return self._ranges == container._ranges

    @staticmethod
    def has_overlapping_ranges(ranges: list) -> bool:
        for rng1, rng2 in itertools.combinations(ranges, 2):
            if rng1.overlaps_with(rng2):
                return True
        return False

    def __len__(self):
        return len(self._ranges)

    def __iter__(self):
        return self._ranges.__iter__()

    def __getitem__(self, item):
        return self._ranges[item]

    def __repr__(self):
        from pprint import pformat

        return pformat(self._ranges)

    def __eq__(self, other):
        if not isinstance(other, CommonRangeContainer):
            return False
        return self._ranges == other._ranges and self.message_indices == other.message_indices
