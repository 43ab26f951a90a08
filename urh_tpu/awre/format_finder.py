"""FormatFinder: iterative protocol field inference orchestration.

Counterpart of urh/awre/FormatFinder.py (584 LoC): preprocess
(preamble/sync), run the length/address/sequence-number/checksum
engines per message type, merge and conflict-resolve the found ranges,
and split message types when field sets diverge.
"""

from __future__ import annotations

import copy
import math
from collections import defaultdict

import numpy as np

from urh_tpu.awre import auto_assigner as AutoAssigner
from urh_tpu.awre import kernels as awre_kernels
from urh_tpu.awre.common_range import (ChecksumRange, CommonRange,
                                       CommonRangeContainer, EmptyCommonRange)
from urh_tpu.awre.engines.address import AddressEngine
from urh_tpu.awre.engines.checksum import ChecksumEngine
from urh_tpu.awre.engines.length import LengthEngine
from urh_tpu.awre.engines.sequence_number import SequenceNumberEngine
from urh_tpu.awre.preprocessor import Preprocessor
from urh_tpu.coding.wsp import WSPChecksum
from urh_tpu.protocol.labels import ChecksumLabel, FieldType, MessageType


class FormatFinder:
    MIN_MESSAGES_PER_CLUSTER = 2

    def __init__(self, messages, participants=None, shortest_field_length=None):
        if participants is not None:
            AutoAssigner.auto_assign_participants(messages, participants)

        existing_message_types_by_msg = {i: msg.message_type for i, msg in enumerate(messages)}
        self.existing_message_types = defaultdict(list)
        for i, message_type in existing_message_types_by_msg.items():
            self.existing_message_types[message_type].append(i)

        preprocessor = Preprocessor(self.get_bitvectors_from_messages(messages),
                                    existing_message_types_by_msg)
        self.preamble_starts, self.preamble_lengths, sync_len = preprocessor.preprocess()
        self.sync_ends = self.preamble_starts + self.preamble_lengths + sync_len

        n = shortest_field_length
        if n is None:
            # 0 = no sync found
            n = 8 if sync_len >= 8 else 4 if sync_len >= 4 else 1 if sync_len >= 1 else 0

        for i, value in enumerate(self.sync_ends):
            # in doubt, underestimate the sync end
            if n > 0:
                self.sync_ends[i] = (n * max(int(math.floor((value - self.preamble_starts[i]) / n)), 1)
                                     + self.preamble_starts[i])
            else:
                self.sync_ends[i] = self.preamble_starts[i]

            if self.sync_ends[i] - self.preamble_starts[i] < self.preamble_lengths[i]:
                self.preamble_lengths[i] = self.sync_ends[i] - self.preamble_starts[i]

        self.bitvectors = self.get_bitvectors_from_messages(messages, self.sync_ends)
        self.hexvectors = self.get_hexvectors(self.bitvectors)
        self.current_iteration = 0

        participants = list(sorted(set(msg.participant for msg in messages
                                       if msg.participant is not None)))
        self.participant_indices = [
            participants.index(msg.participant) if msg.participant is not None else -1
            for msg in messages
        ]
        self.known_participant_addresses = {
            participants.index(p): np.array([int(h, 16) for h in p.address_hex], dtype=np.uint8)
            for p in participants if p and p.address_hex
        }

    @property
    def message_types(self):
        return sorted(self.existing_message_types.keys(), key=lambda x: x.name)

    def perform_iteration_for_message_type(self, message_type: MessageType):
        """One inference pass for all messages of a message type; returns
        newly found fields as CommonRanges."""
        indices = self.existing_message_types[message_type]
        engines = []

        # arbitrary sync end works: same message type implies same sync position
        sync_end = self.sync_ends[indices[0]] if indices else 0
        already_labeled = [(lbl.start - sync_end, lbl.end - sync_end)
                           for lbl in message_type if lbl.start >= sync_end]

        if not message_type.get_first_label_with_type(FieldType.Function.LENGTH):
            engines.append(LengthEngine([self.bitvectors[i] for i in indices],
                                        already_labeled=already_labeled))

        if not message_type.get_first_label_with_type(FieldType.Function.SRC_ADDRESS):
            engines.append(AddressEngine([self.hexvectors[i] for i in indices],
                                         [self.participant_indices[i] for i in indices],
                                         self.known_participant_addresses,
                                         already_labeled=already_labeled))
        elif not message_type.get_first_label_with_type(FieldType.Function.DST_ADDRESS):
            engines.append(AddressEngine([self.hexvectors[i] for i in indices],
                                         [self.participant_indices[i] for i in indices],
                                         self.known_participant_addresses,
                                         already_labeled=already_labeled,
                                         src_field_present=True))

        if not message_type.get_first_label_with_type(FieldType.Function.SEQUENCE_NUMBER):
            engines.append(SequenceNumberEngine([self.bitvectors[i] for i in indices],
                                                already_labeled=already_labeled))

        if not message_type.get_first_label_with_type(FieldType.Function.CHECKSUM):
            # a checksum not found in the first iteration will not appear later
            if self.current_iteration == 0:
                engines.append(ChecksumEngine([self.bitvectors[i] for i in indices],
                                              already_labeled=already_labeled))

        result = set()
        for engine in engines:
            high_scored_ranges = engine.find()
            high_scored_ranges = self.retransform_message_indices(high_scored_ranges,
                                                                  indices, self.sync_ends)
            merged_ranges = self.merge_common_ranges(high_scored_ranges)
            result.update(merged_ranges)
        return result

    def perform_iteration(self) -> bool:
        new_field_found = False

        for message_type in self.existing_message_types.copy():
            new_fields = self.perform_iteration_for_message_type(message_type)
            new_fields.update(
                self.get_preamble_and_sync(self.preamble_starts, self.preamble_lengths,
                                           self.sync_ends,
                                           message_type_indices=self.existing_message_types[message_type])
            )

            self.remove_overlapping_fields(new_fields, message_type)
            containers = self.create_common_range_containers(new_fields)

            # learn participant addresses from found SRC fields
            participants_with_unknown_address = set(self.participant_indices) - set(self.known_participant_addresses)
            participants_with_unknown_address.discard(-1)

            if participants_with_unknown_address:
                for container in containers:
                    src_range = next((rng for rng in container
                                      if rng.field_type == "source address"), None)
                    if src_range is None:
                        continue
                    for msg_index in src_range.message_indices:
                        if len(participants_with_unknown_address) == 0:
                            break
                        p = self.participant_indices[msg_index]
                        if p not in self.known_participant_addresses:
                            hex_vector = self.hexvectors[msg_index]
                            self.known_participant_addresses[p] = hex_vector[src_range.start : src_range.end + 1]
                            participants_with_unknown_address.discard(p)

            new_field_found |= len(containers) > 0

            if len(containers) == 1:
                for rng in containers[0]:
                    self.add_range_to_message_type(rng, message_type)
            elif len(containers) > 1:
                del self.existing_message_types[message_type]
                for i, container in enumerate(containers):
                    new_message_type = copy.deepcopy(message_type)
                    if i > 0:
                        new_message_type.name = "Message Type {}.{}".format(self.current_iteration + 1, i)
                        new_message_type.give_new_id()
                    for rng in container:
                        self.add_range_to_message_type(rng, new_message_type)
                    self.existing_message_types[new_message_type].extend(sorted(container.message_indices))

        return new_field_found

    def run(self, max_iterations=10):
        self.current_iteration = 0
        while self.perform_iteration() and self.current_iteration < max_iterations:
            self.current_iteration += 1

        if len(self.message_types) > 0:
            messages_without_message_type = set(range(len(self.bitvectors))) - set(
                i for l in self.existing_message_types.values() for i in l
            )
            self.existing_message_types[self.message_types[0]].extend(
                list(messages_without_message_type))

    @staticmethod
    def remove_overlapping_fields(common_ranges, message_type: MessageType):
        if len(message_type) == 0:
            return
        for rng in common_ranges.copy():
            for lbl in message_type:
                if rng.bit_start < lbl.end and lbl.start < rng.bit_end:
                    common_ranges.discard(rng)
                    break

    @staticmethod
    def merge_common_ranges(common_ranges):
        merged_ranges = []
        for common_range in common_ranges:
            assert isinstance(common_range, CommonRange)
            try:
                same_range = next(rng for rng in merged_ranges
                                  if rng.bit_start == common_range.bit_start
                                  and rng.bit_end == common_range.bit_end
                                  and rng.field_type == common_range.field_type)
                same_range.values.extend(common_range.values)
                same_range.message_indices.update(common_range.message_indices)
            except StopIteration:
                merged_ranges.append(common_range)
        return merged_ranges

    @staticmethod
    def add_range_to_message_type(common_range: CommonRange, message_type: MessageType):
        field_type = FieldType.from_caption(common_range.field_type)
        label = message_type.add_protocol_label(name=common_range.field_type,
                                                start=common_range.bit_start,
                                                end=common_range.bit_end,
                                                auto_created=True, type=field_type)
        label.display_endianness = common_range.byte_order

        if field_type.function == FieldType.Function.CHECKSUM:
            assert isinstance(label, ChecksumLabel)
            assert isinstance(common_range, ChecksumRange)
            label.data_ranges = [[common_range.data_range_bit_start, common_range.data_range_bit_end]]
            if isinstance(common_range.crc, WSPChecksum):
                label.category = ChecksumLabel.Category.wsp
            else:
                label.checksum = copy.copy(common_range.crc)

    @staticmethod
    def get_hexvectors(bitvectors: list):
        return awre_kernels.get_hexvectors(bitvectors)

    @staticmethod
    def get_bitvectors_from_messages(messages: list, sync_ends: np.ndarray = None):
        if sync_ends is None:
            sync_ends = defaultdict(lambda: None)
        return [np.array(msg.decoded_bits[sync_ends[i] :], dtype=np.uint8, order="C")
                for i, msg in enumerate(messages)]

    @staticmethod
    def create_common_range_containers(label_set: set, num_messages: int = None):
        """Partition found labels into message-type candidates and resolve
        overlap conflicts."""
        if num_messages is None:
            message_indices = sorted(set(i for rng in label_set for i in rng.message_indices))
        else:
            message_indices = range(num_messages)

        result = []
        for i in message_indices:
            labels = sorted(set(rng for rng in label_set
                                if i in rng.message_indices
                                and not isinstance(rng, EmptyCommonRange)))
            container = next((c for c in result if c.has_same_ranges(labels)), None)
            if container is None:
                result.append(CommonRangeContainer(labels, message_indices={i}))
            else:
                container.message_indices.add(i)

        return FormatFinder.handle_overlapping_conflict(result)

    @staticmethod
    def handle_overlapping_conflict(containers):
        result = []
        for container in containers:
            if container.ranges_overlap:
                handled = FormatFinder._handle_container_overlapping_conflict(container)
            else:
                handled = container
            try:
                same_rng_container = next(c for c in result
                                          if c.has_same_ranges_as_container(handled))
                same_rng_container.message_indices.update(handled.message_indices)
            except StopIteration:
                result.append(handled)
        return result

    @staticmethod
    def _handle_container_overlapping_conflict(container: CommonRangeContainer):
        """Resolve overlapping labels: pick the non-overlapping subset that
        maximizes cumulated score (ties: shorter total length, then presence
        of a length field, then field-type names)."""
        partitions = []
        for cur_rng in container:
            if len(partitions) == 0:
                partitions.append([cur_rng])
                continue
            last_rng = partitions[-1][-1]
            if cur_rng.overlaps_with(last_rng):
                partitions[-1].append(cur_rng)
            else:
                partitions.append([cur_rng])

        result = []
        for partition in partitions:
            possible_solutions = []
            for i, rng in enumerate(partition):
                solution = [rng] + [r for r in partition[i + 1 :] if not rng.overlaps_with(r)]
                possible_solutions.append(solution)

            best_solution = max(
                possible_solutions,
                key=lambda sol: (sum(r.score for r in sol),
                                 -sum(int(r.length_in_bits) for r in sol),
                                 "length" in {r.field_type for r in sol},
                                 "".join(r.field_type[0] for r in sol)),
            )
            result.extend(best_solution)

        return CommonRangeContainer(result, message_indices=container.message_indices)

    @staticmethod
    def retransform_message_indices(common_ranges, message_type_indices: list, sync_ends) -> list:
        """Map engine-local message indices back to the original space and
        attach per-sync-end offsets."""
        result = []
        for common_range in common_ranges:
            message_indices = np.fromiter(
                (message_type_indices[i] for i in common_range.message_indices),
                dtype=int, count=len(common_range.message_indices))

            matching_sync_ends = sync_ends[message_indices]
            for sync_end in np.unique(matching_sync_ends):
                rng = copy.deepcopy(common_range)
                rng.sync_end = sync_end
                rng.message_indices = set(message_indices[np.nonzero(matching_sync_ends == sync_end)])
                result.append(rng)
        return result

    @staticmethod
    def get_preamble_and_sync(preamble_starts, preamble_lengths, sync_ends,
                              message_type_indices):
        assert len(preamble_starts) == len(preamble_lengths) == len(sync_ends)

        result = set()
        for i in message_type_indices:
            preamble = CommonRange(preamble_starts[i], preamble_lengths[i],
                                   field_type="preamble", message_indices={i})
            existing_preamble = next((rng for rng in result if preamble == rng), None)
            if existing_preamble is not None:
                existing_preamble.message_indices.add(i)
            elif preamble_lengths[i] > 0:
                result.add(preamble)

            preamble_end = preamble_starts[i] + preamble_lengths[i]
            sync_end = sync_ends[i]
            sync = CommonRange(preamble_end, sync_end - preamble_end,
                               field_type="synchronization", message_indices={i})
            existing_sync = next((rng for rng in result if sync == rng), None)
            if existing_sync is not None:
                existing_sync.message_indices.add(i)
            elif sync_end - preamble_end > 0:
                result.add(sync)

        return result
