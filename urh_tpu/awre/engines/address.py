"""Address-field inference engine (urh/awre/engines/AddressEngine.py).

Finds address candidates per participant via length-clustered common
ranges and longest-common-subsequences across participants, scores
cross-swapped SRC/DST pairs and ACK patterns, assigns addresses to
participants and labels SRC vs DST fields, including broadcast
detection.
"""

from __future__ import annotations

import itertools
import math
from array import array
from collections import Counter, defaultdict

import numpy as np

from urh_tpu.awre import kernels as awre_kernels
from urh_tpu.awre.common_range import CommonRange
from urh_tpu.awre.engines.engine import Engine


class AddressEngine(Engine):
    def __init__(self, msg_vectors, participant_indices,
                 known_participant_addresses: dict = None,
                 already_labeled: list = None, src_field_present=False):
        assert len(msg_vectors) == len(participant_indices)

        self.minimum_score = 0.1
        self.msg_vectors = msg_vectors
        self.participant_indices = participant_indices
        self.already_labeled = []
        self.src_field_present = src_field_present

        if already_labeled is not None:
            for start, end in already_labeled:
                # bit -> hex columns
                self.already_labeled.append((int(math.ceil(start / 4)), int(math.ceil(end / 4))))

        self.message_indices_by_participant = defaultdict(list)
        for i, participant_index in enumerate(self.participant_indices):
            self.message_indices_by_participant[participant_index].append(i)

        if known_participant_addresses is None:
            self.known_addresses_by_participant = dict()
        else:
            self.known_addresses_by_participant = known_participant_addresses

    @staticmethod
    def cross_swap_check(rng1: CommonRange, rng2: CommonRange):
        return ((rng1.start == rng2.start + rng1.length
                 or rng1.start == rng2.start - rng1.length)
                and rng1.value.tobytes() == rng2.value.tobytes())

    @staticmethod
    def ack_check(rng1: CommonRange, rng2: CommonRange):
        return (rng1.start == rng2.start and rng1.length == rng2.length
                and rng1.value.tobytes() != rng2.value.tobytes())

    def find(self):
        addresses_by_participant = {p: [addr.tobytes()]
                                    for p, addr in self.known_addresses_by_participant.items()}
        addresses_by_participant.update(self.find_addresses())
        self._debug("Addresses by participant", addresses_by_participant)

        ranges_by_participant = defaultdict(list)

        addresses = [np.array(np.frombuffer(a, dtype=np.uint8))
                     for address_list in addresses_by_participant.values()
                     for a in address_list]

        already_labeled_cols = array("L", [e for rng in self.already_labeled for e in range(*rng)])

        # occurrences of address candidates in messages -> common ranges
        for i, msg_vector in enumerate(self.msg_vectors):
            participant = self.participant_indices[i]
            for address in addresses:
                for index in awre_kernels.find_occurrences(msg_vector, address, already_labeled_cols):
                    common_ranges = ranges_by_participant[participant]
                    rng = next((cr for cr in common_ranges if cr.matches(index, address)), None)
                    if rng is not None:
                        rng.message_indices.add(i)
                    else:
                        common_ranges.append(CommonRange(index, len(address), address,
                                                         message_indices={i},
                                                         range_type="hex"))

        num_messages_by_participant = defaultdict(int)
        for participant in self.participant_indices:
            num_messages_by_participant[participant] += 1

        # score cross-swapped values between participant clusters
        for p1, p2 in itertools.combinations(ranges_by_participant, 2):
            ranges1_set, ranges2_set = set(ranges_by_participant[p1]), set(ranges_by_participant[p2])
            for rng1, rng2 in itertools.product(ranges_by_participant[p1], ranges_by_participant[p2]):
                if rng1 in ranges2_set and rng2 in ranges1_set:
                    if self.cross_swap_check(rng1, rng2):
                        rng1.score += len(rng2.message_indices) / num_messages_by_participant[p2]
                        rng2.score += len(rng1.message_indices) / num_messages_by_participant[p1]
                    elif self.ack_check(rng1, rng2):
                        # previous score in divisor gives bonus to ranges
                        # applying to all messages
                        rng1.score += len(rng2.message_indices) / (num_messages_by_participant[p2] + rng1.score)
                        rng2.score += len(rng1.message_indices) / (num_messages_by_participant[p1] + rng2.score)

        if len(ranges_by_participant) == 1 and not self.src_field_present:
            for p, ranges in ranges_by_participant.items():
                for rng in sorted(ranges):
                    try:
                        if np.array_equal(rng.value, self.known_addresses_by_participant[p]):
                            # address already known -> highscore leftmost range
                            rng.score = 1
                            break
                    except KeyError:
                        pass

        high_scored_ranges_by_participant = defaultdict(list)
        address_length = self._estimate_address_length(ranges_by_participant)

        for participant, common_ranges in ranges_by_participant.items():
            sorted_ranges = sorted(filter(lambda cr: cr.score > self.minimum_score, common_ranges),
                                   key=lambda cr: (-cr.score, cr))
            if len(sorted_ranges) == 0:
                addresses_by_participant[participant] = dict()
                continue

            addresses_by_participant[participant] = {
                a for a in addresses_by_participant.get(participant, [])
                if len(a) == address_length
            }
            for rng in filter(lambda r: r.length == address_length, sorted_ranges):
                rng.score = min(rng.score, 1.0)
                high_scored_ranges_by_participant[participant].append(rng)

        self._assign_participant_addresses(addresses_by_participant,
                                           high_scored_ranges_by_participant)

        for participant, address in addresses_by_participant.copy().items():
            if address is None:
                del addresses_by_participant[participant]

        # separate SRC and DST
        for participant, ranges in high_scored_ranges_by_participant.items():
            try:
                address = addresses_by_participant[participant]
            except KeyError:
                high_scored_ranges_by_participant[participant] = []
                continue

            result = []
            for rng in sorted(ranges, key=lambda r: r.score, reverse=True):
                rng.field_type = ("source address" if rng.value.tobytes() == address
                                  else "destination address")
                if len(result) == 0:
                    result.append(rng)
                else:
                    subset = next((r for r in result
                                   if rng.message_indices.issubset(r.message_indices)), None)
                    if subset is not None:
                        if rng.field_type == subset.field_type:
                            # same address type twice is redundant
                            continue
                        if rng.length != subset.length or (
                            rng.start != subset.end + 1 and rng.end + 1 != subset.start
                        ):
                            # SRC/DST should be adjacent
                            continue
                    result.append(rng)

            high_scored_ranges_by_participant[participant] = result

        self._find_broadcast_fields(high_scored_ranges_by_participant, addresses_by_participant)

        result = [rng for ranges in high_scored_ranges_by_participant.values() for rng in ranges]
        # without a SRC address, lower scores so DST does not win ties later
        if not any(rng.field_type == "source address" for rng in result):
            for rng in result:
                rng.score *= 0.95

        return result

    def _estimate_address_length(self, ranges_by_participant: dict):
        """Assume one common address length across participants; majority
        vote with substring overestimation protection."""
        address_lengths = []
        for participant, common_ranges in ranges_by_participant.items():
            sorted_ranges = sorted(filter(lambda cr: cr.score > self.minimum_score, common_ranges),
                                   key=lambda cr: (-cr.score, cr))
            max_scored = [r for r in sorted_ranges if sorted_ranges and r.score == sorted_ranges[0].score]

            for rng in max_scored[:]:
                same_message_rng = [r for r in sorted_ranges
                                    if r not in max_scored and r.score > 0
                                    and r.message_indices == rng.message_indices]
                if len(same_message_rng) > 1 and all(
                    r.value.tobytes() in rng.value.tobytes() for r in same_message_rng
                ):
                    max_scored.remove(rng)
                    max_scored.extend(same_message_rng)

            possible_address_lengths = [r.length for r in max_scored]
            frequencies = Counter(possible_address_lengths)
            try:
                addr_len = max(frequencies, key=lambda x: (frequencies[x], -x))
                address_lengths.append(addr_len)
            except ValueError:
                pass

        counted = Counter(address_lengths)
        try:
            return max(counted, key=lambda x: (counted[x], -x))
        except ValueError:
            return 0

    def _assign_participant_addresses(self, addresses_by_participant,
                                      high_scored_ranges_by_participant):
        scored_participants_addresses = dict()
        for participant in addresses_by_participant:
            scored_participants_addresses[participant] = defaultdict(int)

        for participant, addresses in addresses_by_participant.items():
            if participant in self.known_addresses_by_participant:
                address = self.known_addresses_by_participant[participant].tobytes()
                scored_participants_addresses[participant][address] = 9999999999
                continue

            for i in self.message_indices_by_participant[participant]:
                matching = [rng for rng in high_scored_ranges_by_participant[participant]
                            if i in rng.message_indices and rng.value.tobytes() in addresses]

                if len(matching) == 1:
                    address = matching[0].value.tobytes()
                    # only one address: probably a DST, not a SRC
                    scored_participants_addresses[participant][address] *= 0.9

                    # probably an ACK: address is SRC of previous message's sender
                    if i > 0 and self.participant_indices[i - 1] != participant:
                        prev_participant = self.participant_indices[i - 1]
                        prev_matching = [rng for rng in high_scored_ranges_by_participant[prev_participant]
                                         if i - 1 in rng.message_indices and rng.value.tobytes() in addresses]
                        if len(prev_matching) > 1:
                            for prev_rng in filter(lambda r: r.value.tobytes() == address, prev_matching):
                                scored_participants_addresses[prev_participant][address] += prev_rng.score
                elif len(matching) > 1:
                    # several addresses: a SRC must be among them
                    for rng in matching:
                        scored_participants_addresses[participant][rng.value.tobytes()] += rng.score

        minimum_score = 0.5
        taken_addresses = set()
        self._debug("Scored addresses", scored_participants_addresses)

        # all participants with exactly one distinct candidate -> assign directly
        if all(len(addresses) == 1 for addresses in scored_participants_addresses.values()):
            all_addresses = [list(addresses)[0] for addresses in scored_participants_addresses.values()]
            if len(all_addresses) == len(set(all_addresses)):
                for p, addresses in scored_participants_addresses.items():
                    addresses_by_participant[p] = list(addresses)[0]
                return

        for participant, addresses in sorted(scored_participants_addresses.items()):
            try:
                found_address = max(
                    sorted(filter(lambda a: a not in taken_addresses
                                  and addresses[a] >= minimum_score, addresses),
                           reverse=True),
                    key=addresses.get,
                )
            except ValueError:
                addresses_by_participant[participant] = None
                continue
            addresses_by_participant[participant] = found_address
            taken_addresses.add(found_address)

    def _find_broadcast_fields(self, high_scored_ranges_by_participant,
                               addresses_by_participant: dict):
        """Detect a broadcast address: SRC-only messages whose would-be DST
        position holds a common value."""
        if -1 in addresses_by_participant:
            return

        broadcast_bag = defaultdict(list)
        for common_ranges in high_scored_ranges_by_participant.values():
            src_address_fields = sorted(filter(lambda r: r.field_type == "source address", common_ranges))
            dst_address_fields = sorted(filter(lambda r: r.field_type == "destination address", common_ranges))
            msg_with_dst = {i for dst in dst_address_fields for i in dst.message_indices}

            for src_address_field in src_address_fields:
                msg_without_dst = {i for i in src_address_field.message_indices if i not in msg_with_dst}
                if len(msg_without_dst) == 0:
                    continue
                try:
                    matching_dst = next(
                        dst for dst in dst_address_fields
                        if all(i in dst.message_indices
                               for i in src_address_field.message_indices - msg_without_dst)
                    )
                except StopIteration:
                    continue
                for msg in msg_without_dst:
                    broadcast_bag[matching_dst].append(msg)

        if len(broadcast_bag) == 0:
            return

        broadcast_address = None
        for dst, messages in broadcast_bag.items():
            for msg_index in messages:
                value = self.msg_vectors[msg_index][dst.start : dst.end + 1]
                if broadcast_address is None:
                    broadcast_address = value
                elif value.tobytes() != broadcast_address.tobytes():
                    return  # not common -> not broadcast

        addresses_by_participant[-1] = broadcast_address.tobytes()
        for dst, messages in broadcast_bag.items():
            dst.values.append(broadcast_address)
            dst.message_indices.update(messages)

    def find_addresses(self) -> dict:
        already_assigned = list(self.known_addresses_by_participant.keys())
        if len(already_assigned) == len(self.message_indices_by_participant):
            self._debug("skip find_addresses: all known")
            return dict()

        common_ranges_by_participant = dict()
        for participant, message_indices in self.message_indices_by_participant.items():
            length_clusters = defaultdict(list)
            for i in message_indices:
                length_clusters[len(self.msg_vectors[i])].append(i)

            common_ranges_by_length = self.find_common_ranges_by_cluster(
                self.msg_vectors, length_clusters, range_type="hex")
            common_ranges_by_participant[participant] = []
            for ranges in common_ranges_by_length.values():
                common_ranges_by_participant[participant].extend(
                    self.ignore_already_labeled(ranges, self.already_labeled))

        result = defaultdict(set)
        participants = sorted(common_ranges_by_participant)
        if len(participants) < 2:
            return result

        if len(already_assigned) > 0:
            addr_len = len(self.known_addresses_by_participant[already_assigned[0]])
        else:
            addr_len = None

        for p1, p2 in itertools.combinations(participants, 2):
            p1_assigned = p1 in already_assigned
            p2_assigned = p2 in already_assigned
            if p1_assigned and p2_assigned:
                continue

            values1 = [cr.value for cr in common_ranges_by_participant[p1]]
            values2 = [cr.value for cr in common_ranges_by_participant[p2]]
            for seq1, seq2 in itertools.product(values1, values2):
                lcs = self.find_longest_common_sub_sequences(seq1, seq2)
                vals = lcs if len(lcs) > 0 else [seq1, seq2]
                # address candidates are at least 2 hex digits long
                for val in filter(lambda v: len(v) >= 2, vals):
                    if addr_len is not None and len(val) != addr_len:
                        continue
                    if not p1_assigned and not p2_assigned:
                        result[p1].add(val.tobytes())
                        result[p2].add(val.tobytes())
                    elif p1_assigned and val.tobytes() != self.known_addresses_by_participant[p1].tobytes():
                        result[p2].add(val.tobytes())
                    elif p2_assigned and val.tobytes() != self.known_addresses_by_participant[p2].tobytes():
                        result[p1].add(val.tobytes())
        return result
