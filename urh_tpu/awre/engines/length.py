"""Length-field inference engine (urh/awre/engines/LengthEngine.py).

Clusters messages by length in n-grams, finds ranges common within each
cluster whose value differs across clusters, and scores candidate
windows by a gaussian around the cluster length (with a position
penalty favoring fields near the message start).
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from urh_tpu.awre.common_range import CommonRange
from urh_tpu.awre.engines.engine import Engine
from urh_tpu.awre.kernels import bit_array_to_number


class LengthEngine(Engine):
    def __init__(self, bitvectors, already_labeled=None):
        self.bitvectors = bitvectors
        self.already_labeled = [] if already_labeled is None else already_labeled

    def find(self, n_gram_length=8, minimum_score=0.1):
        bitvectors_by_n_gram_length = defaultdict(list)
        for i, bitvector in enumerate(self.bitvectors):
            bin_num = int(math.ceil(len(bitvector) / n_gram_length))
            bitvectors_by_n_gram_length[bin_num].append(i)

        common_ranges_by_length = self.find_common_ranges_by_cluster(
            self.bitvectors, bitvectors_by_n_gram_length, alpha=0.7
        )
        for length, ranges in common_ranges_by_length.items():
            common_ranges_by_length[length] = self.ignore_already_labeled(
                ranges, self.already_labeled
            )

        self.filter_common_ranges(common_ranges_by_length)
        scored_ranges = self.score_ranges(common_ranges_by_length, n_gram_length)
        high_scores_by_length = self.choose_high_scored_ranges(
            scored_ranges, bitvectors_by_n_gram_length, minimum_score
        )
        return high_scores_by_length.values()

    @staticmethod
    def filter_common_ranges(common_ranges_by_length: dict):
        """A length field must be common within a cluster but differ across
        clusters: drop ranges that appear with the same value in several
        clusters."""
        from collections import Counter

        def key(r):
            return r.start, r.length, r.value.tobytes()

        occurrences = Counter(
            key(r) for cluster in common_ranges_by_length.values() for r in cluster)
        for length, cluster in common_ranges_by_length.items():
            cluster[:] = [r for r in cluster if occurrences[key(r)] < 2]

    @staticmethod
    def score_ranges(common_ranges_by_length: dict, n_gram_length: int):
        if n_gram_length == 8:
            window_lengths = [8, 16, 32, 64]
        else:
            window_lengths = [n_gram_length * i for i in range(1, 5)]

        scored_ranges = dict()
        for length in common_ranges_by_length:
            scored_ranges[length] = dict()
            for window_length in window_lengths:
                scored_ranges[length][window_length] = []

        byteorders = ["big", "little"] if n_gram_length == 8 else ["big"]

        def best_window(bits, target_length, window_length):
            """(score, start, byteorder) of the best-scoring window."""
            best = (-1, -1, "big")
            for start in range(0, len(bits) + 1 - window_length, n_gram_length):
                for byteorder in byteorders:
                    score = LengthEngine.score_bits(
                        bits[start: start + window_length], target_length,
                        position=start, byteorder=byteorder)
                    if score > best[0]:
                        best = (score, start, byteorder)
            return best

        for window_length in window_lengths:
            for length, common_ranges in common_ranges_by_length.items():
                candidates = (cr for cr in common_ranges
                              if cr.length >= window_length)
                for common_range in candidates:
                    score, start, byte_order = best_window(
                        common_range.value, length, window_length)
                    value = common_range.value[start: start + window_length]
                    scored_ranges[length][window_length].append(CommonRange(
                        common_range.start + start, window_length, value,
                        score=score, field_type="length",
                        message_indices=common_range.message_indices,
                        range_type=common_range.range_type,
                        byte_order=byte_order))
        return scored_ranges

    def choose_high_scored_ranges(self, scored_ranges: dict,
                                  bitvectors_by_n_gram_length: dict, minimum_score: float):
        possible_window_lengths = defaultdict(int)
        for length, ranges_by_window_length in scored_ranges.items():
            for window_length, ranges in ranges_by_window_length.items():
                try:
                    ranges_by_window_length[window_length] = max(
                        filter(lambda x: x.score >= minimum_score, ranges),
                        key=lambda x: x.score)
                    possible_window_lengths[window_length] += 1
                except ValueError:
                    ranges_by_window_length[window_length] = None

        try:
            # most frequent window length, greater wins ties
            chosen_window_length = max(possible_window_lengths,
                                       key=lambda x: (possible_window_lengths[x], x))
        except ValueError:
            return dict()

        high_scores_by_length = dict()
        for length, ranges_by_window_length in scored_ranges.items():
            try:
                if ranges_by_window_length[chosen_window_length]:
                    high_scores_by_length[length] = ranges_by_window_length[chosen_window_length]
            except KeyError:
                continue

        # clusters with a single message: borrow the best matching range
        for length, msg_indices in bitvectors_by_n_gram_length.items():
            if len(msg_indices) != 1:
                continue
            msg_index = msg_indices[0]
            bitvector = self.bitvectors[msg_index]
            max_score, best_match = 0, None
            for rng in high_scores_by_length.values():
                bits = bitvector[rng.start : rng.end + 1]
                if len(bits) > 0:
                    score = self.score_bits(bits, length, rng.start)
                    if score > max_score:
                        best_match, max_score = rng, score

            if best_match is not None:
                high_scores_by_length[length] = CommonRange(
                    best_match.start, best_match.length,
                    value=bitvector[best_match.start : best_match.end + 1],
                    score=max_score, field_type="length",
                    message_indices={msg_index}, range_type="bit")

        return high_scores_by_length

    @staticmethod
    def score_bits(bits: np.ndarray, target_length: int, position: int, byteorder="big"):
        value = bit_array_to_number(bits, len(bits))
        if byteorder == "little" and len(bits) > 8 and len(bits) % 8 == 0:
            n = len(bits) // 8
            value = int.from_bytes(value.to_bytes(n, byteorder="big"),
                                   byteorder="little", signed=False)
        # length fields live near the front: penalize large positions
        f = 1 / (1 + 0.25 * position)
        return f * LengthEngine.gauss(value, target_length)

    @staticmethod
    def gauss(x, mu, sigma=2):
        return np.exp(-0.5 * np.power((x - mu) / sigma, 2))
