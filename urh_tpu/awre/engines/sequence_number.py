"""Sequence-number inference engine
(urh/awre/engines/SequenceNumberEngine.py): finds n-gram columns whose
consecutive-message deltas are dominated by one constant, merging
adjacent columns into multi-byte counters with byte-order detection.
"""

from __future__ import annotations

import numpy as np

from urh_tpu.awre import kernels as awre_kernels
from urh_tpu.awre.common_range import CommonRange
from urh_tpu.awre.engines.engine import Engine


class SequenceNumberEngine(Engine):
    def __init__(self, bitvectors, n_gram_length=8, minimum_score=0.75,
                 already_labeled: list = None):
        self.bitvectors = bitvectors
        self.n_gram_length = n_gram_length
        self.minimum_score = minimum_score
        if already_labeled is None:
            self.already_labeled_cols = set()
        else:
            self.already_labeled_cols = {e // n_gram_length for rng in already_labeled
                                         for e in range(*rng)}

    def find(self):
        n = self.n_gram_length
        if len(self.bitvectors) < 3:
            # at least 3 messages needed to identify a sequence number
            return []

        diff_matrix = self.create_difference_matrix(self.bitvectors, self.n_gram_length)

        column_frequencies = {}
        column_scores = {}
        for j in range(diff_matrix.shape[1]):
            unique, counts = np.unique(diff_matrix[:, j], return_counts=True)
            column_frequencies[j] = dict(zip(unique, counts))
            column_scores[j] = (0 if j in self.already_labeled_cols
                                else self.calc_score(column_frequencies[j]))

        def column_values(col, indices):
            return {np.asarray(self.bitvectors[i])[col * n: (col + 1) * n].tobytes()
                    for i in indices}

        def try_extend(ranges, col, values):
            """Grow an adjacent existing counter by one n-gram; True if
            merged (big endian extends right, little extends left)."""
            for r in ranges:
                if (r.start == (col - 1) * n
                        and (r.byte_order_is_unknown or r.byte_order == "big")):
                    r.length += n
                    r.byte_order = "big"
                    r.values.extend(list(values))
                    return True
            for r in ranges:
                if (r.start == (col + 1) * n
                        and (r.byte_order_is_unknown or r.byte_order == "little")):
                    r.start -= n
                    r.length += n
                    r.byte_order = "little"
                    r.values.extend(list(values))
                    return True
            return False

        result = []
        ranked = sorted(column_scores, key=column_scores.get, reverse=True)
        for col in ranked:
            score = column_scores[col]
            if score < self.minimum_score:
                continue

            step = self.get_most_frequent(column_frequencies[col])
            rows = np.flatnonzero((diff_matrix[:, col] == step)
                                  | (diff_matrix[:, col] == 0))
            # row i of the diff matrix relates messages i and i+1
            message_indices = set(rows) | set(rows + 1)
            values = column_values(col, message_indices)

            same_messages = [r for r in result
                             if r.message_indices == message_indices]
            if try_extend(same_messages, col, values):
                continue

            new_range = CommonRange(start=col * n, length=n, score=score,
                                    field_type="sequence number",
                                    message_indices=message_indices,
                                    byte_order=None)
            new_range.values.extend(list(values))
            result.append(new_range)

        # need >= 3 distinct values for a reliable sequence number
        return [rng for rng in result if len(set(rng.values)) > 2]

    @staticmethod
    def get_most_frequent(diff_frequencies: dict):
        return max(filter(lambda x: x not in (0, -1), diff_frequencies),
                   key=diff_frequencies.get)

    @staticmethod
    def calc_score(diff_frequencies: dict) -> float:
        """High when one nonzero constant dominates the deltas."""
        total = sum(diff_frequencies.values())
        num_zeros = sum(v for k, v in diff_frequencies.items() if k == 0)
        if num_zeros == total:
            return 0
        try:
            most_frequent = SequenceNumberEngine.get_most_frequent(diff_frequencies)
        except ValueError:
            return 0
        return diff_frequencies[most_frequent] / (total - num_zeros)

    @staticmethod
    def create_difference_matrix(bitvectors, n_gram_length: int):
        return awre_kernels.create_seq_number_difference_matrix(bitvectors, n_gram_length)
