"""awre engine base (urh/awre/engines/Engine.py): shared helpers for
clustered histogram search and label-overlap trimming."""

from __future__ import annotations

import itertools

import numpy as np

from urh_tpu.awre import kernels as awre_kernels
from urh_tpu.awre.histogram import Histogram


class Engine:
    _DEBUG_ = False

    def _debug(self, *args):
        if self._DEBUG_:
            print("[{}]".format(self.__class__.__name__), *args)

    @staticmethod
    def find_common_ranges_by_cluster(msg_vectors, clustered_bitvectors, alpha=0.95,
                                      range_type="bit"):
        """Per-cluster histogram ranges at the given participation level."""
        result = {}
        for cluster, message_indices in clustered_bitvectors.items():
            hist = Histogram(msg_vectors, message_indices)
            result[cluster] = hist.find_common_ranges(alpha=alpha,
                                                      range_type=range_type)
        return result

    @staticmethod
    def find_common_ranges_exhaustive(msg_vectors, msg_indices, range_type="bit") -> list:
        """Pairwise (alpha=1) range search, merging identical ranges'
        message index sets."""
        found = []

        def merge_or_add(rng, pair):
            key = (rng.start, rng.value.tobytes())
            for existing in found:
                if (existing.start, existing.value.tobytes()) == key:
                    existing.message_indices.update(pair)
                    return
            found.append(rng)

        for i, j in itertools.combinations(msg_indices, 2):
            pair_hist = Histogram(msg_vectors, indices=[i, j])
            for rng in pair_hist.find_common_ranges(alpha=1, range_type=range_type):
                merge_or_add(rng, {i, j})
        return found

    @staticmethod
    def ignore_already_labeled(common_ranges, already_labeled):
        """Shrink common ranges so they do not overlap already labeled
        ranges; drop ranges that become empty."""
        result = []
        for common_range in common_ranges:
            pieces = [common_range]
            for start, end in already_labeled:
                next_pieces = []
                for rng in pieces:
                    next_pieces.extend(rng.ensure_not_overlaps(start, end))
                pieces = next_pieces
            result.extend(pieces)
        return result

    @staticmethod
    def find_longest_common_sub_sequences(seq1, seq2) -> list:
        if seq1 is None or seq2 is None:
            return []
        indices = awre_kernels.find_longest_common_sub_sequence_indices(seq1, seq2)
        subsequences = (seq1[slice(*ind)] for ind in indices)
        return [s for s in subsequences if len(s) > 0]
