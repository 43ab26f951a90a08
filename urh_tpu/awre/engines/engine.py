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
        histograms = {
            cluster: Histogram(msg_vectors, message_indices)
            for cluster, message_indices in clustered_bitvectors.items()
        }
        return {
            cluster: histogram.find_common_ranges(alpha=alpha, range_type=range_type)
            for cluster, histogram in histograms.items()
        }

    @staticmethod
    def find_common_ranges_exhaustive(msg_vectors, msg_indices, range_type="bit") -> list:
        result = []
        for i, j in itertools.combinations(msg_indices, 2):
            for rng in Histogram(msg_vectors, indices=[i, j]).find_common_ranges(
                alpha=1, range_type=range_type
            ):
                try:
                    common_range = next(
                        cr for cr in result
                        if cr.start == rng.start and cr.value.tobytes() == rng.value.tobytes()
                    )
                    common_range.message_indices.update({i, j})
                except StopIteration:
                    result.append(rng)
        return result

    @staticmethod
    def ignore_already_labeled(common_ranges, already_labeled):
        """Shrink common ranges so they do not overlap already labeled
        ranges; drop ranges that become empty."""
        result = []
        for common_range in common_ranges:
            range_result = [common_range]
            for start, end in already_labeled:
                for rng in range_result[:]:
                    range_result.remove(rng)
                    range_result.extend(rng.ensure_not_overlaps(start, end))
            result.extend(range_result)
        return result

    @staticmethod
    def find_longest_common_sub_sequences(seq1, seq2) -> list:
        result = []
        if seq1 is None or seq2 is None:
            return result
        indices = awre_kernels.find_longest_common_sub_sequence_indices(seq1, seq2)
        for ind in indices:
            s = seq1[slice(*ind)]
            if len(s) > 0:
                result.append(s)
        return result
