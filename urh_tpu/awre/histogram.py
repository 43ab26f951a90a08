"""Equality histogram over message vectors (urh/awre/Histogram.py).

Built on the O(L * maxlen) column-counting kernel in
urh_tpu.awre.kernels instead of the reference's pairwise loop.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from urh_tpu.awre import kernels as awre_kernels
from urh_tpu.awre.common_range import CommonRange


class Histogram:
    def __init__(self, vectors, indices=None, normalize=True, debug=False):
        self._vectors = vectors
        self._active_indices = list(range(len(vectors))) if indices is None else indices
        self.normalize = normalize
        self.data = awre_kernels.create_difference_histogram(self._vectors, self._active_indices)

    def __repr__(self):
        return str(self.data.tolist())

    def find_common_ranges(self, alpha=0.95, range_type="bit"):
        """All ranges (length >= 2) where at least alpha of pairs agree."""
        data_indices = np.argwhere(self.data >= alpha).flatten()
        if len(data_indices) < 2:
            return []

        result = []
        start, length = None, 0
        for i in range(1, len(data_indices)):
            if start is None:
                start = data_indices[i - 1]
                length = 1

            if data_indices[i] - data_indices[i - 1] == 1:
                length += 1
            else:
                if length >= 2:
                    value = self._get_value_for_common_range(start, length)
                    result.append(CommonRange(start, length, value,
                                              message_indices=set(self._active_indices),
                                              range_type=range_type))
                start, length = None, 0

            if i == len(data_indices) - 1 and length >= 2:
                value = self._get_value_for_common_range(start, length)
                result.append(CommonRange(start, length, value,
                                          message_indices=set(self._active_indices),
                                          range_type=range_type))
        return result

    def _get_value_for_common_range(self, start: int, length: int):
        values = defaultdict(list)
        for i in self._active_indices:
            vector = np.asarray(self._vectors[i])
            values[vector[start : start + length].tobytes()].append(i)
        # NOTE: keyed by byte-string length like the reference
        # (Histogram.py:98) — effectively "first value seen"
        value = max(values, key=lambda x: len(x))
        indices = values[value]
        return np.asarray(self._vectors[indices[0]])[start : start + length]
