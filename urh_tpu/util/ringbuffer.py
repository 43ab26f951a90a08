"""SPSC ring buffer over shared memory for continuous TX/RX streaming.

Counterpart of urh/util/RingBuffer.py: complex (N, 2) samples in a
multiprocessing shared Array so a producer process (e.g. the continuous
modulator) and a consumer process (device TX) stream without copies
through the Python heap.  A C++ lock-free variant for the native IO
path lives in urh_tpu/native.
"""

from __future__ import annotations

import multiprocessing

# spawn context: these objects are shared into spawned device processes
_mp = multiprocessing.get_context("spawn")
Array, Value = _mp.Array, _mp.Value

import numpy as np


class RingBuffer:
    def __init__(self, size: int, dtype=np.float32):
        self.dtype = np.dtype(dtype)
        types = {np.dtype(np.uint8): "B", np.dtype(np.int8): "b",
                 np.dtype(np.int16): "h", np.dtype(np.uint16): "H",
                 np.dtype(np.float32): "f", np.dtype(np.float64): "d"}
        self._data = Array(types[self.dtype], 2 * size)
        self.size = size
        self._left_index = Value("L", 0)
        self._right_index = Value("L", 0)
        self._length = Value("L", 0)

    def __len__(self):
        return self._length.value

    @property
    def left_index(self):
        return self._left_index.value

    @left_index.setter
    def left_index(self, value):
        self._left_index.value = value % self.size

    @property
    def right_index(self):
        return self._right_index.value

    @right_index.setter
    def right_index(self, value):
        self._right_index.value = value % self.size

    @property
    def is_empty(self) -> bool:
        return len(self) == 0

    @property
    def space_left(self):
        return self.size - len(self)

    @property
    def data(self):
        return np.frombuffer(self._data.get_obj(), dtype=self.dtype).reshape(-1, 2)

    @property
    def view_data(self):
        left, right = self.left_index, self.left_index + len(self)
        if left > right:
            left, right = right, left
        data = self.data.flatten()
        return np.concatenate((data[left:right], data[right:], data[:left]))

    def clear(self):
        self.left_index = 0
        self.right_index = 0

    def will_fit(self, number_values: int) -> bool:
        return number_values <= self.space_left

    def push(self, values):
        """Push (N, 2) values; raises ValueError if they do not fit."""
        n = len(values)
        if len(self) + n > self.size:
            raise ValueError("too much data to push to RingBuffer")

        # contiguous tail, then wrap-around head
        first = min(n, self.size - self.right_index)
        with self._data.get_lock():
            data = np.frombuffer(self._data.get_obj(), dtype=self.dtype).reshape(-1, 2)
            data[self.right_index: self.right_index + first] = values[:first]
            data[: n - first] = values[first:]
            self.right_index += n
        self._length.value += n

    def pop(self, number: int, ensure_even_length=False) -> np.ndarray:
        """Pop up to ``number`` samples (all remaining when negative)."""
        if ensure_even_length:
            number -= number % 2
        if self.is_empty or number == 0:
            return np.array([], dtype=self.dtype)

        number = len(self) if number < 0 else min(number, len(self))

        with self._data.get_lock():
            data = np.frombuffer(self._data.get_obj(), dtype=self.dtype).reshape(-1, 2)
            first = min(number, len(data) - self.left_index)
            result = np.empty((number, 2), dtype=self.dtype)
            result[:first] = data[self.left_index: self.left_index + first]
            result[first:] = data[: number - first]

        self.left_index += number
        self._length.value -= number
        return result
