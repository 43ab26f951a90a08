"""Port of reference tests/test_ringbuffer.py over the shared-memory
RingBuffer (urh_tpu.util.ringbuffer)."""

import numpy as np
import pytest

from urh_tpu.core.iq import IQData
from urh_tpu.util.ringbuffer import RingBuffer


def iq(values):
    return IQData(np.array(values, dtype=np.complex64)).data


def test_push():
    ring_buffer = RingBuffer(size=10)
    assert ring_buffer.left_index == 0

    add1 = iq([1, 2, 3, 4, 5])
    ring_buffer.push(add1)
    assert ring_buffer.right_index == 5
    assert np.array_equal(ring_buffer.data[0:5], add1)

    add2 = iq([10, 20, 30, 40, 50, 60])
    assert not ring_buffer.will_fit(len(add2))
    ring_buffer.push(add2[:-1])
    assert np.array_equal(ring_buffer.data[5:10], add2[:-1])
    assert np.array_equal(ring_buffer.data[0:5], add1)


def test_pop():
    ring_buffer = RingBuffer(size=5)
    add1 = iq([1, 2, 3])
    ring_buffer.push(add1)
    assert np.array_equal(add1, ring_buffer.pop(40))
    assert ring_buffer.is_empty

    add2 = iq([1, 2, 3, 4])
    ring_buffer.push(add2)
    assert np.array_equal(add2, ring_buffer.pop(4))
    assert ring_buffer.is_empty

    add3 = iq([1, 2])
    ring_buffer.push(add3)
    popped_item = ring_buffer.pop(1)
    assert np.array_equal(add3[0:1], popped_item)
    assert not ring_buffer.is_empty

    add4 = iq([7, 8, 9, 10])
    ring_buffer.push(add4)
    assert not ring_buffer.will_fit(1)
    assert np.array_equal(np.concatenate((add3[1:], add4)), ring_buffer.pop(5))


def test_continuous_pop():
    ring_buffer = RingBuffer(size=10)
    values = iq(list(range(10)))
    ring_buffer.push(values)
    retrieved = np.empty((0, 2), dtype=np.float32)

    for i in range(10):
        retrieved = np.vstack((retrieved, ring_buffer.pop(1)))

    assert np.array_equal(values, retrieved)


def test_big_buffer():
    ring_buffer = RingBuffer(size=5)
    with pytest.raises(ValueError):
        ring_buffer.push(iq([1, 2, 3, 4, 5, 6, 7]))


def test_will_fit():
    ring_buffer = RingBuffer(size=8)
    assert ring_buffer.space_left == 8
    assert ring_buffer.will_fit(4)
    assert ring_buffer.will_fit(8)
    assert not ring_buffer.will_fit(9)
    ring_buffer.push(iq([1, 2, 3, 4]))
    assert ring_buffer.space_left == 4
    assert ring_buffer.will_fit(3)
    assert ring_buffer.will_fit(4)
    assert not ring_buffer.will_fit(5)
