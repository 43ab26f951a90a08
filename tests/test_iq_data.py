"""IQData dtype-conversion matrix tests (mirrors tests/test_iq_array.py
in the reference)."""

import os
import tempfile

import numpy as np

from urh_tpu.core.iq import IQData


def test_index():
    data = np.array([1, 2, 3, 4, 5, 6], dtype=np.float32)
    iq = IQData(data)
    assert iq[0, 0] == 1
    assert list(iq[1]) == [3, 4]
    iq[0] = np.array([13, 37], dtype=np.float32)
    assert list(iq[0]) == [13, 37]


def test_complex_view():
    data = np.array([1, 2, 3, 4], dtype=np.float32)
    iq = IQData(data)
    c = iq.as_complex64()
    assert c[0] == 1 + 2j
    assert c[1] == 3 + 4j


def test_conversion_int8_float():
    data = np.array([-128, -64, 0, 64, 127], dtype=np.int8)
    iq = IQData(data[:4])
    f = iq.convert_to(np.float32)
    np.testing.assert_allclose(f.flatten(), [-1.0, -0.5, 0.0, 0.5])


def test_conversion_uint8():
    data = np.array([0, 64, 128, 255], dtype=np.uint8)
    iq = IQData(data)
    i8 = iq.convert_to(np.int8)
    np.testing.assert_array_equal(i8.flatten(), [-128, -64, 0, 127])
    f = iq.convert_to(np.float32)
    np.testing.assert_allclose(f.flatten(), [-1.0, -0.5, 0.0, 255 / 128 - 1])


def test_conversion_int16_roundtrip():
    data = np.array([-32768, -100, 100, 32767], dtype=np.int16)
    iq = IQData(data)
    u16 = iq.convert_to(np.uint16)
    np.testing.assert_array_equal(u16.flatten(), [0, 32668, 32868, 65535])
    back = IQData(u16).convert_to(np.int16)
    np.testing.assert_array_equal(back.flatten(), data)


def test_conversion_float_to_int():
    data = np.array([-1.0, -0.5, 0.0, 1.0], dtype=np.float32)
    iq = IQData(data)
    np.testing.assert_array_equal(iq.convert_to(np.int8).flatten(), [-127, -63, 0, 127])
    np.testing.assert_array_equal(iq.convert_to(np.int16).flatten(), [-32767, -16383, 0, 32767])


def test_file_roundtrip():
    data = (np.random.default_rng(0).normal(0, 0.3, 64).astype(np.float32))
    iq = IQData(data)
    with tempfile.TemporaryDirectory() as d:
        for ext in (".complex", ".complex16s", ".complex16u", ".complex32s", ".complex32u"):
            path = os.path.join(d, "x" + ext)
            iq.tofile(path)
            loaded = IQData.from_file(path)
            assert loaded.num_samples == iq.num_samples
            # lossy for int formats; just check scale survives
            f = IQData(loaded.convert_to(np.float32)).data if loaded.dtype != np.float32 else loaded.data
            # int8 formats quantize with asymmetric 127/128 scaling
            np.testing.assert_allclose(f, iq.data, atol=0.03)


def test_magnitudes():
    iq = IQData(np.array([3.0, 4.0, 6.0, 8.0], dtype=np.float32))
    np.testing.assert_allclose(iq.magnitudes, [5.0, 10.0])


def test_odd_length_drops_half_sample():
    iq = IQData(np.array([1, 2, 3], dtype=np.float32))
    assert iq.num_samples == 1


def test_staged_planes_invalidated_by_edits():
    """Regression: apply_mask / insert_subarray rebind the buffer and must
    drop the cached device copy, or post-edit demod/estimate silently run
    on the pre-edit capture."""
    iq = IQData(np.arange(16, dtype=np.float32).reshape(8, 2))
    before = np.asarray(iq.staged_planes())
    assert before.shape == (8, 2)

    mask = np.ones(8, dtype=bool)
    mask[:2] = False
    iq.apply_mask(mask)
    after_delete = np.asarray(iq.staged_planes())
    assert after_delete.shape == (6, 2)
    np.testing.assert_array_equal(after_delete, iq.data)

    iq.insert_subarray(0, np.zeros((3, 2), dtype=np.float32))
    after_insert = np.asarray(iq.staged_planes())
    assert after_insert.shape == (9, 2)
    np.testing.assert_array_equal(after_insert, iq.data)

    # direct raw-buffer writes need the documented explicit invalidation
    iq.data[0, 0] = 42.0
    iq.invalidate_staged()
    assert np.asarray(iq.staged_planes())[0, 0] == 42.0
