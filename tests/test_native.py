"""Native C++ runtime tests: lock-free ring buffer and TCP streamer."""

import threading
import time

import numpy as np
import pytest

from urh_tpu.native import (NativeRingBuffer, NativeSampleReceiver, is_available,
                            native_send_samples)

pytestmark = pytest.mark.skipif(not is_available(), reason="native build unavailable")


def test_ring_push_pop():
    rb = NativeRingBuffer(1024)
    assert rb.is_empty
    data = np.arange(64, dtype=np.float32).reshape(32, 2)
    rb.push(data)
    assert len(rb) == 32
    out = rb.pop(16)
    np.testing.assert_array_equal(out, data[:16])
    out = rb.pop(-1)
    np.testing.assert_array_equal(out, data[16:])
    assert rb.is_empty
    rb.close()


def test_ring_wraparound():
    rb = NativeRingBuffer(8)
    a = np.arange(16, dtype=np.float32).reshape(8, 2)
    rb.push(a)
    rb.pop(6)
    b = np.arange(100, 112, dtype=np.float32).reshape(6, 2)
    rb.push(b)
    out = rb.pop(-1)
    np.testing.assert_array_equal(out[:2], a[6:])
    np.testing.assert_array_equal(out[2:], b)
    rb.close()


def test_ring_overflow_raises():
    rb = NativeRingBuffer(4)
    with pytest.raises(ValueError):
        rb.push(np.zeros((5, 2), dtype=np.float32))
    rb.close()


def test_ring_concurrent_producer_consumer():
    rb = NativeRingBuffer(1 << 12)
    total = 1 << 16
    sent = np.random.default_rng(0).normal(size=(total, 2)).astype(np.float32)
    received = []

    def producer():
        i = 0
        while i < total:
            chunk = sent[i : i + 512]
            if rb.will_fit(len(chunk)):
                rb.push(chunk)
                i += len(chunk)
            else:
                time.sleep(0.0005)

    def consumer():
        got = 0
        while got < total:
            out = rb.pop(1024)
            if len(out):
                received.append(out)
                got += len(out)
            else:
                time.sleep(0.0005)

    threads = [threading.Thread(target=producer), threading.Thread(target=consumer)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)

    all_received = np.concatenate(received)
    np.testing.assert_array_equal(all_received, sent)
    rb.close()


def test_native_tcp_streaming():
    rb = NativeRingBuffer(1 << 16)
    rx = NativeSampleReceiver(rb, port=0)
    data = np.random.default_rng(1).normal(size=(5000, 2)).astype(np.float32)

    sent = native_send_samples("127.0.0.1", rx.port, data)
    assert sent == len(data)

    deadline = time.time() + 5
    while len(rb) < len(data) and time.time() < deadline:
        time.sleep(0.01)

    assert rx.total_samples == len(data)
    assert rx.dropped_samples == 0
    out = rb.pop(-1)
    np.testing.assert_array_equal(out, data)
    rx.stop()
    rb.close()


def test_native_afp_demod_matches_numpy():
    """OpenMP host demod kernel vs the NumPy twin: identical gating and
    near-identical values (libm atan2 vs numpy ufunc)."""
    from urh_tpu.native import get_library

    lib = get_library()
    assert lib is not None

    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.5, (1 << 17, 2)).astype(np.float32)
    noise_sqrd = np.float32(0.25)

    for mod, code in (("ASK", 0), ("FSK", 1)):
        out = np.empty(len(x), dtype=np.float32)
        lib.urh_afp_demod_f32(x.ctypes.data, len(x), noise_sqrd,
                              np.float32(np.sqrt(2)), code, out.ctypes.data)
        re, im = x[:, 0], x[:, 1]
        mag2 = re * re + im * im
        sentinel = 0.0 if mod == "ASK" else -4.0
        if mod == "ASK":
            val = np.sqrt(mag2) / np.float32(np.sqrt(2))
        else:
            pr = np.concatenate((re[:1], re[:-1]))
            pi = np.concatenate((im[:1], im[:-1]))
            val = np.arctan2(pr * im - pi * re, pr * re + pi * im)
        exp = np.where(mag2 <= noise_sqrd, np.float32(sentinel),
                       val.astype(np.float32))
        exp[0] = sentinel
        np.testing.assert_array_equal(out == sentinel, exp == sentinel)
        np.testing.assert_allclose(out, exp, atol=1e-6)


def test_native_median_filter_matches_numpy():
    from urh_tpu.native import get_library

    lib = get_library()
    assert lib is not None

    rng = np.random.default_rng(1)
    rows = rng.normal(size=(3, 4001)).astype(np.float64)
    k = 11
    full = rows.shape[1] - k + 1
    out = np.empty((3, full), dtype=np.float32)
    lib.urh_median_full_windows(rows.ctypes.data, rows.shape[0],
                                rows.shape[1], k, out.ctypes.data)
    windows = np.lib.stride_tricks.sliding_window_view(rows, k, axis=-1)
    exp = np.sort(windows, axis=-1)[..., k // 2].astype(np.float32)
    np.testing.assert_array_equal(out, exp)


def test_native_block_states_matches_numpy_twin():
    """The fused native states kernel must be BIT-IDENTICAL to the
    NumPy _host_block twin (same signed-zero shortcut, gating, peak) —
    it replaces it on the streaming hot path."""
    import numpy as np

    from urh_tpu.dsp.demod import DemodParams
    from urh_tpu.native import get_library
    from urh_tpu.protocol.stream import StreamDemodulator

    lib = get_library()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(17)

    def numpy_twin(sd, chunk, prev):
        # force the pure-NumPy branch by removing the native library
        from urh_tpu import native as native_mod

        saved = native_mod.get_library
        native_mod.get_library = lambda: None
        try:
            return sd._host_block(chunk, prev, sentinel=-4.0)
        finally:
            native_mod.get_library = saved

    for mod, bps, spacing in (("FSK", 1, 1.0), ("FSK", 2, 0.05),
                              ("ASK", 1, 0.25)):
        params = DemodParams(modulation=mod, samples_per_symbol=50,
                             center=(0.0 if bps == 1 and mod == "FSK"
                                     else 0.1),
                             center_spacing=spacing, bits_per_symbol=bps,
                             noise_threshold=0.05, tolerance=3)
        sd = StreamDemodulator(params, backend="host")
        chunk = rng.normal(0, 0.3, (1 << 15, 2)).astype(np.float32)
        chunk[500:600] = 0  # gated stretch
        for prev in (None, np.float32([[0.1, -0.2]])):
            _, states_native, peak_native = sd._host_block(
                chunk, prev, sentinel=-4.0)
            _, states_np, peak_np = numpy_twin(sd, chunk, prev)
            np.testing.assert_array_equal(states_native, states_np), mod
            assert peak_native == peak_np


def test_native_rle_matches_numpy():
    import numpy as np

    from urh_tpu.native import get_library
    from urh_tpu.protocol.stream import _rle
    from urh_tpu.dsp.symbols import _run_length_encode

    if get_library() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(23)
    states = np.repeat(rng.integers(-1, 4, 4000).astype(np.int8),
                       rng.integers(1, 12, 4000))
    got_states, got_lens = _rle(states)
    exp_states, _, exp_lens = _run_length_encode(states)
    np.testing.assert_array_equal(got_states, exp_states)
    np.testing.assert_array_equal(got_lens, exp_lens)
    assert got_states.dtype == states.dtype


def test_native_sliding_median_matches_nth_element():
    """urh_median_sliding (incremental sorted window) must be
    bit-identical to urh_median_full_windows across window sizes and
    duplicate-heavy rows — it replaces it on the estimate hot path."""
    from urh_tpu.native import get_library

    lib = get_library()
    if lib is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(2)
    for trial in range(25):
        b = int(rng.integers(1, 6))
        n = int(rng.integers(200, 2000))
        k = int(rng.integers(3, 30))
        rows = rng.normal(size=(b, n)).astype(np.float64)
        rows[:, ::5] = rows[:, 0:1]  # duplicates exercise tie handling
        full = n - k + 1
        out_a = np.empty((b, full), np.float32)
        out_b = np.empty((b, full), np.float32)
        lib.urh_median_full_windows(rows.ctypes.data, b, n, k,
                                    out_a.ctypes.data)
        lib.urh_median_sliding(rows.ctypes.data, b, n, k,
                               out_b.ctypes.data)
        np.testing.assert_array_equal(
            out_a, out_b, err_msg=str((trial, b, n, k)))
    # NaN rows must not corrupt the incremental window (falls back to
    # per-window selection for that row)
    rows = rng.normal(size=(2, 400))
    rows[0, 100] = np.nan
    k = 9
    full = rows.shape[1] - k + 1
    out_a = np.empty((2, full), np.float32)
    out_b = np.empty((2, full), np.float32)
    lib.urh_median_full_windows(rows.ctypes.data, 2, rows.shape[1], k,
                                out_a.ctypes.data)
    lib.urh_median_sliding(rows.ctypes.data, 2, rows.shape[1], k,
                           out_b.ctypes.data)
    # the clean row must agree exactly either way
    np.testing.assert_array_equal(out_a[1], out_b[1])
