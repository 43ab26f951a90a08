"""Batched device kernels for auto-interpretation.

TPU-first redesign of the modulation-classification number crunching
(reference: urh/ainterpretation/AutoInterpretation.py:151-223 runs one
message at a time through NumPy FFTs).  Here messages are bucketed by
power-of-two length and each bucket is classified by ONE jitted program
computing, for every message at once:

* the FFT-domain Haar CWT (Wavelet.py:7-43) of the peak-normalized and
  the unit-magnitude signal — batched FFTs, MXU/VPU friendly;
* the variances of both CWT magnitudes, raw and median-filtered
  (forward-window median as a windowed sort over a rolled stack);
* the FSK spectral test (a second strong FFT peak far from the main
  one).

Hosts with small inputs fall back to numpy twins with identical
semantics.  The decision thresholds live in
:mod:`urh_tpu.ai.estimate`; this module only produces the statistics.
"""

from __future__ import annotations

import functools
import math

import numpy as np

try:  # pragma: no cover - exercised implicitly everywhere
    import jax
    import jax.numpy as jnp

    _HAS_JAX = True
except Exception:  # pragma: no cover
    jax = None
    jnp = None
    _HAS_JAX = False

# below this many complex cells per bucket, XLA dispatch overhead wins
DEVICE_MIN_CELLS = 1 << 15

FFT_PEAK_MIN_DISTANCE = 10  # bins between the two strongest peaks
FFT_PEAK_MIN_POWER = 100  # noise amplitude scale
FFT_PEAK_COUNT = 10


def use_device(n_cells: int) -> bool:
    from urh_tpu.util.placement import scaled_threshold

    return _HAS_JAX and n_cells >= scaled_threshold(DEVICE_MIN_CELLS)


def pow2_floor(n: int) -> int:
    return 2 ** int(math.log2(n)) if n > 0 else 0


# ---------------------------------------------------------------------------
# Haar CWT (FFT domain, Torrence & Compo)
# ---------------------------------------------------------------------------


from urh_tpu.util.fft_backend import fft_rows as _fft_rows


def _haar_spectrum_np(num_data: int, scale: int) -> np.ndarray:
    f = 2.0 * np.pi / num_data
    omega = f * np.concatenate(
        (np.arange(0, num_data // 2), np.arange(num_data // 2, num_data) * -1))
    scaled = scale * omega
    safe = scaled / scale
    safe[0] = 1.0
    wavelet = (1j * np.square(-1 + np.exp(0.5j * scaled))) / safe
    return np.sqrt(2.0 * np.pi * scale) * wavelet


def cwt_haar_np(x: np.ndarray, scale: int = 10, fwd: np.ndarray = None) -> np.ndarray:
    """Continuous Haar wavelet transform of 1-D rows (batched numpy).

    The wavelet spectrum is cast to the input's precision so complex64
    batches stay in single-precision FFTs instead of silently upcasting
    the whole pipeline to complex128.  ``fwd`` lets callers that already
    computed ``np.fft.fft(x, axis=-1)`` share it."""
    num_data = x.shape[-1]
    psi_hat = _haar_spectrum_np(num_data, scale)
    if x.dtype == np.complex64:
        psi_hat = psi_hat.astype(np.complex64)
    if fwd is None:
        fwd = _fft_rows(x)
    w = _fft_rows(fwd * psi_hat, inverse=True)
    return w[..., 2 * scale : -2 * scale]


if _HAS_JAX:

    @functools.partial(jax.jit, static_argnames=("scale",))
    def _cwt_haar_jax(x, scale):
        psi_hat = jnp.asarray(_haar_spectrum_np(x.shape[-1], scale),
                              dtype=jnp.complex64)
        w = jnp.fft.ifft(jnp.fft.fft(x, axis=-1) * psi_hat, axis=-1)
        return w[..., 2 * scale : -2 * scale]


def cwt_haar(x: np.ndarray, scale: int = 10) -> np.ndarray:
    """Haar CWT of the trailing axis; device-batched when large."""
    if use_device(x.size):
        from urh_tpu.core.xfer import to_device, to_host

        return to_host(_cwt_haar_jax(to_device(np.asarray(x, np.complex64)),
                                     scale))
    return cwt_haar_np(x, scale)


# ---------------------------------------------------------------------------
# forward-window median filter
# ---------------------------------------------------------------------------


def _median_full_windows_np(rows: np.ndarray, k: int) -> np.ndarray:
    full = rows.shape[-1] - k + 1
    if full > 0 and rows.size >= (1 << 16):
        from urh_tpu.native import get_library

        lib = get_library()
        if lib is not None:
            flat = np.ascontiguousarray(rows, dtype=np.float64).reshape(
                -1, rows.shape[-1])
            out = np.empty((flat.shape[0], full), dtype=np.float32)
            # small windows: incremental sorted-window slide (~20 inline
            # ops/step); large windows: nth_element per window
            fn = (lib.urh_median_sliding if k <= 64
                  else lib.urh_median_full_windows)
            fn(flat.ctypes.data, flat.shape[0], flat.shape[1], int(k),
               out.ctypes.data)
            return out.reshape(rows.shape[:-1] + (full,))
    windows = np.lib.stride_tricks.sliding_window_view(rows, k, axis=-1)
    return np.sort(windows, axis=-1)[..., k // 2]


if _HAS_JAX:

    @functools.partial(jax.jit, static_argnames=("k",))
    def _median_full_windows_jax(rows, k):
        """Sliding median via an odd-even transposition network over the
        k shifted views: ~k^2/2 vectorized min/max passes on (B, N)
        planes instead of materializing and sorting a (B, N, k) tensor —
        an order of magnitude faster on both VPU and host XLA."""
        n = rows.shape[-1]
        cols = [rows[..., j:n - k + 1 + j] for j in range(k)]
        for sweep in range(k):
            for j in range(sweep % 2, k - 1, 2):
                lo = jnp.minimum(cols[j], cols[j + 1])
                hi = jnp.maximum(cols[j], cols[j + 1])
                cols[j], cols[j + 1] = lo, hi
        return cols[k // 2]


def median_filter_rows(rows: np.ndarray, k: int) -> np.ndarray:
    """out[., i] = median(rows[., i:i+k]) with end windows shrunk —
    matching auto_interpretation.pyx:211-240 on every row at once."""
    rows = np.asarray(rows, dtype=np.float64)
    n = rows.shape[-1]
    out = np.zeros(rows.shape, dtype=np.float32)
    full = n - k + 1
    if full > 0:
        from urh_tpu.util.placement import device_io_cost_s

        # the filtered rows come back whole (4 B/cell down, 8 B/cell up);
        # the native OpenMP host twin runs ~5 ns/cell
        if (use_device(rows.size)
                and device_io_cost_s(8 * rows.size, 4 * rows.size)
                < rows.size * 5e-9):
            body = np.asarray(_median_full_windows_jax(jnp.asarray(rows), k))
        else:
            body = _median_full_windows_np(rows, k)
        out[..., :full] = body.astype(np.float32)
    for i in range(max(0, full), n):  # shrunk tail: k-1 columns
        kk = n - i
        out[..., i] = np.sort(rows[..., i:], axis=-1)[..., kk // 2].astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# batched classification statistics
# ---------------------------------------------------------------------------


def _fsk_test_np(spectrum: np.ndarray) -> np.ndarray:
    order = np.argsort(spectrum, axis=-1)[..., ::-1][..., :FFT_PEAK_COUNT]
    strongest = order[..., :1]
    values = np.take_along_axis(spectrum, order, axis=-1)
    return ((np.abs(order - strongest) >= FFT_PEAK_MIN_DISTANCE)
            & (values >= FFT_PEAK_MIN_POWER)).any(axis=-1)


if _HAS_JAX:

    @functools.partial(jax.jit, static_argnames=("k",))
    def _median_filtered_jax(rows, k):
        """Full forward-window median incl. the shrunk end windows
        (auto_interpretation.pyx:211-240), entirely on device."""
        body = _median_full_windows_jax(rows, k)
        n = rows.shape[-1]
        # k-1 shrinking windows at the end: window i covers rows[..., i:]
        tail = [jnp.sort(rows[..., n - kk:], axis=-1)[..., kk // 2, None]
                for kk in range(k - 1, 0, -1)]
        return jnp.concatenate([body] + tail, axis=-1)

    def _stats_core(batch_re, batch_im, norm_scale, scale, median_k):
        # traced helper shared by the upload and staged-gather entry
        # points; only per-message SCALARS leave the device — the CWT
        # magnitude arrays never transfer back
        batch = jax.lax.complex(batch_re, batch_im)
        data = batch / norm_scale[:, None]
        unit = batch / jnp.abs(batch)

        mag = jnp.abs(_cwt_haar_jax(data, scale))
        norm_mag = jnp.abs(_cwt_haar_jax(unit, scale))

        var_mag = jnp.var(mag, axis=-1)
        var_norm = jnp.var(norm_mag, axis=-1)

        # medians are order statistics: float32 is exact enough on device
        var_fmag = jnp.var(_median_filtered_jax(mag, median_k), axis=-1)
        var_fnorm = jnp.var(_median_filtered_jax(norm_mag, median_k), axis=-1)

        spectrum = jnp.abs(jnp.fft.fftshift(jnp.fft.fft(data, axis=-1), axes=-1))
        values, order = jax.lax.top_k(spectrum, FFT_PEAK_COUNT)
        strongest = order[..., :1]
        is_fsk = ((jnp.abs(order - strongest) >= FFT_PEAK_MIN_DISTANCE)
                  & (values >= FFT_PEAK_MIN_POWER)).any(axis=-1)

        return (var_mag, var_norm, var_fmag, var_fnorm, is_fsk)

    @functools.partial(jax.jit, static_argnames=("scale", "median_k"))
    def _classification_stats_jax(batch_re, batch_im, norm_scale, scale,
                                  median_k):
        # batches arrive as float planes: complex dtypes cannot cross
        # the TPU tunnel's host/device boundary (see urh_tpu.core.xfer)
        return _stats_core(batch_re, batch_im, norm_scale, scale, median_k)

    @functools.partial(jax.jit,
                       static_argnames=("width", "scale", "median_k"))
    def _staged_stats_jax(planes, starts, width, scale, median_k):
        """Classification stats sliced straight out of the device-resident
        capture: only the (B,) start offsets cross the link.  The
        per-row normalization constant reproduces numpy's lexicographic
        complex max (largest real part, ties broken by imaginary part).
        """
        rows = jax.vmap(
            lambda s: jax.lax.dynamic_slice(planes, (s, 0), (width, 2))
        )(starts)                                   # (B, width, 2)
        re, im = rows[..., 0], rows[..., 1]
        max_re = jnp.max(re, axis=-1, keepdims=True)
        tie_im = jnp.where(re == max_re, im, -jnp.inf)
        max_im = jnp.max(tie_im, axis=-1)
        norm_scale = jnp.sqrt(max_re[..., 0] ** 2 + max_im ** 2)
        return _stats_core(re, im, norm_scale, scale, median_k)


def classification_stats_staged(planes, starts, width: int, scale: int = 4,
                                median_k: int = 11) -> dict:
    """classification_stats for contiguous same-width windows of a
    device-resident (N, 2) float32 capture (see IQData.staged_planes)."""
    starts = np.asarray(starts, dtype=np.int32)
    (var_mag, var_norm, var_fmag, var_fnorm, is_fsk) = (
        np.asarray(r) for r in _staged_stats_jax(
            planes, jnp.asarray(starts), int(width), scale, median_k))
    return {
        "var_mag": var_mag,
        "var_norm_mag": var_norm,
        "var_filtered_mag": var_fmag,
        "var_filtered_norm_mag": var_fnorm,
        "is_fsk": is_fsk,
    }


def classification_stats(batch: np.ndarray, scale: int = 4,
                         median_k: int = 11) -> dict:
    """Per-row classification statistics of a (B, N) complex bucket.

    Returns var_mag / var_norm_mag / var_filtered_mag /
    var_filtered_norm_mag (float arrays, shape (B,)) and is_fsk (bool
    (B,)).  The median-filtered variances include the reference's
    shrunk end windows; on the device path everything reduces on device
    and only per-message scalars transfer back.
    """
    batch = np.ascontiguousarray(batch, dtype=np.complex64)
    b, n = batch.shape
    norm_scale = np.abs(np.max(batch, axis=-1))  # lexicographic max, as reference

    from urh_tpu.util.placement import device_io_cost_s

    # bulk upload (8 B/cell as two float planes), scalar results back;
    # the host twin (FFT + native median filter) runs ~15 ns/cell
    if use_device(batch.size) and device_io_cost_s(8 * batch.size) < batch.size * 15e-9:
        (var_mag, var_norm, var_fmag, var_fnorm,
         is_fsk) = (np.asarray(r) for r in _classification_stats_jax(
             jnp.asarray(np.ascontiguousarray(batch.real)),
             jnp.asarray(np.ascontiguousarray(batch.imag)),
             jnp.asarray(norm_scale), scale, median_k))
        return {
            "var_mag": var_mag,
            "var_norm_mag": var_norm,
            "var_filtered_mag": var_fmag,
            "var_filtered_norm_mag": var_fnorm,
            "is_fsk": is_fsk,
        }
    else:
        data = batch / norm_scale[:, None]
        unit = batch / np.abs(batch)
        # one forward FFT of `data` feeds BOTH the Haar CWT and the
        # FSK spectrum test
        fwd = _fft_rows(data)
        mag = np.abs(cwt_haar_np(data, scale, fwd=fwd))
        norm_mag = np.abs(cwt_haar_np(unit, scale))
        var_mag = np.var(mag, axis=-1)
        var_norm = np.var(norm_mag, axis=-1)
        filtered_mag = median_filter_rows(mag, median_k)
        filtered_norm = median_filter_rows(norm_mag, median_k)
        spectrum = np.abs(np.fft.fftshift(fwd, axes=-1))
        is_fsk = _fsk_test_np(spectrum)

    return {
        "var_mag": var_mag,
        "var_norm_mag": var_norm,
        "var_filtered_mag": np.var(filtered_mag, axis=-1),
        "var_filtered_norm_mag": np.var(filtered_norm, axis=-1),
        "is_fsk": is_fsk,
    }


# ---------------------------------------------------------------------------
# device histogram (center detection on long messages)
# ---------------------------------------------------------------------------


if _HAS_JAX:

    @functools.partial(jax.jit, static_argnames=("n_bins",))
    def _histogram_jax(values, lo, step, n_bins):
        idx = jnp.clip(((values - lo) / step).astype(jnp.int32), 0, n_bins - 1)
        return jnp.zeros(n_bins, jnp.int32).at[idx].add(1)


HISTOGRAM_MIN_VALUES = 1 << 22  # host np.histogram sustains ~1e8 values/s;
# below ~4M values the device dispatch round-trip costs more than it saves


def histogram(values: np.ndarray, bin_edges: np.ndarray) -> np.ndarray:
    """np.histogram(values, bins=bin_edges)[0], device-routed when large.

    bin_edges must be uniform (np.arange-style), which is how the
    center detector builds them.
    """
    n_bins = len(bin_edges) - 1
    if n_bins <= 0:
        return np.zeros(0, dtype=np.int64)
    from urh_tpu.util.placement import scaled_threshold

    if (_HAS_JAX and len(values) >= scaled_threshold(HISTOGRAM_MIN_VALUES)
            and n_bins >= 2):
        lo = float(bin_edges[0])
        step = float(bin_edges[1] - bin_edges[0])
        inside = values[(values >= lo) & (values <= float(bin_edges[-1]))]
        counts = np.asarray(_histogram_jax(jnp.asarray(inside, jnp.float32),
                                           lo, step, n_bins)).astype(np.int64)
        return counts
    counts, _ = np.histogram(values, bins=bin_edges)
    return counts
