"""FIR/IIR filtering and filter design.

Counterpart of urh/signalprocessing/Filter.py and the convolution
kernels in urh/cythonext/signal_functions.pyx:513-542, redesigned for
TPU: convolution runs as a batched FFT (overlap-save) program on
device — the reference's naive O(N*M) loop becomes O(N log B).
Filter design (windowed sinc, blackman) is tiny host math.
"""

from __future__ import annotations

import math
from enum import Enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from urh_tpu.core.xfer import to_device, to_host


class FilterType(Enum):
    moving_average = "moving average"
    dc_correction = "DC correction"
    custom = "custom"


@partial(jax.jit, static_argnames=("n_out",))
def _fft_full_convolve(x: jax.Array, h: jax.Array, n_out: int):
    """Full linear convolution via FFT, truncated to n_out samples."""
    n = x.shape[0] + h.shape[0] - 1
    n_fft = 1 << (n - 1).bit_length()
    X = jnp.fft.fft(x, n_fft)
    H = jnp.fft.fft(h, n_fft)
    return jnp.fft.ifft(X * H, n_fft)[:n_out]


@partial(jax.jit, static_argnames=("block", "m"))
def _overlap_save_convolve(x: jax.Array, h: jax.Array, block: int, m: int):
    """Overlap-save FFT convolution: x (N,) complex64, h (m,) taps.

    Returns the 'full' convolution truncated to N samples (the
    reference fir_filter semantics, signal_functions.pyx:513-525).
    Processes in blocks so VMEM-sized FFTs pipeline well and the same
    machinery shards over a mesh with (m-1)-sample halos.
    """
    n = x.shape[0]
    step = block - (m - 1)
    n_blocks = -(-n // step)
    # left halo of m-1 zeros, pad to block structure
    padded = jnp.concatenate([
        jnp.zeros(m - 1, x.dtype), x, jnp.zeros(n_blocks * step - n + block, x.dtype)
    ])
    # frame construction as one pure reshape (the step-aligned bodies)
    # plus a small (n_blocks, m-1) halo gather — a full (n_blocks, block)
    # gather lowers catastrophically on TPU
    bodies = padded[m - 1:m - 1 + n_blocks * step].reshape(n_blocks, step)
    halo_idx = (jnp.arange(n_blocks)[:, None] * step
                + jnp.arange(m - 1)[None, :])
    frames = jnp.concatenate([padded[halo_idx], bodies], axis=1)
    H = jnp.fft.fft(h, block)
    out = jnp.fft.ifft(jnp.fft.fft(frames, axis=1) * H[None, :], axis=1)
    out = out[:, m - 1 :]  # valid part of each block
    return out.reshape(-1)[:n]


def fir_filter(input_samples: np.ndarray, filter_taps: np.ndarray) -> np.ndarray:
    """Complex FIR filter; output length == input length."""
    x = to_device(np.asarray(input_samples, dtype=np.complex64))
    h = to_device(np.asarray(filter_taps, dtype=np.complex64))
    m = int(h.shape[0])
    n = int(x.shape[0])
    if n == 0:
        return np.zeros(0, dtype=np.complex64)
    if m >= n or n < 4096:
        out = _fft_full_convolve(x, h, n)
    else:
        block = max(4096, 1 << (2 * m - 1).bit_length())
        if block >= n:
            out = _fft_full_convolve(x, h, n)
        else:
            out = _overlap_save_convolve(x, h, block, m)
    return to_host(out).astype(np.complex64)


def iir_filter(a: np.ndarray, b: np.ndarray, signal: np.ndarray) -> np.ndarray:
    """Direct-form IIR (signal_functions.pyx:527-542): sequential feedback
    as lax.scan."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    signal = np.asarray(signal, dtype=np.complex64)
    M, N = len(a), len(b)
    start = max(M, N + 1)
    n_total = len(signal)
    if n_total <= start:
        return np.zeros(n_total, dtype=np.complex64)

    result = np.zeros(n_total, dtype=np.complex64)
    # feed-forward part is a correlation -> vectorized
    ff = np.zeros(n_total, dtype=np.complex64)
    for j in range(M):
        ff[start:] += a[j] * signal[start - j : n_total - j]

    # feedback is sequential over samples with carry of last N outputs;
    # b is real so the taps stay float32, and the complex zero carry is
    # created INSIDE jit (even an eager jnp.zeros(complex64) needs a
    # complex scalar transfer the TPU tunnel does not implement)
    _, out = _iir_feedback(to_device(ff[start:]),
                           jnp.asarray(b[::-1].copy().astype(np.float32)))
    result[start:] = to_host(out)
    return result


@jax.jit
def _iir_feedback(ff: jax.Array, b_rev: jax.Array):
    def step(carry, x):
        fb = (carry * b_rev).sum()
        y = x + fb
        carry = jnp.concatenate([carry[1:], y[None]])
        return carry, y

    carry0 = jnp.zeros(b_rev.shape[0], dtype=ff.dtype)
    return jax.lax.scan(step, carry0, ff)


class Filter:
    BANDWIDTHS = {
        "Very Narrow": 0.001,
        "Narrow": 0.01,
        "Medium": 0.08,
        "Wide": 0.1,
        "Very Wide": 0.42,
    }

    def __init__(self, taps: list, filter_type: FilterType = FilterType.custom):
        self.filter_type = filter_type
        self.taps = taps

    def work(self, input_signal: np.ndarray) -> np.ndarray:
        if self.filter_type == FilterType.dc_correction:
            return input_signal - np.mean(input_signal, axis=0)
        return self.apply_fir_filter(np.asarray(input_signal).flatten())

    def apply_fir_filter(self, input_signal: np.ndarray) -> np.ndarray:
        if input_signal.dtype != np.complex64:
            tmp = np.empty(len(input_signal) // 2, dtype=np.complex64)
            tmp.real = input_signal[0::2]
            tmp.imag = input_signal[1::2]
            input_signal = tmp
        return fir_filter(input_signal, np.array(self.taps, dtype=np.complex64))

    @staticmethod
    def read_configured_filter_bw() -> float:
        from urh_tpu.util import settings

        bw_type = settings.read("bandpass_filter_bw_type", "Medium", str)
        if bw_type in Filter.BANDWIDTHS:
            return Filter.BANDWIDTHS[bw_type]
        if bw_type.lower() == "custom":
            return settings.read("bandpass_filter_custom_bw", 0.1, float)
        return 0.08

    @staticmethod
    def get_bandwidth_from_filter_length(N):
        return 4 / N

    @staticmethod
    def get_filter_length_from_bandwidth(bw):
        N = int(math.ceil(4 / bw))
        return N + 1 if N % 2 == 0 else N  # ensure odd length

    @staticmethod
    def fft_convolve_1d(x: np.ndarray, h: np.ndarray) -> np.ndarray:
        """Centered FFT convolution (Filter.py:69-82 semantics)."""
        n = len(x) + len(h) - 1
        out = to_host(_fft_full_convolve(
            to_device(np.asarray(x, np.complex64)),
            to_device(np.asarray(h, np.complex64)),
            n,
        ))
        if not (np.issubdtype(np.asarray(x).dtype, np.complexfloating)
                or np.issubdtype(np.asarray(h).dtype, np.complexfloating)):
            out = out.real
        too_much = (len(out) - len(x)) // 2
        return out[too_much : len(out) - too_much]

    @staticmethod
    def apply_bandpass_filter(data, f_low, f_high, filter_bw=0.08):
        if f_low > f_high:
            f_low, f_high = f_high, f_low
        f_low = max(-0.5, min(f_low, 0.5))
        f_high = max(-0.5, min(f_high, 0.5))

        h = Filter.design_windowed_sinc_bandpass(f_low, f_high, filter_bw)
        # the reference switches between direct and FFT convolution by a
        # tap-count heuristic; on TPU the FFT path always wins
        return np.convolve(data, h, "same") if len(h) < 8 * math.log(math.sqrt(len(data))) \
            else Filter.fft_convolve_1d(data, h)

    @staticmethod
    def design_windowed_sinc_lpf(fc, bw) -> np.ndarray:
        N = Filter.get_filter_length_from_bandwidth(bw)
        h = np.sinc(2 * fc * (np.arange(N) - (N - 1) / 2.0))
        w = np.blackman(N)
        h = h * w
        return h / np.sum(h)

    @staticmethod
    def design_windowed_sinc_bandpass(f_low, f_high, bw) -> np.ndarray:
        f_shift = (f_low + f_high) / 2
        f_c = (f_high - f_low) / 2
        N = Filter.get_filter_length_from_bandwidth(bw)
        return Filter.design_windowed_sinc_lpf(f_c, bw=bw) * np.exp(
            complex(0, 1) * np.pi * 2 * f_shift * np.arange(0, N, dtype=complex)
        )
