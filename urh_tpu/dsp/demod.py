"""Quadrature demodulation kernels (TPU / JAX).

Behavioral equivalent of the reference's amplitude/frequency/phase
demodulator (urh/cythonext/signal_functions.pyx:252-378), redesigned for
TPU execution:

* ASK / FSK are embarrassingly parallel and compile to a single fused
  XLA elementwise program over the VPU (magnitude gate + envelope or
  quadrature discriminator).  The reference's per-sample OpenMP loop
  becomes a vectorized program.
* PSK carrier recovery is a 2nd/4th-order Costas loop — an inherently
  sequential feedback IIR — expressed as ``lax.scan`` with a tiny carry
  (phase, frequency).  For block-sharded execution the carry is handed
  across block boundaries (see urh_tpu.parallel).

Noise handling matches the reference: samples whose squared magnitude is
below the squared noise threshold produce a modulation-dependent sentinel
(0.0 for ASK, -4.0 for FSK/PSK, signal_functions.pyx:31-44) which the
symbolizer maps to pause.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from urh_tpu.core.iq import max_magnitude_for_dtype, normalize_scale_shift

NOISE_FSK_PSK = -4.0
NOISE_ASK = 0.0

# below this many samples the device dispatch + transfer loses to the
# host twin; scaled at runtime by the measured link latency
# (urh_tpu.util.placement)
DEVICE_MIN_DEMOD_SAMPLES = 1 << 16
PAUSE_STATE = -1


def noise_sentinel(mod_type: str) -> float:
    """Sentinel written for sub-noise samples (signal_functions.pyx:34-44)."""
    if mod_type == "ASK":
        return NOISE_ASK
    if mod_type in ("FSK", "PSK", "OQPSK"):
        return NOISE_FSK_PSK
    if mod_type == "QAM":
        return NOISE_ASK * NOISE_FSK_PSK
    return 0.0


@dataclass
class DemodParams:
    """Demodulation parameter set (mirrors Signal's parameter state,
    urh/signalprocessing/Signal.py:52-83)."""

    modulation: str = "FSK"
    samples_per_symbol: int = 100
    center: float = 0.0
    center_spacing: float = 1.0
    noise_threshold: float = 0.0
    tolerance: int = 5
    bits_per_symbol: int = 1
    pause_threshold: int = 8
    message_length_divisor: int = 1
    costas_loop_bandwidth: float = 0.1
    sample_rate: float = 1e6

    @property
    def modulation_order(self) -> int:
        return 2 ** self.bits_per_symbol


# ---------------------------------------------------------------------------
# ASK / FSK: fully vectorized
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mod_type",))
def _afp_demod_vec(x: jax.Array, noise_sqrd: jax.Array, max_mag: jax.Array, mod_type: str):
    """x: (N, 2) float32 raw-unit samples -> (N,) float32 demodulated."""
    re = x[:, 0]
    im = x[:, 1]
    mag2 = re * re + im * im
    sentinel = jnp.float32(noise_sentinel(mod_type))

    if mod_type == "ASK":
        val = jnp.sqrt(mag2) / max_mag
    elif mod_type == "FSK":
        # quadrature discriminator: arg(conj(x[n-1]) * x[n])
        prev_re = jnp.concatenate([re[:1], re[:-1]])
        prev_im = jnp.concatenate([im[:1], im[:-1]])
        t_re = prev_re * re + prev_im * im
        t_im = prev_re * im - prev_im * re
        val = jnp.arctan2(t_im, t_re)
    else:
        raise ValueError(f"vectorized demod does not support {mod_type}")

    out = jnp.where(mag2 <= noise_sqrd, sentinel, val)
    return out.at[0].set(sentinel)


# ---------------------------------------------------------------------------
# PSK: Costas loop carrier recovery as lax.scan
# ---------------------------------------------------------------------------


def _wrap_phase(phase):
    two_pi = jnp.float32(2 * math.pi)
    phase = jnp.where(phase > two_pi, jnp.mod(phase, two_pi), phase)
    phase = jnp.where(phase < -two_pi, -jnp.mod(-phase, two_pi), phase)
    return phase


@partial(jax.jit, static_argnames=("loop_order",))
def _costa_demod_scan(
    x: jax.Array,
    noise_sqrd: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    loop_order: int,
    bandwidth: jax.Array,
    damping: jax.Array,
    init_phase: jax.Array,
    init_freq: jax.Array,
):
    """Sequential Costas loop (signal_functions.pyx:252-330) as a scan.

    Returns (demodulated (N,), final_phase, final_freq) so that sharded
    block execution can hand the loop state to the next block.
    """
    denom = 1.0 + 2.0 * damping * bandwidth + bandwidth * bandwidth
    alpha = (4.0 * damping * bandwidth) / denom
    beta = (4.0 * bandwidth * bandwidth) / denom

    if loop_order > 4:
        loop_order = 4

    sentinel = jnp.float32(NOISE_FSK_PSK)

    def step(carry, sample):
        phase, freq = carry
        raw_re, raw_im = sample[0], sample[1]
        gated = raw_re * raw_re + raw_im * raw_im <= noise_sqrd

        re = (raw_re + shift) / scale
        im = (raw_im + shift) / scale

        # nco_out = exp(-i*phase); nco_times_sample = nco_out * sample
        cosn = jnp.cos(-phase)
        sinn = jnp.sin(-phase)
        mix_re = cosn * re - sinn * im
        mix_im = cosn * im + sinn * re

        if loop_order == 2:
            error = mix_im * mix_re
            out = mix_re
        else:
            f1 = jnp.where(mix_re > 0.0, 1.0, -1.0)
            f2 = jnp.where(mix_im > 0.0, 1.0, -1.0)
            error = f1 * mix_im - f2 * mix_re
            out = 2.0 * mix_re + mix_im

        error = jnp.clip(error, -1.0, 1.0)
        new_freq = freq + beta * error
        new_phase = _wrap_phase(phase + new_freq + alpha * error)
        new_freq = jnp.clip(new_freq, -1.0, 1.0)

        phase = jnp.where(gated, phase, new_phase)
        freq = jnp.where(gated, freq, new_freq)
        out = jnp.where(gated, sentinel, out)
        return (phase, freq), out

    (phase, freq), outs = jax.lax.scan(step, (init_phase, init_freq), x)
    return outs, phase, freq


_COSTAS_INIT_PHASE = 1.5  # signal_functions.pyx:261


def afp_demod(
    samples,
    noise_mag: float,
    mod_type: str,
    mod_order: int = 2,
    costas_loop_bandwidth: float = 0.1,
    dtype=None,
) -> np.ndarray:
    """Demodulate raw IQ into a rectangular (quadrature-demodulated) signal.

    ``samples``: (N, 2) array in any ingest dtype, raw units.  ``dtype``
    overrides the dtype used for scale constants (defaults to the array's).
    Semantics of signal_functions.pyx:333-378.
    """
    staged_in = isinstance(samples, jax.Array)
    if not staged_in:
        samples = np.asarray(samples)
    dtype = np.dtype(dtype) if dtype is not None else np.dtype(samples.dtype)
    n = len(samples)
    if n <= 2:
        return np.zeros(n, dtype=np.float32)

    if staged_in:
        # device-resident float32 planes (IQData.staged_planes): no host
        # conversion, no re-upload, no host-twin routing — the caller
        # already decided device placement by staging
        x = samples
    else:
        x_host = (samples.astype(np.float32) if samples.dtype != np.float32
                  else samples)

        if mod_type != "PSK":
            from urh_tpu.util.placement import (device_io_cost_s,
                                                scaled_threshold)

            max_mag = np.float32(max_magnitude_for_dtype(dtype))
            # host when the job is dispatch-bound (small) OR
            # bandwidth-bound (8 B/sample up + 4 B/sample qad back cost
            # more than the ~2 ns/sample native host kernel)
            if (n < scaled_threshold(DEVICE_MIN_DEMOD_SAMPLES)
                    or device_io_cost_s(8 * n, 4 * n) > n * 2e-9):
                return _afp_demod_np(x_host, np.float32(noise_mag * noise_mag),
                                     max_mag, mod_type)

        x = jnp.asarray(x_host)
    noise_sqrd = jnp.float32(noise_mag * noise_mag)

    if mod_type == "PSK":
        scale, shift = normalize_scale_shift(dtype)
        # Costas loop processes from i=1 (signal_functions.pyx:289); run the
        # scan on x[1:] then prepend the sentinel slot.
        outs, _, _ = _costa_demod_scan(
            x[1:],
            noise_sqrd,
            jnp.float32(scale),
            jnp.float32(shift),
            int(mod_order),
            jnp.float32(costas_loop_bandwidth),
            jnp.float32(math.sqrt(2.0) / 2.0),
            jnp.float32(_COSTAS_INIT_PHASE),
            jnp.float32(0.0),
        )
        result = np.empty(n, dtype=np.float32)
        # The reference leaves result[0] unwritten (np.empty); emit the noise
        # sentinel there instead for determinism.
        result[0] = NOISE_FSK_PSK
        result[1:] = np.asarray(outs)
        return result

    out = _afp_demod_vec(x, noise_sqrd,
                         jnp.float32(max_magnitude_for_dtype(dtype)), mod_type)
    return np.array(out)  # writable copy: callers edit the qad cache in place


def _afp_demod_np(x: np.ndarray, noise_sqrd, max_mag, mod_type: str) -> np.ndarray:
    """Host twin of _afp_demod_vec (same gating and sample-0 sentinel):
    OpenMP native kernel when built, NumPy otherwise."""
    if mod_type in ("ASK", "FSK") and len(x) >= (1 << 16):
        from urh_tpu.native import get_library

        lib = get_library()
        if lib is not None:
            x = np.ascontiguousarray(x, dtype=np.float32)
            out = np.empty(len(x), dtype=np.float32)
            lib.urh_afp_demod_f32(
                x.ctypes.data, len(x), float(noise_sqrd), float(max_mag),
                0 if mod_type == "ASK" else 1, out.ctypes.data)
            return out

    re, im = x[:, 0], x[:, 1]
    mag2 = re * re + im * im
    if mod_type == "ASK":
        val = np.sqrt(mag2) / max_mag
    else:
        pr = np.concatenate((re[:1], re[:-1]))
        pi = np.concatenate((im[:1], im[:-1]))
        val = np.arctan2(pr * im - pi * re, pr * re + pi * im)
    out = np.where(mag2 <= noise_sqrd, np.float32(noise_sentinel(mod_type)),
                   val.astype(np.float32))
    out[0] = noise_sentinel(mod_type)
    return out
