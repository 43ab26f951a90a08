"""Modulation synthesis kernels (TPU / JAX).

Equivalent of the reference's per-symbol OpenMP synthesis loop
(urh/cythonext/signal_functions.pyx:56-243), redesigned fully parallel:

* the per-symbol parameter lookup is a gather;
* FSK continuous-phase correction — a sequential table in the reference
  (signal_functions.pyx:121-137) — becomes a cumulative sum over
  per-symbol phase deltas (associative, so it shards);
* GFSK gaussian frequency smoothing is a FIR convolution plus a phase
  cumsum;
* the final carrier synthesis (cos/sin over all samples) is one fused
  elementwise XLA program.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Below this many body samples the fixed device dispatch + readback cost
# exceeds the synthesis work and the float32 NumPy twin wins (same
# adaptive-placement rule as urh_tpu.ai.device.use_device).
DEVICE_MIN_BODY_SAMPLES = 1 << 21


def bits_to_symbol_indices(bits: np.ndarray, bits_per_symbol: int) -> np.ndarray:
    """MSB-first bit groups -> symbol indices."""
    bits = np.asarray(bits, dtype=np.uint8)
    total_symbols = len(bits) // bits_per_symbol
    grouped = bits[: total_symbols * bits_per_symbol].reshape(total_symbols, bits_per_symbol)
    powers = 2 ** np.arange(bits_per_symbol - 1, -1, -1, dtype=np.int64)
    return grouped.astype(np.int64) @ powers


def get_oqpsk_bits(original_bits: np.ndarray) -> np.ndarray:
    """Offset-QPSK bit staggering (signal_functions.pyx:179-193).

    (The reference marks this as known-imperfect; replicated for parity.)
    """
    bits = np.asarray(original_bits, dtype=np.uint8)
    num_bits = len(bits)
    if num_bits == 0:
        return np.zeros(0, dtype=np.uint8)
    result = np.zeros(num_bits + 2, dtype=np.uint8)
    result[0] = bits[0]
    result[num_bits + 1] = bits[num_bits - 1]
    for i in range(2, num_bits - 2, 2):
        result[i] = bits[i]
        result[i + 1] = bits[i - 1]
    return result


def gauss_fir(sample_rate: float, samples_per_symbol: int, bt: float = 0.5,
              filter_width: float = 1.0) -> np.ndarray:
    """Gaussian FIR for GFSK frequency smoothing
    (signal_functions.pyx:228-243)."""
    k = np.arange(
        -int(filter_width * samples_per_symbol),
        int(filter_width * samples_per_symbol) + 1,
        dtype=np.float32,
    )
    ts = samples_per_symbol / sample_rate
    h = (
        np.sqrt((2 * np.pi) / np.log(2)) * bt / ts
        * np.exp(-(((np.sqrt(2) * np.pi) / np.sqrt(np.log(2)) * bt * k / samples_per_symbol) ** 2))
    ).astype(np.float32)
    return h / h.sum()


@partial(jax.jit, static_argnames=("sps",))
def _synthesize(a_sym: jax.Array, f_sym: jax.Array, phi_sym: jax.Array,
                start: jax.Array, sample_rate: jax.Array, sps: int):
    """Per-symbol (amplitude, frequency, phase+correction) -> IQ samples.

    One fused elementwise program: all sample math in float32 to match the
    reference's C float arithmetic.
    """
    num = a_sym.shape[0] * sps
    a = jnp.repeat(a_sym, sps)
    f = jnp.repeat(f_sym, sps)
    phi = jnp.repeat(phi_sym, sps)
    t = (jnp.arange(num, dtype=jnp.float32) + start) / sample_rate
    # op order matches the host twin (_carrier_into): ((t*f)*2pi)+phi
    arg = t * f * jnp.float32(2 * math.pi) + phi
    return jnp.stack([a * jnp.cos(arg), a * jnp.sin(arg)], axis=-1)


@jax.jit
def _synthesize_per_sample(a: jax.Array, f: jax.Array, phi: jax.Array,
                           start: jax.Array, sample_rate: jax.Array):
    num = a.shape[0]
    t = (jnp.arange(num, dtype=jnp.float32) + start) / sample_rate
    arg = t * f * jnp.float32(2 * math.pi) + phi
    return jnp.stack([a * jnp.cos(arg), a * jnp.sin(arg)], axis=-1)


def _synthesize_np(a_sym, f_sym, phi_sym, start, sample_rate, sps: int,
                   out: np.ndarray = None):
    """Host twin of :func:`_synthesize` (float32 math, same shapes).

    Single-pass in-place synthesis: the carrier argument is built in one
    reused buffer, cos/sin write straight into the output, and the
    amplitude multiply is skipped when the per-symbol amplitudes are
    constant 1 (the common FSK/PSK case)."""
    f = np.repeat(f_sym, sps)
    phi = np.repeat(phi_sym, sps)
    out = _carrier_into(f, phi, start, sample_rate, out)
    if a_sym.size:
        if np.any(a_sym != a_sym[0]):
            out *= np.repeat(a_sym, sps)[:, None]
        elif a_sym[0] != 1.0:
            out *= a_sym[0]
    return out


def _synthesize_per_sample_np(a, f, phi, start, sample_rate,
                              out: np.ndarray = None):
    out = _carrier_into(f, phi, start, sample_rate, out)
    if len(a):
        if np.any(a != a[0]):
            out *= a[:, None]
        elif a[0] != 1.0:
            out *= a[0]
    return out


_CARRIER_POOL = None


def _carrier_pool():
    global _CARRIER_POOL
    if _CARRIER_POOL is None:
        import concurrent.futures
        import os

        _CARRIER_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=max(1, os.cpu_count() or 1))
    return _CARRIER_POOL


def _carrier_slice(f, phi, lo, hi, start, sample_rate, out):
    # identical values to arange(n)[lo:hi] (exact f32 ints below 2^24)
    arg = np.arange(lo, hi, dtype=np.float32)
    if start:
        arg += np.float32(start)
    arg /= np.float32(sample_rate)
    arg *= f[lo:hi]
    arg *= np.float32(2 * math.pi)
    arg += phi[lo:hi]
    np.cos(arg, out=out[lo:hi, 0])
    np.sin(arg, out=out[lo:hi, 1])


def _carrier_into(f, phi, start, sample_rate, out=None):
    """cos/sin(2*pi*f*t + phi) written directly into ``out`` (allocated
    when None).  NumPy's SIMD trig beats scalar libm, and its ufuncs
    release the GIL — so large bodies split across a thread pool
    instead of calling out to native code."""
    import os

    n = len(f)
    if out is None:
        out = np.empty((n, 2), dtype=np.float32)
    workers = min(max(1, os.cpu_count() or 1), max(1, n // (1 << 16)))
    if workers <= 1:
        _carrier_slice(f, phi, 0, n, start, sample_rate, out)
        return out
    bounds = np.linspace(0, n, workers + 1, dtype=np.int64)
    futures = [_carrier_pool().submit(_carrier_slice, f, phi, int(lo), int(hi),
                                      start, sample_rate, out)
               for lo, hi in zip(bounds[:-1], bounds[1:])]
    for fut in futures:
        fut.result()
    return out


def _fsk_phase_corrections(f_sym: np.ndarray, samples_per_symbol: int,
                           start: int, sample_rate: float) -> np.ndarray:
    """Continuous-phase FSK correction per symbol: cumulative sum of the
    per-transition phase deltas (replaces the sequential table,
    signal_functions.pyx:121-137)."""
    S = len(f_sym)
    if S == 0:
        return np.zeros(0, dtype=np.float64)
    f_prev = np.empty_like(f_sym)
    f_prev[0] = f_sym[0]
    f_prev[1:] = f_sym[:-1]
    s_i = np.arange(S, dtype=np.float64)
    # boundary times as C float to match (s_i*sps+start-1)/sample_rate
    t_b = ((s_i * samples_per_symbol + start - 1).astype(np.float32) / np.float32(sample_rate)).astype(np.float64)
    delta = np.where(f_sym != f_prev, 2 * np.pi * (f_prev.astype(np.float64) - f_sym) * t_b, 0.0)
    delta[0] = 0.0
    return np.mod(np.cumsum(delta), 2 * np.pi)


def modulate(
    bits,
    samples_per_symbol: int,
    modulation_type: str,
    parameters,
    bits_per_symbol: int = 1,
    carrier_amplitude: float = 1.0,
    carrier_frequency: float = 40e3,
    carrier_phase: float = 0.0,
    sample_rate: float = 1e6,
    pause: int = 0,
    start: int = 0,
    dtype=np.float32,
    gauss_bt: float = 0.5,
    filter_width: float = 1.0,
) -> np.ndarray:
    """bits -> (total_samples, 2) IQ array of ``dtype``.

    Semantics of signal_functions.pyx:56-177 (modulate_c/__modulate).
    """
    bits = np.asarray(bits, dtype=np.uint8)
    parameters = np.asarray(parameters, dtype=np.float32)
    dtype = np.dtype(dtype)
    mt = modulation_type.lower()
    if mt not in ("ask", "fsk", "psk", "oqpsk", "gfsk"):
        raise ValueError(f"unknown modulation type {modulation_type}")

    if mt == "oqpsk":
        if bits_per_symbol != 2:
            raise ValueError("OQPSK requires 2 bits per symbol")
        bits = get_oqpsk_bits(bits)

    num_bits = len(bits)
    total_symbols = num_bits // bits_per_symbol
    total_samples = total_symbols * samples_per_symbol + pause
    if num_bits == 0:
        return np.zeros((total_samples, 2), dtype=dtype)

    idx = bits_to_symbol_indices(bits, bits_per_symbol)

    a_sym = np.full(total_symbols, carrier_amplitude, dtype=np.float32)
    f_sym = np.full(total_symbols, carrier_frequency, dtype=np.float32)
    phi_sym = np.full(total_symbols, carrier_phase, dtype=np.float32)

    if mt == "ask":
        a_sym = parameters[idx]
    elif mt == "fsk":
        f_sym = parameters[idx]
        phi_sym = phi_sym + _fsk_phase_corrections(
            f_sym, samples_per_symbol, start, sample_rate
        ).astype(np.float32)
    elif mt in ("psk", "oqpsk"):
        phi_sym = parameters[idx]

    if mt == "gfsk":
        freqs = np.repeat(parameters[idx], samples_per_symbol).astype(np.float32)
        gfir = gauss_fir(sample_rate, samples_per_symbol, bt=gauss_bt, filter_width=filter_width)
        if len(freqs) >= len(gfir):
            freqs = np.convolve(freqs, gfir, mode="same").astype(np.float32)
        else:
            freqs = np.convolve(gfir, freqs, mode="same")[: len(freqs)].astype(np.float32)
        # phase continuity: phases[i+1] = phases[i] + 2*pi*t[i]*(f[i] - f[i+1])
        n = len(freqs)
        t = ((np.arange(start, start + n).astype(np.float32)) / np.float32(sample_rate)).astype(np.float64)
        deltas = 2 * np.pi * t[:-1] * (freqs[:-1].astype(np.float64) - freqs[1:])
        phases = carrier_phase + np.concatenate(([0.0], np.cumsum(deltas)))
        amps = np.full(n, carrier_amplitude, dtype=np.float32)
        phases32 = phases.astype(np.float32)
        n_body = n
    else:
        n_body = total_symbols * samples_per_symbol

    # float32 host synthesis writes straight into the final buffer
    # (body region), skipping the intermediate body array + copy.
    direct = dtype == np.float32 and n_body < DEVICE_MIN_BODY_SAMPLES
    result = np.zeros((total_samples, 2), dtype=dtype) if direct else None

    if mt == "gfsk":
        if n_body >= DEVICE_MIN_BODY_SAMPLES:
            body = np.asarray(_synthesize_per_sample(
                jnp.asarray(amps), jnp.asarray(freqs), jnp.asarray(phases32),
                jnp.float32(start), jnp.float32(sample_rate)))
        else:
            body = _synthesize_per_sample_np(
                amps, freqs, phases32, start, sample_rate,
                out=result[:n_body] if direct else None)
    elif n_body >= DEVICE_MIN_BODY_SAMPLES:
        body = np.asarray(_synthesize(
            jnp.asarray(a_sym),
            jnp.asarray(f_sym),
            jnp.asarray(phi_sym),
            jnp.float32(start),
            jnp.float32(sample_rate),
            int(samples_per_symbol),
        ))
    else:
        body = _synthesize_np(a_sym, f_sym, phi_sym, start, sample_rate,
                              int(samples_per_symbol),
                              out=result[:n_body] if direct else None)
    if mt == "oqpsk":
        if not direct:
            body = body.copy()
        body[:samples_per_symbol, 1] = 0
        body[len(body) - samples_per_symbol:, 0] = 0

    if not direct:
        result = np.zeros((total_samples, 2), dtype=dtype)
        # C-style truncation toward zero, like the reference's <iq> cast
        result[: len(body)] = body if dtype == np.float32 else body.astype(dtype)
    return result
