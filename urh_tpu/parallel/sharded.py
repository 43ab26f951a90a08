"""Block-sharded streaming DSP over a device mesh.

The central multi-chip design (SURVEY.md section 2.2/5): a long capture
is sharded by contiguous time block across a 1-D mesh axis.  Stages:

* elementwise stages (dtype conversion, magnitude, gating, symbol
  mapping, envelope) shard trivially;
* the FSK quadrature discriminator needs a 1-sample halo from the left
  neighbor — exchanged with ``jax.lax.ppermute`` over ICI;
* FIR/overlap-save filtering needs an (n_taps-1)-sample halo (see
  urh_tpu.dsp.filters);
* sequential carry state (Costas phase/frequency, run-length carries)
  is handed across block boundaries on the host between device steps —
  the per-block scan runs on device.

The reference has no distributed story at all (single machine,
multiprocessing pipes); this module is the TPU-native replacement for
its per-sample OpenMP parallelism at pod scale.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from urh_tpu.core.xfer import to_device, to_host
from urh_tpu.dsp.demod import noise_sentinel


def make_mesh(n_devices: int = None, axis: str = "b") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def pad_to_blocks(x: np.ndarray, n_blocks: int):
    """Pad sample axis to a multiple of n_blocks; returns (padded, orig_len)."""
    n = x.shape[0]
    padded = (n + n_blocks - 1) // n_blocks * n_blocks
    if padded != n:
        pad_width = [(0, padded - n)] + [(0, 0)] * (x.ndim - 1)
        x = np.pad(x, pad_width)
    return x, n


def _fsk_demod_block(x, noise_sqrd, axis):
    """Per-block FSK discriminator with a 1-sample left halo via ppermute."""
    n_dev = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    # send my last sample to my right neighbor (ring)
    last = x[-1]
    prev_from_left = jax.lax.ppermute(
        last, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    # block 0 has no left neighbor: reference uses x[0] as its own "previous"
    prev0 = jnp.where(idx == 0, x[0], prev_from_left)

    prev = jnp.concatenate([prev0[None, :], x[:-1]], axis=0)
    t_re = prev[:, 0] * x[:, 0] + prev[:, 1] * x[:, 1]
    t_im = prev[:, 0] * x[:, 1] - prev[:, 1] * x[:, 0]
    val = jnp.arctan2(t_im, t_re)

    mag2 = x[:, 0] ** 2 + x[:, 1] ** 2
    sentinel = jnp.float32(noise_sentinel("FSK"))
    out = jnp.where(mag2 <= noise_sqrd, sentinel, val)
    # global sample 0 is always the sentinel
    out = jnp.where(
        (idx == 0) & (jnp.arange(out.shape[0]) == 0), sentinel, out
    )
    return out


def _ask_demod_block(x, noise_sqrd, max_mag, axis):
    idx = jax.lax.axis_index(axis)
    mag2 = x[:, 0] ** 2 + x[:, 1] ** 2
    sentinel = jnp.float32(noise_sentinel("ASK"))
    val = jnp.sqrt(mag2) / max_mag
    out = jnp.where(mag2 <= noise_sqrd, sentinel, val)
    out = jnp.where((idx == 0) & (jnp.arange(out.shape[0]) == 0), sentinel, out)
    return out


def _symbol_states_block(qad, thresholds, sentinel):
    state = jnp.sum(qad[:, None] > thresholds[None, :], axis=1).astype(jnp.int32)
    return jnp.where(qad == sentinel, jnp.int32(-1), state)


def build_sharded_demod(mesh: Mesh, mod_type: str, axis: str = "b"):
    """Compile a sharded demod+symbolize step over ``mesh``.

    Returns jit(fn)(x, noise_sqrd, max_mag, thresholds) with x: (N, 2)
    float32 sharded by time block; outputs (qad, states) with the same
    sharding.
    """
    xspec = P(axis, None)
    vspec = P(axis)

    def step(x, noise_sqrd, max_mag, thresholds):
        if mod_type == "FSK":
            qad = _fsk_demod_block(x, noise_sqrd, axis)
        elif mod_type == "ASK":
            qad = _ask_demod_block(x, noise_sqrd, max_mag, axis)
        else:
            raise ValueError(f"sharded demod supports ASK/FSK, not {mod_type}")
        states = _symbol_states_block(qad, thresholds, jnp.float32(noise_sentinel(mod_type)))
        return qad, states

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(xspec, P(), P(), P()),
        out_specs=(vspec, vspec),
    )
    return jax.jit(sharded)


def sharded_demodulate(iq_f32: np.ndarray, noise_mag: float, mod_type: str,
                       center: float, center_spacing: float, bits_per_symbol: int,
                       mesh: Mesh = None, dtype=np.float32):
    """Host entry: shard a capture by time block, demodulate + symbolize on
    the mesh, return (qad, states) as numpy (original length)."""
    from urh_tpu.core.iq import max_magnitude_for_dtype
    from urh_tpu.dsp.symbols import get_center_thresholds

    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.devices.size
    x, n = pad_to_blocks(np.asarray(iq_f32, dtype=np.float32), n_dev)

    fn = build_sharded_demod(mesh, mod_type)
    sharding = NamedSharding(mesh, P("b", None))
    x_dev = jax.device_put(x, sharding)

    thresholds = get_center_thresholds(center, center_spacing, 2 ** bits_per_symbol)
    qad, states = fn(
        x_dev,
        jnp.float32(noise_mag * noise_mag),
        jnp.float32(max_magnitude_for_dtype(dtype)),
        jnp.asarray(thresholds),
    )
    return np.asarray(qad)[:n], np.asarray(states)[:n]


# ---------------------------------------------------------------------------
# Overlap-save FIR filtering with (taps-1)-sample halo exchange
# ---------------------------------------------------------------------------


def build_sharded_fir(mesh: Mesh, n_taps: int, axis: str = "b"):
    """Compile a causal FIR filter over time-block sharded complex samples.

    Each block receives its left halo (n_taps - 1 samples) from the
    previous shard via ``ppermute`` (overlap-save), so the result is
    identical to filtering the unsharded stream: out[i] = sum_j x[i-j]h[j].
    """
    halo = n_taps - 1

    def step(x, taps):
        n_dev = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)

        tail = x[-halo:] if halo > 0 else x[:0]
        halo_from_left = jax.lax.ppermute(
            tail, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        # first block has no history: causal filter sees zeros
        halo_from_left = jnp.where(idx == 0, jnp.zeros_like(halo_from_left), halo_from_left)

        extended = jnp.concatenate([halo_from_left, x])
        # FFT convolution, not jnp.convolve: a direct complex conv blows
        # up TPU compile time and runs through the MXU at reduced
        # precision; one zero-padded FFT matches the single-device
        # overlap-save path (:mod:`urh_tpu.dsp.filters`) bit-for-bit
        n = extended.shape[0] + n_taps - 1
        n_fft = 1 << (n - 1).bit_length()
        full = jnp.fft.ifft(jnp.fft.fft(extended, n_fft) * jnp.fft.fft(taps, n_fft))
        return full[halo : halo + x.shape[0]].astype(x.dtype)

    sharded = shard_map(step, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis))
    return jax.jit(sharded)


def sharded_fir_filter(x: np.ndarray, taps: np.ndarray, mesh: Mesh = None) -> np.ndarray:
    """Host entry: causal FIR over a time-block sharded capture."""
    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.devices.size
    x = np.asarray(x, dtype=np.complex64)
    padded, n = pad_to_blocks(x, n_dev)

    fn = build_sharded_fir(mesh, len(taps))
    x_dev = to_device(padded, NamedSharding(mesh, P("b")))
    out = fn(x_dev, to_device(np.asarray(taps, dtype=np.complex64)))
    return to_host(out)[:n]


# ---------------------------------------------------------------------------
# Sharded STFT spectrogram: frames sharded across the mesh with
# (window - hop) halo from the right neighbor
# ---------------------------------------------------------------------------


def build_sharded_stft(mesh: Mesh, window_size: int, hop_size: int,
                       frames_per_shard: int, axis: str = "b"):
    overlap = window_size - hop_size

    def step(x):
        n_dev = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)

        head = x[:overlap] if overlap > 0 else x[:0]
        halo_from_right = jax.lax.ppermute(
            head, axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
        )
        halo_from_right = jnp.where(idx == n_dev - 1,
                                    jnp.zeros_like(halo_from_right), halo_from_right)

        extended = jnp.concatenate([x, halo_from_right])
        window = jnp.hanning(window_size)
        starts = jnp.arange(frames_per_shard)[:, None] * hop_size
        frames = extended[starts + jnp.arange(window_size)[None, :]]
        return jnp.fft.fft(frames * window, window_size, axis=1) / window_size

    sharded = shard_map(step, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis, None))
    return jax.jit(sharded)


def sharded_spectrogram(samples: np.ndarray, mesh: Mesh = None, window_size=1024,
                        overlap_factor=0.5) -> np.ndarray:
    """STFT over a time-block sharded capture, identical to the
    single-device Spectrogram.stft output."""
    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.devices.size
    hop = window_size - int(overlap_factor * window_size)

    samples = np.asarray(samples, dtype=np.complex64)
    num_frames = max(1, (len(samples) - window_size) // hop + 1)
    frames_per_shard = -(-num_frames // n_dev)
    needed = (frames_per_shard * n_dev - 1) * hop + window_size
    if len(samples) < needed:
        samples = np.pad(samples, (0, needed - len(samples)))

    # each shard owns frames_per_shard frames = frames_per_shard*hop samples
    local = frames_per_shard * hop
    x = samples[: n_dev * local]
    fn = build_sharded_stft(mesh, window_size, hop, frames_per_shard)
    x_dev = to_device(x, NamedSharding(mesh, P("b")))
    out = to_host(fn(x_dev))
    return out[:num_frames]


# ---------------------------------------------------------------------------
# PSK Costas loop: block-parallel with overlap-discard relocking
# ---------------------------------------------------------------------------


def build_sharded_costas(mesh: Mesh, loop_order: int, margin: int, axis: str = "b"):
    """Block-parallel Costas demodulation.

    The loop is a sequential IIR, so exact sharding would serialize.
    Instead each block prepends ``margin`` halo samples from its left
    neighbor and runs the loop from the default initial state: the loop
    re-locks during the margin and the margin outputs are discarded.
    With a margin of a few hundred symbols the symbol decisions match
    the sequential loop (the Costas lock is insensitive to its starting
    phase after convergence).

    UNSAFE when the margin cannot hold enough lock-in signal: blocks
    shorter than a few hundred symbols (the host entry clamps margin to
    the block length, sharded_psk_demod), margins that fall entirely
    inside a pause (no signal to re-lock on), or captures where phase
    continuity across a block boundary is itself the signal of interest.
    Use :func:`sharded_psk_demod_exact` (chained carries, bit-identical)
    for those cases; this variant only wins when all blocks can relock
    independently.
    """
    from urh_tpu.dsp.demod import _costa_demod_scan

    def step(x, noise_sqrd, scale, shift, bandwidth):
        n_dev = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)

        tail = x[-margin:]
        halo = jax.lax.ppermute(tail, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)])
        halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)

        extended = jnp.concatenate([halo, x])
        # initial loop state must be marked device-varying inside shard_map
        init_phase = jax.lax.pcast(jnp.float32(1.5), (axis,), to="varying")
        init_freq = jax.lax.pcast(jnp.float32(0.0), (axis,), to="varying")
        outs, _, _ = _costa_demod_scan(
            extended, noise_sqrd, scale, shift, loop_order, bandwidth,
            jnp.float32(math.sqrt(2.0) / 2.0), init_phase, init_freq)
        return outs[margin:]

    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P(axis, None), P(), P(), P(), P()),
                        out_specs=P(axis))
    return jax.jit(sharded)


def sharded_psk_demod(iq_f32: np.ndarray, noise_mag: float, mod_order: int = 2,
                      costas_loop_bandwidth: float = 0.1, margin: int = 4096,
                      mesh: Mesh = None, dtype=np.float32) -> np.ndarray:
    from urh_tpu.core.iq import normalize_scale_shift

    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.devices.size
    x, n = pad_to_blocks(np.asarray(iq_f32, dtype=np.float32), n_dev)
    margin = min(margin, len(x) // n_dev)  # halo cannot exceed a block

    scale, shift = normalize_scale_shift(dtype)
    fn = build_sharded_costas(mesh, int(mod_order), margin)
    x_dev = jax.device_put(x, NamedSharding(mesh, P("b", None)))
    out = fn(x_dev, jnp.float32(noise_mag * noise_mag), jnp.float32(scale),
             jnp.float32(shift), jnp.float32(costas_loop_bandwidth))
    result = np.array(out)[:n]
    if n > 0:
        result[0] = noise_sentinel("PSK")  # afp_demod sample-0 convention
    return result


# ---------------------------------------------------------------------------
# Sharded modulation: batch of messages sharded across the mesh (DP-style)
# ---------------------------------------------------------------------------


def build_sharded_modulator(mesh: Mesh, sps: int, axis: str = "b"):
    """Compile a batched FSK/ASK/PSK synthesis step: per-symbol parameter
    arrays (B, S) sharded over the batch axis -> (B, S*sps, 2) samples."""

    def synth(a_sym, f_sym, phi_sym, sample_rate):
        # (B, S) -> (B, S*sps)
        a = jnp.repeat(a_sym, sps, axis=1)
        f = jnp.repeat(f_sym, sps, axis=1)
        phi = jnp.repeat(phi_sym, sps, axis=1)
        t = (jnp.arange(a.shape[1], dtype=jnp.float32)) / sample_rate
        arg = jnp.float32(2 * math.pi) * f * t[None, :] + phi
        return jnp.stack([a * jnp.cos(arg), a * jnp.sin(arg)], axis=-1)

    return jax.jit(
        shard_map(
            synth,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None), P()),
            out_specs=P(axis, None, None),
        )
    )


def sharded_psk_demod_exact(iq_f32: np.ndarray, noise_mag: float,
                            mod_order: int = 2,
                            costas_loop_bandwidth: float = 0.1,
                            mesh: Mesh = None, dtype=np.float32) -> np.ndarray:
    """Bit-identical sharded PSK: chained per-block Costas scans.

    The Costas loop is a sequential IIR, so blocks execute one after
    another — but each block's scan runs on its own device and only the
    8-byte loop state (phase, frequency) crosses the block boundary.
    The win over one device is HBM capacity (each chip holds 1/n of the
    capture) and streaming consumption of the per-block outputs; the
    approximate-but-parallel alternative is :func:`sharded_psk_demod`.

    Output is bitwise equal to ``afp_demod(iq, noise, "PSK", order)``.
    """
    from urh_tpu.core.iq import normalize_scale_shift
    from urh_tpu.dsp.demod import _COSTAS_INIT_PHASE, _costa_demod_scan

    mesh = mesh if mesh is not None else make_mesh()
    devices = list(mesh.devices.flat)
    x = np.asarray(iq_f32, dtype=np.float32)
    n = len(x)
    if n <= 2:
        return np.zeros(n, dtype=np.float32)

    scale, shift = normalize_scale_shift(dtype)
    noise_sqrd = jnp.float32(noise_mag * noise_mag)
    damping = jnp.float32(math.sqrt(2.0) / 2.0)
    bw = jnp.float32(costas_loop_bandwidth)

    # the loop processes samples 1..n-1 (afp_demod excludes sample 0)
    bounds = np.linspace(1, n, len(devices) + 1, dtype=np.int64)
    phase, freq = jnp.float32(_COSTAS_INIT_PHASE), jnp.float32(0.0)
    pieces = []
    for device, lo, hi in zip(devices, bounds[:-1], bounds[1:]):
        if hi == lo:
            continue
        # commit the block AND the scalars/carry to this block's device
        block, n2, sc, sh, b, d, phase, freq = jax.device_put(
            (x[lo:hi], noise_sqrd, jnp.float32(scale), jnp.float32(shift),
             bw, damping, phase, freq), device)
        outs, phase, freq = _costa_demod_scan(
            block, n2, sc, sh, int(mod_order), b, d, phase, freq)
        pieces.append(outs)

    result = np.empty(n, dtype=np.float32)
    result[0] = noise_sentinel("PSK")  # afp_demod sample-0 convention
    result[1:] = np.concatenate([np.asarray(p) for p in pieces])
    return result


# ---------------------------------------------------------------------------
# Shard-local run extraction: symbolized states never gather to one host
# ---------------------------------------------------------------------------


def states_to_runs(states, total_len: int = None):
    """Run-length encode a (possibly device-sharded) state array.

    Iterates the array shard by shard in index order, run-length encodes
    each shard locally, and merges runs that straddle shard boundaries —
    the full per-sample array is never materialized on the host at once.
    Returns (run_states, run_starts, run_lengths) as int64 numpy arrays
    covering samples [0, total_len).
    """
    from urh_tpu.dsp.symbols import _run_length_encode

    if isinstance(states, np.ndarray):
        shards = [(0, states)]
    else:
        shards = sorted(
            ((s.index[0].start or 0, np.asarray(s.data)) for s in states.addressable_shards),
            key=lambda item: item[0])
        # replicated arrays repeat the same (offset 0) shard on every device
        if len({offset for offset, _ in shards}) == 1:
            shards = shards[:1]

    if total_len is None:
        total_len = max((off + len(block) for off, block in shards), default=0)

    all_states, all_starts, all_lens = [], [], []
    for offset, block in shards:
        if offset >= total_len:
            break
        block = block[: total_len - offset]
        r_states, r_starts, r_lens = _run_length_encode(block)
        if len(r_states) == 0:
            continue
        r_starts = r_starts + offset
        if all_states and all_states[-1][-1] == r_states[0]:
            # boundary run continues the previous shard's last run
            all_lens[-1][-1] += r_lens[0]
            r_states, r_starts, r_lens = r_states[1:], r_starts[1:], r_lens[1:]
        if len(r_states):
            all_states.append(np.asarray(r_states, dtype=np.int64))
            all_starts.append(r_starts.astype(np.int64))
            all_lens.append(r_lens.astype(np.int64))

    if not all_states:
        empty = np.zeros(0, dtype=np.int64)
        return empty, empty.copy(), empty.copy()
    return (np.concatenate(all_states), np.concatenate(all_starts),
            np.concatenate(all_lens))


def sharded_pulse_lens(iq_f32: np.ndarray, noise_mag: float, mod_type: str,
                       center: float, center_spacing: float,
                       bits_per_symbol: int, tolerance: int,
                       samples_per_symbol: int, mesh: Mesh = None,
                       dtype=np.float32) -> np.ndarray:
    """Sharded demod -> symbolize -> pulse extraction without gathering.

    The per-sample work (demod + threshold symbolization) runs sharded
    on the mesh; each shard's states reduce to a run list locally and
    only the run lists (thousands of entries, not millions of samples)
    reach the pulse machine.  Output equals
    ``grab_pulse_lens(afp_demod(...), ...)`` exactly.
    """
    from urh_tpu.core.iq import max_magnitude_for_dtype
    from urh_tpu.dsp.symbols import (PAUSE_STATE, _initial_state,
                                     get_center_thresholds,
                                     pulse_lens_from_runs)
    from urh_tpu.dsp.demod import noise_sentinel as _sentinel

    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.devices.size
    x, n = pad_to_blocks(np.asarray(iq_f32, dtype=np.float32), n_dev)
    if n == 0:
        return np.zeros((0, 2), dtype=np.int64)

    fn = build_sharded_demod(mesh, mod_type)
    thresholds = get_center_thresholds(center, center_spacing, 2 ** bits_per_symbol)
    _, states = fn(
        jax.device_put(x, NamedSharding(mesh, P("b", None))),
        jnp.float32(noise_mag * noise_mag),
        jnp.float32(max_magnitude_for_dtype(dtype)),
        jnp.asarray(thresholds),
    )

    r_states, r_starts, r_lens = states_to_runs(states, total_len=n)

    sentinel = _sentinel(mod_type)
    first_state = r_states[0] if len(r_states) else PAUSE_STATE
    first_sample = sentinel if first_state == PAUSE_STATE else sentinel + 1.0
    initial = _initial_state(first_sample, thresholds, sentinel, 2 ** bits_per_symbol)

    return pulse_lens_from_runs(r_states, r_starts, r_lens, n, initial,
                                tolerance, mod_type == "ASK", samples_per_symbol)
