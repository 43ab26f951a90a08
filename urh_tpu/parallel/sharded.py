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
