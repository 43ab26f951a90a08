"""Hand-fused Pallas TPU kernels for the demod hot path.

The jnp demod path compiles to XLA-fused elementwise programs; these
kernels go one step further for the streaming hot loop: one VMEM pass
computes noise gate + FSK quadrature discriminator + symbol decision
without materializing intermediates in HBM, with the 1-sample
discriminator history carried across sequential grid steps in SMEM
(TPU grid iterations run in order, so a scratch cell is a legal carry).

Layout: I and Q planes are processed as (rows, 128) tiles so the lane
dimension is fully utilized; the "previous sample" shift becomes a
lane roll with a sublane-roll fix-up for column 0.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def _prev_in_row_major(x: jax.Array, carry_val: jax.Array, is_first_block) -> jax.Array:
    """prev[r, c] = x[r, c-1] with row wrap; prev[0, 0] = carry_val."""
    rows, cols = x.shape
    lane_roll = pltpu.roll(x, 1, axis=1)           # [r, 0] <- x[r, cols-1] (same row)
    sub_roll = pltpu.roll(x, 1, axis=0)            # [0, c] <- x[rows-1, c]
    # column 0 must come from the previous row's last column
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    prev = jnp.where(col_idx == 0, sub_roll[:, cols - 1][:, None], lane_roll)
    # element (0, 0) comes from the previous grid block (or itself at start)
    prev = jnp.where((col_idx == 0) & (row_idx == 0), carry_val, prev)
    return prev


# Odd-polynomial minimax coefficients for atan over [-1, 1]
# (Abramowitz & Stegun 4.4.49, |error| <= 2e-8 -- below float32 resolution).
_ATAN_COEFFS = (
    -0.3333314528, 0.1999355085, -0.1420889944, 0.1065626393,
    -0.0752896400, 0.0429096138, -0.0161657367, 0.0028662257,
)


def _atan2_elementwise(y: jax.Array, x: jax.Array) -> jax.Array:
    """atan2 from elementwise primitives (Mosaic has no atan2 lowering).

    First-quadrant half-angle identity: for ax, ay >= 0,
    atan2(ay, ax) = 2*atan(ay / (hypot + ax)) with reduced argument in
    [0, 1] (the angle is at most pi/2), then reflect by quadrant:
    x < 0 mirrors to pi - phi, y < 0 negates.  The origin maps to 0,
    matching C atan2.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hyp = jnp.sqrt(ax * ax + ay * ay)
    denom = hyp + ax
    safe = denom > 0
    t = ay / jnp.where(safe, denom, jnp.float32(1.0))
    t2 = t * t
    p = jnp.float32(_ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        p = p * t2 + jnp.float32(c)
    atan_t = t + t * t2 * p
    phi = jnp.float32(2.0) * atan_t
    phi = jnp.where(x < 0, jnp.float32(math.pi) - phi, phi)
    phi = jnp.where(safe, phi, jnp.float32(0.0))
    return jnp.where(y < 0, -phi, phi)


def _fused_fsk_kernel(re_ref, im_ref, noise_ref, thr_ref, qad_ref, state_ref, carry_ref):
    i = pl.program_id(0)

    re = re_ref[:]
    im = im_ref[:]

    # initialize carry with this block's first sample on the first step
    @pl.when(i == 0)
    def _():
        carry_ref[0] = re[0, 0]
        carry_ref[1] = im[0, 0]

    prev_re = _prev_in_row_major(re, carry_ref[0], i == 0)
    prev_im = _prev_in_row_major(im, carry_ref[1], i == 0)

    # save carry for the next block before overwriting anything
    carry_ref[0] = re[re.shape[0] - 1, re.shape[1] - 1]
    carry_ref[1] = im[im.shape[0] - 1, im.shape[1] - 1]

    mag2 = re * re + im * im
    t_re = prev_re * re + prev_im * im
    t_im = prev_re * im - prev_im * re
    val = _atan2_elementwise(t_im, t_re)

    sentinel = jnp.float32(-4.0)
    qad = jnp.where(mag2 <= noise_ref[0], sentinel, val)
    qad_ref[:] = qad

    state = (qad > thr_ref[0]).astype(jnp.int32)
    state_ref[:] = jnp.where(qad == sentinel, jnp.int32(-1), state)


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_fsk_demod_symbolize(re: jax.Array, im: jax.Array, noise_sqrd: jax.Array,
                              threshold: jax.Array, block_rows: int = 512,
                              interpret: bool = False):
    """(rows, 128) I/Q planes -> (qad, states), single fused pass.

    rows must be a multiple of block_rows; use pad_for_pallas to prepare.
    """
    rows = re.shape[0]
    grid = (rows // block_rows,)

    spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    qad, states = pl.pallas_call(
        _fused_fsk_kernel,
        grid=grid,
        in_specs=[spec, spec, scalar_spec, scalar_spec],
        out_specs=[spec, pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=interpret,
    )(re, im, noise_sqrd.reshape(1), threshold.reshape(1))
    return qad, states


def pad_for_pallas(x: np.ndarray, block_rows: int = 512):
    """(N, 2) samples -> padded (rows, 128) I/Q planes + original length."""
    n = len(x)
    chunk = block_rows * LANES
    padded = (n + chunk - 1) // chunk * chunk
    if padded != n:
        x = np.pad(x, ((0, padded - n), (0, 0)))
    re = np.ascontiguousarray(x[:, 0]).reshape(-1, LANES)
    im = np.ascontiguousarray(x[:, 1]).reshape(-1, LANES)
    return re, im, n


def fsk_demod_symbolize(samples: np.ndarray, noise_mag: float, threshold: float,
                        block_rows: int = 512, interpret=False):
    """Host entry: (N, 2) float32 -> (qad, states) via the fused kernel.

    Index 0 carries the noise sentinel / pause state, matching
    urh_tpu.dsp.demod.afp_demod semantics.
    """
    re, im, n = pad_for_pallas(np.asarray(samples, dtype=np.float32), block_rows)
    qad, states = fused_fsk_demod_symbolize(
        jnp.asarray(re), jnp.asarray(im),
        jnp.float32(noise_mag * noise_mag), jnp.float32(threshold),
        block_rows=block_rows, interpret=interpret)
    qad = np.array(qad).reshape(-1)[:n]
    states = np.array(states).reshape(-1)[:n]
    if n > 0:
        qad[0] = -4.0
        states[0] = -1
    return qad, states
