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
    phi = jnp.where(safe, phi, jnp.float32(0.0))
    # IEEE signed-zero semantics (atan2(+-0, -0) = +-pi, etc.): branch on
    # the SIGN BIT so that -0.0 counts as negative, matching libm
    sign_x = jax.lax.bitcast_convert_type(x, jnp.int32) < 0
    sign_y = jax.lax.bitcast_convert_type(y, jnp.int32) < 0
    phi = jnp.where(sign_x, jnp.float32(math.pi) - phi, phi)
    return jnp.where(sign_y, -phi, phi)


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


def _fused_fsk_i8_kernel(re_ref, im_ref, noise_ref, tan_thr_ref, thr_neg_ref,
                         state_ref, carry_ref):
    """int8 ingest variant: I/Q enter HBM as int8 (device capture format,
    e.g. HackRF), only int8 symbol states leave -- 3 bytes of HBM traffic
    per sample instead of 16 for the float32 qad+states kernel.

    The binary decision atan2(y, x) > c never needs the arctangent: for
    |c| < pi/2 it reduces to sign/comparison tests (the atan2 polynomial
    was the compute bottleneck of the f32 kernel):
      x < 0 (incl. -0):   angle is +-(pi/2, pi]  ->  decided by sign(y)
      x > 0 or +0, y!=0:  y > x*tan(c)  (x=+0 degenerates to y > 0 ==
                          +-pi/2 > c, correct for |c| < pi/2)
      x == +0, y == +-0:  angle is +-0  ->  c < 0 decides
    """
    i = pl.program_id(0)

    re = re_ref[:].astype(jnp.float32)
    im = im_ref[:].astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = re[0, 0]
        carry_ref[1] = im[0, 0]

    prev_re = _prev_in_row_major(re, carry_ref[0], i == 0)
    prev_im = _prev_in_row_major(im, carry_ref[1], i == 0)

    carry_ref[0] = re[re.shape[0] - 1, re.shape[1] - 1]
    carry_ref[1] = im[im.shape[0] - 1, im.shape[1] - 1]

    mag2 = re * re + im * im
    x = prev_re * re + prev_im * im
    y = prev_re * im - prev_im * re

    sign_x = jax.lax.bitcast_convert_type(x, jnp.int32) < 0
    sign_y = jax.lax.bitcast_convert_type(y, jnp.int32) < 0
    # all select OPERANDS are int32 -- Mosaic cannot lower i1-valued
    # select_n (it round-trips through i8 and fails the i8->i1 trunc)
    not_sy = jnp.int32(1) - sign_y.astype(jnp.int32)
    cmp = (y > x * tan_thr_ref[0]).astype(jnp.int32)
    above_i = jnp.where(sign_x, not_sy, cmp)
    both_zero = (x == 0) & (~sign_x) & (y == 0)
    above_i = jnp.where(both_zero, thr_neg_ref[0], above_i)
    gated = mag2 <= noise_ref[0]
    state_ref[:] = jnp.where(gated, jnp.int32(-1), above_i).astype(jnp.int8)


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_fsk_symbolize_i8(re: jax.Array, im: jax.Array, noise_sqrd: jax.Array,
                           threshold: jax.Array, block_rows: int = 512,
                           interpret: bool = False):
    """(rows, 128) int8 I/Q planes -> int8 states, single fused pass."""
    rows = re.shape[0]
    grid = (rows // block_rows,)

    in_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    states = pl.pallas_call(
        _fused_fsk_i8_kernel,
        grid=grid,
        in_specs=[in_spec, in_spec, scalar_spec, scalar_spec, scalar_spec],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int8),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=interpret,
    )(re, im, noise_sqrd.reshape(1), jnp.tan(threshold).reshape(1),
      (threshold < 0).astype(jnp.int32).reshape(1))
    return states


def fsk_symbolize_i8(samples: np.ndarray, noise_mag: float, threshold: float,
                     block_rows: int = 512, interpret=False) -> np.ndarray:
    """Host entry: (N, 2) int8 -> int8 symbol states (no qad materialized).

    states[0] = -1 mirrors the afp_demod first-sample sentinel quirk.
    """
    samples = np.asarray(samples)
    assert samples.dtype == np.int8, samples.dtype
    if not abs(threshold) < math.pi / 2:
        raise ValueError("comparison kernel requires |threshold| < pi/2")
    n = len(samples)
    chunk = block_rows * LANES
    padded = (n + chunk - 1) // chunk * chunk
    if padded != n:
        samples = np.pad(samples, ((0, padded - n), (0, 0)))
    re = np.ascontiguousarray(samples[:, 0]).reshape(-1, LANES)
    im = np.ascontiguousarray(samples[:, 1]).reshape(-1, LANES)
    states = fused_fsk_symbolize_i8(
        jnp.asarray(re), jnp.asarray(im),
        jnp.float32(noise_mag * noise_mag), jnp.float32(threshold),
        block_rows=block_rows, interpret=interpret)
    states = np.array(states).reshape(-1)[:n]
    if n > 0:
        states[0] = -1
    return states


def _fused_ask_kernel(re_ref, im_ref, noise_ref, thr_ref, max_ref,
                      qad_ref, state_ref):
    """ASK envelope: noise gate + normalized magnitude + symbol decision in
    one VMEM pass (no sample history needed)."""
    re = re_ref[:]
    im = im_ref[:]
    mag2 = re * re + im * im
    # same op sequence as the host demod (sqrt then divide) for parity
    val = jnp.sqrt(mag2) / max_ref[0]

    sentinel = jnp.float32(0.0)
    gated = mag2 <= noise_ref[0]
    qad_ref[:] = jnp.where(gated, sentinel, val)

    state = (val > thr_ref[0]).astype(jnp.int32)
    state_ref[:] = jnp.where(gated, jnp.int32(-1), state)


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_ask_demod_symbolize(re: jax.Array, im: jax.Array, noise_sqrd: jax.Array,
                              threshold: jax.Array, max_mag: jax.Array,
                              block_rows: int = 512, interpret: bool = False):
    rows = re.shape[0]
    grid = (rows // block_rows,)
    spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    qad, states = pl.pallas_call(
        _fused_ask_kernel,
        grid=grid,
        in_specs=[spec, spec, scalar_spec, scalar_spec, scalar_spec],
        out_specs=[spec, pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
        interpret=interpret,
    )(re, im, noise_sqrd.reshape(1), threshold.reshape(1), max_mag.reshape(1))
    return qad, states


def ask_demod_symbolize(samples: np.ndarray, noise_mag: float, threshold: float,
                        max_mag: float, block_rows: int = 512, interpret=False):
    """Host entry: (N, 2) float32 raw -> (qad, states) for binary ASK."""
    re, im, n = pad_for_pallas(np.asarray(samples, dtype=np.float32), block_rows)
    qad, states = fused_ask_demod_symbolize(
        jnp.asarray(re), jnp.asarray(im),
        jnp.float32(noise_mag * noise_mag), jnp.float32(threshold),
        jnp.float32(max_mag), block_rows=block_rows, interpret=interpret)
    qad = np.array(qad).reshape(-1)[:n]
    states = np.array(states).reshape(-1)[:n]
    if n > 0:
        qad[0] = 0.0
        states[0] = -1
    return qad, states


def _fused_ask_i8_kernel(re_ref, im_ref, noise_ref, thr_ref, max_ref,
                         state_ref):
    """int8 ASK ingest: states only, 3 bytes of HBM traffic per sample."""
    re = re_ref[:].astype(jnp.float32)
    im = im_ref[:].astype(jnp.float32)
    mag2 = re * re + im * im
    val = jnp.sqrt(mag2) / max_ref[0]
    gated = mag2 <= noise_ref[0]
    state = (val > thr_ref[0]).astype(jnp.int32)
    state_ref[:] = jnp.where(gated, jnp.int32(-1), state).astype(jnp.int8)


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_ask_symbolize_i8(re: jax.Array, im: jax.Array, noise_sqrd: jax.Array,
                           threshold: jax.Array, max_mag: jax.Array,
                           block_rows: int = 512, interpret: bool = False):
    rows = re.shape[0]
    grid = (rows // block_rows,)
    in_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _fused_ask_i8_kernel,
        grid=grid,
        in_specs=[in_spec, in_spec, scalar_spec, scalar_spec, scalar_spec],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int8),
        interpret=interpret,
    )(re, im, noise_sqrd.reshape(1), threshold.reshape(1), max_mag.reshape(1))


def ask_symbolize_i8(samples: np.ndarray, noise_mag: float, threshold: float,
                     max_mag: float, block_rows: int = 512,
                     interpret=False) -> np.ndarray:
    """Host entry: (N, 2) int8 -> int8 ASK symbol states."""
    samples = np.asarray(samples)
    assert samples.dtype == np.int8, samples.dtype
    n = len(samples)
    chunk = block_rows * LANES
    padded = (n + chunk - 1) // chunk * chunk
    if padded != n:
        samples = np.pad(samples, ((0, padded - n), (0, 0)))
    re = np.ascontiguousarray(samples[:, 0]).reshape(-1, LANES)
    im = np.ascontiguousarray(samples[:, 1]).reshape(-1, LANES)
    states = fused_ask_symbolize_i8(
        jnp.asarray(re), jnp.asarray(im),
        jnp.float32(noise_mag * noise_mag), jnp.float32(threshold),
        jnp.float32(max_mag), block_rows=block_rows, interpret=interpret)
    states = np.array(states).reshape(-1)[:n]
    if n > 0:
        states[0] = -1
    return states


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
