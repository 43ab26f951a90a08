"""Complex host<->device transfer shims.

The TPU runtime tunnel cannot move complex dtypes across the host/device
boundary in either direction (``batched_device_put`` and readback both
raise UNIMPLEMENTED), and a complex *device* array closed over by a
jitted function needs a device->host transfer to materialize as an MLIR
constant — which fails the same way.  Host *numpy* complex constants
embedded in jaxprs are fine (they are serialized into the HLO).

Every complex array therefore crosses the boundary as float32 planes:

  host -> device:  ship real/imag float32 planes, ``lax.complex`` on
                   device (:func:`to_device`)
  device -> host:  split into float planes on device, read floats back,
                   recombine on host (:func:`to_host`)

Real-dtype arrays pass through untouched, so these helpers are safe as
the single transfer entry points for code that handles both.  Complex
inputs are standardized to complex64 (the framework-wide IQ dtype).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["to_device", "to_host"]

_combine = jax.jit(jax.lax.complex)
_split = jax.jit(lambda x: (jnp.real(x), jnp.imag(x)))

# jit wrappers with explicit out_shardings, cached per sharding (building
# a fresh jax.jit per call would retrace every time)
_sharded_combine_cache: dict = {}


def to_device(x, sharding=None) -> jax.Array:
    """Host array -> device array; complex goes as float32 planes.

    ``sharding`` (a ``jax.sharding.Sharding``) places the result like
    ``jax.device_put(x, sharding)`` would.
    """
    x = np.asarray(x)
    if not np.issubdtype(x.dtype, np.complexfloating):
        return jnp.asarray(x) if sharding is None else jax.device_put(x, sharding)
    re = np.ascontiguousarray(x.real, dtype=np.float32)
    im = np.ascontiguousarray(x.imag, dtype=np.float32)
    if sharding is None:
        return _combine(jnp.asarray(re), jnp.asarray(im))
    combine = _sharded_combine_cache.get(sharding)
    if combine is None:
        combine = jax.jit(jax.lax.complex, out_shardings=sharding)
        _sharded_combine_cache[sharding] = combine
    return combine(jax.device_put(re, sharding), jax.device_put(im, sharding))


def to_host(x) -> np.ndarray:
    """Device array -> host ndarray; complex comes back as float32 planes."""
    if isinstance(x, np.ndarray):
        return x
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        return np.asarray(x)
    re, im = _split(x)
    out = np.empty(np.shape(re), dtype=np.complex64)
    out.real = np.asarray(re)
    out.imag = np.asarray(im)
    return out
