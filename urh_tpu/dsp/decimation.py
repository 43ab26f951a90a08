"""Min/max plot decimation.

TPU equivalent of the reference's plot-path kernel
(urh/cythonext/path_creator.pyx:19-84): reduce millions of samples to
at most PIXELS_PER_PATH min/max pairs for display.  The per-chunk
min/max is a single device reduction over a reshaped view instead of an
OpenMP loop; host plotting is frontend-agnostic (returns x, y arrays).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from urh_tpu.util import settings


@partial(jax.jit, static_argnames=("samples_per_pixel",))
def _minmax_decimate(samples: jax.Array, samples_per_pixel: int):
    n_chunks = samples.shape[0] // samples_per_pixel
    chunks = samples[: n_chunks * samples_per_pixel].reshape(n_chunks, samples_per_pixel)
    return jnp.min(chunks, axis=1), jnp.max(chunks, axis=1)


def create_path(samples: np.ndarray, start: int, end: int, subpath_ranges=None):
    """-> list of (x, y) arrays, one per subpath range.

    y interleaves per-chunk minima and maxima like the reference, so a
    connected line through the points visualizes the signal envelope.
    """
    samples = np.asarray(samples)
    num_samples = end - start
    subpath_ranges = [(start, end)] if subpath_ranges is None else subpath_ranges
    pixels_on_path = settings.PIXELS_PER_PATH

    samples_per_pixel = int(num_samples / pixels_on_path)

    if samples_per_pixel > 1:
        mins, maxs = _minmax_decimate(
            jnp.asarray(samples[start:end], dtype=jnp.float32), samples_per_pixel)
        mins = np.asarray(mins)
        maxs = np.asarray(maxs)
        sample_rng = np.arange(start, start + len(mins) * samples_per_pixel,
                               samples_per_pixel, dtype=np.int64)
        x = np.repeat(sample_rng, 2)
        values = np.empty(2 * len(mins), dtype=np.float32)
        values[0::2] = mins
        values[1::2] = maxs
        scale_factor = num_samples / (2.0 * len(sample_rng))
    else:
        x = np.arange(start, end, dtype=np.int64)
        values = samples[start:end]
        scale_factor = 1.0

    if scale_factor == 0:
        scale_factor = 1

    import math

    result = []
    for subpath_range in subpath_ranges:
        sub_start = ((((subpath_range[0] - start) / scale_factor) * scale_factor)
                     - 2 * scale_factor) / scale_factor
        sub_start = int(max(0, math.floor(sub_start)))
        sub_end = ((((subpath_range[1] - start) / scale_factor) * scale_factor)
                   + 2 * scale_factor) / scale_factor
        sub_end = int(max(0, math.ceil(sub_end)))
        result.append((x[sub_start:sub_end], values[sub_start:sub_end]))
    return result


def create_live_path(samples: np.ndarray, start: int, end: int):
    return np.arange(start, end, dtype=np.int64), np.asarray(samples[start:end])
