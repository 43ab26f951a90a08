"""Adaptive host/device placement calibration.

The framework routes small workloads to host NumPy twins and large ones
to the device (see urh_tpu.ai.device.use_device and
urh_tpu.awre.device.use_device).  A static size threshold bakes in an
assumed dispatch cost, but the real cost spans orders of magnitude:
~100 microseconds to a locally attached chip, tens of milliseconds when
the chip sits behind a TCP relay (development tunnels).  One measured
round trip at import-of-first-use scales every threshold so the
break-even point tracks the actual link.
"""

from __future__ import annotations

import functools
import time

# dispatch cost the static thresholds were tuned for (local chip)
BASE_OVERHEAD_S = 100e-6


@functools.lru_cache(maxsize=1)
def dispatch_overhead_s() -> float:
    """Measured cost of one trivial jitted round trip (median of 3,
    after compile).  Cached for the process lifetime."""
    try:
        import jax
        import jax.numpy as jnp

        step = jax.jit(lambda x: x + 1)
        step(jnp.float32(0)).block_until_ready()  # compile outside timing
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            step(jnp.float32(0)).block_until_ready()
            samples.append(time.perf_counter() - t0)
        return max(1e-6, sorted(samples)[1])
    except Exception:
        return float("inf")


def scaled_threshold(base_cells: int) -> int:
    """Scale a size threshold tuned for BASE_OVERHEAD_S by the measured
    dispatch cost.  Never lowers the threshold (a fast link does not
    make tiny device calls worthwhile) and caps the inflation so
    sentinel values like 1 << 62 stay effective."""
    if base_cells <= 0:
        return base_cells
    ratio = dispatch_overhead_s() / BASE_OVERHEAD_S
    return int(base_cells * min(max(ratio, 1.0), 1e6))


@functools.lru_cache(maxsize=1)
def transfer_bandwidth_bps() -> float:
    """Measured host<->device round-trip bandwidth (1 MiB probe, once
    per process).  A PCIe-attached chip measures GB/s; a TCP relay
    measures tens of MB/s."""
    try:
        import jax
        import numpy as np

        probe = np.zeros(1 << 18, np.float32)  # 1 MiB
        np.asarray(jax.device_put(probe))      # warm the path
        t0 = time.perf_counter()
        rounds = 2
        for _ in range(rounds):
            np.asarray(jax.device_put(probe))
        elapsed = (time.perf_counter() - t0) / rounds
        return max(1e6, 2 * probe.nbytes / max(elapsed, 1e-9))
    except Exception:
        return float("inf")


def transfer_cost_s(n_bytes: int) -> float:
    """Estimated cost of one device call moving n_bytes in+out."""
    return dispatch_overhead_s() + n_bytes / transfer_bandwidth_bps()
