"""Adaptive host/device placement calibration (util/placement.py)."""

import numpy as np
import pytest

from urh_tpu.util import placement


def test_dispatch_overhead_measured_once():
    a = placement.dispatch_overhead_s()
    b = placement.dispatch_overhead_s()
    assert a == b  # cached
    assert 0 < a < 10


def test_transfer_cost_model():
    up, down = placement.transfer_s_per_byte()
    assert 0 < up < 1 and 0 < down < 1  # seconds per byte, sane range
    base = placement.device_io_cost_s(0, 0)
    assert base == pytest.approx(placement.dispatch_overhead_s())
    # cost is monotone in bytes, both directions
    assert placement.device_io_cost_s(1 << 20) > base
    assert placement.device_io_cost_s(0, 1 << 20) > base
    assert (placement.device_io_cost_s(1 << 21)
            > placement.device_io_cost_s(1 << 20))


def test_scaled_threshold_never_lowers():
    assert placement.scaled_threshold(0) == 0
    assert placement.scaled_threshold(1 << 16) >= 1 << 16
    # sentinel-size thresholds stay effective (capped inflation)
    assert placement.scaled_threshold(1 << 62) >= 1 << 62


def test_race_caches_verdict_and_requires_margin():
    calls = {"device": 0, "host": 0}

    def device_fn():
        calls["device"] += 1
        return "d"

    def host_fn():
        calls["host"] += 1
        return "h"

    key = "test.race.%d" % np.random.default_rng().integers(1 << 30)
    first = placement.race(key, device_fn, host_fn)
    assert first in ("d", "h")
    verdict = placement._RACE_VERDICTS[key]
    assert verdict in ("device", "host")

    # later calls run only the winner
    calls["device"] = calls["host"] = 0
    placement.race(key, device_fn, host_fn)
    assert calls["device"] + calls["host"] == 1
    assert calls["device" if verdict == "device" else "host"] == 1


def test_race_falls_back_to_host_on_device_error():
    def device_fn():
        raise RuntimeError("no chip")

    key = "test.race.error.%d" % np.random.default_rng().integers(1 << 30)
    assert placement.race(key, device_fn, lambda: "h") == "h"
    assert placement._RACE_VERDICTS[key] == "host"
    # cached: the device fn is never retried
    assert placement.race(key, device_fn, lambda: "h2") == "h2"
