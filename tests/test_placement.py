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


def test_race_verdicts_persist_across_processes(tmp_path, monkeypatch):
    """A settled verdict is written to the per-link store and replayed
    by a fresh process (simulated by clearing the in-process caches):
    placement probes are paid once per link, not per run."""
    import json
    import os

    calls = {"device": 0, "host": 0}

    def device_fn():
        calls["device"] += 1
        return "d"

    def host_fn():
        calls["host"] += 1
        return "h"

    key = "test.persist.%d" % np.random.default_rng().integers(1 << 30)
    placement.race(key, device_fn, host_fn)
    probed = dict(calls)
    assert probed["device"] >= 1 and probed["host"] >= 1

    path = placement._store_path()
    assert os.path.isfile(path)
    stored = json.load(open(path))[placement._link_signature()]
    assert stored[key] == placement._RACE_VERDICTS[key]
    winner = stored[key]

    # fresh process: in-memory cache gone, store present
    monkeypatch.setattr(placement, "_RACE_VERDICTS", {})
    monkeypatch.setattr(placement, "_STORE_LOADED", False)
    result = placement.race(key, device_fn, host_fn)
    assert result == ("d" if winner == "device" else "h")
    # only the winner ran once more — no re-probing
    loser = "host" if winner == "device" else "device"
    assert calls[loser] == probed[loser]
    assert calls[winner] == probed[winner] + 1


def test_exception_verdicts_are_not_persisted(tmp_path, monkeypatch):
    """A device exception (e.g. the chip busy in another process) pins
    'host' only for THIS process — it must not poison the on-disk
    store for future processes."""
    import json
    import os

    key = "test.ephemeral.%d" % np.random.default_rng().integers(1 << 30)

    def bad_device():
        raise RuntimeError("chip busy")

    assert placement.race(key, bad_device, lambda: "h") == "h"
    assert placement._RACE_VERDICTS[key] == "host"
    # force a save through a normal race and check the store
    other = key + ".other"
    placement.race(other, lambda: "d", lambda: "h")
    stored = json.load(open(placement._store_path()))[
        placement._link_signature()]
    assert key not in stored
    assert other in stored
