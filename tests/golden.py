"""Access to the reference golden captures (recorded IQ with known bits).

The captures live in the read-only reference checkout; tests that need
them skip when it is unavailable.
"""

import os

import pytest

REF_DATA = os.environ.get("URH_TPU_REF_DATA", "/root/reference/tests/data")


def get_path_for_data_file(name: str) -> str:
    path = os.path.join(REF_DATA, name)
    if not os.path.exists(path):
        pytest.skip(f"golden capture {name} not available")
    return path


def load_factor() -> float:
    """How oversubscribed the host is right now, as the wall/CPU time
    ratio of a short CPU-bound calibration loop (~1 when idle, ~N when
    N-fold contended).  Deadlines in the TCP-loopback simulator tests
    scale by this so full-suite contention on a 2-core box cannot flake
    them (the round-3/4 lesson: fixed deadlines under load make round
    artifacts lie)."""
    import time as _time

    t0_wall, t0_cpu = _time.monotonic(), _time.process_time()
    acc = 0
    for i in range(200_000):
        acc += i * i
    wall = _time.monotonic() - t0_wall
    cpu = _time.process_time() - t0_cpu
    return min(8.0, max(1.0, wall / max(cpu, 1e-9)))


def wait_for_condition(predicate, base_timeout_s: float = 10.0,
                       interval_s: float = 0.1):
    """Deadline-poll ``predicate`` with the deadline scaled by the
    current host load; returns the first truthy value or None."""
    import time as _time

    deadline = _time.monotonic() + base_timeout_s * load_factor()
    while _time.monotonic() < deadline:
        value = predicate()
        if value:
            return value
        _time.sleep(interval_s)
    return None


def drain_tx_stream(conn, is_complete, deadline_s: float = 20.0) -> bytes:
    """Read a simulator TX socket until is_complete(received) or a
    load-scaled deadline.

    Condition-based replacement for a fixed idle-window recv loop: TX
    pushes arrive in bursts, so completion is judged by the caller's
    predicate (usually "demodulates to the expected message"), polled
    whenever the socket goes briefly quiet.  The deadline stretches with
    host load (see load_factor) — the pass path returns as soon as the
    predicate holds, so the stretch only affects genuinely slow runs.
    """
    import socket as _socket
    import time as _time

    received = b""
    conn.settimeout(0.5)
    deadline = _time.monotonic() + min(150.0, deadline_s * load_factor())
    while _time.monotonic() < deadline:
        try:
            chunk = conn.recv(65536)
        except _socket.timeout:
            if is_complete(received):
                break
            continue
        if not chunk:
            break
        received += chunk
    return received
