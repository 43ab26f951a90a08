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


def drain_tx_stream(conn, is_complete, deadline_s: float = 20.0) -> bytes:
    """Read a simulator TX socket until is_complete(received) or deadline.

    Condition-based replacement for a fixed idle-window recv loop: TX
    pushes arrive in bursts, so completion is judged by the caller's
    predicate (usually "demodulates to the expected message"), polled
    whenever the socket goes briefly quiet.
    """
    import socket as _socket
    import time as _time

    received = b""
    conn.settimeout(0.5)
    deadline = _time.monotonic() + deadline_s
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
