"""Multi-host distributed execution: 2 CPU processes on localhost form a
4-device global mesh (jax.distributed + Gloo collectives) and must
produce bit-identical demodulation to the single-host path.

This is the hardware-free stand-in for a multi-host TPU pod: the same
code path (process-spanning mesh, per-host ingest, cross-process halo
ppermute, run-list allgather) runs there with ICI/DCN instead of
localhost TCP.
"""

import os
import socket
import subprocess
import sys

import pytest

from tests.golden import get_path_for_data_file

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def test_two_process_demod_bit_identical():
    capture = get_path_for_data_file("fsk.complex")
    port = str(_free_port())

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))

    workers = [
        subprocess.Popen([sys.executable, _WORKER, port, str(pid), capture],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outputs = []
    try:
        for worker in workers:
            out, _ = worker.communicate(timeout=150)
            outputs.append(out)
    finally:
        for worker in workers:
            if worker.poll() is None:
                worker.kill()

    for pid, (worker, out) in enumerate(zip(workers, outputs)):
        assert worker.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid} OK" in out, f"worker {pid} output:\n{out}"
