"""Subprocess-group supervision for the multi-process distributed tests.

jax.distributed workers block forever inside a Gloo collective when a
peer dies (the collective has no liveness detection), so a plain
``communicate(timeout=...)`` over a worker list turns any single-worker
assertion failure into an undiagnosable TimeoutExpired with zero output.
This helper drains every worker's stdout continuously (so a chatty
worker can never deadlock on a full pipe), kills survivors as soon as
one worker exits non-zero, and always returns/raises with every
worker's captured output attached.
"""

import threading
import time


class _Drainer(threading.Thread):
    """Continuously reads one worker's stdout into a buffer."""

    def __init__(self, pipe):
        super().__init__(daemon=True)
        self.pipe = pipe
        self.chunks = []
        self.start()

    def run(self):
        try:
            for line in self.pipe:
                self.chunks.append(line)
        except (OSError, ValueError):
            pass

    def text(self) -> str:
        return "".join(self.chunks)


def communicate_with_watchdog(workers, timeout):
    """Drain ``workers`` (Popen with stdout=PIPE, stderr=STDOUT, text=True).

    Returns a list of each worker's output once all have exited.  If one
    exits non-zero while peers still run, the peers are killed (they
    would otherwise hang in a Gloo collective waiting for the dead
    peer).  On timeout, kills everything and raises TimeoutError with
    all partial output embedded, so the failure is diagnosable.
    """
    deadline = time.monotonic() + timeout
    drainers = [_Drainer(w.stdout) for w in workers]
    finished = [False] * len(workers)

    def kill_survivors():
        for w in workers:
            if w.poll() is None:
                w.kill()

    try:
        while not all(finished):
            progressed = False
            for i, w in enumerate(workers):
                if not finished[i] and w.poll() is not None:
                    finished[i] = True
                    progressed = True
                    if w.returncode != 0:
                        kill_survivors()
            if all(finished):
                break
            if time.monotonic() > deadline:
                kill_survivors()
                for d in drainers:
                    d.join(timeout=10)
                raise TimeoutError(
                    "distributed workers timed out; captured output:\n"
                    + "\n".join(f"--- worker {i} (rc={w.returncode}) ---\n"
                                f"{d.text()}"
                                for i, (w, d) in enumerate(zip(workers,
                                                               drainers))))
            if not progressed:
                time.sleep(0.2)
    finally:
        kill_survivors()
        for d in drainers:
            d.join(timeout=10)
    return [d.text() for d in drainers]
