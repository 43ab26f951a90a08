"""Subprocess-group supervision for the multi-process distributed tests.

jax.distributed workers block forever inside a Gloo collective when a
peer dies (the collective has no liveness detection), so a plain
``communicate(timeout=...)`` over a worker list turns any single-worker
assertion failure into an undiagnosable TimeoutExpired with zero output.
This helper polls the whole group, kills survivors as soon as one worker
exits non-zero, and always returns/raises with every worker's captured
output attached.
"""

import time


def communicate_with_watchdog(workers, timeout):
    """Drain ``workers`` (Popen with stdout=PIPE, stderr=STDOUT, text=True).

    Returns a list of each worker's output once all have exited.  If one
    exits non-zero while peers still run, the peers are killed (they
    would otherwise hang in a Gloo collective waiting for the dead
    peer).  On timeout, kills everything and raises TimeoutError with
    all partial output embedded, so the failure is diagnosable.
    """
    deadline = time.monotonic() + timeout
    outputs = [None] * len(workers)

    def drain(i):
        try:
            outputs[i] = workers[i].communicate(timeout=15)[0]
        except Exception:
            workers[i].kill()
            outputs[i] = "<output unavailable>"

    try:
        while any(o is None for o in outputs):
            progressed = False
            for i, w in enumerate(workers):
                if outputs[i] is None and w.poll() is not None:
                    drain(i)
                    progressed = True
                    if w.returncode != 0:
                        for peer in workers:
                            if peer.poll() is None:
                                peer.kill()
            if all(o is not None for o in outputs):
                break
            if time.monotonic() > deadline:
                for w in workers:
                    if w.poll() is None:
                        w.kill()
                for i in range(len(workers)):
                    if outputs[i] is None:
                        drain(i)
                raise TimeoutError(
                    "distributed workers timed out; captured output:\n"
                    + "\n".join(f"--- worker {i} (rc={w.returncode}) ---\n{o}"
                                for i, (w, o) in enumerate(zip(workers, outputs))))
            if not progressed:
                time.sleep(0.2)
    finally:
        for i, w in enumerate(workers):
            if w.poll() is None:
                w.kill()
            if outputs[i] is None:
                drain(i)
    return outputs
