"""Multi-host distributed execution: jax.distributed + process-spanning mesh.

The reference's only multi-process story is pipes and localhost TCP on
one machine (urh/dev/native/Device.py:675-692, ingest loop
urh/dev/gr/AbstractBaseThread.py:247-266).  The TPU-native replacement
is a multi-controller JAX runtime:

* every host runs this same program and calls :func:`initialize` —
  ``jax.distributed.initialize`` wires the processes into one runtime;
* :func:`global_mesh` spans ALL processes' devices; ``shard_map``
  programs built by :mod:`urh_tpu.parallel.sharded` run unchanged on
  it, with XLA routing halo ``ppermute`` over ICI within a host/slice
  and DCN across hosts;
* ingest is per-host: each process reads ONLY its slice of the capture
  (:func:`read_capture_slice` — a byte-range read, no broadcast) and
  :func:`make_global_capture` assembles the process-local blocks into
  one globally-sharded array without any host ever holding the full
  capture;
* results come back as addressable shards; the run-level reductions
  (urh_tpu.parallel.sharded.states_to_runs) keep per-host traffic at
  run-list size.

Tested hardware-free with two CPU processes on localhost
(tests/test_distributed.py) — the same code path a TPU pod uses.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ENV_COORD = "URH_TPU_COORDINATOR"
_ENV_NUM_PROCS = "URH_TPU_NUM_PROCESSES"
_ENV_PROC_ID = "URH_TPU_PROCESS_ID"


def initialize(coordinator_address: str = None, num_processes: int = None,
               process_id: int = None, local_device_ids=None) -> None:
    """Join the multi-controller runtime.

    Arguments default to the URH_TPU_COORDINATOR / URH_TPU_NUM_PROCESSES /
    URH_TPU_PROCESS_ID environment variables; on TPU pods all three can
    be omitted entirely (JAX autodetects via the TPU metadata service).
    Safe to call once per process, before any other jax API.
    """
    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    num_processes = num_processes or _env_int(_ENV_NUM_PROCS)
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is None:
        process_id = _env_int(_ENV_PROC_ID)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def _env_int(name: str):
    raw = os.environ.get(name)
    return int(raw) if raw else None


def is_distributed() -> bool:
    return jax.process_count() > 1


def global_mesh(axis: str = "b") -> Mesh:
    """1-D time-block mesh over every device of every process."""
    return Mesh(np.array(jax.devices()), (axis,))


# ---------------------------------------------------------------------------
# per-host ingest
# ---------------------------------------------------------------------------


def process_slice(total: int, num_processes: int = None,
                  process_id: int = None) -> tuple:
    """[start, end) of this process's sample range.

    Samples divide as evenly as possible; every process must make the
    same call so the global partition lines up.
    """
    num_processes = num_processes or jax.process_count()
    process_id = jax.process_index() if process_id is None else process_id
    bounds = np.linspace(0, total, num_processes + 1, dtype=np.int64)
    return int(bounds[process_id]), int(bounds[process_id + 1])


def read_capture_slice(path: str, dtype, total_samples: int = None,
                       samples_per_frame: int = 2) -> np.ndarray:
    """Read only this process's byte range of a raw capture file.

    Replaces the reference's central TCP ingest with per-host file IO:
    each host memory-maps the capture and touches only its own slice.
    Returns the (local_n, samples_per_frame) block for this process.
    """
    dtype = np.dtype(dtype)
    if total_samples is None:
        total_samples = os.path.getsize(path) // (dtype.itemsize * samples_per_frame)
    start, end = process_slice(total_samples)
    mm = np.memmap(path, dtype=dtype, mode="r",
                   shape=(total_samples, samples_per_frame))
    return np.array(mm[start:end])


def make_global_capture(local_block: np.ndarray, mesh: Mesh,
                        axis: str = "b") -> jax.Array:
    """Assemble per-process blocks into one globally-sharded array.

    Every process passes its own (local_n, ...) block; the result is a
    global (sum local_n, ...) array sharded along ``axis`` that no
    single host ever materializes.  local_n must be divisible by the
    process's local device count.
    """
    spec = P(axis, *([None] * (local_block.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_block)


# ---------------------------------------------------------------------------
# distributed pipeline entries
# ---------------------------------------------------------------------------


def distributed_demodulate(local_block: np.ndarray, noise_mag: float,
                           mod_type: str, center: float, center_spacing: float,
                           bits_per_symbol: int, mesh: Mesh = None,
                           dtype=np.float32) -> tuple:
    """Sharded demod+symbolize over a process-spanning mesh.

    Each process contributes its locally-ingested block and receives
    back ONLY its local shards of (qad, states), as a list of
    (global_offset, numpy_block) pairs in index order.
    """
    from urh_tpu.core.iq import max_magnitude_for_dtype
    from urh_tpu.dsp.symbols import get_center_thresholds
    from urh_tpu.parallel.sharded import build_sharded_demod

    mesh = mesh if mesh is not None else global_mesh()
    local_block = np.ascontiguousarray(local_block, dtype=np.float32)

    x = make_global_capture(local_block, mesh)
    fn = build_sharded_demod(mesh, mod_type)
    thresholds = get_center_thresholds(center, center_spacing,
                                       2 ** bits_per_symbol)
    qad, states = fn(x, jnp.float32(noise_mag * noise_mag),
                     jnp.float32(max_magnitude_for_dtype(dtype)),
                     jnp.asarray(thresholds))
    return _local_shards(qad), _local_shards(states)


def _local_shards(arr: jax.Array) -> list:
    """[(global_offset, numpy block), ...] for this process, in order."""
    shards = sorted(arr.addressable_shards,
                    key=lambda s: (s.index[0].start or 0))
    return [((s.index[0].start or 0), np.asarray(s.data)) for s in shards]


def distributed_pulse_lens(local_block: np.ndarray, noise_mag: float,
                           mod_type: str, center: float, center_spacing: float,
                           bits_per_symbol: int, tolerance: int,
                           samples_per_symbol: int, mesh: Mesh = None,
                           dtype=np.float32) -> np.ndarray:
    """Full distributed front half: demod -> symbolize -> local runs ->
    global pulse list.

    Per-sample arrays stay sharded; each process reduces its shards to
    run lists and all-gathers only those (run lists are ~3 orders of
    magnitude smaller than the sample stream).  Every process returns
    the identical global pulse list.
    """
    from jax.experimental import multihost_utils

    from urh_tpu.dsp.demod import noise_sentinel
    from urh_tpu.dsp.symbols import (PAUSE_STATE, _initial_state,
                                     _run_length_encode,
                                     get_center_thresholds,
                                     pulse_lens_from_runs)

    mesh = mesh if mesh is not None else global_mesh()
    _, states_shards = distributed_demodulate(
        local_block, noise_mag, mod_type, center, center_spacing,
        bits_per_symbol, mesh=mesh, dtype=dtype)

    # local reduction: samples -> (state, start, length) runs
    local_runs = []
    for offset, block in states_shards:
        r_states, r_starts, r_lens = _run_length_encode(block)
        local_runs.append(np.column_stack(
            (r_states.astype(np.int64), r_starts + offset, r_lens)))
    local_runs = (np.concatenate(local_runs) if local_runs
                  else np.zeros((0, 3), dtype=np.int64))

    # exchange run lists (ragged): pad to the max count across processes
    count = np.array([len(local_runs)], dtype=np.int64)
    counts = multihost_utils.process_allgather(count).reshape(-1)
    max_count = int(counts.max()) if len(counts) else 0
    padded = np.full((max_count, 3), -1, dtype=np.int64)
    padded[: len(local_runs)] = local_runs
    gathered = multihost_utils.process_allgather(padded)
    gathered = gathered.reshape(-1, max_count, 3)

    rows = [gathered[p, : counts[p]] for p in range(len(counts))]
    all_runs = np.concatenate(rows) if rows else np.zeros((0, 3), np.int64)
    all_runs = all_runs[np.argsort(all_runs[:, 1], kind="stable")]

    # merge runs straddling process/shard boundaries
    r_states, r_starts, r_lens = _merge_adjacent_runs(all_runs)

    n = int((r_starts[-1] + r_lens[-1]) if len(r_starts) else 0)
    modulation_order = 2 ** bits_per_symbol
    sentinel = noise_sentinel(mod_type)
    thresholds = get_center_thresholds(center, center_spacing, modulation_order)
    first_state = r_states[0] if len(r_states) else PAUSE_STATE
    first_sample = sentinel if first_state == PAUSE_STATE else sentinel + 1.0
    initial = _initial_state(first_sample, thresholds, sentinel, modulation_order)

    return pulse_lens_from_runs(r_states, r_starts, r_lens, n, initial,
                                tolerance, mod_type == "ASK",
                                samples_per_symbol)


def _merge_adjacent_runs(runs: np.ndarray) -> tuple:
    """Fuse consecutive runs with equal state (shard boundary stitches)."""
    if len(runs) == 0:
        empty = np.zeros(0, dtype=np.int64)
        return empty, empty.copy(), empty.copy()
    states, starts, lens = runs[:, 0], runs[:, 1], runs[:, 2]
    new_group = np.ones(len(runs), dtype=bool)
    new_group[1:] = states[1:] != states[:-1]
    group_ids = np.cumsum(new_group) - 1
    g_states = states[new_group]
    g_starts = starts[new_group]
    g_lens = np.bincount(group_ids, weights=lens).astype(np.int64)
    return g_states, g_starts, g_lens


# ---------------------------------------------------------------------------
# cross-process FIR / STFT / exact PSK
# ---------------------------------------------------------------------------


def distributed_fir_filter(local_block: np.ndarray, taps, mesh: Mesh = None) -> list:
    """Causal FIR over the process-spanning mesh: the (n_taps - 1)-sample
    halos ride the mesh collectives (ICI within a slice, DCN across
    hosts); each process contributes its local block and receives back
    only its local filtered shards as (global_offset, block) pairs.

    Output equals filtering the unsharded stream (overlap-save halo,
    urh_tpu.parallel.sharded.build_sharded_fir)."""
    from urh_tpu.parallel.sharded import build_sharded_fir

    mesh = mesh if mesh is not None else global_mesh()
    x = np.ascontiguousarray(local_block, dtype=np.complex64)
    xg = make_global_capture(x, mesh)
    fn = build_sharded_fir(mesh, len(taps))
    out = fn(xg, jnp.asarray(np.asarray(taps, dtype=np.complex64)))
    return _local_shards(out)


def distributed_spectrogram(local_block: np.ndarray, window_size=1024,
                            overlap_factor=0.5, mesh: Mesh = None) -> list:
    """Frame-sharded STFT across processes: each shard pulls its
    (window - hop)-sample halo from the right neighbor over the mesh.
    Every process's local block length must be a multiple of
    local_device_count * hop.  Returns local (frame_offset, rows)
    shards."""
    from urh_tpu.parallel.sharded import build_sharded_stft

    mesh = mesh if mesh is not None else global_mesh()
    n_dev = mesh.devices.size
    hop = window_size - int(overlap_factor * window_size)

    x = np.ascontiguousarray(local_block, dtype=np.complex64)
    xg = make_global_capture(x, mesh)
    total = xg.shape[0]
    if total % (n_dev * hop) != 0:
        raise ValueError(
            f"global capture ({total}) must divide into {n_dev} shards of "
            f"whole {hop}-sample hops")
    frames_per_shard = total // (n_dev * hop)
    fn = build_sharded_stft(mesh, window_size, hop, frames_per_shard)
    return _local_shards(fn(xg))


def distributed_psk_demod_exact(local_block: np.ndarray, noise_mag: float,
                                mod_order: int = 2,
                                costas_loop_bandwidth: float = 0.1,
                                dtype=np.float32) -> tuple:
    """Bit-exact PSK across processes: chained Costas scans in global
    order, with only the 8-byte (phase, freq) loop state crossing
    process boundaries (one tiny allgather per process step).

    Returns (global_offset, local_qad) for this process; concatenating
    all processes' blocks equals afp_demod(full, noise, "PSK", order)
    bit for bit (the process-0 block carries the sample-0 sentinel)."""
    import math

    from jax.experimental import multihost_utils

    from urh_tpu.core.iq import normalize_scale_shift
    from urh_tpu.dsp.demod import (_COSTAS_INIT_PHASE, _costa_demod_scan,
                                   noise_sentinel)

    nproc = jax.process_count()
    pid = jax.process_index()
    x = np.ascontiguousarray(local_block, dtype=np.float32)

    counts = multihost_utils.process_allgather(
        np.array([len(x)], dtype=np.int64)).reshape(-1)
    offset = int(counts[:pid].sum())

    scale, shift = normalize_scale_shift(np.dtype(dtype))
    phase, freq = np.float32(_COSTAS_INIT_PHASE), np.float32(0.0)
    local_qad = np.zeros(len(x), dtype=np.float32)

    for p in range(nproc):
        if p == pid:
            body = x[1:] if pid == 0 else x  # afp_demod skips sample 0
            outs, ph, fr = _costa_demod_scan(
                jnp.asarray(body), jnp.float32(noise_mag * noise_mag),
                jnp.float32(scale), jnp.float32(shift), int(mod_order),
                jnp.float32(costas_loop_bandwidth),
                jnp.float32(math.sqrt(2.0) / 2.0),
                jnp.float32(phase), jnp.float32(freq))
            if pid == 0:
                local_qad[0] = noise_sentinel("PSK")
                local_qad[1:] = np.asarray(outs)
            else:
                local_qad[:] = np.asarray(outs)
            carry = np.array([ph, fr], dtype=np.float32)
        else:
            carry = np.zeros(2, dtype=np.float32)
        gathered = multihost_utils.process_allgather(carry).reshape(-1, 2)
        # everyone adopts the state left by the process that just ran, so
        # the next process in the chain starts from it
        phase, freq = np.float32(gathered[p][0]), np.float32(gathered[p][1])

    return offset, local_qad
