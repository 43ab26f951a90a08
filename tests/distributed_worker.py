"""Worker process for the multi-process distributed tests.

Launched as:
    python distributed_worker.py <port> <process_id> <capture> [mode] [nproc]

Joins an ``nproc``-process jax.distributed runtime (2 virtual CPU
devices per process), ingests ONLY its slice of the golden capture, and
runs the distributed pipelines against single-host references:

mode "full" (default): demod / pulse-lens bit equality, chained-Costas
PSK bit equality, FIR and STFT halo-exchange equality — all with the
halos crossing the process boundary.

mode "scaling": times the full distributed demod->runs->pulses pipeline
over a tiled capture and prints ``SCALING_MSPS <x>`` for the scaling-
efficiency table.
"""

import os
import sys
import time

# Keep the TOTAL device count fixed at 4 regardless of process count, so
# 1-process vs 2-process runs compare distribution overhead, not device
# count (argv: port, pid, capture, mode, nproc).
_NPROC = int(sys.argv[5]) if len(sys.argv) > 5 else 2
_DEVICES_PER_PROCESS = max(1, 4 // _NPROC)
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={_DEVICES_PER_PROCESS}")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def check_full(dist, full, local, noise):
    from urh_tpu.dsp.demod import afp_demod
    from urh_tpu.dsp.symbols import grab_pulse_lens

    pid = jax.process_index()

    # demod -> runs -> pulses, bit-identical to single-host
    pulses = dist.distributed_pulse_lens(
        local, noise, "FSK", center=0.0, center_spacing=1.0,
        bits_per_symbol=1, tolerance=5, samples_per_symbol=100)
    reference = grab_pulse_lens(afp_demod(full, noise, "FSK", 2),
                                0.0, 5, "FSK", 100)
    assert np.array_equal(pulses, reference), (
        f"process {pid}: distributed pulses diverge\n"
        f"got {pulses[:5]}...\nexp {reference[:5]}...")

    # per-shard demod coverage: bit-level decisions (noise-gate sentinel
    # placement) must agree exactly; the real-valued qad may differ from
    # the single-jit reference by atan2 ULP because shard_map and plain
    # jit compile to different fusions — so use the same atol convention
    # as the FIR/STFT checks below, not float equality.
    qad_shards, _ = dist.distributed_demodulate(
        local, noise, "FSK", 0.0, 1.0, 1)
    ref_qad = afp_demod(full, noise, "FSK", 2)
    for offset, block in qad_shards:
        ref = ref_qad[offset:offset + len(block)]
        np.testing.assert_array_equal(block == -4.0, ref == -4.0)
        np.testing.assert_allclose(block, ref, atol=1e-6)

    # chained Costas across the process boundary: gate decisions exact,
    # values within ULP tolerance (same convention as the qad check)
    offset, psk_local = dist.distributed_psk_demod_exact(local, noise, 2)
    ref_psk = afp_demod(full, noise, "PSK", 2)
    ref_slice = ref_psk[offset:offset + len(psk_local)]
    np.testing.assert_array_equal(psk_local == -4.0, ref_slice == -4.0)
    np.testing.assert_allclose(psk_local, ref_slice, atol=1e-6)

    # FIR with the (taps-1)-sample halo crossing processes
    rng = np.random.default_rng(11)
    taps = (rng.normal(size=9) + 1j * rng.normal(size=9)).astype(np.complex64)
    full_cx = (full[:, 0] + 1j * full[:, 1]).astype(np.complex64)
    local_cx = (local[:, 0] + 1j * local[:, 1]).astype(np.complex64)
    ref_fir = np.convolve(full_cx, taps)[:len(full_cx)].astype(np.complex64)
    for off, block in dist.distributed_fir_filter(local_cx, taps):
        np.testing.assert_allclose(block, ref_fir[off:off + len(block)],
                                   atol=2e-4)

    # frame-sharded STFT with the overlap halo crossing processes
    window, hop = 64, 32
    rows = dist.distributed_spectrogram(local_cx, window_size=window,
                                        overlap_factor=0.5)
    win = np.hanning(window)
    padded = np.concatenate(
        (full_cx, np.zeros(window - hop, np.complex64)))
    for frame_off, block in rows:
        for k, frame in enumerate(block):
            a = (frame_off + k) * hop
            expected = np.fft.fft(padded[a:a + window] * win) / window
            np.testing.assert_allclose(frame, expected, atol=2e-4)


def run_scaling(dist, full, noise, nproc):
    tiled = np.tile(full, (192, 1))
    total = len(tiled) - len(tiled) % len(jax.devices())
    start, end = dist.process_slice(total)
    local = np.ascontiguousarray(tiled[start:end])

    def run():
        return dist.distributed_pulse_lens(
            local, noise, "FSK", center=0.0, center_spacing=1.0,
            bits_per_symbol=1, tolerance=5, samples_per_symbol=100)

    run()  # warm compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    msps = total / sorted(times)[1] / 1e6
    print(f"SCALING_MSPS {msps:.2f}", flush=True)


def main():
    port, process_id, capture = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "full"
    nproc = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    from urh_tpu.parallel import distributed as dist

    dist.initialize("localhost:" + port, num_processes=nproc,
                    process_id=process_id)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == _DEVICES_PER_PROCESS * nproc

    total = os.path.getsize(capture) // (4 * 2)  # float32 I/Q frames
    # whole shards on every device; STFT additionally needs whole hops
    total -= total % (32 * len(jax.devices()))

    full = np.array(np.memmap(capture, np.float32, mode="r").reshape(-1, 2)[:total])

    from urh_tpu.ai.segmentation import detect_noise_level

    noise = detect_noise_level(np.sqrt(full[:, 0] ** 2 + full[:, 1] ** 2))

    if mode == "scaling":
        run_scaling(dist, full, noise, nproc)
    else:
        # per-host ingest: this process touches only its own byte range
        local = dist.read_capture_slice(capture, np.float32,
                                        total_samples=total)
        check_full(dist, full, local, noise)

    print(f"WORKER{process_id} OK", flush=True)


if __name__ == "__main__":
    main()
