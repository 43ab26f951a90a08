"""Worker process for the 2-process distributed tests.

Launched as: python distributed_worker.py <port> <process_id> <capture>

Joins a 2-process jax.distributed runtime (2 virtual CPU devices per
process -> a 4-device global mesh), ingests ONLY its half of the golden
capture, runs the distributed demod -> runs -> pulse pipeline, and
asserts the result equals the single-host reference bit for bit.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    port, process_id, capture = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    from urh_tpu.parallel import distributed as dist

    dist.initialize("localhost:" + port, num_processes=2, process_id=process_id)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    total = os.path.getsize(capture) // (4 * 2)  # float32 I/Q frames
    total -= total % 4  # even shards on the 4-device mesh

    # per-host ingest: this process touches only its own byte range
    local = dist.read_capture_slice(capture, np.float32, total_samples=total)

    from urh_tpu.ai.segmentation import detect_noise_level
    from urh_tpu.dsp.demod import afp_demod
    from urh_tpu.dsp.symbols import grab_pulse_lens

    full = np.array(np.memmap(capture, np.float32, mode="r", shape=(total, 2)))
    noise = detect_noise_level(np.sqrt(full[:, 0] ** 2 + full[:, 1] ** 2))

    pulses = dist.distributed_pulse_lens(
        local, noise, "FSK", center=0.0, center_spacing=1.0,
        bits_per_symbol=1, tolerance=5, samples_per_symbol=100)

    reference = grab_pulse_lens(afp_demod(full, noise, "FSK", 2),
                                0.0, 5, "FSK", 100)
    assert np.array_equal(pulses, reference), (
        f"process {process_id}: distributed pulses diverge\n"
        f"got {pulses[:5]}...\nexp {reference[:5]}...")

    # the demod shards a process holds must cover exactly its mesh share
    qad_shards, _ = dist.distributed_demodulate(
        local, noise, "FSK", 0.0, 1.0, 1)
    ref_qad = afp_demod(full, noise, "FSK", 2)
    for offset, block in qad_shards:
        np.testing.assert_array_equal(block, ref_qad[offset : offset + len(block)])

    print(f"WORKER{process_id} OK", flush=True)


if __name__ == "__main__":
    main()
