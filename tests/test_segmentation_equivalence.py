"""Equivalence of the run-level message segmentation with the reference's
per-sample hysteresis machine (auto_interpretation.pyx:55-111)."""

import numpy as np

from urh_tpu.ai.segmentation import segment_messages_from_magnitudes


def oracle_segment(magnitudes, noise_threshold):
    result = []
    if len(magnitudes) == 0:
        return []
    N = len(magnitudes)
    start = 0
    outlier_tolerance = 10
    conseq_above = conseq_below = 0
    state = 1 if magnitudes[0] > noise_threshold else -1

    for i in range(N):
        is_above_noise = magnitudes[i] > noise_threshold
        if state == 1:
            if is_above_noise:
                conseq_below = 0
            else:
                conseq_below += 1
        elif state == -1:
            if is_above_noise:
                conseq_above += 1
            else:
                conseq_above = 0

        if state == 1 and conseq_below >= outlier_tolerance:
            state = -1
            result.append((start, i - conseq_below))
            conseq_below = conseq_above = 0
        elif state == -1 and conseq_above >= outlier_tolerance:
            state = 1
            start = i - conseq_above
            conseq_below = conseq_above = 0

    if state == 1 and start < N - conseq_below:
        result.append((start, N - conseq_below))

    return result


def test_fuzz_equivalence():
    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(1, 3000))
        # blocky signal with noise plateaus and glitches
        mags = np.abs(rng.normal(0.02, 0.01, n))
        nblocks = int(rng.integers(0, 6))
        for _ in range(nblocks):
            s = int(rng.integers(0, n))
            e = min(n, s + int(rng.integers(5, 400)))
            mags[s:e] += rng.uniform(0.2, 1.0)
        # sprinkle dropouts within messages
        drop = rng.random(n) < 0.02
        mags[drop] *= 0.01
        threshold = 0.1
        assert segment_messages_from_magnitudes(mags, threshold) == oracle_segment(mags, threshold), (
            f"trial {trial}"
        )


def test_edges():
    assert segment_messages_from_magnitudes(np.zeros(0), 0.1) == []
    ones = np.ones(50)
    assert segment_messages_from_magnitudes(ones, 0.1) == oracle_segment(ones, 0.1)
    zeros = np.zeros(50)
    assert segment_messages_from_magnitudes(zeros, 0.1) == oracle_segment(zeros, 0.1)
    # message ending exactly at the array end
    sig = np.concatenate([np.zeros(30), np.ones(40)])
    assert segment_messages_from_magnitudes(sig, 0.1) == oracle_segment(sig, 0.1)
    # trailing short noise
    sig = np.concatenate([np.ones(40), np.zeros(5)])
    assert segment_messages_from_magnitudes(sig, 0.1) == oracle_segment(sig, 0.1)
