"""Noise-floor estimation and power-gate message segmentation.

Equivalents of urh/ainterpretation/AutoInterpretation.py:60-148 and the
3-state hysteresis machine urh/cythonext/auto_interpretation.pyx:55-111.

The hysteresis segmentation is reformulated run-level (like the
symbolizer in urh_tpu.dsp.symbols): the machine changes state at the
10th consecutive sample of the opposite polarity, so transitions are
exactly the consecutively-deduplicated sequence of above/below runs of
length >= 10, and boundaries fall at ``run_start - 1``.
"""

from __future__ import annotations

import math

import numpy as np

OUTLIER_TOLERANCE = 10  # auto_interpretation.pyx:72


def max_without_outliers(data: np.ndarray, z=3):
    if len(data) == 0:
        return None
    return np.max(data[abs(data - np.mean(data)) <= z * np.std(data)])


def min_without_outliers(data: np.ndarray, z=2):
    if len(data) == 0:
        return None
    return np.min(data[abs(data - np.mean(data)) <= z * np.std(data)])


def detect_noise_level(magnitudes: np.ndarray) -> float:
    """Noise floor from 1%-chunk means (AutoInterpretation.py:60-91)."""
    if len(magnitudes) <= 3:
        return 0

    chunksize_percent = 1
    chunksize = max(1, int(len(magnitudes) * chunksize_percent / 100))

    chunks = [
        magnitudes[i - chunksize : i]
        for i in range(len(magnitudes), 0, -chunksize)
        if i - chunksize >= 0
    ]
    mean_values = np.fromiter(
        (np.mean(chunk) for chunk in chunks), dtype=np.float32, count=len(chunks)
    )
    if len(mean_values) == 0:
        return 0
    minimum, maximum = float(np.min(mean_values)), float(np.max(mean_values))
    if maximum == 0 or minimum / maximum > 0.9:
        # chunk means are close together -> probably no noise present
        return 0

    indices = np.nonzero(mean_values <= 1.1 * np.min(mean_values))[0]
    try:
        result = np.max([np.max(chunks[i]) for i in indices if len(chunks[i]) > 0])
    except ValueError:
        return 0

    return math.ceil(result * 10000) / 10000


def segment_messages_from_magnitudes(magnitudes: np.ndarray, noise_threshold: float) -> list:
    """[(start, end), ...] message ranges (auto_interpretation.pyx:55-111)."""
    n = len(magnitudes)
    if n == 0:
        return []

    above = np.asarray(magnitudes) > noise_threshold
    state = 1 if above[0] else -1

    # run-length encode the above/below sequence
    change = np.flatnonzero(above[1:] != above[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    lens = ends - starts
    polarity = np.where(above[starts], 1, -1)

    long_mask = lens >= OUTLIER_TOLERANCE
    l_pol = polarity[long_mask]
    l_starts = starts[long_mask]

    # dedup consecutive polarities; drop leading group equal to initial state
    if len(l_pol):
        keep = np.ones(len(l_pol), dtype=bool)
        keep[1:] = l_pol[1:] != l_pol[:-1]
        l_pol = l_pol[keep]
        l_starts = l_starts[keep]
        if l_pol[0] == state:
            l_pol = l_pol[1:]
            l_starts = l_starts[1:]

    result = []
    cur_start = 0
    cur_state = state
    for pol, rs in zip(l_pol, l_starts):
        if cur_state == 1:
            # 1 -> -1 at the 10th below sample: end = run_start - 1
            result.append((cur_start, rs - 1))
            cur_state = -1
        else:
            # -1 -> 1: start = run_start - 1
            cur_start = rs - 1
            cur_state = 1

    if cur_state == 1:
        # trailing below-run (shorter than tolerance, else we'd have flipped)
        conseq_below = int(lens[-1]) if polarity[-1] == -1 else 0
        if cur_start < n - conseq_below:
            result.append((cur_start, n - conseq_below))

    return result


def merge_message_segments_for_ook(segments: list) -> list:
    """Merge OOK pulse groups separated by short pauses
    (AutoInterpretation.py:107-148)."""
    if len(segments) <= 1:
        return segments

    pauses = np.fromiter(
        (segments[i + 1][0] - segments[i][1] for i in range(len(segments) - 1)),
        count=len(segments) - 1,
        dtype=np.uint64,
    )
    pulses = np.fromiter(
        (seg[1] - seg[0] for seg in segments),
        count=len(segments),
        dtype=np.uint64,
    )

    min_pulse_length = min_without_outliers(pulses, z=1)
    large_pause_indices = np.nonzero(pauses >= 8 * min_pulse_length)[0]

    result = []
    for i in range(0, len(large_pause_indices) + 1):
        if i == 0:
            start = 0
            end = large_pause_indices[i] + 1 if len(large_pause_indices) >= 1 else len(segments)
        elif i == len(large_pause_indices):
            start, end = large_pause_indices[i - 1] + 1, len(segments)
        else:
            start, end = large_pause_indices[i - 1] + 1, large_pause_indices[i] + 1

        msg_begin = segments[start][0]
        msg_length = sum(segments[j][1] - segments[j][0] for j in range(start, end))
        msg_length += sum(segments[j][0] - segments[j - 1][1] for j in range(start + 1, end))
        result.append((msg_begin, msg_begin + msg_length))

    return result
