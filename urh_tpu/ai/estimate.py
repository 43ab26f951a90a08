"""Automatic modulation-parameter estimation.

Counterpart of urh/ainterpretation/AutoInterpretation.py:151-471:
``estimate(iq)`` returns ``{modulation_type, bit_length, center,
tolerance, noise}``.  Modulation classification uses Haar-CWT variance
heuristics plus FFT peak counting; center detection uses a histogram of
the rectangular signal; bit length uses plateau merging plus a
threshold-divisor histogram vote.
"""

from __future__ import annotations

import itertools
import math
from collections import Counter

import numpy as np

from urh_tpu.ai import kernels as _k
from urh_tpu.ai import wavelet as _wavelet
from urh_tpu.ai.segmentation import (
    detect_noise_level,
    max_without_outliers,
    merge_message_segments_for_ook,
    min_without_outliers,
    segment_messages_from_magnitudes,
)
from urh_tpu.core.iq import IQData
from urh_tpu.dsp import demod as _demod


def get_most_frequent_value(values: list):
    """Most frequent value; ties resolve to the maximum among the most
    frequent (AutoInterpretation.py:28-47)."""
    if len(values) == 0:
        return None
    most_common = Counter(values).most_common()
    result, max_count = most_common[0]
    for value, count in most_common:
        if count < max_count:
            return result
        result = value
    return result


def most_common(values: list):
    """Most common value; ties resolve to first appearance."""
    counter = Counter(values)
    return max(values, key=counter.get)


def detect_modulation(data: np.ndarray, wavelet_scale=4, median_filter_order=11):
    n_data = len(data)
    data = data[np.abs(data) > 0]
    if len(data) == 0:
        return None
    if n_data - len(data) > 3:
        return "OOK"

    data = data / np.abs(np.max(data))
    mag_wavlt = np.abs(_wavelet.cwt_haar(data, scale=wavelet_scale))
    if len(mag_wavlt) == 0:
        return None

    norm_mag_wavlt = np.abs(_wavelet.cwt_haar(data / np.abs(data), scale=wavelet_scale))

    var_mag = np.var(mag_wavlt)
    var_norm_mag = np.var(norm_mag_wavlt)
    var_filtered_mag = np.var(_k.median_filter(mag_wavlt, k=median_filter_order))
    var_filtered_norm_mag = np.var(_k.median_filter(norm_mag_wavlt, k=median_filter_order))

    if all(v < 0.15 for v in (var_mag, var_norm_mag, var_filtered_mag, var_filtered_norm_mag)):
        return "OOK"

    if var_mag > 1.5 * var_norm_mag:
        return "ASK"
    # FSK or PSK
    if var_mag > 10 * var_filtered_mag:
        return "PSK"
    # distinguish FSK from a single OOK pulse: FSK has >= 2 FFT peaks
    fft = np.fft.fft(data[0 : 2 ** int(np.log2(len(data)))])
    fft = np.abs(np.fft.fftshift(fft))
    ten_greatest_indices = np.argsort(fft)[::-1][0:10]
    greatest_index = ten_greatest_indices[0]
    min_distance = 10
    min_freq = 100  # noise frequency amplitude scale

    if any(
        abs(i - greatest_index) >= min_distance and fft[i] >= min_freq
        for i in ten_greatest_indices
    ):
        return "FSK"
    return "OOK"


def detect_modulation_for_messages(iq_data: IQData, message_indices: list):
    max_messages = 100
    modulations = []
    data = iq_data.as_complex64()
    for start, end in message_indices[0:max_messages]:
        mod = detect_modulation(data[start:end])
        if mod is not None:
            modulations.append(mod)
    if len(modulations) == 0:
        return None
    return most_common(modulations)


def detect_center(rectangular_signal: np.ndarray, max_size=None):
    rect = rectangular_signal[rectangular_signal > -4]  # drop noise sentinel

    # ignore first/last 5% (overshoot at message edges)
    rect = rect[int(0.05 * len(rect)) : int(0.95 * len(rect))]
    if max_size is not None and len(rect) > max_size:
        rect = rect[0:max_size]
    if len(rect) == 0:
        return None

    hist_min, hist_max = float(np.min(rect)), float(np.max(rect))
    hist_step = float(np.var(rect))

    try:
        y, x = np.histogram(rect, bins=np.arange(hist_min, hist_max + hist_step, hist_step))
    except (ZeroDivisionError, ValueError, MemoryError):
        # zero-variance segment (constant line): no center to find
        return None

    num_values = 2
    most_common_levels = []
    window_size = max(2, int(0.05 * len(y)) + 1)

    def get_elem(arr, index, default):
        if 0 <= index < len(arr):
            return arr[index]
        return default

    for index in np.argsort(y)[::-1]:
        if all(
            y[index] > get_elem(y, index + i, 0) and y[index] > get_elem(y, index - i, 0)
            for i in range(1, window_size)
        ):
            most_common_levels.append(x[index])
        if len(most_common_levels) == num_values:
            break

    if len(most_common_levels) == 0:
        return None
    return np.mean(most_common_levels)


def estimate_tolerance_from_plateau_lengths(plateau_lengths, relative_max=0.05):
    if len(plateau_lengths) <= 1:
        return None
    unique = np.unique(plateau_lengths)
    maximum = max_without_outliers(unique, z=2)

    limit = relative_max * maximum
    if unique[0] > 1 and unique[0] >= limit:
        return 0

    result = 0
    for value in unique:
        if value > 1 and value >= limit:
            break
        result = value
    return result


def merge_plateau_lengths(plateau_lengths, tolerance=None):
    if tolerance is None:
        tolerance = estimate_tolerance_from_plateau_lengths(plateau_lengths)
    if tolerance == 0 or tolerance is None:
        return plateau_lengths
    return _k.merge_plateaus(plateau_lengths, tolerance, max_count=10000)


def round_plateau_lengths(plateau_lengths):
    """Round lengths to the leading digit count of the median value,
    e.g. 99 -> 100, 293 -> 300 (AutoInterpretation.py:313-326)."""
    digit_counts = [len(str(p)) for p in plateau_lengths]
    n_digits = min(3, int(np.percentile(digit_counts, 50)))
    f = 10 ** (n_digits - 1)
    for i, plateau_len in enumerate(plateau_lengths):
        plateau_lengths[i] = int(round(plateau_len / f)) * f


def get_tolerant_greatest_common_divisor(numbers):
    gcd = math.gcd
    gcds = [gcd(x, y) for x, y in itertools.combinations(numbers, 2) if gcd(x, y) != 1]
    if len(gcds) == 0:
        return 1
    return get_most_frequent_value(gcds)


def get_bit_length_from_plateau_lengths(merged_plateau_lengths) -> int:
    if len(merged_plateau_lengths) == 0:
        return 0
    if len(merged_plateau_lengths) == 1:
        return int(merged_plateau_lengths[0])

    merged_plateau_lengths = np.array(merged_plateau_lengths, dtype=np.uint64)
    round_plateau_lengths(merged_plateau_lengths)
    histogram = _k.get_threshold_divisor_histogram(merged_plateau_lengths)

    if len(histogram) == 0:
        return 0
    # argmax alone could be a multiple of the true bit length
    sorted_indices = np.argsort(histogram)[::-1]
    max_count = histogram[sorted_indices[0]]
    result = sorted_indices[0]
    for i in range(1, len(sorted_indices)):
        if histogram[sorted_indices[i]] < 0.25 * max_count:
            break
        if sorted_indices[i] <= 0.5 * result:
            result = sorted_indices[i]
    return int(result)


def estimate(iq_array, noise: float = None, modulation: str = None) -> dict:
    if isinstance(iq_array, np.ndarray):
        iq_array = IQData(iq_array)

    magnitudes = iq_array.magnitudes
    noise = detect_noise_level(magnitudes) if noise is None else noise

    message_indices = segment_messages_from_magnitudes(magnitudes, noise_threshold=noise)

    modulation = (
        detect_modulation_for_messages(iq_array, message_indices)
        if modulation is None
        else modulation
    )
    if modulation is None:
        return None

    if modulation == "OOK":
        message_indices = merge_message_segments_for_ook(message_indices)

    demod_mod = "ASK" if modulation in ("OOK", "ASK") else modulation
    if demod_mod not in ("ASK", "FSK", "PSK"):
        raise ValueError("unsupported modulation")
    data = _demod.afp_demod(iq_array.data, noise, demod_mod, 2)

    centers = []
    bit_lengths = []
    tolerances = []
    for start, end in message_indices:
        msg_rect_data = data[start:end]

        center = detect_center(msg_rect_data)
        if center is None:
            continue

        plateau_lengths = _k.get_plateau_lengths(msg_rect_data, center, percentage=25)
        tolerance = estimate_tolerance_from_plateau_lengths(plateau_lengths)
        if tolerance is None:
            tolerance = 0
        else:
            tolerances.append(tolerance)

        merged_lengths = merge_plateau_lengths(plateau_lengths, tolerance=tolerance)
        if len(merged_lengths) < 2:
            continue

        bit_length = get_bit_length_from_plateau_lengths(merged_lengths)
        min_bit_length = tolerance + 1
        if bit_length > min_bit_length:
            centers.append(center)
            bit_lengths.append(bit_length)

    if modulation in ("OOK", "ASK"):
        # ASK center tends toward the minimum of found centers
        center = min_without_outliers(np.array(centers), z=2)
        if center is None:
            return None
    elif len(centers) > 0:
        center = np.mean(centers)
    else:
        return None

    bit_length = get_most_frequent_value(bit_lengths)
    if bit_length is None:
        return None

    if len(tolerances):
        tolerance = np.percentile(tolerances, 50)
    else:
        tolerance = max(1, int(0.05 * bit_length))

    return {
        "modulation_type": "ASK" if modulation == "OOK" else modulation,
        "bit_length": bit_length,
        "center": center,
        "tolerance": int(tolerance),
        "noise": noise,
    }
