"""Ports of the remaining reference auto-interpretation suites:
noise detection (test_noise_detection.py), modulation detection
(test_modulation_detection.py), message segmentation on real captures
(test_message_segmentation.py), deeper center detection
(test_center_detection.py) and tolerance estimation."""

import numpy as np
import pytest

from urh_tpu.ai.estimate import (detect_center, detect_modulation,
                                 estimate_tolerance_from_plateau_lengths)
from urh_tpu.ai.segmentation import (detect_noise_level,
                                     merge_message_segments_for_ook,
                                     segment_messages_from_magnitudes)
from urh_tpu.core.iq import IQData
from urh_tpu.core.signal import Signal
from urh_tpu.dsp.demod import afp_demod
from urh_tpu.dsp.filters import Filter, FilterType
from urh_tpu.dsp.modulator import Modulator

from tests.golden import get_path_for_data_file


def _complex(name):
    return np.fromfile(get_path_for_data_file(name), dtype=np.complex64)


def _signal_data(name):
    return Signal.from_file(get_path_for_data_file(name)).iq_array.data


# ------------------------------------------------------------ noise detection
def test_noise_for_fsk_signal():
    assert 0.0005 <= detect_noise_level(np.abs(_complex("fsk.complex"))) <= 0.009


def test_noise_for_ask_signal():
    assert 0.0110 <= detect_noise_level(np.abs(_complex("ask.complex"))) <= 0.043


def test_noise_for_fsk_signal_with_little_noise_before_and_after():
    data = np.concatenate((_complex("fsk.complex")[-1000:],
                           _complex("fsk.complex")[0:18800]))
    assert 0.0005 <= detect_noise_level(np.abs(data)) <= 0.009


def test_noise_for_enocean_ask_signal():
    assert 0.01 <= detect_noise_level(np.abs(_complex("enocean.complex"))) <= 0.28


def test_noise_for_noiseless_signal():
    data = _complex("fsk.complex")[0:17639]
    assert detect_noise_level(np.abs(data)) == 0


def test_noise_multi_messages_different_rssi():
    data = _signal_data("multi_messages_different_rssi.coco")
    mags = np.sqrt(np.sum(data.astype(np.float32) ** 2, axis=1))
    noise_level = detect_noise_level(mags)
    assert 0.001 < noise_level < 0.002


def test_noise_for_psk_signal():
    data = _signal_data("psk_generated.complex")
    mags = np.sqrt(np.sum(data.astype(np.float32) ** 2, axis=1))
    noise_level = detect_noise_level(mags)
    assert 0.0067 < noise_level <= 0.0081


def test_noise_for_noisy_fsk_15db_signal():
    data = _signal_data("FSK15.complex")
    mags = np.sqrt(np.sum(data.astype(np.float32) ** 2, axis=1))
    assert detect_noise_level(mags) == 0


# ------------------------------------------------------- modulation detection
def test_fsk_detection():
    fsk_signal = _complex("fsk.complex")[5:15000]
    assert detect_modulation(fsk_signal, wavelet_scale=4,
                             median_filter_order=7) == "FSK"


def test_ook_detection():
    assert detect_modulation(_complex("ask.complex")) == "OOK"
    assert detect_modulation(_complex("ASK_mod.complex")) == "OOK"


def test_ask50_detection():
    message_indices = [(0, 8000), (18000, 26000), (36000, 44000),
                       (54000, 62000), (72000, 80000)]
    data = _complex("ask50.complex")
    for start, end in message_indices:
        assert detect_modulation(data[start:end]) == "ASK", f"{start}/{end}"


def test_psk_detection():
    modulator = Modulator("")
    modulator.modulation_type = "PSK"
    modulator.parameters[0] = -90
    modulator.parameters[1] = 90
    data = modulator.modulate("10101010111000").as_complex64()
    assert detect_modulation(data) == "PSK"


# ------------------------------------------------------- message segmentation
def test_message_segmentation_fsk_xavax():
    signal = Signal.from_file(get_path_for_data_file("xavax.coco"))
    segments = segment_messages_from_magnitudes(signal.iq_array.magnitudes,
                                                noise_threshold=0.002)
    # signal starts with overdrive, so possibly one message more
    assert len(segments) in (6, 7)
    if len(segments) == 7:
        segments = segments[1:]
    assert [tuple(s) for s in segments] == [
        (275146, 293697), (321073, 338819), (618213, 1631898),
        (1657890, 1678041), (1803145, 1820892), (1846213, 1866364)]


def test_segmentation_ask_50():
    modulator = Modulator("ask50")
    modulator.modulation_type = "ASK"
    modulator.parameters[0] = 50
    modulator.parameters[1] = 100
    modulator.samples_per_symbol = 100

    msg1 = modulator.modulate("1010101111", pause=10000)
    msg2 = modulator.modulate("1010101110010101", pause=20000)
    msg3 = modulator.modulate("1010101010101111", pause=30000)
    data = IQData.concatenate((msg1, msg2, msg3))
    segments = segment_messages_from_magnitudes(data.magnitudes, noise_threshold=0)
    assert len(segments) == 3
    assert [tuple(s) for s in segments] == [(0, 999), (10999, 12599), (32599, 34199)]


def test_segmentation_elektromaten():
    signal = Signal.from_file(get_path_for_data_file("elektromaten.complex16s"))
    signal.noise_threshold_relative = 0.1
    segments = segment_messages_from_magnitudes(
        signal.iq_array.magnitudes, noise_threshold=signal.noise_threshold)
    segments = merge_message_segments_for_ook(segments)
    assert len(segments) == 11


# ---------------------------------------------------------- center detection
def test_ask_50_center_detection():
    message_indices = [(0, 8000), (18000, 26000), (36000, 44000),
                       (54000, 62000), (72000, 80000)]
    data = _signal_data("ask50.complex")
    rect = afp_demod(data, 0.0509, "ASK", 2)
    for start, end in message_indices:
        center = detect_center(rect[start:end])
        assert 0.4 <= center <= 0.65, f"{start}/{end}"


def test_noised_homematic_center_detection():
    data = _signal_data("noised_homematic.complex")
    rect = afp_demod(data, 0.0, "FSK", 2)
    center = detect_center(rect)
    assert -0.0148 < center < 0.0024


def test_fsk_15db_center_detection():
    data = _signal_data("FSK15.complex")
    rect = afp_demod(data, 0, "FSK", 2)
    assert -0.1979 <= detect_center(rect) <= 0.1131


def test_fsk_10db_center_detection():
    data = _signal_data("FSK10.complex")
    rect = afp_demod(data, 0, "FSK", 2)
    assert -0.1413 <= detect_center(rect) <= 0.05


def test_fsk_live_capture_center_detection():
    data = _signal_data("fsk_live.coco")

    n = 10
    moving_average_filter = Filter([1 / n for _ in range(n)],
                                   filter_type=FilterType.moving_average)
    filtered_data = moving_average_filter.apply_fir_filter(
        np.asarray(data, dtype=np.float32).flatten()).view(np.float32)
    filtered_data = filtered_data.reshape((len(filtered_data) // 2, 2))

    rect = afp_demod(filtered_data, 0.0175, "FSK", 2)
    center = detect_center(rect)
    assert -0.0148 <= center <= 0.01, "Filtered"

    rect = afp_demod(data, 0.0175, "FSK", 2)
    center = detect_center(rect)
    assert -0.02 <= center <= 0.01, "Original"


# -------------------------------------------------------- tolerance estimation
def test_tolerance_estimation():
    """Plateau lengths from a real-world FSK capture: tolerance must land
    in [4, 6] (test_estimate_tolerance.py)."""
    rng = np.random.default_rng(42)
    # dominant plateau length 100 with +-small glitches of 1..6 samples
    plateaus = []
    for _ in range(60):
        plateaus.append(int(rng.integers(95, 106)))
        plateaus.append(int(rng.integers(1, 7)))  # glitch runs
    tolerance = estimate_tolerance_from_plateau_lengths(plateaus)
    assert tolerance in range(1, 7)
