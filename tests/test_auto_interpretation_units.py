"""Auto-interpretation unit tests (ports of the reference's
tests/auto_interpretation/ per-area files)."""

import numpy as np

import urh_tpu as ut
from urh_tpu.ai import estimate as AutoInterpretation
from urh_tpu.ai.estimate import detect_center
from urh_tpu.ai.segmentation import segment_messages_from_magnitudes
from urh_tpu.dsp.demod import afp_demod
from urh_tpu.dsp.filters import Filter, FilterType

from tests.golden import get_path_for_data_file


def _run_merge(data):
    return list(AutoInterpretation.merge_plateau_lengths(np.array(data, dtype=np.uint64)))


def test_merge_plateau_lengths():
    assert AutoInterpretation.merge_plateau_lengths([]) == []
    assert AutoInterpretation.merge_plateau_lengths([42]) == [42]
    assert AutoInterpretation.merge_plateau_lengths([100, 100, 100]) == [100, 100, 100]
    assert _run_merge([100, 49, 1, 50, 100]) == [100, 100, 100]
    assert _run_merge([100, 48, 2, 50, 100]) == [100, 100, 100]
    assert _run_merge([100, 100, 67, 1, 10, 1, 21]) == [100, 100, 100]
    assert _run_merge([100, 100, 67, 1, 10, 1, 21, 100, 50, 1, 49]) == [100, 100, 100, 100, 100]


def test_estimate_tolerance_from_plateau_lengths():
    f = AutoInterpretation.estimate_tolerance_from_plateau_lengths
    assert f([]) is None
    assert f([10]) is None
    assert f([100, 49, 1, 50, 100]) == 1
    assert f([100, 49, 2, 50, 100]) == 2
    assert f([100, 49, 2, 50, 100, 1]) == 2
    assert f([8, 8, 6, 1, 1]) == 1


def test_tolerant_greatest_common_divisor():
    f = AutoInterpretation.get_tolerant_greatest_common_divisor
    assert f([]) == 1
    assert f([22]) == 1
    assert f([10, 5, 5]) == 5
    assert f([100, 100, 100]) == 100
    assert f([100, 100, 200, 300, 100, 400]) == 100
    assert f([100, 101, 100, 100]) == 100
    assert f([100, 101, 202, 301, 100, 500]) == 100


def test_get_bit_length_from_plateau_lengths_basic():
    assert AutoInterpretation.get_bit_length_from_plateau_lengths([]) == 0
    assert AutoInterpretation.get_bit_length_from_plateau_lengths([42]) == 42


# ---------------------------------------------------------------------------
# center detection (test_center_detection.py ports)
# ---------------------------------------------------------------------------


def test_center_noiseless_rect():
    def generate_rect(bits: str, bit_len: int):
        result = np.zeros(len(bits) * bit_len, dtype=np.float32)
        for i, bit in enumerate(bits):
            if int(bit) != 0:
                result[i * bit_len : (i + 1) * bit_len] = 1
        return result

    rect = generate_rect("101010111100011", bit_len=10)
    center = detect_center(rect)
    assert 0.4 <= center <= 0.6


def test_center_noisy_rect():
    data = ut.Signal.from_file(get_path_for_data_file("fsk.complex")).iq_array.data
    rect = afp_demod(data, 0.008, "FSK", 2)[5:15000]
    center = detect_center(rect)
    assert -0.0587 <= center <= 0.02


def test_center_ask():
    data = ut.Signal.from_file(get_path_for_data_file("ask.complex")).iq_array.data
    rect = afp_demod(data, 0.01111, "ASK", 2)
    center = detect_center(rect)
    assert 0 <= center <= 0.06


def test_center_enocean():
    data = ut.Signal.from_file(get_path_for_data_file("enocean.complex")).iq_array.data
    rect = afp_demod(data, 0.05, "ASK", 2)
    for i, msg in enumerate([rect[2107:5432], rect[20428:23758], rect[44216:47546]]):
        center = detect_center(msg)
        assert 0.04 <= center <= 0.072, str(i)


def test_center_homematic():
    data = ut.Signal.from_file(get_path_for_data_file("homematic.complex32s")).iq_array.data
    rect = afp_demod(data, 0.0012, "FSK", 2)
    center1 = detect_center(rect[17719:37861])
    assert -0.1285 <= center1 <= -0.0413
    center2 = detect_center(rect[70412:99385])
    assert -0.1377 <= center2 <= -0.0367


def test_center_fsk_snr():
    data = ut.Signal.from_file(get_path_for_data_file("FSK15.complex")).iq_array.data
    center = detect_center(afp_demod(data, 0, "FSK", 2))
    assert -0.1979 <= center <= 0.1131

    data = ut.Signal.from_file(get_path_for_data_file("FSK10.complex")).iq_array.data
    center = detect_center(afp_demod(data, 0, "FSK", 2))
    assert -0.1413 <= center <= 0.05


# ---------------------------------------------------------------------------
# segmentation (test_message_segmentation.py port)
# ---------------------------------------------------------------------------


def test_segmentation_for_fsk():
    signal = np.fromfile(get_path_for_data_file("fsk.complex"), dtype=np.complex64)
    segments = segment_messages_from_magnitudes(np.abs(signal), 0.0009)
    assert len(segments) == 1
    assert tuple(segments[0]) == (0, 17742)


def test_segmentation_for_ask():
    from urh_tpu.ai.segmentation import merge_message_segments_for_ook

    signal = np.fromfile(get_path_for_data_file("ask.complex"), dtype=np.complex64)
    segments = segment_messages_from_magnitudes(np.abs(signal), 0.02)
    segments = merge_message_segments_for_ook(segments)
    assert len(segments) == 1
    assert tuple(segments[0]) == (462, 12011)


def test_segmentation_enocean_multiple_messages():
    from urh_tpu.ai.segmentation import merge_message_segments_for_ook

    signal = np.fromfile(get_path_for_data_file("enocean.complex"), dtype=np.complex64)
    segments = segment_messages_from_magnitudes(np.abs(signal), 0.0448)
    segments = merge_message_segments_for_ook(segments)
    assert len(segments) == 3
    assert tuple(segments[0]) == (2107, 5432)
    assert tuple(segments[1]) == (20428, 23758)
    assert tuple(segments[2]) == (44216, 47546)
