"""Headless port of reference tests/test_spectrogram.py::
test_channel_separation_with_negative_frequency: select a frequency band
in the 1024-bin spectrogram view, bandpass-filter it into a new signal,
and demodulate one clean channel out of three overlapping transmissions."""

import pytest

from urh_tpu import DemodParams, ProtocolAnalyzer, Signal
from urh_tpu.dsp.filters import Filter

from tests.golden import REF_DATA, get_path_for_data_file

WINDOW = 1024  # spectrogram scene height (freq bins)


def extract_channel(signal, bin_start, bin_end, target_bits, center):
    # SpectrogramGraphicView.__get_freqs with scene y growing upwards:
    # bin WINDOW/2 is DC, larger bins are positive frequencies
    f_low = (bin_start - WINDOW / 2) / WINDOW
    f_high = (bin_end - WINDOW / 2) / WINDOW
    filtered = Filter.apply_bandpass_filter(
        signal.iq_array.as_complex64(), f_low, f_high, filter_bw=0.08)

    new_signal = Signal.from_samples(filtered, "filtered", signal.sample_rate)
    new_signal.params = DemodParams(modulation="ASK", samples_per_symbol=100,
                                    center=center, noise_threshold=0)
    pa = ProtocolAnalyzer(new_signal)
    pa.get_protocol_from_signal()
    assert len(pa.plain_bits_str) == 1
    assert pa.plain_bits_str[0] == target_bits


@pytest.mark.skipif(REF_DATA is None, reason="reference test data not available")
def test_channel_separation_with_negative_frequency():
    signal = Signal.from_file(get_path_for_data_file("three_channels.complex"))
    signal.params.noise_threshold = 0
    assert signal.num_samples == 800

    extract_channel(signal, 650, 850, "11001101", center=0.1)
    extract_channel(signal, 500, 620, "10101001", center=0.1)
    extract_channel(signal, 217, 324, "10010111", center=0.1)
