"""Golden-data demodulation tests.

Mirrors the reference's correctness gates (tests/test_demodulations.py
in jopohl/urh): exact expected bitstreams for recorded captures plus
modulate->demodulate round trips.
"""

import numpy as np
import pytest

import urh_tpu as ut
from urh_tpu.core.iq import IQData
from urh_tpu.dsp.modulate import modulate

from tests.golden import get_path_for_data_file


def demod(sig):
    pa = ut.ProtocolAnalyzer(sig)
    pa.get_protocol_from_signal()
    return pa


def test_ask():
    sig = ut.Signal.from_file(get_path_for_data_file("ask.complex"))
    sig.modulation_type = "ASK"
    sig.samples_per_symbol = 295
    sig.center = 0.0219
    assert sig.num_samples == 13710
    pa = demod(sig)
    assert pa.plain_bits_str[0].startswith("1011001001011011011011011011011011001000000")


def test_ask_short():
    sig = ut.Signal.from_file(get_path_for_data_file("ask_short.complex"))
    sig.modulation_type = "ASK"
    sig.noise_threshold = 0.0299
    sig.samples_per_symbol = 16
    sig.center = 0.1300
    sig.tolerance = 0
    assert sig.num_samples == 131
    pa = demod(sig)
    assert pa.plain_bits_str[0] == "10101010"


def test_fsk():
    sig = ut.Signal.from_file(get_path_for_data_file("fsk.complex"))
    sig.modulation_type = "FSK"
    sig.samples_per_symbol = 100
    sig.center = 0
    pa = demod(sig)
    assert pa.plain_bits_str[0] == (
        "1010101010101010101010101010101011000110001001101100011000100110"
        "1111010011011100000111011001100011101110111101111010010000100111"
        "1001100110011100110100100011100111010011111100011"
    )


def test_fsk_short_bit_length():
    bits_str = "101010"
    bits = np.array(list(map(int, bits_str)), dtype=np.uint8)
    parameters = np.array([-10e3, 10e3], dtype=np.float32)
    result = modulate(bits, 8, "FSK", parameters, 1, 1, 40e3, 0, 1e6, 1000, 0)

    sig = ut.Signal.from_iq(IQData(result, skip_conversion=True))
    sig.noise_threshold = 0
    # no spikes: the FSK phase-correction cumsum keeps the phase continuous
    assert np.max(sig.qad) < 1

    sig.center = 0
    sig.samples_per_symbol = 8
    pa = demod(sig)
    assert pa.plain_bits_str[0] == bits_str


def test_psk():
    sig = ut.Signal.from_file(get_path_for_data_file("psk_gen_noisy.complex"))
    sig.modulation_type = "PSK"
    sig.samples_per_symbol = 300
    sig.center = 0
    sig.noise_threshold = 0
    sig.tolerance = 10
    pa = demod(sig)
    assert pa.plain_bits_str[0].startswith("1011"), pa.plain_bits_str[0]


def test_4_psk():
    bits = np.array([1, 0, 1, 0, 1, 0, 1, 0, 1, 1, 0, 0, 0, 1, 0, 1], dtype=np.uint8)
    angles_degree = [-135, -45, 45, 135]
    parameters = np.array([np.pi * a / 180 for a in angles_degree], dtype=np.float32)
    result = modulate(bits, 100, "PSK", parameters, 2, 1, 40e3, 0, 1e6, 1000, 0)

    sig = ut.Signal.from_iq(IQData(result, skip_conversion=True))
    sig.noise_threshold = 0
    sig.bits_per_symbol = 2
    sig.center = 0
    sig.center_spacing = 1
    sig.modulation_type = "PSK"
    pa = demod(sig)
    demod_bits = pa.plain_bits_str[0]
    assert len(demod_bits) == len(bits)
    assert demod_bits.startswith("10101010")

    np.random.seed(42)
    noised = result + 0.1 * np.random.normal(loc=0, scale=np.sqrt(2) / 2, size=(len(result), 2))
    sig = ut.Signal.from_iq(IQData(noised.astype(np.float32), skip_conversion=True))
    sig.bits_per_symbol = 2
    sig.modulation_type = "PSK"
    sig.center = 0
    sig.center_spacing = 1.5
    sig.noise_threshold = 0.2
    pa = demod(sig)
    demod_bits = pa.plain_bits_str[0]
    assert len(demod_bits) == len(bits)
    assert demod_bits.startswith("10101010")


def test_4_fsk():
    bits = np.array([1, 0, 1, 0, 1, 1, 0, 0, 0, 1], dtype=np.uint8)
    parameters = np.array([-20e3, -10e3, 10e3, 20e3], dtype=np.float32)
    result = modulate(bits, 100, "FSK", parameters, 2, 1, 40e3, 0, 1e6, 1000, 0)

    sig = ut.Signal.from_iq(IQData(result, skip_conversion=True))
    sig.noise_threshold = 0
    sig.bits_per_symbol = 2
    sig.center = 0
    sig.center_spacing = 0.1
    sig.modulation_type = "FSK"
    pa = demod(sig)
    assert pa.plain_bits_str[0] == "1010110001"
