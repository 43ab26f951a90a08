"""Full auto-interpretation pipeline on real captures (mirrors the
reference's tests/auto_interpretation/test_auto_interpretation_integration.py)."""

import numpy as np

import urh_tpu as ut
from urh_tpu.ai.estimate import estimate
from urh_tpu.coding.encodings import Encoding, DECODING_ENOCEAN
from urh_tpu.core.iq import IQData

from tests.golden import get_path_for_data_file


def demodulate(signal_data, mod_type, bit_length, center, noise, tolerance,
               decoding=None, pause_threshold=8):
    if isinstance(signal_data, IQData):
        iq = signal_data
    elif signal_data.dtype == np.complex64:
        iq = IQData(signal_data.view(np.float32))
    else:
        iq = IQData(signal_data)

    sig = ut.Signal.from_iq(iq)
    sig.modulation_type = mod_type
    sig.samples_per_symbol = bit_length
    sig.center = center
    sig.noise_threshold = noise
    sig.pause_threshold = pause_threshold
    if tolerance is not None:
        sig.tolerance = tolerance

    pa = ut.ProtocolAnalyzer(sig)
    if decoding is not None:
        pa.decoder = decoding
    pa.get_protocol_from_signal()
    return pa.decoded_hex_str


def test_auto_interpretation_fsk():
    fsk_signal = np.fromfile(get_path_for_data_file("fsk.complex"), dtype=np.float32)
    result = estimate(fsk_signal)
    assert result["modulation_type"] == "FSK"
    assert result["bit_length"] == 100
    assert 0 < result["tolerance"] <= 5
    assert demodulate(fsk_signal, "FSK", 100, result["center"], result["noise"],
                      result["tolerance"])[0] == "aaaaaaaac626c626f4dc1d98eef7a427999cd239d3f18"


def test_auto_interpretation_ask():
    ask_signal = np.fromfile(get_path_for_data_file("ask.complex"), dtype=np.float32)
    result = estimate(ask_signal)
    assert result["modulation_type"] == "ASK"
    assert result["bit_length"] == 300
    assert 0 < result["tolerance"] <= 6
    assert demodulate(ask_signal, "ASK", 300, result["center"], result["noise"],
                      result["tolerance"])[0] == "b25b6db6c80"


def test_auto_interpretation_overshoot_ook():
    data = ut.Signal.from_file(get_path_for_data_file("ook_overshoot.complex16s")).iq_array
    result = estimate(data.data)
    assert result["modulation_type"] == "ASK"
    assert result["bit_length"] == 500


def test_auto_interpretation_enocean():
    enocean_signal = np.fromfile(get_path_for_data_file("enocean.complex"), dtype=np.float32)
    result = estimate(enocean_signal)
    assert result["modulation_type"] == "ASK"
    assert 0.0077 <= result["center"] <= 0.0465
    assert result["tolerance"] <= 5
    assert result["bit_length"] == 40

    demod = demodulate(enocean_signal, "ASK", 40, result["center"], result["noise"],
                       result["tolerance"], decoding=Encoding(["WSP", DECODING_ENOCEAN]))
    assert len(demod) == 3
    assert demod[0] == demod[2]
    assert demod[0] == "aa9610002c1c024b"


def test_auto_interpretation_xavax():
    signal = ut.Signal.from_file(get_path_for_data_file("xavax.coco"))
    result = estimate(signal.iq_array.data)
    assert result["modulation_type"] == "FSK"
    assert result["bit_length"] == 100
    demod = demodulate(signal.iq_array.data, "FSK", 100, result["center"],
                       result["noise"], result["tolerance"])
    assert len(demod) >= 5
    for i in range(1, len(demod)):
        assert demod[i].startswith("aaaaaaaa")


def test_auto_interpretation_elektromaten():
    data = ut.Signal.from_file(get_path_for_data_file("elektromaten.complex16s")).iq_array
    result = estimate(data.data)
    assert result["modulation_type"] == "ASK"
    assert result["bit_length"] == 600

    demodulated = demodulate(data, "ASK", 600, result["center"], result["noise"],
                             result["tolerance"], pause_threshold=8)
    assert len(demodulated) == 11
    for i in range(11):
        assert demodulated[i].startswith("8")


def test_auto_interpretation_homematic():
    data = ut.Signal.from_file(get_path_for_data_file("homematic.complex32s")).iq_array
    result = estimate(data.data)
    assert result["modulation_type"] == "FSK"
    assert result["bit_length"] == 100

    demodulated = demodulate(data, "FSK", 100, result["center"], result["noise"],
                             result["tolerance"])
    assert len(demodulated) == 2
    for i in range(2):
        assert demodulated[i].startswith("aaaaaaaa")


def test_esaver_loads_and_estimates():
    """esaver.complex16s: 8-bit-per-component signed capture (the
    reference's .complex16s convention, IQArray.py:206-227) estimates as
    FSK with 100 samples per symbol."""
    sig = ut.Signal.from_file(get_path_for_data_file("esaver.complex16s"))
    assert sig.iq_array.data.dtype == np.int8
    assert len(sig.iq_array) == 299046

    result = estimate(sig.iq_array.data)
    assert result["modulation_type"] == "FSK"
    assert result["bit_length"] == 100
