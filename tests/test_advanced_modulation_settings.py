"""Headless port of reference tests/test_advanced_modulation_settings.py:
pause_threshold joins messages; message_length_divisor pads bits from the
trailing pause (ProtocolAnalyzer.py:289-321)."""

import pytest

from urh_tpu import DemodParams, ProtocolAnalyzer, Signal

from tests.golden import REF_DATA, get_path_for_data_file

PWM_BITS = ("100010001000111010001110100011101000100010001110100011101000111010"
            "0011101000111010001110111011101")


@pytest.mark.skipif(REF_DATA is None, reason="reference test data not available")
def test_pause_threshold():
    signal = Signal.from_file(get_path_for_data_file("enocean.complex"))
    signal.params.modulation = "ASK"
    pa = ProtocolAnalyzer(signal)
    pa.get_protocol_from_signal()
    assert len(pa.messages) > 1

    signal.params.pause_threshold = 0
    pa = ProtocolAnalyzer(signal)
    pa.get_protocol_from_signal()
    assert len(pa.messages) == 1


@pytest.mark.skipif(REF_DATA is None, reason="reference test data not available")
def test_message_length_divisor():
    signal = Signal.from_file(get_path_for_data_file("pwm.complex16s"))
    # NOTE: the reference test calls spinBoxNoiseTreshold.setValue(0.0525)
    # without emitting editingFinished, so the value is never applied; the
    # expected pauses correspond to the load-time auto-detected noise level
    # (2.8285 raw units for this capture).
    signal.params.modulation = "ASK"
    signal.params.samples_per_symbol = 2900
    signal.params.center = 0.01807
    signal.params.tolerance = 2
    pa = ProtocolAnalyzer(signal)
    pa.get_protocol_from_signal()

    pauses = [77114, 77112, 58220]
    for i in range(3):
        assert pa.plain_bits_str[i] == PWM_BITS, i
        assert pa.messages[i].pause == pauses[i], i

    signal.params.message_length_divisor = 4
    pa = ProtocolAnalyzer(signal)
    pa.get_protocol_from_signal()
    for i in range(3):
        assert pa.plain_bits_str[i] == PWM_BITS + "000", i
        assert pa.messages[i].pause == pauses[i] - 3 * 2900, i
