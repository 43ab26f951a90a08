"""More analysis-tab behaviors ported from the reference GUI tests:
the Analyze button (awre through the controller) on golden captures,
message alignment in hex view, and already-demodulated wav handling."""

import pytest

from urh_tpu.core.signal import Signal
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.ui.controllers import CompareFrameController, MainController

from tests.golden import get_path_for_data_file


def test_analyze_button_fsk():
    """(test_analysis_tab_GUI.py:35-43)"""
    mc = MainController()
    mc.add_signalfile(get_path_for_data_file("fsk.complex"))
    cfc = mc.compare_frame_controller
    assert cfc.protocol_model.row_count >= 1
    cfc.run_format_finder()  # must not raise; assigns labels/message types
    assert len(cfc.proto_analyzer.message_types) >= 1


def test_analyze_button_enocean():
    """(test_analysis_tab_GUI.py:44-57)"""
    mc = MainController()
    frame = mc.add_signalfile(get_path_for_data_file("enocean.complex"))
    frame.change_parameter("center", 0.0)
    frame.change_parameter("noise_threshold", 0.0111)
    cfc = mc.compare_frame_controller
    cfc.set_shown_protocols()
    assert cfc.protocol_model.row_count >= 1
    cfc.run_format_finder()
    assert len(cfc.proto_analyzer.message_types) >= 1


def test_alignment():
    """Align on a hex pattern: before alignment the pattern does not line
    up at column 11 for every row, afterwards it does
    (test_analysis_tab_GUI.py:433-480)."""
    mc = MainController()
    mc.add_plain_bits_from_txt(get_path_for_data_file("misaligned.txt"))
    cfc = mc.compare_frame_controller
    model = cfc.protocol_model
    assert model.row_count == 16

    model.proto_view = 1  # hex
    pattern = "6768676"

    def aligned_at_11():
        for i in range(model.row_count):
            for j, ch in enumerate(pattern):
                if model.data(i, j + 11) != ch:
                    return False
        return True

    assert not aligned_at_11()
    cfc.align_messages(pattern, view_type=1)
    assert aligned_at_11()


def test_load_already_demodulated():
    """A 1-channel wav is treated as already-demodulated data; with center
    0.0459 its hex protocol starts with abcd
    (test_signal_tab_GUI.py:287-297)."""
    signal = Signal.from_file(get_path_for_data_file("demodulated.wav"))
    assert signal.already_demodulated
    signal.center = 0.0459
    signal.noise_threshold = 0.01
    pa = ProtocolAnalyzer(signal)
    pa.get_protocol_from_signal()
    assert pa.num_messages >= 1
    assert pa.plain_hex_str[0].startswith("abcd"), pa.plain_hex_str[0][:16]
