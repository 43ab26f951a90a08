"""Ports of the reference dialog-widget logic tests
(tests/test_checksum_widget.py, test_filter_bandwidth_dialog.py) against
the headless widget controllers."""

import pytest

from urh_tpu.coding.crc import GenericCRC
from urh_tpu.coding.wsp import WSPChecksum
from urh_tpu.dsp.filters import Filter
from urh_tpu.protocol.labels import ChecksumLabel, FieldType, MessageType
from urh_tpu.protocol.message import Message
from urh_tpu.ui.widgets import (ChecksumWidgetController, CostaOptionsController,
                                FilterBandwidthController, bit2hex)


def _checksum_label(start, end):
    return ChecksumLabel("checksum_label", start, end, 0,
                         FieldType("crc", FieldType.Function.CHECKSUM))


def test_configure_crc_ranges():
    """(test_checksum_widget.py:16-39)"""
    checksum_label = _checksum_label(50, 100)
    ctrl = ChecksumWidgetController(
        checksum_label, Message([0] * 100, 0, MessageType("test")), 0)
    assert ctrl.range_at(0) == (1, 50)
    assert ctrl.row_count == 1

    ctrl.add_range()
    assert ctrl.row_count == 2
    ctrl.add_range()
    assert ctrl.row_count == 3

    ctrl.remove_range()
    assert ctrl.row_count == 2
    ctrl.remove_range()
    assert ctrl.row_count == 1
    ctrl.remove_range()  # last range can never be removed
    assert ctrl.row_count == 1


def test_configure_crc_parameters():
    """(test_checksum_widget.py:41-84)"""
    crc_label = _checksum_label(25, 120)
    ctrl = ChecksumWidgetController(
        crc_label, Message([0] * 150, 0, MessageType("test")), 0)

    crc = GenericCRC(polynomial=list(GenericCRC.DEFAULT_POLYNOMIALS.keys())[0])
    assert ctrl.polynomial_hex == crc.polynomial_as_hex_str
    assert ctrl.start_value_hex == bit2hex(crc.start_value)
    assert ctrl.final_xor_hex == bit2hex(crc.final_xor)

    ctrl.set_crc_function(2)
    crc.polynomial = crc.choose_polynomial(2)
    assert ctrl.polynomial_hex == crc.polynomial_as_hex_str

    ctrl.set_polynomial_from_hex("abcde")
    crc.set_polynomial_from_hex("abcde")
    assert ctrl.polynomial_hex == crc.polynomial_as_hex_str


def test_default_crcs():
    """Function list = default polynomials + special CRCs
    (test_checksum_widget.py:85-110)"""
    crc_label = _checksum_label(25, 120)
    ctrl = ChecksumWidgetController(
        crc_label, Message([0] * 150, 0, MessageType("test")), 0)
    names = ctrl.crc_function_names
    assert len(names) == (len(GenericCRC.DEFAULT_POLYNOMIALS)
                          + len(ChecksumWidgetController.SPECIAL_CRCS))
    for i, name in enumerate(GenericCRC.DEFAULT_POLYNOMIALS):
        assert names[i] == name
    for i, name in enumerate(ChecksumWidgetController.SPECIAL_CRCS):
        assert names[len(GenericCRC.DEFAULT_POLYNOMIALS) + i] == name

    # selecting a special CRC swaps the whole checksum object
    ctrl.set_crc_function("CC1101")
    assert ctrl.polynomial_hex == \
        ChecksumWidgetController.SPECIAL_CRCS["CC1101"].polynomial_as_hex_str
    assert all(bool(b) for b in crc_label.checksum.start_value)


def test_wsp_category():
    crc_label = _checksum_label(25, 120)
    ctrl = ChecksumWidgetController(crc_label, None, 0)
    assert ctrl.category == "generic"
    assert "Wireless Short Packet (WSP)" in ctrl.categories

    ctrl.set_wsp_mode("crc8")
    assert crc_label.category == ChecksumLabel.Category.wsp
    assert isinstance(crc_label.checksum, WSPChecksum)
    assert crc_label.checksum.mode == WSPChecksum.ChecksumMode.crc8


def test_change_custom_bw():
    """(test_filter_bandwidth_dialog.py:11-24)"""
    ctrl = FilterBandwidthController()
    ctrl.custom_bandwidth = 0.3
    assert ctrl.custom_kernel_length == Filter.get_filter_length_from_bandwidth(0.3)

    ctrl.custom_kernel_length = 401
    assert ctrl.custom_bandwidth == pytest.approx(
        Filter.get_bandwidth_from_filter_length(401))

    # named bandwidths map to kernel lengths
    lengths = ctrl.kernel_length_by_name
    assert set(lengths) == set(Filter.BANDWIDTHS)
    assert all(n >= 1 for n in lengths.values())


def test_costas_options():
    ctrl = CostaOptionsController(0.1)
    assert ctrl.costas_loop_bandwidth == 0.1
    ctrl.set_bandwidth(0.2)
    assert ctrl.costas_loop_bandwidth == 0.2
