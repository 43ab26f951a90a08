"""Headless dialog-controller tests, mirroring the reference's dialog GUI
tests (tests/test_protocol_label_dialog.py, test_fuzzing_dialog.py,
test_message_type_options_gui.py, test_signal_details_gui.py)."""

import os

import pytest

from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.labels import (ChecksumLabel, FieldType, MessageType,
                                     Mode, ProtocolLabel)
from urh_tpu.protocol.message import Message
from urh_tpu.ui.dialogs import (AdvancedModulationOptionsController,
                                FuzzingDialogController,
                                MessageTypeDialogController,
                                ModulationParametersDialogController,
                                ProtocolLabelDialogController,
                                SignalDetailsDialogController)

REF_DATA = "/root/reference/tests/data"


def make_message(bits="10110010010110110110110100101101", pause=1000):
    mt = MessageType("test")
    mt.append(ProtocolLabel(name="lbl1", start=4, end=23, color_index=0))
    return Message([int(b) for b in bits], pause, message_type=mt)


# ---- ProtocolLabelDialog (tests/test_protocol_label_dialog.py:33-110) ----

def test_protocol_label_dialog_edit_and_remove():
    msg = make_message()
    ctrl = ProtocolLabelDialogController(msg, view_type=0)
    assert ctrl.model.row_count == 1
    assert ctrl.model.row(0)["start"] == 5  # 1-based in the table
    assert ctrl.model.row(0)["end"] == 24

    ctrl.model.set_field(0, "start", 2)
    ctrl.model.set_field(0, "end", 10)
    lbl = ctrl.model.label_at(0)
    assert (lbl.start, lbl.end) == (1, 10)

    events = []
    ctrl.apply_decoding_changed.connect(lambda l, mt: events.append((l, mt)))
    ctrl.set_apply_decoding(0, False)
    assert len(events) == 1 and events[0][0] is lbl
    ctrl.set_apply_decoding(0, False)  # unchanged -> no event
    assert len(events) == 1

    removed = ctrl.remove_label(0)
    assert removed is lbl and ctrl.model.row_count == 0


def test_protocol_label_dialog_checksum_tabs():
    """Retyping a label to CRC spawns a checksum config tab; retyping away
    removes it (ProtocolLabelDialog.py:99-124,165-167)."""
    msg = make_message()
    crc_lbl = ChecksumLabel.from_label(msg.message_type[0])
    crc_lbl.field_type = FieldType("checksum", FieldType.Function.CHECKSUM)
    msg.message_type[0] = crc_lbl
    ctrl = ProtocolLabelDialogController(msg, view_type=0)
    assert len(ctrl.checksum_widgets) == 1
    assert ctrl.checksum_widgets[0].checksum_label is crc_lbl

    ctrl.set_view_index(1)
    assert ctrl.checksum_widgets[0].proto_view == 1

    msg.message_type[0] = ProtocolLabel(name="plain", start=4, end=23,
                                        color_index=0)
    ctrl.configure_special_config_tabs()
    assert len(ctrl.checksum_widgets) == 0


# ---- MessageTypeDialog (tests/test_message_type_options_gui.py:16-60) ----

def test_message_type_dialog_rules_and_reject():
    mt = MessageType("rules")
    ctrl = MessageTypeDialogController(mt)
    assert not ctrl.ruleset_enabled
    ctrl.set_assigned_automatically(True)
    assert ctrl.ruleset_enabled and mt.assigned_by_ruleset

    ctrl.add_rule()
    ctrl.add_rule()
    assert len(mt.ruleset) == 2
    ctrl.set_ruleset_mode(1)
    assert mt.ruleset.mode == Mode(1)
    ctrl.remove_rule()
    assert len(mt.ruleset) == 1

    ctrl.reject()
    assert len(mt.ruleset) == 0
    assert not mt.assigned_by_ruleset
    assert ctrl.accepted is False


def test_message_type_dialog_accept_keeps_changes():
    mt = MessageType("rules")
    ctrl = MessageTypeDialogController(mt)
    ctrl.set_assigned_automatically(True)
    ctrl.add_rule()
    ctrl.accept()
    assert ctrl.accepted and len(mt.ruleset) == 1 and mt.assigned_by_ruleset


# ---- SignalDetailsDialog (tests/test_signal_details_gui.py:17-40) ----

def test_signal_details_sample_rate_updates_duration():
    import urh_tpu as ut

    sig = ut.Signal.from_file(os.path.join(REF_DATA, "fsk.complex"))
    ctrl = SignalDetailsDialogController(sig)
    assert ctrl.num_samples == sig.num_samples
    assert ctrl.file.endswith("fsk.complex") and ctrl.file_size != "-"

    ctrl.sample_rate = 2e6
    assert sig.sample_rate == 2e6
    d1 = ctrl.duration
    ctrl.sample_rate = 1e6
    assert ctrl.duration != d1
    assert ctrl.duration.endswith("s")


def test_signal_details_missing_file():
    import numpy as np

    import urh_tpu as ut

    sig = ut.Signal.from_samples(np.zeros((16, 2), dtype=np.float32), "mem", 1e6)
    ctrl = SignalDetailsDialogController(sig)
    assert ctrl.file == "signal file not found"
    assert ctrl.file_size == "-" and ctrl.file_created == "-"


# ---- FuzzingDialog (tests/test_fuzzing_dialog.py:103-215) ----

@pytest.fixture
def fuzz_ctrl():
    proto = ProtocolAnalyzer(None)
    proto.messages.append(make_message("0001011001010001010011110000111100001111", 0))
    return FuzzingDialogController(proto, label_index=0, msg_index=0,
                                  proto_view=0)


def test_fuzzing_current_label_seeding(fuzz_ctrl):
    lbl = fuzz_ctrl.current_label
    assert lbl.fuzz_values == ["01100101000101001111"]
    assert fuzz_ctrl.current_label_start == 4
    assert fuzz_ctrl.current_label_end == 24
    assert fuzz_ctrl.message_data[4:24] == "01100101000101001111"


def test_fuzzing_preview(fuzz_ctrl):
    pre, fuzzed, post = fuzz_ctrl.message_data_preview()
    assert pre == "0001"
    assert fuzzed == "0110010100010100" + "..."  # clipped at 16 + ellipsis
    assert post.startswith("0000111100")


def test_fuzzing_add_remove_rows(fuzz_ctrl):
    assert fuzz_ctrl.fuzz_table_model.row_count == 1
    fuzz_ctrl.add_row()
    fuzz_ctrl.add_row()
    assert fuzz_ctrl.fuzz_table_model.row_count == 3
    values = fuzz_ctrl.current_label.fuzz_values
    assert int(values[1], 2) == int(values[0], 2) + 1
    assert int(values[2], 2) == int(values[0], 2) + 2
    fuzz_ctrl.delete_lines()
    fuzz_ctrl.delete_lines()
    assert fuzz_ctrl.fuzz_table_model.row_count == 1
    # deleting everything re-seeds one value (FuzzingDialog.py:70-85,240-252)
    fuzz_ctrl.delete_lines(0, 0)
    assert fuzz_ctrl.fuzz_table_model.row_count == 1


def test_fuzzing_range_boundaries_random(fuzz_ctrl):
    fuzz_ctrl.add_range(10, 100, 20)
    assert fuzz_ctrl.fuzz_table_model.row_count == 6
    fuzz_ctrl.delete_lines(1, 5)

    fuzz_ctrl.add_boundaries(2, 200, 2)
    assert fuzz_ctrl.fuzz_table_model.row_count == 5
    fuzz_ctrl.delete_lines(1, 4)

    fuzz_ctrl.add_random(10, 0, 2 ** 20 - 1, seed=42)
    assert fuzz_ctrl.fuzz_table_model.row_count == 11


def test_fuzzing_remove_duplicates(fuzz_ctrl):
    fuzz_ctrl.add_range(10, 50, 5)
    assert fuzz_ctrl.fuzz_table_model.row_count == 10
    fuzz_ctrl.add_range(10, 50, 5)
    fuzz_ctrl.add_range(10, 50, 5)
    assert fuzz_ctrl.fuzz_table_model.row_count == 28
    fuzz_ctrl.set_remove_duplicates(True)
    assert fuzz_ctrl.fuzz_table_model.row_count == 10
    fuzz_ctrl.add_range(10, 50, 5)
    assert fuzz_ctrl.fuzz_table_model.row_count == 10


def test_fuzzing_label_range_edit_clears_values(fuzz_ctrl):
    fuzz_ctrl.add_range(10, 100, 20)
    assert fuzz_ctrl.fuzz_table_model.row_count > 1
    fuzz_ctrl.set_fuzzing_start(3)
    lbl = fuzz_ctrl.current_label
    assert lbl.start == 2
    assert len(lbl.fuzz_values) == 1  # re-seeded from plain bits
    fuzz_ctrl.set_fuzzing_end(30)
    assert fuzz_ctrl.current_label.end == 30


# ---- ModulationParametersDialog / AdvancedModulationOptions ----

def test_modulation_parameters_dialog():
    params = [0.0, 100.0, 200.0, 300.0]
    ctrl = ModulationParametersDialogController(params, "4-FSK")
    assert ctrl.num_bits == 2 and ctrl.unit == "Frequency in Hz"
    assert ctrl.bit_pattern(0) == "00" and ctrl.bit_pattern(3) == "11"
    ctrl.set_value(1, 150.0)
    assert params[1] == 100.0  # not yet applied
    ctrl.accept()
    assert params == [0.0, 150.0, 200.0, 300.0]
    assert ModulationParametersDialogController([0, 100], "ASK").unit == "Amplitude"
    assert ModulationParametersDialogController([0, 180], "PSK").unit == "Phase"


def test_advanced_modulation_options_controller():
    ctrl = AdvancedModulationOptionsController(8, 1)
    got = {}
    ctrl.pause_threshold_edited.connect(lambda v: got.setdefault("pause", v))
    ctrl.message_length_divisor_edited.connect(lambda v: got.setdefault("div", v))
    ctrl.set_pause_threshold(8)  # unchanged
    ctrl.set_message_length_divisor(4)
    ctrl.accept()
    assert got == {"div": 4}


def test_fuzzing_repeat_values(fuzz_ctrl):
    fuzz_ctrl.add_range(10, 30, 10)  # 3 values: 10, 20, 30
    assert fuzz_ctrl.fuzz_table_model.row_count == 4
    values_before = list(fuzz_ctrl.current_label.fuzz_values)

    # repeating rows [1, 3) twice inserts 2 copies of each repeated row
    fuzz_ctrl.repeat_values(1, 3, 2)
    values = fuzz_ctrl.current_label.fuzz_values
    assert len(values) == 8
    assert values[1] == values[2] == values[3] == values_before[1]
    assert values[4] == values[5] == values[6] == values_before[2]

    # duplicate removal is re-applied after repeating
    fuzz_ctrl.set_remove_duplicates(True)
    assert fuzz_ctrl.fuzz_table_model.row_count == 4
    fuzz_ctrl.repeat_values(1, 2, 3)
    assert fuzz_ctrl.fuzz_table_model.row_count == 4


def test_fuzzing_values_clamped_to_label_capacity(fuzz_ctrl):
    lbl = fuzz_ctrl.current_label
    n_bits = len(lbl.fuzz_values[0])
    cap = 2 ** n_bits - 1

    # values beyond the label capacity saturate instead of aliasing mod 2^n
    fuzz_ctrl.add_range(cap - 1, cap + 5, 1)
    added = [int(v, 2) for v in lbl.fuzz_values[1:]]
    assert added[0] == cap - 1
    assert all(v == cap for v in added[1:])
    assert all(len(v) == n_bits for v in lbl.fuzz_values)
