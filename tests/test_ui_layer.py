"""Headless L5 layer tests: undo stack, undoable actions, table models and
tab controllers — ports of the logic asserted by the reference GUI tests
(tests/test_signal_tab_GUI.py, test_analysis_tab_GUI.py, test_generator.py,
test_maincontroller_gui.py) without a Qt toolkit."""

import numpy as np
import pytest

from urh_tpu.core.signal import Signal
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.message import Message
from urh_tpu.protocol.labels import ChecksumLabel, MessageType, Participant
from urh_tpu.ui.actions import (ChangeSignalParameter, EditAction,
                                EditSignalAction, InsertColumn)
from urh_tpu.ui.controllers import (CompareFrameController,
                                    GeneratorTabController, MainController,
                                    SignalFrameController,
                                    SimulatorTabController)
from urh_tpu.ui.models import (FuzzingTableModel, GeneratorTableModel,
                               LabelValueTableModel, PLabelTableModel,
                               ProtocolTableModel, ProtocolTreeModel)
from urh_tpu.ui.undo import UndoCommand, UndoStack

from tests.golden import get_path_for_data_file


# ---------------------------------------------------------------- undo stack
class _Inc(UndoCommand):
    def __init__(self, state):
        super().__init__("inc")
        self.state = state

    def redo(self):
        self.state[0] += 1

    def undo(self):
        self.state[0] -= 1


def test_undo_stack_semantics():
    stack = UndoStack()
    state = [0]
    stack.push(_Inc(state))
    stack.push(_Inc(state))
    assert state[0] == 2 and stack.can_undo() and not stack.can_redo()
    stack.undo()
    assert state[0] == 1 and stack.can_redo()
    stack.push(_Inc(state))  # discards redo tail
    assert state[0] == 2 and not stack.can_redo()
    stack.undo()
    stack.undo()
    assert state[0] == 0 and not stack.can_undo()
    stack.redo()
    assert state[0] == 1
    assert stack.undo_text == "inc"


# ---------------------------------------------------------- signal editing
@pytest.fixture(scope="module")
def ask_signal_path():
    return get_path_for_data_file("ask.complex")


def _make_frame(path):
    signal = Signal.from_file(path)
    signal.params.modulation = "ASK"
    signal.params.samples_per_symbol = 300
    signal.params.center = 0.032
    return SignalFrameController(signal)


def test_edit_signal_crop_delete_mute_undo(ask_signal_path):
    frame = _make_frame(ask_signal_path)
    signal = frame.signal
    n = signal.num_samples

    frame.delete_range(100, 200)
    assert signal.num_samples == n - 100
    frame.undo_stack.undo()
    assert signal.num_samples == n

    frame.crop(1000, n - 1000)
    assert signal.num_samples == n - 2000
    frame.undo_stack.undo()
    assert signal.num_samples == n

    original = np.copy(signal.iq_array[10:20])
    frame.mute_range(10, 20)
    assert np.all(np.asarray(signal.iq_array[10:20]) == 0)
    frame.undo_stack.undo()
    assert np.array_equal(np.asarray(signal.iq_array[10:20]), original)


def test_edit_signal_paste_undo(ask_signal_path):
    frame = _make_frame(ask_signal_path)
    signal = frame.signal
    n = signal.num_samples
    frame.copy_range(0, 500)
    frame.paste(100)
    assert signal.num_samples == n + 500
    frame.undo_stack.undo()
    assert signal.num_samples == n


def test_edit_signal_preserves_message_metadata(ask_signal_path):
    frame = _make_frame(ask_signal_path)
    proto = frame.show_protocol()
    assert proto.num_messages >= 1
    alice = Participant("Alice", "A")
    proto.messages[0].participant = alice

    # mute a pure-noise region in front of the first message: message count
    # and metadata survive the re-demodulation
    first_start = proto.messages[0].bit_sample_pos[0]
    if first_start > 40:
        frame.mute_range(0, int(first_start) - 20)
        assert proto.messages[0].participant is alice
        frame.undo_stack.undo()
        assert proto.messages[0].participant is alice


def test_change_signal_parameter_redemodulates(ask_signal_path):
    frame = _make_frame(ask_signal_path)
    proto = frame.show_protocol()
    bits_before = proto.plain_bits_str[0]
    frame.change_parameter("samples_per_symbol", 100)
    assert frame.signal.samples_per_symbol == 100
    bits_after = proto.plain_bits_str[0] if proto.num_messages else ""
    assert bits_after != bits_before
    frame.undo_stack.undo()
    assert frame.signal.samples_per_symbol == 300
    assert proto.plain_bits_str[0] == bits_before


# ------------------------------------------------------------- table models
def _proto_with_messages(strings):
    proto = ProtocolAnalyzer(None)
    for s in strings:
        proto.messages.append(Message.from_plain_bits_str(s))
    for msg in proto.messages:
        msg.message_type = proto.default_message_type
    return proto


def test_protocol_table_model_views_and_diffs():
    proto = _proto_with_messages(["10100101", "10101111"])
    model = ProtocolTableModel(proto)
    model.update()
    assert model.row_count == 2
    assert model.col_count == 8
    assert model.row_text(0) == "10100101"

    model.proto_view = 1  # hex
    assert model.col_count == 2
    assert model.row_text(0) == "a5"
    assert model.row_text(1) == "af"

    model.refindex = 0
    assert model.diffs[1] == {1}  # second nibble differs

    model.proto_view = 0
    assert model.diffs[1] == {4, 6}


def test_protocol_table_model_search():
    proto = _proto_with_messages(["10100101", "00101000"])
    model = ProtocolTableModel(proto)
    model.update()
    n = model.find_protocol_value("0101")
    assert n == 2
    assert model.search_results == [(0, 4, 8), (1, 1, 5)]


def test_protocol_table_model_delete_range_undo():
    proto = _proto_with_messages(["11110000", "00001111"])
    model = ProtocolTableModel(proto)
    model.update()
    model.delete_range(0, 0, 0, 3)  # first 4 bits of message 0
    assert proto.messages[0].plain_bits_str == "0000"
    model.undo_stack.undo()
    assert proto.messages[0].plain_bits_str == "11110000"


def test_generator_table_model_editing_and_padding():
    model = GeneratorTableModel()
    container = model.protocol
    container.messages.append(Message.from_plain_bits_str("1010"))
    model.update()
    assert model.set_data(0, 2, "0")
    assert container.messages[0].plain_bits_str == "1000"
    # type past end of message in hex view -> zero padding
    model.proto_view = 1
    assert model.set_data(0, 2, "f")
    assert container.messages[0].plain_bits_str == "100000001111"


def test_insert_column():
    proto = _proto_with_messages(["1111", "0000"])
    cmd = InsertColumn(proto, 2, [0, 1], view=0)
    cmd.redo()
    assert proto.messages[0].plain_bits_str == "11011"
    assert proto.messages[1].plain_bits_str == "00000"
    cmd.undo()
    assert proto.messages[0].plain_bits_str == "1111"


def test_label_value_model_checksum_status():
    proto = _proto_with_messages(["10101010" + "11111111"])
    mt = proto.default_message_type
    from urh_tpu.protocol.labels import FieldType
    ft = FieldType("checksum", FieldType.Function.CHECKSUM)
    checksum_label = ChecksumLabel("checksum", 8, 15, 0, field_type=ft)
    mt.append(checksum_label)
    proto.messages[0].message_type = mt
    model = LabelValueTableModel(proto)
    row = model.rows()[0]
    assert row["name"] == "checksum"
    assert row["checksum_ok"] in (True, False)
    assert row["value"] is not None


def test_plabel_model_edit():
    mt = MessageType("t")
    lbl = mt.add_protocol_label(0, 7, name="preamble")
    model = PLabelTableModel(mt)
    assert model.row(0)["start"] == 1 and model.row(0)["end"] == 8
    model.set_field(0, "start", 2)
    assert lbl.start == 1
    model.set_field(0, "apply_decoding", False)
    assert lbl.apply_decoding is False
    removed = model.remove_label_at(0)
    assert removed is lbl and len(mt) == 0


def test_fuzzing_table_model():
    mt = MessageType("t")
    lbl = mt.add_protocol_label(0, 7, name="data")
    lbl.fuzz_values = ["00000000"]
    model = FuzzingTableModel(lbl)
    model.add_range(1, 4)
    assert lbl.fuzz_values == ["00000000", "00000001", "00000010",
                               "00000011", "00000100"]
    model.add_boundaries(0, 255, 1)
    assert "11111111" in lbl.fuzz_values
    assert lbl.fuzz_values.count("00000000") == 1  # dedup
    model.proto_view = 1
    assert model.col_count == 2
    assert model.data(0, 0) == "0"


def test_protocol_tree_model_groups():
    tree = ProtocolTreeModel()
    p1, p2 = ProtocolAnalyzer(None), ProtocolAnalyzer(None)
    tree.add_protocol(p1)
    grp = tree.add_group("Second")
    tree.add_protocol(p2, 1)
    assert tree.ngroups == 2
    assert tree.protocols[0] == [p1] and tree.protocols[1] == [p2]
    tree.delete_group(1)
    assert tree.ngroups == 1
    assert tree.protocol_list == [p1, p2]
    with pytest.raises(ValueError):
        tree.delete_group(0)


def test_compare_frame_show_only_modes():
    """Column visibility for the show-only-labels / show-only-diffs
    checkbox combinations (reference CFC:1141-1253)."""
    proto = _proto_with_messages(["10100101", "10101111", "10100111"])
    cfc = CompareFrameController()
    cfc.proto_analyzer.messages = proto.messages
    for msg in proto.messages:
        msg.message_type = cfc.proto_analyzer.default_message_type
    cfc.protocol_model.update()

    # a shown label over bits 0..3
    lbl = cfc.active_message_type.add_protocol_label(0, 3)
    cfc.protocol_model.update()

    assert cfc.get_visible_columns() == set(range(8))
    assert cfc.get_visible_columns(show_only_labels=True) == {0, 1, 2, 3}

    cfc.show_differences(0)
    diff_cols = cfc.get_visible_columns(show_only_diffs=True)
    # row 1 differs from row 0 at columns 4 and 6; row 2 at column 6
    assert diff_cols == {4, 6}
    assert cfc.get_visible_columns(show_only_labels=True,
                                   show_only_diffs=True) == set()

    lbl.show = False
    assert cfc.get_visible_columns(show_only_labels=True) == set()


# -------------------------------------------------------------- controllers
def test_compare_frame_label_and_messagetype(ask_signal_path):
    frame = _make_frame(ask_signal_path)
    frame.show_protocol()
    cfc = CompareFrameController()
    cfc.add_protocol(frame.proto_analyzer)
    assert cfc.proto_analyzer.num_messages >= 1
    assert len(cfc.decodings) >= 5  # fallback decodings loaded

    lbl = cfc.add_protocol_label(0, 3, 0, proto_view=0)
    assert lbl is not False
    assert lbl.start == 0 and lbl.end == 4
    assert lbl in cfc.active_message_type

    labels = cfc.get_labels_from_selection(0, 0, 0, 2)
    assert labels == [lbl]

    mt = cfc.add_message_type(cfc.proto_analyzer.messages)
    assert cfc.active_message_type is mt
    assert all(m.message_type is mt for m in cfc.proto_analyzer.messages)


def test_compare_frame_hidden_rows_by_participant(ask_signal_path):
    frame = _make_frame(ask_signal_path)
    frame.show_protocol()
    cfc = CompareFrameController()
    alice = Participant("Alice", "A")
    cfc.project_manager.participants.append(alice)
    for msg in frame.proto_analyzer.messages:
        msg.participant = alice
    cfc.add_protocol(frame.proto_analyzer)
    assert len(cfc.protocol_model.hidden_rows) == 0
    alice.show = False
    cfc.set_shown_protocols()
    assert len(cfc.protocol_model.hidden_rows) == cfc.proto_analyzer.num_messages


def test_generator_tab_insert_fuzz_estimate(ask_signal_path):
    frame = _make_frame(ask_signal_path)
    frame.show_protocol()
    cfc = CompareFrameController()
    cfc.add_protocol(frame.proto_analyzer)
    gtc = GeneratorTabController(cfc)

    gtc.add_protocol(frame.proto_analyzer)
    n = len(gtc.protocol.messages)
    assert n == frame.proto_analyzer.num_messages
    # bootstrap modulator picked up signal parameters
    assert gtc.modulators[0].samples_per_symbol == 300
    assert gtc.modulators[0].modulation_type == "ASK"

    lbl = gtc.create_fuzzing_label(0, 0, 4)
    # fuzz_values[0] is the current (default) value, as seeded by the dialog
    lbl.fuzz_values.extend(["0000", "0001", "0010", "0011"])
    added = gtc.fuzz("Successive")
    assert len(added) == 3
    assert len(gtc.protocol.messages) == n + 3
    gtc.generator_undo_stack.undo()
    assert len(gtc.protocol.messages) == n

    gtc.edit_all_pause_items(1000)
    assert all(m.pause == 1000 for m in gtc.protocol.messages)
    assert gtc.estimated_time_s() > 0

    iq = gtc.generate_iq()
    assert len(iq) == gtc.total_modulated_samples


def test_main_controller_end_to_end(ask_signal_path, tmp_path):
    mc = MainController()
    frame = mc.add_signalfile(ask_signal_path)
    assert frame in mc.signal_frames
    assert mc.compare_frame_controller.proto_analyzer.num_messages >= 1

    # txt with plain bits
    txt = tmp_path / "bits.txt"
    txt.write_text("101010101\n111100001111\n")
    proto = mc.add_files([str(txt)])[0]
    assert proto.num_messages == 2

    mc.close_signal_frame(frame)
    assert frame not in mc.signal_frames
    mc.close_all_files()
    assert mc.signal_frames == []


def test_simulator_tab_controller_build(ask_signal_path):
    frame = _make_frame(ask_signal_path)
    frame.show_protocol()
    cfc = CompareFrameController()
    cfc.add_protocol(frame.proto_analyzer)
    gtc = GeneratorTabController(cfc)
    stc = SimulatorTabController(cfc, gtc)

    sim_msgs = stc.add_protocol_messages(frame.proto_analyzer.messages)
    assert len(sim_msgs) == frame.proto_analyzer.num_messages
    assert len(stc.messages) == len(sim_msgs)

    rule = stc.add_rule()
    assert rule.child_count() == 1  # IF condition

    valid, _ = stc.validate_formula("item1.data + 1")
    assert isinstance(valid, bool)

    stc.simulator_message_table_model.update()
    assert stc.simulator_message_table_model.row_count == len(sim_msgs)
