"""Plugin and decimation tests."""

import os
import tempfile

import numpy as np

import urh_tpu as ut
from urh_tpu.dsp.decimation import create_path
from urh_tpu.plugins import (FlipperZeroSubPlugin, InsertSinePlugin,
                             MessageBreakPlugin, ZeroHidePlugin,
                             get_installed_plugins)
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.message import Message
from urh_tpu.util import settings
from urh_tpu.util.project import ProjectManager


def test_plugin_registry():
    names = {p.name for p in get_installed_plugins()}
    assert names == {"InsertSine", "MessageBreak", "ZeroHide", "FlipperZeroSub", "RfCat"}


def test_insert_sine():
    plugin = InsertSinePlugin()
    plugin.frequency = 100e3
    plugin.sample_rate = 1e6
    plugin.num_samples = 1000
    plugin.amplitude = 0.8

    sig = ut.Signal.from_iq(np.zeros((100, 2), dtype=np.float32))
    plugin.insert_into_signal(sig, position=50)
    assert sig.num_samples == 1100
    # inserted region has energy, original region stays zero
    assert np.abs(sig.iq_array[50:1050]).max() > 0.7
    assert np.abs(sig.iq_array[:50]).max() == 0


def test_message_break():
    pa = ProtocolAnalyzer(None, filename="x")
    pa.messages.append(Message.from_plain_bits_str("1010101011110000", pause=500))
    action = MessageBreakPlugin().get_action(pa, 0, 8)
    action.redo()
    assert len(pa.messages) == 2
    assert pa.messages[0].plain_bits_str == "10101010"
    assert pa.messages[1].plain_bits_str == "11110000"
    assert pa.messages[1].pause == 500
    action.undo()
    assert len(pa.messages) == 1


def test_zero_hide():
    pa = ProtocolAnalyzer(None, filename="x")
    pa.messages.append(Message.from_plain_bits_str("11110000000011"))
    plugin = ZeroHidePlugin()
    plugin.following_zeros = 5
    action = plugin.get_action(pa, view=0)
    action.redo()
    assert pa.messages[0].decoded_bits_str == "111111"
    action.undo()
    assert pa.messages[0].decoded_bits_str == "11110000000011"


def test_flipper_sub_export():
    plugin = FlipperZeroSubPlugin()
    assert plugin.get_furi_hal_string("ASK", 1000)[0] == "FuriHalSubGhzPresetOok650Async"
    assert plugin.get_furi_hal_string("FSK", 10)[0] == "FuriHalSubGhzPreset2FSKDev238Async"

    from urh_tpu.dsp.modulator import Modulator

    pm = ProjectManager()
    pm.device_conf["frequency"] = 433920000
    msg = Message.from_plain_bits_str("11001")
    msg.samples_per_symbol = 100
    mod = Modulator("m")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.sub")
        assert plugin.write_sub_file(path, [msg], [1e6], [mod], pm)
        content = open(path).read()
        assert "Filetype: Flipper SubGhz RAW File" in content
        assert "RAW_Data: 200 -200 100" in content


def test_create_path_decimation():
    n = 100_000
    samples = np.sin(np.linspace(0, 300 * np.pi, n)).astype(np.float32)
    result = create_path(samples, 0, n)
    assert len(result) == 1
    x, y = result[0]
    assert len(y) <= 2 * settings.PIXELS_PER_PATH + 4
    # envelope preserved
    assert y.max() > 0.99 and y.min() < -0.99


def test_create_path_short_passthrough():
    samples = np.arange(100, dtype=np.float32)
    (x, y), = create_path(samples, 0, 100)
    np.testing.assert_array_equal(y, samples)


def test_plugin_framework_bases():
    """Plugins subclass the same base hierarchy as upstream
    (plugins/Plugin.py:11-87; class bases per */[A-Z]*Plugin.py)."""
    from urh_tpu.dev.network_sdr import NetworkSDRInterfacePlugin
    from urh_tpu.plugins import (Plugin, ProtocolPlugin, SDRPlugin,
                                 SignalEditorPlugin)
    from urh_tpu.plugins.rfcat import RfCatPlugin

    assert isinstance(MessageBreakPlugin(), ProtocolPlugin)
    assert isinstance(ZeroHidePlugin(), ProtocolPlugin)
    assert isinstance(InsertSinePlugin(), SignalEditorPlugin)
    assert isinstance(FlipperZeroSubPlugin(), SDRPlugin)
    assert isinstance(RfCatPlugin(), SDRPlugin)
    assert isinstance(NetworkSDRInterfacePlugin(), SDRPlugin)
    for plugin in get_installed_plugins():
        assert isinstance(plugin, Plugin)


def test_plugin_manager_discovery_and_enable_persistence():
    """PluginManager discovers all plugins, restores enabled state from the
    settings store and answers queries (PluginManager.py:19-60)."""
    from urh_tpu.plugins import PluginManager

    manager = PluginManager()
    names = {p.name for p in manager.installed_plugins}
    assert names == {"FlipperZeroSub", "InsertSine", "MessageBreak",
                     "NetworkSDRInterface", "RfCat", "ZeroHide"}
    assert {p.name for p in manager.protocol_plugins} == {"MessageBreak", "ZeroHide"}
    assert {p.name for p in manager.signal_editor_plugins} == {"InsertSine"}
    assert manager.get_plugin_by_name("Unknown") is None

    plugin = manager.get_plugin_by_name("ZeroHide")
    assert not plugin.enabled
    changes = []
    plugin.enabled_changed.connect(lambda: changes.append(True))
    plugin.enabled = True
    assert changes == [True]
    assert manager.is_plugin_enabled("ZeroHide")
    assert not manager.is_plugin_enabled("MessageBreak")
    manager.save_enabled_states()
    try:
        fresh = PluginManager()
        assert fresh.get_plugin_by_name("ZeroHide").enabled
        assert not fresh.get_plugin_by_name("MessageBreak").enabled
    finally:
        plugin.enabled = False
        manager.save_enabled_states()


def test_plugin_settings_roundtrip_and_description():
    plugin = InsertSinePlugin()
    plugin.load_description()
    assert "sine" in plugin.description.lower()
    plugin.write_setting("frequency", 12345.0)
    assert plugin.read_setting("frequency", 0.0, type=float) == 12345.0


def test_plugin_list_model():
    from urh_tpu.ui.models import PluginListModel

    plugins = get_installed_plugins()
    model = PluginListModel(plugins, highlighted_plugins=[plugins[1]])
    assert model.row_count == len(plugins)
    assert model.data(0, "display") == plugins[0].name
    assert model.data(1, "highlight") and not model.data(0, "highlight")
    assert not model.data(2, "check")
    model.set_checked(2, True)
    assert plugins[2].enabled and model.data(2, "check")
    plugins[2].enabled = False
