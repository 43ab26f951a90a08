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
