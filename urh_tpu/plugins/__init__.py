"""Plugin system (headless counterparts of urh/plugins/).

The Network SDR plugin lives in urh_tpu.dev.network_sdr (it doubles as
a device backend); the remaining plugins are here: InsertSine,
MessageBreak, ZeroHide, FlipperZeroSub and RfCat.
"""

from urh_tpu.plugins.insert_sine import InsertSinePlugin
from urh_tpu.plugins.manager import (Plugin, PluginManager, ProtocolPlugin,
                                     SDRPlugin, SignalEditorPlugin)
from urh_tpu.plugins.message_break import MessageBreakAction, MessageBreakPlugin
from urh_tpu.plugins.zero_hide import ZeroHideAction, ZeroHidePlugin
from urh_tpu.plugins.flipper_zero_sub import FlipperZeroSubPlugin
from urh_tpu.plugins.rfcat import RfCatPlugin


def get_installed_plugins():
    return [InsertSinePlugin(), MessageBreakPlugin(), ZeroHidePlugin(),
            FlipperZeroSubPlugin(), RfCatPlugin()]
