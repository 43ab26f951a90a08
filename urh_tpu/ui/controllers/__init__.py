"""Headless tab controllers mirroring the reference GUI workflow
(controller/MainController.py + the four tab controllers), minus widgets:
every operation is a plain method so workflows are scriptable and testable.
"""

from urh_tpu.ui.controllers.signal_frame import SignalFrameController
from urh_tpu.ui.controllers.compare_frame import CompareFrameController
from urh_tpu.ui.controllers.generator_tab import GeneratorTabController
from urh_tpu.ui.controllers.simulator_tab import SimulatorTabController
from urh_tpu.ui.controllers.main import MainController

__all__ = ["SignalFrameController", "CompareFrameController",
           "GeneratorTabController", "SimulatorTabController", "MainController"]
