"""Headless ports of reference tests/test_project_manager.py cases that
don't require the GUI: protocol file loading and modulator persistence."""

import pytest

from urh_tpu.dsp.modulator import Modulator
from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.util.project import ProjectManager

from tests.golden import REF_DATA, get_path_for_data_file


@pytest.mark.skipif(REF_DATA is None, reason="reference test data not available")
def test_load_protocol_file():
    # test_project_manager.py:28-34
    pa = ProtocolAnalyzer(None)
    pa.from_xml_file(get_path_for_data_file("protocol_wsp.proto.xml"),
                     read_bits=True)
    assert len(pa.messages) == 6


def test_save_and_reload_modulators(tmp_path):
    # test_project_manager.py:36-69 (headless: ProjectManager round trip)
    pm = ProjectManager(str(tmp_path))
    pm.modulators[0].name = "Test"
    pm.modulators[0].carrier_freq_hz = 1337
    pm.modulators[0].carrier_phase_deg = 42
    pm.modulators[0].modulation_type = "FSK"
    pm.modulators[0].sample_rate = 10 ** 3
    pm.modulators.append(Modulator("test 2"))
    pm.modulators = pm.modulators[:2]
    pm.save_project()

    loaded_mods = pm.read_modulators_from_project_file()
    assert len(loaded_mods) == 2
    assert loaded_mods[0].name == "Test"
    assert loaded_mods[1].name == "test 2"
    assert loaded_mods[0].carrier_freq_hz == 1337
    assert loaded_mods[0].carrier_phase_deg == 42
    assert loaded_mods[0].modulation_type == "FSK"
    assert loaded_mods[0].sample_rate == 10 ** 3

    # reload into a fresh manager
    pm2 = ProjectManager()
    pm2.load_project(str(tmp_path))
    assert len(pm2.modulators) == 2
    assert pm2.modulators[0].name == "Test"
