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


def test_signal_xml_writes_canonical_names(tmp_path):
    """Saved project files must use the canonical attribute spellings
    (ProjectManager.py:351 writes samples_per_symbol, not bit_length);
    legacy spellings remain readable."""
    import numpy as np

    import urh_tpu as ut

    pm = ProjectManager(str(tmp_path))
    sig = ut.Signal.from_iq(np.zeros((64, 2), dtype=np.float32))
    sig.filename = str(tmp_path / "cap.complex")
    sig.samples_per_symbol = 123
    sig.center = 0.25
    tag = pm.signal_to_xml(sig)
    assert tag.get("samples_per_symbol") == "123"
    assert tag.get("bit_length") is None
    assert tag.get("center") == "0.25"
    assert tag.get("qad_center") is None

    # legacy read path still honored, qad_center preferred over center
    tag.set("bit_length", "55")
    del tag.attrib["samples_per_symbol"]
    tag.set("qad_center", "0.5")
    row = next(r for r in pm._SIGNAL_SCHEMA if r[0] == "samples_per_symbol")
    raw = next((tag.get(n) for n in row[3] if tag.get(n)), None)
    assert row[1](raw) == 55
    row = next(r for r in pm._SIGNAL_SCHEMA if r[0] == "center")
    raw = next((tag.get(n) for n in row[3] if tag.get(n)), None)
    assert row[1](raw) == 0.5
