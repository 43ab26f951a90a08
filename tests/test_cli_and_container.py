"""CLI, fuzzing container and project persistence tests."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from urh_tpu.protocol.container import ProtocolAnalyzerContainer, de_bruijn
from urh_tpu.protocol.message import Message
from urh_tpu.util.project import ProjectManager

from tests.golden import get_path_for_data_file


def test_cli_estimate_golden():
    path = get_path_for_data_file("fsk.complex")
    env = dict(os.environ, URH_TPU_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "urh_tpu.cli", "--estimate", "-file", path, "--hex"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "modulation: FSK" in out.stdout
    assert "samples_per_symbol: 100" in out.stdout
    assert "aaaaaaaac626c626f4dc1d98eef7a427999cd239d3f18" in out.stdout


# ---------------------------------------------------------------------------
# fuzzing (mirrors tests/test_fuzzing.py in the reference)
# ---------------------------------------------------------------------------


def make_container():
    container = ProtocolAnalyzerContainer()
    container.messages.append(Message.from_plain_bits_str("101010101111"))
    msg = container.messages[0]
    lbl = msg.message_type.add_protocol_label(4, 7)  # 4 bits
    lbl.fuzz_me = True
    lbl.fuzz_values = ["1010", "0000", "0001", "0010"]
    return container


def test_fuzz_successive():
    c = make_container()
    added = c.fuzz_successive()
    assert len(added) == 3
    assert len(c.messages) == 4
    assert c.messages[1].plain_bits_str == "101000001111"
    assert c.messages[2].plain_bits_str == "101000011111"
    assert c.messages[3].plain_bits_str == "101000101111"
    assert all(m.fuzz_created for m in c.messages[1:])


def test_fuzz_concurrent_and_exhaustive():
    c = make_container()
    msg = c.messages[0]
    lbl2 = msg.message_type.add_protocol_label(8, 11)
    lbl2.fuzz_me = True
    lbl2.fuzz_values = ["1111", "0000"]

    c2 = make_container()
    msg2 = c2.messages[0]
    l2 = msg2.message_type.add_protocol_label(8, 11)
    l2.fuzz_me = True
    l2.fuzz_values = ["1111", "0000"]

    added = c.fuzz_concurrent()
    # concurrent: iterate in lockstep; max(len) - 1 = 3 new messages
    assert len(added) == 3

    added2 = c2.fuzz_exhaustive()
    # exhaustive: 3 * 1 cross product
    assert len(added2) == 3
    assert c2.messages[1].plain_bits_str == "101000000000"


def test_de_bruijn():
    seq = de_bruijn(3)
    assert len(seq) == 8
    s = list(seq) + list(seq[:2])
    subs = {tuple(s[i : i + 3]) for i in range(8)}
    assert len(subs) == 8  # every 3-bit pattern appears


def test_de_bruijn_4():
    seq = de_bruijn(4)
    assert len(seq) == 16
    s = list(seq) + list(seq[:3])
    subs = {tuple(s[i : i + 4]) for i in range(16)}
    assert len(subs) == 16


# ---------------------------------------------------------------------------
# project persistence
# ---------------------------------------------------------------------------


def test_project_roundtrip():
    import urh_tpu as ut
    from urh_tpu.dsp.modulator import Modulator
    from urh_tpu.protocol.labels import Participant

    with tempfile.TemporaryDirectory() as d:
        pm = ProjectManager(d)
        pm.device_conf["frequency"] = 868.3e6
        pm.description = "test project\nsecond line"
        mod = Modulator("my mod")
        mod.modulation_type = "FSK"
        mod.samples_per_symbol = 250
        pm.modulators = [mod]
        pm.participants = [Participant("Alice", "A", "dead")]

        sig = ut.Signal.from_iq(np.zeros((100, 2), dtype=np.float32))
        sig.filename = os.path.join(d, "test.complex")
        sig.name = "test"
        sig.samples_per_symbol = 123
        sig.center = 0.42
        sig.modulation_type = "ASK"
        pm.save_project(signals=[sig])

        pm2 = ProjectManager()
        assert pm2.load_project(d)
        assert pm2.device_conf["frequency"] == 868.3e6
        assert pm2.description == "test project\nsecond line"
        assert pm2.modulators[0].name == "my mod"
        assert pm2.modulators[0].samples_per_symbol == 250
        assert pm2.participants[0].address_hex == "dead"

        sig2 = ut.Signal.from_iq(np.zeros((100, 2), dtype=np.float32))
        sig2.filename = os.path.join(d, "test.complex")
        assert pm2.read_signal_info(sig2)
        assert sig2.samples_per_symbol == 123
        assert sig2.center == 0.42
        assert sig2.modulation_type == "ASK"
