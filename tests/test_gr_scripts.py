"""Generated GNU Radio flowgraph scripts: parameter wiring.

Runs the generated per-device scripts under this interpreter with FAKE
``gnuradio``/``osmosdr`` modules on PYTHONPATH (the pattern of the
vendor fake-lib suite): the fakes journal every osmosdr call to a file,
the test feeds retune commands over stdin and asserts the wiring.
Reference behavior: urh/dev/gr/scripts/hackrf_recv.py:36-50 (osmosdr
args + initial parameter application) and InputHandlerThread stdin
retuning.
"""

import json
import os
import subprocess
import sys
import time

import pytest

from urh_tpu.dev.gr.device_table import GR_DEVICES, devices_by_stem

SCRIPTS_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                           "urh_tpu", "dev", "gr", "scripts")

FAKE_OSMOSDR = '''
import json, os

_LOG = os.environ["FAKE_GR_LOG"]

def _record(entry):
    with open(_LOG, "a") as f:
        f.write(json.dumps(entry) + "\\n")

class _Dev:
    def __init__(self, kind, args):
        self._kind = kind
        _record({"call": kind, "args": args})
    def __getattr__(self, name):
        if not name.startswith("set_"):
            raise AttributeError(name)
        def method(*a):
            _record({"call": name, "value": list(a)})
        return method

def source(args=""):
    return _Dev("source", args)

def sink(args=""):
    return _Dev("sink", args)
'''

FAKE_GNURADIO = '''
import os, sys, time

class _TopBlock:
    def connect(self, *a):
        pass
    def run(self):
        time.sleep(float(os.environ.get("FAKE_GR_RUN_SECS", "2")))

class _Blocks:
    @staticmethod
    def tcp_server_sink(*a, **kw):
        return ("tcp_server_sink", a)
    @staticmethod
    def tcp_source(*a, **kw):
        return ("tcp_source", a)

class _GR:
    sizeof_gr_complex = 8
    top_block = _TopBlock

blocks = _Blocks()
gr = _GR()
sys.modules["gnuradio.blocks"] = blocks
sys.modules["gnuradio.gr"] = gr
'''


@pytest.fixture
def fake_gr_env(tmp_path):
    pkg = tmp_path / "fakes"
    pkg.mkdir()
    (pkg / "osmosdr.py").write_text(FAKE_OSMOSDR)
    gnuradio = pkg / "gnuradio"
    gnuradio.mkdir()
    (gnuradio / "__init__.py").write_text(FAKE_GNURADIO)
    log = tmp_path / "calls.jsonl"
    env = dict(os.environ,
               PYTHONPATH=str(pkg) + os.pathsep + os.environ.get("PYTHONPATH", ""),
               FAKE_GR_LOG=str(log),
               JAX_PLATFORMS="cpu")
    return env, log


def _read_calls(log, want, timeout=10.0):
    """Poll the call journal until `want` distinct call names appear."""
    deadline = time.monotonic() + timeout
    calls = []
    while time.monotonic() < deadline:
        if log.exists():
            calls = [json.loads(line) for line in log.read_text().splitlines()]
            if want.issubset({c["call"] for c in calls}):
                return calls
        time.sleep(0.05)
    return calls


def _run_script(script, env, argv, stdin_lines=(), wait_for=frozenset(),
                log=None):
    proc = subprocess.Popen(
        [sys.executable, os.path.join(SCRIPTS_DIR, script)] + argv,
        stdin=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
    try:
        for line in stdin_lines:
            proc.stdin.write((line + "\n").encode())
        proc.stdin.flush()
        calls = _read_calls(log, wait_for)
    finally:
        proc.kill()
        _, err = proc.communicate(timeout=10)
    assert wait_for.issubset({c["call"] for c in calls}), \
        (calls, err.decode(errors="replace"))
    return calls


def test_all_table_devices_have_scripts():
    for device in GR_DEVICES:
        for direction in device.directions:
            path = os.path.join(SCRIPTS_DIR,
                                f"{device.script_stem}_{direction}.py")
            assert os.path.isfile(path), path


def test_script_names_match_base_thread_lookup():
    # AbstractBaseThread.device_script_name lowers + strips "-"/" "
    from urh_tpu.dev.gr.base_thread import ReceiverThread

    for name in ("HackRF", "RTL-SDR", "USRP", "AirSpy", "SDRPlay"):
        t = ReceiverThread(433e6, 2e6, 1e6, 20, 20, 16)
        t.device = name
        assert os.path.isfile(os.path.join(SCRIPTS_DIR, t.device_script_name)), name


def test_hackrf_recv_parameter_wiring(fake_gr_env):
    env, log = fake_gr_env
    calls = _run_script(
        "hackrf_recv.py", env,
        ["--samplerate", "2000000", "--freq", "433920000", "--gain", "30",
         "--if-gain", "24", "--bb-gain", "18", "--bandwidth", "1750000",
         "--port", "2345"],
        stdin_lines=["F:868000000"],
        wait_for={"source", "set_center_freq", "set_if_gain"},
        log=log)
    by_call = {}
    for c in calls:
        by_call.setdefault(c["call"], []).append(c)
    assert "hackrf" in by_call["source"][0]["args"]
    assert by_call["set_sample_rate"][0]["value"][0] == 2000000
    assert by_call["set_gain"][0]["value"][0] == 30
    assert by_call["set_if_gain"][0]["value"][0] == 24
    assert by_call["set_bb_gain"][0]["value"][0] == 18
    assert by_call["set_bandwidth"][0]["value"][0] == 1750000
    # stdin retune applied
    freqs = [c["value"][0] for c in by_call["set_center_freq"]]
    assert 433920000 in freqs
    assert 868000000 in freqs or len(freqs) == 1  # retune may race kill


def test_rtlsdr_recv_direct_sampling_and_freq_correction(fake_gr_env):
    env, log = fake_gr_env
    calls = _run_script(
        "rtlsdr_recv.py", env,
        ["--freq", "100000000", "--freq-correction", "42",
         "--direct-sampling", "2"],
        wait_for={"source", "set_freq_corr", "set_direct_sampling"},
        log=log)
    by_call = {c["call"]: c for c in calls}
    assert "rtl=0" in by_call["source"]["args"]
    assert by_call["set_freq_corr"]["value"][0] == 42
    assert by_call["set_direct_sampling"]["value"][0] == 2


def test_usrp_send_uses_sink_and_antenna(fake_gr_env):
    env, log = fake_gr_env
    calls = _run_script(
        "usrp_send.py", env,
        ["--freq", "433920000", "--antenna-index", "1"],
        wait_for={"sink", "set_antenna"},
        log=log)
    by_call = {c["call"]: c for c in calls}
    assert "uhd" in by_call["sink"]["args"]
    assert by_call["set_antenna"]["value"][0] == "RX2"


def test_funcube_has_no_if_bb_gain_stage(fake_gr_env):
    env, log = fake_gr_env
    calls = _run_script(
        "funcube_recv.py", env, ["--freq", "100000000"],
        wait_for={"source", "set_gain"}, log=log)
    names = {c["call"] for c in calls}
    assert "set_if_gain" not in names
    assert "set_bb_gain" not in names


def test_device_table_is_consistent():
    stems = devices_by_stem()
    assert len(stems) == len(GR_DEVICES)
    for device in GR_DEVICES:
        assert set(device.directions) <= {"recv", "send"}
