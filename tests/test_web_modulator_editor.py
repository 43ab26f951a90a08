"""Modulator editor over the web API: create/edit modulators, per-
message assignment, waveform preview PNG golden, and the edited
modulator's IQ demodulating back to the table's bits (reference:
controller/dialogs/ModulatorDialog.py, Modulator.py:29-74)."""

import json
import threading
from http.client import HTTPConnection

import numpy as np
import pytest

from urh_tpu.ui.web import WebUI, make_server


@pytest.fixture()
def server():
    srv = make_server(WebUI(), host="127.0.0.1", port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()
    srv.server_close()


def call(srv, method, path, body=None):
    conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=30)
    payload = json.dumps(body) if body is not None else None
    conn.request(method, path, body=payload,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


def call_raw(srv, method, path):
    conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=30)
    conn.request(method, path)
    resp = conn.getresponse()
    data = resp.read()
    ctype = resp.getheader("Content-Type")
    conn.close()
    return resp.status, data, ctype


def test_modulator_list_and_edit(server):
    status, r = call(server, "GET", "/api/generator/modulators")
    assert status == 200 and len(r["modulators"]) == 1
    default = r["modulators"][0]
    assert default["modulation_type"] == "ASK"
    assert default["parameters"] == [0.0, 100.0]

    status, m = call(server, "POST", "/api/generator/modulator",
                     {"action": "edit", "index": 0,
                      "modulation_type": "FSK",
                      "carrier_freq_hz": 55e3, "samples_per_symbol": 80,
                      "parameters": [10e3, 20e3]})
    assert status == 200
    assert m["modulation_type"] == "FSK"
    assert m["carrier_freq_hz"] == 55e3
    assert m["samples_per_symbol"] == 80
    assert m["parameters"] == [10e3, 20e3]
    assert "Frequenc" in m["parameter_type"]

    # bits_per_symbol change demands a matching parameter grid
    status, r = call(server, "POST", "/api/generator/modulator",
                     {"action": "edit", "index": 0, "bits_per_symbol": 2,
                      "parameters": [10e3, 20e3]})
    assert status == 400 and "4 parameters" in r["error"]
    status, m = call(server, "POST", "/api/generator/modulator",
                     {"action": "edit", "index": 0, "bits_per_symbol": 2,
                      "parameters": [-20e3, -10e3, 10e3, 20e3]})
    assert status == 200 and m["parameters"] == [-20e3, -10e3, 10e3, 20e3]


def test_modulator_create_assign_delete(server):
    status, m = call(server, "POST", "/api/generator/modulator",
                     {"action": "create", "name": "alt",
                      "modulation_type": "PSK",
                      "parameters": [0.0, 180.0]})
    assert status == 200 and m["index"] == 1 and m["name"] == "alt"
    status, r = call(server, "GET", "/api/generator/modulators")
    assert [x["name"] for x in r["modulators"]] == ["Modulator", "alt"]

    # assignment against an out-of-range modulator is rejected
    status, r = call(server, "POST", "/api/generator/message_modulator",
                     {"modulator_index": 5})
    assert status == 400

    status, r = call(server, "POST", "/api/generator/modulator",
                     {"action": "delete", "index": 1})
    assert status == 200 and r["modulators"] == ["Modulator"]

    status, r = call(server, "POST", "/api/generator/modulator",
                     {"action": "delete", "index": 0})
    assert status == 400 and "last modulator" in r["error"]


def test_edited_modulator_generates_demodulatable_iq(server, tmp_path):
    """VERDICT gate: edit a modulator over HTTP, generate, and the
    produced IQ demodulates back to the table's bits."""
    from tests.golden import get_path_for_data_file

    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100,
          "center": 0.0})
    status, r = call(server, "POST", "/api/generator/add", {"signal_id": 0})
    assert status == 200 and r["rows"] == 1
    status, table = call(server, "GET", "/api/generator/table")
    bits = table["rows"][0]["data"]

    # edit: different sps + carrier, explicit FSK params
    status, m = call(server, "POST", "/api/generator/modulator",
                     {"action": "edit", "index": 0,
                      "modulation_type": "FSK", "samples_per_symbol": 60,
                      "carrier_freq_hz": 40e3, "sample_rate": 1e6,
                      "parameters": [-20e3, 20e3]})
    assert status == 200

    status, r = call(server, "POST", "/api/generator/message_modulator",
                     {"modulator_index": 0})
    assert status == 200

    out = tmp_path / "gen.complex"
    status, r = call(server, "POST", "/api/generator/generate",
                     {"filename": str(out)})
    assert status == 200 and out.exists()

    import urh_tpu as ut

    sig = ut.Signal.from_file(str(out))
    sig.modulation_type = "FSK"
    sig.samples_per_symbol = 60
    sig.center = 0.0
    sig.noise_threshold = 0.01
    pa = ut.ProtocolAnalyzer(sig)
    pa.get_protocol_from_signal()
    assert pa.plain_bits_str == [bits]


def test_modulator_preview_png_golden(server):
    """The preview endpoint must byte-match rendering the same
    modulated waveform through the rasterizer (deterministic golden)."""
    from urh_tpu.dsp.modulator import Modulator
    from urh_tpu.ui.plots import render_waveform_rgba
    from urh_tpu.ui.png import encode_rgba

    call(server, "POST", "/api/generator/modulator",
         {"action": "edit", "index": 0, "modulation_type": "FSK",
          "samples_per_symbol": 50, "parameters": [-10e3, 10e3],
          "display_bits": "1010"})
    status, png, ctype = call_raw(
        server, "GET",
        "/api/generator/modulator_preview?index=0&width=400&height=100")
    assert status == 200 and ctype == "image/png"
    assert png.startswith(b"\x89PNG\r\n\x1a\n")

    m = Modulator("golden")
    m.modulation_type = "FSK"
    m.samples_per_symbol = 50
    import array
    m.parameters = array.array("f", [-10e3, 10e3])
    iq = m.modulate([True, False, True, False], pause=0, dtype=np.float32)
    expected = encode_rgba(render_waveform_rgba(iq.data[:, 0], 400, 100))
    assert png == expected

    # explicit bits override + bad input rejection
    status, png2, _ = call_raw(
        server, "GET",
        "/api/generator/modulator_preview?index=0&bits=1100&width=400&height=100")
    assert status == 200 and png2 != png
    status, err, _ = call_raw(
        server, "GET", "/api/generator/modulator_preview?index=0&bits=xy")
    assert status == 400
