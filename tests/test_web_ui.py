"""Interactive web application: drive the full 4-tab workflow over HTTP
against the golden FSK capture (the browser page calls exactly these
endpoints)."""

import json
import threading
from http.client import HTTPConnection

import pytest

from tests.golden import get_path_for_data_file
from urh_tpu.ui.web import PAGE, WebUI, make_server


@pytest.fixture()
def server():
    srv = make_server(WebUI(), host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
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


def test_page_and_state(server):
    conn = HTTPConnection("127.0.0.1", server.server_address[1], timeout=10)
    conn.request("GET", "/")
    resp = conn.getresponse()
    assert resp.status == 200
    html = resp.read().decode()
    assert "Interpretation" in html and "Generator" in html
    conn.close()

    status, state = call(server, "GET", "/api/state")
    assert status == 200
    assert state["signals"] == []


def test_interpretation_to_generator_workflow(server):
    # open the golden capture
    status, sig = call(server, "POST", "/api/signal/open",
                       {"path": get_path_for_data_file("fsk.complex")})
    assert status == 200 and sig["id"] == 0

    # set demod parameters and demodulate
    status, params = call(server, "POST", "/api/signal/0/params",
                          {"modulation_type": "FSK",
                           "samples_per_symbol": 100, "center": 0.0})
    assert status == 200 and params["samples_per_symbol"] == 100

    status, msgs = call(server, "GET", "/api/signal/0/messages?view=0")
    assert status == 200 and len(msgs["messages"]) == 1
    assert msgs["messages"][0].startswith("10101010")

    # envelope plot for the canvas
    status, plot = call(server, "GET", "/api/signal/0/plot")
    assert status == 200
    assert len(plot["x"]) == len(plot["y"]) > 100

    # hand to analysis, read hex rows
    status, r = call(server, "POST", "/api/analysis/add", {"signal_id": 0})
    assert status == 200 and r["rows"] == 1
    status, rows = call(server, "GET", "/api/analysis/rows?view=1&decoded=1")
    assert rows["rows"][0]["data"].startswith("aaaaaaaa")

    # hand to generator, fuzz does nothing without labels but the table
    # and modulation estimates must work
    status, r = call(server, "POST", "/api/generator/add", {"signal_id": 0})
    assert status == 200 and r["rows"] == 1
    status, table = call(server, "GET", "/api/generator/table")
    assert table["total_samples"] > 0 and len(table["rows"]) == 1

    status, r = call(server, "POST", "/api/generator/pause", {"pause": 500})
    assert status == 200
    status, table = call(server, "GET", "/api/generator/table")
    assert table["rows"][0]["pause"] == 500

    status, gen = call(server, "POST", "/api/generator/generate", {})
    assert status == 200 and gen["samples"] > 0


def test_autodetect_and_undo(server):
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    status, det = call(server, "POST", "/api/signal/0/autodetect")
    assert status == 200 and det["success"]
    assert det["params"]["samples_per_symbol"] == 100

    # a parameter change must be undoable
    before = det["params"]["center"]
    call(server, "POST", "/api/signal/0/params", {"center": 0.42})
    status, r = call(server, "POST", "/api/signal/0/undo")
    assert status == 200
    assert r["params"]["center"] == pytest.approx(before)


def test_analysis_decodings_and_awre(server):
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100, "center": 0.0})
    call(server, "POST", "/api/analysis/add", {"signal_id": 0})

    status, decs = call(server, "GET", "/api/analysis/decodings")
    assert status == 200 and len(decs["decodings"]) >= 1

    status, r = call(server, "POST", "/api/analysis/decoding",
                     {"decoding_index": 0})
    assert status == 200

    status, awre = call(server, "POST", "/api/analysis/awre")
    assert status == 200 and isinstance(awre["message_types"], list)


def test_error_handling(server):
    status, r = call(server, "POST", "/api/signal/open",
                     {"path": "/nonexistent.complex"})
    assert status in (400, 500) and "error" in r

    status, r = call(server, "GET", "/api/signal/7/messages")
    assert status == 400 and "error" in r

    status, r = call(server, "GET", "/api/nope")
    assert status == 404


def test_page_references_only_existing_routes():
    """Every /api/ URL the embedded page calls must have a route."""
    import re

    from urh_tpu.ui.web import ROUTES

    called = set(re.findall(r"/api/[a-z_/]+(?=['\"?]|\'\+)", PAGE))
    patterns = [p for _, p, _ in ROUTES]
    for url in called:
        url_probe = re.sub(r"\d+", "0", url)
        assert any(re.fullmatch(p.replace(r"(\d+)", r"\d+"), url_probe)
                   or p.startswith(url_probe.rstrip("/"))
                   for p in patterns), f"page calls unknown endpoint {url}"


def test_simulator_run_controls(server):
    """Start/stop a (trivial) simulation over HTTP against the Network
    SDR loopback and read its log."""
    status, r = call(server, "GET", "/api/simulator/items")
    assert status == 200 and r["items"] == []

    status, r = call(server, "POST", "/api/simulator/start",
                     {"noise": 0.01, "samples_per_symbol": 100})
    assert status == 200

    import time
    time.sleep(0.3)
    status, log = call(server, "GET", "/api/simulator/log")
    assert status == 200 and isinstance(log["log"], list)

    status, r = call(server, "POST", "/api/simulator/stop", {})
    assert status == 200 and r["running"] is False


def call_raw(srv, method, path):
    conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=30)
    conn.request(method, path)
    resp = conn.getresponse()
    data = resp.read()
    ctype = resp.getheader("Content-Type")
    conn.close()
    return resp.status, data, ctype


def test_spectrogram_endpoint_per_colormap_golden(server):
    """PNG response must byte-match re-encoding the canonical spectrogram
    pixels for each colormap (SignalFrame spectrogram-view parity)."""
    import struct

    import numpy as np

    from urh_tpu.dsp.spectrogram import Spectrogram
    from urh_tpu.ui.png import encode_bgra
    from urh_tpu.util import colormaps

    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})

    status, maps = call(server, "GET", "/api/colormaps")
    assert status == 200 and "magma" in maps["colormaps"]

    raw = np.fromfile(get_path_for_data_file("fsk.complex"),
                      np.complex64)
    spec = Spectrogram(raw)
    data = spec._calculate_spectrogram(spec.samples)

    images = {}
    for cmap in ("magma", "viridis", "grayscale"):
        status, png, ctype = call_raw(
            server, "GET", f"/api/signal/0/spectrogram?colormap={cmap}")
        assert status == 200 and ctype == "image/png"
        assert png.startswith(b"\x89PNG\r\n\x1a\n")
        w, h = struct.unpack(">II", png[16:24])
        # _calculate_spectrogram returns (time, freq); the image renders
        # frequency vertically
        assert (h, w) == (data.shape[1], data.shape[0])

        expected = Spectrogram.create_image(
            data, colormaps.calculate_numpy_brga_for(cmap),
            spec.data_min, spec.data_max)
        assert png == encode_bgra(expected), f"{cmap} render diverged"
        images[cmap] = png
    assert images["magma"] != images["viridis"] != images["grayscale"]

    status, _, _ = call_raw(server, "GET",
                            "/api/signal/0/spectrogram?colormap=nope")
    assert status == 400


def test_analysis_label_create_edit_delete(server):
    """Label table editing over HTTP (CompareFrameController depth)."""
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100, "center": 0.0})
    call(server, "POST", "/api/analysis/add", {"signal_id": 0})

    # create a label over bits [0, 16) of message 0
    status, r = call(server, "POST", "/api/analysis/label",
                     {"action": "create", "message": 0, "start": 0,
                      "end": 15, "view": 0, "name": "preamble16"})
    assert status == 200
    assert any(l["name"] == "preamble16" and l["start"] == 0 and l["end"] == 16
               for l in r["labels"]), r

    # the labels must show up on the analysis rows
    status, rows = call(server, "GET", "/api/analysis/rows?view=0&decoded=1")
    assert any(l["name"] == "preamble16" for l in rows["rows"][0]["labels"])

    idx = next(i for i, l in enumerate(r["labels"])
               if l["name"] == "preamble16")
    status, r = call(server, "POST", "/api/analysis/label",
                     {"action": "edit", "message": 0, "label": idx,
                      "name": "sync", "start": 16, "end": 31})
    assert status == 200
    assert any(l["name"] == "sync" and l["start"] == 16 and l["end"] == 32
               for l in r["labels"]), r

    idx = next(i for i, l in enumerate(r["labels"]) if l["name"] == "sync")
    status, r = call(server, "POST", "/api/analysis/label",
                     {"action": "delete", "message": 0, "label": idx})
    assert status == 200
    assert not any(l["name"] == "sync" for l in r["labels"])

    # bad indices surface as 400s
    status, r = call(server, "POST", "/api/analysis/label",
                     {"action": "delete", "message": 0, "label": 99})
    assert status == 400
    status, r = call(server, "POST", "/api/analysis/label",
                     {"action": "create", "message": 42, "start": 0, "end": 3})
    assert status == 400


def test_in_table_cell_editing(server):
    """Bit/hex cell editing over HTTP on analysis and generator tables
    (reference: writeable ProtocolTableModel / GeneratorTableModel)."""
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100, "center": 0.0})
    call(server, "POST", "/api/analysis/add", {"signal_id": 0})
    call(server, "POST", "/api/generator/add", {"signal_id": 0})

    # flip bit 0 of analysis message 0 (starts 1010... -> flip to 0)
    status, r = call(server, "POST", "/api/analysis/cell",
                     {"row": 0, "col": 0, "value": "0", "view": 0})
    assert status == 200 and r["data"].startswith("00101010"), r

    # hex nibble edit on the generator table
    status, r = call(server, "POST", "/api/generator/cell",
                     {"row": 0, "col": 0, "value": "f", "view": 1})
    assert status == 200 and r["data"].startswith("f"), r

    # invalid value rejected
    status, r = call(server, "POST", "/api/analysis/cell",
                     {"row": 0, "col": 0, "value": "x", "view": 0})
    assert status == 400


def test_fuzzing_label_and_values_over_http(server):
    """Create a fuzzing label, populate value ranges, run fuzzing
    (reference: FuzzingDialog + generator fuzz buttons)."""
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100, "center": 0.0})
    call(server, "POST", "/api/generator/add", {"signal_id": 0})

    status, lbl = call(server, "POST", "/api/generator/fuzz_label",
                       {"message": 0, "start": 8, "end": 16})
    assert status == 200 and len(lbl["values"]) >= 1

    status, vals = call(server, "POST", "/api/generator/fuzz_values",
                        {"message": 0, "label": lbl["label"],
                         "mode": "range", "start": 1, "end": 5})
    assert status == 200 and len(vals["values"]) >= 5

    status, table = call(server, "GET", "/api/generator/table")
    rows_before = len(table["rows"])
    status, r = call(server, "POST", "/api/generator/fuzz",
                     {"mode": "successive"})
    assert status == 200 and r["rows"] > rows_before

    status, r = call(server, "POST", "/api/generator/fuzz_values",
                     {"message": 0, "label": 99, "mode": "range",
                      "start": 0, "end": 1})
    assert status == 400


def test_project_save_and_open_roundtrip(server, tmp_path):
    """Project persistence over HTTP: save signals + params, reload into
    a fresh app (MainController open/save project)."""
    import shutil

    capture = tmp_path / "cap.complex"
    shutil.copy(get_path_for_data_file("fsk.complex"), capture)

    call(server, "POST", "/api/signal/open", {"path": str(capture)})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 123, "center": 0.25})
    status, r = call(server, "POST", "/api/project/save",
                     {"path": str(tmp_path)})
    assert status == 200 and r["saved"].endswith("URHProject.xml")

    # a fresh server must restore the signal with its stored parameters
    import threading

    from urh_tpu.ui.web import WebUI, make_server
    srv2 = make_server(WebUI(), host="127.0.0.1", port=0)
    t = threading.Thread(target=srv2.serve_forever, daemon=True)
    t.start()
    try:
        status, state = call(srv2, "POST", "/api/project/open",
                             {"path": str(tmp_path)})
        assert status == 200 and len(state["signals"]) == 1
        params = state["signals"][0]["params"]
        assert params["samples_per_symbol"] == 123
        assert params["center"] == pytest.approx(0.25)
    finally:
        srv2.shutdown()
        srv2.server_close()


def test_signal_edit_operations_over_http(server):
    """Delete/mute/crop/filter a sample range with undo (SignalFrame
    edit-menu depth)."""
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    status, before = call(server, "GET", "/api/state")
    n0 = before["signals"][0]["num_samples"]

    status, sel = call(server, "GET",
                       "/api/signal/0/selection?start=0&end=2000")
    assert status == 200 and sel

    status, r = call(server, "POST", "/api/signal/0/edit",
                     {"action": "delete", "start": 0, "end": 1000})
    assert status == 200 and r["num_samples"] == n0 - 1000

    status, r = call(server, "POST", "/api/signal/0/edit",
                     {"action": "mute", "start": 0, "end": 500})
    assert status == 200

    status, r = call(server, "POST", "/api/signal/0/undo")
    assert status == 200  # un-mute

    status, r = call(server, "POST", "/api/signal/0/edit",
                     {"action": "filter", "start": 0, "end": 2000,
                      "cutoff": 0.1, "bw": 0.05})
    assert status == 200

    status, r = call(server, "POST", "/api/signal/0/edit",
                     {"action": "crop", "start": 0, "end": 5000})
    assert status == 200 and r["num_samples"] == 5000

    status, r = call(server, "POST", "/api/signal/0/edit",
                     {"action": "nope"})
    assert status == 400


def test_signal_copy_paste_over_http(server):
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    status, before = call(server, "GET", "/api/state")
    n0 = before["signals"][0]["num_samples"]

    status, r = call(server, "POST", "/api/signal/0/edit",
                     {"action": "copy", "start": 0, "end": 1000})
    assert status == 200
    status, r = call(server, "POST", "/api/signal/0/edit",
                     {"action": "paste", "position": 0})
    assert status == 200 and r["num_samples"] == n0 + 1000


def test_table_undo_depth(server):
    """Analysis and generator table edits are undoable from the app
    (reference: ui/actions on the QUndoStack — Missing #6 in r4)."""
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100,
          "center": 0.0})
    call(server, "POST", "/api/analysis/add", {"signal_id": 0})
    status, before = call(server, "GET", "/api/analysis/rows?view=0&decoded=0")
    bits_before = before["rows"][0]["data"]

    # undoable analysis range delete
    status, r = call(server, "POST", "/api/analysis/delete_range",
                     {"msg_start": 0, "msg_end": 0, "index_start": 0,
                      "index_end": 7, "view": 0})
    assert status == 200 and r["can_undo"]
    status, after = call(server, "GET", "/api/analysis/rows?view=0&decoded=0")
    assert after["rows"][0]["data"] == bits_before[8:]
    status, r = call(server, "POST", "/api/analysis/undo",
                     {"action": "undo"})
    assert status == 200 and r["can_redo"]
    status, restored = call(server, "GET",
                            "/api/analysis/rows?view=0&decoded=0")
    assert restored["rows"][0]["data"] == bits_before

    # generator: insert column, undo; clear, undo
    call(server, "POST", "/api/generator/add", {"signal_id": 0})
    status, table = call(server, "GET", "/api/generator/table")
    gen_bits = table["rows"][0]["data"]
    status, r = call(server, "POST", "/api/generator/insert_column",
                     {"index": 4, "view": 0})
    assert status == 200 and r["can_undo"]
    status, table = call(server, "GET", "/api/generator/table")
    assert table["rows"][0]["data"] == gen_bits[:4] + "0" + gen_bits[4:]
    call(server, "POST", "/api/generator/undo", {"action": "undo"})
    status, table = call(server, "GET", "/api/generator/table")
    assert table["rows"][0]["data"] == gen_bits

    status, r = call(server, "POST", "/api/generator/clear", {})
    assert status == 200
    status, table = call(server, "GET", "/api/generator/table")
    assert table["rows"] == []
    call(server, "POST", "/api/generator/undo", {"action": "undo"})
    status, table = call(server, "GET", "/api/generator/table")
    assert table["rows"][0]["data"] == gen_bits

    # status action reports without mutating; redo cleared by the undo
    status, r = call(server, "POST", "/api/generator/undo",
                     {"action": "status"})
    assert status == 200 and r["can_undo"] is True


def test_undo_status_reports_real_stack_state(server):
    """A fresh stack must report can_undo/can_redo False (regression:
    bound methods truthy-reported as always-true)."""
    status, r = call(server, "POST", "/api/analysis/undo",
                     {"action": "status"})
    assert status == 200
    assert r["can_undo"] is False and r["can_redo"] is False
    assert r["depth"] == 0


def test_csv_import_route(server, tmp_path):
    """CSV capture -> signal via the CSVImportDialog counterpart."""
    import numpy as np

    t = np.arange(2000) / 1e6
    i = np.cos(2 * np.pi * 10e3 * t).astype(np.float32)
    q = np.sin(2 * np.pi * 10e3 * t).astype(np.float32)
    path = tmp_path / "cap.csv"
    with open(path, "w") as f:
        for k in range(len(t)):
            f.write(f"{t[k]:.9f};{i[k]:.6f};{q[k]:.6f}\n")

    status, sig = call(server, "POST", "/api/signal/import_csv",
                       {"path": str(path), "separator": ";",
                        "i_column": 1, "q_column": 2, "t_column": 0})
    assert status == 200
    assert sig["num_samples"] == 2000
    # timestamps recovered the sample rate
    assert sig["params"]["sample_rate"] == pytest.approx(1e6, rel=0.01)


def test_bandpass_filter_creates_new_signal(server):
    """Bandpass a two-tone capture: the passband tone survives, the
    stopband tone is suppressed (SignalFrame's spectrogram bandpass)."""
    import numpy as np

    n = 1 << 14
    t = np.arange(n)
    tone_in = np.exp(2j * np.pi * 0.1 * t)   # +0.1 normalized (passband)
    tone_out = np.exp(-2j * np.pi * 0.3 * t)  # -0.3 normalized (stopband)
    mix = (tone_in + tone_out).astype(np.complex64)

    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "two_tone.complex")
    mix.tofile(path)
    status, sig = call(server, "POST", "/api/signal/open", {"path": path})
    assert status == 200

    status, filt = call(server, "POST",
                        f"/api/signal/{sig['id']}/bandpass",
                        {"f_low": 0.05, "f_high": 0.15, "bw": 0.05})
    assert status == 200
    assert filt["id"] == sig["id"] + 1
    assert "filtered" in filt["name"]
    assert filt["num_samples"] == n

    from urh_tpu.ui.web import WebUI  # reach into the live server state
    ui = server.RequestHandlerClass.ui
    data = ui.main.signal_frames[filt["id"]].signal.iq_array.as_complex64()
    spec = np.abs(np.fft.fft(data[1000:1000 + 4096]))
    freqs = np.fft.fftfreq(4096)
    power_in = spec[np.argmin(np.abs(freqs - 0.1))]
    power_out = spec[np.argmin(np.abs(freqs + 0.3))]
    assert power_in > 50 * power_out, (power_in, power_out)


def test_signal_save_and_analysis_export(server, tmp_path):
    """Save-as round-trips the samples; protocol export writes XML and
    PCAPNG the protocol layer can parse back."""
    import numpy as np

    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100,
          "center": 0.0})

    out = tmp_path / "copy.complex"
    status, r = call(server, "POST", "/api/signal/0/save",
                     {"path": str(out)})
    assert status == 200 and out.exists()
    orig = np.fromfile(get_path_for_data_file("fsk.complex"), np.float32)
    np.testing.assert_array_equal(np.fromfile(out, np.float32), orig)

    call(server, "POST", "/api/analysis/add", {"signal_id": 0})
    xml_path = tmp_path / "proto.xml"
    status, r = call(server, "POST", "/api/analysis/export",
                     {"path": str(xml_path), "format": "xml"})
    assert status == 200 and r["messages"] == 1 and xml_path.exists()
    assert b"<protocol" in xml_path.read_bytes()

    # the export must be RE-IMPORTABLE with its bits intact
    status, rows = call(server, "GET", "/api/analysis/rows?view=0&decoded=0")
    exported_bits = rows["rows"][0]["data"]
    from urh_tpu.protocol.analyzer import ProtocolAnalyzer
    pa2 = ProtocolAnalyzer(None)
    pa2.from_xml_file(str(xml_path), read_bits=True)
    assert len(pa2.messages) == 1
    assert pa2.plain_bits_str[0] == exported_bits

    pcap_path = tmp_path / "proto.pcapng"
    status, r = call(server, "POST", "/api/analysis/export",
                     {"path": str(pcap_path), "format": "pcapng"})
    assert status == 200 and pcap_path.exists()
    assert pcap_path.stat().st_size > 24  # SHB + IDB + EPB present

    status, r = call(server, "POST", "/api/analysis/export",
                     {"path": str(tmp_path / "x"), "format": "bogus"})
    assert status == 400


def test_generator_fuzz_profile_roundtrip(server, tmp_path):
    """Create a fuzzing label, save the profile, clear, load it back
    (the reference generator tab's fuzz-profile menu)."""
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100,
          "center": 0.0})
    call(server, "POST", "/api/generator/add", {"signal_id": 0})
    status, lbl = call(server, "POST", "/api/generator/fuzz_label",
                       {"message": 0, "start": 8, "end": 16})
    assert status == 200

    path = tmp_path / "profile.fuzz.xml"
    status, r = call(server, "POST", "/api/generator/profile",
                     {"action": "save", "path": str(path)})
    assert status == 200 and path.exists()

    status, r = call(server, "POST", "/api/generator/clear", {})
    status, table = call(server, "GET", "/api/generator/table")
    assert table["rows"] == []

    status, r = call(server, "POST", "/api/generator/profile",
                     {"action": "load", "path": str(path)})
    assert status == 200 and r["rows"] == 1
    status, table = call(server, "GET", "/api/generator/table")
    assert len(table["rows"]) == 1

    # a missing/unparseable profile is a 400, not silent success
    status, r = call(server, "POST", "/api/generator/profile",
                     {"action": "load", "path": str(tmp_path / "no.xml")})
    assert status == 400


def test_generator_fuzz_profile_preserves_modulators(server, tmp_path):
    """Modulator definitions ride along in the saved profile and are
    restored on load (message modulator indices refer to them)."""
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100,
          "center": 0.0})
    call(server, "POST", "/api/generator/add", {"signal_id": 0})
    call(server, "POST", "/api/generator/modulator",
         {"action": "edit", "index": 0, "name": "custom77",
          "modulation_type": "FSK", "samples_per_symbol": 77,
          "parameters": [-15e3, 15e3]})

    path = tmp_path / "with_mods.fuzz.xml"
    status, r = call(server, "POST", "/api/generator/profile",
                     {"action": "save", "path": str(path)})
    assert status == 200 and r["modulators"] == 1

    # fresh app: load restores the custom modulator
    import threading as _threading

    from urh_tpu.ui.web import WebUI, make_server
    srv2 = make_server(WebUI(), host="127.0.0.1", port=0)
    _threading.Thread(target=srv2.serve_forever, daemon=True).start()
    try:
        status, r = call(srv2, "POST", "/api/generator/profile",
                         {"action": "load", "path": str(path)})
        assert status == 200 and r["rows"] == 1
        status, mods = call(srv2, "GET", "/api/generator/modulators")
        assert mods["modulators"][0]["name"] == "custom77"
        assert mods["modulators"][0]["samples_per_symbol"] == 77
    finally:
        srv2.shutdown()
        srv2.server_close()


def test_message_type_crud_and_ruleset_assignment(server):
    """MessageTypeDialog workflow: create a type, author an assignment
    ruleset, and watch automatic re-assignment apply it (Ruleset.py
    semantics)."""
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100,
          "center": 0.0})
    call(server, "POST", "/api/analysis/add", {"signal_id": 0})

    status, types = call(server, "GET", "/api/analysis/message_types")
    assert status == 200 and types["message_types"][0]["name"] == "Default"

    status, mt = call(server, "POST", "/api/analysis/message_type",
                      {"action": "create", "name": "preamble frames"})
    assert status == 200 and mt["name"] == "preamble frames"
    index = mt["index"]

    # ruleset: first 8 decoded bits == 10101010 -> auto-assign
    status, mt = call(server, "POST", "/api/analysis/message_type",
                      {"action": "edit", "index": index,
                       "assigned_by_ruleset": True,
                       "ruleset": {"mode": "all_apply", "rules": [
                           {"start": 0, "end": 7, "operator": "=",
                            "target_value": "10101010",
                            "value_type": 0}]}})
    assert status == 200
    assert mt["rules"][0]["operator_description"]
    # the golden FSK message starts 10101010 -> rule matched it
    assert mt["messages"] == [0], mt

    status, rows = call(server, "GET", "/api/analysis/rows?view=0&decoded=1")
    assert rows["rows"][0]["type"] == "preamble frames"

    # manual assignment + rename + delete falls back to Default
    status, mt = call(server, "POST", "/api/analysis/message_type",
                      {"action": "edit", "index": index,
                       "name": "renamed"})
    assert status == 200 and mt["name"] == "renamed"
    status, r = call(server, "POST", "/api/analysis/message_type",
                     {"action": "delete", "index": index})
    assert status == 200 and r["message_types"] == ["Default"]
    status, rows = call(server, "GET", "/api/analysis/rows?view=0&decoded=1")
    assert rows["rows"][0]["type"] == "Default"

    # the default type cannot be deleted
    status, r = call(server, "POST", "/api/analysis/message_type",
                     {"action": "delete", "index": 0})
    assert status == 400


def test_plugin_actions_insert_sine_and_message_break(server):
    """InsertSine and MessageBreak plugin workflows over HTTP, both
    undoable (reference plugin GUI actions)."""
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    status, st = call(server, "GET", "/api/state")
    n0 = st["signals"][0]["num_samples"]

    status, sig = call(server, "POST", "/api/signal/0/insert_sine",
                       {"position": 1000, "amplitude": 0.4,
                        "frequency": 20e3, "num_samples": 5000})
    assert status == 200
    assert sig["num_samples"] == n0 + 5000
    status, r = call(server, "POST", "/api/signal/0/undo")
    assert status == 200
    status, st = call(server, "GET", "/api/state")
    assert st["signals"][0]["num_samples"] == n0

    status, r = call(server, "POST", "/api/signal/0/insert_sine",
                     {"position": -5, "num_samples": 100})
    assert status == 400

    # message break: split the golden message behind bit 32
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100,
          "center": 0.0})
    call(server, "POST", "/api/analysis/add", {"signal_id": 0})
    status, rows = call(server, "GET", "/api/analysis/rows?view=0&decoded=0")
    bits = rows["rows"][0]["data"]

    status, r = call(server, "POST", "/api/analysis/message_break",
                     {"message": 0, "position": 32, "view": 0})
    assert status == 200 and r["rows"] == 2 and r["can_undo"]
    status, rows = call(server, "GET", "/api/analysis/rows?view=0&decoded=0")
    assert rows["rows"][0]["data"] == bits[:32]
    assert rows["rows"][1]["data"] == bits[32:]

    status, r = call(server, "POST", "/api/analysis/undo",
                     {"action": "undo"})
    assert status == 200
    status, rows = call(server, "GET", "/api/analysis/rows?view=0&decoded=0")
    assert len(rows["rows"]) == 1 and rows["rows"][0]["data"] == bits


def test_zero_hide_plugin_action(server):
    """ZeroHide hides long zero runs from the decoded view and is
    restorable (undo)."""
    call(server, "POST", "/api/signal/open",
         {"path": get_path_for_data_file("fsk.complex")})
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "samples_per_symbol": 100,
          "center": 0.0})
    call(server, "POST", "/api/analysis/add", {"signal_id": 0})
    status, rows = call(server, "GET", "/api/analysis/rows?view=0&decoded=1")
    bits = rows["rows"][0]["data"]
    assert "00000" in bits

    status, r = call(server, "POST", "/api/analysis/zero_hide",
                     {"following_zeros": 5, "view": 0})
    assert status == 200 and r["can_undo"]
    status, rows = call(server, "GET", "/api/analysis/rows?view=0&decoded=1")
    hidden = rows["rows"][0]["data"]
    assert len(hidden) < len(bits)
    assert "00000" not in hidden

    status, r = call(server, "POST", "/api/analysis/zero_hide",
                     {"action": "restore"})
    assert status == 200
    status, rows = call(server, "GET", "/api/analysis/rows?view=0&decoded=1")
    assert rows["rows"][0]["data"] == bits

    status, r = call(server, "POST", "/api/analysis/zero_hide",
                     {"following_zeros": 0})
    assert status == 400
