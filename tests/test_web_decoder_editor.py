"""Decoding-chain editor over the web API: build the CC1101
data-whitening chain from the primitive list, preview it live, apply it
to the golden capture, and round-trip it through project save/open
(reference: controller/dialogs/DecoderDialog.py chain build + preview;
Encoding.py:120-187 chain format)."""

import json
import threading
from http.client import HTTPConnection

import pytest

from tests.golden import get_path_for_data_file
from urh_tpu.ui.web import WebUI, make_server

CC1101_PLAIN_HEX = "aaaaaaaa9a7d9a7dfc99ff1398fb8"
CC1101_DECODED_HEX = "aaaaaaaa9a7d9a7d0378e289757e"
WHITENING_PARAM = "0x9a7d9a7d;0x21;0"


def make_srv(ui=None):
    srv = make_server(ui or WebUI(), host="127.0.0.1", port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


@pytest.fixture()
def server():
    srv = make_srv()
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


def whitening_name(server):
    status, prims = call(server, "GET", "/api/decoding/primitives")
    assert status == 200
    entry = next(p for p in prims["primitives"]
                 if p["key"] == "data_whitening")
    assert entry["takes_param"] and entry["param_default"]
    return entry["name"]


def test_primitive_list_matches_reference_surface(server):
    status, prims = call(server, "GET", "/api/decoding/primitives")
    assert status == 200
    keys = {p["key"] for p in prims["primitives"]}
    assert keys >= {"invert", "differential", "redundancy",
                    "data_whitening", "carrier", "bitorder", "edge",
                    "substitution", "external", "enocean", "cut", "morse"}


def test_build_cc1101_chain_preview_apply_roundtrip(server, tmp_path):
    # open + demodulate the golden capture
    status, sig = call(server, "POST", "/api/signal/open",
                       {"path": get_path_for_data_file("cc1101.complex")})
    assert status == 200
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "noise_threshold": 0.06, "center": 0.0,
          "samples_per_symbol": 100, "tolerance": 5})
    status, r = call(server, "POST", "/api/analysis/add", {"signal_id": 0})
    assert status == 200 and r["rows"] == 1
    status, rows = call(server, "GET", "/api/analysis/rows?view=1&decoded=0")
    assert rows["rows"][0]["data"] == CC1101_PLAIN_HEX

    # build the chain from the primitive list, preview on the plain bits
    op = whitening_name(server)
    status, plain = call(server, "GET", "/api/analysis/rows?view=0&decoded=0")
    plain_bits = plain["rows"][0]["data"]
    status, prev = call(server, "POST", "/api/decoding/preview",
                        {"chain": [op, WHITENING_PARAM],
                         "input": plain_bits})
    assert status == 200
    assert prev["state"] == "success" and prev["errors"] == 0
    assert prev["decoded_hex"] == CC1101_DECODED_HEX
    # invertibility: re-encoding restores the capture bits
    assert prev["reencoded"] == plain_bits

    # save it into the decodings list and apply to the capture
    status, saved = call(server, "POST", "/api/decoding/save",
                         {"name": "CC1101 custom",
                          "chain": [op, WHITENING_PARAM]})
    assert status == 200 and "CC1101 custom" in saved["decodings"]
    index = saved["decodings"].index("CC1101 custom")
    status, r = call(server, "POST", "/api/analysis/decoding",
                     {"decoding_index": index})
    assert status == 200 and r["decoding"] == "CC1101 custom"
    status, rows = call(server, "GET", "/api/analysis/rows?view=1&decoded=1")
    assert rows["rows"][0]["data"] == CC1101_DECODED_HEX

    # read back the chain for editing
    status, got = call(server, "GET",
                       f"/api/decoding/get?decoding_index={index}")
    assert got["name"] == "CC1101 custom"
    assert got["chain"] == [op, WHITENING_PARAM]

    # round-trip through project save/open
    project = tmp_path / "deproj"
    project.mkdir()
    status, r = call(server, "POST", "/api/project/save",
                     {"path": str(project)})
    assert status == 200

    srv2 = make_srv()
    try:
        status, r = call(srv2, "POST", "/api/project/open",
                         {"path": str(project)})
        assert status == 200
        status, decs = call(srv2, "GET", "/api/analysis/decodings")
        assert "CC1101 custom" in decs["decodings"]
        idx2 = decs["decodings"].index("CC1101 custom")
        status, got2 = call(srv2, "GET",
                            f"/api/decoding/get?decoding_index={idx2}")
        assert got2["chain"] == [op, WHITENING_PARAM]
    finally:
        srv2.shutdown()
        srv2.server_close()


def test_preview_reports_decode_errors(server):
    """A chain whose sync is absent reports the error state live."""
    op = whitening_name(server)
    status, prev = call(server, "POST", "/api/decoding/preview",
                        {"chain": [op, "0xdeadbeef;0x21;0"],
                         "input": "1010101011110000"})
    assert status == 200
    assert prev["state"] != "success" or prev["errors"] > 0


def test_decoding_delete_and_errors(server):
    status, r = call(server, "POST", "/api/decoding/save",
                     {"name": "tmp inverted", "chain": ["Invert"]})
    assert status == 200
    index = r["decodings"].index("tmp inverted")
    status, r = call(server, "POST", "/api/decoding/delete",
                     {"decoding_index": index})
    assert status == 200 and r["removed"] == "tmp inverted"
    assert "tmp inverted" not in r["decodings"]

    status, r = call(server, "POST", "/api/decoding/save",
                     {"name": "", "chain": ["Invert"]})
    assert status == 400
    status, r = call(server, "POST", "/api/decoding/preview",
                     {"chain": ["Invert"], "input": "10a1"})
    assert status == 400


def test_checksum_label_configuration_cc1101(server):
    """The ChecksumWidget workflow over HTTP: promote a label to a
    checksum, configure the CC1101 CRC16 + data range, and verify the
    received CRC matches (tests/test_crc_gui_integration.py gate)."""
    status, sig = call(server, "POST", "/api/signal/open",
                       {"path": get_path_for_data_file("cc1101.complex")})
    assert status == 200
    call(server, "POST", "/api/signal/0/params",
         {"modulation_type": "FSK", "noise_threshold": 0.06, "center": 0.0,
          "samples_per_symbol": 100, "tolerance": 5})
    call(server, "POST", "/api/analysis/add", {"signal_id": 0})

    # apply the whitening decoder so decoded bits carry the real frame
    op = whitening_name(server)
    status, saved = call(server, "POST", "/api/decoding/save",
                         {"name": "CC1101 wh",
                          "chain": [op, WHITENING_PARAM]})
    index = saved["decodings"].index("CC1101 wh")
    call(server, "POST", "/api/analysis/decoding", {"decoding_index": index})

    # label over the CRC16 (decoded bits 96..111), promoted to checksum
    status, r = call(server, "POST", "/api/analysis/label",
                     {"action": "create", "message": 0, "start": 96,
                      "end": 111, "view": 0, "name": "crc",
                      "field_type": "checksum"})
    assert status == 200
    lbl = next(l for l in r["labels"] if l["name"] == "crc")
    assert lbl["is_checksum"] and lbl["field_type"] == "checksum"
    label_index = r["labels"].index(lbl)

    # configure: CC1101 CRC16 over the payload after preamble+sync
    status, cfg = call(server, "POST", "/api/analysis/checksum_label",
                       {"message": 0, "label": label_index,
                        "crc_function": "CC1101",
                        "data_ranges": [[64, 96]]})
    assert status == 200
    assert cfg["polynomial_hex"].lstrip("0x") in ("18005", "8005")
    assert cfg["data_ranges"] == [[64, 96]]
    assert cfg["checksum_ok"] is True, cfg

    # a wrong data range must fail the check
    status, cfg = call(server, "POST", "/api/analysis/checksum_label",
                       {"message": 0, "label": label_index,
                        "data_ranges": [[60, 96]]})
    assert status == 200 and cfg["checksum_ok"] is False
