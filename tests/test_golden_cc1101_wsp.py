"""Golden captures ported from the reference's CRC GUI integration test
(tests/test_crc_gui_integration.py:226-301): exact plain and decoded hex
for the cc1101.complex and wsp.complex captures, plus checksum-label
verification against the received CRC/WSP hashes."""

import numpy as np
import pytest

import urh_tpu as ut
from urh_tpu.coding.encodings import (DECODING_DATAWHITENING, DECODING_ENOCEAN,
                                      Encoding)
from tests.golden import get_path_for_data_file


def _demodulate(filename, modulation, noise, center, sps, tolerance):
    sig = ut.Signal.from_file(get_path_for_data_file(filename))
    sig.modulation_type = modulation
    sig.noise_threshold = noise
    sig.center = center
    sig.samples_per_symbol = sps
    sig.tolerance = tolerance
    pa = ut.ProtocolAnalyzer(sig)
    pa.get_protocol_from_signal()
    return pa


@pytest.fixture(scope="module")
def cc1101_protocol():
    return _demodulate("cc1101.complex", "FSK", 0.06, 0, 100, 5)


@pytest.fixture(scope="module")
def wsp_protocol():
    return _demodulate("wsp.complex", "ASK", 0.05, 0.348, 20, 2)


def test_cc1101_plain_hex(cc1101_protocol):
    assert cc1101_protocol.plain_hex_str == ["aaaaaaaa9a7d9a7dfc99ff1398fb8"]


def test_cc1101_data_whitening_decode(cc1101_protocol):
    decoder = Encoding(["CC1101", DECODING_DATAWHITENING, "0x9a7d9a7d;0x21"])
    msg = cc1101_protocol.messages[0]
    msg.decoder = decoder
    assert msg.decoded_hex_str == "aaaaaaaa9a7d9a7d0378e289757e"


def test_cc1101_crc_over_decoded(cc1101_protocol):
    """The CC1101 CRC16 (poly 0x8005, start 1) over the de-whitened
    payload must equal the received CRC (last 2 bytes before the
    duplicated bit)."""
    from urh_tpu.coding.crc import GenericCRC

    decoder = Encoding(["CC1101", DECODING_DATAWHITENING, "0x9a7d9a7d;0x21"])
    msg = cc1101_protocol.messages[0]
    msg.decoder = decoder
    bits = np.asarray(msg.decoded_bits)
    # payload starts after preamble+sync (aaaaaaaa 9a7d9a7d = 64 bits)
    payload, received_crc = bits[64:-16], bits[-16:]
    crc = GenericCRC(polynomial="16_standard", start_value=True)
    np.testing.assert_array_equal(
        np.asarray(crc.crc(payload.tolist()), dtype=np.uint8), received_crc)


def test_wsp_plain_hex(wsp_protocol):
    hexes = wsp_protocol.plain_hex_str
    assert len(hexes) == 3
    for h in hexes:
        assert h.strip("0") == "aad3d5ddddcc5d45ddbba"


def test_wsp_decode(wsp_protocol):
    decoder = Encoding(["WSP", DECODING_ENOCEAN])
    for msg in wsp_protocol.messages:
        msg.decoder = decoder
        assert msg.decoded_hex_str == "aa9610002c1c024b"


def test_wsp_decode_stable_across_messages(wsp_protocol):
    """All three telegrams decode to the identical frame and stay intact
    through an encode round trip."""
    decoder = Encoding(["WSP", DECODING_ENOCEAN])
    frames = set()
    for msg in wsp_protocol.messages:
        msg.decoder = decoder
        frames.add(msg.decoded_hex_str)
    assert frames == {"aa9610002c1c024b"}
