"""Encoding primitive tests (vectors mirror the reference's
tests/test_encoding.py)."""

import array
import copy

from urh_tpu.coding.encodings import Encoding, hex2bit, str2bit, bit2str
from urh_tpu.coding.wsp import WSPChecksum


def bit2hex(bits):
    b = list(bits)
    while len(b) % 4:
        b.insert(0, 0)
    return "".join("{0:x}".format(int("".join(map(str, b[i:i+4])), 2)) for i in range(0, len(b), 4))


def test_carrier():
    e = Encoding()
    e.carrier = "----1....1**"
    original = str2bit("000010000100111111111100")
    decoded, err, _ = e.code_carrier(True, copy.copy(original))
    reencoded, err, _ = e.code_carrier(False, decoded)
    assert original == reencoded


def test_cut_decoding():
    e = Encoding()

    received = str2bit("00001010010101111111000")
    e.cutmode = 0
    e.cutmark = array.array("B", [True, False, True, False])
    decoded, _, _ = e.code_cut(True, received)
    assert decoded == str2bit("1010010101111111000")

    e.cutmode = 1
    decoded, _, _ = e.code_cut(True, received)
    assert decoded == str2bit("00001010")

    e.cutmode = 2
    e.cutmark = 2
    decoded, _, _ = e.code_cut(True, received)
    assert decoded == str2bit("001010010101111111000")

    e.cutmode = 3
    e.cutmark = 2
    decoded, _, _ = e.code_cut(True, received)
    assert decoded == str2bit("000")


def test_enocean_switch_telegram():
    e = Encoding()
    received = "010101010110100111101010111011101110111011100110001011101010001011101110110111011101000"
    preamble, sof, eof = "10101010", "1001", "1011"
    expected = (preamble + sof + "011000010000000000000010110000011100000000100100" + eof)

    decoded, err, _ = e.code_enocean(True, str2bit(received))
    assert err == 0
    reencoded, err, _ = e.code_enocean(False, decoded)
    assert err == 0
    assert decoded == str2bit(expected)
    assert reencoded == str2bit(received)


def test_enocean_crc8_message():
    e = Encoding()
    received = hex2bit("aacbac4cddd5ddd3bddd5ddcc5ddcddd4c2d5d5c2cdddab200000")
    decoded, err, state = e.code_enocean(True, received)
    assert err == 0
    assert state == e.ErrorState.SUCCESS
    h = bit2hex(decoded)
    assert "aa" in h and "9" in h and "b" in h

    reencoded, errors, state = e.code_enocean(False, decoded)
    assert errors == 0 and state == e.ErrorState.SUCCESS
    redecoded, errors, state = e.code_enocean(True, reencoded)
    assert errors == 0 and state == e.ErrorState.SUCCESS
    assert decoded == redecoded


def test_wsp_checksums():
    msg1 = hex2bit("a6d201006401009802019e411e8035")
    crc1 = hex2bit("35")
    msg2 = hex2bit("a6d2010000ffdaaf01019e411e8071")
    crc2 = hex2bit("71")
    msg3 = hex2bit("a6d201006401009802019e411e40b6")
    checksum3 = hex2bit("b6")

    wsp = WSPChecksum()
    assert wsp.calculate(msg1) == crc1
    assert wsp.calculate(msg2) == crc2
    assert wsp.calculate(msg3) == checksum3


def test_morse():
    e = Encoding()
    e.morse_low = 3
    e.morse_high = 5
    e.morse_wait = 1
    msg1 = "1111111000111100011111100100001111111111111111111111011"
    msg2 = "0111110111011111011101111101110"

    decoded, err, _ = e.code_morse(True, str2bit(msg1))
    reencoded, _, _ = e.code_morse(False, decoded)
    assert err == 1
    assert reencoded == str2bit(msg2)


def test_substitution():
    e = Encoding()
    e.src = [array.array("B", [1, 1, 1, 0]), array.array("B", [1, 0, 0, 0])]
    e.dst = [array.array("B", [1]), array.array("B", [0])]

    encoded = str2bit(
        "1000111010001110111011101110111011101110100011101110111011101110111011101000100010001000100010001"
    )
    compare = str2bit(
        "1000111010001110111011101110111011101110100011101110111011101110111011101000100010001000100010001000"
    )
    decoded, err, _ = e.code_substitution(True, encoded)
    reencoded, _, _ = e.code_substitution(False, decoded)
    assert err == 3
    assert reencoded == compare


def test_data_whitening():
    e = Encoding()
    nrz1 = str2bit(
        "101010101010101010101010101010101110100111001010111010011100101011110011101011001001010011101110100011001011100111100111101011111110011100101001111111110011000111010000010111010101011100"
    )
    nrz2 = str2bit(
        "101010101010101010101010101010101110100111001010111010011100101011110001101011001011010000011101101101011101101110110011010010011010001010010010000101111001100111000100001001111110000000001000000010011"
    )
    de1, _, _ = e.code_data_whitening(True, nrz1)
    de2, _, _ = e.code_data_whitening(True, nrz2)

    e.cc1101_overwrite_crc = False
    nrz1_, _, _ = e.code_data_whitening(False, de1)
    nrz2_, _, _ = e.code_data_whitening(False, de2)

    e.cc1101_overwrite_crc = True
    nrz1__, _, _ = e.code_data_whitening(False, de1)
    nrz2__, _, _ = e.code_data_whitening(False, de2)

    assert nrz1 == nrz1_
    assert nrz1 == nrz1__
    assert nrz2 == nrz2_
    assert nrz2 == nrz2__


def test_invert_differential_edge_redundancy_roundtrips():
    e = Encoding()
    bits = str2bit("1011001110001011")

    inv, _, _ = e.code_invert(True, bits)
    inv2, _, _ = e.code_invert(True, inv)
    assert inv2 == bits

    diff_enc, _, _ = e.code_differential(False, bits)
    diff_dec, _, _ = e.code_differential(True, diff_enc)
    assert diff_dec == bits

    edge_enc, _, _ = e.code_edge(False, bits)
    edge_dec, _, _ = e.code_edge(True, edge_enc)
    assert edge_dec == bits

    e.multiple = 3
    red_enc, _, _ = e.code_redundancy(False, bits)
    red_dec, _, _ = e.code_redundancy(True, red_enc)
    assert red_dec == bits

    lsb, _, _ = e.code_lsb_first(True, bits)
    lsb2, _, _ = e.code_lsb_first(False, lsb)
    assert lsb2 == bits


def test_chain_roundtrip():
    from urh_tpu.coding.encodings import DECODING_INVERT, DECODING_DIFFERENTIAL

    e = Encoding(["my chain", DECODING_INVERT, DECODING_DIFFERENTIAL])
    assert e.get_chain() == ["my chain", DECODING_INVERT, DECODING_DIFFERENTIAL]
    bits = str2bit("101100111")
    enc = e.encode(bits)
    dec = e.decode(enc)
    assert dec == bits
