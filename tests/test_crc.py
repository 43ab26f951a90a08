"""GenericCRC tests (vectors mirror the reference's tests/test_CRC.py)."""

import array

from urh_tpu.coding.crc import GenericCRC
from urh_tpu.coding.encodings import Encoding, hex2bit, str2bit
from urh_tpu.coding.wsp import WSPChecksum

from tests.test_encoding import bit2hex


def test_crc_wsp_vectors():
    c = GenericCRC(polynomial=WSPChecksum.CRC_8_POLYNOMIAL)
    bitstr = [
        "010101010110100111011010111011101110111011100110001011101010001011101110110110101101",
        "010101010110101001101110111011101110111011100110001011101010001011101110110111100101",
        "010101010110100111010010111011101110111011100110001011101010001011101110110110100101",
    ]
    expected = ["78", "c9", "f2"]
    for value, expect in zip(bitstr, expected):
        assert bit2hex(c.crc(str2bit(value[4:-8]))) == expect


def test_crc8():
    crc = GenericCRC(polynomial=GenericCRC.DEFAULT_POLYNOMIALS["8_ccitt"])
    for msg, expect in zip(["aabbcc", "abcdee", "dacafe"], ["7d", "24", "33"]):
        assert bit2hex(crc.crc(hex2bit(msg))) == expect


def test_int_kernel_vs_reference_impl():
    """Cross-validate the integer CRC kernel against the independent
    bit-list implementation over all parameter combinations."""
    c = GenericCRC(polynomial="16_standard")
    bitstring_set = [
        "101001001010101010101011101111111000000000000111101010011101011",
        "101001001010101101111010110111101010010110111010",
        "00000000000000000000000000000000100000000000000000000000000000000001111111111111",
        "11111111111111111111111111111111101111111111111111111101111111111111111100000000001",
    ]
    for name in c.DEFAULT_POLYNOMIALS:
        c.polynomial = c.choose_polynomial(name)
        n = c.poly_order - 1
        c.start_value = array.array("B", [0] * n)
        c.final_xor = array.array("B", [0] * n)
        for s in bitstring_set:
            bits = str2bit(s)
            assert c.crc(bits) == c.reference_crc(bits)

            c.final_xor = array.array("B", str2bit("0000111100001111")[:n])
            assert c.crc(bits) == c.reference_crc(bits)
            c.final_xor = array.array("B", [0] * n)

            c.start_value = array.array("B", str2bit("1010101010101010")[:n])
            assert c.crc(bits) == c.reference_crc(bits)
            c.start_value = array.array("B", [0] * n)

            for attr in ("reverse_polynomial", "lsb_first", "little_endian", "reverse_all"):
                setattr(c, attr, True)
                assert c.crc(bits) == c.reference_crc(bits), (name, s, attr)
                setattr(c, attr, False)


def test_cache():
    c = GenericCRC(polynomial="16_standard")
    c.calculate_cache(8)
    assert len(c.cache) == 256


def test_standard_checksums():
    # CRC32 of "123456789" (check value cbf43926)
    c = GenericCRC.from_standard_checksum("CRC32 (default)")
    data = hex2bit("313233343536373839")
    assert bit2hex(c.crc(data)) == "cbf43926"

    c = GenericCRC.from_standard_checksum("CRC16 CCITT")
    assert bit2hex(c.crc(data)) == "2189"

    c = GenericCRC.from_standard_checksum("CRC8 CCITT")
    assert bit2hex(c.crc(data)) == "f4"


def test_reverse_engineering():
    c = GenericCRC(polynomial="16_standard")
    bitstring_set = [
        "1110001111001011100010000101010100000010110111000101100010100100111110111101100110110111011001010010001011101010",
        "1110010011001011100010000101010100000010110111000101100010100100111110111101100110110111011001010010001011101010",
        "1110010111001011100010000101010100000010110111000101100010100100111110111101100110110111011001010010001011101010",
        "1110011011001011100010000101010100000010110111000101100010100100111110111101100110110111011001010010001011101010",
    ]
    bitset = [str2bit(s) for s in bitstring_set]
    crcset = [c.crc(b) for b in bitset]
    polynomial = c.reverse_engineer_polynomial(bitset, crcset)
    assert polynomial
    assert GenericCRC.bit2str(polynomial) == "1000000000000101"


def test_crc_datarange():
    c = GenericCRC(polynomial="16_standard")
    data = str2bit("1010110010101101010011000101011101011101")
    crc = c.crc(data)
    inpt = array.array("B", data) + crc
    start, end = c.get_crc_datarange(inpt, len(data))
    assert (start, end) == (0, len(data))


def test_guess_all():
    c = GenericCRC.from_standard_checksum("CRC16 CC1101")
    data = hex2bit("deadbeef1337")
    msg = array.array("B", data) + c.crc(data)
    guesser = GenericCRC()
    result = guesser.guess_all(msg)
    assert result[0] != 0
    assert result[0].caption == "CRC16 CC1101"
    assert (result[1], result[2]) == (0, len(data))
    assert (result[3], result[4]) == (len(data), len(msg))
