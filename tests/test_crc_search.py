"""batched_guess_all must match GenericCRC.guess_all message-for-message
(config, data range, crc range), including ignore_positions handling."""

import array

import numpy as np

from urh_tpu.awre.crc_search import batched_guess_all
from urh_tpu.coding.crc import GenericCRC


def _make_vectors(seed, n=60):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        L = int(rng.choice([24, 40, 41, 64, 88, 104]))
        bits = rng.integers(0, 2, L, dtype=np.uint8)
        if i % 3 == 0 and L > 40:
            name = ["CRC8 (default)", "CRC16 (default)", "CRC16 CCITT",
                    "CRC16 CC1101", "CRC32 (default)"][i % 5]
            c = GenericCRC.from_standard_checksum(name)
            w = c.poly_order - 1
            if L > w + 10:
                ds = int(rng.integers(0, 4))
                payload = bits[ds:L - w]
                crc_bits = c.crc(array.array("B", payload.tolist()))
                bits[L - w:] = np.frombuffer(crc_bits.tobytes(), np.uint8)
        out.append(bits)
    return out


def _check(bitvectors, ignore):
    searcher = GenericCRC()
    idx = list(range(len(bitvectors)))
    batched = batched_guess_all(bitvectors, idx, ignore_positions=ignore)
    for i in idx:
        ref = searcher.guess_all(array.array("B", bitvectors[i].tolist()),
                                 ignore_positions=ignore)
        got = batched.get(i)
        if ref == (0, 0, 0, 0, 0):
            assert got is None, (i, got[1:])
        else:
            rc, rds, rde, rcs, rce = ref
            assert got is not None, (i, ref[1:])
            gc, gds, gde, gcs, gce = got
            assert (gds, gde, gcs, gce) == (rds, rde, rcs, rce), i
            assert gc == rc, (i, gc.caption, rc.caption)


def test_batched_guess_all_matches_scalar():
    _check(_make_vectors(0), set())


def test_batched_guess_all_honors_ignore_positions():
    vectors = _make_vectors(1)
    _check(vectors, set(range(80, 104)))
    _check(vectors, set(range(0, 8)))


def test_batched_guess_all_edge_cases():
    assert batched_guess_all([], []) == {}
    assert batched_guess_all([np.ones(3, np.uint8)], [0]) == {}
