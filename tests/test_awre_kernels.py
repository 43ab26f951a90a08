"""awre kernel equivalence tests vs direct per-element oracles."""

import numpy as np

from urh_tpu.awre import kernels as k


def oracle_difference_histogram(vectors, active_indices):
    L = len(active_indices)
    longest = max(len(vectors[i]) for i in active_indices)
    histogram = np.zeros(longest, dtype=np.float64)
    n = (L * (L - 1)) // 2
    for a in range(L - 1):
        vi = vectors[active_indices[a]]
        for b in range(a + 1, L):
            vj = vectors[active_indices[b]]
            for c in range(min(len(vi), len(vj))):
                if vi[c] == vj[c]:
                    histogram[c] += 1 / n
    return histogram


def test_difference_histogram_equivalence():
    rng = np.random.default_rng(5)
    for trial in range(5):
        vectors = [rng.integers(0, 16, rng.integers(3, 40)).astype(np.uint8)
                   for _ in range(rng.integers(2, 12))]
        idx = list(range(len(vectors)))
        got = k.create_difference_histogram(vectors, idx)
        exp = oracle_difference_histogram(vectors, idx)
        np.testing.assert_allclose(got, exp, atol=1e-9)


def test_difference_matrix():
    bvs = [np.array([1, 0, 1, 1], np.uint8),
           np.array([1, 0, 0, 1], np.uint8),
           np.array([1, 0, 1, 1, 0], np.uint8)]
    m = k.get_difference_matrix(bvs)
    assert m[0, 1] == 2   # first diff at index 2
    assert m[0, 2] == 4   # equal until shorter ends
    assert m[1, 2] == 2


def test_lcs_indices():
    seq1 = np.array([1, 1, 0, 1, 0, 1], np.uint8)
    seq2 = np.array([0, 1, 0, 1, 1, 0], np.uint8)
    result = k.find_longest_common_sub_sequence_indices(seq1, seq2)
    assert any(np.array_equal(seq1[slice(*ind)], [0, 1, 0, 1]) or
               np.array_equal(seq1[slice(*ind)], [1, 0, 1, 0]) for ind in result)


def test_hexvectors_partial_nibble():
    bvs = [np.array([1, 0, 1, 0, 1, 1], np.uint8)]  # 'a' + partial '11' -> 3
    hv = k.get_hexvectors(bvs)[0]
    assert list(hv) == [10, 3]


def test_raw_preamble_position():
    bits = np.array(list(map(int, "10101010" + "1001101010011101" + "0110")), np.uint8)
    start, lower, upper = k.get_raw_preamble_position(bits)
    assert start == 0
    assert lower == 8
    assert upper == 10  # sync starts with preamble pattern 10


def test_find_occurrences():
    a = np.array([1, 0, 1, 1, 0, 1, 1, 0], np.uint8)
    b = np.array([1, 1, 0], np.uint8)
    assert k.find_occurrences(a, b) == [2, 5]
    assert k.find_occurrences(a, b, return_after_first=True) == [2]
    assert k.find_occurrences(a, b, ignore_indices={2}) == [5]


def test_seq_number_difference_matrix():
    bvs = [np.array(list(map(int, "00000001" + "1111")), np.uint8),
           np.array(list(map(int, "00000011" + "1111")), np.uint8),
           np.array(list(map(int, "00000110" + "1111")), np.uint8)]
    m = k.create_seq_number_difference_matrix(bvs, 8)
    assert m[0, 0] == 2   # 3 - 1
    assert m[1, 0] == 3   # 6 - 3


def test_threshold_divisor_histogram_equivalence():
    from urh_tpu.ai.kernels import get_threshold_divisor_histogram

    def oracle(p, threshold=0.2):
        p = np.asarray(p, dtype=np.uint64)
        hist = np.zeros(int(p.max()) + 1, dtype=np.uint64)
        for i in range(len(p)):
            for j in range(i + 1, len(p)):
                x, y = p[i], p[j]
                if x == 0 or y == 0:
                    continue
                mn, mx = (x, y) if x < y else (y, x)
                if mx / mn - (mx // mn) < threshold:
                    hist[mn] += 1
        return hist

    rng = np.random.default_rng(11)
    for _ in range(5):
        p = rng.integers(0, 30, rng.integers(5, 200)) * 10
        np.testing.assert_array_equal(get_threshold_divisor_histogram(p), oracle(p))
