"""Device-kernel equivalence tests for urh_tpu.awre.device.

Fuzzes the jitted JAX kernels against their numpy twins and against
scalar oracles implementing the reference semantics
(urh/cythonext/awre_util.pyx), on both sides of the dispatch threshold.
"""

import numpy as np
import pytest

from urh_tpu.awre import device as dev
from urh_tpu.awre import kernels as k
from urh_tpu.coding.crc import GenericCRC


def _random_vectors(rng, n, max_len, alphabet=2, min_len=4):
    return [rng.integers(0, alphabet, size=rng.integers(min_len, max_len + 1)).astype(np.uint8)
            for _ in range(n)]


def _oracle_first_diff(a, b):
    smaller = min(len(a), len(b))
    for i in range(smaller):
        if a[i] != b[i]:
            return i
    return smaller


@pytest.mark.parametrize("force_device", [False, True])
def test_first_difference_matrix_matches_oracle(force_device, monkeypatch):
    if force_device:
        monkeypatch.setattr(dev, "DEVICE_MIN_CELLS", 0)
    rng = np.random.default_rng(7)
    vectors = _random_vectors(rng, 12, 40)
    data, lengths = dev.pack_messages(vectors)
    mat = dev.first_difference_matrix(data, lengths)
    for i in range(len(vectors)):
        for j in range(len(vectors)):
            assert mat[i, j] == _oracle_first_diff(vectors[i], vectors[j])


@pytest.mark.parametrize("force_device", [False, True])
def test_column_agreement_matches_pairwise_oracle(force_device, monkeypatch):
    if force_device:
        monkeypatch.setattr(dev, "DEVICE_MIN_CELLS", 0)
    rng = np.random.default_rng(11)
    vectors = _random_vectors(rng, 9, 30, alphabet=16)
    data, lengths = dev.pack_messages(vectors)
    hist = dev.column_agreement(data, lengths, alphabet_size=16)

    n = len(vectors)
    longest = max(len(v) for v in vectors)
    expected = np.zeros(longest)
    for col in range(longest):
        equal = 0
        for i in range(n):
            for j in range(i + 1, n):
                if (col < len(vectors[i]) and col < len(vectors[j])
                        and vectors[i][col] == vectors[j][col]):
                    equal += 1
        expected[col] = equal / (n * (n - 1) / 2)
    np.testing.assert_allclose(hist, expected, atol=1e-12)


@pytest.mark.parametrize("force_device", [False, True])
@pytest.mark.parametrize("n", [4, 8])
def test_ngram_values_match_bit_array_to_number(force_device, n, monkeypatch):
    if force_device:
        monkeypatch.setattr(dev, "DEVICE_MIN_CELLS", 0)
    rng = np.random.default_rng(13)
    vectors = _random_vectors(rng, 8, 45)
    data, lengths = dev.pack_messages(vectors)
    values, avail = dev.ngram_values(data, lengths, n)
    for i, bv in enumerate(vectors):
        for g in range((len(bv) + n - 1) // n):
            j = g * n
            expected = k.bit_array_to_number(bv, min(len(bv), j + n), j)
            assert values[i, g] == expected, (i, g)


@pytest.mark.parametrize("force_device", [False, True])
def test_seqnum_delta_matrix_matches_reference_semantics(force_device, monkeypatch):
    if force_device:
        monkeypatch.setattr(dev, "DEVICE_MIN_CELLS", 0)
    rng = np.random.default_rng(17)
    vectors = _random_vectors(rng, 10, 64, min_len=16)
    n = 8
    mat = k.create_seq_number_difference_matrix(vectors, n)
    assert mat.shape[0] == len(vectors) - 1
    for i in range(1, len(vectors)):
        bv1, bv2 = vectors[i - 1], vectors[i]
        smaller = min(len(bv1), len(bv2))
        for j in range(0, smaller, n):
            v1 = k.bit_array_to_number(bv1, min(len(bv1), j + n), j)
            v2 = k.bit_array_to_number(bv2, min(len(bv2), j + n), j)
            assert mat[i - 1, j // n] == (v2 - v1) % (1 << n)
        for col in range(-(-smaller // n), mat.shape[1]):
            assert mat[i - 1, col] == -1


@pytest.mark.parametrize("force_device", [False, True])
def test_occurrence_matrix_matches_find_occurrences(force_device, monkeypatch):
    if force_device:
        monkeypatch.setattr(dev, "DEVICE_MIN_CELLS", 0)
    rng = np.random.default_rng(19)
    vectors = _random_vectors(rng, 6, 50, alphabet=16, min_len=12)
    patterns = [v[3:7] for v in vectors[:3]]
    ignore = [2, 9]
    hits = k.batch_find_occurrences(vectors, patterns, ignore_columns=ignore)
    for vi, v in enumerate(vectors):
        for pi, p in enumerate(patterns):
            expected = k.find_occurrences(v, p, ignore_indices=ignore)
            assert hits.get((vi, pi), []) == expected


@pytest.mark.parametrize("force_device", [False, True])
@pytest.mark.parametrize("standard", ["CRC8 CCITT", "CRC16 CCITT", "CRC32 (default)"])
def test_batched_crc_matches_generic_crc(force_device, standard, monkeypatch):
    if force_device:
        monkeypatch.setattr(dev, "DEVICE_MIN_CELLS", 0)
    rng = np.random.default_rng(23)
    crc = GenericCRC.from_standard_checksum(standard)
    messages = rng.integers(0, 2, size=(5, 48)).astype(np.uint8)
    got = dev.batched_crc(messages, *crc.get_parameters())
    for row, value in zip(messages, got):
        import array

        expected = crc.crc(array.array("B", row.tolist()))
        assert int(value) == k.bit_array_to_number(expected, len(expected))


def test_batched_crc_generator_cache_reused():
    crc = GenericCRC.from_standard_checksum("CRC8 CCITT")
    params = (tuple(int(b) for b in crc.polynomial),
              tuple(int(b) for b in crc.start_value),
              tuple(int(b) for b in crc.final_xor),
              False, False, False, False)
    dev._crc_generator_matrix.cache_clear()
    dev.batched_crc(np.zeros((2, 24), dtype=np.uint8), *crc.get_parameters())
    dev.batched_crc(np.ones((3, 24), dtype=np.uint8), *crc.get_parameters())
    info = dev._crc_generator_matrix.cache_info()
    assert info.hits >= 1 and info.misses == 1
    assert dev._crc_generator_matrix(params, 24)[0].shape == (24, 8)


def test_pack_messages_buckets_width():
    vecs = [np.zeros(5, np.uint8), np.ones(9, np.uint8)]
    data, lengths = dev.pack_messages(vecs)
    assert data.shape == (2, 16)  # bucketed to a power of two
    assert lengths.tolist() == [5, 9]
    assert (data[0, 5:] == 255).all()


def test_occurrence_conv_matches_numpy_twin_fuzz():
    """The one-hot-correlation device program must agree exactly with the
    numpy twin across bit and nibble alphabets, ragged lengths, pattern
    padding and ignore columns."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    for _ in range(25):
        n = int(rng.integers(1, 30))
        width = int(rng.integers(8, 70))
        hi = 16 if rng.random() < 0.5 else 2
        lens = rng.integers(1, width + 1, size=n)
        data = np.full((n, width), dev._PAD, dtype=np.uint8)
        for i in range(n):
            data[i, : lens[i]] = rng.integers(0, hi, size=lens[i],
                                              dtype=np.uint8)
        k_pat = int(rng.integers(1, 5))
        pmax = int(rng.integers(1, 12))
        plens = rng.integers(1, pmax + 1, size=k_pat).astype(np.int32)
        pat = np.zeros((k_pat, pmax), dtype=np.uint8)
        for i in range(k_pat):
            pat[i, : plens[i]] = rng.integers(0, hi, size=plens[i],
                                              dtype=np.uint8)
        ignore = rng.random(width) < 0.1
        want = dev._occurrence_np(data, lens, pat, plens, ignore)
        got = np.asarray(dev._occurrence_jax(
            jnp.asarray(data), jnp.asarray(lens), jnp.asarray(pat),
            jnp.asarray(plens), jnp.asarray(ignore)))
        np.testing.assert_array_equal(got, want)
