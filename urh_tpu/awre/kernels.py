"""awre primitive kernels.

Vectorized numpy reformulations of urh/cythonext/awre_util.pyx (369
LoC of per-element loops).  Notable redesigns:

* ``create_difference_histogram`` — the reference's O(L^2 * maxlen)
  pairwise equality loop collapses to O(L * maxlen) column counting:
  the number of equal pairs in a binary column with c1 ones and c0
  zeros (both from messages long enough) is C(c1,2) + C(c0,2).
* ``get_difference_matrix`` — pairwise first-difference via padded
  broadcasting instead of nested scans.
* LCS via the standard DP (short inputs; the reference caps results
  at 10 anyway).
"""

from __future__ import annotations

import math

import numpy as np


def bit_array_to_number(bits, end: int, start: int = 0) -> int:
    """MSB-first value of bits[start:end] (util.pyx:50-61)."""
    if end < 1:
        return 0
    value = 0
    for i in range(start, end):
        value = (value << 1) | int(bits[i])
    return value


def find_longest_common_sub_sequence_indices(seq1: np.ndarray, seq2: np.ndarray) -> set:
    """Up to 10 (start, end) positions in seq1 of the longest common
    substring of seq1/seq2 (awre_util.pyx:15-44)."""
    seq1 = np.asarray(seq1, dtype=np.uint8)
    seq2 = np.asarray(seq2, dtype=np.uint8)
    n1, n2 = len(seq1), len(seq2)
    if n1 == 0 or n2 == 0:
        return {(0, 0)}

    # DP counter matrix of common-suffix lengths
    c = np.zeros((n1 + 1, n2 + 1), dtype=np.uint32)
    eq = seq1[:, None] == seq2[None, :]
    for i in range(n1):
        c[i + 1, 1:] = np.where(eq[i], c[i, :-1] + 1, 0)

    longest = int(c.max())
    if longest == 0:
        return {(0, 0)}
    pos = np.argwhere(c == longest)  # row-major order, like the scan
    result = set()
    for i_plus1, _ in pos[:10]:
        i = int(i_plus1) - 1
        result.add((i - longest + 1, i + 1))
    return result


def find_first_difference(bits1, bits2) -> int:
    a = np.asarray(bits1, dtype=np.uint8)
    b = np.asarray(bits2, dtype=np.uint8)
    smaller = min(len(a), len(b))
    neq = a[:smaller] != b[:smaller]
    idx = np.flatnonzero(neq)
    return int(idx[0]) if len(idx) else smaller


def get_difference_matrix(bitvectors: list) -> np.ndarray:
    """(N, N) upper-triangular matrix of first-difference positions."""
    N = len(bitvectors)
    result = np.zeros((N, N), dtype=np.uint32)
    if N < 2:
        return result
    lens = np.array([len(b) for b in bitvectors])
    maxlen = int(lens.max())
    # pad with a sentinel so unequal lengths differ right at min(len)
    padded = np.full((N, maxlen), 255, dtype=np.uint8)
    for i, bv in enumerate(bitvectors):
        padded[i, : len(bv)] = np.asarray(bv, dtype=np.uint8)

    for i in range(N - 1):
        diff = padded[i][None, :] != padded[i + 1 :]
        any_diff = diff.any(axis=1)
        first = np.argmax(diff, axis=1)
        min_len = np.minimum(lens[i], lens[i + 1 :])
        result[i, i + 1 :] = np.where(any_diff, np.minimum(first, min_len), min_len)
    return result


def get_hexvectors(bitvectors: list) -> list:
    """Bit arrays -> nibble (hex digit) arrays; partial trailing nibbles
    keep their MSB-first value (awre_util.pyx:70-90)."""
    result = []
    for bv in bitvectors:
        bv = np.asarray(bv, dtype=np.uint8)
        n = len(bv)
        m = math.ceil(n / 4)
        full = n // 4
        hexvector = np.zeros(m, dtype=np.uint8)
        if full:
            hexvector[:full] = bv[: 4 * full].reshape(-1, 4) @ np.array([8, 4, 2, 1], dtype=np.uint8)
        if m > full:
            hexvector[full] = bit_array_to_number(bv, n, 4 * full)
        result.append(hexvector)
    return result


def _lower_multiple_of_n(number: int, n: int) -> int:
    return n * (number // n)


def get_raw_preamble_position(bitvector: np.ndarray) -> tuple:
    """(message_start, preamble_lower, preamble_upper) of an a^n b^m
    repetition at the message head (awre_util.pyx:103-167)."""
    bits = np.asarray(bitvector, dtype=np.uint8)
    N = len(bits)
    if N == 0:
        return 0, 0, 0

    start = -1
    k = 0.0
    lower = upper = 0
    while k < 2 and start < N - 1:
        start += 1
        a = bits[start]
        b = 1 - a

        b_positions = np.flatnonzero(bits[start:] == b)
        if len(b_positions) == 0:
            return 0, 0, 0
        n = int(b_positions[0])
        if n <= 0:
            return 0, 0, 0

        a_positions = np.flatnonzero(bits[start + n :] == a)
        if len(a_positions) == 0:
            return 0, 0, 0
        m = int(a_positions[0])
        if m <= 0:
            return 0, 0, 0

        pattern = np.concatenate([np.full(n, a, np.uint8), np.full(m, b, np.uint8)])
        plen = n + m

        # find where the repetition of the pattern breaks
        preamble_end = start
        for i in range(start, N, plen):
            window = bits[i : i + plen]
            if len(window) < plen or not np.array_equal(window, pattern):
                preamble_end = i
                break
        else:
            preamble_end = start

        upper = start + _lower_multiple_of_n(preamble_end + 1 - start, plen)
        lower = upper - plen
        k = (upper - start) / plen

    if k > 2:
        return start, lower, upper
    return 0, 0, 0


def find_possible_sync_words(difference_matrix: np.ndarray,
                             raw_preamble_positions: np.ndarray,
                             bitvectors: list, n_gram_length: int) -> dict:
    """Score candidate sync words between preamble end and first pairwise
    difference (awre_util.pyx:170-231)."""
    possible_sync_words = dict()
    num_rows, num_cols = difference_matrix.shape

    for i in range(num_rows):
        for j in range(i + 1, num_cols):
            sync_end = int(difference_matrix[i, j])
            if sync_end == 0:
                continue
            for k in range(2):
                for index in (i, j):
                    start = int(raw_preamble_positions[index, 0]) + int(raw_preamble_positions[index, k + 1])
                    # next lower multiple of n: underestimating sync length
                    # avoids stealing bits from adjacent fields
                    sync_len = max(0, _lower_multiple_of_n(sync_end - start, n_gram_length))
                    if sync_len < 2:
                        continue
                    bitvector = np.asarray(bitvectors[index], dtype=np.uint8)
                    if sync_len == 2:
                        # "10"/"01" would be indistinguishable from preamble
                        if bitvector[start] == 0 and bitvector[start + 1] == 1:
                            continue
                        if bitvector[start] == 1 and bitvector[start + 1] == 0:
                            continue
                    sync_word = bitvector[start : start + sync_len].tobytes()
                    possible_sync_words.setdefault(sync_word, 0)
                    if (start + sync_len) % n_gram_length == 0:
                        possible_sync_words[sync_word] += 1
                    else:
                        possible_sync_words[sync_word] += 0.5
    return possible_sync_words


def create_difference_histogram(vectors: list, active_indices) -> np.ndarray:
    """histogram[k] = fraction of pairs whose vectors agree at column k.

    O(L * maxlen) reformulation of the reference's O(L^2 * maxlen)
    pairwise loop: the number of equal pairs in a column is
    sum_v C(count_v, 2) over the value counts of that column (uint8
    values, so bit AND hex/byte vectors work), restricted to vectors
    long enough.  Pairs involving a too-short vector count as unequal
    (the reference only compares up to min(len)).
    """
    active_indices = list(active_indices)
    L = len(active_indices)
    lens = np.array([len(vectors[i]) for i in active_indices]) if L else np.zeros(0, int)
    longest = int(lens.max()) if L else 0
    histogram = np.zeros(longest, dtype=np.float64)
    if L < 2 or longest == 0:
        return histogram
    n = (L * (L - 1)) // 2

    # value 256 marks out-of-range positions (never equal to any value)
    padded = np.full((L, longest), 256, dtype=np.int64)
    for row, i in enumerate(active_indices):
        v = np.asarray(vectors[i], dtype=np.uint8)
        padded[row, : len(v)] = v

    col_idx = np.broadcast_to(np.arange(longest), (L, longest))
    counts = np.zeros((257, longest), dtype=np.int64)
    np.add.at(counts, (padded.ravel(), col_idx.ravel()), 1)
    counts[256] = 0  # padding never matches
    cf = counts.astype(np.float64)
    equal_pairs = (cf * (cf - 1) / 2).sum(axis=0)
    return equal_pairs / n


def find_occurrences(a, b, ignore_indices=None, return_after_first=False) -> list:
    """Start indices of exact occurrences of b in a, skipping windows that
    touch ignore_indices (awre_util.pyx:265-301)."""
    a = np.asarray(a, dtype=np.uint8)
    b = np.asarray(b, dtype=np.uint8)
    len_a, len_b = len(a), len(b)
    if len_b > len_a or len_b == 0:
        return []

    windows = np.lib.stride_tricks.sliding_window_view(a, len_b)
    matches = (windows == b).all(axis=1)

    if ignore_indices:
        ignore = np.zeros(len_a, dtype=bool)
        for idx in ignore_indices:
            if 0 <= idx < len_a:
                ignore[idx] = True
        touched = np.lib.stride_tricks.sliding_window_view(ignore, len_b).any(axis=1)
        matches = matches & ~touched

    hits = np.flatnonzero(matches)
    if return_after_first:
        return [int(hits[0])] if len(hits) else []
    return [int(h) for h in hits]


def _ngram_values(bv: np.ndarray, n_gram_length: int, num_grams: int) -> np.ndarray:
    """MSB-first n-gram values with partial tails (matches
    bit_array_to_number(end=min(len, j+n), start=j))."""
    bv = np.asarray(bv, dtype=np.uint8)
    n = len(bv)
    values = np.full(num_grams, -1, dtype=np.int64)
    for idx in range(num_grams):
        j = idx * n_gram_length
        if j >= n:
            break
        values[idx] = bit_array_to_number(bv, min(n, j + n_gram_length), j)
    return values


def create_seq_number_difference_matrix(bitvectors: list, n_gram_length: int) -> np.ndarray:
    """(N-1, M) matrix of consecutive-message n-gram deltas mod 2^n
    (awre_util.pyx:303-338)."""
    max_len = max(len(b) for b in bitvectors)
    N = len(bitvectors)
    M = math.ceil(max_len / n_gram_length)
    two_n = 2 ** n_gram_length

    result = np.full((N - 1, M), -1, dtype=np.int32)
    for i in range(1, N):
        bv1 = np.asarray(bitvectors[i - 1], dtype=np.uint8)
        bv2 = np.asarray(bitvectors[i], dtype=np.uint8)
        k = min(len(bv1), len(bv2))
        num = math.ceil(k / n_gram_length) if k % n_gram_length else k // n_gram_length
        for j in range(0, k, n_gram_length):
            index = j // n_gram_length
            if index < M:
                diff = (bit_array_to_number(bv2, min(len(bv2), j + n_gram_length), j)
                        - bit_array_to_number(bv1, min(len(bv1), j + n_gram_length), j))
                result[i - 1, index] = (diff + two_n) % two_n
    return result


def check_crc_for_messages(message_indices, bitvectors, data_start, data_stop,
                           crc_start, crc_stop, crc_polynomial, crc_start_value,
                           crc_final_xor, crc_lsb_first, crc_reverse_polynomial,
                           crc_reverse_all, crc_little_endian) -> set:
    """Indices of messages whose stored CRC matches the computed one."""
    from urh_tpu.coding.crc import crc_int

    result = set()
    for index in message_indices:
        bits = np.asarray(bitvectors[index], dtype=np.uint8)
        crc_input = bits[data_start:data_stop]
        check = bit_array_to_number(bits[crc_start:crc_stop], crc_stop - crc_start)
        if crc_int(crc_input, crc_polynomial, crc_start_value, crc_final_xor,
                   crc_lsb_first, crc_reverse_polynomial, crc_reverse_all,
                   crc_little_endian) == check:
            result.add(index)
    return result
