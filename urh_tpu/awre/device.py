"""Batched device kernels for protocol reverse engineering (awre).

TPU-first redesign of the integer primitives behind awre (reference:
urh/cythonext/awre_util.pyx — per-element Cython loops).  Every
primitive here operates on the *whole message set at once* as a padded
uint8 tensor, so XLA tiles the compare/reduce work onto the VPU and the
n-gram / GF(2)-CRC reductions become MXU matmuls:

* messages are packed once into ``(N, L)`` uint8 + ``(N,)`` lengths
  (:func:`pack_messages`); L is bucketed to powers of two so the jitted
  kernels hit the compile cache across FormatFinder iterations;
* pairwise first-difference positions (awre_util.pyx:46-68) become one
  broadcast-compare + argmax over ``(B, N, L)`` row blocks;
* the column-agreement histogram (awre_util.pyx:233-263) uses the
  value-count identity  #equal-pairs(col) = sum_v C(count_v(col), 2),
  computed as a one-shot compare/reduce over a small value alphabet;
* n-gram extraction (awre_util.pyx:303-369) is a reshape + dot with a
  powers-of-two vector — a matmul, not a scan;
* generic CRCs over equal-length messages exploit GF(2) linearity:
  crc(m) = (m @ G) mod 2 xor crc(0) with a per-(config, length)
  generator matrix, so checking a CRC hypothesis against N messages is
  a single (N, L) x (L, W) matmul (:func:`batched_crc`).

Small inputs dodge device-dispatch latency via numpy twins with
identical semantics (the unit tests fuzz both paths against each
other).
"""

from __future__ import annotations

import functools

import numpy as np

try:  # pragma: no cover - exercised implicitly everywhere
    import jax
    import jax.numpy as jnp

    _HAS_JAX = True
except Exception:  # pragma: no cover
    jax = None
    jnp = None
    _HAS_JAX = False

# Below this many cells the XLA dispatch overhead dominates; use the
# numpy twin instead.  Tests exercise both sides of the threshold.
DEVICE_MIN_CELLS = 1 << 16

_PAD = 255  # uint8 padding sentinel; real alphabets are bits (0/1) or nibbles


def _bucket(n: int) -> int:
    """Round up to a power of two (>= 8) to bound jit cache size."""
    b = 8
    while b < n:
        b <<= 1
    return b


def pack_messages(vectors) -> tuple:
    """Pack ragged uint8 vectors into (data (N, L), lengths (N,)).

    L is the padded (bucketed) width; columns >= lengths[i] hold _PAD.
    """
    n = len(vectors)
    lengths = np.fromiter((len(v) for v in vectors), dtype=np.int32, count=n)
    width = _bucket(int(lengths.max()) if n else 1)
    data = np.full((n, width), _PAD, dtype=np.uint8)
    for i, v in enumerate(vectors):
        data[i, : lengths[i]] = np.asarray(v, dtype=np.uint8)
    return data, lengths


def use_device(n_cells: int) -> bool:
    from urh_tpu.util.placement import scaled_threshold

    return _HAS_JAX and n_cells >= scaled_threshold(DEVICE_MIN_CELLS)


# ---------------------------------------------------------------------------
# pairwise first-difference matrix
# ---------------------------------------------------------------------------


def _first_diff_block_np(block, block_lens, data, lengths):
    neq = block[:, None, :] != data[None, :, :]
    has_diff = neq.any(axis=2)
    first = np.argmax(neq, axis=2)
    min_len = np.minimum(block_lens[:, None], lengths[None, :])
    return np.where(has_diff, np.minimum(first, min_len), min_len)


if _HAS_JAX:

    @functools.partial(jax.jit, static_argnames=())
    def _first_diff_block_jax(block, block_lens, data, lengths):
        neq = block[:, None, :] != data[None, :, :]
        has_diff = jnp.any(neq, axis=2)
        first = jnp.argmax(neq, axis=2).astype(jnp.int32)
        min_len = jnp.minimum(block_lens[:, None], lengths[None, :])
        return jnp.where(has_diff, jnp.minimum(first, min_len), min_len)


def first_difference_matrix(data: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """(N, N) position of the first differing element of each row pair.

    Padding (_PAD) differs from every in-alphabet value, so rows of
    unequal length differ at min(len_i, len_j) at the latest; the result
    is clamped there, matching awre_util.pyx:46-68 exactly.
    """
    n, width = data.shape
    out = np.zeros((n, n), dtype=np.int32)
    if n < 2:
        return out
    # bound block memory at ~64 Mi compare cells
    rows_per_block = max(1, (1 << 26) // max(1, n * width))

    def run_device():
        dev_data, dev_lens = jnp.asarray(data), jnp.asarray(lengths)
        for lo in range(0, n, rows_per_block):
            hi = min(n, lo + rows_per_block)
            out[lo:hi] = np.asarray(_first_diff_block_jax(
                dev_data[lo:hi], dev_lens[lo:hi], dev_data, dev_lens))
        return out

    def run_host():
        for lo in range(0, n, rows_per_block):
            hi = min(n, lo + rows_per_block)
            out[lo:hi] = _first_diff_block_np(data[lo:hi], lengths[lo:hi],
                                              data, lengths)
        return out

    if not use_device(n * n * width):
        return run_host()
    # O(N^2) output: the right side depends on the measured link, race it
    from urh_tpu.util.placement import race

    return race("awre.first_difference_matrix", run_device, run_host)


# ---------------------------------------------------------------------------
# column agreement (difference histogram)
# ---------------------------------------------------------------------------


def _column_value_counts_np(data, lengths, alphabet_size):
    valid = np.arange(data.shape[1])[None, :] < lengths[:, None]
    counts = np.zeros((alphabet_size, data.shape[1]), dtype=np.int64)
    for v in range(alphabet_size):
        counts[v] = ((data == v) & valid).sum(axis=0)
    return counts


if _HAS_JAX:

    @functools.partial(jax.jit, static_argnames=("alphabet_size",))
    def _column_value_counts_jax(data, lengths, alphabet_size):
        valid = jnp.arange(data.shape[1])[None, :] < lengths[:, None]
        vals = jnp.arange(alphabet_size, dtype=jnp.uint8)
        hits = (data[None, :, :] == vals[:, None, None]) & valid[None, :, :]
        return hits.sum(axis=1, dtype=jnp.int32)


def column_agreement(data: np.ndarray, lengths: np.ndarray,
                     alphabet_size: int = 16) -> np.ndarray:
    """Fraction of row pairs agreeing at each column (length = max row len).

    Redesign of awre_util.pyx:233-263: instead of comparing all O(N^2)
    pairs per column, count per-column value occurrences and use
    #equal-pairs = sum_v C(c_v, 2).  Pairs where either row is too
    short count as disagreeing (the reference compares only up to
    min(len)).
    """
    n = data.shape[0]
    longest = int(lengths.max()) if n else 0
    if n < 2 or longest == 0:
        return np.zeros(longest, dtype=np.float64)
    if use_device(n * longest * alphabet_size):
        from urh_tpu.util.placement import race

        counts = race(
            "awre.column_value_counts",
            lambda: np.asarray(_column_value_counts_jax(
                jnp.asarray(data), jnp.asarray(lengths), alphabet_size)),
            lambda: _column_value_counts_np(data, lengths, alphabet_size))
    else:
        counts = _column_value_counts_np(data, lengths, alphabet_size)
    counts = counts[:, :longest].astype(np.float64)
    equal_pairs = (counts * (counts - 1.0) / 2.0).sum(axis=0)
    return equal_pairs / (n * (n - 1) / 2)


# ---------------------------------------------------------------------------
# n-gram values & sequence-number deltas
# ---------------------------------------------------------------------------


def _ngram_matrix_np(data, lengths, n):
    width = data.shape[1]
    m = width // n
    clean = np.where(np.arange(width)[None, :] < lengths[:, None], data, 0)
    weights = (1 << np.arange(n - 1, -1, -1)).astype(np.int64)
    vals = clean[:, : m * n].reshape(data.shape[0], m, n).astype(np.int64) @ weights
    avail = np.clip(lengths[:, None] - np.arange(m)[None, :] * n, 0, n)
    return vals >> (n - avail), avail


if _HAS_JAX:

    @functools.partial(jax.jit, static_argnames=("n",))
    def _ngram_matrix_jax(data, lengths, n):
        width = data.shape[1]
        m = width // n
        clean = jnp.where(jnp.arange(width)[None, :] < lengths[:, None], data, 0)
        weights = (1 << jnp.arange(n - 1, -1, -1)).astype(jnp.int32)
        vals = (clean[:, : m * n].reshape(data.shape[0], m, n).astype(jnp.int32)
                @ weights)
        avail = jnp.clip(lengths[:, None] - jnp.arange(m)[None, :] * n, 0, n)
        return vals >> (n - avail), avail


def ngram_values(data: np.ndarray, lengths: np.ndarray, n: int) -> tuple:
    """MSB-first n-gram values of every row at stride n.

    Returns (values (N, M) int64, avail (N, M) bits available per gram).
    Partial tail grams use only the available bits (value >> missing),
    matching bit_array_to_number(bv, min(len, j+n), j).

    n > 30 stays on host: values exceed int32 and jax runs without x64
    here.
    """
    if n <= 30 and use_device(data.size):
        from urh_tpu.util.placement import race

        def run_device():
            v, a = _ngram_matrix_jax(jnp.asarray(data), jnp.asarray(lengths),
                                     n)
            return np.asarray(v).astype(np.int64), np.asarray(a)

        # raced, not size-gated: on a relay link the upload bandwidth,
        # not dispatch latency, decides — measure instead of modeling
        return race(f"awre.ngram_matrix:{n}", run_device,
                    lambda: _ngram_matrix_np(data, lengths, n))
    return _ngram_matrix_np(data, lengths, n)


def seqnum_delta_matrix(data: np.ndarray, lengths: np.ndarray, n: int) -> np.ndarray:
    """(N-1, M) deltas of consecutive rows' n-gram values, mod 2^n.

    Grams beyond min(len_i, len_{i+1}) are -1 (awre_util.pyx:303-369).
    M spans ceil(max_len / n) columns.
    """
    num = data.shape[0]
    max_len = int(lengths.max()) if num else 0
    m_out = -(-max_len // n)
    values, _ = ngram_values(data, lengths, n)
    result = np.full((num - 1, values.shape[1]), -1, dtype=np.int32)
    delta = (values[1:] - values[:-1]) % (1 << n)
    k = np.minimum(lengths[1:], lengths[:-1])
    grams = -(-k // n)  # ceil
    cols = np.arange(values.shape[1])[None, :]
    result = np.where(cols < grams[:, None], delta.astype(np.int32), result)
    return result[:, :m_out]


# ---------------------------------------------------------------------------
# batched pattern occurrence search
# ---------------------------------------------------------------------------


def _occurrence_np(data, lengths, patterns, plens, ignore_mask):
    # data columns are pre-extended by pmax pad columns so every start
    # in [0, true_width) gathers a full window
    n, ext_width = data.shape
    k, pmax = patterns.shape
    starts = ext_width - pmax
    idx = np.arange(starts)[:, None] + np.arange(pmax)[None, :]
    windows = data[:, idx]  # (N, S, Pmax)
    pat_pad = np.arange(pmax)[None, :] >= plens[:, None]  # (K, Pmax)
    eq = windows[:, None, :, :] == patterns[None, :, None, :]
    hit = (eq | pat_pad[None, :, None, :]).all(axis=3)  # (N, K, S)
    fits = (np.arange(starts)[None, None, :] + plens[None, :, None]
            <= lengths[:, None, None])
    hit &= fits
    if ignore_mask is not None:
        touched = ignore_mask[idx]  # (S, Pmax)
        blocked = (touched[None, :, :] & ~pat_pad[:, None, :]).any(axis=2)  # (K, S)
        hit &= ~blocked[None, :, :]
    return hit


if _HAS_JAX:

    _ALPHABET = 16  # uint8 symbol values: bits (0/1) or hex nibbles (0..15)

    @jax.jit
    def _occurrence_jax(data, lengths, patterns, plens, ignore):
        """Pattern occurrence as a one-hot correlation.

        A window matches iff the number of (position, symbol)-coincidences
        equals the pattern length, so the whole (N, K, S) tensor is ONE
        `conv_general_dilated` over 16 one-hot channels — MXU work with a
        trivially compilable program, instead of a windowed gather (which
        XLA compiles poorly, catastrophically so on relayed devices).
        """
        n, ext_width = data.shape
        k, pmax = patterns.shape
        starts = ext_width - pmax
        sym = jnp.arange(_ALPHABET, dtype=data.dtype)

        d1 = (data[:, None, :] == sym[None, :, None]).astype(jnp.float32)
        pat_pad = jnp.arange(pmax)[None, :] >= plens[:, None]  # (K, P)
        q1 = ((patterns[:, None, :] == sym[None, :, None])
              & ~pat_pad[:, None, :]).astype(jnp.float32)

        dn = ("NCH", "OIH", "NCH")
        corr = jax.lax.conv_general_dilated(
            d1, q1, window_strides=(1,), padding="VALID",
            dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST)[..., :starts]  # (N, K, S)
        hit = corr == plens[None, :, None].astype(corr.dtype)

        fits = (jnp.arange(starts)[None, None, :] + plens[None, :, None]
                <= lengths[:, None, None])
        hit &= fits

        touched = ignore.astype(jnp.float32)[None, None, :]     # (1, 1, W)
        qa = (~pat_pad).astype(jnp.float32)[:, None, :]          # (K, 1, P)
        blocked = jax.lax.conv_general_dilated(
            touched, qa, window_strides=(1,), padding="VALID",
            dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST)[0][..., :starts] > 0
        return hit & ~blocked[None, :, :]


def _pack_patterns(patterns, width):
    k = len(patterns)
    plens = np.fromiter((len(p) for p in patterns), dtype=np.int32, count=k)
    pmax = min(_bucket(int(plens.max())), width)
    pat = np.zeros((k, pmax), dtype=np.uint8)
    for i, p in enumerate(patterns):
        pat[i, : plens[i]] = np.asarray(p, dtype=np.uint8)
    return pat, plens, pmax


def _ignore_vector(ignore_columns, width):
    ignore = np.zeros(width, dtype=bool)
    for c in ignore_columns:
        if 0 <= c < width:
            ignore[c] = True
    return ignore


def iter_occurrence_chunks(data: np.ndarray, lengths: np.ndarray, patterns,
                           ignore_columns=(), max_cells: int = 1 << 26):
    """Yield ((row_lo, pat_lo), hits) chunks of the (N, K, S) occurrence
    tensor, bounding the intermediate compare tensor at ~max_cells.

    Batched redesign of awre_util.pyx:265-301 — each chunk matches a
    block of (message, candidate) pairs in one device/vector program.
    Windows touching ``ignore_columns`` never match.
    """
    n, width = data.shape
    k = len(patterns)
    if k == 0 or n == 0:
        return
    pat, plens, pmax = _pack_patterns(patterns, width)
    # extend with pmax pad columns: every start in [0, width) gathers a
    # full (masked) window
    ext = np.full((n, width + pmax), _PAD, dtype=np.uint8)
    ext[:, :width] = data
    ignore = _ignore_vector(ignore_columns, width + pmax)
    starts = width

    k_chunk = max(1, min(k, max_cells // max(1, starts * pmax)))
    n_chunk = max(1, max_cells // max(1, k_chunk * starts * pmax))
    # Measured placement per chunk-shape bucket: a size threshold alone
    # routes these mid-sized tensors by dispatch cost, but on relayed
    # devices the dominant cost is per-shape XLA compilation — race the
    # real chunk once per shape and reuse the verdict (race() warms the
    # device side first, so compile time never decides the verdict).
    from urh_tpu.util.placement import race

    for row_lo in range(0, n, n_chunk):
        row_hi = min(n, row_lo + n_chunk)
        for pat_lo in range(0, k, k_chunk):
            pat_hi = min(k, pat_lo + k_chunk)

            def host_chunk(row_lo=row_lo, row_hi=row_hi,
                           pat_lo=pat_lo, pat_hi=pat_hi):
                return _occurrence_np(ext[row_lo:row_hi],
                                      lengths[row_lo:row_hi],
                                      pat[pat_lo:pat_hi],
                                      plens[pat_lo:pat_hi], ignore)

            if _HAS_JAX and use_device(n * k * starts):
                def device_chunk(row_lo=row_lo, row_hi=row_hi,
                                 pat_lo=pat_lo, pat_hi=pat_hi):
                    # pad the row block to its size bucket so repeated
                    # calls hit one compiled program regardless of N
                    rows = row_hi - row_lo
                    rb = min(_bucket(rows), n) if n else rows
                    rb = max(rb, rows)
                    block = np.full((rb, ext.shape[1]), _PAD, dtype=np.uint8)
                    block[:rows] = ext[row_lo:row_hi]
                    lens_block = np.zeros(rb, dtype=lengths.dtype)
                    lens_block[:rows] = lengths[row_lo:row_hi]
                    hit = np.asarray(_occurrence_jax(
                        jnp.asarray(block), jnp.asarray(lens_block),
                        jnp.asarray(pat[pat_lo:pat_hi]),
                        jnp.asarray(plens[pat_lo:pat_hi]),
                        jnp.asarray(ignore)))
                    return hit[:rows]

                key = (f"awre.occurrence:{_bucket(row_hi - row_lo)}x"
                       f"{pat_hi - pat_lo}x{starts}x{pmax}")
                hit = race(key, device_chunk, host_chunk)
            else:
                hit = host_chunk()
            yield (row_lo, pat_lo), hit


def occurrence_matrix(data: np.ndarray, lengths: np.ndarray, patterns,
                      ignore_columns=()) -> np.ndarray:
    """(N, K, S) boolean: pattern k occurs in row n at start s.

    Materializes the full tensor — only for result sets known to be
    small; larger callers should consume iter_occurrence_chunks.
    """
    n, width = data.shape
    k = len(patterns)
    if k == 0 or n == 0:
        return np.zeros((n, k, 0), dtype=bool)
    out = np.zeros((n, k, width), dtype=bool)
    for (row_lo, pat_lo), hit in iter_occurrence_chunks(
            data, lengths, patterns, ignore_columns):
        out[row_lo : row_lo + hit.shape[0],
            pat_lo : pat_lo + hit.shape[1]] = hit
    return out


# ---------------------------------------------------------------------------
# pairwise equality map (exhaustive common-range search)
# ---------------------------------------------------------------------------


def pairwise_equality(data: np.ndarray, lengths: np.ndarray,
                      pairs: np.ndarray) -> np.ndarray:
    """(P, L) boolean: rows pairs[p] agree at each column (both in range)."""
    left, right = pairs[:, 0], pairs[:, 1]
    eq = data[left] == data[right]
    cols = np.arange(data.shape[1])[None, :]
    in_range = cols < np.minimum(lengths[left], lengths[right])[:, None]
    return eq & in_range


# ---------------------------------------------------------------------------
# GF(2) batched CRC
# ---------------------------------------------------------------------------


# maxsize: the checksum engine probes MANY data-range lengths per run;
# 128 entries thrashed and recomputed generators mid-iteration
@functools.lru_cache(maxsize=4096)
def _crc_generator_matrix(params: tuple, length: int) -> tuple:
    """GF(2) generator for a CRC config over `length`-bit inputs.

    Returns (G (length, W) uint8, c0 (W,) uint8) with
    crc_bits(m) = (m @ G mod 2) xor c0 — every supported CRC option
    (reflect, lsb-first, final xor, little endian) is an affine GF(2)
    map, so this is exact.
    """
    from urh_tpu.coding.crc import bits_to_int, crc_int

    (poly, start_value, final_xor, lsb_first, rev_poly, rev_all, le) = params
    width = len(poly) - 1

    if width <= 62:
        # all L+1 impulse CRCs in one batched column evolution (the rows
        # of the "message matrix" are the zero message + identity)
        from urh_tpu.awre.crc_search import (_column_order, _evolve_states,
                                             _finalize_vec)

        crc_mask = (1 << width) - 1
        poly_int = bits_to_int(list(poly), rev_poly, 1) & crc_mask
        start_int = bits_to_int(list(start_value)) & crc_mask
        final_xor_int = bits_to_int(list(final_xor)) & crc_mask
        probe = np.zeros((length + 1, length), dtype=np.uint8)
        probe[1:] = np.eye(length, dtype=np.uint8)
        order = _column_order(length, lsb_first)
        states = _evolve_states(probe, order, poly_int, crc_mask, start_int,
                                {len(order)})
        final = _finalize_vec(states[len(order)], width, final_xor_int,
                              rev_all, le)
        shifts = np.arange(width - 1, -1, -1)
        c0 = ((final[0] >> shifts) & 1).astype(np.uint8)
        g_ints = final[1:] ^ final[0]
        g = ((g_ints[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
        return g, c0

    zero = np.zeros(length, dtype=np.uint8)

    def crc_of(bits) -> np.ndarray:
        v = crc_int(bits, list(poly), list(start_value), list(final_xor),
                    lsb_first, rev_poly, rev_all, le)
        return np.array([(v >> (width - 1 - i)) & 1 for i in range(width)],
                        dtype=np.uint8)

    c0 = crc_of(zero)
    g = np.zeros((length, width), dtype=np.uint8)
    unit = zero.copy()
    for i in range(length):
        unit[i] = 1
        g[i] = crc_of(unit) ^ c0
        unit[i] = 0
    return g, c0


def batched_crc(messages: np.ndarray, polynomial, start_value, final_xor,
                lsb_first=False, reverse_polynomial=False, reverse_all=False,
                little_endian=False) -> np.ndarray:
    """CRC of N equal-length bit rows as one GF(2) matmul.

    messages: (N, L) uint8 bits.  Returns (N,) int64 CRC values.  The
    generator matrix is cached per (config, L); the matmul itself is
    MXU work (int32 accumulate, parity via & 1).
    """
    messages = np.asarray(messages, dtype=np.uint8)
    n, length = messages.shape
    params = (tuple(int(b) for b in polynomial),
              tuple(int(b) for b in start_value),
              tuple(int(b) for b in final_xor),
              bool(lsb_first), bool(reverse_polynomial), bool(reverse_all),
              bool(little_endian))
    g, c0 = _crc_generator_matrix(params, length)
    width = g.shape[1]
    if use_device(n * length):
        from urh_tpu.util.placement import race

        bits = race(
            "awre.batched_crc_matmul",
            lambda: np.array((jnp.asarray(messages, jnp.int32)
                              @ jnp.asarray(g, jnp.int32)) & 1),
            lambda: (messages.astype(np.int32) @ g.astype(np.int32)) & 1)
    else:
        bits = (messages.astype(np.int32) @ g.astype(np.int32)) & 1
    bits ^= c0.astype(np.int32)
    weights = (1 << np.arange(width - 1, -1, -1)).astype(np.int64)
    return bits.astype(np.int64) @ weights
