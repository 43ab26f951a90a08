"""Streaming demod core: chunked feeding must match the offline pipeline
bit-exactly, regardless of chunk boundaries (run/halo/Costas carries)."""

import numpy as np
import pytest

from urh_tpu.core.signal import Signal
from urh_tpu.dsp.demod import DemodParams, afp_demod
from urh_tpu.dsp.modulate import modulate
from urh_tpu.dsp.symbols import grab_pulse_lens
from urh_tpu.protocol.stream import RunCarry, Segment, StreamDemodulator

GOLDEN_FSK = "/root/reference/tests/data/fsk.complex"


def _stream_rows(sd, data, chunk_sizes):
    i, segs = 0, []
    sizes = iter(chunk_sizes)
    while i < len(data):
        n = next(sizes)
        segs += sd.feed(data[i:i + n])
        i += n
    segs += sd.flush()
    return segs, (np.concatenate([s.ppseq for s in segs])
                  if segs else np.zeros((0, 2), np.int64))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_streamed_fsk_matches_offline_golden(seed):
    sig = Signal.from_file(GOLDEN_FSK)
    sig.modulation_type = "FSK"
    sig.samples_per_symbol = 100
    sig.center = 0
    offline = grab_pulse_lens(sig.qad, 0.0, 5, "FSK", 100, 1, 1.0)

    params = DemodParams(modulation="FSK", samples_per_symbol=100, center=0.0,
                         noise_threshold=sig.noise_threshold, tolerance=5)
    rng = np.random.default_rng(seed)
    data = sig.iq_array.data.astype(np.float32)
    segs, rows = _stream_rows(StreamDemodulator(params, backend="device"), data,
                              (int(rng.integers(100, 5000)) for _ in iter(int, 1)))
    # Prompt close: the trailing pause is reported at whatever length it had
    # when it crossed the gate (the reference's burst flush truncates the
    # same way); every other row is exact.
    np.testing.assert_array_equal(rows[:-1], offline[:len(rows) - 1])
    assert rows[-1][0] == offline[len(rows) - 1][0] == -1
    assert rows[-1][1] >= 10 * 100
    assert segs[0].start_sample == 0


def test_streamed_psk_costas_carry_is_exact():
    """PSK: the Costas loop state must chain across arbitrary chunk cuts."""
    bits = np.resize([1, 0, 1, 1, 0, 0, 1, 0], 64)
    iq = modulate(bits, 100, "psk", [0.0, np.pi], sample_rate=1e6, pause=2500)
    noise = 0.01

    offline_qad = afp_demod(iq, noise, "PSK", 2)
    offline = grab_pulse_lens(offline_qad, 0.0, 5, "PSK", 100, 1, 1.0)

    params = DemodParams(modulation="PSK", samples_per_symbol=100, center=0.0,
                         noise_threshold=noise, tolerance=5)
    rng = np.random.default_rng(7)
    _, rows = _stream_rows(StreamDemodulator(params), iq,
                           (int(rng.integers(50, 700)) for _ in iter(int, 1)))
    # exact rows except the prompt-closed (truncated) trailing pause
    np.testing.assert_array_equal(rows[:-1], offline[:len(rows) - 1])
    assert rows[-1][0] == -1 and rows[-1][1] >= 10 * 100


def test_prompt_close_on_trailing_gate_pause():
    """A gate-length trailing pause closes its segment immediately (the
    sniffer must not wait for more signal to emit the message)."""
    bits = [1, 0, 1, 1, 0, 0, 1, 0]
    iq = modulate(bits, 100, "fsk", [-20e3, 20e3], sample_rate=1e6, pause=0)
    params = DemodParams(modulation="FSK", samples_per_symbol=100, center=0.0,
                         noise_threshold=0.01, tolerance=5)
    sd = StreamDemodulator(params)
    assert sd.feed(iq) == []
    segs = sd.feed(np.zeros((10 * 100, 2), np.float32))
    assert len(segs) == 1
    assert not sd.flush()


def test_adaptive_noise_rises_on_idle_blocks():
    params = DemodParams(modulation="FSK", samples_per_symbol=10, center=0.0,
                         noise_threshold=0.001, tolerance=2)
    sd = StreamDemodulator(params, adaptive_noise=True)
    rng = np.random.default_rng(3)
    idle = rng.normal(0, 3e-4, (2000, 2)).astype(np.float32)
    for _ in range(20):
        sd.feed(idle)
    assert sd.noise_threshold > 0.001


def test_automatic_center_segment_refinement():
    """Per-segment center detection recovers bits when the configured
    center is wrong."""
    bits = np.resize([1, 0, 1, 1, 0, 0, 1, 0], 40)
    iq = modulate(bits, 100, "fsk", [-20e3, 20e3], sample_rate=1e6,
                  pause=1500)
    params = DemodParams(modulation="FSK", samples_per_symbol=100,
                         center=0.3,  # deliberately off
                         noise_threshold=0.01, tolerance=5)
    sd = StreamDemodulator(params, automatic_center=True)
    segs = sd.feed(iq) + sd.flush()
    assert len(segs) == 1
    assert segs[0].center is not None and abs(segs[0].center) < 0.15
    signal_rows = segs[0].ppseq[segs[0].ppseq[:, 0] >= 0]
    recovered = np.repeat(signal_rows[:, 0],
                          np.round(signal_rows[:, 1] / 100).astype(int))
    np.testing.assert_array_equal(recovered, bits)


def test_run_carry_merges_boundary_runs():
    rc = RunCarry(pause_gate=50)
    rc.push(np.array([0, 1]), np.array([10, 5]))
    rc.push(np.array([1, 0]), np.array([7, 3]))
    assert rc.states == [0, 1, 0]
    assert rc.lens == [10, 12, 3]


def test_run_carry_consumes_pure_idle_silently():
    rc = RunCarry(pause_gate=10)
    rc.push(np.array([-1]), np.array([500]))
    assert rc.close_segments() == []
    assert rc.start_abs == 500
    rc.push(np.array([1, -1]), np.array([20, 10]))
    segs = rc.close_segments()
    assert len(segs) == 1
    assert segs[0].start_sample == 500
    assert segs[0].num_samples == 30


@pytest.mark.parametrize("backend", ["host", "auto"])
def test_host_and_auto_backends_recover_same_messages(backend):
    """The NumPy twin (and auto selection) must produce the same message
    content as the device path — qad differs at transcendental ULP but
    the tolerance machinery absorbs it."""
    sig = Signal.from_file(GOLDEN_FSK)
    sig.modulation_type = "FSK"
    sig.samples_per_symbol = 100
    sig.center = 0
    params = DemodParams(modulation="FSK", samples_per_symbol=100, center=0.0,
                         noise_threshold=sig.noise_threshold, tolerance=5)
    data = sig.iq_array.data.astype(np.float32)

    reference_rows = _stream_rows(
        StreamDemodulator(params, backend="device"), data,
        (4096 for _ in iter(int, 1)))[1]
    sd = StreamDemodulator(DemodParams(
        modulation="FSK", samples_per_symbol=100, center=0.0,
        noise_threshold=sig.noise_threshold, tolerance=5), backend=backend)
    _, rows = _stream_rows(sd, data, (4096 for _ in iter(int, 1)))
    assert sd.backend in ("host", "device")  # auto resolved
    np.testing.assert_array_equal(rows, reference_rows)


def test_device_rle_matches_numpy():
    import jax.numpy as jnp

    from urh_tpu.dsp.symbols import _run_length_encode
    from urh_tpu.protocol.stream import _device_rle, unpack_rle

    rng = np.random.default_rng(3)
    states = rng.integers(-1, 3, 5000).astype(np.int32)
    # long runs too
    states[1000:2200] = 2
    packed, n_runs = _device_rle(jnp.asarray(states), cap=len(states) + 1,
                                 state_bits=3)
    r_states, r_lens = unpack_rle(np.asarray(packed), state_bits=3)
    exp_states, _, exp_lens = _run_length_encode(states)
    assert int(n_runs) == len(exp_states)
    np.testing.assert_array_equal(r_states, exp_states)
    np.testing.assert_array_equal(r_lens, exp_lens)

    # overflow: n_runs exceeds cap -> caller must fall back
    alt = np.resize(np.int32([0, 1]), 1000)
    _, n_runs = _device_rle(jnp.asarray(alt), cap=16, state_bits=3)
    assert int(n_runs) == 1000


def test_device_rle_8ary_states_need_four_bits():
    """bits_per_symbol=3 produces states up to 7; a fixed 3-bit state
    field would leak state 7 into the length (the run (7, 3) used to
    decode as PAUSE with a wrong length)."""
    import jax.numpy as jnp

    from urh_tpu.dsp.symbols import _run_length_encode
    from urh_tpu.protocol.stream import (_device_rle, rle_state_bits,
                                         unpack_rle)

    bits = rle_state_bits(8)
    assert bits == 4
    states = np.array([7, 7, 7, -1, -1, 5, 5, 5, 5, 7, 7, 0, 0], np.int32)
    packed, n_runs = _device_rle(jnp.asarray(states), cap=16,
                                 state_bits=bits)
    r_states, r_lens = unpack_rle(np.asarray(packed), state_bits=bits)
    exp_states, _, exp_lens = _run_length_encode(states)
    assert int(n_runs) == len(exp_states)
    np.testing.assert_array_equal(r_states, exp_states)
    np.testing.assert_array_equal(r_lens, exp_lens)


def test_streamed_8ary_fsk_device_path_matches_host():
    """End-to-end stream with bits_per_symbol=3 (8-FSK): the fused
    device RLE path must agree with the host twin (regression for the
    3-bit state-field packing bug)."""
    from urh_tpu.dsp.demod import DemodParams
    from urh_tpu.dsp.modulate import modulate
    from urh_tpu.protocol.stream import StreamDemodulator

    rng = np.random.default_rng(11)
    symbols = rng.integers(0, 8, 48)
    bits = np.array([(s >> k) & 1 for s in symbols for k in (2, 1, 0)],
                    np.uint8)
    freqs = np.linspace(-35e3, 35e3, 8)
    iq = modulate(bits, 60, "fsk", list(freqs), sample_rate=1e6,
                  bits_per_symbol=3, pause=1500)
    # tones spaced 10 kHz apart -> discriminator spacing 2*pi*df/fs
    params = DemodParams(modulation="FSK", samples_per_symbol=60,
                         bits_per_symbol=3, center=0.0,
                         center_spacing=2 * np.pi * 10e3 / 1e6,
                         noise_threshold=0.01, tolerance=5)
    host_rows = _stream_rows(
        StreamDemodulator(params, backend="host"), iq,
        (1024 for _ in iter(int, 1)))[1]
    dev_rows = _stream_rows(
        StreamDemodulator(params, backend="device"), iq,
        (1024 for _ in iter(int, 1)))[1]
    assert (host_rows[:, 0] >= 2).any()  # high-order states exercised
    np.testing.assert_array_equal(dev_rows, host_rows)


def test_device_backend_runs_path_matches_host():
    """The fused device RLE path must produce segment-identical output to
    the host twin, including the halo chunk boundary handling."""
    from urh_tpu.dsp.demod import DemodParams
    from urh_tpu.dsp.modulate import modulate
    from urh_tpu.protocol.stream import StreamDemodulator

    bits = np.resize(np.array([1, 0, 1, 1, 0, 0, 1, 0], np.uint8), 64)
    one = modulate(bits, 20, "fsk", [-20e3, 20e3], sample_rate=1e6, pause=1200)
    capture = np.tile(one, (6, 1)).astype(np.float32)

    def run(backend):
        sd = StreamDemodulator(
            DemodParams(modulation="FSK", samples_per_symbol=20, center=0.0,
                        noise_threshold=1e-3, tolerance=3), backend=backend)
        out = []
        for i in range(0, len(capture), 2048):
            out.extend(sd.feed(capture[i:i + 2048]))
        out.extend(sd.flush())
        return out

    host, device = run("host"), run("device")
    assert len(host) == len(device) >= 1
    for a, b in zip(host, device):
        assert a.start_sample == b.start_sample
        np.testing.assert_array_equal(np.asarray(a.ppseq), np.asarray(b.ppseq))


def test_int8_ingest_matches_float_path():
    """Raw int8 chunks (SDR ingest dtype) through the device path must
    produce the same segments as pre-normalized float32 chunks."""
    from urh_tpu.dsp.demod import DemodParams
    from urh_tpu.dsp.modulate import modulate
    from urh_tpu.protocol.stream import StreamDemodulator

    bits = np.resize(np.array([1, 0, 1, 1, 0, 0, 1, 0], np.uint8), 64)
    one = modulate(bits, 20, "fsk", [-20e3, 20e3], sample_rate=1e6, pause=1200)
    capture_f = np.tile(one, (6, 1)).astype(np.float32) * 0.9
    capture_i8 = np.clip(np.round(capture_f * 128), -128, 127).astype(np.int8)
    # compare against the float path fed the SAME quantized samples
    capture_deq = capture_i8.astype(np.float32) / np.float32(128.0)

    def run(data, backend):
        sd = StreamDemodulator(
            DemodParams(modulation="FSK", samples_per_symbol=20, center=0.0,
                        noise_threshold=1e-2, tolerance=3), backend=backend)
        out = []
        for i in range(0, len(data), 2048):
            out.extend(sd.feed(data[i:i + 2048]))
        out.extend(sd.flush())
        return out

    ref = run(capture_deq, "device")
    i8 = run(capture_i8, "device")
    host_i8 = run(capture_i8, "host")
    assert len(ref) == len(i8) == len(host_i8) >= 1
    for a, b, c in zip(ref, i8, host_i8):
        assert a.start_sample == b.start_sample == c.start_sample
        np.testing.assert_array_equal(np.asarray(a.ppseq), np.asarray(b.ppseq))
        np.testing.assert_array_equal(np.asarray(a.ppseq), np.asarray(c.ppseq))


@pytest.mark.parametrize("backend", ["host", "device"])
def test_random_chunk_boundaries_match_one_shot(backend):
    """Property: ANY chunking of the stream (random cut points, single
    samples, giant blocks) must produce the same segments as feeding the
    capture in one call — across the run-carry, halo, pipelining and
    RLE-capacity fallback machinery."""
    from urh_tpu.dsp.demod import DemodParams
    from urh_tpu.dsp.modulate import modulate
    from urh_tpu.protocol.stream import StreamDemodulator

    bits = np.resize(np.array([1, 1, 0, 1, 0, 0, 1, 0], np.uint8), 48)
    one = modulate(bits, 16, "fsk", [-20e3, 20e3], sample_rate=1e6, pause=700)
    capture = np.tile(one, (5, 1)).astype(np.float32)

    def params():
        return DemodParams(modulation="FSK", samples_per_symbol=16,
                           center=0.0, noise_threshold=1e-3, tolerance=2)

    sd = StreamDemodulator(params(), backend=backend)
    reference = list(sd.feed(capture)) + list(sd.flush())
    assert len(reference) >= 1

    rng = np.random.default_rng(0)
    for trial in range(4):
        cuts = np.sort(rng.choice(np.arange(1, len(capture)),
                                  size=rng.integers(3, 40), replace=False))
        pieces = np.split(capture, cuts)
        sd = StreamDemodulator(params(), backend=backend)
        got = []
        for piece in pieces:
            got.extend(sd.feed(piece))
        got.extend(sd.flush())
        assert len(got) == len(reference), (trial, len(got), len(reference))

        def signal_core(seg):
            """(absolute signal start, rows without boundary pauses).
            Leading/trailing pause lengths are chunking-dependent BY
            DESIGN (a live stream closes a segment once the trailing
            pause reaches the gate; residual idle may attach to the next
            segment), like the reference sniffer — the invariant is the
            message content at its absolute position."""
            rows = np.asarray(seg.ppseq)
            lead = 0
            start = seg.start_sample
            # boundary pauses AND <=tolerance glitch runs at the very edge
            # depend on where the cut fell relative to the noise gate
            while lead < len(rows) and (rows[lead][0] == -1
                                        or rows[lead][1] <= 2):
                start += int(rows[lead][1])
                lead += 1
            tail = len(rows)
            while tail > lead and (rows[tail - 1][0] == -1
                                   or rows[tail - 1][1] <= 2):
                tail -= 1
            return start, rows[lead:tail]

        for a, b in zip(got, reference):
            start_a, core_a = signal_core(a)
            start_b, core_b = signal_core(b)
            assert start_a == start_b, trial
            np.testing.assert_array_equal(core_a, core_b)


def test_host_fsk_sign_decision_matches_atan2():
    """The center-0 host fast path must reproduce atan2(y,x) > 0 exactly,
    including the signed-zero/pi branches."""
    rng = np.random.default_rng(9)
    y = rng.normal(size=4096).astype(np.float32)
    x = rng.normal(size=4096).astype(np.float32)
    # inject every signed-zero combination
    specials = np.array([[0.0, 1.0], [0.0, -1.0], [-0.0, 1.0], [-0.0, -1.0],
                         [0.0, 0.0], [0.0, -0.0], [-0.0, 0.0], [-0.0, -0.0],
                         [1.0, 0.0], [-1.0, -0.0]], dtype=np.float32)
    y = np.concatenate([y, specials[:, 0]])
    x = np.concatenate([x, specials[:, 1]])

    fast = (y > 0) | ((y == 0) & ~np.signbit(y) & np.signbit(x))
    exact = np.arctan2(y, x) > 0
    np.testing.assert_array_equal(fast, exact)


def test_mixed_dtype_chunks_normalize_correctly():
    """Regression: an int8 chunk after a float32 chunk must be normalized
    — it used to reach the demod path with raw -128..127 values and lose
    every pause (noise gate never fired)."""
    from urh_tpu.dsp.demod import DemodParams
    from urh_tpu.dsp.modulate import modulate
    from urh_tpu.protocol.stream import StreamDemodulator

    bits = np.resize(np.array([1, 0, 1, 1, 0, 0, 1, 0], np.uint8), 64)
    one = modulate(bits, 20, "fsk", [-20e3, 20e3], sample_rate=1e6, pause=1200)
    capture_f = np.tile(one, (4, 1)).astype(np.float32) * 0.9
    capture_i8 = np.clip(np.round(capture_f * 128), -128, 127).astype(np.int8)
    capture_deq = capture_i8.astype(np.float32) / np.float32(128.0)
    half = len(capture_f) // 2

    def run(chunks, backend):
        sd = StreamDemodulator(
            DemodParams(modulation="FSK", samples_per_symbol=20, center=0.0,
                        noise_threshold=1e-2, tolerance=3), backend=backend)
        out = []
        for c in chunks:
            out.extend(sd.feed(c))
        out.extend(sd.flush())
        return out

    for backend in ("host", "device"):
        ref = run([capture_deq], backend)
        mixed = run([capture_deq[:half], capture_i8[half:]], backend)
        assert len(mixed) == len(ref) >= 1, backend
        for a, b in zip(mixed, ref):
            assert a.start_sample == b.start_sample
            np.testing.assert_array_equal(np.asarray(a.ppseq),
                                          np.asarray(b.ppseq))


@pytest.mark.parametrize("backend", ["host", "device"])
def test_ask_streaming_with_short_pause_aggregation(backend):
    """ASK through the streaming core: golden capture, host and device
    paths produce the same segments, and the ASK short-pause aggregation
    rule survives chunking."""
    from urh_tpu.dsp.demod import DemodParams
    from urh_tpu.protocol.stream import StreamDemodulator

    raw = np.fromfile("/root/reference/tests/data/ask.complex",
                      np.float32).reshape(-1, 2)
    params = DemodParams(modulation="ASK", samples_per_symbol=295,
                         center=0.0219, noise_threshold=0.0175, tolerance=5)

    sd = StreamDemodulator(params, backend=backend)
    segments = []
    for i in range(0, len(raw), 3000):
        segments.extend(sd.feed(raw[i:i + 3000]))
    segments.extend(sd.flush())
    assert len(segments) >= 1

    # _ppseq_to_bits semantics: state-1 runs are 1-bits; sub-gate pause
    # runs inside a burst render as 0-bits (ASK/OOK)
    rows = np.concatenate([s.ppseq for s in segments])
    bits = ""
    for st, ln in rows:
        symbols = int(round(ln / 295))
        if st == 1:
            bits += "1" * symbols
        elif st == -1 and ln < 8 * 295 and bits:  # leading pause: no bits
            bits += "0" * symbols
    assert bits.startswith("1011001001011011011011011011011011001000000"), \
        bits[:50]
