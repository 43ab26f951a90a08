"""Real-chip test lane (VERDICT r3 #6).

Run with:  URH_TPU_BACKEND=1 python -m pytest tests -m tpu -q

These tests exercise the golden demod path, the streaming core and the
Pallas kernels on the actual TPU backend.  Decisions (bits, states,
message counts) must be EXACT — they are what the framework guarantees;
real-valued intermediates (qad) get backend-appropriate tolerances
because TPU fusions order float math differently than XLA:CPU.

Only one process may use the TPU at a time: never run this lane
concurrently with bench.py or another TPU session.
"""

import numpy as np
import pytest

import urh_tpu as ut
from tests.golden import get_path_for_data_file

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"TPU backend not active ({jax.default_backend()!r})")


def _demod(sig):
    pa = ut.ProtocolAnalyzer(sig)
    pa.get_protocol_from_signal()
    return pa


def test_tpu_golden_fsk_bits_exact():
    sig = ut.Signal.from_file(get_path_for_data_file("fsk.complex"))
    sig.modulation_type = "FSK"
    sig.samples_per_symbol = 100
    sig.center = 0
    pa = _demod(sig)
    assert pa.plain_bits_str[0] == (
        "1010101010101010101010101010101011000110001001101100011000100110"
        "1111010011011100000111011001100011101110111101111010010000100111"
        "1001100110011100110100100011100111010011111100011"
    )


def test_tpu_golden_ask_bits_exact():
    sig = ut.Signal.from_file(get_path_for_data_file("ask.complex"))
    sig.modulation_type = "ASK"
    sig.samples_per_symbol = 295
    sig.center = 0.0219
    pa = _demod(sig)
    assert pa.plain_bits_str[0].startswith(
        "1011001001011011011011011011011011001000000")


def test_tpu_demod_kernel_matches_host():
    """Device afp_demod vs NumPy oracle: gate decisions exact, qad within
    TPU tolerance (atan2 implementation differs from libm)."""
    from urh_tpu.dsp.demod import afp_demod

    import jax.numpy as jnp

    raw = np.fromfile(get_path_for_data_file("fsk.complex"),
                      np.float32).reshape(-1, 2)
    noise = 0.0009
    # pass a device-resident array: adaptive placement would route this
    # capture to the native host twin on a bandwidth-limited link, but
    # this test exists to check the CHIP's numerics
    qad = np.asarray(afp_demod(jnp.asarray(raw), noise, "FSK", 2,
                               dtype=np.float32))

    re, im = raw[:, 0].astype(np.float64), raw[:, 1].astype(np.float64)
    mag2 = re * re + im * im
    pr = np.concatenate([re[:1], re[:-1]])
    pi = np.concatenate([im[:1], im[:-1]])
    val = np.arctan2(pr * im - pi * re, pr * re + pi * im)
    ref = np.where(mag2 <= noise * noise, -4.0, val)
    ref[0] = -4.0

    np.testing.assert_array_equal(qad == -4.0, ref == -4.0)
    mask = qad != -4.0
    np.testing.assert_allclose(qad[mask], ref[mask], atol=5e-3)
    # the decisions the bit pipeline actually uses must be exact
    np.testing.assert_array_equal(qad[mask] > 0, ref[mask] > 0)


def test_tpu_stream_demodulator_chunked():
    """StreamDemodulator over the golden capture in chunks must yield the
    same segments as the one-shot path."""
    from urh_tpu.dsp.demod import DemodParams
    from urh_tpu.protocol.stream import StreamDemodulator

    raw = np.fromfile(get_path_for_data_file("fsk.complex"),
                      np.float32).reshape(-1, 2)
    params = DemodParams(modulation="FSK", samples_per_symbol=100,
                         center=0.0, noise_threshold=0.0009, tolerance=5)

    sd = StreamDemodulator(params)
    segments = []
    chunk = 8192
    for i in range(0, len(raw), chunk):
        segments.extend(sd.feed(raw[i:i + chunk]))
    segments.extend(sd.flush())
    assert len(segments) >= 1

    sd2 = StreamDemodulator(params)
    one_shot = list(sd2.feed(raw)) + list(sd2.flush())
    assert len(segments) == len(one_shot)
    for a, b in zip(segments, one_shot):
        assert a.start_sample == b.start_sample
        assert np.array_equal(np.asarray(a.ppseq), np.asarray(b.ppseq))


def test_tpu_pallas_fused_demod():
    """Pallas fused FSK demod+symbolize on-chip vs the NumPy oracle:
    states exact away from the gate boundary."""
    import jax.numpy as jnp

    from urh_tpu.dsp.pallas_kernels import (fused_fsk_demod_symbolize,
                                            pad_for_pallas)

    rng = np.random.default_rng(5)
    x = rng.normal(0, 0.5, (1 << 15, 2)).astype(np.float32)
    noise_sqrd = np.float32(1e-4)
    re_p, im_p, n = pad_for_pallas(x)

    qad, states = fused_fsk_demod_symbolize(
        jnp.asarray(re_p), jnp.asarray(im_p), jnp.float32(noise_sqrd),
        jnp.float32(0.0))
    qad = np.asarray(qad).reshape(-1)[:len(x)]
    states = np.asarray(states).reshape(-1)[:len(x)]

    re, im = x[:, 0], x[:, 1]
    mag2 = re * re + im * im
    pr = np.concatenate([re[:1], re[:-1]])
    pi = np.concatenate([im[:1], im[:-1]])
    t_im = pr * im - pi * re
    t_re = pr * re + pi * im
    ref_states = np.where(mag2 <= noise_sqrd, -1,
                          (np.arctan2(t_im, t_re) > 0).astype(np.int32))

    # ignore samples within float32 ulp of the noise gate
    solid = np.abs(mag2 - noise_sqrd) > 1e-6 * np.maximum(mag2, noise_sqrd)
    np.testing.assert_array_equal(states[solid & (ref_states >= 0)][1:],
                                  ref_states[solid & (ref_states >= 0)][1:])
    mask = (states >= 0) & solid
    np.testing.assert_allclose(qad[mask][1:],
                               np.arctan2(t_im, t_re)[mask][1:], atol=5e-3)


def test_tpu_modulate_roundtrip():
    """Modulate on device, demodulate on device, recover exact bits."""
    from urh_tpu.core.iq import IQData
    from urh_tpu.dsp.modulate import modulate

    bits_str = "10110010" * 8
    bits = np.array(list(map(int, bits_str)), dtype=np.uint8)
    iq = modulate(bits, 100, "FSK", np.float32([-10e3, 10e3]),
                  sample_rate=1e6, pause=1000)
    sig = ut.Signal.from_iq(IQData(iq, skip_conversion=True))
    sig.modulation_type = "FSK"
    sig.noise_threshold = 1e-3
    sig.center = 0
    sig.samples_per_symbol = 100
    pa = _demod(sig)
    assert pa.plain_bits_str[0] == bits_str
