"""Sharded pipeline correctness: the block-sharded demod over a virtual
8-device CPU mesh must be bit-identical to the single-device path."""

import jax
import numpy as np
import pytest

import urh_tpu as ut
from urh_tpu.dsp.demod import afp_demod
from urh_tpu.dsp.symbols import get_center_thresholds, symbol_states
from urh_tpu.dsp.demod import noise_sentinel
from urh_tpu.parallel.sharded import make_mesh, sharded_demodulate

from tests.golden import get_path_for_data_file


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return make_mesh()


def test_sharded_fsk_matches_single_device(mesh):
    sig = ut.Signal.from_file(get_path_for_data_file("fsk.complex"))
    x = sig.iq_array.data

    noise = sig.noise_threshold
    # the sharded path's contract is equality with the DEVICE program
    # (afp_demod may route borderline-sized captures to its 1-ULP-different
    # host twin depending on the measured link latency)
    import jax.numpy as jnp

    from urh_tpu.core.iq import max_magnitude_for_dtype
    from urh_tpu.dsp.demod import _afp_demod_vec

    ref_qad = np.asarray(_afp_demod_vec(
        jnp.asarray(x.astype(np.float32)), jnp.float32(noise * noise),
        jnp.float32(max_magnitude_for_dtype(x.dtype)), "FSK"))
    thresholds = get_center_thresholds(0.0, 1.0, 2)
    ref_states = symbol_states(ref_qad, thresholds, noise_sentinel("FSK"))

    qad, states = sharded_demodulate(x, noise, "FSK", 0.0, 1.0, 1, mesh=mesh)
    np.testing.assert_array_equal(qad, ref_qad)
    np.testing.assert_array_equal(states, ref_states)


def test_sharded_ask_matches_single_device(mesh):
    sig = ut.Signal.from_file(get_path_for_data_file("ask.complex"))
    x = sig.iq_array.data

    noise = sig.noise_threshold
    # the sharded path's contract is equality with the DEVICE program
    # (afp_demod may route small captures to its 1-ULP-different host twin)
    import jax.numpy as jnp

    from urh_tpu.core.iq import max_magnitude_for_dtype
    from urh_tpu.dsp.demod import _afp_demod_vec

    ref_qad = np.asarray(_afp_demod_vec(
        jnp.asarray(x.astype(np.float32)), jnp.float32(noise * noise),
        jnp.float32(max_magnitude_for_dtype(x.dtype)), "ASK"))
    qad, states = sharded_demodulate(x, noise, "ASK", 0.0219, 0.1, 1, mesh=mesh)
    np.testing.assert_array_equal(qad, ref_qad)


def test_sharded_end_to_end_bits(mesh):
    """Full pipeline with sharded device stages produces the same bits."""
    sig = ut.Signal.from_file(get_path_for_data_file("fsk.complex"))
    sig.modulation_type = "FSK"
    sig.samples_per_symbol = 100
    sig.center = 0

    qad, _ = sharded_demodulate(sig.iq_array.data, sig.noise_threshold, "FSK",
                                0.0, 1.0, 1, mesh=mesh)
    sig._qad = qad  # inject the sharded-computed rectangular signal
    pa = ut.ProtocolAnalyzer(sig)
    pa.get_protocol_from_signal()
    assert pa.plain_bits_str[0].startswith("10101010101010101010101010101010110001100010011011000110")


def test_sharded_fir_matches_sequential(mesh):
    from urh_tpu.parallel.sharded import sharded_fir_filter

    rng = np.random.default_rng(4)
    x = (rng.normal(size=40_000) + 1j * rng.normal(size=40_000)).astype(np.complex64)
    taps = rng.normal(size=31).astype(np.complex64)

    got = sharded_fir_filter(x, taps, mesh=mesh)
    exp = np.convolve(x, taps)[: len(x)]
    np.testing.assert_allclose(got, exp, atol=1e-2)


def test_sharded_spectrogram_matches_single(mesh):
    from urh_tpu.dsp.spectrogram import Spectrogram
    from urh_tpu.parallel.sharded import sharded_spectrogram

    n = 1 << 16
    tone = np.exp(2j * np.pi * 0.05 * np.arange(n)).astype(np.complex64)

    got = sharded_spectrogram(tone, mesh=mesh)
    spec = Spectrogram(tone)
    exp = spec.stft(tone)
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_sharded_costas_psk_bits(mesh):
    """Block-parallel Costas with overlap-discard must recover the same
    bits as the sequential loop on a synthetic PSK signal."""
    from urh_tpu.dsp.demod import afp_demod
    from urh_tpu.dsp.modulate import modulate
    from urh_tpu.dsp.symbols import grab_pulse_lens
    from urh_tpu.parallel.sharded import sharded_psk_demod

    rng = np.random.default_rng(9)
    bits = rng.integers(0, 2, 512)
    params = np.float32([0, np.pi])
    iq = modulate(bits, 100, "PSK", params, 1, 1, 40e3, 0, 1e6, 0, 0)

    seq_qad = afp_demod(iq, 0, "PSK", 2)
    shard_qad = sharded_psk_demod(iq, 0, 2, margin=8192, mesh=mesh)

    seq_pulses = grab_pulse_lens(seq_qad, 0, 5, "PSK", 100)
    shard_pulses = grab_pulse_lens(shard_qad, 0, 5, "PSK", 100)

    # identical symbol sequence; lengths may differ by a sample in the
    # initial lock-in transient (overlap-discard restarts the loop state)
    assert shard_pulses.shape == seq_pulses.shape
    np.testing.assert_array_equal(shard_pulses[:, 0], seq_pulses[:, 0])
    np.testing.assert_allclose(shard_pulses[:, 1], seq_pulses[:, 1], atol=2)
    np.testing.assert_array_equal(shard_pulses[3:], seq_pulses[3:])


def test_sharded_costas_psk_exact(mesh):
    """Chained per-block Costas scans are BITWISE identical to the
    sequential loop: the (phase, freq) carry crosses block boundaries."""
    from urh_tpu.dsp.demod import afp_demod
    from urh_tpu.dsp.modulate import modulate
    from urh_tpu.parallel.sharded import sharded_psk_demod_exact

    rng = np.random.default_rng(17)
    bits = rng.integers(0, 2, 300)
    params = np.float32([0, np.pi])
    iq = modulate(bits, 100, "PSK", params, 1, 1, 40e3, 0, 1e6, 0, 0)
    iq = iq + rng.normal(0, 0.05, iq.shape).astype(np.float32)

    seq_qad = afp_demod(iq, 0.01, "PSK", 2)
    shard_qad = sharded_psk_demod_exact(iq, 0.01, 2, mesh=mesh)
    np.testing.assert_array_equal(shard_qad, seq_qad)


def test_sharded_psk_golden_capture_exact(mesh):
    """Exact sharded PSK on the recorded golden capture: no slack."""
    from urh_tpu.dsp.demod import afp_demod
    from urh_tpu.parallel.sharded import sharded_psk_demod_exact

    sig = ut.Signal.from_file(get_path_for_data_file("psk_gen_noisy.complex"))
    x = sig.iq_array.data
    seq_qad = afp_demod(x, sig.noise_threshold, "PSK", 2)
    shard_qad = sharded_psk_demod_exact(x, sig.noise_threshold, 2, mesh=mesh)
    np.testing.assert_array_equal(shard_qad, seq_qad)


def test_sharded_pulse_lens_never_gathers(mesh):
    """Shard-local run extraction: pulse list equals the single-host path
    while the per-sample state array is consumed shard by shard."""
    from urh_tpu.dsp.demod import afp_demod
    from urh_tpu.dsp.symbols import grab_pulse_lens
    from urh_tpu.parallel.sharded import sharded_pulse_lens

    sig = ut.Signal.from_file(get_path_for_data_file("fsk.complex"))
    x = sig.iq_array.data
    noise = sig.noise_threshold

    ref_qad = afp_demod(x, noise, "FSK", 2)
    expected = grab_pulse_lens(ref_qad, 0.0, 5, "FSK", 100)

    got = sharded_pulse_lens(x, noise, "FSK", center=0.0, center_spacing=1.0,
                             bits_per_symbol=1, tolerance=5,
                             samples_per_symbol=100, mesh=mesh)
    np.testing.assert_array_equal(got, expected)


def test_sharded_end_to_end_bits_without_gather(mesh):
    """Sharded demod -> shard-local runs -> pulse machine -> bits equals
    the single-host protocol path on a golden capture."""
    from urh_tpu.parallel.sharded import sharded_pulse_lens
    from urh_tpu.protocol.analyzer import ProtocolAnalyzer

    sig = ut.Signal.from_file(get_path_for_data_file("fsk.complex"))
    sig.modulation_type = "FSK"
    sig.samples_per_symbol = 100
    sig.center = 0

    pulses = sharded_pulse_lens(sig.iq_array.data, sig.noise_threshold, "FSK",
                                center=0.0, center_spacing=1.0,
                                bits_per_symbol=1, tolerance=5,
                                samples_per_symbol=100, mesh=mesh)
    bit_data, _, _ = ProtocolAnalyzer._ppseq_to_bits(pulses, 100, 1)
    bits = "".join(map(str, bit_data[0]))
    assert bits.startswith(
        "10101010101010101010101010101010110001100010011011000110")
