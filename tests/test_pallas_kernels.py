"""Fused Pallas demod kernel correctness vs the reference jnp path.

On CPU the pallas_call runs in interpret mode (jax interprets Mosaic);
on TPU it compiles.  Either way results must match afp_demod +
symbol_states exactly.
"""

import jax
import numpy as np
import pytest

from urh_tpu.dsp.demod import afp_demod, noise_sentinel
from urh_tpu.dsp.pallas_kernels import fsk_demod_symbolize
from urh_tpu.dsp.symbols import get_center_thresholds, symbol_states


def reference_path(samples, noise, threshold):
    qad = afp_demod(samples, noise, "FSK", 2)
    states = symbol_states(qad, np.float32([threshold]), noise_sentinel("FSK"))
    return qad, states


@pytest.mark.parametrize("n", [1000, 65536, 65536 * 2 + 17])
def test_fused_matches_reference(n):
    rng = np.random.default_rng(3)
    samples = rng.normal(0, 0.5, (n, 2)).astype(np.float32)
    # add silent stretches to exercise the noise gate
    samples[100:300] *= 0.001
    noise = 0.1
    threshold = 0.0

    on_tpu = jax.default_backend() == "tpu"
    qad, states = fsk_demod_symbolize(samples, noise, threshold, interpret=not on_tpu)
    ref_qad, ref_states = reference_path(samples, noise, threshold)

    np.testing.assert_allclose(qad, ref_qad, atol=1e-6)
    np.testing.assert_array_equal(states, ref_states)

@pytest.mark.parametrize("n", [1000, 65536 + 129])
def test_i8_symbolize_matches_reference(n):
    from urh_tpu.dsp.pallas_kernels import fsk_symbolize_i8
    from urh_tpu.dsp.symbols import grab_pulse_lens

    rng = np.random.default_rng(7)
    samples = (rng.normal(0, 40, (n, 2)).clip(-128, 127)).astype(np.int8)
    samples[100:300] = 0  # silent stretch -> gated
    noise = 10.0
    threshold = 0.0

    on_tpu = jax.default_backend() == "tpu"
    states = fsk_symbolize_i8(samples, noise, threshold, interpret=not on_tpu)

    ref_qad, ref_states = reference_path(samples, noise, threshold)
    # exact: the kernel's atan2 honors IEEE signed-zero branch semantics,
    # and int8 products are exactly representable in float32
    np.testing.assert_array_equal(states, ref_states)

    # states-only pulse extraction must reproduce the qad-driven machine
    pp1 = grab_pulse_lens(None, threshold, 5, "FSK", 100, precomputed_states=ref_states)
    pp2 = grab_pulse_lens(ref_qad, threshold, 5, "FSK", 100)
    np.testing.assert_array_equal(pp1, pp2)

@pytest.mark.parametrize("n", [1000, 65536 + 77])
def test_ask_fused_matches_reference(n):
    from urh_tpu.dsp.pallas_kernels import ask_demod_symbolize, ask_symbolize_i8

    rng = np.random.default_rng(5)
    samples = rng.normal(0, 0.4, (n, 2)).astype(np.float32)
    samples[200:400] *= 0.01
    noise, threshold = 0.1, 0.3
    max_mag = np.sqrt(2)

    on_tpu = jax.default_backend() == "tpu"
    qad, states = ask_demod_symbolize(samples, noise, threshold, max_mag,
                                      interpret=not on_tpu)
    ref_qad = afp_demod(samples, noise, "ASK", 2)
    ref_states = symbol_states(ref_qad, np.float32([threshold]),
                               noise_sentinel("ASK"))
    np.testing.assert_allclose(qad, ref_qad, atol=1e-6)
    np.testing.assert_array_equal(states, ref_states)

    # int8 states-only variant
    samples_i8 = (rng.normal(0, 40, (n, 2)).clip(-128, 127)).astype(np.int8)
    samples_i8[100:300] = 0
    import math as _math
    max_i8 = _math.sqrt(127 * 127 + 128 * 128)
    st = ask_symbolize_i8(samples_i8, 10.0, 0.3, max_i8, interpret=not on_tpu)
    ref_qad8 = afp_demod(samples_i8, 10.0, "ASK", 2)
    ref_states8 = symbol_states(ref_qad8, np.float32([0.3]), noise_sentinel("ASK"))
    np.testing.assert_array_equal(st, ref_states8)
