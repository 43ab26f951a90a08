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
    ref_qad = afp_demod(x, noise, "FSK", 2)
    thresholds = get_center_thresholds(0.0, 1.0, 2)
    ref_states = symbol_states(ref_qad, thresholds, noise_sentinel("FSK"))

    qad, states = sharded_demodulate(x, noise, "FSK", 0.0, 1.0, 1, mesh=mesh)
    np.testing.assert_array_equal(qad, ref_qad)
    np.testing.assert_array_equal(states, ref_states)


def test_sharded_ask_matches_single_device(mesh):
    sig = ut.Signal.from_file(get_path_for_data_file("ask.complex"))
    x = sig.iq_array.data

    noise = sig.noise_threshold
    ref_qad = afp_demod(x, noise, "ASK", 2)
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
