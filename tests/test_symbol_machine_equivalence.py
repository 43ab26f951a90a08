"""Equivalence of the run-level symbolizer with the reference's
per-sample state machine.

The production code (urh_tpu/dsp/symbols.py) reformulates the sequential
tolerance state machine into vectorized run-level operations.  These
tests fuzz it against a direct per-sample oracle implementing the
reference semantics (signal_functions.pyx:392-495), including the
initial-state quirk, pause aggregation for ASK, and tolerance merging.
"""

import numpy as np
import pytest

from urh_tpu.dsp.demod import noise_sentinel
from urh_tpu.dsp.symbols import get_center_thresholds, grab_pulse_lens

PAUSE_STATE = -1


def oracle_grab_pulse_lens(samples, center, tolerance, modulation_type,
                           samples_per_symbol, bits_per_symbol=1, center_spacing=0.1):
    """Per-sample oracle with the reference's exact control flow."""
    is_ask = modulation_type == "ASK"
    num_samples = len(samples)
    NOISE = noise_sentinel(modulation_type)
    modulation_order = 2 ** bits_per_symbol
    thresholds = get_center_thresholds(center, center_spacing, modulation_order)

    result = np.zeros((num_samples, 2), dtype=np.int64)
    if num_samples == 0:
        return result
    state_count = np.zeros(modulation_order, dtype=np.int64)

    pulse_length = 0
    cur_index = 0
    consecutive_pause = 0
    s = 0.0

    s_prev = samples[0]
    if s_prev == NOISE:
        cur_state = PAUSE_STATE
    else:
        cur_state = modulation_order - 1
        for k in range(modulation_order - 1):
            if s <= thresholds[k]:
                cur_state = k
                break

    for i in range(num_samples):
        pulse_length += 1
        s = samples[i]

        if s == NOISE:
            tmp_state = PAUSE_STATE
        else:
            tmp_state = modulation_order - 1
            for k in range(modulation_order - 1):
                if s <= thresholds[k]:
                    tmp_state = k
                    break

        if tmp_state == PAUSE_STATE:
            consecutive_pause += 1
        else:
            consecutive_pause = 0

        for j in range(modulation_order):
            if j == tmp_state:
                state_count[j] += 1
            else:
                state_count[j] = 0

        if cur_state == tmp_state:
            continue

        new_state = -42
        if consecutive_pause > tolerance:
            new_state = PAUSE_STATE
        else:
            for j in range(modulation_order):
                if state_count[j] > tolerance:
                    new_state = j
                    break
        if new_state == -42:
            continue

        if is_ask and cur_state == PAUSE_STATE and (pulse_length - tolerance) < samples_per_symbol:
            cur_state = 0

        if cur_index > 0 and result[cur_index - 1, 0] == cur_state:
            result[cur_index - 1, 1] += pulse_length - tolerance
        else:
            result[cur_index, 0] = cur_state
            result[cur_index, 1] = pulse_length - tolerance
            cur_index += 1

        pulse_length = tolerance
        cur_state = new_state

    if cur_index < len(result):
        if cur_index > 0 and result[cur_index - 1, 0] == cur_state:
            result[cur_index - 1, 1] += pulse_length - tolerance
        else:
            result[cur_index, 0] = cur_state
            result[cur_index, 1] = pulse_length - tolerance
            cur_index += 1

    return result[:cur_index]


def random_rect_signal(rng, n, mod, order):
    """Synthesize a plausible rectangular (demodulated) signal with runs
    of symbol levels, noise stretches and glitches."""
    sentinel = noise_sentinel(mod)
    levels = np.linspace(-0.6, 0.6, order) if mod != "ASK" else np.linspace(0.1, 0.9, order)
    out = []
    while sum(len(o) for o in out) < n:
        kind = rng.integers(0, 5)
        length = int(rng.integers(1, 40))
        if kind == 0:
            out.append(np.full(length, sentinel, dtype=np.float32))
        else:
            lvl = levels[rng.integers(0, order)] + rng.normal(0, 0.02, length)
            out.append(lvl.astype(np.float32))
    sig = np.concatenate(out)[:n]
    # ensure no accidental sentinel collisions from noise jitter
    sig[np.isclose(sig, sentinel) & (sig != sentinel)] += 0.05
    return sig


@pytest.mark.parametrize("mod,order,center,spacing", [
    ("ASK", 2, 0.5, 0.1),
    ("FSK", 2, 0.0, 0.1),
    ("FSK", 4, 0.0, 0.4),
    ("PSK", 4, 0.0, 0.4),
])
@pytest.mark.parametrize("tolerance", [0, 2, 5, 11])
def test_fuzz_equivalence(mod, order, center, spacing, tolerance):
    rng = np.random.default_rng(1234 + tolerance + order)
    bps = order.bit_length() - 1
    for trial in range(8):
        n = int(rng.integers(5, 2000))
        sig = random_rect_signal(rng, n, mod, order)
        expected = oracle_grab_pulse_lens(sig, center, tolerance, mod, 30, bps, spacing)
        got = grab_pulse_lens(sig, center, tolerance, mod, 30, bps, spacing)
        np.testing.assert_array_equal(got, expected, err_msg=f"trial {trial} n={n}")


def test_empty_and_tiny():
    assert grab_pulse_lens(np.zeros(0, np.float32), 0.0, 5, "FSK", 100).shape == (0, 2)
    one = grab_pulse_lens(np.array([0.3], np.float32), 0.0, 5, "FSK", 100)
    exp = oracle_grab_pulse_lens(np.array([0.3], np.float32), 0.0, 5, "FSK", 100)
    np.testing.assert_array_equal(one, exp)


def test_all_noise():
    sig = np.full(100, noise_sentinel("FSK"), dtype=np.float32)
    got = grab_pulse_lens(sig, 0.0, 5, "FSK", 100)
    exp = oracle_grab_pulse_lens(sig, 0.0, 5, "FSK", 100)
    np.testing.assert_array_equal(got, exp)


def test_center_thresholds():
    # binary: single threshold at center
    np.testing.assert_allclose(get_center_thresholds(0.2, 0.1, 2), [0.2])
    # 4-ary: center-spacing, center, center+spacing
    np.testing.assert_allclose(
        get_center_thresholds(0.0, 0.1, 4), np.float32([-0.1, 0.0, 0.1]), atol=1e-7
    )
