"""CI floors for the AWRE accuracy-vs-broken-messages experiments
(tools/awre_accuracy.py; reference concept tests/awre/AWRExperiments.py).

The full curves (3 protocol families x {16, 64, 256} messages x 5
broken fractions x 10 runs, with std/SEM) live in AWRE_ACCURACY.json.
These assertions run a single-seed subset and hold floors set ~3 sigma
below the recorded means — they catch inference regressions, not
scoring jitter.
"""

import pytest

from tools.awre_accuracy import (PROTOCOLS, accuracy_curve,
                                 broken_counts_for, calculate_accuracy,
                                 generate, run_format_finder)


@pytest.mark.parametrize("num_messages", [16, 64])
@pytest.mark.parametrize("name", sorted(PROTOCOLS))
def test_clean_protocols_fully_recovered(name, num_messages):
    """Recorded curves: accuracy == 100.0 with 0 broken for every
    family at every message count."""
    messages, expected = generate(name, num_messages, num_broken=0,
                                  rng_seed=0)
    run_format_finder(messages)
    assert calculate_accuracy(messages, expected) == 100.0


# floors ~3 sigma below the 10-run means in AWRE_ACCURACY.json at the
# quarter-broken point (fraction 2/8), per family
_QUARTER_FLOORS = {  # (accuracy, accuracy_without_broken)
    "basic": (55.0, 60.0),
    "long_preamble": (40.0, 45.0),
    "checksum_ack": (40.0, 45.0),
}


@pytest.mark.parametrize("name", sorted(PROTOCOLS))
def test_quarter_broken_keeps_majority_accuracy(name):
    """With 25% of messages corrupted, the intact messages must still
    recover most fields (reference behavior: accuracy degrades
    gracefully, not cliff-like)."""
    floor_acc, floor_wo = _QUARTER_FLOORS[name]
    curve = accuracy_curve(name, num_messages=16, broken_counts=[4], runs=2)
    assert curve[0]["accuracy_without_broken"] >= floor_wo, curve
    assert curve[0]["accuracy"] >= floor_acc, curve


def test_scaling_to_64_messages_does_not_regress():
    """More messages help the engines: at the quarter-broken point the
    64-message curve must not fall below the 16-message floors
    (recorded: basic 80.3 +/- 3.9 at 64 vs 72.8 +/- 5.1 at 16)."""
    curve = accuracy_curve("basic", num_messages=64,
                           broken_counts=[16], runs=1)
    assert curve[0]["accuracy"] >= 60.0, curve
    assert curve[0]["accuracy_without_broken"] >= 65.0, curve


def test_broken_fraction_grid_scales_with_message_count():
    assert broken_counts_for(16) == [0, 2, 4, 6, 8]
    assert broken_counts_for(64) == [0, 8, 16, 24, 32]
    assert broken_counts_for(256) == [0, 32, 64, 96, 128]


def test_recorded_artifact_matches_schema():
    """AWRE_ACCURACY.json carries the full recorded sweep: every family,
    every message count, 5 curve points with mean/std/SEM, 10 runs."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AWRE_ACCURACY.json")
    with open(path) as f:
        data = json.load(f)
    assert data["runs"] >= 10
    assert data["message_counts"] == [16, 64, 256]
    for name in PROTOCOLS:
        for count in data["message_counts"]:
            curve = data["curves"][name][str(count)]
            assert len(curve) == 5
            assert curve[0]["broken"] == 0
            assert curve[0]["accuracy"] == 100.0
            for point in curve:
                assert {"accuracy", "accuracy_std", "accuracy_sem",
                        "accuracy_without_broken"} <= set(point)
            # graceful degradation: half-broken still recovers fields
            assert curve[-1]["accuracy"] >= 25.0
