"""CI floors for the AWRE accuracy-vs-broken-messages experiments
(tools/awre_accuracy.py; reference concept tests/awre/AWRExperiments.py).

Floors are coarse on purpose: the harness's full curves live in
AWRE_ACCURACY.json — these assertions only catch inference regressions,
not small scoring jitter.
"""

import pytest

from tools.awre_accuracy import (PROTOCOLS, accuracy_curve, calculate_accuracy,
                                 generate, run_format_finder)


@pytest.mark.parametrize("name", sorted(PROTOCOLS))
def test_clean_protocols_fully_recovered(name):
    messages, expected = generate(name, num_messages=16, num_broken=0,
                                  rng_seed=0)
    run_format_finder(messages)
    assert calculate_accuracy(messages, expected) == 100.0


@pytest.mark.parametrize("name", sorted(PROTOCOLS))
def test_quarter_broken_keeps_majority_accuracy(name):
    """With 25% of messages corrupted, the intact messages must still
    recover most fields (reference behavior: accuracy degrades
    gracefully, not cliff-like)."""
    curve = accuracy_curve(name, num_messages=16, broken_counts=[4], runs=1)
    assert curve[0]["accuracy_without_broken"] >= 60.0, curve
    assert curve[0]["accuracy"] >= 50.0, curve
