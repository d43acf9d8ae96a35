"""Domain-mixture reweighting armor (operators/mixing.py).

The oracled entry (q_mix_doremi) pins DuckDB bit-identity end to end;
these pin the MW loop's algebra: the cross-engine floor-division
convention, the fixed point on uniform losses, monotone ordering
(harder domain never ends lighter), mass transfer toward the hardest
domain, and weight positivity under adversarial spreads.
"""

from __future__ import annotations

import math

from nutdb_spark.operators.mixing import (
    DRO_W0,
    _floordiv,
    dro_mixture,
)


def test_floordiv_is_floor_not_truncation():
    # the convention exists BECAUSE engines disagree on negative //
    assert _floordiv(-7, 2) == -4  # truncation would give -3
    assert _floordiv(7, 2) == 3
    assert _floordiv(-400 * 3, 7) == math.floor(-1200 / 7)


def test_uniform_losses_are_a_fixed_point():
    w = dict(dro_mixture([("a", 10, 500), ("b", 90, 500), ("c", 5, 500)]))
    assert set(w.values()) == {DRO_W0}


def test_weight_order_follows_loss_order():
    losses = [("easy", 100, -2000), ("mid", 100, 100), ("hard", 100, 1500)]
    w = dict(dro_mixture(losses))
    assert w["hard"] > w["mid"] > w["easy"]
    # mass moved: the hard domain gains, the easy one sheds
    assert w["hard"] > DRO_W0 > w["easy"]


def test_weights_stay_positive_under_adversarial_spread():
    losses = [("a", 1, 0), ("b", 1, 10**5), ("c", 1, -(10**5))]
    w = dict(dro_mixture(losses, rounds=50))
    assert all(v >= 1 for v in w.values())


def test_more_rounds_concentrate_harder():
    losses = [("easy", 100, 0), ("hard", 100, 1000)]
    w2 = dict(dro_mixture(losses, rounds=2))
    w8 = dict(dro_mixture(losses, rounds=8))
    share2 = w2["hard"] / (w2["hard"] + w2["easy"])
    share8 = w8["hard"] / (w8["hard"] + w8["easy"])
    assert share8 > share2 > 0.5
