"""Unit tests for market-basket co-occurrence mining
(operators/association.py) — hand-computed support/confidence/lift and
the mega-basket cap."""

from __future__ import annotations


def test_basket_cooccurrence_hand_computed(spark):
    from hummingbirddatapipeline_spark.operators.association import (
        basket_cooccurrence,
    )

    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"), (2, "z"),
        (3, "x"), (3, "z"),
        (4, "y"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in basket_cooccurrence(df, "basket", "item", min_pair_count=2).collect()
    }
    # x,y together in baskets 1,2; x in 1,2,3; y in 1,2,4; n_baskets=4
    xy = out[("x", "y")]
    assert xy["n_pair"] == 2 and xy["n_a"] == 3 and xy["n_b"] == 3
    assert xy["support"] == 0.5
    assert xy["conf_a_to_b"] == round(2 / 3, 6)
    assert xy["lift"] == round(2 * 4 / (3 * 3), 6)
    # x,z co-occur twice as well; y,z only once -> filtered
    assert ("x", "z") in out and ("y", "z") not in out


def test_basket_cooccurrence_caps_mega_baskets(spark):
    from hummingbirddatapipeline_spark.operators.association import (
        basket_cooccurrence,
    )

    rows = [(1, f"i{k}") for k in range(50)] + [(2, "a"), (2, "b"), (3, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = basket_cooccurrence(
        df, "basket", "item", min_pair_count=2, max_basket=10
    ).collect()
    # the 50-item basket is dropped; only (a, b) survives, n_baskets=2
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"]) == ("a", "b") and r["support"] == 1.0
