from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.operators.temporal import asof_join, range_join


def _left(spark):
    # (key, ts, tag)
    rows = [
        ("a", 100, "l1"),
        ("a", 205, "l2"),
        ("a", 300, "l3"),
        ("b", 50, "l4"),
        ("c", 10, "l5"),  # key with no right rows at all
    ]
    return spark.createDataFrame(rows, "k string, ts long, tag string")


def _right(spark):
    rows = [
        ("a", 100, "r1"),  # exact tie with l1 -> inclusive match
        ("a", 200, "r2"),
        ("a", 250, "r3"),
        ("b", 60, "r4"),  # after b's only left row -> no asof match
    ]
    return spark.createDataFrame(rows, "k string, rts long, val string")


def test_asof_join_semantics(spark):
    out = asof_join(_left(spark), _right(spark), "k", "ts", "rts")
    got = {r["tag"]: (r["rts"], r["val"]) for r in out.collect()}
    assert got == {
        "l1": (100, "r1"),  # tie is inclusive (>=)
        "l2": (200, "r2"),
        "l3": (250, "r3"),
        "l4": (None, None),  # right row exists but only after left ts
        "l5": (None, None),  # no right rows for key
    }


def test_asof_join_rejects_column_collision(spark):
    bad = _right(spark).withColumnRenamed("val", "tag")
    with pytest.raises(ValueError, match="collide"):
        asof_join(_left(spark), bad, "k", "ts", "rts")


def test_asof_join_plan_single_shuffle_no_nested_loop(spark):
    out = asof_join(_left(spark), _right(spark), "k", "ts", "rts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # merge-join formulation: exactly one hash-partition exchange (the
    # keyed window); an inequality-join plan would show a join node
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


@pytest.mark.parametrize("lower,upper", [(-100, 0), (0, 100), (-50, 50)])
def test_range_join_matches_naive(spark, lower, upper):
    left, right = _left(spark), _right(spark)
    got = sorted(
        (r["tag"], r["rts"], r["val"])
        for r in range_join(
            left, right, "k", "ts", "rts", lower, upper
        ).collect()
    )
    naive = (
        left.join(right, "k")
        .filter(
            (F.col("rts") - F.col("ts") >= lower)
            & (F.col("rts") - F.col("ts") <= upper)
        )
        .select("tag", "rts", "val")
    )
    want = sorted((r["tag"], r["rts"], r["val"]) for r in naive.collect())
    assert got == want and got  # non-empty at these bounds


def test_range_join_no_duplicate_pairs_and_hash_join(spark):
    out = range_join(_left(spark), _right(spark), "k", "ts", "rts", -200, 200)
    rows = [(r["tag"], r["rts"]) for r in out.collect()]
    assert len(rows) == len(set(rows)), "bucket explode duplicated a pair"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_hypertable_rollup_conserves_totals(spark):
    from hummingbirddatapipeline_spark.catalog import QUERIES

    df = QUERIES["events_hypertable_rollup"](spark, "/root/testdata/sf0.001")
    agg = (
        df.groupBy("grain")
        .agg(
            F.sum("n_events").alias("n"),
            F.round(F.sum("total_value"), 2).alias("v"),
        )
        .collect()
    )
    by_grain = {r["grain"]: (r["n"], float(r["v"])) for r in agg}
    assert by_grain["hour"][0] == by_grain["day"][0] == by_grain["week"][0]
    assert (
        abs(by_grain["hour"][1] - by_grain["day"][1]) < 0.01
        and abs(by_grain["day"][1] - by_grain["week"][1]) < 0.01
    )


def test_scd2_history_intervals(spark):
    from hummingbirddatapipeline_spark.operators.temporal import scd2_history

    rows = [
        (1, "A", 1, 10),
        (1, "A", 2, 11),
        (1, "B", 3, 12),
        (1, "A", 5, 13),
    ]
    df = spark.createDataFrame(rows, "uid long, attr string, ts long, eid long")
    out = sorted(
        scd2_history(df, "uid", "attr", "ts", "eid").collect(),
        key=lambda r: r["version"],
    )
    assert [(r["attr"], r["valid_from"], r["valid_to"], r["n_events"]) for r in out] == [
        ("A", 1, 3, 2),
        ("B", 3, 5, 1),
        ("A", 5, None, 1),
    ]
    assert [r["is_current"] for r in out] == [False, False, True]


def test_scd2_same_timestamp_flip_is_deterministic(spark):
    from hummingbirddatapipeline_spark.operators.temporal import scd2_history

    rows = [(2, "B", 1, 21), (2, "A", 1, 20)]
    df = spark.createDataFrame(rows, "uid long, attr string, ts long, eid long")
    out = sorted(
        scd2_history(df, "uid", "attr", "ts", "eid").collect(),
        key=lambda r: r["version"],
    )
    # event_id tiebreak: A (eid 20) first, then B; both valid_from=1
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in out] == [
        ("A", 1, 1),
        ("B", 1, None),
    ]


def test_lttb_keeps_endpoints_and_spike(spark):
    from hummingbirddatapipeline_spark.operators.temporal import (
        lttb_downsample,
    )

    # flat series with one huge spike: the spike's bucket must keep it
    rows = [(1, t, 100.0 if t != 47 else 5000.0) for t in range(100)]
    df = spark.createDataFrame(rows, "k long, ts long, v double")
    out = sorted(
        lttb_downsample(df, "k", "ts", "v", n_out=10).collect(),
        key=lambda r: r["bucket"],
    )
    assert len(out) == 10
    assert out[0]["ts"] == 0 and out[-1]["ts"] == 99  # endpoints kept
    assert any(r["ts"] == 47 and r["v"] == 5000.0 for r in out)


def test_lttb_small_groups_pass_through(spark):
    from hummingbirddatapipeline_spark.operators.temporal import (
        lttb_downsample,
    )

    rows = [(1, 0, 1.0), (1, 5, 2.0), (2, 3, 9.0)]
    df = spark.createDataFrame(rows, "k long, ts long, v double")
    out = lttb_downsample(df, "k", "ts", "v", n_out=5).collect()
    # groups smaller than n_out keep every point
    assert sorted((r["k"], r["ts"]) for r in out) == [(1, 0), (1, 5), (2, 3)]


def test_lttb_deterministic_across_repartition(spark):
    from hummingbirddatapipeline_spark.operators.temporal import (
        lttb_downsample,
    )
    import random

    rng = random.Random(5)
    rows = [(1, t, rng.uniform(0, 100)) for t in range(200)]
    df = spark.createDataFrame(rows, "k long, ts long, v double")
    a = sorted(map(tuple, lttb_downsample(df, "k", "ts", "v", 12).collect()))
    b = sorted(
        map(
            tuple,
            lttb_downsample(df.repartition(7), "k", "ts", "v", 12).collect(),
        )
    )
    assert a == b and len(a) == 12


def test_transition_counts_hand_computed(spark):
    from hummingbirddatapipeline_spark.operators.temporal import (
        transition_counts,
    )

    rows = [
        (1, "a", 0, 0), (1, "b", 10, 1), (1, "a", 20, 2), (1, "b", 30, 3),
        (2, "a", 0, 4), (2, "b", 5000, 5),  # gap-broken with gap=1000
    ]
    df = spark.createDataFrame(rows, "uid long, st string, ts long, eid long")
    out = {
        (r["from_state"], r["to_state"]): r
        for r in transition_counts(
            df, "uid", "st", "ts", "eid", session_gap=1000
        ).collect()
    }
    assert out[("a", "b")]["n_transitions"] == 2  # user2's crossing dropped
    assert out[("b", "a")]["n_transitions"] == 1
    assert out[("a", "b")]["p_transition"] == 1.0
    assert out[("b", "a")]["p_transition"] == 1.0
