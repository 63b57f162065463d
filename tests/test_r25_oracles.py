"""Differential (DuckDB) checks for the fifth late-bank tier (the
"r25 bank") — the islands-and-gaps freshness report over events, the
ViT patch-grid manifest over synthetic image metadata, and the
TPC-H-Q14-shaped monthly promo-revenue share — run on the real
testdata exactly the way the catalog oracle gate would. Each DuckDB
side is an independent formulation: the gap oracle re-derives the
per-user epoch-ms lag; the patch oracle rebuilds the synthetic
metadata and every ceil-division; the promo oracle recomputes exact
cent sums per the q1 money convention."""

from __future__ import annotations

import math
import os

import duckdb

SF = os.environ.get("BANK_SF_DIR", "/root/testdata/sf0.001")


def _duck(*tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )
    return con


def _norm(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                v.hex() if isinstance(v, float) and not math.isnan(v) else v
                for v in r
            )
        )
    return sorted(out, key=repr)


def _load(spark, table):
    from hummingbirddatapipeline_spark.tables import load

    return load(spark, SF, table)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _run_pair(spark, name, *tables):
    """Differential through catalog.resolve_pair — the exact
    registration code; promoting the tier to @query changes nothing."""
    from hummingbirddatapipeline_spark.catalog import resolve_pair

    fn, sql = resolve_pair(name)
    got = [tuple(r) for r in fn(spark, SF).collect()]
    con = _duck(*tables)
    exp = con.sql(sql).fetchall()
    con.close()
    return got, exp


def test_gap_report_matches_duckdb(spark):
    got, exp = _run_pair(spark, "events_gap_report", "events")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    for _u, start, end, gap in got:
        assert gap == end - start >= 3_600_000


def test_gap_report_fixture(spark):
    """Engineered stream: user 1 has a 2h silence between 10:00 and
    12:00 (reported) and a 30-min one (not, at the 1h threshold);
    simultaneous events produce a 0 gap and never surface."""
    from hummingbirddatapipeline_spark.operators.temporal import (
        gap_report,
    )

    rows = spark.createDataFrame(
        [
            (1, "2024-01-01 09:30:00"),
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 12:00:00"),
            (1, "2024-01-01 12:00:00"),
            (2, "2024-01-01 00:00:00"),
        ],
        "user_id long, ts_s string",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    got = gap_report(rows, min_gap_sec=3600).collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["gap_ms"] == 7_200_000


def test_patch_plan_matches_duckdb(spark):
    got, exp = _run_pair(spark, "multimodal_patch_plan", "documents")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    for _id, w, h, npx, npy, n, pad_x, pad_y in got:
        assert npx == -(-w // 16) and npy == -(-h // 16)
        assert n == npx * npy
        assert 0 <= pad_x < 16 and 0 <= pad_y < 16
        assert npx * 16 == w + pad_x and npy * 16 == h + pad_y


def test_patch_plan_fixture(spark):
    """Exact grid arithmetic: 224x224 at 16 -> 14x14 = 196 patches,
    zero padding; 17x16 -> 2x1 with 15px right-pad."""
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.multimodal.core import patch_plan

    media = spark.createDataFrame(
        [(1, 224, 224, "image"), (2, 17, 16, "image"), (3, 50, 50, "audio")],
        "media_id long, w int, h int, kind string",
    ).select(
        "media_id",
        F.struct(
            F.col("kind").alias("kind"),
            F.col("w").alias("width"),
            F.col("h").alias("height"),
        ).alias("media_meta"),
    )
    rows = {r["media_id"]: r for r in patch_plan(media, 16).collect()}
    assert 3 not in rows  # non-image filtered
    assert rows[1]["n_patches"] == 196
    assert rows[1]["pad_x"] == 0 and rows[1]["pad_y"] == 0
    assert rows[2]["n_patch_x"] == 2 and rows[2]["n_patch_y"] == 1
    assert rows[2]["pad_x"] == 15 and rows[2]["pad_y"] == 0


def test_q14_promo_matches_duckdb(spark):
    got, exp = _run_pair(spark, "q14_promo_effect", "lineitem", "part")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    for month, promo, total, pct in got:
        assert 1 <= month <= 12
        assert 0 <= promo <= total
        assert pct == round(100.0 * promo / total, 6)


def test_r25_plan_contracts(spark):
    """gap_report: ONE key-hash exchange for the lag window, zero
    joins. patch_plan: a zero-exchange map pass. q14: the part side
    is a BroadcastHashJoin and the ship-date predicate reaches the
    parquet scan."""
    from hummingbirddatapipeline_spark.catalog.relational import (
        q14_promo_effect,
    )
    from hummingbirddatapipeline_spark.multimodal.core import (
        patch_plan,
        synth_media_from_documents,
    )
    from hummingbirddatapipeline_spark.operators.temporal import (
        gap_report,
    )

    plan = _physical(gap_report(_load(spark, "events")))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan

    plan = _physical(
        patch_plan(synth_media_from_documents(_load(spark, "documents")))
    )
    assert "Exchange" not in plan
    assert "Join" not in plan

    plan = _physical(q14_promo_effect(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or (
        "l_shipdate" in plan.split("PushedFilters")[1][:200]
        if "PushedFilters" in plan
        else False
    )
