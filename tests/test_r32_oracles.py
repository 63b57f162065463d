"""Differential (DuckDB) checks for the three rows registered in
round 13 — the dense-regime auto-switch clusters row, the
histogram-quantile error report (quantile member of the
observe-don't-trust sketch family), and the salted hot-key join —
run on the real testdata exactly the way the catalog oracle gate
would. All three registered the round they were built (no banking),
so these tests drive the registration code itself.
"""

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


def _run_pair(spark, name, *tables):
    from hummingbirddatapipeline_spark.catalog import resolve_pair

    fn, sql = resolve_pair(name)
    got = [tuple(r) for r in fn(spark, SF).collect()]
    con = _duck(*tables)
    exp = con.sql(sql).fetchall()
    con.close()
    return got, exp


def test_hybrid_dense_clusters_matches_exact_closure(spark):
    """The two-engine pair set must close into exactly the clusters
    DuckDB's exact brute-force recursive closure produces — the same
    oracle that gates the single-engine banded rows, so any
    dense/sparse routing defect (dup pairs, lost pairs, sim drift)
    breaks the hash here first."""
    got, exp = _run_pair(spark, "similarity_hybrid_dense_clusters", "embeddings")
    assert len(got) == len(exp)
    assert _norm(got) == _norm(exp)


def test_quantile_error_differential_and_bounds(spark):
    """Histogram-quantile report equals the DuckDB formulation row for
    row, and the report's own claims hold on real data: estimates are
    monotone in q and every rank error is under 1% at 4096 bins over
    the lineitem price range."""
    got, exp = _run_pair(spark, "sketch_quantile_error", "lineitem")
    assert len(got) == 3 == len(exp)
    assert _norm(got) == _norm(exp)
    by_q = {r[0]: r for r in got}  # (q_e6, est_value, n_below, err)
    ests = [by_q[q][1] for q in sorted(by_q)]
    assert ests == sorted(ests)
    assert all(r[3] <= 10000 for r in got), got  # <= 1% rank error


def test_salted_join_differential_and_multiplicity(spark):
    """The salted join's aggregate equals the PLAIN-join oracle, and
    the multiplicity invariant the salt must preserve holds row by
    row: every event_type's joined row count equals its dim count —
    salt-induced duplication or loss would break this before the
    value sum."""
    got, exp = _run_pair(spark, "join_salted_hot_keys", "events")
    assert len(got) == len(exp)
    assert _norm(got) == _norm(exp)
    for event_type, n_type, n_rows, _sum in got:
        assert n_rows == n_type, (event_type, n_type, n_rows)


def test_fellegi_sunter_differential_and_weight_ordering(spark):
    """FS scoring equals the DuckDB formulation row for row, and the
    method's point holds on real data: agreeing on the rare field
    (the padded-id digits, small u) contributes more weight than
    agreeing on the common one (5-value market segment) — visible as
    a strictly higher score for phx-only-agreement pairs than
    seg-only-agreement pairs with the other flags equal."""
    got, exp = _run_pair(spark, "er_fellegi_sunter_scores", "customer")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    # (agree_seg, agree_phx, agree_band) -> score is constant per
    # pattern; compare the two single-agreement patterns
    by_pat = {}
    for _, _, a_seg, a_phx, a_band, score in got:
        by_pat.setdefault((a_seg, a_phx, a_band), score)
    seg_only = by_pat.get((True, False, False))
    phx_only = by_pat.get((False, True, False))
    if seg_only is not None and phx_only is not None:
        assert phx_only > seg_only
