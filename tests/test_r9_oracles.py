"""Differential (DuckDB) checks for the round-9-registered operators —
SemDeDup-shaped semantic dedup, incremental connected-components
maintenance, URL canonicalization + host gating, best-fit-decreasing
sequence packing, and DSIR importance resampling — run on the real
testdata exactly the way the catalog oracle gate does. Since r9 these
rows are registered catalog queries, so each test drives the CATALOG
entry against its REGISTERED oracle (one source of truth for both
sides) and then asserts the extra structural properties the driver's
value hash alone would not surface (twins really dropped, both gate
outcomes occur, budget respected, selection skews to the target)."""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_SEM_TWIN_OFFSET = 10_000


def _duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
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


def _run_pair(spark, name):
    """(spark rows, oracle rows) for a registered catalog query."""
    from hummingbirddatapipeline_spark.catalog import ORACLES, QUERIES

    got = [tuple(r) for r in QUERIES[name](spark, SF).collect()]
    con = _duck()
    exp = con.sql(ORACLES[name]).fetchall()
    con.close()
    return got, exp


def test_semantic_dedup_matches_duckdb(spark):
    """Scaled-copy twins (cosine exactly 1.0, same quantizer cell by
    scale invariance) give the fixture real semantic duplicates; the
    raw synthetic embeddings are near-orthogonal (max pairwise cosine
    0.479), so every non-twin pair stays far below the threshold."""
    rows, exp = _run_pair(spark, "similarity_semantic_dedup")
    # the fixture has real structure: every even id lost its twin
    n_dropped = sum(1 for r in rows if not r[3])
    assert n_dropped == sum(1 for r in rows if r[0] >= _SEM_TWIN_OFFSET)
    assert n_dropped > 0
    assert _norm(rows) == _norm(exp)


def test_incremental_cc_matches_full_recompute_and_duckdb(spark):
    """New edges (including corpus singletons and brand-new node ids)
    update the existing labeling; the result must equal BOTH a full
    Spark re-closure over old+new edges (restricted to the same node
    universe) and DuckDB's independent recursive closure (the
    registered oracle)."""
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
    )
    from hummingbirddatapipeline_spark.tables import load

    got, exp = _run_pair(spark, "dedup_incremental_cc")
    assert _norm(got) == _norm(exp)

    # full Spark re-closure over old+new edges must agree too
    old = shared_jaccard_pairs(spark, SF)
    docs = load(spark, SF, "documents")
    new_edges = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 3).alias("id_b"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 151 == 0).select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 90_000_000).alias("id_b"),
        )
    )
    full = connected_components(old.unionByName(new_edges))
    assert _norm(got) == _norm([tuple(r) for r in full.collect()])


def test_canonicalize_url_matches_duckdb(spark):
    rows, exp = _run_pair(spark, "web_canonicalize_url")
    # the fixture is genuinely dirty: canonicalization must change most
    assert sum(1 for r in rows if r[1] != r[3]) > len(rows) * 0.5
    assert _norm(rows) == _norm(exp)


def test_host_gate_matches_duckdb(spark):
    rows, exp = _run_pair(spark, "web_host_gate")
    assert len(rows) > 10
    # both gate outcomes occur on the fixture
    assert {r[4] for r in rows} == {True, False}
    assert _norm(rows) == _norm(exp)


def test_canonicalize_drops_valueless_tracking_params(spark):
    """r8 ADVICE regression pin: a BARE tracking param (no '=') must be
    dropped by the canonicalizer, same as the key=value form."""
    from hummingbirddatapipeline_spark.functions.web import canonicalize_url

    df = spark.createDataFrame(
        [
            ("https://a.example.com/x?fbclid&b=2",),
            ("https://a.example.com/x?utm_x&b=2",),
            ("https://a.example.com/x?b=2&gclid=1",),
        ],
        "url string",
    ).select(canonicalize_url(F.col("url")).alias("c"))
    assert [r["c"] for r in df.collect()] == [
        "https://a.example.com/x?b=2"
    ] * 3


def test_best_fit_pack_matches_duckdb_replay(spark):
    """DuckDB replays the SAME deterministic best-fit-decreasing rule
    with a recursive CTE over positional bin-load lists (the
    registered oracle) — an independent formulation of the sequential
    greedy state — and the assignment must match chunk for chunk."""
    from hummingbirddatapipeline_spark.catalog.text_q import _BFD_BUDGET

    rows, exp = _run_pair(spark, "text_pack_best_fit")
    assert len(rows) == len(exp) > 0
    assert _norm(rows) == _norm(exp)

    # no bin over budget (no chunk alone exceeds it on this fixture)
    loads = {}
    for src, _d, n, b in rows:
        loads[(src, b)] = loads.get((src, b), 0) + n
    assert max(loads.values()) <= _BFD_BUDGET


def test_best_fit_packing_quality_vs_start_offset(spark):
    """The quality claim, measured honestly: start-offset binning and
    BFD are not bin-count comparable because start-offset OVERFLOWS
    the budget (a bin absorbs the chunk that straddles its boundary —
    it can even undercut the capacity-respecting lower bound that
    way). The real contract pair is: (a) BFD respects the budget on
    every bin while its bin count stays within 11/9 * LB + 1, where
    LB = ceil(total/budget). NOTE (r8 ADVICE): LB only LOWER-bounds
    OPT, so this inequality is STRONGER than the published BFD
    guarantee (11/9 OPT + 1 relative to OPT, Johnson 1973) — it is
    asserted as an EMPIRICAL property of this frozen fixture (item
    sizes are small relative to the budget, so bins pack near-full
    and the LB-relative bound holds with slack), not as the theorem;
    a valid BFD on a different fixture could exceed it; (b)
    start-offset violates the budget on this same fixture in every
    group — the defect a capacity-strict packer exists to remove
    (its own contract is bounded overflow, which its docstring
    states)."""
    from hummingbirddatapipeline_spark.functions.text import (
        best_fit_pack,
        pack_token_bins,
        ws_token_count,
    )
    from hummingbirddatapipeline_spark.tables import load

    budget = 128
    docs = load(spark, SF, "documents").select(
        "source",
        "doc_id",
        ws_token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    bfd = (
        best_fit_pack(docs, "source", "doc_id", budget=budget)
        .groupBy("source")
        .agg(
            F.countDistinct("bin_id").alias("nb"),
            F.ceil(F.sum("n_tokens") / budget).alias("lb"),
        )
        .collect()
    )
    assert len(bfd) > 0
    for r in bfd:
        assert r["nb"] <= (11 * r["lb"]) // 9 + 1, (r["source"], r["nb"], r["lb"])

    sob_loads = (
        pack_token_bins(docs, "source", "doc_id", budget=budget)
        .groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").alias("load"))
        .groupBy("source")
        .agg(F.max("load").alias("max_load"))
        .collect()
    )
    assert all(r["max_load"] > budget for r in sob_loads)


def test_dsir_select_matches_duckdb(spark):
    """DSIR importance resampling: target = the English documents, raw
    = the whole pool; DuckDB refits both hashed-ngram models, rebuilds
    every log-ratio, per-doc weight, and Gumbel key from the same md5
    arithmetic (the registered oracle), and must select the identical
    k documents."""
    from hummingbirddatapipeline_spark.tables import load

    rows, exp = _run_pair(spark, "sample_dsir_select")
    assert len(rows) == 50
    # selection is genuinely weight-driven: the picked docs skew toward
    # the target language
    docs = load(spark, SF, "documents").select("doc_id", "lang")
    picked = {r[0] for r in rows}
    langs = {r["doc_id"]: r["lang"] for r in docs.collect()}
    en_frac_picked = sum(1 for d in picked if langs[d] == "en") / len(picked)
    en_frac_pool = sum(1 for v in langs.values() if v == "en") / len(langs)
    assert en_frac_picked > en_frac_pool
    assert _norm(rows) == _norm(exp)


def test_r9_guards(spark):
    """Loud-failure contracts for the r9 operators: empty DSIR
    target, semantic mega-cell cap, and incremental-CC no-op on an
    empty edge batch."""
    import pytest

    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
        incremental_connected_components,
    )
    from hummingbirddatapipeline_spark.operators.sampling import dsir_select
    from hummingbirddatapipeline_spark.operators.similarity import (
        semantic_dedup,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents").select("doc_id", "text")
    with pytest.raises(ValueError, match="target corpus has no grams"):
        dsir_select(docs, docs.filter(F.lit(False)), k=5)

    emb = load(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    with pytest.raises(ValueError, match="max_cell"):
        semantic_dedup(emb, IVF_CENTROIDS_64D, threshold=0.999, max_cell=3)

    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_pairs,
    )

    labels = connected_components(shared_jaccard_pairs(spark, SF))
    empty = labels.filter(F.lit(False)).select(
        F.col("node").alias("id_a"), F.col("cluster_id").alias("id_b")
    )
    got = incremental_connected_components(labels, empty).collect()
    exp = labels.collect()
    assert _norm([tuple(r) for r in got]) == _norm([tuple(r) for r in exp])
