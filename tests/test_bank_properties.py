"""Randomized property battery for the banked tiers (r12-r19 ops).

The bank test files pin each operator constructively (one engineered
fixture per claim) and differentially (DuckDB oracle). This file adds
the RANDOMIZED generalization of the load-bearing contracts — seeded
numpy batches through Spark once per property, per the repo's
engine-level-invariant convention (tests/test_properties.py header):

- rendezvous_shards: minimal movement under ARBITRARY resizes, not
  just the pinned 8 -> 9.
- cdc_chunks: point-edit locality — the pinned case is a shared
  SUFFIX; here a mid-document edit must leave both the prefix and the
  suffix chunk streams intact (the resync property that makes CDC
  find partially-overlapping docs).
- unimax_allocation: conservation + waterline equality on random
  skewed corpora (the pinned cases are the two budget extremes).
- auc_by_group: invariance under a strictly monotone score transform
  — the defining property of a rank statistic; pinned cases cover
  flip symmetry and perfect separation only.
- epoch_plan: the docstring's "ANY prefix respects the mixture" claim
  checked directly on prefixes, not via the DuckDB replay.
"""

from __future__ import annotations

import numpy as np
import pytest

from hummingbirddatapipeline_spark.operators.scale import rendezvous_shards
from hummingbirddatapipeline_spark.operators.sampling import (
    epoch_plan,
    unimax_allocation,
)
from hummingbirddatapipeline_spark.operators.evaluation import auc_by_group
from hummingbirddatapipeline_spark.functions.text import cdc_chunks

import pyspark.sql.functions as F


RNG = np.random.default_rng(0xBA2C)

WORDS = [f"w{i:03d}" for i in range(97)]


def _rand_text(rng, n):
    return " ".join(rng.choice(WORDS, size=n))


# ---------------------------------------------------------------- HRW


@pytest.mark.parametrize("n_old,n_new", [(5, 8), (16, 17), (3, 12)])
def test_rendezvous_minimal_movement_any_resize(spark, n_old, n_new):
    keys = [f"k{int(v):07d}" for v in RNG.integers(0, 10**7, size=3000)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    out = rendezvous_shards(df, "key", n_old, n_shards_new=n_new).collect()
    assert len(out) == len(keys)
    moved = [r for r in out if r["moved"]]
    # HRW contract, generalized: a key moves IFF its argmax over the
    # grown fleet is one of the ADDED shards (ids n_old..n_new-1) —
    # existing shards' scores are unchanged, so the old winner still
    # wins among them.
    for r in moved:
        assert r["shard_new"] >= n_old, r
    for r in out:
        if not r["moved"]:
            assert r["shard"] == r["shard_new"]
        assert 0 <= r["shard"] < n_old
        assert 0 <= r["shard_new"] < n_new
    # expected movement = (n_new - n_old) / n_new; 5-sigma binomial band
    n = len(set(keys))
    dedup_moved = len({r["key"] for r in moved})
    p = (n_new - n_old) / n_new
    sigma = (n * p * (1 - p)) ** 0.5
    assert abs(dedup_moved - n * p) < 5 * sigma + 1


# ---------------------------------------------------------------- CDC


def test_cdc_point_edit_relocalizes_only_the_neighborhood(spark):
    window, divisor = 8, 8
    toks = [str(w) for w in RNG.choice(WORDS, size=400)]
    edited = list(toks)
    edited[200] = "EDITED_TOKEN"
    df = spark.createDataFrame(
        [(" ".join(toks), " ".join(edited))], "a string, b string"
    )
    row = df.select(
        cdc_chunks(F.col("a"), window, divisor).alias("ca"),
        cdc_chunks(F.col("b"), window, divisor).alias("cb"),
    ).collect()[0]
    ha = [c["chunk_hash"] for c in row["ca"]]
    hb = [c["chunk_hash"] for c in row["cb"]]
    # common prefix / suffix of the two chunk-hash streams
    pre = 0
    while pre < min(len(ha), len(hb)) and ha[pre] == hb[pre]:
        pre += 1
    suf = 0
    while (
        suf < min(len(ha), len(hb)) - pre and ha[-1 - suf] == hb[-1 - suf]
    ):
        suf += 1
    # the edit perturbs window sums at <= `window` positions, so the
    # divergent middle is a handful of chunks, never the whole stream
    assert pre >= 1 and suf >= 1
    assert len(ha) - pre - suf <= 6
    assert len(hb) - pre - suf <= 6
    # and chunking is deterministic: same text -> same chunks
    assert ha == [c["chunk_hash"] for c in row["ca"]]


# ------------------------------------------------------------- UniMax


@pytest.mark.parametrize("budget", [500, 20_000, 10**9])
def test_unimax_conservation_and_waterline(spark, budget):
    rows = []
    doc = 0
    for li, size in enumerate([3, 9, 30, 120, 400]):  # skewed corpus
        for _ in range(size):
            rows.append(
                (doc, f"lang{li}", _rand_text(RNG, int(RNG.integers(5, 40))))
            )
            doc += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = unimax_allocation(df, budget, n_epochs=2.0).collect()
    alloc = {r["lang"]: r for r in out}
    assert len(alloc) == 5
    for r in out:
        assert 0 <= r["alloc_tokens"] <= r["cap_tokens"]
        assert r["cap_tokens"] == 2 * r["n_tokens"]  # floor(2.0 * n)
        assert bool(r["is_capped"]) == (r["alloc_tokens"] == r["cap_tokens"])
    spent = sum(r["alloc_tokens"] for r in out)
    total_cap = sum(r["cap_tokens"] for r in out)
    assert spent <= budget
    assert spent <= total_cap
    uncapped = [r["alloc_tokens"] for r in out if not r["is_capped"]]
    if budget >= total_cap:
        # budget dominates: every language rides its repeat cap
        assert not uncapped and spent == total_cap
    else:
        # waterfilling: uncapped languages share one exact waterline,
        # and the unallocated residue is < n_uncapped (floor division)
        assert len(set(uncapped)) == 1
        assert budget - spent < max(len(uncapped), 1)


# ---------------------------------------------------------------- AUC


def test_auc_invariant_under_monotone_transform(spark):
    n = 600
    rows = [
        (
            f"s{int(g)}",
            int(RNG.integers(0, 7)),  # small grid -> plenty of ties
            int(RNG.integers(0, 2)),
        )
        for g in RNG.integers(0, 3, size=n)
    ]
    df = spark.createDataFrame(rows, "source string, score int, label int")
    base = {
        r["group"]: r["auc"]
        for r in auc_by_group(df, "score", "label", "source").collect()
    }
    mono = df.withColumn("score", F.col("score") * 10 + 1)
    transformed = {
        r["group"]: r["auc"]
        for r in auc_by_group(mono, "score", "label", "source").collect()
    }
    assert base == transformed  # rank statistic: exact, not approx
    # all-tied scores -> AUC exactly 0.5 (full tie credit)
    flat = df.withColumn("score", F.lit(1))
    for r in auc_by_group(flat, "score", "label", "source").collect():
        assert r["auc"] == pytest.approx(0.5)


# ----------------------------------------------------------- epoch_plan


def test_epoch_plan_budget_prefixes_respect_the_allocation(spark):
    """The docstring claim, checked directly: stopping the plan at X%
    of the BUDGET consumes ~X% of every language's UniMax allocation.
    The claim is scoped to the budget region — stride spacing is
    allocation-weighted, so languages whose docs outlast the budget
    (the consumer's truncation point) dangle in the tail by design —
    every doc carries the same token count here so doc-counts ARE
    token-counts up to a constant."""
    budget, tok_per_doc = 3000, 12
    rows = []
    doc = 0
    for li, size in enumerate([40, 100, 260]):
        for _ in range(size):
            rows.append((doc, f"lang{li}", _rand_text(RNG, tok_per_doc)))
            doc += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    alloc = {
        r["lang"]: r["alloc_tokens"]
        for r in unimax_allocation(df, budget, n_epochs=1.0).collect()
    }
    w_total = sum(alloc.values())
    plan = (
        epoch_plan(df, token_budget=budget, n_epochs=1.0)
        .orderBy("global_seq")
        .collect()
    )
    assert [r["global_seq"] for r in plan] == list(range(1, len(plan) + 1))
    n_budget = w_total // tok_per_doc  # docs inside the budget region
    assert n_budget <= len(plan)
    for frac in (0.2, 0.5, 1.0):
        cut = int(n_budget * frac)
        seen = {k: 0 for k in alloc}
        for r in plan[:cut]:
            seen[r["lang"]] += 1
        for lang, w in alloc.items():
            expect = cut * w / w_total
            # stride scheduling: each language's prefix count tracks
            # its allocation share to within a few slots, at every cut
            assert abs(seen[lang] - expect) <= 3, (lang, cut, seen[lang])
