"""Query catalog: named (PySpark query, DuckDB oracle SQL) pairs.

This is the engine's differential-test surface (SURVEY.md §5.1): every
SQL-expressible operator registers a PySpark implementation and an ANSI
SQL equivalent the driver runs in DuckDB over the same parquet tables.
Non-SQL-expressible operators register the query only (rows-only check).

Contract notes (driver: /root/repo/__spark_entry__.py):
- every computed column is aliased identically in both forms;
- float aggregates are rounded identically on both sides so the
  order-insensitive value hash is stable across engines;
- every ORDER BY ... LIMIT uses a total order (key tiebreak) so top-k
  is deterministic across engines.
"""

from __future__ import annotations

import functools
import weakref
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Bench-only registry: operator forms that exist to MEASURE the scale
# path's cost (e.g. the raw MinHash-LSH pipeline whose correctness is
# separately contract-oracled). These are deliberately NOT part of the
# driver's queries() surface — every queries() entry must carry an
# oracle — but bench.py runs them alongside the catalog.
BENCH_ONLY: dict[str, QueryFn] = {}

# Banked registry: EMPTY since round 12 — the entire 57-row bank was
# promoted to QUERIES in one flip (r11 VERDICT item 1) and banking is
# retired as a practice (r11 VERDICT item 3: any new operator lands as
# a registered @query row in the round it is built, window slot
# permitting or not). The machinery stays because the tier
# differential tests (tests/test_r1*..r3*_oracles.py) resolve rows
# through resolve_pair(), which reads QUERIES first and falls back to
# BANKED — they passed verbatim across the flip. Promotion, should a
# row ever be banked again, = change the row's decorator from
# @banked_query to @query (one word), then update DRIVER_WINDOW;
# bench.py needs NO edit (HEADLINE pre-lists names and its
# `in runnable` filter activates them at registration).
BANKED: dict[str, QueryFn] = {}
BANKED_ORACLES: dict[str, str] = {}

# Prepared-plan cache: DataFrames are immutable logical plans, so a
# catalog query re-invoked on the same (session, sf_dir) can reuse the
# plan it already built. Plan construction is real driver cost — the
# big scoring specs spend ~0.5 s parsing ~300 selectExpr expressions
# JVM-side, plus parquet schema-read round trips — and it repeats on
# every warm invocation without this. Keyed weakly by session so a
# stopped session's plans are collectable.
_PLAN_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def _cached(name: str, fn: QueryFn) -> QueryFn:
    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        per = _PLAN_CACHE.setdefault(spark, {})
        key = (name, sf_dir)
        df = per.get(key)
        if df is None:
            df = per[key] = fn(spark, sf_dir)
        return df

    return wrapped


# Modules with their own per-(session, sf_dir) caches (e.g. the shared
# checkpointed near-dup pair set in dedup_q) register a clear callback
# so invalidate() reaches them too.
_INVALIDATE_HOOKS: list[Callable[[str | None], None]] = []


def register_invalidate_hook(fn: Callable[[str | None], None]) -> None:
    _INVALIDATE_HOOKS.append(fn)


def invalidate(sf_dir: str | None = None) -> None:
    """Drop cached prepared plans — all of them, or one sf_dir's.

    The plan cache pins the parquet file listing captured at first
    build (and, for the iterative CC queries, localCheckpoint blocks).
    Call this if data under an sf_dir is regenerated mid-session so
    queries rebuild against the fresh listing instead of silently
    serving the stale one.
    """
    for per in _PLAN_CACHE.values():
        keys = list(per) if sf_dir is None else [k for k in per if k[1] == sf_dir]
        for k in keys:
            del per[k]
    for hook in _INVALIDATE_HOOKS:
        hook(sf_dir)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        wrapped = _cached(name, fn)
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def bench_query(name: str) -> Callable[[QueryFn], QueryFn]:
    """Register a bench-only operator form (no driver oracle row)."""

    def deco(fn: QueryFn) -> QueryFn:
        wrapped = _cached(name, fn)
        BENCH_ONLY[name] = wrapped
        return wrapped

    return deco


def banked_query(name: str, oracle: str) -> Callable[[QueryFn], QueryFn]:
    """Register a BANKED row (pre-staged registration, driver-invisible).

    Banked rows always carry an oracle: the whole point of banking is
    that the differential already gates the exact registration code."""

    def deco(fn: QueryFn) -> QueryFn:
        wrapped = _cached(name, fn)
        BANKED[name] = wrapped
        BANKED_ORACLES[name] = oracle
        return wrapped

    return deco


def resolve_pair(name: str) -> tuple[QueryFn, str]:
    """(query_fn, oracle_sql) for a registered OR banked row.

    The tier differential tests call this so they keep passing verbatim
    when a tier is promoted from BANKED to QUERIES."""
    if name in QUERIES:
        return QUERIES[name], ORACLES[name]
    return BANKED[name], BANKED_ORACLES[name]


def _load_modules() -> None:
    # Import for registration side effects. Keep alphabetical-ish; each
    # module covers one SURVEY.md §2 operator family.
    from hummingbirddatapipeline_spark.catalog import (  # noqa: F401
        association_q,
        curation_q,
        dedup_q,
        entity_q,
        events_q,
        extraction_q,
        feature_q,
        geo_q,
        multimodal_q,
        relational,
        sampling_q,
        scoring_q,
        serving_q,
        similarity_q,
        stream_q,
        temporal_q,
        text_q,
    )


# The driver's correctness gate samples the FIRST 50 registered
# queries per round (dict insertion order). With 211 catalog entries,
# which rows get hard driver signal is a choice — so make it explicit.
# (Per-round window history lives in PLANS.md § "Driver-window
# ledger"; this comment keeps only the CURRENT policy.)
#
# Round-16 window (PLANS.md "Window math, r15-r17"):
# (a) the changed-this-round re-samples (r16 optimization round): the
#     six oracled rows whose operator internals changed — the LM
#     tokenizer checkpoints (text_bigram_logprob,
#     text_perplexity_buckets, text_unigram_logprob), the incremental
#     dedup best-match/verify rewrite (dedup_incremental_batch,
#     stream_dedup_incremental) and the verify prefilter behind
#     dedup_minhash_near_dups. (text_bpe_segment, scoring_990_model
#     and scoring_customer_health also changed; they already sit in
#     the (b) r11-stale class below.)
# (b) ALL 23 remaining r11-stale rows, alphabetical (the write-ahead's
#     done-condition: zero r11-stale rows after r16);
# (c) the 21 alphabetically-first r12-stale rows (back-fill; the six
#     displaced by (a) shift to r17 per the ledger rule — displacement
#     takes the NEWEST back-fill names).
#
# Rotation policy (relaxed per the r11 VERDICT): a never-sampled row
# must enter the window within ONE round of registration — it may sit
# outside the current window only if it is listed in
# DEFERRED_FIRST_SAMPLE (enforced by
# tests/test_catalog_smoke.test_driver_window_rotation_policy against
# the CORRECTNESS_r*.json history). Everything else outside the window
# must be last-sample-green.
DRIVER_WINDOW: list[str] = [
    # (a) changed-this-round re-samples (r16 optimization work)
    "text_bigram_logprob",
    "text_perplexity_buckets",
    "text_unigram_logprob",
    "dedup_incremental_batch",
    "stream_dedup_incremental",
    "dedup_minhash_near_dups",
    # (b) the 23 remaining r11-stale rows, alphabetical
    "sample_split_leakfree",
    "sample_split_ngram_overlap",
    "sample_unimax_budget",
    "scoring_990_model",
    "scoring_customer_health",
    "search_hybrid_rrf",
    "semi_join_active_customers",
    "similarity_cosine_topk",
    "similarity_hamming_topk",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "similarity_pq_topk",
    "stream_dedup_union",
    "stream_enrich_nation_counts",
    "stream_hourly_tumbling",
    "stream_interval_join_pairs",
    "stream_sessionization",
    "text_bm25_topk",
    "text_bpe_segment",
    "text_cdc_chunks",
    "text_dedup_representatives",
    "text_winnow_containment",
    "unpivot_returnflag_metrics",
    # (c) r12-stale back-fill, alphabetical (first 21; the last 6 of
    # the write-ahead's 27 shift to r17)
    "curation_bloom_screen",
    "curation_gate_kappa",
    "curation_logreg_train",
    "curation_quality_borda",
    "dedup_cluster_histogram",
    "dedup_cross_source_matrix",
    "dedup_label_propagation",
    "dedup_lsh_candidate_profile",
    "dedup_lsh_recall",
    "dedup_minhash_estimate",
    "dedup_source_overlap",
    "dq_embedding_coverage",
    "eval_auc_by_source",
    "eval_calibration_bins",
    "events_gap_report",
    "events_mad_anomaly",
    "events_sequence_examples",
    "feature_hash_ngrams",
    "layout_rendezvous_shards",
    "merge_snapshot_delta",
    "multimodal_patch_plan",
]

# EMPTY this round: r16 registers no new rows (optimization round —
# the catalog surface is frozen; every row carries at least one green
# driver sample). Any row registered after the window freeze goes
# here and MUST lead the r17 window.
DEFERRED_FIRST_SAMPLE: list[str] = []


def _apply_driver_order() -> None:
    """Reorder QUERIES so DRIVER_WINDOW names register first; the rest
    keep their module-import order (all were driver-green in r5)."""
    ordered = {n: QUERIES[n] for n in DRIVER_WINDOW if n in QUERIES}
    for n, fn in QUERIES.items():
        ordered.setdefault(n, fn)
    QUERIES.clear()
    QUERIES.update(ordered)


_load_modules()
_apply_driver_order()
