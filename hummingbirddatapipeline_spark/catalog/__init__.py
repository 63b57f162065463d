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

# Banked registry: fully-written registration rows for the bank tiers
# (BANK.md) that are NOT yet driver-visible. Each entry is the EXACT
# code a future registration round promotes — same row function, same
# oracle SQL — kept out of QUERIES/ORACLES so the driver window and
# the correctness gate are untouched until the tier's round.
# Promotion = change the row's decorator from @banked_query to @query
# (one word), then update DRIVER_WINDOW and the bench HEADLINE block
# per the tier's PLANS.md recipe. tests/ drive these rows through
# resolve_pair(), which reads QUERIES first and falls back to BANKED —
# so the tier differential files keep passing across the flip with no
# edit.
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
# queries per round (dict insertion order). With 130+ catalog entries,
# which rows get hard driver signal is a choice — so make it explicit.
# (Per-round window history and the bank ledger live in PLANS.md §
# "Driver-window ledger"; this comment keeps only the CURRENT policy.)
#
# Round-11 window (the pre-computed math in PLANS.md "r11 window
# math", registrations doubled per the r10 VERDICT next-round item 1):
# (a) the 7 newly registered rows — the r11 AND r12 banked tiers
#     promoted together (winnowing cross-corpus containment, DoReMi
#     domain reweight, quality-score distillation, CDC chunking,
#     UniMax waterfilling, Hamming ANN, PQ/ADC ANN) — never sampled,
#     so they must sit inside the first 50 slots;
# (b) two rows whose plans changed this round after their last green
#     sample and must re-sample (the r10 VERDICT's deferred
#     repeated-scan fixes): text_bm25_topk (single-projection tf/dl —
#     3x -> 1x text scans) and search_hybrid_rrf (checkpointed top-50
#     lists; inherits the bm25 fix). sample_split_ngram_overlap (the
#     third deferred fix: one shared gram explode for both splitters)
#     is already in (c) below.
# (c) the full r8-stale back-fill: ALL 41 rows whose last driver
#     sample is r8 (the 39 from the r10 ledger plus scoring_990_model
#     and text_bpe_segment, displaced from the r10 window by its
#     close-out swap).
# NOTE (documented deviation, r11): the round-11 ADVICE hardenings
# touch three r10-green rows (curation_funnel / curation_funnel_gated:
# empty-input stage-count coalesce; similarity_ivf_topk is in (c)
# anyway) — output proven identical at sf0.001 AND sf0.01 by the local
# differential; with 7 registrations + 41 r8-stale + 2 scan-fix
# re-samples the window is exactly full, so the funnel rows re-sample
# at the FRONT of the r12 window instead (ledger: PLANS.md).
# Everything outside the window is last-sample-green (r9/r10), which
# tests/test_catalog_smoke.test_driver_window_rotation_policy
# enforces against the CORRECTNESS_r*.json history. After r11 nothing
# in the catalog has a last driver sample older than r9.
DRIVER_WINDOW: list[str] = [
    # (a) newly registered round-11 operators (r11 + r12 banked tiers)
    "text_winnow_containment",
    "sample_doremi_reweight",
    "curation_score_distill",
    "text_cdc_chunks",
    "sample_unimax_budget",
    "similarity_hamming_topk",
    "similarity_pq_topk",
    # (b) changed-this-round re-samples (deferred scan-audit fixes)
    "text_bm25_topk",
    "search_hybrid_rrf",
    # (c) staleness back-fill: all 41 rows last sampled r8
    "anti_join_idle_customers",
    "asof_latest_order_per_customer",
    "bucket_customer_balance",
    "classify_and_prioritize",
    "conditional_counters",
    "dedup_representatives_by_score",
    "distinct_customers_per_nation",
    "embedding_quantize_roundtrip",
    "events_rolling_window_feats",
    "events_touch_attribution",
    "extract_context_window",
    "extract_multi_pattern",
    "feature_profile_drift",
    "feature_quantile_transform",
    "feature_target_encode",
    "merge_cdc_apply",
    "merge_conditional_upsert",
    "merge_upsert_idempotent",
    "pivot_nation_revenue_by_year",
    "q1_pricing_summary",
    "q5_nation_revenue",
    "sample_contrastive_negatives",
    "sample_split_leakfree",
    "sample_split_ngram_overlap",
    "scoring_990_model",
    "scoring_customer_health",
    "semi_join_active_customers",
    "similarity_cosine_topk",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "similarity_near_dup_clusters",
    "similarity_near_dup_clusters_banded",
    "similarity_near_dup_embeddings",
    "stream_dedup_union",
    "stream_enrich_nation_counts",
    "stream_hourly_tumbling",
    "stream_interval_join_pairs",
    "stream_sessionization",
    "text_bpe_segment",
    "text_dedup_representatives",
    "unpivot_returnflag_metrics",
]


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
