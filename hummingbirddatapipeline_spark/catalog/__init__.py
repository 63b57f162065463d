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
# Round-10 window:
# (a) the 5 newly registered rows — the r9 "banked" set promoted to
#     full oracles (in-engine k-means quantizer training, PCA top
#     component, cluster-aware decontamination, deterministic shard
#     manifest, winnowing fingerprints) — never sampled, so they must
#     sit inside the first 50 slots;
# (b) two rows whose plan or oracle changed after their last green
#     sample and must re-sample: dedup_pagerank (flipped to
#     exact_longs=True — operator AND oracle — closing the r8 FP
#     tie-window) and q3_top_revenue_orders (r9's
#     pre-aggregate-below-join rewrite landed after its r8 sample);
# (c) the full r7-stale back-fill: all 36 rows whose last driver
#     sample is r7 (events/text/sketch/feature/multimodal families);
# (d) 5 of the oldest r8 rows — the heavyweight contracts the r9
#     VERDICT named (corpus_stats_report, curation_funnel_gated,
#     dedup_simhash_consistency, multimodal_phash_groups,
#     scoring_ipeds_model);
# (e) 2 r9 rows whose plans changed in the close-out scan-dedup pass
#     (dedup_minhash_near_dups, dedup_incremental_batch — skinny
#     checkpoints on multiply-referenced pair sets / the store index)
#     — the changed-this-round rule outranks staleness rotation, so
#     they displaced the two (d) slots that were repo additions
#     beyond the VERDICT's named five (scoring_990_model,
#     text_bpe_segment — both stay r8-green, re-sampled in r11).
# Everything outside the window is last-sample-green (r8/r9), which
# tests/test_catalog_smoke.test_driver_window_rotation_policy
# enforces against the CORRECTNESS_r*.json history. After r10 nothing
# in the catalog has a last driver sample older than r8.
DRIVER_WINDOW: list[str] = [
    # (a) newly registered round-10 operators — first driver rows
    "similarity_kmeans_refine",
    "similarity_pca_top1",
    "curation_decontaminate_clusters",
    "layout_shard_manifest",
    "text_winnow_fingerprints",
    # (b) changed-since-last-sample re-samples
    "dedup_pagerank",
    "q3_top_revenue_orders",
    # (c) staleness back-fill: all 36 rows last sampled r7
    "assoc_basket_cooccurrence",
    "curation_funnel",
    "events_cohort_retention",
    "events_decayed_activity",
    "events_first_per_user_type",
    "events_funnel_conversion",
    "events_hourly_tumbling",
    "events_incremental_rollup",
    "events_json_props",
    "events_lttb_downsample",
    "events_markov_transitions",
    "events_sessionization",
    "events_sliding_3h1h",
    "extract_best_candidate",
    "feature_impute_median_balance",
    "feature_psi_price_drift",
    "feature_winsorize_prices",
    "geo_radius_join_suppliers",
    "multimodal_byte_features",
    "multimodal_frame_plan",
    "safe_divide_discount_rate",
    "sample_weighted_aes",
    "search_topk_substring",
    "sketch_approx_distinct_users",
    "sketch_topk_heavy_hitters",
    "sketch_value_quantiles",
    "text_chunk_documents",
    "text_fingerprints",
    "text_jaccard_near_dups",
    "text_lang_id",
    "text_pack_chunks",
    "text_quality",
    "text_repetition_stats",
    "text_substring_dup",
    "text_token_stats",
    "topk_orders_by_price",
    # (d) oldest r8 heavyweights (the VERDICT-named five)
    "corpus_stats_report",
    "curation_funnel_gated",
    "dedup_simhash_consistency",
    "multimodal_phash_groups",
    "scoring_ipeds_model",
    # (e) changed-this-round re-samples (close-out scan-dedup pass)
    "dedup_minhash_near_dups",
    "dedup_incremental_batch",
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
