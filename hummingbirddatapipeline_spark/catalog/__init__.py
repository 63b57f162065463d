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
# Round-9 window:
# (a) the 6 newly registered rows — the r8 "banked" set promoted from
#     bench-only forms to full oracles (SemDeDup semantic dedup,
#     incremental CC maintenance, URL canonicalize, host gate,
#     best-fit packing, DSIR selection) — never sampled, so they must
#     sit inside the first 50 slots;
# (b) two r8-green rows whose code or oracle changed this round and
#     must re-sample: stream_dedup_incremental (eager roster collect +
#     temp-dir cleanup) and similarity_ivf_incremental_add (oracle SQL
#     now built from the shared _cent_cte_body helper);
# (c) the full r6-stale back-fill: all 30 rows whose last driver
#     sample is r6 (sampling/text-scoring/dq/range-join family);
# (d) 12 of the oldest r7 rows (ER family + the dedup family adjacent
#     to the new incremental-CC row + the entry flagship).
# Everything outside the window is last-sample-green (r7/r8), which
# tests/test_catalog_smoke.test_driver_window_rotation_policy
# enforces against the CORRECTNESS_r*.json history.
DRIVER_WINDOW: list[str] = [
    # (a) newly registered round-9 operators — first driver rows
    "similarity_semantic_dedup",
    "dedup_incremental_cc",
    "web_canonicalize_url",
    "web_host_gate",
    "text_pack_best_fit",
    "sample_dsir_select",
    # (b) changed-this-round re-samples
    "stream_dedup_incremental",
    "similarity_ivf_incremental_add",
    # (c) staleness back-fill: all 30 rows last sampled r6
    "asof_join_purchase_click",
    "band_join_balance_siblings",
    "curation_quality_percentile",
    "curation_source_gate",
    "dq_orders_expectations",
    "dq_skew_report",
    "events_anomaly_zscore",
    "events_hypertable_rollup",
    "grouping_sets_counters",
    "latest_filing_plus_history",
    "layout_zorder_codes",
    "range_join_clicks_before_purchase",
    "range_join_pairs",
    "sample_hash_fraction",
    "sample_per_source_cap",
    "sample_stratified_by_lang",
    "sample_temperature_mix",
    "sample_token_budget_mix",
    "sample_train_holdout_counts",
    "scd2_user_event_history",
    "search_hybrid_rrf",
    "serving_map_extract",
    "text_bigram_logprob",
    "text_bm25_topk",
    "text_c4_filters",
    "text_contamination_check",
    "text_redact_pii",
    "text_repetition_battery",
    "text_substring_dup_stride1",
    "text_unigram_logprob",
    # (d) oldest r7 rows: ER family, dedup family, entry flagship
    "er_multipass_name_match",
    "er_fuzzy_join_levenshtein",
    "er_fuzzy_join_lsh",
    "text_exact_dedup",
    "dedup_connected_components",
    "dedup_minhash_near_dups",
    "dedup_tfidf_cosine_pairs",
    "dedup_incremental_batch",
    "dedup_triangle_counts",
    "union_dedup_segments",
    "window_yoy_nation_revenue_growth",
    "hhi_supplier_concentration",
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
