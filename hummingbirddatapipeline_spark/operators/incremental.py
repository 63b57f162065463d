"""Incremental aggregate maintenance: fold a new partition of data
into an existing rollup without recomputing history.

The 100 TB batch-ETL contract: daily data lands, the running rollup is
petabyte-derived, and recomputing it from raw is off the table. The
operator works on MERGEABLE partial states (counts and integer-unit
sums — the same algebra Spark's own partial aggregation uses), so

    merge(rollup(A), rollup(B)) == rollup(A ∪ B)

holds EXACTLY, not approximately; derived ratios (averages) are
recomputed from the merged states, never merged themselves (averaging
averages is the classic incremental-ETL bug).

This is the batch sibling of the streaming foreachBatch upsert
(streaming/core.py) and the mergeable-sketch heavy hitters
(catalog/events_q.py): same state-merge discipline, three execution
contexts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_rollups(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    count_cols: Sequence[str] = ("n_events",),
    sum_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge two rollups sharing (keys + count/sum state columns):
    union then re-sum per key. Counts and integer-unit sums are
    associative, so the result equals a from-scratch rollup of the
    combined input."""
    cols = list(keys) + list(count_cols) + list(sum_cols)
    merged = (
        a.select(cols)
        .unionByName(b.select(cols))
        .groupBy(list(keys))
        .agg(
            *[F.sum(c).alias(c) for c in count_cols],
            *[F.sum(c).alias(c) for c in sum_cols],
        )
    )
    return merged


def decayed_activity(
    df,
    key_col: str,
    ts_col: str,
    half_life: float,
    ref_ts: int | None = None,
    value_col: str | None = None,
):
    """Exponentially time-decayed activity score per entity — the
    recency-weighted engagement feature (each event contributes
    ``0.5 ** ((ref_ts - ts) / half_life)``, optionally scaled by
    ``value_col``), plus event count and last-seen timestamp.

    ``ref_ts`` anchors the decay; pass it explicitly for reproducible
    pipelines. When omitted it derives from the DATA (global max ts
    via a scalar aggregate broadcast back) — never wall clock, so the
    same input always produces the same scores on any engine.

    Scale: one scalar aggregate (single-row crossJoin combine) and one
    hash aggregate on the entity key, map-side combined. The score is
    rounded 6dp against cross-engine summation-order drift; counts and
    timestamps stay exact.
    """
    from pyspark.sql import functions as F

    if ref_ts is not None:
        ref = F.lit(float(ref_ts))
        base = df
    else:
        mx = df.agg(F.max(ts_col).alias("__ref"))
        base = df.crossJoin(F.broadcast(mx))
        ref = F.col("__ref").cast("double")
    age = ref - F.col(ts_col).cast("double")
    w = F.pow(F.lit(0.5), age / F.lit(float(half_life)))
    if value_col is not None:
        w = w * F.col(value_col).cast("double")
    return base.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(ts_col).alias("last_ts"),
        F.round(F.sum(w), 6).alias("decayed_score"),
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot diff — the ingestion-maintenance primitive
    behind every recrawl: classify each document key as ``new``
    (appears only in the new snapshot), ``vanished`` (only in the
    old), ``changed`` (both, content fingerprint differs), or
    ``unchanged``. Downstream, only new+changed rows re-enter the
    dedup/quality pipeline and vanished keys tombstone — reprocessing
    cost tracks the DELTA, not the corpus.

    Content identity is the repo's normalized md5 fingerprint
    (functions/text.fingerprint — whitespace/case-normalized), so
    cosmetic rewraps do not count as changes. Deterministic: string
    equality on hashes.

    Returns (id, status). Scale shape: each side reduces to (id,
    fingerprint) at the scan, then ONE id-keyed full outer join of
    two skinny frames; text never rides the shuffle.
    """
    from hummingbirddatapipeline_spark.functions.text import fingerprint

    o = old.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("__fa")
    )
    n = new.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("__fb")
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__fa").isNull(), F.lit("new"))
        .when(F.col("__fb").isNull(), F.lit("vanished"))
        .when(F.col("__fa") == F.col("__fb"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"))
