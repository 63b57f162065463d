"""The acreage pipeline's data-engineering stages as Spark jobs
(SURVEY.md §3.3) — everything except the live web fetch, which is the
quarantined sources.external pattern.

1. build_priorities  (append_priorities.py:105-263): master scan ->
   substring/validity/threshold filters -> keyword classification +
   priority bucketing -> composite-key dedup-append into the work queue.
2. merge_acreage     (master_acreage_merge.py:145-262): multi-pass
   name match (normalized, alias, prefix+state tie-break) -> F17
   conditional upsert -> audit changelog + unmatched report. Contract:
   idempotent re-runs, inputs never mutated, no data dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.functions.extraction import keyword_classify
from hummingbirddatapipeline_spark.operators.entity_resolution import (
    multipass_name_match,
)
from hummingbirddatapipeline_spark.operators.merge import (
    conditional_upsert,
    dedup_append,
    upsert_changelog,
)

# keyword cascade -> detected type (append_priorities.py:27-70 shape)
TYPE_CASCADE = (
    ("college", ("college", "university", "seminary", "institute")),
    ("school", ("school", "academy")),
    ("camp", ("camp", "retreat", "conference center")),
)

# priority bucketing (append_priorities.py:73-102 shape)
_PRIORITY = (
    "CASE WHEN detected_type = 'college' AND distress_score >= 60 THEN 'CRITICAL' "
    "WHEN detected_type = 'college' THEN 'HIGH' "
    "WHEN distress_score >= 60 THEN 'HIGH' "
    "WHEN detected_type IN ('school', 'camp') THEN 'MEDIUM' ELSE 'LOW' END"
)


def build_priorities(
    master: DataFrame,
    existing_queue: DataFrame | None,
    min_distress: float | None = None,
) -> DataFrame:
    """P7/P5/P8 filters -> F11 classify -> F3 bucket -> J7+U1 append."""
    rows = master.filter(F.col("data_source").contains("990"))
    rows = rows.filter(
        F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
    )
    if min_distress is not None:
        rows = rows.filter(F.col("distress_score") >= min_distress)
    work = rows.select(
        "institution_name",
        "city",
        "state",
        "distress_score",
        keyword_classify(
            F.lower(F.col("institution_name")), TYPE_CASCADE, "other"
        ).alias("detected_type"),
    ).withColumn("verification_priority", F.expr(_PRIORITY))
    if existing_queue is None:
        return work
    return dedup_append(
        existing_queue, work, ["institution_name", "city", "state"]
    )


def merge_acreage(
    master: DataFrame,
    acreage: DataFrame,
    alias_cols: tuple[str, ...] = (),
    prefix_len: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Multi-pass match then conditional upsert of acreage into master.

    Returns (new_master, changelog, unmatched_with_data) — the same
    three artifacts the reference writes (updated master, audit log,
    manual-review report). Inputs are never mutated; re-running with
    the same acreage yields an empty changelog (idempotency contract,
    master_acreage_merge.py:5-12).
    """
    matched = multipass_name_match(
        acreage,
        master,
        source_name="name",
        target_name="institution_name",
        source_key="acreage_id",
        target_key="master_id",
        alias_cols=alias_cols,
        prefix_len=prefix_len,
        source_secondary="state",
        target_secondary="state",
    )
    updates = matched.filter(F.col("matched_master_id").isNotNull()).select(
        F.col("matched_master_id").alias("master_id"),
        F.col("acres").alias("acreage"),
        F.col("confidence").alias("acreage_confidence"),
    )
    new_master = conditional_upsert(
        master, updates, "master_id", "acreage", "acreage_confidence"
    )
    changelog = upsert_changelog(
        master, updates, "master_id", "acreage", "acreage_confidence"
    )
    unmatched = matched.filter(
        F.col("matched_master_id").isNull() & F.col("acres").isNotNull()
    )
    return new_master, changelog, unmatched


def agreement_confidence(
    candidates: DataFrame,
    key_col: str,
    value_col: str,
    tolerance: float = 0.02,
) -> DataFrame:
    """A7 — multi-source agreement: per item, confidence is HIGH when
    >= 2 candidate values agree within ``tolerance`` of the best
    candidate, else MEDIUM with 1 value (chat_acreage_bot.py:730-736).

    Returns (key, value, n_sources, n_agreeing, confidence) with value
    = the first/best candidate per key (lowest source order).
    """
    w_first = F.min(F.struct(F.col("__ord"), F.col(value_col)))
    ordered = candidates.withColumn(
        "__ord", F.monotonically_increasing_id()
    )
    per_key = ordered.groupBy(key_col).agg(
        F.count(value_col).alias("n_sources"),
        w_first.alias("__first"),
        F.collect_list(value_col).alias("__vals"),
    )
    first_val = F.col("__first")[value_col]
    agreeing = F.size(
        F.filter(
            "__vals",
            lambda v: F.abs(v - first_val) / F.abs(first_val) < tolerance,
        )
    )
    return per_key.select(
        key_col,
        first_val.alias(value_col),
        "n_sources",
        agreeing.alias("n_agreeing"),
        F.when(agreeing >= 2, "HIGH")
        .when(F.col("n_sources") >= 1, "MEDIUM")
        .otherwise("LOW")
        .alias("confidence"),
    )


def geocode_fill(
    master: DataFrame,
    geocode_fetch,
    n_workers: int = 4,
    min_interval_s: float = 0.0,
) -> DataFrame:
    """Absent-script capability (reference README.md:23-25
    geocode_all_missing): fill missing lat/lng by geocoding
    'name, city, state' through the quarantined external-fetch
    pattern, then coalesce results into a NEW master.

    ``geocode_fetch(key) -> 'lat,lng'`` is injectable (tests pass a
    deterministic fake; production a real geocoder). Only rows missing
    coordinates are fetched, and failures leave the row untouched.
    """
    from hummingbirddatapipeline_spark.sources.external import fetch_enrichment

    missing = master.filter(
        F.col("latitude").isNull() | F.col("longitude").isNull()
    ).withColumn(
        "__geo_key",
        F.concat_ws(
            ", ", F.col("institution_name"), F.col("city"), F.col("state")
        ),
    )
    fetched = fetch_enrichment(
        missing,
        "__geo_key",
        geocode_fetch,
        n_workers=n_workers,
        min_interval_s=min_interval_s,
    ).filter(F.col("status") == "ok")
    split = fetched.select(
        F.col("key").alias("__geo_key"),
        F.split("payload", ",").getItem(0).cast("double").alias("__lat"),
        F.split("payload", ",").getItem(1).cast("double").alias("__lng"),
    )
    keyed = master.withColumn(
        "__geo_key",
        F.concat_ws(
            ", ", F.col("institution_name"), F.col("city"), F.col("state")
        ),
    )
    out = keyed.join(F.broadcast(split), "__geo_key", "left")
    return (
        out.withColumn("latitude", F.coalesce("latitude", "__lat"))
        .withColumn("longitude", F.coalesce("longitude", "__lng"))
        .drop("__geo_key", "__lat", "__lng")
    )
