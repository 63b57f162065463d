"""The 990 distress engine as a Spark pipeline (SURVEY.md §3.1).

Reference: Distress990Engine
(/root/reference/hv_master_data/data/Hummingbird_Master_engine_990.py).
Where the reference iterates a nested dict row-at-a-time, this pipeline
is four declarative stages over the canonical ``filings_990`` long table
(FIXTURES.md §1):

  filings -> [W1 window prep] -> [scoring spec (pure expressions)]
          -> [W4 as-of year select] -> [J1 master writeback]

Scale notes: the window stage shuffles once on ``ein``; scoring is
expression-only (no shuffle, no UDF); the writeback joins scores
(small — one row per entity) onto master, broadcastable at any scale
where entities << master partitions, and never mutates its input
(versioned-output contract instead of in-place CSV overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hummingbirddatapipeline_spark.functions.scalar import normalize_key
from hummingbirddatapipeline_spark.operators.windows import (
    latest_per_entity,
    with_prior_fields,
)
from hummingbirddatapipeline_spark.scoring.compiler import apply_spec
from hummingbirddatapipeline_spark.scoring.specs_990 import SPEC_990, TREND_FIELDS

# master column -> score column (990.py:1325-1345)
MASTER_990_COLUMNS = {
    "distress_score_990": "distress_score",
    "distress_category_990": "risk_category",
    "solvency_score_990": "solvency_score",
    "liquidity_score_990": "liquidity_score",
    "operating_score_990": "operating_performance_score",
    "trend_score_990": "trend_score",
    "red_flag_score_990": "red_flags_score",
    "data_completeness_990": "data_completeness",
    "filing_type_990": "filing_type",
    "score_year_990": "filing_year",
    "equity_ratio_raw_990": "equity_ratio_raw",
    "unrestricted_cushion_raw_990": "unrestricted_cushion_raw",
    "days_cash_raw_990": "days_cash_raw",
    "operating_margin_raw_990": "operating_margin_raw",
    "debt_ratio_raw_990": "debt_ratio_raw",
    "revenue_trend_raw_990": "revenue_trend_raw",
    "net_asset_trend_raw_990": "net_asset_trend_raw",
    "revenue_concentration_raw_990": "revenue_concentration_raw",
    "program_revenue_ratio_raw_990": "program_revenue_ratio_raw",
}

# engine risk category -> master distress_category (990.py:1381-1391)
CATEGORY_TO_MASTER = {
    "Healthy": "Healthy",
    "Low Risk": "Low",
    "Moderate Risk": "Moderate",
    "High Risk": "High",
    "Severe Distress": "Critical",
    "Insufficient Data": "Healthy",  # conservative default
}


# richer filings win when an (ein, year) appears in several filing-type
# files (990.py:707-715 upgrades the registered type to 'standard')
FILING_TYPE_RANK = {"standard": 3, "ez": 2, "pf": 1}


def resolve_filing_precedence(filings: DataFrame) -> DataFrame:
    """Collapse duplicate (ein, filing_year) rows across filing-type
    unions, keeping the richest filing: standard > ez > pf > unknown
    (Hummingbird_Master_engine_990.py:707-715).

    Without this, an EIN present in both the standard and EZ files for
    the same year double-counts in the W1 lag windows and makes the
    as-of winner nondeterministic.

    Scale: the winner is picked inside a window partitioned by ``ein``
    alone (ordered by year, then rank) using a run-start lag test, so
    the SAME single ein-shuffle feeds this stage and the downstream
    ``with_prior_fields`` trend windows — no extra exchange on
    (ein, year).
    """
    rank = F.lit(0)
    for t, r in FILING_TYPE_RANK.items():
        rank = F.when(F.lower(F.col("filing_type")) == t, F.lit(r)).otherwise(rank)
    w = Window.partitionBy("ein").orderBy(
        F.col("filing_year"),
        F.desc("__ft_rank"),
        F.col("filing_type"),
    )
    prev_year = F.lag("filing_year").over(w)
    return (
        filings.withColumn("__ft_rank", rank)
        .withColumn(
            "__keep", prev_year.isNull() | (prev_year != F.col("filing_year"))
        )
        .filter(F.col("__keep"))
        .drop("__ft_rank", "__keep")
    )


def score_all_years(filings: DataFrame) -> DataFrame:
    """Score every (ein, filing_year) row — the engine's detail export
    (990.py:1250-1256 score_all_years)."""
    deduped = resolve_filing_precedence(filings)
    prep = with_prior_fields(deduped, "ein", "filing_year", TREND_FIELDS)
    return apply_spec(prep, SPEC_990)


def score_asof(filings: DataFrame, target_year: int = 2024) -> DataFrame:
    """One score row per EIN: target year if filed, else most recent
    (W4 as-of selection, 990.py:1302-1307)."""
    scored = score_all_years(filings)
    return latest_per_entity(scored, "ein", "filing_year", prefer_year=target_year)


def _category_to_master_col() -> F.Column:
    expr = F.lit("Healthy")
    for k, v in CATEGORY_TO_MASTER.items():
        expr = F.when(F.col("risk_category") == k, F.lit(v)).otherwise(expr)
    return expr


def integrate_with_master(
    master: DataFrame, filings: DataFrame, target_year: int = 2024
) -> DataFrame:
    """J1 — left join scores onto master and update columns for
    ``data_source == 'Hummingbird_990'`` rows (990.py:1287-1365).

    Returns a NEW master DataFrame (no in-place mutation); unmatched
    rows keep their original values via per-column coalesce.
    """
    scores = score_asof(filings, target_year)
    prefixed = scores.select(
        normalize_key(F.col("ein")).alias("__join_ein"),
        *[
            F.col(score_col).alias(f"__s_{master_col}")
            for master_col, score_col in MASTER_990_COLUMNS.items()
        ],
        F.col("distress_score").alias("__s_headline_score"),
        _category_to_master_col().alias("__s_headline_category"),
    )

    m = master.withColumn("__ein_clean", normalize_key(F.col("ein"))).withColumn(
        "__is_990", F.col("data_source") == F.lit("Hummingbird_990")
    )
    joined = m.join(
        F.broadcast(prefixed),
        (m["__ein_clean"] == prefixed["__join_ein"]) & m["__is_990"],
        "left",
    )

    out = joined
    for master_col in MASTER_990_COLUMNS:
        src = F.col(f"__s_{master_col}")
        if master_col in master.columns:
            out = out.withColumn(master_col, F.coalesce(src, F.col(master_col)))
        else:
            out = out.withColumn(master_col, src)
    # headline score/category update only when a new score exists
    # (990.py:1360-1365)
    has_score = F.col("__s_headline_score").isNotNull()
    if "distress_score" in master.columns:
        out = out.withColumn(
            "distress_score",
            F.when(has_score, F.col("__s_headline_score")).otherwise(
                F.col("distress_score")
            ),
        )
        out = out.withColumn(
            "distress_category",
            F.when(has_score, F.col("__s_headline_category")).otherwise(
                F.col("distress_category") if "distress_category" in master.columns else F.lit(None)
            ),
        )
    drop = [c for c in out.columns if c.startswith("__")]
    return out.drop(*drop)
