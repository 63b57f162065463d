"""Feature-preparation / ML-data-quality catalog queries: robust
per-group winsorization, PSI drift monitoring, and group-wise median
imputation — the numeric-feature hygiene layer a training pipeline
runs before (winsorize/impute) and after (PSI) a model ships.

All three ride Spark's exact ``percentile`` (verified bit-identical to
DuckDB's ``quantile_cont`` — same (n-1)*p linear interpolation), so
the full differential gate applies: bounds, bucket edges, and medians
must agree to the bit, and the derived fractions round from exact
BIGINT counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.operators.scale import (
    impute_median,
    psi_drift,
    winsorize,
)
from hummingbirddatapipeline_spark.tables import load


@query(
    "feature_winsorize_prices",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS p_lo,
             quantile_cont(o_totalprice, 0.95) AS p_hi
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice, b.p_lo, b.p_hi,
           LEAST(GREATEST(o.o_totalprice, b.p_lo), b.p_hi)
             AS o_totalprice_winsorized
    FROM orders o JOIN b USING (o_orderpriority)
    ORDER BY o_orderkey
    """,
)
def feature_winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority winsorization of order prices at the exact
    [p5, p95]: one hash aggregate for the group percentiles, the tiny
    bounds table broadcast back onto the scan — no second shuffle of
    the fact side. The oracle recomputes bounds with quantile_cont and
    must match every clipped value bit-for-bit."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return winsorize(
        orders, "o_totalprice", "o_orderpriority", 0.05, 0.95
    ).select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        "p_lo",
        "p_hi",
        "o_totalprice_winsorized",
    )


@query(
    "feature_psi_price_drift",
    oracle=f"""
    WITH r AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
      WHERE l_shipdate < DATE '1998-01-01'
    ),
    c AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
      WHERE l_shipdate >= DATE '1998-01-01'
    ),
    e AS (SELECT quantile_cont(v, [{", ".join(str(i / 10) for i in range(1, 10))}]) AS edges FROM r),
    rb AS (
      SELECT len(list_filter(e.edges, x -> v > x)) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM r CROSS JOIN e GROUP BY 1
    ),
    cb AS (
      SELECT len(list_filter(e.edges, x -> v > x)) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM c CROSS JOIN e GROUP BY 1
    ),
    rt AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM rb),
    ct AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cb),
    buckets AS (SELECT unnest(range(10)) AS bucket),
    fr AS (
      SELECT b.bucket,
             ROUND(GREATEST(COALESCE(CAST(rb.n AS DOUBLE)
                                     / CAST(rt.t AS DOUBLE), 0.0),
                            0.000001), 6) AS ref_frac,
             ROUND(GREATEST(COALESCE(CAST(cb.n AS DOUBLE)
                                     / CAST(ct.t AS DOUBLE), 0.0),
                            0.000001), 6) AS cur_frac
      FROM buckets b
      LEFT JOIN rb ON rb.bucket = b.bucket
      LEFT JOIN cb ON cb.bucket = b.bucket
      CROSS JOIN rt CROSS JOIN ct
    )
    SELECT CAST(bucket AS INT) AS bucket, ref_frac, cur_frac,
           ROUND((cur_frac - ref_frac) * ln(cur_frac / ref_frac), 6)
             AS psi_term,
           ROUND(SUM((cur_frac - ref_frac) * ln(cur_frac / ref_frac))
                 OVER (), 6) AS psi_total
    FROM fr
    ORDER BY bucket
    """,
)
def feature_psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of l_extendedprice between the
    pre-1998 (reference/training) and post-1998 (current/serving)
    shipment windows (the corpus midpoint — both sides are populated
    at every SF; an empty reference now raises by operator contract) — the standard ML drift monitor, bucketed by the
    REFERENCE deciles. Edges are one broadcast array; each side
    buckets map-side via a 9-element bound-array filter — no sort, no
    cross-sample join beyond two 10-row frames."""
    li = load(spark, sf_dir, "lineitem")
    ref = li.filter(F.col("l_shipdate") < F.lit("1998-01-01")).select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    cur = li.filter(F.col("l_shipdate") >= F.lit("1998-01-01")).select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    return psi_drift(ref, cur, "v")


@query(
    "feature_impute_median_balance",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE CAST(c_acctbal AS DOUBLE) END AS bal
      FROM customer
    ),
    m AS (
      SELECT c_mktsegment, quantile_cont(bal, 0.5) AS med
      FROM c GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment, c.bal,
           COALESCE(c.bal, m.med) AS bal_imputed,
           c.bal IS NULL AS bal_was_null
    FROM c JOIN m USING (c_mktsegment)
    ORDER BY c_custkey
    """,
)
def feature_impute_median_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Group-wise median imputation: every 7th customer's balance is
    deterministically NULLed (so both engines construct the identical
    missing-data fixture from the raw table), then filled with the
    market segment's exact median of observed values, flagged. One
    percentile aggregate broadcast back onto the scan."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_acctbal").cast("double"))
        .alias("bal"),
    )
    return impute_median(cust, "bal", "c_mktsegment")
