"""Scoring-DSL catalog query: a full spec (interp + piecewise + W3
trend + A6 renormalization + A9 gate + categorization) over the TPC-H
tables, differentially tested because the SAME compiled expressions run
on Spark and (via spec_to_sql) on DuckDB.

The model is synthetic ("customer financial health" from order flow)
but exercises every DSL feature the 990/IPEDS models use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.operators.windows import with_prior_fields
from hummingbirddatapipeline_spark.scoring.compiler import apply_spec, spec_to_sql
from hummingbirddatapipeline_spark.scoring.spec import Domain, Indicator, ScoringSpec
from hummingbirddatapipeline_spark.tables import load

_W3_NA_TREND = (
    "CASE WHEN net_assets IS NULL OR prior_net_assets IS NULL THEN NULL "
    "WHEN prior_net_assets > 0 AND net_assets > 0 THEN "
    "  POWER(net_assets / prior_net_assets, 1.0 / years_gap) - 1 "
    "WHEN prior_net_assets > 0 AND net_assets <= 0 THEN -0.30 "
    "WHEN prior_net_assets < 0 AND net_assets < prior_net_assets THEN -0.20 "
    "WHEN prior_net_assets < 0 AND net_assets > prior_net_assets THEN 0.05 "
    "WHEN net_assets <= 0 THEN -0.10 ELSE 0.0 END"
)

CUSTOMER_HEALTH_SPEC = ScoringSpec(
    name="customer_health",
    entity_cols=("entity_id", "year"),
    min_indicators=3,
    domains=(
        Domain(
            name="solvency",
            weight=0.40,
            indicators=(
                Indicator(
                    name="equity_ratio",
                    weight=0.60,
                    raw_sql="net_assets / NULLIF(total_assets, 0)",
                    healthy=0.40,
                    distress=-0.10,
                ),
                Indicator(
                    name="debt_ratio",
                    weight=0.40,
                    raw_sql="(total_assets - net_assets) / NULLIF(total_assets, 0)",
                    healthy=0.50,
                    distress=1.0,
                    invert=True,
                ),
            ),
        ),
        Domain(
            name="operating",
            weight=0.40,
            indicators=(
                Indicator(
                    name="operating_margin",
                    weight=0.70,
                    raw_sql=(
                        "CASE WHEN total_revenue <> 0 THEN "
                        "(total_revenue - total_expenses) / ABS(total_revenue) "
                        "ELSE NULL END"
                    ),
                    healthy=0.05,
                    distress=-0.20,
                ),
                Indicator(
                    name="discount_mix",
                    weight=0.30,
                    raw_sql="discount_share",
                    score_sql=(
                        "CASE WHEN {raw} IS NULL THEN NULL "
                        "WHEN {raw} < 0.02 THEN 0.6 "
                        "WHEN {raw} > 0.06 THEN 0.4 ELSE 0.0 END"
                    ),
                ),
            ),
        ),
        Domain(
            name="trend",
            weight=0.20,
            indicators=(
                Indicator(
                    name="revenue_trend",
                    weight=0.50,
                    raw_sql=(
                        "CASE WHEN total_revenue IS NULL OR prior_total_revenue IS NULL "
                        "OR prior_total_revenue = 0 THEN NULL "
                        "ELSE POWER(total_revenue / prior_total_revenue, 1.0 / years_gap) - 1 END"
                    ),
                    healthy=0.0,
                    distress=-0.15,
                ),
                Indicator(
                    name="net_asset_trend",
                    weight=0.50,
                    raw_sql=_W3_NA_TREND,
                    healthy=0.0,
                    distress=-0.10,
                ),
            ),
        ),
    ),
)

# Long source table per (customer, year), both as DataFrame ops and SQL.
_SOURCE_SQL = """
SELECT w.*, w.year - w.prior_year AS years_gap FROM (
  SELECT cy.*,
         LAG(cy.total_revenue) OVER (PARTITION BY cy.entity_id ORDER BY cy.year)
           AS prior_total_revenue,
         LAG(cy.net_assets) OVER (PARTITION BY cy.entity_id ORDER BY cy.year)
           AS prior_net_assets,
         LAG(cy.year) OVER (PARTITION BY cy.entity_id ORDER BY cy.year)
           AS prior_year
  FROM (
    SELECT b.entity_id, b.year, b.total_revenue, b.total_expenses,
           b.discount_share,
           c.c_acctbal * 100 + 0.1 * b.total_revenue AS net_assets,
           c.c_acctbal * 100 + b.total_revenue AS total_assets
    FROM (
      SELECT o.o_custkey AS entity_id,
             EXTRACT(YEAR FROM o.o_orderdate) AS year,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS total_revenue,
             SUM(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax) * 0.97)
               AS total_expenses,
             SUM(l.l_extendedprice * l.l_discount) / NULLIF(SUM(l.l_extendedprice), 0)
               AS discount_share
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ) b
    JOIN customer c ON c.c_custkey = b.entity_id
  ) cy
) w
"""


def _source_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")
    base = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("entity_id"),
            F.year("o_orderdate").cast("long").alias("year"),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            ),
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 0.97
            ).alias("total_expenses"),
            (
                F.sum(F.col("l_extendedprice") * F.col("l_discount"))
                / F.nullif(F.sum("l_extendedprice"), F.lit(0))
            ).alias("discount_share"),
        )
    )
    cy = base.join(load(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_acctbal")
    ), F.col("c_custkey") == F.col("entity_id")).select(
        "entity_id",
        "year",
        "total_revenue",
        "total_expenses",
        "discount_share",
        (F.col("c_acctbal") * 100 + 0.1 * F.col("total_revenue")).alias("net_assets"),
        (F.col("c_acctbal") * 100 + F.col("total_revenue")).alias("total_assets"),
    )
    _ = cust
    return with_prior_fields(cy, "entity_id", "year", ["total_revenue", "net_assets"])


@query(
    "scoring_customer_health",
    oracle=(
        "SELECT * FROM ("
        + spec_to_sql(CUSTOMER_HEALTH_SPEC, _SOURCE_SQL)
        + ") ORDER BY entity_id, year"
    ),
)
def scoring_customer_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _source_df(spark, sf_dir)
    return apply_spec(src, CUSTOMER_HEALTH_SPEC).orderBy("entity_id", "year")
