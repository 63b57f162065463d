"""Serving-layer catalog queries (SURVEY.md §3.3 map path / §2.1 S8,
§2.2 P3/P5/P9, §2.4 A5, §2.6 O3, §2.9 R3).

The reference's read path is the Leaflet map: trimmed column export
with coalesce-normalized fields and validity filters, client-side
conditional counters, and a substring search with a top-8 cut
(master_standalone.py:94-151; master_map2.html:304-425,686,726-768).
Those become engine queries: a projection/filter/coalesce extract (the
JSON payload source), one-pass GROUPING SETS counters, and a
deterministic substring top-k.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.tables import load


@query(
    "serving_map_extract",
    oracle="""
    SELECT c.c_custkey AS id,
           c.c_name AS name,
           n.n_name AS region_label,
           COALESCE(c.c_mktsegment, 'unknown') AS segment,
           ROUND(COALESCE(c.c_acctbal, 0.0), 2) AS balance,
           CASE WHEN c.c_acctbal >= 5000 THEN 'high'
                WHEN c.c_acctbal >= 0 THEN 'normal' ELSE 'negative' END AS tier
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal IS NOT NULL AND c.c_mktsegment <> 'MACHINERY'
    ORDER BY id
    """,
)
def serving_map_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 projection + P5 validity filter + F16 coalesce chains — the
    rows master_standalone.py embeds as the map JSON payload."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    tier = (
        F.when(F.col("c_acctbal") >= 5000, "high")
        .when(F.col("c_acctbal") >= 0, "normal")
        .otherwise("negative")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .filter(F.col("c_acctbal").isNotNull() & (F.col("c_mktsegment") != "MACHINERY"))
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("region_label"),
            F.coalesce("c_mktsegment", F.lit("unknown")).alias("segment"),
            F.round(F.coalesce("c_acctbal", F.lit(0.0)), 2).alias("balance"),
            tier.alias("tier"),
        )
    )


def write_map_export(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """S8/R3 — materialize the serving extract as JSON records (the
    payload master_standalone.py:143-151 embeds into the HTML)."""
    path = os.path.join(out_dir, "map_export.json")
    serving_map_extract(spark, sf_dir).write.mode("overwrite").json(path)
    return path


@query(
    "grouping_sets_counters",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2)
             AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY status, priority
    """,
)
def grouping_sets_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — the map's simultaneous per-source and per-category counters
    as one GROUPING SETS pass (SURVEY.md §2.4 note)."""
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2)
                 AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


@query(
    "search_topk_substring",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE contains(s_name, '11')
    ORDER BY s_name, s_suppkey
    LIMIT 8
    """,
)
def search_topk_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — substring search with a deterministic top-8 cut
    (master_map2.html:686 slice(0,8))."""
    sup = load(spark, sf_dir, "supplier")
    return (
        sup.filter(F.col("s_name").contains("11"))
        .select("s_suppkey", "s_name")
        .orderBy("s_name", "s_suppkey")
        .limit(8)
    )
