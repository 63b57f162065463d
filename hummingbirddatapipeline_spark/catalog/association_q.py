"""Association-mining catalog query: basket co-occurrence
(support / confidence / lift) over order lines — the market-basket
primitive behind "customers who bought X also bought Y" and, in a
training-data pipeline, co-occurrence statistics for item/feature
vocabularies.

Scale shape (operators/association.basket_cooccurrence): baskets over
``max_basket`` items are EXCLUDED before pair generation — a b-item
basket emits b*(b-1)/2 pairs, so one degenerate mega-basket would
dominate the shuffle; the cap bounds per-basket fanout the same way
LSH's max_bucket bounds bucket fanout. Pair counts then come from ONE
self-join of the capped member list on the basket key; item counts and
the basket total are small side aggregates broadcast onto the result.

The DuckDB oracle recomputes everything with its own list-based
basket build + self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.operators.association import (
    basket_cooccurrence,
)
from hummingbirddatapipeline_spark.tables import load


@query(
    "assoc_basket_cooccurrence",
    oracle="""
    WITH baskets AS (
      SELECT l_orderkey AS bk, list_sort(list_distinct(list(l_partkey)))
               AS items
      FROM lineitem GROUP BY l_orderkey
    ),
    kept AS (SELECT * FROM baskets WHERE len(items) <= 10),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets FROM kept),
    members AS (SELECT bk, unnest(items) AS item FROM kept),
    ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
           FROM members GROUP BY item),
    pc AS (
      SELECT x.item AS a, y.item AS b, CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM members x JOIN members y ON x.bk = y.bk AND x.item < y.item
      GROUP BY x.item, y.item
      HAVING COUNT(*) >= 2
    )
    SELECT pc.a AS item_a, pc.b AS item_b, pc.n_pair,
           ia.n_item AS n_a, ib.n_item AS n_b,
           ROUND(CAST(pc.n_pair AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE), 6)
             AS support,
           ROUND(CAST(pc.n_pair AS DOUBLE) / CAST(ia.n_item AS DOUBLE), 6)
             AS conf_a_to_b,
           ROUND(CAST(pc.n_pair AS DOUBLE) / CAST(ib.n_item AS DOUBLE), 6)
             AS conf_b_to_a,
           ROUND(CAST(pc.n_pair AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
                 / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)), 6)
             AS lift
    FROM pc JOIN ic ia ON ia.item = pc.a JOIN ic ib ON ib.item = pc.b
    CROSS JOIN nb
    ORDER BY item_a, item_b
    """,
)
def assoc_basket_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-pair co-occurrence over order baskets (parts per order,
    baskets capped at 10 items, pairs seen in >= 2 baskets) with
    support, directional confidence, and lift — all fractions rounded
    6dp from exact BIGINT counts so both engines agree bit-for-bit."""
    li = load(spark, sf_dir, "lineitem")
    return basket_cooccurrence(
        li, "l_orderkey", "l_partkey", min_pair_count=2, max_basket=10
    )
