"""Core relational operators (SURVEY.md §2.1–2.4, §2.6–2.9) as catalog
queries over the TPC-H-ish test tables, each with a DuckDB oracle.

Parity notes cite the reference operator each query re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.functions.scalar import money_cents
from hummingbirddatapipeline_spark.tables import load


# --------------------------------------------------------------------------
# A1/A3/F15 — grouped aggregation with means + rounding
# (value_counts / describe parity: 990.py:642-645,1243-1246)
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)             AS sum_qty,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                                                                  AS sum_base_price_cents,
      CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                                                                  AS sum_disc_price_cents,
      CAST(ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) * 10000 / COUNT(*))
        AS BIGINT)                                                AS avg_qty_e4,
      CAST(ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        / COUNT(*)) AS BIGINT)                                    AS avg_price_cents,
      CAST(ROUND(CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) AS DOUBLE)
        * 100 / COUNT(*)) AS BIGINT)                              AS avg_disc_e6,
      COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    price_cents = money_cents(F.col("l_extendedprice"))
    disc_price_cents = money_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    disc_e4 = F.round(F.col("l_discount") * 10000).cast("long")
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price_cents).alias("sum_base_price_cents"),
            F.sum(disc_price_cents).alias("sum_disc_price_cents"),
            F.round(F.sum(qty).cast("double") * 10000 / n).cast("long").alias("avg_qty_e4"),
            F.round(F.sum(price_cents).cast("double") / n).cast("long").alias(
                "avg_price_cents"
            ),
            F.round(F.sum(disc_e4).cast("double") * 100 / n).cast("long").alias(
                "avg_disc_e6"
            ),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# J1-shape multi-join + group + deterministic top-k
# (join+writeback parity: 990.py:1287-1365; top-k O2/O3)
# --------------------------------------------------------------------------
@query(
    "q3_top_revenue_orders",
    oracle="""
    SELECT
      o.o_orderkey,
      CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
        AS BIGINT) AS revenue_cents,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_cents DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregate-then-join: lineitem reduces to skinny (orderkey,
    revenue) rows BEFORE the orders join — the map-side partial
    combine means the wide 4-rows-per-order fact stream never crosses
    the wire, and the groupBy after the join disappears (orderkey is
    already unique). Orders are cut to the BUILDING segment by the
    customer join — no static broadcast hint: customer grows with sf,
    so the strategy is left to AQE's size-gated dynamic broadcast
    (session.py), which picks broadcast wherever it fits and degrades
    to a shuffled join past the ceiling instead of throwing at 8 GB
    the way a forced hint would. Identical semantics (the
    per-order revenue sum is unaffected by the customer filter; inner
    joins drop the same rows either side of the aggregate); measured
    42.6 -> ~13 s at the 100x probe. Final top-10 is a TakeOrdered,
    not a global sort."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev_cents = money_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    li_agg = li.groupBy("l_orderkey").agg(
        F.sum(rev_cents).alias("revenue_cents")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li_agg, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_cents"), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Deep multi-join star query (region->nation->customer+supplier colocated)
# --------------------------------------------------------------------------
@query(
    "q5_nation_revenue",
    oracle="""
    SELECT
      n.n_name AS nation,
      CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
        AS BIGINT) AS revenue_cents
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name IN ('REGION0', 'REGION1', 'AMERICA', 'ASIA')
    GROUP BY n.n_name
    ORDER BY revenue_cents DESC, nation
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(
        F.col("r_name").isin("REGION0", "REGION1", "AMERICA", "ASIA")
    )
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                money_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
    )


# --------------------------------------------------------------------------
# P4/U4 — broadcast LEFT SEMI join (key-set filter)
# (parity: EIN set filter at load, 990.py:686-688)
# --------------------------------------------------------------------------
@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big_orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


# --------------------------------------------------------------------------
# U3/J7/J8 — LEFT ANTI join (except-by-key; dedup/resume contract)
# (parity: append_priorities.py:222-243; chat_acreage_bot.py:891-895)
# --------------------------------------------------------------------------
@query(
    "anti_join_idle_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
    )
    """,
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )


# --------------------------------------------------------------------------
# A5 — conditional counters in a single pass
# (parity: showMarkers tallies, master_map2.html:371-425)
# --------------------------------------------------------------------------
@query(
    "conditional_counters",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
      CAST(ROUND(
        CAST(SUM(CASE WHEN o_orderstatus = 'F'
                 THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS DOUBLE)
        / NULLIF(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)
      ) AS BIGINT) AS avg_filled_price_cents
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def conditional_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    filled_cents = F.when(
        F.col("o_orderstatus") == "F", money_cents(F.col("o_totalprice"))
    )
    n_filled_nonnull = F.count(F.when(F.col("o_orderstatus") == "F", 1))
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_filled"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
            F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).alias("n_large"),
            F.round(
                F.sum(filled_cents).cast("double")
                / F.nullif(n_filled_nonnull, F.lit(0))
            )
            .cast("long")
            .alias("avg_filled_price_cents"),
        )
    )


# --------------------------------------------------------------------------
# A2 — distinct counts per group (990.py:717 nunique parity)
# --------------------------------------------------------------------------
@query(
    "distinct_customers_per_nation",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(DISTINCT o.o_custkey) AS n_active_customers,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def distinct_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("o_custkey").alias("n_active_customers"),
            F.count("*").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# A4/W4 — latest/argmax row per entity via window (as-of selection)
# (parity: most-recent-year pick, 990.py:1226-1236; ipeds_v5.py:1443-1444)
# --------------------------------------------------------------------------
@query(
    "asof_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           o_orderdate AS latest_orderdate,
           ROUND(o_totalprice, 2) AS latest_totalprice
    FROM (
      SELECT o.*,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders o
    )
    WHERE rn = 1
    """,
)
def asof_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
            F.round("o_totalprice", 2).alias("latest_totalprice"),
        )
    )


# --------------------------------------------------------------------------
# W1 — lag + gap-aware growth rate per entity-year
# (parity: annualized trend kernels, 990.py:974-1058)
# --------------------------------------------------------------------------
@query(
    "window_yoy_nation_revenue_growth",
    oracle="""
    WITH yearly AS (
      SELECT c.c_nationkey AS nationkey,
             EXTRACT(YEAR FROM o.o_orderdate) AS order_year,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT nationkey,
           order_year,
           revenue_cents,
           CAST(ROUND(
             (POW(CAST(revenue_cents AS DOUBLE) / CAST(LAG(revenue_cents) OVER w AS DOUBLE),
                  1.0 / (order_year - LAG(order_year) OVER w)) - 1) * 1000000
           ) AS BIGINT) AS growth_e6
    FROM yearly
    WINDOW w AS (PARTITION BY nationkey ORDER BY order_year)
    ORDER BY nationkey, order_year
    """,
)
def window_yoy_nation_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    yearly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(F.sum(money_cents(F.col("o_totalprice"))).alias("revenue_cents"))
    )
    w = Window.partitionBy("nationkey").orderBy("order_year")
    growth = (
        F.pow(
            F.col("revenue_cents").cast("double")
            / F.lag("revenue_cents").over(w).cast("double"),
            F.lit(1.0) / (F.col("order_year") - F.lag("order_year").over(w)),
        )
        - 1
    )
    return (
        yearly.withColumn("growth_e6", F.round(growth * 1000000).cast("long"))
        .select("nationkey", "order_year", "revenue_cents", "growth_e6")
    )


# --------------------------------------------------------------------------
# R1 — long -> wide pivot (per-year flat columns)
# (parity: master's revenue_2024-style columns, master_standalone.py:52-60)
# --------------------------------------------------------------------------
@query(
    "pivot_nation_revenue_by_year",
    oracle="""
    SELECT n.n_name AS nation,
      CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o.o_orderdate) = 1998
        THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS revenue_1998_cents,
      CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o.o_orderdate) = 1999
        THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS revenue_1999_cents,
      CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o.o_orderdate) = 2000
        THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS revenue_2000_cents,
      CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o.o_orderdate) = 2001
        THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS revenue_2001_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def pivot_nation_revenue_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    years = [1998, 1999, 2000, 2001]
    pivoted = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("order_year", F.year("o_orderdate"))
        .withColumn("price_cents", money_cents(F.col("o_totalprice")))
        .groupBy(F.col("n_name").alias("nation"))
        .pivot("order_year", years)
        .agg(F.sum("price_cents"))
    )
    renamed = pivoted.select(
        "nation", *[F.col(str(y)).alias(f"revenue_{y}_cents") for y in years]
    )
    return renamed


# --------------------------------------------------------------------------
# R2 — wide -> long melt/unpivot
# (parity: detail export entity x year rows, 990.py:1250-1256)
# --------------------------------------------------------------------------
@query(
    "unpivot_returnflag_metrics",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS total_price_cents,
             CAST(SUM(CAST(ROUND(l_discount * l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS total_discount_cents
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value FROM (
      SELECT l_returnflag, 'total_qty' AS metric, total_qty AS value FROM wide
      UNION ALL
      SELECT l_returnflag, 'total_price_cents', total_price_cents FROM wide
      UNION ALL
      SELECT l_returnflag, 'total_discount_cents', total_discount_cents FROM wide
    )
    ORDER BY l_returnflag, metric
    """,
)
def unpivot_returnflag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        F.sum(money_cents(F.col("l_extendedprice"))).alias("total_price_cents"),
        F.sum(money_cents(F.col("l_discount") * F.col("l_extendedprice"))).alias(
            "total_discount_cents"
        ),
    )
    melted = wide.unpivot(
        ids=["l_returnflag"],
        values=["total_qty", "total_price_cents", "total_discount_cents"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return melted


# --------------------------------------------------------------------------
# F3 — bucket/step function scoring (histogram over buckets)
# (parity: size buckets ipeds.py:746-758; priority buckets
#  append_priorities.py:73-102)
# --------------------------------------------------------------------------
@query(
    "bucket_customer_balance",
    oracle="""
    SELECT
      CASE
        WHEN c_acctbal IS NULL THEN NULL
        WHEN c_acctbal >= 7500 THEN 'high'
        WHEN c_acctbal >= 2500 THEN 'mid'
        WHEN c_acctbal >= 0 THEN 'low'
        ELSE 'negative'
      END AS balance_tier,
      COUNT(*) AS n_customers,
      CAST(ROUND(CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / COUNT(*))
        AS BIGINT) AS avg_balance_cents
    FROM customer
    GROUP BY 1
    ORDER BY balance_tier NULLS FIRST
    """,
)
def bucket_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal").isNull(), F.lit(None).cast("string"))
        .when(F.col("c_acctbal") >= 7500, "high")
        .when(F.col("c_acctbal") >= 2500, "mid")
        .when(F.col("c_acctbal") >= 0, "low")
        .otherwise("negative")
    )
    return (
        cust.withColumn("balance_tier", tier)
        .groupBy("balance_tier")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(money_cents(F.col("c_acctbal"))).cast("double") / F.count("*"))
            .cast("long")
            .alias("avg_balance_cents"),
        )
    )


# --------------------------------------------------------------------------
# F5 + F1 — HHI concentration index with null-safe shares
# (parity: revenue concentration, 990.py:924-939)
# --------------------------------------------------------------------------
@query(
    "hhi_supplier_concentration",
    oracle="""
    WITH supplier_rev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
               AS BIGINT) AS rev_cents
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    shares AS (
      SELECT nationkey, suppkey,
             CAST(ROUND(CAST(rev_cents AS DOUBLE) * 1000000000
               / CAST(SUM(rev_cents) OVER (PARTITION BY nationkey) AS DOUBLE))
               AS BIGINT) AS share_e9
      FROM supplier_rev
    )
    SELECT nationkey,
           CAST(ROUND(CAST(SUM(share_e9 * share_e9) AS DOUBLE) / 1000000000000.0)
             AS BIGINT) AS hhi_e6,
           COUNT(*) AS n_suppliers
    FROM shares
    GROUP BY nationkey
    ORDER BY nationkey
    """,
)
def hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5+F1 — HHI on exact-integer shares: revenue quantized to cents
    (order-independent integer sums), shares scaled to 1e9 integer units
    per row, so the sum of squared shares is again an exact integer sum.
    Bounded: sum(share_e9^2) <= (sum share_e9)^2 = 1e18 < 2^63."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    supplier_rev = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                money_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rev_cents")
        )
    )
    w = Window.partitionBy("nationkey")
    shares = supplier_rev.withColumn(
        "share_e9",
        F.round(
            F.col("rev_cents").cast("double")
            * 1000000000
            / F.sum("rev_cents").over(w).cast("double")
        ).cast("long"),
    )
    return (
        shares.groupBy("nationkey")
        .agg(
            F.round(
                F.sum(F.col("share_e9") * F.col("share_e9")).cast("double")
                / 1000000000000.0
            )
            .cast("long")
            .alias("hhi_e6"),
            F.count("*").alias("n_suppliers"),
        )
    )


# --------------------------------------------------------------------------
# F1 — safe division (try_divide) with zero/NULL denominators
# --------------------------------------------------------------------------
@query(
    "safe_divide_discount_rate",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(
             CAST(SUM(CAST(ROUND(l_discount * l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             * 1000000
             / NULLIF(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE), 0)
           ) AS BIGINT) AS effective_discount_e6,
           CAST(ROUND(
             CAST(SUM(CASE WHEN l_quantity = 0 THEN NULL
                      ELSE CAST(ROUND(l_extendedprice / l_quantity * 10000) AS BIGINT)
                      END) AS DOUBLE)
             / NULLIF(COUNT(CASE WHEN l_quantity <> 0 THEN 1 END), 0)
           ) AS BIGINT) AS avg_unit_price_e4
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def safe_divide_discount_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price_cents = money_cents(F.col("l_discount") * F.col("l_extendedprice"))
    price_cents = money_cents(F.col("l_extendedprice"))
    unit_e4 = F.when(
        F.col("l_quantity") != 0,
        F.round(F.col("l_extendedprice") / F.col("l_quantity") * 10000).cast("long"),
    )
    n_unit = F.count(F.when(F.col("l_quantity") != 0, 1))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(disc_price_cents).cast("double")
                * 1000000
                / F.nullif(F.sum(price_cents).cast("double"), F.lit(0.0))
            )
            .cast("long")
            .alias("effective_discount_e6"),
            F.round(
                F.sum(unit_e4).cast("double") / F.nullif(n_unit, F.lit(0))
            )
            .cast("long")
            .alias("avg_unit_price_e4"),
        )
    )


# --------------------------------------------------------------------------
# O1-O3 — deterministic top-k with key tiebreak
# --------------------------------------------------------------------------
@query(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice,
           o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderpriority",
        )
    )


# --------------------------------------------------------------------------
# U1 — union with dedup by composite key (anti-join append contract)
# (parity: append_priorities.py:222-247)
# --------------------------------------------------------------------------
@query(
    "union_dedup_segments",
    oracle="""
    WITH building AS (
      SELECT c_custkey, c_name, 'BUILDING' AS batch FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ),
    rich AS (
      SELECT c_custkey, c_name, 'RICH' AS batch FROM customer
      WHERE c_acctbal > 5000
    )
    SELECT c_custkey, c_name, batch FROM building
    UNION ALL
    SELECT r.c_custkey, r.c_name, r.batch FROM rich r
    WHERE NOT EXISTS (SELECT 1 FROM building b WHERE b.c_custkey = r.c_custkey)
    ORDER BY c_custkey
    """,
)
def union_dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", F.lit("BUILDING").alias("batch")
    )
    rich = cust.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", "c_name", F.lit("RICH").alias("batch")
    )
    new_rows = rich.join(building, on="c_custkey", how="left_anti")
    return building.unionByName(new_rows)


# --------------------------------------------------------------------------
# J6 — self-join band predicate (subsidiary detection shape)
# (parity: shared-EIN groups, parent = max revenue, siblings within 1%
#  of parent assets — ipeds_v5.py:375-437)
# --------------------------------------------------------------------------
@query(
    "band_join_balance_siblings",
    oracle="""
    WITH ranked AS (
      SELECT c_custkey, c_nationkey, c_acctbal,
             FIRST_VALUE(c_acctbal) OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey
             ) AS parent_bal,
             FIRST_VALUE(c_custkey) OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey
             ) AS parent_key
      FROM customer
      WHERE c_acctbal > 0
    )
    SELECT c_custkey, c_nationkey,
           ROUND(c_acctbal, 2) AS c_acctbal,
           parent_key,
           ROUND(parent_bal, 2) AS parent_bal
    FROM ranked
    WHERE c_custkey <> parent_key
      AND ABS(c_acctbal - parent_bal) / ABS(parent_bal) < 0.05
    ORDER BY c_nationkey, c_custkey
    """,
)
def band_join_balance_siblings(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cust.withColumn("parent_bal", F.first("c_acctbal").over(w)).withColumn(
        "parent_key", F.first("c_custkey").over(w)
    )
    return (
        ranked.filter(
            (F.col("c_custkey") != F.col("parent_key"))
            & (
                F.abs(F.col("c_acctbal") - F.col("parent_bal"))
                / F.abs(F.col("parent_bal"))
                < 0.05
            )
        )
        .select(
            "c_custkey",
            "c_nationkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "parent_key",
            F.round("parent_bal", 2).alias("parent_bal"),
        )
    )


@query(
    "latest_filing_plus_history",
    oracle="""
    WITH latest AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
        ) AS rn FROM orders
      ) WHERE rn = 1
    ),
    hist AS (
      SELECT o_custkey,
             COUNT(*) AS n_orders,
             FLOOR(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 / COUNT(*) * 10000) / 10000 AS avg_price
      FROM orders GROUP BY o_custkey
    )
    SELECT l.o_custkey AS custkey, l.o_orderkey AS latest_orderkey,
           ROUND(l.o_totalprice, 2) AS latest_price,
           h.n_orders, h.avg_price
    FROM latest l JOIN hist h ON h.o_custkey = l.o_custkey
    ORDER BY custkey
    """,
)
def latest_filing_plus_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — one row per entity: most recent record joined with
    historical averages (the absent 990_analysis.py capability,
    README.md:58-60: latest filing per EIN + averages)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("latest_orderkey"),
            F.round("o_totalprice", 2).alias("latest_price"),
        )
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    hist = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_orders"),
        (
            F.floor(F.sum(cents).cast("double") / 100.0 / F.count("*") * 10000)
            / 10000
        ).alias("avg_price"),
    )
    return latest.join(hist, "custkey")


# --------------------------------------------------------------------------
# Z-order (Morton) layout codes — the data-skipping clustering key a
# 100 TB table writes with (open-source form of Delta/Iceberg ZORDER)
# --------------------------------------------------------------------------
def _duck_morton(a: str, b: str, bits: int = 16) -> str:
    am, bm = f"({a} & {(1 << bits) - 1})", f"({b} & {(1 << bits) - 1})"
    terms = []
    for i in range(bits):
        terms.append(f"((({am} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({bm} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


@query(
    "layout_zorder_codes",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CAST({_duck_morton("o_custkey", "o_orderkey")} AS BIGINT) AS zcode
    FROM orders
    ORDER BY o_orderkey
    """,
)
def layout_zorder_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton interleave of (custkey, orderkey) — the clustering key
    ``zorder_layout`` sorts files by so parquet min/max footers stay
    tight in BOTH dimensions and either filter prunes at planning time.
    Pure shift/mask expressions; exact oracle."""
    from hummingbirddatapipeline_spark.operators.scale import morton_code

    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        morton_code(F.col("o_custkey"), F.col("o_orderkey")).alias("zcode"),
    )


@query(
    "layout_shard_manifest",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':r10'),
                                 1, 13) AS BIGINT) AS h52,
             CAST(len(list_filter(
               string_split_regex(trim(text), '\\s+'),
               t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT h52 % 16 AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           bit_xor(h52) AS fingerprint
    FROM h GROUP BY 1
    """,
)
def layout_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard layout + audit manifest under the
    full oracle gate (operators/scale.shard_manifest): every document
    lands in md5-hash-mod-16 of its id, and each shard reports
    (n_docs, n_tokens, fingerprint) where the fingerprint is the
    BIT_XOR of member 52-bit content hashes — ORDER-INSENSITIVE and
    overflow-free, so a 1000-node writer and a single-node auditor
    agree without sorting anything (repartition invariance pinned in
    tests/test_r10_oracles.py). DuckDB recomputes every assignment,
    token count, and XOR fingerprint independently.

    Scale shape: ONE map-side projection (shard + hash are pure
    expressions at the scan) + ONE hash aggregate to n_shards rows of
    bounded audit state; the physical write is partitionBy(shard_id)
    over the same projection."""
    from hummingbirddatapipeline_spark.functions.text import ws_token_count
    from hummingbirddatapipeline_spark.operators.scale import shard_manifest

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        ws_token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return shard_manifest(
        docs, "doc_id", token_col="n_tokens", n_shards=16, seed="r10"
    )


# --------------------------------------------------------------------------
# Data-quality expectations (Deequ-shape verdicts; pipeline guardrails)
# --------------------------------------------------------------------------
@query(
    "dq_orders_expectations",
    oracle="""
    WITH agg AS (
      SELECT COUNT(*) AS n_rows,
             SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                 THEN 1 ELSE 0 END) AS v_price_positive,
             SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
               AS v_orderdate_not_null,
             SUM(CASE WHEN o_orderpriority IS NULL
                      OR o_orderpriority NOT IN
                        ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                 THEN 1 ELSE 0 END) AS v_priority_in_domain
      FROM orders
    ),
    fk AS (
      SELECT COUNT(*) AS v FROM orders o
      WHERE o.o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    )
    SELECT check_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM (
      SELECT 'price_positive' AS check_name, n_rows,
             v_price_positive AS n_violations FROM agg
      UNION ALL
      SELECT 'orderdate_not_null', n_rows, v_orderdate_not_null FROM agg
      UNION ALL
      SELECT 'priority_in_domain', n_rows, v_priority_in_domain FROM agg
      UNION ALL
      SELECT 'fk_o_custkey_references_c_custkey', (SELECT n_rows FROM agg),
             v FROM fk
    )
    ORDER BY check_name
    """,
)
def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline guardrails: three row-level constraints compiled into
    one scan (conditional counts, map-side combined) plus a referential
    check as an anti-join that ships only violations."""
    from hummingbirddatapipeline_spark.operators.expectations import (
        check_expectations,
        check_foreign_key,
    )

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    prios = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    checks = {
        "price_positive": F.col("o_totalprice").isNull()
        | (F.col("o_totalprice") <= 0),
        "orderdate_not_null": F.col("o_orderdate").isNull(),
        "priority_in_domain": F.col("o_orderpriority").isNull()
        | ~F.col("o_orderpriority").isin(*prios),
    }
    row_checks = check_expectations(orders, checks)
    fk = check_foreign_key(
        orders, cust, "o_custkey", "c_custkey",
        name="fk_o_custkey_references_c_custkey",
    )
    return row_checks.unionByName(fk)


# --------------------------------------------------------------------------
# Join-key skew diagnostics (pre-shuffle planning report; operators/scale.py)
# --------------------------------------------------------------------------
@query(
    "dq_skew_report",
    oracle="""
    WITH c AS (
      SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM c
    ),
    top AS (
      SELECT key, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rank
      FROM c QUALIFY rank <= 5
    )
    SELECT t.key, CAST(t.cnt AS BIGINT) AS cnt, CAST(t.rank AS INT) AS rank,
           ROUND(CAST(t.cnt AS DOUBLE) / CAST(s.n_rows AS DOUBLE), 6) AS share,
           ROUND(CAST(s.max_cnt AS DOUBLE)
                 / (CAST(s.n_rows AS DOUBLE) / CAST(s.n_keys AS DOUBLE)), 4)
             AS skew_ratio,
           GREATEST(1, CAST(CEIL(CAST(t.cnt AS DOUBLE)
                 / (CAST(s.n_rows AS DOUBLE) / CAST(s.n_keys AS DOUBLE)))
               AS BIGINT)) AS suggested_salt,
           s.n_keys
    FROM top t CROSS JOIN s
    ORDER BY t.rank
    """,
)
def dq_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew report over orders.o_custkey — the diagnostic run
    before shuffling a 100 TB fact on a key: top-5 hot keys, their row
    share, the max/avg skew ratio, and the per-key salt factor that
    would level each to an average task. All counts stay exact BIGINTs
    and avg derives from one double division, so both engines evaluate
    bit-identical arithmetic."""
    from hummingbirddatapipeline_spark.operators.scale import (
        key_skew_report,
    )

    orders = load(spark, sf_dir, "orders")
    return key_skew_report(orders, "o_custkey", top_k=5)


@query(
    "join_salted_hot_keys",
    oracle="""
    WITH dim AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_type
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, d.n_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(e.value * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_value_e6
    FROM events e JOIN dim d ON d.event_type = e.event_type
    GROUP BY e.event_type, d.n_type
    ORDER BY e.event_type
    """,
)
def join_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted hot-key join under the full oracle gate
    (operators/scale.salted_join): events' event_type has a handful of
    values covering the whole fact table — the worst-case hot-key
    shuffle — so the join to the per-type dim runs on (key, salt) with
    the dim replicated 8x and each hot key's rows spread over 8 tasks
    instead of one straggler. The oracle is the PLAIN join + aggregate,
    so the differential gates exactly the property salting must
    preserve: join multiplicity (n_rows == n_type row-for-row — any
    salt-induced duplication or loss breaks both the count and the
    hash) and the exact e6-quantized value sum.

    Scale shape: the skewed side never hashes on the bare hot key —
    the exchange is on (event_type, __salt); the dim side is a K-row
    aggregate replicated n_salts x (bounded: K * 8 rows). This is the
    explicit-salt alternative the dq_skew_report's suggested_salt
    feeds when AQE skew splitting isn't available (e.g. a bucketed
    sink or a non-AQE engine); session.py's AQE path needs no code."""
    from hummingbirddatapipeline_spark.operators.scale import salted_join

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1000000).cast("long").alias("value_e6"),
    )
    dim = ev.groupBy("event_type").agg(F.count("*").alias("n_type"))
    joined = salted_join(ev, dim, "event_type", n_salts=8)
    return joined.groupBy("event_type", "n_type").agg(
        F.count("*").alias("n_rows"),
        F.sum("value_e6").alias("sum_value_e6"),
    )


def _rendezvous_sql(
    n_shards: int, n_shards_new: int, seed: str = "hrw0"
) -> str:
    """Independent DuckDB formulation of rendezvous shard assignment
    (operators/scale.rendezvous_shards): re-derives both fleets'
    argmax-md5 placements as struct list_max (hex compares
    lexicographically == numerically at fixed length; ties to the
    lowest shard via the negated-id field) and the moved flag."""

    def argmax(n: int) -> str:
        structs = ", ".join(
            "{'h': md5(CAST(doc_id AS VARCHAR) || "
            f"':{s}:{seed}'), 'neg_s': {-s}}}"
            for s in range(n)
        )
        return f"CAST(-list_max([{structs}])['neg_s'] AS INT)"

    return f"""
    SELECT doc_id, shard, shard_new, shard <> shard_new AS moved
    FROM (
      SELECT doc_id,
             {argmax(n_shards)} AS shard,
             {argmax(n_shards_new)} AS shard_new
      FROM documents)
    """


@query("layout_rendezvous_shards", oracle=_rendezvous_sql(8, 9))
def layout_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous/HRW shard assignment (Thaler & Ravishankar 1998;
    operators/scale.rendezvous_shards) under the full oracle gate —
    the consistent-placement completion of layout_shard_manifest: each
    doc's shard is argmax over per-(key, shard) 52-bit md5 weights, so
    growing 8 -> 9 shards moves ONLY the keys whose new max is the
    added shard (~1/9, binomial-banded and every moved key landing on
    shard 8 — both pinned in tests/test_r19_oracles.py). DuckDB
    replays the weight argmax for both shard counts.

    Scale shape: ZERO exchanges — placement is a map-side argmax over
    n_shards hash evaluations per key; a resize re-places keys without
    a global reshuffle, which is the entire point of HRW at 100 TB."""
    from hummingbirddatapipeline_spark.operators.scale import (
        rendezvous_shards,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return rendezvous_shards(docs, "doc_id", n_shards=8, n_shards_new=9)


def _q14_promo_sql() -> str:
    """Independent DuckDB formulation of the promo-effect query
    (classic TPC-H Q14 shape, by ship month over 1998): exact cent
    BIGINT sums per the q1 money convention, one 6dp division."""
    return """
    SELECT CAST(EXTRACT(month FROM l.l_shipdate) AS INT) AS ship_month,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                 * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS promo_cents,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                               * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                  * 100) AS BIGINT) ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(CAST(ROUND(l.l_extendedprice
                        * (1 - l.l_discount) * 100) AS BIGINT))
                        AS DOUBLE), 6) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1
    """


@query("q14_promo_effect", oracle=_q14_promo_sql())
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share by ship month (the TPC-H Q14 shape widened
    to a 12-row monthly report): lineitem x part equi-join with the
    small dimension BROADCAST, exact cent sums, one 6dp division.
    Registered since r12 (formerly the r25 bank tier) with
    _q14_promo_sql() as its oracle.

    Scale shape: part grows with sf, so there is NO static broadcast
    hint — AQE's size-gated dynamic broadcast (session.py) picks the
    broadcast-hash join at every scale where part's projected two
    columns fit, and degrades to a shuffled join past the ceiling
    instead of throwing. The fact side filters on the ship-date
    predicate AT THE SCAN (pushed down), so the join moves one year
    of lineitem; 12-group map-side-combined aggregate.
    """
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    rev_cents = money_cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    promo_cents = F.when(F.col("p_type") == "PROMO", rev_cents).otherwise(
        F.lit(0).cast("long")
    )
    agg = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(pt.select("p_partkey", "p_type"),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.sum(promo_cents).alias("promo_cents"),
            F.sum(rev_cents).alias("total_cents"),
        )
    )
    return agg.select(
        "ship_month",
        "promo_cents",
        "total_cents",
        F.round(
            100.0
            * F.col("promo_cents").cast("double")
            / F.col("total_cents").cast("double"),
            6,
        ).alias("promo_pct"),
    )


def _embedding_coverage_sql() -> str:
    """Independent DuckDB formulation of the bidirectional embedding
    coverage report (operators/expectations.embedding_coverage over
    documents x embeddings): FULL OUTER join on the id, orphan
    vectors folded into one '__orphan__' stratum."""
    return """
    SELECT COALESCE(d.source, '__orphan__') AS source,
           CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN d.doc_id IS NOT NULL
                          AND v.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN d.doc_id IS NOT NULL
                          AND v.vec_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_doc_only,
           CAST(SUM(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_vec_only,
           CASE WHEN SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0
                         END) > 0
                THEN ROUND(SUM(CASE WHEN d.doc_id IS NOT NULL
                                AND v.vec_id IS NOT NULL THEN 1 ELSE 0
                               END)
                           / CAST(SUM(CASE WHEN d.doc_id IS NOT NULL
                                      THEN 1 ELSE 0 END) AS DOUBLE), 6)
                ELSE 0.0 END AS coverage
    FROM documents d
    FULL OUTER JOIN embeddings v ON d.doc_id = v.vec_id
    GROUP BY 1
    """


_Q19_BRACKETS = (
    ("Brand#11", 1, 10, 1, 20),
    ("Brand#12", 11, 25, 10, 30),
    ("Brand#13", 26, 50, 20, 50),
)


@query("dq_embedding_coverage", oracle=_embedding_coverage_sql())
def dq_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional referential-integrity report over documents x
    embeddings (operators/expectations.embedding_coverage) under the
    full oracle gate — per source: n_docs / n_matched / n_doc_only /
    coverage, with vectors that have no document folded into one
    __orphan__ row (the per-source operational view;
    check_foreign_key stays the one-directional primitive).
    Planted-hole / planted-orphan exactness is pinned in
    tests/test_r26_oracles.py.

    Scale shape: both sides project to SKINNY ids before ONE
    full-outer equi-join — text and vector payloads never move; the
    report is K+1 rows at any scale."""
    from hummingbirddatapipeline_spark.operators.expectations import (
        embedding_coverage,
    )

    return embedding_coverage(
        load(spark, sf_dir, "documents"), load(spark, sf_dir, "embeddings")
    )


def _q19_bracket_sql() -> str:
    """Independent DuckDB formulation of the bracketed-predicate
    revenue query (the TPC-H Q19 shape): per bracket, matched line
    count and exact cent revenue."""
    cases_b = " ".join(
        f"WHEN p.p_brand = '{b}' AND p.p_size BETWEEN {s1} AND {s2} "
        f"AND l.l_quantity BETWEEN {q1} AND {q2} THEN '{b}'"
        for b, s1, s2, q1, q2 in _Q19_BRACKETS
    )
    return f"""
    SELECT bracket,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM (
      SELECT l.l_extendedprice, l.l_discount,
             CASE {cases_b} END AS bracket
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ) WHERE bracket IS NOT NULL
    GROUP BY bracket
    """


@query("q19_bracket_revenue", oracle=_q19_bracket_sql())
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bracketed-predicate revenue (the TPC-H Q19 shape, per-bracket
    rows instead of one grand total): each bracket is a conjunctive
    (brand, size range, quantity range) predicate; a line matches at
    most one (brands are disjoint). Registered since r12 (formerly
    the r27 bank tier) with `_q19_bracket_sql()` as its oracle.

    Scale shape: part grows with sf, so the join strategy is left to
    AQE's size-gated dynamic broadcast (no static hint — a forced
    broadcast throws at the 8 GB ceiling at target scale); the OR-of-
    brackets is one CASE projection after the join, so the fact side
    streams once with no second pass per bracket; exact cent sums per
    the q1 money convention. The brand/size half of each bracket
    prunes on the build side before the probe.
    """
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    bracket = F.lit(None).cast("string")
    for b, s1, s2, q1, q2 in reversed(_Q19_BRACKETS):
        bracket = F.when(
            (F.col("p_brand") == b)
            & F.col("p_size").between(s1, s2)
            & F.col("l_quantity").between(q1, q2),
            F.lit(b),
        ).otherwise(bracket)
    return (
        li.join(
            pt.select("p_partkey", "p_brand", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .withColumn("bracket", bracket)
        .filter(F.col("bracket").isNotNull())
        .groupBy("bracket")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                money_cents(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            ).alias("revenue_cents"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q6 / Q18 adaptations (registered the round they were built,
# per the r12 no-banking rule)
# --------------------------------------------------------------------------
def _q6_forecast_sql() -> str:
    """Independent DuckDB formulation of the forecast-revenue-change
    query (classic TPC-H Q6 on the available columns): one pushed-down
    scan filter, exact cent sum of l_extendedprice * l_discount."""
    return """
    SELECT
      CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
           AS BIGINT) AS revenue_cents,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """


@query("q6_forecast_revenue", oracle=_q6_forecast_sql())
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change (TPC-H Q6 shape): what revenue would
    have been earned had the 5-7% discounts in the 1996 ship year not
    applied to small-quantity items. Single-table, zero joins: every
    predicate (date range, discount band, quantity cap) is pushed to
    the parquet scan, and the exact-cent sum is one map-side-combined
    aggregate to a single row — the canonical filter-pushdown probe:
    at 100 TB the scan is the entire cost and the plan moves nothing.

    The discount band compares doubles both engines derive as k/100
    from the same data, so the boundary values (0.05, 0.07) select
    identical rows bit-for-bit."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                money_cents(F.col("l_extendedprice") * F.col("l_discount"))
            ).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


def _q18_volume_sql(min_qty: int = 250, k: int = 100) -> str:
    """Independent DuckDB formulation of the large-volume-customer
    report (classic TPC-H Q18 shape): group lineitem by order, keep
    orders past the quantity threshold, attach order + customer, top-k
    under a total order."""
    return f"""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_price_cents,
           CAST(q.total_qty AS BIGINT) AS total_qty
    FROM (
      SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > {min_qty}
    ) q
    JOIN orders o ON o.o_orderkey = q.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY q.total_qty DESC, o.o_orderkey
    LIMIT {k}
    """


@query("q18_large_volume_customers", oracle=_q18_volume_sql())
def q18_large_volume_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose summed
    line quantity exceeds 250 units, with customer attribution, top
    100 by volume under a total order (qty desc, orderkey tiebreak).

    Scale shape: the per-order quantity aggregate is map-side combined
    on the fact table's natural key and the HAVING filter collapses
    the join input to the rare tail BEFORE any wide row moves —
    orders/customer attach to the survivors only (at this selectivity
    AQE picks broadcast for the probe side at any realistic sf). The
    rank window runs over the filtered tail, compiling to the
    WindowGroupLimit k-cut like every other top-k row."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    joined = (
        qty.join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            money_cents(F.col("o_totalprice")).alias("total_price_cents"),
            "total_qty",
        )
    )
    w = Window.orderBy(F.desc("total_qty"), F.col("o_orderkey"))
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 100)
        .drop("__rk")
    )


def _q10_returned_sql(k: int = 20) -> str:
    """Independent DuckDB formulation of the returned-item report
    (classic TPC-H Q10 shape): revenue lost to returns ('R' flag) per
    customer over the 1997 order year, nation attached, top-k under a
    total order."""
    return f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                               * 100) AS BIGINT)) AS BIGINT)
             AS lost_revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY lost_revenue_cents DESC, c.c_custkey
    LIMIT {k}
    """


@query("q10_returned_items", oracle=_q10_returned_sql())
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue report (TPC-H Q10 shape): which customers
    returned the most 1997-order revenue, with nation attribution —
    top 20 by lost revenue under a total order (cents desc, custkey
    tiebreak).

    Scale shape: the order-year predicate prunes orders AT THE SCAN
    and the 'R' flag prunes lineitem the same way; the fact-fact join
    shuffles only the two pruned sides on orderkey; nation keeps its
    static broadcast hint (25 fixed rows) while customer — which
    grows with sf — is left to AQE's size-gated dynamic broadcast,
    so the plan degrades instead of throwing at the 8 GB broadcast
    ceiling at target scale. The aggregate is keyed on
    customer (map-side combined) and the rank window compiles to the
    WindowGroupLimit k-cut."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    na = load(spark, sf_dir, "nation")
    agg = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            od.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            cu.select("c_custkey", "c_name", "c_nationkey"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(na.select("n_nationkey", "n_name")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                money_cents(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            ).alias("lost_revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )
    w = Window.orderBy(F.desc("lost_revenue_cents"), F.col("c_custkey"))
    return (
        agg.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 20)
        .drop("__rk")
    )
