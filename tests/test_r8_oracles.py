"""Differential (DuckDB) checks for the operators banked for round-8
catalog registration — rolling window features, quality-aware dedup
representatives, CDC changelog apply, contrastive negative sampling,
column-profile drift, and first/last-touch attribution — run on the
real testdata exactly the way the catalog oracle gate would, so next
round's registration is a window change, not new work. Each DuckDB
side is an independent formulation per the repo's differential rule."""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ("events", "orders", "lineitem", "documents", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )
    return con


def _norm(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                v.hex() if isinstance(v, float) and not math.isnan(v) else v
                for v in r
            )
        )
    return sorted(out, key=repr)


def test_rolling_window_stats_matches_duckdb(spark):
    from hummingbirddatapipeline_spark.operators.windows import (
        rolling_window_stats,
    )
    from hummingbirddatapipeline_spark.tables import load

    ev = load(spark, SF, "events").select(
        "event_id",
        "user_id",
        F.expr("CAST(ts DIV 1000000 AS LONG)").alias("ts_ms"),
        "value",
    )
    got = (
        rolling_window_stats(ev, "user_id", "ts_ms", 3_600_000, "value")
        .select("event_id", "user_id", "ts_ms", "n_in_window", "sum_in_window")
        .collect()
    )
    sql = """
    SELECT event_id, user_id, (epoch_ns(ts) // 1000000) AS ts_ms,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window,
           ROUND(SUM(value) OVER w, 6) AS sum_in_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY (epoch_ns(ts) // 1000000)
                 RANGE BETWEEN 3599999 PRECEDING AND CURRENT ROW)
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_representatives_by_score_matches_duckdb(spark):
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        DUCK_JACCARD_CC_CTES,
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.operators.graph import (
        dedup_representatives_by_score,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents").select("doc_id", "n_chars")
    pairs = shared_jaccard_pairs(spark, SF)
    got = dedup_representatives_by_score(
        docs, pairs, "doc_id", "n_chars"
    ).collect()
    sql = f"""
    WITH RECURSIVE {DUCK_JACCARD_CC_CTES},
    scored AS (
      SELECT c.node, c.cluster_id, d.n_chars
      FROM cc c JOIN documents d ON d.doc_id = c.node
    ),
    keepers AS (
      SELECT cluster_id, node AS keep FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
                   ORDER BY n_chars DESC, node) AS rk
        FROM scored) WHERE rk = 1
    ),
    losers AS (
      SELECT s.node FROM scored s JOIN keepers k USING (cluster_id)
      WHERE s.node <> k.keep
    )
    SELECT d.doc_id, d.n_chars FROM documents d
    WHERE d.doc_id NOT IN (SELECT node FROM losers)
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    assert len(got) > 0
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_apply_cdc_matches_duckdb(spark):
    """Synthetic changelog over orders: per customer a stream of
    (orderdate-ordered) changes; every 7th order is a delete
    tombstone. Current state = latest non-deleted change per key."""
    from hummingbirddatapipeline_spark.operators.merge import apply_cdc
    from hummingbirddatapipeline_spark.tables import load

    ch = load(spark, SF, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("string").alias("ts"),
        F.col("o_orderkey").alias("tb"),
        F.when(F.col("o_orderkey") % 7 == 0, "D").otherwise("U").alias("op"),
        F.col("o_totalprice").cast("double").alias("amount"),
        F.col("o_orderpriority").alias("prio"),
    )
    got = apply_cdc(ch, ["k"], "ts", "op", "tb").collect()
    sql = """
    WITH ch AS (
      SELECT o_custkey AS k, CAST(o_orderdate AS VARCHAR) AS ts,
             o_orderkey AS tb,
             CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
             CAST(o_totalprice AS DOUBLE) AS amount,
             o_orderpriority AS prio
      FROM orders
    ),
    w AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                                   ORDER BY ts DESC, tb DESC) AS rk
      FROM ch
    )
    SELECT k, ts, tb, amount, prio FROM w WHERE rk = 1 AND op <> 'D'
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    assert len(exp) > 0
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_contrastive_negatives_matches_duckdb(spark):
    from hummingbirddatapipeline_spark.operators.sampling import (
        contrastive_negatives,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents").select("doc_id")
    got = contrastive_negatives(docs, "doc_id", k=4, seed="r8").collect()
    sql = """
    WITH ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rnk,
             COUNT(*) OVER () AS n
      FROM documents
    ),
    draws AS (
      SELECT doc_id, rnk, n, UNNEST([1, 2, 3, 4]) AS neg_rank
      FROM ranked
    ),
    resolved AS (
      SELECT d.doc_id, d.neg_rank,
             CASE WHEN raw >= d.rnk THEN raw + 1 ELSE raw END AS tgt
      FROM (
        SELECT *,
               (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                     CAST(neg_rank AS VARCHAR) || ':r8'), 1, 13) AS BIGINT)
                % (n - 1)) + 1 AS raw
        FROM draws) d
    )
    SELECT r.doc_id, CAST(r.neg_rank AS INT) AS neg_rank,
           l.doc_id AS neg_id
    FROM resolved r JOIN ranked l ON l.rnk = r.tgt
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    rows = [tuple(r) for r in got]
    assert len(rows) == docs.count() * 4
    assert all(r[0] != r[2] for r in rows)  # never self
    assert _norm(rows) == _norm(exp)


def test_profile_compare_matches_duckdb(spark):
    from hummingbirddatapipeline_spark.operators.expectations import (
        profile_compare,
    )
    from hummingbirddatapipeline_spark.tables import load

    li = load(spark, SF, "lineitem")
    ref = li.filter(F.col("l_shipdate") < F.lit("1998-01-01"))
    cur = li.filter(F.col("l_shipdate") >= F.lit("1998-01-01"))
    got = profile_compare(
        ref, cur, ["l_quantity", "l_extendedprice", "l_discount"]
    ).collect()
    side = """
      SELECT '{c}' AS column_name,
             ROUND((COUNT(*) - COUNT({c})) / CAST(COUNT(*) AS DOUBLE), 6)
               AS {t}_null_rate,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {t}_n_distinct,
             CAST(MIN({c}) AS DOUBLE) AS {t}_min,
             CAST(MAX({c}) AS DOUBLE) AS {t}_max,
             ROUND(AVG({c}), 6) AS {t}_mean
      FROM lineitem WHERE l_shipdate {cmp} DATE '1998-01-01'
    """
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    r_side = " UNION ALL ".join(
        side.format(c=c, t="ref", cmp="<") for c in cols
    )
    c_side = " UNION ALL ".join(
        side.format(c=c, t="cur", cmp=">=") for c in cols
    )
    sql = f"""
    WITH r AS ({r_side}), c AS ({c_side})
    SELECT r.column_name, ref_null_rate, cur_null_rate,
           ROUND(cur_null_rate - ref_null_rate, 6) AS null_rate_delta,
           ref_n_distinct, cur_n_distinct,
           ref_min, cur_min, ref_max, cur_max, ref_mean, cur_mean,
           ROUND(cur_mean - ref_mean, 6) AS mean_delta
    FROM r JOIN c USING (column_name)
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    assert len(got) == 3
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_touch_attribution_matches_duckdb(spark):
    from hummingbirddatapipeline_spark.operators.temporal import (
        touch_attribution,
    )
    from hummingbirddatapipeline_spark.tables import load

    ev = load(spark, SF, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("CAST(ts DIV 1000000 AS LONG)").alias("ts_ms"),
        "value",
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts_ms").alias("conv_ts_ms"),
        F.round(F.col("value"), 6).alias("conv_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_ms").alias("click_ts_ms"),
        F.col("event_id").alias("click_id"),
    )
    got = touch_attribution(
        conv, clicks, "user_id", "conv_ts_ms", "click_ts_ms", "click_id",
        lookback_ms=86_400_000, value_col="conv_value",
    ).collect()
    sql = """
    WITH conv AS (
      SELECT event_id AS conv_id, user_id,
             (epoch_ns(ts) // 1000000) AS conv_ts_ms,
             ROUND(value, 6) AS conv_value
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, (epoch_ns(ts) // 1000000) AS click_ts_ms,
             event_id AS click_id
      FROM events WHERE event_type = 'click'
    ),
    pairs AS (
      SELECT c.conv_id, k.click_ts_ms, k.click_id
      FROM conv c JOIN clicks k
        ON k.user_id = c.user_id
       AND k.click_ts_ms > c.conv_ts_ms - 86400000
       AND k.click_ts_ms <= c.conv_ts_ms
    ),
    rk AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY conv_id
                                ORDER BY click_ts_ms, click_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY conv_id
                                ORDER BY click_ts_ms DESC, click_id DESC)
               AS rl
      FROM pairs
    ),
    agg AS (
      SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_touches,
             MAX(CASE WHEN rf = 1 THEN click_id END) AS first_touch_id,
             MAX(CASE WHEN rf = 1 THEN click_ts_ms END) AS first_touch_ts,
             MAX(CASE WHEN rl = 1 THEN click_id END) AS last_touch_id,
             MAX(CASE WHEN rl = 1 THEN click_ts_ms END) AS last_touch_ts
      FROM rk GROUP BY conv_id
    )
    SELECT c.conv_id, c.user_id, c.conv_ts_ms, c.conv_value,
           COALESCE(a.n_touches, 0) AS n_touches,
           a.first_touch_id, a.first_touch_ts,
           a.last_touch_id, a.last_touch_ts,
           CASE WHEN a.first_touch_id IS NOT NULL
                THEN ROUND(c.conv_value / 2.0, 6) END AS first_touch_credit,
           CASE WHEN a.last_touch_id IS NOT NULL
                THEN ROUND(c.conv_value / 2.0, 6) END AS last_touch_credit
    FROM conv c LEFT JOIN agg a USING (conv_id)
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    assert len(exp) > 0
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_quantile_transform_matches_duckdb(spark):
    from hummingbirddatapipeline_spark.operators.scale import (
        quantile_transform,
    )
    from hummingbirddatapipeline_spark.tables import load

    cust = load(spark, SF, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 11 == 0, None)
        .otherwise(F.col("c_acctbal").cast("double"))
        .alias("bal"),
    )
    got = quantile_transform(cust, "bal", "c_mktsegment").collect()
    sql = """
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 11 = 0 THEN NULL
                  ELSE CAST(c_acctbal AS DOUBLE) END AS bal
      FROM customer
    )
    SELECT c_custkey, c_mktsegment, bal,
           ROUND(PERCENT_RANK() OVER
                   (PARTITION BY c_mktsegment ORDER BY bal), 6) AS bal_qt
    FROM c WHERE bal IS NOT NULL
    UNION ALL
    SELECT c_custkey, c_mktsegment, bal, NULL AS bal_qt
    FROM c WHERE bal IS NULL
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_target_encode_matches_duckdb(spark):
    from hummingbirddatapipeline_spark.operators.scale import target_encode
    from hummingbirddatapipeline_spark.tables import load

    # binary label: order is URGENT-priority; category: order priority
    # month of orderdate as the (higher-cardinality) encoded feature
    ord_ = load(spark, SF, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("m"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    got = target_encode(ord_, "m", "y", alpha=20.0).collect()
    sql = """
    WITH o AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS m,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    g AS (SELECT CAST(SUM(y) AS DOUBLE) / COUNT(y) AS prior FROM o),
    p AS (
      SELECT m AS category, CAST(COUNT(y) AS BIGINT) AS n,
             CAST(SUM(y) AS DOUBLE) AS sum_label
      FROM o GROUP BY m
    )
    SELECT category, n, sum_label, ROUND(g.prior, 6) AS prior,
           ROUND((sum_label + 20.0 * g.prior) / (n + 20.0), 6) AS encoding
    FROM p CROSS JOIN g
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    assert len(exp) > 10
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_ivf_incremental_add_matches_duckdb(spark):
    """Assignment against a frozen quantizer: centroids computed once
    (KMeans over even vec_ids), injected as constants into BOTH
    engines, odd vec_ids assigned — DuckDB recomputes every argmax
    cosine from the same constants. Also pins the batch-vs-retrain
    contract: assignments of the ORIGINAL items under the frozen
    quantizer equal the index's own labels."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        ivf_incremental_add,
        ivf_index,
    )
    from hummingbirddatapipeline_spark.tables import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    indexed, centroids = ivf_index(base, n_centroids=4, seed=7)
    got = ivf_incremental_add(batch, centroids).select(
        "vec_id", "centroid_id", "centroid_sim"
    ).collect()

    cent_sql = ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]" for c in centroids
    )
    sql = f"""
    WITH cents AS (
      SELECT UNNEST(range(4)) AS cid,
             UNNEST([{cent_sql}]) AS cv
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             ROUND(
               list_sum(list_zip(e.embedding, c.cv)
                 .list_transform(p -> CAST(p[1] AS DOUBLE) * p[2]))
               / (sqrt(list_sum(e.embedding
                    .list_transform(x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(c.cv.list_transform(x -> x * x)))), 6)
               AS sim
      FROM (SELECT vec_id, embedding FROM embeddings
            WHERE vec_id % 2 = 1) e
      CROSS JOIN cents c
    ),
    best AS (
      SELECT vec_id, cid, sim, ROW_NUMBER() OVER
               (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
      FROM scored
    )
    SELECT vec_id, CAST(cid AS INT) AS centroid_id, sim AS centroid_sim
    FROM best WHERE rk = 1
    """
    con = _duck2()
    exp = con.sql(sql).fetchall()
    assert len(exp) > 0
    assert _norm([tuple(r) for r in got]) == _norm(exp)

    # frozen-quantizer consistency: re-assigning the indexed base
    # mostly reproduces the index's own labels — NOT exactly, by
    # design: KMeans assigns by euclidean distance, the probe metric
    # (here and in ivf_topk/_nearest_centroids) is cosine, and the
    # synthetic vectors are unnormalized, so a small boundary band
    # legitimately flips (measured ~2.5%). The DuckDB differential
    # above is the exact gate for the operator itself.
    re_assigned = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_incremental_add(base, centroids).collect()
    }
    own = {r["vec_id"]: r["centroid_id"] for r in indexed.collect()}
    agree = sum(1 for k in own if own[k] == re_assigned[k])
    assert agree / len(own) >= 0.9


def _duck2():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'embeddings.parquet')}')"
    )
    return con


def _pagerank_unrolled_sql(cc_ctes: str, n_iter: int, dp: int) -> str:
    """Chained-CTE unroll of the fixed-iteration PageRank recurrence
    (standard SQL forbids aggregation in a recursive term, so the
    oracle unrolls): same symmetrized edges, same per-term and
    per-iteration rounding as the Spark operator."""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f"""
    pr{k} AS (
      SELECT n.node,
             ROUND((1.0 - 0.85) / nn.c
                   + 0.85 * COALESCE(s.inc, 0.0), {dp}) AS score
      FROM nodes n CROSS JOIN nn LEFT JOIN (
        SELECT e.v AS node, SUM(ROUND(p.score / d.d, {dp + 3})) AS inc
        FROM pr{k - 1} p
        JOIN edges2 e ON e.u = p.node
        JOIN deg d ON d.u = e.u
        GROUP BY e.v
      ) s ON s.node = n.node
    )""")
    return f"""
    WITH RECURSIVE {cc_ctes},
    edges2 AS (
      SELECT id_a AS u, id_b AS v FROM near
      UNION SELECT id_b, id_a FROM near
    ),
    nodes AS (
      SELECT DISTINCT x AS node FROM (
        SELECT id_a AS x FROM near UNION ALL SELECT id_b FROM near)
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM nodes),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM edges2 GROUP BY u),
    pr0 AS (
      SELECT node, ROUND(1.0 / nn.c, {dp}) AS score
      FROM nodes CROSS JOIN nn
    ),{",".join(steps)}
    SELECT node, score AS pagerank FROM pr{n_iter}
    """


def test_pagerank_matches_duckdb_unrolled(spark):
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        DUCK_JACCARD_CC_CTES,
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.operators.graph import pagerank

    pairs = shared_jaccard_pairs(spark, SF)
    got = pagerank(pairs, n_iter=10).collect()
    sql = _pagerank_unrolled_sql(DUCK_JACCARD_CC_CTES, 10, 12)
    con = _duck()
    exp = con.sql(sql).fetchall()
    assert len(exp) > 0
    # scores form a distribution over edge-connected nodes
    total = sum(r["pagerank"] for r in got)
    n_isolated = len([r for r in got if r["pagerank"] is None])
    assert n_isolated == 0
    assert 0.5 < total <= 1.000001
    assert _norm([tuple(r) for r in got]) == _norm(exp)
