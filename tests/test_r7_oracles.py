"""Differential (DuckDB) checks for the operators banked for round-7
catalog registration — LTTB downsampling and basket co-occurrence —
run on the real testdata exactly the way the catalog oracle gate
would, so next round's registration is a window change, not new work.
The DuckDB side is written in an independent formulation (self-join
pair-gen, window-rank argmax) per the repo's differential-test rule."""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
N_OUT = 12


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("events", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
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


def test_lttb_matches_duckdb_on_events(spark):
    from hummingbirddatapipeline_spark.operators.temporal import (
        lttb_downsample,
    )
    from hummingbirddatapipeline_spark.tables import load

    ev = load(spark, SF, "events").select(
        "event_type",
        F.expr("CAST(ts DIV 1000000 AS LONG)").alias("ts_ms"),
        "value",
        "event_id",
    )
    got = lttb_downsample(
        ev, "event_type", "ts_ms", "value", N_OUT, tiebreak_col="event_id"
    ).collect()
    sql = f"""
    WITH pts AS (
      SELECT event_type AS k, (epoch_ns(ts) // 1000000) AS t, value AS v,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY (epoch_ns(ts) // 1000000), event_id) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    bucketed AS (
      SELECT *, CAST(CASE WHEN rn = 0 THEN 0
                   WHEN rn = n - 1 THEN {N_OUT - 1}
                   ELSE LEAST(FLOOR((rn - 1) * {N_OUT - 2} / (n - 2)) + 1,
                              {N_OUT - 2}) END AS BIGINT) AS b
      FROM pts
    ),
    cent AS (
      SELECT k, b, AVG(CAST(t AS DOUBLE)) AS cx, AVG(CAST(v AS DOUBLE)) AS cy
      FROM bucketed GROUP BY k, b
    ),
    nbr AS (
      SELECT k, b,
             LAG(cx) OVER w AS px, LAG(cy) OVER w AS py,
             LEAD(cx) OVER w AS nx, LEAD(cy) OVER w AS ny
      FROM cent WINDOW w AS (PARTITION BY k ORDER BY b)
    ),
    scored AS (
      SELECT p.k, p.b, p.t, p.v,
             COALESCE(FLOOR(ABS((n.px - n.nx) * (CAST(p.v AS DOUBLE) - n.py)
                       - (n.px - CAST(p.t AS DOUBLE)) * (n.ny - n.py))
                      * 1000000 + 0.5) / 1000000, 0.0) AS a
      FROM bucketed p JOIN nbr n USING (k, b)
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY k, b
                                   ORDER BY a DESC, t DESC, v DESC) AS rk
      FROM scored
    )
    SELECT k AS event_type, b AS bucket, t AS ts_ms, v AS value
    FROM ranked WHERE rk = 1
    """
    con = _duck(SF)
    exp = con.sql(sql).fetchall()
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_cooccurrence_matches_duckdb_on_lineitem(spark):
    from hummingbirddatapipeline_spark.operators.association import (
        basket_cooccurrence,
    )
    from hummingbirddatapipeline_spark.tables import load

    li = load(spark, SF, "lineitem")
    got = basket_cooccurrence(
        li, "l_orderkey", "l_partkey", min_pair_count=2, max_basket=10
    ).collect()
    sql = """
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
    """
    con = _duck(SF)
    exp = con.sql(sql).fetchall()
    assert len(got) > 0
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_weighted_sample_matches_duckdb_on_documents(spark):
    from hummingbirddatapipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("wgt")
    )
    got = weighted_sample_topk(
        docs, "doc_id", "wgt", k=5, seed="r7", strata_col="lang"
    ).select("doc_id", "lang", "sample_rank").collect()
    sql = """
    WITH scored AS (
      SELECT doc_id, lang,
             -ln((CAST('0x' || substr(md5(CAST(doc_id AS STRING) || ':r7'),
                                      1, 13) AS BIGINT) + 0.5)
                 / 4503599627370496.0)
             / CAST(n_chars AS DOUBLE) AS rk
      FROM read_parquet('{sf}/documents.parquet')
      WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, lang,
           CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY rk, doc_id)
                AS INT) AS sample_rank
    FROM scored
    QUALIFY sample_rank <= 5
    """.format(sf=SF)
    con = duckdb.connect()
    exp = con.sql(sql).fetchall()
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_transition_counts_matches_duckdb_on_events(spark):
    from hummingbirddatapipeline_spark.operators.temporal import (
        transition_counts,
    )
    from hummingbirddatapipeline_spark.tables import load

    ev = load(spark, SF, "events").select(
        "user_id",
        "event_type",
        F.expr("CAST(ts DIV 1000000 AS LONG)").alias("ts_ms"),
        "event_id",
    )
    got = transition_counts(
        ev, "user_id", "event_type", "ts_ms", "event_id",
        session_gap=1_800_000,
    ).collect()
    sql = """
    WITH e AS (
      SELECT user_id, event_type, (epoch_ns(ts) // 1000000) AS ts_ms,
             event_id
      FROM events
    ),
    p AS (
      SELECT LAG(event_type) OVER w AS from_state, event_type AS to_state,
             ts_ms - LAG(ts_ms) OVER w AS gap
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
    ),
    c AS (
      SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
      FROM p WHERE from_state IS NOT NULL AND gap <= 1800000
      GROUP BY 1, 2
    )
    SELECT from_state, to_state, n AS n_transitions,
           ROUND(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY from_state) AS DOUBLE), 6)
             AS p_transition
    FROM c
    """
    con = _duck(SF)
    exp = con.sql(sql).fetchall()
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_triangle_counts_matches_duckdb_on_neardup_graph(spark):
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        DUCK_JACCARD_CC_CTES,
    )
    from hummingbirddatapipeline_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )
    from hummingbirddatapipeline_spark.operators.graph import triangle_counts
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents")
    pairs = jaccard_pairs_prefix(
        docs, "text", "doc_id", threshold=0.85, shingle_size=1
    ).select("id_a", "id_b")
    got = triangle_counts(pairs).collect()
    sql = f"""
    WITH RECURSIVE {DUCK_JACCARD_CC_CTES},
    tri AS (
      SELECT e1.id_a AS u, e1.id_b AS v, e2.id_b AS w
      FROM near e1
      JOIN near e2 ON e1.id_a = e2.id_a AND e1.id_b < e2.id_b
      JOIN near e3 ON e3.id_a = e1.id_b AND e3.id_b = e2.id_b
    ),
    pn AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest([u, v, w]) AS node FROM tri) GROUP BY node
    ),
    nodes AS (
      SELECT DISTINCT x AS node FROM (
        SELECT id_a AS x FROM near UNION ALL SELECT id_b FROM near)
    )
    SELECT node, COALESCE(pn.n, 0) AS n_triangles
    FROM nodes LEFT JOIN pn USING (node)
    """
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = con.sql(sql).fetchall()
    assert len(got) > 0
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_decayed_activity_matches_duckdb_on_events(spark):
    from hummingbirddatapipeline_spark.operators.incremental import (
        decayed_activity,
    )
    from hummingbirddatapipeline_spark.tables import load

    ev = load(spark, SF, "events").select(
        "user_id", F.expr("CAST(ts DIV 1000000 AS LONG)").alias("ts_ms")
    )
    got = decayed_activity(
        ev, "user_id", "ts_ms", half_life=86_400_000.0
    ).collect()
    sql = """
    WITH e AS (
      SELECT user_id, (epoch_ns(ts) // 1000000) AS ts_ms FROM events
    ),
    r AS (SELECT CAST(MAX(ts_ms) AS DOUBLE) AS ref FROM e)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(ts_ms) AS last_ts,
           ROUND(SUM(POWER(0.5, (r.ref - CAST(ts_ms AS DOUBLE))
                                 / 86400000.0)), 6) AS decayed_score
    FROM e CROSS JOIN r GROUP BY user_id
    """
    con = _duck(SF)
    exp = con.sql(sql).fetchall()
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_winsorize_matches_duckdb_on_orders(spark):
    from hummingbirddatapipeline_spark.operators.scale import winsorize
    from hummingbirddatapipeline_spark.tables import load

    ord_ = load(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    got = (
        winsorize(ord_, "o_totalprice", "o_orderpriority", 0.05, 0.95)
        .select(
            "o_orderkey", "o_orderpriority", "o_totalprice",
            "p_lo", "p_hi", "o_totalprice_winsorized",
        )
        .collect()
    )
    sql = """
    WITH b AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS p_lo,
             quantile_cont(o_totalprice, 0.95) AS p_hi
      FROM read_parquet('{sf}/orders.parquet') GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice, b.p_lo, b.p_hi,
           LEAST(GREATEST(o.o_totalprice, b.p_lo), b.p_hi)
             AS o_totalprice_winsorized
    FROM read_parquet('{sf}/orders.parquet') o JOIN b USING (o_orderpriority)
    """.format(sf=SF)
    con = duckdb.connect()
    exp = con.sql(sql).fetchall()
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_tfidf_cosine_pairs_matches_duckdb_on_documents(spark):
    from hummingbirddatapipeline_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents")
    got = tfidf_cosine_pairs(docs, "text", "doc_id", threshold=0.9).collect()
    sql = """
    WITH occ AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS t
      FROM documents
    ),
    tf AS (
      SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM occ GROUP BY doc_id, t
    ),
    dfreq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY t),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    weighted AS (
      SELECT tf.doc_id, tf.t,
             tf.tf * ln(nd.n_docs / CAST(d.df_t AS DOUBLE)) AS w
      FROM tf JOIN dfreq d USING (t) CROSS JOIN nd
    ),
    norms AS (
      SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM weighted GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS dot
      FROM weighted a JOIN weighted b
        ON a.t = b.t AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = id_a
    JOIN norms nb ON nb.doc_id = id_b
    WHERE ROUND(dot / (na.nrm * nb.nrm), 6) >= 0.9
    """
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = con.sql(sql).fetchall()
    assert len(exp) > 0
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_radius_join_matches_duckdb_on_synthetic_coords(spark):
    """Coordinates derive deterministically from customer/supplier keys
    (md5 52-bit uniforms, the sampling-family idiom), so both engines
    build identical geometry; the DuckDB side is a plain distance
    cross-filter — an independent formulation of the same join."""
    from hummingbirddatapipeline_spark.operators.geo import radius_join
    from hummingbirddatapipeline_spark.tables import load

    def coord(key, seed, lo, hi):
        h = F.substring(
            F.md5(F.concat(F.col(key).cast("string"), F.lit(":" + seed))),
            1, 13,
        )
        u = (F.conv(h, 16, 10).cast("long").cast("double") + 0.5) / float(
            1 << 52
        )
        return lo + u * (hi - lo)

    cust = load(spark, SF, "customer").select(
        F.col("c_custkey").alias("pid"),
        coord("c_custkey", "lat", 0.0, 0.5).alias("lat"),
        coord("c_custkey", "lon", 0.0, 0.5).alias("lon"),
    )
    supp = load(spark, SF, "supplier").select(
        F.col("s_suppkey").alias("qid"),
        coord("s_suppkey", "lat", 0.0, 0.5).alias("q_lat"),
        coord("s_suppkey", "lon", 0.0, 0.5).alias("q_lon"),
    )
    got = radius_join(cust, supp, 5000.0).select(
        "qid", "pid", "distance_m"
    ).collect()
    duck_coord = (
        "({lo} + ((CAST('0x' || substr(md5(CAST({k} AS STRING) || ':{s}'),"
        " 1, 13) AS BIGINT) + 0.5) / 4503599627370496.0) * ({hi} - {lo}))"
    )
    sql = f"""
    WITH c AS (
      SELECT c_custkey AS pid,
             {duck_coord.format(k='c_custkey', s='lat', lo=0.0, hi=0.5)} AS lat,
             {duck_coord.format(k='c_custkey', s='lon', lo=0.0, hi=0.5)} AS lon
      FROM read_parquet('{SF}/customer.parquet')
    ),
    s AS (
      SELECT s_suppkey AS qid,
             {duck_coord.format(k='s_suppkey', s='lat', lo=0.0, hi=0.5)} AS q_lat,
             {duck_coord.format(k='s_suppkey', s='lon', lo=0.0, hi=0.5)} AS q_lon
      FROM read_parquet('{SF}/supplier.parquet')
    ),
    d AS (
      SELECT s.qid, c.pid,
             ROUND(2.0 * 6371000.0 * asin(sqrt(
               sin((c.lat - s.q_lat) * pi() / 180.0 / 2)
                 * sin((c.lat - s.q_lat) * pi() / 180.0 / 2)
               + cos(s.q_lat * pi() / 180.0) * cos(c.lat * pi() / 180.0)
                 * sin((c.lon - s.q_lon) * pi() / 180.0 / 2)
                 * sin((c.lon - s.q_lon) * pi() / 180.0 / 2))), 0)
               AS distance_m
      FROM s CROSS JOIN c
    )
    SELECT qid, pid, distance_m FROM d WHERE distance_m <= 5000.0
    """
    con = duckdb.connect()
    exp = con.sql(sql).fetchall()
    assert len(exp) > 0
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_psi_drift_matches_duckdb_on_lineitem(spark):
    from hummingbirddatapipeline_spark.operators.scale import psi_drift
    from hummingbirddatapipeline_spark.tables import load

    li = load(spark, SF, "lineitem")
    ref = li.filter(F.col("l_shipdate") < F.lit("1995-01-01")).select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    cur = li.filter(F.col("l_shipdate") >= F.lit("1995-01-01")).select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    got = psi_drift(ref, cur, "v").collect()
    qs = ", ".join(str(i / 10) for i in range(1, 10))
    sql = f"""
    WITH r AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v
      FROM read_parquet('{SF}/lineitem.parquet')
      WHERE l_shipdate < DATE '1995-01-01'
    ),
    c AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v
      FROM read_parquet('{SF}/lineitem.parquet')
      WHERE l_shipdate >= DATE '1995-01-01'
    ),
    e AS (SELECT quantile_cont(v, [{qs}]) AS edges FROM r),
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
    """
    con = duckdb.connect()
    exp = con.sql(sql).fetchall()
    assert _norm([tuple(r) for r in got]) == _norm(exp)


def test_impute_median_matches_duckdb_on_customer(spark):
    from hummingbirddatapipeline_spark.operators.scale import impute_median
    from hummingbirddatapipeline_spark.tables import load

    # inject deterministic NULLs (every 7th customer) then impute per
    # market segment
    cust = load(spark, SF, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_acctbal").cast("double"))
        .alias("bal"),
    )
    got = impute_median(cust, "bal", "c_mktsegment").collect()
    sql = f"""
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE CAST(c_acctbal AS DOUBLE) END AS bal
      FROM read_parquet('{SF}/customer.parquet')
    ),
    m AS (
      SELECT c_mktsegment, quantile_cont(bal, 0.5) AS med
      FROM c GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment, c.bal,
           COALESCE(c.bal, m.med) AS bal_imputed,
           c.bal IS NULL AS bal_was_null
    FROM c JOIN m USING (c_mktsegment)
    """
    con = duckdb.connect()
    exp = con.sql(sql).fetchall()
    got_rows = [
        (r["c_custkey"], r["c_mktsegment"], r["bal"], r["bal_imputed"], r["bal_was_null"])
        for r in got
    ]
    assert _norm(got_rows) == _norm(exp)
