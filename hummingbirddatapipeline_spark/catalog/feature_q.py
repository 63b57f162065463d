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


@query(
    "feature_profile_drift",
    oracle="""
    WITH r AS (
      SELECT * FROM (
        SELECT 'l_quantity' AS column_name,
               ROUND((COUNT(*) - COUNT(l_quantity)) / CAST(COUNT(*) AS DOUBLE), 6) AS ref_null_rate,
               CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS ref_n_distinct,
               CAST(MIN(l_quantity) AS DOUBLE) AS ref_min,
               CAST(MAX(l_quantity) AS DOUBLE) AS ref_max,
               ROUND(AVG(l_quantity), 6) AS ref_mean
        FROM lineitem WHERE l_shipdate < DATE '1998-01-01'
        UNION ALL
        SELECT 'l_extendedprice',
               ROUND((COUNT(*) - COUNT(l_extendedprice)) / CAST(COUNT(*) AS DOUBLE), 6),
               CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
               CAST(MIN(l_extendedprice) AS DOUBLE),
               CAST(MAX(l_extendedprice) AS DOUBLE),
               ROUND(AVG(l_extendedprice), 6)
        FROM lineitem WHERE l_shipdate < DATE '1998-01-01'
        UNION ALL
        SELECT 'l_discount',
               ROUND((COUNT(*) - COUNT(l_discount)) / CAST(COUNT(*) AS DOUBLE), 6),
               CAST(COUNT(DISTINCT l_discount) AS BIGINT),
               CAST(MIN(l_discount) AS DOUBLE),
               CAST(MAX(l_discount) AS DOUBLE),
               ROUND(AVG(l_discount), 6)
        FROM lineitem WHERE l_shipdate < DATE '1998-01-01'
      )
    ),
    c AS (
      SELECT * FROM (
        SELECT 'l_quantity' AS column_name,
               ROUND((COUNT(*) - COUNT(l_quantity)) / CAST(COUNT(*) AS DOUBLE), 6) AS cur_null_rate,
               CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS cur_n_distinct,
               CAST(MIN(l_quantity) AS DOUBLE) AS cur_min,
               CAST(MAX(l_quantity) AS DOUBLE) AS cur_max,
               ROUND(AVG(l_quantity), 6) AS cur_mean
        FROM lineitem WHERE l_shipdate >= DATE '1998-01-01'
        UNION ALL
        SELECT 'l_extendedprice',
               ROUND((COUNT(*) - COUNT(l_extendedprice)) / CAST(COUNT(*) AS DOUBLE), 6),
               CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
               CAST(MIN(l_extendedprice) AS DOUBLE),
               CAST(MAX(l_extendedprice) AS DOUBLE),
               ROUND(AVG(l_extendedprice), 6)
        FROM lineitem WHERE l_shipdate >= DATE '1998-01-01'
        UNION ALL
        SELECT 'l_discount',
               ROUND((COUNT(*) - COUNT(l_discount)) / CAST(COUNT(*) AS DOUBLE), 6),
               CAST(COUNT(DISTINCT l_discount) AS BIGINT),
               CAST(MIN(l_discount) AS DOUBLE),
               CAST(MAX(l_discount) AS DOUBLE),
               ROUND(AVG(l_discount), 6)
        FROM lineitem WHERE l_shipdate >= DATE '1998-01-01'
      )
    )
    SELECT r.column_name, ref_null_rate, cur_null_rate,
           ROUND(cur_null_rate - ref_null_rate, 6) AS null_rate_delta,
           ref_n_distinct, cur_n_distinct,
           ref_min, cur_min, ref_max, cur_max, ref_mean, cur_mean,
           ROUND(cur_mean - ref_mean, 6) AS mean_delta
    FROM r JOIN c USING (column_name)
    ORDER BY column_name
    """,
)
def feature_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile drift report between the pre-1998 (training
    window) and 1998+ (serving window) lineitem snapshots: one row per
    profiled column with null rate / distinct count / min / max / 6dp
    mean per side plus deltas (operators/expectations.profile_compare).
    ONE aggregate pass per side computes every column simultaneously,
    then the two single-row frames unpivot and join — no per-column
    jobs; the oracle rebuilds each side with per-column aggregates and
    must agree on every stat bit-for-bit."""
    from hummingbirddatapipeline_spark.operators.expectations import (
        profile_compare,
    )

    li = load(spark, sf_dir, "lineitem")
    ref = li.filter(F.col("l_shipdate") < F.lit("1998-01-01"))
    cur = li.filter(F.col("l_shipdate") >= F.lit("1998-01-01"))
    return profile_compare(
        ref, cur, ["l_quantity", "l_extendedprice", "l_discount"]
    )


@query(
    "feature_quantile_transform",
    oracle="""
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
    ORDER BY c_custkey
    """,
)
def feature_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantile (percent-rank) scaling of customer balances per
    market segment, with every 11th balance deterministically NULLed so
    the NULL-exclusion contract is exercised: NULLs keep a NULL rank
    and never distort the CDF (operators/scale.quantile_transform).
    One shuffle on the group key for the rank window; ranks round 6dp
    from exact integers so both engines agree bit-for-bit."""
    from hummingbirddatapipeline_spark.operators.scale import (
        quantile_transform,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 11 == 0, None)
        .otherwise(F.col("c_acctbal").cast("double"))
        .alias("bal"),
    )
    return quantile_transform(cust, "bal", "c_mktsegment")


@query(
    "feature_target_encode",
    oracle="""
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
    ORDER BY category
    """,
)
def feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of order month against the is-URGENT
    label (operators/scale.target_encode, alpha=20): one hash aggregate
    per category plus a single-row global prior broadcast back — the
    tiny encoder table IS the persisted training artifact; serving
    broadcast-joins it onto the feature frame. Exact integer label
    sums; prior and encoding are single rounded divisions, so the
    oracle reproduces every encoding bit-for-bit."""
    from hummingbirddatapipeline_spark.operators.scale import target_encode

    ord_ = load(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("m"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    return target_encode(ord_, "m", "y", alpha=20.0)


def _hash_ngrams_sql(n_features: int = 256, use_bigrams: bool = True) -> str:
    """Independent DuckDB formulation of the hashing-trick n-gram
    featurizer (operators/evaluation.hash_ngram_features): re-derives
    the namespaced unigram/bigram stream from raw text and buckets
    with the repo's 52-bit-md5 content hash mod n_features — integer
    counts, engine-exact."""
    toks = (
        "list_filter(string_split_regex(lower(trim(text)), '\\s+'),"
        " t -> t <> '')"
    )
    big = f"""
      UNION ALL
      SELECT doc_id, '2:' || t[i + 1] || ' ' || t[i + 2] AS g
      FROM (SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2)""" if use_bigrams else ""
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, '1:' || unnest(t) AS g FROM toks
      {big}
    )
    SELECT doc_id,
           CAST('0x' || substr(md5(g), 1, 13) AS BIGINT)
             % {n_features} AS feature_idx,
           CAST(COUNT(*) AS BIGINT) AS count
    FROM grams GROUP BY 1, 2
    """


@query("feature_hash_ngrams", oracle=_hash_ngrams_sql(256, True))
def feature_hash_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick n-gram featurizer (Weinberger et al. 2009 — the
    fastText/VW feature layout; operators/evaluation.
    hash_ngram_features) under the full oracle gate: namespaced
    lowercase unigrams + bigrams bucket by 52-bit-md5 content hash mod
    256, per-(doc, bucket) exact counts — a fixed-width sparse feature
    table with NO vocabulary artifact to version or broadcast. Gram
    conservation (bucket counts sum to the exact token+bigram count)
    is pinned in tests/test_r17_oracles.py.

    Scale shape: gram generation and hashing are map-side; the single
    shuffle is the (doc, bucket) hash aggregate — featurizing 100 TB
    is one exchange of skinny integer rows, and the content-addressed
    buckets mean train- and serve-time features agree with no shared
    state."""
    from hummingbirddatapipeline_spark.operators.evaluation import (
        hash_ngram_features,
    )

    docs = load(spark, sf_dir, "documents", fanout=True).select("doc_id", "text")
    return hash_ngram_features(docs, n_features=256)


def _quantile_error_sql(n_bins: int = 4096) -> str:
    """Independent DuckDB formulation of the histogram-quantile error
    report (operators/scale.histogram_quantile_error): exact-cents
    values, integer equi-width binning, cumulative crossing-bin pick,
    in-bin rank interpolation, and the exact below-count rank check —
    every step pure BIGINT arithmetic, so both engines agree to the
    bit."""
    return f"""
    WITH vals AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem
    ),
    stats AS (
      SELECT MIN(v) AS mn, MAX(v) AS mx, CAST(COUNT(*) AS BIGINT) AS n
      FROM vals
    ),
    hist AS (
      SELECT ((v - mn) * {n_bins}) // (mx - mn + 1) AS bin,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM vals, stats GROUP BY 1
    ),
    cum AS (
      SELECT bin, c, CAST(SUM(c) OVER (ORDER BY bin) AS BIGINT) AS cum
      FROM hist
    ),
    qs(q_e6) AS (VALUES (CAST(500000 AS BIGINT)),
                        (CAST(900000 AS BIGINT)),
                        (CAST(990000 AS BIGINT))),
    t AS (
      SELECT q_e6, mn, n, (mx - mn + 1) AS span,
             (q_e6 * n + 999999) // 1000000 AS tgt
      FROM qs, stats
    ),
    pick AS (
      SELECT t.q_e6, t.n, t.tgt, t.mn, t.span, MIN(c.bin) AS bin
      FROM t JOIN cum c ON c.cum >= t.tgt
      GROUP BY 1, 2, 3, 4, 5
    ),
    est AS (
      SELECT p.q_e6, p.n,
             CAST(
               (p.mn + (p.bin * p.span) // {n_bins})
               + ((p.tgt - (c.cum - c.c) - 1)
                  * ((p.mn + ((p.bin + 1) * p.span) // {n_bins})
                     - (p.mn + (p.bin * p.span) // {n_bins})))
                 // c.c
               AS BIGINT) AS est_value
      FROM pick p JOIN cum c ON c.bin = p.bin
    ),
    below AS (
      SELECT e.q_e6, e.n, e.est_value,
             CAST(SUM(CASE WHEN v.v < e.est_value THEN 1 ELSE 0 END)
               AS BIGINT) AS n_below
      FROM vals v, est e
      GROUP BY 1, 2, 3
    )
    SELECT q_e6, est_value, n_below,
           CAST(ABS(((n_below * 1000000) // n) - q_e6) AS BIGINT)
             AS rank_err_e6
    FROM below
    ORDER BY q_e6
    """


@query("sketch_quantile_error", oracle=_quantile_error_sql(4096))
def sketch_quantile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile estimator with its exact rank error
    (operators/scale.histogram_quantile_error, 4096 bins over exact
    lineitem price cents) under the full oracle gate — the quantile
    member of the observe-don't-trust sketch family
    (sketch_countmin_error / sketch_hll_error / sketch_bloom_fpr):
    an exact distributed quantile needs a global range exchange, the
    100 TB path is a two-pass histogram, and this report quantifies
    what that trade costs in rank units (|true rank - q| in 1e-6) for
    p50/p90/p99 before any native approximate percentile is trusted.

    Scale shape: pass 1 = scalar min/max/count broadcast + map-side
    bin aggregate (<= 4096 rows); the crossing-bin pick and in-bin
    interpolation run on the bounded histogram; pass 2 = one
    conditional-count aggregate with the 3 estimate rows riding a
    broadcast. Three column-pruned scans of one BIGINT column BY
    DESIGN (stats, binning, verification) — nothing after the scans
    exceeds 4096 + 3 rows, and no step sorts the corpus."""
    from hummingbirddatapipeline_spark.operators.scale import (
        histogram_quantile_error,
    )

    li = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    return histogram_quantile_error(li, "cents", n_bins=4096)
