"""Event-stream catalog queries (batch form) over ``events``.

Event time is kept as integer epoch arithmetic (ts arrives as BIGINT
nanos — see tables.load) so results are timezone-proof and identical
across Spark and DuckDB. The streaming twins of these queries live in
hummingbirddatapipeline_spark/streaming/ (same logic over readStream;
SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.tables import load

_HOUR_MS = 3_600_000
_GAP_MS = 30 * 60 * 1000  # 30-minute session gap


def _with_ts_ms(df: DataFrame) -> DataFrame:
    # integer division: float division of epoch-nanos longs (~1.7e18)
    # exceeds double precision and can round a millisecond up
    return df.withColumn("ts_ms", F.expr("CAST(ts DIV 1000000 AS LONG)"))


# --------------------------------------------------------------------------
# Tumbling window aggregation (streaming capability, batch twin)
# --------------------------------------------------------------------------
@query(
    "events_hourly_tumbling",
    oracle=f"""
    SELECT ((epoch_ns(ts) // 1000000) // {_HOUR_MS}) * {_HOUR_MS} AS hour_start_ms,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0, 2) AS total_value,
           FLOOR(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 / COUNT(*)
                 * 10000 + 0.5) / 10000 AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start_ms, event_type
    """,
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _with_ts_ms(load(spark, sf_dir, "events"))
    # value has 2dp; summing exact integer cents makes the aggregate
    # order-independent (float sums can flip a rounding boundary).
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.withColumn(
            "hour_start_ms",
            (F.floor(F.col("ts_ms") / _HOUR_MS) * _HOUR_MS).cast("long"),
        )
        .groupBy("hour_start_ms", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(cents) / 100.0, 2).alias("total_value"),
            (
                F.floor(F.sum(cents) / 100.0 / F.count("*") * 10000 + 0.5) / 10000
            ).alias("avg_value"),
        )
    )


# --------------------------------------------------------------------------
# Sessionization: 30-min-gap sessions via lag + running sum (batch form
# of session_window; the reference's nearest analogue is the resumable
# incremental scraper contract, SURVEY.md §2.10)
# --------------------------------------------------------------------------
@query(
    "events_sessionization",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, (epoch_ns(ts) // 1000000) AS ts_ms,
             CASE WHEN (epoch_ns(ts) // 1000000) - LAG((epoch_ns(ts) // 1000000)) OVER w > {_GAP_MS}
                  OR LAG((epoch_ns(ts) // 1000000)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY (epoch_ns(ts) // 1000000), event_id)
    ),
    sess AS (
      SELECT user_id, ts_ms,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts_ms
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events,
             MAX(ts_ms) - MIN(ts_ms) AS duration_ms
      FROM sess GROUP BY 1, 2
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           ROUND(AVG(n_events), 4) AS avg_events_per_session,
           ROUND(AVG(duration_ms) / 1000.0, 2) AS avg_duration_sec,
           MAX(n_events) AS max_session_events
    FROM per_session GROUP BY user_id ORDER BY user_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _with_ts_ms(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.withColumn(
        "new_sess",
        F.when(
            (F.col("ts_ms") - F.lag("ts_ms").over(w) > _GAP_MS)
            | F.lag("ts_ms").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn("session_id", F.sum("new_sess").over(wrun))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
            F.round(F.avg("duration_ms") / 1000.0, 2).alias("avg_duration_sec"),
            F.max("n_events").alias("max_session_events"),
        )
    )


# --------------------------------------------------------------------------
# JSON property extraction (MapType/JSON handling, SURVEY.md §1.2)
# --------------------------------------------------------------------------
@query(
    "events_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )


# --------------------------------------------------------------------------
# Stateful dedup (batch twin of dropDuplicatesWithinWatermark): first
# event per (user_id, event_type) in event-time order
# --------------------------------------------------------------------------
@query(
    "events_first_per_user_type",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           (epoch_ns(ts) // 1000000) AS first_ts_ms
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type
        ORDER BY (epoch_ns(ts) // 1000000), event_id) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def events_first_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _with_ts_ms(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_ms", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts_ms").alias("first_ts_ms"),
        )
    )


# --------------------------------------------------------------------------
# Sliding windows (3h window / 1h slide): each event lands in 3 windows
# --------------------------------------------------------------------------
@query(
    "events_sliding_3h1h",
    oracle=f"""
    WITH expanded AS (
      SELECT event_type,
             (((epoch_ns(ts) // 1000000) // {_HOUR_MS}) - UNNEST(range(3))) * {_HOUR_MS}
               AS window_start_ms
      FROM events
    )
    SELECT window_start_ms, event_type, COUNT(*) AS n_events
    FROM expanded
    GROUP BY 1, 2
    ORDER BY window_start_ms, event_type
    """,
)
def events_sliding_3h1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows via F.window(ts, '3 hours', '1 hour')
    — the multi-assignment the oracle reproduces by expanding each
    event into its 3 containing windows."""
    ev = load(spark, sf_dir, "events")
    t = F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
    return (
        ev.groupBy(
            F.window(t, "3 hours", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.expr("CAST(w.start AS LONG) * 1000").alias("window_start_ms"),
            "event_type",
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Sketches (A2 at scale): HLL distinct + t-digest quantiles. Sketch
# internals are engine-specific, so these are rows-only; tolerance vs
# the exact answers is asserted in tests/.
# --------------------------------------------------------------------------
@query(
    "sketch_approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact_users,
           COUNT(*) AS n_events,
           TRUE AS hll_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def sketch_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=2%) per event type —
    the constant-memory form of A2 for 100 TB cardinalities — as a
    TOLERANCE CONTRACT: the exact distinct count (computed by both
    engines, hash-compared) rides alongside a ``hll_within_5pct`` flag
    that goes driver-red if the sketch drifts beyond 5% of exact. HLL++
    is hash-deterministic, so the flag is stable on fixed data."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "n_exact_users",
            "n_events",
            (
                F.abs(F.col("approx_users") - F.col("n_exact_users"))
                <= 0.05 * F.col("n_exact_users")
            ).alias("hll_within_5pct"),
        )
    )


@query(
    "sketch_value_quantiles",
    oracle="""
    SELECT event_type,
           COUNT(value) AS n_values,
           CAST(ROUND(MIN(value) * 100) AS BIGINT) AS min_cents,
           CAST(ROUND(MAX(value) * 100) AS BIGINT) AS max_cents,
           TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch per type as a RANK-TOLERANCE CONTRACT:
    the sketch's estimate must land between the exact percentiles at
    p-1% and p+1% of rank (the correct error model for a mergeable
    quantile summary — value-space tolerance is meaningless in sparse
    tails). Exact extrema in integer cents ride along so both engines
    verify real data. The sketch estimate itself is engine-specific
    and never hashed."""
    ev = load(spark, sf_dir, "events")
    ps = (0.5, 0.95, 0.99)
    lo = [max(p - 0.01, 0.0) for p in ps]
    hi = [min(p + 0.01, 1.0) for p in ps]
    agg = ev.groupBy("event_type").agg(
        F.count("value").alias("n_values"),
        F.round(F.min("value") * 100).cast("long").alias("min_cents"),
        F.round(F.max("value") * 100).cast("long").alias("max_cents"),
        F.expr(
            f"approx_percentile(value, array{ps}, 10000)"
        ).alias("qa"),
        F.expr(f"percentile(value, array{tuple(lo)})").alias("qlo"),
        F.expr(f"percentile(value, array{tuple(hi)})").alias("qhi"),
    )
    ok = lambda i: (  # noqa: E731
        (F.col("qa")[i] >= F.col("qlo")[i] - 1e-9)
        & (F.col("qa")[i] <= F.col("qhi")[i] + 1e-9)
    )
    return agg.select(
        "event_type",
        "n_values",
        "min_cents",
        "max_cents",
        ok(0).alias("p50_ok"),
        ok(1).alias("p95_ok"),
        ok(2).alias("p99_ok"),
    )


@query(
    "sketch_topk_heavy_hitters",
    oracle="""
    WITH counts AS (
      SELECT event_type, user_id, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, user_id, n_events,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY n_events DESC, user_id) AS rk
      FROM counts
    )
    SELECT event_type, user_id, n_events, rk
    FROM ranked WHERE rk <= 5
    ORDER BY event_type, rk
    """,
)
def sketch_topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the MERGEABLE approx_top_k sketch family:
    per-partition-group accumulate -> combine -> estimate — the exact
    shape a 1000-executor deployment uses (each executor builds a
    bounded sketch; only sketches shuffle, never raw keys). The stream
    is split on event_id parity to force a real combine step. With key
    cardinality below maxItemsTracked the sketch is EXACT, so this
    query sits under the full oracle gate (ties re-ranked
    deterministically by user_id); above it, the same plan degrades
    gracefully to approximate — that property is the point.
    """
    ev = load(spark, sf_dir, "events").withColumn(
        "half", F.pmod(F.col("event_id"), F.lit(2))
    )
    sk = ev.groupBy("event_type", "half").agg(
        F.expr("approx_top_k_accumulate(user_id, 10000)").alias("sk")
    )
    merged = sk.groupBy("event_type").agg(
        F.expr("approx_top_k_combine(sk, 10000)").alias("sk")
    )
    est = merged.select(
        "event_type",
        F.explode(F.expr("approx_top_k_estimate(sk, 10000)")).alias("e"),
    ).select(
        "event_type",
        F.col("e.item").alias("user_id"),
        F.col("e.count").alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n_events").desc(), F.col("user_id")
    )
    return (
        est.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )


# --------------------------------------------------------------------------
# Cohort retention (warehouse analytics over the events stream)
# --------------------------------------------------------------------------
_WEEK_MS = 7 * 86_400_000


@query(
    "events_cohort_retention",
    oracle=f"""
    WITH e AS (
      SELECT user_id,
             (epoch_ns(ts) // 1000000) // {_WEEK_MS} AS wk
      FROM events
    ),
    firstw AS (
      SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_wk, e.wk - f.cohort_wk AS weeks_since
      FROM e JOIN firstw f USING (user_id)
    )
    SELECT cohort_wk, weeks_since, COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_wk, weeks_since
    ORDER BY cohort_wk, weeks_since
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week, each
    cell counts users from that cohort active N weeks later.

    Scale shape: one shuffle on user_id computes first-seen weeks AND
    feeds the per-user activity join (same key), then one aggregation
    over (cohort, offset) cells — the output is tiny regardless of
    corpus size. Pure integer week arithmetic, so the oracle is exact.
    """
    ev = _with_ts_ms(load(spark, sf_dir, "events"))
    e = ev.select(
        "user_id", F.expr(f"CAST(ts_ms DIV {_WEEK_MS} AS LONG)").alias("wk")
    )
    firstw = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    activity = (
        e.join(firstw, "user_id")
        .select(
            "user_id",
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).alias("weeks_since"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_wk", "weeks_since")
        .agg(F.count("*").alias("n_active_users"))
    )


# --------------------------------------------------------------------------
# Ordered funnel conversion (view -> click -> purchase)
# --------------------------------------------------------------------------
@query(
    "events_funnel_conversion",
    oracle="""
    WITH stamped AS (
      SELECT user_id, event_type, (epoch_ns(ts) // 1000000) AS ts_ms,
             event_id
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts_ms END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts_ms END) AS t_click_any,
             MIN(CASE WHEN event_type = 'purchase' THEN ts_ms END) AS t_purchase_any
      FROM stamped GROUP BY user_id
    ),
    staged AS (
      SELECT p.user_id, p.t_view,
             (SELECT MIN(s.ts_ms) FROM stamped s
              WHERE s.user_id = p.user_id AND s.event_type = 'click'
                AND s.ts_ms >= p.t_view) AS t_click
      FROM per_user p
    ),
    staged2 AS (
      SELECT g.user_id, g.t_view, g.t_click,
             (SELECT MIN(s.ts_ms) FROM stamped s
              WHERE s.user_id = g.user_id AND s.event_type = 'purchase'
                AND s.ts_ms >= g.t_click) AS t_purchase
      FROM staged g
    )
    SELECT COUNT(t_view) AS n_view,
           COUNT(t_click) AS n_view_click,
           COUNT(t_purchase) AS n_view_click_purchase
    FROM staged2
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: per user, first 'view', then the first 'click'
    at-or-after it, then the first 'purchase' at-or-after that; the
    output counts survivors of each stage.

    Spark form: one shuffle on user_id, conditional min-aggregations
    per stage (two passes of per-user conditional MIN, no self-joins —
    the correlated subqueries in the oracle are DuckDB's phrasing of
    the same staged minimum)."""
    ev = _with_ts_ms(load(spark, sf_dir, "events")).filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts_ms")))
    per_user = ev.groupBy("user_id").agg(t_view.alias("t_view"))
    staged = (
        ev.join(per_user, "user_id")
        .groupBy("user_id", "t_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_ms") >= F.col("t_view")),
                    F.col("ts_ms"),
                )
            ).alias("t_click")
        )
    )
    staged2 = (
        ev.join(staged, "user_id")
        .groupBy("user_id", "t_view", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_ms") >= F.col("t_click")),
                    F.col("ts_ms"),
                )
            ).alias("t_purchase")
        )
    )
    return staged2.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_view_click_purchase"),
    )


# --------------------------------------------------------------------------
# Incremental rollup maintenance: history rollup + delta partition
# merged on partial states must equal the from-scratch rollup
# --------------------------------------------------------------------------
@query(
    "events_incremental_rollup",
    oracle=f"""
    SELECT ((epoch_ns(ts) // 1000000) // {_HOUR_MS}) * {_HOUR_MS} AS hour_start_ms,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start_ms, event_type
    """,
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ETL correctness under the oracle gate: the stream is
    split deterministically into 'history' (event_id % 5 != 4) and a
    'delta' batch (% 5 == 4); each side is rolled up independently and
    folded together with merge_rollups on mergeable states (count +
    exact-cents sum). The oracle computes the rollup from scratch over
    everything — the hash passes only if merge(rollup(A), rollup(B)) ==
    rollup(A ∪ B) exactly. At 100 TB this is the nightly pattern:
    history never recomputes, only the delta is aggregated and merged."""
    from hummingbirddatapipeline_spark.operators.incremental import merge_rollups

    ev = _with_ts_ms(load(spark, sf_dir, "events"))
    cents = F.round(F.col("value") * 100).cast("long")
    prepared = ev.withColumn(
        "hour_start_ms",
        (F.floor(F.col("ts_ms") / _HOUR_MS) * _HOUR_MS).cast("long"),
    ).withColumn("cents", cents)

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("hour_start_ms", "event_type").agg(
            F.count("*").alias("n_events"),
            F.sum("cents").alias("total_cents"),
        )

    history = rollup(prepared.filter(F.pmod(F.col("event_id"), F.lit(5)) != 4))
    delta = rollup(prepared.filter(F.pmod(F.col("event_id"), F.lit(5)) == 4))
    merged = merge_rollups(
        history,
        delta,
        keys=("hour_start_ms", "event_type"),
        count_cols=("n_events",),
        sum_cols=("total_cents",),
    )
    return merged.select(
        "hour_start_ms", "event_type", "n_events", "total_cents"
    )


@query(
    "events_anomaly_zscore",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             ((epoch_ns(ts) // 1000000) // {_HOUR_MS}) * {_HOUR_MS}
               AS hour_start_ms,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             SUM(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) AS ss
      FROM hourly GROUP BY event_type
    ),
    scored AS (
      SELECT h.event_type, h.hour_start_ms, h.c,
             CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE) AS mean,
             sqrt(GREATEST(
               (s.ss - (CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE))
                        / CAST(s.n AS DOUBLE))
               / CAST(s.n - 1 AS DOUBLE), 0.0)) AS std
      FROM hourly h JOIN stats s USING (event_type)
      WHERE s.n > 1
    )
    SELECT event_type, hour_start_ms, c,
           CASE WHEN std = 0 THEN NULL
                ELSE ROUND((CAST(c AS DOUBLE) - mean) / std, 4) END AS z,
           CASE WHEN std = 0 THEN FALSE
                ELSE ABS(ROUND((CAST(c AS DOUBLE) - mean) / std, 4)) >= 3.0
                END AS anomalous
    FROM scored
    ORDER BY event_type, hour_start_ms
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection over the event stream — the
    observability query a pipeline runs on itself: hourly counts per
    event type, z-scored against that type's own distribution, flagged
    at |z| >= 3 (the classic three-sigma rule).

    Cross-engine determinism is the engineering point: built-in
    stddev aggregates (Welford single-pass vs two-pass) differ in last
    ulps between engines, so the variance is computed EXPLICITLY from
    exact integer sums — n, sum(c), sum(c^2) — with the identical
    division/multiplication order on both sides (c^2 summed as doubles,
    exact below 2^53; negative fp residue clamped at 0). One hourly
    hash aggregate, a per-type stats aggregate (handful of rows,
    broadcast back), zero windows.
    """
    ev = _with_ts_ms(load(spark, sf_dir, "events"))
    hourly = (
        ev.withColumn(
            "hour_start_ms",
            (F.col("ts_ms") - F.pmod("ts_ms", F.lit(_HOUR_MS))).cast("long"),
        )
        .groupBy("event_type", "hour_start_ms")
        .agg(F.count("*").alias("c"))
    )
    cd = F.col("c").cast("double")
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(cd * cd).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = F.greatest(
        (
            F.col("ss")
            - F.col("s").cast("double")
            * F.col("s").cast("double")
            / F.col("n").cast("double")
        )
        / (F.col("n") - 1).cast("double"),
        F.lit(0.0),
    )
    std = F.sqrt(var)
    z = F.round((cd - mean) / std, 4)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(F.col("n") > 1)
        .select(
            "event_type",
            "hour_start_ms",
            "c",
            F.when(std == 0, F.lit(None).cast("double")).otherwise(z).alias("z"),
            F.when(std == 0, F.lit(False))
            .otherwise(F.abs(z) >= 3.0)
            .alias("anomalous"),
        )
    )


@query(
    "events_decayed_activity",
    oracle="""
    WITH e AS (
      SELECT user_id, (epoch_ns(ts) // 1000000) AS ts_ms FROM events
    ),
    r AS (SELECT CAST(MAX(ts_ms) AS DOUBLE) AS ref FROM e)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(ts_ms) AS last_ts,
           ROUND(SUM(POWER(0.5, (r.ref - CAST(ts_ms AS DOUBLE))
                                 / 86400000.0)), 6) AS decayed_score
    FROM e CROSS JOIN r GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_decayed_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed per-user activity (1-day half-life,
    anchored on the corpus max timestamp so the score is data-derived
    and rerun-stable, never wall-clock) — the recency-weighted
    engagement feature feeding ranking and churn models. One scalar
    broadcast (the reference time) + one hash aggregate; the decay
    weight is plain double POW both engines evaluate identically,
    rounded 6dp before hashing."""
    from hummingbirddatapipeline_spark.operators.incremental import (
        decayed_activity,
    )

    ev = _with_ts_ms(load(spark, sf_dir, "events")).select("user_id", "ts_ms")
    return decayed_activity(ev, "user_id", "ts_ms", half_life=86_400_000.0)


# --------------------------------------------------------------------------
# Per-event trailing RANGE-frame features (feature-store shape)
# --------------------------------------------------------------------------
@query(
    "events_rolling_window_feats",
    oracle=f"""
    SELECT event_id, user_id, (epoch_ns(ts) // 1000000) AS ts_ms,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window,
           ROUND(SUM(value) OVER w, 6) AS sum_in_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY (epoch_ns(ts) // 1000000)
                 RANGE BETWEEN {_HOUR_MS - 1} PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def events_rolling_window_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour features — for every event, the user's
    event count and 6dp value sum in ``(ts - 1h, ts]`` as of that event
    (operators/windows.rolling_window_stats): the feature-store shape
    "activity in the last hour as of each interaction". ONE shuffle on
    user_id serves a native RANGE-frame window — no self-join, no
    explode; same-millisecond ties are mutually in-frame by RANGE
    semantics, which both engines define identically."""
    from hummingbirddatapipeline_spark.operators.windows import (
        rolling_window_stats,
    )

    ev = _with_ts_ms(load(spark, sf_dir, "events")).select(
        "event_id", "user_id", "ts_ms", "value"
    )
    return rolling_window_stats(
        ev, "user_id", "ts_ms", _HOUR_MS, "value"
    ).select("event_id", "user_id", "ts_ms", "n_in_window", "sum_in_window")


def _event_seq_sql(history: int = 4) -> str:
    """Independent DuckDB formulation of next-event training examples
    (operators/temporal.event_sequence_examples): window-ordered
    list() over the same (ts, event_id) frame, '|'-joined, with the
    full-history guard and the per-user example ordinal."""
    return f"""
    WITH base AS (
      SELECT user_id, event_type, ts, event_id,
             array_to_string(list(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {history} PRECEDING AND 1 PRECEDING), '|')
               AS input_types,
             COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {history} PRECEDING AND 1 PRECEDING)
               AS hist
      FROM events
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             AS example_seq,
           input_types,
           event_type AS target_type
    FROM base WHERE hist = {history}
    """


@query("events_sequence_examples", oracle=_event_seq_sql(4))
def events_sequence_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event-prediction training examples
    (operators/temporal.event_sequence_examples) under the full oracle
    gate — the event-log-to-sequence-model handoff: per user, every
    length-4 sliding window of event types becomes one (input
    sequence, target) example, ordered by (ts, event_type) so
    simultaneous events cannot flip examples between engines. Per-user
    example counts reconcile exactly with event counts (pinned in
    tests/test_r19_oracles.py).

    Scale shape: ONE user-keyed exchange feeds the ordering window and
    the 4-lag frame together — example generation is embarrassingly
    parallel across users, the sessionization geometry with a fixed
    history frame instead of gap cuts."""
    from hummingbirddatapipeline_spark.operators.temporal import (
        event_sequence_examples,
    )

    return event_sequence_examples(load(spark, sf_dir, "events"), history=4)


def _gap_report_sql(min_gap_sec: int = 3600) -> str:
    """Independent DuckDB formulation of the islands-and-gaps report
    (operators/temporal.gap_report): re-derives the per-user lag over
    epoch-ms and the threshold cut; all columns exact BIGINTs."""
    return f"""
    SELECT user_id,
           prev_ms AS gap_start_ms,
           ts_ms AS gap_end_ms,
           CAST(ts_ms - prev_ms AS BIGINT) AS gap_ms
    FROM (
      SELECT user_id,
             (epoch_ns(ts) // 1000000) AS ts_ms,
             LAG((epoch_ns(ts) // 1000000)) OVER (
               PARTITION BY user_id
               ORDER BY (epoch_ns(ts) // 1000000)) AS prev_ms
      FROM events
    )
    WHERE ts_ms - prev_ms >= {min_gap_sec} * 1000
    """


@query("events_gap_report", oracle=_gap_report_sql(3600))
def events_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Islands-and-gaps freshness report
    (operators/temporal.gap_report, min_gap_sec=3600) under the full
    oracle gate: per user, every silence >= 1h as (key, gap_start_ms,
    gap_end_ms, gap_ms) — the freshness/SLA primitive and the
    independent audit of sessionization cuts (a session boundary IS a
    reported gap). Accepts the canonical epoch-nanos BIGINT ts
    (tables.load) or TIMESTAMP; ms reduction by INTEGER division (the
    _with_ts_ms lesson). Tie-order safe: every output column is a ts
    VALUE, so simultaneous events cannot change the result set (pinned
    in tests/test_r25_oracles.py).

    Scale shape: ONE key exchange + lag window, zero joins
    (contract-pinned) — entities are independent, so the report is
    embarrassingly parallel."""
    from hummingbirddatapipeline_spark.operators.temporal import gap_report

    return gap_report(load(spark, sf_dir, "events"), min_gap_sec=3600)


def _mad_anomaly_sql(k: float = 3.0, key: str = "event_type") -> str:
    """Independent DuckDB formulation of the MAD hourly anomaly report
    (operators/windows.mad_anomaly_hours): re-derives hourly counts,
    per-key median and MAD (DuckDB median == Spark percentile(0.5),
    verified on even/odd counts), and the k*MAD flag cut. Default key
    is event_type: per-user hourly counts in this corpus are so sparse
    that every user's MAD is 0 and the report is vacuous; the
    event_type grain has real volume and real variation (89 anomalies
    at sf0.01, k=3)."""
    return f"""
    WITH hourly AS (
      SELECT {key},
             CAST((epoch_ns(ts) // 1000000) // 3600000 * 3600000
                  AS BIGINT) AS hour_ms,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT {key}, median(n_events) AS med FROM hourly GROUP BY 1
    ),
    withmed AS (
      SELECT h.*, m.med FROM hourly h JOIN med m USING ({key})
    ),
    mad AS (
      SELECT {key}, median(abs(n_events - med)) AS mad
      FROM withmed GROUP BY 1
    )
    SELECT w.{key}, w.hour_ms, w.n_events, w.med, d.mad,
           ROUND(abs(w.n_events - w.med), 6) AS deviation
    FROM withmed w JOIN mad d USING ({key})
    WHERE d.mad > 0 AND abs(w.n_events - w.med) > {k} * d.mad
    """


@query("events_mad_anomaly", oracle=_mad_anomaly_sql(3.0, "event_type"))
def events_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD hourly anomaly flags (operators/windows.
    mad_anomaly_hours, k=3) under the full oracle gate — the robust
    cousin of events_anomaly_zscore: a spike inflates a stddev and
    hides itself; it cannot move a median. Spark percentile(x, 0.5)
    == DuckDB median() bit-for-bit on integer counts (verified on
    even and odd cardinalities before the operator was written) —
    medians/MADs are exact half/quarter integers; MAD = 0 strata flag
    nothing by convention. Grain decision (recorded at banking): the
    per-USER hourly stream is measured-vacuous (every MAD 0 at every
    SF), so the row runs the event_type grain (~89 anomalies at
    sf0.01); the operator keeps key_col for per-entity use. The
    1/1/2/2/3/50 closed form is pinned in tests/test_r28_oracles.py.

    Scale shape: one hourly aggregate + one key-partitioned
    median/MAD window — two exchanges on the same key family,
    embarrassingly parallel across keys."""
    from hummingbirddatapipeline_spark.operators.windows import (
        mad_anomaly_hours,
    )

    ev = _with_ts_ms(load(spark, sf_dir, "events"))
    return mad_anomaly_hours(ev, k=3.0, key_col="event_type")
