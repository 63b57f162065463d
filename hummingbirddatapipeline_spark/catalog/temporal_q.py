"""Temporal join operators: as-of join, bounded range join, hypertable
rollup.

The reference's only temporal pattern is "most recent year <= target"
(SURVEY.md W4, Hummingbird_Master_engine_990.py:1226-1236) — a
single-table as-of select. These queries generalize it to the two-table
forms a time-series store needs, built scale-first:

- as-of join: union + tag + running ``last()`` over one
  (entity, time)-ordered window — ONE shuffle, no inequality join, no
  per-row subquery. This is the merge-join formulation; it survives
  100 TB because state per partition is one row.
- bounded range join: bucketize both sides to the range width and
  equi-join on (entity, bucket) with the right side exploded into the
  two covering buckets, then filter the exact bound. Turns an O(n*m)
  inequality join into an equi-join Catalyst can shuffle-hash; bucket
  fanout is a constant 2.
- hypertable rollup: hour -> day -> week computed hierarchically (each
  grain re-aggregates the previous one, not the raw events), the
  continuous-aggregate pattern: the day pass reads 24x less input than
  a raw re-scan, week reads 7x less again. Exact because the measures
  (counts, integer-cent sums) are decomposable.

DuckDB oracles are written in independent form (native ASOF JOIN, plain
inequality join, direct per-grain GROUP BYs) so the differential check
exercises different algorithms, not the same plan twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.operators.temporal import (
    asof_join,
    lttb_downsample,
    range_join,
    transition_counts,
)
from hummingbirddatapipeline_spark.tables import load

_HOUR_MS = 3_600_000
_DAY_MS = 24 * _HOUR_MS
_WEEK_MS = 7 * _DAY_MS


def _ts_ms(df: DataFrame) -> DataFrame:
    # integer division of epoch-nanos longs; float division loses ms
    return df.withColumn("ts_ms", F.expr("CAST(ts DIV 1000000 AS LONG)"))


def _clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click events deduped to one row per (user_id, ts_ms).

    Both engines must agree on which click wins a same-millisecond tie,
    so ties collapse to MAX(event_id) before the join in BOTH forms.
    """
    ev = _ts_ms(load(spark, sf_dir, "events"))
    return (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_ms")
        .agg(F.max("event_id").alias("click_event_id"))
    )


def _purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ts_ms(load(spark, sf_dir, "events"))
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ms"
    )


# --------------------------------------------------------------------------
# As-of join: each purchase matched to the latest click at-or-before it
# --------------------------------------------------------------------------
@query(
    "asof_join_purchase_click",
    oracle="""
    WITH clicks AS (
      SELECT user_id, (epoch_ns(ts) // 1000000) AS ts_ms,
             MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    purch AS (
      SELECT event_id, user_id, (epoch_ns(ts) // 1000000) AS ts_ms
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_event_id,
           p.user_id,
           p.ts_ms AS purchase_ts_ms,
           c.ts_ms AS click_ts_ms,
           c.click_event_id,
           p.ts_ms - c.ts_ms AS ms_since_click
    FROM purch p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts_ms >= c.ts_ms
    ORDER BY purchase_event_id
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via operators.temporal.asof_join (union + running
    last() over one keyed window — one shuffle, inclusive >= match).
    The oracle uses DuckDB's native ASOF LEFT JOIN, so the differential
    check proves the operator against an independent implementation."""
    clicks = _clicks(spark, sf_dir).withColumnRenamed("ts_ms", "click_ts_ms")
    purch = _purchases(spark, sf_dir)
    return (
        asof_join(
            purch,
            clicks,
            on="user_id",
            left_ts="ts_ms",
            right_ts="click_ts_ms",
        )
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.col("ts_ms").alias("purchase_ts_ms"),
            "click_ts_ms",
            "click_event_id",
            (F.col("ts_ms") - F.col("click_ts_ms")).alias("ms_since_click"),
        )
    )


# --------------------------------------------------------------------------
# Bounded range join: clicks in the hour before each purchase
# --------------------------------------------------------------------------
@query(
    "range_join_clicks_before_purchase",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, (epoch_ns(ts) // 1000000) AS ts_ms,
             MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    purch AS (
      SELECT event_id, user_id, (epoch_ns(ts) // 1000000) AS ts_ms
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_event_id,
           p.user_id,
           p.ts_ms AS purchase_ts_ms,
           COUNT(c.ts_ms) AS n_clicks_prev_hour
    FROM purch p LEFT JOIN clicks c
      ON c.user_id = p.user_id
     AND c.ts_ms >= p.ts_ms - {_HOUR_MS}
     AND c.ts_ms <= p.ts_ms
    GROUP BY 1, 2, 3
    ORDER BY purchase_event_id
    """,
)
def range_join_clicks_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Range join by bucketization: right side exploded into its two
    covering 1-hour buckets, equi-join on (user_id, bucket), exact
    bound re-checked post-join. The inequality never reaches the join
    condition, so Catalyst plans a shuffle/broadcast HASH join instead
    of BroadcastNestedLoopJoin — the difference between O(n+m) and
    O(n*m) at 100 TB."""
    clicks = (
        _clicks(spark, sf_dir)
        .withColumn("b", F.floor(F.col("ts_ms") / _HOUR_MS))
        .withColumn("bucket", F.explode(F.array(F.col("b"), F.col("b") + 1)))
        .select("user_id", "bucket", F.col("ts_ms").alias("c_ts_ms"))
    )
    purch = _purchases(spark, sf_dir).withColumn(
        "bucket", F.floor(F.col("ts_ms") / _HOUR_MS)
    )
    in_range = (F.col("c_ts_ms") >= F.col("ts_ms") - _HOUR_MS) & (
        F.col("c_ts_ms") <= F.col("ts_ms")
    )
    return (
        purch.join(clicks, ["user_id", "bucket"], "left")
        .groupBy("event_id", "user_id", "ts_ms")
        .agg(F.count(F.when(in_range, F.lit(1))).alias("n_clicks_prev_hour"))
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.col("ts_ms").alias("purchase_ts_ms"),
            "n_clicks_prev_hour",
        )
    )


# --------------------------------------------------------------------------
# Hypertable rollup: hour -> day -> week hierarchical re-aggregation
# --------------------------------------------------------------------------
@query(
    "events_hypertable_rollup",
    oracle=f"""
    WITH base AS (
      SELECT (epoch_ns(ts) // 1000000) AS ts_ms, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT 'hour' AS grain,
           (ts_ms // {_HOUR_MS}) * {_HOUR_MS} AS bucket_start_ms,
           event_type, COUNT(*) AS n_events,
           ROUND(SUM(cents) / 100.0, 2) AS total_value
    FROM base GROUP BY 2, 3
    UNION ALL
    SELECT 'day', (ts_ms // {_DAY_MS}) * {_DAY_MS},
           event_type, COUNT(*), ROUND(SUM(cents) / 100.0, 2)
    FROM base GROUP BY 2, 3
    UNION ALL
    SELECT 'week', (ts_ms // {_WEEK_MS}) * {_WEEK_MS},
           event_type, COUNT(*), ROUND(SUM(cents) / 100.0, 2)
    FROM base GROUP BY 2, 3
    ORDER BY grain, bucket_start_ms, event_type
    """,
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup in ONE raw scan: hourly partial
    aggregate first (the only pass over raw events), then each hourly
    row explodes into its three (grain, bucket) assignments and a
    second aggregate folds them up. A naive per-grain UNION re-scans
    the events table three times (verified via .explain — Catalyst
    does not share scans across union branches without caching); this
    form scans once and its second shuffle reads 3x the HOURLY row
    count, which is ~events/24 at 100 TB. The oracle recomputes every
    grain straight from the events table, so the differential check
    proves hierarchical re-aggregation is exact. Measures are
    decomposable on purpose: COUNT and integer-cent SUM re-aggregate
    losslessly; non-decomposable measures (countDistinct) belong in
    sketch form (see sketch_approx_distinct_users) at this layer."""
    ev = _ts_ms(load(spark, sf_dir, "events"))
    hourly = (
        ev.withColumn("cents", F.round(F.col("value") * 100).cast("long"))
        .withColumn(
            "hour_ms",
            (F.floor(F.col("ts_ms") / _HOUR_MS) * _HOUR_MS).cast("long"),
        )
        .groupBy("hour_ms", "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("cents"))
    )

    def _bucket(width_ms: int):
        return (F.floor(F.col("hour_ms") / width_ms) * width_ms).cast("long")

    grains = F.array(
        F.struct(
            F.lit("hour").alias("grain"),
            F.col("hour_ms").alias("bucket_start_ms"),
        ),
        F.struct(
            F.lit("day").alias("grain"),
            _bucket(_DAY_MS).alias("bucket_start_ms"),
        ),
        F.struct(
            F.lit("week").alias("grain"),
            _bucket(_WEEK_MS).alias("bucket_start_ms"),
        ),
    )
    return (
        hourly.withColumn("g", F.explode(grains))
        .groupBy("g.grain", "g.bucket_start_ms", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("cents") / 100.0, 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Range-join pairs: the generic operator itself under the oracle gate
# --------------------------------------------------------------------------
@query(
    "range_join_pairs",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, (epoch_ns(ts) // 1000000) AS click_ts_ms,
             MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    purch AS (
      SELECT event_id, user_id, (epoch_ns(ts) // 1000000) AS ts_ms
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_event_id,
           p.user_id,
           p.ts_ms AS purchase_ts_ms,
           c.click_ts_ms,
           c.click_event_id
    FROM purch p JOIN clicks c
      ON c.user_id = p.user_id
     AND c.click_ts_ms >= p.ts_ms - {_HOUR_MS}
     AND c.click_ts_ms <= p.ts_ms
    ORDER BY purchase_event_id, click_event_id
    """,
)
def range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.temporal.range_join verified pairwise: the oracle is a
    plain inequality inner join, the Spark side is the bucketized
    equi-join operator — the differential check proves the
    bucketization emits exactly the in-range pairs, no dups, no gaps."""
    clicks = _clicks(spark, sf_dir).withColumnRenamed("ts_ms", "click_ts_ms")
    purch = _purchases(spark, sf_dir)
    return (
        range_join(
            purch,
            clicks,
            on="user_id",
            left_ts="ts_ms",
            right_ts="click_ts_ms",
            lower=-_HOUR_MS,
            upper=0,
        )
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.col("ts_ms").alias("purchase_ts_ms"),
            "click_ts_ms",
            "click_event_id",
        )
    )


@query(
    "scd2_user_event_history",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, (epoch_ns(ts) // 1000000) AS ts_ms,
             event_id
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN LAG(event_type) OVER w IS NULL
                       OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
    ),
    segged AS (
      SELECT *,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                            ROWS UNBOUNDED PRECEDING) AS seg
      FROM flagged
    ),
    per_seg AS (
      SELECT user_id, seg, MIN(event_type) AS event_type,
             CAST(MIN(ts_ms) AS BIGINT) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM segged GROUP BY user_id, seg
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER w2 AS valid_to, n_events,
           CAST(ROW_NUMBER() OVER w2 AS INT) AS version,
           LEAD(valid_from) OVER w2 IS NULL AS is_current
    FROM per_seg
    WINDOW w2 AS (PARTITION BY user_id ORDER BY seg)
    ORDER BY user_id, version
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from the event stream: each user's
    consecutive same-type runs collapse into versioned validity
    intervals (valid_from, valid_to], NULL-open on the current one —
    the warehouse pattern behind "what was the user's state at time
    t" as-of lookups. One shuffle on user_id serves the change-flag
    window, the segment aggregate, and the interval chain."""
    from hummingbirddatapipeline_spark.operators.temporal import scd2_history

    ev = _ts_ms(load(spark, sf_dir, "events"))
    return scd2_history(
        ev, "user_id", "event_type", "ts_ms", "event_id"
    ).select(
        "user_id",
        "event_type",
        "valid_from",
        "valid_to",
        "n_events",
        "version",
        "is_current",
    )


# --------------------------------------------------------------------------
# LTTB downsampling: visually-faithful reduction of per-type series
# --------------------------------------------------------------------------
_LTTB_N_OUT = 12


@query(
    "events_lttb_downsample",
    oracle=f"""
    WITH pts AS (
      SELECT event_type AS k, (epoch_ns(ts) // 1000000) AS t, value AS v,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY (epoch_ns(ts) // 1000000), event_id) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    bucketed AS (
      SELECT *, CAST(CASE WHEN rn = 0 THEN 0
                   WHEN rn = n - 1 THEN {_LTTB_N_OUT - 1}
                   ELSE LEAST(FLOOR((rn - 1) * {_LTTB_N_OUT - 2} / (n - 2)) + 1,
                              {_LTTB_N_OUT - 2}) END AS BIGINT) AS b
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
    ORDER BY event_type, bucket
    """,
)
def events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013,
    parallel centroid-anchored variant) of each event type's value
    series to 12 visually-faithful points — the dashboard reduction of
    raw 100 TB telemetry. Spark runs the one-shuffle windowed
    implementation (operators/temporal.lttb_downsample: bucket-index
    window + centroid aggregate + quantized-area argmax, all on one
    key exchange); DuckDB recomputes it as an independent
    window-rank-argmax formulation, so the differential proves bucket
    assignment, neighbor-centroid geometry, and tie-breaking agree."""
    ev = _ts_ms(load(spark, sf_dir, "events")).select(
        "event_type", "ts_ms", "value", "event_id"
    )
    return lttb_downsample(
        ev, "event_type", "ts_ms", "value", _LTTB_N_OUT,
        tiebreak_col="event_id",
    )


# --------------------------------------------------------------------------
# Markov transition mining over the event stream
# --------------------------------------------------------------------------
@query(
    "events_markov_transitions",
    oracle="""
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
    ORDER BY from_state, to_state
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences with a 30-minute session gap (transitions never cross a
    gap) — next-event prediction / funnel-diagnosis features. One
    shuffle on user_id feeds the lag window; the (from, to) count
    matrix is a tiny second aggregate. The oracle recomputes with
    DuckDB's own LAG windows."""
    ev = _ts_ms(load(spark, sf_dir, "events")).select(
        "user_id", "event_type", "ts_ms", "event_id"
    )
    return transition_counts(
        ev, "user_id", "event_type", "ts_ms", "event_id",
        session_gap=1_800_000,
    )


# --------------------------------------------------------------------------
# First/last-touch attribution over the bucketized range join
# --------------------------------------------------------------------------
@query(
    "events_touch_attribution",
    oracle=f"""
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
       AND k.click_ts_ms > c.conv_ts_ms - {_DAY_MS}
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
    ORDER BY conv_id
    """,
)
def events_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch conversion attribution
    (operators/temporal.touch_attribution): every purchase is credited
    to the first and last click in its trailing 24 h window, 50/50
    value split; purchases with no click survive with NULL touches.
    The bucketized range join keeps the inequality OUT of the join
    condition (hash equi-join on (user, day-bucket), exact bound
    re-checked), then ONE per-conversion argmin/argmax
    (min/max(struct(ts, id)) — no sort). DuckDB recomputes the pairs
    with a raw inequality join and row_number ranks."""
    from hummingbirddatapipeline_spark.operators.temporal import (
        touch_attribution,
    )

    ev = _ts_ms(load(spark, sf_dir, "events"))
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
    return touch_attribution(
        conv,
        clicks,
        "user_id",
        "conv_ts_ms",
        "click_ts_ms",
        "click_id",
        lookback_ms=_DAY_MS,
        value_col="conv_value",
    )
