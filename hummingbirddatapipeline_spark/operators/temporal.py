"""Generic temporal joins: as-of join and bounded range join.

The reference's temporal access pattern is "most recent record at or
before a point in time" (SURVEY.md W4; the reference computes it with a
per-entity scan in Hummingbird_Master_engine_990.py:1226-1236). These
operators generalize that to two-table form with Spark-first physical
plans:

- ``asof_join``: merge-join formulation — union both sides, one window
  shuffle on the join keys, running ``last(ignorenulls)`` carries the
  most recent right-side row forward. No inequality join condition ever
  reaches Catalyst, so the plan is O(n + m) with exactly one exchange;
  a naive ``l.ts >= r.ts`` join would plan BroadcastNestedLoopJoin.
- ``range_join``: bucketize to the window width and equi-join on
  (keys, bucket) with the right side exploded into its (at most 2)
  covering buckets, then re-check the exact bound. Catalyst plans a
  hash/sort-merge equi-join; fanout is a constant <= 2 regardless of
  data size.

Both scale linearly in input size and shuffle once on the join keys —
the property that matters at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _keys(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def _check_no_collision(left: DataFrame, names: Sequence[str]) -> None:
    clash = sorted(set(names) & set(left.columns))
    if clash:
        raise ValueError(
            f"right-side columns {clash} collide with left columns; "
            "rename them before the join"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Left as-of join: each left row picks the right row with the
    greatest ``right_ts`` <= its ``left_ts`` (inclusive), per key group.

    Returns all left columns plus ``right_ts`` and ``right_cols`` from
    the matched right row (null when no right row precedes). The right
    side must be unique per (keys, right_ts) — collapse ties upstream,
    otherwise which tied row wins is nondeterministic.

    Physical shape: one shuffle (window over the keys); state per
    partition is a single running struct, so memory is O(1) per row
    regardless of group size.
    """
    keys = _keys(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    _check_no_collision(left, [right_ts, *right_cols])

    payload = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    )
    l_ = (
        left.withColumn("__t", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn("__p", F.lit(None).cast(r.schema["__p"].dataType))
    )
    # right rows sort before left rows at the same timestamp, so the
    # match is at-or-before (inclusive), matching ASOF JOIN >= semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_.unionByName(r, allowMissingColumns=True)
        .withColumn("__lp", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col(f"__lp.{right_ts}").alias(right_ts))
    out_cols.extend(F.col(f"__lp.{c}").alias(c) for c in right_cols)
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Inner bounded range join: pairs where
    ``lower <= right_ts - left_ts <= upper`` within each key group.

    Returns all left columns plus ``right_ts`` and ``right_cols`` for
    every qualifying right row. Bounds are inclusive; ``upper`` must be
    >= ``lower``. Timestamps must be integral (epoch ms/us) with
    magnitude < 2**53 so bucket arithmetic is exact.

    Physical shape: the right side explodes into the <= 2 buckets of
    width (upper - lower) that its match window can overlap, then an
    ordinary equi-join on (keys, bucket) runs, then the exact bound
    filters. Constant fanout, hash-joinable — never a nested loop.
    """
    if upper < lower:
        raise ValueError(f"upper ({upper}) < lower ({lower})")
    keys = _keys(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    _check_no_collision(left, [right_ts, *right_cols])

    width = max(upper - lower, 1)
    # left_ts in [right_ts - upper, right_ts - lower]: an interval of
    # length (upper - lower), so it covers at most 2 width-sized buckets
    r = right.select(
        *keys,
        F.col(right_ts).alias("__rt"),
        *[F.col(c) for c in right_cols],
    ).withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("__rt") - upper) / width),
                    F.floor((F.col("__rt") - lower) / width),
                )
            )
        ),
    )
    l_ = left.withColumn("__bucket", F.floor(F.col(left_ts) / width))
    in_range = (F.col("__rt") - F.col(left_ts) >= lower) & (
        F.col("__rt") - F.col(left_ts) <= upper
    )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__rt").alias(right_ts))
    out_cols.extend(F.col(c) for c in right_cols)
    return l_.join(r, [*keys, "__bucket"], "inner").filter(in_range).select(*out_cols)


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an event stream into SCD Type-2 validity intervals —
    the slowly-changing-dimension build every warehouse runs to answer
    "what was this entity's attribute AT time t": consecutive rows with
    the same ``attr_col`` merge into one versioned interval
    (valid_from, valid_to], open-ended for the current value (Kimball's
    type-2 dimension; the gaps-and-islands formulation).

    Returns (key, attr, valid_from, valid_to, n_events, version,
    is_current) where valid_from/valid_to carry ``ts_col``'s values,
    valid_to is NULL on each key's live interval, and version numbers
    intervals 1..k in time order.

    Scale: every window and the segment aggregate partition on
    ``key_col`` alone, so Catalyst reuses ONE hash exchange for the
    change-flag window, the groupBy, and the lead/version window — the
    whole build is a single shuffle of (key, attr, ts, tiebreak)-width
    rows regardless of history depth. Ordering ties break on
    ``tiebreak_col`` so the segmentation is total-order deterministic.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(F.col(attr_col)).over(w)
    seg = F.sum(
        F.when(prev.isNull() | (prev != F.col(attr_col)), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    per_seg = (
        df.select(key_col, attr_col, ts_col, tiebreak_col)
        .withColumn("__seg", seg)
        .groupBy(key_col, "__seg")
        .agg(
            F.min(attr_col).alias(attr_col),
            F.min(ts_col).alias("valid_from"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    # order the interval chain by segment index, not valid_from: two
    # segments of one key can share a timestamp (same-ms flip-flop),
    # and __seg is the change-order total order by construction
    w2 = Window.partitionBy(key_col).orderBy("__seg")
    return (
        per_seg.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("version", F.row_number().over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__seg")
    )


def lttb_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    n_out: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013),
    parallel variant — the standard visually-faithful reduction of a
    huge time series to ``n_out`` points (dashboards over raw 100 TB
    telemetry): the series is split into n_out equal-count buckets and
    each bucket keeps the point forming the largest triangle with its
    NEIGHBOR BUCKET CENTROIDS.

    Faithful LTTB anchors the triangle on the previously SELECTED
    point, a sequential dependency across buckets that cannot be
    parallelized; this variant (the common distributed adaptation)
    uses the previous bucket's centroid instead — deterministic,
    embarrassingly parallel per key, and within a bucket-width of the
    sequential result. First and last points are always kept, matching
    the original algorithm.

    Scale shape: two keyed shuffles — one on ``key_col`` for the
    bucket-index window, one on (key, bucket) for the centroid
    aggregate (the measured plan; the tiny centroid frame then
    broadcasts back onto the points). The per-bucket argmax is
    ``max(struct(area, ts))`` — no per-bucket sort anywhere. Triangle
    areas are plain double arithmetic on (ts, value),
    engine-reproducible.
    """
    from pyspark.sql.window import Window

    # LTTB is only defined for >= 3 output points (first + last +
    # interior buckets); below that the interior bucket arithmetic
    # degenerates (n_out=2 floods bucket 0, n_out=1 yields bucket -1)
    # and would silently break the keep-first/keep-last invariant.
    if n_out < 3:
        raise ValueError(f"lttb_downsample: n_out must be >= 3, got {n_out}")
    tiebreak = tiebreak_col or ts_col
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak)
    cnt_w = Window.partitionBy(key_col)
    cols = list(dict.fromkeys([key_col, ts_col, value_col, tiebreak]))
    pts = (
        df.select(*cols)
        .withColumn("__rn", F.row_number().over(w) - 1)
        .withColumn("__n", F.count("*").over(cnt_w))
    )
    # bucket 0 = first point, bucket n_out-1 = last point, interior
    # points spread over buckets 1..n_out-2 by rank (equal-count)
    interior = F.floor(
        (F.col("__rn") - 1) * (n_out - 2) / (F.col("__n") - 2)
    ) + 1
    bucket = (
        F.when(F.col("__rn") == 0, 0)
        .when(F.col("__rn") == F.col("__n") - 1, n_out - 1)
        .otherwise(F.least(interior, F.lit(n_out - 2)))
    )
    pts = pts.withColumn("__b", bucket.cast("long"))
    cent = pts.groupBy(key_col, "__b").agg(
        F.avg(F.col(ts_col).cast("double")).alias("__cx"),
        F.avg(F.col(value_col).cast("double")).alias("__cy"),
    )
    wlag = Window.partitionBy(key_col).orderBy("__b")
    cent = cent.select(
        key_col,
        "__b",
        F.lag("__cx").over(wlag).alias("__px"),
        F.lag("__cy").over(wlag).alias("__py"),
        F.lead("__cx").over(wlag).alias("__nx"),
        F.lead("__cy").over(wlag).alias("__ny"),
    )
    joined = pts.join(cent, [key_col, "__b"])
    x = F.col(ts_col).cast("double")
    y = F.col(value_col).cast("double")
    area = F.abs(
        (F.col("__px") - F.col("__nx")) * (y - F.col("__py"))
        - (F.col("__px") - x) * (F.col("__ny") - F.col("__py"))
    )
    # endpoints (no both-side neighbors) keep themselves: area NULL ->
    # coalesce to 0 keeps the single point in buckets of size 1, and
    # buckets 0 / n_out-1 hold exactly the first/last point anyway.
    # The area is FLOOR-quantized at 6dp BEFORE the argmax: centroid
    # averages carry summation-order ulps between engines, and an
    # unrounded argmax would let an ulp flip which point a bucket
    # keeps; after quantization near-ties collapse to equal and the
    # (ts, value) tiebreak decides identically everywhere.
    q6 = lambda x: F.floor(x * 1000000 + 0.5) / 1000000  # noqa: E731
    pick = joined.withColumn(
        "__a", F.coalesce(q6(area), F.lit(0.0))
    ).groupBy(key_col, "__b")
    best = pick.agg(
        F.max(
            F.struct(
                F.col("__a").alias("a"),
                F.col(ts_col).alias("t"),
                F.col(value_col).alias("v"),
            )
        ).alias("__best")
    )
    return best.select(
        key_col,
        F.col("__b").alias("bucket"),
        F.col("__best.t").alias(ts_col),
        F.col("__best.v").alias(value_col),
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
    session_gap: int | None = None,
) -> DataFrame:
    """First-order (Markov) transition mining over an event stream:
    count consecutive (from_state -> to_state) pairs per entity, the
    feature behind next-event prediction, funnel diagnosis, and
    session-path analysis.

    With ``session_gap`` set, transitions never cross a gap larger
    than it (the sessionization rule): the pair is dropped when
    ``ts - prev_ts > session_gap``.

    Returns (from_state, to_state, n_transitions, p_transition) where
    p is the row-normalized probability P(to | from), rounded 6dp from
    exact BIGINT counts (identical division on any engine).

    Scale: one window shuffle on ``key_col`` (lag), one hash aggregate
    on the (from, to) pair, and a from-state total computed as a
    window sum over the (tiny) transition matrix itself — the event
    stream shuffles once.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev_state = F.lag(F.col(state_col)).over(w)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    pairs = (
        df.select(key_col, state_col, ts_col, tiebreak_col)
        .withColumn("from_state", prev_state)
        .withColumn("__gap", F.col(ts_col) - prev_ts)
        .filter(F.col("from_state").isNotNull())
    )
    if session_gap is not None:
        pairs = pairs.filter(F.col("__gap") <= session_gap)
    counts = pairs.groupBy(
        "from_state", F.col(state_col).alias("to_state")
    ).agg(F.count("*").alias("n_transitions"))
    wf = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wf).cast("double"),
            6,
        ).alias("p_transition"),
    )


def touch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    on: str,
    conv_ts: str,
    touch_ts: str,
    touch_id: str,
    lookback_ms: int,
    value_col: str | None = None,
) -> DataFrame:
    """First/last-touch attribution: each conversion is credited to the
    FIRST and LAST touch event inside its trailing lookback window
    ``(conv_ts - lookback_ms, conv_ts]`` — the marketing/funnel
    primitive behind "which click earned this purchase", with the
    50/50 first-last split when ``value_col`` is given.

    ``conversions`` must carry a unique ``conv_id`` column (the
    grouping key, so same-timestamp conversions never collapse).

    Plan: the bounded :func:`range_join` bucketization (right side
    exploded into its two covering buckets, hash equi-join on
    (entity, bucket), exact bound re-checked) feeds ONE per-conversion
    argmin/argmax (``min/max(struct(ts, touch_id))`` — no sort);
    conversions with no touch in the window survive with NULL touches
    via the left join back onto the conversion roster. Never an
    inequality join, so Catalyst plans hash joins at any scale.
    """
    from pyspark.sql import functions as F

    pairs = range_join(
        conversions,
        touches,
        on=on,
        left_ts=conv_ts,
        right_ts=touch_ts,
        lower=-(lookback_ms - 1),
        upper=0,
    )
    first = F.min(
        F.struct(F.col(touch_ts).alias("ts"), F.col(touch_id).alias("id"))
    )
    last = F.max(
        F.struct(F.col(touch_ts).alias("ts"), F.col(touch_id).alias("id"))
    )
    agg = pairs.groupBy("conv_id").agg(
        first.alias("__f"),
        last.alias("__l"),
        F.count("*").cast("long").alias("n_touches"),
    )
    conv_cols = [on, conv_ts] + ([value_col] if value_col else [])
    out = conversions.select("conv_id", *conv_cols).join(
        agg, "conv_id", "left"
    ).select(
        "conv_id",
        *conv_cols,
        F.coalesce("n_touches", F.lit(0).cast("long")).alias("n_touches"),
        F.col("__f.id").alias("first_touch_id"),
        F.col("__f.ts").alias("first_touch_ts"),
        F.col("__l.id").alias("last_touch_id"),
        F.col("__l.ts").alias("last_touch_ts"),
    )
    if value_col is not None:
        half = F.round(F.col(value_col) / 2.0, 6)
        out = out.withColumn(
            "first_touch_credit",
            F.when(F.col("first_touch_id").isNotNull(), half),
        ).withColumn(
            "last_touch_credit",
            F.when(F.col("last_touch_id").isNotNull(), half),
        )
    return out


def event_sequence_examples(
    events: DataFrame,
    history: int = 4,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Next-event-prediction training examples from an event log — the
    behavioral-model sibling of the text pipeline's packing rows:
    every event with at least ``history`` predecessors in its user's
    timeline becomes one supervised example (the last ``history``
    event types as input, the current type as target).

    Ordering is (ts, event_id) within each user — the id tiebreak
    makes simultaneous events deterministic. The input context is
    emitted as a '|'-joined STRING, not an array: window-ordered
    ``collect_list`` is frame-deterministic, and a string column
    hashes identically on both engines where array hashing is
    engine-specific (the winnowing lesson applied at design time).

    Returns (user, example_seq, input_types, target_type) with
    example_seq the 1-based per-user ordinal of the example.

    Scale shape: ONE user-keyed exchange shared by the history-frame
    window, the count guard, and the ordinal — event payloads never
    ride it (only the type column). At 100 TB this is the standard
    sessionized-features shape: sort within user partitions, emit
    fixed-width examples map-side.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    frame = w.rowsBetween(-history, -1)
    base = events.select(
        F.col(user_col),
        F.col(type_col),
        F.col(ts_col),
        F.col(id_col),
        F.array_join(
            F.collect_list(type_col).over(frame), "|"
        ).alias("input_types"),
        F.count("*").over(frame).alias("__hist"),
    ).filter(F.col("__hist") == history)
    wo = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    return base.select(
        F.col(user_col),
        F.row_number().over(wo).cast("long").alias("example_seq"),
        "input_types",
        F.col(type_col).alias("target_type"),
    )


def gap_report(
    events: DataFrame,
    min_gap_sec: int = 3600,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Islands-and-gaps: for every entity, the silences — consecutive-
    event gaps of at least ``min_gap_sec`` — as (key, gap_start_ms,
    gap_end_ms, gap_ms). The freshness/SLA primitive (where did the
    feed go quiet, per user/source/sensor) and the inverse of
    sessionization: a session CUT is exactly a reported gap, so this
    row also makes the session boundary rule independently auditable.

    Accepts ``ts`` either as the canonical epoch-nanos BIGINT
    (tables.load's events encoding) or as a TIMESTAMP; surfaces exact
    epoch-millisecond BIGINTs either way (the events family
    convention — raw timestamp hashing is engine-dependent). The ms
    reduction is INTEGER division (the _with_ts_ms lesson: float
    division of ~1.7e18 nanos exceeds double precision). The lag runs
    over the ts value alone: simultaneous events yield a 0 gap under
    any tie order, and every output column is a ts VALUE, so tie
    permutations cannot change the result set.

    Scale shape: ONE key-hash exchange feeds the lag window; the
    filter is map-side after it. Entities are independent —
    embarrassingly parallel; no join, no second shuffle.
    """
    from pyspark.sql.types import TimestampType

    if isinstance(events.schema[ts_col].dataType, TimestampType):
        ts_ms = F.unix_millis(F.col(ts_col))
    else:
        ts_ms = F.expr(f"CAST({ts_col} DIV 1000000 AS LONG)")
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev_ms = F.lag(ts_ms).over(w)
    return (
        events.select(key_col, ts_col)
        .withColumn("__prev_ms", prev_ms)
        .withColumn("gap_ms", (ts_ms - F.col("__prev_ms")).cast("long"))
        .filter(F.col("gap_ms") >= min_gap_sec * 1000)
        .select(
            key_col,
            F.col("__prev_ms").cast("long").alias("gap_start_ms"),
            ts_ms.cast("long").alias("gap_end_ms"),
            "gap_ms",
        )
    )
