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
    hourly_tumbling,
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
    return tumbling_to_batch(result).orderBy("hour_start_ms", "event_type")


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
        .orderBy("event_type")
    )
