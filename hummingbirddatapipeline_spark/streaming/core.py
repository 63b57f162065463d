"""Structured Streaming layer (SURVEY.md §2.10, §7 M7).

The reference's streaming story is an incremental, resumable scraper:
append-only sink, checkpoint file, anti-join resume
(chat_acreage_bot.py:816-837,793-801,891-895) and a re-runnable merge
contract (master_acreage_merge.py:5-12). Here that becomes real
Structured Streaming over the ``events`` table:

- file source + checkpointLocation  = the resume contract (S7)
- tumbling / session windows + watermark = the engine's event-time set
- dropDuplicatesWithinWatermark     = stateful dedup (J7/J8 done properly)
- foreachBatch + conditional upsert = the streaming merge sink

Every streaming aggregation here has a batch twin in
catalog/events_q.py; batch-stream parity is asserted in tests and the
streaming results themselves are DuckDB-verified through the catalog
(run with ``Trigger.AvailableNow`` into a memory sink, then read back).

Event time: ``ts`` arrives as TIMESTAMP_NTZ micros in the parquet and
is normalized to BIGINT epoch nanoseconds on read (same wall-clock
arithmetic as tables.load); ``event_time`` = exact integer-division
to microseconds cast to timestamp. Window arithmetic stays on epoch
integers end-to-end, so results are independent of the driver
session's timezone.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from hummingbirddatapipeline_spark.tables import _events_ts_to_nanos

# Fallback logical schema, used only when the source dir has no files
# to probe. The driver has regenerated testdata with a different
# ``ts`` physical encoding before (INT64 nanos -> NTZ micros, round 4);
# read_events_stream therefore derives the real schema from the parquet
# footers of the staged files (see ``_probe_schema``) instead of
# trusting this constant, and normalizes ``ts`` with the same
# encoding-dispatching logic as the batch path (tables.load).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),  # micros NTZ parquet encoding
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _probe_schema(spark: SparkSession, path: str) -> StructType | None:
    """Read the staged parquet footers (driver-side batch schema
    inference, no job) so the stream schema always matches the physical
    encoding actually on disk — batch and streaming cannot drift."""
    try:
        return spark.read.parquet(path).schema
    except Exception:  # empty staging dir: fall back to the constant
        return None


_STAGED_DIRS: dict[str, str] = {}


def stage_stream_dir(*files: str) -> str:
    """Spark's file stream source wants a directory; stage the given
    parquet file(s) into a temp dir via symlinks (cached per file set)."""
    key = "|".join(files)
    if key not in _STAGED_DIRS:
        d = tempfile.mkdtemp(prefix="sg_stream_src_")
        for f in files:
            os.symlink(os.path.abspath(f), os.path.join(d, os.path.basename(f)))
        _STAGED_DIRS[key] = d
    return _STAGED_DIRS[key]


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over events parquet (a file, glob, or dir).

    Adds ``event_time`` (exact micros-precision timestamp) and
    ``ts_ms`` (epoch millis) columns.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if not os.path.isdir(path):
        path = stage_stream_dir(path)
    reader = spark.readStream.schema(_probe_schema(spark, path) or EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path)
    # normalize to BIGINT epoch nanos first (wall clock == UTC; the
    # SAME encoding dispatch as tables.load, so batch and streaming
    # agree for any parquet encoding), then timestamp_micros -> an
    # absolute instant; all downstream windowing and epoch-integer
    # projections are session-TZ-independent
    stream = _events_ts_to_nanos(stream)
    return stream.withColumn(
        "event_time", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
    ).withColumn("ts_ms", F.expr("CAST(ts DIV 1000000 AS LONG)"))


def run_available_now(
    df: DataFrame,
    output_mode: str,
    checkpoint: str | None = None,
    name: str | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion (Trigger.AvailableNow)
    into a memory sink and return the materialized result.

    The checkpoint directory is the S7 resume contract: re-running with
    the same checkpoint processes only new files.
    """
    spark = df.sparkSession
    name = name or f"sg_mem_{uuid.uuid4().hex[:10]}"
    checkpoint = checkpoint or tempfile.mkdtemp(prefix="sg_ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def hourly_tumbling(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type: counts and
    exact-cents value sums (same arithmetic as the batch twin)."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        stream.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("value_cents"),
        )
    )


def tumbling_to_batch(result: DataFrame) -> DataFrame:
    """Project a finished tumbling aggregation to the TZ-proof epoch-ms
    shape shared with the batch twin / DuckDB oracle."""
    return result.select(
        F.expr("CAST(window.start AS LONG) * 1000").alias("hour_start_ms"),
        "event_type",
        "n_events",
        F.round(F.col("value_cents") / 100.0, 2).alias("total_value"),
    )


def sessionize(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: events whose gaps are < ``gap`` merge
    into one session (boundary: an event exactly ``gap`` later starts a
    new session)."""
    return (
        stream.withWatermark("event_time", "1 hour")
        .groupBy(F.session_window("event_time", gap), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
        )
    )


def sessions_to_user_rollup(sessions: DataFrame) -> DataFrame:
    """Batch rollup of finished per-session rows to per-user stats."""
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
            F.max("n_events").alias("max_session_events"),
            F.round(F.avg(F.col("end_ms") - F.col("start_ms")) / 1000.0, 2).alias(
                "avg_duration_sec"
            ),
        )
        .orderBy("user_id")
    )


def dedup_events(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exactly-once dedup on event_id within the watermark
    horizon — dropDuplicatesWithinWatermark, the streaming form of the
    reference's anti-join resume (J8)."""
    return stream.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def foreach_batch_latest_upsert(stream: DataFrame, target_dir: str) -> DataFrame:
    """Streaming upsert sink: keep one row per user with the latest
    event (by ts_ms, event_id) in a parquet 'master', merged per batch.

    foreachBatch + merge is the Structured Streaming form of the
    reference's idempotent master merge; on Delta this body becomes a
    single ``MERGE INTO``. Returns the started query's stream for the
    caller to await.
    """

    def _merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        latest = (
            batch.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("ts_ms", "event_id", "event_type", "value"),
                    F.struct("ts_ms", "event_id"),
                ).alias("s")
            )
            .select("user_id", "s.ts_ms", "s.event_id", "s.event_type", "s.value")
        )
        out = os.path.join(target_dir, "latest_per_user")
        try:
            existing = spark.read.parquet(out)
        except Exception:
            existing = None
        if existing is not None:
            merged = (
                existing.unionByName(latest)
                .groupBy("user_id")
                .agg(
                    F.max_by(
                        F.struct("ts_ms", "event_id", "event_type", "value"),
                        F.struct("ts_ms", "event_id"),
                    ).alias("s")
                )
                .select("user_id", "s.ts_ms", "s.event_id", "s.event_type", "s.value")
            )
        else:
            merged = latest
        # write-new-then-swap (never mutate inputs mid-read); the tmp
        # dir is deleted after the swap so a long-running stream's disk
        # footprint stays bounded at one extra copy, not one per batch
        tmp = out + f".tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(out)
        shutil.rmtree(tmp, ignore_errors=True)

    return stream.writeStream.foreachBatch(_merge).trigger(availableNow=True)


def running_totals_stateful(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value sum, emitted as updates each batch.

    This is the escape hatch for stateful logic the built-in windowed
    aggregations can't express (the SURVEY §2.10 custom-operator slot);
    state is an explicit (count, value_sum) tuple per user that
    survives across micro-batches AND restarts via the checkpoint.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("value_sum", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_sum": [round(s, 2)]}
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def interval_join_pairs(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    lookback: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner interval join: pairs where ``right_time`` is
    within [left_time - lookback, left_time] and the keys match. Key
    and time column names must differ across the two sides (rename
    upstream) so the joined schema is unambiguous.

    Both sides get watermarks plus the time-range join condition — the
    two things Structured Streaming needs to BOUND JOIN STATE: a right
    row is dropped from state once the left watermark passes
    right_time + lookback, so state is O(rate x window), not
    O(stream). Inner joins emit each match as soon as both sides
    arrive (append mode), which makes a Trigger.AvailableNow run
    exactly reproduce the batch twin.
    """
    l_ = left.withWatermark(left_time, watermark)
    r = right.withWatermark(right_time, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_time) >= F.col(left_time) - F.expr(f"interval {lookback}"))
        & (F.col(right_time) <= F.col(left_time))
    )
    return l_.join(r, cond, "inner")


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on) -> DataFrame:
    """Stream-static enrichment join: broadcast the (small) static
    dimension against every micro-batch. The dim side is a plain batch
    DataFrame, so no state is kept and no watermark is needed; at 100 TB
    the stream side never shuffles — each task hash-probes the
    broadcast table.
    """
    return stream.join(F.broadcast(dim), on, "left")


def dedup_stream_against_store(
    doc_stream: DataFrame,
    band_index: DataFrame | None,
    store: DataFrame,
    target_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 1,
    checkpoint: str | None = None,
    probe: str = "minhash",
):
    """Streaming incremental dedup: each micro-batch of arriving
    documents is probed against the STATIC corpus index and only the
    accepted (not-already-in-corpus) rows land in ``target_dir`` —
    continuous-ingestion dedup, the Structured Streaming form of the
    incremental batch operators.

    ``probe`` picks the batch operator run per micro-batch:
    ``"minhash"`` (default) probes the MinHash ``band_index``
    (``incremental_minhash_dedup`` — the cheap approximate-candidate
    path, exact-Jaccard-verified); ``"jaccard"`` probes the shingle
    ``store``'s posting lists directly under the store's frozen prefix
    order (``incremental_jaccard_dedup`` — exact, ``band_index`` may
    be None). Decisions depend only on (doc, store) in both modes, so
    micro-batch boundaries never change the output.

    Architecture: the probe pipeline ends in a per-document aggregate
    followed by a join back onto the batch roster — a shape Structured
    Streaming cannot express as one continuous query (no join after a
    streaming aggregation) — so the BATCH operator runs inside
    ``foreachBatch``, exactly the composition the repo's upsert sink
    uses (``foreach_batch_latest_upsert``): each micro-batch is a
    bounded frame, the operator's plan is batch-legal, and the
    band-index probe is the same equi-join. The static index re-reads
    per batch, so swapping a grown index under the job is a metadata
    change, not a restart.

    Delivery semantics: foreachBatch is AT-LEAST-ONCE (a retry after a
    partial write but before the checkpoint commit re-runs the batch),
    so each micro-batch writes to its own ``__batch_id={id}`` partition
    with OVERWRITE — the replay rewrites the same partition instead of
    appending duplicates, making the sink effectively-once. Readers of
    ``target_dir`` see the extra ``__batch_id`` partition column (batch
    lineage; drop it if unwanted).

    Returns the started StreamingQuery (availableNow trigger); await
    it and read ``target_dir`` for the accepted docs.
    """
    import tempfile as _tf

    from hummingbirddatapipeline_spark.operators.dedup import (
        incremental_jaccard_dedup,
        incremental_minhash_dedup,
    )

    if probe not in ("minhash", "jaccard"):
        raise ValueError(f"unknown probe mode {probe!r}")
    if probe == "minhash" and band_index is None:
        raise ValueError("probe='minhash' requires a band_index")
    checkpoint = checkpoint or _tf.mkdtemp(prefix="sg_dedup_ckpt_")

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        if probe == "jaccard":
            decisions = incremental_jaccard_dedup(
                batch,
                store,
                text_col,
                id_col,
                threshold=threshold,
                shingle_size=shingle_size,
            )
        else:
            decisions = incremental_minhash_dedup(
                batch,
                band_index,
                store,
                text_col,
                id_col,
                threshold=threshold,
                num_hashes=num_hashes,
                bands=bands,
                shingle_size=shingle_size,
            )
        accepted = batch.join(
            decisions.filter("accepted").select(id_col), id_col, "left_semi"
        )
        # idempotent per-batch sink: a foreachBatch retry of batch N
        # overwrites __batch_id=N instead of appending a second copy
        accepted.write.mode("overwrite").parquet(
            os.path.join(target_dir, f"__batch_id={batch_id}")
        )

    return (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
