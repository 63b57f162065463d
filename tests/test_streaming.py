"""Structured Streaming semantics tests (SURVEY.md §2.10):
batch-stream parity, watermark late-data drop, checkpoint resume (the
S7 contract), and the foreachBatch upsert sink.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.streaming.core import (
    foreach_batch_latest_upsert,
    hourly_tumbling,
    read_events_stream,
    run_available_now,
    tumbling_to_batch,
)

HOUR_US = 3_600_000_000  # microseconds


def _write_events(spark, path, rows):
    """rows: (event_id, ts_millis, user_id, event_type, value); stored
    ts is TIMESTAMP_NTZ micros, matching the canonical events parquet
    encoding (tables._events_ts_to_nanos normalizes it on read)."""
    df = spark.createDataFrame(
        [(e, t * 1_000, u, ty, v, None) for e, t, u, ty, v in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    ).withColumn(
        "ts",
        F.expr(
            "timestampadd(MICROSECOND, ts, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ),
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_stream_batch_parity_tumbling(spark, sf_dir):
    from hummingbirddatapipeline_spark.tables import load

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    streamed = tumbling_to_batch(
        run_available_now(hourly_tumbling(stream), "complete")
    )
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    batch = (
        ev.withColumn("ts_ms", F.expr("CAST(ts DIV 1000000 AS LONG)"))
        .withColumn(
            "hour_start_ms", (F.floor(F.col("ts_ms") / 3_600_000) * 3_600_000).cast("long")
        )
        .groupBy("hour_start_ms", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(cents) / 100.0, 2).alias("total_value"),
        )
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def _flatten_parquet(src_subdir, flat_dir, name):
    for f in os.listdir(src_subdir):
        if f.endswith(".parquet"):
            os.link(os.path.join(src_subdir, f), os.path.join(flat_dir, name))


def test_watermark_drops_late_data(spark, tmp_path):
    """Run 1 (file A) advances the watermark past window 0's end; run 2
    (file B, same checkpoint) finalizes window 0 WITHOUT file B's late
    event — the watermark dropped it. Append mode + parquet sink, the
    production shape (memory sink can't resume a checkpoint)."""
    src = str(tmp_path / "src")
    flat = str(tmp_path / "flat")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    os.makedirs(flat)
    t0 = 1_700_000_000_000_000
    t0 -= t0 % HOUR_US
    hr0_ms = t0 // 1000

    def run_once():
        stream = read_events_stream(spark, flat)
        q = (
            hourly_tumbling(stream, watermark="30 minutes")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # file A: two events in hour 0 + one in hour 3 -> watermark hr 2.5
    _write_events(
        spark,
        os.path.join(src, "a.parquet"),
        [
            (1, hr0_ms + 1_000, 1, "x", 1.0),
            (2, hr0_ms + 2_000, 1, "x", 1.0),
            (3, (t0 + 3 * HOUR_US) // 1000, 1, "x", 1.0),
        ],
    )
    _flatten_parquet(os.path.join(src, "a.parquet"), flat, "a.parquet")
    run_once()

    # file B: late event for hour 0 (behind the watermark) + hour 6
    _write_events(
        spark,
        os.path.join(src, "b.parquet"),
        [
            (4, hr0_ms + 3_000, 1, "x", 1.0),
            (5, (t0 + 6 * HOUR_US) // 1000, 1, "x", 1.0),
        ],
    )
    _flatten_parquet(os.path.join(src, "b.parquet"), flat, "b.parquet")
    run_once()

    emitted = tumbling_to_batch(spark.read.parquet(out))
    got = {r["hour_start_ms"]: r["n_events"] for r in emitted.collect()}
    # window 0 finalized with ONLY file A's two events: late event 4
    # was dropped, not merged and not re-opened as a second row
    assert got[hr0_ms] == 2
    # hour-3 window may finalize in run 2's trailing batch (wm -> hr 5.5)
    assert got.get(hr0_ms + 3 * 3_600_000, 1) == 1
    # hour-6 window can never have been emitted (watermark never passed it)
    assert hr0_ms + 6 * 3_600_000 not in got


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """S7 resume: a second availableNow run over the same checkpoint
    only reads files added since the first run."""
    src = tmp_path / "src"
    flat = str(tmp_path / "flat")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(src)
    os.makedirs(flat)
    t0_ms = 1_700_000_000_000
    _write_events(spark, str(src / "a.parquet"), [(1, t0_ms, 7, "x", 1.0)])
    _flatten_parquet(str(src / "a.parquet"), flat, "a.parquet")

    stream = read_events_stream(spark, flat)
    q = (
        foreach_batch_latest_upsert(stream, out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    first = spark.read.parquet(os.path.join(out_dir, "latest_per_user"))
    assert [(r["user_id"], r["event_id"]) for r in first.collect()] == [(7, 1)]

    # new file: later event for user 7 + new user 8
    _write_events(
        spark,
        str(src / "b.parquet"),
        [(2, t0_ms + 60_000, 7, "y", 2.0), (3, t0_ms, 8, "x", 1.0)],
    )
    _flatten_parquet(str(src / "b.parquet"), flat, "b.parquet")
    stream2 = read_events_stream(spark, flat)
    q2 = (
        foreach_batch_latest_upsert(stream2, out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q2.awaitTermination()
    final = spark.read.parquet(os.path.join(out_dir, "latest_per_user"))
    got = {r["user_id"]: (r["event_id"], r["event_type"]) for r in final.collect()}
    assert got == {7: (2, "y"), 8: (3, "x")}


def test_custom_stateful_operator_survives_restart(spark, tmp_path):
    """applyInPandasWithState keeps per-user running totals across
    checkpointed restarts: run 1 counts file A; run 2 (same checkpoint)
    folds file B into the SAME state rather than starting over."""
    from hummingbirddatapipeline_spark.streaming.core import (
        running_totals_stateful,
    )

    flat = str(tmp_path / "flat")
    ckpt = str(tmp_path / "ckpt")
    src = tmp_path / "src"
    os.makedirs(src)
    os.makedirs(flat)
    t0_ms = 1_700_000_000_000

    out = str(tmp_path / "out")

    def run(name):
        stream = read_events_stream(spark, flat)
        q = (
            running_totals_stateful(stream)
            .writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # updates are cumulative; the latest state per user is the max
        snap = (
            spark.read.parquet(out)
            .groupBy("user_id")
            .agg(
                F.max(F.struct("n_events", "value_sum")).alias("s")
            )
            .select("user_id", "s.n_events", "s.value_sum")
        )
        return {r["user_id"]: r for r in snap.collect()}

    _write_events(
        spark, str(src / "a.parquet"),
        [(1, t0_ms, 7, "x", 1.5), (2, t0_ms + 1, 7, "x", 2.0), (3, t0_ms, 8, "x", 4.0)],
    )
    _flatten_parquet(str(src / "a.parquet"), flat, "a.parquet")
    got1 = run("st1")
    assert (got1[7]["n_events"], got1[7]["value_sum"]) == (2, 3.5)
    assert (got1[8]["n_events"], got1[8]["value_sum"]) == (1, 4.0)

    _write_events(
        spark, str(src / "b.parquet"),
        [(4, t0_ms + 2, 7, "x", 0.5), (5, t0_ms, 9, "x", 9.0)],
    )
    _flatten_parquet(str(src / "b.parquet"), flat, "b.parquet")
    got2 = run("st2")
    # state carried: user 7 folds the new event into 3 total
    assert (got2[7]["n_events"], got2[7]["value_sum"]) == (3, 4.0)
    assert (got2[9]["n_events"], got2[9]["value_sum"]) == (1, 9.0)


def test_stream_interval_join_matches_batch_twin(spark):
    """The stream-stream interval join emits exactly the pairs the
    batch range-join formulation produces (same user, click within the
    hour before the purchase, inclusive bounds)."""
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.catalog import QUERIES
    from hummingbirddatapipeline_spark.tables import load

    sf = "/root/testdata/sf0.001"
    got = QUERIES["stream_interval_join_pairs"](spark, sf)
    rows = got.collect()
    assert rows
    assert all(0 <= r["ms_before"] <= 3_600_000 for r in rows)

    ev = load(spark, sf, "events").withColumn(
        "ts_ms", F.expr("CAST(ts DIV 1000000 AS LONG)")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts_ms").alias("p_ms"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("cu"),
        F.col("ts_ms").alias("c_ms"),
    )
    twin = p.join(
        c,
        (F.col("cu") == F.col("user_id"))
        & (F.col("c_ms") >= F.col("p_ms") - 3_600_000)
        & (F.col("c_ms") <= F.col("p_ms")),
    )
    want = {
        (r["purchase_event_id"], r["click_event_id"]) for r in twin.collect()
    }
    assert {(r["purchase_event_id"], r["click_event_id"]) for r in rows} == want


def test_stream_enrich_uses_broadcast(spark):
    """The stream-static dim join must stay a broadcast probe — a
    shuffle on the stream side would defeat the design."""
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.streaming.core import (
        enrich_with_dim,
        read_events_stream,
        run_available_now,
    )
    from hummingbirddatapipeline_spark.tables import load

    sf = "/root/testdata/sf0.001"
    stream = read_events_stream(spark, f"{sf}/events.parquet")
    dim = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("user_id"), "n_name"
    )
    out = run_available_now(
        enrich_with_dim(stream, dim, "user_id").select("event_id", "n_name"),
        "append",
        name="sg_enrich_plan_test",
    )
    assert out.count() > 0
    # plan check via the completed query's lastProgress is brittle in
    # availableNow; assert on the batch twin's plan instead (same join)
    twin = load(spark, sf, "events").join(F.broadcast(dim), "user_id", "left")
    plan = twin._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_foreach_batch_upsert_replay_idempotent(spark, tmp_path):
    """Exactly-once contract under batch REPLAY: re-delivering the same
    micro-batch (a retried batch id after a crash between sink write
    and checkpoint commit) must leave the sink unchanged, and the
    per-batch tmp staging dirs must not accumulate on disk."""
    import glob

    from hummingbirddatapipeline_spark.streaming.core import (
        foreach_batch_latest_upsert,
    )

    flat = str(tmp_path / "flat")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    src = tmp_path / "src"
    os.makedirs(src)
    os.makedirs(flat)
    t0_ms = 1_700_000_000_000
    _write_events(
        spark,
        str(src / "a.parquet"),
        [(1, t0_ms, 7, "x", 1.0), (2, t0_ms + 5, 7, "y", 2.0), (3, t0_ms, 8, "x", 1.0)],
    )
    _flatten_parquet(str(src / "a.parquet"), flat, "a.parquet")

    stream = read_events_stream(spark, flat)
    q = (
        foreach_batch_latest_upsert(stream, out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    snap = lambda: sorted(  # noqa: E731
        (r["user_id"], r["event_id"], r["ts_ms"], r["event_type"], r["value"])
        for r in spark.read.parquet(os.path.join(out_dir, "latest_per_user")).collect()
    )
    first = snap()
    assert [(u, e) for u, e, *_ in first] == [(7, 2), (8, 3)]

    # replay: re-run the availableNow query over the UNCHANGED source
    # with a FRESH checkpoint, which re-delivers batch 0 verbatim — the
    # same rows the sink already merged
    ckpt2 = str(tmp_path / "ckpt_replay")
    q2 = (
        foreach_batch_latest_upsert(read_events_stream(spark, flat), out_dir)
        .option("checkpointLocation", ckpt2)
        .start()
    )
    q2.awaitTermination()
    assert snap() == first  # sink unchanged by the replayed batch

    # bounded disk: no .tmp_* staging dirs survive
    assert glob.glob(os.path.join(out_dir, "latest_per_user.tmp_*")) == []


def test_stream_schema_probe_handles_all_ts_encodings(spark, tmp_path):
    """The testdata parquet has shipped events.ts under three physical
    encodings across driver regenerations (INT64 nanos, TIMESTAMP_NTZ
    micros, instant TIMESTAMP). read_events_stream probes the staged
    footers instead of trusting a hardcoded schema, and must agree
    with the batch normalizer for EVERY encoding — including ones not
    currently on disk."""
    base = 1_600_000_000  # seconds
    rows = [(1, base, 10), (2, base + 3600, 11)]

    def stream_ts(path):
        out = run_available_now(
            read_events_stream(spark, path).select("event_id", "ts"),
            "append",
            checkpoint=str(tmp_path / ("ck_" + os.path.basename(path))),
        )
        return {r["event_id"]: r["ts"] for r in out.collect()}

    expect = {e: s * 10**9 for e, s, _ in rows}

    ntz = str(tmp_path / "ntz")
    spark.createDataFrame(
        [(e, s * 10**6, u) for e, s, u in rows],
        "event_id long, ts long, user_id long",
    ).withColumn(
        # instant -> NTZ under the UTC session == the wall-clock-is-UTC
        # contract the NTZ normalizer assumes
        "ts", F.expr("CAST(timestamp_micros(ts) AS TIMESTAMP_NTZ)")
    ).write.parquet(ntz)

    instant = str(tmp_path / "instant")
    spark.createDataFrame(
        [(e, s, u) for e, s, u in rows],
        "event_id long, ts long, user_id long",
    ).withColumn("ts", F.expr("timestamp_seconds(ts)")).write.parquet(instant)

    nanos = str(tmp_path / "nanos")
    spark.createDataFrame(
        [(e, s * 10**9, u) for e, s, u in rows],
        "event_id long, ts long, user_id long",
    ).write.parquet(nanos)

    for path in (ntz, instant, nanos):
        assert stream_ts(path) == expect, path


def test_multi_batch_replay_matches_single_batch(spark, tmp_path):
    """Watermark/state correctness under REAL micro-batching: the same
    events processed as four time-ordered files with
    maxFilesPerTrigger=1 (so watermark advances and state finalizes
    across batch boundaries) must emit exactly what one
    single-batch availableNow run emits. Files are time-range
    partitioned with ascending mtimes, so the source's mod-time order
    matches event time and no in-order row can be dropped."""
    import time as _time

    import uuid as _uuid

    from hummingbirddatapipeline_spark.tables import load

    src = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    bounds = src.selectExpr("min(ts) AS lo", "max(ts) AS hi").first()
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo) + 1
    rows = src.withColumn(
        "ts",
        F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))").cast(
            "timestamp_ntz"
        ),
    )

    split_dir = tmp_path / "split"
    split_dir.mkdir()
    n_files = 4
    for k in range(n_files):
        part = rows.filter(
            (F.unix_micros(F.col("ts").cast("timestamp")) * 1000 >= lo + span * k // n_files)
            & (F.unix_micros(F.col("ts").cast("timestamp")) * 1000 < lo + span * (k + 1) // n_files)
        )
        part.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{k}")
        )
        import glob as _glob
        import shutil as _shutil

        src_file = _glob.glob(str(tmp_path / f"stage{k}" / "part-*.parquet"))[0]
        dst = split_dir / f"{k:02d}.parquet"
        _shutil.copy(src_file, dst)
        os.utime(dst, (1_700_000_000 + k * 10, 1_700_000_000 + k * 10))

    def run(max_files):
        stream = read_events_stream(
            spark, str(split_dir), max_files_per_trigger=max_files
        )
        name = f"mb_{_uuid.uuid4().hex[:8]}"
        q = (
            hourly_tumbling(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                str(tmp_path / f"ck_{name}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        _time.sleep(0.2)
        return sorted(map(tuple, spark.table(name).collect())), n_batches

    multi, multi_batches = run(1)
    single, single_batches = run(None)
    assert multi_batches >= n_files  # maxFilesPerTrigger=1 really batched
    assert single_batches <= 2
    assert len(single) > 0
    assert multi == single


def test_stream_dedup_against_store_matches_batch(spark, tmp_path):
    """Continuous-ingestion dedup: streaming odd docs (two files, one
    per micro-batch) against the even-doc store index must accept
    exactly the docs the batch operator accepts, and a checkpointed
    replay must append nothing (S7)."""
    from hummingbirddatapipeline_spark.operators.dedup import (
        build_jaccard_store,
        incremental_minhash_dedup,
        minhash_band_index,
    )
    from hummingbirddatapipeline_spark.streaming.core import (
        dedup_stream_against_store,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    store_docs = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    store = build_jaccard_store(store_docs, "text", "doc_id", shingle_size=1)
    index = minhash_band_index(
        store_docs, "text", "doc_id", num_hashes=32, bands=8, shingle_size=1
    )

    src = tmp_path / "src"
    src.mkdir()
    for k, part in enumerate(
        (batch.filter("doc_id % 4 = 1"), batch.filter("doc_id % 4 = 3"))
    ):
        part.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{k}")
        )
        import glob
        import shutil

        f = glob.glob(str(tmp_path / f"stage{k}" / "part-*.parquet"))[0]
        shutil.copy(f, src / f"{k:02d}.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    target = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ck")
    q = dedup_stream_against_store(
        stream, index, store, target, threshold=0.85, checkpoint=ckpt
    )
    q.awaitTermination()

    got = {r["doc_id"] for r in spark.read.parquet(target).collect()}
    exp = {
        r["doc_id"]
        for r in incremental_minhash_dedup(
            batch, index, store, "text", "doc_id", threshold=0.85,
            num_hashes=32, bands=8, shingle_size=1,
        )
        .filter("accepted")
        .collect()
    }
    assert got == exp and len(got) > 0

    # checkpointed replay: no new files -> nothing appended
    n_before = spark.read.parquet(target).count()
    q2 = dedup_stream_against_store(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        index,
        store,
        target,
        threshold=0.85,
        checkpoint=ckpt,
    )
    q2.awaitTermination()
    assert spark.read.parquet(target).count() == n_before
