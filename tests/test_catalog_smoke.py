"""Smoke: every catalog query runs at sf0.001 with a stable schema,
every oracle key has a matching query, and entry() returns rows."""

from __future__ import annotations


def test_every_query_runs(spark, sf_dir):
    from hummingbirddatapipeline_spark.catalog import QUERIES

    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()  # runs without error


def test_oracle_keys_subset_of_queries():
    from hummingbirddatapipeline_spark.catalog import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)


def test_every_query_has_oracle():
    """Driver contract: every queries() entry needs a matching oracle
    (oracle-less entries score a red `err: no_oracle` row every round).
    Bench-measurement forms without a cross-engine oracle belong in
    BENCH_ONLY, which bench.py runs but the driver never sees."""
    from hummingbirddatapipeline_spark.catalog import (
        BENCH_ONLY,
        ORACLES,
        QUERIES,
    )

    assert set(QUERIES) == set(ORACLES)
    assert not (set(BENCH_ONLY) & set(QUERIES))


def test_banked_registry_hygiene():
    """The banked registry is the pre-staged registration code for
    BANK.md's tiers: every banked row must carry an oracle, must NOT
    be driver-visible (disjoint from QUERIES and BENCH_ONLY — a leak
    here silently changes the driver window), and the registry must
    cover BANK.md's row names exactly — a rename on either side is a
    recipe/row drift that would break a future registration round."""
    import re

    from hummingbirddatapipeline_spark.catalog import (
        BANKED,
        BANKED_ORACLES,
        BENCH_ONLY,
        QUERIES,
    )

    assert set(BANKED) == set(BANKED_ORACLES)
    assert not (set(BANKED) & set(QUERIES))
    assert not (set(BANKED) & set(BENCH_ONLY))
    with open("/root/repo/BANK.md") as f:
        bank_names = re.findall(r"\| r\d+ \| (\S+) \|", f.read())
    # every banked row is indexed in BANK.md, and every BANK.md row is
    # either still banked or already PROMOTED to the driver surface —
    # so a rename on either side fails here, but a registration flip
    # does not require a same-commit BANK.md edit (caught in the r12
    # flip rehearsal)
    assert bank_names and set(BANKED) <= set(bank_names)
    assert set(bank_names) <= set(BANKED) | set(QUERIES)
    # bench.py's HEADLINE pre-lists every banked row (the `in runnable`
    # filter skips them until promotion, then they join the bench with
    # no edit) and holds no name unknown to any registry
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_module", "/root/repo/bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    head = set(bench.HEADLINE)
    assert set(BANKED) <= head
    assert head <= set(BANKED) | set(QUERIES) | set(BENCH_ONLY)


def test_driver_window_rotation_policy():
    """The driver samples the first 50 registered queries; make the
    rotation policy executable: (1) every DRIVER_WINDOW name exists and
    registers before any non-window name, (2) the window fits the
    driver's 50-slot budget, (3) every query OUTSIDE the first 50 slots
    (which the driver will NOT sample this round) either was
    driver-green when last sampled — checked against the actual
    CORRECTNESS_r{N}.json records, so a red row can never rotate out —
    or is a registered-this-round row explicitly listed in
    DEFERRED_FIRST_SAMPLE, which commits it to the HEAD of the next
    round's window (the r11 VERDICT's relaxed invariant: a
    never-sampled row must enter the window within one round of
    registration; the zero-never-sampled form was self-imposed and
    drove the banking anti-pattern)."""
    import glob
    import json
    import os

    from hummingbirddatapipeline_spark.catalog import (
        DEFERRED_FIRST_SAMPLE,
        DRIVER_WINDOW,
        QUERIES,
    )

    names = list(QUERIES)
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    assert not missing, f"DRIVER_WINDOW names not registered: {missing}"
    assert names[: len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert len(DRIVER_WINDOW) <= 50

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    sampled: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            sampled.add(name)
            # last-sample-wins: a later red overrides an earlier green
            ok = bool(rec.get("rows_match")) and bool(rec.get("hash_match"))
            (green.add if ok else green.discard)(name)

    # deferral is only for NEVER-sampled rows, and a deferred name must
    # be real and actually outside the window (a stale entry for a row
    # already sampled green must be removed, not carried)
    assert set(DEFERRED_FIRST_SAMPLE) <= set(QUERIES)
    assert not (set(DEFERRED_FIRST_SAMPLE) & set(DRIVER_WINDOW))
    stale = [n for n in DEFERRED_FIRST_SAMPLE if n in sampled]
    assert not stale, (
        f"DEFERRED_FIRST_SAMPLE rows already driver-sampled: {stale} — "
        "drop them from the deferral list (green) or pull them into the "
        "window (red)"
    )

    dark = [
        n
        for n in names[50:]
        if n not in green and n not in DEFERRED_FIRST_SAMPLE
    ]
    assert not dark, (
        f"queries outside the driver window that are neither "
        f"last-sample-green nor deferred-first-sample: {dark} — keep "
        "them inside the first 50 slots until the driver has verified "
        "them, or list them in DEFERRED_FIRST_SAMPLE to commit them to "
        "the next round's window head"
    )


def test_twin_offsets_clear_all_doc_ids():
    """Range-routed twin fixtures (simhash consistency, phash groups)
    shift synthetic ids by a fixed offset and route rows back by id
    range — an original doc_id at or above the smallest offset would
    collide with a twin range and corrupt both partitions. The
    invariant is implicit in the operators (r11 ADVICE), so pin it
    against the ACTUAL testdata at every supported SF with a direct
    parquet read (no Spark session needed)."""
    import glob
    import os

    import duckdb

    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        _SIMHASH_TWIN_OFFSET,
    )
    from hummingbirddatapipeline_spark.catalog.multimodal_q import (
        _PHASH_TWIN_OFFSET,
    )
    from hummingbirddatapipeline_spark.catalog.text_q import (
        _CONTAIN_TWIN_OFFSET,
    )

    # winnow-containment twins ride doc_id + 70000 and the bench side
    # filters doc_id < 20: any original colliding with a twin id would
    # double-count fingerprints, so hold it to the same standard
    floor_off = min(
        _SIMHASH_TWIN_OFFSET, _PHASH_TWIN_OFFSET, _CONTAIN_TWIN_OFFSET
    )
    paths = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    assert paths, "no testdata found"
    con = duckdb.connect()
    for p in paths:
        mx = con.sql(f"SELECT MAX(doc_id) FROM read_parquet('{p}')").fetchone()[0]
        assert mx < floor_off, (p, mx, floor_off)
    con.close()


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.take(1)) == 1


def test_sketches_within_tolerance(spark, sf_dir):
    """The sketch contract queries must report every tolerance flag
    TRUE and carry the exact side correctly (HLL rsd=2% -> 5% gate;
    t-digest accuracy=10k is near-exact at this scale)."""
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.catalog import QUERIES
    from hummingbirddatapipeline_spark.tables import load

    ev = load(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    hll = QUERIES["sketch_approx_distinct_users"](spark, sf_dir).collect()
    assert {r["event_type"]: r["n_exact_users"] for r in hll} == exact
    assert all(r["hll_within_5pct"] for r in hll)

    qrows = QUERIES["sketch_value_quantiles"](spark, sf_dir).collect()
    assert qrows
    for r in qrows:
        assert r["p50_ok"] and r["p95_ok"] and r["p99_ok"], r


def test_oracle_output_dtypes_driver_safe(sf_dir):
    """Every oracle's DuckDB output must avoid int128/HUGEINT columns:
    the driver's value hash is integer-width-sensitive, so an unwrapped
    SUM(CASE...) (HUGEINT in DuckDB, BIGINT in Spark) hash-mismatches
    even when every value is equal. This burned three driver rounds on
    conditional_counters; now it fails CI instead."""
    import os

    import duckdb

    from hummingbirddatapipeline_spark.catalog import ORACLES
    from hummingbirddatapipeline_spark.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    wide_by_query = {}
    for name, sql in ORACLES.items():
        rel = con.sql(sql)
        wide = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT")
        ]
        if wide:
            wide_by_query[name] = wide
    assert not wide_by_query, wide_by_query


def test_testdata_schema_contract(spark, sf_dir):
    """Fail fast (and legibly) when the driver regenerates testdata
    with different physical encodings — round 4 silently switched
    events.ts from INT64 nanos to TIMESTAMP_NTZ micros and broke 7
    queries. `load` must present the canonical logical schema whatever
    the parquet encoding underneath."""
    from pyspark.sql import types as T

    from hummingbirddatapipeline_spark.tables import load

    ev = load(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.LongType), (
        "events.ts must normalize to BIGINT epoch nanos; got "
        f"{ev.schema['ts'].dataType} — update tables._events_ts_to_nanos"
    )
    # nanos sanity: epoch nanos for 2000-01-01..2100-01-01
    lo, hi = 946_684_800 * 10**9, 4_102_444_800 * 10**9
    r = ev.selectExpr("min(ts) AS a", "max(ts) AS b").first()
    assert lo < r["a"] <= r["b"] < hi, (r["a"], r["b"])

    emb = load(spark, sf_dir, "embeddings")
    t = emb.schema["embedding"].dataType
    assert isinstance(t, T.ArrayType) and isinstance(
        t.elementType, (T.FloatType, T.DoubleType)
    ), t
    docs = load(spark, sf_dir, "documents")
    assert isinstance(docs.schema["text"].dataType, T.StringType)
    for tbl, date_col in (("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        dt = load(spark, sf_dir, tbl).schema[date_col].dataType
        assert isinstance(
            dt, (T.DateType, T.TimestampType, T.TimestampNTZType)
        ), (tbl, date_col, dt)
