"""Source layer tests: encoding-aware CSV dialects, header probe,
fuzzy column resolution, multi-year union with existence pruning,
numeric coercion, and the quarantined external-fetch pattern.
"""

from __future__ import annotations

import os

from hummingbirddatapipeline_spark.sources.csv_dialect import (
    load_csv_standardized,
    load_multi_year,
    probe_header,
    resolve_columns,
)
from hummingbirddatapipeline_spark.sources.external import (
    fetch_enrichment,
    resume_pending,
)


def _write(path: str, text: str, encoding: str = "latin-1") -> None:
    with open(path, "w", encoding=encoding) as f:
        f.write(text)


def test_probe_and_standardize_latin1(spark, tmp_path):
    p = str(tmp_path / "f2023.csv")
    _write(
        p,
        "EIN,Total revenue é,Assets (EOY)\n"
        "012345,\"1,500\",200\n"
        "67890,not_a_number,300\n",
    )
    assert probe_header(spark, p) == ["EIN", "Total revenue é", "Assets (EOY)"]
    out = load_csv_standardized(
        spark,
        p,
        {"EIN": "ein", "Total revenue é": "total_revenue", "Assets (EOY)": "total_assets"},
        numeric_cols=("total_revenue", "total_assets"),
    )
    rows = {r["ein"]: r for r in out.collect()}
    # thousands separators stripped; unparseable -> NULL (to_numeric
    # errors='coerce' parity); latin-1 header round-trips
    assert rows["012345"]["total_revenue"] == 1500.0
    assert rows["67890"]["total_revenue"] is None
    assert rows["67890"]["total_assets"] == 300.0


def test_resolve_columns_fuzzy_with_excludes():
    header = [
        "UNITID",
        "DRVEF2023 Total  enrollment",
        "DRVEF2023 Total enrollment graduate",
        "F2223_F2 Total revenues",
    ]
    got = resolve_columns(
        header,
        searches={
            "unitid": ["unitid"],
            "total_enrollment": ["total", "enrollment"],
            "grad_enrollment": ["enrollment", "graduate"],
            "f2_total_revenues": ["f2", "total revenues"],
        },
        excludes={"total_enrollment": ["graduate"]},
    )
    assert got == {
        "unitid": "UNITID",
        "total_enrollment": "DRVEF2023 Total  enrollment",
        "grad_enrollment": "DRVEF2023 Total enrollment graduate",
        "f2_total_revenues": "F2223_F2 Total revenues",
    }


def test_multi_year_union_prunes_missing_and_bridges_dialects(spark, tmp_path):
    a = str(tmp_path / "y2022.csv")
    b = str(tmp_path / "y2023.csv")
    # 2023 dialect renamed the revenue column and dropped assets
    _write(a, "EIN,Revenue\n1,10\n2,20\n")
    _write(b, "EIN,Rev Total\n1,30\n")
    df = load_multi_year(
        spark,
        {2022: a, 2023: b, 2024: str(tmp_path / "missing.csv")},
        {"EIN": "ein", "Revenue": "total_revenue", "Rev Total": "total_revenue"},
        numeric_cols=("total_revenue",),
    )
    rows = sorted((r["year"], r["ein"], r["total_revenue"]) for r in df.collect())
    assert rows == [(2022, "1", 10.0), (2022, "2", 20.0), (2023, "1", 30.0)]


def test_fetch_enrichment_retries_and_rate(spark):
    work = spark.createDataFrame([("a",), ("b",), ("fail",)], "key string")

    def fake_fetch(key: str) -> str:
        if key == "fail":
            raise RuntimeError("boom")
        return f"payload:{key}"

    out = fetch_enrichment(work, "key", fake_fetch, n_workers=1, max_retries=2)
    got = {r["key"]: (r["status"], r["payload"]) for r in out.collect()}
    assert got["a"] == ("ok", "payload:a")
    assert got["b"] == ("ok", "payload:b")
    assert got["fail"][0] == "retries_exhausted"
    assert "boom" in got["fail"][1]


def test_resume_anti_join(spark):
    work = spark.createDataFrame([("a",), ("b",), ("c",)], "key string")
    done = spark.createDataFrame([("b",)], "key string")
    left = sorted(r["key"] for r in resume_pending(work, done, "key").collect())
    assert left == ["a", "c"]


def test_versioned_write_and_swap(spark, tmp_path):
    from hummingbirddatapipeline_spark.tables import (
        read_latest_version,
        write_versioned,
    )

    base = str(tmp_path / "master")
    v1 = spark.createDataFrame([(1, "a")], "id int, v string")
    write_versioned(v1, base)
    v2 = spark.createDataFrame([(1, "b")], "id int, v string")
    write_versioned(v2, base)
    latest = read_latest_version(spark, base)
    assert [(r["id"], r["v"]) for r in latest.collect()] == [(1, "b")]
    # previous version untouched and still readable (audit contract)
    old = spark.read.parquet(base + "/v1")
    assert [(r["id"], r["v"]) for r in old.collect()] == [(1, "a")]


def test_year_partitioned_layout_prunes(spark, tmp_path):
    import os

    from hummingbirddatapipeline_spark.tables import write_year_partitioned

    df = spark.createDataFrame(
        [(1, 2023, 10.0), (2, 2024, 20.0)], "id int, year int, v double"
    )
    path = str(tmp_path / "long")
    write_year_partitioned(df, path)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("year=")
    ) == ["year=2023", "year=2024"]
    got = spark.read.parquet(path).filter("year = 2024")
    # partition pruning: the physical plan carries the partition filter
    assert "2024" in got._jdf.queryExecution().executedPlan().toString()
    assert [r["id"] for r in got.collect()] == [2]


def test_scan_fanout_opt_in_gate(spark, sf_dir):
    """r15 optimization: ``load(..., fanout=True)`` round-robins a
    single-row-group scan up to defaultParallelism; the default load
    stays exchange-free; tiny broadcast dims stay single-task even
    when asked; results are row-identical either way."""
    from hummingbirddatapipeline_spark.tables import (
        _FANOUT_FLOOR_BYTES,
        _fanout_partitions,
        load,
    )

    plain = load(spark, sf_dir, "documents")
    fanned = load(spark, sf_dir, "documents", fanout=True)
    p_plain = plain._jdf.queryExecution().executedPlan().toString()
    p_fan = fanned._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" not in p_plain
    import os

    doc_path = os.path.join(sf_dir, "documents.parquet")
    expect = _fanout_partitions(spark, doc_path)
    if os.path.getsize(doc_path) >= _FANOUT_FLOOR_BYTES:
        # r16 cost-aware width: byte-scaled (~32 KB/task), floored at 8,
        # capped at the core count — never the raw core count for a
        # sub-MB file (PERF_r15 anti-scaling finding).
        from hummingbirddatapipeline_spark.tables import (
            _FANOUT_MIN_WIDTH,
            _FANOUT_TARGET_BYTES_PER_TASK,
        )

        cores = spark.sparkContext.defaultParallelism
        assert expect == min(
            cores,
            max(
                _FANOUT_MIN_WIDTH,
                os.path.getsize(doc_path) // _FANOUT_TARGET_BYTES_PER_TASK,
            ),
        )
        assert 0 < expect <= cores
        assert "RoundRobinPartitioning" in p_fan
        # predicate pushdown survives the repartition
        filt = load(spark, sf_dir, "documents", fanout=True).filter(
            "doc_id < 10"
        )
        pf = filt._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)" in pf
    else:  # sf0.001 documents may sit under the floor: gate is a no-op
        assert expect == 0
        assert "RoundRobinPartitioning" not in p_fan
    # identical rows either way
    a = sorted(r["doc_id"] for r in plain.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in fanned.select("doc_id").collect())
    assert a == b
    # broadcast dims never fan out (file under the floor)
    nat = load(spark, sf_dir, "nation", fanout=True)
    assert "RoundRobinPartitioning" not in (
        nat._jdf.queryExecution().executedPlan().toString()
    )


def test_inline_rows_matches_create_dataframe_and_validates(spark):
    """ADVICE r15 hardening: inline_rows equals createDataFrame on the
    supported schema class, raises on arity mismatches and on
    parameterized/nested types instead of silently mis-parsing, and
    falls back to createDataFrame above the literal-size cap."""
    import pytest

    from hummingbirddatapipeline_spark.tables import (
        _INLINE_ROWS_MAX,
        inline_rows,
    )

    rows = [("a", 1), ("b", None), (None, 3)]
    got = inline_rows(spark, rows, "w string, n int")
    exp = spark.createDataFrame(rows, "w string, n int")
    assert got.schema == exp.schema
    key = lambda t: repr(t)  # noqa: E731 — None-safe total order
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, exp.collect()), key=key
    )
    with pytest.raises(ValueError, match="3 values for"):
        inline_rows(spark, [("a", 1, 99)], "w string, n int")
    with pytest.raises(ValueError, match="primitivetype"):
        inline_rows(spark, [(1.5,)], "d decimal(10,2)")
    with pytest.raises(ValueError, match="primitivetype"):
        inline_rows(spark, [([1],)], "xs array<int>")
    # above the cap: classic path (plan carries no exploded literal)
    big = [(f"w{i}", i) for i in range(_INLINE_ROWS_MAX + 1)]
    df = inline_rows(spark, big, "w string, n int")
    assert "explode" not in df._jdf.queryExecution().analyzed().toString()
    assert df.count() == len(big)
