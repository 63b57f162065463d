"""The bench machine-calibration probe (bench.py) and its consumer
(tools/bench_compare.py).

Why it exists: the r10 close-out measured a uniform ~1.55x VM drift on
byte-identical code between two bench refreshes (PLANS.md "Round-10
final-code verification") — indistinguishable from a broad regression
without a code-independent yardstick. bench.py now times two FIXED
workloads (range-sum CPU, small groupBy shuffle) alongside the suite;
bench_compare divides their round-over-round ratio out of the
per-query numbers.

Pure-Python tests — no SparkSession; the probe itself is exercised by
any real bench run (its JSON line carries the "calibration" object).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import bench_compare  # noqa: E402


def _payload(queries, calib=None):
    p = {
        "metric": "headline_query_suite_total_warm",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "queries_cold": {k: v * 2 for k, v in queries.items()},
        "sf": 0.1,
    }
    if calib is not None:
        p["calibration"] = calib
    return p


def test_load_calibration_from_full_payload(tmp_path):
    p = tmp_path / "b.json"
    p.write_text(json.dumps(_payload(
        {"a": 1.0},
        {"calib_cpu_sec": 0.4, "calib_shuffle_sec": 0.9},
    )))
    got = bench_compare.load_calibration(str(p))
    assert got == {"calib_cpu_sec": 0.4, "calib_shuffle_sec": 0.9}


def test_machine_factor_geomean_when_probes_agree():
    mf, why = bench_compare.machine_factor(
        {"calib_cpu_sec": 0.5, "calib_shuffle_sec": 0.4},
        {"calib_cpu_sec": 0.6, "calib_shuffle_sec": 0.5},
    )
    assert mf == pytest.approx(((0.6 / 0.5) * (0.5 / 0.4)) ** 0.5)
    assert "=" in why


def test_machine_factor_refuses_disagreeing_probes():
    """r11 finding: a run whose CPU probe is flat (1.03x) while the
    shuffle probe reads 0.58x cannot be summarized by one blended
    factor — normalization must be SKIPPED, not averaged into a
    wrong-direction adjustment."""
    mf, why = bench_compare.machine_factor(
        {"calib_cpu_sec": 0.861, "calib_shuffle_sec": 0.666},
        {"calib_cpu_sec": 0.883, "calib_shuffle_sec": 0.386},
    )
    assert mf is None
    assert "disagree" in why


def test_machine_factor_missing_side_is_none():
    mf, why = bench_compare.machine_factor(
        None, {"calib_cpu_sec": 1.0}
    )
    assert mf is None


def test_load_calibration_absent_is_none(tmp_path):
    p = tmp_path / "b.json"
    p.write_text(json.dumps(_payload({"a": 1.0})))
    assert bench_compare.load_calibration(str(p)) is None


def test_load_calibration_survives_driver_tail_truncation(tmp_path):
    """The driver's BENCH_r{N}.json keeps only the LAST 2000 chars of
    bench.py's stdout. The calibration object is emitted after
    "queries_cold" and "sf" precisely so it lands inside that tail —
    even with a suite large enough that the queries map is cut."""
    queries = {f"query_number_{i:03d}": 1.0 + i / 1000 for i in range(120)}
    line = json.dumps(_payload(
        queries, {"calib_cpu_sec": 0.5, "calib_shuffle_sec": 0.5}
    ))
    assert len(line) > 2000
    driver_artifact = {"tail": line[-2000:], "rc": 0}
    p = tmp_path / "BENCH_r99.json"  # no sibling BENCH_LOCAL_r99.json
    p.write_text(json.dumps(driver_artifact))
    assert bench_compare.load_calibration(str(p)) == {
        "calib_cpu_sec": 0.5,
        "calib_shuffle_sec": 0.5,
    }
    # and the query scavenger must NOT swallow calib_* keys as queries
    scavenged = bench_compare.load(str(p))
    assert not any(k.startswith("calib_") for k in scavenged)


def test_bench_py_emits_calibration_last():
    """Positional contract: "calibration" must be the FINAL key of the
    payload dict literal in bench.py, or driver-tail truncation can
    drop it for large suites."""
    src = open(os.path.join(REPO, "bench.py")).read()
    payload_block = src[src.index("payload = {"):]
    payload_block = payload_block[: payload_block.index("}")]
    keys = [
        ln.split('"')[1]
        for ln in payload_block.splitlines()
        if ln.strip().startswith('"')
    ]
    assert keys[-1] == "calibration"


def test_bench_py_appends_tail_summary_after_calibration():
    """r16: the compact totals copy must be assigned AFTER the payload
    literal (so it serializes as the very last key and survives the
    driver's 2000-char stdout-tail truncation for every suite size),
    and it must stay part of the SAME single JSON line — bench.py must
    not grow a second print."""
    src = open(os.path.join(REPO, "bench.py")).read()
    lit_end = src.index("payload = {")
    assert src.index('payload["tail_summary"]') > lit_end
    main_body = src[src.index("def main"):src.index("def _write_local_artifact")]
    assert main_body.count("print(") == 1
