"""Local differential harness: runs every catalog query on Spark and its
oracle SQL on DuckDB over the same parquet tables, then compares
row count + column names + order-insensitive values (the driver's
contract, approximated).

Usage:
    python tools/check_oracle.py [sf_dir] [query_name ...]
    python tools/check_oracle.py [sf_dir] --skip name [name ...]

``--skip`` inverts the selection (run everything EXCEPT the named
rows) — for above-driver-scale sweeps where a few exact-closure
oracles are quadratic in corpus size and their contract caps do not
bind yet (see PLANS.md "cap-biting-scale" notes). Set
CHECK_ORACLE_TIMES=1 to append per-row spark/oracle seconds to each
line (off by default so driver-facing output stays byte-stable).
Set CHECK_ORACLE_TIMEOUT=<secs> to put a watchdog on each ORACLE
execution (duckdb con.interrupt() from a timer thread): a row whose
oracle exceeds the budget prints ``SKIP-TIMEOUT`` and counts as
skipped, not failed — only meaningful for above-driver-scale sweeps;
the driver-scale gates run without it and a timeout there is a bug.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Sort columns by name, normalize floats/timestamps, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # EXACT float compare (matches the driver's value-hash gate).
            # Pass CHECK_ORACLE_TOL=9 etc. to debug with a tolerance.
            tol = os.environ.get("CHECK_ORACLE_TOL")
            return round(v, int(tol)) if tol else v.hex()
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, list):
            return tuple(norm_cell(x) for x in v)
        return v

    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    skip: set[str] = set()
    if names and names[0] == "--skip":
        skip, names = set(names[1:]), []
    only = set(names)
    times = bool(os.environ.get("CHECK_ORACLE_TIMES"))
    oracle_budget = float(os.environ.get("CHECK_ORACLE_TIMEOUT", "0"))

    import __spark_entry__ as e
    from hummingbirddatapipeline_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_connect(sf_dir)

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    n_skip = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in skip:
            n_skip += 1
            continue
        import time as _time

        t0 = _time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        t_spark = _time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(spark_rows)} rows")
            n_rows_only += 1
            continue
        t1 = _time.time()
        watchdog = None
        if oracle_budget:
            import threading

            watchdog = threading.Timer(oracle_budget, con.interrupt)
            watchdog.start()
        try:
            rel = con.sql(sql)
            duck_cols = list(rel.columns)
            duck_dtypes = dict(zip(duck_cols, rel.types))
            duck_rows = rel.fetchall()
        except Exception as ex:  # noqa: BLE001
            if oracle_budget and "INTERRUPT" in str(ex).upper():
                print(f"SKIP-TIMEOUT {name}: oracle exceeded {oracle_budget:.0f}s")
                n_skip += 1
            else:
                print(f"FAIL {name}: duckdb error: {ex}")
                n_fail += 1
            continue
        finally:
            if watchdog is not None:
                watchdog.cancel()
        t_duck = _time.time() - t1
        suffix = f"  [spark {t_spark:.1f}s oracle {t_duck:.1f}s]" if times else ""
        problems = []
        # Width check BEFORE value normalization: the driver's value hash
        # is integer-width-sensitive, so a DuckDB HUGEINT/int128 output
        # column (e.g. an unwrapped SUM(CASE...)) hash-mismatches a Spark
        # BIGINT even when every value is equal. Python-int normalization
        # below cannot see this, hence the explicit dtype gate.
        wide = sorted(
            c for c, t in duck_dtypes.items() if str(t) in ("HUGEINT", "UHUGEINT")
        )
        if wide:
            problems.append(f"oracle emits int128 (driver hash-fails): {wide}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            a = normalize(spark_rows, list(spark_cols))
            b = normalize(duck_rows, duck_cols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows){suffix}")
            n_pass += 1
    skipped = f", {n_skip} skipped" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only{skipped}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
