"""Differential sweep of the FULL registered catalog (plus any banked
rows, while any exist) under the DRIVER'S exact bare session (local[4],
UTC, default configs — NOT the repo's tuned session factory) at the
driver gate's scale, INCLUDING check_oracle's integer-width gate (a
DuckDB HUGEINT/int128 output column hash-fails the driver even when
every value matches — the gate the tier tests' Python-int compare
cannot see; it caught text_pack_concat_manifest's window-SUM offset
before that row's promotion round).

Since r12 (the bank drained to zero) this sweeps QUERIES/ORACLES — the
round-close checklist's bare-session leg now covers every driver-facing
row, not just pre-staged ones.

Run before a round ships:

    python tools/bank_bare_session_check.py [sf_dir] [row_name ...]

Exit code 1 on any FAIL."""
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import SparkSession

import check_oracle as co


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = co.duck_connect(sf_dir)

    from hummingbirddatapipeline_spark.catalog import (
        BANKED,
        BANKED_ORACLES,
        ORACLES,
        QUERIES,
    )

    queries = {**QUERIES, **BANKED}
    oracles = {**ORACLES, **BANKED_ORACLES}
    unknown = sorted(only - set(queries))
    if unknown:
        print(f"unknown row name(s): {unknown}")
        return 1

    n_pass = n_fail = 0
    for name in sorted(only or queries):
        try:
            sdf = queries[name](spark, sf_dir)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = dict(zip(dcols, rel.types))
            drows = rel.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: {ex}")
            n_fail += 1
            continue
        problems = []
        wide = sorted(
            c for c, t in dtypes.items() if str(t) in ("HUGEINT", "UHUGEINT")
        )
        if wide:
            problems.append(f"oracle emits int128 (driver hash-fails): {wide}")
        if sorted(cols) != sorted(dcols):
            problems.append(f"cols spark={sorted(cols)} duck={sorted(dcols)}")
        if len(rows) != len(drows):
            problems.append(f"rowcount {len(rows)} vs {len(drows)}")
        if not problems and co.normalize(rows, cols) != co.normalize(
            drows, dcols
        ):
            problems.append("values differ")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail (bare local[4] UTC, {sf_dir})")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
