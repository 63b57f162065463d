"""Deterministic from-scratch testdata generator at any scale factor —
the sf1 evidence the receipts have been missing (r11 VERDICT item 4).

Unlike tools/scale_probe.py (which replicates sf0.1 with FK offsets,
inheriting its exact value distributions but also its replica
artifacts), this synthesizes FRESH rows per TESTDATA.md's contract:
same 10-table star schema, same column types, same categorical
vocabularies, same key-space shapes (0-based contiguous keys, FK
ratios preserved), same distribution envelopes (doc token vocab and
10-100 token lengths, ~5% near-dup docs carrying the ' dup' marker,
L2-normalized 64-dim embeddings with 10 label clusters, Poisson-ish
~4 lineitems/order, 30-day event stream with ~66 events/user) — but
with CONTINUOUS key spaces and NO replica cliques, so group
cardinalities and dup densities scale the way a real corpus does.

Everything is content-addressed: every cell is a pure function of
(table, key, field) via xxhash64 — no RNG, no driver-side loops, no
collect. Generation is a distributed spark.range per table, so it
would synthesize 100 TB on a cluster the same way it makes 1.6 GB
locally.

Usage:
    python tools/gen_sf.py --sf 1.0 --dir /tmp/sf1 [--rebuild]

Correctness is NOT asserted on generated data (the DuckDB gate owns
that at the driver's sf0.01); this feeds cold scale receipts
(PLANS.md r12 "sf1 receipts").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["O", "F"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["large", "hot", "blue", "small", "dark", "cold", "light", "pale"]
P_NOUN = ["ring", "bolt", "drum", "cap", "disk", "rod", "plate", "gear"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]  # en weighted ~40%
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
DIM = 64
N_SOURCES = 20
N_LABELS = 10


def _h(tag: str, *cols):
    """Signed 64-bit content hash of (tag, cols) — the only randomness."""
    return F.xxhash64(F.lit(tag), *cols)


def _mod(tag: str, col, n: int):
    return F.pmod(_h(tag, col), F.lit(n))


def _unif(tag: str, *cols):
    """Uniform double in [0, 1) from the hash's low 30 bits."""
    return F.pmod(F.xxhash64(F.lit(tag), *cols), F.lit(1 << 30)) / float(1 << 30)


def _pick(tag: str, col, values: list[str]):
    return F.element_at(
        F.array(*[F.lit(v) for v in values]), (_mod(tag, col, len(values)) + 1).cast("int")
    )


def _rng(spark: SparkSession, n: int, key: str) -> DataFrame:
    parts = max(1, min(256, n // 500_000 + 1))
    return spark.range(0, n, 1, parts).withColumnRenamed("id", key)


def gen_tables(spark: SparkSession, sf: float, out_dir: str) -> dict:
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = max(1, int(15_000 * sf))
    # documents/embeddings floor at 500 in the driver's testdata
    # (sf0.001 and sf0.01 both hold 500 docs / 500 vecs; linear above)
    n_doc = max(500, int(50_000 * sf))
    n_vec = max(500, int(20_000 * sf))
    counts = {}

    region = spark.createDataFrame(
        [(i, r) for i, r in enumerate(REGIONS)], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )

    customer = _rng(spark, n_cust, "c_custkey").select(
        F.col("c_custkey"),
        F.format_string("Customer#%09d", "c_custkey").alias("c_name"),
        _mod("c_nat", F.col("c_custkey"), 25).cast("int").alias("c_nationkey"),
        F.round(_unif("c_bal", F.col("c_custkey")) * 11000.0 - 1000.0, 2).alias(
            "c_acctbal"
        ),
        _pick("c_seg", F.col("c_custkey"), SEGMENTS).alias("c_mktsegment"),
    )

    supplier = _rng(spark, n_supp, "s_suppkey").select(
        F.col("s_suppkey"),
        F.format_string("Supplier#%09d", "s_suppkey").alias("s_name"),
        _mod("s_nat", F.col("s_suppkey"), 25).cast("int").alias("s_nationkey"),
        F.round(_unif("s_bal", F.col("s_suppkey")) * 11000.0 - 1000.0, 2).alias(
            "s_acctbal"
        ),
    )

    part = _rng(spark, n_part, "p_partkey").select(
        F.col("p_partkey"),
        F.concat_ws(
            " ",
            _pick("p_adj", F.col("p_partkey"), P_ADJ),
            _pick("p_noun", F.col("p_partkey"), P_NOUN),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), (_mod("p_brand", F.col("p_partkey"), 25) + 1)).alias(
            "p_brand"
        ),
        _pick("p_type", F.col("p_partkey"), TYPES).alias("p_type"),
        (_mod("p_size", F.col("p_partkey"), 50) + 1).cast("int").alias("p_size"),
        (F.lit(900.0) + F.pmod(F.col("p_partkey"), F.lit(1000)) / 10.0).alias(
            "p_retailprice"
        ),
    )

    # o_orderdate is a pure function of the key so lineitem can derive
    # ship dates with NO join back to orders (join-free FK consistency)
    # timestamp_ntz, matching the driver testdata's column type exactly
    # (the UTC-pinned session makes the wall values identical either
    # way; the faithfulness test pins the dtype)
    def odate(okey):
        return F.timestamp_seconds(
            F.lit(788_918_400)  # 1995-01-01 UTC
            + _mod("o_date", okey, 2404) * 86_400
        ).cast("timestamp_ntz")

    orders = _rng(spark, n_ord, "o_orderkey").select(
        F.col("o_orderkey"),
        _mod("o_cust", F.col("o_orderkey"), max(n_cust, 1)).alias("o_custkey"),
        _pick("o_stat", F.col("o_orderkey"), STATUSES).alias("o_orderstatus"),
        F.round(_unif("o_total", F.col("o_orderkey")) * 400_000.0 + 1000.0, 2).alias(
            "o_totalprice"
        ),
        odate(F.col("o_orderkey")).alias("o_orderdate"),
        _pick("o_prio", F.col("o_orderkey"), PRIORITIES).alias("o_orderpriority"),
    )

    # ~4 lineitems/order: 1 + (h1 % 4) + (h2 % 4) in 1..7, mean 4
    n_li = (
        F.lit(1)
        + _mod("l_n1", F.col("l_orderkey"), 4)
        + _mod("l_n2", F.col("l_orderkey"), 4)
    ).cast("int")
    li_base = _rng(spark, n_ord, "l_orderkey").select(
        "l_orderkey", F.explode(F.sequence(F.lit(1), n_li)).alias("l_linenumber")
    )
    qty = (_mod("l_qty", F.concat(F.col("l_orderkey"), F.col("l_linenumber")), 50) + 1
           ).cast("double")
    pkey = _mod(
        "l_part", F.concat(F.col("l_orderkey"), F.col("l_linenumber")), max(n_part, 1)
    )
    lineitem = li_base.select(
        "l_orderkey",
        pkey.alias("l_partkey"),
        _mod(
            "l_supp", F.concat(F.col("l_orderkey"), F.col("l_linenumber")),
            max(n_supp, 1),
        ).alias("l_suppkey"),
        F.col("l_linenumber"),
        qty.alias("l_quantity"),
        F.round(qty * (F.lit(900.0) + F.pmod(pkey, F.lit(1000)) / 10.0), 2).alias(
            "l_extendedprice"
        ),
        (
            _mod("l_disc", F.concat(F.col("l_orderkey"), F.col("l_linenumber")), 11)
            / 100.0
        ).alias("l_discount"),
        (
            _mod("l_tax", F.concat(F.col("l_orderkey"), F.col("l_linenumber")), 9)
            / 100.0
        ).alias("l_tax"),
        _pick(
            "l_rf", F.concat(F.col("l_orderkey"), F.col("l_linenumber")), RETURNFLAGS
        ).alias("l_returnflag"),
        _pick(
            "l_ls", F.concat(F.col("l_orderkey"), F.col("l_linenumber")), LINESTATUSES
        ).alias("l_linestatus"),
        (
            odate(F.col("l_orderkey"))
            + F.make_dt_interval(
                days=(
                    _mod(
                        "l_ship",
                        F.concat(F.col("l_orderkey"), F.col("l_linenumber")),
                        95,
                    )
                    + 1
                ).cast("int")
            )
        ).alias("l_shipdate"),
    )

    # ordered 30-day stream, ~66 events/user, microsecond jitter
    span_us = 30 * 86_400 * 1_000_000
    events = _rng(spark, n_ev, "event_id").select(
        "event_id",
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000)  # 2024-01-01 UTC in micros
            + (F.col("event_id") * F.lit(span_us / max(n_ev, 1))).cast("long")
            + _mod("e_jit", F.col("event_id"), 1_000_000)
        ).cast("timestamp_ntz").alias("ts"),
        _mod("e_user", F.col("event_id"), n_users).alias("user_id"),
        _pick("e_type", F.col("event_id"), EVENT_TYPES).alias("event_type"),
        F.round(_unif("e_val", F.col("event_id")) * 150.0, 2).alias("value"),
        F.format_string(
            '{"k": %d}', _mod("e_props", F.col("event_id"), 100).cast("int")
        ).alias("props"),
    )

    # documents: 10-100 tokens from the 30-word vocab; every doc with
    # id % 20 == 7 re-derives its tokens from id-1 and appends ' dup'
    # (~5% near-dup pairs at CONSTANT density, not replica cliques)
    is_dup = F.pmod(F.col("doc_id"), F.lit(20)) == 7
    base = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    n_tok = (_mod("d_ntok", base, 91) + 10).cast("int")
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda i: F.element_at(
                vocab_arr,
                (F.pmod(F.xxhash64(F.lit("d_tok"), base, i), F.lit(len(VOCAB))) + 1
                 ).cast("int"),
            ),
        ),
        " ",
    )
    text = F.when(is_dup, F.concat(body, F.lit(" dup"))).otherwise(body)
    lang = F.when(_mod("d_lang", F.col("doc_id"), 10) < 4, F.lit("en")).otherwise(
        _pick("d_lang2", F.col("doc_id"), LANGS[1:])
    )
    documents = _rng(spark, n_doc, "doc_id").select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        F.concat(F.lit("src"), _mod("d_src", F.col("doc_id"), N_SOURCES)).alias(
            "source"
        ),
        F.length(text).cast("long").alias("n_chars"),
    )

    # embeddings: 10 label clusters — centroid(label) + noise, L2-normalized
    label = _mod("v_label", F.col("vec_id"), N_LABELS).cast("int")
    dims = F.sequence(F.lit(0), F.lit(DIM - 1))
    raw = F.transform(
        dims,
        lambda j: (
            (F.pmod(F.xxhash64(F.lit("v_cent"), label, j), F.lit(1 << 20))
             / float(1 << 20) - 0.5) * 1.6
            + (F.pmod(F.xxhash64(F.lit("v_noise"), F.col("vec_id"), j),
                      F.lit(1 << 20)) / float(1 << 20) - 0.5)
        ),
    )
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    embeddings = _rng(spark, n_vec, "vec_id").select(
        "vec_id",
        F.transform(raw, lambda x: (x / norm).cast("float")).alias("embedding"),
        label.alias("label"),
    )

    for name, df in [
        ("region", region), ("nation", nation), ("customer", customer),
        ("supplier", supplier), ("part", part), ("orders", orders),
        ("lineitem", lineitem), ("events", events), ("documents", documents),
        ("embeddings", embeddings),
    ]:
        path = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    from hummingbirddatapipeline_spark.session import get_spark

    spark = get_spark("hummingbird-gen-sf")
    spark.sparkContext.setLogLevel("ERROR")
    marker = os.path.join(args.dir, f".gen_sf_{args.sf}")
    if args.rebuild or not os.path.exists(marker):
        t0 = time.perf_counter()
        counts = gen_tables(spark, args.sf, args.dir)
        with open(marker, "w") as f:
            f.write(json.dumps(counts))
        print(json.dumps({
            "build_s": round(time.perf_counter() - t0, 1),
            "sf": args.sf, "dir": args.dir, "rows": counts,
        }))
    else:
        with open(marker) as f:
            print(json.dumps({"cached": True, "dir": args.dir,
                              "rows": json.loads(f.read())}))
    spark.stop()


if __name__ == "__main__":
    main()
