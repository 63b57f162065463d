"""Faithfulness contract for tools/gen_sf.py — the sf1 receipts
instrument. The generated tables must match the driver testdata's
schemas exactly (names, types, order) and reproduce the contract's
distribution envelopes, or scale receipts measured on generated data
stop meaning anything about driver-shaped data."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def gen_dir(spark, tmp_path_factory):
    from gen_sf import gen_tables

    out = str(tmp_path_factory.mktemp("gensf") / "sf0.001")
    gen_tables(spark, 0.001, out)
    return out


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"),
    reason="driver testdata not present on this checkout",
)
def test_schemas_match_driver_testdata(spark, gen_dir):
    for t in TABLES:
        ours = spark.read.parquet(os.path.join(gen_dir, f"{t}.parquet"))
        ref = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        assert [(f.name, f.dataType.simpleString()) for f in ours.schema] == [
            (f.name, f.dataType.simpleString()) for f in ref.schema
        ], t


def test_distribution_envelopes(spark, gen_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(gen_dir, "documents.parquet"))
    # ~5% near-dup docs carrying the ' dup' marker, like the contract
    n = docs.count()
    dups = docs.filter(F.col("text").endswith(" dup")).count()
    assert abs(dups / n - 0.05) < 0.01
    # language split: en weighted ~40%
    en = docs.filter(F.col("lang") == "en").count()
    assert 0.3 < en / n < 0.5
    # embeddings: L2-normalized, the contract's label count
    emb = spark.read.parquet(os.path.join(gen_dir, "embeddings.parquet"))
    norm = emb.select(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda a, x: a + x * x,
        ).alias("n2")
    ).agg(F.min("n2"), F.max("n2")).collect()[0]
    assert 0.99 < norm[0] and norm[1] < 1.01
    assert emb.select("label").distinct().count() == 10
    # lineitem FK closure: every l_orderkey exists in orders
    li = spark.read.parquet(os.path.join(gen_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(gen_dir, "orders.parquet"))
    orphans = li.join(
        od, li.l_orderkey == od.o_orderkey, "left_anti"
    ).count()
    assert orphans == 0
    # lineitem ship dates derive from the order date join-free: every
    # shipdate lands 1-95 days after its order's date
    j = li.join(od, li.l_orderkey == od.o_orderkey).select(
        F.datediff("l_shipdate", "o_orderdate").alias("d")
    ).agg(F.min("d"), F.max("d")).collect()[0]
    assert 0 <= j[0] and j[1] <= 96
