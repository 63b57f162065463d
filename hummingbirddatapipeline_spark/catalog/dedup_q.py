"""Dedup catalog queries (north-star extension): MinHash-LSH and
SimHash run rows-only (banded hashing isn't reasonably SQL-expressible);
exact-fingerprint and n-gram Jaccard dedup have full DuckDB oracles in
text_q.py. Recall/precision properties are covered in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.operators.dedup import (
    near_dup_pairs_minhash,
    simhash_dedup,
)
from hummingbirddatapipeline_spark.tables import load


@query("dedup_minhash_near_dups")  # rows-only
def dedup_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # 1-word shingles + low threshold: testdata docs are word soup from a
    # tiny vocabulary, so token-level overlap is the meaningful signal.
    return near_dup_pairs_minhash(
        docs, "text", "doc_id", threshold=0.85, num_hashes=32, bands=8, shingle_size=1
    ).orderBy("id_a", "id_b")


@query("dedup_simhash_groups")  # rows-only
def dedup_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        simhash_dedup(docs, "text", "doc_id", shingle_size=1)
        .select("doc_id", "simhash", "dup_count")
        .orderBy("doc_id")
    )
