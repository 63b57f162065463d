"""Scale-path operators: skew salting and bucketed co-located joins
(SURVEY.md §4 shuffle/partitioning design keys; the reference is
single-machine so these have no direct analogue — they are what makes
its joins survive 1000 executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: the skewed side gets a deterministic
    per-row salt, the other side is replicated once per salt value, and
    the join key becomes (key, salt) — a hot key's rows spread over
    ``n_salts`` tasks instead of one straggler.

    Semantics are identical to ``skewed.join(small, key, how)``; use
    when one side has hot keys and the other is small enough to
    replicate ``n_salts``x (else AQE skew-join splitting is the
    zero-copy alternative — enabled in session.py).
    """
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 8
) -> None:
    """Bucketed at-rest layout: co-locates rows by hash(key) so joins
    and aggregations on ``key`` between same-bucketed tables need no
    shuffle (SURVEY §4 'bucket/repartition by entity key')."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — the planner
    reads bucket layout from the catalog and elides both shuffles."""
    return spark.table(left_table).join(spark.table(right_table), key)
