"""Deduplication operators for large-scale training-data pipelines.

Four families, each designed scale-first:

- exact: hash-groupBy on a normalized fingerprint — one shuffle, no UDF.
- MinHash + LSH banding: shingle -> K minhashes (xxhash64 native) ->
  band -> bucket self-join. At 100 TB the bucket join replaces the
  O(n^2) cross join; skewed buckets are capped.
- SimHash: 64-bit hash via per-bit weighted majority over token hashes,
  computed with native bit ops; near-dups = identical simhash (or
  banded Hamming refinement).
- n-gram Jaccard: exact verification join over shared shingles (used
  as the verify stage after LSH candidate generation).

The reference's nearest analogue is composite-key anti-join dedup
(append_priorities.py:222-243); these generalize it to content dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hummingbirddatapipeline_spark.functions.text import fingerprint, word_shingles


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Keep one row (lowest id) per exact normalized-text fingerprint.

    Adds ``dup_count`` (group size). Single shuffle on the fingerprint.
    """
    fp = df.withColumn("__fp", fingerprint(F.col(text_col)))
    w = Window.partitionBy("__fp").orderBy(id_col)
    return (
        fp.withColumn("dup_count", F.count("*").over(Window.partitionBy("__fp")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )


def _minhash_columns(shingles: Column, num_hashes: int) -> Column:
    """Array of ``num_hashes`` min-hash values over a shingle array.

    Uses native xxhash64 with per-function seeds — JVM-side, no UDF.
    Empty shingle set -> array of NULLs (never matches anything).
    """
    def _minhash(seed: int) -> Column:
        # closure (not default-arg lambda: PySpark reads 2-param lambdas
        # as (element, index))
        return F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(seed))))

    return F.array(*[_minhash(i) for i in range(num_hashes)])


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    shingle_size: int = 3,
) -> DataFrame:
    """id + minhash signature array + shingle count."""
    sh = df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_size).alias("__sh")
    )
    return sh.select(
        id_col,
        _minhash_columns(F.col("__sh"), num_hashes).alias("signature"),
        F.size("__sh").alias("n_shingles"),
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str,
    bands: int = 8,
    max_bucket: int = 1000,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands, hash each
    band to a bucket, self-join per bucket -> candidate pairs (id_a < id_b).

    ``max_bucket`` caps pathological buckets (boilerplate skew) — the
    standard guard at web scale; capped buckets are dropped, trading
    recall for bounded work. Candidates are distinct pairs.
    """
    n = signatures.select(F.size("signature")).first()[0]
    rows_per_band = max(1, n // bands)
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice(
                                        "signature", b * rows_per_band + 1, rows_per_band
                                    ),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

    bucket_sizes = banded.groupBy("band", "bucket").count()
    small = banded.join(
        bucket_sizes.filter(F.col("count") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
    )
    a = small.select(F.col("band"), F.col("bucket"), F.col(id_col).alias("id_a"))
    b = small.select(F.col("band"), F.col("bucket"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_size: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (the verify stage).

    Joins shingle sets onto the pair list and computes
    |A ∩ B| / |A ∪ B| with native array ops.
    """
    sh = df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_size).alias("sh")
    )
    out = (
        candidates.join(
            sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
        )
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        )
        .withColumn(
            "union_", F.size("sh_a") + F.size("sh_b") - F.col("inter")
        )
        .withColumn("jaccard", F.try_divide(F.col("inter"), F.col("union_")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def near_dup_pairs_minhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded
    candidates -> exact Jaccard verification at ``threshold``."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size)
    cands = minhash_lsh_candidates(sigs, id_col, bands)
    return jaccard_verify(df, cands, text_col, id_col, threshold, shingle_size)


def jaccard_pairs_all(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_size: int = 1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard via the inverted-index join (no LSH):
    explode distinct shingles -> self-join on shingle -> pair
    intersection counts -> |A∩B| / (|A|+|B|-|A∩B|) >= threshold.

    This is the exact, SQL-expressible form; at 100 TB add
    ``max_doc_freq`` to drop boilerplate shingles that appear in more
    than N documents (the classic skew guard — a shingle present in
    every doc would otherwise create a quadratic bucket).
    """
    sh = df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_size).alias("__sh")
    )
    sizes = sh.select(F.col(id_col), F.size("__sh").alias("n"))
    tok = sh.select(F.col(id_col), F.explode("__sh").alias("w"))
    if max_doc_freq is not None:
        freq = tok.groupBy("w").count().filter(F.col("count") <= max_doc_freq)
        tok = tok.join(freq.select("w"), "w")
    a = tok.select(F.col(id_col).alias("id_a"), "w")
    b = tok.select(F.col(id_col).alias("id_b"), "w")
    pairs = (
        a.join(b, "w")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash64(text: Column, shingle_size: int = 2) -> Column:
    """64-bit SimHash over word shingles, all native bit ops.

    For each bit position, sum +1/-1 votes from each shingle's xxhash64
    bit; the sign of the sum gives the output bit.
    """
    sh = word_shingles(text, shingle_size)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))

    def bit_expr(i: int) -> Column:
        # bit 63 as a Python literal overflows signed long; same bit
        # pattern as the negative value
        mask = (1 << i) if i < 63 else -(1 << 63)
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(mask).cast("long")) != 0, 1).otherwise(-1),
        )
        return F.when(votes > 0, F.lit(mask).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    out = bit_expr(0)
    for i in range(1, 64):
        out = out.bitwiseOR(bit_expr(i))
    return out


def simhash_dedup(
    df: DataFrame, text_col: str, id_col: str, shingle_size: int = 2
) -> DataFrame:
    """Group rows by identical SimHash (strong near-dup signal); keep the
    lowest id per group, annotate group size."""
    h = df.withColumn("simhash", simhash64(F.col(text_col), shingle_size))
    w = Window.partitionBy("simhash").orderBy(id_col)
    return (
        h.withColumn("dup_count", F.count("*").over(Window.partitionBy("simhash")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
