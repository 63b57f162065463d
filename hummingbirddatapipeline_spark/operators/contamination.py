"""Benchmark-contamination detection (north-star extension): flag
training documents that share word n-grams with an evaluation set.

The standard decontamination recipe (n-gram collision against the eval
corpus) as two scan-friendly stages:

1. benchmark n-grams: distinct word n-grams of the (small) eval set —
   broadcast to every executor;
2. document n-grams: explode each training doc's distinct n-grams and
   hash-join against the broadcast set; aggregate per doc.

Scale: cost is O(total tokens) with a broadcast join — no shuffle of
the corpus; the benchmark side is the small one by construction. For
benchmark sets too large to broadcast the same plan degrades to a
shuffle hash join on the n-gram (still linear).

The n-gram generation is pure native expressions (split + transform +
array slicing), so the whole operator is whole-stage-codegen'd and
exactly reproducible on any engine — the catalog query verifies it
verbatim against DuckDB list comprehensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct space-joined word n-grams of a text column (native
    expressions only).

    The token array is BOUND once per row (single-element-array
    transform) before the per-position lambda: higher-order functions
    are interpreted, and inlining the tokenizer in the lambda body
    re-splits the document at every gram position — an O(L^2) blowup.
    """
    toks = F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")

    def grams(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(-1)))
        return F.when(
            F.size(t) >= n,
            F.transform(
                idx, lambda i: F.array_join(F.slice(t, i + 1, n), " ")
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.array_distinct(F.transform(F.array(toks), grams)[0])


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Per-document contamination report vs a benchmark corpus.

    Returns (id_col, n_grams, n_hit_grams, contaminated) where
    ``contaminated`` is true when at least ``min_hits`` distinct
    n-grams of the document also occur in the benchmark.
    """
    # join on xxhash64(gram), not the gram string: the broadcast table
    # and the probe keys move 8-byte longs instead of ~n-word strings
    # (~6x smaller at n=8), and long equality beats string equality in
    # the hash probe. A cross-gram xxhash64 collision would need ~2^32
    # distinct benchmark grams to reach even ~50% birthday odds — far
    # beyond any broadcastable benchmark set.
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(F.col(bench_text_col), n)).alias("g")
        )
        .select(F.xxhash64(F.col("g")).alias("gh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # single corpus scan: explode_outer keeps gram-less docs as one NULL
    # row, grams are hashed post-explode (whole-stage-codegen'd; the
    # explode feeds the broadcast join within one stage, so the strings
    # never shuffle), the left broadcast join marks benchmark
    # collisions, and one aggregation produces total and hit counts
    doc_grams = docs.select(
        id_col, F.explode_outer(word_ngrams(F.col(text_col), n)).alias("g")
    ).withColumn(
        # xxhash64(NULL) is the seed hash, not NULL — guard so the
        # explode_outer placeholder row can never join
        "gh",
        F.when(F.col("g").isNotNull(), F.xxhash64(F.col("g"))),
    )
    marked = doc_grams.join(F.broadcast(bench_grams), "gh", "left")
    return marked.groupBy(id_col).agg(
        F.count("g").alias("n_grams"),
        F.count("__hit").alias("n_hit_grams"),
        (F.count("__hit") >= min_hits).alias("contaminated"),
    )
