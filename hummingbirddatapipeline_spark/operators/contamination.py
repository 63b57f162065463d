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


def decontaminate_clusters(
    docs: DataFrame,
    benchmark: DataFrame,
    pairs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_hits: int = 1,
) -> DataFrame:
    """CLUSTER-AWARE benchmark decontamination: per-document n-gram
    collision (:func:`ngram_contamination`) hardened with the same
    move that makes splits leak-free (operators/sampling.
    split_leakfree) — near-dup clusters are dropped WHOLE. A training
    doc is excluded when its cluster (a) contains any benchmark
    member, or (b) contains any train member with >= ``min_hits``
    benchmark n-gram hits. This closes the near-dup leak the per-doc
    check misses: a paraphrased twin of a contaminated doc can carry
    zero colliding n-grams itself yet still leak the benchmark's
    content into training.

    ``benchmark`` rows whose id also appears in ``docs`` define the
    benchmark membership; training docs are ``docs`` minus those ids.
    ``pairs`` is the near-dup edge list over ALL of ``docs`` (benchmark
    members included — their cluster membership is exactly what rule
    (a) needs).

    Returns one row per TRAIN doc: (id, cluster_id, n_grams,
    n_hit_grams, doc_contaminated, cluster_contaminated, kept) with
    ``kept`` = NOT cluster_contaminated.

    Scale shape: the per-doc check is the broadcast gram join (corpus
    never shuffles); the cluster closure is the shared CC labeling;
    the escalation is one hash aggregate over (cluster_id) plus one
    skinny join back — nothing new shuffles at corpus width.
    """
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
    )

    bench_ids = benchmark.select(F.col(id_col)).distinct()
    train = docs.join(bench_ids, id_col, "left_anti")
    cont = ngram_contamination(
        train,
        benchmark,
        n=n,
        text_col=text_col,
        id_col=id_col,
        min_hits=min_hits,
    )
    labels = connected_components(pairs).select(
        F.col("node").alias(id_col), "cluster_id"
    )
    labeled = docs.select(id_col).join(labels, id_col, "left").select(
        id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")
    )
    is_bench = labeled.join(
        bench_ids.withColumn("__b", F.lit(1)), id_col, "left"
    )
    cluster_flag = (
        is_bench.join(
            cont.select(id_col, "contaminated"), id_col, "left"
        )
        .groupBy("cluster_id")
        .agg(
            (
                (F.max(F.coalesce(F.col("__b"), F.lit(0))) == 1)
                | (
                    F.max(
                        F.coalesce(F.col("contaminated").cast("int"), F.lit(0))
                    )
                    == 1
                )
            ).alias("cluster_contaminated")
        )
    )
    return (
        labeled.join(cont, id_col)
        .join(cluster_flag, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            "n_grams",
            "n_hit_grams",
            F.col("contaminated").alias("doc_contaminated"),
            "cluster_contaminated",
            (~F.col("cluster_contaminated")).alias("kept"),
        )
    )
