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


def winnow_containment(
    train: DataFrame,
    benchmark: DataFrame,
    k: int = 4,
    w: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    min_shared: int = 1,
    round_dp: int = 6,
) -> DataFrame:
    """Cross-corpus containment via winnowing fingerprints — the
    decontamination completion: instead of asking "does this train doc
    share any n-gram with the benchmark" (:func:`ngram_contamination`,
    a boolean per doc), score HOW MUCH of each benchmark document is
    contained in each train document, using the winnowed fingerprint
    sets (functions/text.winnow_fingerprints) whose ~1/w density makes
    the pairwise join tractable at corpus scale while the published
    winnowing guarantee keeps it recall-complete for shared substrings
    of length >= w + k - 1 tokens.

    For every (train, bench) pair sharing >= ``min_shared`` distinct
    fingerprint HASHES (the packed position bits are stripped with an
    exact ``shiftright`` — cross-document matching is on the selected
    k-gram hash, not on where it sat), returns::

        (train_id, bench_id, n_shared, bench_fps,
         containment = round(n_shared / bench_fps, round_dp))

    ``containment`` ~ the fraction of the benchmark doc's fingerprinted
    content present in the train doc — 1.0 means every selected
    k-gram of the benchmark document appears; thresholding at ~0.5
    catches embedded/quoted benchmark items that a whole-doc near-dup
    check misses.

    Scale shape: fingerprinting is ZERO-exchange per doc (pure
    expressions); each side reduces to an exploded (id, hash) stream
    at ~1/w the corpus k-gram density; the benchmark side is small by
    construction and broadcasts, so the corpus never shuffles — the
    same join geometry as :func:`ngram_contamination` but with a
    graded score and w-fold less probe volume."""
    from hummingbirddatapipeline_spark.functions.text import (
        winnow_fingerprints,
    )

    def hashes(df: DataFrame, col: str, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(winnow_fingerprints(F.col(col), k=k, w=w)).alias(
                "__fp"
            ),
        ).select(
            out_id,
            # exact unpack of the 52-bit hash (2048 = 2^11; a double
            # division would lose low bits past 2^53)
            F.shiftright(F.col("__fp"), 11).alias("__h"),
        ).distinct()

    # the bench fingerprint set is consumed by the shared-hash join AND
    # the per-doc size table; it is small by construction (benchmark
    # side), so checkpoint it rather than re-running the fingerprint
    # explode per reference (r11 scan audit)
    bench_h = hashes(benchmark, bench_text_col, "bench_id").localCheckpoint(
        eager=False
    )
    bench_sz = bench_h.groupBy("bench_id").agg(
        F.count("*").alias("bench_fps")
    )
    train_h = hashes(train, text_col, "train_id")
    shared = (
        train_h.join(F.broadcast(bench_h), "__h")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return shared.join(F.broadcast(bench_sz), "bench_id").select(
        "train_id",
        "bench_id",
        "n_shared",
        "bench_fps",
        F.round(F.col("n_shared") / F.col("bench_fps"), round_dp).alias(
            "containment"
        ),
    )


def bloom_gram_screen(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    n_words: int = 16,
    n_hashes: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Bloom-filter decontamination SCREEN: the constant-size stand-in
    for :func:`ngram_contamination`'s broadcast gram table when the
    benchmark suite is too large to ship as a hash table.

    The benchmark's distinct word ``n``-grams are folded into a Bloom
    filter of ``n_words`` 63-bit words (``n_hashes`` set positions per
    gram); the corpus probe then tests each document gram against the
    filter with pure bit arithmetic — the filter rides the plan as ONE
    broadcast row of BIGINTs, so the corpus side is a zero-shuffle scan
    + one per-doc aggregate no matter how many grams the benchmark
    holds. A 1e8-gram benchmark suite is a ~GB hash table but still
    only ``n_words*8`` bytes of Bloom words at the same plan shape
    (size the filter off-line: FP rate ~ (1-e^{-hN/m})^h).

    Guarantee (the screen contract): NO FALSE NEGATIVES — every
    document :func:`ngram_contamination` flags is flagged here, because
    all ``n_hashes`` positions of a benchmark gram are set by
    construction. False positives pass the screen and are cleaned by
    running the exact check on the (small) screened subset — the
    screen-then-verify layout, same as the ANN rerank rows.

    Cross-engine exactness choices: positions come from the repo's
    52-bit md5 idiom (``conv(substr(md5(gram || '#b<j>'),1,13),16,10)``
    — bit-identical in DuckDB as ``CAST('0x'||... AS BIGINT)``), and
    words hold 63 usable bits (bit 62 max) because DuckDB raises on
    ``1 << 63`` where Spark wraps to the sign bit — one dead bit per
    word buys an engine-exact filter.

    Returns (id_col, n_grams, n_bloom_hits, screened).
    """
    m_bits = n_words * 63

    def positions(g: Column) -> list[Column]:
        return [
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(g, F.lit(f"#b{j}"))), 1, 13
                    ),
                    16,
                    10,
                ).cast("long")
                % m_bits
            )
            for j in range(n_hashes)
        ]

    # Spark's shiftleft/shiftright only accept literal bit counts from
    # the DataFrame API — the data-dependent shifts go through F.expr.
    bench_pos = (
        benchmark.select(
            F.explode(word_ngrams(F.col(bench_text_col), n)).alias("g")
        )
        .distinct()
        .select(F.explode(F.array(*positions(F.col("g")))).alias("p"))
    )
    bloom_row = bench_pos.groupBy().agg(
        *[
            F.coalesce(
                F.bit_or(
                    F.expr(
                        f"CASE WHEN CAST(p DIV 63 AS INT) = {j} THEN "
                        "shiftleft(CAST(1 AS BIGINT), "
                        "CAST(p % 63 AS INT)) END"
                    )
                ),
                F.lit(0).cast("long"),
            ).alias(f"__bw{j}")
            for j in range(n_words)
        ]
        # ONE row of n_words BIGINTs — the filter at rest (production
        # builds it offline, once); checkpointed so repeated executions
        # broadcast the row instead of re-folding the benchmark gram
        # set per pass (guide §1.2; bounded model state).
    ).localCheckpoint(eager=False)

    doc_grams = docs.select(
        id_col, F.explode_outer(word_ngrams(F.col(text_col), n)).alias("g")
    )
    probed = doc_grams.crossJoin(F.broadcast(bloom_row))
    for j, p in enumerate(positions(F.col("g"))):
        probed = probed.withColumn(f"__p{j}", p)
    arr_sql = "array(" + ", ".join(f"__bw{j}" for j in range(n_words)) + ")"
    check_sql = " AND ".join(
        f"(shiftright(element_at({arr_sql}, CAST(__p{j} DIV 63 AS INT) + 1),"
        f" CAST(__p{j} % 63 AS INT)) & 1) = 1"
        for j in range(n_hashes)
    )
    flagged = probed.withColumn(
        "__hit",
        F.coalesce(F.expr(check_sql), F.lit(False)).cast("int"),
    )
    return flagged.groupBy(id_col).agg(
        F.count("g").alias("n_grams"),
        F.sum("__hit").alias("n_bloom_hits"),
        (F.sum("__hit") >= min_hits).alias("screened"),
    )


def decontaminate_clusters(
    docs: DataFrame,
    benchmark: DataFrame,
    pairs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_hits: int = 1,
    cc_labels: DataFrame | None = None,
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

    Scale shape: the per-doc check is the broadcast gram join — the
    corpus text is scanned and exploded EXACTLY ONCE (the cluster
    escalation is a window max over ``cluster_id``, not a
    groupBy-and-join-back, which would reference — and so recompute —
    the gram subtree a second time: Catalyst inlines repeated
    DataFrame references, it does not share them); the cluster
    closure is the shared CC labeling; the only post-gram exchange is
    the skinny (id, cluster, counts) rows keyed by cluster_id.
    """
    from pyspark.sql import Window
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
    labels = (
        cc_labels
        if cc_labels is not None
        else connected_components(pairs)
    ).select(F.col("node").alias(id_col), "cluster_id")
    labeled = docs.select(id_col).join(labels, id_col, "left").select(
        id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")
    )
    # one corpus-width frame: every doc, its cluster, its benchmark
    # membership, and (train docs only — bench rows have no cont row,
    # ngram_contamination emits one row per TRAIN doc) the gram counts
    full = labeled.join(
        bench_ids.withColumn("__b", F.lit(1)), id_col, "left"
    ).join(cont, id_col, "left")
    wc = Window.partitionBy("cluster_id")
    flagged = full.withColumn(
        "cluster_contaminated",
        (F.max(F.coalesce(F.col("__b"), F.lit(0))).over(wc) == 1)
        | (
            F.max(
                F.coalesce(F.col("contaminated").cast("int"), F.lit(0))
            ).over(wc)
            == 1
        ),
    )
    return flagged.filter(F.col("__b").isNull()).select(
        id_col,
        "cluster_id",
        "n_grams",
        "n_hit_grams",
        F.col("contaminated").alias("doc_contaminated"),
        "cluster_contaminated",
        (~F.col("cluster_contaminated")).alias("kept"),
    )


def bloom_fpr_report(
    docs: DataFrame,
    split_id: int = 250,
    n_words: int = 16,
    n_hashes: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter FALSE-POSITIVE-RATE report, fully value-oracled —
    the membership member of the observe-don't-trust sketch family
    (count-min: frequency; HLL: cardinality; this: the FPR the
    screen-then-verify layout of :func:`bloom_gram_screen` budgets its
    exact-check stage against). Members are the distinct words of docs
    below ``split_id``; probes are words EXCLUSIVE to the rest of the
    corpus (true non-members by construction), so every hit among them
    is a false positive. Reports the observed FPR next to the
    theoretical ``(1 - (1 - 1/m)^(k*n)) ^ k``.

    Same engine-exact conventions as the screen: 52-bit md5 positions,
    63 usable bits per BIGINT word (DuckDB raises on 1 << 63 where
    Spark wraps). Returns one row: (m_bits, n_members, n_probes, n_fp,
    fpr, fpr_theory) — counts exact BIGINTs, the two rates 6dp (the
    theory value holds the one libm pow; the observed side is pure
    integer arithmetic).

    Scale shape: member/probe sets are vocab-sized distincts off one
    corpus scan each side of the split; the filter rides as ONE
    broadcast row of BIGINTs; probing is a zero-shuffle scan over the
    probe vocabulary.
    """
    from hummingbirddatapipeline_spark.functions.text import ws_tokens

    m_bits = n_words * 63

    def positions(g: Column) -> list[Column]:
        return [
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(g, F.lit(f"#b{j}"))), 1, 13
                    ),
                    16,
                    10,
                ).cast("long")
                % m_bits
            )
            for j in range(n_hashes)
        ]

    words = docs.select(
        F.col(id_col),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("g"),
    )
    members = (
        words.filter(F.col(id_col) < split_id).select("g").distinct()
    ).localCheckpoint(eager=False)
    probes = (
        words.filter(F.col(id_col) >= split_id)
        .select("g")
        .distinct()
        .join(members, "g", "left_anti")
    )
    bench_pos = members.select(
        F.explode(F.array(*positions(F.col("g")))).alias("p")
    )
    bloom_row = bench_pos.groupBy().agg(
        *[
            F.coalesce(
                F.bit_or(
                    F.expr(
                        f"CASE WHEN CAST(p DIV 63 AS INT) = {j} THEN "
                        "shiftleft(CAST(1 AS BIGINT), "
                        "CAST(p % 63 AS INT)) END"
                    )
                ),
                F.lit(0).cast("long"),
            ).alias(f"__bw{j}")
            for j in range(n_words)
        ]
        # ONE row of n_words BIGINTs — the filter at rest (production
        # builds it offline, once); checkpointed so repeated executions
        # broadcast the row instead of re-folding the benchmark gram
        # set per pass (guide §1.2; bounded model state).
    ).localCheckpoint(eager=False)
    probed = probes.crossJoin(F.broadcast(bloom_row))
    for j, p in enumerate(positions(F.col("g"))):
        probed = probed.withColumn(f"__p{j}", p)
    arr_sql = "array(" + ", ".join(f"__bw{j}" for j in range(n_words)) + ")"
    check_sql = " AND ".join(
        f"(shiftright(element_at({arr_sql}, CAST(__p{j} DIV 63 AS INT) + 1),"
        f" CAST(__p{j} % 63 AS INT)) & 1) = 1"
        for j in range(n_hashes)
    )
    fp = probed.agg(
        F.count("*").alias("n_probes"),
        F.coalesce(F.sum(F.expr(check_sql).cast("int")), F.lit(0))
        .cast("long")
        .alias("n_fp"),
    )
    n_m = members.agg(F.count("*").alias("n_members"))
    theory = F.round(
        F.pow(
            1.0
            - F.pow(
                F.lit(1.0 - 1.0 / m_bits),
                (F.lit(n_hashes) * F.col("n_members")).cast("double"),
            ),
            F.lit(float(n_hashes)),
        ),
        6,
    )
    return (
        fp.crossJoin(F.broadcast(n_m))
        .select(
            F.lit(m_bits).alias("m_bits"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("n_probes").cast("long").alias("n_probes"),
            "n_fp",
            F.when(
                F.col("n_probes") > 0,
                F.round(
                    F.col("n_fp").cast("double")
                    / F.col("n_probes").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("fpr"),
            theory.alias("fpr_theory"),
        )
    )
