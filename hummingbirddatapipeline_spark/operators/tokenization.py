"""Tokenizer-vocabulary induction: distributed BPE merge training.

The missing piece of a training-data pipeline's tokenizer story
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units"): byte-pair-encoding merges are learned from
the WORD-FREQUENCY dictionary, not the raw corpus — so the only
corpus-scale work is one tokenize+count aggregate, and the iterative
merge loop runs over a dictionary frame that is tiny relative to any
corpus (vocab grows ~log-ish with corpus size). That separation is
what makes tokenizer training tractable at 100 TB: scan once, then
iterate on kilobytes-to-megabytes of state.

Per merge iteration (the classic greedy algorithm):
1. count symbol bigrams across the dictionary, weighted by word
   frequency — one explode + hash aggregate over the dictionary frame;
2. pick the most frequent pair (ties: lexicographic on the pair, so
   the merge sequence is deterministic and engine-independent);
3. rewrite each word's symbol sequence, merging non-overlapping
   occurrences left to right — a single ``aggregate`` higher-order
   expression per row, no UDF.

State is lineage-cut with localCheckpoint each round (the CC /
pagerank pattern); the top-pair pick is one bounded driver action per
iteration (a single row), like CC's convergence counts. Verified
against a pure-Python reference implementation of the published
algorithm in tests/test_tokenization.py (merge-list equality, exact
greedy application semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_freq_table(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) dictionary — the ONE corpus-scale aggregate BPE
    training needs. Lowercased whitespace tokens, matching the repo's
    text-analysis tokenization."""
    from hummingbirddatapipeline_spark.functions.text import ws_tokens

    return (
        docs.select(
            F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _adjacent_pairs(syms_col):
    """Array of (left, right) structs for adjacent symbol pairs."""
    n = F.size(syms_col)
    return F.zip_with(
        F.slice(syms_col, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(syms_col, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )


def _apply_merge(syms_col, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) into
    one symbol — one ``aggregate`` pass per row, no UDF. After a merge
    the joined symbol cannot re-pair with the next element as ``left``
    unless it literally equals ``left`` (the published greedy rule)."""
    joined = left + right
    empty = F.array().cast("array<string>")
    return F.aggregate(
        syms_col,
        empty,
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(joined))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    word_freq: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from a (word, freq) dictionary.

    Returns the ordered merge list as dicts with ``rank`` (1-based),
    ``left``, ``right``, and ``pair_count`` (the frequency-weighted
    bigram count that won the rank). Initial symbols are the word's
    characters plus the ``</w>`` end marker (so merges can learn
    suffixes); ties break lexicographically on (left, right), making
    the sequence deterministic for any execution order.

    Stops early (returning fewer merges) when no bigram remains.
    """
    state = word_freq.select(
        F.col(freq_col).alias("freq"),
        F.concat(
            F.split(F.col(word_col), ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
    ).localCheckpoint()

    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        top = (
            state.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["cnt"]
        merges.append(
            {"rank": rank, "left": left, "right": right, "pair_count": cnt}
        )
        state = state.select(
            "freq", _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    return merges


def bpe_segment(
    df: DataFrame,
    text_col: str,
    merges: list[dict],
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a learned merge list to a text column. Returns
    ``id_cols`` (default: every non-text column) plus ``bpe_tokens``
    (flat array, in document word order) and ``n_bpe_tokens``.

    Segmentation is computed ONCE PER UNIQUE WORD, never per
    occurrence: the merge-replay chain (rank-ordered ``aggregate``
    array rewrites — the published inference rule) runs over the
    distinct-word dictionary, and documents get their tokens back via
    a broadcast join on the posexploded words, re-assembled in
    position order. Replaying merges per occurrence costs |corpus
    tokens| x |merges| interpreted array passes (measured 14.8 s warm
    at sf0.1); per dictionary entry it is |vocab| x |merges| — the
    same corpus-vs-dictionary separation that makes training
    tractable (measured 0.96 s warm, and the gap widens with corpus
    size since vocab grows ~logarithmically).
    """
    from hummingbirddatapipeline_spark.functions.text import ws_tokens

    if id_cols is None:
        id_cols = [c for c in df.columns if c != text_col]

    words = df.select(
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("__w")
    ).distinct()
    syms = F.concat(F.split(F.col("__w"), ""), F.array(F.lit(END_OF_WORD)))
    for m in merges:
        syms = _apply_merge(syms, m["left"], m["right"])
    # The segmented dictionary IS the tokenizer at rest (frozen merges
    # replayed once per unique word) — checkpoint it so repeated
    # executions broadcast the blocks instead of re-running the
    # |vocab| x |merges| interpreted array-rewrite chain (guide §1.2;
    # the dictionary is Heaps-law bounded, the same class as the
    # collected vocab stores).
    vocab = words.select(F.col("__w"), syms.alias("__toks")).localCheckpoint(
        eager=False
    )

    # posexplode_OUTER keeps zero-word documents as one NULL-word row,
    # so the empty-doc branch needs no anti-join back through the
    # segmentation — the old ``left_anti(assembled)`` shape re-inlined
    # the whole corpus subtree and cost two extra corpus scans per
    # pass (SQL-tab audit). collect_list skips the NULL struct the
    # guard produces, and coalesce turns "no segmented words" into the
    # same empty array the union branch emitted.
    pos = df.select(
        *id_cols,
        F.posexplode_outer(ws_tokens(F.lower(F.col(text_col)))).alias(
            "__pos", "__w"
        ),
    )
    joined = pos.join(F.broadcast(vocab), "__w", "left")
    return (
        joined.groupBy(*id_cols)
        .agg(
            F.coalesce(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("__pos").isNotNull(),
                                    F.struct(
                                        F.col("__pos").alias("p"),
                                        # ADVICE r15: a non-null word
                                        # missing from vocab would make
                                        # flatten() NULL the whole doc's
                                        # tokens and coalesce silently
                                        # rewrite them to []. The vocab
                                        # derives from the same df via
                                        # the identical ws_tokens
                                        # expression, so a miss is a
                                        # derivation bug — fail loudly
                                        # instead of losing data.
                                        F.when(
                                            F.col("__toks").isNotNull(),
                                            F.col("__toks"),
                                        )
                                        .otherwise(
                                            F.raise_error(
                                                F.concat(
                                                    F.lit(
                                                        "bpe_segment: word"
                                                        " missing from"
                                                        " vocab: "
                                                    ),
                                                    F.col("__w"),
                                                )
                                            )
                                        )
                                        .alias("t"),
                                    ),
                                )
                            )
                        ),
                        lambda s: s["t"],
                    )
                ),
                F.array().cast("array<string>"),
            ).alias("bpe_tokens")
        )
        .withColumn("n_bpe_tokens", F.size("bpe_tokens"))
    )


def bpe_fertility_by_lang(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Tokenizer-fertility report per language under a frozen BPE
    merge list — the vocabulary-equity metric every multilingual
    tokenizer ships with (a language whose fertility is 2x pays 2x
    the sequence length for the same words; chars-per-token is the
    compression the storage/serving stack sees). One row per
    language::

        (lang, n_docs, n_bpe_tokens, n_words, n_chars,
         fertility = bpe_tokens / words, chars_per_token)

    Both ratios are single divisions of exact BIGINT sums, rounded
    6dp — engine-portable by the count-division rule.

    Scale shape: :func:`bpe_segment`'s dictionary-replay plan (merge
    chain once per unique WORD, broadcast back), one id join to carry
    lang, ONE language aggregate.
    """
    from hummingbirddatapipeline_spark.functions.text import ws_tokens

    seg = bpe_segment(
        docs.select(id_col, text_col), text_col, merges, id_cols=[id_col]
    ).select(id_col, "n_bpe_tokens")
    base = docs.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        F.size(ws_tokens(F.lower(F.col(text_col))))
        .cast("long")
        .alias("__nw"),
        F.col("n_chars").cast("long").alias("__nc"),
    ).join(seg, id_col)
    agg = base.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.sum("__nw").cast("long").alias("n_words"),
        F.sum("__nc").cast("long").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_bpe_tokens",
        "n_words",
        "n_chars",
        F.round(
            F.col("n_bpe_tokens").cast("double")
            / F.col("n_words").cast("double"),
            6,
        ).alias("fertility"),
        F.round(
            F.col("n_chars").cast("double")
            / F.col("n_bpe_tokens").cast("double"),
            6,
        ).alias("chars_per_token"),
    )


def vocab_coverage(
    docs: DataFrame,
    vocab_sizes: "tuple[int, ...]" = (64, 256, 1024, 4096),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary-coverage curve — the tokenizer BUDGET planner: for
    each candidate vocabulary size V, what fraction of corpus token
    OCCURRENCES is covered by the top-V most frequent words (ranked
    count desc, word asc — deterministic). This is the measurement
    behind "how big must the vocab be before OOV/byte-fallback rates
    are acceptable" (the sizing step that precedes BPE training), and
    the curve's knee is the classic Zipf diagnostic for a corpus.

    Returns one row per V: (vocab_size, n_types, covered_occurrences,
    total_occurrences, coverage) — counts are exact BIGINTs; coverage
    is the single 6dp division, so the row hashes identically on any
    engine and any partitioning.

    Scale shape: one corpus explode -> one (word) hash aggregate
    (map-side combined); everything after runs on the VOCABULARY table
    (rank window + conditional sums over thousands-to-millions of
    rows, not the corpus). The single-partition window is over that
    vocab table only — the corpus never moves.
    """
    from pyspark.sql.window import Window

    from hummingbirddatapipeline_spark.functions.text import ws_tokens

    counts = (
        docs.select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    w_rank = Window.orderBy(F.col("c").desc(), F.col("w"))
    ranked = counts.withColumn("__rk", F.row_number().over(w_rank))
    # coalesce: SUM over zero rows is NULL — an EMPTY corpus must
    # still report every count as 0 and coverage as 0.0, not NULL
    # (the r10-ADVICE empty-input class, caught by the edge battery)
    return ranked.agg(
        F.count("*").alias("__n_types"),
        F.coalesce(F.sum("c"), F.lit(0)).alias("__total"),
        *[
            F.coalesce(
                F.sum(F.when(F.col("__rk") <= v, F.col("c")).otherwise(0)),
                F.lit(0),
            ).alias(f"__cov_{v}")
            for v in vocab_sizes
        ],
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(v).alias("vocab_size"),
                        F.col("__n_types").cast("long").alias("n_types"),
                        F.col(f"__cov_{v}")
                        .cast("long")
                        .alias("covered_occurrences"),
                        F.col("__total").cast("long").alias(
                            "total_occurrences"
                        ),
                        F.when(
                            F.col("__total") > 0,
                            F.round(
                                F.col(f"__cov_{v}").cast("double")
                                / F.col("__total").cast("double"),
                                6,
                            ),
                        )
                        .otherwise(F.lit(0.0))
                        .alias("coverage"),
                    )
                    for v in vocab_sizes
                ]
            )
        ).alias("r")
    ).select("r.*")


def pack_length_groups(
    docs: DataFrame,
    bin_tokens: int = 64,
    batch_size: int = 8,
    seed: str = "lg0",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-grouped batching plan — the dynamic-batching layout a
    trainer uses to stop burning FLOPs on padding: documents bucket
    into token-length bins, each bin is content-hash-shuffled
    (deterministic, rerun/repartition-stable — never an RNG) and cut
    into fixed-size batches, and every batch reports its padding
    efficiency (1 - sum_len / (max_len * n_docs), the fraction of the
    padded tensor that is waste). Length-grouped sampling is the
    standard serving/training trick (HuggingFace group_by_length /
    fairseq max-tokens batching reduced to its deterministic core).

    Returns one row per batch: (bin_id, batch_seq, n_docs, max_tokens,
    sum_tokens, padding_frac 6dp). All counts exact BIGINTs; the
    md5-keyed order makes batch membership content-addressed, so both
    engines and any partitioning produce identical batches.

    Scale shape: one scan computes token counts map-side; ONE
    bin-keyed exchange feeds the row_number window AND the per-batch
    aggregate (same partitioning — no second shuffle). Bins are
    bounded (max doc length / bin width), batches within a bin are
    independent — embarrassingly parallel at any corpus size.
    """
    from pyspark.sql.window import Window

    from hummingbirddatapipeline_spark.functions.text import ws_token_count

    if bin_tokens < 1 or batch_size < 1:
        raise ValueError("pack_length_groups: bin_tokens and batch_size >= 1")
    base = docs.select(
        F.col(id_col),
        ws_token_count(F.col(text_col)).cast("long").alias("__n"),
    ).select(
        id_col,
        "__n",
        (F.col("__n") / bin_tokens).cast("int").alias("bin_id"),
        F.md5(
            F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))
        ).alias("__key"),
    )
    w = Window.partitionBy("bin_id").orderBy("__key", id_col)
    batched = base.withColumn(
        "batch_seq",
        ((F.row_number().over(w) - 1) / batch_size).cast("int"),
    )
    return batched.groupBy("bin_id", "batch_seq").agg(
        F.count("*").alias("n_docs"),
        F.max("__n").alias("max_tokens"),
        F.sum("__n").alias("sum_tokens"),
        F.coalesce(
            F.round(
                1.0
                - F.sum("__n").cast("double")
                / (
                    F.nullif(
                        F.max("__n").cast("double") * F.count("*"), F.lit(0.0)
                    )
                ),
                6,
            ),
            F.lit(0.0),
        ).alias("padding_frac"),
    )


def pack_concat_manifest(
    docs: DataFrame,
    seq_len: int = 128,
    num_shards: int = 8,
    seed: str = "cc0",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing manifest — the GPT-pretraining layout
    (documents concatenated into a token stream, cut into fixed
    ``seq_len`` sequences, documents crossing sequence boundaries)
    reduced to its deterministic manifest: for every document, WHERE
    in the stream it lands. The scale-correct form is per-SHARD
    streams (each worker owns one stream — a truly global concat
    needs a global prefix sum, the single-partition anti-pattern):
    docs route to ``num_shards`` streams by a portable md5 hash and
    are ordered within the shard by a content-addressed md5 key, so
    the layout is rerun/repartition-stable and engine-replayable.

    Returns one row per non-empty document: (id, shard, n_tokens,
    offset, start_seq, start_pos, end_seq, n_seqs) where offset is
    the exact prefix-sum of prior docs in the shard stream,
    start_seq/start_pos = offset divmod seq_len, end_seq the sequence
    holding the doc's last token, n_seqs how many sequences the doc
    touches. All exact BIGINT arithmetic. Zero-token docs carry no
    tokens and are dropped (documented contract — a manifest row with
    an empty span has no meaning downstream).

    Scale shape: token counts are map-side; ONE shard-keyed exchange
    feeds the running-sum window; everything after is per-row integer
    arithmetic. Shards are independent — embarrassingly parallel at
    any corpus size, and ``num_shards`` is the worker parallelism
    knob, not a data-sized value.
    """
    from pyspark.sql.window import Window

    from hummingbirddatapipeline_spark.functions.text import ws_token_count

    if seq_len < 1 or num_shards < 1:
        raise ValueError("pack_concat_manifest: seq_len and num_shards >= 1")
    base = docs.select(
        F.col(id_col),
        ws_token_count(F.col(text_col)).cast("long").alias("__n"),
        F.md5(
            F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))
        ).alias("__key"),
    ).filter(F.col("__n") > 0)
    # portable shard route: low 52 bits of md5, mod num_shards —
    # integer arithmetic DuckDB replays exactly (pmod for the
    # non-negative convention both engines share on non-negative args)
    shard = F.pmod(
        F.conv(F.substring(F.col("__key"), 1, 13), 16, 10).cast("long"),
        F.lit(num_shards),
    ).cast("int")
    routed = base.select(
        id_col, "__n", "__key", shard.alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("__n").over(w), F.lit(0))
    return routed.select(
        id_col,
        "shard",
        F.col("__n").alias("n_tokens"),
        offset.alias("offset"),
    ).select(
        id_col,
        "shard",
        "n_tokens",
        "offset",
        (F.col("offset") / seq_len).cast("long").alias("start_seq"),
        (F.col("offset") % seq_len).alias("start_pos"),
        ((F.col("offset") + F.col("n_tokens") - 1) / seq_len)
        .cast("long")
        .alias("end_seq"),
    ).withColumn(
        "n_seqs", (F.col("end_seq") - F.col("start_seq") + 1).cast("long")
    )


def heaps_vocab_growth(
    docs: DataFrame,
    fractions: "tuple[float, ...]" = (0.25, 0.5, 0.75, 1.0),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary GROWTH curve (the Heaps-law observation, the
    companion diagnostic to :func:`vocab_coverage`'s Zipf curve): at
    corpus prefixes cut at ``fractions`` of the doc-id range, how many
    word types have been seen, over how many token occurrences and
    documents. How fast vocabulary grows as the corpus grows is what
    decides whether a tokenizer trained on a sample will hold up on
    the full crawl — the sub-linearity of n_types in n_tokens IS
    Heaps' law, observed instead of assumed.

    Prefixes cut on the id RANGE (cut_id = floor(max_id * f)) — a
    pure aggregate, deterministic on any engine; n_docs per prefix is
    reported so a non-uniform id distribution reads correctly.

    Returns one row per fraction: (frac, cut_id, n_docs, n_tokens,
    n_types, type_token_ratio) — exact BIGINTs + one 6dp division.

    Scale shape: ONE corpus explode to a skinny (id, word) frame,
    checkpointed because it feeds BOTH aggregates (store+probe): the
    per-WORD first-occurrence table (map-side combined min) and the
    per-DOC token counts; each then collapses through K conditional
    sums against the broadcast 1-row cut frame (the documented
    single-row crossJoin — the only BroadcastNestedLoopJoin, K rows).
    The corpus never moves; both aggregate tables are
    vocabulary/doc-sized, not corpus-sized.
    """
    from hummingbirddatapipeline_spark.functions.text import ws_tokens

    occ = docs.select(
        F.col(id_col),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("w"),
    ).localCheckpoint(eager=False)
    # coalesce: MAX over zero rows is NULL — an EMPTY corpus must
    # still produce integer cuts (0) and zero counts, not NULLs
    cuts = docs.agg(
        F.coalesce(F.max(F.col(id_col)), F.lit(0)).alias("__max_id")
    ).select(
        *[
            (F.col("__max_id") * F.lit(float(f)))
            .cast("long")
            .alias(f"__cut_{i}")
            for i, f in enumerate(fractions)
        ]
    )
    per_word = occ.groupBy("w").agg(F.min(id_col).alias("__first"))
    types_row = per_word.crossJoin(F.broadcast(cuts)).agg(
        *[
            F.coalesce(
                F.sum(
                    (F.col("__first") <= F.col(f"__cut_{i}")).cast("int")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__types_{i}")
            for i in range(len(fractions))
        ]
    )
    per_doc = occ.groupBy(id_col).agg(F.count("*").alias("__n_tok"))
    docs_row = per_doc.crossJoin(F.broadcast(cuts)).agg(
        *(
            [
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(id_col) <= F.col(f"__cut_{i}"),
                            F.col("__n_tok"),
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__tokens_{i}")
                for i in range(len(fractions))
            ]
            + [
                F.coalesce(
                    F.sum(
                        (F.col(id_col) <= F.col(f"__cut_{i}")).cast("int")
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__docs_{i}")
                for i in range(len(fractions))
            ]
        )
    )
    combined = types_row.crossJoin(docs_row).crossJoin(F.broadcast(cuts))
    return combined.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(f)).alias("frac"),
                        F.col(f"__cut_{i}").alias("cut_id"),
                        F.col(f"__docs_{i}").alias("n_docs"),
                        F.col(f"__tokens_{i}").alias("n_tokens"),
                        F.col(f"__types_{i}").alias("n_types"),
                        F.when(
                            F.col(f"__tokens_{i}") > 0,
                            F.round(
                                F.col(f"__types_{i}").cast("double")
                                / F.col(f"__tokens_{i}").cast("double"),
                                6,
                            ),
                        )
                        .otherwise(F.lit(0.0))
                        .alias("type_token_ratio"),
                    )
                    for i, f in enumerate(fractions)
                ]
            )
        ).alias("r")
    ).select("r.*")


def length_profile_by_source(
    docs: DataFrame,
    text_col: str = "text",
    strata_col: str = "source",
) -> DataFrame:
    """Per-source document-LENGTH profile — exact interpolated
    percentiles of whitespace token counts plus an exact-cent mean.
    The sizing table behind packing/batching decisions (seq_len,
    bin_tokens, batch budgets all read off this) and the per-source
    drift check on ingest ("vendor B's docs suddenly halved").

    Exactness: token counts are integers; Spark ``percentile`` and
    DuckDB ``quantile_cont`` interpolate identically (the (n-1)*p
    linear rule — verified bit-for-bit for the median before the MAD
    row was written, extended here to the quartile grid), so every
    percentile is an exact dyadic rational both engines produce
    identically; the mean rides the exact-long trick (sum of counts,
    one ROUND to e2).

    Returns (source, n_docs, p25, p50, p75, p95, mean_tok_e2).

    Scale shape: one map-side token count -> ONE stratum aggregate
    (percentile is a within-group exact aggregate over integer
    counts; at 100 TB strata are bounded and independent).
    """
    from hummingbirddatapipeline_spark.functions.text import ws_token_count

    base = docs.select(
        F.col(strata_col),
        ws_token_count(F.col(text_col)).cast("long").alias("__n"),
    )
    return base.groupBy(strata_col).agg(
        F.count("*").alias("n_docs"),
        F.expr("percentile(__n, 0.25)").alias("p25"),
        F.expr("percentile(__n, 0.5)").alias("p50"),
        F.expr("percentile(__n, 0.75)").alias("p75"),
        F.expr("percentile(__n, 0.95)").alias("p95"),
        F.round(
            F.sum("__n").cast("double") * 100.0 / F.count("*")
        )
        .cast("long")
        .alias("mean_tok_e2"),
    )
