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
) -> DataFrame:
    """Apply a learned merge list to a text column: per row, tokenize
    to words, split each word to characters + ``</w>``, then replay
    the merges IN RANK ORDER (the published inference rule). Returns
    the input plus ``bpe_tokens`` (flat array) and ``n_bpe_tokens``.

    Pure expressions — the merge list compiles into a chain of
    ``transform``/``aggregate`` array ops riding whole-stage codegen;
    at inference scale this is a map-only projection, trivially
    parallel. For large merge lists compile in batches or move to a
    broadcast trie inside a pandas UDF — the 100 TB-relevant property
    (map-only, no shuffle) is unchanged.
    """
    from hummingbirddatapipeline_spark.functions.text import ws_tokens

    words = ws_tokens(F.lower(F.col(text_col)))
    syms = F.transform(
        words,
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(END_OF_WORD))),
    )
    for m in merges:
        left, right = m["left"], m["right"]
        syms = F.transform(syms, lambda s: _apply_merge(s, left, right))
    flat = F.flatten(syms)
    return df.withColumn("bpe_tokens", flat).withColumn(
        "n_bpe_tokens", F.size(flat)
    )
