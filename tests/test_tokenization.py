"""BPE merge training verified against a pure-Python reference
implementation of the published algorithm (Sennrich et al. 2016) on
the real documents table — merge-list equality is the differential
(the oracle is an independent implementation, like the union-find
check for connected components)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
EOW = "</w>"


def _reference_bpe(word_freq: dict[str, int], n_merges: int):
    state = {tuple(list(w) + [EOW]): f for w, f in word_freq.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, f in state.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max count, ties lexicographic on (left, right)
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append(
            {"rank": rank, "left": left, "right": right, "pair_count": cnt}
        )
        new_state = {}
        for syms, f in state.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new_state[tuple(out)] = new_state.get(tuple(out), 0) + f
        state = new_state
    return merges


def test_bpe_train_matches_reference_on_documents(spark):
    from hummingbirddatapipeline_spark.operators.tokenization import (
        bpe_train,
        word_freq_table,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents")
    wf = word_freq_table(docs, "text")
    freqs = {r["word"]: r["freq"] for r in wf.collect()}
    assert len(freqs) > 10
    got = bpe_train(wf, n_merges=12)
    exp = _reference_bpe(freqs, 12)
    assert got == exp
    # merges must be genuinely useful: multi-char symbols appear
    assert any(len(m["left"]) > 1 or len(m["right"]) > 1 for m in got[3:])


def test_bpe_segment_applies_merges_greedily(spark):
    from hummingbirddatapipeline_spark.operators.tokenization import (
        bpe_segment,
        bpe_train,
        word_freq_table,
    )

    rows = [(1, "low low low lower lowest"), (2, "new newer newest low")]
    df = spark.createDataFrame(rows, "id long, text string")
    merges = bpe_train(word_freq_table(df, "text"), n_merges=6)
    out = {r["id"]: r for r in bpe_segment(df, "text", merges).collect()}

    # python replay of the same merges over row 1
    def segment(word):
        syms = list(word) + [EOW]
        for m in merges:
            res = []
            for s in syms:
                if res and res[-1] == m["left"] and s == m["right"]:
                    res[-1] = m["left"] + m["right"]
                else:
                    res.append(s)
            syms = res
        return syms

    for rid, text in rows:
        exp = [t for w in text.split() for t in segment(w)]
        assert list(out[rid]["bpe_tokens"]) == exp
        assert out[rid]["n_bpe_tokens"] == len(exp)
    # compression happened: fewer tokens than characters
    assert out[1]["n_bpe_tokens"] < len(rows[0][1].replace(" ", "")) + 5


def test_bpe_segment_keeps_empty_docs_single_pass(spark):
    """r15 optimization restructure: the empty-doc branch rides
    posexplode_outer instead of an anti-join back through the
    segmentation (which re-inlined the corpus subtree). Contract:
    one output row per input row; zero-word docs get ([], 0); worded
    docs are unchanged."""
    from hummingbirddatapipeline_spark.operators.tokenization import (
        bpe_segment,
        bpe_train,
        word_freq_table,
    )

    rows = [
        (1, "low low lower"),
        (2, ""),            # empty string
        (3, "   \t  "),     # whitespace only -> zero words
        (4, "newest"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    merges = bpe_train(word_freq_table(df, "text"), n_merges=4)
    out = {r["id"]: r for r in bpe_segment(df, "text", merges).collect()}
    assert set(out) == {1, 2, 3, 4}
    for empty_id in (2, 3):
        assert list(out[empty_id]["bpe_tokens"]) == []
        assert out[empty_id]["n_bpe_tokens"] == 0
    assert out[1]["n_bpe_tokens"] > 0 and out[4]["n_bpe_tokens"] > 0
    # worded docs end with the end-of-word marker on the last token
    assert out[4]["bpe_tokens"][-1].endswith(EOW)
