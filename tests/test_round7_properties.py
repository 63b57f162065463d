"""Randomized invariant tests for the round-7 operators: incremental
dedup decisions vs a brute-force Python Jaccard recompute (sparse
prefix path AND dense bitmask path on the same corpus), and
determinism of the hash-derived contrastive draw. One seeded batch
through Spark per test (no per-example JVM round trips)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _random_corpus(rng, vocab, n_docs=60, planted_dups=8):
    docs = []
    for i in range(n_docs):
        n = rng.randint(5, 18)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # planted near-dups of store docs (even ids): copy an even doc's
    # text and perturb one token
    for j in range(planted_dups):
        src = docs[2 * j][1].split()
        if len(src) > 1:
            src[rng.randrange(len(src))] = rng.choice(vocab)
        docs.append((1001 + 2 * j, " ".join(src)))  # odd id -> batch
    return docs


def _brute_decisions(docs, threshold):
    sets = {i: frozenset(t.split()) for i, t in docs}
    store = {i for i, _ in docs if i % 2 == 0}
    batch = {i for i, _ in docs if i % 2 == 1}
    out = {}
    for b in batch:
        best = None
        for s in sorted(store):
            a, c = sets[b], sets[s]
            if not a and not c:
                continue
            j = len(a & c) / len(a | c) if (a | c) else 0.0
            if j >= threshold:
                best = s
                break  # min store id
        out[b] = best
    return out


def _spark_decisions(spark, docs, threshold, **kw):
    from hummingbirddatapipeline_spark.operators.dedup import (
        build_jaccard_store,
        incremental_jaccard_dedup,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    store = build_jaccard_store(
        df.filter(F.col("doc_id") % 2 == 0), "text", "doc_id", shingle_size=1
    )
    res = incremental_jaccard_dedup(
        df.filter(F.col("doc_id") % 2 == 1),
        store,
        "text",
        "doc_id",
        threshold=threshold,
        shingle_size=1,
        **kw,
    )
    return {r["doc_id"]: r["match_store_id"] for r in res.collect()}


def test_incremental_sparse_path_matches_brute(spark):
    """A >64-token vocabulary forces the prefix-filter posting path;
    its accept/match decisions must equal brute-force set Jaccard."""
    rng = random.Random(74)
    vocab = [f"w{i:03d}" for i in range(120)]
    docs = _random_corpus(rng, vocab)
    got = _spark_decisions(spark, docs, 0.6)
    exp = _brute_decisions(docs, 0.6)
    assert got == exp
    assert any(v is not None for v in exp.values())  # planted dups hit


def test_incremental_dense_path_matches_brute_and_sparse(spark):
    """A <=64-token vocabulary engages the bitmask regime; decisions
    must equal brute force AND the force-disabled sparse path."""
    rng = random.Random(75)
    vocab = [f"v{i:02d}" for i in range(40)]
    docs = _random_corpus(rng, vocab)
    dense = _spark_decisions(spark, docs, 0.6)
    sparse = _spark_decisions(spark, docs, 0.6, dense_vocab_limit=0)
    exp = _brute_decisions(docs, 0.6)
    assert dense == exp
    assert sparse == exp
    assert any(v is not None for v in exp.values())


def test_contrastive_negatives_deterministic_and_in_range(spark):
    from hummingbirddatapipeline_spark.operators.sampling import (
        contrastive_negatives,
    )

    ids = spark.createDataFrame(
        [(i * 3,) for i in range(50)], "doc_id long"
    )
    a = sorted(
        map(tuple, contrastive_negatives(ids, "doc_id", 3, "s1").collect())
    )
    b = sorted(
        map(
            tuple,
            contrastive_negatives(
                ids.repartition(7), "doc_id", 3, "s1"
            ).collect(),
        )
    )
    assert a == b  # repartition-stable
    valid = {i * 3 for i in range(50)}
    assert all(neg in valid and neg != d for d, _, neg in a)
    # a different seed changes the draw
    c = sorted(
        map(tuple, contrastive_negatives(ids, "doc_id", 3, "s2").collect())
    )
    assert a != c


def test_jaccard_pairs_dense_mask_equals_prefix_path(spark, sf_dir):
    """The all-pairs exact-Jaccard regime switch must be invisible in
    results: bitmask and prefix-filter paths emit identical pairs and
    rounded jaccards on the real corpus (the pair set every dedup
    cluster query closes over)."""
    from hummingbirddatapipeline_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    dense = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs_prefix(
            docs, "text", "doc_id", 0.85, 1
        ).collect()
    }
    sparse = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs_prefix(
            docs, "text", "doc_id", 0.85, 1, dense_vocab_limit=0
        ).collect()
    }
    # three-way: dense all-pairs == prefix+mask-verify == prefix+string
    # (dense_vocab_limit=0 now lands on the multi-word mask verify when
    # the vocab fits; mask_vocab_limit=0 forces the string-array verify)
    strings = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs_prefix(
            docs, "text", "doc_id", 0.85, 1,
            dense_vocab_limit=0, mask_vocab_limit=0,
        ).collect()
    }
    assert len(dense) > 0
    assert dense == sparse == strings
