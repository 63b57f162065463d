"""Property tests for dedup + similarity operators: exact dedup keeps
the right rows; MinHash-LSH recalls the exact-Jaccard pairs; LSH top-k
recalls most brute-force neighbors; SimHash groups identical texts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs_all,
    near_dup_pairs_minhash,
    simhash_dedup,
)
from hummingbirddatapipeline_spark.operators.similarity import cosine_topk, lsh_topk
from hummingbirddatapipeline_spark.tables import load


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [
            (1, "hello  world"),
            (2, "Hello world"),  # same after normalization
            (3, "different text"),
            (4, "hello world "),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["dup_count"] for r in exact_dedup(df, "text", "id").collect()}
    assert out == {1: 3, 3: 1}


def test_minhash_recall_vs_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs_all(docs, "text", "doc_id", 0.85, 1).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs_minhash(
            docs, "text", "doc_id", threshold=0.85, num_hashes=32, bands=8,
            shingle_size=1,
        ).collect()
    }
    # verify stage guarantees precision; LSH banding bounds recall
    assert approx <= exact
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.5, f"recall {recall}"


def test_lsh_topk_recall(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    dim = len(emb.select("embedding").first()[0])
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in lsh_topk(
            emb, queries, dim=dim, k=10, n_planes=12, bands=4
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.3, f"LSH recall {recall}"  # random vectors: low bar


def test_simhash_identical_texts_collide(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely unrelated words about databases and sharding"),
        ],
        "id long, text string",
    )
    kept = simhash_dedup(df, "text", "id").collect()
    by_id = {r["id"]: r for r in kept}
    assert 2 not in by_id  # folded into id 1's group
    assert by_id[1]["dup_count"] == 2
    assert by_id[3]["dup_count"] == 1


def test_ivf_topk_recall(spark, sf_dir_small):
    """The IVF contract query must report recall_ok for every query
    (per-query recall >= 0.8 vs the exact baseline at 12/16 probes —
    the corpus is near-orthogonal random vectors, the hardest case for
    a coarse quantizer), and the underlying operator must place exact
    top-3 neighbors with reasonable recall."""
    from hummingbirddatapipeline_spark.catalog import QUERIES
    from hummingbirddatapipeline_spark.operators.similarity import ivf_topk

    contract = QUERIES["similarity_ivf_topk"](spark, sf_dir_small).collect()
    assert len(contract) == 5
    assert all(r["recall_ok"] for r in contract), contract

    emb = load(spark, sf_dir_small, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = QUERIES["similarity_cosine_topk"](spark, sf_dir_small)
    ivf = ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=14)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect() if r["rank"] <= 3}
    a = {(r["query_id"], r["vec_id"]) for r in ivf.collect()}
    assert len(e) > 0
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF top-3 recall {recall:.2f} < 0.5"


def test_curation_pipeline_lsh_matches_exact(spark, sf_dir_small):
    """The LSH near-dup stage must produce (nearly) the same clean
    corpus as the exact inverted-index stage."""
    from hummingbirddatapipeline_spark.pipelines.curation import curate_corpus
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir_small, "documents")
    clean_exact, stats = curate_corpus(docs, use_lsh=False)
    clean_lsh, _ = curate_corpus(docs, use_lsh=True)
    st = {r["stage"]: r["n"] for r in stats.collect()}
    # funnel is monotone and every stage is populated
    assert st["input"] >= st["lang_kept"] >= st["quality_kept"]
    assert st["quality_kept"] >= st["exact_deduped"] >= st["near_deduped"] > 0
    e = {r["doc_id"] for r in clean_exact.select("doc_id").collect()}
    l = {r["doc_id"] for r in clean_lsh.select("doc_id").collect()}
    # symmetric difference small: LSH may miss a borderline pair
    assert len(e ^ l) <= max(2, len(e) // 20), (len(e), len(l), len(e ^ l))


def test_embedding_near_dup_lsh_matches_brute(spark, sf_dir_small):
    """Permissive thresholds must trip the selectivity cutoff (banding
    there would emit more candidate volume than brute force) and return
    the exact all-pairs result with a warning; dedup-regime thresholds
    keep the banded plan with no cartesian/nested-loop join."""
    import pytest

    from hummingbirddatapipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = load(spark, sf_dir_small, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    with pytest.warns(UserWarning, match="out-cost brute"):
        lsh = embedding_near_dup_pairs(emb, threshold=0.35)
    brute = embedding_near_dup_pairs(emb, threshold=0.35, brute=True)
    got = {(r.id_a, r.id_b) for r in lsh.collect()}
    want = {(r.id_a, r.id_b) for r in brute.collect()}
    assert want, "fixture should contain near-dup pairs"
    assert got == want  # fallback IS the brute path: exact

    # selective threshold: genuinely banded, sub-quadratic plan
    banded = embedding_near_dup_pairs(emb, threshold=0.95)
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got95 = {(r.id_a, r.id_b) for r in banded.collect()}
    want95 = {(r.id_a, r.id_b) for r in brute.collect() if r.sim >= 0.95}
    assert got95 <= {(r.id_a, r.id_b) for r in brute.collect()}
    assert got95 == want95  # recall 1.0 at the tuned miss rate here


def test_boilerplate_clusters_star_semantics(spark):
    """Oversized LSH buckets become clusters: every copy of the
    boilerplate text lands in the min-id representative's cluster with
    jaccard 1.0; unrelated docs stay out."""
    from hummingbirddatapipeline_spark.operators.dedup import (
        boilerplate_clusters,
    )

    boiler = "terms of service apply to all users of this site"
    rows = [(i, boiler) for i in range(30)]
    rows += [(100, "completely unrelated text about gardens and rivers")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = boilerplate_clusters(
        df, "text", "doc_id", min_bucket=5, threshold=0.85, shingle_size=1
    ).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["jaccard"]) for r in out}
    assert set(got) == set(range(30))  # all copies, not the unrelated doc
    assert all(c == 0 for c, _ in got.values())
    assert all(j == 1.0 for _, j in got.values())


def test_embedding_near_dup_empty_input(spark):
    """Empty input returns an empty frame — no driver-side dim probe to
    crash on (the plane matrix is derived executor-side per batch)."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_near_dup_pairs(df, threshold=0.95).count() == 0


def test_tune_banding_dup_regime_is_more_selective():
    """Tuning at the expected-dup similarity must give more selective
    bands (more planes/band, fewer band*n^2/2^r candidates) than
    worst-case tuning at the threshold, and every configuration must
    fit the 63-bit packed-signature mask budget."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        _tune_banding,
    )

    r_t, b_t = _tune_banding(0.9)
    r_d, b_d = _tune_banding(0.9999)
    assert r_d > r_t
    assert b_d * 2 ** -r_d < b_t * 2 ** -r_t  # candidate-volume proxy
    for t in (0.1, 0.35, 0.5, 0.8, 0.9, 0.95, 0.99, 0.9999):
        r, b = _tune_banding(t)
        assert 1 <= r and 1 <= b and r * b <= 63


def test_tfidf_cosine_pairs_identical_docs_score_one(spark):
    from hummingbirddatapipeline_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "rare alpha beta gamma"),
            (2, "rare alpha beta gamma"),
            (3, "totally different words here"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(docs, "text", "doc_id", 0.5).collect()
    }
    assert out == {(1, 2): 1.0}


def test_tfidf_cosine_catches_length_skewed_dup(spark):
    from hummingbirddatapipeline_spark.operators.dedup import (
        tfidf_cosine_pairs,
        jaccard_pairs_prefix,
    )

    # doc 2 embeds doc 1 plus boilerplate that most other docs also
    # carry: Jaccard dilutes to 0.25, but the boilerplate's idf
    # (ln(8/7) ~ 0.13) is tiny next to the rare shared terms'
    # (ln(8/2) ~ 1.39), so the weighted cosine still reads near-dup
    shared = "zephyr quixotic brouhaha ephemeral"
    filler = " ".join(f"common{i}" for i in range(12))
    rows = [(1, shared), (2, shared + " " + filler)]
    rows += [(i, filler) for i in range(3, 9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cos = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(docs, "text", "doc_id", 0.5).collect()
    }
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs_prefix(
            docs, "text", "doc_id", threshold=0.0, shingle_size=1
        ).collect()
    }
    assert cos[(1, 2)] > 0.98  # weighted view: near-exact duplicate
    assert jac[(1, 2)] == 0.25  # set view: heavily diluted


def test_tfidf_dense_and_sparse_regimes_agree(spark, sf_dir):
    """The vocab-size regime switch must be invisible in results: the
    posting-list (sparse) and tiled-GEMM (dense) paths emit identical
    rounded cosines on the same corpus."""
    from hummingbirddatapipeline_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents").limit(120)
    dense = tfidf_cosine_pairs(docs, "text", "doc_id", threshold=0.9)
    sparse = tfidf_cosine_pairs(
        docs, "text", "doc_id", threshold=0.9, dense_vocab_limit=0
    )
    d = {(r["id_a"], r["id_b"]): r["cosine"] for r in dense.collect()}
    s = {(r["id_a"], r["id_b"]): r["cosine"] for r in sparse.collect()}
    assert len(d) > 0
    assert d == s


def test_cosine_pairs_blocked_matches_brute(spark):
    """Tiled-GEMM all-pairs equals the native brute path, including
    the id_a < id_b canonicalization across block boundaries and the
    zero-vector guard."""
    import random

    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.operators.similarity import (
        cosine_pairs_blocked,
        embedding_near_dup_pairs,
    )

    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(40)]
    rows = [(i, base[i]) for i in range(40)]
    # near-dup twins + one zero vector
    rows += [(100 + i, [x * 1.001 for x in base[i]]) for i in range(5)]
    rows += [(999, [0.0] * 8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in cosine_pairs_blocked(df, 0.99, n_blocks=7).collect()
    }
    exp = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in embedding_near_dup_pairs(df, 0.99, brute=True).collect()
    }
    assert len(exp) >= 5
    assert got == exp


def test_incremental_dedup_replay_idempotent(spark, sf_dir):
    """The S7 append+resume contract at corpus scale: commit a batch's
    survivors into the store, replay the same batch — everything now
    matches itself (J=1.0) and nothing is accepted twice."""
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.operators.dedup import (
        build_jaccard_store,
        incremental_jaccard_dedup,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    store_docs = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    store = build_jaccard_store(store_docs, "text", "doc_id", shingle_size=1)
    r1 = incremental_jaccard_dedup(
        batch, store, "text", "doc_id", threshold=0.85, shingle_size=1
    )
    accepted_ids = [r["doc_id"] for r in r1.filter("accepted").collect()]
    assert 0 < len(accepted_ids) < batch.count()

    # commit survivors, replay the identical batch
    survivors = batch.filter(F.col("doc_id").isin(accepted_ids))
    store2 = store.unionByName(
        build_jaccard_store(survivors, "text", "doc_id", shingle_size=1)
    )
    r2 = incremental_jaccard_dedup(
        batch, store2, "text", "doc_id", threshold=0.85, shingle_size=1
    )
    replay = r2.collect()
    assert all(not r["accepted"] for r in replay)
    # each previously-accepted doc now matches itself exactly
    self_matched = {
        r["doc_id"]: (r["match_store_id"], r["match_jaccard"])
        for r in replay
        if r["doc_id"] in set(accepted_ids)
    }
    for doc_id, (mid, j) in self_matched.items():
        assert mid <= doc_id and j is not None
        if mid == doc_id:
            assert j == 1.0


def test_attach_best_match_picks_min_store_ids_own_jaccard(spark):
    """r16 pins the _attach_best_match rewrite (agg + self-join ->
    one min(struct) aggregate): the winner is the MINIMUM store_id and
    the reported jaccard is THAT row's jaccard — even when a larger
    store_id carries a smaller (or larger) jaccard — and unmatched
    batch docs keep NULL match columns with accepted=true."""
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.operators.dedup import (
        _attach_best_match,
    )

    batch = spark.createDataFrame(
        [(1,), (2,), (3,)], "doc_id long"
    )
    verified = spark.createDataFrame(
        [
            # doc 1: min store_id 10 has the LARGER jaccard
            (1, 10, 0.95),
            (1, 20, 0.85),
            # doc 2: min store_id 30 has the SMALLER jaccard — the
            # old self-join and the new struct-min must both report
            # 0.81, never the max-jaccard row
            (2, 30, 0.81),
            (2, 40, 0.99),
            # doc 3: no verified match
        ],
        "doc_id long, store_id long, jaccard double",
    )
    rows = {
        r["doc_id"]: r
        for r in _attach_best_match(batch, verified, "doc_id", 0.8).collect()
    }
    assert rows[1]["match_store_id"] == 10 and rows[1]["match_jaccard"] == 0.95
    assert rows[2]["match_store_id"] == 30 and rows[2]["match_jaccard"] == 0.81
    assert not rows[1]["accepted"] and not rows[2]["accepted"]
    assert rows[3]["accepted"] and rows[3]["match_store_id"] is None
    assert rows[3]["match_jaccard"] is None


def test_incremental_minhash_agrees_with_exact_on_clear_dups(spark, sf_dir):
    """The approximate probe path must agree with the exact operator
    on this corpus (dup pairs sit far above threshold, so LSH recall
    is effectively 1 here)."""
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.operators.dedup import (
        build_jaccard_store,
        incremental_jaccard_dedup,
        incremental_minhash_dedup,
        minhash_band_index,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    store_docs = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    store = build_jaccard_store(store_docs, "text", "doc_id", shingle_size=1)
    index = minhash_band_index(
        store_docs, "text", "doc_id", num_hashes=32, bands=8, shingle_size=1
    )
    exact = {
        r["doc_id"]: r["accepted"]
        for r in incremental_jaccard_dedup(
            batch, store, "text", "doc_id", threshold=0.85, shingle_size=1
        ).collect()
    }
    approx = {
        r["doc_id"]: r["accepted"]
        for r in incremental_minhash_dedup(
            batch, index, store, "text", "doc_id", threshold=0.85,
            num_hashes=32, bands=8, shingle_size=1,
        ).collect()
    }
    assert set(exact) == set(approx)
    # approx may only ACCEPT extra docs (missed candidates), never
    # reject docs the exact path accepts
    false_rejects = [d for d in exact if exact[d] and not approx[d]]
    assert not false_rejects
    agree = sum(1 for d in exact if exact[d] == approx[d])
    assert agree / len(exact) >= 0.99


def test_incremental_store_roundtrips_through_parquet(spark, sf_dir, tmp_path):
    """The store IS a persisted artifact: build -> write parquet ->
    read back -> probe must make decisions identical to probing the
    in-session frame (schema, shingle arrays, and the frozen df order
    all survive the round trip). Same for the MinHash band index."""
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.operators.dedup import (
        build_jaccard_store,
        incremental_jaccard_dedup,
        incremental_minhash_dedup,
        minhash_band_index,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    store_docs = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    store = build_jaccard_store(store_docs, "text", "doc_id", shingle_size=1)
    store.write.mode("overwrite").parquet(str(tmp_path / "store"))
    store2 = spark.read.parquet(str(tmp_path / "store"))

    def decisions(s):
        return {
            r["doc_id"]: (r["accepted"], r["match_store_id"], r["match_jaccard"])
            for r in incremental_jaccard_dedup(
                batch, s, "text", "doc_id", threshold=0.85, shingle_size=1
            ).collect()
        }

    assert decisions(store) == decisions(store2)

    index = minhash_band_index(
        store_docs, "text", "doc_id", num_hashes=32, bands=8, shingle_size=1
    )
    index.write.mode("overwrite").parquet(str(tmp_path / "index"))
    index2 = spark.read.parquet(str(tmp_path / "index"))
    a = {
        r["doc_id"]: r["accepted"]
        for r in incremental_minhash_dedup(
            batch, index, store2, "text", "doc_id", threshold=0.85,
            num_hashes=32, bands=8, shingle_size=1,
        ).collect()
    }
    b = {
        r["doc_id"]: r["accepted"]
        for r in incremental_minhash_dedup(
            batch, index2, store2, "text", "doc_id", threshold=0.85,
            num_hashes=32, bands=8, shingle_size=1,
        ).collect()
    }
    assert a == b


def test_tune_banding_n_aware_tracks_corpus_size():
    """With an n_items hint the tuner must size the bucket space to the
    corpus (r ~ log2 n), going past the single-long 63-bit budget when
    needed — expected bucket load stays O(1) as the corpus grows."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        _tune_banding,
    )

    base_r, base_b = _tune_banding(0.9999)
    assert base_r * base_b <= 63
    r, b = _tune_banding(0.9999, n_items=1_000_000)
    assert r >= 20  # log2(1e6) ~ 19.9
    assert r * b > 63  # widened-signature regime
    # miss guarantee preserved: (1 - match^r)^b <= ~1e-6
    import math

    p = math.acos(0.9999) / math.pi
    assert (1.0 - (1.0 - p) ** r) ** b <= 1.1e-6
    # small corpora never tune BELOW the single-long optimum
    r_s, b_s = _tune_banding(0.9999, n_items=400)
    assert (r_s, b_s) == (base_r, base_b)


def test_widened_band_signatures_equal_brute(spark):
    """The per-band array<long> signature path (r*b > 63) must produce
    the same verified pair set as brute force on a twin fixture whose
    true pairs sit at the tuning point."""
    import numpy as np

    from hummingbirddatapipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        tw = v + rng.normal(scale=1e-4, size=16)  # cosine ~0.99999+
        tw /= np.linalg.norm(tw)
        rows.append((i + 1000, [float(x) for x in tw]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, 0.99, brute=True).collect()
    }
    widened = embedding_near_dup_pairs(
        df, 0.99, expected_dup_sim=0.99999, n_items=1_000_000
    )
    got = {(r["id_a"], r["id_b"]) for r in widened.collect()}
    assert got == exact
    assert len(got) >= 40  # every twin pair recalled


def test_widened_band_path_is_equi_join(spark):
    """The widened signature path keeps the (band, bucket) equi-join
    plan — no CartesianProduct, no corpus-sized nested loop."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    plan = (
        embedding_near_dup_pairs(
            df, 0.99, expected_dup_sim=0.99999, n_items=1_000_000
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tune_banding_warns_when_band_cap_clips_r():
    """ADVICE r12: at mid thresholds the 64-band explode cap forces r
    below log2(n_items) — the O(1)-bucket-load promise silently
    degrades. The tuner must say so: callers need to know bucket load
    will grow with the corpus (and e.g. route dense cells to the GEMM
    path) instead of trusting the n-aware docstring."""
    import warnings

    from hummingbirddatapipeline_spark.operators.similarity import (
        _tune_banding,
    )

    with pytest.warns(UserWarning, match="64-band cap clips r"):
        r, b = _tune_banding(0.9, n_items=1_000_000)
    assert r < 20  # clipped below log2(1e6)
    assert b <= 64
    # the dedup-regime tuning point reaches the full n-aware r silently
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r_hi, _ = _tune_banding(0.9999, n_items=1_000_000)
    assert r_hi >= 20


def test_explicit_overwide_config_raises_named_error(spark):
    """ADVICE r12: an explicit n_planes/bands combination exceeding 62
    planes per band must fail fast at the operator boundary with the
    limit named — not surface as a ValueError from inside the widened
    signature UDF builder."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="62"):
        embedding_near_dup_pairs(df, 0.9, n_planes=130, bands=2)


def test_packed_single_band_63_planes_still_valid(spark):
    """ADVICE r13: bands=1 with 63 planes packs the whole signature
    into one int64 (total_planes <= 63 routes to the packed path, not
    the widened per-band-long path), so the 62-planes-per-band cap
    must not reject it — the degenerate config worked before the r13
    validation and must keep working. Same contract on the hybrid."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_hybrid,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 1e-4]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = embedding_near_dup_pairs(
        df, 0.99, n_planes=63, bands=1, dim=2
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}
    got_h = embedding_near_dup_pairs_hybrid(
        df, 0.99, n_planes=63, bands=1, dim=2
    ).collect()
    assert {(r.id_a, r.id_b) for r in got_h} == {(1, 2)}
    # the widened regime (two bands of 63) still fails fast, named
    with pytest.raises(ValueError, match="62"):
        embedding_near_dup_pairs(df, 0.9, n_planes=126, bands=2)


def test_threshold_tuned_recall_holds_for_borderline_pairs(spark):
    """ADVICE r12: the twin-only fixtures can't detect misses of pairs
    BELOW an expected_dup_sim tuning point, so pin the guarantee that
    matters instead: with DEFAULT threshold tuning (no tuning-point
    shift), pairs sitting barely above the verify threshold must be
    recalled — banded equals brute on a fixture of cosine ~0.91 pairs
    at t=0.9 (the ~1e-6 worst-pair miss guarantee applies AT the
    threshold)."""
    import math

    import numpy as np

    from hummingbirddatapipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(13)
    rows = []
    theta = math.acos(0.91)
    for i in range(40):
        v = rng.normal(size=16)
        v /= np.linalg.norm(v)
        u = rng.normal(size=16)
        u -= (u @ v) * v
        u /= np.linalg.norm(u)
        w = math.cos(theta) * v + math.sin(theta) * u  # cosine(v,w)=0.91
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 1000, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, 0.9, brute=True).collect()
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, 0.9).collect()
    }
    assert banded == exact
    assert len(banded) >= 40  # every borderline pair recalled


def _clustered_twin_fixture(spark, n_modes=10, n_base=120, dim=16, seed=7):
    """Mode-clustered corpus + quantization-grade twins: the constant-
    cluster shape whose dense sign-regions the sf5 receipts measured —
    sign bits correlate within a mode, so a few (band, bucket) cells
    hold most of the corpus."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_modes, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n_base):
        v = centers[i % n_modes] + rng.normal(scale=0.05, size=dim)
        v /= np.linalg.norm(v)
        tw = v + rng.normal(scale=1e-4, size=dim)
        tw /= np.linalg.norm(tw)
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 1000, [float(x) for x in tw]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hybrid_pair_set_equals_banded(spark):
    """The dense-regime auto-switch must be a pure ENGINE change: with
    identical banding parameters, embedding_near_dup_pairs_hybrid's
    pair set (ids AND 6dp sims) equals the single-engine banded path —
    on a fixture where the dense cutoff demonstrably splits the
    buckets across both engines."""
    from pyspark.sql import functions as F2

    from hummingbirddatapipeline_spark.operators.similarity import (
        _band_bucket_frame,
        _tune_banding,
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_hybrid,
    )

    df = _clustered_twin_fixture(spark)
    kw = dict(threshold=0.99, expected_dup_sim=0.99999, n_items=1 << 20)
    banded = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in embedding_near_dup_pairs(df, **kw).collect()
    }
    hybrid = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in embedding_near_dup_pairs_hybrid(
            df, dense_cutoff=16, **kw
        ).collect()
    }
    assert hybrid == banded
    assert len(hybrid) >= 120  # every twin pair present
    # the cutoff must actually split the occupancy profile: buckets on
    # BOTH sides of 16, or the test isn't exercising the switch
    pb, nb = _tune_banding(0.99999, n_items=1 << 20)
    occ = (
        _band_bucket_frame(df, "vec_id", "embedding", pb, nb, 42)
        .groupBy("band", "bucket")
        .count()
    )
    lo, hi = occ.agg(F2.min("count"), F2.max("count")).collect()[0]
    assert lo < 16 < hi, (lo, hi)


def test_hybrid_degrades_to_gemm_at_permissive_thresholds(spark):
    """In the parent's selectivity-cutoff regime (tuned per_band < 3,
    where banding under-recalls AND out-costs exact all-pairs) the
    hybrid must warn and produce the exact brute result — through the
    blocked-GEMM engine rather than the per-pair lambda crossJoin."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_hybrid,
    )

    df = _clustered_twin_fixture(spark, n_base=40)
    brute = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in embedding_near_dup_pairs(df, 0.3, brute=True).collect()
    }
    with pytest.warns(UserWarning, match="blocked-GEMM all-pairs"):
        out = embedding_near_dup_pairs_hybrid(df, 0.3)
    hybrid = {(r["id_a"], r["id_b"], r["sim"]) for r in out.collect()}
    assert hybrid == brute
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the GEMM tile engine, not crossJoin
