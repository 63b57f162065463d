"""Similarity-search catalog queries over ``embeddings`` (north-star
extension): brute-force cosine top-k (exact baseline, DuckDB-verified)
plus the LSH-bucketed approximate variant (rows-only — approximation
is seed-dependent, verified by recall tests in tests/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)
from hummingbirddatapipeline_spark.tables import load

_N_QUERIES = 5
_K = 10

_DUCK_DOT = (
    "list_dot_product(a.embedding::DOUBLE[], q.embedding::DOUBLE[])"
    " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])))"
)


def _as_double(vec):
    return F.transform(vec, lambda x: x.cast("double"))


@query(
    "similarity_cosine_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, a.vec_id,
             ROUND({_DUCK_DOT}, 6) AS sim
      FROM embeddings a
      CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}) q
      WHERE a.vec_id <> q.vec_id
    )
    SELECT query_id, vec_id, sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= {_K}
    ORDER BY query_id, rank
    """,
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", _as_double(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_topk(emb, queries, k=_K)


@query(
    "similarity_near_dup_embeddings",
    oracle=f"""
    -- contract-corpus cap (see row docstring): no-op at
    -- sf0.001/0.01/0.1
    SELECT a.vec_id AS id_a, q.vec_id AS id_b,
           ROUND({_DUCK_DOT}, 6) AS sim
    FROM (SELECT * FROM embeddings WHERE vec_id < 2000) a
    JOIN (SELECT * FROM embeddings WHERE vec_id < 2000) q
      ON a.vec_id < q.vec_id
    WHERE ROUND({_DUCK_DOT}, 6) >= 0.35
    ORDER BY id_a, id_b
    """,
)
def similarity_near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    import warnings

    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", _as_double(F.col("embedding"))
    )
    # testdata embeddings are near-orthogonal random vectors (max cosine
    # ~0.51), so the demo threshold is 0.35; real corpora use ~0.95.
    # At 0.35 the selectivity cutoff INTENTIONALLY falls back to exact
    # all-pairs (banding would out-cost brute force) — that behavior is
    # pinned by tests, so the advisory UserWarning is suppressed here
    # to keep catalog/test output clean.
    # CONTRACT-ROW FIXTURE CAP (r14 full-catalog sf1 sweep): this row
    # INTENTIONALLY routes through exact brute all-pairs (the
    # selectivity-cutoff contract), so its work is Theta(n^2) by
    # definition — the sweep found one straggler task still grinding
    # the 20k x 20k interpreted-lambda cosines after 20 min at sf1.
    # The cutoff property is corpus-size-independent; fixture pinned
    # at vec_id < 2000 (no-op at sf0.001/0.01/0.1), oracle capped
    # identically. The scale paths for real thresholds are the
    # banded/hybrid rows.
    emb = emb.filter(F.col("vec_id") < 2000)  # contract-corpus cap
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message=".*banding would out-cost brute force.*"
        )
        return embedding_near_dup_pairs(emb, threshold=0.35)


@query(
    "similarity_lsh_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, a.vec_id,
             ROUND({_DUCK_DOT}, 6) AS sim
      FROM embeddings a
      CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}) q
      WHERE a.vec_id <> q.vec_id
    )
    SELECT query_id, vec_id, sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= {_K}
    ORDER BY query_id, rank
    """,
)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k under the FULL exact-top-k oracle: with banding recall
    1.0 on the fixture (48 seeded planes, 24 bands of 2), the LSH
    candidate set covers every true neighbor, and since candidates are
    scored with the exact cosine and ranked identically, the output
    EQUALS brute-force top-k. The probabilistic recall contract (the
    thing that can degrade when parameters shrink) is separately
    asserted in tests/test_dedup_similarity.py."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", _as_double(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # r=2 x 24 bands: wide-probe configuration chosen so worst-pair miss
    # stays ~1e-4 even for the low-sim tail neighbors (~0.23 cosine) a
    # sparse corpus pulls into its top-10; dim is derived executor-side
    # from the first Arrow batch (no driver .first() probe job)
    return lsh_topk(emb, queries, k=_K, n_planes=48, bands=24)


@query(
    "embedding_quantize_roundtrip",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    q AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) / 127 AS scale
      FROM v
    ),
    c AS (
      SELECT vec_id, e, scale,
             list_transform(e, x -> CASE WHEN scale = 0 THEN 0
                                    ELSE CAST(ROUND(x / scale) AS INT) END)
               AS codes
      FROM q
    )
    SELECT vec_id,
           scale,
           CAST(list_sum(codes) AS BIGINT) AS codes_sum,
           CAST(list_min(codes) AS INT) AS codes_min,
           CAST(list_max(codes) AS INT) AS codes_max,
           list_max(list_transform(range(len(e)),
             i -> abs(codes[i + 1] * scale - e[i + 1])))
             <= scale / 2 + 1e-12 AS roundtrip_ok,
           CAST(ROUND(1000000 * sqrt(list_dot_product(
             list_transform(e, x -> x / sqrt(list_dot_product(e, e))),
             list_transform(e, x -> x / sqrt(list_dot_product(e, e)))
           ))) AS BIGINT) AS unit_norm_e6
    FROM c
    ORDER BY vec_id
    """,
)
def embedding_quantize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding storage prep under the oracle gate: symmetric int8
    quantization (identical codes on both engines — the whole code
    vector is hashed via its sum/min/max signature), the
    reconstruction-error bound |dequant - x| <= scale/2, and L2
    normalization landing on unit norm. These are the two ops a 100 TB
    embedding store runs before anything else: normalize once so dot ==
    cosine, quantize 4-8x so the ANN index fits."""
    from hummingbirddatapipeline_spark.functions.vector import (
        dequantize_int8,
        norm,
        normalize_l2,
        quantize_int8,
    )

    emb = load(spark, sf_dir, "embeddings").withColumn(
        "e", _as_double(F.col("embedding"))
    )
    q = emb.select("vec_id", "e", quantize_int8(F.col("e")).alias("q"))
    err = F.array_max(
        F.zip_with(
            dequantize_int8(F.col("q")),
            F.col("e"),
            lambda d, x: F.abs(d - x),
        )
    )
    return q.select(
        "vec_id",
        F.col("q.scale").alias("scale"),
        F.aggregate(
            F.col("q.codes"), F.lit(0).cast("long"), lambda a, c: a + c
        ).alias("codes_sum"),
        F.array_min("q.codes").alias("codes_min"),
        F.array_max("q.codes").alias("codes_max"),
        (err <= F.col("q.scale") / 2 + 1e-12).alias("roundtrip_ok"),
        F.round(1000000 * norm(normalize_l2(F.col("e"))))
        .cast("long")
        .alias("unit_norm_e6"),
    )


@query(
    "similarity_ivf_topk",
    oracle=f"""
    SELECT vec_id AS query_id, {_K} AS k, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < {_N_QUERIES}
    ORDER BY query_id
    """,
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k as a RECALL CONTRACT row per query: Spark runs both
    the IVF path (KMeans quantizer, probe 14 of 16 cells) and the exact
    brute top-k, and hashes a per-query ``recall_ok`` flag (recall >=
    0.8; observed min 0.9 at every SF on the structureless random fixture — real
    clustered corpora prune far harder at equal recall). The oracle
    pins the row set and TRUE flags, so any regression that drops
    recall below the contract goes driver-red."""
    from hummingbirddatapipeline_spark.operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", _as_double(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # both result sets are N_QUERIES*K skinny id pairs referenced
    # twice below (hits + per_q); checkpoint so the corpus-scanning
    # IVF/brute lineages run once instead of per reference
    ivf = (
        ivf_topk(emb, queries, k=_K, n_centroids=16, n_probe=14)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=False)
    )
    exact = (
        cosine_topk(emb, queries, k=_K)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=False)
    )
    hits = exact.join(ivf, ["query_id", "vec_id"], "left_semi")
    per_q = (
        exact.groupBy("query_id")
        .agg(F.count("*").alias("k"))
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("n_hit")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.col("k").cast("int").alias("k"),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / F.col("k")
                >= 0.8
            ).alias("recall_ok"),
        )
    )
    return per_q


@query(
    "search_hybrid_rrf",
    oracle=None,  # set below: composes the BM25 CTEs from text_q
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 lexical ranking over ``documents`` fused
    with the exact-cosine embedding ranking for query vector 0 over
    ``embeddings`` via reciprocal-rank fusion (1/(60+rank), Cormack et
    al. 2009) — the stock two-tower retrieval combiner. Both input
    rankings are themselves oracle-gated queries (text_bm25_topk /
    similarity_cosine_topk); the fusion takes their top-50s, so the
    only new plan cost is an outer join of two 50-row frames. The
    fused score is rounded before ranking with doc_id tiebreak, making
    the top-10 cut deterministic on both engines."""
    from hummingbirddatapipeline_spark.catalog.text_q import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )
    from hummingbirddatapipeline_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )

    docs = load(spark, sf_dir, "documents")
    bm25 = bm25_topk(docs, list(_BM25_TERMS), k=50, k1=_BM25_K1, b=_BM25_B)
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", _as_double(F.col("embedding"))
    )
    q0 = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cos = cosine_topk(emb, q0, k=50, exclude_self=False).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([bm25.select("doc_id", "rank"), cos], k=10)


def _install_hybrid_oracle() -> None:
    from hummingbirddatapipeline_spark.catalog import ORACLES
    from hummingbirddatapipeline_spark.catalog.text_q import DUCK_BM25_CTES

    ORACLES["search_hybrid_rrf"] = f"""
    WITH {DUCK_BM25_CTES},
    cos_ranked AS (
      SELECT a.vec_id AS doc_id,
             ROW_NUMBER() OVER (
               ORDER BY ROUND({_DUCK_DOT}, 6) DESC, a.vec_id) AS rank
      FROM embeddings a
      CROSS JOIN (SELECT * FROM embeddings WHERE vec_id = 0) q
    ),
    cos_top AS (SELECT doc_id, rank FROM cos_ranked WHERE rank <= 50),
    bm_top AS (SELECT doc_id, rank FROM bm25_ranked WHERE rank <= 50),
    fused AS (
      SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / (60 + b.rank), 0)
                   + COALESCE(1.0 / (60 + c.rank), 0), 6) AS rrf_score
      FROM bm_top b FULL OUTER JOIN cos_top c ON b.doc_id = c.doc_id
    )
    SELECT doc_id, rrf_score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY rrf_score DESC, doc_id) AS rank
      FROM fused
    ) WHERE rank <= 10
    ORDER BY rank
    """


_install_hybrid_oracle()


# Twin-union fixture for the BANDED near-dup path: the testdata
# embeddings are near-orthogonal (max cross cosine ~0.51), so a dedup-
# regime threshold (0.9) only fires on pairs we construct — each vector
# unioned with its int8-quantize-roundtripped twin (cosine ~0.9999,
# deterministic on both engines; quantization mirrored from
# functions/vector.py exactly as in embedding_quantize_roundtrip).
_TWIN_OFFSET = 1_000_000


# Shared by the banded row and its widened-signature twin below: the
# oracle is the EXACT brute-force closure, so any banding that meets
# its recall guarantee must reproduce it bit-for-bit.
_BANDED_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    twins AS (
      SELECT vec_id + {_TWIN_OFFSET} AS vec_id,
             list_transform(
               list_transform(e, x -> CASE WHEN scale = 0 THEN 0
                                      ELSE CAST(ROUND(x / scale) AS INT) END),
               c -> c * scale) AS e
      FROM (SELECT vec_id, e,
                   list_max(list_transform(e, x -> abs(x))) / 127 AS scale
            FROM base)
    ),
    uni AS (SELECT * FROM base UNION ALL SELECT * FROM twins),
    near AS (
      SELECT a.vec_id AS id_a, q.vec_id AS id_b
      FROM uni a JOIN uni q ON a.vec_id < q.vec_id
      WHERE ROUND(list_dot_product(a.e, q.e)
              / (sqrt(list_dot_product(a.e, a.e))
                 * sqrt(list_dot_product(q.e, q.e))), 6) >= 0.9
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM near
      UNION SELECT id_b, id_a FROM near
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    cc AS (
      SELECT u AS node, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u
    )
    SELECT node, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM cc
    ORDER BY node
    """

# The widened-signature contract row pins its fixture at vec_id <
# 2000 (r13 VERDICT item 2): the row exists to gate the widened
# per-band-long path's recall against the exact closure — a property
# independent of corpus size — and on this constant-mode corpus the
# pure banded path is deliberately super-linear, so the contract
# corpus must not scale with sf_dir (the production plan for the
# shape is similarity_hybrid_dense_clusters). The cap is a no-op at
# sf0.001/0.01/0.1 (vec_ids end at 1999), so existing oracles are
# byte-identical there.
_WIDENED_FIXTURE_CAP = 2000
_BANDED_CLUSTERS_ORACLE_CAPPED = _BANDED_CLUSTERS_ORACLE.replace(
    "FROM embeddings",
    f"FROM embeddings WHERE vec_id < {_WIDENED_FIXTURE_CAP}",
    1,
)


@query(
    "similarity_near_dup_clusters_banded",
    oracle=_BANDED_CLUSTERS_ORACLE,
)
def similarity_near_dup_clusters_banded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The LSH-BANDED embedding near-dup pipeline under the full oracle
    gate, at a real dedup threshold (0.9). The demo-threshold variant
    below deliberately routes through the exact brute fallback; this
    one gates the scale path itself: sign-LSH banding (an equi-join
    plan, no CartesianProduct; pinned in tests/test_plan_contracts.py)
    generates candidates, the exact cosine verify keeps true pairs,
    and operators/graph.py closes them into min-id clusters. Banding
    is tuned via ``expected_dup_sim=0.9999`` — the NEAR-EXACT dup
    regime this fixture models (quantization twins; real semantic-dedup
    corpora sit in the same regime) — giving 8 planes/band x 5 bands
    instead of the worst-case-at-0.9 tuner's coarse 3 x 14 (~3.5x the
    candidates). With the fixed seed the plan is deterministic and the
    output equals DuckDB's exact closure."""
    from pyspark.sql.window import Window

    from hummingbirddatapipeline_spark.functions.vector import (
        dequantize_int8,
        quantize_int8,
    )
    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("embedding")
    )
    twins = emb.select(
        (F.col("vec_id") + _TWIN_OFFSET).alias("vec_id"),
        dequantize_int8(quantize_int8(F.col("embedding"))).alias("embedding"),
    )
    # Materialize the twin fixture: the quantize/dequantize expression
    # is a nest of bound-lambda transforms, and when projection
    # collapse inlines it into the Arrow signature UDF's argument,
    # Spark's PythonUDF extraction fails at the checkpoint boundary
    # ([INTERNAL_ERROR] Cannot evaluate expression: PythonUDF inside an
    # InterpretedUnsafeProjection). Checkpointing the (tiny, fixture-
    # sized) union gives the UDF a plain column input — and is also
    # what a real pipeline does: you materialize the corpus once, not
    # re-derive twins inside every downstream operator.
    uni = emb.unionByName(twins).localCheckpoint()
    # n-aware banding: the corpus-size hint sizes the bucket space so
    # expected bucket load stays O(1) as the corpus grows (the sf1
    # receipts measured the fixed-space alternative at 301x candidates
    # for 10x vectors). The count is a bounded metadata pull on the
    # checkpointed union — at driver scales (n <= ~4k) the tuner falls
    # back to the identical single-long (12, 5) configuration, so the
    # oracle-gated plan is unchanged there; past ~2^13 vectors the
    # signature widens to one long per band.
    pairs = embedding_near_dup_pairs(
        uni, threshold=0.9, expected_dup_sim=0.9999, n_items=uni.count()
    ).select("id_a", "id_b")
    cc = connected_components(pairs)
    return cc.select(
        "node",
        "cluster_id",
        F.count("*").over(Window.partitionBy("cluster_id")).alias("cluster_size"),
    )


@query(
    "similarity_banded_widened_clusters",
    oracle=_BANDED_CLUSTERS_ORACLE_CAPPED,
)
def similarity_banded_widened_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The WIDENED per-band signature path under the full oracle gate:
    identical fixture, threshold, and closure as
    similarity_near_dup_clusters_banded, but the corpus-size hint is
    forced to 2^20 so the tuner leaves the single packed int64 (20
    planes/band x 6 bands = 120 planes, one signature long PER BAND
    via operators/similarity.lsh_band_signatures) at EVERY scale
    factor — the configuration a ~10^6-vector corpus would get. The
    oracle is the exact brute-force closure, so this row driver-gates
    the widened path's recall guarantee (~4e-7 miss/pair at the 0.9999
    tuning point) and its array<long> bucketing end-to-end. Same
    equi-join plan contract as the single-long path
    (tests/test_dedup_similarity.py::test_widened_band_path_is_equi_join).

    Scale shape: identical to the banded row — skinny (band, bucket,
    id) explode, bucket self-join, exact cosine verify, pointer-
    jumping closure; the only difference is 6 array elements per item
    instead of 5 masked views of one long, which is what keeps bucket
    load O(1) on corpora past 2^13 vectors.

    CONTRACT-ROW FIXTURE CAP (r13 VERDICT item 2): pinned at vec_id <
    2000 (_WIDENED_FIXTURE_CAP) — a no-op at sf0.001/0.01/0.1 — because on
    this constant-mode twin corpus the PURE banded path is
    deliberately super-linear (the r13 receipt's 4.4x at 2x data);
    the recall property this row gates is corpus-size-independent,
    and the production plan for the dense shape is
    similarity_hybrid_dense_clusters. Oracle applies the same cap."""
    from pyspark.sql.window import Window

    from hummingbirddatapipeline_spark.functions.vector import (
        dequantize_int8,
        quantize_int8,
    )
    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
    )

    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _WIDENED_FIXTURE_CAP)  # contract-corpus cap
        .select("vec_id", _as_double(F.col("embedding")).alias("embedding"))
    )
    twins = emb.select(
        (F.col("vec_id") + _TWIN_OFFSET).alias("vec_id"),
        dequantize_int8(quantize_int8(F.col("embedding"))).alias("embedding"),
    )
    uni = emb.unionByName(twins).localCheckpoint()
    pairs = embedding_near_dup_pairs(
        uni, threshold=0.9, expected_dup_sim=0.9999, n_items=1 << 20
    ).select("id_a", "id_b")
    cc = connected_components(pairs)
    return cc.select(
        "node",
        "cluster_id",
        F.count("*").over(Window.partitionBy("cluster_id")).alias("cluster_size"),
    )


@query(
    "similarity_hybrid_dense_clusters",
    oracle=_BANDED_CLUSTERS_ORACLE,
)
def similarity_hybrid_dense_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dense-regime AUTO-SWITCH under the full oracle gate (r12
    VERDICT item 3): identical fixture, banding parameters, threshold,
    and closure as similarity_banded_widened_clusters, but pairs come
    from ``embedding_near_dup_pairs_hybrid`` — per-(band, bucket)
    occupancy is measured once on the skinny banding frame and buckets
    past ``dense_cutoff`` route through the cell-quantized blocked-GEMM
    tile engine (``cosine_pairs_blocked`` partitioned by cell) instead
    of the skinny bucket self-join. The testdata embeddings sit in a
    CONSTANT 10 label clusters, so sign bits correlate and the dense
    sign-regions hold hundreds of members per bucket at every sf —
    exactly the corpus shape whose occupancy the sf5 receipts measured
    going super-linear on the pure banded path. cutoff=64 engages the
    GEMM engine on those buckets at both driver scales while genuinely
    sparse buckets keep the self-join engine, and the oracle (the
    exact brute-force closure) gates that the two-engine pair set is
    byte-identical to single-engine banding."""
    from pyspark.sql.window import Window

    from hummingbirddatapipeline_spark.functions.vector import (
        dequantize_int8,
        quantize_int8,
    )
    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
    )
    from hummingbirddatapipeline_spark.operators.similarity import (
        embedding_near_dup_pairs_hybrid,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("embedding")
    )
    twins = emb.select(
        (F.col("vec_id") + _TWIN_OFFSET).alias("vec_id"),
        dequantize_int8(quantize_int8(F.col("embedding"))).alias("embedding"),
    )
    uni = emb.unionByName(twins).localCheckpoint()
    pairs = embedding_near_dup_pairs_hybrid(
        uni,
        threshold=0.9,
        expected_dup_sim=0.9999,
        n_items=1 << 20,
        dense_cutoff=64,
    ).select("id_a", "id_b")
    cc = connected_components(pairs)
    return cc.select(
        "node",
        "cluster_id",
        F.count("*").over(Window.partitionBy("cluster_id")).alias("cluster_size"),
    )


@query(
    "similarity_near_dup_clusters",
    oracle=f"""
    -- contract-corpus cap (see row docstring): no-op at
    -- sf0.001/0.01/0.1
    WITH RECURSIVE near AS (
      SELECT a.vec_id AS id_a, q.vec_id AS id_b
      FROM (SELECT * FROM embeddings WHERE vec_id < 2000) a
      JOIN (SELECT * FROM embeddings WHERE vec_id < 2000) q
        ON a.vec_id < q.vec_id
      WHERE ROUND({_DUCK_DOT}, 6) >= 0.35
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM near
      UNION SELECT id_b, id_a FROM near
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    cc AS (
      SELECT u AS node, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u
    )
    SELECT node, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM cc
    ORDER BY node
    """,
)
def similarity_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTERS under the full oracle gate: the
    exact cosine pair graph (>= 0.35 on this near-orthogonal fixture;
    the demo threshold routes through the deterministic exact path)
    closed into min-id components by operators/graph.py, while DuckDB
    recomputes the same closure recursively. The embedding-modality
    twin of dedup_connected_components — cluster-then-keep-one is the
    last step of semantic dedup at 100 TB.

    CONTRACT-ROW FIXTURE CAP (r14 full-catalog sf1 sweep): the 0.35
    demo threshold INTENTIONALLY routes through the exact brute
    all-pairs path (same contract as similarity_near_dup_embeddings),
    so work is Theta(n^2) by definition — the sweep found it
    straggling >30 min at sf1. The closure property is
    corpus-size-independent; fixture pinned at vec_id < 2000 (no-op
    at sf0.001/0.01/0.1), oracle capped identically. The scale paths
    are the banded/hybrid cluster rows above."""
    import warnings as _warnings

    from pyspark.sql.window import Window

    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
    )

    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 2000)  # contract-corpus cap, see docstring
        .withColumn("embedding", _as_double(F.col("embedding")))
    )
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")  # expected brute fallback at 0.35
        pairs = embedding_near_dup_pairs(emb, threshold=0.35).select(
            "id_a", "id_b"
        )
    cc = connected_components(pairs)
    return cc.select(
        "node",
        "cluster_id",
        F.count("*").over(Window.partitionBy("cluster_id")).alias("cluster_size"),
    )


def _cent_cte_body() -> str:
    """DuckDB CTE body materializing the frozen IVF centroid constants
    as (cid, cv) rows — shared by every oracle that rebuilds the
    quantizer assignment from the same literals."""
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D

    cent_lists = ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]" for c in IVF_CENTROIDS_64D
    )
    return (
        f"SELECT UNNEST(range({len(IVF_CENTROIDS_64D)})) AS cid, "
        f"UNNEST([{cent_lists}]) AS cv"
    )


def _ivf_frozen_cent_sql() -> str:
    return f"""
    WITH cents AS (
      {_cent_cte_body()}
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             ROUND(
               list_sum(list_zip(e.embedding, c.cv)
                 .list_transform(p -> CAST(p[1] AS DOUBLE) * p[2]))
               / (sqrt(list_sum(e.embedding
                    .list_transform(x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(c.cv.list_transform(x -> x * x)))), 6)
               AS sim
      FROM embeddings e CROSS JOIN cents c
    ),
    best AS (
      SELECT vec_id, cid, sim, ROW_NUMBER() OVER
               (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
      FROM scored
    )
    SELECT vec_id, CAST(cid AS INT) AS centroid_id, sim AS centroid_sim
    FROM best WHERE rk = 1
    ORDER BY vec_id
    """


@query("similarity_ivf_incremental_add", oracle=_ivf_frozen_cent_sql())
def similarity_ivf_incremental_add(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANN index MAINTENANCE: assign an arriving vector batch to the
    FROZEN IVF coarse quantizer (artifacts.IVF_CENTROIDS_64D — trained
    once offline, committed like the dedup store) without retraining
    (operators/similarity.ivf_incremental_add). The centroids ride the
    plan as literals — ONE map-side pass, no join, no shuffle; at
    100 TB the assigned batch appends straight into the
    partition-by-centroid layout. Argmax cosine with ties to the
    lowest centroid id; DuckDB recomputes every cosine from the SAME
    frozen constants, so the assignment is fully oracled."""
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.operators.similarity import (
        ivf_incremental_add,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ivf_incremental_add(emb, IVF_CENTROIDS_64D).select(
        "vec_id", "centroid_id", "centroid_sim"
    )


# Scaled-copy twin offset for the SemDeDup fixture: even vec_ids get a
# 0.5x-scaled duplicate at vec_id + offset (cosine exactly 1.0 and the
# same quantizer cell by scale invariance), giving the near-orthogonal
# synthetic embeddings (max non-twin pairwise cosine 0.479) real
# semantic duplicates both engines can derive.
_SEM_TWIN_OFFSET = 10_000


def _semantic_dedup_sql() -> str:
    return f"""
    WITH RECURSIVE base AS (
      SELECT vec_id,
             embedding.list_transform(x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    allv AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + {_SEM_TWIN_OFFSET},
             v.list_transform(x -> x * 0.5)
      FROM base WHERE vec_id % 2 = 0
    ),
    cents AS ({_cent_cte_body()}),
    scored AS (
      SELECT a.vec_id, c.cid,
             ROUND(
               list_sum(list_zip(a.v, c.cv).list_transform(p -> p[1] * p[2]))
               / (sqrt(list_sum(a.v.list_transform(x -> x * x)))
                  * sqrt(list_sum(c.cv.list_transform(x -> x * x)))), 6)
               AS sim
      FROM allv a CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, CAST(cid AS INT) AS centroid_id FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER
                 (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
        FROM scored) WHERE rk = 1
    ),
    near AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM allv a
      JOIN assigned aa ON aa.vec_id = a.vec_id
      JOIN assigned ab ON TRUE
      JOIN allv b ON b.vec_id = ab.vec_id
      WHERE aa.centroid_id = ab.centroid_id AND a.vec_id < b.vec_id
        AND ROUND(
              list_sum(list_zip(a.v, b.v).list_transform(p -> p[1] * p[2]))
              / (sqrt(list_sum(a.v.list_transform(x -> x * x)))
                 * sqrt(list_sum(b.v.list_transform(x -> x * x)))), 6)
            >= 0.999
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM near
      UNION SELECT id_b, id_a FROM near
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    cc AS (
      SELECT u AS node, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u
    )
    SELECT a.vec_id, a.centroid_id,
           COALESCE(cc.cluster_id, a.vec_id) AS sem_cluster,
           COALESCE(cc.cluster_id, a.vec_id) = a.vec_id AS kept
    FROM assigned a LEFT JOIN cc ON cc.node = a.vec_id
    """


@query("similarity_semantic_dedup", oracle=_semantic_dedup_sql())
def similarity_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540) under the FULL oracle gate: embeddings (plus
    scaled-copy twins — the deterministic fixture both engines derive,
    see _SEM_TWIN_OFFSET) are bucketed by the FROZEN IVF quantizer,
    near-duplicate pairs are enumerated ONLY within a cell (6dp cosine
    >= 0.999), the pair graph closes into clusters via pointer-jumping
    CC, and each cluster keeps its minimum-id member. DuckDB rebuilds
    the assignment, every within-cell cosine, and the transitive
    closure from the same centroid constants, so the keep/drop
    labeling itself is hashed. Every even vec_id must lose exactly its
    twin (asserted in tests/test_r9_oracles.py).

    Scale shape: the published algorithm's own cost model —
    within-cell quadratic via per-cell blocked-GEMM tiles, never
    corpus-quadratic; ``max_cell`` raises loudly on a degenerate
    mega-cell instead of letting one cell turn the job quadratic."""
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    twins = emb.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") + _SEM_TWIN_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.5).alias("embedding"),
    )
    return semantic_dedup(
        emb.unionByName(twins),
        IVF_CENTROIDS_64D,
        threshold=0.999,
        max_cell=100_000,
    )


# --- Oracle builders for the in-engine training rows (registered as
# catalog rows in round 10 per the PLANS.md write-ahead recipe). The
# differential tests drive the REGISTERED (query, oracle) pair, so the
# SQL has a single source of truth. Each builder unrolls the
# operator's fixed-iteration recurrence as chained CTEs from the same
# frozen constants.

def _kmeans_refine_sql(n_iter: int) -> str:
    """Unrolled Lloyd iterations as chained CTEs: itK holds the
    centroids entering iteration K+1; each round re-derives the
    assignment (ROUND(dist,6), ties -> lowest cid) and the 8dp-rounded
    per-dimension means, with COALESCE keeping an empty cluster's
    previous centroid — the exact recurrence kmeans_refine runs."""
    parts = [
        f"""
    WITH allv AS (
      SELECT vec_id,
             embedding.list_transform(x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    it0 AS (
      SELECT cid, cv.list_transform(x -> CAST(x AS DOUBLE)) AS cv
      FROM ({_cent_cte_body()})
    )"""
    ]
    for k in range(n_iter):
        parts.append(f""",
    s{k} AS (
      SELECT a.vec_id, a.v, c.cid,
             ROUND(list_sum(list_zip(a.v, c.cv)
                     .list_transform(p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)
               AS d
      FROM allv a CROSS JOIN it{k} c
    ),
    a{k} AS (
      SELECT vec_id, v, cid FROM (
        SELECT *, ROW_NUMBER() OVER
                 (PARTITION BY vec_id ORDER BY d, cid) AS rk
        FROM s{k}) WHERE rk = 1
    ),
    m{k} AS (
      SELECT cid, list(m ORDER BY dim) AS cv FROM (
        SELECT cid, CAST(u[2] AS INT) AS dim,
               ROUND(AVG(CAST(u[1] AS DOUBLE)), 8) AS m
        FROM (SELECT cid, UNNEST(list_zip(v, range(1, len(v) + 1))) AS u
              FROM a{k})
        GROUP BY cid, dim) GROUP BY cid
    ),
    it{k + 1} AS (
      SELECT c0.cid, COALESCE(m{k}.cv, c0.cv) AS cv
      FROM it{k} c0 LEFT JOIN m{k} USING (cid)
    )""")
    parts.append(f"""
    SELECT vec_id, CAST(cid AS INT) AS cluster_id, d AS dist FROM (
      SELECT a.vec_id, c.cid,
             ROUND(list_sum(list_zip(a.v, c.cv)
                     .list_transform(p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)
               AS d,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
               ROUND(list_sum(list_zip(a.v, c.cv)
                       .list_transform(p -> (p[1] - p[2]) * (p[1] - p[2]))), 6),
               c.cid) AS rk
      FROM allv a CROSS JOIN it{n_iter} c
    ) WHERE rk = 1
    """)
    return "".join(parts)


def _pca_top1_sql(n_iter: int) -> str:
    """Unrolled power iterations as chained CTEs over the SAME
    covariance the operator builds: per-dim 8dp means, ROUND(SUM(
    ROUND(xi*xj,12))/n,8) covariance, 12dp matvec + norm, 9dp
    normalized vector, 6dp centered projection."""
    return f"""
    WITH allv AS (
      SELECT vec_id,
             embedding.list_transform(x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cnt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM allv),
    mx AS (
      SELECT list(m ORDER BY dim) AS m FROM (
        SELECT CAST(u[2] AS INT) AS dim, ROUND(AVG(CAST(u[1] AS DOUBLE)), 8) AS m
        FROM (SELECT UNNEST(list_zip(v, range(1, len(v) + 1))) AS u FROM allv)
        GROUP BY 1)
    ),
    centered AS (
      SELECT a.vec_id,
             list_zip(a.v, mx.m).list_transform(p -> p[1] - p[2]) AS c
      FROM allv a CROSS JOIN mx
    ),
    ci AS (
      SELECT vec_id, CAST(u[2] AS INT) - 1 AS i,
             CAST(u[1] AS DOUBLE) AS xi, c
      FROM (SELECT vec_id, c, UNNEST(list_zip(c, range(1, len(c) + 1))) AS u
            FROM centered)
    ),
    cij AS (
      SELECT i, CAST(u2[2] AS INT) - 1 AS j, xi, CAST(u2[1] AS DOUBLE) AS xj
      FROM (SELECT i, xi, UNNEST(list_zip(c, range(1, len(c) + 1))) AS u2
            FROM ci)
    ),
    cov AS (
      SELECT i, j,
             ROUND(SUM(ROUND(xi * xj, 12)) / (SELECT n FROM cnt), 8) AS cv
      FROM cij GROUP BY i, j
    ),
    v0 AS (
      SELECT CAST(j AS INT) AS j, ROUND(1.0 / sqrt(64.0), 9) AS val
      FROM range(64) t(j)
    )""" + "".join(
        f""",
    w{k} AS (
      SELECT cov.i, ROUND(SUM(ROUND(cov.cv * v.val, 12)), 12) AS w
      FROM cov JOIN v{k} v ON v.j = cov.j GROUP BY cov.i
    ),
    n{k} AS (SELECT ROUND(sqrt(SUM(w * w)), 12) AS nrm FROM w{k}),
    v{k + 1} AS (
      SELECT i AS j, ROUND(w / (SELECT nrm FROM n{k}), 9) AS val FROM w{k}
    )"""
        for k in range(n_iter)
    ) + f""",
    comp AS (SELECT list(val ORDER BY j) AS cv FROM v{n_iter})
    SELECT c.vec_id,
           ROUND(list_sum(list_zip(c.c, comp.cv)
                   .list_transform(p -> p[1] * p[2])), 6) AS pc1_score
    FROM centered c CROSS JOIN comp
    """


_KMEANS_REFINE_ITERS = 3
_PCA_TOP1_ITERS = 3


@query("similarity_kmeans_refine", oracle=_kmeans_refine_sql(_KMEANS_REFINE_ITERS))
def similarity_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine k-means quantizer TRAINING under the full oracle
    gate: exactly three synchronous Lloyd iterations seeded from the
    frozen IVF centroids (operators/similarity.kmeans_refine),
    returning every (vec_id, cluster_id, dist) assignment under the
    refined quantizer. DuckDB re-derives every intermediate centroid
    of every iteration as chained CTEs from the same 8dp seed
    constants — the whole training trajectory is hashed, not just the
    final labels. Completes the train -> index -> add -> dedup story
    (ivf_incremental_add / semantic_dedup consume the quantizer this
    row trains).

    Scale shape: per iteration ONE map-side assignment pass (centroids
    are plan literals — zero shuffles) + ONE hash aggregate producing
    k x dim bounded MODEL state back to the driver; input
    localCheckpointed once, n_iter+1 total passes. Determinism is the
    pagerank quantize regime (6dp distances, 8dp means, ties -> lowest
    cid); the empty-cluster convention (keep previous centroid) is
    pinned in tests/test_r10_oracles.py."""
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.operators.similarity import (
        kmeans_refine,
    )

    emb = load(spark, sf_dir, "embeddings", fanout=True).select(
        "vec_id", _as_double(F.col("embedding")).alias("embedding")
    )
    assigned, _cents = kmeans_refine(
        emb, IVF_CENTROIDS_64D, n_iter=_KMEANS_REFINE_ITERS
    )
    return assigned


@query("similarity_pca_top1", oracle=_pca_top1_sql(_PCA_TOP1_ITERS))
def similarity_pca_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component by fixed-iteration power method, fully
    in-engine (operators/similarity.pca_power_top1), under the full
    oracle gate: center the corpus, build the d x d covariance with
    one explode + hash aggregate, run three synchronous power
    iterations over skinny (i, val) eigenvector state, and project
    every centered vector onto the component — the
    dimension-reduction half of embedding prep. DuckDB re-derives the
    WHOLE trajectory (means, covariance, every matvec + norm, the 9dp
    component, the 6dp projection) from the raw embeddings, so every
    (vec_id, pc1_score) row is hashed.

    Scale shape: TWO corpus passes (per-dim means; covariance via
    double posexplode absorbed same-stage into d^2 partial-aggregate
    keys) + ONE projection pass with the component as plan literals;
    the power iterations run pagerank-style over d-row state and only
    the d-element component is ever collected (bounded model state).
    Eigenvector sign is pinned by the all-positive start."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        pca_power_top1,
    )

    emb = load(spark, sf_dir, "embeddings", fanout=True).select(
        "vec_id", _as_double(F.col("embedding")).alias("embedding")
    )
    proj, _comp = pca_power_top1(emb, dim=64, n_iter=_PCA_TOP1_ITERS)
    return proj


# --- r12-banked oracle builders (NOT yet registered: the r10 window is
# full and the r11 bank is ahead in the queue). The differential tests
# in tests/test_r12_oracles.py import these, so the SQL has a single
# source of truth and r12 registration is a decorator + window change.

def _hamming_topk_sql(
    dim: int = 64, n_queries: int = 5, k: int = 10
) -> str:
    """Independent DuckDB formulation of binary-code Hamming top-k
    (operators/similarity.hamming_topk): 8dp per-dim corpus means,
    sign bits packed into 32-bit words of a BIGINT via explicit
    shifts (the Spark side folds the same integer with Horner), and
    exact bit_count(xor) ranking — integers end to end."""
    n_words = (dim + 31) // 32
    packs = ",\n             ".join(
        f"""CAST(list_sum(list_transform(range({32 * w},
               {min(32 * w + 32, dim)}), d ->
               CASE WHEN v[d + 1] > m[d + 1]
                    THEN CAST(1 AS BIGINT) << (d - {32 * w})
                    ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS b{w}"""
        for w in range(n_words)
    )
    ham = " + ".join(
        f"bit_count(xor(a.b{w}, q.b{w}))" for w in range(n_words)
    )
    return f"""
    WITH allv AS (
      SELECT vec_id,
             embedding.list_transform(x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    mx AS (
      SELECT list(mu ORDER BY dim) AS m FROM (
        SELECT CAST(u[2] AS INT) AS dim,
               ROUND(AVG(CAST(u[1] AS DOUBLE)), 8) AS mu
        FROM (SELECT UNNEST(list_zip(v, range(1, len(v) + 1))) AS u
              FROM allv)
        GROUP BY 1)
    ),
    coded AS (
      SELECT vec_id,
             {packs}
      FROM allv CROSS JOIN mx
    ),
    q AS (SELECT * FROM coded WHERE vec_id < {n_queries}),
    scored AS (
      SELECT q.vec_id AS query_id, a.vec_id,
             CAST({ham} AS INT) AS hamming
      FROM coded a CROSS JOIN q
      WHERE a.vec_id <> q.vec_id
    )
    SELECT query_id, vec_id, hamming, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY hamming, vec_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def _pq_topk_sql(
    dim: int = 64,
    m: int = 4,
    k_codes: int = 8,
    n_iter: int = 2,
    n_queries: int = 5,
    k: int = 10,
) -> str:
    """Independent DuckDB formulation of PQ/ADC top-k
    (operators/similarity.pq_topk): per subspace, unroll the Lloyd
    iterations from the first-``k_codes``-vectors seeds exactly as
    _kmeans_refine_sql does (6dp distances, ties -> lowest cid, 8dp
    means, COALESCE empty-cluster carry), then encode, build the
    per-query m x k_codes ADC tables, and rank by the fixed-order
    6dp-rounded m-term sum."""
    d_sub = dim // m
    sq = (
        "ROUND(list_sum(list_zip(a.v, c.cv)"
        ".list_transform(p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
    )
    parts = ["""
    WITH allv AS (
      SELECT vec_id,
             embedding.list_transform(x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )"""]
    for s in range(m):
        lo = s * d_sub
        parts.append(f""",
    s{s}_v AS (
      SELECT vec_id, v[{lo + 1}:{lo + d_sub}] AS v FROM allv
    ),
    s{s}_it0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      FROM (SELECT vec_id, v FROM s{s}_v ORDER BY vec_id LIMIT {k_codes})
    )""")
        for it in range(n_iter):
            parts.append(f""",
    s{s}_a{it} AS (
      SELECT vec_id, v, cid FROM (
        SELECT a.vec_id, a.v, c.cid, {sq} AS d,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {sq}, c.cid) AS rk
        FROM s{s}_v a CROSS JOIN s{s}_it{it} c) WHERE rk = 1
    ),
    s{s}_m{it} AS (
      SELECT cid, list(mu ORDER BY dim) AS cv FROM (
        SELECT cid, CAST(u[2] AS INT) AS dim,
               ROUND(AVG(CAST(u[1] AS DOUBLE)), 8) AS mu
        FROM (SELECT cid, UNNEST(list_zip(v, range(1, len(v) + 1))) AS u
              FROM s{s}_a{it})
        GROUP BY cid, dim) GROUP BY cid
    ),
    s{s}_it{it + 1} AS (
      SELECT c0.cid, COALESCE(s{s}_m{it}.cv, c0.cv) AS cv
      FROM s{s}_it{it} c0 LEFT JOIN s{s}_m{it} USING (cid)
    )""")
        parts.append(f""",
    s{s}_code AS (
      SELECT vec_id, cid FROM (
        SELECT a.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {sq}, c.cid) AS rk
        FROM s{s}_v a CROSS JOIN s{s}_it{n_iter} c) WHERE rk = 1
    ),
    s{s}_tab AS (
      SELECT a.vec_id AS query_id, c.cid, {sq} AS d
      FROM (SELECT vec_id, v FROM s{s}_v WHERE vec_id < {n_queries}) a
      CROSS JOIN s{s}_it{n_iter} c
    )""")
    code_joins = "\n      ".join(
        f"JOIN s{s}_code c{s} ON c{s}.vec_id = a.vec_id" for s in range(m)
    )
    tab_joins = "\n      ".join(
        f"JOIN s{s}_tab t{s} ON t{s}.query_id = q.query_id"
        f" AND t{s}.cid = c.c{s}"
        for s in range(m)
    )
    adc = " + ".join(f"t{s}.d" for s in range(m))
    parts.append(f""",
    codes AS (
      SELECT a.vec_id, {", ".join(f"c{s}.cid AS c{s}" for s in range(m))}
      FROM allv a
      {code_joins}
    ),
    qids AS (SELECT DISTINCT query_id FROM s0_tab),
    scored AS (
      SELECT q.query_id, c.vec_id, ROUND({adc}, 6) AS adc_dist
      FROM codes c CROSS JOIN qids q
      {tab_joins}
      WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, adc_dist, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """)
    return "".join(parts)


@query(
    "similarity_hamming_topk",
    oracle=_hamming_topk_sql(64, _N_QUERIES, _K),
)
def similarity_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-code Hamming ANN under the full oracle gate
    (operators/similarity.hamming_topk): binarize every vector against
    the 8dp per-dim corpus means (the zero-rotation ITQ special case),
    pack sign bits into BIGINT words (Horner fold on Spark, explicit
    shifts in the oracle — same integer), rank by exact
    bit_count(xor). Integers end to end after the threshold compare,
    so the ranking is hash-exact under ANY partitioning by
    construction; a planted exact-copy twin ranks first at Hamming 0
    (pinned in tests/test_r12_oracles.py).

    Scale shape: one corpus aggregate (means — broadcast, never
    collected), one map-side packing pass per side, then the
    cosine_topk broadcast-queries join at 1/32 the operand width — the
    SCREEN half of screen-then-rerank (plan contract: broadcast
    cross + exactly one query-key exchange for the top-k window)."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        hamming_topk,
    )

    emb = load(spark, sf_dir, "embeddings", fanout=True).withColumn(
        "embedding", _as_double(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return hamming_topk(emb, queries, dim=64, k=_K)


@query(
    "similarity_pq_topk",
    oracle=_pq_topk_sql(64, 4, 8, 2, _N_QUERIES, _K),
)
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (Jégou, Douze & Schmid, TPAMI
    2011) under the full oracle gate (operators/similarity.pq_topk):
    m=4 subspaces, per-subspace codebooks trained with the
    kmeans_refine Lloyd loop (seeded from the first k_codes vectors by
    id — engine-derivable), items encoded as m small codes, queries
    ranked by the per-query m x k_codes ADC table sum (6dp entries,
    fixed-order 6dp-rounded m-term add). The oracle unrolls ALL FOUR
    Lloyd trajectories as chained CTEs plus encode + tables + ADC —
    the deepest oracle in the repo — and hashes exactly.

    Scale shape: training = m short kmeans runs (bounded model state);
    encode = ONE map-side pass (codebooks are plan literals); search =
    broadcast-queries join over m INTs per item with the ADC tables
    built in the plan from literal codebooks — no driver-side data
    pull beyond the documented k_codes-row seed collect. Plan
    contract: broadcast cross + exactly one query-key exchange."""
    from hummingbirddatapipeline_spark.operators.similarity import pq_topk

    emb = load(spark, sf_dir, "embeddings", fanout=True).withColumn(
        "embedding", _as_double(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return pq_topk(emb, queries, dim=64, m=4, k_codes=8, n_iter=2, k=_K)


def _matryoshka_sql(
    dims: "tuple[int, ...]" = (16, 64), k: int = 10, n_queries: int = 5
) -> str:
    """Independent DuckDB formulation of Matryoshka truncation recall
    (operators/similarity.matryoshka_recall): re-ranks the full-dim
    AND each d-truncated exact cosine top-k from the raw embeddings
    (6dp + id tiebreak, the similarity_cosine_topk arithmetic) and
    recounts the overlap — integers + one exact division."""

    def dot(d: "int | None") -> str:
        sl = f"[1:{d}]" if d else ""
        a, q = f"(a.embedding::DOUBLE[]){sl}", f"(q.embedding::DOUBLE[]){sl}"
        return (
            f"list_dot_product({a}, {q})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({q}, {q})))"
        )

    def ranking(d: "int | None", name: str) -> str:
        return f"""{name} AS (
      SELECT query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
        FROM (SELECT q.vec_id AS query_id, a.vec_id,
                     ROUND({dot(d)}, 6) AS sim
              FROM embeddings a
              CROSS JOIN (SELECT * FROM embeddings
                          WHERE vec_id < {n_queries}) q
              WHERE a.vec_id <> q.vec_id))
      WHERE rank <= {k})"""

    ctes = [ranking(None, "fullr")] + [
        ranking(d, f"trunc{d}") for d in dims
    ]
    sels = [
        f"""SELECT qq.query_id, {d} AS dim,
           CAST(COALESCE(o.n, 0) AS BIGINT) AS n_overlap,
           ROUND(CAST(COALESCE(o.n, 0) AS DOUBLE)
                 / CAST({k} AS DOUBLE), 6) AS recall
    FROM (SELECT DISTINCT vec_id AS query_id FROM embeddings
          WHERE vec_id < {n_queries}) qq
    LEFT JOIN (SELECT f.query_id, COUNT(*) AS n
               FROM fullr f JOIN trunc{d} t USING (query_id, vec_id)
               GROUP BY f.query_id) o USING (query_id)"""
        for d in dims
    ]
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    "
        + "\n    UNION ALL\n    ".join(sels)
    )


# --- r15-banked oracle builders (NOT yet registered; differential
# tests in tests/test_r15_oracles.py import these so the SQL has a
# single source of truth and r15 registration is a decorator + window
# change, exactly like the r11-r14 banks).

@query("similarity_matryoshka_recall", oracle=_matryoshka_sql((16, 64), 10, 5))
def similarity_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation recall (Kusupati et al. 2022;
    operators/similarity.matryoshka_recall) under the full oracle
    gate: for each query (vec_id < 5) and each prefix dimension d in
    (16, 64), the overlap between the d-truncated exact cosine top-10
    and the full-dim top-10 — the acceptance report that decides how
    short an MRL screening prefix can be before rerank quality
    regresses. Both rankings use the similarity_cosine_topk arithmetic
    (6dp + id tiebreak); recall is integers + one exact division.
    Fidelity monotonicity (mean recall non-decreasing in d) is pinned
    in tests/test_r14_oracles.py.

    Scale shape: the screen-then-rerank evaluation reduces to the
    cosine-topk plan per (query, dim) — broadcast query rows, map-side
    scores, WindowGroupLimit top-k below the exchange; prefix slices
    are free (array slice at the scan)."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        matryoshka_recall,
    )

    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", _as_double(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return matryoshka_recall(emb, queries, dims=(16, 64), k=10)


def _sq8_fidelity_sql() -> str:
    """Independent DuckDB formulation of per-dimension uint8 scalar
    quantization fidelity (operators/similarity.sq8_fidelity):
    re-derives the per-dim corpus (min, max) grid, the floor(x + 0.5)
    codes (explicit half-up — engine round() half-rules differ), the
    affine dequantization, the exact BIGINT code_sum, and the
    6dp-rounded reconstruction cosine / max abs error."""
    return """
    WITH allv AS (
      SELECT vec_id,
             embedding.list_transform(x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    st AS (
      SELECT list(mnv ORDER BY dim) AS mn, list(mxv ORDER BY dim) AS mx
      FROM (
        SELECT CAST(u[2] AS INT) AS dim,
               MIN(CAST(u[1] AS DOUBLE)) AS mnv,
               MAX(CAST(u[1] AS DOUBLE)) AS mxv
        FROM (SELECT UNNEST(list_zip(v, range(1, len(v) + 1))) AS u
              FROM allv)
        GROUP BY 1)
    ),
    enc AS (
      SELECT vec_id, v, mn, mx,
             list_transform(range(1, len(v) + 1), i ->
               CASE WHEN mx[i] = mn[i] THEN 0.0
                    ELSE floor((v[i] - mn[i]) * 255.0 / (mx[i] - mn[i])
                               + 0.5) END) AS codes
      FROM allv CROSS JOIN st
    ),
    dec AS (
      SELECT vec_id, v, codes,
             list_transform(range(1, len(v) + 1), i ->
               mn[i] + codes[i] * (mx[i] - mn[i]) / 255.0) AS deq
      FROM enc
    )
    SELECT vec_id,
           CAST(list_sum(list_transform(codes, c -> CAST(c AS BIGINT)))
                AS BIGINT) AS code_sum,
           ROUND(list_sum(list_zip(v, deq)
                    .list_transform(p -> p[1] * p[2]))
                 / (sqrt(list_sum(v.list_transform(x -> x * x)))
                    * sqrt(list_sum(deq.list_transform(x -> x * x)))),
                 6) AS cos_fidelity,
           ROUND(list_max(list_zip(v, deq)
                    .list_transform(p -> abs(p[1] - p[2]))), 6)
             AS max_abs_err
    FROM dec
    """


@query("similarity_sq8_fidelity", oracle=_sq8_fidelity_sql())
def similarity_sq8_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension uint8 scalar-quantization fidelity
    (operators/similarity.sq8_fidelity) under the full oracle gate —
    the SQ8 acceptance report (Faiss ScalarQuantizer's QT_8bit): each
    dimension gets its own [min, max] grid from a corpus stats pass,
    codes are floor(x + 0.5) on the 255-step grid, and per vector the
    report carries the exact BIGINT code checksum plus the
    6dp-rounded cosine(original, reconstructed) and abs error — the
    decide-before-you-compress number for the 4x memory cut. DuckDB
    rebuilds grid, codes, and fidelity from the raw embeddings.

    Scale shape: the stats-then-transform two-pass every quantizer
    pays — one per-dim min/max aggregate broadcast back, then a pure
    map-side encode+report pass; nothing else shuffles."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        sq8_fidelity,
    )

    emb = load(spark, sf_dir, "embeddings", fanout=True).withColumn(
        "embedding", _as_double(F.col("embedding"))
    )
    return sq8_fidelity(emb, dim=64)


def _ivfpq_topk_sql(
    dim: int = 64,
    m: int = 4,
    k_codes: int = 8,
    n_iter: int = 2,
    n_probe: int = 4,
    n_queries: int = 5,
    k: int = 10,
) -> str:
    """Independent DuckDB formulation of IVF-PQ top-k
    (operators/similarity.ivfpq_topk): re-derives the frozen-centroid
    cell assignment (6dp cosine argmax, ties -> lowest cid — the
    _ivf_frozen_cent_sql arithmetic), each query's n_probe probe list
    (sim DESC, cid ASC), all m PQ Lloyd trajectories from the
    first-k_codes seeds (the _pq_topk_sql recurrence), and ranks the
    ADC sum over ONLY the items whose cell is probed."""
    d_sub = dim // m
    sq = (
        "ROUND(list_sum(list_zip(a.v, c.cv)"
        ".list_transform(p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
    )
    parts = [f"""
    WITH allv AS (
      SELECT vec_id,
             embedding.list_transform(x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cents AS (
      SELECT cid, cv.list_transform(x -> CAST(x AS DOUBLE)) AS cv
      FROM ({_cent_cte_body()})
    ),
    csc AS (
      SELECT a.vec_id, c.cid,
             ROUND(
               list_sum(list_zip(a.v, c.cv)
                 .list_transform(p -> p[1] * p[2]))
               / (sqrt(list_sum(a.v.list_transform(x -> x * x)))
                  * sqrt(list_sum(c.cv.list_transform(x -> x * x)))), 6)
               AS sim
      FROM allv a CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, CAST(cid AS INT) AS centroid_id FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER
                 (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
        FROM csc) WHERE rk = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, CAST(cid AS INT) AS centroid_id FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER
                 (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
        FROM csc WHERE vec_id < {n_queries}) WHERE rk <= {n_probe}
    )"""]
    for s in range(m):
        lo = s * d_sub
        parts.append(f""",
    s{s}_v AS (
      SELECT vec_id, v[{lo + 1}:{lo + d_sub}] AS v FROM allv
    ),
    s{s}_it0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      FROM (SELECT vec_id, v FROM s{s}_v ORDER BY vec_id LIMIT {k_codes})
    )""")
        for it in range(n_iter):
            parts.append(f""",
    s{s}_a{it} AS (
      SELECT vec_id, v, cid FROM (
        SELECT a.vec_id, a.v, c.cid, {sq} AS d,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {sq}, c.cid) AS rk
        FROM s{s}_v a CROSS JOIN s{s}_it{it} c) WHERE rk = 1
    ),
    s{s}_m{it} AS (
      SELECT cid, list(mu ORDER BY dim) AS cv FROM (
        SELECT cid, CAST(u[2] AS INT) AS dim,
               ROUND(AVG(CAST(u[1] AS DOUBLE)), 8) AS mu
        FROM (SELECT cid, UNNEST(list_zip(v, range(1, len(v) + 1))) AS u
              FROM s{s}_a{it})
        GROUP BY cid, dim) GROUP BY cid
    ),
    s{s}_it{it + 1} AS (
      SELECT c0.cid, COALESCE(s{s}_m{it}.cv, c0.cv) AS cv
      FROM s{s}_it{it} c0 LEFT JOIN s{s}_m{it} USING (cid)
    )""")
        parts.append(f""",
    s{s}_code AS (
      SELECT vec_id, cid FROM (
        SELECT a.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {sq}, c.cid) AS rk
        FROM s{s}_v a CROSS JOIN s{s}_it{n_iter} c) WHERE rk = 1
    ),
    s{s}_tab AS (
      SELECT a.vec_id AS query_id, c.cid, {sq} AS d
      FROM (SELECT vec_id, v FROM s{s}_v WHERE vec_id < {n_queries}) a
      CROSS JOIN s{s}_it{n_iter} c
    )""")
    code_joins = "\n      ".join(
        f"JOIN s{s}_code c{s} ON c{s}.vec_id = a.vec_id" for s in range(m)
    )
    tab_joins = "\n      ".join(
        f"JOIN s{s}_tab t{s} ON t{s}.query_id = p.query_id"
        f" AND t{s}.cid = c.c{s}"
        for s in range(m)
    )
    adc = " + ".join(f"t{s}.d" for s in range(m))
    parts.append(f""",
    codes AS (
      SELECT a.vec_id, av.centroid_id,
             {", ".join(f"c{s}.cid AS c{s}" for s in range(m))}
      FROM allv a
      JOIN assigned av ON av.vec_id = a.vec_id
      {code_joins}
    ),
    scored AS (
      SELECT p.query_id, c.vec_id, ROUND({adc}, 6) AS adc_dist
      FROM codes c
      JOIN probes p ON p.centroid_id = c.centroid_id
      {tab_joins}
      WHERE c.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, adc_dist, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """)
    return "".join(parts)


@query("similarity_ivfpq_topk", oracle=_ivfpq_topk_sql(64, 4, 8, 2, 4, 5, 10))
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (Jégou et al. 2011 — the billion-scale
    layout; operators/similarity.ivfpq_topk) under the full oracle
    gate: frozen-centroid cell routing (n_probe=4 of the
    IVF_CENTROIDS_64D cells) composed with PQ/ADC ranking (m=4
    subspaces, 8 codes each, 2 Lloyd iterations) — the candidate cut
    is ONE BroadcastHashJoin on (query, probed cell), then ADC
    distances rank only the probed population. DuckDB re-derives cell
    assignment, probe lists, and all m Lloyd trajectories as chained
    CTEs. Consistency with full-scan pq_topk (identical adc_dist per
    returned pair; candidates a subset of probed cells) is pinned in
    tests/test_r15_oracles.py.

    Scale shape: the production ANN serving plan — assignment is
    map-side against centroid literals, the probe join is an
    equi-join (contract-pinned), and per-cell candidate volume is
    n/k_cells on average; at 1B vectors this is the layout that keeps
    query cost sub-linear."""
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.operators.similarity import ivfpq_topk

    emb = load(spark, sf_dir, "embeddings", fanout=True).withColumn(
        "embedding", _as_double(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ivfpq_topk(
        emb,
        queries,
        dim=64,
        centroids=IVF_CENTROIDS_64D,
        n_probe=4,
        m=4,
        k_codes=8,
        n_iter=2,
        k=10,
    )


def _cell_drift_sql() -> str:
    """Independent DuckDB formulation of the frozen-quantizer drift
    monitor (operators/similarity.ivf_cell_drift): replays the
    deterministic embedding recrawl (drop vec_id % 17 == 0, shift the
    first coordinate by +0.25 for vec_id % 5 == 0), re-derives BOTH
    snapshots' 6dp cosine argmax cell assignments from the frozen
    centroid constants, and recounts arrivals/departures per cell —
    pure integer counts."""

    def assign(src: str, out: str) -> str:
        return f"""{out} AS (
      SELECT vec_id, CAST(cid AS INT) AS c FROM (
        SELECT a.vec_id, c.cid, ROW_NUMBER() OVER
                 (PARTITION BY a.vec_id ORDER BY
                  ROUND(list_sum(list_zip(a.v, c.cv)
                          .list_transform(p -> p[1] * p[2]))
                    / (sqrt(list_sum(a.v.list_transform(x -> x * x)))
                       * sqrt(list_sum(c.cv.list_transform(x -> x * x)))),
                    6) DESC, c.cid) AS rk
        FROM {src} a CROSS JOIN cents c) WHERE rk = 1)"""

    return f"""
    WITH cents AS (
      SELECT cid, cv.list_transform(x -> CAST(x AS DOUBLE)) AS cv
      FROM ({_cent_cte_body()})
    ),
    oldv AS (
      SELECT vec_id,
             embedding.list_transform(x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    newv AS (
      SELECT vec_id,
             CASE WHEN vec_id % 5 = 0
                  THEN list_value(v[1] + 0.25) || v[2:]
                  ELSE v END AS v
      FROM oldv WHERE vec_id % 17 <> 0
    ),
    {assign('oldv', 'aa')},
    {assign('newv', 'ab')},
    j AS (
      SELECT COALESCE(aa.vec_id, ab.vec_id) AS vec_id,
             aa.c AS ca, ab.c AS cb
      FROM aa FULL OUTER JOIN ab ON aa.vec_id = ab.vec_id
    ),
    na AS (SELECT ca AS centroid_id, COUNT(*) AS n_old
           FROM j WHERE ca IS NOT NULL GROUP BY 1),
    nb AS (SELECT cb AS centroid_id, COUNT(*) AS n_new
           FROM j WHERE cb IS NOT NULL GROUP BY 1),
    arr AS (SELECT cb AS centroid_id, COUNT(*) AS n_arrivals
            FROM j WHERE cb IS NOT NULL
              AND (ca IS NULL OR ca <> cb) GROUP BY 1),
    dep AS (SELECT ca AS centroid_id, COUNT(*) AS n_departures
            FROM j WHERE ca IS NOT NULL
              AND (cb IS NULL OR cb <> ca) GROUP BY 1)
    SELECT COALESCE(na.centroid_id, nb.centroid_id, arr.centroid_id,
                    dep.centroid_id) AS centroid_id,
           CAST(COALESCE(n_old, 0) AS BIGINT) AS n_old,
           CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
           CAST(COALESCE(n_arrivals, 0) AS BIGINT) AS n_arrivals,
           CAST(COALESCE(n_departures, 0) AS BIGINT) AS n_departures
    FROM na
    FULL OUTER JOIN nb USING (centroid_id)
    FULL OUTER JOIN arr USING (centroid_id)
    FULL OUTER JOIN dep USING (centroid_id)
    """


@query("similarity_cell_drift", oracle=_cell_drift_sql())
def similarity_cell_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-quantizer embedding-drift monitor
    (operators/similarity.ivf_cell_drift) under the full oracle gate —
    the IVF-index maintenance view: old vs new embedding snapshots
    both assign to the FROZEN IVF_CENTROIDS_64D cells (map-side, plan
    literals), and per cell the report carries exact populations plus
    arrival/departure counts — the number that says when the quantizer
    needs retraining. The recrawl fixture derives deterministically
    from embeddings (drop every 17th, shift dim 0 by +0.25 for every
    5th), so conservation identities are closed-form (pinned in
    tests/test_r18_oracles.py).

    Scale shape: two zero-exchange assignment passes (the
    ivf_incremental_add plan) + one k-row cell aggregate; the monitor
    costs two scans and ships k rows regardless of corpus size."""
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.operators.similarity import (
        ivf_cell_drift,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("embedding")
    )
    v = F.col("vec_id")
    new = emb.filter(v % 17 != 0).select(
        "vec_id",
        F.when(
            v % 5 == 0,
            F.expr(
                "concat(array(embedding[0] + 0.25D),"
                " slice(embedding, 2, size(embedding) - 1))"
            ),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    return ivf_cell_drift(emb, new, IVF_CENTROIDS_64D)


# --- r21-banked oracle builder (NOT yet registered; registration
# target: the r20 window — recipe in PLANS.md "r21 bank").

def _pq_distortion_sql(
    dim: int = 64, m: int = 4, k_codes: int = 8, n_iter: int = 2
) -> str:
    """Independent DuckDB formulation of the PQ distortion report
    (operators/similarity.pq_distortion): unrolls the SAME m Lloyd
    trajectories as :func:`_pq_topk_sql` (6dp distances, ties ->
    lowest cid, 8dp means, empty-cluster carry), keeps each vector's
    argmin (code, distance) per subspace, and re-derives the exact
    code_sum (sum code_s * k_codes^s) and the fixed-order 6dp-rounded
    distortion sum."""
    d_sub = dim // m
    sq = (
        "ROUND(list_sum(list_zip(a.v, c.cv)"
        ".list_transform(p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
    )
    parts = ["""
    WITH allv AS (
      SELECT vec_id,
             embedding.list_transform(x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )"""]
    for s in range(m):
        lo = s * d_sub
        parts.append(f""",
    s{s}_v AS (
      SELECT vec_id, v[{lo + 1}:{lo + d_sub}] AS v FROM allv
    ),
    s{s}_it0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      FROM (SELECT vec_id, v FROM s{s}_v ORDER BY vec_id LIMIT {k_codes})
    )""")
        for it in range(n_iter):
            parts.append(f""",
    s{s}_a{it} AS (
      SELECT vec_id, v, cid FROM (
        SELECT a.vec_id, a.v, c.cid, {sq} AS d,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {sq}, c.cid) AS rk
        FROM s{s}_v a CROSS JOIN s{s}_it{it} c) WHERE rk = 1
    ),
    s{s}_m{it} AS (
      SELECT cid, list(mu ORDER BY dim) AS cv FROM (
        SELECT cid, CAST(u[2] AS INT) AS dim,
               ROUND(AVG(CAST(u[1] AS DOUBLE)), 8) AS mu
        FROM (SELECT cid, UNNEST(list_zip(v, range(1, len(v) + 1))) AS u
              FROM s{s}_a{it})
        GROUP BY cid, dim) GROUP BY cid
    ),
    s{s}_it{it + 1} AS (
      SELECT c0.cid, COALESCE(s{s}_m{it}.cv, c0.cv) AS cv
      FROM s{s}_it{it} c0 LEFT JOIN s{s}_m{it} USING (cid)
    )""")
        parts.append(f""",
    s{s}_pick AS (
      SELECT vec_id, cid, d FROM (
        SELECT a.vec_id, c.cid, {sq} AS d,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {sq}, c.cid) AS rk
        FROM s{s}_v a CROSS JOIN s{s}_it{n_iter} c) WHERE rk = 1
    )""")
    code_sum = " + ".join(f"p{s}.cid * {k_codes**s}" for s in range(m))
    dist = " + ".join(f"p{s}.d" for s in range(m))
    joins = "\n      ".join(
        f"JOIN s{s}_pick p{s} ON p{s}.vec_id = a.vec_id" for s in range(m)
    )
    parts.append(f"""
    SELECT a.vec_id,
           CAST({code_sum} AS BIGINT) AS code_sum,
           ROUND({dist}, 6) AS distortion
    FROM allv a
      {joins}
    """)
    return "".join(parts)


@query("similarity_pq_distortion", oracle=_pq_distortion_sql(64, 4, 8, 2))
def similarity_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector PQ reconstruction distortion
    (operators/similarity.pq_distortion) under the SHARED _pq_train
    codebooks (m=4 subspaces, 8 codes, 2 Lloyd iterations) — the
    quantity PQ training minimizes, as the acceptance report that
    picks m/k_codes BEFORE queries regress; the PQ sibling of
    sq8_fidelity. distortion = fixed-order sum of each subspace's 6dp
    argmin distance (selection, not new arithmetic); code_sum = exact
    BIGINT sum(code_s * k_codes^s) hashes the whole code vector. The
    DuckDB oracle unrolls all m Lloyd trajectories and re-picks every
    argmin. Lloyd monotonicity end-to-end and exact-twin determinism
    are pinned in tests/test_r21_oracles.py.

    Scale shape: the report pass is map-side ONLY — codebooks are plan
    literals, ZERO exchanges and zero joins after training
    (contract-pinned)."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        pq_distortion,
    )

    emb = load(spark, sf_dir, "embeddings", fanout=True).select(
        "vec_id", _as_double(F.col("embedding")).alias("embedding")
    )
    return pq_distortion(emb, dim=64, m=4, k_codes=8, n_iter=2)


def _source_profile_sql() -> str:
    """Independent DuckDB formulation of the per-source embedding norm
    profile (operators/similarity.embedding_source_profile): row-local
    sqrt(dot) norms quantized e6 (the embedding family convention),
    exact integer sums for the mean."""
    return """
    WITH v AS (
      SELECT vec_id,
             CAST(ROUND(1000000 * sqrt(list_dot_product(
               embedding::DOUBLE[], embedding::DOUBLE[])))
               AS BIGINT) AS norm_e6
      FROM embeddings
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(ROUND(CAST(SUM(v.norm_e6) AS DOUBLE) / COUNT(*))
                AS BIGINT) AS mean_norm_e6,
           MIN(v.norm_e6) AS min_norm_e6,
           MAX(v.norm_e6) AS max_norm_e6
    FROM v JOIN documents d ON d.doc_id = v.vec_id
    GROUP BY d.source
    """


@query("similarity_source_profile", oracle=_source_profile_sql())
def similarity_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source embedding norm profile
    (operators/similarity.embedding_source_profile) under the full
    oracle gate — the drift view per ingest source (a shifted norm
    distribution = re-embedded with a different model): n plus
    mean/min/max norms as e6 BIGINTs, the mean from EXACT integer
    sums so the report is partitioning-invariant. sqrt is
    IEEE-correctly-rounded, so the row-local norm is safe
    cross-engine (the unit_norm_e6 precedent, validated on RAW norms).
    The 3-4-5 fixture and the doubling-scale invariance are pinned in
    tests/test_r26_oracles.py.

    Scale shape: norms reduce map-side to ONE long per vector BEFORE
    the source attach — the embedding array never crosses the join;
    one K-row aggregate."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        embedding_source_profile,
    )

    return embedding_source_profile(
        load(spark, sf_dir, "embeddings"), load(spark, sf_dir, "documents")
    )


def _centroid_drift_sql() -> str:
    """Independent DuckDB formulation of the per-source centroid drift
    (operators/similarity.centroid_drift_by_source): e6-quantized
    per-dim exact-long sums, the global vector derived from the same
    table, and the dim-ordered cosine fold."""
    return """
    WITH expl AS (
      SELECT d.source, v.vec_id,
             unnest(list_transform(range(len(v.embedding)),
                    i -> {'dim': CAST(i AS INT),
                          'x': CAST(v.embedding[i + 1] AS DOUBLE)}))
               AS u
      FROM embeddings v
      JOIN documents d ON d.doc_id = v.vec_id
    ),
    comp AS (
      SELECT source, vec_id, u.dim AS dim,
             CAST(ROUND(1000000 * u.x) AS BIGINT) AS x_e6
      FROM expl
    ),
    per_sd AS (
      SELECT source, dim, CAST(SUM(x_e6) AS BIGINT) AS s,
             COUNT(DISTINCT vec_id) AS nv
      FROM comp GROUP BY 1, 2
    ),
    per_source AS (
      SELECT source,
             list(CAST(s AS DOUBLE) ORDER BY dim) AS v,
             CAST(MAX(nv) AS BIGINT) AS n_vecs
      FROM per_sd GROUP BY source
    ),
    gl AS (
      SELECT list(CAST(g AS DOUBLE) ORDER BY dim) AS gv
      FROM (SELECT dim, SUM(s) AS g FROM per_sd GROUP BY dim)
    )
    SELECT ps.source, ps.n_vecs,
           ROUND(list_dot_product(ps.v, gl.gv)
                 / (sqrt(list_dot_product(ps.v, ps.v))
                    * sqrt(list_dot_product(gl.gv, gl.gv))), 6)
             AS cos_to_global
    FROM per_source ps CROSS JOIN gl
    """


@query("similarity_centroid_drift", oracle=_centroid_drift_sql())
def similarity_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of each source's embedding centroid to the global
    centroid (operators/similarity.centroid_drift_by_source) under the
    full oracle gate — the DIRECTION drift completing
    similarity_source_profile's magnitude view (a shifted direction =
    re-embedded with a different model). cos(sum_s, sum_global) ==
    cos(centroids) under positive scalings, so the whole chain runs on
    e6-quantized EXACT per-dim long sums (partitioning-invariant),
    dim-ordered fold, one sqrt pair, 6dp. Orthogonal sources landing
    exactly on cos 45 = 0.707107 pinned in tests/test_r31_oracles.py.

    Scale shape: vectors reduce map-side to per-dim long sums before
    anything shuffles; the exchange carries K x dim longs total."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        centroid_drift_by_source,
    )

    return centroid_drift_by_source(
        load(spark, sf_dir, "embeddings"), load(spark, sf_dir, "documents")
    )
