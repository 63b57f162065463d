"""Differential (DuckDB) checks for the operators banked for round-10
catalog registration — in-engine k-means quantizer training (Lloyd's,
fixed iterations, pagerank-style per-iteration quantize) and
cluster-aware benchmark decontamination (per-doc n-gram collision
escalated to whole near-dup clusters) — run on the real testdata
exactly the way the catalog oracle gate would, so next round's
registration is a window change, not new work. Each DuckDB side is an
independent formulation per the repo's differential rule: the k-means
oracle re-derives every centroid of every iteration as chained CTEs
from the same 8dp seed constants; the decontamination oracle rebuilds
the gram collision AND the recursive cluster closure."""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_KM_ITERS = 3


def _duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )
    return con


def _norm(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                v.hex() if isinstance(v, float) and not math.isnan(v) else v
                for v in r
            )
        )
    return sorted(out, key=repr)


def test_kmeans_refine_matches_duckdb(spark):
    """Three Lloyd iterations from the frozen IVF seeds: DuckDB
    re-derives every intermediate centroid and the final assignment
    from the same constants; both engines must agree on every
    (vec_id, cluster_id, dist) row."""
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.catalog.similarity_q import (
        _kmeans_refine_sql,
    )
    from hummingbirddatapipeline_spark.operators.similarity import (
        kmeans_refine,
    )
    from hummingbirddatapipeline_spark.tables import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    assigned, cents = kmeans_refine(
        emb, IVF_CENTROIDS_64D, n_iter=_KM_ITERS
    )
    rows = [tuple(r) for r in assigned.collect()]

    con = _duck()
    exp = con.sql(_kmeans_refine_sql(_KM_ITERS)).fetchall()
    con.close()
    assert len(rows) == len(exp) > 0
    assert _norm(rows) == _norm(exp)

    # training genuinely moved the quantizer off its seeds…
    assert cents != [list(map(float, c)) for c in IVF_CENTROIDS_64D]
    # …keeping every cell populated on this fixture
    used = {r[1] for r in rows}
    assert used == set(range(len(IVF_CENTROIDS_64D)))


def test_kmeans_refine_tightens_assignment(spark):
    """Lloyd's is monotone in total within-cluster distance: the
    refined centroids must not assign worse (summed rounded sqdist)
    than the frozen seeds on the same data."""
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.operators.similarity import (
        kmeans_refine,
    )
    from hummingbirddatapipeline_spark.tables import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    before, _ = kmeans_refine(emb, IVF_CENTROIDS_64D, n_iter=0)
    after, _ = kmeans_refine(emb, IVF_CENTROIDS_64D, n_iter=_KM_ITERS)
    s_before = before.agg(F.sum("dist")).first()[0]
    s_after = after.agg(F.sum("dist")).first()[0]
    assert s_after < s_before


def test_kmeans_refine_guards(spark):
    import pytest

    from hummingbirddatapipeline_spark.operators.similarity import (
        kmeans_refine,
    )
    from hummingbirddatapipeline_spark.tables import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    with pytest.raises(ValueError, match="empty"):
        kmeans_refine(emb, [], n_iter=1)
    with pytest.raises(ValueError, match="ragged"):
        kmeans_refine(emb, [[0.0, 1.0], [0.0]], n_iter=1)


def test_decontaminate_clusters_matches_duckdb(spark):
    """Benchmark = docs 0-19 (the text_contamination_check fixture);
    training docs report per-doc 5-gram collisions AND the
    cluster-level escalation over the shared exact-Jaccard near-dup
    graph. DuckDB rebuilds the gram join and the recursive closure
    independently."""
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.catalog.text_q import _DUCK_TOKS
    from hummingbirddatapipeline_spark.operators.contamination import (
        decontaminate_clusters,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 20)
    pairs = shared_jaccard_pairs(spark, SF)
    got = decontaminate_clusters(docs, bench, pairs, n=5)
    rows = [tuple(r) for r in got.collect()]

    sql = f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(t) >= 5
                    THEN list_transform(range(len(t) - 4),
                                        i -> array_to_string(t[i + 1 : i + 5], ' '))
                    ELSE []::VARCHAR[] END
             ) AS gs
      FROM toks
    ),
    bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id < 20
    ),
    dg AS (
      SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id >= 20
    ),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_hit FROM dg JOIN bench USING (g)
      GROUP BY doc_id
    ),
    jt AS (
      SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS w FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM jt GROUP BY doc_id),
    near AS (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM jt a JOIN jt b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) p
      JOIN sizes sa ON sa.doc_id = p.id_a
      JOIN sizes sb ON sb.doc_id = p.id_b
      WHERE inter / (sa.n + sb.n - inter) >= 0.85
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
    ),
    labeled AS (
      SELECT d.doc_id,
             COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
    ),
    per_doc AS (
      SELECT l.doc_id, l.cluster_id,
             CAST(len(g.gs) AS BIGINT) AS n_grams,
             CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit_grams,
             COALESCE(h.n_hit, 0) >= 1 AS doc_contaminated
      FROM labeled l
      JOIN grams g USING (doc_id)
      LEFT JOIN hits h USING (doc_id)
      WHERE l.doc_id >= 20
    ),
    cl AS (
      SELECT l.cluster_id,
             MAX(CASE WHEN l.doc_id < 20 THEN 1 ELSE 0 END) = 1 AS has_bench,
             MAX(CASE WHEN p.doc_contaminated THEN 1 ELSE 0 END) = 1
               AS has_hit
      FROM labeled l LEFT JOIN per_doc p USING (doc_id)
      GROUP BY l.cluster_id
    )
    SELECT p.doc_id, p.cluster_id, p.n_grams, p.n_hit_grams,
           p.doc_contaminated,
           (cl.has_bench OR cl.has_hit) AS cluster_contaminated,
           NOT (cl.has_bench OR cl.has_hit) AS kept
    FROM per_doc p JOIN cl USING (cluster_id)
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    con.close()
    assert len(rows) == len(exp) > 0
    assert _norm(rows) == _norm(exp)

    # the fixture has real structure on every side of the contract:
    n_doc = sum(1 for r in rows if r[4])
    n_cluster = sum(1 for r in rows if r[5])
    assert 0 < n_doc <= n_cluster          # escalation only widens
    assert any(r[6] for r in rows)          # something survives
    # every directly-hit doc is cluster-contaminated (superset rule)
    assert all(r[5] for r in rows if r[4])


def test_decontaminate_cluster_escalation(spark):
    """A synthetic twin makes the escalation observable end-to-end: a
    train doc that is a near-dup of a DIRECTLY contaminated train doc
    (but shares no 5-gram with the benchmark itself) must still be
    dropped via its cluster."""
    from hummingbirddatapipeline_spark.operators.contamination import (
        decontaminate_clusters,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),      # benchmark
            (100, "alpha beta gamma delta epsilon eta"),     # direct hit
            (101, "theta iota kappa lam mu nu xi"),          # clean
        ],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") == 1)
    # near-dup edge links the clean doc to the contaminated one
    pairs = spark.createDataFrame(
        [(100, 101)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate_clusters(docs, bench, pairs, n=5).collect()
    }
    assert out[100]["doc_contaminated"] is True
    assert out[101]["doc_contaminated"] is False
    assert out[101]["cluster_contaminated"] is True
    assert out[101]["kept"] is False


def test_shard_manifest_matches_duckdb(spark):
    """Shard layout manifest: DuckDB recomputes every doc's md5 shard
    assignment, token count, and the order-insensitive BIT_XOR
    fingerprint; both engines must agree shard for shard."""
    from hummingbirddatapipeline_spark.functions.text import ws_token_count
    from hummingbirddatapipeline_spark.operators.scale import shard_manifest
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents").select(
        "doc_id",
        ws_token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    got = shard_manifest(
        docs, "doc_id", token_col="n_tokens", n_shards=16, seed="r10"
    )
    rows = [tuple(r) for r in got.collect()]

    sql = """
    WITH h AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':r10'),
                                 1, 13) AS BIGINT) AS h52,
             CAST(len(list_filter(
               string_split_regex(trim(text), '\\s+'),
               t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT h52 % 16 AS shard_id,
           COUNT(*) AS n_docs,
           SUM(n_tokens) AS n_tokens,
           bit_xor(h52) AS fingerprint
    FROM h GROUP BY 1
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    con.close()
    assert len(rows) == len(exp) > 1
    assert _norm(rows) == _norm(exp)

    # fingerprint is genuinely order-insensitive: re-deriving it from a
    # differently-partitioned input is identical
    re_rows = [
        tuple(r)
        for r in shard_manifest(
            docs.repartition(7), "doc_id", token_col="n_tokens",
            n_shards=16, seed="r10",
        ).collect()
    ]
    assert _norm(re_rows) == _norm(rows)


_PCA_ITERS = 3


def test_pca_power_top1_matches_duckdb(spark):
    """Covariance + unrolled power iterations + projection: DuckDB
    re-derives the whole trajectory from the raw embeddings and both
    engines must agree on every (vec_id, pc1_score) row AND on the
    component being unit-norm."""
    from hummingbirddatapipeline_spark.catalog.similarity_q import (
        _pca_top1_sql,
    )
    from hummingbirddatapipeline_spark.operators.similarity import (
        pca_power_top1,
    )
    from hummingbirddatapipeline_spark.tables import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    proj, comp = pca_power_top1(emb, dim=64, n_iter=_PCA_ITERS)
    rows = [tuple(r) for r in proj.collect()]

    con = _duck()
    exp = con.sql(_pca_top1_sql(_PCA_ITERS)).fetchall()
    con.close()
    assert len(rows) == len(exp) > 0
    assert _norm(rows) == _norm(exp)

    # component is unit-norm (quantization dust aside) and the
    # projection is genuinely discriminative on this fixture
    assert abs(sum(x * x for x in comp) - 1.0) < 1e-6
    scores = [r[1] for r in rows]
    assert max(scores) > 0 > min(scores)


def test_pca_power_top1_guards(spark):
    import pytest

    from hummingbirddatapipeline_spark.operators.similarity import (
        pca_power_top1,
    )
    from hummingbirddatapipeline_spark.tables import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    with pytest.raises(ValueError, match="n_iter"):
        pca_power_top1(emb, dim=64, n_iter=0)
    with pytest.raises(ValueError, match="empty"):
        pca_power_top1(emb.filter(F.lit(False)), dim=64, n_iter=1)


def test_pagerank_exact_longs_matches_duckdb_and_partitioning(spark):
    """The r10-banked pagerank hardening: summing scaled longs is
    associative, so the trajectory is bit-identical to DuckDB's
    scaled-long unroll AND invariant under input repartitioning —
    the property the double-sum regime can only approximate (its
    accepted tie-window is documented on the dedup_pagerank row)."""
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        _pagerank_unrolled_sql,
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.operators.graph import pagerank

    pairs = shared_jaccard_pairs(spark, SF)
    got = [
        tuple(r)
        for r in pagerank(pairs, n_iter=10, round_dp=12, exact_longs=True)
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'documents.parquet')}')"
    )
    exp = con.sql(_pagerank_unrolled_sql(10, 12, exact=True)).fetchall()
    con.close()
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)

    rep = [
        tuple(r)
        for r in pagerank(
            pairs.repartition(13), n_iter=10, round_dp=12, exact_longs=True
        ).collect()
    ]
    assert sorted(rep) == sorted(got)


def test_winnow_fingerprints_matches_duckdb(spark):
    """Winnowing (Schleimer et al. 2003): DuckDB replays the k-gram
    hashing, the packed hash*2048+(2047-pos) keys, and the
    rightmost-min window selection with the same integer arithmetic;
    per-doc fingerprint sets must match exactly."""
    from hummingbirddatapipeline_spark.functions.text import (
        winnow_fingerprints,
    )
    from hummingbirddatapipeline_spark.tables import load

    k, w = 4, 5
    docs = load(spark, SF, "documents").select("doc_id", "text")
    got = {
        r["doc_id"]: list(r["fps"])
        for r in docs.select(
            "doc_id", winnow_fingerprints(F.col("text"), k=k, w=w).alias("fps")
        ).collect()
    }

    sql = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    keys AS (
      SELECT doc_id, len(t) - {k - 1} AS ng,
             list_transform(range(len(t) - {k - 1}),
               i -> CAST('0x' || substr(md5(
                      array_to_string(t[i + 1 : i + {k}], ' ')), 1, 13)
                    AS BIGINT) * 2048 + (2047 - i)) AS ks
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN ng - {w - 1} >= 1
                THEN list_sort(list_distinct(
                       list_transform(range(ng - {w - 1}),
                         j -> list_min(ks[j + 1 : j + {w}]))))
                ELSE []::BIGINT[] END AS fps
    FROM keys
    """
    con = _duck()
    exp = {r[0]: list(r[1]) for r in con.sql(sql).fetchall()}
    con.close()
    assert got == exp
    assert any(len(v) > 0 for v in got.values())
    # density: winnowing keeps ~1/w of the k-gram hashes (sanity band)
    total_fps = sum(len(v) for v in got.values())
    total_grams = sum(
        1 for r in docs.select(F.size(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
        ).alias("n")).collect() for _ in range(max(r["n"] - (k - 1), 0))
    )
    assert 0.1 < total_fps / total_grams < 0.8


def test_winnow_shared_substring_guarantee(spark):
    """The published guarantee, constructively: two docs sharing a
    token substring of length >= w + k - 1 (= 8 here) MUST share a
    fingerprint; two disjoint-vocabulary docs share none."""
    from hummingbirddatapipeline_spark.functions.text import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, "x1 y1 z1 " + shared + " p1 q1"),
            (2, "u2 v2 " + shared + " w2 r2 s2"),
            (3, "m3 n3 o3 pp3 qq3 rr3 ss3 tt3 uu3 vv3 ww3"),
        ],
        "doc_id long, text string",
    )
    rows = docs.select(
        "doc_id",
        winnow_fingerprints(F.col("text"), k=4, w=5).alias("fps"),
    ).collect()
    hashes = {r["doc_id"]: {fp // 2048 for fp in r["fps"]} for r in rows}
    assert hashes[1] & hashes[2]          # shared substring -> shared fp
    assert not (hashes[1] & hashes[3])    # disjoint vocab -> disjoint fps
    assert not (hashes[2] & hashes[3])


def test_kmeans_refine_empty_cluster_keeps_centroid(spark):
    """The deterministic empty-cluster convention, exercised: a seed
    centroid far from every point attracts no members and must pass
    through ALL iterations unchanged, while the populated cluster
    moves to the data mean."""
    from hummingbirddatapipeline_spark.operators.similarity import (
        kmeans_refine,
    )

    pts = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [3.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    seeds = [[0.0, 0.0], [1000.0, 1000.0]]
    assigned, cents = kmeans_refine(pts, seeds, n_iter=2)
    assert cents[1] == [1000.0, 1000.0]          # empty: unchanged
    assert cents[0] == [2.0, 0.0]                # populated: the mean
    rows = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    assert rows == {1: 0, 2: 0}
