"""Similarity search over embedding columns (north-star extension).

Two paths:

- ``cosine_topk``: brute-force — broadcast the query set, score every
  (query, item) pair with native expressions, window top-k. Exact;
  O(n·q); the right baseline when q is small, and the verify stage for
  approximate paths.
- ``lsh_topk``: random-hyperplane LSH — items and queries are bucketed
  by sign-bit signatures; only same-bucket pairs are scored. Sub-linear
  candidate generation for 100 TB-scale corpora; probe multiple bands
  to trade recall vs cost. Hyperplanes are generated deterministically
  from a seed and baked into the plan as literals (no UDF, no shuffle
  of the plane matrix).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hummingbirddatapipeline_spark.functions.vector import cosine, dot


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, vec_id, sim, rank); ties broken by item id so
    results are deterministic. Similarity rounded to 6dp before ranking
    for cross-engine stability.
    """
    q = F.broadcast(queries.select(query_id, query_vec))
    pairs = items.select(item_id, item_vec).crossJoin(q)
    if exclude_self:
        pairs = pairs.filter(F.col(item_id) != F.col(query_id))
    scored = pairs.select(
        query_id,
        item_id,
        F.round(cosine(F.col(item_vec), F.col(query_vec)), 6).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(item_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_signature(vec_col, planes: list[list[float]]):
    """Sign-bit signature (as a long) for a vector against hyperplanes."""
    bits = []
    for i, plane in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(
            dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, lit) >= 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        bits.append(bit)
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    items: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    bands: int = 3,
    seed: int = 42,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: random-hyperplane signatures split into
    ``bands``; pairs sharing any band bucket are scored exactly.

    Recall improves with more bands (more probes); cost scales with
    bucket collision rate instead of corpus size.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    per_band = max(1, n_planes // bands)
    masks = [
        ((1 << per_band) - 1) << (b * per_band) for b in range(bands)
    ]

    def banded(df: DataFrame, idc: str, vecc: str, prefix: str) -> DataFrame:
        sig = lsh_signature(vecc, planes)
        d = df.withColumn("__sig", sig)
        bandcols = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.col("__sig").bitwiseAND(F.lit(m).cast("long")).alias("bucket"),
                )
                for b, m in enumerate(masks)
            ]
        )
        return (
            d.select(idc, vecc, F.explode(bandcols).alias("bb"))
            .select(idc, vecc, F.col("bb.band"), F.col("bb.bucket"))
        )

    bi = banded(items, item_id, item_vec, "i")
    bq = banded(queries, query_id, query_vec, "q")
    cands = (
        bi.join(bq, ["band", "bucket"])
        .filter(F.col(item_id) != F.col(query_id))
        .select(item_id, item_vec, query_id, query_vec)
        .distinct()
    )
    scored = cands.select(
        query_id,
        item_id,
        F.round(cosine(F.col(item_vec), F.col(query_vec)), 6).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(item_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    items: DataFrame,
    threshold: float = 0.95,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= t).

    Brute force at test scale; at 100 TB the candidate stage swaps to
    ``lsh_topk``-style bucketing with the same verify expression.
    """
    a = items.select(F.col(item_id).alias("id_a"), F.col(item_vec).alias("va"))
    b = items.select(F.col(item_id).alias("id_b"), F.col(item_vec).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def ivf_index(
    items: DataFrame,
    n_centroids: int = 16,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    seed: int = 7,
    max_iter: int = 10,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: KMeans over the corpus -> every item
    tagged with its nearest-centroid id.

    Returns (items + ``centroid_id``, centroid list). The index build
    is a standard distributed KMeans (pyspark.ml); at 100 TB the
    quantizer trains on a sample and assignment is one map-side pass —
    centroids ride along as plan literals, never shuffled.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = items.select(
        item_id, array_to_vector(_to_double(item_vec)).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feats)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    assigned = model.transform(feats).select(
        item_id, F.col("prediction").alias("centroid_id")
    )
    return items.join(assigned, item_id), centroids


def _to_double(vec_col: str):
    return F.transform(vec_col, lambda x: x.cast("double"))


def _nearest_centroids(vec, centroids: list[list[float]], n_probe: int):
    """Literal-expression argsort: ids of the ``n_probe`` closest
    centroids by cosine, computed per row without any join."""
    sims = F.array(
        *[
            F.struct(
                cosine(vec, F.array(*[F.lit(x) for x in c])).alias("sim"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(sims)), 1, n_probe)
    return F.transform(top, lambda s: s["cid"])


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate top-k: score each query only against items in
    its ``n_probe`` nearest centroid cells.

    The inverted-file pattern: corpus scan cost drops from O(n·q) to
    O(n·q·n_probe/n_centroids); recall is tunable via n_probe. The
    probe set is computed as literal expressions (no centroid join),
    and the candidate join is an equi-join on centroid_id.
    """
    indexed, centroids = ivf_index(items, n_centroids, item_id, item_vec)
    probes = queries.select(
        F.col(query_id),
        F.col(query_vec),
        F.explode(
            _nearest_centroids(_to_double(query_vec), centroids, n_probe)
        ).alias("centroid_id"),
    )
    cand = probes.join(indexed, "centroid_id")
    if exclude_self:
        cand = cand.filter(F.col(item_id) != F.col(query_id))
    scored = cand.select(
        query_id,
        item_id,
        F.round(
            cosine(_to_double(item_vec), _to_double(query_vec)), 6
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(item_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id, "rank")
    )
