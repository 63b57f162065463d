"""Multimodal catalog queries: the mapInPandas binary-column path,
DuckDB-verified where SQL can express the check (byte size + sha256 —
DuckDB hashes the same utf-8 bytes), rows-only for the frame-sampling
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import (
    query,
    register_invalidate_hook,
)
from hummingbirddatapipeline_spark.multimodal.core import (
    byte_features,
    release_phash_switch_cache,
    sample_frames,
    synth_media_from_documents,
)
from hummingbirddatapipeline_spark.tables import load

# The phash auto-switch persists one skinny distinct-hash frame per
# session (multimodal/core._PHASH_SWITCH_CACHE); drop it whenever the
# catalog's prepared plans are invalidated so regenerated data cannot
# serve a stale cached distinct set. sf_dir-agnostic: the cache holds
# at most one frame per session, and unpersist is always safe.
register_invalidate_hook(lambda sf_dir: release_phash_switch_cache())


@query(
    "multimodal_byte_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
           strlen(text) AS byte_size,
           sha256(text) AS content_sha256
    FROM documents
    ORDER BY media_id
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary blobs -> Arrow-batched mapInPandas features; sha256 and
    byte size checked bit-for-bit against DuckDB hashing the same
    utf-8 bytes."""
    docs = load(spark, sf_dir, "documents")
    media = synth_media_from_documents(docs)
    feats = byte_features(media)
    return (
        feats.join(media.select("media_id", F.col("media_meta.kind").alias("kind")), "media_id")
        .select("media_id", "kind", "byte_size", "content_sha256")
    )


@query(
    "multimodal_frame_plan",
    oracle="""
    WITH video AS (
      SELECT doc_id AS media_id, strlen(text) * 10 AS duration_ms
      FROM documents WHERE doc_id % 3 = 2
    ),
    frames AS (
      SELECT media_id,
             UNNEST(range(GREATEST(CAST(duration_ms // 1000 AS INT), 1)))
               AS frame_index
      FROM video
    )
    SELECT media_id, CAST(frame_index AS INT) AS frame_index,
           frame_index * 1000 AS frame_offset_ms
    FROM frames ORDER BY media_id, frame_index
    """,
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic video frame-sampling plan (one frame per second of
    synthetic duration) — pure column ops, oracle-checked."""
    docs = load(spark, sf_dir, "documents")
    media = synth_media_from_documents(docs)
    return sample_frames(media, every_ms=1000)


# Twin offsets for the phash contract fixture; far above any doc_id.
# CONTRACT (r11 ADVICE): range-routing below assumes max(doc_id) <
# _PHASH_TWIN_OFFSET at every supported SF — asserted in
# tests/test_catalog_smoke.py::test_twin_offsets_clear_all_doc_ids
_PHASH_TWIN_OFFSET = 10_000_000
_PHASH_FAR_OFFSET = 30_000_000


@query(
    "multimodal_phash_groups",
    oracle="""
    SELECT doc_id AS media_id, TRUE AS twin_same_cluster,
           TRUE AS far_diff_cluster
    FROM documents
    ORDER BY media_id
    """,
)
def multimodal_phash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup dedup for the multimodal layer — dHash over
    blob bytes, banded-Hamming candidate join over DISTINCT hash
    values, connected-components clusters
    (multimodal/core.phash_groups) — under a PROVABLE twin contract
    (the quantize-twin idiom from similarity_near_dup_clusters_banded):

    every doc gets a deterministic twin whose byte changes are
    confined to ONE of the 72 thumbnail cells (case-flip of exactly
    that cell's character span; non-ASCII or empty spans pass through
    unchanged). One perturbed cell moves at most the 2 adjacent
    gradient bits, 2 < 8 bands, so by pigeonhole the banded join MUST
    surface the (original, twin) candidate, the Hamming verify (<= 6)
    must keep it, and CC must put both in one cluster — recall here is
    a theorem of the implementation, not a probability, which is what
    makes an every-round driver contract sound.

    The contract is TWO-SIDED: every doc also gets a FAR twin — a
    720-byte constant blob, long enough that every one of the 72
    thumbnail cells is non-empty and equal, so its dHash is EXACTLY 0
    (zero rising gradients). That is out of the text distribution by
    construction: every text/cell-flip hash at every SF carries >= 21
    gradient bits (min measured 23, and a one-cell flip moves <= 2),
    so no chain can connect hash 0 to any text cluster under the
    Hamming-6 verify. In-distribution far constructions fail this —
    byte-reversal drifts into the mega-cluster's transitive span at
    sf0.1, and a same-length constant blob inherits a short doc's
    empty-thumbnail-cell gradient pattern (measured: a 44-byte doc's
    hash lands within Hamming 6 of its constant twin). The row asserts
    the far twin lands in a DIFFERENT cluster, so a degenerate
    implementation that collapsed everything into one cluster (which
    would still pass the recall side) goes driver-red.
    Output: one row per original with twin_same_cluster AND
    far_diff_cluster, which DuckDB asserts are uniformly TRUE over the
    exact doc roster. Perceptual behavior on free-form perturbations
    is additionally pinned in tests/test_multimodal.py."""
    from hummingbirddatapipeline_spark.multimodal.core import phash_groups

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    media = synth_media_from_documents(docs).select("media_id", "content")

    n = F.octet_length("text")
    ascii_safe = n == F.length("text")  # byte offset == char offset
    start = F.floor(n * 40 / 72).cast("int")
    width = (F.floor(n * 41 / 72) - F.floor(n * 40 / 72)).cast("int")
    cell_flip = F.concat(
        F.expr("substring(text, 1, __start)"),
        F.upper(F.expr("substring(text, __start + 1, __width)")),
        F.expr("substring(text, __start + 1 + __width, octet_length(text))"),
    )
    twins = (
        docs.withColumn("__start", start)
        .withColumn("__width", width)
        .select(
            (F.col("doc_id") + _PHASH_TWIN_OFFSET).alias("media_id"),
            F.encode(
                F.when(ascii_safe & (F.col("__width") > 0), cell_flip)
                .otherwise(F.col("text")),
                "utf-8",
            ).alias("content"),
        )
    )
    fars = docs.select(
        (F.col("doc_id") + _PHASH_FAR_OFFSET).alias("media_id"),
        F.encode(F.repeat(F.lit("z"), 720), "utf-8").alias("content"),
    )
    # the cluster map is skinny (media_id, cluster) but its lineage
    # holds the two corpus text scans (media + twins); the three
    # roster filters below would re-inline it 3x without this
    pg = (
        phash_groups(
            media.unionByName(twins).unionByName(fars),
            max_distance=6,
            bands=8,
        )
        .select("media_id", "phash_cluster")
        .localCheckpoint(eager=False)
    )
    orig = pg.filter(F.col("media_id") < _PHASH_TWIN_OFFSET).select(
        "media_id", F.col("phash_cluster").alias("__c_orig")
    )
    twin = pg.filter(
        (F.col("media_id") >= _PHASH_TWIN_OFFSET)
        & (F.col("media_id") < _PHASH_FAR_OFFSET)
    ).select(
        (F.col("media_id") - _PHASH_TWIN_OFFSET).alias("media_id"),
        F.col("phash_cluster").alias("__c_twin"),
    )
    far = pg.filter(F.col("media_id") >= _PHASH_FAR_OFFSET).select(
        (F.col("media_id") - _PHASH_FAR_OFFSET).alias("media_id"),
        F.col("phash_cluster").alias("__c_far"),
    )
    return (
        orig.join(twin, "media_id")
        .join(far, "media_id")
        .select(
            "media_id",
            (F.col("__c_orig") == F.col("__c_twin")).alias(
                "twin_same_cluster"
            ),
            (F.col("__c_orig") != F.col("__c_far")).alias("far_diff_cluster"),
        )
    )


def _patch_plan_sql(patch: int = 16) -> str:
    """Independent DuckDB formulation of the ViT patch-grid manifest
    (multimodal/core.patch_plan over synth_media_from_documents):
    re-derives the synthetic image metadata (strlen = utf-8 bytes,
    mirroring octet_length — the frame-plan oracle's convention) and
    every ceil-division; integer // both engines floor."""
    return f"""
    SELECT doc_id AS media_id,
           CAST(strlen(text) % 640 + 16 AS BIGINT) AS width,
           CAST(strlen(text) % 480 + 16 AS BIGINT) AS height,
           CAST((strlen(text) % 640 + 16 + {patch - 1}) // {patch}
                AS BIGINT) AS n_patch_x,
           CAST((strlen(text) % 480 + 16 + {patch - 1}) // {patch}
                AS BIGINT) AS n_patch_y,
           CAST(((strlen(text) % 640 + 16 + {patch - 1}) // {patch})
                * ((strlen(text) % 480 + 16 + {patch - 1}) // {patch})
                AS BIGINT) AS n_patches,
           CAST(((strlen(text) % 640 + 16 + {patch - 1}) // {patch})
                * {patch} - (strlen(text) % 640 + 16) AS BIGINT) AS pad_x,
           CAST(((strlen(text) % 480 + 16 + {patch - 1}) // {patch})
                * {patch} - (strlen(text) % 480 + 16) AS BIGINT) AS pad_y
    FROM documents WHERE doc_id % 3 = 0
    """


@query("multimodal_patch_plan", oracle=_patch_plan_sql(16))
def multimodal_patch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch-grid manifest (multimodal/core.patch_plan, patch=16)
    over typed image metadata under the full oracle gate: per image
    the ceil-division grid, total patch count (the image's sequence
    length for a vision transformer), and implied right/bottom
    padding. Pure integer arithmetic over width/height from the synth
    media fixture — content bytes never move, and actual decode stays
    behind the optional-dependency gate (the frame-plan split). The
    224x224@16 -> 196-patches-zero-pad closed form is pinned in
    tests/test_r25_oracles.py.

    Scale shape: ZERO-exchange map pass (contract-pinned: no Exchange
    at all) — planning patches for a 100 TB image corpus is the
    metadata scan itself."""
    from hummingbirddatapipeline_spark.multimodal.core import (
        patch_plan,
        synth_media_from_documents,
    )

    media = synth_media_from_documents(load(spark, sf_dir, "documents"))
    return patch_plan(media, patch=16)
