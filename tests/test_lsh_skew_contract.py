"""Skew-regime contract for banded MinHash-LSH (r9 VERDICT item 6):
the 10x scale probe showed replica 10-cliques inflating band-bucket
candidate volume ~100x — exactly the boilerplate-mega-cluster regime
the ``max_bucket`` cap targets. This file promotes the cap from a
probe observation to a tested contract:

1. cap ON -> candidate volume is bounded: a mega-cluster contributes
   ZERO pairwise candidates while bounded-regime pairs keep full
   recall (the cap only removes work that is semantically redundant —
   every mega-cluster pair says "same cluster");
2. what was dropped is LOUD, not silent: ``lsh_dropped_buckets``
   reports every capped (band, bucket) with its size and
   representative (the no-silent-caps rule);
3. the dropped buckets route to the representative-per-cluster
   treatment: ``boilerplate_clusters`` covers every mega-cluster
   member with O(cluster) work, so the two regimes together lose no
   duplicate relationships — pairs for bounded buckets, cluster
   labels for floods;
4. conservation: capped candidates == uncapped candidates minus
   exactly the pairs internal to dropped buckets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_MEGA_TEXT = (
    "all rights reserved terms of service privacy policy cookie "
    "notice subscribe to our newsletter footer boilerplate"
)
_N_MEGA = 60
_CAP = 20
_BANDS = 8
_HASHES = 32


def _corpus(spark):
    rows = []
    # mega-cluster: identical boilerplate text -> identical signatures
    # -> one size-60 bucket per band
    for i in range(_N_MEGA):
        rows.append((1000 + i, _MEGA_TEXT))
    # bounded-regime duplicates: five identical pairs, distinct vocab
    for p in range(5):
        t = f"pair{p} unique article body alpha{p} beta{p} gamma{p} delta{p}"
        rows.append((10 * p + 1, t))
        rows.append((10 * p + 2, t))
    # singletons with disjoint vocab
    for s in range(10):
        rows.append((500 + s, f"lone{s} text{s} with{s} private{s} words{s}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sigs(spark):
    from hummingbirddatapipeline_spark.operators.dedup import (
        minhash_signatures,
    )

    return minhash_signatures(
        _corpus(spark), "text", "doc_id", num_hashes=_HASHES, shingle_size=1
    ).filter(F.col("n_shingles") > 0)


def test_cap_bounds_candidates_and_keeps_bounded_recall(spark):
    from hummingbirddatapipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    sigs = _sigs(spark).localCheckpoint()
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            sigs, "doc_id", bands=_BANDS, num_hashes=_HASHES, max_bucket=_CAP
        ).collect()
    }
    # zero candidates with BOTH ends in the mega-cluster: its buckets
    # exceeded the cap, so its quadratic pair volume never materializes
    assert not any(a >= 1000 and b >= 1000 for a, b in capped)
    # bounded-regime recall intact: every identical pair is a candidate
    expected_pairs = {(10 * p + 1, 10 * p + 2) for p in range(5)}
    assert expected_pairs <= capped
    # and nothing beyond those pairs survives (singletons don't collide)
    assert capped == expected_pairs


def test_dropped_buckets_are_reported_loudly(spark):
    from hummingbirddatapipeline_spark.operators.dedup import (
        lsh_dropped_buckets,
        minhash_lsh_candidates,
    )

    sigs = _sigs(spark).localCheckpoint()
    dropped = lsh_dropped_buckets(
        sigs, "doc_id", bands=_BANDS, num_hashes=_HASHES, max_bucket=_CAP
    ).collect()
    # identical signatures collide in every band: one dropped bucket
    # per band, each holding the whole mega-cluster
    assert len(dropped) == _BANDS
    assert {r["band"] for r in dropped} == set(range(_BANDS))
    assert all(r["sz"] == _N_MEGA for r in dropped)
    # the representative is the natural routing key for the
    # mega-cluster treatment
    assert all(r["rep"] == 1000 for r in dropped)
    # and the audit is a true no-op record when the cap never bites
    assert (
        lsh_dropped_buckets(
            sigs, "doc_id", bands=_BANDS, num_hashes=_HASHES,
            max_bucket=_N_MEGA,
        ).count()
        == 0
    )
    # conservation: capped == uncapped minus pairs internal to dropped
    # buckets (here: all-pairs of the mega-cluster)
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            sigs, "doc_id", bands=_BANDS, num_hashes=_HASHES,
            max_bucket=10**9,
        ).collect()
    }
    mega_pairs = {
        (1000 + i, 1000 + j)
        for i in range(_N_MEGA)
        for j in range(i + 1, _N_MEGA)
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            sigs, "doc_id", bands=_BANDS, num_hashes=_HASHES, max_bucket=_CAP
        ).collect()
    }
    assert uncapped == capped | mega_pairs


def test_dropped_buckets_route_to_cluster_representatives(spark):
    """Together the two regimes lose no duplicate relationship: the
    capped pair path covers bounded buckets; boilerplate_clusters
    covers every member of the flooded bucket with O(cluster) work,
    keyed to the same min-id representative the audit reports."""
    from hummingbirddatapipeline_spark.operators.dedup import (
        boilerplate_clusters,
    )

    docs = _corpus(spark)
    clusters = {
        r["doc_id"]: (r["cluster_id"], r["jaccard"])
        for r in boilerplate_clusters(
            docs, "text", "doc_id", num_hashes=_HASHES, bands=_BANDS,
            min_bucket=_CAP, threshold=0.8, shingle_size=1,
        ).collect()
    }
    # every mega-cluster member is covered, mapped to the min-id
    # representative, at exact Jaccard 1.0 (identical text)
    assert set(clusters) == {1000 + i for i in range(_N_MEGA)}
    assert all(c == 1000 for c, _ in clusters.values())
    assert all(j == 1.0 for _, j in clusters.values())