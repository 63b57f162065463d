"""Structural property tests for the round-9 registered operators and
the round-10 bank — invariants the DuckDB value-hash differential does
not state explicitly (idempotence, bounds, density, representative
uniqueness), pinned so a future refactor that preserves the hash but
breaks the contract still fails CI."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_canonicalize_url_idempotent(spark, sf_dir):
    """Canonicalization is a normal form: applying it to its own
    output must be the identity on the whole fixture."""
    from hummingbirddatapipeline_spark.functions.web import (
        canonicalize_url,
        synth_dirty_urls,
    )
    from hummingbirddatapipeline_spark.tables import load

    urls = synth_dirty_urls(load(spark, sf_dir, "documents"))
    once = urls.select(
        "doc_id", canonicalize_url(F.col("url")).alias("c1")
    )
    twice = once.select(
        "doc_id", "c1", canonicalize_url(F.col("c1")).alias("c2")
    )
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0


def test_host_gate_bounds(spark, sf_dir):
    from hummingbirddatapipeline_spark.catalog import QUERIES

    rows = QUERIES["web_host_gate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_canonical"] <= r["n_docs"]
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_best_fit_bins_dense_per_group(spark, sf_dir):
    """Bin ids are 0-based and DENSE within each pack group — a gap
    would mean a phantom empty bin in the trainer's shard list."""
    from hummingbirddatapipeline_spark.catalog import QUERIES

    per_group = (
        QUERIES["text_pack_best_fit"](spark, sf_dir)
        .groupBy("source")
        .agg(
            F.min("bin_id").alias("lo"),
            F.max("bin_id").alias("hi"),
            F.countDistinct("bin_id").alias("n"),
        )
        .collect()
    )
    assert per_group
    for r in per_group:
        assert r["lo"] == 0
        assert r["n"] == r["hi"] + 1


def test_dsir_ranks_are_exactly_1_to_k(spark, sf_dir):
    from hummingbirddatapipeline_spark.catalog import QUERIES
    from hummingbirddatapipeline_spark.tables import load

    rows = QUERIES["sample_dsir_select"](spark, sf_dir).collect()
    assert sorted(r["sample_rank"] for r in rows) == list(
        range(1, len(rows) + 1)
    )
    pool = {
        r["doc_id"]
        for r in load(spark, sf_dir, "documents").select("doc_id").collect()
    }
    assert {r["doc_id"] for r in rows} <= pool


def test_semantic_dedup_one_representative_per_cluster(spark, sf_dir):
    """Every semantic cluster keeps EXACTLY one member, and it is the
    minimum id — the dedup guarantee itself."""
    from hummingbirddatapipeline_spark.catalog import QUERIES

    rows = QUERIES["similarity_semantic_dedup"](spark, sf_dir).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["sem_cluster"], []).append(r)
    assert by_cluster
    for cid, members in by_cluster.items():
        kept = [m for m in members if m["kept"]]
        assert len(kept) == 1
        assert kept[0]["vec_id"] == min(m["vec_id"] for m in members) == cid


def test_incremental_cc_covers_node_universe(spark, sf_dir):
    """The maintained labeling must cover every previously-labeled
    node AND every endpoint of the new edge batch."""
    from hummingbirddatapipeline_spark.catalog import QUERIES
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
    )
    from hummingbirddatapipeline_spark.tables import load

    got = {
        r["node"]
        for r in QUERIES["dedup_incremental_cc"](spark, sf_dir).collect()
    }
    old = {
        r["node"]
        for r in connected_components(
            shared_jaccard_pairs(spark, sf_dir)
        ).collect()
    }
    docs = load(spark, sf_dir, "documents")
    new_nodes = set()
    for r in docs.filter(F.col("doc_id") % 97 == 0).collect():
        new_nodes |= {r["doc_id"], r["doc_id"] + 3}
    for r in docs.filter(F.col("doc_id") % 151 == 0).collect():
        new_nodes |= {r["doc_id"], r["doc_id"] + 90_000_000}
    assert old <= got
    assert new_nodes <= got


def test_kmeans_assignment_in_range(spark, sf_dir):
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.operators.similarity import (
        kmeans_refine,
    )
    from hummingbirddatapipeline_spark.tables import load

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    assigned, cents = kmeans_refine(emb, IVF_CENTROIDS_64D, n_iter=2)
    k = len(IVF_CENTROIDS_64D)
    assert len(cents) == k and all(
        len(c) == len(IVF_CENTROIDS_64D[0]) for c in cents
    )
    bad = assigned.filter(
        (F.col("cluster_id") < 0)
        | (F.col("cluster_id") >= k)
        | (F.col("dist") < 0)
    ).count()
    assert bad == 0


def test_shard_manifest_partitions_the_corpus(spark, sf_dir):
    """Shards partition the corpus exactly: doc counts sum to the
    corpus size, every shard id is in [0, n_shards), and token totals
    sum to the corpus total."""
    from hummingbirddatapipeline_spark.functions.text import ws_token_count
    from hummingbirddatapipeline_spark.operators.scale import shard_manifest
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        ws_token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    n_docs, n_tokens = docs.agg(
        F.count("*"), F.sum("n_tokens")
    ).first()
    rows = shard_manifest(
        docs, "doc_id", token_col="n_tokens", n_shards=16, seed="r10"
    ).collect()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["n_tokens"] for r in rows) == n_tokens
    assert all(0 <= r["shard_id"] < 16 for r in rows)


def test_decontaminate_keeps_only_clean_clusters(spark, sf_dir):
    """kept <=> NOT cluster_contaminated, and a cluster's flag is
    uniform across its members."""
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.operators.contamination import (
        decontaminate_clusters,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 20)
    rows = decontaminate_clusters(
        docs, bench, shared_jaccard_pairs(spark, sf_dir), n=5
    ).collect()
    flags: dict[int, bool] = {}
    for r in rows:
        assert r["kept"] == (not r["cluster_contaminated"])
        prev = flags.setdefault(r["cluster_id"], r["cluster_contaminated"])
        assert prev == r["cluster_contaminated"]


def test_canonicalize_url_matches_urllib_reference(spark):
    """Independent-parser differential: canonicalize_url's regexp
    parse must agree with a reference built on the stdlib's
    urllib.parse across a full grid of scheme/host/port/path/query/
    fragment variations (~4k URLs, one Spark job). Userinfo and
    non-ASCII are outside the canonicalizer's documented fixture
    scope and are not generated."""
    import re as _re
    from itertools import product
    from urllib.parse import urlsplit

    from hummingbirddatapipeline_spark.functions.web import canonicalize_url

    def ref(url: str) -> str:
        s = urlsplit(url)
        scheme = s.scheme.lower()
        host = (s.hostname or "")
        if host.startswith("www."):
            host = host[4:]
        default = {"https": 443, "http": 80}.get(scheme)
        port = "" if s.port is None or s.port == default else f":{s.port}"
        path = _re.sub("/+$", "", s.path)
        params = sorted(
            p
            for p in s.query.split("&")
            if p and not _re.match(r"^(utm_[^=]*|fbclid|gclid)(=|$)", p)
        )
        q = "?" + "&".join(params) if params else ""
        return f"{scheme}://{host}{port}{path}{q}"

    urls = [
        f"{sc}://{h}{pt}{pa}{qu}{fr}"
        for sc, h, pt, pa, qu, fr in product(
            ["http", "https", "HTTPS"],
            ["a.example.com", "WWW.B.Example.COM", "www.c.example.com",
             "D.EXAMPLE.COM"],
            ["", ":80", ":443", ":8080"],
            ["", "/", "/x", "/x/", "/x/y//", "/docs/1"],
            ["", "?b=2&a=1", "?utm_source=x&a=1", "?fbclid&a=1", "?utm_x",
             "?a=1&a=0", "?gclid=9"],
            ["", "#sec"],
        )
    ]
    from pyspark.sql import functions as F

    got = {
        r["url"]: r["c"]
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select("url", canonicalize_url(F.col("url")).alias("c"))
        .collect()
    }
    bad = [(u, got[u], ref(u)) for u in urls if got[u] != ref(u)]
    assert not bad, bad[:5]


def test_dsir_target_pred_equals_dataframe_target(spark, sf_dir):
    """The r15 one-pass regime (target as a predicate over the raw
    pool) must select the IDENTICAL sample, weights and keys as the
    original two-frame form — the optimization is an execution-plan
    change, not a semantic one."""
    from hummingbirddatapipeline_spark.operators.sampling import dsir_select
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    via_frame = dsir_select(
        docs, docs.filter(F.col("lang") == "en"), k=20, seed="eqchk"
    ).collect()
    via_pred = dsir_select(
        docs, None, k=20, seed="eqchk", target_pred=F.col("lang") == "en"
    ).collect()
    key = lambda r: r["sample_rank"]  # noqa: E731
    assert sorted(via_frame, key=key) == sorted(via_pred, key=key)


def test_dsir_empty_target_pred_raises(spark, sf_dir):
    """The empty-target guard fires in the predicate regime too."""
    import pytest

    from hummingbirddatapipeline_spark.operators.sampling import dsir_select
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    with pytest.raises(ValueError, match="target corpus has no grams"):
        dsir_select(docs, None, k=5, target_pred=F.lit(False))
