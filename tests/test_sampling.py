"""Sampling / privacy / contamination operators (curation extensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.functions.privacy import pii_flags, redact_pii
from hummingbirddatapipeline_spark.operators.contamination import (
    ngram_contamination,
    word_ngrams,
)
from hummingbirddatapipeline_spark.operators.sampling import (
    hash_sample,
    sample_per_group,
    split_train_holdout,
    stratified_sample,
)
from hummingbirddatapipeline_spark.tables import load


def test_hash_sample_stable_under_repartition(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(17), "doc_id", 0.2)
        .select("doc_id")
        .collect()
    }
    assert a == b and a  # same membership at any partitioning
    n = docs.count()
    assert 0.1 * n <= len(a) <= 0.3 * n  # roughly the asked fraction


def test_hash_sample_seed_changes_membership(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2, seed="x").collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2, seed="y").collect()}
    assert a != b


def test_hash_sample_fraction_edges(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    assert hash_sample(docs, "doc_id", 1.0).count() == n
    assert hash_sample(docs, "doc_id", 0.0).count() == 0


def test_stratified_fractions_differ_by_stratum(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5}, default_fraction=0.05
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_en = docs.filter(F.col("lang") == "en").count()
    n_de = docs.filter(F.col("lang") == "de").count()
    assert got.get("en", 0) > 0.3 * n_en
    assert got.get("de", 0) <= 0.25 * n_de


def test_sample_per_group_cap_and_determinism(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = sample_per_group(docs, "source", "doc_id", n=2)
    counts = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 2 for r in counts)
    again = sample_per_group(docs.repartition(7), "source", "doc_id", n=2)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_split_train_holdout_partitions_everything(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    tagged = split_train_holdout(docs, "doc_id", 0.25)
    counts = {r["split"]: r["n"] for r in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts.get("holdout", 0) + counts.get("train", 0) == docs.count()
    assert counts.get("holdout", 0) > 0


def test_redact_pii_cases(spark):
    rows = [
        ("a", "mail me at jo.doe+x@corp.example.org now"),
        ("b", "ssn 123-45-6789 and phone (415) 555-0199"),
        ("c", "server at 192.168.10.254 responded"),
        ("d", "clean text with no identifiers"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    out = {r["id"]: r for r in df.select(
        "id",
        redact_pii(F.col("text")).alias("red"),
        pii_flags(F.col("text")).alias("f"),
    ).collect()}
    assert out["a"]["red"] == "mail me at <EMAIL> now"
    assert out["a"]["f"]["has_email"] and not out["a"]["f"]["has_ssn"]
    assert out["b"]["red"] == "ssn <SSN> and phone <PHONE>"
    assert out["c"]["red"] == "server at <IP> responded"
    assert out["d"]["red"] == rows[3][1]
    assert not any(out["d"]["f"][k] for k in ("has_email", "has_ssn", "has_phone", "has_ip"))


def test_contamination_hits_only_real_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (10, "xx the quick brown fox jumps zz"),  # shares a 5-gram
            (11, "completely different words here entirely now"),
            (12, "tiny"),  # shorter than n: zero grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_contamination(docs, bench, n=5).collect()}
    assert out[10]["contaminated"] and out[10]["n_hit_grams"] >= 1
    assert not out[11]["contaminated"] and out[11]["n_hit_grams"] == 0
    assert out[12]["n_grams"] == 0 and not out[12]["contaminated"]


def test_word_ngrams_counts(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = df.select(word_ngrams(F.col("text"), 2).alias("g")).first()["g"]
    assert sorted(got) == ["a b", "b c", "c d"]


def test_token_budget_monotone_and_bounded(spark, sf_dir):
    """A bigger budget strictly extends the admitted set (hash order is
    a fixed priority), and each stratum stays within budget."""
    from hummingbirddatapipeline_spark.operators.sampling import (
        sample_token_budget,
    )

    docs = load(spark, sf_dir, "documents")
    small = sample_token_budget(
        docs, "doc_id", "lang", "text", {}, default_budget=400, seed="t"
    )
    big = sample_token_budget(
        docs, "doc_id", "lang", "text", {}, default_budget=1200, seed="t"
    )
    s = {r.doc_id for r in small.select("doc_id").collect()}
    b = {r.doc_id for r in big.select("doc_id").collect()}
    assert s and s <= b and len(b) > len(s)
    per_lang = (
        small.groupBy("lang").agg(F.max("cum_tokens").alias("m")).collect()
    )
    assert all(r["m"] <= 400 for r in per_lang)


def test_temperature_mix_flattens_skew(spark, sf_dir):
    """alpha<1 upweights low-resource strata: every stratum's quota
    share must sit between uniform (1/K) and its natural token share
    on the side that flattens, no stratum exceeds its quota, and the
    quota allocation spends at most the total budget."""
    from hummingbirddatapipeline_spark.operators.sampling import (
        sample_temperature_mix,
    )

    docs = load(spark, sf_dir, "documents")
    out = sample_temperature_mix(
        docs, "doc_id", "lang", "text", total_budget=5000, alpha=0.3
    )
    rows = (
        out.groupBy("lang", "quota")
        .agg(F.max("cum_tokens").alias("spent"))
        .collect()
    )
    assert rows and all(r["spent"] <= r["quota"] for r in rows)
    assert sum(r["quota"] for r in rows) <= 5000
    natural = {
        r["lang"]: r["nt"]
        for r in docs.select(
            "lang", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        )
        .groupBy("lang")
        .agg(F.sum("n").alias("nt"))
        .collect()
    }
    tot_nat = sum(natural.values())
    tot_q = sum(r["quota"] for r in rows)
    for r in rows:
        nat_share = natural[r["lang"]] / tot_nat
        q_share = r["quota"] / tot_q
        if nat_share > 1 / len(rows):  # high-resource: downweighted
            assert q_share < nat_share
        else:  # low-resource: upweighted
            assert q_share > nat_share


def test_split_ngram_overlap_counts(spark):
    from hummingbirddatapipeline_spark.operators.sampling import (
        split_ngram_overlap,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i"),   # train: grams a..h, b..i
            (2, "a b c d e f g h"),     # val: gram a..h (leaks)
            (3, "p q r s t u v w"),     # val: gram p..w (clean)
        ],
        "doc_id long, text string",
    )
    split = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "val")], "doc_id long, split string"
    )
    row = split_ngram_overlap(docs, split, n=8).collect()[0]
    assert row["n_train_docs"] == 1 and row["n_val_docs"] == 2
    assert row["n_val_grams"] == 2
    assert row["n_overlap_grams"] == 1
    assert row["overlap_frac"] == 0.5


def test_split_ngram_overlap_disjoint_is_zero(spark):
    from hummingbirddatapipeline_spark.operators.sampling import (
        split_ngram_overlap,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "q r s t u v w x")],
        "doc_id long, text string",
    )
    split = spark.createDataFrame(
        [(1, "train"), (2, "val")], "doc_id long, split string"
    )
    row = split_ngram_overlap(docs, split, n=8).collect()[0]
    assert row["n_overlap_grams"] == 0 and row["overlap_frac"] == 0.0


def test_split_ngram_overlap_multi_equals_per_splitter(spark):
    """The r11 single-explode multi-splitter audit must reproduce the
    per-splitter results field for field (the catalog row's rewrite is
    a plan change only), and its plan must hold exactly ONE generate
    over the corpus grams."""
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.operators.sampling import (
        split_ngram_overlap,
        split_ngram_overlap_multi,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i"),
            (2, "a b c d e f g h"),
            (3, "p q r s t u v w"),
            (4, "a b c d e f g h i j k"),
        ],
        "doc_id long, text string",
    )
    s1 = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "val"), (4, "train")],
        "doc_id long, split string",
    )
    s2 = spark.createDataFrame(
        [(1, "val"), (2, "train"), (3, "train"), (4, "val")],
        "doc_id long, split string",
    )
    multi = {
        r["split_method"]: r
        for r in split_ngram_overlap_multi(
            docs, [("m1", s1), ("m2", s2)], n=8
        ).collect()
    }
    for name, s in (("m1", s1), ("m2", s2)):
        single = split_ngram_overlap(docs, s, n=8).collect()[0]
        got = multi[name]
        for c in (
            "n_train_docs",
            "n_val_docs",
            "n_val_grams",
            "n_overlap_grams",
            "overlap_frac",
        ):
            assert got[c] == single[c], (name, c)

    # one gram explode total (the point of the rewrite)
    plan = (
        split_ngram_overlap_multi(docs, [("m1", s1), ("m2", s2)], n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Generate explode") == 2  # gram explode + report rows
    import pytest

    with pytest.raises(ValueError, match="at least one"):
        split_ngram_overlap_multi(docs, [])
    with pytest.raises(ValueError, match="duplicate"):
        split_ngram_overlap_multi(docs, [("m", s1), ("m", s2)])


def test_weighted_sample_matches_python_replica(spark):
    """The A-ES arithmetic is content-hash deterministic, so a Python
    replica (hashlib md5, same 52-bit uniform, same rank key) must
    select the identical rows."""
    import hashlib
    import math

    from hummingbirddatapipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, wgt double")
    got = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in weighted_sample_topk(df, "doc_id", "wgt", k=10, seed="t").collect()
    )

    def rank_key(i, wgt):
        h = hashlib.md5(f"{i}:t".encode()).hexdigest()[:13]
        u = (int(h, 16) + 0.5) / float(1 << 52)
        return -math.log(u) / wgt

    exp_order = sorted(rows, key=lambda r: (rank_key(*r), r[0]))[:10]
    exp = sorted((i, rk + 1) for rk, (i, _) in enumerate(exp_order))
    # compare membership and rank order (ranks re-derived identically)
    assert [i for i, _ in got] == [i for i, _ in exp]


def test_weighted_sample_respects_weights_statistically(spark):
    from hummingbirddatapipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    # half the keys carry 50x the weight; they should dominate the top-k
    rows = [(i, 50.0 if i % 2 == 0 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, wgt double")
    out = weighted_sample_topk(df, "doc_id", "wgt", k=50, seed="s").collect()
    heavy = sum(1 for r in out if r["doc_id"] % 2 == 0)
    assert heavy >= 45  # overwhelmingly heavy-weighted members


def test_weighted_sample_excludes_nonpositive(spark):
    from hummingbirddatapipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, None), (4, -1.0)], "doc_id long, wgt double"
    )
    out = weighted_sample_topk(df, "doc_id", "wgt", k=10).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_decayed_activity_hand_computed(spark):
    from hummingbirddatapipeline_spark.operators.incremental import (
        decayed_activity,
    )

    # half_life 10: event at ref contributes 1.0, 10 ago 0.5, 20 ago 0.25
    rows = [(1, 100), (1, 90), (1, 80), (2, 100)]
    df = spark.createDataFrame(rows, "uid long, ts long")
    out = {r["uid"]: r for r in decayed_activity(df, "uid", "ts", 10.0).collect()}
    assert out[1]["decayed_score"] == 1.75 and out[1]["n_events"] == 3
    assert out[1]["last_ts"] == 100
    assert out[2]["decayed_score"] == 1.0


def test_decayed_activity_explicit_ref_and_values(spark):
    from hummingbirddatapipeline_spark.operators.incremental import (
        decayed_activity,
    )

    rows = [(1, 90, 4.0), (1, 100, 2.0)]
    df = spark.createDataFrame(rows, "uid long, ts long, v double")
    r = decayed_activity(
        df, "uid", "ts", 10.0, ref_ts=110, value_col="v"
    ).collect()[0]
    # 4.0 * 0.5^2 + 2.0 * 0.5^1 = 1.0 + 1.0
    assert r["decayed_score"] == 2.0
