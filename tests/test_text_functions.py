

def test_repetition_stats_flags_boilerplate(spark):
    from hummingbirddatapipeline_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "buy now " * 20),            # one 2-gram dominates
            (2, "a b c d e f g h i j"),      # all 2-grams unique
            (3, ""),                          # empty doc
            (4, "solo"),                      # single token: no 2-grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 3, 4}
    r1 = out[1]
    # "buy now ... buy now": 39 grams, "now buy" x19 and "buy now" x20
    assert r1["n_grams"] == 39 and r1["top_gram_count"] == 20
    assert r1["rep_instance_frac"] == 1.0 and r1["repetitive"]
    r2 = out[2]
    assert r2["n_grams"] == 9 and r2["top_gram_count"] == 1
    assert r2["rep_instance_frac"] == 0.0 and not r2["repetitive"]
    for d in (3, 4):
        r = out[d]
        assert r["n_grams"] == 0 and r["top_gram_count"] == 0
        assert r["rep_instance_frac"] == 0.0 and not r["repetitive"]


def test_curation_repetition_gate(spark):
    """The optional Gopher gate drops boilerplate docs the heuristic
    quality score passes, and surfaces as a funnel stage."""
    from hummingbirddatapipeline_spark.pipelines.curation import curate_corpus

    spam = ("the and of to a in is that for it " * 4) + "buy now " * 60
    good = (
        "the report shows that revenue in the region is stable and "
        "that for most of it the outlook to a degree is positive "
    ) * 3
    docs = spark.createDataFrame(
        [(1, spam, "en", "s", len(spam)), (2, good, "en", "s", len(good))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    clean, stats = curate_corpus(docs, max_top_gram_char_frac=0.20)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    st = {r["stage"]: r["n"] for r in stats.collect()}
    assert "repetition_kept" in st
    assert 1 not in kept and 2 in kept
    assert st["repetition_kept"] < st["quality_kept"]


def test_repetition_battery_hand_computed(spark):
    from hummingbirddatapipeline_spark.functions.text import (
        repetition_battery,
    )

    # "x x x y": chars=7; 2-grams: "x x" x2, "x y" x1 -> top=2*3=6,
    # dup=6; 3-grams distinct -> top=5, dup=0; 4-gram covers the whole
    # doc; no 5..8-grams
    docs = spark.createDataFrame(
        [(1, "x x x y"), (2, "a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in repetition_battery(docs, "text", "doc_id").collect()}
    r = out[1]
    assert r["top_2gram_char_frac"] == 0.857143  # 6/7 q6
    assert r["dup_5gram_char_frac"] == 0.0
    assert r["top_3gram_char_frac"] == 0.714286  # 5/7 q6
    assert r["top_4gram_char_frac"] == 1.0
    # single-token doc: no grams at any size -> all zeros
    assert all(v == 0.0 for k, v in out[2].asDict().items() if k != "doc_id")


def test_repetition_battery_dup_frac_caps_at_one(spark):
    from hummingbirddatapipeline_spark.functions.text import (
        repetition_battery,
    )

    # heavy overlap: occurrence-sum would exceed doc chars; cap at 1.0
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 40))], "doc_id long, text string"
    )
    r = repetition_battery(docs, "text", "doc_id").collect()[0]
    assert r["dup_5gram_char_frac"] == 1.0
    assert r["dup_8gram_char_frac"] == 1.0
