

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
