"""Entity-resolution & merge toolkit unit tests (SURVEY.md §5.2):
multipass match pass attribution, J5 tie-break, F17 upsert decision
matrix, changelog/idempotency contract, fuzzy join recall.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from hummingbirddatapipeline_spark.operators.entity_resolution import (
    fuzzy_join_levenshtein,
    multipass_name_match,
)
from hummingbirddatapipeline_spark.operators.merge import (
    conditional_upsert,
    dedup_append,
    upsert_changelog,
)


@pytest.fixture(scope="module")
def er_frames(spark):
    target = spark.createDataFrame(
        [
            Row(tid=1, name="Acme College", alias_name=None, state="NY"),
            Row(tid=2, name="Bolt University", alias_name="bolt u", state="CA"),
            Row(tid=3, name="Acme Institute", alias_name=None, state="TX"),
            Row(tid=4, name="Acme Seminary", alias_name=None, state="CA"),
        ]
    )
    source = spark.createDataFrame(
        [
            # pass 1: case/punct noise
            Row(sid=10, name="ACME   COLLEGE!!", state="NY"),
            # pass 2: alias only
            Row(sid=11, name="Bolt U", state="CA"),
            # pass 3: shared 4-char prefix 'acme' -> ambiguous; prefer
            # state CA -> tid=4 (not lowest tid)
            Row(sid=12, name="acme", state="CA"),
            # unresolved
            Row(sid=13, name="zzz nowhere", state="WA"),
        ]
    )
    return source, target


def test_multipass_pass_attribution(er_frames):
    source, target = er_frames
    out = multipass_name_match(
        source,
        target,
        source_name="name",
        target_name="name",
        source_key="sid",
        target_key="tid",
        alias_cols=("alias_name",),
        prefix_len=4,
        source_secondary="state",
        target_secondary="state",
    )
    got = {r["sid"]: (r["matched_tid"], r["match_pass"]) for r in out.collect()}
    assert got[10] == (1, 1)
    assert got[11] == (2, 2)
    # J5: state CA preferred over lower tid 1/3
    assert got[12] == (4, 3)
    assert got[13] == (None, None)


UPSERT_MASTER = [
    # (key, old_val, old_conf)
    (1, None, None),      # empty target -> update
    (2, 10, "LOW"),       # HIGH beats LOW -> update
    (3, 10, "HIGH"),      # LOW does not beat HIGH -> keep
    (4, 10, "MEDIUM"),    # equal rank -> keep (strictly-higher rule)
    (5, 10, "MEDIUM"),    # no update row -> keep
    (6, 10, None),        # NULL conf rank 0, update LOW rank 1 -> update
]
UPSERT_UPDATES = [
    # (key, new_val, new_conf)
    (1, 100, "LOW"),
    (2, 200, "HIGH"),
    (3, 300, "LOW"),
    (4, 400, "MEDIUM"),
    (6, 600, "LOW"),
    (7, 700, "HIGH"),     # key absent from master -> no row, no change
]


def test_conditional_upsert_matrix(spark):
    master = spark.createDataFrame(UPSERT_MASTER, "key int, val int, conf string")
    updates = spark.createDataFrame(UPSERT_UPDATES, "key int, val int, conf string")
    merged = conditional_upsert(master, updates, "key", "val", "conf")
    got = {r["key"]: (r["val"], r["conf"]) for r in merged.collect()}
    assert got[1] == (100, "LOW")
    assert got[2] == (200, "HIGH")
    assert got[3] == (10, "HIGH")
    assert got[4] == (10, "MEDIUM")
    assert got[5] == (10, "MEDIUM")
    assert got[6] == (600, "LOW")
    assert 7 not in got  # upsert never inserts; J7 dedup_append does


def test_upsert_changelog_and_idempotency(spark):
    master = spark.createDataFrame(UPSERT_MASTER, "key int, val int, conf string")
    updates = spark.createDataFrame(UPSERT_UPDATES, "key int, val int, conf string")
    log = upsert_changelog(master, updates, "key", "val", "conf")
    rows = {r["key"]: r for r in log.collect()}
    assert set(rows) == {1, 2, 6}
    assert rows[2]["old_value"] == "10" and rows[2]["new_value"] == "200"
    assert rows[2]["column_name"] == "val"
    # idempotency: re-running against the merged result changes nothing
    merged = conditional_upsert(master, updates, "key", "val", "conf")
    assert upsert_changelog(merged, updates, "key", "val", "conf").count() == 0


def test_dedup_append(spark):
    existing = spark.createDataFrame(
        [("a", "ny", 1)], "name string, state string, v int"
    )
    new = spark.createDataFrame(
        [("a", "ny", 99), ("a", "ca", 2), ("b", None, 3), ("b", None, 4)],
        "name string, state string, v int",
    )
    out = dedup_append(existing, new, ["name", "state"])
    vals = sorted(r["v"] for r in out.collect())
    # ('a','ny') dup dropped; both ('b',NULL) survive vs existing (no
    # NULL-key row there) — NULL-safe equality only guards vs existing
    assert vals == [1, 2, 3, 4]


def test_fuzzy_join_levenshtein_blocked(spark):
    left = spark.createDataFrame(
        [(1, "Acme Colege", "NY"), (2, "Bolt Universty", "CA"), (3, "Xyz", "NY")],
        "lid int, name string, state string",
    )
    right = spark.createDataFrame(
        [(101, "Acme College", "NY"), (102, "Bolt University", "CA"),
         (103, "Acme Collage", "NY")],
        "rid int, name string, state string",
    )
    out = fuzzy_join_levenshtein(
        left, right, "name", "name", "lid", "rid", "state", "state", max_distance=2
    )
    got = {r["lid"]: (r["matched_rid"], r["lev_distance"]) for r in out.collect()}
    assert got[1] == (101, 1)  # dist 1 beats 103's dist 2
    assert got[2] == (102, 1)
    assert 3 not in got


def test_fuzzy_join_lsh_matches_exact_recall(spark, sf_dir_small):
    """LSH-blocked fuzzy join must recover (nearly) all matches the
    exhaustive blocked form finds on the dirty-supplier workload."""
    from hummingbirddatapipeline_spark.catalog import QUERIES

    exact = QUERIES["er_fuzzy_join_levenshtein"](spark, sf_dir_small)
    lsh = QUERIES["er_fuzzy_join_lsh"](spark, sf_dir_small)
    e = {(r["left_id"], r["matched_s_suppkey"]) for r in exact.collect()}
    l = {(r["left_id"], r["matched_s_suppkey"]) for r in lsh.collect()}
    assert len(e) > 0
    recall = len(e & l) / len(e)
    assert recall >= 0.95, f"LSH fuzzy join recall {recall:.3f} < 0.95"


def test_fellegi_sunter_closed_form(spark):
    """4-record target with known value frequencies -> known u -> the
    score is computable by hand: u_color = (2^2+1+1)/16 = 0.375,
    u_city = (3^2+1)/16 = 0.625. A pair agreeing on color and
    disagreeing on city scores round(log2(m1/u_color),6) +
    round(log2((1-m2)/(1-u_city)),6) exactly."""
    import math

    from hummingbirddatapipeline_spark.operators.entity_resolution import (
        fellegi_sunter_scores,
    )

    target = spark.createDataFrame(
        [("red", "nyc"), ("red", "nyc"), ("blue", "nyc"), ("green", "sf")],
        "color string, city string",
    )
    pairs = spark.createDataFrame(
        [(1, 2, "red", "red", "nyc", "sf"),
         (3, 4, "blue", "green", "nyc", "nyc")],
        "id_a long, id_b long, col_a string, col_b string,"
        " city_a string, city_b string",
    )
    out = {
        r["id_a"]: r
        for r in fellegi_sunter_scores(
            pairs, target,
            fields=[("col_a", "col_b", "color", 0.9),
                    ("city_a", "city_b", "city", 0.8)],
        ).collect()
    }
    u_color, u_city = 6 / 16, 10 / 16
    exp1 = round(math.log2(0.9 / u_color), 6) + round(
        math.log2((1 - 0.8) / (1 - u_city)), 6
    )
    exp2 = round(math.log2((1 - 0.9) / (1 - u_color)), 6) + round(
        math.log2(0.8 / u_city), 6
    )
    assert out[1]["agree_color"] and not out[1]["agree_city"]
    assert not out[3]["agree_color"] and out[3]["agree_city"]
    assert abs(out[1]["score"] - round(exp1, 6)) < 1e-9
    assert abs(out[3]["score"] - round(exp2, 6)) < 1e-9


def test_fellegi_sunter_guards_u_one_and_duplicate_fields(spark):
    """ADVICE r13: a single-valued target field gives u == 1, making
    the disagreement weight log2((1-m)/(1-u)) a division by zero that
    previously NULLed the whole score silently — it must now raise a
    NAMED error (at action time, from the lazily-evaluated disagree
    branch). Duplicate target column names in `fields` must raise at
    construction (ambiguous __n2_/__n_ stat columns). And crucially,
    a single-valued field where every pair AGREES stays green: the
    agreement weight log2(m/1) is well-defined and the guard sits
    only on the disagree branch."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from hummingbirddatapipeline_spark.operators.entity_resolution import (
        fellegi_sunter_scores,
    )

    target = spark.createDataFrame(
        [("red", "nyc"), ("red", "sf")], "color string, city string"
    )
    pairs = spark.createDataFrame(
        [(1, 2, "red", "blue")],
        "id_a long, id_b long, col_a string, col_b string",
    )
    # disagreeing pair on the single-valued color field -> named error
    df = fellegi_sunter_scores(
        pairs, target, fields=[("col_a", "col_b", "color", 0.9)]
    )
    with _pytest.raises(Exception, match="single-valued") as exc:
        df.collect()
    assert isinstance(exc.value, Py4JJavaError) or "single-valued" in str(
        exc.value
    )
    # agreeing pair on the same field -> guard never fires, score fine
    agree_pairs = spark.createDataFrame(
        [(1, 2, "red", "red")],
        "id_a long, id_b long, col_a string, col_b string",
    )
    ok = fellegi_sunter_scores(
        agree_pairs, target, fields=[("col_a", "col_b", "color", 0.9)]
    ).collect()
    assert len(ok) == 1 and ok[0]["score"] is not None
    # duplicate target columns -> construction-time ValueError
    with _pytest.raises(ValueError, match="duplicate target columns"):
        fellegi_sunter_scores(
            pairs,
            target,
            fields=[
                ("col_a", "col_b", "city", 0.9),
                ("col_b", "col_a", "city", 0.8),
            ],
        )


def test_fellegi_sunter_guards_empty_target(spark):
    """ADVICE r14: an EMPTY target population gives NULL stat sums, so
    u = NULL/NULL = NULL. Previously a disagreeing pair then fired the
    u==1 assert with the misleading 'single-valued' message, and an
    AGREEING pair silently NULLed the score (log2(m/NULL)). Both paths
    must now raise a named error that diagnoses the empty target."""
    import pytest as _pytest

    from hummingbirddatapipeline_spark.operators.entity_resolution import (
        fellegi_sunter_scores,
    )

    empty = spark.createDataFrame([], "color string")
    disagree = spark.createDataFrame(
        [(1, 2, "red", "blue")],
        "id_a long, id_b long, col_a string, col_b string",
    )
    agree = spark.createDataFrame(
        [(1, 2, "red", "red")],
        "id_a long, id_b long, col_a string, col_b string",
    )
    for pairs in (disagree, agree):
        df = fellegi_sunter_scores(
            pairs, empty, fields=[("col_a", "col_b", "color", 0.9)]
        )
        with _pytest.raises(Exception, match="empty") as exc:
            df.collect()
        assert "empty" in str(exc.value)
