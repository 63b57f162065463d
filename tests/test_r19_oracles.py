"""Differential (DuckDB) checks for the operators banked for round-19
catalog registration — held-out Stupid-Backoff trigram surprisal (the
LM-fidelity step above the bigram row, scored on a real train/held
split so every backoff tier fires), rendezvous-hashing shard
assignment (with the minimal-movement resize contract), and
next-event-prediction training examples from the event log. Each
DuckDB side is an independent formulation re-deriving splits, count
tables, argmax placements, and window frames from raw data."""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import functions as F

# BANK_SF_DIR lets the registration dry-run re-check every banked
# differential at the driver gate's scale (sf0.01) without
# duplicating the Spark-side builders
SF = os.environ.get("BANK_SF_DIR", "/root/testdata/sf0.001")


def _duck(*tables):
    con = duckdb.connect()
    for t in tables:
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


def _run_pair(spark, name, *tables):
    """Differential through catalog.resolve_pair — the exact
    registration code; promoting the tier to @query changes nothing."""
    from hummingbirddatapipeline_spark.catalog import resolve_pair

    fn, sql = resolve_pair(name)
    got = [tuple(r) for r in fn(spark, SF).collect()]
    con = _duck(*tables)
    exp = con.sql(sql).fetchall()
    con.close()
    return got, exp


def test_trigram_heldout_matches_duckdb(spark):
    from hummingbirddatapipeline_spark.tables import load

    got, exp = _run_pair(spark, "text_trigram_logprob_heldout", "documents")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    # only held-out docs are scored, and they are a strict minority
    n_docs = load(spark, SF, "documents").count()
    assert 0 < len(got) < n_docs / 2
    for _id, nt, nll in got:
        if nt > 0:
            assert nll is not None and nll > 0.0


def test_trigram_backoff_tiers_fire(spark):
    """The held-out split must actually exercise the backoff: a doc
    made of tokens absent from train scores exactly the OOV floor
    -ln(alpha^2 / T) at every position, while an in-train trigram
    scores its exact count ratio."""
    from hummingbirddatapipeline_spark.operators.retrieval import (
        trigram_logprob_heldout,
    )

    # ids chosen so md5(id:lm0) splits them: find one held id with
    # invented tokens and several train ids carrying a known trigram
    import hashlib

    def held(i):
        return (
            hashlib.md5(f"{i}:lm0".encode()).hexdigest()[:4] < "3333"
        )

    held_id = next(i for i in range(1000) if held(i))
    train_ids = [i for i in range(1000) if not held(i)][:3]
    rows = [(held_id, "zzq1 zzq2 zzq3 zzq4")] + [
        (i, "alpha beta gamma") for i in train_ids
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: tuple(r) for r in trigram_logprob_heldout(df).collect()}
    assert set(out) == {held_id}
    _id, nt, nll = out[held_id]
    assert nt == 2  # two trigram positions in a 4-token doc
    # train corpus: 9 tokens total, all unseen from the held doc ->
    # every position hits the OOV floor -ln(0.16 * 1/9)
    expected = round(-math.log(0.4 * 0.4 * 1.0 / 9.0), 4)
    assert abs(nll - expected) < 1e-9


def test_rendezvous_matches_duckdb_and_minimal_movement(spark):
    from hummingbirddatapipeline_spark.tables import load

    got, exp = _run_pair(spark, "layout_rendezvous_shards", "documents")
    assert len(got) == len(exp) == load(spark, SF, "documents").count()
    assert _norm(got) == _norm(exp)
    # the HRW contract: every moved key lands on the ADDED shard, and
    # the moved fraction is ~1/9 (binomial 3-sigma band)
    moved = [r for r in got if r[3]]
    assert all(r[2] == 8 for r in moved)
    n = len(got)
    frac = len(moved) / n
    sigma = (1 / 9 * 8 / 9 / n) ** 0.5
    assert abs(frac - 1 / 9) < 4 * sigma
    for _id, s, sn, _m in got:
        assert 0 <= s < 8 and 0 <= sn < 9


def test_event_sequences_match_duckdb(spark):
    from hummingbirddatapipeline_spark.tables import load

    ev = load(spark, SF, "events")
    got, exp = _run_pair(spark, "events_sequence_examples", "events")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    # every example carries exactly `history` inputs, and per-user
    # example counts reconcile with the user's event count
    from collections import Counter

    per_user_events = Counter(
        r["user_id"] for r in ev.select("user_id").collect()
    )
    per_user_examples = Counter(r[0] for r in got)
    for u, n_ex in per_user_examples.items():
        assert n_ex == max(0, per_user_events[u] - 4)
    for _u, seq, inp, _tgt in got:
        assert seq >= 1
        assert inp.count("|") == 3  # 4 inputs joined
