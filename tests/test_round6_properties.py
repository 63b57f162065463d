"""Randomized invariant tests for the round-6 operators: SCD2 interval
algebra over a random event batch, the repetition battery against a
brute-force Python recompute, and skew-report arithmetic. One seeded
batch through Spark per test (no per-example JVM round trips)."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F


def _random_events(rng, n_users=25, max_events=30):
    rows = []
    eid = 0
    for u in range(1, n_users + 1):
        for _ in range(rng.randint(1, max_events)):
            rows.append((u, rng.choice("ABC"), rng.randint(1, 50), eid))
            eid += 1
    return rows


def test_scd2_interval_algebra(spark):
    from hummingbirddatapipeline_spark.operators.temporal import scd2_history

    rng = random.Random(1406)
    rows = _random_events(rng)
    df = spark.createDataFrame(
        rows, "uid long, attr string, ts long, eid long"
    )
    out = scd2_history(df, "uid", "attr", "ts", "eid").collect()
    per_user = defaultdict(list)
    for r in out:
        per_user[r["uid"]].append(r)
    events_per_user = Counter(u for u, *_ in rows)
    for uid, ivs in per_user.items():
        ivs.sort(key=lambda r: r["version"])
        # versions dense from 1; event counts conserved
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(r["n_events"] for r in ivs) == events_per_user[uid]
        # interval chain: valid_to links to the next valid_from; only
        # the last interval is open/current
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert not a["is_current"]
            # consecutive intervals always differ in attribute value
            assert a["attr"] != b["attr"]
        assert ivs[-1]["valid_to"] is None and ivs[-1]["is_current"]
        assert ivs[0]["valid_from"] == min(ts for u, _, ts, _ in rows if u == uid)


def _brute_battery(text):
    toks = [t for t in text.strip().split() if t]
    chars = len(text)
    exp = {}
    for n in (2, 3, 4, 5, 6, 7, 8):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)] if len(toks) >= n else []
        cnt = Counter(grams)
        q6 = lambda x: int(x * 1e6 + 0.5) / 1e6  # noqa: E731
        top = max((c * len(g) for g, c in cnt.items()), default=0)
        dup = sum(c * len(g) for g, c in cnt.items() if c > 1)
        key = f"top_{n}gram_char_frac" if n <= 4 else f"dup_{n}gram_char_frac"
        exp[key] = q6(top / chars) if n <= 4 else q6(min(1.0, dup / chars))
    return exp


def test_repetition_battery_matches_brute_force(spark):
    from hummingbirddatapipeline_spark.functions.text import (
        repetition_battery,
    )

    rng = random.Random(64)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in repetition_battery(df, "text", "doc_id").collect()}
    for doc_id, text in docs:
        exp = _brute_battery(text)
        got = {k: v for k, v in out[doc_id].items() if k != "doc_id"}
        assert got == exp, f"doc {doc_id}: {got} != {exp}"


def test_skew_report_arithmetic(spark):
    from hummingbirddatapipeline_spark.operators.scale import key_skew_report

    rng = random.Random(7)
    rows = [(rng.choice("abcdefgh"),) for _ in range(500)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_report(df, "k", top_k=8).collect()
    cnt = Counter(k for k, in rows)
    assert sum(r["cnt"] for r in out) == 500
    assert [r["cnt"] for r in out] == sorted((r["cnt"] for r in out), reverse=True)
    for r in out:
        assert r["cnt"] == cnt[r["key"]]
        assert r["suggested_salt"] >= 1
        assert abs(r["share"] - round(cnt[r["key"]] / 500, 6)) < 1e-12
    assert out[0]["skew_ratio"] == round(max(cnt.values()) / (500 / len(cnt)), 4)


def test_anomaly_zscore_flags_injected_spike(spark):
    """A type whose hourly counts are flat except one large spike must
    flag exactly the spike; a perfectly flat type has std 0 and no
    flags (NULL z)."""
    import hummingbirddatapipeline_spark.catalog.events_q as events_q

    rows = []
    eid = 0
    for h in range(20):
        n = 100 if h != 7 else 400  # spike at hour 7
        for _ in range(n):
            rows.append((eid, h * 3_600_000 * 1_000_000, 1, "click"))
            eid += 1
    for h in range(10):  # flat type
        for _ in range(50):
            rows.append((eid, h * 3_600_000 * 1_000_000, 2, "view"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string"
    )
    orig_load = events_q.load
    try:
        events_q.load = lambda spark_, sf_dir_, name: df  # noqa: ARG005
        out = events_q.events_anomaly_zscore.__wrapped__(spark, "/tmp/unused")
        got = {
            (r["event_type"], r["hour_start_ms"] // 3_600_000): r
            for r in out.collect()
        }
    finally:
        events_q.load = orig_load
    clicks = [r for (t, _), r in got.items() if t == "click"]
    assert sum(1 for r in clicks if r["anomalous"]) == 1
    spike = next(r for r in clicks if r["anomalous"])
    assert spike["c"] == 400 and spike["z"] > 3
    views = [r for (t, _), r in got.items() if t == "view"]
    assert all(r["z"] is None and not r["anomalous"] for r in views)
