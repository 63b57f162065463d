"""End-to-end tests for the acreage pipeline stages: priority queue
construction (classify/bucket/dedup-append) and the multi-pass merge
with its idempotency + no-data-loss contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from hummingbirddatapipeline_spark.pipelines.acreage import (
    build_priorities,
    merge_acreage,
)


def test_build_priorities_classify_bucket_dedup(spark):
    master = spark.createDataFrame(
        [
            Row(data_source="Hummingbird_990", institution_name="Acme College",
                city="X", state="NY", latitude=1.0, longitude=2.0,
                distress_score=70.0),
            Row(data_source="Hummingbird_990", institution_name="Pine Camp",
                city="Y", state="CA", latitude=1.0, longitude=2.0,
                distress_score=20.0),
            Row(data_source="Hummingbird_990", institution_name="No Geo U",
                city="Z", state="TX", latitude=None, longitude=2.0,
                distress_score=90.0),
            Row(data_source="IPEDS", institution_name="Skip Me College",
                city="Q", state="WA", latitude=1.0, longitude=2.0,
                distress_score=95.0),
        ]
    )
    existing = spark.createDataFrame(
        [Row(institution_name="Pine Camp", city="Y", state="CA",
             distress_score=20.0, detected_type="camp",
             verification_priority="MEDIUM")]
    )
    out = build_priorities(master, existing)
    rows = {r["institution_name"]: r for r in out.collect()}
    # geo-invalid and non-990 rows filtered; duplicate not re-appended
    assert set(rows) == {"Acme College", "Pine Camp"}
    assert rows["Acme College"]["detected_type"] == "college"
    assert rows["Acme College"]["verification_priority"] == "CRITICAL"
    assert out.count() == 2


@pytest.fixture()
def merge_frames(spark):
    master = spark.createDataFrame(
        [
            # matched pass 1, empty target -> filled
            Row(master_id=1, institution_name="Acme College", state="NY",
                acreage=None, acreage_confidence=None),
            # matched pass 1, HIGH already present -> LOW must not clobber
            Row(master_id=2, institution_name="Bolt University", state="CA",
                acreage=120.0, acreage_confidence="HIGH"),
            # never matched
            Row(master_id=3, institution_name="Zed Seminary", state="TX",
                acreage=None, acreage_confidence=None),
        ]
    )
    acreage = spark.createDataFrame(
        [
            Row(acreage_id=10, name="ACME  COLLEGE!", state="NY",
                acres=50.0, confidence="MEDIUM"),
            Row(acreage_id=11, name="bolt university", state="CA",
                acres=999.0, confidence="LOW"),
            Row(acreage_id=12, name="Unknown Place", state="WA",
                acres=75.0, confidence="HIGH"),
        ]
    )
    return master, acreage


def test_merge_acreage_contract(spark, merge_frames):
    master, acreage = merge_frames
    new_master, changelog, unmatched = merge_acreage(master, acreage)
    got = {r["master_id"]: r for r in new_master.collect()}
    assert got[1]["acreage"] == 50.0 and got[1]["acreage_confidence"] == "MEDIUM"
    assert got[2]["acreage"] == 120.0 and got[2]["acreage_confidence"] == "HIGH"
    assert got[3]["acreage"] is None
    log = changelog.collect()
    assert len(log) == 1 and log[0]["master_id"] == 1
    # unmatched-with-data report keeps the orphan row for human review
    assert [r["acreage_id"] for r in unmatched.collect()] == [12]
    # idempotency: merging the same acreage into the merged master
    # changes nothing
    _, log2, _ = merge_acreage(new_master, acreage)
    assert log2.count() == 0


def test_agreement_confidence(spark):
    from hummingbirddatapipeline_spark.pipelines.acreage import (
        agreement_confidence,
    )

    cands = spark.createDataFrame(
        [
            # two of three values within 2% of the first -> HIGH
            ("a", 100.0), ("a", 101.0), ("a", 250.0),
            # single source -> MEDIUM
            ("b", 40.0),
            # two sources, no agreement -> MEDIUM
            ("c", 10.0), ("c", 20.0),
        ],
        "item string, acres double",
    )
    out = {r["item"]: r for r in agreement_confidence(cands, "item", "acres").collect()}
    assert out["a"]["confidence"] == "HIGH"
    assert out["a"]["acres"] == 100.0 and out["a"]["n_agreeing"] == 2
    assert out["b"]["confidence"] == "MEDIUM"
    assert out["c"]["confidence"] == "MEDIUM" and out["c"]["n_agreeing"] == 1


def test_geocode_fill(spark):
    from hummingbirddatapipeline_spark.pipelines.acreage import geocode_fill

    master = spark.createDataFrame(
        [
            Row(institution_name="Acme College", city="X", state="NY",
                latitude=None, longitude=None),
            Row(institution_name="Bolt University", city="Y", state="CA",
                latitude=10.0, longitude=20.0),
            Row(institution_name="Fail U", city="Z", state="TX",
                latitude=None, longitude=None),
        ]
    )

    def fake_geocoder(key: str) -> str:
        if "Fail" in key:
            raise RuntimeError("no match")
        return "40.5,-73.9"

    out = geocode_fill(master, fake_geocoder, n_workers=1)
    got = {r["institution_name"]: (r["latitude"], r["longitude"])
           for r in out.collect()}
    assert got["Acme College"] == (40.5, -73.9)      # filled
    assert got["Bolt University"] == (10.0, 20.0)    # untouched
    assert got["Fail U"] == (None, None)             # failure left as-is
