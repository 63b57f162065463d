"""Golden tests for the IPEDS v5 distress pipeline.

Expected values hand-computed from the reference semantics
(Hummingbird_Master_engine_ipeds_v5.py): dialect dispatch, A6
renormalization, subsidiary months-of-reserve branch, cliff
multiplier, both velocity floors, closed gate, year fallback,
master writeback.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from hummingbirddatapipeline_spark.pipelines.distress_ipeds import (
    NUMERIC_INPUTS,
    detect_subsidiaries,
    integrate_with_master,
    score_asof,
)

MASTER_NUM = [
    "revenue_2024", "assets_2024", "revenue_2023",
    "enrollment_2022", "enrollment_2023", "enrollment_2024",
    "net_assets_2024", "net_assets_2023", "expenses_2024", "expenses_2023",
    "revenue_2yr_pct",
    "f2_total_revenues_2023", "f2_total_revenues_2024",
    "f2_total_expenses_2024", "f2_total_net_assets_2024",
    "f2_total_assets_2024", "f2_total_liabilities_2024",
]


def ipeds_row(unitid, year, **kw):
    row = {"unitid": unitid, "year": year}
    for f in NUMERIC_INPUTS:
        row[f] = float(kw[f]) if f in kw and kw[f] is not None else None
    unknown = set(kw) - set(NUMERIC_INPUTS)
    assert not unknown, unknown
    return row


def ipeds_schema():
    return T.StructType(
        [T.StructField("unitid", T.StringType()), T.StructField("year", T.IntegerType())]
        + [T.StructField(f, T.DoubleType()) for f in NUMERIC_INPUTS]
    )


def master_row(unitid, **kw):
    row = {
        "unitid": unitid,
        "data_source": kw.pop("data_source", "IPEDS"),
        "ein_clean": kw.pop("ein_clean", None),
        "institution_name": kw.pop("institution_name", f"Inst {unitid}"),
        "accounting_standard_ipeds": kw.pop("accounting_standard_ipeds", None),
        "distress_score": kw.pop("distress_score", None),
        "distress_category": kw.pop("distress_category", None),
    }
    for f in MASTER_NUM:
        row[f] = float(kw[f]) if f in kw and kw[f] is not None else None
    unknown = set(kw) - set(MASTER_NUM)
    assert not unknown, unknown
    return row


def master_schema():
    return T.StructType(
        [
            T.StructField("unitid", T.StringType()),
            T.StructField("data_source", T.StringType()),
            T.StructField("ein_clean", T.StringType()),
            T.StructField("institution_name", T.StringType()),
            T.StructField("accounting_standard_ipeds", T.StringType()),
            T.StructField("distress_score", T.DoubleType()),
            T.StructField("distress_category", T.StringType()),
        ]
        + [T.StructField(f, T.DoubleType()) for f in MASTER_NUM]
    )


@pytest.fixture(scope="module")
def frames(spark):
    ipeds = [
        # --- 100: FASB, sparse-indicator case with hand-computed composite
        ipeds_row("100", 2023, total_enrollment=1000, ft_retention_rate=60),
        ipeds_row(
            "100", 2024,
            total_enrollment=900, ft_enrollment=540,
            ft_retention_rate=55, graduation_rate=27.5, admissions_yield=25,
            equity_ratio_fasb=50,
            f2_total_assets=1000, f2_total_liabilities=600,
        ),
        # --- 200: GASB, dialect dispatch (derived expenses, gasb tuition)
        ipeds_row(
            "200", 2024,
            total_enrollment=2000, ft_enrollment=1400,
            ft_retention_rate=80, graduation_rate=50, student_faculty_ratio=15,
            admissions_yield=40, percent_admitted=70,
            equity_ratio_gasb=75, tuition_pct_gasb=70, endowment_per_fte=20000,
            f1a_total_assets=2000, f1a_total_liabilities=500,
            f1a_net_position=1500, f1a_total_revenues=40_000_000,
            f1a_operating_income=4_000_000, f1a_instruction=10_800_000,
        ),
        # --- 300 parent / 301 subsidiary (shared EIN, assets within 1%)
        ipeds_row("300", 2024, total_enrollment=5000, f2_total_assets=10_000),
        ipeds_row(
            "301", 2024,
            total_enrollment=300, ft_retention_rate=55, graduation_rate=27.5,
            admissions_yield=25,
        ),
        # --- 400: FASB, enrollment-collapse -> velocity floor (moderate)
        ipeds_row("400", 2023, total_enrollment=700),
        ipeds_row(
            "400", 2024,
            total_enrollment=630, ft_retention_rate=55, graduation_rate=27.5,
            equity_ratio_fasb=50, f2_total_assets=5000,
        ),
        # --- 500: likely closed (last data 2021, master recent empty)
        ipeds_row("500", 2020, total_enrollment=150),
        ipeds_row("500", 2021, total_enrollment=120),
        # --- 600: irs990 sync + 990 cross-fill from master flat columns
        ipeds_row("600", 2023, total_enrollment=1000),
        ipeds_row("600", 2024, total_enrollment=1000),
    ]
    master = [
        master_row("100"),
        master_row("200"),
        master_row(
            "300", ein_clean="E1", institution_name="Parent U",
            revenue_2024=5000, assets_2024=10_000,
        ),
        master_row(
            "301", ein_clean="E1", institution_name="Sub College",
            revenue_2024=100, assets_2024=9950,
            net_assets_2024=600, expenses_2024=1200, revenue_2yr_pct=-65,
        ),
        master_row("400", enrollment_2022=1000, enrollment_2024=600),
        master_row("500"),
        master_row(
            "600", accounting_standard_ipeds="irs990",
            f2_total_revenues_2023=20_000_000, f2_total_revenues_2024=20_000_000,
            f2_total_expenses_2024=18_000_000, f2_total_net_assets_2024=400,
            f2_total_assets_2024=1000, f2_total_liabilities_2024=600,
        ),
        # non-IPEDS row must pass through untouched
        master_row("999", data_source="Hummingbird_990", distress_score=88.0,
                   distress_category="Critical"),
    ]
    ipeds_df = spark.createDataFrame(ipeds, ipeds_schema())
    master_df = spark.createDataFrame(master, master_schema())
    return ipeds_df, master_df


@pytest.fixture(scope="module")
def scored(frames):
    ipeds_df, master_df = frames
    picked, selection = score_asof(ipeds_df, master_df, target_year=2024)
    rows = {r["unitid"]: r.asDict() for r in picked.collect()}
    sel = {r["unitid"]: r.asDict() for r in selection.collect()}
    return rows, sel


def test_subsidiary_detection(frames):
    _, master_df = frames
    subs = {r["unitid"]: r.asDict() for r in detect_subsidiaries(master_df).collect()}
    assert set(subs) == {"301"}
    assert subs["301"]["parent_unitid"] == "300"
    assert subs["301"]["parent_name"] == "Parent U"


def test_fasb_sparse_composite(scored):
    r, _ = scored
    row = r["100"]
    assert row["accounting_standard"] == "fasb"
    assert row["equity_ratio_raw"] == pytest.approx(0.5)
    assert row["debt_ratio_raw"] == pytest.approx(0.6)
    # domains: solvency 7.826..., enrollment 61.667, academic 50,
    # demand 50, trend 100 -> composite 52.1207 -> 52.1
    assert row["solvency_score"] == pytest.approx(7.8)
    assert row["enrollment_health_score"] == pytest.approx(61.7)
    assert row["academic_outcomes_score"] == pytest.approx(50.0)
    assert row["demand_score"] == pytest.approx(50.0)
    assert row["trend_score"] == pytest.approx(100.0)
    assert row["distress_score"] == pytest.approx(52.1)
    assert row["risk_category"] == "Moderate Risk"
    assert row["indicators_scored"] == 10
    assert row["data_completeness"] == pytest.approx(36.0)  # 10/28 indicators
    assert not row["enrollment_velocity_floor"]
    assert not row["revenue_velocity_floor"]


def test_gasb_dialect_dispatch(scored):
    r, _ = scored
    row = r["200"]
    assert row["accounting_standard"] == "gasb"
    # derived expenses: 40M - 4M = 36M -> margin 0.1; instruction 0.3
    assert row["operating_margin_raw"] == pytest.approx(0.1)
    assert row["tuition_dependency_raw"] == pytest.approx(70.0)
    # runway needs f2/f3 expenses -> NULL under GASB (ipeds_v5.py:609)
    assert row["revenue_runway_raw"] is None
    assert row["operating_performance_score"] == pytest.approx(12.5)
    assert row["solvency_score"] == pytest.approx(0.0)
    assert row["distress_score"] == pytest.approx(2.1)
    assert row["risk_category"] == "Healthy"
    assert row["data_completeness"] == pytest.approx(50.0)  # 14/28 indicators


def test_subsidiary_months_of_reserve_and_revenue_floor(scored):
    r, _ = scored
    row = r["301"]
    assert row["is_subsidiary"] is True
    assert row["solvency_source"] == "na_months"
    # na = 600, exp = 1200 -> 6 months -> step 0.67 -> domain 67... no:
    # 6 months falls in [6,12) -> 0.47 -> 47
    assert row["na_months_expenses"] == pytest.approx(6.0)
    assert row["revenue_runway_raw"] == pytest.approx(6.0)
    assert row["solvency_score"] == pytest.approx(47.0)
    # standard solvency indicators suppressed entirely
    assert row["equity_ratio_raw"] is None and row["debt_ratio_raw"] is None
    # composite pre-floor 49.3; revenue_2yr_pct=-65 -> floor 65
    assert row["distress_score_prefloored"] == pytest.approx(49.3)
    assert row["distress_score"] == pytest.approx(65.0)
    assert row["revenue_velocity_floor"] is True
    assert not row["enrollment_velocity_floor"]
    assert row["risk_category"] == "High Risk"


def test_enrollment_velocity_floor(scored):
    r, _ = scored
    row = r["400"]
    # direct 22->24: (600-1000)/1000 = -0.40 (master flat columns win)
    assert row["enrollment_chg_direct_22_24"] == pytest.approx(-0.4)
    assert row["enrollment_trend_1yr_raw"] == pytest.approx(-0.1)
    # enrollment domain 87.6923 unrounded; moderate severity 0.45:
    # floor = 40 + 47.6923*0.45 = 61.4615 > composite 53.4965
    assert row["distress_score_prefloored"] == pytest.approx(53.5)
    assert row["distress_score"] == pytest.approx(61.5)
    assert row["enrollment_velocity_floor"] is True
    assert row["floor_severity"] == "moderate"
    assert row["cliff_multiplier"] == pytest.approx(1.0)  # 630 >= 500


def test_likely_closed_gate(scored):
    r, sel = scored
    assert "500" not in r
    assert sel["500"]["likely_closed"] is True
    assert sel["500"]["score_year"] is None
    # everyone else active
    assert not sel["100"]["likely_closed"]
    assert sel["100"]["score_year"] == 2024


def test_irs990_crossfill(scored):
    r, _ = scored
    row = r["600"]
    assert row["accounting_standard"] == "irs990"
    # equity from cross-filled f2 columns: 400/1000
    assert row["equity_ratio_raw"] == pytest.approx(0.4)
    assert row["debt_ratio_raw"] == pytest.approx(0.6)
    assert row["operating_margin_raw"] == pytest.approx(0.1)
    # revenue trend from filled 2023/2024 revenues: 0 -> score 0
    assert row["revenue_trend_raw"] == pytest.approx(0.0)
    assert row["trend_score"] == pytest.approx(0.0)
    # surplus -> runway NULL (not penalized)
    assert row["revenue_runway_raw"] is None
    assert row["distress_score"] == pytest.approx(1.8)
    assert row["risk_category"] == "Healthy"


def test_master_writeback(frames):
    ipeds_df, master_df = frames
    out = integrate_with_master(master_df, ipeds_df, target_year=2024)
    rows = {r["unitid"]: r.asDict() for r in out.collect()}
    assert rows["100"]["distress_score_ipeds"] == pytest.approx(52.1)
    assert rows["100"]["distress_category_ipeds"] == "Moderate Risk"
    assert rows["100"]["distress_score"] == pytest.approx(52.1)
    assert rows["100"]["distress_category"] == "Moderate"  # headline remap
    assert rows["301"]["is_subsidiary_ipeds"] is True
    assert rows["301"]["parent_unitid_ipeds"] == "300"
    assert rows["301"]["revenue_velocity_floor_ipeds"] is True
    assert rows["400"]["floor_severity_ipeds"] == "moderate"
    assert rows["500"]["likely_closed_ipeds"] is True
    assert rows["500"]["distress_score_ipeds"] is None
    # non-IPEDS row untouched
    assert rows["999"]["distress_score"] == pytest.approx(88.0)
    assert rows["999"]["distress_category"] == "Critical"
    assert rows["999"]["likely_closed_ipeds"] is False
    # input master not mutated (no *_ipeds score columns there)
    assert "distress_score_ipeds" not in master_df.columns
