"""Property-based invariants (SURVEY.md §5.4).

The scoring DSL compiles to both Spark Columns and DuckDB SQL; these
properties drive the DuckDB side with hypothesis-generated inputs (no
JVM round-trip per example), which checks the exact SQL the oracle
gate runs. Engine-level invariants (floors monotone, bands) run once
over a randomized Spark batch.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hummingbirddatapipeline_spark.catalog.scoring_q import CUSTOMER_HEALTH_SPEC
from hummingbirddatapipeline_spark.scoring.compiler import spec_to_sql

maybe_money = st.one_of(
    st.none(), st.floats(-1e9, 1e9, allow_nan=False, allow_infinity=False)
)
maybe_ratio = st.one_of(
    st.none(), st.floats(-5, 5, allow_nan=False, allow_infinity=False)
)

ROW = st.fixed_dictionaries(
    {
        "entity_id": st.integers(1, 99),
        "year": st.integers(1995, 2001),
        "total_revenue": maybe_money,
        "total_expenses": maybe_money,
        "discount_share": maybe_ratio,
        "net_assets": maybe_money,
        "total_assets": maybe_money,
        "prior_total_revenue": maybe_money,
        "prior_net_assets": maybe_money,
        "years_gap": st.one_of(st.none(), st.integers(1, 4)),
    }
)

CATEGORY_OF = {
    "Healthy": (0.0, 20.0),
    "Low Risk": (20.0, 40.0),
    "Moderate Risk": (40.0, 60.0),
    "High Risk": (60.0, 80.0),
    "Severe Distress": (80.0, 100.01),
}


@settings(max_examples=60, deadline=None)
@given(st.lists(ROW, min_size=1, max_size=8))
def test_spec_sql_invariants(rows):
    pdf = pd.DataFrame(rows).astype(
        {c: "float64" for c in rows[0] if c not in ("entity_id", "year")}
    )
    con = duckdb.connect()
    con.register("src", pdf)
    sql = spec_to_sql(CUSTOMER_HEALTH_SPEC, "SELECT * FROM src")
    out = con.execute(sql).fetch_df()
    for _, r in out.iterrows():
        score = r["distress_score"]
        cat = r["risk_category"]
        if pd.isna(score):
            assert cat == "Insufficient Data"
        else:
            assert 0.0 <= score <= 100.0
            lo, hi = CATEGORY_OF[cat]
            # categorize uses the unrounded composite; the reported
            # score is rounded to 1dp, so allow the rounding margin
            assert lo - 0.05 <= score < hi + 0.05
        assert 0 <= r["indicators_scored"] <= CUSTOMER_HEALTH_SPEC.indicator_count
        assert 0.0 <= r["data_completeness"] <= 100.0
        for dom in CUSTOMER_HEALTH_SPEC.domains:
            ds = r[f"{dom.name}_score"]
            assert pd.isna(ds) or 0.0 <= ds <= 100.0
        # A9 gate: a non-null composite requires min_indicators
        if not pd.isna(score):
            assert r["indicators_scored"] >= CUSTOMER_HEALTH_SPEC.min_indicators


@pytest.mark.usefixtures("spark")
def test_ipeds_engine_invariants(spark):
    """One randomized batch through the full IPEDS engine: scores in
    range, floors never lower, categories on the FINAL score."""
    import random

    from test_distress_ipeds import ipeds_row, ipeds_schema, master_row, master_schema

    from hummingbirddatapipeline_spark.pipelines.distress_ipeds import score_all_years

    rng = random.Random(7)

    def maybe(v, p=0.3):
        return None if rng.random() < p else v

    ipeds = []
    master = []
    for uid in range(100):
        u = str(1000 + uid)
        for year in (2022, 2023, 2024):
            if rng.random() < 0.2:
                continue
            ipeds.append(
                ipeds_row(
                    u,
                    year,
                    total_enrollment=maybe(rng.uniform(20, 20000)),
                    ft_enrollment=maybe(rng.uniform(10, 15000)),
                    ft_retention_rate=maybe(rng.uniform(0, 100)),
                    graduation_rate=maybe(rng.uniform(0, 100)),
                    admissions_yield=maybe(rng.uniform(0, 100)),
                    percent_admitted=maybe(rng.uniform(0, 100)),
                    equity_ratio_fasb=maybe(rng.uniform(-100, 100)),
                    f2_total_assets=maybe(rng.uniform(0, 1e8)),
                    f2_total_liabilities=maybe(rng.uniform(0, 1e8)),
                    f2_total_net_assets=maybe(rng.uniform(-1e7, 1e8)),
                    f2_total_revenues=maybe(rng.uniform(0, 1e8)),
                    f2_total_expenses=maybe(rng.uniform(0, 1e8)),
                    endowment_per_fte=maybe(rng.uniform(0, 5e5)),
                )
            )
        master.append(
            master_row(
                u,
                ein_clean=f"E{uid % 40}",
                revenue_2024=maybe(rng.uniform(0, 1e7)),
                assets_2024=maybe(rng.uniform(0, 1e7)),
                enrollment_2022=maybe(rng.uniform(20, 20000)),
                enrollment_2024=maybe(rng.uniform(20, 20000)),
                revenue_2yr_pct=maybe(rng.uniform(-90, 50)),
                net_assets_2024=maybe(rng.uniform(-1e6, 1e7)),
                expenses_2024=maybe(rng.uniform(1, 1e7)),
            )
        )
    ipeds_df = spark.createDataFrame(ipeds, ipeds_schema())
    master_df = spark.createDataFrame(master, master_schema())
    out = score_all_years(ipeds_df, master_df, target_year=2024).collect()
    assert out
    for r in out:
        s, pre = r["distress_score"], r["distress_score_prefloored"]
        if s is not None:
            assert 0.0 <= s <= 100.0
        if pre is not None and s is not None:
            assert s >= pre - 0.05  # floors never lower a score
        if r["enrollment_velocity_floor"] or r["revenue_velocity_floor"]:
            assert s is not None and s >= pre - 0.05 if pre is not None else True
        if s is None:
            assert r["risk_category"] == "Insufficient Data"
        else:
            lo, hi = CATEGORY_OF[r["risk_category"]]
            assert lo - 0.05 <= s < hi + 0.05
        assert 0 <= r["indicators_scored"] <= 28


def test_band_join_one_percent_boundary(spark):
    """J6 boundary semantics (ipeds_v5.py:375-437): the subsidiary band
    is STRICT `< 0.01` — a sibling at exactly 1% of parent assets is
    NOT contaminated; strictly inside is; strictly outside is not."""
    import random

    from test_distress_ipeds import master_row, master_schema

    from hummingbirddatapipeline_spark.pipelines.distress_ipeds import (
        detect_subsidiaries,
    )

    rng = random.Random(13)
    rows = [
        # knife-edge: (101-100)/100 == the 0.01 double exactly -> excluded
        master_row("P0", ein_clean="E0", revenue_2024=100.0, assets_2024=100.0),
        master_row("S0", ein_clean="E0", revenue_2024=1.0, assets_2024=101.0),
    ]
    expect_flagged = set()
    for i in range(1, 60):
        parent_assets = rng.uniform(10.0, 1e7)
        frac = rng.choice(
            [rng.uniform(0.0001, 0.0099), rng.uniform(0.0101, 0.5)]
        )
        sib_assets = parent_assets * (1 + rng.choice([-1, 1]) * frac)
        rows.append(
            master_row(
                f"P{i}", ein_clean=f"E{i}",
                revenue_2024=100.0, assets_2024=parent_assets,
            )
        )
        rows.append(
            master_row(
                f"S{i}", ein_clean=f"E{i}",
                revenue_2024=1.0, assets_2024=sib_assets,
            )
        )
        if abs(sib_assets - parent_assets) / abs(parent_assets) < 0.01:
            expect_flagged.add(f"S{i}")
    out = detect_subsidiaries(spark.createDataFrame(rows, master_schema()))
    got = {r["unitid"] for r in out.collect()}
    assert got == expect_flagged


def test_floor_ordering_matches_reference_model(spark):
    """F19 ordering (ipeds_v5.py:1238-1258): enrollment floor first,
    its output feeds the revenue floor; populations are disjoint
    (non-subsidiary vs subsidiary) so each row takes exactly one floor.
    Differential check of _apply_floors against a direct Python port of
    the reference's floor cascade over randomized rows."""
    import random

    from pyspark.sql import types as T

    from hummingbirddatapipeline_spark.pipelines.distress_ipeds import _apply_floors

    def model(comp, is_sub, acct, tot_enr, enr3, enr1, enr_dom, m_rev2):
        c1 = comp
        enr_cond = (
            not is_sub
            and acct in ("fasb", "irs990")
            and (tot_enr is None or tot_enr < 10000)
            and enr3 is not None
            and enr1 is not None
            and enr3 < -0.25
            and enr1 < -0.05
        )
        if enr_cond:
            d = abs(enr3)
            mult = 0.60 if d >= 0.50 else 0.45 if d >= 0.35 else 0.30
            es = enr_dom if enr_dom is not None else 40.0
            floor1 = 40.0 + max(es - 40.0, 0.0) * mult
            c1 = max(floor1, comp if comp is not None else 0.0)
        c2 = c1
        if is_sub and m_rev2 is not None and m_rev2 < -20:
            floor2 = 65.0 if m_rev2 < -60 else 55.0 if m_rev2 < -40 else 45.0
            c2 = max(floor2, c1 if c1 is not None else 0.0)
        return c2

    rng = random.Random(29)

    def maybe(v, p=0.25):
        return None if rng.random() < p else v

    rows = []
    for i in range(300):
        rows.append(
            (
                str(i),
                maybe(rng.uniform(0, 100)),
                rng.random() < 0.5,
                rng.choice(["fasb", "gasb", "irs990", "for_profit"]),
                maybe(rng.uniform(20, 20000)),
                maybe(rng.uniform(-0.9, 0.3)),
                maybe(rng.uniform(-0.5, 0.2)),
                maybe(rng.uniform(0, 100)),
                maybe(rng.uniform(-90, 40)),
                None,
                1.0,
            )
        )
    schema = T.StructType(
        [
            T.StructField("unitid", T.StringType()),
            T.StructField("composite_unrounded", T.DoubleType()),
            T.StructField("is_subsidiary", T.BooleanType()),
            T.StructField("accounting_standard", T.StringType()),
            T.StructField("total_enrollment", T.DoubleType()),
            T.StructField("enr_chg_3yr", T.DoubleType()),
            T.StructField("enr_trend_1yr", T.DoubleType()),
            T.StructField("enrollment_health_score_unrounded", T.DoubleType()),
            T.StructField("m_revenue_2yr_pct", T.DoubleType()),
            T.StructField("na_months", T.DoubleType()),
            T.StructField("cliff_mult", T.DoubleType()),
        ]
    )
    out = {r["unitid"]: r for r in _apply_floors(
        spark.createDataFrame(rows, schema)
    ).collect()}
    for row in rows:
        uid, comp, is_sub, acct, tot_enr, enr3, enr1, enr_dom, m_rev2, _, _ = row
        want = model(comp, is_sub, acct, tot_enr, enr3, enr1, enr_dom, m_rev2)
        got = out[uid]["distress_score"]
        if want is None:
            assert got is None, (uid, row)
        else:
            assert got is not None and abs(got - round(want, 1)) <= 0.06, (
                uid, want, got, row,
            )
        # disjointness: a row never takes both floors
        assert not (
            out[uid]["enrollment_velocity_floor"]
            and out[uid]["revenue_velocity_floor"]
        )
