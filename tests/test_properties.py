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
