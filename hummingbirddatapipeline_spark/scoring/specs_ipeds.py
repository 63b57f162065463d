"""The IPEDS v5 distress model (26 indicators, 7 domains) as a
ScoringSpec.

Faithful port of DISTRESS_DOMAINS + the domain kernels in
/root/reference/hv_master_data/data/Hummingbird_Master_engine_ipeds_v5.py
(weights :195-259 + sum-to-1 assert :261-262; solvency :590-753;
liquidity :755-770; operating :772-836; enrollment :838-941; academic
:943-955; demand :957-966; trends :968-1054), re-expressed as SQL over
the prepared long table built by pipelines.distress_ipeds.prepare().

All accounting-dialect dispatch (FASB F2 / GASB F1A / for-profit F3 /
irs990 cross-fill — _get_financial, ipeds_v5.py:470-479) happens ONCE
in the prep layer as ``c_*`` canonical columns; every indicator here
reads canonical names, so the spec is dialect-free (the §7 build-plan
rule: "encode as a single derived-column layer").

Subsidiary branching (v5): standard solvency indicators carry
``available_sql = NOT is_subsidiary`` (their scores AND raws are NULL
for subsidiaries, ipeds_v5.py:727-747) and revenue_runway doubles as
the months-of-reserve step score for subsidiaries (:700-753), so the A6
renormalization reproduces the reference's branched domain exactly.
"""

from __future__ import annotations

from hummingbirddatapipeline_spark.scoring.spec import Domain, Indicator, ScoringSpec

_NOT_SUB = "NOT is_subsidiary"

# months-of-reserve step function, already on the 0-1 indicator scale
# (ipeds_v5.py:722-729; /100 normalization :733)
_NA_MONTHS_STEP = (
    "CASE WHEN na_months IS NULL THEN NULL "
    "WHEN na_months < 0 THEN 1.00 "
    "WHEN na_months < 1 THEN 0.93 "
    "WHEN na_months < 3 THEN 0.80 "
    "WHEN na_months < 6 THEN 0.67 "
    "WHEN na_months < 12 THEN 0.47 "
    "WHEN na_months < 24 THEN 0.27 "
    "WHEN na_months < 60 THEN 0.07 "
    "ELSE 0.0 END"
)

# linear interp for the standard runway path (healthy 10 months+? no —
# years: healthy 10.0, distress 2.0; ipeds_v5.py:668)
_RUNWAY_INTERP = (
    "CASE WHEN runway_std IS NULL THEN NULL "
    "WHEN runway_std >= 10.0 THEN 0.0 "
    "WHEN runway_std <= 2.0 THEN 1.0 "
    "ELSE (10.0 - runway_std) / 8.0 END"
)

SPEC_IPEDS = ScoringSpec(
    name="distress_ipeds_v5",
    entity_cols=(
        "unitid",
        "year",
        "accounting_standard",
        "is_subsidiary",
        "parent_unitid",
        "parent_name",
        "cliff_mult",
        "na_months",
        "m_revenue_2yr_pct",
        "enr_trend_1yr",
        "enr_chg_3yr",
        "total_enrollment",
    ),
    min_indicators=4,
    keep_composite_unrounded=True,
    domain_adjust=(
        # small-school enrollment cliff multiplier, capped at 100
        # (ipeds_v5.py:929-941,1199-1203)
        ("enrollment_health", "LEAST(({domain}) * cliff_mult, 100.0)"),
    ),
    domains=(
        Domain(
            name="solvency",
            weight=0.15,
            indicators=(
                Indicator(
                    name="equity_ratio",
                    weight=0.28,
                    raw_sql="c_equity",
                    healthy=0.40,
                    distress=-0.10,
                    available_sql=_NOT_SUB,
                ),
                Indicator(
                    name="unrestricted_cushion",
                    weight=0.22,
                    raw_sql="c_unrestricted / NULLIF(c_expenses_f, 0)",
                    healthy=0.25,
                    distress=-0.10,
                    available_sql=_NOT_SUB,
                ),
                Indicator(
                    name="debt_ratio",
                    weight=0.18,
                    raw_sql="c_liabilities / NULLIF(c_assets, 0)",
                    healthy=0.50,
                    distress=1.0,
                    invert=True,
                    available_sql=_NOT_SUB,
                ),
                # denominator: expenses when present (0 -> NULL, no
                # fallback), else assets (ipeds_v5.py:636-641)
                Indicator(
                    name="expendable_na_ratio",
                    weight=0.17,
                    raw_sql=(
                        "CASE WHEN c_expenses_f IS NOT NULL "
                        "THEN c_expendable / NULLIF(c_expenses_f, 0) "
                        "ELSE c_expendable / NULLIF(c_assets, 0) END"
                    ),
                    healthy=0.30,
                    distress=-0.05,
                    available_sql=_NOT_SUB,
                ),
                Indicator(
                    name="debt_to_ppe",
                    weight=0.10,
                    raw_sql="c_debt_ppe / NULLIF(c_ppe, 0)",
                    healthy=0.50,
                    distress=1.20,
                    invert=True,
                    available_sql=_NOT_SUB,
                ),
                # dual-path: subsidiaries -> months-of-reserve step
                # (raw = na_months, ipeds_v5.py:744-746); standard ->
                # runway-years interpolation
                Indicator(
                    name="revenue_runway",
                    weight=0.15,
                    raw_sql=(
                        "CASE WHEN is_subsidiary THEN na_months ELSE runway_std END"
                    ),
                    score_sql=(
                        f"CASE WHEN is_subsidiary THEN ({_NA_MONTHS_STEP}) "
                        f"ELSE ({_RUNWAY_INTERP}) END"
                    ),
                ),
            ),
        ),
        Domain(
            name="liquidity",
            weight=0.10,
            indicators=(
                Indicator(
                    name="days_cash",
                    weight=0.50,
                    raw_sql=(
                        "CASE WHEN c_unrestricted IS NOT NULL AND c_exp_f2 IS NOT NULL "
                        "AND c_exp_f2 > 0 "
                        "THEN GREATEST(0.0, c_unrestricted / c_exp_f2 * 365) END"
                    ),
                    healthy=90,
                    distress=15,
                ),
                Indicator(
                    name="endowment_cushion",
                    weight=0.50,
                    raw_sql="endowment_per_fte",
                    healthy=10000,
                    distress=500,
                ),
            ),
        ),
        Domain(
            name="operating_performance",
            weight=0.15,
            indicators=(
                Indicator(
                    name="operating_margin",
                    weight=0.35,
                    raw_sql=(
                        "CASE WHEN c_revenue IS NOT NULL AND c_exp_op IS NOT NULL "
                        "AND c_revenue <> 0 "
                        "THEN (c_revenue - c_exp_op) / ABS(c_revenue) END"
                    ),
                    healthy=0.05,
                    distress=-0.15,
                ),
                Indicator(
                    name="instruction_ratio",
                    weight=0.20,
                    raw_sql="c_instruction / NULLIF(c_instr_den, 0)",
                    healthy=0.30,
                    distress=0.15,
                ),
                Indicator(
                    name="admin_overhead_ratio",
                    weight=0.20,
                    raw_sql="c_inst_support / NULLIF(c_instr_den, 0)",
                    healthy=0.25,
                    distress=0.45,
                    invert=True,
                ),
                Indicator(
                    name="tuition_dependency",
                    weight=0.25,
                    raw_sql="c_tuition_pct",
                    healthy=60,
                    distress=85,
                    invert=True,
                ),
            ),
        ),
        Domain(
            name="enrollment_health",
            weight=0.25,
            indicators=(
                Indicator(
                    name="enrollment_trend_1yr",
                    weight=0.20,
                    raw_sql="enr_trend_1yr",
                    healthy=0.0,
                    distress=-0.10,
                ),
                Indicator(
                    name="enrollment_trend_4yr",
                    weight=0.15,
                    raw_sql="enr_trend_4yr",
                    healthy=0.0,
                    distress=-0.08,
                ),
                Indicator(
                    name="enrollment_chg_3yr",
                    weight=0.20,
                    raw_sql="enr_chg_3yr",
                    healthy=0.0,
                    distress=-0.30,
                ),
                Indicator(
                    name="ft_share",
                    weight=0.15,
                    raw_sql="ft_enrollment / NULLIF(total_enrollment, 0)",
                    healthy=0.60,
                    distress=0.30,
                ),
                # size step buckets (ipeds_v5.py:916-925); raw = the
                # enrollment count itself
                Indicator(
                    name="enrollment_size",
                    weight=0.10,
                    raw_sql="total_enrollment",
                    score_sql=(
                        "CASE WHEN total_enrollment IS NULL THEN NULL "
                        "WHEN total_enrollment >= 1000 THEN 0.0 "
                        "WHEN total_enrollment >= 500 THEN 0.2 "
                        "WHEN total_enrollment >= 200 THEN 0.5 "
                        "WHEN total_enrollment >= 50 THEN 0.7 "
                        "ELSE 0.9 END"
                    ),
                ),
                Indicator(
                    name="revenue_per_student",
                    weight=0.20,
                    raw_sql="c_revenue / NULLIF(total_enrollment, 0)",
                    healthy=15000,
                    distress=5000,
                ),
            ),
        ),
        Domain(
            name="academic_outcomes",
            weight=0.15,
            indicators=(
                Indicator(
                    name="retention_rate",
                    weight=0.40,
                    raw_sql="ft_retention_rate",
                    healthy=70,
                    distress=40,
                ),
                Indicator(
                    name="graduation_rate",
                    weight=0.35,
                    raw_sql="graduation_rate",
                    healthy=40,
                    distress=15,
                ),
                Indicator(
                    name="student_faculty_ratio",
                    weight=0.25,
                    raw_sql="student_faculty_ratio",
                    healthy=20,
                    distress=35,
                    invert=True,
                ),
            ),
        ),
        Domain(
            name="demand",
            weight=0.10,
            indicators=(
                Indicator(
                    name="admissions_yield",
                    weight=0.50,
                    raw_sql="admissions_yield",
                    healthy=35,
                    distress=15,
                ),
                Indicator(
                    name="selectivity",
                    weight=0.50,
                    raw_sql="percent_admitted",
                    healthy=80,
                    distress=98,
                    invert=True,
                ),
            ),
        ),
        Domain(
            name="trend",
            weight=0.10,
            indicators=(
                Indicator(
                    name="revenue_trend",
                    weight=0.25,
                    raw_sql=(
                        "CASE WHEN c_revenue IS NOT NULL AND prior_c_revenue IS NOT NULL "
                        "AND prior_c_revenue > 0 AND c_revenue > 0 "
                        "THEN POWER(c_revenue / prior_c_revenue, 1.0 / years_gap) - 1 END"
                    ),
                    healthy=0.0,
                    distress=-0.10,
                ),
                # W3 signed-crossing net-asset trend (ipeds_v5.py:1007-1017)
                Indicator(
                    name="net_asset_trend",
                    weight=0.25,
                    raw_sql=(
                        "CASE WHEN c_net_assets IS NULL OR prior_c_net_assets IS NULL THEN NULL "
                        "WHEN prior_c_net_assets > 0 AND c_net_assets > 0 THEN "
                        "POWER(c_net_assets / prior_c_net_assets, 1.0 / years_gap) - 1 "
                        "WHEN prior_c_net_assets > 0 AND c_net_assets <= 0 THEN -0.30 "
                        "WHEN prior_c_net_assets < 0 AND c_net_assets < prior_c_net_assets THEN -0.20 "
                        "WHEN prior_c_net_assets < 0 AND c_net_assets > prior_c_net_assets THEN 0.05 "
                        "WHEN c_net_assets <= 0 THEN -0.10 ELSE 0.0 END"
                    ),
                    healthy=0.0,
                    distress=-0.10,
                ),
                Indicator(
                    name="retention_trend",
                    weight=0.20,
                    raw_sql=(
                        "CASE WHEN ft_retention_rate IS NOT NULL "
                        "AND prior_ft_retention_rate IS NOT NULL "
                        "THEN (ft_retention_rate - prior_ft_retention_rate) / years_gap END"
                    ),
                    healthy=0,
                    distress=-5,
                ),
                Indicator(
                    name="staff_trend",
                    weight=0.15,
                    raw_sql=(
                        "CASE WHEN total_fte_staff IS NOT NULL "
                        "AND prior_total_fte_staff IS NOT NULL AND prior_total_fte_staff > 0 "
                        "THEN POWER(total_fte_staff / prior_total_fte_staff, 1.0 / years_gap) - 1 END"
                    ),
                    healthy=-0.02,
                    distress=-0.15,
                ),
                Indicator(
                    name="salary_trend",
                    weight=0.15,
                    raw_sql=(
                        "CASE WHEN avg_salary IS NOT NULL "
                        "AND prior_avg_salary IS NOT NULL AND prior_avg_salary > 0 "
                        "THEN POWER(avg_salary / prior_avg_salary, 1.0 / years_gap) - 1 END"
                    ),
                    healthy=0.02,
                    distress=-0.03,
                ),
            ),
        ),
    ),
)

SPEC_IPEDS.validate_weights()
