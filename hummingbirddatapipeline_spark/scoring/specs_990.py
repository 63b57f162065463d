"""The 990 distress model (19 indicators, 5 domains) as a ScoringSpec.

A faithful port of ``DISTRESS_INDICATORS`` + the domain kernels in
/root/reference/hv_master_data/data/Hummingbird_Master_engine_990.py
(spec :414-583; solvency :771-819; liquidity :821-881; operating
:883-972; trends :974-1058; red flags :1060-1102), re-expressed as SQL
expressions over the canonical ``filings_990`` long table
(/root/repo/FIXTURES.md §1) after the W1 window stage has added
``prior_*``/``years_gap`` columns.

Availability by filing type (990.py spec 'available_in') is encoded as
``available_sql``; unavailable indicators score NULL and the A6
renormalization redistributes their weight, exactly as the reference.
"""

from __future__ import annotations

from hummingbirddatapipeline_spark.scoring.spec import Domain, Indicator, ScoringSpec

_STD = "filing_type = 'standard'"
_STD_EZ = "filing_type IN ('standard', 'ez')"

# Fields the W1 window stage must provide as prior_* (+ years_gap).
TREND_FIELDS = (
    "total_revenue",
    "total_net_assets",
    "total_expenses",
    "employee_count",
)

# --- trend raw expressions (990.py:974-1058) -------------------------------
_REV_GROWTH = (
    "CASE WHEN total_revenue IS NULL OR prior_total_revenue IS NULL "
    "OR prior_total_revenue = 0 THEN NULL "
    "ELSE POWER(total_revenue / prior_total_revenue, 1.0 / years_gap) - 1 END"
)
_EXP_GROWTH = (
    "CASE WHEN total_expenses IS NULL OR prior_total_expenses IS NULL "
    "OR prior_total_expenses = 0 THEN NULL "
    "ELSE POWER(total_expenses / prior_total_expenses, 1.0 / years_gap) - 1 END"
)
# W3 signed-crossing piecewise (990.py:1013-1023)
_NA_TREND = (
    "CASE WHEN total_net_assets IS NULL OR prior_total_net_assets IS NULL THEN NULL "
    "WHEN prior_total_net_assets > 0 AND total_net_assets > 0 THEN "
    "  POWER(total_net_assets / prior_total_net_assets, 1.0 / years_gap) - 1 "
    "WHEN prior_total_net_assets > 0 AND total_net_assets <= 0 THEN -0.30 "
    "WHEN prior_total_net_assets < 0 AND total_net_assets < prior_total_net_assets THEN -0.20 "
    "WHEN prior_total_net_assets < 0 AND total_net_assets > prior_total_net_assets THEN 0.05 "
    "WHEN total_net_assets <= 0 THEN -0.10 ELSE 0.0 END"
)

SPEC_990 = ScoringSpec(
    name="distress_990",
    entity_cols=("ein", "filing_year", "filing_type"),
    domains=(
        Domain(
            name="solvency",
            weight=0.30,
            indicators=(
                # equity ratio: healthy >0.40, distress <-0.10 (990.py:780)
                Indicator(
                    name="equity_ratio",
                    weight=0.35,
                    raw_sql="total_net_assets / NULLIF(total_assets, 0)",
                    healthy=0.40,
                    distress=-0.10,
                ),
                # unrestricted cushion (standard only, 990.py:784-793)
                Indicator(
                    name="unrestricted_cushion",
                    weight=0.30,
                    raw_sql="unrestricted_net_assets / NULLIF(total_expenses, 0)",
                    healthy=0.25,
                    distress=-0.10,
                    available_sql=_STD,
                ),
                # debt ratio: healthy <0.50, distress >1.0, inverted (990.py:799)
                Indicator(
                    name="debt_ratio",
                    weight=0.20,
                    raw_sql="total_liabilities / NULLIF(total_assets, 0)",
                    healthy=0.50,
                    distress=1.0,
                    invert=True,
                ),
                # debt to fixed assets (standard only, 990.py:803-817):
                # fixed<=0/NULL with debt>0 -> 2.0; no debt -> 0.0
                Indicator(
                    name="debt_to_fixed_assets",
                    weight=0.15,
                    raw_sql=(
                        "CASE WHEN COALESCE(land_buildings_equipment, 0) > 0 THEN "
                        "  (COALESCE(secured_mortgages, 0) + COALESCE(unsecured_notes, 0))"
                        "    / land_buildings_equipment "
                        "WHEN COALESCE(secured_mortgages, 0) + COALESCE(unsecured_notes, 0) > 0 "
                        "  THEN 2.0 ELSE 0.0 END"
                    ),
                    healthy=0.60,
                    distress=1.50,
                    invert=True,
                    available_sql=_STD,
                ),
            ),
        ),
        Domain(
            name="liquidity",
            weight=0.20,
            indicators=(
                # days cash on hand: healthy >90, distress <15 (990.py:826-838)
                Indicator(
                    name="days_cash",
                    weight=0.40,
                    raw_sql=(
                        "CASE WHEN total_expenses > 0 THEN "
                        "  (COALESCE(cash, 0) + COALESCE(savings_temp_investments, 0)) "
                        "    / total_expenses * 365 ELSE NULL END"
                    ),
                    healthy=90.0,
                    distress=15.0,
                    # kernel computes this for every filing type
                    # (990.py:825-838 has no gate); EZ rows lack the cash
                    # fields so availability emerges from the data.
                ),
                # quick-ratio approx (standard, 990.py:841-863):
                # no short-term liabilities -> 10.0 if liquid else 0.0
                Indicator(
                    name="liquid_ratio",
                    weight=0.35,
                    raw_sql=(
                        "CASE WHEN COALESCE(accounts_payable, 0) + COALESCE(deferred_revenue, 0) > 0 THEN "
                        "  (COALESCE(cash, 0) + COALESCE(savings_temp_investments, 0) "
                        "   + COALESCE(accounts_receivable, 0)) "
                        "  / (COALESCE(accounts_payable, 0) + COALESCE(deferred_revenue, 0)) "
                        "WHEN COALESCE(cash, 0) + COALESCE(savings_temp_investments, 0) "
                        "   + COALESCE(accounts_receivable, 0) > 0 THEN 10.0 ELSE 0.0 END"
                    ),
                    healthy=1.5,
                    distress=0.5,
                    available_sql=_STD,
                ),
                # deferred revenue as % of revenue (standard, 990.py:866-879)
                Indicator(
                    name="deferred_revenue_risk",
                    weight=0.25,
                    raw_sql=(
                        "CASE WHEN total_revenue > 0 THEN "
                        "  COALESCE(deferred_revenue, 0) / total_revenue ELSE NULL END"
                    ),
                    healthy=0.15,
                    distress=0.50,
                    invert=True,
                    available_sql=_STD,
                ),
            ),
        ),
        Domain(
            name="operating_performance",
            weight=0.25,
            indicators=(
                # operating margin: (rev-exp)/|rev| (990.py:888-897)
                Indicator(
                    name="operating_margin",
                    weight=0.40,
                    raw_sql=(
                        "CASE WHEN total_revenue <> 0 THEN "
                        "  (total_revenue - total_expenses) / ABS(total_revenue) "
                        "ELSE NULL END"
                    ),
                    healthy=0.05,
                    distress=-0.20,
                ),
                # program revenue ratio — piecewise with flat zones
                # (990.py:900-920): <10% -> 0.6, >90% -> 0.4, else 0.0
                Indicator(
                    name="program_revenue_ratio",
                    weight=0.25,
                    raw_sql=(
                        "CASE WHEN total_revenue > 0 THEN "
                        "  COALESCE(program_revenue, 0) / total_revenue ELSE NULL END"
                    ),
                    score_sql=(
                        "CASE WHEN {raw} IS NULL THEN NULL "
                        "WHEN {raw} < 0.10 THEN 0.6 "
                        "WHEN {raw} > 0.90 THEN 0.4 ELSE 0.0 END"
                    ),
                    available_sql=_STD_EZ,
                ),
                # revenue concentration HHI over positive sources
                # (990.py:924-939); no positive source -> NULL
                Indicator(
                    name="revenue_concentration",
                    weight=0.20,
                    raw_sql=(
                        "CASE WHEN total_revenue IS NULL OR total_revenue <= 0 THEN NULL "
                        "WHEN COALESCE(contributions, 0) <= 0 "
                        " AND COALESCE(program_revenue, 0) <= 0 "
                        " AND COALESCE(investment_income, 0) <= 0 THEN NULL "
                        "ELSE "
                        "  CASE WHEN COALESCE(contributions, 0) > 0 "
                        "    THEN POWER(contributions / total_revenue, 2) ELSE 0 END "
                        "+ CASE WHEN COALESCE(program_revenue, 0) > 0 "
                        "    THEN POWER(program_revenue / total_revenue, 2) ELSE 0 END "
                        "+ CASE WHEN COALESCE(investment_income, 0) > 0 "
                        "    THEN POWER(investment_income / total_revenue, 2) ELSE 0 END "
                        "END"
                    ),
                    healthy=0.50,
                    distress=0.90,
                    invert=True,
                    available_sql=_STD_EZ,
                ),
                # compensation burden — piecewise (990.py:945-969):
                # >0.85 -> interp(0.65, 0.90, invert), <0.10 -> 0.5, else 0.0
                Indicator(
                    name="compensation_burden",
                    weight=0.15,
                    raw_sql=(
                        "CASE WHEN total_expenses > 0 THEN "
                        "  (COALESCE(officer_compensation, 0) + COALESCE(other_salaries, 0) "
                        "   + COALESCE(pension_contributions, 0) "
                        "   + COALESCE(other_employee_benefits, 0) + COALESCE(payroll_tax, 0)) "
                        "  / total_expenses ELSE NULL END"
                    ),
                    score_sql=(
                        "CASE WHEN {raw} IS NULL THEN NULL "
                        "WHEN {raw} > 0.85 THEN "
                        "  LEAST(1.0, GREATEST(0.0, ({raw} - 0.65) / 0.25)) "
                        "WHEN {raw} < 0.10 THEN 0.5 ELSE 0.0 END"
                    ),
                    available_sql=_STD,
                ),
            ),
        ),
        Domain(
            name="trend",
            weight=0.20,
            indicators=(
                # healthy >0 growing, distress <-0.15 (990.py:1003-1008)
                Indicator(
                    name="revenue_trend",
                    weight=0.30,
                    raw_sql=_REV_GROWTH,
                    healthy=0.0,
                    distress=-0.15,
                ),
                Indicator(
                    name="net_asset_trend",
                    weight=0.30,
                    raw_sql=_NA_TREND,
                    healthy=0.0,
                    distress=-0.10,
                ),
                # expense growth minus revenue growth (990.py:1036-1044)
                Indicator(
                    name="expense_growth_gap",
                    weight=0.20,
                    raw_sql=(
                        f"CASE WHEN ({_REV_GROWTH}) IS NULL OR ({_EXP_GROWTH}) IS NULL "
                        f"THEN NULL ELSE ({_EXP_GROWTH}) - ({_REV_GROWTH}) END"
                    ),
                    healthy=0.0,
                    distress=0.10,
                    invert=True,
                ),
                # employee trend: healthy >-0.02, distress <-0.20 (990.py:1047-1056)
                Indicator(
                    name="employee_trend",
                    weight=0.20,
                    raw_sql=(
                        "CASE WHEN employee_count IS NULL OR prior_employee_count IS NULL "
                        "OR prior_employee_count <= 0 THEN NULL "
                        "ELSE POWER(employee_count / prior_employee_count, 1.0 / years_gap) - 1 END"
                    ),
                    healthy=-0.02,
                    distress=-0.20,
                    # no filing-type gate in the kernel (990.py:1047-1056)
                ),
            ),
        ),
        Domain(
            name="red_flags",
            weight=0.05,
            indicators=(
                # ceased operations: Y-flag -> 1.0 (990.py:1064-1066)
                Indicator(
                    name="ceased_operations",
                    weight=0.30,
                    score_sql=(
                        "CASE WHEN UPPER(COALESCE(ceased_operations, 'N')) "
                        "IN ('Y', 'YES', '1', 'TRUE') THEN 1.0 ELSE 0.0 END"
                    ),
                ),
                # insider loans: min(1, pct_of_assets/0.10); NaN assets -> 1
                # (990.py:1069-1081, _safe_get default=1)
                Indicator(
                    name="insider_loans",
                    weight=0.20,
                    score_sql=(
                        "CASE WHEN COALESCE(total_assets, 1) > 0 "
                        "AND COALESCE(payable_to_officers, 0) "
                        "  + COALESCE(current_receivables_from_officers, 0) > 0 "
                        "THEN LEAST(1.0, "
                        "  (COALESCE(payable_to_officers, 0) "
                        "   + COALESCE(current_receivables_from_officers, 0)) "
                        "  / COALESCE(total_assets, 1) / 0.10) "
                        "ELSE 0.0 END"
                    ),
                    available_sql=_STD,
                ),
                # fundraising efficiency: min(1, ratio/0.50) (990.py:1084-1094)
                Indicator(
                    name="fundraising_efficiency",
                    weight=0.25,
                    score_sql=(
                        "CASE WHEN COALESCE(contributions, 0) > 0 "
                        "THEN LEAST(1.0, COALESCE(fundraising_fees, 0) "
                        "  / contributions / 0.50) ELSE 0.0 END"
                    ),
                    available_sql=_STD,
                ),
                # asset liquidation: Y-flag -> 0.5 (990.py:1097-1100).
                # NOTE: the spec dict says available_in=['standard'] but the
                # kernel scores it unconditionally — kernel behavior wins.
                Indicator(
                    name="asset_liquidation",
                    weight=0.25,
                    score_sql=(
                        "CASE WHEN UPPER(COALESCE(sold_assets, 'N')) "
                        "IN ('Y', 'YES', '1', 'TRUE') THEN 0.5 ELSE 0.0 END"
                    ),
                ),
            ),
        ),
    ),
)
