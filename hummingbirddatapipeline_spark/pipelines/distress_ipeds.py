"""The IPEDS v5 distress engine as a Spark pipeline (SURVEY.md §3.2).

Reference: DistressIPEDSEngine v5
(/root/reference/hv_master_data/data/Hummingbird_Master_engine_ipeds_v5.py).
Where the reference runs a per-institution Python loop over nested
dicts, this pipeline is declarative stages over the ``ipeds_annual``
long table (FIXTURES.md §2) and the wide ``master``:

  master -> [J6 subsidiary detection]        (groupBy ein, max_by, 1% band)
  ipeds  -> [acct-standard detection]        (max_by(class, year) + irs990 sync)
         -> [R4 990 cross-fill]              (master pivot -> coalesce)
         -> [canonical dispatch layer]       (CASE acct ... -> c_* columns)
         -> [W1/W2 window prep]              (lag / first / range-frame base year)
         -> [SPEC_IPEDS scoring]             (pure expressions, A6/A9)
         -> [F19 floors]                     (enrollment + revenue velocity)
  and    -> [closed gate + W5 year select]   (usability fallback)
         -> [J1 master writeback]

Scale notes: one shuffle on ``unitid`` serves every window; subsidiary
detection shuffles master once on ``ein_clean``; the scoring layer is
shuffle-free expressions; score/master joins broadcast the per-entity
score rows. Nothing mutates its inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hummingbirddatapipeline_spark.scoring.compiler import apply_spec
from hummingbirddatapipeline_spark.scoring.specs_ipeds import SPEC_IPEDS

TARGET_YEAR_DEFAULT = 2024

# 990-fill fields (ipeds_v5.py:533-569)
MULTI_YEAR_FILL = (
    "f2_total_revenues", "f2_total_expenses",
    "f2_total_assets", "f2_total_liabilities", "f2_total_net_assets",
    "f1a_total_revenues", "f1a_total_assets",
    "f1a_total_liabilities", "f1a_net_position",
    "f3_total_revenues", "f3_total_expenses",
    "f3_total_assets", "f3_total_liabilities", "f3_total_equity",
)
SINGLE_YEAR_FILL = (
    "f2_unrestricted_na", "f2_ppe", "f2_debt_ppe", "f3_ppe", "f3_debt_ppe",
)

# year-footprint fields for usability / likely_closed
# (ipeds_v5.py:485-496,502-527 — same six financial fields)
_FOOTPRINT_FIELDS = (
    "f2_total_assets", "f2_total_revenues",
    "f1a_total_assets", "f1a_total_revenues",
    "f3_total_assets", "f3_total_revenues",
)

# every numeric input the engine reads; absent columns (a year's fuzzy
# column map simply not finding the field, ipeds_v5.py:342-368) become
# NULL columns, and the availability/renormalization rules handle it
NUMERIC_INPUTS = (
    "total_enrollment", "ft_enrollment",
    "ft_retention_rate", "graduation_rate", "student_faculty_ratio",
    "admissions_yield", "percent_admitted",
    "equity_ratio_fasb", "equity_ratio_gasb",
    "tuition_pct_fasb", "tuition_pct_gasb",
    "endowment_per_fte", "avg_salary", "total_fte_staff",
    "f2_total_assets", "f2_total_liabilities", "f2_total_net_assets",
    "f2_unrestricted_na", "f2_total_revenues", "f2_total_expenses",
    "f2_expendable_na", "f2_ppe", "f2_debt_ppe",
    "f2_instruction", "f2_institutional_support",
    "f1a_total_assets", "f1a_total_liabilities", "f1a_net_position",
    "f1a_expendable_na", "f1a_operating_income", "f1a_total_revenues",
    "f1a_instruction",
    "f3_total_assets", "f3_total_liabilities", "f3_total_equity",
    "f3_total_revenues", "f3_total_expenses", "f3_ppe", "f3_debt_ppe",
    "f3_instruction", "f3_institutional_support", "f3_tuition_fees",
)


def ensure_inputs(ipeds: DataFrame) -> DataFrame:
    """Pad any missing numeric input with a NULL double column."""
    missing = {
        c: F.lit(None).cast("double") for c in NUMERIC_INPUTS if c not in ipeds.columns
    }
    return ipeds.withColumns(missing) if missing else ipeds


def detect_subsidiaries(master: DataFrame) -> DataFrame:
    """J6 — EIN contamination registry (ipeds_v5.py:375-437).

    EINs shared by >= 2 IPEDS UNITIDs; parent = max revenue_2024 in the
    group; a sibling whose assets_2024 are within 1% of the parent's is
    a contaminated subsidiary. Returns (unitid, is_subsidiary,
    parent_unitid, parent_name).
    """
    ipeds = (
        master.filter(F.col("data_source") == "IPEDS")
        .select(
            F.col("unitid").cast("string").alias("unitid"),
            F.col("ein_clean").cast("string").alias("ein"),
            F.col("institution_name").alias("name"),
            F.col("revenue_2024").cast("double").alias("rev"),
            F.col("assets_2024").cast("double").alias("assets"),
        )
        .filter(
            F.col("unitid").isNotNull()
            & F.col("ein").isNotNull()
            & (F.trim("ein") != "")
        )
    )
    groups = ipeds.groupBy("ein").agg(
        F.count("*").alias("n"),
        F.max_by(
            F.struct("unitid", "name", "assets"), F.coalesce("rev", F.lit(0.0))
        ).alias("parent"),
    )
    shared = groups.filter(
        (F.col("n") >= 2)
        & F.col("parent.assets").isNotNull()
        & (F.col("parent.assets") != 0)
    )
    flagged = (
        ipeds.join(F.broadcast(shared), "ein")
        .filter(
            (F.col("unitid") != F.col("parent.unitid"))
            & F.col("assets").isNotNull()
            & (
                F.abs(F.col("assets") - F.col("parent.assets"))
                / F.abs(F.col("parent.assets"))
                < 0.01
            )
        )
        .select(
            "unitid",
            F.lit(True).alias("is_subsidiary"),
            F.col("parent.unitid").alias("parent_unitid"),
            F.col("parent.name").alias("parent_name"),
        )
    )
    return flagged


def accounting_standards(ipeds: DataFrame, master: DataFrame) -> DataFrame:
    """Per-UNITID accounting standard: the classification of the latest
    year that carries any family indicator (load-order overwrite parity,
    ipeds_v5.py:325-330), then master's irs990 sync (:1382-1388).
    Returns (unitid, acct) with 'unknown' for unclassifiable."""
    cls = (
        F.when(F.col("f2_total_assets").isNotNull(), "fasb")
        .when(F.col("f1a_total_assets").isNotNull(), "gasb")
        .when(F.col("f3_total_assets").isNotNull(), "for_profit")
    )
    detected = (
        ipeds.select(F.col("unitid").cast("string").alias("unitid"), F.col("year"), cls.alias("cls"))
        .filter(F.col("cls").isNotNull())
        .groupBy("unitid")
        .agg(F.max_by("cls", "year").alias("acct"))
    )
    acct_sync = (
        F.col("accounting_standard_ipeds")
        if "accounting_standard_ipeds" in master.columns
        else F.lit(None).cast("string")
    )
    irs990 = (
        master.filter(
            (F.col("data_source") == "IPEDS")
            & (F.lower(F.trim(acct_sync)) == "irs990")
        )
        .select(F.col("unitid").cast("string").alias("unitid"))
        .distinct()
        .withColumn("acct990", F.lit("irs990"))
    )
    base = ipeds.select(F.col("unitid").cast("string").alias("unitid")).distinct()
    return (
        base.join(detected, "unitid", "left")
        .join(irs990, "unitid", "left")
        .select(
            "unitid",
            F.coalesce("acct990", "acct", F.lit("unknown")).alias("acct"),
        )
    )


def inject_990_fills(
    ipeds: DataFrame, master: DataFrame, target_year: int, years: tuple[int, ...]
) -> DataFrame:
    """R4 — coalesce master's 990-derived flat columns into the IPEDS
    long table where NULL (ipeds_v5.py:533-569): 14 multi-year fields
    from ``<field>_<year>`` columns, 5 single-year fields into the
    target year only."""
    mi = master.filter(F.col("data_source") == "IPEDS").withColumn(
        "unitid", F.col("unitid").cast("string")
    )
    # multi-year: melt the per-year flat columns the master actually has
    structs = []
    for y in years:
        fields = [
            F.col(f"{f}_{y}").cast("double").alias(f)
            if f"{f}_{y}" in master.columns
            else F.lit(None).cast("double").alias(f)
            for f in MULTI_YEAR_FILL
        ]
        structs.append(F.struct(F.lit(int(y)).alias("year"), *fields))
    melted = mi.select(
        "unitid", F.explode(F.array(*structs)).alias("my")
    ).select("unitid", "my.*")
    melted = melted.select(
        "unitid",
        "year",
        *[F.col(f).alias(f"__m_{f}") for f in MULTI_YEAR_FILL],
    )

    out = ipeds.withColumn("unitid", F.col("unitid").cast("string")).join(
        F.broadcast(melted), ["unitid", "year"], "left"
    )
    for f in MULTI_YEAR_FILL:
        if f in ipeds.columns:
            out = out.withColumn(f, F.coalesce(F.col(f), F.col(f"__m_{f}")))
        else:
            out = out.withColumn(f, F.col(f"__m_{f}"))
    out = out.drop(*[f"__m_{f}" for f in MULTI_YEAR_FILL])

    single = mi.select(
        "unitid",
        *[
            (
                F.col(f).cast("double") if f in master.columns else F.lit(None).cast("double")
            ).alias(f"__s_{f}")
            for f in SINGLE_YEAR_FILL
        ],
    )
    out = out.join(F.broadcast(single), "unitid", "left")
    for f in SINGLE_YEAR_FILL:
        src = F.when(F.col("year") == target_year, F.col(f"__s_{f}"))
        if f in ipeds.columns:
            out = out.withColumn(f, F.coalesce(F.col(f), src))
        else:
            out = out.withColumn(f, src)
    return out.drop(*[f"__s_{f}" for f in SINGLE_YEAR_FILL])


def _num(master: DataFrame, col: str) -> Column:
    return (
        F.col(col).cast("double") if col in master.columns else F.lit(None).cast("double")
    )


def prepare(
    ipeds_filled: DataFrame,
    master: DataFrame,
    acct: DataFrame,
    subs: DataFrame,
    target_year: int = TARGET_YEAR_DEFAULT,
) -> DataFrame:
    """Build the scoring input: canonical dialect columns (c_*), window
    priors, master-direct enrichment, subsidiary flags, cliff
    multiplier, months-of-reserve, runway."""
    df = ipeds_filled.withColumn("unitid", F.col("unitid").cast("string"))
    df = df.join(F.broadcast(acct), "unitid", "left").withColumn(
        "acct", F.coalesce("acct", F.lit("unknown"))
    )
    df = df.join(F.broadcast(subs), "unitid", "left").withColumn(
        "is_subsidiary", F.coalesce("is_subsidiary", F.lit(False))
    )

    m = master.filter(F.col("data_source") == "IPEDS").select(
        F.col("unitid").cast("string").alias("unitid"),
        _num(master, "enrollment_2022").alias("m_enr_2022"),
        _num(master, "enrollment_2024").alias("m_enr_2024"),
        _num(master, "net_assets_2024").alias("m_na_2024"),
        _num(master, "net_assets_2023").alias("m_na_2023"),
        _num(master, "expenses_2024").alias("m_exp_2024"),
        _num(master, "expenses_2023").alias("m_exp_2023"),
        _num(master, "revenue_2yr_pct").alias("m_revenue_2yr_pct"),
    )
    df = df.join(F.broadcast(m), "unitid", "left")

    is_f2 = F.col("acct").isin("fasb", "irs990")
    is_ga = F.col("acct") == "gasb"
    is_fp = F.col("acct") == "for_profit"

    def disp(f2: str | None, f1a: str | None, f3: str | None) -> Column:
        # _get_financial parity (ipeds_v5.py:470-479): irs990 reads the
        # f2 (990-cross-filled) family
        expr: Column = F.lit(None).cast("double")
        if f3:
            expr = F.when(is_fp, F.col(f3)).otherwise(expr)
        if f1a:
            expr = F.when(is_ga, F.col(f1a)).otherwise(expr)
        if f2:
            expr = F.when(is_f2, F.col(f2)).otherwise(expr)
        return expr

    safe = lambda n, d: F.when(  # noqa: E731
        n.isNotNull() & d.isNotNull() & (d != 0), n / d
    )

    gasb_exp = F.when(
        F.col("f1a_total_revenues").isNotNull()
        & F.col("f1a_operating_income").isNotNull(),
        F.col("f1a_total_revenues") - F.col("f1a_operating_income"),
    )

    df = df.withColumns(
        {
            # equity ratio by exact standard (ipeds_v5.py:594-616)
            "c_equity": F.when(F.col("acct") == "fasb", F.col("equity_ratio_fasb") / 100.0)
            .when(F.col("acct") == "gasb", F.col("equity_ratio_gasb") / 100.0)
            .when(is_fp, safe(F.col("f3_total_equity"), F.col("f3_total_assets")))
            .when(
                F.col("acct") == "irs990",
                safe(F.col("f2_total_net_assets"), F.col("f2_total_assets")),
            ),
            "c_unrestricted": disp("f2_unrestricted_na", None, None),
            "c_expenses_f": disp("f2_total_expenses", None, "f3_total_expenses"),
            "c_exp_f2": disp("f2_total_expenses", None, None),
            "c_assets": disp("f2_total_assets", "f1a_total_assets", "f3_total_assets"),
            "c_liabilities": disp(
                "f2_total_liabilities", "f1a_total_liabilities", "f3_total_liabilities"
            ),
            "c_expendable": disp("f2_expendable_na", "f1a_expendable_na", None),
            "c_ppe": disp("f2_ppe", None, "f3_ppe"),
            "c_debt_ppe": disp("f2_debt_ppe", None, "f3_debt_ppe"),
            "c_net_assets": disp(
                "f2_total_net_assets", "f1a_net_position", "f3_total_equity"
            ),
            "c_revenue": disp(
                "f2_total_revenues", "f1a_total_revenues", "f3_total_revenues"
            ),
        }
    )
    df = df.withColumns(
        {
            # operating expenses: GASB derives from operating income
            # (ipeds_v5.py:776-786)
            "c_exp_op": F.when(is_f2, F.col("f2_total_expenses"))
            .when(is_ga, gasb_exp)
            .when(is_fp, F.col("f3_total_expenses")),
            "c_instruction": F.when(F.col("acct") == "fasb", F.col("f2_instruction"))
            .when(is_ga, F.col("f1a_instruction"))
            .when(is_fp, F.col("f3_instruction")),
            "c_inst_support": F.when(
                F.col("acct") == "fasb", F.col("f2_institutional_support")
            ).when(is_fp, F.col("f3_institutional_support")),
        }
    )
    df = df.withColumns(
        {
            "c_instr_den": F.when(F.col("acct") == "fasb", F.col("f2_total_expenses"))
            .when(is_ga, F.col("c_exp_op"))
            .when(is_fp, F.col("f3_total_expenses")),
            "c_tuition_pct": F.when(F.col("acct") == "fasb", F.col("tuition_pct_fasb"))
            .when(is_ga, F.col("tuition_pct_gasb"))
            .when(is_fp, safe(F.col("f3_tuition_fees"), F.col("c_revenue")) * 100.0),
        }
    )

    # ---- window prep: one shuffle on unitid serves every window ----
    w = Window.partitionBy("unitid").orderBy("year")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # range frame "all rows with year <= current_year - 3" for the
    # direct-3yr fallback base (largest qualifying year = last in frame)
    wbase3 = (
        Window.partitionBy("unitid")
        .orderBy("year")
        .rangeBetween(Window.unboundedPreceding, -3)
    )
    df = df.withColumns(
        {
            "prior_year": F.lag("year").over(w),
            "prior_total_enrollment": F.lag("total_enrollment").over(w),
            "prior_c_revenue": F.lag("c_revenue").over(w),
            "prior_c_net_assets": F.lag("c_net_assets").over(w),
            "prior_ft_retention_rate": F.lag("ft_retention_rate").over(w),
            "prior_total_fte_staff": F.lag("total_fte_staff").over(w),
            "prior_avg_salary": F.lag("avg_salary").over(w),
            "oldest_year": F.first("year").over(wcum),
            "oldest_enrollment": F.first("total_enrollment").over(wcum),
            "n_years_so_far": F.count("*").over(wcum),
            "base3_year": F.last("year").over(wbase3),
            "base3_enrollment": F.last("total_enrollment").over(wbase3),
        }
    )
    df = df.withColumn(
        "years_gap",
        F.greatest(F.col("year") - F.col("prior_year"), F.lit(1)).cast("double"),
    )

    # ---- derived metrics shared by spec + floors ----
    df = df.withColumns(
        {
            "enr_trend_1yr": F.expr(
                "CASE WHEN prior_year IS NOT NULL AND total_enrollment IS NOT NULL "
                "AND prior_total_enrollment IS NOT NULL AND prior_total_enrollment > 0 "
                "THEN POWER(total_enrollment / prior_total_enrollment, 1.0 / years_gap) - 1 END"
            ),
            "enr_trend_4yr": F.expr(
                "CASE WHEN n_years_so_far >= 2 AND oldest_year < year "
                "AND total_enrollment IS NOT NULL AND oldest_enrollment IS NOT NULL "
                "AND oldest_enrollment > 0 "
                "THEN POWER(total_enrollment / oldest_enrollment, "
                "1.0 / GREATEST(year - oldest_year, 1)) - 1 END"
            ),
            # master-direct 2022->2024 change, IPEDS base-year fallback
            # (ipeds_v5.py:883-908)
            "enr_chg_3yr": F.expr(
                "CASE WHEN m_enr_2024 IS NOT NULL AND m_enr_2022 IS NOT NULL "
                "AND m_enr_2022 > 0 THEN (m_enr_2024 - m_enr_2022) / m_enr_2022 "
                "WHEN base3_enrollment IS NOT NULL AND total_enrollment IS NOT NULL "
                "AND base3_enrollment > 0 "
                "THEN (total_enrollment - base3_enrollment) / base3_enrollment END"
            ),
            "runway_std": F.expr(
                "CASE WHEN c_net_assets IS NULL OR c_revenue IS NULL "
                "OR c_expenses_f IS NULL OR c_revenue <= 0 THEN NULL "
                "WHEN (c_expenses_f - c_revenue) > 0 AND c_net_assets > 0 "
                "THEN c_net_assets / (c_expenses_f - c_revenue) "
                "WHEN (c_expenses_f - c_revenue) <= 0 THEN NULL "
                "ELSE 0.0 END"
            ),
            "na_months": F.expr(
                "CASE WHEN COALESCE(m_na_2024, m_na_2023, c_net_assets) IS NOT NULL "
                "AND COALESCE(m_exp_2024, m_exp_2023, c_expenses_f) IS NOT NULL "
                "AND COALESCE(m_exp_2024, m_exp_2023, c_expenses_f) > 0 "
                "THEN COALESCE(m_na_2024, m_na_2023, c_net_assets) "
                "/ (COALESCE(m_exp_2024, m_exp_2023, c_expenses_f) / 12.0) END"
            ),
        }
    )
    df = df.withColumn(
        "cliff_mult",
        F.expr(
            "CASE WHEN total_enrollment IS NOT NULL AND enr_chg_3yr IS NOT NULL "
            "AND total_enrollment < 500 AND enr_chg_3yr < -0.20 "
            "THEN 1.0 + 0.40 * LEAST("
            "GREATEST(0.0, (500 - total_enrollment) / 300.0) "
            "* GREATEST(0.0, (-enr_chg_3yr - 0.20) / 0.20), 1.0) "
            "ELSE 1.0 END"
        ),
    ).withColumn("accounting_standard", F.col("acct"))
    return df


def _apply_floors(scored: DataFrame) -> DataFrame:
    """F19 — enrollment velocity floor (non-subsidiaries,
    ipeds_v5.py:1061-1108) then revenue velocity floor (subsidiaries,
    :1114-1150); ordering per :1238-1258. Floors never lower a score
    and can floor a NULL composite up from 0."""
    enr_cond = (
        (~F.col("is_subsidiary"))
        & F.col("accounting_standard").isin("fasb", "irs990")
        & (F.col("total_enrollment").isNull() | (F.col("total_enrollment") < 10000))
        & F.col("enr_chg_3yr").isNotNull()
        & F.col("enr_trend_1yr").isNotNull()
        & (F.col("enr_chg_3yr") < -0.25)
        & (F.col("enr_trend_1yr") < -0.05)
    )
    decline = F.abs(F.col("enr_chg_3yr"))
    sev_mult = (
        F.when(decline >= 0.50, 0.60).when(decline >= 0.35, 0.45).otherwise(0.30)
    )
    sev_label = (
        F.when(decline >= 0.50, "severe")
        .when(decline >= 0.35, "moderate")
        .otherwise("mild")
    )
    enr_score = F.coalesce(F.col("enrollment_health_score_unrounded"), F.lit(40.0))
    floor1 = F.lit(40.0) + F.greatest(enr_score - 40.0, F.lit(0.0)) * sev_mult
    comp0 = F.col("composite_unrounded")
    out = scored.withColumn(
        "__comp1",
        F.when(enr_cond, F.greatest(floor1, F.coalesce(comp0, F.lit(0.0)))).otherwise(
            comp0
        ),
    )
    out = out.withColumn(
        "enrollment_velocity_floor",
        enr_cond & (F.col("__comp1") > F.coalesce(comp0, F.lit(0.0)) + 0.01),
    ).withColumn("floor_severity", F.when(enr_cond, sev_label))

    rev_cond = (
        F.col("is_subsidiary")
        & F.col("m_revenue_2yr_pct").isNotNull()
        & (F.col("m_revenue_2yr_pct") < -20)
    )
    floor2 = (
        F.when(F.col("m_revenue_2yr_pct") < -60, 65.0)
        .when(F.col("m_revenue_2yr_pct") < -40, 55.0)
        .otherwise(45.0)
    )
    out = out.withColumn(
        "__comp2",
        F.when(
            rev_cond, F.greatest(floor2, F.coalesce(F.col("__comp1"), F.lit(0.0)))
        ).otherwise(F.col("__comp1")),
    ).withColumn(
        "revenue_velocity_floor",
        rev_cond & (F.col("__comp2") > F.coalesce(F.col("__comp1"), F.lit(0.0)) + 0.01),
    )

    cat = F.col("__comp2")
    category = (
        F.when(cat.isNull(), "Insufficient Data")
        .when(cat < 20, "Healthy")
        .when(cat < 40, "Low Risk")
        .when(cat < 60, "Moderate Risk")
        .when(cat < 80, "High Risk")
        .otherwise("Severe Distress")
    )
    return (
        out.withColumn(
            "distress_score_prefloored", F.round(F.col("composite_unrounded"), 1)
        )
        .withColumn("distress_score", F.round(F.col("__comp2"), 1))
        .withColumn("risk_category", category)
        .withColumn(
            "solvency_source",
            F.when(F.col("is_subsidiary"), "na_months").otherwise("equity_ratio"),
        )
        .withColumn(
            "na_months_expenses",
            F.when(F.col("is_subsidiary"), F.round(F.col("na_months"), 2)),
        )
        .withColumn("cliff_multiplier", F.round(F.col("cliff_mult"), 3))
        .withColumn(
            "enrollment_chg_direct_22_24", F.round(F.col("enr_chg_3yr"), 4)
        )
        .drop(
            "__comp1",
            "__comp2",
            "composite_unrounded",
            *[f"{d.name}_score_unrounded" for d in SPEC_IPEDS.domains],
        )
    )


def score_all_years(
    ipeds: DataFrame, master: DataFrame, target_year: int = TARGET_YEAR_DEFAULT,
    years: tuple[int, ...] = (2020, 2021, 2022, 2023, 2024),
) -> DataFrame:
    """Score every (unitid, year) row — the detail export
    (ipeds_v5.py:1337-1343 score_all_years)."""
    ipeds = ensure_inputs(ipeds)
    subs = detect_subsidiaries(master)
    acct = accounting_standards(ipeds, master)
    filled = inject_990_fills(ipeds, master, target_year, years)
    prep = prepare(filled, master, acct, subs, target_year)
    scored = apply_spec(prep, SPEC_IPEDS)
    # spec emits *_score (rounded) + composite_unrounded; floors need
    # the unrounded adjusted enrollment domain — recompute from prep is
    # avoided by asking the spec for it (keep_composite_unrounded also
    # exposes the *_score_unrounded columns).
    return _apply_floors(scored)


def _year_usable(df: DataFrame) -> Column:
    cond = F.col("total_enrollment").isNotNull()
    for f in _FOOTPRINT_FIELDS:
        cond = cond | F.col(f).isNotNull()
    return cond


def select_score_years(
    filled: DataFrame, master: DataFrame, target_year: int = TARGET_YEAR_DEFAULT
) -> DataFrame:
    """W5 + closed gate — per UNITID: likely_closed flag and the year
    to score (ipeds_v5.py:502-527,1436-1458).

    likely_closed when neither of the two most recent years has any
    data footprint AND the master's revenue/enrollment 2023/2024 flat
    columns are all NULL; otherwise score the target year if present
    (else most recent), falling back to target-1/target-2 if the chosen
    year is unusable; no usable candidate -> likely_closed.
    """
    usable = _year_usable(filled).alias("usable")
    per_year = filled.withColumn("unitid", F.col("unitid").cast("string")).select(
        "unitid", "year", usable
    )
    agg = per_year.groupBy("unitid").agg(
        F.max(F.when(F.col("year") == target_year, F.col("usable"))).alias("u_t"),
        F.max(F.when(F.col("year") == target_year - 1, F.col("usable"))).alias("u_t1"),
        F.max(F.when(F.col("year") == target_year - 2, F.col("usable"))).alias("u_t2"),
        F.max(F.when(F.col("year") == target_year, 1).otherwise(0)).alias("has_t"),
        F.max("year").alias("max_year"),
        F.max_by("usable", "year").alias("u_max_year"),
        F.max(
            F.when(F.col("year").isin(target_year, target_year - 1), F.col("usable"))
        ).alias("recent_footprint"),
    )
    m = master.filter(F.col("data_source") == "IPEDS").select(
        F.col("unitid").cast("string").alias("unitid"),
        (
            _num(master, "revenue_2024").isNotNull()
            | _num(master, "enrollment_2024").isNotNull()
            | _num(master, "revenue_2023").isNotNull()
            | _num(master, "enrollment_2023").isNotNull()
        ).alias("m_recent"),
    )
    agg = agg.join(F.broadcast(m), "unitid", "left")

    cand_year = F.when(F.col("has_t") == 1, F.lit(target_year)).otherwise(
        F.col("max_year")
    )
    cand_usable = F.when(F.col("has_t") == 1, F.coalesce("u_t", F.lit(False))).otherwise(
        F.coalesce("u_max_year", F.lit(False))
    )
    score_year = (
        F.when(cand_usable, cand_year)
        .when(F.coalesce("u_t1", F.lit(False)), F.lit(target_year - 1))
        .when(F.coalesce("u_t2", F.lit(False)), F.lit(target_year - 2))
    )
    closed = (
        ~(
            F.coalesce(F.col("recent_footprint"), F.lit(False))
            | F.coalesce(F.col("m_recent"), F.lit(False))
        )
    ) | score_year.isNull()
    return agg.select(
        "unitid",
        F.when(~closed, score_year).alias("score_year"),
        closed.alias("likely_closed"),
    )


def score_asof(
    ipeds: DataFrame, master: DataFrame, target_year: int = TARGET_YEAR_DEFAULT,
    years: tuple[int, ...] = (2020, 2021, 2022, 2023, 2024),
) -> tuple[DataFrame, DataFrame]:
    """One score row per active UNITID at its selected year, plus the
    (unitid, score_year, likely_closed) selection table."""
    ipeds = ensure_inputs(ipeds)
    subs = detect_subsidiaries(master)
    acct = accounting_standards(ipeds, master)
    filled = inject_990_fills(ipeds, master, target_year, years)
    selection = select_score_years(filled, master, target_year)
    prep = prepare(filled, master, acct, subs, target_year)
    scored = _apply_floors(apply_spec(prep, SPEC_IPEDS))
    picked = scored.join(
        F.broadcast(selection.filter(~F.col("likely_closed"))),
        (scored["unitid"] == selection["unitid"])
        & (scored["year"] == selection["score_year"]),
    ).select(scored["*"])
    return picked, selection


# master column -> score column (ipeds_v5.py:1493-1530)
MASTER_IPEDS_COLUMNS = {
    "distress_score_ipeds": "distress_score",
    "distress_score_prefloored_ipeds": "distress_score_prefloored",
    "distress_category_ipeds": "risk_category",
    "accounting_standard_ipeds": "accounting_standard",
    "solvency_score_ipeds": "solvency_score",
    "liquidity_score_ipeds": "liquidity_score",
    "operating_score_ipeds": "operating_performance_score",
    "enrollment_score_ipeds": "enrollment_health_score",
    "academic_score_ipeds": "academic_outcomes_score",
    "demand_score_ipeds": "demand_score",
    "trend_score_ipeds": "trend_score",
    "data_completeness_ipeds": "data_completeness",
    "score_year_ipeds": "year",
    "cliff_multiplier_ipeds": "cliff_multiplier",
    "enrollment_velocity_floor_ipeds": "enrollment_velocity_floor",
    "floor_severity_ipeds": "floor_severity",
    "enrollment_chg_direct_ipeds": "enrollment_chg_direct_22_24",
    "solvency_source_ipeds": "solvency_source",
    "na_months_expenses_ipeds": "na_months_expenses",
    "revenue_velocity_floor_ipeds": "revenue_velocity_floor",
    "is_subsidiary_ipeds": "is_subsidiary",
    "parent_unitid_ipeds": "parent_unitid",
    "parent_name_ipeds": "parent_name",
    "equity_ratio_raw_ipeds": "equity_ratio_raw",
    "unrestricted_cushion_raw_ipeds": "unrestricted_cushion_raw",
    "operating_margin_raw_ipeds": "operating_margin_raw",
    "debt_ratio_raw_ipeds": "debt_ratio_raw",
    "tuition_dependency_raw_ipeds": "tuition_dependency_raw",
    "retention_rate_raw_ipeds": "retention_rate_raw",
    "graduation_rate_raw_ipeds": "graduation_rate_raw",
    "enrollment_trend_1yr_raw_ipeds": "enrollment_trend_1yr_raw",
    "enrollment_trend_4yr_raw_ipeds": "enrollment_trend_4yr_raw",
    "enrollment_chg_3yr_raw_ipeds": "enrollment_chg_3yr_raw",
    "revenue_runway_raw_ipeds": "revenue_runway_raw",
    "admissions_yield_raw_ipeds": "admissions_yield_raw",
    "revenue_per_student_raw_ipeds": "revenue_per_student_raw",
    "days_cash_raw_ipeds": "days_cash_raw",
    "net_asset_trend_raw_ipeds": "net_asset_trend_raw",
}

CATEGORY_TO_MASTER = {
    "Healthy": "Healthy",
    "Low Risk": "Low",
    "Moderate Risk": "Moderate",
    "High Risk": "High",
    "Severe Distress": "Critical",
    "Insufficient Data": "Healthy",
}


def integrate_with_master(
    master: DataFrame, ipeds: DataFrame, target_year: int = TARGET_YEAR_DEFAULT,
    years: tuple[int, ...] = (2020, 2021, 2022, 2023, 2024),
) -> DataFrame:
    """J1 — returns a NEW master with *_ipeds columns updated for
    data_source == 'IPEDS' rows, likely_closed flags, and the headline
    distress score/category refreshed where a new score exists
    (ipeds_v5.py:1343-1575)."""
    picked, selection = score_asof(ipeds, master, target_year, years)
    prefixed = picked.select(
        F.col("unitid").alias("__join_uid"),
        F.col("distress_score").alias("__headline_score"),
        *[
            F.col(sc).alias(f"__s_{mc}")
            for mc, sc in MASTER_IPEDS_COLUMNS.items()
        ],
    )
    cat_expr = F.lit("Healthy")
    for k, v in CATEGORY_TO_MASTER.items():
        cat_expr = F.when(
            F.col("__s_distress_category_ipeds") == k, F.lit(v)
        ).otherwise(cat_expr)
    prefixed = prefixed.withColumn("__headline_category", cat_expr)

    mm = master.withColumn("__uid", F.col("unitid").cast("string")).withColumn(
        "__is_ipeds", F.col("data_source") == "IPEDS"
    )
    out = mm.join(
        F.broadcast(prefixed),
        (mm["__uid"] == prefixed["__join_uid"]) & mm["__is_ipeds"],
        "left",
    )
    closed = selection.select(
        F.col("unitid").alias("__c_uid"), F.col("likely_closed").alias("__closed")
    )
    out = out.join(F.broadcast(closed), out["__uid"] == closed["__c_uid"], "left")

    for mc in MASTER_IPEDS_COLUMNS:
        src = F.col(f"__s_{mc}")
        if mc in master.columns:
            out = out.withColumn(mc, F.coalesce(src, F.col(mc)))
        else:
            out = out.withColumn(mc, src)
    out = out.withColumn(
        "likely_closed_ipeds",
        F.when(F.col("__is_ipeds"), F.coalesce("__closed", F.lit(False))).otherwise(
            F.col("likely_closed_ipeds") if "likely_closed_ipeds" in master.columns else F.lit(False)
        ),
    )
    has_score = F.col("__headline_score").isNotNull()
    if "distress_score" in master.columns:
        out = out.withColumn(
            "distress_score",
            F.when(has_score, F.col("__headline_score")).otherwise(
                F.col("distress_score")
            ),
        ).withColumn(
            "distress_category",
            F.when(has_score, F.col("__headline_category")).otherwise(
                F.col("distress_category")
                if "distress_category" in master.columns
                else F.lit(None)
            ),
        )
    return out.drop(*[c for c in out.columns if c.startswith("__")])
