"""Scalar expression factories — SURVEY.md §2.8 (F1–F19).

Every function here returns a native Spark ``Column`` (whole-stage
codegen-friendly); none uses a Python UDF. Reference parity citations
point into ``/root/reference/`` (pandas implementations these replace).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_cents(col: Column) -> Column:
    """Quantize a 2-dp money double to exact integer cents.

    ``ROUND(x * 100)`` at scale 0 then CAST BIGINT — the per-row form is
    deterministic and cross-engine stable (scale-0 rounding of a double
    agrees between Spark's BigDecimal HALF_UP and DuckDB's
    half-away-from-zero; only scale>0 rounding of *computed* doubles can
    diverge). Summing the resulting integers is order-independent, unlike
    summing the raw doubles — the fix for the driver-hash flake class
    (parallel partial-sum order vs DuckDB's sequential sum).
    """
    return F.round(col * 100).cast("long")


def safe_divide(num: Column, den: Column) -> Column:
    """F1 — NULL on zero/NULL denominator.

    Parity: ``_safe_divide`` (Hummingbird_Master_engine_990.py:723-727,
    Hummingbird_Master_engine_ipeds.py:516-519).
    """
    return F.try_divide(num, den)


def linear_interp_score(
    value: Column,
    healthy: float,
    distress: float,
    invert: bool = False,
) -> Column:
    """F2 — the scoring-DSL core: threshold -> linear interpolation.

    Returns 0.0 at/beyond the healthy threshold, 1.0 at/beyond the
    distress threshold, linear in between; NULL propagates. ``invert``
    flips direction (higher raw value = more distressed).

    Parity: ``_interpolate_score`` (Hummingbird_Master_engine_990.py:736-769,
    Hummingbird_Master_engine_ipeds.py:521-538, ipeds_v5.py:457-468). The
    reference guards complex-number results by treating them as missing;
    with plain linear interpolation no complex values can arise, and NULL
    inputs stay NULL here just as they yield "no score" there.
    """
    v = value.cast("double")
    if invert:
        # distress > healthy: score rises as value rises.
        frac = (v - F.lit(float(healthy))) / F.lit(float(distress) - float(healthy))
    else:
        # healthy > distress: score rises as value falls.
        frac = (F.lit(float(healthy)) - v) / F.lit(float(healthy) - float(distress))
    # least/greatest skip NULLs in Spark, so guard explicitly: NULL in -> NULL out.
    clamped = F.least(F.lit(1.0), F.greatest(F.lit(0.0), frac))
    return F.when(v.isNull(), F.lit(None).cast("double")).otherwise(clamped)


def bucket(value: Column, edges: Sequence[tuple[float, float]], default: float) -> Column:
    """F3 — step/bucket scoring: first (threshold, score) whose
    ``value >= threshold`` wins; ``default`` otherwise. NULL -> NULL.

    Parity: enrollment size buckets (ipeds.py:746-758), months-of-reserve
    steps (ipeds_v5.py:722-729), priority buckets (append_priorities.py:73-102).
    """
    expr = F.lit(float(default))
    for threshold, score in reversed(list(edges)):
        expr = F.when(value >= F.lit(float(threshold)), F.lit(float(score))).otherwise(expr)
    return F.when(value.isNull(), F.lit(None).cast("double")).otherwise(expr)


def hhi(shares: Sequence[Column]) -> Column:
    """F5 — Herfindahl-Hirschman index: sum of squared shares with
    null-safe terms (NULL share contributes 0).

    Parity: revenue concentration (Hummingbird_Master_engine_990.py:924-939).
    """
    terms = [F.coalesce(F.pow(s, F.lit(2.0)), F.lit(0.0)) for s in shares]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def ratio_to_cap(ratio: Column, cap: float) -> Column:
    """F6 — ``min(1, ratio/cap)``.

    Parity: insider-loan and fundraising-efficiency scores
    (Hummingbird_Master_engine_990.py:1074-1094).
    """
    return F.least(F.lit(1.0), ratio / F.lit(float(cap)))


def flag_parse(col: Column) -> Column:
    """F7 — Y/N/1/TRUE strings -> boolean.

    Parity: ``str(x).upper() in ('Y','YES','1','TRUE')``
    (Hummingbird_Master_engine_990.py:1066,1100) — NaN stringifies to
    'NAN' there, i.e. missing means False, so NULL -> False here.
    """
    return F.coalesce(
        F.upper(F.trim(col.cast("string"))).isin("Y", "YES", "1", "TRUE"), F.lit(False)
    )


def normalize_key(col: Column) -> Column:
    """F8 — EIN/UNITID-style key normalization: stringify, trim,
    drop a trailing ``.0`` (float round-trip), strip leading zeros.

    Parity: EIN lstrip zeros (990.py:678), ``str(int(x))`` cleanup
    (990.py:1287-1289, ipeds_v5.py:1367-1369).
    """
    s = F.trim(col.cast("string"))
    s = F.regexp_replace(s, r"\.0$", "")
    s = F.regexp_replace(s, r"^0+", "")
    return F.when(s == "", F.lit(None).cast("string")).otherwise(s)


def normalize_name(col: Column) -> Column:
    """F8 — institution-name normalization: lowercase, strip non-ASCII
    to spaces, collapse whitespace, trim.

    Parity: ``normalize`` (master_acreage_merge.py:49-54).
    """
    s = F.lower(col.cast("string"))
    s = F.regexp_replace(s, r"[^\x00-\x7F]+", " ")
    s = F.regexp_replace(s, r"[^a-z0-9 ]", " ")
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


def year_from_yyyymm(col: Column) -> Column:
    """F13 — filing year from a YYYYMM tax period
    (Hummingbird_Master_engine_990.py:681-683)."""
    return F.floor(col.cast("long") / F.lit(100)).cast("int")


def clamp_min(col: Column, floor: float = 0.0) -> Column:
    """F18 — ``max(floor, col)`` (ipeds.py:616)."""
    return F.greatest(F.lit(float(floor)), col)


def coalesce_chain(*cols: Column) -> Column:
    """F16 — first non-null of a chain (master_standalone.py:94-109)."""
    return F.coalesce(*cols)


def format_money(col: Column) -> Column:
    """F14 — display formatting: $1.2B / $3.4M / $5.6K / $789
    (serving-layer parity: master_map2.html:471-476)."""
    a = F.abs(col)
    sign = F.when(col < 0, F.lit("-")).otherwise(F.lit(""))
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            sign,
            F.lit("$"),
            F.when(a >= 1e9, F.concat(F.round(a / 1e9, 1).cast("string"), F.lit("B")))
            .when(a >= 1e6, F.concat(F.round(a / 1e6, 1).cast("string"), F.lit("M")))
            .when(a >= 1e3, F.concat(F.round(a / 1e3, 1).cast("string"), F.lit("K")))
            .otherwise(F.round(a, 0).cast("long").cast("string")),
        )
    )
