"""Scoring-spec compiler: spec -> Spark Columns AND -> DuckDB SQL.

The same generated expressions run on both engines, so the scoring path
is hash-comparable by the driver's oracle check with zero duplication.

Semantics ported from the reference (all /root/reference/hv_master_data/data/):
- F2 interpolation: Hummingbird_Master_engine_990.py:736-769 — >= healthy
  -> 0, <= distress -> 1 (invert flips), NULL/complex -> NULL.
- A6 NULL-renormalizing weighted aggregation: 990.py:1141-1167 — domain
  = sum(w*s)/sum(w over non-null s) * 100; composite = same over domain
  scores (already 0-100), no extra *100.
- A8 completeness: 990.py:1170-1182 — scored/total * 100, rounded to 0dp.
- A9 min-indicator gate: ipeds.py:957-960 — composite NULL when scored < N.
- categorize: 990.py:1201-1214.
- rounding at the result layer only: scores 1dp, raws 4dp (990.py:1180,1195-1197).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from hummingbirddatapipeline_spark.scoring.spec import Indicator, ScoringSpec

# NaN can arise from POWER(negative, fractional) — the reference's
# complex-number guard maps those to missing (990.py:751, 1195).
_NAN_GUARD = "CASE WHEN ISNAN({x}) THEN NULL ELSE ({x}) END"


def _round_sql(x: str, k: int) -> str:
    """Deterministic half-up rounding via FLOOR on the double.

    Engine ROUND() implementations disagree on exact .5 ties of the
    same IEEE double (Spark rounds the decimal expansion HALF_UP,
    DuckDB the binary value), which breaks cross-engine hash compares
    at scale; FLOOR(x*10^k + 0.5) evaluates identically everywhere.
    """
    p = 10 ** k
    return f"FLOOR(({x}) * {p} + 0.5) / {p}"


def _interp_sql(raw: str, healthy: float, distress: float, invert: bool) -> str:
    h, d = repr(float(healthy)), repr(float(distress))
    if invert:
        frac = f"(({raw}) - {h}) / ({repr(float(distress) - float(healthy))})"
    else:
        frac = f"({h} - ({raw})) / ({repr(float(healthy) - float(distress))})"
    return (
        f"CASE WHEN ({raw}) IS NULL THEN NULL "
        f"ELSE LEAST(1.0, GREATEST(0.0, {frac})) END"
    )


def _raw_col(ind: Indicator) -> str:
    return f"{ind.name}_raw"


def _score_col(ind: Indicator) -> str:
    return f"{ind.name}_score"


def _availability_wrap(expr: str, available_sql: str | None) -> str:
    if available_sql is None:
        return expr
    return f"CASE WHEN ({available_sql}) THEN ({expr}) ELSE NULL END"


def compile_layers(spec: ScoringSpec) -> list[dict[str, str]]:
    """Return successive layers of {column_name: sql_expr}.

    Layer k expressions may reference columns created in layers < k.
    Layers: raws -> indicator scores -> domain scores -> composite et al.
    """
    raws: dict[str, str] = {}
    scores: dict[str, str] = {}
    for dom in spec.domains:
        for ind in dom.indicators:
            if ind.raw_sql is not None:
                guarded = _NAN_GUARD.format(x=ind.raw_sql)
                raws[_raw_col(ind)] = _availability_wrap(guarded, ind.available_sql)
            if ind.score_sql is not None:
                expr = ind.score_sql.replace("{raw}", _raw_col(ind))
                if ind.raw_sql is None:
                    # no raw column to carry availability; wrap the score
                    expr = _availability_wrap(expr, ind.available_sql)
                scores[_score_col(ind)] = expr
            else:
                scores[_score_col(ind)] = _interp_sql(
                    _raw_col(ind), ind.healthy, ind.distress, ind.invert
                )

    domains: dict[str, str] = {}
    for dom in spec.domains:
        num = " + ".join(
            f"COALESCE({_score_col(i)} * {repr(float(i.weight))}, 0.0)"
            for i in dom.indicators
        )
        den = " + ".join(
            f"CASE WHEN {_score_col(i)} IS NOT NULL THEN {repr(float(i.weight))} ELSE 0.0 END"
            for i in dom.indicators
        )
        domains[f"{dom.name}_score"] = f"({num}) / NULLIF({den}, 0.0) * 100.0"

    # post-aggregation domain adjustments (identity unless specified);
    # the *_score_adj columns are what the composite aggregates over
    adjust_map = dict(spec.domain_adjust)
    adjusted: dict[str, str] = {}
    for dom in spec.domains:
        base = f"{dom.name}_score"
        tpl = adjust_map.get(dom.name)
        adjusted[f"{base}_adj"] = tpl.format(domain=base) if tpl else base

    final: dict[str, str] = {}
    num = " + ".join(
        f"COALESCE({d.name}_score_adj * {repr(float(d.weight))}, 0.0)"
        for d in spec.domains
    )
    den = " + ".join(
        f"CASE WHEN {d.name}_score_adj IS NOT NULL THEN {repr(float(d.weight))} ELSE 0.0 END"
        for d in spec.domains
    )
    all_scores = [
        _score_col(i) for dom in spec.domains for i in dom.indicators
    ]
    scored = " + ".join(
        f"CASE WHEN {s} IS NOT NULL THEN 1 ELSE 0 END" for s in all_scores
    )
    final["indicators_scored"] = f"({scored})"
    composite = f"({num}) / NULLIF({den}, 0.0)"
    if spec.min_indicators > 0:
        composite = (
            f"CASE WHEN ({scored}) < {spec.min_indicators} THEN NULL "
            f"ELSE {composite} END"
        )
    final["composite_unrounded"] = composite

    return [raws, scores, domains, adjusted, final]


def _category_sql(spec: ScoringSpec, composite: str) -> str:
    parts = [f"CASE WHEN ({composite}) IS NULL THEN '{spec.category_null}'"]
    for upper, label in spec.category_bands:
        parts.append(f"WHEN ({composite}) < {repr(float(upper))} THEN '{label}'")
    parts.append(f"ELSE '{spec.category_top}' END")
    return " ".join(parts)


def result_projection(spec: ScoringSpec) -> dict[str, str]:
    """Final output columns (name -> sql over the layered columns)."""
    out: dict[str, str] = {c: c for c in spec.entity_cols}
    out["distress_score"] = _round_sql("composite_unrounded", 1)
    out["risk_category"] = _category_sql(spec, "composite_unrounded")
    total = spec.indicator_count
    out["data_completeness"] = (
        # CAST: a bare 100.0 literal parses as DECIMAL on both engines
        f"ROUND(CAST(indicators_scored AS DOUBLE) * 100.0 / {total}, 0)"
        if total
        else "0.0"
    )
    out["indicators_scored"] = "indicators_scored"
    if spec.keep_composite_unrounded:
        # 6-dp deterministic quantization: POWER()-derived trend raws can
        # differ by ~1 ulp between JVM Math.pow and libm pow, so exporting
        # the bare double flakes exact-hash compares; FLOOR-quantizing at
        # 6 dp absorbs ulp noise identically on both engines.
        out["composite_unrounded"] = _round_sql("composite_unrounded", 6)
        for dom in spec.domains:
            out[f"{dom.name}_score_unrounded"] = _round_sql(f"{dom.name}_score_adj", 6)
    for dom in spec.domains:
        out[f"{dom.name}_score"] = _round_sql(f"{dom.name}_score_adj", 1)
    if spec.keep_raws:
        for dom in spec.domains:
            for ind in dom.indicators:
                if ind.raw_sql is not None:
                    out[f"{ind.name}_raw"] = _round_sql(f"{ind.name}_raw", 4)
    return out


def apply_spec(df: DataFrame, spec: ScoringSpec) -> DataFrame:
    """Run a scoring spec over a long entity(+year) DataFrame.

    Pure projection layering — Catalyst collapses it into one stage of
    whole-stage-codegen'd expressions; no shuffle, no UDFs.
    """
    # One selectExpr per layer: a single py4j call whose expressions are
    # parsed JVM-side, vs. one F.expr() round-trip per column (~300 for
    # the big specs — measured ~0.9 s of pure plan-build per invocation).
    out = df
    for layer in compile_layers(spec):
        out = out.selectExpr("*", *[f"({sql}) AS {name}" for name, sql in layer.items()])
    proj = result_projection(spec)
    return out.selectExpr(*[f"({sql}) AS {name}" for name, sql in proj.items()])


def spec_to_sql(spec: ScoringSpec, source_sql: str) -> str:
    """Emit the equivalent ANSI SQL (DuckDB-runnable) for the same spec.

    ``source_sql`` is a SELECT producing the long input table.
    """
    inner = f"({source_sql})"
    for i, layer in enumerate(compile_layers(spec)):
        cols = ", ".join(f"({sql}) AS {name}" for name, sql in layer.items())
        inner = f"(SELECT *, {cols} FROM {inner} AS _l{i})"
    proj = result_projection(spec)
    cols = ", ".join(f"({sql}) AS {name}" for name, sql in proj.items())
    return f"SELECT {cols} FROM {inner} AS _final"
