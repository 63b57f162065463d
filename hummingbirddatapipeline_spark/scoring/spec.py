"""Declarative scoring spec — the engine's DSL core (SURVEY.md §2.8 F2-F4,
§2.4 A6/A8/A9).

Mirrors the shape of the reference's ``DISTRESS_INDICATORS`` metadata
(Hummingbird_Master_engine_990.py:414-583): domains -> indicators ->
weights -> raw-value derivation -> availability. Unlike the reference
(row-at-a-time dict kernels), a spec here compiles to pure SQL
expressions — once into native Spark Columns and once into ANSI SQL for
the DuckDB oracle — so the scoring path is whole-stage-codegen'd and
differentially testable by construction.

Expression dialect: raw_sql / score_sql / available_sql strings must use
the common Spark-SQL ∩ DuckDB subset (CASE/COALESCE/NULLIF/LEAST/
GREATEST/ABS/POWER/ISNAN, arithmetic, comparisons). ``score_sql`` may
reference the materialized raw column via the ``{raw}`` placeholder.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Indicator:
    """One scored metric.

    Either (healthy, distress[, invert]) for linear interpolation
    (F2 — 990.py:736-769), or an explicit ``score_sql`` for piecewise /
    binary scores (F3/F4 — e.g. program_revenue_ratio 990.py:905-915).
    """

    name: str
    weight: float
    raw_sql: str | None = None
    healthy: float | None = None
    distress: float | None = None
    invert: bool = False
    score_sql: str | None = None
    available_sql: str | None = None  # boolean; unavailable -> NULL score

    def __post_init__(self) -> None:
        has_interp = self.healthy is not None and self.distress is not None
        if has_interp == (self.score_sql is not None):
            raise ValueError(
                f"indicator {self.name!r}: exactly one of (healthy+distress) "
                "or score_sql must be given"
            )
        if has_interp and self.raw_sql is None:
            raise ValueError(f"indicator {self.name!r}: interp needs raw_sql")


@dataclass(frozen=True)
class Domain:
    name: str
    weight: float
    indicators: tuple[Indicator, ...]


@dataclass(frozen=True)
class ScoringSpec:
    """A full scoring model.

    ``entity_cols`` are passthrough identity columns; ``min_indicators``
    is the A9 gate (composite -> NULL when too few indicators scored,
    ipeds.py:957-960). Category bands follow 990.py:1201-1214.
    """

    name: str
    domains: tuple[Domain, ...]
    entity_cols: tuple[str, ...]
    min_indicators: int = 0
    category_bands: tuple[tuple[float, str], ...] = (
        (20.0, "Healthy"),
        (40.0, "Low Risk"),
        (60.0, "Moderate Risk"),
        (80.0, "High Risk"),
    )
    category_top: str = "Severe Distress"
    category_null: str = "Insufficient Data"
    keep_raws: bool = True
    # optional per-domain post-aggregation adjustment, e.g. the IPEDS
    # enrollment cliff multiplier (ipeds_v5.py:1199-1203): SQL template
    # with a {domain} placeholder for the unadjusted domain score; the
    # adjusted value feeds the composite.
    domain_adjust: tuple[tuple[str, str], ...] = ()
    # expose composite_unrounded in the result projection so pipelines
    # can apply post-composite logic (floors) and re-round/categorize.
    keep_composite_unrounded: bool = False

    @property
    def indicator_count(self) -> int:
        return sum(len(d.indicators) for d in self.domains)

    def validate_weights(self, tol: float = 1e-9) -> None:
        """Domain weights must sum to 1 (parity: ipeds_v5.py:261-262)."""
        total = sum(d.weight for d in self.domains)
        if abs(total - 1.0) > tol:
            raise ValueError(f"domain weights sum to {total}, expected 1.0")
