"""Declarative predicate builder (SURVEY.md §2.2 P9).

The reference's map UI composes compound interactive filters — source,
type, risk tier, score threshold, binary flags, acreage minimum, with
a closed-toggle override (master_map2.html:726-768). Engine-side that
is a filter SPEC compiled to one Column, so a serving layer can pass
user selections straight through without string-templating SQL.

Spec grammar (dict): each key is a column name, each value one of
  {"eq": v} | {"in": [v, ...]} | {"contains": s}
  {"gte": v} | {"lte": v} | {"between": [lo, hi]}
  {"not_null": True} | {"is_null": True} | {"flag": True}
plus the reserved key "_any_of": [spec, ...] for OR groups and
"_unless": spec for an override that bypasses the rest (the map's
"show closed anyway" toggle).
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.functions.scalar import flag_parse


def _leaf(col: str, cond: Mapping[str, Any]) -> Column:
    c = F.col(col)
    out: Column | None = None

    def conj(x: Column) -> None:
        nonlocal out
        out = x if out is None else (out & x)

    if "eq" in cond:
        conj(c == F.lit(cond["eq"]))
    if "in" in cond:
        conj(c.isin(list(cond["in"])))
    if "contains" in cond:
        conj(c.contains(cond["contains"]))
    if "gte" in cond:
        conj(c >= F.lit(cond["gte"]))
    if "lte" in cond:
        conj(c <= F.lit(cond["lte"]))
    if "between" in cond:
        lo, hi = cond["between"]
        conj(c.between(F.lit(lo), F.lit(hi)))
    if cond.get("not_null"):
        conj(c.isNotNull())
    if cond.get("is_null"):
        conj(c.isNull())
    if cond.get("flag"):
        conj(flag_parse(c))
    if out is None:
        raise ValueError(f"empty condition for column {col!r}: {cond!r}")
    return out


def build_predicate(spec: Mapping[str, Any]) -> Column:
    """Compile a filter spec to a single boolean Column."""
    parts: list[Column] = []
    for key, cond in spec.items():
        if key == "_unless" or key == "_any_of":
            continue
        parts.append(_leaf(key, cond))
    if "_any_of" in spec:
        group: Column | None = None
        for sub in spec["_any_of"]:
            p = build_predicate(sub)
            group = p if group is None else (group | p)
        if group is not None:
            parts.append(group)
    base = parts[0] if parts else F.lit(True)
    for p in parts[1:]:
        base = base & p
    if "_unless" in spec:
        base = base | build_predicate(spec["_unless"])
    return base
