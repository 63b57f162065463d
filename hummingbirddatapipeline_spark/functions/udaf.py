"""UDAF surface (SURVEY.md §2.11): the reference needs no custom
aggregates (A6 compiles to expressions), but the engine exposes the
escape hatch — Arrow-batched GROUPED_AGG pandas UDFs — for aggregation
logic expressions can't reach. The canonical example mirrors A6:
a NULL-renormalizing weighted mean, equality-tested against the
expression form so the two paths are interchangeable.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean_udaf(values: pd.Series, weights: pd.Series) -> float:
    """GROUPED_AGG: sum(v*w)/sum(w over non-null v) — NULL values drop
    their weight from the denominator (A6 renormalization)."""
    mask = values.notna() & weights.notna()
    denom = weights[mask].sum()
    if denom == 0 or mask.sum() == 0:
        return None
    return float((values[mask] * weights[mask]).sum() / denom)


def weighted_mean_expr(value: Column, weight: Column) -> Column:
    """The expression (codegen, preferred) form of the same aggregate."""
    num = F.sum(
        F.when(value.isNotNull() & weight.isNotNull(), value * weight).otherwise(0.0)
    )
    den = F.sum(
        F.when(value.isNotNull() & weight.isNotNull(), weight).otherwise(0.0)
    )
    return F.when(den != 0, num / den)
