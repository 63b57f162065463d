"""Incremental aggregate maintenance: fold a new partition of data
into an existing rollup without recomputing history.

The 100 TB batch-ETL contract: daily data lands, the running rollup is
petabyte-derived, and recomputing it from raw is off the table. The
operator works on MERGEABLE partial states (counts and integer-unit
sums — the same algebra Spark's own partial aggregation uses), so

    merge(rollup(A), rollup(B)) == rollup(A ∪ B)

holds EXACTLY, not approximately; derived ratios (averages) are
recomputed from the merged states, never merged themselves (averaging
averages is the classic incremental-ETL bug).

This is the batch sibling of the streaming foreachBatch upsert
(streaming/core.py) and the mergeable-sketch heavy hitters
(catalog/events_q.py): same state-merge discipline, three execution
contexts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_rollups(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    count_cols: Sequence[str] = ("n_events",),
    sum_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge two rollups sharing (keys + count/sum state columns):
    union then re-sum per key. Counts and integer-unit sums are
    associative, so the result equals a from-scratch rollup of the
    combined input."""
    cols = list(keys) + list(count_cols) + list(sum_cols)
    merged = (
        a.select(cols)
        .unionByName(b.select(cols))
        .groupBy(list(keys))
        .agg(
            *[F.sum(c).alias(c) for c in count_cols],
            *[F.sum(c).alias(c) for c in sum_cols],
        )
    )
    return merged
