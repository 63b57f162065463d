"""Data-quality expectations (Deequ/Great-Expectations shape, native
Spark): declare per-table constraints, get one verdict row per check.

Scale design: all row-level checks compile into ONE aggregation pass
over the table (a conditional-count per check — map-side combined, one
tiny result row), then unpivot to the long verdict form; referential
checks are left-anti joins that only ship violations. No UDFs, no
second scan per check — adding a check is adding a column, not a job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """``checks`` maps check name -> VIOLATION predicate (true = row
    fails). Returns (check_name, n_rows, n_violations, passed), one row
    per check, computed in a single scan."""
    aggs = [F.count("*").alias("__n")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"__v_{name}")
        for name, cond in checks.items()
    ]
    wide = df.agg(*aggs)
    rows = None
    for name in checks:
        row = wide.select(
            F.lit(name).alias("check_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v_{name}").alias("n_violations"),
            (F.col(f"__v_{name}") == 0).alias("passed"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def check_foreign_key(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Referential-integrity check: count child rows (with non-null
    keys) lacking a parent. Anti-join — only violations move."""
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)),
            child_key,
            "left_anti",
        )
        .agg(F.count("*").alias("n_violations"))
    )
    n = child.agg(F.count("*").alias("n_rows"))
    label = name or f"fk_{child_key}_references_{parent_key}"
    return n.crossJoin(orphans).select(
        F.lit(label).alias("check_name"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
