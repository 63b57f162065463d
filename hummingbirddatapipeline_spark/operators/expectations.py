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


def profile_compare(
    ref: DataFrame,
    cur: DataFrame,
    numeric_cols: list[str],
) -> DataFrame:
    """Column-profile drift report between two snapshots of the same
    table (training window vs serving window, yesterday vs today):
    one row per profiled column with null rate, distinct count, min,
    max, and 6dp mean for BOTH sides plus the deltas — the schema- and
    distribution-drift monitor that runs before PSI digs into a single
    column.

    One aggregate pass PER SIDE computes every column's stats
    simultaneously (count/min/max/sum map-side combined;
    count_distinct exact — swap in approx_count_distinct at extreme
    cardinalities, the report contract is unchanged), then the two
    single-row frames unpivot to one row per column and join — no
    per-column jobs, no shuffle of either table beyond the aggregates.
    Stats are exact integers or 6dp-rounded doubles, so the report is
    reproducible in ANSI SQL.
    """
    from pyspark.sql import functions as F

    def side(df: DataFrame, tag: str) -> DataFrame:
        aggs = []
        for c in numeric_cols:
            aggs += [
                F.count("*").alias(f"{c}__n"),
                F.count(c).alias(f"{c}__nn"),
                F.count_distinct(c).alias(f"{c}__nd"),
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
                F.round(F.avg(c), 6).alias(f"{c}__mean"),
            ]
        one = df.agg(*aggs)
        per_col = F.array(
            *[
                F.struct(
                    F.lit(c).alias("column_name"),
                    # empty side -> NULL rate, not ANSI divide-by-zero
                    F.when(
                        F.col(f"{c}__n") > 0,
                        F.round(
                            (F.col(f"{c}__n") - F.col(f"{c}__nn"))
                            / F.col(f"{c}__n"),
                            6,
                        ),
                    ).alias(f"{tag}_null_rate"),
                    F.col(f"{c}__nd").alias(f"{tag}_n_distinct"),
                    F.col(f"{c}__min").alias(f"{tag}_min"),
                    F.col(f"{c}__max").alias(f"{tag}_max"),
                    F.col(f"{c}__mean").alias(f"{tag}_mean"),
                )
                for c in numeric_cols
            ]
        )
        return one.select(F.explode(per_col).alias("s")).select("s.*")

    r = side(ref, "ref")
    c = side(cur, "cur")
    return r.join(c, "column_name").select(
        "column_name",
        "ref_null_rate",
        "cur_null_rate",
        F.round(F.col("cur_null_rate") - F.col("ref_null_rate"), 6).alias(
            "null_rate_delta"
        ),
        "ref_n_distinct",
        "cur_n_distinct",
        "ref_min",
        "cur_min",
        "ref_max",
        "cur_max",
        "ref_mean",
        "cur_mean",
        F.round(F.col("cur_mean") - F.col("ref_mean"), 6).alias(
            "mean_delta"
        ),
    )


def embedding_coverage(
    docs: DataFrame,
    vectors: DataFrame,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    strata_col: str = "source",
) -> DataFrame:
    """Bidirectional embedding-coverage report — the referential-
    integrity DQ a multimodal/embedding store runs before any
    similarity work (the one-directional cousin is
    :func:`check_foreign_key`; this is the per-source OPERATIONAL
    view): for every source, how many docs exist, how many have a
    vector, how many are missing one, and the coverage fraction;
    vectors with no document at all surface as one ``__orphan__`` row
    (n_vec_only > 0 there and only there).

    Returns (source, n_docs, n_matched, n_doc_only, n_vec_only,
    coverage) — exact BIGINTs + one 6dp division (0.0 for the orphan
    row, which has no doc denominator).

    Scale shape: both sides project to SKINNY id(+source) columns
    before ONE full-outer equi-join on the id, then one hash
    aggregate — text and vector payloads never move.
    """
    d = docs.select(
        F.col(doc_id_col).alias("__id"), F.col(strata_col).alias("__src")
    )
    v = vectors.select(F.col(vec_id_col).alias("__id"), F.lit(1).alias("__has_vec"))
    joined = d.join(v, "__id", "full_outer")
    agg = joined.groupBy(
        F.coalesce(F.col("__src"), F.lit("__orphan__")).alias("source")
    ).agg(
        F.sum(F.col("__src").isNotNull().cast("int"))
        .cast("long")
        .alias("n_docs"),
        F.sum(
            (F.col("__src").isNotNull() & F.col("__has_vec").isNotNull())
            .cast("int")
        )
        .cast("long")
        .alias("n_matched"),
        F.sum(
            (F.col("__src").isNotNull() & F.col("__has_vec").isNull())
            .cast("int")
        )
        .cast("long")
        .alias("n_doc_only"),
        F.sum(F.col("__src").isNull().cast("int"))
        .cast("long")
        .alias("n_vec_only"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_matched",
        "n_doc_only",
        "n_vec_only",
        F.when(
            F.col("n_docs") > 0,
            F.round(
                F.col("n_matched").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("coverage"),
    )
