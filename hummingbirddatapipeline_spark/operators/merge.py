"""Conditional upsert + audit changelog (SURVEY.md §2.8 F17, §2.7 J7/U1).

The reference's acreage merge updates master cells only when the target
is empty or the incoming confidence outranks the existing one, writes an
old/new changelog row for every changed cell, and guarantees idempotent
re-runs (master_acreage_merge.py:5-12,119-142,192-215). Here that
contract is two pure DataFrame ops: ``conditional_upsert`` returns the
NEW master (inputs never mutated — the versioned-output answer to the
reference's in-place CSV overwrite) and ``upsert_changelog`` derives the
audit rows from the same join, so merged+changelog always agree.

At scale the updates side is entity-keyed and usually small relative to
master, but it GROWS with ingest — so no static broadcast hint: AQE's
size-gated dynamic broadcast picks the broadcast join whenever the
batch fits and degrades to a shuffled join past the ceiling instead of
throwing at 8 GB. On Delta this becomes
``MERGE INTO ... WHEN MATCHED AND <rule> THEN UPDATE`` with table
history as the changelog; plain parquet gets the join+overwrite here.

Dedup-append (J7+U1, append_priorities.py:222-247) rides along:
``dedup_append`` = anti-join on a composite key, then unionByName.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# confidence ladder (master_acreage_merge.py:119-127): higher wins
DEFAULT_CONFIDENCE_RANK: dict[str, int] = {"LOW": 1, "MEDIUM": 2, "HIGH": 3}


def confidence_rank_col(conf: Column, rank: dict[str, int]) -> Column:
    """Map a confidence label column to its numeric rank (NULL/unknown -> 0)."""
    expr: Column = F.lit(0)
    for label, r in rank.items():
        expr = F.when(F.upper(conf) == label.upper(), F.lit(r)).otherwise(expr)
    return expr


def _should_update(old_val: Column, old_rank: Column, new_val: Column, new_rank: Column) -> Column:
    """F17 rule — update iff an update exists AND (target empty OR new
    confidence strictly outranks old). Never overwrite with NULL."""
    return new_val.isNotNull() & (old_val.isNull() | (new_rank > old_rank))


def conditional_upsert(
    master: DataFrame,
    updates: DataFrame,
    key: str,
    value_col: str,
    confidence_col: str,
    rank: dict[str, int] | None = None,
) -> DataFrame:
    """Return a new master with ``value_col``/``confidence_col`` updated
    per the F17 rule; all other columns and rows pass through unchanged.

    Idempotent: re-applying the same updates changes nothing (equal
    rank never overwrites).
    """
    rank = DEFAULT_CONFIDENCE_RANK if rank is None else rank
    upd = updates.select(
        F.col(key).alias("__u_key"),
        F.col(value_col).alias("__u_val"),
        F.col(confidence_col).alias("__u_conf"),
    )
    j = master.join(upd, master[key] == upd["__u_key"], "left")
    old_rank = confidence_rank_col(F.col(confidence_col), rank)
    new_rank = confidence_rank_col(F.col("__u_conf"), rank)
    do = _should_update(F.col(value_col), old_rank, F.col("__u_val"), new_rank)
    return (
        j.withColumn(
            "__new_val", F.when(do, F.col("__u_val")).otherwise(F.col(value_col))
        )
        .withColumn(
            "__new_conf", F.when(do, F.col("__u_conf")).otherwise(F.col(confidence_col))
        )
        .drop(value_col, confidence_col, "__u_key", "__u_val", "__u_conf")
        .withColumnRenamed("__new_val", value_col)
        .withColumnRenamed("__new_conf", confidence_col)
    )


def upsert_changelog(
    master: DataFrame,
    updates: DataFrame,
    key: str,
    value_col: str,
    confidence_col: str,
    rank: dict[str, int] | None = None,
) -> DataFrame:
    """Audit rows for the cells ``conditional_upsert`` would change:
    (key, column, old_value, new_value, old_confidence, new_confidence).

    Parity: master_acreage_merge.py:192-215,244-247. Running the
    changelog after applying the same upsert yields zero rows — the
    idempotency check in the reference's contract.
    """
    rank = DEFAULT_CONFIDENCE_RANK if rank is None else rank
    upd = updates.select(
        F.col(key).alias("__u_key"),
        F.col(value_col).alias("__u_val"),
        F.col(confidence_col).alias("__u_conf"),
    )
    j = master.join(upd, master[key] == upd["__u_key"], "inner")
    old_rank = confidence_rank_col(F.col(confidence_col), rank)
    new_rank = confidence_rank_col(F.col("__u_conf"), rank)
    do = _should_update(F.col(value_col), old_rank, F.col("__u_val"), new_rank)
    return j.filter(do).select(
        F.col(key),
        F.lit(value_col).alias("column_name"),
        F.col(value_col).cast("string").alias("old_value"),
        F.col("__u_val").cast("string").alias("new_value"),
        F.col(confidence_col).alias("old_confidence"),
        F.col("__u_conf").alias("new_confidence"),
    )


def dedup_append(
    existing: DataFrame, new: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """J7+U1 — append only rows whose composite key is absent from
    ``existing`` (append_priorities.py:222-247). NULL-safe key equality
    (the reference compares stringified keys)."""
    cond = [new[k].eqNullSafe(existing[k]) for k in key_cols]
    fresh = new.join(existing.select(*key_cols), cond, "left_anti")
    return existing.unionByName(fresh, allowMissingColumns=True)


def apply_cdc(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str,
    tiebreak_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC changelog (upserts + delete tombstones) to produce
    the current snapshot: for each key, the LATEST change by
    (``ts_col``, ``tiebreak_col``) wins; if that change is a delete,
    the key vanishes. The batch replacement for Delta ``MERGE INTO``
    over a Debezium-shaped feed — composes with the repo's
    write-and-swap sink exactly like ``upsert_changelog``.

    One shuffle on the key serves the per-key argmax
    (``max(struct(ts, tiebreak, *row))`` — no per-key sort, map-side
    combined); the tombstone filter is a projection on the winner.
    Deterministic for any changelog where (key, ts, tiebreak) is
    unique — enforce upstream or pass a unique tiebreak.
    """
    from pyspark.sql import functions as F

    payload = [
        c for c in changes.columns
        if c not in {*key_cols, ts_col, op_col, tiebreak_col}
    ]
    winner = changes.groupBy(*key_cols).agg(
        F.max(
            F.struct(
                F.col(ts_col).alias("__ts"),
                F.col(tiebreak_col).alias("__tb"),
                F.col(op_col).alias("__op"),
                *[F.col(c).alias(c) for c in payload],
            )
        ).alias("__w")
    )
    return (
        winner.filter(F.col("__w.__op") != delete_op)
        .select(
            *key_cols,
            F.col("__w.__ts").alias(ts_col),
            F.col("__w.__tb").alias(tiebreak_col),
            *[F.col(f"__w.{c}").alias(c) for c in payload],
        )
    )
