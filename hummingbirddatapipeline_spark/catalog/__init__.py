"""Query catalog: named (PySpark query, DuckDB oracle SQL) pairs.

This is the engine's differential-test surface (SURVEY.md §5.1): every
SQL-expressible operator registers a PySpark implementation and an ANSI
SQL equivalent the driver runs in DuckDB over the same parquet tables.
Non-SQL-expressible operators register the query only (rows-only check).

Contract notes (driver: /root/repo/__spark_entry__.py):
- every computed column is aliased identically in both forms;
- float aggregates are rounded identically on both sides so the
  order-insensitive value hash is stable across engines;
- every ORDER BY ... LIMIT uses a total order (key tiebreak) so top-k
  is deterministic across engines.
"""

from __future__ import annotations

import functools
import weakref
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Prepared-plan cache: DataFrames are immutable logical plans, so a
# catalog query re-invoked on the same (session, sf_dir) can reuse the
# plan it already built. Plan construction is real driver cost — the
# big scoring specs spend ~0.5 s parsing ~300 selectExpr expressions
# JVM-side, plus parquet schema-read round trips — and it repeats on
# every warm invocation without this. Keyed weakly by session so a
# stopped session's plans are collectable.
_PLAN_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            per = _PLAN_CACHE.setdefault(spark, {})
            key = (name, sf_dir)
            df = per.get(key)
            if df is None:
                df = per[key] = fn(spark, sf_dir)
            return df

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def _load_modules() -> None:
    # Import for registration side effects. Keep alphabetical-ish; each
    # module covers one SURVEY.md §2 operator family.
    from hummingbirddatapipeline_spark.catalog import (  # noqa: F401
        curation_q,
        dedup_q,
        entity_q,
        events_q,
        extraction_q,
        multimodal_q,
        relational,
        sampling_q,
        scoring_q,
        serving_q,
        similarity_q,
        stream_q,
        temporal_q,
        text_q,
    )


_load_modules()
