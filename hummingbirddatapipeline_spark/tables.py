"""Canonical table loaders for the driver's parquet test tables.

Mirrors the reference's load layer (CSV scan + header probe + projected
read — ``Hummingbird_Master_engine_990.py:657-717``) but Spark-first:
parquet scans get column pruning and predicate pushdown from Catalyst
for free, so loaders stay declarative. At 100 TB these tables would be
year/date-partitioned parquet or Delta; the API is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ``timestampdiff`` is pure wall-clock arithmetic on TIMESTAMP_NTZ —
# no session-timezone involvement — and matches DuckDB's epoch_ns()
# interpretation of a naive timestamp (wall clock == UTC) exactly.
EVENTS_TS_NANOS_NTZ_EXPR = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    " * CAST(1000 AS BIGINT)"
)


def _events_ts_to_nanos(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to BIGINT epoch nanoseconds.

    The test parquet has shipped ``ts`` as TIMESTAMP(NANOS) (read as
    BIGINT via the legacy conf), as TIMESTAMP_NTZ micros, and could ship
    it as an instant TIMESTAMP; downstream event-time code is all
    integer epoch arithmetic (timezone-proof), so every physical
    encoding converges here.
    """
    t = df.schema["ts"].dataType
    if isinstance(t, LongType):
        return df
    if isinstance(t, TimestampNTZType):
        expr = EVENTS_TS_NANOS_NTZ_EXPR
    else:  # TimestampType: an absolute instant
        expr = "unix_micros(ts) * CAST(1000 AS BIGINT)"
    return df.withColumn("ts", F.expr(expr))


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table as a DataFrame.

    ``events.ts`` is normalized to BIGINT epoch nanos whatever the
    parquet encoding (see ``_events_ts_to_nanos``); event time stays
    integer epoch arithmetic — timezone-proof by construction.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _events_ts_to_nanos(df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every canonical table present in ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` can use them."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_versioned(df: DataFrame, base_dir: str) -> str:
    """Versioned write-and-swap: the engine's answer to the reference's
    in-place master CSV overwrite (master_acreage_merge.py:33;
    ipeds.py:1150-1151 share one in/out path).

    Writes ``base_dir/v{N}`` (N = 1 + latest existing) and then points
    ``base_dir/_latest`` at it, so readers of the previous version are
    never disturbed and every historical master remains auditable. On
    Delta this collapses to table versions; on plain parquet this
    layout IS the history.
    """
    os.makedirs(base_dir, exist_ok=True)
    versions = [
        int(d[1:])
        for d in os.listdir(base_dir)
        if d.startswith("v") and d[1:].isdigit()
    ]
    n = max(versions, default=0) + 1
    path = os.path.join(base_dir, f"v{n}")
    df.write.mode("error").parquet(path)
    with open(os.path.join(base_dir, "_latest"), "w") as f:
        f.write(f"v{n}")
    return path


def read_latest_version(spark: SparkSession, base_dir: str) -> DataFrame:
    with open(os.path.join(base_dir, "_latest")) as f:
        v = f.read().strip()
    return spark.read.parquet(os.path.join(base_dir, v))


def write_year_partitioned(df: DataFrame, path: str, year_col: str = "year") -> None:
    """Year-partitioned layout for entity-year long tables — the at-rest
    shape that turns the reference's per-year file pruning
    (990.py:1474-1476) into automatic partition pruning at 100 TB."""
    df.write.mode("overwrite").partitionBy(year_col).parquet(path)
