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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table as a DataFrame.

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark rejects by
    default; we read it as BIGINT nanos (legacy conf) and keep event
    time as integer epoch arithmetic — timezone-proof by construction.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every canonical table present in ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
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
