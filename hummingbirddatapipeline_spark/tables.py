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


# --- scale-adaptive scan fan-out (optimization guide §2.5: "input
# skew: one huge unsplittable file ... repartition immediately after
# the read"). Spark cannot split a parquet scan below row-group
# granularity, and the small test tables are written as ONE row group
# each — so every scan stage, and with it every zero-exchange
# scan→explode→hash→partial-agg pipeline in the engine, runs as a
# SINGLE task regardless of core count. When the file's effective
# split count cannot reach the core count, fan the scan out with one
# round-robin repartition of the (tiny) base table so the CPU-heavy
# per-row work parallelizes. At production scale the gate is never
# taken: a 100 TB table is thousands of row groups and
# bytes/maxPartitionBytes ≫ cores, so the plan is unchanged there.
# Round-robin (not hash) keeps the catalog's keyed-exchange plan
# contracts assertable: the fan-out node is RoundRobinPartitioning,
# never an Exchange hash/rangepartitioning.
#
# OPT-IN, not blanket: the full-suite A/B (OPTIMIZATION_r15.md) showed
# the exchange costs ~0.5-1 s per consuming query on this box's
# shuffle path, which swamps the win everywhere except pipelines whose
# scan stage does real per-row CPU (crypto hashes over grams, dense
# vector math, compiled scoring stacks). Callers whose scan stage is
# measured CPU-bound pass ``fanout=True``; everything else keeps the
# exchange-free scan.

# Skip fan-out below this size: broadcast dims (region, nation,
# supplier) stay single-task — 32 tasks for 25 rows is pure overhead.
_FANOUT_FLOOR_BYTES = 96 * 1024
# Never round-robin more than this through the exchange: above it a
# scan has real byte-parallelism and the guide's §2.4 "accidental
# repartition" warning applies.
_FANOUT_CEIL_BYTES = 2 * 1024**3
# Cost-aware width (r16, PERF_r15 scaling block): an unconditional
# ``cores``-wide fan-out over-shoots at high core counts — six fanned
# rows ran FASTER at 8 cores than 32 (ratios 0.64-0.84) because 32
# trivial slices of a sub-MB file cost more scheduling than they buy.
# Width now scales with file bytes (~one task per 32 KB of parquet,
# floor 16, cap cores): at 32 cores the 594 KB documents table fans to
# 18 tasks (the interleaved w16-vs-w32 sweep won or tied on every
# fanned row), the 10.8 MB lineitem keeps full width, and at <= 8
# cores nothing changes. Not a local-core-count constant: the bound is
# per-task slice size, and the gate itself never fires at production
# scale (est_tasks >= cores there).
_FANOUT_TARGET_BYTES_PER_TASK = 32 * 1024
_FANOUT_MIN_WIDTH = 16
# ``fanout="full"`` keeps the r15 cores-wide behavior for call sites
# whose per-row CPU is measured extreme relative to their bytes (the
# customer-side haversine / FS-agreement scans: byte-scaled width lost
# the interleaved A/B there while winning on every documents row).

_fanout_cache: dict[tuple[str, int, int], int] = {}

# inline_rows literal-size cap (ADVICE r15): the exploded literal wins
# only while the expression tree stays small — measured crossover vs
# createDataFrame sits between 16 and 256 rows depending on how often
# the frame re-executes, and the literal's cost grows super-linearly
# past it (12 s at 1024 rows, 35 s at 4096). 256 keeps every r15
# conversion site (1-31 actual rows at bench scale) on the literal
# path while bounding the worst case at the mask/dense vocab caps.
_INLINE_ROWS_MAX = 256


def inline_rows(
    spark: SparkSession, rows: list[tuple], schema: str
) -> DataFrame:
    """Tiny literal DataFrame as pure JVM expressions — a drop-in for
    ``spark.createDataFrame(rows, schema)`` on BOUNDED model/config
    state (quantile lists, <=4096-term vocabularies, singleton audit
    rows).

    ``createDataFrame`` over a Python list routes through
    ``sc.parallelize`` -> a ``Scan ExistingRDD`` whose every execution
    round-trips Python workers per partition (measured at sf0.1: the
    3-row quantile frame in sketch_quantile_error contributed a
    multi-second 32-task stage per pass; the SQL tab shows the node).
    Building the same rows as one exploded array-of-structs literal
    keeps the data in the plan: zero Python tasks, one local
    partition, and the frame broadcasts exactly like any LocalRelation.

    ``schema`` is the simple "name primitivetype, name primitivetype"
    DDL string the call sites already use; values must be plain Python
    scalars (None allowed). Parameterized or nested types
    (decimal(10,2), array<string>) are NOT supported — the simple
    comma/space parser would mis-split them, so they raise instead
    (ADVICE r15); use ``spark.createDataFrame`` for those.
    """
    fields = []
    for part in schema.split(","):
        toks = part.strip().split()
        if len(toks) != 2 or "(" in part or "<" in part:
            raise ValueError(
                "inline_rows supports only 'name primitivetype' schema "
                f"pairs; got {part.strip()!r} — use createDataFrame for "
                "parameterized/nested types"
            )
        fields.append((toks[0], toks[1]))
    for i, row in enumerate(rows):
        # createDataFrame raises on arity mismatches; match that
        # instead of zip() silently dropping extra values (ADVICE r15)
        if len(row) != len(fields):
            raise ValueError(
                f"inline_rows row {i} has {len(row)} values for "
                f"{len(fields)} schema fields"
            )
    if not rows or len(rows) > _INLINE_ROWS_MAX:
        # Empty literal arrays can't carry the struct type, and LARGE
        # literals invert the trade (ADVICE r15, measured r16): the
        # ~3N-expression array-of-structs costs super-linear driver
        # analysis per pass once N reaches the vocab caps — 1024 rows
        # ≈ 12 s, 4096 ≈ 35 s per execution vs ~0.4 s for the classic
        # path — so both ends fall back to createDataFrame.
        return spark.createDataFrame(rows, schema)
    structs = [
        F.struct(
            *[
                F.lit(v).cast(dtype).alias(name)
                for v, (name, dtype) in zip(row, fields)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("__r"))
        .select(*[F.col(f"__r.{name}") for name, _ in fields])
    )


def _parse_bytes(raw: str) -> int:
    s = raw.strip().lower()
    mult = 1
    for suf, m in (
        ("kb", 1024), ("mb", 1024**2), ("gb", 1024**3),
        ("k", 1024), ("m", 1024**2), ("g", 1024**3), ("b", 1),
    ):
        if s.endswith(suf):
            s, mult = s[: -len(suf)], m
            break
    return int(float(s) * mult)


def _fanout_partitions(
    spark: SparkSession, path: str, full: bool = False
) -> int:
    """Partitions to round-robin a fresh scan into, or 0 for no-op.

    0 unless the file is splittable into fewer tasks than cores —
    judged by BOTH the byte-based split count (maxPartitionBytes) and
    the parquet row-group count (the hard splittability bound). Width
    is byte-scaled (see module comment); ``full`` pins it at the core
    count for measured CPU-extreme sites."""
    override = os.environ.get("SPARK_GRAFT_FANOUT")
    if override is not None and override.isdigit():
        return int(override)  # 0 disables; N forces N (A/B harness)
    try:
        size = os.path.getsize(path)
    except OSError:
        return 0
    if not (_FANOUT_FLOOR_BYTES <= size <= _FANOUT_CEIL_BYTES):
        return 0
    cores = spark.sparkContext.defaultParallelism
    key = (path, size, cores, full)
    cached = _fanout_cache.get(key)
    if cached is not None:
        return cached
    split = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    est_tasks = max(1, -(-size // max(split, 1)))
    try:  # row groups bound real splittability tighter than bytes do
        import pyarrow.parquet as pq

        est_tasks = min(est_tasks, pq.ParquetFile(path).metadata.num_row_groups)
    except Exception:
        pass
    if est_tasks >= cores:
        n = 0
    elif full:
        n = cores
    else:
        n = min(
            cores,
            max(_FANOUT_MIN_WIDTH, size // _FANOUT_TARGET_BYTES_PER_TASK),
        )
    _fanout_cache[key] = n
    return n


def load(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    fanout: bool | str = False,
) -> DataFrame:
    """Load one canonical table as a DataFrame.

    ``events.ts`` is normalized to BIGINT epoch nanos whatever the
    parquet encoding (see ``_events_ts_to_nanos``); event time stays
    integer epoch arithmetic — timezone-proof by construction.

    With ``fanout=True``, a scan whose file cannot split into at least
    ``defaultParallelism`` tasks is fanned out with one round-robin
    repartition (see ``_fanout_partitions``); filters and column
    pruning still push through the repartition to the parquet scan.
    Opt in only where the scan stage is measured CPU-bound (see module
    comment).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        df = _events_ts_to_nanos(df)
    if fanout:
        n = _fanout_partitions(spark, path, full=(fanout == "full"))
        if n:
            df = df.repartition(n)
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
