"""Source-dialect layer (SURVEY.md §2.1 S1-S6, S8; §1.3).

The reference ingests three 990 filing dialects and year-prefixed IPEDS
CSVs by probing headers, renaming to canonical fields, and unioning
years (990.py:657-717 _load_filing_type; ipeds.py:470-501
_build_column_map). Here the same mechanics are driver-side metadata
work that compiles to a projected scan — resolution never runs per-row:

- probe_header    (S2): header-only scan -> column list
- resolve_columns (P2): stable fuzzy search with exclude lists -> map
- load_csv_standardized (S1/S3/P1): encoding-aware scan projected to
  canonical names (Catalyst prunes the scan to the mapped columns)
- load_multi_year (S4/S5): existence-pruned per-year union with a year
  tag — the layout that becomes a year-partitioned table at scale
- write_json_export (S8): the serving extract
"""

from __future__ import annotations

import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def probe_header(spark: SparkSession, path: str, encoding: str = "ISO-8859-1") -> list[str]:
    """S2 — read only the header row to list raw columns (parity:
    pd.read_csv(nrows=0), 990.py:663)."""
    df = (
        spark.read.option("header", True)
        .option("encoding", encoding)
        .csv(path)
    )
    return list(df.columns)


def resolve_columns(
    header: Sequence[str],
    searches: Mapping[str, Sequence[str]],
    excludes: Mapping[str, Sequence[str]] | None = None,
) -> dict[str, str]:
    """P2 — fuzzy column resolution: for each canonical field, the
    FIRST header column (stable order) whose lowercase name contains
    every search term and no exclude term.

    Parity: IPEDS_VARIABLE_SEARCHES + _build_column_map
    (ipeds.py:209-286,470-501) — IPEDS headers embed year prefixes and
    survey codes, so exact names never work across years. Pure
    driver-side metadata; the result feeds a projected scan.
    """
    excludes = excludes or {}
    out: dict[str, str] = {}
    lower = [(c, c.lower()) for c in header]
    for field, terms in searches.items():
        bad = [t.lower() for t in excludes.get(field, ())]
        for raw, lc in lower:
            if all(t.lower() in lc for t in terms) and not any(b in lc for b in bad):
                out[field] = raw
                break
    return out


def load_csv_standardized(
    spark: SparkSession,
    path: str,
    rename_map: Mapping[str, str],
    encoding: str = "ISO-8859-1",
    numeric_cols: Sequence[str] = (),
) -> DataFrame:
    """S1/S3/P1 — encoding-aware CSV scan projected (and renamed) to
    canonical columns; ``numeric_cols`` get pandas-style tolerant
    numeric coercion (unparseable -> NULL, parity with
    pd.to_numeric(errors='coerce'), 990.py:691-697).

    rename_map: {raw_column: canonical_name}; missing raw columns are
    skipped (a dialect that lacks a field simply yields no column —
    the scoring layer's availability rules handle absence).
    """
    df = (
        spark.read.option("header", True)
        .option("encoding", encoding)
        .csv(path)
    )
    present = {raw: canon for raw, canon in rename_map.items() if raw in df.columns}
    out = df.select([F.col(raw).alias(canon) for raw, canon in present.items()])
    for c in numeric_cols:
        if c in out.columns:
            out = out.withColumn(
                c, F.regexp_replace(c, ",", "").try_cast("double")
            )
    return out


def load_multi_year(
    spark: SparkSession,
    paths_by_year: Mapping[int, str],
    rename_map: Mapping[str, str],
    encoding: str = "ISO-8859-1",
    numeric_cols: Sequence[str] = (),
) -> DataFrame:
    """S4/S5 — union the per-year files that exist, tagging each with
    its year (990.py:632-639,1474-1476). unionByName with
    allowMissingColumns bridges dialect drift between years; at scale
    this layout is a ``year``-partitioned table and the existence
    pruning becomes partition pruning.
    """
    frames: list[DataFrame] = []
    for year, path in sorted(paths_by_year.items()):
        if not os.path.exists(path):
            continue  # S5 existence pruning
        df = load_csv_standardized(spark, path, rename_map, encoding, numeric_cols)
        frames.append(df.withColumn("year", F.lit(int(year))))
    if not frames:
        raise FileNotFoundError("no input files exist for any requested year")
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def write_json_export(df: DataFrame, path: str) -> None:
    """S8 — JSON extract for the serving layer (master_standalone.py:
    143-151 embeds this payload into the map HTML)."""
    df.write.mode("overwrite").json(path)
