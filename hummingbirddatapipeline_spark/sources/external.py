"""Quarantined external-call source pattern (SURVEY.md §2.1 S9/S10).

The reference's acreage scraper interleaves web search, page fetches,
politeness delays, retries, and an append-only checkpointed sink
(chat_acreage_bot.py:44-53,497-505,537-627,816-837). The engine keeps
that entire class of operator OUT of the correctness-tested core and
behind one pattern: ``mapInPandas`` with a rate limiter and bounded
retries, where the fetch callable is injected — tests and offline runs
pass a deterministic fake; production passes a real HTTP client. The
human-in-the-loop auto-clicker (auto_clicker.py) disappears: a headless
source needs no keypresses.

Scale/politeness notes: ``repartition(n_workers)`` bounds global
concurrency to n_workers tasks; the per-task limiter enforces
``min_interval_s`` between calls, so cluster-wide request rate is
n_workers / min_interval_s regardless of data volume. Resume is the
batch anti-join (J8) — rerun skips keys already in the sink.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

FETCH_RESULT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("status", StringType()),   # ok | error | retries_exhausted
        StructField("payload", StringType()),
    ]
)

FetchFn = Callable[[str], str]


def fetch_enrichment(
    df: DataFrame,
    key_col: str,
    fetch: FetchFn,
    n_workers: int = 4,
    min_interval_s: float = 0.0,
    max_retries: int = 3,
    retry_backoff_s: float = 0.0,
) -> DataFrame:
    """Rate-limited, retried external enrichment over one key column.

    ``fetch(key) -> payload`` may raise; failures retry up to
    ``max_retries`` with ``retry_backoff_s`` sleeps, then surface as
    status='retries_exhausted' rows (never silently dropped — parity
    with the scraper's NOT_FOUND results, chat_acreage_bot.py:939-957).
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_call = 0.0
        for pdf in batches:
            rows = []
            for key in pdf[key_col].astype(str):
                wait = min_interval_s - (time.monotonic() - last_call)
                if wait > 0:
                    time.sleep(wait)
                status, payload = "error", None
                for attempt in range(max_retries):
                    try:
                        last_call = time.monotonic()
                        payload = fetch(key)
                        status = "ok"
                        break
                    except Exception as exc:  # noqa: BLE001 — external I/O boundary
                        payload = str(exc)
                        status = "retries_exhausted"
                        if retry_backoff_s and attempt < max_retries - 1:
                            time.sleep(retry_backoff_s)
                rows.append((key, status, payload))
            yield pd.DataFrame(rows, columns=["key", "status", "payload"])

    return (
        df.select(key_col)
        .distinct()
        .repartition(n_workers)
        .mapInPandas(_run, FETCH_RESULT_SCHEMA)
    )


def resume_pending(work: DataFrame, done: DataFrame, key_col: str) -> DataFrame:
    """J8 — batch resume: keep work items whose key is not in the sink."""
    return work.join(done.select(key_col), key_col, "left_anti")
