"""Regex extraction bank (SURVEY.md §2.8 F9-F12, §2.11 UDTF surface).

The reference's AcreageExtractor runs ~10 regex patterns over fetched
page text, takes a ±150-char context window around each match, scores
candidates by pattern priority plus context-keyword hits, and keeps the
best (chat_acreage_bot.py:386-457,156-188,716-719). Here the same
shape is native expressions: ``regexp_extract_all`` per pattern ->
explode (the UDTF form) -> context via locate/substr -> score ->
``max_by`` best-pick. No Python UDFs, so the bank runs at scan speed
over 100 TB of documents.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_all(
    df: DataFrame,
    text_col: str,
    patterns: Sequence[tuple[str, str, int]],
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """F9 — run every (name, regex, priority) pattern over ``text_col``;
    one output row per match with the pattern name, captured group, and
    priority. UDTF-shaped: array of per-pattern match arrays, flattened
    and exploded."""
    def tagger(name: str, prio: int):
        # real closure, NOT a default-arg lambda: PySpark reads extra
        # lambda params as higher-order-function arguments
        def tag(m: Column) -> Column:
            return F.struct(
                F.lit(name).alias("match_type"),
                m.alias("matched"),
                F.lit(prio).alias("priority"),
            )

        return tag

    per_pattern = [
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(rx), 1), tagger(name, prio)
        )
        for name, rx, prio in patterns
    ]
    return df.select(
        *keep_cols,
        F.explode(F.flatten(F.array(*per_pattern))).alias("m"),
    ).select(*keep_cols, "m.match_type", "m.matched", "m.priority")


def before_context_contains(
    text: Column, matched: Column, keyword: str, width: int = 40
) -> Column:
    """F10 — true iff ``keyword`` appears in the ``width`` characters
    preceding the match's first occurrence. locate/substr only, so the
    same SQL runs on any engine."""
    p = F.instr(text, matched)  # 1-based; 0 when absent
    start = F.greatest(p - width, F.lit(1))
    ctx = F.when(p > 0, F.substring(text, start, F.greatest(p - start, F.lit(0))))
    return F.coalesce(ctx.contains(keyword), F.lit(False))


def keyword_classify(
    text: Column, cascade: Sequence[tuple[str, Sequence[str]]], default: str
) -> Column:
    """F11 — first-match-wins keyword cascade -> label
    (append_priorities.py:27-70; news classifier master_map2.html:798-826)."""
    expr: Column = F.lit(default)
    for label, keywords in reversed(list(cascade)):
        cond = F.lit(False)
        for kw in keywords:
            cond = cond | text.contains(kw)
        expr = F.when(cond, F.lit(label)).otherwise(expr)
    return expr


def best_match_per_doc(matches: DataFrame, key_col: str) -> DataFrame:
    """O2/F12 — keep the best-scored match per document:
    highest priority, then largest captured numeric value
    (chat_acreage_bot.py:716-719 best-candidate selection)."""
    return (
        matches.groupBy(key_col)
        .agg(
            F.max_by(
                F.struct("match_type", "matched", "priority"),
                F.struct(F.col("priority"), F.col("matched").cast("long")),
            ).alias("best")
        )
        .select(key_col, "best.match_type", "best.matched", "best.priority")
    )
