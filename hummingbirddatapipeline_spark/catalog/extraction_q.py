"""Extraction/classification catalog queries (F9-F12, the acreage-bot
text-mining surface re-expressed engine-side and DuckDB-verified).

Numeric facts are synthesized into the document text deterministically
with the same SQL on both engines (the testdata corpus is plain word
soup), then mined back out with the multi-pattern extraction bank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.functions.extraction import (
    before_context_contains,
    best_match_per_doc,
    extract_all,
    keyword_classify,
)
from hummingbirddatapipeline_spark.tables import load

# dirty corpus: append facts for even docs (acreage + founding year),
# odd docs get only a year; shared Spark/DuckDB SQL dialect
_CORPUS_SQL = (
    "SELECT doc_id, lang, n_chars, "
    "CASE WHEN doc_id % 2 = 0 THEN "
    "text || ' campus spans ' || CAST(doc_id % 997 AS STRING) "
    "|| ' acres total, built in ' || CAST(1900 + doc_id % 120 AS STRING) "
    "ELSE text || ' built in ' || CAST(1900 + doc_id % 120 AS STRING) END AS text "
    "FROM documents"
)

PATTERNS = (
    ("acreage", r"(\d+) acres", 3),
    ("founded_year", r"built in (\d{4})", 2),
)


@query(
    "extract_multi_pattern",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    acre AS (
      SELECT doc_id, 'acreage' AS match_type,
             UNNEST(regexp_extract_all(text, '(\\d+) acres', 1)) AS matched,
             3 AS priority
      FROM corpus
    ),
    yr AS (
      SELECT doc_id, 'founded_year' AS match_type,
             UNNEST(regexp_extract_all(text, 'built in (\\d{{4}})', 1)) AS matched,
             2 AS priority
      FROM corpus
    )
    SELECT * FROM acre UNION ALL SELECT * FROM yr
    ORDER BY doc_id, match_type, matched
    """,
)
def extract_multi_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    corpus = spark.sql(_CORPUS_SQL)
    out = extract_all(corpus, "text", PATTERNS, keep_cols=("doc_id",))
    return out


@query(
    "extract_best_candidate",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    acre AS (
      SELECT doc_id, 'acreage' AS match_type,
             UNNEST(regexp_extract_all(text, '(\\d+) acres', 1)) AS matched,
             3 AS priority
      FROM corpus
    ),
    yr AS (
      SELECT doc_id, 'founded_year' AS match_type,
             UNNEST(regexp_extract_all(text, 'built in (\\d{{4}})', 1)) AS matched,
             2 AS priority
      FROM corpus
    ),
    allm AS (SELECT * FROM acre UNION ALL SELECT * FROM yr),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id
        ORDER BY priority DESC, CAST(matched AS BIGINT) DESC
      ) AS rn FROM allm
    )
    SELECT doc_id, match_type, matched, priority
    FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
)
def extract_best_candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/F12 — best match per doc by (pattern priority, numeric value)."""
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    corpus = spark.sql(_CORPUS_SQL)
    matches = extract_all(corpus, "text", PATTERNS, keep_cols=("doc_id",))
    return best_match_per_doc(matches, "doc_id")


@query(
    "extract_context_window",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    m AS (
      SELECT doc_id, text,
             regexp_extract(text, '(\\d+) acres', 1) AS matched
      FROM corpus WHERE doc_id % 2 = 0
    ),
    pos AS (
      SELECT doc_id, matched, instr(text, matched) AS p, text FROM m
    )
    SELECT doc_id, matched,
           COALESCE(
             CASE WHEN p > 0 THEN
               contains(substring(text, GREATEST(p - 40, 1),
                        GREATEST(p - GREATEST(p - 40, 1), 0)), 'campus')
             END, FALSE) AS campus_context
    FROM pos ORDER BY doc_id
    """,
)
def extract_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 — ±width context check around the match (here: 'campus'
    within 40 chars before the acreage figure)."""
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    corpus = spark.sql(_CORPUS_SQL).filter(F.col("doc_id") % 2 == 0)
    m = corpus.select(
        "doc_id",
        "text",
        F.regexp_extract("text", r"(\d+) acres", 1).alias("matched"),
    )
    return m.select(
        "doc_id",
        "matched",
        before_context_contains(
            F.col("text"), F.col("matched"), "campus", 40
        ).alias("campus_context"),
    )


_CASCADE = (
    ("engine_doc", ("spark", "query", "scan")),
    ("sales_doc", ("customer", "order")),
    ("ml_doc", ("vector", "embedding")),
)
_PRIORITY_SQL = (
    "CASE WHEN detected_type = 'engine_doc' AND lang = 'en' THEN 'CRITICAL' "
    "WHEN detected_type = 'engine_doc' THEN 'HIGH' "
    "WHEN n_chars >= 800 THEN 'MEDIUM' ELSE 'LOW' END"
)


@query(
    "classify_and_prioritize",
    oracle=f"""
    WITH typed AS (
      SELECT doc_id, lang, n_chars,
             CASE WHEN contains(text, 'spark') OR contains(text, 'query')
                       OR contains(text, 'scan') THEN 'engine_doc'
                  WHEN contains(text, 'customer') OR contains(text, 'order')
                       THEN 'sales_doc'
                  WHEN contains(text, 'vector') OR contains(text, 'embedding')
                       THEN 'ml_doc'
                  ELSE 'general' END AS detected_type
      FROM documents
    ),
    prioritized AS (
      SELECT *, {_PRIORITY_SQL} AS priority FROM typed
    )
    SELECT detected_type, priority, COUNT(*) AS n
    FROM prioritized
    GROUP BY detected_type, priority
    ORDER BY detected_type, priority
    """,
)
def classify_and_prioritize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11+F3 — keyword-cascade classification then priority bucketing
    (append_priorities.py:27-102), aggregated to class counts."""
    docs = load(spark, sf_dir, "documents")
    typed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        keyword_classify(F.col("text"), _CASCADE, "general").alias("detected_type"),
    )
    prioritized = typed.withColumn("priority", F.expr(_PRIORITY_SQL))
    return (
        prioritized.groupBy("detected_type", "priority")
        .agg(F.count("*").alias("n"))
    )
