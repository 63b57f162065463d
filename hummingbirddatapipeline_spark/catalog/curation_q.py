"""Curation-funnel catalog query: the full corpus-curation pipeline's
per-stage attrition, DuckDB-oracled end to end (language filter,
quality gate, exact fingerprint dedup, greedy near-dup drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.pipelines.curation import curate_corpus
from hummingbirddatapipeline_spark.tables import load

_DUCK_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')"
)
_DUCK_TOKS_CASED = (
    "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"
)

# quality formula identical to catalog/text_q.text_quality's oracle
_QUALITY = f"""
  ROUND(CAST(
    (CASE WHEN len({_DUCK_TOKS_CASED}) >= 20 THEN 1.0
          WHEN len({_DUCK_TOKS_CASED}) >= 5 THEN 0.5 ELSE 0.0 END) * 0.4
    + (CASE WHEN COALESCE(
          (length(regexp_replace(text, '\\s+', '', 'g'))
           - length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')))
          / NULLIF(length(regexp_replace(text, '\\s+', '', 'g')), 0), 0) <= 0.2
        THEN 1.0 ELSE 0.0 END) * 0.2
    + (CASE WHEN COALESCE(
          len(list_filter({_DUCK_TOKS},
              t -> t IN ('the','and','of','to','a','in','is','that','for','it')))
          / NULLIF(len({_DUCK_TOKS}), 0), 0) >= 0.05
        THEN 1.0 ELSE 0.0 END) * 0.2
    + (CASE WHEN COALESCE(
          list_sum(list_transform({_DUCK_TOKS_CASED}, t -> length(t)))
          / NULLIF(len({_DUCK_TOKS_CASED}), 0), 0) BETWEEN 2.0 AND 12.0
        THEN 1.0 ELSE 0.0 END) * 0.2
    AS DOUBLE), 2)
"""


@query(
    "curation_funnel",
    oracle=f"""
    WITH lang_kept AS (
      SELECT * FROM documents WHERE lang = 'en'
    ),
    quality_kept AS (
      SELECT * FROM lang_kept WHERE {_QUALITY} >= 0.6
    ),
    fp AS (
      SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
      FROM quality_kept
    ),
    exact_kept AS (
      SELECT fp.* FROM fp
      JOIN (SELECT f, MIN(doc_id) AS doc_id FROM fp GROUP BY f) k
      ON fp.f = k.f AND fp.doc_id = k.doc_id
    ),
    tok AS (
      SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS w FROM exact_kept
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    near AS (
      SELECT DISTINCT p.id_b AS doc_id
      FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.id_a
      JOIN sizes sb ON sb.doc_id = p.id_b
      WHERE inter / (sa.n + sb.n - inter) >= 0.85
    ),
    clean AS (
      SELECT * FROM exact_kept WHERE doc_id NOT IN (SELECT doc_id FROM near)
    )
    SELECT 'input' AS stage, COUNT(*) AS n FROM documents
    UNION ALL SELECT 'lang_kept', COUNT(*) FROM lang_kept
    UNION ALL SELECT 'quality_kept', COUNT(*) FROM quality_kept
    UNION ALL SELECT 'exact_deduped', COUNT(*) FROM exact_kept
    UNION ALL SELECT 'near_deduped', COUNT(*) FROM clean
    ORDER BY stage
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    _, stats = curate_corpus(
        docs, langs=("en",), min_quality=0.6, jaccard_threshold=0.85
    )
    return stats
