"""hummingbirddatapipeline_spark — a PySpark-native analytics/ETL engine.

A ground-up Spark rebuild of the capabilities of
``apriest143/hummingbirddatapipeline`` (a single-machine pandas ETL +
scoring pipeline), re-expressed as declarative DataFrame/SQL plans so
Catalyst/Tungsten handle optimization, and designed for 100 TB scale:

- relational operator catalog (scans, filters, joins incl. semi/anti/band,
  aggregations incl. NULL-renormalizing weighted averages, windows, reshape)
- a scoring DSL (threshold -> linear interpolation -> weighted
  NULL-renormalizing aggregation) that compiles to native Spark Columns
  AND to ANSI SQL (for differential testing against DuckDB)
- entity-resolution toolkit (normalized-name joins, alias passes,
  conditional upsert with changelog, MinHash fuzzy join)
- LLM-data-pipeline extensions: dedup (exact/MinHash-LSH/SimHash/ngram
  Jaccard), embedding similarity search, text analysis, multimodal columns
- Structured Streaming equivalents of the reference's incremental contracts
"""

__version__ = "0.1.0"
