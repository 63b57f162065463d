"""Curation-funnel catalog query: the full corpus-curation pipeline's
per-stage attrition, DuckDB-oracled end to end (language filter,
quality gate, exact fingerprint dedup, greedy near-dup drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


@query(
    "curation_funnel_gated",
    oracle=f"""
    WITH RECURSIVE lang_kept AS (
      SELECT * FROM documents WHERE lang = 'en'
    ),
    quality_kept AS (
      SELECT * FROM lang_kept WHERE {_QUALITY} >= 0.6
    ),
    rep_toks AS (
      SELECT doc_id, length(text) AS chars, {_DUCK_TOKS_CASED} AS t
      FROM quality_kept
    ),
    rep_grams AS (
      SELECT doc_id, chars,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS g
      FROM rep_toks
    ),
    rep_per_gram AS (
      SELECT doc_id, chars, g, COUNT(*) AS c FROM rep_grams GROUP BY 1, 2, 3
    ),
    rep_frac AS (
      SELECT doc_id,
             FLOOR(MAX(length(g) * c) / NULLIF(CAST(MAX(chars) AS DOUBLE), 0.0)
                   * 1000000 + 0.5) / 1000000 AS top_frac
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY c DESC, length(g) DESC, g DESC) AS rn
        FROM rep_per_gram
      ) WHERE rn = 1 GROUP BY doc_id
    ),
    rep_kept AS (
      SELECT q.* FROM quality_kept q
      LEFT JOIN rep_frac r USING (doc_id)
      WHERE COALESCE(r.top_frac, 0.0) <= 0.20
    ),
    nll_toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    nll_counts AS (
      SELECT w, CAST(COUNT(*) AS DOUBLE) AS c FROM nll_toks GROUP BY w
    ),
    nll_tot AS (SELECT SUM(c) AS t FROM nll_counts),
    nll_doc AS (
      SELECT doc_id, ROUND(AVG(-ln(c / t)), 4) AS mean_nll
      FROM nll_toks JOIN nll_counts USING (w) CROSS JOIN nll_tot
      GROUP BY doc_id
    ),
    nll_kept AS (
      SELECT r.* FROM rep_kept r
      JOIN nll_doc n USING (doc_id)
      WHERE n.mean_nll BETWEEN 3.396 AND 3.410
    ),
    fp AS (
      SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
      FROM nll_kept
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
    near AS (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) p
      JOIN sizes sa ON sa.doc_id = p.id_a
      JOIN sizes sb ON sb.doc_id = p.id_b
      WHERE inter / (sa.n + sb.n - inter) >= 0.85
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM near
      UNION SELECT id_b, id_a FROM near
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    cc AS (
      SELECT u AS node, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
    ),
    clean AS (
      SELECT e.* FROM exact_kept e
      LEFT JOIN cc ON cc.node = e.doc_id
      WHERE cc.node IS NULL OR cc.cluster_id = e.doc_id
    )
    SELECT 'input' AS stage, COUNT(*) AS n FROM documents
    UNION ALL SELECT 'lang_kept', COUNT(*) FROM lang_kept
    UNION ALL SELECT 'quality_kept', COUNT(*) FROM quality_kept
    UNION ALL SELECT 'repetition_kept', COUNT(*) FROM rep_kept
    UNION ALL SELECT 'nll_kept', COUNT(*) FROM nll_kept
    UNION ALL SELECT 'exact_deduped', COUNT(*) FROM exact_kept
    UNION ALL SELECT 'near_deduped', COUNT(*) FROM clean
    ORDER BY stage
    """,
)
def curation_funnel_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULLY-GATED curation funnel under one end-to-end oracle:
    language filter -> heuristic quality gate -> Gopher repetition
    gate (top-2-gram char fraction <= 0.20) -> CCNet-shaped surprisal
    band (corpus-unigram mean NLL in [3.396, 3.410], scored against
    the full input corpus) -> exact fingerprint dedup -> CLUSTER-mode
    near-dup dedup (connected components keep the min-id
    representative — the transitive-chain-correct rule, unlike the
    base funnel's greedy drop). DuckDB independently recomputes every
    stage including the recursive cluster closure, so a regression in
    any gate, the CC labeling, or the keep rule moves a funnel count
    and goes driver-red."""
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    _, stats = curate_corpus(
        docs,
        langs=("en",),
        min_quality=0.6,
        jaccard_threshold=0.85,
        use_clusters=True,
        max_top_gram_char_frac=0.20,
        nll_band=(3.396, 3.410),
        # same threshold/shingling as the funnel's near-dup stage;
        # pair-locality makes the restriction exact (see curate_corpus)
        precomputed_pairs=shared_jaccard_pairs(spark, sf_dir),
    )
    return stats


@query(
    "corpus_stats_report",
    oracle=f"""
    WITH base AS (
      SELECT source, lang, {_QUALITY} AS q,
             CAST(len({_DUCK_TOKS_CASED}) AS BIGINT) AS n_tok,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
      FROM documents
    ),
    per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
             ROUND(AVG(q), 4) AS mean_quality,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(COUNT(DISTINCT f) AS BIGINT) AS n_unique
      FROM base GROUP BY source
    ),
    lc AS (SELECT source, lang, COUNT(*) AS c FROM base GROUP BY source, lang),
    ent AS (
      SELECT source,
             ROUND(ln(CAST(SUM(c) AS DOUBLE))
                   - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                     / CAST(SUM(c) AS DOUBLE),
                   6) AS lang_entropy
      FROM lc GROUP BY source
    )
    SELECT p.source, p.n_docs, p.total_tokens, p.mean_quality, p.n_langs,
           ROUND(1.0 - CAST(p.n_unique AS DOUBLE) / CAST(p.n_docs AS DOUBLE),
                 6) AS dup_rate,
           e.lang_entropy
    FROM per_src p JOIN ent e USING (source)
    ORDER BY p.source
    """,
)
def corpus_stats_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card (datasheet practice, Gebru et al. 2021):
    volume, mean quality, language spread + entropy, exact-dup rate —
    the release-gate summary of a training corpus. Counts stay exact
    BIGINTs on both engines; ratios/entropy rounded against
    summation-order drift."""
    from hummingbirddatapipeline_spark.pipelines.curation import corpus_stats

    docs = load(spark, sf_dir, "documents")
    return corpus_stats(docs)


@query(
    "curation_source_gate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS w FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    nd AS (
      SELECT DISTINCT x AS doc_id FROM (
        SELECT p.id_a AS x FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.id_a
        JOIN sizes sb ON sb.doc_id = p.id_b
        WHERE inter / (sa.n + sb.n - inter) >= 0.85
        UNION ALL
        SELECT p.id_b FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.id_a
        JOIN sizes sb ON sb.doc_id = p.id_b
        WHERE inter / (sa.n + sb.n - inter) >= 0.85
      )
    ),
    base AS (
      SELECT doc_id, source, {_QUALITY} AS q FROM documents
    )
    SELECT b.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(b.q), 4) AS mean_quality,
           ROUND(CAST(SUM(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS near_dup_frac,
           ROUND(AVG(b.q), 4) >= 0.87
             AND ROUND(CAST(SUM(CASE WHEN nd.doc_id IS NOT NULL
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE), 6) <= 0.80 AS kept
    FROM base b LEFT JOIN nd USING (doc_id)
    GROUP BY b.source
    ORDER BY b.source
    """,
)
def curation_source_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level gating (the FineWeb/RefinedWeb move): sources are
    scored on mean quality and the fraction of their docs involved in
    near-dup pairs (exact Jaccard >= 0.85, the shared checkpointed pair
    set), and whole sources below the bar are dropped. The verdict
    table is the oracled surface; the doc-level filter is a broadcast
    semi-join on the surviving sources."""
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.pipelines.curation import source_gate

    docs = load(spark, sf_dir, "documents")
    pairs = shared_jaccard_pairs(spark, sf_dir)
    _, verdicts = source_gate(
        docs, pairs, min_mean_quality=0.87, max_near_dup_frac=0.80
    )
    return verdicts


@query(
    "curation_quality_percentile",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, {_QUALITY} AS quality FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, quality,
             ROUND(PERCENT_RANK() OVER (
               PARTITION BY source ORDER BY quality, doc_id), 6) AS pct_rank
      FROM scored
    )
    SELECT doc_id, source, quality, pct_rank, pct_rank >= 0.5 AS kept
    FROM ranked
    ORDER BY doc_id
    """,
)
def curation_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-percentile gate — the FineWeb-style
    calibration move: absolute quality thresholds misfire when sources
    have different score distributions, so each doc is ranked WITHIN
    its source (percent_rank over the source partition, doc_id
    tiebreak for a total order) and the gate keeps each source's top
    half. One shuffle on source; percent_rank is exact integer
    arithmetic ((rank-1)/(n-1)) so both engines agree bit-for-bit."""
    from pyspark.sql.window import Window

    from hummingbirddatapipeline_spark.functions.text import quality_score

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    return (
        docs.select(
            "doc_id",
            "source",
            F.round(quality_score(F.col("text")), 2).alias("quality"),
        )
        .withColumn("pct_rank", F.round(F.percent_rank().over(w), 6))
        .withColumn("kept", F.col("pct_rank") >= 0.5)
        .select("doc_id", "source", "quality", "pct_rank", "kept")
    )


# DuckDB replay of functions/web.synth_dirty_urls: the deterministic
# dirty-URL fixture derived from (doc_id, source) — mixed-case hosts,
# www. prefixes, default and non-default ports, tracking params,
# unsorted param order, fragments, trailing slashes. Shared with
# tests/test_r9_oracles.py (single source of truth for the SQL side).
DUCK_URL_FIXTURE_CTE = """
      SELECT doc_id,
             'https://' ||
             CASE WHEN doc_id % 2 = 0 THEN upper(h) ELSE h END ||
             CASE WHEN doc_id % 5 = 0 THEN ':443'
                  WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END ||
             '/docs/' || CAST(doc_id % 50 AS VARCHAR) ||
             CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
             CASE WHEN doc_id % 2 = 0
                  THEN '?utm_source=feed&id=' || CAST(doc_id % 10 AS VARCHAR)
                  WHEN doc_id % 3 = 1
                  THEN '?id=' || CAST(doc_id % 10 AS VARCHAR)
                       || '&utm_campaign=x&b=2'
                  ELSE '' END ||
             CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END AS url
      FROM (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN 'www.' || source || '.example.com'
                    ELSE source || '.example.com' END AS h
        FROM documents)
"""

# DuckDB replay of functions/web.url_parts + the canonicalization rule
# set; the tracking-param regex carries the (=|$) anchor so valueless
# params drop too, matching web._TRACKING_RE exactly.
DUCK_URL_CANON_CTES = """
      SELECT doc_id, url,
             lower(regexp_extract(u1, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             regexp_replace(
               lower(regexp_replace(hostport, ':[0-9]+$', '')),
               '^www\\.', '') AS host,
             regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
             regexp_replace(
               regexp_extract(u1,
                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
               '/+$', '') AS path,
             COALESCE(array_to_string(
               list_sort(list_filter(
                 string_split(regexp_extract(u1, '\\?([^#]*)', 1), '&'),
                 p -> p <> '' AND NOT regexp_matches(
                        p, '^(utm_[^=]*|fbclid|gclid)(=|$)'))), '&'), '') AS q
      FROM (
        SELECT doc_id, url, regexp_replace(url, '#.*', '') AS u1,
               regexp_extract(regexp_replace(url, '#.*', ''),
                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1) AS hostport
        FROM fixture)
"""


def duck_canon_sql(select: str) -> str:
    """Full oracle scaffold: fixture -> parsed parts -> canonical form,
    finishing with the caller's SELECT over CTE ``canon``
    (doc_id, url, host, canonical_url)."""
    return f"""
    WITH fixture AS ({DUCK_URL_FIXTURE_CTE}),
    parts AS ({DUCK_URL_CANON_CTES}),
    canon AS (
      SELECT doc_id, url, host,
             scheme || '://' || host ||
             CASE WHEN port = '' OR
                       (scheme = 'https' AND port = '443') OR
                       (scheme = 'http' AND port = '80')
                  THEN '' ELSE ':' || port END ||
             path ||
             CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url
      FROM parts
    )
    {select}
    """


@query(
    "web_canonicalize_url",
    oracle=duck_canon_sql(
        "SELECT doc_id, url, host, canonical_url FROM canon"
    ),
)
def web_canonicalize_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb/CommonCrawl-style URL canonicalization under the full
    oracle gate: the deterministic dirty-URL fixture (mixed-case
    hosts, www., default ports, tracking params, unsorted params,
    fragments, trailing slashes) is normalized to the canonical form
    by functions/web.canonicalize_url — pure column expressions, one
    regexp parse + one split/filter/sort pass, no UDF — while DuckDB
    replays the same rule set from its own regexp toolkit. The
    web-scale dedup/provenance key: canonicalization must change >50%
    of the fixture rows (asserted in tests/test_r9_oracles.py)."""
    from hummingbirddatapipeline_spark.functions.web import (
        canonical_host,
        canonicalize_url,
        synth_dirty_urls,
    )

    urls = synth_dirty_urls(load(spark, sf_dir, "documents"))
    return urls.select(
        "doc_id",
        "url",
        canonical_host(F.col("url")).alias("host"),
        canonicalize_url(F.col("url")).alias("canonical_url"),
    )


@query(
    "web_host_gate",
    oracle=duck_canon_sql("""
    SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_canonical,
           ROUND(1.0 - COUNT(DISTINCT canonical_url)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac,
           COUNT(*) >= 10 AND
           ROUND(1.0 - COUNT(DISTINCT canonical_url)
                 / CAST(COUNT(*) AS DOUBLE), 6) <= 0.6 AS gated
    FROM canon GROUP BY host
    """),
)
def web_host_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level quality gate under the full oracle gate: aggregate
    the canonicalized fixture per host and flag hosts with >= 10 docs
    AND canonical-URL duplicate fraction <= 0.6 — the provenance-level
    curation move where heavily-duplicated or too-thin hosts drop
    WHOLE, upstream of per-document filters. ONE scan-level projection
    (host + canonical url) + one hash aggregate; the gate table is
    tiny and broadcast-joins back onto the corpus for the actual drop.
    Both gate outcomes occur on the fixture (asserted in
    tests/test_r9_oracles.py)."""
    from hummingbirddatapipeline_spark.functions.web import (
        host_gate,
        synth_dirty_urls,
    )

    docs = load(spark, sf_dir, "documents")
    return host_gate(synth_dirty_urls(docs), min_docs=10, max_dup_frac=0.6)


def _decontaminate_clusters_sql() -> str:
    """Independent DuckDB formulation of cluster-aware benchmark
    decontamination: rebuilds the 5-gram collision join AND the
    recursive near-dup cluster closure from the raw documents table
    (benchmark = doc_id < 20, the text_contamination_check fixture)."""
    from hummingbirddatapipeline_spark.catalog.text_q import _DUCK_TOKS

    return f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(t) >= 5
                    THEN list_transform(range(len(t) - 4),
                                        i -> array_to_string(t[i + 1 : i + 5], ' '))
                    ELSE []::VARCHAR[] END
             ) AS gs
      FROM toks
    ),
    bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id < 20
    ),
    dg AS (
      SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id >= 20
    ),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_hit FROM dg JOIN bench USING (g)
      GROUP BY doc_id
    ),
    jt AS (
      SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS w FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM jt GROUP BY doc_id),
    near AS (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM jt a JOIN jt b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) p
      JOIN sizes sa ON sa.doc_id = p.id_a
      JOIN sizes sb ON sb.doc_id = p.id_b
      WHERE inter / (sa.n + sb.n - inter) >= 0.85
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM near
      UNION SELECT id_b, id_a FROM near
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    cc AS (
      SELECT u AS node, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u
    ),
    labeled AS (
      SELECT d.doc_id,
             COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
    ),
    per_doc AS (
      SELECT l.doc_id, l.cluster_id,
             CAST(len(g.gs) AS BIGINT) AS n_grams,
             CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit_grams,
             COALESCE(h.n_hit, 0) >= 1 AS doc_contaminated
      FROM labeled l
      JOIN grams g USING (doc_id)
      LEFT JOIN hits h USING (doc_id)
      WHERE l.doc_id >= 20
    ),
    cl AS (
      SELECT l.cluster_id,
             MAX(CASE WHEN l.doc_id < 20 THEN 1 ELSE 0 END) = 1 AS has_bench,
             MAX(CASE WHEN p.doc_contaminated THEN 1 ELSE 0 END) = 1
               AS has_hit
      FROM labeled l LEFT JOIN per_doc p USING (doc_id)
      GROUP BY l.cluster_id
    )
    SELECT p.doc_id, p.cluster_id, p.n_grams, p.n_hit_grams,
           p.doc_contaminated,
           (cl.has_bench OR cl.has_hit) AS cluster_contaminated,
           NOT (cl.has_bench OR cl.has_hit) AS kept
    FROM per_doc p JOIN cl USING (cluster_id)
    """


@query("curation_decontaminate_clusters", oracle=_decontaminate_clusters_sql())
def curation_decontaminate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware benchmark decontamination under the full oracle
    gate (operators/contamination.decontaminate_clusters): per-doc
    5-gram collision against the benchmark (docs 0-19, the
    text_contamination_check fixture) ESCALATED to whole near-dup
    clusters over the shared exact-Jaccard graph — a training doc
    drops when its cluster contains a benchmark member OR any directly
    contaminated member. This closes the near-dup leak the per-doc
    check misses: a paraphrased twin of a contaminated doc can carry
    zero colliding n-grams yet still leak benchmark content (the
    synthetic-twin escalation is pinned in tests/test_r10_oracles.py).
    DuckDB rebuilds the gram join and the recursive closure
    independently, so the keep/drop labeling itself is hashed.

    Scale shape: the collision is an n-gram equi-join against a SMALL
    benchmark gram set (broadcast at scale); the escalation is two
    hash aggregates over the existing cluster labels — no new
    closure. Rides the checkpointed shared near-dup pair set."""
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_cc,
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.operators.contamination import (
        decontaminate_clusters,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 20)
    pairs = shared_jaccard_pairs(spark, sf_dir)
    return decontaminate_clusters(
        docs, bench, pairs, n=5, cc_labels=shared_jaccard_cc(spark, sf_dir)
    )


# --- r13-banked oracle builder (NOT yet registered; recipe:
# PLANS.md "r13 registration recipe").

def _bloom_screen_sql(
    n: int = 5,
    n_words: int = 16,
    n_hashes: int = 3,
    min_hits: int = 1,
) -> str:
    """Independent DuckDB formulation of the Bloom-filter
    decontamination screen (operators/contamination.bloom_gram_screen):
    rebuilds the benchmark gram set (docs 0-19, the
    text_contamination_check fixture), folds the 52-bit-md5 positions
    into 63-bit BIGINT words with bit_or, and probes every corpus gram
    with the same shift/AND arithmetic — integers end to end, so the
    screen labeling is hashed exactly."""
    m_bits = n_words * 63
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(t) >= {n}
                    THEN list_transform(range(len(t) - {n - 1}),
                                        i -> array_to_string(
                                               t[i + 1 : i + {n}], ' '))
                    ELSE []::VARCHAR[] END
             ) AS gs
      FROM toks
    ),
    hseq AS (SELECT unnest(range({n_hashes})) AS j),
    bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id < 20
    ),
    bpos AS (
      SELECT CAST('0x' || substr(md5(g || '#b' || CAST(j AS VARCHAR)),
                                 1, 13) AS BIGINT) % {m_bits} AS p
      FROM bench CROSS JOIN hseq
    ),
    words AS (
      SELECT p // 63 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS wd
      FROM bpos GROUP BY 1
    ),
    dg AS (
      SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id >= 20
    ),
    probe AS (
      SELECT doc_id, g, j,
             CAST('0x' || substr(md5(g || '#b' || CAST(j AS VARCHAR)),
                                 1, 13) AS BIGINT) % {m_bits} AS p
      FROM dg CROSS JOIN hseq
    ),
    checks AS (
      SELECT doc_id, g,
             MIN(CASE WHEN ((wd >> CAST(p % 63 AS INT)) & 1) = 1
                      THEN 1 ELSE 0 END) AS hit
      FROM probe LEFT JOIN words ON words.w = p // 63
      GROUP BY doc_id, g
    ),
    perdoc AS (
      SELECT doc_id, COUNT(g) AS n_grams, SUM(hit) AS n_bloom_hits
      FROM checks GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(p.n_bloom_hits, 0) AS BIGINT) AS n_bloom_hits,
           COALESCE(p.n_bloom_hits, 0) >= {min_hits} AS screened
    FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) d
    LEFT JOIN perdoc p USING (doc_id)
    """


@query("curation_bloom_screen", oracle=_bloom_screen_sql(5, 256, 3))
def curation_bloom_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination screen
    (operators/contamination.bloom_gram_screen) under the full oracle
    gate — the cheap first stage of screen-then-verify: benchmark
    5-grams (docs 0-19, the text_contamination_check fixture) fold
    into a 256-word (63 usable bits each) broadcast Bloom filter via
    3 independent 52-bit-md5 positions; every training-corpus gram
    probes with pure shift/AND integer arithmetic. False negatives are
    impossible by construction (every set position of a bench gram IS
    set — pinned in tests/test_r13_oracles.py); false positives only
    cost exact-check work downstream.

    Scale shape: the filter is ONE broadcast row of BIGINTs regardless
    of benchmark size; the corpus side is one gram explode + one
    per-doc aggregate — ngram_contamination's geometry with the
    per-gram broadcast join replaced by constant-size bit probes."""
    from hummingbirddatapipeline_spark.operators.contamination import (
        bloom_gram_screen,
    )

    docs = load(spark, sf_dir, "documents", fanout=True).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 20)
    train = docs.filter(F.col("doc_id") >= 20)
    return bloom_gram_screen(train, bench, n=5, n_words=256, n_hashes=3)


# --- r11-banked oracle builder (NOT yet registered: the r10 driver
# window is full; recipe: PLANS.md "r11 registration recipe").

def _distill_stump_sql(top_frac: float = 0.3) -> str:
    """Independent DuckDB formulation of quality-score distillation:
    rebuilds the teacher labels (percent-rank over the 2dp heuristic
    quality PER SOURCE STRATUM — the FineWeb-Edu per-domain-percentile
    practice, and the 100 TB shape: the window exchange keys on the
    stratum instead of moving the corpus to one reducer; r11 VERDICT
    item 2), the per-distinct-student-value cumulative agreement
    counts for BOTH stump directions, and the deterministic argmax
    (max agreement -> direction '>=' -> lowest threshold), then
    applies the winning stump to every doc."""
    return f"""
    WITH scored AS (
      SELECT doc_id, source, {_QUALITY} AS teacher,
             ROUND(n_chars / CAST(len(list_filter(
               string_split_regex(trim(text), '\\s+'), x -> x <> ''))
               AS DOUBLE), 6) AS student
      FROM documents
    ),
    lab AS (
      SELECT doc_id, student,
             PERCENT_RANK() OVER (PARTITION BY source
                                  ORDER BY teacher, doc_id)
               >= {1.0 - top_frac} AS teacher_label
      FROM scored
    ),
    pv AS (
      SELECT student, COUNT(*) AS n,
             SUM(CASE WHEN teacher_label THEN 1 ELSE 0 END) AS pos
      FROM lab GROUP BY student
    ),
    cum AS (
      SELECT student, n, pos,
             SUM(n) OVER (ORDER BY student ROWS UNBOUNDED PRECEDING) AS cum_n,
             SUM(pos) OVER (ORDER BY student ROWS UNBOUNDED PRECEDING)
               AS cum_pos,
             SUM(n) OVER () AS nn, SUM(pos) OVER () AS pp
      FROM pv
    ),
    cands AS (
      SELECT student AS threshold, '>=' AS direction,
             (pp - (cum_pos - pos)) + ((cum_n - n) - (cum_pos - pos))
               AS n_correct,
             nn AS n_docs
      FROM cum
      UNION ALL
      SELECT student, '<=',
             cum_pos + ((nn - pp) - (cum_n - cum_pos)), nn
      FROM cum
    ),
    best AS (
      SELECT * FROM cands
      ORDER BY n_correct DESC, direction DESC, threshold
      LIMIT 1
    )
    SELECT l.doc_id, l.student, l.teacher_label,
           CASE WHEN b.direction = '>=' THEN l.student >= b.threshold
                ELSE l.student <= b.threshold END AS student_label,
           b.threshold, b.direction,
           CAST(b.n_correct AS BIGINT) AS n_correct,
           CAST(b.n_docs AS BIGINT) AS n_docs
    FROM lab l CROSS JOIN best b
    """


@query("curation_score_distill", oracle=_distill_stump_sql(0.3))
def curation_score_distill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier score distillation under the full oracle
    gate (pipelines/curation.distill_quality_stump): teacher
    percentile labels (top 30% of the 2dp heuristic quality score,
    ranked PER SOURCE STRATUM) distilled into the best single-feature
    decision stump over the observed student values (chars-per-token,
    6dp) — the FineWeb-Edu / DCLM teacher-to-cheap-student setting
    reduced to its deterministic core. Both stump directions are
    scored from ONE cumulative-sum pass of pure integer agreement
    counts; ties break to '>=' then the LOWEST threshold — no floats
    enter the argmax. DuckDB re-derives the teacher percentiles, the
    cumulative counts, and the argmax independently; internal
    consistency (reported n_correct == recounted agreement of the
    applied stump) and the perfect-separator recovery are pinned in
    tests/test_r11_oracles.py.

    Scale shape: one teacher window KEYED ON THE STRATUM (r12, per the
    r11 VERDICT: the r11 fixture ranked globally — a single-partition
    sort of the corpus whose 100x receipt showed 25x wall; the
    per-source form exchanges on `source` like every other grouped
    window), one aggregate to distinct student values, one tiny window
    over those, one broadcast of the winning stump row back onto the
    docs."""
    from hummingbirddatapipeline_spark.functions.text import (
        quality_score,
        ws_token_count,
    )
    from hummingbirddatapipeline_spark.pipelines.curation import (
        distill_quality_stump,
    )

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.round(quality_score(F.col("text")), 2).alias("teacher"),
        F.round(
            F.col("n_chars") / ws_token_count(F.col("text")).cast("double"),
            6,
        ).alias("student"),
    )
    return distill_quality_stump(scored, top_frac=0.3, strata_col="source")


def _logreg_quality_sql(
    lr: float = 1.0, n_iter: int = 3, top_frac: float = 0.3
) -> str:
    """Independent DuckDB formulation of in-engine logistic-regression
    quality-classifier training (pipelines/curation.
    logreg_quality_train): re-derives the teacher percentile labels,
    the 6dp features and exact-decimal standardization stats, then
    unrolls EVERY gradient-descent iteration as a chained CTE — the
    rational-sigmoid link and the DECIMAL(38,10) gradient sums make
    the whole trajectory engine-exact, so the per-doc scores and
    predictions are hashed bit-for-bit."""
    k = 3
    T = _DUCK_TOKS_CASED

    # raw double margin/sigmoid — no intermediate rounding (IEEE ops on
    # identical inputs are bit-identical; see the operator's docstring)
    marg = "(p.w0 + p.w1 * z.z0 + p.w2 * z.z1 + p.w3 * z.z2)"
    sigf = f"(0.5 + 0.5 * {marg} / (1.0 + ABS({marg})))"

    iters = ["i0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"]
    for t in range(1, n_iter + 1):
        upds = [
            f"ROUND(p.w0 + {lr} * CAST(SUM(CAST(ROUND(z.yd - {sigf}, 10)"
            f" AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 8) AS w0"
        ]
        for j in range(k):
            upds.append(
                f"ROUND(p.w{j + 1} + {lr} * CAST(SUM(CAST("
                f"ROUND((z.yd - {sigf}) * z.z{j}, 10)"
                f" AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 8)"
                f" AS w{j + 1}"
            )
        iters.append(
            f"i{t} AS (SELECT {', '.join(upds)} "
            f"FROM z CROSS JOIN i{t - 1} p "
            f"GROUP BY p.w0, p.w1, p.w2, p.w3)"
        )
    # the 10dp sigmoid is emitted as-is: re-rounding to 8dp creates
    # exact decimal ties the engines break differently (see operator)
    score = sigf
    return f"""
    WITH feat AS (
      SELECT doc_id, source, {_QUALITY} AS teach,
             ROUND(CAST(len({T}) AS DOUBLE), 6) AS x0,
             ROUND(COALESCE(list_sum(list_transform({T},
                     t -> length(t))) / CAST(NULLIF(len({T}), 0)
                     AS DOUBLE), 0.0), 6) AS x1,
             ROUND(CAST(n_chars AS DOUBLE), 6) AS x2
      FROM documents
    ),
    lab AS (
      SELECT doc_id, x0, x1, x2,
             PERCENT_RANK() OVER (PARTITION BY source
                                  ORDER BY teach, doc_id)
               >= {1.0 - top_frac} AS yb,
             CASE WHEN PERCENT_RANK() OVER (PARTITION BY source
                                            ORDER BY teach, doc_id)
               >= {1.0 - top_frac} THEN 1.0 ELSE 0.0 END AS yd
      FROM feat
    ),
    sums AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(x0 AS DECIMAL(26,6))) AS s0,
             SUM(CAST(x1 AS DECIMAL(26,6))) AS s1,
             SUM(CAST(x2 AS DECIMAL(26,6))) AS s2,
             SUM(CAST(ROUND(x0 * x0, 12) AS DECIMAL(38,12))) AS q0,
             SUM(CAST(ROUND(x1 * x1, 12) AS DECIMAL(38,12))) AS q1,
             SUM(CAST(ROUND(x2 * x2, 12) AS DECIMAL(38,12))) AS q2
      FROM lab
    ),
    mu AS (
      SELECT n, q0, q1, q2,
             ROUND(CAST(s0 AS DOUBLE) / n, 8) AS mu0,
             ROUND(CAST(s1 AS DOUBLE) / n, 8) AS mu1,
             ROUND(CAST(s2 AS DOUBLE) / n, 8) AS mu2
      FROM sums
    ),
    st AS (
      SELECT mu0, mu1, mu2,
             ROUND(SQRT(GREATEST(ROUND(CAST(q0 AS DOUBLE) / n
               - mu0 * mu0, 8), 1e-12)), 8) AS sd0,
             ROUND(SQRT(GREATEST(ROUND(CAST(q1 AS DOUBLE) / n
               - mu1 * mu1, 8), 1e-12)), 8) AS sd1,
             ROUND(SQRT(GREATEST(ROUND(CAST(q2 AS DOUBLE) / n
               - mu2 * mu2, 8), 1e-12)), 8) AS sd2
      FROM mu
    ),
    z AS (
      SELECT l.doc_id, l.yb, l.yd,
             ROUND((l.x0 - st.mu0) / st.sd0, 6) AS z0,
             ROUND((l.x1 - st.mu1) / st.sd1, 6) AS z1,
             ROUND((l.x2 - st.mu2) / st.sd2, 6) AS z2
      FROM lab l CROSS JOIN st
    ),
    {', '.join(iters)}
    SELECT z.doc_id,
           {score} AS score,
           {score} >= 0.5 AS pred,
           z.yb AS teacher_label,
           ({score} >= 0.5) = z.yb AS correct
    FROM z CROSS JOIN i{n_iter} p
    """


@query("curation_logreg_train", oracle=_logreg_quality_sql(1.0, 3, 0.3))
def curation_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine logistic-regression quality-classifier training
    (pipelines/curation.logreg_quality_train) under the full oracle
    gate — the fastText/DCLM classifier lifecycle's training half,
    reduced to its deterministic core: per-source teacher percentile
    labels (top 30% of the 2dp heuristic quality within each source
    stratum — the same stratum-keyed window as the distill row, not a
    single-partition global sort), three 6dp features (token
    count, mean token length, char count), exact-decimal
    standardization, and 3 full-batch gradient-descent iterations over
    the rational sigmoid x/(1+|x|) with DECIMAL(38,10) gradient sums —
    the whole trajectory is engine-exact, so per-doc scores and
    predictions hash bit-for-bit. DuckDB unrolls every iteration as
    chained CTEs. That the trainer TRAINS (accuracy beats the
    all-positive floor; separable fixtures reach >= 0.9) is pinned in
    tests/test_r13_oracles.py.

    Scale shape: each GD iteration is ONE map-side projection + ONE
    hash aggregate returning a (k+1)-value weight vector — bounded
    MODEL state, the same loop shape as kmeans_refine; n_iter+1 corpus
    passes total over a localCheckpointed feature frame."""
    from hummingbirddatapipeline_spark.functions.text import (
        mean_token_len,
        quality_score,
        ws_token_count,
    )
    from hummingbirddatapipeline_spark.pipelines.curation import (
        logreg_quality_train,
    )
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    teach = F.round(quality_score(F.col("text")), 2)
    # teacher percentile ranked per source stratum — the same
    # stratum-keyed window the distill row uses (r11 VERDICT item 2:
    # a Window.partitionBy() global rank is a single-partition sort
    # of the whole corpus at scale)
    feats = docs.select(
        "doc_id",
        (
            F.percent_rank().over(
                Window.partitionBy("source").orderBy(teach, F.col("doc_id"))
            )
            >= F.lit(0.7)
        ).alias("teacher_label"),
        ws_token_count(F.col("text")).cast("double").alias("f_ntok"),
        F.coalesce(mean_token_len(F.col("text")), F.lit(0.0)).alias("f_mtl"),
        F.col("n_chars").cast("double").alias("f_chars"),
    )
    return logreg_quality_train(
        feats, ["f_ntok", "f_mtl", "f_chars"], lr=1.0, n_iter=3
    )


def _url_traps_sql(max_per_template: int = 20) -> str:
    """Independent DuckDB formulation of crawler-trap detection by
    path templating (functions/web.url_template_traps): replays the
    dirty-URL fixture + the full parse/canonicalize rule set
    (DUCK_URL_FIXTURE_CTE / DUCK_URL_CANON_CTES — the parts CTE's path
    already carries the trailing-slash strip), collapses digit runs to
    'N' (note the explicit 'g' flag: DuckDB regexp_replace is
    first-match by default where Spark's is global), and counts
    DISTINCT canonical URLs per (host, template)."""
    return f"""
    WITH fixture AS ({DUCK_URL_FIXTURE_CTE}),
    parts AS ({DUCK_URL_CANON_CTES}),
    canon AS (
      SELECT doc_id, host, path,
             scheme || '://' || host ||
             CASE WHEN port = '' OR
                       (scheme = 'https' AND port = '443') OR
                       (scheme = 'http' AND port = '80')
                  THEN '' ELSE ':' || port END ||
             path ||
             CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url
      FROM parts
    ),
    agg AS (
      SELECT host, regexp_replace(path, '[0-9]+', 'N', 'g') AS template,
             COUNT(DISTINCT canonical_url) AS n
      FROM canon GROUP BY 1, 2
    )
    SELECT host, template,
           CAST(n AS BIGINT) AS n_urls,
           ROUND(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY host) AS DOUBLE), 6)
             AS frac_of_host,
           n > {max_per_template} AS is_trap
    FROM agg
    """


@query("web_template_traps", oracle=_url_traps_sql(10))
def web_template_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap detection by URL path templating
    (functions/web.url_template_traps) over the shared dirty-URL
    fixture (synth_dirty_urls — the web_canonicalize_url fixture):
    URLs group by (host, path template) where every numeric path
    segment collapses to '{n}'; a template whose distinct-URL count
    exceeds max_per_template=10 with low content diversity is a trap
    (calendar pages, session-id paths — the infinite-crawl classes
    WARC pipelines gate first). DuckDB replays the fixture and the
    template rule set.

    Scale shape: templating is map-side regex; the only shuffle is
    one (host, template) hash aggregate — the gate table is tiny and
    joins back broadcast, exactly like web_host_gate."""
    from hummingbirddatapipeline_spark.functions.web import (
        synth_dirty_urls,
        url_template_traps,
    )

    urls = synth_dirty_urls(load(spark, sf_dir, "documents"))
    return url_template_traps(urls, max_per_template=10)


def _auc_by_source_sql() -> str:
    """Independent DuckDB formulation of exact tie-aware ROC-AUC per
    source (operators/evaluation.auc_by_group) over the distillation
    setting: score = the 6dp chars-per-token student, label = 2dp
    quality >= 0.9. The oracle carries average ranks as the exact
    integer rank_min + rank_max (ascending and descending RANK), sums
    them as HUGEINT, and divides once at the end — pure integer
    arithmetic until the final 6dp division."""
    return f"""
    WITH scored AS (
      SELECT source,
             ROUND(n_chars / NULLIF(len({_DUCK_TOKS_CASED}), 0), 6)
               AS score,
             {_QUALITY} >= 0.9 AS y
      FROM documents
    ),
    ok AS (SELECT * FROM scored WHERE score IS NOT NULL),
    ranked AS (
      SELECT source, y,
             RANK() OVER (PARTITION BY source ORDER BY score ASC)
             + (COUNT(*) OVER (PARTITION BY source)
                - RANK() OVER (PARTITION BY source ORDER BY score DESC)
                + 1) AS r2
      FROM ok
    ),
    agg AS (
      SELECT source AS "group",
             CAST(COUNT(*) FILTER (WHERE y) AS BIGINT) AS n_pos,
             CAST(COUNT(*) FILTER (WHERE NOT y) AS BIGINT) AS n_neg,
             SUM(CASE WHEN y THEN r2 ELSE 0 END) AS s2
      FROM ranked GROUP BY source
    )
    SELECT "group", n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             ROUND(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
                   / (2.0 * n_pos * n_neg), 6)
           END AS auc
    FROM agg
    """


@query("eval_auc_by_source", oracle=_auc_by_source_sql())
def eval_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC-AUC per source (operators/evaluation.
    auc_by_group) under the full oracle gate — the Mann-Whitney rank
    form with half-credit for score ties, computed from pure integer
    rank sums so both engines agree bit-for-bit (one final division).
    Student score = 6dp chars-per-token; labels = heuristic quality
    >= 0.9 — the model-vs-label agreement view per ingest source.
    Flip symmetry (AUC -> 1-AUC) and the perfect-separation /
    all-ties closed forms are pinned in tests/test_r17_oracles.py.

    Scale shape: one rank window + one aggregate per group key, both
    on the SAME source-keyed exchange — per-stratum evaluation never
    builds a global sort."""
    from hummingbirddatapipeline_spark.functions.text import (
        quality_score,
        ws_token_count,
    )
    from hummingbirddatapipeline_spark.operators.evaluation import (
        auc_by_group,
    )

    docs = load(spark, sf_dir, "documents")
    cnt = ws_token_count(F.col("text"))
    score = F.round(
        F.col("n_chars") / F.when(cnt == 0, F.lit(None)).otherwise(cnt),
        6,
    )
    scored = docs.select(
        "source",
        score.alias("score"),
        (F.round(quality_score(F.col("text")), 2) >= 0.9).alias("y"),
    ).filter(F.col("score").isNotNull())
    return auc_by_group(scored, "score", "y", "source")


def _calibration_bins_sql(
    lr: float = 1.0,
    n_iter: int = 3,
    top_frac: float = 0.3,
    n_bins: int = 10,
) -> str:
    """Independent DuckDB formulation of reliability binning
    (operators/evaluation.calibration_bins) over the in-engine
    logistic model: nests the FULL unrolled training trajectory
    (_logreg_quality_sql — every GD iteration as chained CTEs), bins
    the raw rational-sigmoid scores with floor(p * n_bins), and
    aggregates 10dp-rounded score terms as DECIMAL(20,10) before the
    6dp mean division (the r13 rounding rule)."""
    return f"""
    SELECT CAST(LEAST({n_bins - 1},
                      CAST(FLOOR(score * {n_bins}) AS INT)) AS INT)
             AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE teacher_label) AS BIGINT)
             AS n_pos,
           ROUND(CAST(SUM(CAST(ROUND(score, 10) AS DECIMAL(20,10)))
                      AS DOUBLE) / COUNT(*), 6) AS mean_prob,
           ROUND(CAST(COUNT(*) FILTER (WHERE teacher_label) AS DOUBLE)
                 / COUNT(*), 6) AS frac_pos
    FROM ({_logreg_quality_sql(lr, n_iter, top_frac)}) lg
    GROUP BY 1
    """


@query("eval_calibration_bins", oracle=_calibration_bins_sql(1.0, 3, 0.3, 10))
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram calibration bins (operators/evaluation.
    calibration_bins) over the in-engine logistic quality model under
    the full oracle gate — the classifier lifecycle's calibration
    step: the curation_logreg_train row's per-doc scores bucket into
    10 equal-width probability bins, each reporting exact counts plus
    mean predicted probability vs observed positive fraction. The
    DuckDB side nests the FULL unrolled training trajectory and
    re-bins — the whole features -> train -> calibrate chain is
    engine-exact end to end.

    Scale shape: one map-side bin assignment + one 10-row hash
    aggregate on top of the (already bounded-model-state) training
    loop; the report itself is constant-size at any corpus scale."""
    from hummingbirddatapipeline_spark.operators.evaluation import (
        calibration_bins,
    )

    trained = curation_logreg_train(spark, sf_dir)
    return calibration_bins(trained, "score", "teacher_label", 10)


def _quality_borda_sql() -> str:
    """Independent DuckDB formulation of the per-source Borda fusion
    (operators/retrieval.quality_borda): re-derives all three signals
    (the shared _QUALITY fragment, token count, duplicate-token
    fraction), the three per-source row_number ranks with doc_id
    tiebreaks, the Borda sum, and the consensus rank. Output is pure
    integers + the source string."""
    return f"""
    WITH sig AS (
      SELECT doc_id, source,
             {_QUALITY} AS q,
             CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tok,
             CASE WHEN len({_DUCK_TOKS}) > 0
                  THEN ROUND(1.0 - len(list_distinct({_DUCK_TOKS}))
                             / CAST(len({_DUCK_TOKS}) AS DOUBLE), 6)
                  ELSE 0.0 END AS rep
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY q DESC, doc_id) AS r_quality,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_tok DESC, doc_id) AS r_length,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY rep ASC, doc_id) AS r_rep
      FROM sig
    ),
    fused AS (
      SELECT *, CAST(r_quality + r_length + r_rep AS BIGINT) AS borda
      FROM ranked
    )
    SELECT doc_id, source,
           CAST(r_quality AS INT) AS r_quality,
           CAST(r_length AS INT) AS r_length,
           CAST(r_rep AS INT) AS r_rep,
           borda,
           CAST(ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY borda, doc_id) AS INT)
             AS borda_rank
    FROM fused
    """


@query("curation_quality_borda", oracle=_quality_borda_sql())
def curation_quality_borda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Borda fusion of three quality signals
    (operators/retrieval.quality_borda) under the full oracle gate:
    heuristic quality desc, token count desc, duplicate-token fraction
    asc — all ranks row_number with doc_id tiebreaks, borda = sum of
    ranks, output pure integers (NO floats enter the fusion). The
    shared _QUALITY fragment rounds 2dp on both engines (lossless —
    the score is a sum of 0.1-multiples). Per-source rank-permutation
    and repartition-invariance pins live in tests/test_r23_oracles.py.

    Scale shape: per-stratum ranking is both the statistically right
    pool and the scale-correct layout — ONE stratum-keyed exchange
    shared by all four windows (contract-pinned: exactly 1 Exchange,
    0 joins), vs the documented single-partition global-window
    anti-pattern."""
    from hummingbirddatapipeline_spark.operators.retrieval import (
        quality_borda,
    )

    return quality_borda(load(spark, sf_dir, "documents"))


def _gate_kappa_sql(quality_threshold: float = 0.6) -> str:
    """Independent DuckDB formulation of the gate-agreement Cohen's
    kappa (operators/evaluation.gate_agreement_kappa): re-derives both
    gates (the C4 verdict per the text_c4_filters oracle; the shared
    _QUALITY fragment vs the threshold), the per-source 2x2
    contingency, and the po/pe/kappa chain in the same fixed IEEE
    order."""
    return f"""
    WITH flagged AS (
      SELECT source,
             CASE WHEN len({_DUCK_TOKS_CASED}) >= 5
                   AND NOT contains(lower(text), 'lorem ipsum')
                   AND NOT (contains(text, '{{') OR contains(text, '}}'))
                   AND NOT contains(lower(text), 'javascript')
                  THEN 1 ELSE 0 END AS a,
             CASE WHEN {_QUALITY} >= {quality_threshold}
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    agg AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a * b) AS BIGINT) AS n11,
             CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
             CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
             CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
      FROM flagged GROUP BY source
    )
    SELECT source, n, n11, n10, n01, n00,
           ROUND((n11 + n00) / CAST(n AS DOUBLE), 6) AS po,
           ROUND((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                  + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
           CASE WHEN (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                      + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) = 1.0
                THEN 1.0
                ELSE ROUND(((n11 + n00) / CAST(n AS DOUBLE)
                            - (CAST(n11 + n10 AS DOUBLE)
                               * CAST(n11 + n01 AS DOUBLE)
                               + CAST(n01 + n00 AS DOUBLE)
                               * CAST(n10 + n00 AS DOUBLE))
                              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                           / (1.0 - (CAST(n11 + n10 AS DOUBLE)
                                     * CAST(n11 + n01 AS DOUBLE)
                                     + CAST(n01 + n00 AS DOUBLE)
                                     * CAST(n10 + n00 AS DOUBLE))
                                    / (CAST(n AS DOUBLE)
                                       * CAST(n AS DOUBLE))), 6)
           END AS kappa
    FROM agg
    """


@query("curation_gate_kappa", oracle=_gate_kappa_sql(0.6))
def curation_gate_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the C4 keep verdict and the composite
    quality gate, per source (operators/evaluation.
    gate_agreement_kappa, threshold 0.6) under the full oracle gate —
    the agreement-beyond-chance report a pipeline owner reads BEFORE
    labels exist (AUC needs labels, calibration needs probabilities;
    kappa needs only the two gates). Exact 2x2 BIGINT contingency;
    po/pe/kappa are fixed-order IEEE chains both engines replay; the
    pe=1 degenerate stratum is kappa=1.0 by convention. The
    balanced-2x2 -> exactly 0.0 pin lives in tests/test_r24_oracles.py.

    Scale shape: map-side gates + ONE stratum hash aggregate, zero
    joins (contract-pinned) — the report is K rows at any corpus
    size."""
    from hummingbirddatapipeline_spark.operators.evaluation import (
        gate_agreement_kappa,
    )

    return gate_agreement_kappa(
        load(spark, sf_dir, "documents"), quality_threshold=0.6
    )


def _bloom_fpr_sql(
    split_id: int = 250, n_words: int = 16, n_hashes: int = 3
) -> str:
    """Independent DuckDB formulation of the Bloom FPR report
    (operators/contamination.bloom_fpr_report): member/probe word sets
    either side of the id split, the same 63-bit word fold, the
    all-k-bits probe, and the theoretical (1-(1-1/m)^(kn))^k."""
    m_bits = n_words * 63
    return f"""
    WITH words0 AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS g FROM documents
    ),
    members AS (
      SELECT DISTINCT g FROM words0 WHERE doc_id < {split_id}
    ),
    probes AS (
      SELECT DISTINCT g FROM words0 WHERE doc_id >= {split_id}
      EXCEPT SELECT g FROM members
    ),
    hseq AS (SELECT unnest(range({n_hashes})) AS j),
    bpos AS (
      SELECT CAST('0x' || substr(md5(g || '#b' || CAST(j AS VARCHAR)),
                                 1, 13) AS BIGINT) % {m_bits} AS p
      FROM members CROSS JOIN hseq
    ),
    bwords AS (
      SELECT p // 63 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS wd
      FROM bpos GROUP BY 1
    ),
    probe AS (
      SELECT g,
             CAST('0x' || substr(md5(g || '#b' || CAST(j AS VARCHAR)),
                                 1, 13) AS BIGINT) % {m_bits} AS p
      FROM probes CROSS JOIN hseq
    ),
    checks AS (
      SELECT g,
             MIN(CASE WHEN ((wd >> CAST(p % 63 AS INT)) & 1) = 1
                      THEN 1 ELSE 0 END) AS hit
      FROM probe LEFT JOIN bwords ON bwords.w = p // 63
      GROUP BY g
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
             CAST(COALESCE(SUM(hit), 0) AS BIGINT) AS n_fp
      FROM checks
    ),
    nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members FROM members)
    SELECT CAST({m_bits} AS INT) AS m_bits,
           nm.n_members, agg.n_probes, agg.n_fp,
           CASE WHEN agg.n_probes > 0
                THEN ROUND(agg.n_fp / CAST(agg.n_probes AS DOUBLE), 6)
                ELSE 0.0 END AS fpr,
           ROUND(power(1.0 - power(CAST({1.0 - 1.0 / m_bits!r} AS DOUBLE),
                       CAST({n_hashes} * nm.n_members AS DOUBLE)),
                 CAST({float(n_hashes)!r} AS DOUBLE)), 6) AS fpr_theory
    FROM agg CROSS JOIN nm
    """


@query("sketch_bloom_fpr", oracle=_bloom_fpr_sql(250, 16, 3))
def sketch_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed Bloom-filter FPR on true non-members next to the
    theoretical (1-(1-1/m)^(kn))^k
    (operators/contamination.bloom_fpr_report; members = vocabulary of
    docs < 250, probes = words exclusive to the far side) under the
    full oracle gate — the membership member of the
    observe-don't-trust sketch family: the number the
    screen-then-verify layout budgets its exact-check stage against.
    Same engine-exact conventions as bloom_gram_screen (52-bit md5
    positions, 63 usable bits per BIGINT word). The
    saturated-filter -> fpr 1.0 and empty-member -> exactly 0/0.0
    closed forms are pinned in tests/test_r31_oracles.py.

    Scale shape: the filter is ONE broadcast row of BIGINTs; probing
    is vocabulary-sized — the report costs two vocab aggregates."""
    from hummingbirddatapipeline_spark.operators.contamination import (
        bloom_fpr_report,
    )

    return bloom_fpr_report(
        load(spark, sf_dir, "documents"), split_id=250, n_words=16,
        n_hashes=3,
    )
