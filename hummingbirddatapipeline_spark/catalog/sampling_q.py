"""Curation sampling + privacy + decontamination catalog queries
(north-star extension) — every one under the FULL DuckDB oracle gate:
content-hash sampling, stratified quotas, per-group caps, train/holdout
splits, PII redaction, and benchmark n-gram contamination are all pure
deterministic expressions, so both engines must agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.functions.privacy import (
    PII_PATTERNS,
    pii_flags,
    redact_pii,
)
from hummingbirddatapipeline_spark.operators.contamination import (
    ngram_contamination,
)
from hummingbirddatapipeline_spark.operators.sampling import (
    _threshold_hex,
    hash_sample,
    sample_per_group,
    sample_token_budget,
    split_train_holdout,
    stratified_sample,
)
from hummingbirddatapipeline_spark.tables import load
from hummingbirddatapipeline_spark.catalog.dedup_q import DUCK_JACCARD_CC_CTES

_T10 = _threshold_hex(0.10)
_T25 = _threshold_hex(0.25)
_T05 = _threshold_hex(0.05)


@query(
    "sample_hash_fraction",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS STRING) || ':s0'), 1, 4) < '{_T10}'
    ORDER BY doc_id
    """,
)
def sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% content-hash sample: stable under reruns,
    repartitioning, and cluster resizing (df.sample is none of those);
    map-side filter only — no shuffle, no RNG state."""
    docs = load(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.10, seed="s0").select(
        "doc_id", "lang"
    )


@query(
    "sample_stratified_by_lang",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS STRING) || ':mix1'), 1, 4) <
      CASE WHEN lang = 'en' THEN '{_T25}'
           WHEN lang = 'zh' THEN '{_T10}'
           ELSE '{_T05}' END
    ORDER BY doc_id
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota mixing: keep 25% of English, 10% of Chinese, 5% of the
    rest — the language-rebalancing primitive of a training-data mix,
    still a single map-side filter."""
    docs = load(spark, sf_dir, "documents")
    return stratified_sample(
        docs,
        "doc_id",
        "lang",
        {"en": 0.25, "zh": 0.10},
        default_fraction=0.05,
        seed="mix1",
    ).select("doc_id", "lang", "source")


@query(
    "sample_per_source_cap",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS STRING) || ':cap'), 1, 4),
                        md5(CAST(doc_id AS STRING) || ':cap'),
                        doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 3
    ORDER BY doc_id
    """,
)
def sample_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap (hash-order reservoir, 3 docs/source): one
    shuffle on the group key, bounded output, same winners at any
    partitioning."""
    docs = load(spark, sf_dir, "documents")
    return sample_per_group(docs, "source", "doc_id", n=3, seed="cap").select(
        "doc_id", "source"
    )


@query(
    "sample_train_holdout_counts",
    oracle=f"""
    SELECT CASE WHEN substr(md5(CAST(doc_id AS STRING) || ':holdout'), 1, 4)
                < '{_T05}'
           THEN 'holdout' ELSE 'train' END AS split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY 1
    ORDER BY split
    """,
)
def sample_train_holdout_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 5% eval holdout: membership is recomputable from the key
    alone, so the split can never drift between pipeline runs."""
    docs = load(spark, sf_dir, "documents")
    tagged = split_train_holdout(docs, "doc_id", 0.05, seed="holdout")
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@query(
    "sample_token_budget_mix",
    oracle="""
    WITH sized AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens,
             substr(md5(CAST(doc_id AS STRING) || ':tok'), 1, 4) AS bk,
             md5(CAST(doc_id AS STRING) || ':tok') AS fh
      FROM documents
    ),
    cum AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY bk, fh, doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS cum_tokens
      FROM sized
    )
    SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM cum
    WHERE cum_tokens <= CASE WHEN lang = 'en' THEN 2000 ELSE 500 END
    ORDER BY doc_id
    """,
)
def sample_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: admit docs per language in
    content-hash priority order until the language's TOKEN budget
    (2000 for English, 500 otherwise) is spent — deterministic,
    monotone in the budget, one shuffle on the stratum key."""
    docs = load(spark, sf_dir, "documents")
    out = sample_token_budget(
        docs,
        key_col="doc_id",
        strata_col="lang",
        text_col="text",
        budgets={"en": 2000},
        default_budget=500,
        seed="tok",
    )
    return out.select("doc_id", "lang", "n_tokens", "cum_tokens")


@query(
    "sample_temperature_mix",
    oracle="""
    WITH sized AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens,
             substr(md5(CAST(doc_id AS STRING) || ':tmix'), 1, 4) AS bk,
             md5(CAST(doc_id AS STRING) || ':tmix') AS fh
      FROM documents
    ),
    tot AS (
      SELECT lang, CAST(SUM(n_tokens) AS DOUBLE) AS nt FROM sized GROUP BY lang
    ),
    z AS (SELECT SUM(POW(nt, 0.3)) AS zsum FROM tot),
    quota AS (
      SELECT lang,
             CAST(FLOOR(ROUND(10000 * POW(nt, 0.3) / zsum, 6)) AS BIGINT)
               AS quota
      FROM tot CROSS JOIN z
    ),
    cum AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY bk, fh, doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS cum_tokens
      FROM sized
    )
    SELECT c.doc_id, c.lang, c.n_tokens,
           CAST(c.cum_tokens AS BIGINT) AS cum_tokens, q.quota
    FROM cum c JOIN quota q USING (lang)
    WHERE c.cum_tokens <= q.quota
    ORDER BY c.doc_id
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted language mixing (XLM-R, alpha=0.3): each
    language's token quota is computed FROM the corpus as
    ``floor(B * n_lang^alpha / sum(n^alpha))`` — flattening the en-heavy
    skew so low-resource languages are upweighted — then documents are
    admitted in content-hash priority order until the quota is spent.
    Deterministic end-to-end; DuckDB recomputes the quota arithmetic
    and the admission window identically."""
    from hummingbirddatapipeline_spark.operators.sampling import (
        sample_temperature_mix as _tmix,
    )

    docs = load(spark, sf_dir, "documents")
    out = _tmix(
        docs,
        key_col="doc_id",
        strata_col="lang",
        text_col="text",
        total_budget=10000,
        alpha=0.3,
        seed="tmix",
    )
    return out.select("doc_id", "lang", "n_tokens", "cum_tokens", "quota")


# shared synthetic PII injection (the corpus itself is clean word soup):
# deterministic per doc, same SQL shape on both engines
_INJECT_SQL = (
    "CONCAT(substr(text, 1, 20), ' email u', CAST(doc_id AS STRING),"
    " '@corp.example.org call (415) 555-',"
    " lpad(CAST(doc_id % 10000 AS STRING), 4, '0'),"
    " ' ssn 123-45-6789 ip 10.0.', CAST(doc_id % 256 AS STRING), '.7 end')"
)


def _duck_redact(expr: str) -> str:
    out = expr
    for pat, rep in PII_PATTERNS:
        escaped = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{rep}', 'g')"
    return out


@query(
    "text_redact_pii",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id, {_INJECT_SQL} AS raw FROM documents
    )
    SELECT doc_id,
           {_duck_redact("raw")} AS redacted,
           regexp_matches(raw, '{PII_PATTERNS[0][0]}') AS has_email,
           regexp_matches(raw, '{PII_PATTERNS[1][0]}') AS has_ssn,
           regexp_matches(raw, '{PII_PATTERNS[2][0]}') AS has_phone,
           regexp_matches(raw, '{PII_PATTERNS[3][0]}') AS has_ip
    FROM injected
    ORDER BY doc_id
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction bank over deterministically injected PII: emails,
    SSNs, phones, IPv4, replaced in a fixed order by RE2-compatible
    regexes — pure regexp_replace chain, no UDFs, verified verbatim
    against DuckDB."""
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    injected = spark.sql(f"SELECT doc_id, {_INJECT_SQL} AS raw FROM documents")
    flagged = injected.withColumn("f", pii_flags(F.col("raw")))
    return flagged.select(
        "doc_id",
        redact_pii(F.col("raw")).alias("redacted"),
        F.col("f.has_email").alias("has_email"),
        F.col("f.has_ssn").alias("has_ssn"),
        F.col("f.has_phone").alias("has_phone"),
        F.col("f.has_ip").alias("has_ip"),
    )


@query(
    "text_contamination_check",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
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
    )
    SELECT g.doc_id,
           CAST(len(g.gs) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit_grams,
           COALESCE(h.n_hit, 0) >= 1 AS contaminated
    FROM grams g LEFT JOIN hits h USING (doc_id)
    WHERE g.doc_id >= 20
    ORDER BY g.doc_id
    """,
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs 0-19 stand in as the eval set;
    every training doc reports how many of its distinct word 5-grams
    collide with it. Broadcast hash join on the n-gram — the corpus
    never shuffles."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 20)
    train = docs.filter(F.col("doc_id") >= 20)
    out = ngram_contamination(train, bench, n=5)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hit_grams").cast("long").alias("n_hit_grams"),
        "contaminated",
    )


@query(
    "sample_split_leakfree",
    oracle=f"""
    WITH RECURSIVE {DUCK_JACCARD_CC_CTES}
    SELECT d.doc_id,
           COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           CASE WHEN substr(md5(CAST(COALESCE(c.cluster_id, d.doc_id)
                                     AS STRING) || ':split0'), 1, 4)
                     < '{_T10}'
                THEN 'val' ELSE 'train' END AS split
    FROM documents d LEFT JOIN cc c ON c.node = d.doc_id
    ORDER BY d.doc_id
    """,
)
def sample_split_leakfree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free train/val split under the full oracle gate: near-dup
    clusters (exact Jaccard >= 0.85 graph closed by connected
    components) are assigned to splits as units via the deterministic
    md5 cluster-id bucket, so no validation doc has a train near-dup.
    DuckDB recomputes clusters (recursive CTE) and the identical md5
    arithmetic; the driver hashes every (doc, cluster, split) row."""
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_cc,
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.operators.sampling import split_leakfree

    docs = load(spark, sf_dir, "documents")
    pairs = shared_jaccard_pairs(spark, sf_dir)
    return split_leakfree(
        docs.select("doc_id"), pairs, val_fraction=0.10, seed="split0",
        labels=shared_jaccard_cc(spark, sf_dir),
    )


_DUCK_8GRAMS = """
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 8
                    THEN list_distinct(list_transform(range(len(t) - 7),
                         i -> array_to_string(t[i + 1 : i + 8], ' ')))
                    ELSE []::VARCHAR[] END) AS g
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> x <> '') AS t
            FROM documents)"""


def _duck_overlap_row(method: str, split_cte: str) -> str:
    return f"""
    SELECT '{method}' AS split_method,
           d.n_train_docs, d.n_val_docs,
           CAST(SUM(f.iv) AS BIGINT) AS n_val_grams,
           CAST(SUM(f.iv * f.it) AS BIGINT) AS n_overlap_grams,
           ROUND(CAST(SUM(f.iv * f.it) AS DOUBLE)
                 / CAST(SUM(f.iv) AS DOUBLE), 6) AS overlap_frac
    FROM (
      SELECT g.g,
             MAX(CASE WHEN s.split = 'train' THEN 1 ELSE 0 END) AS it,
             MAX(CASE WHEN s.split = 'val' THEN 1 ELSE 0 END) AS iv
      FROM grams g JOIN {split_cte} s USING (doc_id) GROUP BY g.g
    ) f
    CROSS JOIN (
      SELECT CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_train_docs,
             CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_val_docs
      FROM {split_cte}
    ) d
    GROUP BY d.n_train_docs, d.n_val_docs"""


@query(
    "sample_split_ngram_overlap",
    oracle=f"""
    WITH RECURSIVE {DUCK_JACCARD_CC_CTES},
    leak AS (
      SELECT d.doc_id,
             CASE WHEN substr(md5(CAST(COALESCE(c.cluster_id, d.doc_id)
                                       AS STRING) || ':split0'), 1, 4)
                       < '{_T10}'
                  THEN 'val' ELSE 'train' END AS split
      FROM documents d LEFT JOIN cc c ON c.node = d.doc_id
    ),
    naive AS (
      SELECT doc_id,
             CASE WHEN substr(md5(CAST(doc_id AS STRING) || ':split0'),
                              1, 4) < '{_T10}'
                  THEN 'val' ELSE 'train' END AS split
      FROM documents
    ),
    grams AS ({_DUCK_8GRAMS}
    )
    {_duck_overlap_row("leakfree_cluster", "leak")}
    UNION ALL
    {_duck_overlap_row("naive_doc_hash", "naive")}
    ORDER BY split_method
    """,
)
def sample_split_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split-leakage AUDIT: distinct word 8-gram overlap between
    the val and train sides, measured for BOTH the cluster-unit
    leak-free split and a naive doc-hash split at the same fraction and
    seed. The side-by-side is the point — cluster-unit assignment must
    not exceed the naive split's leakage, and the driver hashes every
    field of both report rows (doc counts, gram counts, overlap
    fraction), so a regression in the splitter, the CC closure, or the
    gram pipeline moves a number and goes red.

    r11 plan fix: both splitters now ride ONE corpus gram explode
    (split_ngram_overlap_multi — the pre-r11 per-splitter calls cost
    two explodes, flagged by tools/scan_audit.py); values verified
    identical to the per-splitter form."""
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_cc,
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.operators.sampling import (
        _bucket_hex,
        split_leakfree,
        split_ngram_overlap_multi,
    )

    docs = load(spark, sf_dir, "documents", fanout=True)
    pairs = shared_jaccard_pairs(spark, sf_dir)
    lf = split_leakfree(
        docs.select("doc_id"), pairs, val_fraction=0.10, seed="split0",
        labels=shared_jaccard_cc(spark, sf_dir),
    ).select("doc_id", "split")
    naive = docs.select(
        "doc_id",
        F.when(
            _bucket_hex(F.col("doc_id"), "split0") < F.lit(_T10), "val"
        )
        .otherwise("train")
        .alias("split"),
    )
    return split_ngram_overlap_multi(
        docs, [("leakfree_cluster", lf), ("naive_doc_hash", naive)]
    )


@query(
    "sample_weighted_aes",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             -ln((CAST('0x' || substr(md5(CAST(doc_id AS STRING) || ':r7'),
                                      1, 13) AS BIGINT) + 0.5)
                 / 4503599627370496.0)
             / CAST(n_chars AS DOUBLE) AS rk
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, lang,
           CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY rk, doc_id)
                AS INT) AS sample_rank
    FROM scored
    QUALIFY sample_rank <= 5
    ORDER BY lang, sample_rank
    """,
)
def sample_weighted_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006
    A-ES): top-5 docs per language, probability proportional to
    n_chars — the quality/length-weighted corpus subsampling
    primitive. Randomness is content-hash derived (md5 52-bit
    uniforms), so the draw is rerun-stable and BOTH engines recompute
    the identical exponential rank -ln(u)/w; the oracle re-runs the
    whole draw in SQL. One window shuffle on the stratum key."""
    from hummingbirddatapipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("wgt")
    )
    return weighted_sample_topk(
        docs, "doc_id", "wgt", k=5, seed="r7", strata_col="lang"
    ).select("doc_id", "lang", "sample_rank")


@query(
    "sample_contrastive_negatives",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rnk,
             COUNT(*) OVER () AS n
      FROM documents
    ),
    draws AS (
      SELECT doc_id, rnk, n, UNNEST([1, 2, 3, 4]) AS neg_rank
      FROM ranked
    ),
    resolved AS (
      SELECT d.doc_id, d.neg_rank,
             CASE WHEN raw >= d.rnk THEN raw + 1 ELSE raw END AS tgt
      FROM (
        SELECT *,
               (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                     CAST(neg_rank AS VARCHAR) || ':r8'), 1, 13) AS BIGINT)
                % (n - 1)) + 1 AS raw
        FROM draws) d
    )
    SELECT r.doc_id, CAST(r.neg_rank AS INT) AS neg_rank,
           l.doc_id AS neg_id
    FROM resolved r JOIN ranked l ON l.rnk = r.tgt
    ORDER BY r.doc_id, r.neg_rank
    """,
)
def sample_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling: each document draws
    4 pseudo-random OTHER documents (operators/sampling.
    contrastive_negatives) via 52-bit md5 content-hash uniforms over
    the skip-self rank trick — never an RNG, so the pairing is
    rerun/repartition-stable and DuckDB recomputes every draw from the
    same hashes. Two narrow shuffles (rank window + rank equi-join)
    and a k-element explode — no cross join at any scale."""
    from hummingbirddatapipeline_spark.operators.sampling import (
        contrastive_negatives,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return contrastive_negatives(docs, "doc_id", k=4, seed="r8")


# DuckDB replay of the hashed unigram+bigram featurizer inside
# operators/sampling.dsir_select (md5-bucketed grams, B=4096).
_DSIR_GRAM_CTE = """
      SELECT doc_id,
             CAST('0x' || substr(md5(g), 1, 13) AS BIGINT) % 4096 AS bucket
      FROM (
        SELECT doc_id, unnest(list_concat(t,
                 list_transform(list_zip(
                     t[1:len(t)-1], t[2:len(t)]),
                   p -> p[1] || ' ' || p[2]))) AS g
        FROM (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '') AS t
          FROM documents {where}))
    """


@query(
    "sample_dsir_select",
    oracle=f"""
    WITH tg AS ({_DSIR_GRAM_CTE.format(where="WHERE lang = 'en'")}),
    rg AS ({_DSIR_GRAM_CTE.format(where="")}),
    tc AS (SELECT bucket, CAST(COUNT(*) AS DOUBLE) AS t_n
           FROM tg GROUP BY bucket),
    rc AS (SELECT bucket, CAST(COUNT(*) AS DOUBLE) AS r_n
           FROM rg GROUP BY bucket),
    tt AS (SELECT SUM(t_n) AS t_total FROM tc),
    rt AS (SELECT SUM(r_n) AS r_total FROM rc),
    ratio AS (
      SELECT rc.bucket,
             ln((COALESCE(tc.t_n, 0.0) + 1.0) / (tt.t_total + 1.0 * 4096))
             - ln((rc.r_n + 1.0) / (rt.r_total + 1.0 * 4096)) AS log_ratio
      FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tt CROSS JOIN rt
    ),
    w AS (
      SELECT g.doc_id, ROUND(SUM(r.log_ratio), 6) AS dsir_logweight
      FROM rg g JOIN ratio r USING (bucket)
      GROUP BY g.doc_id
    ),
    keyed AS (
      SELECT doc_id, dsir_logweight,
             ROUND(dsir_logweight
               - ln(-ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                     || ':r9'), 1, 13) AS BIGINT) + 0.5) / 4503599627370496.0))
               , 6) AS gumbel_key
      FROM w
    )
    SELECT doc_id, dsir_logweight, gumbel_key,
           CAST(rk AS BIGINT) AS sample_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY gumbel_key DESC, doc_id) AS rk
      FROM keyed) WHERE rk <= 50
    """,
)
def sample_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al., NeurIPS 2023) under the
    FULL oracle gate: target = the English documents, raw = the whole
    pool; hashed unigram+bigram models fit over both (md5 buckets,
    B=4096, add-1 smoothing), every raw doc weighted by its importance
    log-ratio, and the k=50 sample drawn with content-hash
    Gumbel-top-k — deterministic, rerun/repartition-stable, never an
    RNG. DuckDB refits both models and rebuilds every log-ratio,
    per-doc weight, and Gumbel key from the same md5 arithmetic, so it
    must select the IDENTICAL 50 documents. Selection is genuinely
    weight-driven: the picked set skews toward the target language
    (asserted in tests/test_r9_oracles.py).

    Scale shape: two explode+count aggregates, one broadcast join of
    the <= B log-ratio table onto the raw gram stream, one rank
    window — nothing joins corpus-to-corpus."""
    from hummingbirddatapipeline_spark.operators.sampling import dsir_select

    docs = load(spark, sf_dir, "documents", fanout=True).select("doc_id", "text", "lang")
    # target as a PREDICATE over the pool (r15): the en exemplar set is
    # a subset of raw, so the operator fits both models off ONE
    # checkpointed gram stream instead of re-scanning the en slice
    # (identical counts; 3 md5-gram passes -> 1, see dsir_select)
    return dsir_select(
        docs, None, k=50, n_buckets=4096, smoothing=1.0, seed="r9",
        target_pred=F.col("lang") == "en",
    )


# --- r11-banked oracle builder (NOT yet registered: the r10 driver
# window is full; recipe: PLANS.md "r11 registration recipe").

def _doremi_reweight_sql(
    lr: float = 100.0, eps: float = 0.3, budget: int = 1_000_000
) -> str:
    """Independent DuckDB formulation of the DoReMi one-step domain
    reweight: rebuilds the corpus unigram LM, the per-domain exact
    decimal cross-entropy sums, the clipped excess, and the smoothed
    exponentiated-gradient shares from the raw documents table."""
    return f"""
    WITH tok AS (
      SELECT source AS domain,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    cnt AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY w),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM tok),
    term AS (
      SELECT domain,
             CAST(ROUND(-LN(c / t), 10) AS DECIMAL(20,10)) AS nll
      FROM tok JOIN cnt USING (w) CROSS JOIN tot
    ),
    dom AS (
      SELECT domain, COUNT(*) AS n_tokens, SUM(nll) AS s
      FROM term GROUP BY domain
    ),
    agg AS (
      SELECT SUM(dom.s) AS sum_all, SUM(n_tokens) AS n_all,
             COUNT(*) AS n_dom
      FROM dom
    ),
    ex AS (
      SELECT domain, CAST(dom.n_tokens AS BIGINT) AS n_tokens,
             ROUND(CAST(dom.s AS DOUBLE) / dom.n_tokens, 6) AS ce,
             GREATEST(0.0,
               ROUND(ROUND(CAST(dom.s AS DOUBLE) / dom.n_tokens, 6)
                     - ROUND(CAST(a.sum_all AS DOUBLE)
                             / CAST(a.n_all AS DOUBLE), 6), 6))
               AS excess,
             CAST(dom.n_tokens AS DOUBLE) / CAST(a.n_all AS DOUBLE)
               * EXP({lr} * GREATEST(0.0,
                   ROUND(ROUND(CAST(dom.s AS DOUBLE) / dom.n_tokens, 6)
                         - ROUND(CAST(a.sum_all AS DOUBLE)
                                 / CAST(a.n_all AS DOUBLE), 6),
                         6))) AS wgt,
             CAST(a.n_dom AS BIGINT) AS n_dom
      FROM dom CROSS JOIN agg a
    ),
    z AS (SELECT SUM(wgt) AS z_norm FROM ex)
    SELECT domain, n_tokens, ce, excess,
           ROUND((1.0 - {eps}) * wgt / z.z_norm + {eps} / n_dom, 6)
             AS doremi_share,
           CAST(FLOOR(ROUND({float(budget)}
                 * ((1.0 - {eps}) * wgt / z.z_norm + {eps} / n_dom), 6))
             AS BIGINT) AS target_tokens
    FROM ex CROSS JOIN z
    """


@query(
    "sample_doremi_reweight",
    oracle=_doremi_reweight_sql(100.0, 0.3, 1_000_000),
)
def sample_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi one-step domain reweighting (Xie et al., NeurIPS 2023)
    under the full oracle gate (operators/sampling.doremi_reweight):
    per-domain excess loss (corpus unigram CE vs corpus-wide CE,
    clipped at 0) drives the exponentiated-gradient update
    w_d ∝ ref_d * exp(lr * excess_d), smoothed
    (1-eps)*w/Z + eps/K, emitting per-domain token targets for the
    next mixture. DuckDB rebuilds the unigram LM, the exact decimal CE
    sums, and the EG update from the raw documents table. Determinism:
    per-token surprisal ROUND(-ln, 10) summed as DECIMAL(20,10) —
    exact, associative, overflow-free at any corpus size (the pagerank
    exact-longs regime applied from day one); lr=0 reduces to the
    smoothed natural mixture and raising lr strictly upweights the
    max-excess domain (both pinned in tests/test_r11_oracles.py).

    Scale shape: one token explode + broadcast count join (the
    unigram_logprob plan), one hash aggregate to K domain rows, then
    K-row arithmetic — nothing corpus-to-corpus."""
    from hummingbirddatapipeline_spark.operators.sampling import (
        doremi_reweight,
    )

    docs = load(spark, sf_dir, "documents")
    return doremi_reweight(docs, lr=100.0, eps=0.3, token_budget=1_000_000)


def _unimax_sql(token_budget: int, n_epochs: float = 4.0) -> str:
    """Independent DuckDB formulation of UniMax waterfilling
    (operators/sampling.unimax_allocation): per-language caps
    ``floor(n_epochs * n_tokens)``, the ascending-cap window test
    ``cap_i * (K - i + 1) <= budget - prefix_{i-1}`` (exact BIGINT),
    and integer-floor equal shares for the uncapped tail."""
    return f"""
    WITH per AS (
      SELECT lang,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '')) AS t
      FROM documents
    ),
    base AS (
      SELECT lang, CAST(SUM(t) AS BIGINT) AS n_tokens,
             CAST(FLOOR(ROUND({float(n_epochs)} * SUM(t), 6)) AS BIGINT)
               AS cap_tokens
      FROM per GROUP BY lang
    ),
    kk AS (SELECT COUNT(*) AS k FROM base),
    ranked AS (
      SELECT base.*, kk.k,
             ROW_NUMBER() OVER (ORDER BY cap_tokens, lang) AS i,
             COALESCE(SUM(cap_tokens) OVER (
               ORDER BY cap_tokens, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS pfx
      FROM base CROSS JOIN kk
    ),
    tagged AS (
      SELECT *,
             cap_tokens * (k - i + 1) <= {int(token_budget)} - pfx
               AS is_capped
      FROM ranked
    ),
    stats AS (
      SELECT COALESCE(SUM(CASE WHEN is_capped THEN cap_tokens END), 0)
               AS csum,
             COALESCE(SUM(CASE WHEN is_capped THEN 1 END), 0) AS ncap
      FROM tagged
    ),
    alloc AS (
      SELECT lang, n_tokens, cap_tokens, is_capped,
             CASE WHEN is_capped THEN cap_tokens
                  WHEN k - ncap > 0 THEN
                    CAST(FLOOR(CAST({int(token_budget)} - csum AS DOUBLE)
                               / (k - ncap)) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS alloc_tokens
      FROM tagged CROSS JOIN stats
    )
    SELECT lang, n_tokens, cap_tokens, is_capped, alloc_tokens,
           ROUND(CAST(alloc_tokens AS DOUBLE) / n_tokens, 6)
             AS epochs_used
    FROM alloc
    """


@query("sample_unimax_budget", oracle=_unimax_sql(100_000, 4.0))
def sample_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-budget waterfilling (Chung et al. 2023,
    arXiv:2304.09151) under the full oracle gate
    (operators/sampling.unimax_allocation): per-language caps
    floor(n_epochs * n_tokens); the ascending-cap window test
    cap_i * (K - i + 1) <= budget - prefix_{i-1} replaces the
    sequential greedy EXACTLY (the test is monotone along the sort —
    proof in the operator docstring); the uncapped tail gets
    integer-floor equal shares. All compares are BIGINT (multiply,
    never divide), so the allocation is hash-exact under any
    partitioning. Three regimes pinned in tests/test_r12_oracles.py:
    mixed (this fixture), tiny budget -> pure equal split, huge
    budget -> everyone capped at exactly n_epochs.

    Scale shape: ONE aggregate to K language rows (ws_token_count per
    doc, no explode), then K-row window arithmetic over checkpointed
    bounded model state — the corpus never appears in the final plan
    (plan-contract-pinned: no FileScan)."""
    from hummingbirddatapipeline_spark.operators.sampling import (
        unimax_allocation,
    )

    docs = load(spark, sf_dir, "documents")
    return unimax_allocation(docs, token_budget=100_000, n_epochs=4.0)


def _interleave_sql(seed: str = "mix0") -> str:
    """Independent DuckDB formulation of stride-scheduled interleave
    ordering (operators/sampling.interleave_order): where the Spark
    side computes each row's global position in CLOSED FORM (K-term
    div/mod sum, no global sort), the oracle counts predecessors
    PAIRWISE — for every row, 1 + the number of rows strictly earlier
    by exact cross-multiplied virtual time (b.i * a.wt < a.i * b.wt)
    or tied with a lexically smaller source. O(n^2) integer compares:
    fine at oracle scale, and genuinely independent of the closed
    form. Weights = per-source BIGINT n_chars mass, re-derived here."""
    return f"""
    WITH w AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS wt
      FROM documents GROUP BY source
    ),
    ordered AS (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':{seed}'), doc_id)
               AS BIGINT) AS i
      FROM documents
    ),
    j AS (
      SELECT o.doc_id, o.source, o.i, w.wt
      FROM ordered o JOIN w USING (source)
    )
    SELECT a.doc_id, a.source, a.i AS src_seq,
           CAST(1 + SUM(CASE WHEN b.i * a.wt < a.i * b.wt
                              OR (b.i * a.wt = a.i * b.wt
                                  AND b.source < a.source)
                         THEN 1 ELSE 0 END) AS BIGINT) AS global_seq
    FROM j a, j b
    GROUP BY a.doc_id, a.source, a.i
    """


@query("sample_interleave_order", oracle=_interleave_sql("mix0"))
def sample_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-scheduled deterministic mixture ordering
    (operators/sampling.interleave_order) under the full oracle gate —
    the megatron-style blended-dataset order as a CLOSED FORM: each
    source's docs take content-addressed within-source ranks; a doc's
    global position is its virtual time's predecessor count, computed
    per source pair with exact integer arithmetic — NO global sort, NO
    range exchange. Source weights are the per-source n_chars totals
    (the temperature-mix shape). DuckDB counts predecessors pairwise
    (O(n^2) exact compares) against Spark's closed form; the X X Y
    stride pattern and prefix proportionality are pinned in
    tests/test_r15_oracles.py.

    Scale shape: one source-keyed window for within-source ranks, then
    pure map-side arithmetic against the K-row broadcast weight table —
    a 100 TB mixture gets a total order with zero global exchanges."""
    from hummingbirddatapipeline_spark.operators.sampling import (
        interleave_order,
    )

    docs = load(spark, sf_dir, "documents")
    weights = {
        r["source"]: r["w"]
        for r in docs.groupBy("source")
        .agg(F.sum("n_chars").alias("w"))
        .collect()
    }
    return interleave_order(docs, weights)


def _epoch_plan_sql(
    token_budget: int, n_epochs: float = 4.0, seed: str = "ep0"
) -> str:
    """Independent DuckDB formulation of the budget -> order
    composition (operators/sampling.epoch_plan): nests the FULL UniMax
    waterfilling (_unimax_sql) to derive per-language stride weights
    (zero-allocation languages drop out of the epoch), then counts
    predecessors pairwise with exact cross-multiplied integer compares
    — independent of the Spark side's closed form."""
    return f"""
    WITH w AS (
      SELECT lang, alloc_tokens AS wt
      FROM ({_unimax_sql(token_budget, n_epochs)}) ua
      WHERE alloc_tokens > 0
    ),
    ordered AS (
      SELECT d.doc_id, d.lang,
             CAST(ROW_NUMBER() OVER (PARTITION BY d.lang
               ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':{seed}'),
                        d.doc_id) AS BIGINT) AS i
      FROM documents d JOIN w ON w.lang = d.lang
    ),
    j AS (
      SELECT o.doc_id, o.lang, o.i, w.wt
      FROM ordered o JOIN w USING (lang)
    )
    SELECT a.doc_id, a.lang, a.i AS lang_seq,
           CAST(1 + SUM(CASE WHEN b.i * a.wt < a.i * b.wt
                              OR (b.i * a.wt = a.i * b.wt
                                  AND b.lang < a.lang)
                         THEN 1 ELSE 0 END) AS BIGINT) AS global_seq
    FROM j a, j b
    GROUP BY a.doc_id, a.lang, a.i
    """


@query("sample_epoch_plan", oracle=_epoch_plan_sql(100_000, 4.0, "ep0"))
def sample_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget -> order epoch plan (operators/sampling.epoch_plan)
    under the full oracle gate — UniMax waterfilling (Chung et al.
    2023) COMPOSED with stride interleaving: the 100k-token budget
    allocates per-language quotas with the <= 4-epoch cap, quota-funded
    docs take content-addressed within-language ranks, and each doc's
    global position comes from the closed-form predecessor count — the
    full corpus-to-trainer ordering with zero range exchanges. DuckDB
    nests the complete waterfilling and counts predecessors pairwise;
    the total-order and in-language-monotonicity contracts are pinned
    in tests/test_r18_oracles.py.

    Scale shape: K-row waterfilling state (bounded model state), one
    language-keyed rank window, then map-side position arithmetic —
    the interleave_order geometry fed by the UniMax budget."""
    from hummingbirddatapipeline_spark.operators.sampling import epoch_plan

    docs = load(spark, sf_dir, "documents")
    return epoch_plan(docs, token_budget=100_000, n_epochs=4.0)


def _priority_sample_sql(
    k: int = 50, weight_col: str = "n_chars", seed: str = "pw0"
) -> str:
    """Independent DuckDB formulation of the exponential-priority
    weighted sample (operators/sampling.priority_weighted_sample):
    replays the md5 uniform, the -ln(u)/w key (6dp), and the
    (priority asc, id asc) top-k cut."""
    return f"""
    SELECT doc_id,
           CAST({weight_col} AS BIGINT) AS weight,
           ROUND(-ln((CAST(CAST('0x' || substr(
                  md5(CAST(doc_id AS VARCHAR) || ':{seed}'), 1, 13)
                  AS BIGINT) AS DOUBLE) + 1.0) / 4503599627370496.0)
                 / CAST({weight_col} AS DOUBLE), 6) AS priority,
           CAST(ROW_NUMBER() OVER (
             ORDER BY ROUND(-ln((CAST(CAST('0x' || substr(
                  md5(CAST(doc_id AS VARCHAR) || ':{seed}'), 1, 13)
                  AS BIGINT) AS DOUBLE) + 1.0) / 4503599627370496.0)
                 / CAST({weight_col} AS DOUBLE), 6) ASC, doc_id)
             AS INT) AS rank
    FROM documents WHERE {weight_col} > 0
    QUALIFY rank <= {k}
    """


@query(
    "sample_priority_weighted", oracle=_priority_sample_sql(50, "n_chars", "pw0")
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential priorities
    (Efraimidis & Spirakis 2006; operators/sampling.
    priority_weighted_sample, k=50 by n_chars) under the full oracle
    gate: each row draws a content-addressed md5 uniform (the repo's
    no-RNG rule), its key is -ln(u)/w, and the k smallest keys win —
    keys 6dp-rounded before the (key asc, id) cut so the cut is
    engine-deterministic. Repartition invariance, the
    overwhelming-weight-always-wins bias check, and zero-weight
    exclusion are pinned in tests/test_r29_oracles.py.

    Scale shape: map-side keys + ONE top-k window, no joins — a
    weighted corpus sample at 100 TB is one TakeOrdered-shaped
    pass."""
    from hummingbirddatapipeline_spark.operators.sampling import (
        priority_weighted_sample,
    )

    return priority_weighted_sample(
        load(spark, sf_dir, "documents"), k=50, weight_col="n_chars"
    )
