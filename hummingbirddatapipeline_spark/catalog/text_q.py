"""Text-analysis catalog queries over ``documents`` (north-star
extensions: token counting, quality scoring, language ID,
fingerprint/exact dedup, n-gram Jaccard near-dup). Each is backed by
the expression library in functions/text.py and differentially tested
against a hand-written DuckDB equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import bench_query, query
from hummingbirddatapipeline_spark.functions import text as TX
from hummingbirddatapipeline_spark.operators.dedup import exact_dedup, jaccard_pairs_prefix
from hummingbirddatapipeline_spark.tables import load

# DuckDB fragment: whitespace tokens with empties dropped
_DUCK_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')"
)
_DUCK_TOKS_CASED = (
    "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"
)


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_DUCK_TOKS_CASED}) AS n_tokens,
           length(text) AS n_chars,
           ROUND(list_sum(list_transform({_DUCK_TOKS_CASED}, t -> length(t)))
                 / NULLIF(len({_DUCK_TOKS_CASED}), 0), 4) AS mean_token_len
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.ws_token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        F.round(TX.mean_token_len(t), 4).alias("mean_token_len"),
    )


@query(
    "text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
        len({_DUCK_TOKS_CASED}) AS n_tok,
        length(regexp_replace(text, '\\s+', '', 'g')) AS nonspace,
        length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alnum,
        len(list_filter({_DUCK_TOKS},
            t -> t IN ('the','and','of','to','a','in','is','that','for','it')))
          AS stop_hits,
        list_sum(list_transform({_DUCK_TOKS_CASED}, t -> length(t))) AS tok_chars
      FROM documents
    )
    SELECT doc_id,
      ROUND((nonspace - alnum) / NULLIF(nonspace, 0), 6) AS punct_ratio,
      ROUND(stop_hits / NULLIF(n_tok, 0), 6) AS stopword_ratio,
      ROUND(CAST(
        (CASE WHEN n_tok >= 20 THEN 1.0 WHEN n_tok >= 5 THEN 0.5 ELSE 0.0 END) * 0.4
        + (CASE WHEN COALESCE((nonspace - alnum) / NULLIF(nonspace, 0), 0) <= 0.2
                THEN 1.0 ELSE 0.0 END) * 0.2
        + (CASE WHEN COALESCE(stop_hits / NULLIF(n_tok, 0), 0) >= 0.05
                THEN 1.0 ELSE 0.0 END) * 0.2
        + (CASE WHEN COALESCE(tok_chars / NULLIF(n_tok, 0), 0) BETWEEN 2.0 AND 12.0
                THEN 1.0 ELSE 0.0 END) * 0.2
        AS DOUBLE), 2) AS quality
    FROM t
    ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.round(TX.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(TX.stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(TX.quality_score(t), 2).alias("quality"),
    )


def _duck_hits(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_DUCK_TOKS}, t -> t IN ({lst})))"


@query(
    "text_lang_id",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang,
        {_duck_hits(TX.LANG_MARKERS['de'])} AS h_de,
        {_duck_hits(TX.LANG_MARKERS['en'])} AS h_en,
        {_duck_hits(TX.LANG_MARKERS['es'])} AS h_es,
        {_duck_hits(TX.LANG_MARKERS['fr'])} AS h_fr
      FROM documents
    ),
    pred AS (
      SELECT doc_id, lang,
        CASE WHEN GREATEST(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
             WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             WHEN h_es >= h_fr THEN 'es'
             ELSE 'fr' END AS lang_pred
      FROM h
    )
    SELECT lang_pred, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_match
    FROM pred GROUP BY lang_pred ORDER BY lang_pred
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("lang_pred", TX.lang_id(F.col("text")))
        .groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("lang_pred") == F.col("lang"), 1).otherwise(0)).alias(
                "n_match"
            ),
        )
    )


@query(
    "text_exact_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f,
             ROW_NUMBER() OVER (
               PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               ORDER BY doc_id) AS rn,
             COUNT(*) OVER (
               PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
               AS dup_count
      FROM documents
    )
    SELECT doc_id, dup_count FROM fp WHERE rn = 1 ORDER BY doc_id
    """,
)
def text_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").select("doc_id", "dup_count")


@query(
    "text_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.fingerprint(F.col("text")).alias("fingerprint")
    )


@query(
    "text_jaccard_near_dups",
    oracle=f"""
    WITH tok AS (
      -- contract-corpus cap (see row docstring): no-op at
      -- sf0.001/0.01/0.1
      SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS w
      FROM documents WHERE doc_id < 5000
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(inter / (sa.n + sb.n - inter), 6) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.id_a
    JOIN sizes sb ON sb.doc_id = p.id_b
    WHERE inter / (sa.n + sb.n - inter) >= 0.85
    ORDER BY id_a, id_b
    """,
)
def text_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs Jaccard >= 0.85 with full pair content under
    the oracle gate — the exact BASELINE the recall-contract rows
    compare against (AllPairs prefix filter, Bayardo et al.).

    CONTRACT-ROW FIXTURE CAP (r14 full-catalog sf1 sweep): on the
    TESTDATA-contract corpus (tiny vocabulary) the true pair set IS a
    constant fraction of all doc pairs, so this row's OUTPUT is
    Theta(n^2) by corpus construction (measured 111.1 s at sf1
    pre-cap). The exactness property is corpus-size-independent; the
    fixture pins doc_id < 5000 (no-op at sf0.001/0.01/0.1), oracle
    capped identically. The scale path for near-dup detection is the
    banded MinHash family (receipted on DISTINCT-mode replicas with
    constant dup density)."""
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 5000  # contract-corpus cap, see docstring
    )
    return jaccard_pairs_prefix(
        docs, "text", "doc_id", threshold=0.85, shingle_size=1
    )


@query(
    "text_chunk_documents",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sized AS (
      SELECT doc_id, t, len(t) AS n,
             CASE WHEN len(t) = 0 THEN 0
                  WHEN len(t) <= 64 THEN 1
                  ELSE 1 + ((len(t) - 64 + 47) // 48) END AS nc
      FROM toks
    ),
    expanded AS (
      SELECT doc_id, t, unnest(range(nc)) AS chunk_idx
      FROM sized WHERE nc > 0
    )
    SELECT doc_id,
           chunk_idx,
           array_to_string(t[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ')
             AS chunk_text,
           len(t[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS n_tokens
    FROM expanded
    ORDER BY doc_id, chunk_idx
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (64-token chunks, stride 48)
    as pure shuffle-free codegen; the oracle re-derives the same
    windows with DuckDB list slicing."""
    docs = load(spark, sf_dir, "documents")
    return TX.chunk_token_windows(
        docs, "text", "doc_id", chunk_tokens=64, stride=48
    )


@query(
    "text_pack_chunks",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sized AS (
      SELECT doc_id, source, t, len(t) AS n,
             CASE WHEN len(t) = 0 THEN 0
                  WHEN len(t) <= 64 THEN 1
                  ELSE 1 + ((len(t) - 64 + 47) // 48) END AS nc
      FROM toks
    ),
    expanded AS (
      SELECT doc_id, source, t, unnest(range(nc)) AS chunk_idx
      FROM sized WHERE nc > 0
    ),
    chunks AS (
      SELECT doc_id, source, chunk_idx,
             len(t[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS n_tokens
      FROM expanded
    ),
    binned AS (
      SELECT source,
             (SUM(n_tokens) OVER (
                PARTITION BY source ORDER BY doc_id, chunk_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens) // 512 AS bin_id,
             n_tokens
      FROM chunks
    )
    SELECT source, CAST(bin_id AS BIGINT) AS bin_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM binned
    GROUP BY 1, 2
    ORDER BY source, bin_id
    """,
)
def text_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chunk -> pack: sliding-window chunks packed into 512-token bins
    per source via start-offset binning (functions.text.pack_token_bins)
    — one window shuffle per pack group, reproduced in DuckDB with the
    identical window-SQL arithmetic."""
    docs = load(spark, sf_dir, "documents")
    chunks = TX.chunk_token_windows(
        docs, "text", "doc_id", chunk_tokens=64, stride=48
    ).join(docs.select("doc_id", "source"), "doc_id")
    packed = TX.pack_token_bins(
        chunks, "source", ["doc_id", "chunk_idx"], "n_tokens", budget=512
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@query(
    "text_repetition_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, length(text) AS chars, {_DUCK_TOKS_CASED} AS t
      FROM documents
    ),
    exploded AS (
      SELECT doc_id, chars,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS g
      FROM toks
    ),
    per_gram AS (
      SELECT doc_id, chars, g, COUNT(*) AS c
      FROM exploded GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id
        ORDER BY c DESC, length(g) DESC, g DESC) AS rn
      FROM per_gram
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_grams,
             CAST(MAX(CASE WHEN rn = 1 THEN c END) AS BIGINT)
               AS top_gram_count,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS rep,
             CAST(MAX(CASE WHEN rn = 1 THEN length(g) * c END) AS BIGINT)
               AS topchars,
             MAX(chars) AS chars
      FROM ranked GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_grams, 0) AS n_grams,
           COALESCE(a.top_gram_count, 0) AS top_gram_count,
           COALESCE(FLOOR(a.rep / NULLIF(CAST(a.n_grams AS DOUBLE), 0.0)
                          * 1000000 + 0.5) / 1000000, 0.0)
             AS rep_instance_frac,
           COALESCE(FLOOR(a.topchars / NULLIF(CAST(a.chars AS DOUBLE), 0.0)
                          * 1000000 + 0.5) / 1000000, 0.0)
             AS top_gram_char_frac,
           COALESCE(a.topchars / NULLIF(CAST(a.chars AS DOUBLE), 0.0), 0.0)
             > 0.20 AS repetitive
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style word-2-gram repetition signals per document
    (functions.text.repetition_stats) under the full oracle gate: the
    boilerplate/spam quality heuristic a curation funnel gates on.
    One explode + two hash aggregations; the top gram is chosen by a
    total order (count, length, gram) so both engines agree exactly."""
    docs = load(spark, sf_dir, "documents", fanout=True)
    return TX.repetition_stats(docs, "text", "doc_id", n=2)


@query(
    "text_substring_dup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS_CASED} AS t FROM documents
    ),
    sized AS (
      SELECT doc_id, t,
             CASE WHEN len(t) = 0 THEN 0
                  WHEN len(t) <= 20 THEN 1
                  ELSE 1 + ((len(t) - 20 + 4) // 5) END AS nc
      FROM toks
    ),
    wins AS (
      SELECT doc_id, t, unnest(range(nc)) AS i FROM sized WHERE nc > 0
    ),
    full_wins AS (
      SELECT doc_id,
             md5(array_to_string(t[i * 5 + 1 : i * 5 + 20], ' ')) AS wh
      FROM wins
      WHERE len(t[i * 5 + 1 : i * 5 + 20]) = 20
    ),
    occ AS (SELECT wh, COUNT(*) AS c FROM full_wins GROUP BY wh),
    per_doc AS (
      SELECT f.doc_id,
             CAST(COUNT(*) AS BIGINT) AS nw,
             CAST(SUM(CASE WHEN o.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS nd
      FROM full_wins f JOIN occ o USING (wh)
      GROUP BY f.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.nw, 0) AS n_windows,
           COALESCE(p.nd, 0) AS n_dup_windows,
           COALESCE(FLOOR(p.nd / NULLIF(CAST(p.nw AS DOUBLE), 0.0)
                          * 1000000 + 0.5) / 1000000, 0.0) AS dup_window_frac
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def text_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level duplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499), Spark-first: the suffix-array scan is
    re-expressed as fixed-stride token windows (20 tokens, stride 5)
    hashed and counted corpus-wide — a window whose hash occurs at
    more than one (doc, position) marks duplicated substring content.
    Per doc: window count, duplicated-window count, duplicated
    fraction.

    Scale shape: chunking is per-row codegen (no shuffle); one
    hash-aggregation on the 16-byte window hash + one join back —
    never the window strings; the corpus-wide occurrence table is the
    only shuffled state.
    """
    # fanout (r15 second pass): the stride-1 window-hash scan is a
    # single-task CPU stage at bench scale; isolated interleaved A/B
    # wins all 3 rounds (the earlier blanket-fan-out "loss" for this
    # row was VM noise — OPTIMIZATION_r15.md)
    docs = load(spark, sf_dir, "documents", fanout=True)
    wins = (
        TX.chunk_token_windows(docs, "text", "doc_id", chunk_tokens=20, stride=5)
        .filter(F.col("n_tokens") == 20)
        # xxhash64, not md5: the hash is internal dedup state (the oracle
        # compares only the resulting counts), and an 8-byte long
        # shuffles 4x smaller than a 32-hex digest and hashes ~10x
        # cheaper than a cryptographic md5
        .select("doc_id", F.xxhash64("chunk_text").alias("wh"))
    )
    occ = wins.groupBy("wh").agg(F.count("*").alias("c"))
    q6 = lambda x: F.floor(x * 1000000 + 0.5) / 1000000  # noqa: E731
    per_doc = (
        wins.join(occ, "wh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("nw"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("nd"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("nw", F.lit(0)).alias("n_windows"),
            F.coalesce("nd", F.lit(0)).alias("n_dup_windows"),
            F.coalesce(
                q6(F.col("nd") / F.nullif(F.col("nw").cast("double"), F.lit(0.0))),
                F.lit(0.0),
            ).alias("dup_window_frac"),
        )
    )


_BM25_TERMS = ("hash", "join", "vector")
_BM25_K, _BM25_K1, _BM25_B = 10, 1.2, 0.75


# Shared DuckDB fragment: BM25 scores for the literal query terms,
# ending in CTE ``bm25_ranked`` (doc_id, score, rank). Prefix with
# WITH; reused by the hybrid-RRF oracle in similarity_q.py.
DUCK_BM25_CTES = f"""toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(len({_DUCK_TOKS}) AS DOUBLE) AS dl FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
      WHERE w IN {_BM25_TERMS!r} GROUP BY doc_id, w
    ),
    dfs AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY w),
    bm25_scored AS (
      SELECT t.doc_id,
             ROUND(SUM(
               ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
               * t.tf * ({_BM25_K1} + 1)
               / (t.tf + {_BM25_K1}
                  * (1 - {_BM25_B} + {_BM25_B} * d.dl / s.avgdl))
             ), 6) AS score
      FROM tf t JOIN dfs f USING (w) JOIN dl d USING (doc_id)
      CROSS JOIN stats s
      GROUP BY t.doc_id
    ),
    bm25_ranked AS (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM bm25_scored
    )"""


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH {DUCK_BM25_CTES}
    SELECT doc_id, score, rank FROM bm25_ranked
    WHERE rank <= {_BM25_K}
    ORDER BY rank
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson & Zaragoza 2009, Lucene idf
    variant) for a literal query over ``documents`` — the lexical
    baseline of hybrid search next to similarity_cosine_topk, and the
    scorer behind keyword-driven curation pulls. Score rounded 6dp
    BEFORE ranking with doc_id tiebreak, so the top-k cut is identical
    on both engines."""
    from hummingbirddatapipeline_spark.operators.retrieval import bm25_topk

    docs = load(spark, sf_dir, "documents")
    return bm25_topk(
        docs, list(_BM25_TERMS), k=_BM25_K, k1=_BM25_K1, b=_BM25_B
    )


@query(
    "text_unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    counts AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY w),
    tot AS (SELECT SUM(c) AS t FROM counts),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             ROUND(AVG(-ln(c / t)), 4) AS mean_nll
      FROM toks JOIN counts USING (w) CROSS JOIN tot
      GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens, p.mean_nll
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram surprisal per document — the perplexity-filter
    shape (CCNet, Wenzek et al. 2020; Gopher's quality pipeline) with
    the LM reduced to its unigram core so the scorer is pure native
    expressions. High mean negative-log-likelihood marks docs whose
    token distribution is unusual for the corpus (noise/outliers); low
    marks boilerplate. The standard filter keeps the middle band."""
    from hummingbirddatapipeline_spark.operators.retrieval import (
        unigram_logprob,
    )

    docs = load(spark, sf_dir, "documents")
    return unigram_logprob(docs)


_BIGRAM_LAM = 0.9


@query(
    "text_bigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ),
    occ AS (SELECT doc_id, unnest(t) AS w FROM toks),
    uni AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS c FROM occ GROUP BY w),
    tot AS (SELECT SUM(c) AS t_occ FROM uni),
    big AS (
      SELECT doc_id, t[i + 1] AS w1, t[i + 2] AS w2
      FROM (SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2)
    ),
    dtf AS (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM big GROUP BY doc_id, w1, w2
    ),
    bg AS (SELECT w1, w2, SUM(tf) AS cb FROM dtf GROUP BY w1, w2),
    nll AS (
      SELECT b.w1, b.w2,
             -ln({_BIGRAM_LAM!r} * b.cb / u1.c
                 + {(1.0 - _BIGRAM_LAM)!r} * u2.c / t.t_occ) AS nll
      FROM bg b
      JOIN uni u1 ON b.w1 = u1.w
      JOIN uni u2 ON b.w2 = u2.w
      CROSS JOIN tot t
    ),
    per_doc AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
             ROUND(SUM(tf * nll) / SUM(tf), 4) AS mean_nll
      FROM dtf JOIN nll USING (w1, w2) GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(p.n_bigrams, 0) AS n_bigrams, p.mean_nll
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM surprisal per document (Jelinek–Mercer
    smoothing, lam=0.9 bigram / 0.1 unigram backoff) — the next
    fidelity step of the CCNet/Gopher perplexity-filter family after
    text_unigram_logprob, still 100% native expressions. The per-bigram
    NLL is computed once on the distinct-bigram table; both engines
    evaluate the identical double arithmetic, and the per-doc average
    is rounded 4dp for cross-engine sum-order stability."""
    from hummingbirddatapipeline_spark.operators.retrieval import (
        bigram_logprob,
    )

    docs = load(spark, sf_dir, "documents", fanout=True)
    return bigram_logprob(docs, lam=_BIGRAM_LAM)


@query(
    "text_substring_dup_stride1",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS_CASED} AS t FROM documents
    ),
    sized AS (
      SELECT doc_id, t,
             CASE WHEN len(t) >= 20 THEN len(t) - 19 ELSE 0 END AS nc
      FROM toks
    ),
    wins AS (
      SELECT doc_id, t, unnest(range(nc)) AS i FROM sized WHERE nc > 0
    ),
    full_wins AS (
      SELECT doc_id, md5(array_to_string(t[i + 1 : i + 20], ' ')) AS wh
      FROM wins
    ),
    occ AS (SELECT wh, COUNT(*) AS c FROM full_wins GROUP BY wh),
    s1 AS (
      SELECT f.doc_id,
             CAST(COUNT(*) AS BIGINT) AS nw,
             CAST(SUM(CASE WHEN o.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS nd
      FROM full_wins f JOIN occ o USING (wh)
      GROUP BY f.doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.nw, 0) AS n_windows_s1,
           COALESCE(s.nd, 0) AS n_dup_windows_s1,
           COALESCE(FLOOR(s.nd / NULLIF(CAST(s.nw AS DOUBLE), 0.0)
                          * 1000000 + 0.5) / 1000000, 0.0) AS dup_frac_s1
    FROM documents d LEFT JOIN s1 s USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def text_substring_dup_stride1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-1 fidelity twin of ``text_substring_dup``: the SAME
    Lee et al. 2022 duplicated-substring measure with EVERY 20-token
    window hashed (no stride approximation) — i.e. the exact
    sliding-window form the suffix-array algorithm detects, minus
    cross-boundary merges. Oracled end-to-end; diffing its
    ``dup_frac_s1`` against the production stride-5 ``dup_window_frac``
    quantifies exactly what the stride approximation trades away
    (stride-5 samples 1/5 of windows; a duplicated span shorter than
    ~24 tokens can fall between sampled offsets). Measured on the
    sf0.01 corpus: corpus mean dup-frac 0.0957 (s1) vs 0.0965 (s5),
    mean per-doc |gap| 0.0035, worst-case per-doc |gap| 0.33 on short
    docs — the stride form is a faithful corpus-level signal but not a
    per-short-doc one. Cost is ~5x the stride-5 windows — run it on
    audit samples, not the full corpus."""
    docs = load(spark, sf_dir, "documents", fanout=True)
    wins = (
        TX.chunk_token_windows(docs, "text", "doc_id", chunk_tokens=20, stride=1)
        .filter(F.col("n_tokens") == 20)
        # xxhash64, not md5: the hash is internal dedup state (the oracle
        # compares only the resulting counts), and an 8-byte long
        # shuffles 4x smaller than a 32-hex digest and hashes ~10x
        # cheaper than a cryptographic md5
        .select("doc_id", F.xxhash64("chunk_text").alias("wh"))
    )
    occ = wins.groupBy("wh").agg(F.count("*").alias("c"))
    q6 = lambda x: F.floor(x * 1000000 + 0.5) / 1000000  # noqa: E731
    per_doc = (
        wins.join(occ, "wh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("nw"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("nd"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("nw", F.lit(0)).alias("n_windows_s1"),
            F.coalesce("nd", F.lit(0)).alias("n_dup_windows_s1"),
            F.coalesce(
                q6(F.col("nd") / F.nullif(F.col("nw").cast("double"), F.lit(0.0))),
                F.lit(0.0),
            ).alias("dup_frac_s1"),
        )
    )


def _battery_grams_cte(n: int) -> str:
    return f"""
      SELECT doc_id, chars, {n} AS n,
             array_to_string(t[i + 1 : i + {n}], ' ') AS g
      FROM (SELECT doc_id, chars, t,
                   unnest(range(len(t) - {n} + 1)) AS i
            FROM btoks WHERE len(t) >= {n})"""


_BATTERY_NS = (2, 3, 4, 5, 6, 7, 8)
_BATTERY_METRIC = {
    n: (f"top_{n}gram_char_frac" if n <= 4 else f"dup_{n}gram_char_frac")
    for n in _BATTERY_NS
}
_BATTERY_PIVOT = ",\n           ".join(
    f"COALESCE(MAX(CASE WHEN n = {n} THEN "
    + ("topf" if n <= 4 else "dupf")
    + f" END), 0.0) AS {_BATTERY_METRIC[n]}"
    for n in _BATTERY_NS
)


@query(
    "text_repetition_battery",
    oracle=f"""
    WITH btoks AS (
      SELECT doc_id, length(text) AS chars, {_DUCK_TOKS_CASED} AS t
      FROM documents
    ),
    grams AS ({" UNION ALL ".join(_battery_grams_cte(n) for n in _BATTERY_NS)}
    ),
    per_gram AS (
      SELECT doc_id, chars, n, g, COUNT(*) AS c
      FROM grams GROUP BY doc_id, chars, n, g
    ),
    per_doc_n AS (
      SELECT doc_id, n,
             FLOOR(CAST(MAX(c * length(g)) AS DOUBLE)
                   / NULLIF(CAST(MAX(chars) AS DOUBLE), 0.0)
                   * 1000000 + 0.5) / 1000000 AS topf,
             FLOOR(LEAST(1.0,
                   CAST(SUM(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END)
                        AS DOUBLE)
                   / NULLIF(CAST(MAX(chars) AS DOUBLE), 0.0))
                   * 1000000 + 0.5) / 1000000 AS dupf
      FROM per_gram GROUP BY doc_id, n
    )
    SELECT d.doc_id,
           {_BATTERY_PIVOT}
    FROM documents d LEFT JOIN per_doc_n p USING (doc_id)
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
)
def text_repetition_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher repetition battery (Rae et al. 2021 §A1.1):
    top-{2,3,4}-gram and duplicated-{5,6,7,8}-gram character fractions
    per document, all seven gram sizes generated in ONE tagged explode
    (one corpus scan, two shuffles — not seven pipelines). The dup
    fractions use the standard occurrence-sum approximation of the
    interval-union definition, capped at 1.0 and documented."""
    from hummingbirddatapipeline_spark.functions.text import (
        repetition_battery,
    )

    docs = load(spark, sf_dir, "documents")
    return repetition_battery(docs, "text", "doc_id")


@query(
    "text_c4_filters",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_DUCK_TOKS_CASED}) AS BIGINT) AS n_words,
           contains(lower(text), 'lorem ipsum') AS has_lorem,
           contains(text, '{{') OR contains(text, '}}') AS has_brace,
           contains(lower(text), 'javascript') AS has_javascript,
           regexp_matches(rtrim(text), '[.!?"]$') AS ends_terminal,
           len({_DUCK_TOKS_CASED}) >= 5
             AND NOT contains(lower(text), 'lorem ipsum')
             AND NOT (contains(text, '{{') OR contains(text, '}}'))
             AND NOT contains(lower(text), 'javascript') AS c4_keep
    FROM documents
    ORDER BY doc_id
    """,
)
def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020 §2.2, public
    recipe) as one map-side projection: word-count floor, lorem-ipsum
    and curly-brace (code) and 'javascript' markers, terminal-
    punctuation check, and the composed keep verdict. Pure native
    string/regex expressions — a zero-shuffle scan at any corpus size;
    every signal and the verdict are hash-compared against DuckDB.
    (C4 also drops non-terminal LINES inside docs; this corpus is
    single-line, so the line rule reduces to the doc-level
    ends_terminal flag reported here.)"""
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    low = F.lower(t)
    n_words = TX.ws_token_count(t).cast("long")
    has_lorem = low.contains("lorem ipsum")
    has_brace = t.contains("{") | t.contains("}")
    has_js = low.contains("javascript")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_js.alias("has_javascript"),
        (F.rtrim(t).rlike(r'[.!?"]$')).alias("ends_terminal"),
        ((n_words >= 5) & ~has_lorem & ~has_brace & ~has_js).alias("c4_keep"),
    )


@bench_query("bench_bpe_train_segment")
def bench_bpe_train_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH-ONLY: tokenizer-vocabulary induction end to end — one
    corpus word-count aggregate, 12 BPE merge rounds on the dictionary
    frame, then the learned merges replayed over every document as a
    map-only segmentation chain (per-doc BPE token counts). The merge
    list is data-derived through an iterative driver loop, so there is
    no SQL oracle; correctness is the reference-implementation
    differential in tests/test_tokenization.py."""
    from hummingbirddatapipeline_spark.operators.tokenization import (
        bpe_segment,
        bpe_train,
        word_freq_table,
    )

    docs = load(spark, sf_dir, "documents")
    merges = bpe_train(word_freq_table(docs, "text"), n_merges=12)
    return bpe_segment(docs.select("doc_id", "text"), "text", merges).select(
        "doc_id", "n_bpe_tokens"
    )


def _bpe_frozen_oracle() -> str:
    """DuckDB replay of the FROZEN BPE merge list via chained
    boundary-safe string replaces — an independent formulation of
    merge-replay segmentation (operators/tokenization.bpe_segment
    replays the same artifact as array rewrites).

    Encoding: each symbol is wrapped as TAB..sym..NL, so a merge
    pattern (TAB l NL TAB r NL) can neither false-match inside a
    longer symbol (the TAB/NL boundaries force complete symbols) nor
    overlap an adjacent occurrence (no shared characters between
    matches) — string replace's left-to-right non-overlapping scan
    then implements exactly the published greedy merge rule. Tokens
    come from whitespace splitting, so no symbol can contain TAB/NL.
    """
    from hummingbirddatapipeline_spark.artifacts import BPE_MERGES

    seg = (
        "chr(9) || array_to_string(string_split(w, ''), chr(10) || chr(9))"
        " || chr(10) || chr(9) || '</w>' || chr(10)"
    )
    for m in BPE_MERGES:
        left, right = m["left"], m["right"]
        for sym in (left, right):
            if "'" in sym or "\t" in sym or "\n" in sym:
                raise ValueError(f"unsafe BPE symbol {sym!r}")
        pat = f"'\t{left}\n\t{right}\n'"
        rep = f"'\t{left}{right}\n'"
        seg = f"replace({seg}, {pat}, {rep})"
    return f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    vocab AS (SELECT DISTINCT unnest(t) AS w FROM toks),
    segd AS (SELECT w, {seg} AS s FROM vocab),
    segtok AS (
      SELECT w,
             CAST(length(s) - length(replace(s, chr(9), '')) AS INT)
               AS n_toks,
             trim(replace(s, chr(10) || chr(9), ' '), chr(9) || chr(10))
               AS toks_str
      FROM segd
    ),
    pos AS (
      SELECT doc_id, u[2] AS pos, u[1] AS w
      FROM (SELECT doc_id, unnest(list_zip(t, range(1, len(t) + 1))) AS u
            FROM toks)
    ),
    per_doc AS (
      SELECT p.doc_id,
             CAST(SUM(st.n_toks) AS INT) AS n_bpe_tokens,
             md5(string_agg(st.toks_str, ' ' ORDER BY p.pos))
               AS bpe_fingerprint
      FROM pos p JOIN segtok st USING (w)
      GROUP BY p.doc_id
    )
    SELECT d.doc_id,
           COALESCE(pd.n_bpe_tokens, 0) AS n_bpe_tokens,
           COALESCE(pd.bpe_fingerprint, md5('')) AS bpe_fingerprint
    FROM documents d LEFT JOIN per_doc pd USING (doc_id)
    ORDER BY d.doc_id
    """


@query("text_bpe_segment", oracle=_bpe_frozen_oracle())
def text_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization under the full oracle gate: every document is
    segmented by replaying the FROZEN merge artifact
    (artifacts.BPE_MERGES — learned once offline by the distributed
    trainer, whose greedy loop is separately differentialed against a
    pure-Python Sennrich reference in tests/test_tokenization.py), and
    the driver hashes each doc's token count plus an md5 fingerprint
    of the full space-joined token sequence. Spark replays merges as
    rank-ordered ``aggregate`` array rewrites ONCE PER UNIQUE WORD
    (broadcast-joined back by position — the corpus-vs-dictionary
    separation that makes this tractable at 100 TB); DuckDB replays
    the same artifact as chained boundary-safe string replaces — two
    independent formulations of the published merge-replay rule that
    must agree on every token of every document."""
    from hummingbirddatapipeline_spark.artifacts import BPE_MERGES
    from hummingbirddatapipeline_spark.operators.tokenization import (
        bpe_segment,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    seg = bpe_segment(docs, "text", BPE_MERGES, id_cols=["doc_id"])
    return seg.select(
        "doc_id",
        "n_bpe_tokens",
        F.md5(F.concat_ws(" ", "bpe_tokens")).alias("bpe_fingerprint"),
    )


_BFD_BUDGET = 128


@query(
    "text_pack_best_fit",
    oracle=f"""
    WITH RECURSIVE ch AS (
      SELECT source AS grp, doc_id, n,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n DESC, doc_id) AS rnk
      FROM (
        SELECT source, doc_id,
               CAST(len(list_filter(
                 string_split_regex(trim(text), '\\s+'),
                 t -> t <> '')) AS BIGINT) AS n
        FROM documents)
    ),
    steps(grp, r, loads, bins) AS (
      SELECT grp, 0, CAST([] AS BIGINT[]), CAST([] AS INT[])
      FROM (SELECT DISTINCT grp FROM ch)
      UNION ALL
      SELECT grp, r + 1,
             CASE WHEN best IS NULL THEN list_append(loads, n)
                  ELSE list_transform(
                         list_zip(loads, range(1, len(loads) + 1)),
                         p -> CASE WHEN p[2] = best THEN p[1] + n
                              ELSE p[1] END)
             END,
             list_append(
               bins,
               CAST(COALESCE(best, len(loads) + 1) - 1 AS INT))
      FROM (
        SELECT s.grp, s.r, s.loads, s.bins, c.n,
               list_aggregate(
                 list_transform(
                   list_filter(
                     list_zip(s.loads, range(1, len(s.loads) + 1)),
                     p -> p[1] + c.n <= {_BFD_BUDGET}),
                   p -> CASE WHEN p[1] = list_aggregate(
                          list_transform(
                            list_filter(
                              list_zip(s.loads,
                                       range(1, len(s.loads) + 1)),
                              p2 -> p2[1] + c.n <= {_BFD_BUDGET}),
                            p2 -> p2[1]), 'max')
                        THEN p[2] END), 'min') AS best
        FROM steps s JOIN ch c ON c.grp = s.grp AND c.rnk = s.r + 1
      )
    ),
    final AS (
      SELECT grp, bins FROM steps s
      WHERE r = (SELECT MAX(rnk) FROM ch WHERE ch.grp = s.grp)
    ),
    a2 AS (
      SELECT grp, CAST(u[2] AS BIGINT) AS rnk,
             CAST(u[1] AS BIGINT) AS bin_id
      FROM (SELECT grp, UNNEST(list_zip(bins, range(1, len(bins) + 1)))
                     AS u
            FROM final)
    )
    SELECT c.grp AS source, c.doc_id, c.n AS n_tokens, a2.bin_id
    FROM ch c JOIN a2 ON a2.grp = c.grp AND a2.rnk = c.rnk
    """,
)
def text_pack_best_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing sequence packing under the FULL oracle
    gate: per-source document token counts pack into capacity-strict
    128-token bins by the classic BFD rule (tokens DESC, doc_id ASC;
    fullest bin that still fits, ties to lowest bin id) — the
    training-batch construction move that start-offset binning
    (text_pack_chunks) trades away capacity-strictness for. Greedy
    best-fit is inherently sequential state, so this is the documented
    Arrow-batched escape hatch: ONE applyInPandas pass per pack group
    (the unit of parallelism), O(n log n) per group via sorted-loads
    bisect. DuckDB independently REPLAYS the same deterministic rule
    with a recursive CTE over positional bin-load lists, so every
    chunk's bin assignment is hashed. No bin exceeds the budget on
    this fixture (asserted in tests/test_r9_oracles.py)."""
    from hummingbirddatapipeline_spark.functions.text import (
        best_fit_pack,
        ws_token_count,
    )

    docs = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        ws_token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return best_fit_pack(
        docs, "source", "doc_id", token_col="n_tokens", budget=_BFD_BUDGET
    )


_WINNOW_K = 4
_WINNOW_W = 5


@query(
    "text_winnow_fingerprints",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    keys AS (
      SELECT doc_id, len(t) - {_WINNOW_K - 1} AS ng,
             list_transform(range(len(t) - {_WINNOW_K - 1}),
               i -> CAST('0x' || substr(md5(
                      array_to_string(t[i + 1 : i + {_WINNOW_K}], ' ')), 1, 13)
                    AS BIGINT) * 2048 + (2047 - i)) AS ks
      FROM toks
    ),
    fps AS (
      SELECT doc_id,
             CASE WHEN ng - {_WINNOW_W - 1} >= 1
                  THEN list_sort(list_distinct(
                         list_transform(range(ng - {_WINNOW_W - 1}),
                           j -> list_min(ks[j + 1 : j + {_WINNOW_W}]))))
                  ELSE []::BIGINT[] END AS f
      FROM keys
    )
    SELECT doc_id, unnest(f) AS fp FROM fps
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS scheme) under the full oracle gate: hash
    every word 4-gram, slide a window of 5 consecutive hashes, keep
    each window's RIGHTMOST minimal hash — giving the published
    guarantee that any shared token substring of length >= w+k-1 (= 8)
    shares a fingerprint, at ~1/w the density of full k-gram hashing
    (both properties pinned in tests/test_r10_oracles.py). The
    (hash, position) pair is packed into ONE BIGINT as
    hash52*2048 + (2047-pos) so plain array_min implements
    rightmost-min and DuckDB replays the identical integer arithmetic;
    the row is the exploded (doc_id, fp) candidate stream the
    downstream containment join consumes.

    Scale shape: ZERO exchanges — fingerprinting is local to each
    document by design (pure expressions, no UDF); the candidate join
    downstream is an equi-join on fingerprint hash."""
    from hummingbirddatapipeline_spark.functions.text import (
        winnow_fingerprints,
    )

    docs = load(spark, sf_dir, "documents", fanout=True)
    return docs.select(
        "doc_id",
        F.explode(
            winnow_fingerprints(F.col("text"), k=_WINNOW_K, w=_WINNOW_W)
        ).alias("fp"),
    )


# --- r11-banked oracle builders (NOT yet registered: the r10 driver
# window is full). The cross-corpus-containment differential test
# imports this, so the SQL has a single source of truth and round-11
# registration is a decorator + window change (recipe: PLANS.md "r11
# registration recipe").

def _winnow_containment_sql(k: int = 4, w: int = 5) -> str:
    """Independent DuckDB formulation of winnowing-fingerprint
    cross-corpus containment: bench = docs 0-19; train = docs >= 20
    plus the deterministic embed-twins (doc_id + 70000 carries the
    first 12 tokens of its bench doc — a shared substring >= w+k-1, so
    the winnowing guarantee forces at least one shared fingerprint).
    Containment = shared fingerprint hashes / bench doc's fingerprint
    hashes."""
    def winnow_cte(src: str, name: str) -> str:
        return f"""
    {name}_toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS t
      FROM {src}
    ),
    {name}_keys AS (
      SELECT doc_id, len(t) - {k - 1} AS ng,
             list_transform(range(len(t) - {k - 1}),
               i -> CAST('0x' || substr(md5(
                      array_to_string(t[i + 1 : i + {k}], ' ')), 1, 13)
                    AS BIGINT) * 2048 + (2047 - i)) AS ks
      FROM {name}_toks
    ),
    {name}_h AS (
      SELECT DISTINCT doc_id, fp // 2048 AS h FROM (
        SELECT doc_id,
               unnest(CASE WHEN ng - {w - 1} >= 1
                    THEN list_transform(range(ng - {w - 1}),
                           j -> list_min(ks[j + 1 : j + {w}]))
                    ELSE []::BIGINT[] END) AS fp
        FROM {name}_keys)
    )"""

    return f"""
    WITH bench_src AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 20
    ),
    train_src AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 20
      UNION ALL
      SELECT doc_id + 70000,
             array_to_string(
               list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> x <> '')[1:12], ' ')
             || ' containment probe suffix block'
      FROM documents WHERE doc_id < 20
    ),{winnow_cte("bench_src", "b")},{winnow_cte("train_src", "tr")},
    bsz AS (SELECT doc_id, COUNT(*) AS bench_fps FROM b_h GROUP BY doc_id),
    shared AS (
      SELECT tr_h.doc_id AS train_id, b_h.doc_id AS bench_id,
             COUNT(*) AS n_shared
      FROM tr_h JOIN b_h USING (h)
      GROUP BY 1, 2
    )
    SELECT s.train_id, s.bench_id, s.n_shared, z.bench_fps,
           ROUND(s.n_shared / CAST(z.bench_fps AS DOUBLE), 6) AS containment
    FROM shared s JOIN bsz z ON z.doc_id = s.bench_id
    WHERE s.n_shared >= 1
    """


_CONTAIN_TWIN_OFFSET = 70_000


@query(
    "text_winnow_containment",
    oracle=_winnow_containment_sql(_WINNOW_K, _WINNOW_W),
)
def text_winnow_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus containment via winnowing fingerprints
    (operators/contamination.winnow_containment) under the full oracle
    gate — the decontamination COMPLETION: for every (train, bench)
    pair sharing fingerprint hashes (position bits stripped with exact
    shiftright), containment = shared / bench fingerprints, grading HOW
    MUCH of a benchmark document is embedded rather than whether one
    n-gram collides. Fixture: bench = docs 0-19; train = docs >= 20
    PLUS deterministic embed-twins (doc_id + 70000 carries the first 12
    tokens of its bench doc — a shared substring >= w + k - 1 = 8
    tokens, so the winnowing guarantee forces at least one shared
    fingerprint; every twin pair is caught, pinned in
    tests/test_r11_oracles.py). DuckDB replays the winnowing integer
    arithmetic and the twin construction from the same expressions.

    Scale shape: fingerprinting is ZERO-exchange per doc; each side
    reduces to an exploded (id, hash) stream at ~1/w k-gram density;
    the benchmark side broadcasts, so the corpus never shuffles —
    ngram_contamination's geometry at 1/w the probe volume."""
    from hummingbirddatapipeline_spark.operators.contamination import (
        winnow_containment,
    )

    docs = load(spark, sf_dir, "documents", fanout=True).select("doc_id", "text")
    # the 20-row bench slice feeds THREE branches (bench fingerprints,
    # bench sizes, the twin construction) — checkpoint it so each does
    # not re-read the parquet (r11 scan audit; at scale the benchmark
    # is small by construction, so this is a constant-size pin)
    bench = docs.filter(F.col("doc_id") < 20).localCheckpoint(eager=False)
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
    twins = bench.select(
        (F.col("doc_id") + _CONTAIN_TWIN_OFFSET).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(toks, 1, 12), " "),
            F.lit(" containment probe suffix block"),
        ).alias("text"),
    )
    train = docs.filter(F.col("doc_id") >= 20).unionByName(twins)
    return winnow_containment(train, bench, k=_WINNOW_K, w=_WINNOW_W)


def _cdc_chunks_sql(window: int = 8, divisor: int = 8) -> str:
    """Independent DuckDB formulation of content-defined chunking
    (functions/text.cdc_chunks): gear = 52-bit md5 per token; cut
    after 0-based position i (full window required, i <= n-2) when
    the window SUM of the last ``window`` gears is divisible by
    ``divisor``; the last token always closes the final chunk; chunk
    hash = 52-bit md5 of the space-joined chunk tokens. DuckDB list
    slices are 1-based inclusive and ``range(a, b)`` is half-open —
    both sides replay the same exact BIGINT arithmetic."""
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    geared AS (
      SELECT doc_id, t,
             list_transform(t,
               tok -> CAST('0x' || substr(md5(tok), 1, 13) AS BIGINT)) AS g
      FROM toks
    ),
    cut AS (
      SELECT doc_id, t,
             list_concat(
               CASE WHEN len(g) - 2 >= {window - 1} THEN
                 list_filter(range({window - 1}, len(g) - 1),
                   i -> list_sum(g[i - {window} + 2 : i + 1])
                        % {divisor} = 0)
               ELSE []::BIGINT[] END,
               [CAST(len(g) - 1 AS BIGINT)]) AS cuts
      FROM geared WHERE len(g) >= 1
    ),
    chunk AS (
      SELECT doc_id,
             unnest(list_transform(range(len(cuts)), ci -> struct_pack(
               chunk_seq := CAST(ci AS INT),
               chunk_hash := CAST('0x' || substr(md5(array_to_string(
                 t[(CASE WHEN ci = 0 THEN 0
                         ELSE cuts[ci] + 1 END) + 1 : cuts[ci + 1] + 1],
                 ' ')), 1, 13) AS BIGINT),
               n_tokens := CAST(cuts[ci + 1]
                 - (CASE WHEN ci = 0 THEN 0 ELSE cuts[ci] + 1 END)
                 + 1 AS INT)))) AS c
      FROM cut
    )
    SELECT doc_id, c.chunk_seq AS chunk_seq, c.chunk_hash AS chunk_hash,
           c.n_tokens AS n_tokens
    FROM chunk
    """


@query("text_cdc_chunks", oracle=_cdc_chunks_sql())
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking over word tokens (Muthitacharoen et al.
    SOSP 2001 / FastCDC, USENIX ATC 2016 — re-expressed for token
    streams) under the full oracle gate: gear = 52-bit md5 per token;
    cut after position i when the window SUM of the last 8 gear values
    divides by 8; chunk hash = 52-bit md5 of the chunk text. The
    exploded (doc_id, chunk_seq, chunk_hash, n_tokens) stream is the
    chunk-level dedup candidate feed (strip_boilerplate_chunks
    consumes it). Two documented deviations from FastCDC, both for
    cross-engine exactness: order-free window sum (exact BIGINT on
    both engines) and no min/max clamp (the clamp makes cut i depend
    on cut i-1 — sequential state, the wrong trade for a zero-exchange
    plan). Insertion-robustness is pinned constructively in
    tests/test_r12_oracles.py: prepend tokens to a real corpus doc and
    every chunk after the first interior cut reproduces hash-for-hash.

    Scale shape: pure per-row expressions (tokens, gears, cuts each
    BOUND to a lambda variable per the winnowing HOF lesson) — ZERO
    exchanges; chunking 100 TB is embarrassingly parallel
    (plan-contract-pinned: no Exchange in the physical plan)."""
    from hummingbirddatapipeline_spark.functions.text import cdc_chunks

    docs = load(spark, sf_dir, "documents", fanout=True)
    return docs.select(
        "doc_id", F.explode(cdc_chunks(F.col("text"))).alias("c")
    ).select("doc_id", "c.*")


def _chunk_boilerplate_sql(
    max_docs: int = 2, window: int = 8, divisor: int = 8
) -> str:
    """Independent DuckDB formulation of chunk-level boilerplate
    removal (operators/dedup.strip_boilerplate_chunks): re-derives the
    CDC chunk stream (:func:`_cdc_chunks_sql` as a nested CTE), marks
    hashes occurring in more than ``max_docs`` distinct documents, and
    recounts the per-document keep/drop report — all integer
    arithmetic, so the report is hashed exactly."""
    return f"""
    WITH chunks AS ({_cdc_chunks_sql(window, divisor)}),
    boiler AS (
      SELECT chunk_hash FROM chunks
      GROUP BY chunk_hash
      HAVING COUNT(DISTINCT doc_id) > {max_docs}
    ),
    marked AS (
      SELECT c.doc_id, c.n_tokens,
             (b.chunk_hash IS NOT NULL) AS dropped
      FROM chunks c LEFT JOIN boiler b USING (chunk_hash)
    ),
    perdoc AS (
      SELECT doc_id,
             COUNT(*) AS n_chunks,
             SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS n_chunks_dropped,
             SUM(n_tokens) AS n_tokens,
             SUM(CASE WHEN dropped THEN 0 ELSE n_tokens END)
               AS n_tokens_kept
      FROM marked GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(COALESCE(p.n_chunks_dropped, 0) AS BIGINT)
             AS n_chunks_dropped,
           CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN perdoc p USING (doc_id)
    """


@query("text_chunk_boilerplate", oracle=_chunk_boilerplate_sql(2))
def text_chunk_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level boilerplate removal (CCNet's paragraph-hash dedup
    re-expressed over CDC chunks; operators/dedup.
    strip_boilerplate_chunks) under the full oracle gate: a chunk hash
    occurring in more than 2 distinct documents is boilerplate;
    per-document report of chunks/tokens kept vs dropped. The planted
    shared-block property (every host drops the block's interior
    chunks, keeps its unique content) is pinned in
    tests/test_r13_oracles.py; DuckDB re-derives the CDC chunk stream
    and the frequency rule end to end.

    Scale shape: chunking is ZERO-exchange map work; the only shuffled
    state is the 16-byte (chunk_hash, doc) stream — two hash
    aggregates (boilerplate roster, per-doc recount) and one hash-key
    join, never the text."""
    from hummingbirddatapipeline_spark.operators.dedup import (
        strip_boilerplate_chunks,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return strip_boilerplate_chunks(docs, max_docs=2)


def _dup_spans_sql(k: int = 20, min_occurrences: int = 2) -> str:
    """Independent DuckDB formulation of maximal duplicated-span
    extraction (operators/dedup.dup_span_extract): re-derives every
    stride-1 k-token window, the corpus occurrence counts, the
    overlap/touch island merge (LAG + running-sum breaks), and the
    per-span extents — all integer arithmetic, hashed exactly."""
    return f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS_CASED} AS t FROM documents
    ),
    wins AS (
      SELECT doc_id, i AS start,
             md5(array_to_string(t[i + 1 : i + {k}], ' ')) AS wh
      FROM (SELECT doc_id, t,
                   unnest(range(CASE WHEN len(t) >= {k}
                                     THEN len(t) - {k} + 1
                                     ELSE 0 END)) AS i
            FROM toks)
    ),
    occ AS (
      SELECT wh FROM wins GROUP BY wh
      HAVING COUNT(*) >= {min_occurrences}
    ),
    dup AS (SELECT w.doc_id, w.start FROM wins w JOIN occ USING (wh)),
    brks AS (
      SELECT doc_id, start,
             CASE WHEN start - LAG(start) OVER (
                    PARTITION BY doc_id ORDER BY start) <= {k}
                  THEN 0 ELSE 1 END AS brk
      FROM dup
    ),
    isl AS (
      SELECT doc_id, start,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY start
                            ROWS UNBOUNDED PRECEDING) AS g
      FROM brks
    )
    SELECT doc_id,
           CAST(g AS BIGINT) AS span_seq,
           CAST(MIN(start) AS BIGINT) AS start_token,
           CAST(MAX(start) + {k} - MIN(start) AS BIGINT) AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_dup_windows
    FROM isl GROUP BY doc_id, g
    """


@query("text_dup_spans", oracle=_dup_spans_sql(20, 2))
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-span extraction (operators/dedup.
    dup_span_extract) under the full oracle gate — the ACTIONABLE
    completion of the Lee et al. 2022 substring-dedup family: stride-1
    hashed 20-token windows, corpus occurrence counts, and an
    island-merge (LAG + running sum) that fuses overlapping duplicated
    windows into maximal (start, length) spans per document. The
    planted-block contract (a 40-token block pasted into 8 hosts is
    recovered as EXACTLY the [30, 70) span in each) is pinned in
    tests/test_r14_oracles.py.

    Scale shape: windows hash map-side; the only shuffled state is the
    16-byte window-hash occurrence table plus ONE doc-keyed exchange
    for the island-merge window — text never shuffles."""
    from hummingbirddatapipeline_spark.operators.dedup import (
        dup_span_extract,
    )

    # fanout (r15 second pass): the stride-1 window-hash scan is a
    # single-task CPU stage at bench scale; isolated interleaved A/B
    # wins all 3 rounds (the earlier blanket-fan-out "loss" for this
    # row was VM noise — OPTIMIZATION_r15.md)
    docs = load(spark, sf_dir, "documents", fanout=True).select("doc_id", "text")
    return dup_span_extract(docs, k=20)


def _perplexity_buckets_sql(lam: float = 0.9) -> str:
    """Independent DuckDB formulation of CCNet perplexity bucketing
    (operators/retrieval.perplexity_buckets): re-derives the
    interpolated bigram NLL from scratch and assigns per-language
    thirds with PERCENT_RANK over (mean_nll, doc_id); NULL-NLL docs
    are bucketed 'none' OUTSIDE the window (Spark ranks NULLS FIRST,
    DuckDB NULLS LAST — excluding them keeps the rank arithmetic
    engine-identical)."""
    return f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ),
    occ AS (SELECT doc_id, unnest(t) AS w FROM toks),
    uni AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS c FROM occ GROUP BY w),
    tot AS (SELECT SUM(c) AS t_occ FROM uni),
    big AS (
      SELECT doc_id, t[i + 1] AS w1, t[i + 2] AS w2
      FROM (SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2)
    ),
    dtf AS (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM big GROUP BY doc_id, w1, w2
    ),
    bg AS (SELECT w1, w2, SUM(tf) AS cb FROM dtf GROUP BY w1, w2),
    nllt AS (
      SELECT b.w1, b.w2,
             -ln({lam!r} * b.cb / u1.c
                 + {(1.0 - lam)!r} * u2.c / t.t_occ) AS nll
      FROM bg b
      JOIN uni u1 ON b.w1 = u1.w
      JOIN uni u2 ON b.w2 = u2.w
      CROSS JOIN tot t
    ),
    per_doc AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
             ROUND(SUM(tf * nll) / SUM(tf), 4) AS mean_nll
      FROM dtf JOIN nllt USING (w1, w2) GROUP BY doc_id
    ),
    joined AS (
      SELECT d.doc_id, d.lang,
             COALESCE(p.n_bigrams, 0) AS n_bigrams, p.mean_nll
      FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ),
    ranked AS (
      SELECT *, PERCENT_RANK() OVER (
               PARTITION BY lang ORDER BY mean_nll, doc_id) AS pr
      FROM joined WHERE mean_nll IS NOT NULL
    )
    SELECT doc_id, lang, n_bigrams, mean_nll,
           CASE WHEN pr < (1.0 / 3.0) THEN 'head'
                WHEN pr < (1.0 / 3.0) * 2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    UNION ALL
    SELECT doc_id, lang, n_bigrams, mean_nll, 'none' AS bucket
    FROM joined WHERE mean_nll IS NULL
    """


@query("text_perplexity_buckets", oracle=_perplexity_buckets_sql(0.9))
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2020;
    operators/retrieval.perplexity_buckets) under the full oracle
    gate: per-doc mean interpolated-bigram NLL (the in-engine LM the
    bigram_logprob row already oracles), then per-LANGUAGE head /
    middle / tail thirds by PERCENT_RANK over (mean_nll, doc_id).
    NULL-NLL docs (no bigrams) bucket 'none' OUTSIDE the window —
    Spark ranks NULLS FIRST, DuckDB NULLS LAST, so excluding them is
    what keeps the rank arithmetic engine-identical (documented in the
    oracle builder).

    Scale shape: the two-pass corpus LM (vocab checkpoint feeding both
    sides) plus ONE language-keyed window — per-language ranking is
    the per-stratum layout, never a global single-partition sort."""
    from hummingbirddatapipeline_spark.operators.retrieval import (
        perplexity_buckets,
    )

    return perplexity_buckets(load(spark, sf_dir, "documents", fanout=True))


def _cut_spans_sql(k: int = 20, min_occurrences: int = 2) -> str:
    """Independent DuckDB formulation of the Lee et al. substring-dedup
    CUT (operators/dedup.cut_dup_spans): re-derives the stride-1
    windows, picks the canonical occurrence of every duplicated window
    hash with a (doc_id, start) rank (the Spark side's struct-min
    selection), merges the NON-canonical occurrences into islands, and
    accounts per document — all integer arithmetic."""
    return f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS_CASED} AS t FROM documents
    ),
    wins AS (
      SELECT doc_id, i AS start,
             md5(array_to_string(t[i + 1 : i + {k}], ' ')) AS wh
      FROM (SELECT doc_id, t,
                   unnest(range(CASE WHEN len(t) >= {k}
                                     THEN len(t) - {k} + 1
                                     ELSE 0 END)) AS i
            FROM toks)
    ),
    occ AS (
      SELECT wh, doc_id AS cdoc, start AS cstart FROM (
        SELECT wh, doc_id, start,
               COUNT(*) OVER (PARTITION BY wh) AS c,
               ROW_NUMBER() OVER (PARTITION BY wh
                 ORDER BY doc_id, start) AS rk
        FROM wins) WHERE c >= {min_occurrences} AND rk = 1
    ),
    cut AS (
      SELECT w.doc_id, w.start
      FROM wins w JOIN occ o USING (wh)
      WHERE NOT (w.doc_id = o.cdoc AND w.start = o.cstart)
    ),
    brks AS (
      SELECT doc_id, start,
             CASE WHEN start - LAG(start) OVER (
                    PARTITION BY doc_id ORDER BY start) <= {k}
                  THEN 0 ELSE 1 END AS brk
      FROM cut
    ),
    isl AS (
      SELECT doc_id, start,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY start
                            ROWS UNBOUNDED PRECEDING) AS g
      FROM brks
    ),
    spans AS (
      SELECT doc_id, g, COUNT(*) AS nw,
             MAX(start) + {k} - MIN(start) AS len
      FROM isl GROUP BY doc_id, g
    ),
    perdoc AS (
      SELECT doc_id, SUM(nw) AS wc, COUNT(*) AS sc, SUM(len) AS tc
      FROM spans GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, len({_DUCK_TOKS_CASED}) AS n_tokens
            FROM documents)
    SELECT t.doc_id,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.wc, 0) AS BIGINT) AS windows_cut,
           CAST(COALESCE(p.sc, 0) AS BIGINT) AS spans_cut,
           CAST(COALESCE(p.tc, 0) AS BIGINT) AS tokens_cut,
           CAST(t.n_tokens - COALESCE(p.tc, 0) AS BIGINT) AS tokens_kept
    FROM tot t LEFT JOIN perdoc p USING (doc_id)
    """


@query("text_cut_dup_spans", oracle=_cut_spans_sql(20, 2))
def text_cut_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lee et al. 2022 substring-dedup CUT (operators/dedup.
    cut_dup_spans) under the full oracle gate — the step that actually
    removes text: every duplicated 20-token window keeps ONE canonical
    occurrence corpus-wide (min doc_id, then min start), all other
    occurrences merge into maximal spans and are cut; per-doc report
    of windows/spans/tokens cut vs kept. The canonical-keeps contract
    (paste one block into 8 hosts: doc 0 untouched, docs 1-7 each cut
    exactly the planted span) is pinned in tests/test_r16_oracles.py.

    Scale shape: the dup_span_extract geometry (hashed windows, one
    doc-keyed exchange) plus a window-hash argmin aggregate for the
    canonical pick — text itself never shuffles; cut accounting is
    integer arithmetic on span bounds."""
    from hummingbirddatapipeline_spark.operators.dedup import cut_dup_spans

    # fanout (r15 second pass): the stride-1 window-hash scan is a
    # single-task CPU stage at bench scale; isolated interleaved A/B
    # wins all 3 rounds (the earlier blanket-fan-out "loss" for this
    # row was VM noise — OPTIMIZATION_r15.md)
    docs = load(spark, sf_dir, "documents", fanout=True).select("doc_id", "text")
    return cut_dup_spans(docs, k=20)


def _trigram_heldout_sql(
    alpha: float = 0.4, holdout_hex: str = "3333", seed: str = "lm0"
) -> str:
    """Independent DuckDB formulation of held-out Stupid-Backoff
    trigram surprisal (operators/retrieval.trigram_logprob_heldout):
    re-derives the md5 train/held split, all three train-side count
    tables, the per-position backoff cascade (same multiplication
    order as the Spark side), and the 4dp per-doc mean."""
    a = repr(float(alpha))
    return f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t,
             substring(md5(CAST(doc_id AS VARCHAR) || ':{seed}'), 1, 4)
               < '{holdout_hex}' AS held
      FROM documents
    ),
    uni AS (
      SELECT w, CAST(COUNT(*) AS DOUBLE) AS c1
      FROM (SELECT unnest(t) AS w FROM toks WHERE NOT held) GROUP BY w
    ),
    tot AS (SELECT SUM(c1) AS t_occ FROM uni),
    bi AS (
      SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c2 FROM (
        SELECT t[i + 1] AS w1, t[i + 2] AS w2
        FROM (SELECT t, unnest(range(len(t) - 1)) AS i
              FROM toks WHERE NOT held AND len(t) >= 2))
      GROUP BY 1, 2
    ),
    tri AS (
      SELECT w1, w2, w3, CAST(COUNT(*) AS DOUBLE) AS c3 FROM (
        SELECT t[i + 1] AS w1, t[i + 2] AS w2, t[i + 3] AS w3
        FROM (SELECT t, unnest(range(len(t) - 2)) AS i
              FROM toks WHERE NOT held AND len(t) >= 3))
      GROUP BY 1, 2, 3
    ),
    pos AS (
      SELECT doc_id, t[i + 1] AS w1, t[i + 2] AS w2, t[i + 3] AS w3
      FROM (SELECT doc_id, t, unnest(range(len(t) - 2)) AS i
            FROM toks WHERE held AND len(t) >= 3)
    ),
    sc AS (
      SELECT p.doc_id,
             CASE WHEN tri.c3 IS NOT NULL THEN tri.c3 / bi.c2
                  WHEN b2.c2 IS NOT NULL THEN {a} * b2.c2 / u2.c1
                  WHEN u3.c1 IS NOT NULL
                    THEN ({a} * {a}) * u3.c1 / tot.t_occ
                  ELSE ({a} * {a}) * 1.0 / tot.t_occ END AS s
      FROM pos p
      LEFT JOIN tri ON tri.w1 = p.w1 AND tri.w2 = p.w2 AND tri.w3 = p.w3
      LEFT JOIN bi ON bi.w1 = p.w1 AND bi.w2 = p.w2
      LEFT JOIN bi b2 ON b2.w1 = p.w2 AND b2.w2 = p.w3
      LEFT JOIN uni u2 ON u2.w = p.w2
      LEFT JOIN uni u3 ON u3.w = p.w3
      CROSS JOIN tot
    ),
    perdoc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
             ROUND(AVG(-ln(s)), 4) AS mean_nll
      FROM sc GROUP BY doc_id
    )
    SELECT h.doc_id,
           CAST(COALESCE(p.n_trigrams, 0) AS BIGINT) AS n_trigrams,
           p.mean_nll
    FROM (SELECT doc_id FROM toks WHERE held) h
    LEFT JOIN perdoc p USING (doc_id)
    """


@query(
    "text_trigram_logprob_heldout",
    oracle=_trigram_heldout_sql(0.4, "3333", "lm0"),
)
def text_trigram_logprob_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out Stupid-Backoff trigram surprisal (Brants et al. 2007;
    operators/retrieval.trigram_logprob_heldout) under the full oracle
    gate — the LM-fidelity step above the bigram row, scored the way a
    perplexity filter actually runs: a content-hash split (md5 prefix
    < '3333', ~20%) holds out scoring docs, the trigram/bigram/unigram
    count tables come from TRAIN ONLY, and every held-out position
    scores trigram -> alpha*bigram -> alpha^2*unigram/T backoff
    (alpha=0.4) — held-out text guarantees every backoff tier fires
    (the OOV-floor closed form is pinned in tests/test_r19_oracles.py).
    DuckDB re-derives split, counts, and per-position scores.

    Scale shape: the two-pass corpus-LM layout — count tables from one
    train-side explode (store), held docs probe by broadcast-friendly
    gram joins; the held split is the cheap side by construction."""
    from hummingbirddatapipeline_spark.operators.retrieval import (
        trigram_logprob_heldout,
    )

    return trigram_logprob_heldout(load(spark, sf_dir, "documents"))


def _leaderboard_sql(
    k: int = 20, min_occurrences: int = 2, top: int = 20
) -> str:
    """Independent DuckDB formulation of the boilerplate leaderboard
    (operators/dedup.boilerplate_leaderboard): re-derives the stride-1
    windows, per-hash occurrence/document counts, the (min doc, min
    start) representative carrying the window text, and the top cut
    under the engine-neutral (occurrences DESC, rep_doc, rep_start)
    order."""
    return f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS_CASED} AS t FROM documents
    ),
    wins AS (
      SELECT doc_id, i AS start,
             array_to_string(t[i + 1 : i + {k}], ' ') AS wtext,
             md5(array_to_string(t[i + 1 : i + {k}], ' ')) AS wh
      FROM (SELECT doc_id, t,
                   unnest(range(CASE WHEN len(t) >= {k}
                                     THEN len(t) - {k} + 1
                                     ELSE 0 END)) AS i
            FROM toks)
    ),
    agg AS (
      SELECT wh,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             MIN(ROW(doc_id, start, wtext)) AS rep
      FROM wins GROUP BY wh
      HAVING COUNT(*) >= {min_occurrences}
    )
    SELECT CAST(ROW_NUMBER() OVER (
             ORDER BY n_occurrences DESC, rep[1], rep[2]) AS BIGINT)
             AS rank,
           n_occurrences, n_docs,
           rep[1] AS rep_doc,
           CAST(rep[2] AS BIGINT) AS rep_start,
           rep[3] AS window_text
    FROM agg
    ORDER BY n_occurrences DESC, rep[1], rep[2]
    LIMIT {top}
    """


@query("text_boilerplate_leaderboard", oracle=_leaderboard_sql(20, 2, 20))
def text_boilerplate_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-boilerplate window leaderboard (operators/dedup.
    boilerplate_leaderboard) under the full oracle gate — the
    observability view over the substring-dup machinery: the top-20
    most-duplicated 20-token windows with occurrence and distinct-doc
    counts plus an engine-neutral representative (min doc_id, then min
    start) and its actual text — what a corpus owner reads to find the
    nav bars and cookie banners before cutting them. The planted-block
    dominance contract is pinned in tests/test_r20_oracles.py.

    Scale shape: hashed windows + one hash aggregate; the top-20 cut
    is orderBy().limit() = TakeOrderedAndProject (per-partition
    partial top-k, never a global sort); only the 20 winners' text is
    ever re-attached."""
    from hummingbirddatapipeline_spark.operators.dedup import (
        boilerplate_leaderboard,
    )

    # fanout (r15 second pass): the stride-1 window-hash scan is a
    # single-task CPU stage at bench scale; isolated interleaved A/B
    # wins all 3 rounds (the earlier blanket-fan-out "loss" for this
    # row was VM noise — OPTIMIZATION_r15.md)
    docs = load(spark, sf_dir, "documents", fanout=True).select("doc_id", "text")
    return boilerplate_leaderboard(docs, k=20, top=20)


def _bpe_fertility_sql() -> str:
    """Independent DuckDB formulation of the per-language tokenizer
    fertility report (operators/tokenization.bpe_fertility_by_lang):
    nests the full frozen-merge replay (_bpe_frozen_oracle) and
    aggregates exact BIGINT sums per language; both ratios are single
    6dp divisions."""
    return f"""
    WITH seg AS ({_bpe_frozen_oracle()}),
    base AS (
      SELECT d.lang, s.n_bpe_tokens,
             len({_DUCK_TOKS}) AS n_words, d.n_chars
      FROM documents d JOIN seg s USING (doc_id)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           ROUND(CAST(SUM(n_bpe_tokens) AS DOUBLE)
                 / CAST(SUM(n_words) AS DOUBLE), 6) AS fertility,
           ROUND(CAST(SUM(n_chars) AS DOUBLE)
                 / CAST(SUM(n_bpe_tokens) AS DOUBLE), 6)
             AS chars_per_token
    FROM base GROUP BY lang
    """


@query("text_bpe_fertility", oracle=_bpe_fertility_sql())
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language BPE tokenizer-fertility report
    (operators/tokenization.bpe_fertility_by_lang) under the full
    oracle gate — the tokenizer-equity number (Ács 2019 'fertility'):
    replay the frozen BPE_MERGES over each language's text and report
    exact BPE-token / word / char counts with 6dp fertility
    (tokens-per-word) and chars-per-token — the table that shows which
    languages a tokenizer taxes. DuckDB nests the full frozen-merge
    replay. Conservation bounds (n_words <= n_bpe <= n_chars+n_words)
    are pinned in tests/test_r20_oracles.py.

    Scale shape: the text_bpe_segment geometry — merge replay once per
    UNIQUE word, broadcast re-attach, then one language-keyed
    aggregate; corpus-scale work is one explode + one broadcast
    join."""
    from hummingbirddatapipeline_spark.artifacts import BPE_MERGES
    from hummingbirddatapipeline_spark.operators.tokenization import (
        bpe_fertility_by_lang,
    )

    return bpe_fertility_by_lang(load(spark, sf_dir, "documents"), BPE_MERGES)


# --- r21-banked oracle builder (NOT yet registered; registration
# target: the r20 window — recipe in PLANS.md "r21 bank").

def _tfidf_keywords_sql(k: int = 3) -> str:
    """Independent DuckDB formulation of per-document TF-IDF keyword
    extraction (operators/retrieval.tfidf_keywords): rebuilds the
    (doc, term) tf table, the per-term df, the smoothed sklearn idf
    ``ln((1 + N) / (1 + df)) + 1`` over the FULL doc count, the
    6dp-rounded score, and the (score desc, term) top-k cut."""
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks GROUP BY doc_id, w
    ),
    dft AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY w),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.w AS term,
             CAST(t.tf AS BIGINT) AS tf,
             CAST(f.df AS BIGINT) AS df,
             ROUND(t.tf * (ln((1 + n.n_docs) / (1 + f.df)) + 1), 6)
               AS score
      FROM tf t JOIN dft f USING (w) CROSS JOIN nd n
    )
    SELECT doc_id, term, tf, df, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@query("text_tfidf_keywords", oracle=_tfidf_keywords_sql(3))
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF keywords (operators/retrieval.
    tfidf_keywords) under the full oracle gate — sklearn-smoothed idf
    (ln((1+N)/(1+df)) + 1), scores 6dp-rounded BEFORE the
    (score desc, term) rank cut so the top-k is engine-deterministic.
    The df=1-outranks-stopwords constructive pin lives in
    tests/test_r21_oracles.py.

    Scale shape: one explode -> (doc, term) tf aggregate; the
    vocabulary-sized df table joins back broadcast; N is the one-row
    scalar crossJoin (exactly one BNLJ, contract-pinned); one per-doc
    rank window. The tf subtree evaluates twice (df build + scoring) —
    the documented two-pass LM shape."""
    from hummingbirddatapipeline_spark.operators.retrieval import (
        tfidf_keywords,
    )

    return tfidf_keywords(load(spark, sf_dir, "documents"), k=3)


def _vocab_coverage_sql(vocab_sizes: "tuple[int, ...]" = (64, 256, 1024, 4096)) -> str:
    """Independent DuckDB formulation of the vocabulary-coverage curve
    (operators/tokenization.vocab_coverage): rebuilds the word counts,
    the (count desc, word asc) rank, and each V's covered-occurrence
    conditional sum — exact BIGINTs with one 6dp division."""
    sels = "\n    UNION ALL\n    ".join(
        f"""SELECT {v} AS vocab_size,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ranked) AS n_types,
           (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM ranked
            WHERE rk <= {v}) AS covered_occurrences,
           (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM ranked)
             AS total_occurrences,
           CASE WHEN (SELECT COALESCE(SUM(c), 0) FROM ranked) > 0
                THEN ROUND((SELECT COALESCE(SUM(c), 0) FROM ranked
                            WHERE rk <= {v})
                     / CAST((SELECT SUM(c) FROM ranked) AS DOUBLE), 6)
                ELSE 0.0 END AS coverage"""
        for v in vocab_sizes
    )
    return f"""
    WITH counts AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT unnest({_DUCK_TOKS}) AS w FROM documents)
      GROUP BY w
    ),
    ranked AS (
      SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk
      FROM counts
    )
    {sels}
    """


@query(
    "text_vocab_coverage", oracle=_vocab_coverage_sql((64, 256, 1024, 4096))
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage curve (operators/tokenization.
    vocab_coverage) under the full oracle gate — the sizing step that
    precedes BPE training: for each candidate vocab size V in (64,
    256, 1024, 4096), the fraction of corpus token occurrences covered
    by the top-V words (count desc, word asc — deterministic rank);
    the curve's knee is the Zipf diagnostic. Exact BIGINT counts, one
    6dp division; the engineered Zipf fixture (8/4/2/1 -> 8/15, 12/15,
    1.0) is pinned in tests/test_r22_oracles.py.

    Scale shape: one explode -> one map-side-combined hash aggregate;
    the rank window + conditional sums run on the VOCAB table only —
    the corpus never moves (contract-pinned: no join, no
    cartesian)."""
    from hummingbirddatapipeline_spark.operators.tokenization import (
        vocab_coverage,
    )

    return vocab_coverage(
        load(spark, sf_dir, "documents"), (64, 256, 1024, 4096)
    )


def _length_groups_sql(
    bin_tokens: int = 64, batch_size: int = 8, seed: str = "lg0"
) -> str:
    """Independent DuckDB formulation of the length-grouped batching
    plan (operators/tokenization.pack_length_groups): re-derives the
    token counts, the length bins, the per-bin md5 shuffle order, the
    fixed-size batch cuts, and each batch's padding efficiency."""
    return f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len({_DUCK_TOKS_CASED}) AS BIGINT) AS n,
             -- integer division: DuckDB CAST(double AS INT) ROUNDS
             -- where Spark's cast truncates — // floors on both
             CAST(len({_DUCK_TOKS_CASED}) // {bin_tokens} AS INT) AS bin_id,
             md5(CAST(doc_id AS VARCHAR) || ':{seed}') AS key
      FROM documents
    ),
    batched AS (
      SELECT *,
             CAST((ROW_NUMBER() OVER (PARTITION BY bin_id
                     ORDER BY key, doc_id) - 1) // {batch_size} AS INT)
               AS batch_seq
      FROM base
    )
    SELECT bin_id, batch_seq,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MAX(n) AS max_tokens,
           CAST(SUM(n) AS BIGINT) AS sum_tokens,
           COALESCE(ROUND(1.0 - SUM(n)
                    / NULLIF(MAX(n) * CAST(COUNT(*) AS DOUBLE), 0.0), 6),
                    0.0) AS padding_frac
    FROM batched GROUP BY bin_id, batch_seq
    """


@query("text_pack_length_groups", oracle=_length_groups_sql(64, 8, "lg0"))
def text_pack_length_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batching plan (operators/tokenization.
    pack_length_groups) under the full oracle gate — HuggingFace
    group_by_length / fairseq max-tokens reduced to its deterministic
    core: docs bucket into 64-token length bins, md5-shuffle within
    the bin (content-addressed, NEVER an RNG), cut into batches of 8,
    each reporting padding_frac = 1 - sum/(max*n). Repartition
    invariance and full-batches-before-the-tail are pinned in
    tests/test_r22_oracles.py.

    Scale shape: ONE bin-keyed exchange shared by the row_number
    window and the batch aggregate (contract-pinned: exactly 1
    Exchange, 0 joins) — batch planning for a 100 TB corpus is one
    skinny shuffle."""
    from hummingbirddatapipeline_spark.operators.tokenization import (
        pack_length_groups,
    )

    return pack_length_groups(
        load(spark, sf_dir, "documents"), bin_tokens=64, batch_size=8,
        seed="lg0",
    )


def _ngram_novelty_sql(n: int = 2) -> str:
    """Independent DuckDB formulation of per-doc n-gram novelty
    (operators/retrieval.ngram_novelty): rebuilds each doc's distinct
    lowercase word n-gram set, the gram document frequencies, and the
    corpus-unique counts; zero-gram docs restored by LEFT JOIN with
    novelty 0.0."""
    return f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(
               CASE WHEN len(t) >= {n}
                    THEN list_transform(range(len(t) - {n - 1}),
                                        i -> array_to_string(
                                               t[i + 1 : i + {n}], ' '))
                    ELSE []::VARCHAR[] END
             )) AS g
      FROM toks
    ),
    dfq AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
    per AS (
      SELECT grams.doc_id,
             COUNT(*) AS n_grams,
             SUM(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS n_novel
      FROM grams JOIN dfq USING (g) GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(per.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(per.n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN COALESCE(per.n_grams, 0) > 0
                THEN ROUND(per.n_novel / CAST(per.n_grams AS DOUBLE), 6)
                ELSE 0.0 END AS novelty_frac
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """


@query("text_ngram_novelty", oracle=_ngram_novelty_sql(2))
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc corpus-unique n-gram fraction
    (operators/retrieval.ngram_novelty, n=2) under the full oracle
    gate — the diversity-contribution score, the mirror image of the
    dup filters: dedup removes what repeats, novelty ranks what
    remains by what it ADDS. One row per input doc (zero-gram docs
    kept at 0.0); exact BIGINTs + one 6dp division. Shared-bigram
    twins scoring 0.0 / all-unique scoring 1.0 pinned in
    tests/test_r23_oracles.py.

    Scale shape: ONE corpus scan -> skinny (id, gram) checkpoint
    feeding BOTH the df aggregate and the probe join (the store+probe
    corpus-LM shape, lineage-cut per the r11 lesson)."""
    from hummingbirddatapipeline_spark.operators.retrieval import (
        ngram_novelty,
    )

    return ngram_novelty(load(spark, sf_dir, "documents"), n=2)


def _concat_manifest_sql(
    seq_len: int = 128, num_shards: int = 8, seed: str = "cc0"
) -> str:
    """Independent DuckDB formulation of the concat-and-chunk packing
    manifest (operators/tokenization.pack_concat_manifest): re-derives
    token counts, the md5 shard route and stream order, the per-shard
    running-sum offsets, and every sequence-boundary division. The //
    comment from _length_groups_sql applies: DuckDB CAST(double)
    rounds where Spark truncates, so integer division here is //."""
    return f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len({_DUCK_TOKS_CASED}) AS BIGINT) AS n,
             md5(CAST(doc_id AS VARCHAR) || ':{seed}') AS key
      FROM documents
    ),
    routed AS (
      SELECT *,
             CAST(CAST('0x' || substr(key, 1, 13) AS BIGINT)
                  % {num_shards} AS INT) AS shard
      FROM base WHERE n > 0
    ),
    laid AS (
      SELECT doc_id, shard, n,
             COALESCE(SUM(n) OVER (PARTITION BY shard
                                   ORDER BY key, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING),
                      0) AS off
      FROM routed
    )
    SELECT doc_id, shard, n AS n_tokens,
           -- the window SUM widens to HUGEINT; the driver's value hash
           -- is integer-width-sensitive, so cast back to BIGINT (the
           -- check_oracle int128 gate — caught by the bare-session
           -- banked sweep before this row's promotion round)
           CAST(off AS BIGINT) AS "offset",
           CAST(off // {seq_len} AS BIGINT) AS start_seq,
           CAST(off % {seq_len} AS BIGINT) AS start_pos,
           CAST((off + n - 1) // {seq_len} AS BIGINT) AS end_seq,
           CAST((off + n - 1) // {seq_len} - off // {seq_len} + 1
                AS BIGINT) AS n_seqs
    FROM laid
    """


@query("text_pack_concat_manifest", oracle=_concat_manifest_sql(128, 8, "cc0"))
def text_pack_concat_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing manifest (operators/tokenization.
    pack_concat_manifest) under the full oracle gate — the
    GPT-pretraining layout (docs concatenated into fixed 128-token
    sequences, crossing boundaries) as its deterministic manifest: per
    doc the shard (portable md5 route over 8 shards), exact stream
    offset (per-shard prefix sum), start_seq/start_pos/end_seq/n_seqs.
    Per-SHARD streams, because the global-concat prefix sum is the
    single-partition anti-pattern — per-shard is how real writers lay
    out streams. Stream contiguity (no token lost, none double-placed)
    and repartition invariance are pinned in tests/test_r24_oracles.py.

    Scale shape: map-side counts, ONE shard-keyed exchange for the
    running-sum window, zero joins (contract-pinned)."""
    from hummingbirddatapipeline_spark.operators.tokenization import (
        pack_concat_manifest,
    )

    return pack_concat_manifest(
        load(spark, sf_dir, "documents"), seq_len=128, num_shards=8,
        seed="cc0",
    )


def _heaps_growth_sql(
    fractions: "tuple[float, ...]" = (0.25, 0.5, 0.75, 1.0),
) -> str:
    """Independent DuckDB formulation of the Heaps vocabulary-growth
    curve (operators/tokenization.heaps_vocab_growth): rebuilds the
    word first-occurrence table, the per-doc token counts, the id-range
    cuts (FLOOR before CAST — Spark's double->long cast truncates,
    DuckDB's rounds), and every prefix's conditional sums."""
    sels = "\n    UNION ALL\n    ".join(
        f"""SELECT CAST({f} AS DOUBLE) AS frac,
           (SELECT CAST(FLOOR(COALESCE(MAX(doc_id), 0)
                   * CAST({f} AS DOUBLE)) AS BIGINT) FROM documents)
             AS cut_id,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM per_doc
            WHERE doc_id <= (SELECT FLOOR(MAX(doc_id)
                             * CAST({f} AS DOUBLE)) FROM documents))
             AS n_docs,
           (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM per_doc
            WHERE doc_id <= (SELECT FLOOR(MAX(doc_id)
                             * CAST({f} AS DOUBLE)) FROM documents))
             AS n_tokens,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM per_word
            WHERE first_doc <= (SELECT FLOOR(MAX(doc_id)
                                * CAST({f} AS DOUBLE)) FROM documents))
             AS n_types,
           (SELECT CASE WHEN COALESCE(SUM(n_tok), 0) > 0
                THEN ROUND((SELECT COUNT(*) FROM per_word
                            WHERE first_doc <= (SELECT FLOOR(MAX(doc_id)
                              * CAST({f} AS DOUBLE)) FROM documents))
                           / CAST(SUM(n_tok) AS DOUBLE), 6)
                ELSE 0.0 END FROM per_doc
            WHERE doc_id <= (SELECT FLOOR(MAX(doc_id)
                             * CAST({f} AS DOUBLE)) FROM documents))
             AS type_token_ratio"""
        for f in fractions
    )
    return f"""
    WITH occ AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    per_word AS (
      SELECT w, MIN(doc_id) AS first_doc FROM occ GROUP BY w
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_tok FROM occ GROUP BY doc_id
    )
    {sels}
    """


@query("text_heaps_growth", oracle=_heaps_growth_sql((0.25, 0.5, 0.75, 1.0)))
def text_heaps_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve (operators/tokenization.
    heaps_vocab_growth) under the full oracle gate — the companion of
    the vocab-coverage Zipf curve: at id-range prefix cuts (25/50/75/
    100%), n_docs / n_tokens / n_types and the type-token ratio — the
    measurement behind 'will a tokenizer trained on a sample hold up
    on the full crawl'. Cut arithmetic pinned cross-engine (FLOOR
    before CAST — DuckDB's double cast rounds, Spark's truncates).
    Monotone counts + non-increasing TTR pinned in
    tests/test_r24_oracles.py.

    Scale shape: ONE corpus explode -> checkpointed skinny (id, word)
    feeding BOTH the per-word first-occurrence table and per-doc
    counts (store+probe); prefix stats are K conditional sums against
    the broadcast 1-row cut frame (the documented single-row
    crossJoin)."""
    from hummingbirddatapipeline_spark.operators.tokenization import (
        heaps_vocab_growth,
    )

    return heaps_vocab_growth(
        load(spark, sf_dir, "documents"), (0.25, 0.5, 0.75, 1.0)
    )


def _char_entropy_sql() -> str:
    """Independent DuckDB formulation of per-doc character entropy
    (functions/text.char_entropy): rebuilds the char array, the sorted
    distinct fold order, and the -sum(p ln p) chain in the same IEEE
    order; 6dp-rounded (ln is the one libm call — the
    unigram_logprob precedent)."""
    return """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CASE WHEN length(text) > 0 THEN ROUND(
             list_aggregate(
               list_transform(
                 list_sort(list_distinct(string_split_regex(text, ''))),
                 c -> -(len(list_filter(string_split_regex(text, ''),
                                        x -> x = c))
                        / CAST(length(text) AS DOUBLE))
                      * ln(len(list_filter(string_split_regex(text, ''),
                                           x -> x = c))
                           / CAST(length(text) AS DOUBLE))),
               'sum'), 6)
           ELSE 0.0 END AS entropy
    FROM documents
    """


@query("text_char_entropy", oracle=_char_entropy_sql())
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc character-level Shannon entropy in nats
    (functions/text.char_entropy) under the full oracle gate — the
    gibberish/compressibility signal. Cross-engine exactness by
    construction: the fold runs over the SORTED distinct char array
    (identical IEEE order both engines), probabilities bind once in an
    inner transform (the interpreted-HOF double-eval trap), the char
    array binds once via the single-element-array transform (the
    word_shingles lesson), ln rounds at 6dp (the unigram_logprob
    precedent). Closed-form anchors ('aaaa' -> 0, 'ab' -> ln 2,
    'abcd' -> ln 4, empty -> 0.0) pinned in tests/test_r26_oracles.py.

    Scale shape: ZERO-shuffle map pass — the signal is the scan."""
    from hummingbirddatapipeline_spark.functions.text import char_entropy

    return load(spark, sf_dir, "documents", fanout=True).select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        char_entropy(F.col("text")).alias("entropy"),
    )


def _pmi_collocations_sql(min_count: int = 5, k: int = 20) -> str:
    """Independent DuckDB formulation of the PMI collocation miner
    (operators/retrieval.pmi_collocations): rebuilds bigram/unigram
    counts, the fixed-order PMI chain ending in one ln, the 6dp round,
    and the (pmi desc, bigram asc) top-k cut."""
    return f"""
    WITH toks AS (
      SELECT {_DUCK_TOKS} AS t FROM documents
    ),
    big AS (
      SELECT unnest(CASE WHEN len(t) >= 2
                    THEN list_transform(range(len(t) - 1),
                         i -> t[i + 1] || ' ' || t[i + 2])
                    ELSE []::VARCHAR[] END) AS bigram
      FROM toks
    ),
    uni AS (SELECT unnest(t) AS w FROM toks),
    c_ab AS (SELECT bigram, COUNT(*) AS c_ab FROM big GROUP BY bigram),
    c_w AS (SELECT w, COUNT(*) AS c_w FROM uni GROUP BY w),
    n_big AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_big FROM big),
    n_uni AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_uni FROM uni),
    cand AS (
      SELECT c.bigram, c.c_ab,
             ca.c_w AS c_a, cb.c_w AS c_b,
             ROUND(ln((c.c_ab / n_big.n_big)
                      / ((ca.c_w / n_uni.n_uni)
                         * (cb.c_w / n_uni.n_uni))), 6) AS pmi
      FROM c_ab c
      JOIN c_w ca ON ca.w = string_split(c.bigram, ' ')[1]
      JOIN c_w cb ON cb.w = string_split(c.bigram, ' ')[2]
      CROSS JOIN n_big CROSS JOIN n_uni
      WHERE c.c_ab >= {min_count}
    )
    SELECT bigram, CAST(c_ab AS BIGINT) AS c_ab,
           CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
           pmi, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, bigram) AS rank
      FROM cand
    ) WHERE rank <= {k}
    """


@query("text_pmi_collocations", oracle=_pmi_collocations_sql(5, 20))
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word-bigram collocations by PMI (Church & Hanks 1990;
    operators/retrieval.pmi_collocations, min_count=5) under the full
    oracle gate — the classic phrase miner, corpus-level companion of
    the bigram LM rows. Exact counts; PMI is one fixed-order IEEE
    chain ending in a single ln, 6dp-rounded BEFORE the
    (pmi desc, bigram) cut. The fixture encodes PMI's signature
    behavior (a perfectly-coupled rare pair BEATS a frequent loosely
    coupled one — coupling, not mass) in tests/test_r27_oracles.py.

    Scale shape: ONE text scan -> checkpointed token-array frame
    feeding both explodes; count tables broadcast back; <= 2 one-row
    BNLJ scalar attaches (contract-pinned); rank window on the
    vocabulary-bounded collocation table."""
    from hummingbirddatapipeline_spark.operators.retrieval import (
        pmi_collocations,
    )

    return pmi_collocations(
        load(spark, sf_dir, "documents"), min_count=5, k=20
    )


def _source_kl_sql() -> str:
    """Independent DuckDB formulation of the per-source unigram KL
    report (operators/retrieval.source_unigram_kl): rebuilds the
    (source, word) counts, the derived global tables, each e9-long
    contribution (one ln, row-local), and the EXACT integer sum."""
    return f"""
    WITH occ AS (
      SELECT source, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    sw AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_sw
      FROM occ GROUP BY 1, 2
    ),
    n_s AS (
      SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM sw GROUP BY 1
    ),
    c_w AS (SELECT w, SUM(c_sw) AS c_w FROM sw GROUP BY 1),
    n_tot AS (SELECT CAST(SUM(c_sw) AS DOUBLE) AS n_tot FROM sw),
    terms AS (
      SELECT sw.source, n_s.n_s, n_s.n_types,
             CAST(ROUND(1e9
               * (sw.c_sw / CAST(n_s.n_s AS DOUBLE))
               * ln((sw.c_sw / CAST(n_s.n_s AS DOUBLE))
                    / (c_w.c_w / n_tot.n_tot))) AS BIGINT) AS t
      FROM sw
      JOIN n_s USING (source)
      JOIN c_w USING (w)
      CROSS JOIN n_tot
    )
    SELECT source,
           CAST(MIN(n_s) AS BIGINT) AS n_tokens,
           CAST(MIN(n_types) AS BIGINT) AS n_types,
           CAST(SUM(t) AS BIGINT) AS kl_e9
    FROM terms GROUP BY source
    """


@query("text_source_kl", oracle=_source_kl_sql())
def text_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(P_source || P_corpus) per source
    (operators/retrieval.source_unigram_kl) under the full oracle
    gate — the domain-shift number behind temperature-mixing/DoReMi
    decisions (DSIR's importance weights are its per-document view).
    The scaled-long trick applied to a float-valued aggregate: each
    (source, word) term p*ln(p/q) is row-local IEEE (one ln),
    quantized to an e9 LONG, summed EXACTLY — partitioning-invariant
    where a float sum over an unordered vocabulary is not. The
    disjoint-equal-sources -> exactly ln2 and matching-source ->
    exactly 0 closed forms are pinned in tests/test_r28_oracles.py.

    Scale shape: ONE corpus explode; all later tables derive from the
    vocab-sized (source, word) aggregate; <= 1 BNLJ (the 1-row N
    attach, contract-pinned)."""
    from hummingbirddatapipeline_spark.operators.retrieval import (
        source_unigram_kl,
    )

    return source_unigram_kl(load(spark, sf_dir, "documents"))


def _signature_ngrams_sql(k: int = 5, min_count: int = 5) -> str:
    """Independent DuckDB formulation of the per-source signature
    words (operators/retrieval.source_signature_ngrams): rebuilds the
    (source, word) counts, the lift chain (pure rational — no libm),
    and the per-source (lift desc, c_sw desc, word) top-k."""
    return f"""
    WITH occ AS (
      SELECT source, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    sw AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_sw
      FROM occ GROUP BY 1, 2
    ),
    n_s AS (SELECT source, SUM(c_sw) AS n_s FROM sw GROUP BY 1),
    c_w AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w
            FROM sw GROUP BY 1),
    n_tot AS (SELECT CAST(SUM(c_sw) AS DOUBLE) AS n_tot FROM sw),
    scored AS (
      SELECT sw.source, sw.w AS word, sw.c_sw, c_w.c_w,
             ROUND((sw.c_sw / CAST(n_s.n_s AS DOUBLE))
                   / (c_w.c_w / n_tot.n_tot), 6) AS lift
      FROM sw
      JOIN n_s USING (source)
      JOIN c_w ON c_w.w = sw.w
      CROSS JOIN n_tot
      WHERE sw.c_sw >= {min_count}
    )
    SELECT source, word, c_sw, c_w, lift, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source
        ORDER BY lift DESC, c_sw DESC, word) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@query("text_signature_ngrams", oracle=_signature_ngrams_sql(5, 5))
def text_signature_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-5 characteristic words by lift
    (operators/retrieval.source_signature_ngrams, min_count=5) under
    the full oracle gate — (c_sw/N_s)/(c_w/N), the qualitative
    companion of text_source_kl: KL says HOW FAR a source sits from
    the mixture, this says WHICH words carry the difference. Pure
    rational arithmetic — NO libm anywhere; 6dp lift rounds before the
    (lift desc, word) cut. The exclusive-word-lift-K and
    uniform-word-lift-1 closed forms are pinned in
    tests/test_r29_oracles.py.

    Scale shape: one explode -> (source, word) aggregate; totals
    broadcast back; per-source rank windows share one source-keyed
    exchange (parallel across sources)."""
    from hummingbirddatapipeline_spark.operators.retrieval import (
        source_signature_ngrams,
    )

    return source_signature_ngrams(
        load(spark, sf_dir, "documents"), k=5, min_count=5
    )


def _length_profile_sql() -> str:
    """Independent DuckDB formulation of the per-source length profile
    (operators/tokenization.length_profile_by_source): quantile_cont
    grid over integer token counts (== Spark percentile, the verified
    interpolation), exact-long mean."""
    return f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           quantile_cont(n, 0.25) AS p25,
           quantile_cont(n, 0.5) AS p50,
           quantile_cont(n, 0.75) AS p75,
           quantile_cont(n, 0.95) AS p95,
           CAST(ROUND(CAST(SUM(n) AS DOUBLE) * 100.0 / COUNT(*))
                AS BIGINT) AS mean_tok_e2
    FROM (
      SELECT source, CAST(len({_DUCK_TOKS_CASED}) AS BIGINT) AS n
      FROM documents
    ) GROUP BY source
    """


@query("text_length_profile", oracle=_length_profile_sql())
def text_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact interpolated token-count percentiles
    (operators/tokenization.length_profile_by_source; p25/50/75/95 +
    exact-long e2 mean) under the full oracle gate — the sizing table
    behind seq_len/bin/batch choices (pack_length_groups and
    pack_concat_manifest consume exactly these numbers). Spark
    percentile == DuckDB quantile_cont under the (n-1)*p rule — the
    MAD row's verified pairing extended to the quartile grid; the
    [1,2,3,4] closed-form grid (p95 compared against the
    same-arithmetic IEEE value — 3*0.95 is inexact) is pinned in
    tests/test_r31_oracles.py.

    Scale shape: one token-count projection + one source-keyed
    percentile aggregate — K rows out at any corpus size."""
    from hummingbirddatapipeline_spark.operators.tokenization import (
        length_profile_by_source,
    )

    return length_profile_by_source(load(spark, sf_dir, "documents"))
