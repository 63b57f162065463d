"""Differential (DuckDB) checks for the operators banked for round-9
catalog registration — SemDeDup-shaped semantic dedup, incremental
connected-components maintenance, URL canonicalization + host gating,
and best-fit-decreasing sequence packing — run on the real testdata
exactly the way the catalog oracle gate would, so next round's
registration is a window change, not new work. Each DuckDB side is an
independent formulation per the repo's differential rule."""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_SEM_TWIN_OFFSET = 10_000


def _duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )
    return con


def _norm(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                v.hex() if isinstance(v, float) and not math.isnan(v) else v
                for v in r
            )
        )
    return sorted(out, key=repr)


def _cent_sql() -> str:
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D

    lists = ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]" for c in IVF_CENTROIDS_64D
    )
    return (
        f"SELECT UNNEST(range({len(IVF_CENTROIDS_64D)})) AS cid, "
        f"UNNEST([{lists}]) AS cv"
    )


def test_semantic_dedup_matches_duckdb(spark):
    """Scaled-copy twins (cosine exactly 1.0, same quantizer cell by
    scale invariance) give the fixture real semantic duplicates; the
    raw synthetic embeddings are near-orthogonal (max pairwise cosine
    0.479), so every non-twin pair stays far below the threshold."""
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.operators.similarity import (
        semantic_dedup,
    )
    from hummingbirddatapipeline_spark.tables import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    twins = emb.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") + _SEM_TWIN_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.5).alias("embedding"),
    )
    allv = emb.unionByName(twins)
    got = semantic_dedup(
        allv, IVF_CENTROIDS_64D, threshold=0.999, max_cell=100_000
    ).collect()

    sql = f"""
    WITH RECURSIVE base AS (
      SELECT vec_id,
             embedding.list_transform(x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    allv AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + {_SEM_TWIN_OFFSET},
             v.list_transform(x -> x * 0.5)
      FROM base WHERE vec_id % 2 = 0
    ),
    cents AS ({_cent_sql()}),
    scored AS (
      SELECT a.vec_id, c.cid,
             ROUND(
               list_sum(list_zip(a.v, c.cv).list_transform(p -> p[1] * p[2]))
               / (sqrt(list_sum(a.v.list_transform(x -> x * x)))
                  * sqrt(list_sum(c.cv.list_transform(x -> x * x)))), 6)
               AS sim
      FROM allv a CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, CAST(cid AS INT) AS centroid_id FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER
                 (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
        FROM scored) WHERE rk = 1
    ),
    near AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM allv a
      JOIN assigned aa ON aa.vec_id = a.vec_id
      JOIN assigned ab ON TRUE
      JOIN allv b ON b.vec_id = ab.vec_id
      WHERE aa.centroid_id = ab.centroid_id AND a.vec_id < b.vec_id
        AND ROUND(
              list_sum(list_zip(a.v, b.v).list_transform(p -> p[1] * p[2]))
              / (sqrt(list_sum(a.v.list_transform(x -> x * x)))
                 * sqrt(list_sum(b.v.list_transform(x -> x * x)))), 6)
            >= 0.999
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
    )
    SELECT a.vec_id, a.centroid_id,
           COALESCE(cc.cluster_id, a.vec_id) AS sem_cluster,
           COALESCE(cc.cluster_id, a.vec_id) = a.vec_id AS kept
    FROM assigned a LEFT JOIN cc ON cc.node = a.vec_id
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    rows = [tuple(r) for r in got]
    # the fixture has real structure: every even id lost its twin
    n_dropped = sum(1 for r in rows if not r[3])
    assert n_dropped == sum(1 for r in rows if r[0] >= _SEM_TWIN_OFFSET)
    assert n_dropped > 0
    assert _norm(rows) == _norm(exp)


def test_incremental_cc_matches_full_recompute_and_duckdb(spark):
    """New edges (including corpus singletons and brand-new node ids)
    update the existing labeling; the result must equal BOTH a full
    Spark re-closure over old+new edges (restricted to the same node
    universe) and DuckDB's independent recursive closure."""
    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_pairs,
    )
    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
        incremental_connected_components,
    )
    from hummingbirddatapipeline_spark.tables import load

    old = shared_jaccard_pairs(spark, SF)
    labels = connected_components(old)

    docs = load(spark, SF, "documents")
    new_edges = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 3).alias("id_b"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 151 == 0).select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 90_000_000).alias("id_b"),
        )
    )
    got = incremental_connected_components(labels, new_edges).collect()

    full = connected_components(old.unionByName(new_edges))
    # same node universe: full closure covers exactly labeled ∪ touched
    exp_spark = full.collect()
    assert _norm([tuple(r) for r in got]) == _norm(
        [tuple(r) for r in exp_spark]
    )

    from hummingbirddatapipeline_spark.catalog.text_q import _DUCK_TOKS

    sql = f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS w FROM documents
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
      UNION ALL
      SELECT doc_id, doc_id + 3 FROM documents WHERE doc_id % 97 = 0
      UNION ALL
      SELECT doc_id, doc_id + 90000000 FROM documents WHERE doc_id % 151 = 0
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM near
      UNION SELECT id_b, id_a FROM near
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges WHERE u <> v
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.u <> e.v
    )
    SELECT u AS node, LEAST(u, MIN(v)) AS cluster_id
    FROM reach GROUP BY u
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    assert _norm([tuple(r) for r in got]) == _norm(exp)


_DUCK_URL_FIXTURE = """
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

_DUCK_CANON = """
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


def _duck_canon_sql(select: str) -> str:
    return f"""
    WITH fixture AS ({_DUCK_URL_FIXTURE}),
    parts AS ({_DUCK_CANON}),
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


def test_canonicalize_url_matches_duckdb(spark):
    from hummingbirddatapipeline_spark.functions.web import (
        canonical_host,
        canonicalize_url,
        synth_dirty_urls,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents")
    urls = synth_dirty_urls(docs)
    got = urls.select(
        "doc_id",
        "url",
        canonical_host(F.col("url")).alias("host"),
        canonicalize_url(F.col("url")).alias("canonical_url"),
    ).collect()
    con = _duck()
    exp = con.sql(
        _duck_canon_sql(
            "SELECT doc_id, url, host, canonical_url FROM canon"
        )
    ).fetchall()
    rows = [tuple(r) for r in got]
    # the fixture is genuinely dirty: canonicalization must change most
    assert sum(1 for r in rows if r[1] != r[3]) > len(rows) * 0.5
    assert _norm(rows) == _norm(exp)


def test_host_gate_matches_duckdb(spark):
    from hummingbirddatapipeline_spark.functions.web import (
        host_gate,
        synth_dirty_urls,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents")
    got = host_gate(
        synth_dirty_urls(docs), min_docs=10, max_dup_frac=0.6
    ).collect()
    con = _duck()
    exp = con.sql(
        _duck_canon_sql("""
    SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_canonical,
           ROUND(1.0 - COUNT(DISTINCT canonical_url)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac,
           COUNT(*) >= 10 AND
           ROUND(1.0 - COUNT(DISTINCT canonical_url)
                 / CAST(COUNT(*) AS DOUBLE), 6) <= 0.6 AS gated
    FROM canon GROUP BY host
    """)
    ).fetchall()
    rows = [tuple(r) for r in got]
    assert len(rows) > 10
    # both gate outcomes occur on the fixture
    assert {r[4] for r in rows} == {True, False}
    assert _norm(rows) == _norm(exp)


def test_best_fit_pack_matches_duckdb_replay(spark):
    """DuckDB replays the SAME deterministic best-fit-decreasing rule
    with a recursive CTE over positional bin-load lists — an
    independent formulation of the sequential greedy state — and the
    assignment must match chunk for chunk."""
    from hummingbirddatapipeline_spark.functions.text import (
        best_fit_pack,
        ws_token_count,
    )
    from hummingbirddatapipeline_spark.tables import load

    budget = 128
    docs = load(spark, SF, "documents").select(
        "source",
        "doc_id",
        ws_token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    got = best_fit_pack(
        docs, "source", "doc_id", token_col="n_tokens", budget=budget
    ).collect()

    sql = f"""
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
                     p -> p[1] + c.n <= {budget}),
                   p -> CASE WHEN p[1] = list_aggregate(
                          list_transform(
                            list_filter(
                              list_zip(s.loads,
                                       range(1, len(s.loads) + 1)),
                              p2 -> p2[1] + c.n <= {budget}),
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
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    rows = [tuple(r) for r in got]
    assert len(rows) == len(exp) > 0
    assert _norm(rows) == _norm(exp)

    # no bin over budget (no chunk alone exceeds it on this fixture)
    loads = {}
    for src, _d, n, b in rows:
        loads[(src, b)] = loads.get((src, b), 0) + n
    assert max(loads.values()) <= budget


def test_best_fit_packing_quality_vs_start_offset(spark):
    """The quality claim, measured honestly: start-offset binning and
    BFD are not bin-count comparable because start-offset OVERFLOWS
    the budget (a bin absorbs the chunk that straddles its boundary —
    it can even undercut the capacity-respecting lower bound that
    way). The real contract pair is: (a) BFD respects the budget on
    every bin while its bin count stays within 11/9 * LB + 1, where
    LB = ceil(total/budget). NOTE (r8 ADVICE): LB only LOWER-bounds
    OPT, so this inequality is STRONGER than the published BFD
    guarantee (11/9 OPT + 1 relative to OPT, Johnson 1973) — it is
    asserted as an EMPIRICAL property of this frozen fixture (item
    sizes are small relative to the budget, so bins pack near-full
    and the LB-relative bound holds with slack), not as the theorem;
    a valid BFD on a different fixture could exceed it; (b)
    start-offset violates the budget on this same fixture in every
    group — the defect a capacity-strict packer exists to remove
    (its own contract is bounded overflow, which its docstring
    states)."""
    from hummingbirddatapipeline_spark.functions.text import (
        best_fit_pack,
        pack_token_bins,
        ws_token_count,
    )
    from hummingbirddatapipeline_spark.tables import load

    budget = 128
    docs = load(spark, SF, "documents").select(
        "source",
        "doc_id",
        ws_token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    bfd = (
        best_fit_pack(docs, "source", "doc_id", budget=budget)
        .groupBy("source")
        .agg(
            F.countDistinct("bin_id").alias("nb"),
            F.ceil(F.sum("n_tokens") / budget).alias("lb"),
        )
        .collect()
    )
    assert len(bfd) > 0
    for r in bfd:
        assert r["nb"] <= (11 * r["lb"]) // 9 + 1, (r["source"], r["nb"], r["lb"])

    sob_loads = (
        pack_token_bins(docs, "source", "doc_id", budget=budget)
        .groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").alias("load"))
        .groupBy("source")
        .agg(F.max("load").alias("max_load"))
        .collect()
    )
    assert all(r["max_load"] > budget for r in sob_loads)


def test_dsir_select_matches_duckdb(spark):
    """DSIR importance resampling: target = the English documents, raw
    = the whole pool; DuckDB refits both hashed-ngram models, rebuilds
    every log-ratio, per-doc weight, and Gumbel key from the same md5
    arithmetic, and must select the identical k documents."""
    from hummingbirddatapipeline_spark.operators.sampling import dsir_select
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents").select("doc_id", "text", "lang")
    target = docs.filter(F.col("lang") == "en")
    got = dsir_select(
        docs, target, k=50, n_buckets=4096, smoothing=1.0, seed="r9"
    ).collect()

    B, s = 4096, 1.0
    gram_cte = """
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
    sql = f"""
    WITH tg AS ({gram_cte.format(where="WHERE lang = 'en'")}),
    rg AS ({gram_cte.format(where="")}),
    tc AS (SELECT bucket, CAST(COUNT(*) AS DOUBLE) AS t_n
           FROM tg GROUP BY bucket),
    rc AS (SELECT bucket, CAST(COUNT(*) AS DOUBLE) AS r_n
           FROM rg GROUP BY bucket),
    tt AS (SELECT SUM(t_n) AS t_total FROM tc),
    rt AS (SELECT SUM(r_n) AS r_total FROM rc),
    ratio AS (
      SELECT rc.bucket,
             ln((COALESCE(tc.t_n, 0.0) + {s}) / (tt.t_total + {s} * {B}))
             - ln((rc.r_n + {s}) / (rt.r_total + {s} * {B})) AS log_ratio
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
    """
    con = _duck()
    exp = con.sql(sql).fetchall()
    rows = [tuple(r) for r in got]
    assert len(rows) == 50
    # selection is genuinely weight-driven: the picked docs skew toward
    # the target language
    picked = {r[0] for r in rows}
    langs = {
        r["doc_id"]: r["lang"]
        for r in docs.select("doc_id", "lang").collect()
    }
    en_frac_picked = sum(1 for d in picked if langs[d] == "en") / len(picked)
    en_frac_pool = sum(1 for v in langs.values() if v == "en") / len(langs)
    assert en_frac_picked > en_frac_pool
    assert _norm(rows) == _norm(exp)


def test_r9_guards(spark):
    """Loud-failure contracts for the banked operators: empty DSIR
    target, semantic mega-cell cap, and incremental-CC no-op on an
    empty edge batch."""
    import pytest

    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
        incremental_connected_components,
    )
    from hummingbirddatapipeline_spark.operators.sampling import dsir_select
    from hummingbirddatapipeline_spark.operators.similarity import (
        semantic_dedup,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, SF, "documents").select("doc_id", "text")
    with pytest.raises(ValueError, match="target corpus has no grams"):
        dsir_select(docs, docs.filter(F.lit(False)), k=5)

    emb = load(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    with pytest.raises(ValueError, match="max_cell"):
        semantic_dedup(emb, IVF_CENTROIDS_64D, threshold=0.999, max_cell=3)

    from hummingbirddatapipeline_spark.catalog.dedup_q import (
        shared_jaccard_pairs,
    )

    labels = connected_components(shared_jaccard_pairs(spark, SF))
    empty = labels.filter(F.lit(False)).select(
        F.col("node").alias("id_a"), F.col("cluster_id").alias("id_b")
    )
    got = incremental_connected_components(labels, empty).collect()
    exp = labels.collect()
    assert _norm([tuple(r) for r in got]) == _norm([tuple(r) for r in exp])
