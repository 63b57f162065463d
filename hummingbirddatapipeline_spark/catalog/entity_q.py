"""Entity-resolution / merge catalog queries (SURVEY.md §2.3 J3-J5,
J7, J10; §2.8 F17).

Dirty inputs are derived deterministically from the supplier/customer
tables with the same SQL on both engines (case+whitespace noise, alias
identities, truncated names, dropped-character typos), so the multipass
matcher, the conditional upsert, and the blocked fuzzy join are all
hash-checkable against DuckDB. The LSH fuzzy join is rows-only (banded
hashing isn't SQL-expressible); its recall vs the exact form is covered
in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.operators.entity_resolution import (
    fuzzy_join_levenshtein,
    fuzzy_join_lsh,
    multipass_name_match,
)
from hummingbirddatapipeline_spark.operators.merge import (
    conditional_upsert,
    upsert_changelog,
)
from hummingbirddatapipeline_spark.tables import load

# DuckDB needs the 'g' flag for replace-all; Spark's regexp_replace is
# global by default. Same normalization as functions.scalar.normalize_name.
_DUCK_NORM = (
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER({x}), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)

# dirty-source derivation shared by Spark and the oracle: one third
# case/space noise (pass 1), one third alias identities (pass 2), one
# third truncated names (pass 3 prefix + state tie-break)
_SRC_CASE = (
    "CASE WHEN s_suppkey % 3 = 0 THEN UPPER(s_name) || '  ' "
    "WHEN s_suppkey % 3 = 1 THEN 'ALIAS ' || CAST(s_suppkey AS STRING) "
    "ELSE SUBSTRING(s_name, 1, 16) END"
)


@query(
    "er_multipass_name_match",
    oracle=f"""
    WITH src AS (
      SELECT s_suppkey AS src_id, s_nationkey AS src_nation,
             {_SRC_CASE} AS raw_name
      FROM supplier
    ),
    nsrc AS (
      SELECT *, {_DUCK_NORM.format(x="raw_name")} AS nname FROM src
    ),
    tgt AS (
      SELECT s_suppkey AS tgt_key, s_nationkey AS tgt_nation,
             {_DUCK_NORM.format(x="s_name")} AS nname,
             'alias ' || CAST(s_suppkey AS VARCHAR) AS alias_norm
      FROM supplier
    ),
    p1 AS (
      SELECT nsrc.*, tgt.tgt_key AS m1
      FROM nsrc LEFT JOIN tgt ON nsrc.nname = tgt.nname
    ),
    p2 AS (
      SELECT p1.*, tgt.tgt_key AS m2
      FROM p1 LEFT JOIN tgt ON p1.m1 IS NULL AND p1.nname = tgt.alias_norm
    ),
    p3cand AS (
      SELECT p2.src_id, tgt.tgt_key AS m3,
             ROW_NUMBER() OVER (
               PARTITION BY p2.src_id
               ORDER BY CASE WHEN p2.src_nation = tgt.tgt_nation THEN 1 ELSE 0 END DESC,
                        tgt.tgt_key
             ) AS rn
      FROM p2 JOIN tgt ON SUBSTRING(p2.nname, 1, 16) = SUBSTRING(tgt.nname, 1, 16)
      WHERE p2.m1 IS NULL AND p2.m2 IS NULL
    ),
    p3 AS (SELECT src_id, m3 FROM p3cand WHERE rn = 1)
    SELECT p2.src_id, p2.raw_name,
           COALESCE(p2.m1, p2.m2, p3.m3) AS matched_s_suppkey,
           CASE WHEN p2.m1 IS NOT NULL THEN 1
                WHEN p2.m2 IS NOT NULL THEN 2
                WHEN p3.m3 IS NOT NULL THEN 3 END AS match_pass
    FROM p2 LEFT JOIN p3 USING (src_id)
    ORDER BY src_id
    """,
)
def er_multipass_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    source = sup.select(
        F.col("s_suppkey").alias("src_id"),
        F.col("s_nationkey").alias("src_nation"),
        F.expr(_SRC_CASE).alias("raw_name"),
    )
    target = sup.withColumn(
        "alias_name", F.concat(F.lit("alias "), F.col("s_suppkey").cast("string"))
    )
    out = multipass_name_match(
        source,
        target,
        source_name="raw_name",
        target_name="s_name",
        source_key="src_id",
        target_key="s_suppkey",
        alias_cols=("alias_name",),
        prefix_len=16,
        source_secondary="src_nation",
        target_secondary="s_nationkey",
    )
    return out.select(
        "src_id",
        "raw_name",
        F.col("matched_s_suppkey"),
        F.col("match_pass"),
    )


# F17 matrix on customer: value NULLs every 10th row, confidence ladder
# NULL/LOW/MEDIUM/HIGH by key % 4, updates for even keys at rotating
# confidence; integer-valued cells so old/new strings hash identically
# across engines.
_MASTER_SQL = (
    "SELECT c_custkey, "
    "CASE WHEN c_custkey % 10 = 0 THEN NULL "
    "ELSE CAST(ROUND(c_acctbal, 0) AS BIGINT) END AS acct_value, "
    "CASE WHEN c_custkey % 4 = 0 THEN NULL "
    "WHEN c_custkey % 4 = 1 THEN 'LOW' "
    "WHEN c_custkey % 4 = 2 THEN 'MEDIUM' ELSE 'HIGH' END AS confidence "
    "FROM customer"
)
_UPDATES_SQL = (
    "SELECT c_custkey, "
    "CAST(ROUND(c_acctbal, 0) + 7 AS BIGINT) AS acct_value, "
    "CASE WHEN c_custkey % 3 = 0 THEN 'HIGH' "
    "WHEN c_custkey % 3 = 1 THEN 'MEDIUM' ELSE 'LOW' END AS confidence "
    "FROM customer WHERE c_custkey % 2 = 0"
)
_RANK_SQL = (
    "CASE WHEN UPPER({c}) = 'HIGH' THEN 3 WHEN UPPER({c}) = 'MEDIUM' THEN 2 "
    "WHEN UPPER({c}) = 'LOW' THEN 1 ELSE 0 END"
)


@query(
    "merge_conditional_upsert",
    oracle=f"""
    WITH master AS ({_MASTER_SQL}),
    upd AS ({_UPDATES_SQL}),
    j AS (
      SELECT m.c_custkey, m.acct_value AS old_value, u.acct_value AS new_value,
             m.confidence AS old_confidence, u.confidence AS new_confidence,
             {_RANK_SQL.format(c="m.confidence")} AS old_rank,
             {_RANK_SQL.format(c="u.confidence")} AS new_rank
      FROM master m JOIN upd u USING (c_custkey)
    )
    SELECT c_custkey, 'acct_value' AS column_name,
           CAST(old_value AS VARCHAR) AS old_value,
           CAST(new_value AS VARCHAR) AS new_value,
           old_confidence, new_confidence
    FROM j
    WHERE new_value IS NOT NULL AND (old_value IS NULL OR new_rank > old_rank)
    ORDER BY c_custkey
    """,
)
def merge_conditional_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer")
    master = spark.sql(_MASTER_SQL)
    updates = spark.sql(_UPDATES_SQL)
    log = upsert_changelog(master, updates, "c_custkey", "acct_value", "confidence")
    return log


# dropped-character typos for even keys; block on nation
_DIRTY_SQL = (
    "SELECT s_suppkey AS left_id, s_nationkey AS left_nation, "
    "CASE WHEN s_suppkey % 2 = 0 THEN SUBSTRING(s_name, 1, 10) || SUBSTRING(s_name, 12) "
    "ELSE s_name END AS dirty_name "
    "FROM supplier"
)


@query(
    "er_fuzzy_join_levenshtein",
    oracle=f"""
    -- contract-corpus cap (see row docstring): no-op at
    -- sf0.001/0.01/0.1
    WITH dirty AS (SELECT * FROM ({_DIRTY_SQL}) WHERE left_id < 1000),
    nd AS (SELECT *, {_DUCK_NORM.format(x="dirty_name")} AS lnorm FROM dirty),
    tgt AS (
      SELECT s_suppkey AS r_key, s_nationkey AS r_nation,
             {_DUCK_NORM.format(x="s_name")} AS rnorm
      FROM supplier WHERE s_suppkey < 1000
    ),
    cand AS (
      SELECT nd.left_id, nd.dirty_name, tgt.r_key,
             levenshtein(nd.lnorm, tgt.rnorm) AS lev_distance
      FROM nd JOIN tgt ON nd.left_nation = tgt.r_nation
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY left_id ORDER BY lev_distance, r_key
      ) AS rn
      FROM cand WHERE lev_distance <= 2
    )
    SELECT left_id, dirty_name, r_key AS matched_s_suppkey, lev_distance
    FROM ranked WHERE rn = 1 ORDER BY left_id
    """,
)
def er_fuzzy_join_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein fuzzy name join blocked on nation, full oracle gate.

    CONTRACT-ROW FIXTURE CAP (r14 full-catalog sf1 sweep): nation is
    a CONSTANT-cardinality blocking key, so candidates grow
    quadratically with the supplier table (measured 18x at 10x data
    pre-cap). The edit-distance matching property is
    corpus-size-independent; fixture pinned at s_suppkey < 1000
    (no-op at sf0.001/0.01/0.1 — suppkeys end at 999 at sf0.1),
    oracle capped identically. Production-scale fuzzy joins block on
    non-constant keys (er_fuzzy_join_lsh's banded signature buckets
    scale with the data)."""
    sup = load(spark, sf_dir, "supplier").filter(
        F.col("s_suppkey") < 1000  # contract-corpus cap, see docstring
    )
    sup.createOrReplaceTempView("supplier")
    dirty = spark.sql(_DIRTY_SQL)
    out = fuzzy_join_levenshtein(
        dirty,
        sup,
        left_name="dirty_name",
        right_name="s_name",
        left_key="left_id",
        right_key="s_suppkey",
        block_left="left_nation",
        block_right="s_nationkey",
        max_distance=2,
    )
    return out.select(
        "left_id", "dirty_name", "matched_s_suppkey", "lev_distance"
    )


@query(
    "er_fuzzy_join_lsh",
    oracle=f"""
    WITH dirty AS ({_DIRTY_SQL}),
    nd AS (SELECT *, {_DUCK_NORM.format(x="dirty_name")} AS lnorm FROM dirty),
    tgt AS (
      SELECT s_suppkey AS r_key, {_DUCK_NORM.format(x="s_name")} AS rnorm
      FROM supplier
    ),
    cand AS (
      SELECT nd.left_id, tgt.r_key,
             levenshtein(nd.lnorm, tgt.rnorm) AS lev_distance
      FROM nd CROSS JOIN tgt
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY left_id ORDER BY lev_distance, r_key
      ) AS rn
      FROM cand WHERE lev_distance <= 2
    )
    SELECT left_id, r_key AS matched_s_suppkey, lev_distance
    FROM ranked WHERE rn = 1 ORDER BY left_id
    """,
)
def er_fuzzy_join_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 LSH form under the FULL content oracle: the oracle is the
    unblocked all-pairs best match (DuckDB cross join), which the
    banded MinHash candidate path must reproduce exactly — valid
    because banding recall is 1.0 on the fixture (seeded, frozen) and
    the final ranking (lev_distance, r_key) is shared. The tunable
    recall contract lives in tests/test_entity_resolution.py."""
    sup = load(spark, sf_dir, "supplier")
    sup.createOrReplaceTempView("supplier")
    dirty = spark.sql(_DIRTY_SQL)
    out = fuzzy_join_lsh(
        dirty,
        sup,
        left_name="dirty_name",
        right_name="s_name",
        left_key="left_id",
        right_key="s_suppkey",
        max_distance=2,
    )
    return out


@query(
    "merge_upsert_idempotent",
    oracle="""
    SELECT COUNT(*) AS residual_changes FROM (
      WITH master AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN NULL
               ELSE CAST(ROUND(c_acctbal, 0) AS BIGINT) END AS acct_value,
               CASE WHEN c_custkey % 4 = 0 THEN NULL
               WHEN c_custkey % 4 = 1 THEN 'LOW'
               WHEN c_custkey % 4 = 2 THEN 'MEDIUM' ELSE 'HIGH' END AS confidence
        FROM customer
      ),
      upd AS (
        SELECT c_custkey,
               CAST(ROUND(c_acctbal, 0) + 7 AS BIGINT) AS acct_value,
               CASE WHEN c_custkey % 3 = 0 THEN 'HIGH'
               WHEN c_custkey % 3 = 1 THEN 'MEDIUM' ELSE 'LOW' END AS confidence
        FROM customer WHERE c_custkey % 2 = 0
      ),
      rank_of AS (SELECT 1),
      applied AS (
        SELECT m.c_custkey,
               CASE WHEN u.acct_value IS NOT NULL AND (m.acct_value IS NULL OR
                 (CASE WHEN UPPER(u.confidence)='HIGH' THEN 3 WHEN UPPER(u.confidence)='MEDIUM' THEN 2
                       WHEN UPPER(u.confidence)='LOW' THEN 1 ELSE 0 END) >
                 (CASE WHEN UPPER(m.confidence)='HIGH' THEN 3 WHEN UPPER(m.confidence)='MEDIUM' THEN 2
                       WHEN UPPER(m.confidence)='LOW' THEN 1 ELSE 0 END))
               THEN u.acct_value ELSE m.acct_value END AS acct_value,
               CASE WHEN u.acct_value IS NOT NULL AND (m.acct_value IS NULL OR
                 (CASE WHEN UPPER(u.confidence)='HIGH' THEN 3 WHEN UPPER(u.confidence)='MEDIUM' THEN 2
                       WHEN UPPER(u.confidence)='LOW' THEN 1 ELSE 0 END) >
                 (CASE WHEN UPPER(m.confidence)='HIGH' THEN 3 WHEN UPPER(m.confidence)='MEDIUM' THEN 2
                       WHEN UPPER(m.confidence)='LOW' THEN 1 ELSE 0 END))
               THEN u.confidence ELSE m.confidence END AS confidence
        FROM master m LEFT JOIN upd u USING (c_custkey)
      )
      SELECT a.c_custkey
      FROM applied a JOIN upd u USING (c_custkey)
      WHERE u.acct_value IS NOT NULL AND (a.acct_value IS NULL OR
        (CASE WHEN UPPER(u.confidence)='HIGH' THEN 3 WHEN UPPER(u.confidence)='MEDIUM' THEN 2
              WHEN UPPER(u.confidence)='LOW' THEN 1 ELSE 0 END) >
        (CASE WHEN UPPER(a.confidence)='HIGH' THEN 3 WHEN UPPER(a.confidence)='MEDIUM' THEN 2
              WHEN UPPER(a.confidence)='LOW' THEN 1 ELSE 0 END))
    ) t
    """,
)
def merge_upsert_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's idempotency contract (master_acreage_merge.py:5-12)
    as a query: apply the upsert, then count the changes a second
    identical run would make — must be 0."""
    cust = load(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer")
    master = spark.sql(_MASTER_SQL)
    updates = spark.sql(_UPDATES_SQL)
    merged = conditional_upsert(master, updates, "c_custkey", "acct_value", "confidence")
    residual = upsert_changelog(
        merged, updates, "c_custkey", "acct_value", "confidence"
    )
    return residual.agg(F.count("*").alias("residual_changes"))


@query(
    "merge_cdc_apply",
    oracle="""
    WITH ch AS (
      SELECT o_custkey AS k, CAST(o_orderdate AS VARCHAR) AS ts,
             o_orderkey AS tb,
             CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
             CAST(o_totalprice AS DOUBLE) AS amount,
             o_orderpriority AS prio
      FROM orders
    ),
    w AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                                   ORDER BY ts DESC, tb DESC) AS rk
      FROM ch
    )
    SELECT k, ts, tb, amount, prio FROM w WHERE rk = 1 AND op <> 'D'
    ORDER BY k
    """,
)
def merge_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply with delete tombstones — the batch
    ``MERGE INTO`` (operators/merge.apply_cdc): orders become a
    synthetic per-customer change stream ordered by (orderdate,
    orderkey), every 7th order a delete tombstone; the current
    snapshot is the latest non-deleted change per key. ONE shuffle on
    the key serves a per-key argmax (``max(struct(ts, tiebreak,
    payload))`` — no per-key sort, map-side combined); the tombstone
    filter is a projection on the winner. The oracle recomputes every
    keep/delete decision with a row_number formulation."""
    from hummingbirddatapipeline_spark.operators.merge import apply_cdc

    ch = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("string").alias("ts"),
        F.col("o_orderkey").alias("tb"),
        F.when(F.col("o_orderkey") % 7 == 0, "D").otherwise("U").alias("op"),
        F.col("o_totalprice").cast("double").alias("amount"),
        F.col("o_orderpriority").alias("prio"),
    )
    return apply_cdc(ch, ["k"], "ts", "op", "tb")


# DuckDB replay of the deterministic recrawl fixture consumed by the
# r18-banked snapshot_delta: drop doc_id % 11 == 0, append ' rev2' to
# doc_id % 7 == 3, add brand-new keys at doc_id + 900000 for
# doc_id % 13 == 0. Shared with tests/test_r18_oracles.py.
DUCK_RECRAWL_CTE = """
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 3 THEN text || ' rev2'
                  ELSE text END AS text
      FROM documents WHERE doc_id % 11 <> 0
      UNION ALL
      SELECT doc_id + 900000 AS doc_id,
             'new doc ' || CAST(doc_id AS VARCHAR) AS text
      FROM documents WHERE doc_id % 13 = 0
"""


def _snapshot_delta_sql() -> str:
    """Independent DuckDB formulation of the corpus snapshot diff
    (operators/incremental.snapshot_delta): replays the recrawl
    fixture, re-derives both sides' normalized md5 fingerprints, and
    classifies every key with one full outer join."""
    fp = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
    return f"""
    WITH newsnap AS ({DUCK_RECRAWL_CTE}),
    o AS (SELECT doc_id, {fp} AS fa FROM documents),
    n AS (SELECT doc_id, {fp} AS fb FROM newsnap)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'new'
                WHEN n.doc_id IS NULL THEN 'vanished'
                WHEN fa = fb THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    """


@query("merge_snapshot_delta", oracle=_snapshot_delta_sql())
def merge_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (operators/incremental.snapshot_delta)
    under the full oracle gate — the recrawl-maintenance primitive:
    old vs new snapshots full-outer-join on doc_id with
    whitespace/case-normalized content fingerprints, labeling every
    key new / vanished / changed / unchanged. The fixture derives the
    "new" snapshot deterministically from documents (drop every 11th,
    revise every 7th=3, add one per 13th), so both engines construct
    the identical recrawl and the status counts are closed-form
    (pinned in tests/test_r18_oracles.py, with the cosmetic-rewrap
    invariance test).

    Scale shape: both sides reduce map-side to SKINNY (id,
    fingerprint) rows before the single full-outer equi-join — text
    never shuffles; a 100 TB recrawl diffs at the cost of one
    16-byte-row exchange."""
    from hummingbirddatapipeline_spark.operators.incremental import (
        snapshot_delta,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    mutated = docs.filter(d % 11 != 0).select(
        "doc_id",
        F.when(d % 7 == 3, F.concat(F.col("text"), F.lit(" rev2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.filter(d % 13 == 0).select(
        (d + 900000).alias("doc_id"),
        F.concat(F.lit("new doc "), d.cast("string")).alias("text"),
    )
    return snapshot_delta(docs, mutated.unionByName(added))


def _fellegi_sunter_sql() -> str:
    """Independent DuckDB formulation of the Fellegi-Sunter scoring row
    (operators/entity_resolution.fellegi_sunter_scores): frequency-
    method u as exact integer ratios (sum of squared group counts over
    N^2), one log2 per field rounded 6dp, summed and rounded 6dp —
    expression order mirrors the operator exactly so both engines walk
    the same IEEE doubles into each log2."""
    return """
    WITH pop AS (
      -- contract-corpus cap (see the row docstring): nation blocking
      -- is a CONSTANT-cardinality key, so pairs grow quadratically
      -- with the corpus; the cap is a no-op at sf0.001/0.01/0.1.
      SELECT * FROM customer WHERE c_custkey < 15000
    ),
    stats AS (
      SELECT
        (SELECT SUM(c*c) FROM (
           SELECT COUNT(*) AS c FROM pop GROUP BY c_mktsegment)) AS n2_seg,
        (SELECT SUM(c*c) FROM (
           SELECT COUNT(*) AS c FROM pop
           GROUP BY substring(c_name, 16, 2))) AS n2_phx,
        (SELECT SUM(c*c) FROM (
           SELECT COUNT(*) AS c FROM pop
           GROUP BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT))) AS n2_band,
        (SELECT COUNT(*) FROM pop) AS n
    ),
    fld AS (
      SELECT c_custkey, c_nationkey,
             c_mktsegment AS seg,
             substring(c_name, 16, 2) AS phx,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
      FROM pop
    ),
    p AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             a.seg = b.seg AS agree_seg,
             a.phx = b.phx AS agree_phx,
             a.band = b.band AS agree_band
      FROM fld a JOIN fld b
        ON a.c_nationkey = b.c_nationkey AND a.c_custkey <> b.c_custkey
      WHERE a.c_custkey % 10 = 1
    ),
    u AS (
      SELECT
        CAST(n2_seg AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS u_seg,
        CAST(n2_phx AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS u_phx,
        CAST(n2_band AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS u_band
      FROM stats
    )
    SELECT id_a, id_b, agree_seg, agree_phx, agree_band,
           ROUND(
             (CASE WHEN agree_seg THEN ROUND(LOG2(0.9 / u_seg), 6)
                   ELSE ROUND(LOG2((1 - 0.9) / (1 - u_seg)), 6) END)
           + (CASE WHEN agree_phx THEN ROUND(LOG2(0.95 / u_phx), 6)
                   ELSE ROUND(LOG2((1 - 0.95) / (1 - u_phx)), 6) END)
           + (CASE WHEN agree_band THEN ROUND(LOG2(0.8 / u_band), 6)
                   ELSE ROUND(LOG2((1 - 0.8) / (1 - u_band)), 6) END)
           , 6) AS score
    FROM p, u
    ORDER BY id_a, id_b
    """


@query("er_fellegi_sunter_scores", oracle=_fellegi_sunter_sql())
def er_fellegi_sunter_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic match scoring
    (operators/entity_resolution.fellegi_sunter_scores) under the full
    oracle gate — the decision-theory layer the reference's multipass
    and fuzzy joins lack: per-field log2(m/u) / log2((1-m)/(1-u))
    agreement weights with the frequency-method u estimated from the
    full customer population as an EXACT integer ratio, summed into
    the pair's match score. Fixture: every 10th customer as the
    source, candidates blocked on nation (the multipass tie-break
    key), fields = market segment (m=0.9), the padded id's
    mid digits as a synthetic postcode (m=0.95), and the 1000-unit
    balance band (m=0.8) — three fields
    with visibly different u so agreement on a rare field moves the
    score more than agreement on a common one, which is the method's
    whole point.

    Scale shape: three skinny distinct-value aggregates fold into ONE
    broadcast stats row; scoring is a pure projection over the
    blocked pair frame — the only shuffle is the blocking join that
    candidate generation owns anyway.

    CONTRACT-ROW FIXTURE CAP (r14; same rule as VERDICT r13 item 2):
    nation is a CONSTANT-cardinality blocking key (25 values), so the
    demo's candidate pairs grow quadratically with the corpus — the
    r14 sf1 receipt measured 179 s at 10x data pre-cap. The fixture
    is pinned at c_custkey < 15000 (a no-op at sf0.001/0.01/0.1,
    whose custkeys end at 14999) because the property this row gates
    — both engines walking identical IEEE doubles through the
    frequency-method u and the per-field log2 weights — is
    corpus-size-independent. Production candidate generation belongs
    to the blocking/LSH operators with non-constant keys
    (er_fuzzy_join_lsh, join_salted_hot_keys); the scoring layer
    itself is one map pass at any scale. Oracle applies the same
    cap."""
    from hummingbirddatapipeline_spark.operators.entity_resolution import (
        fellegi_sunter_scores,
    )

    cust = load(spark, sf_dir, "customer", fanout="full").filter(
        F.col("c_custkey") < 15000  # contract-corpus cap, see docstring
    )
    fld = cust.select(
        "c_custkey",
        "c_nationkey",
        F.col("c_mktsegment").alias("seg"),
        F.substring("c_name", 16, 2).alias("phx"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
    )
    a = fld.filter(F.col("c_custkey") % 10 == 1).select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("seg").alias("seg_a"),
        F.col("phx").alias("phx_a"),
        F.col("band").alias("band_a"),
    )
    b = fld.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("seg").alias("seg_b"),
        F.col("phx").alias("phx_b"),
        F.col("band").alias("band_b"),
    )
    pairs = a.join(b, "nk").filter(F.col("id_a") != F.col("id_b"))
    scored = fellegi_sunter_scores(
        pairs,
        cust.select(
            F.col("c_mktsegment").alias("seg"),
            F.substring("c_name", 16, 2).alias("phx"),
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
        ),
        fields=[
            ("seg_a", "seg_b", "seg", 0.9),
            ("phx_a", "phx_b", "phx", 0.95),
            ("band_a", "band_b", "band", 0.8),
        ],
        id_a="id_a",
        id_b="id_b",
    )
    return scored.select(
        "id_a", "id_b",
        F.col("agree_seg").alias("agree_seg"),
        F.col("agree_phx").alias("agree_phx"),
        F.col("agree_band").alias("agree_band"),
        "score",
    )
