"""Differential (DuckDB) checks for the operators banked for round-15
catalog registration — IVF-PQ composed ANN (frozen-cell routing x
PQ/ADC ranking), stride-scheduled deterministic mixture ordering
(closed-form global position, no global sort), and per-dimension uint8
scalar-quantization fidelity — run on the real testdata exactly the
way the catalog oracle gate would. Each DuckDB side is an independent
formulation: the IVF-PQ oracle re-derives cell assignment, probe
lists, and all m Lloyd trajectories as chained CTEs; the interleave
oracle counts predecessors pairwise (O(n^2) exact integer compares)
against Spark's closed form; the SQ8 oracle rebuilds the per-dim grid
and the floor(x + 0.5) codes from the raw embeddings."""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import functions as F

# BANK_SF_DIR lets the registration dry-run re-check every banked
# differential at the driver gate's scale (sf0.01) without
# duplicating the Spark-side builders
SF = os.environ.get("BANK_SF_DIR", "/root/testdata/sf0.001")


def _duck(table: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, table + '.parquet')}')"
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


def _emb(spark):
    from hummingbirddatapipeline_spark.tables import load

    return load(spark, SF, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


def _queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def _run_pair(spark, name, table):
    """Differential through catalog.resolve_pair — the exact
    registration code; promoting the tier to @query changes nothing."""
    from hummingbirddatapipeline_spark.catalog import resolve_pair

    fn, sql = resolve_pair(name)
    got = [tuple(r) for r in fn(spark, SF).collect()]
    con = _duck(table)
    exp = con.sql(sql).fetchall()
    con.close()
    return got, exp


def test_ivfpq_topk_matches_duckdb(spark):
    got, exp = _run_pair(spark, "similarity_ivfpq_topk", "embeddings")
    assert len(got) == len(exp) == 50  # 5 queries x k
    assert _norm(got) == _norm(exp)


def test_ivfpq_adc_consistent_with_pq(spark):
    """Composition contract: IVF-PQ is pq_topk restricted to probed
    cells — every (query, item) it returns must carry EXACTLY the
    adc_dist the full-scan pq_topk computes for that pair (same
    codebooks via the shared trainer), and its candidate set must be
    a subset of the probed cells' population."""
    from hummingbirddatapipeline_spark.artifacts import IVF_CENTROIDS_64D
    from hummingbirddatapipeline_spark.operators.similarity import (
        ivf_incremental_add,
        ivfpq_topk,
        pq_topk,
    )

    emb = _emb(spark)
    q = _queries(emb)
    ivfpq = ivfpq_topk(
        emb, q, dim=64, centroids=IVF_CENTROIDS_64D, n_probe=4, k=10
    )
    # pq_topk with k large enough to cover every probed candidate
    full = pq_topk(emb, q, dim=64, k=600).select(
        "query_id", "vec_id", F.col("adc_dist").alias("full_adc")
    )
    joined = ivfpq.join(full, ["query_id", "vec_id"], "left").collect()
    assert len(joined) == 50
    for r in joined:
        assert r["full_adc"] is not None
        assert r["adc_dist"] == r["full_adc"]
    cells = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_incremental_add(
            emb.select("vec_id", "embedding"), IVF_CENTROIDS_64D
        ).collect()
    }
    probed = {}
    for r in joined:
        probed.setdefault(r["query_id"], set()).add(cells[r["vec_id"]])
    for qid, used in probed.items():
        assert len(used) <= 4  # never touches more than n_probe cells


def test_interleave_order_matches_duckdb(spark):
    got, exp = _run_pair(spark, "sample_interleave_order", "documents")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    # total order: global_seq is a permutation of 1..N
    seqs = sorted(r[3] for r in got)
    assert seqs == list(range(1, len(got) + 1))


def test_interleave_stride_pattern(spark):
    """Constructive stride contract: two sources at weights 2:1
    interleave as X X Y X X Y (ties at integer virtual times break to
    the lexically smaller source), and every prefix is
    weight-proportional to within one document."""
    from hummingbirddatapipeline_spark.operators.sampling import (
        interleave_order,
    )

    rows = [(i, "X") for i in range(4)] + [(100 + i, "Y") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sorted(
        interleave_order(df, {"X": 2, "Y": 1}).collect(),
        key=lambda r: r["global_seq"],
    )
    assert [r["source"] for r in out] == ["X", "X", "Y", "X", "X", "Y"]
    for n in range(1, 7):
        n_x = sum(1 for r in out[:n] if r["source"] == "X")
        assert abs(n_x - n * 2 / 3) <= 1


def test_sq8_fidelity_matches_duckdb(spark):
    got, exp = _run_pair(spark, "similarity_sq8_fidelity", "embeddings")
    assert len(got) == len(exp) == _emb(spark).count()
    assert _norm(got) == _norm(exp)
    # 8-bit per-dim grids hold cosine fidelity extremely tight on
    # bounded data, and codes stay inside the 0..255*64 envelope
    fids = [r[2] for r in got]
    assert min(fids) > 0.99
    for _id, cs, _f, err in got:
        assert 0 <= cs <= 255 * 64
        assert err >= 0.0
