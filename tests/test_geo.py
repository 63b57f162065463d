"""Spatial radius-join tests: hand-verified haversine distances, cell
coverage across boundaries, and a plan contract (equi-join on the
cell, never a nested-loop distance join)."""

from __future__ import annotations


def test_radius_join_finds_neighbors_and_excludes_far(spark):
    from hummingbirddatapipeline_spark.operators.geo import radius_join

    # ~111 m per 0.001 deg lat at the equator
    points = spark.createDataFrame(
        [
            (1, 0.0, 0.0),
            (2, 0.0008, 0.0),   # ~89 m north
            (3, 0.0, 0.003),    # ~334 m east
            (4, 45.0, 45.0),    # far away
        ],
        "pid long, lat double, lon double",
    )
    queries = spark.createDataFrame(
        [(10, 0.0, 0.0)], "qid long, q_lat double, q_lon double"
    )
    out = {r["pid"]: r["distance_m"] for r in radius_join(points, queries, 150.0).collect()}
    assert set(out) == {1, 2}
    assert out[1] == 0.0 and 85.0 <= out[2] <= 95.0


def test_radius_join_crosses_cell_boundaries(spark):
    from hummingbirddatapipeline_spark.operators.geo import radius_join

    # query sits just west of a cell boundary; neighbor just east of it
    points = spark.createDataFrame(
        [(1, 0.0, 0.001351)], "pid long, lat double, lon double"
    )
    queries = spark.createDataFrame(
        [(10, 0.0, 0.001349)], "qid long, q_lat double, q_lon double"
    )
    out = radius_join(points, queries, 150.0).collect()
    assert len(out) == 1 and out[0]["distance_m"] < 1.0


def test_radius_join_is_equi_join_not_nested_loop(spark):
    from hummingbirddatapipeline_spark.operators.geo import radius_join

    points = spark.range(100).selectExpr(
        "id AS pid", "CAST(id % 10 AS DOUBLE) / 1000 AS lat",
        "CAST(id DIV 10 AS DOUBLE) / 1000 AS lon",
    )
    queries = spark.range(5).selectExpr(
        "id AS qid", "0.001 AS q_lat", "0.002 AS q_lon"
    )
    plan = radius_join(points, queries, 200.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
