"""Tiled (big-big) estimation strategy: results must be bit-identical to
the broadcast path on the same inputs, and the physical plan must be an
equi-join pipeline (no cartesian products, no driver collect of data)."""

from __future__ import annotations

import numpy as np
import pytest

from geostatssolvers_jl_spark.distances import Haversine
from geostatssolvers_jl_spark.operators.idw import solve_idw
from geostatssolvers_jl_spark.operators.kriging import (
    KrigingModel, solve_kriging,
)
from geostatssolvers_jl_spark.operators.lwr import solve_lwr
from geostatssolvers_jl_spark.variogram import GaussianVariogram


@pytest.fixture(scope="module")
def geo(spark):
    rng = np.random.default_rng(17)
    nd, nq = 800, 300
    d = spark.createDataFrame(
        [(int(i), float(x), float(y), float(v)) for i, (x, y, v) in enumerate(
            zip(rng.uniform(-60, 60, nd), rng.uniform(-50, 50, nd),
                rng.normal(10, 3, nd)))],
        "data_id long, lon double, lat double, z double",
    )
    q = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
            zip(rng.uniform(-55, 55, nq), rng.uniform(-45, 45, nq)))],
        "cell_id long, lon double, lat double",
    )
    return d, q


def _rows(df):
    out = {}
    for r in df.collect():
        vals = tuple(
            None if v is None or (isinstance(v, float) and np.isnan(v))
            else round(v, 9) if isinstance(v, float) else v
            for v in r[1:]
        )
        out[r[0]] = vals
    return out


def test_kriging_tiled_bit_identical(spark, geo):
    d, q = geo
    kw = dict(
        var="z",
        model=KrigingModel(variogram=GaussianVariogram(range=2000.0, sill=9.0)),
        data_coord_cols=["lon", "lat"], query_coord_cols=["lon", "lat"],
        maxneighbors=6, metric=Haversine(6371.0),
    )
    a = _rows(solve_kriging(d, q, strategy="local-broadcast", **kw))
    b = _rows(solve_kriging(d, q, strategy="local-tiled", tile_res=4, **kw))
    assert a == b


def test_idw_tiled_bit_identical(spark, geo):
    d, q = geo
    kw = dict(
        var="z", data_coord_cols=["lon", "lat"],
        query_coord_cols=["lon", "lat"], maxneighbors=5,
        metric=Haversine(6371.0),
    )
    a = _rows(solve_idw(d, q, strategy="local-broadcast", **kw))
    b = _rows(solve_idw(d, q, strategy="local-tiled", tile_res=4, **kw))
    assert a == b


def test_idw_tiled_radius_bit_identical(spark, geo):
    d, q = geo
    kw = dict(
        var="z", data_coord_cols=["lon", "lat"],
        query_coord_cols=["lon", "lat"], maxneighbors=5, radius=900.0,
        minneighbors=1, metric=Haversine(6371.0),
    )
    a = _rows(solve_idw(d, q, strategy="local-broadcast", **kw))
    b = _rows(solve_idw(d, q, strategy="local-tiled", tile_res=4, **kw))
    assert a == b


def test_lwr_tiled_bit_identical(spark, geo):
    d, q = geo
    kw = dict(
        var="z", data_coord_cols=["lon", "lat"],
        query_coord_cols=["lon", "lat"], maxneighbors=8,
        metric=Haversine(6371.0),
    )
    a = _rows(solve_lwr(d, q, strategy="local-broadcast", **kw))
    b = _rows(solve_lwr(d, q, strategy="local-tiled", tile_res=4, **kw))
    assert a == b


def test_auto_strategy_routes_big_data_tiled(spark, geo, monkeypatch):
    """auto + a data side above broadcast_limit must route tiled (never
    through collect_points)."""
    import geostatssolvers_jl_spark.neighbors as nb
    import geostatssolvers_jl_spark.operators.kriging as krig

    def boom(*a, **kw):  # pragma: no cover
        raise AssertionError("collect_points called for big data side")

    monkeypatch.setattr(krig, "collect_points", boom)
    monkeypatch.setattr(nb, "collect_points", boom)
    d, q = geo
    out = solve_kriging(
        d, q, var="z",
        model=KrigingModel(variogram=GaussianVariogram(range=2000.0, sill=9.0)),
        data_coord_cols=["lon", "lat"], query_coord_cols=["lon", "lat"],
        maxneighbors=4, metric=Haversine(6371.0),
        strategy="auto", broadcast_limit=100, tile_res=4,
    )
    assert out.count() == 300


def test_tiled_plan_is_equijoin(spark, geo):
    """The tiled plan must not contain cartesian products or broadcast
    nested loops — candidates flow through equi-joins only."""
    d, q = geo
    out = solve_idw(
        d, q, var="z", data_coord_cols=["lon", "lat"],
        query_coord_cols=["lon", "lat"], maxneighbors=5,
        metric=Haversine(6371.0), strategy="local-tiled", tile_res=4,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tiled_duplicate_data_ids_no_fanout(spark, geo):
    """Content-derived data_ids collide for byte-identical rows; the
    attribute join must not fan out (a plain join would gather >k structs
    per cell and truncate REAL neighbors — r2 ADVICE finding).  Duplicated
    rows through the tiled path must match the broadcast path on the same
    duplicated input."""
    d, q = geo
    dup = d.limit(40)
    ddup = d.union(dup)  # 40 byte-identical duplicate rows, same data_id
    kw = dict(
        var="z", data_coord_cols=["lon", "lat"],
        query_coord_cols=["lon", "lat"], maxneighbors=5,
        metric=Haversine(6371.0),
    )
    a = _rows(solve_idw(ddup, q, strategy="local-broadcast", **kw))
    b = _rows(solve_idw(ddup, q, strategy="local-tiled", tile_res=4, **kw))
    assert a == b
