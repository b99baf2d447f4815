"""Unit propagation + compositional IDW — mirror test/estimation/idw.jl
units/compositional sections and lwr.jl:56-69."""

from __future__ import annotations

import numpy as np
import pytest

from geostatssolvers_jl_spark.grid import CartesianGrid
from geostatssolvers_jl_spark.operators.idw import (
    aitchison,
    closure,
    ilr,
    ilr_inv,
    solve_idw,
    solve_idw_compositional,
)
from geostatssolvers_jl_spark.operators.lwr import solve_lwr
from geostatssolvers_jl_spark.units import result_units, uadjust


def test_ilr_roundtrip():
    rng = np.random.default_rng(0)
    c = closure(rng.uniform(0.1, 1.0, (50, 4)))
    assert np.allclose(ilr_inv(ilr(c)), c, atol=1e-12)
    assert np.allclose(aitchison(c, c), 0.0)


def test_affine_units_idw(spark):
    """°C data must produce the same numbers as the equivalent K data,
    with output metadata in K (idw.jl:30-41)."""
    grid = CartesianGrid((5, 5))
    gdf = grid.spark_df(spark)
    kelvin = spark.createDataFrame(
        [(0, 25.0, 25.0, 1.0), (1, 50.0, 75.0, 0.0), (2, 75.0, 50.0, 1.0)],
        "data_id long, x double, y double, T double",
    )
    celsius = spark.createDataFrame(
        [(0, 25.0, 25.0, -272.15), (1, 50.0, 75.0, -273.15),
         (2, 75.0, 50.0, -272.15)],
        "data_id long, x double, y double, T double",
    )
    cel_adj, unit = uadjust(celsius, "T", "degC")
    assert unit == "K"
    a = {r["cell_id"]: r["T"] for r in solve_idw(kelvin, gdf, var="T", maxneighbors=None).collect()}
    b = {r["cell_id"]: r["T"] for r in solve_idw(cel_adj, gdf, var="T", maxneighbors=None).collect()}
    for c in a:
        assert a[c] == pytest.approx(b[c], abs=1e-9)
    meta = result_units("degC", "T")
    assert meta == {"T": "K", "T_variance": "K^2"}


def test_affine_units_lwr(spark):
    # lwr.jl:56-69: T in K, T_variance in K²
    grid = CartesianGrid((5, 5))
    data = spark.createDataFrame(
        [(0, 25.0, 25.0, -272.15), (1, 50.0, 75.0, -273.15),
         (2, 75.0, 50.0, -272.15)],
        "data_id long, x double, y double, T double",
    )
    adj, unit = uadjust(data, "T", "degC")
    sol = solve_lwr(adj, grid.spark_df(spark), var="T", maxneighbors=3)
    rows = sol.collect()
    assert all(0.0 <= r["T"] <= 1.5 for r in rows)  # K-space values
    assert result_units(unit, "T")["T_variance"] == "K^2"


def test_compositional_idw_golden(spark):
    # idw.jl:47-65: IDW estimate at the data cells within Aitchison 1e-2
    data = spark.createDataFrame(
        [(25.0, 25.0, [0.1, 0.2]), (50.0, 75.0, [0.3, 0.4]),
         (75.0, 50.0, [0.5, 0.6])],
        "x double, y double, z array<double>",
    )
    grid = CartesianGrid((100, 100), (0.5, 0.5), (1.0, 1.0))
    sol = solve_idw_compositional(data, grid.spark_df(spark), maxneighbors=None)
    rows = {r["cell_id"]: r["z"] for r in sol.collect()}
    assert len(rows) == 10000
    for (i, j), datum in [((25, 25), [0.1, 0.2]), ((50, 75), [0.3, 0.4]),
                          ((75, 50), [0.5, 0.6])]:
        cell = (j - 1) * 100 + (i - 1)
        got = np.array([rows[cell]])
        want = closure(np.array([datum]))
        assert aitchison(got, want)[0] < 1e-2
        assert got.sum() == pytest.approx(1.0, abs=1e-9)  # closed output


def test_compositional_idw_tiled_bit_identical(spark):
    """strategy='local-tiled' must reproduce the broadcast path bit-for-bit
    (same ilr gather, same kernel op order) — r2 verdict item: the
    compositional solver was the only one not routed through the strategy
    dispatch."""
    rng = np.random.default_rng(23)
    nd = 120
    rows = [
        (int(i), float(x), float(y), [float(a), float(b), float(c)])
        for i, (x, y, a, b, c) in enumerate(zip(
            rng.uniform(-60, 60, nd), rng.uniform(-50, 50, nd),
            rng.uniform(0.1, 1.0, nd), rng.uniform(0.1, 1.0, nd),
            rng.uniform(0.1, 1.0, nd)))
    ]
    data = spark.createDataFrame(
        rows, "data_id long, x double, y double, z array<double>"
    )
    q = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(
            rng.uniform(-55, 55, 80), rng.uniform(-45, 45, 80)))],
        "cell_id long, cx double, cy double",
    )
    kw = dict(var="z", data_coord_cols=["x", "y"],
              query_coord_cols=["cx", "cy"], maxneighbors=4)
    a = {r["cell_id"]: r["z"]
         for r in solve_idw_compositional(
             data, q, strategy="local-broadcast", **kw).collect()}
    b = {r["cell_id"]: r["z"]
         for r in solve_idw_compositional(
             data, q, strategy="local-tiled", tile_res=3, **kw).collect()}
    assert a == b


def test_compositional_idw_tie_break_deterministic(spark):
    """Distance TIES must break on data_id in both physical paths (the
    review found the broadcast path used collection order): two data
    points exactly equidistant from each query, ids supplied in
    DESCENDING row order — both paths must pick the same (min-id-first)
    neighbor set and agree bit-for-bit."""
    # ids reversed vs row order on purpose
    data = spark.createDataFrame(
        [(5, 2.0, 0.0, [0.7, 0.2, 0.1]), (1, 0.0, 0.0, [0.1, 0.2, 0.7]),
         (3, 1.0, 1.0, [0.3, 0.3, 0.4])],
        "data_id long, x double, y double, z array<double>",
    )
    q = spark.createDataFrame(
        [(0, 1.0, 0.0), (1, 1.0, 2.0)],
        "cell_id long, cx double, cy double",
    )
    kw = dict(var="z", data_coord_cols=["x", "y"],
              query_coord_cols=["cx", "cy"], maxneighbors=2)
    a = {r["cell_id"]: r["z"]
         for r in solve_idw_compositional(
             data, q, strategy="local-broadcast", **kw).collect()}
    b = {r["cell_id"]: r["z"]
         for r in solve_idw_compositional(
             data, q, strategy="local-tiled", tile_res=3, **kw).collect()}
    assert a == b
