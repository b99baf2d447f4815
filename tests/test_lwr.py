"""LWR tests — mirrors /root/reference/test/estimation/lwr.jl."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from geostatssolvers_jl_spark.distances import Haversine
from geostatssolvers_jl_spark.grid import CartesianGrid
from geostatssolvers_jl_spark.operators.lwr import solve_lwr

DATA_DIR = Path(__file__).parent / "data"


def test_lwr_1d_regression(spark):
    # reference lwr.jl:2-17 (noise seed differs; fit quality is the check)
    rng = np.random.default_rng(2017)
    N = 100
    x = np.linspace(0.0, 1.0, N)
    y = x**2 + (np.arange(1, N + 1) / 1000.0) * rng.standard_normal(N)
    data = spark.createDataFrame(
        [(i, float(x[i]), float(y[i])) for i in range(N)],
        "data_id long, x double, y double",
    )
    grid = CartesianGrid.from_extent((0.0,), (1.0,), (N,))
    sol = solve_lwr(
        data, grid.spark_df(spark), var="y",
        data_coord_cols=["x"], query_coord_cols=["cx"], maxneighbors=10,
    ).collect()
    assert len(sol) == N
    cx = grid.origin[0] + (np.arange(1, N + 1) - 0.5) * grid.spacing[0]
    err = [abs(r["y"] - cx[r["cell_id"]] ** 2) for r in sol]
    assert max(err) < 0.12  # tracks x² through the (small) noise
    assert all(r["y_variance"] is not None and r["y_variance"] >= 0 for r in sol)


def test_lwr_2d(spark):
    # lwr.jl:20-28
    data = spark.createDataFrame(
        [(0, 25.0, 25.0, 1.0), (1, 50.0, 75.0, 0.0),
         (2, 75.0, 50.0, 1.0), (3, 75.0, 25.0, 0.0)],
        "data_id long, x double, y double, z double",
    )
    grid = CartesianGrid((100, 100))
    for k in (3, 4):
        sol = solve_lwr(data, grid.spark_df(spark), maxneighbors=k).collect()
        assert len(sol) == 10000
        assert all(r["z"] is not None for r in sol)


def test_lwr_haversine_coords(spark):
    # lwr.jl:40-53 with the golden coords.txt (244 geographic points),
    # loaded through the engine's delimited source path (SURVEY §2.1 S2:
    # reference readdlm ⇔ spark.read.csv)
    data = (
        spark.read.csv(
            str(DATA_DIR / "coords.txt"), sep="\t",
            schema="x double, y double, z double",
        )
        .selectExpr(
            "monotonically_increasing_id() AS data_id", "x", "y", "z"
        )
    )
    A = np.loadtxt(DATA_DIR / "coords.txt")
    assert data.count() == len(A)
    grid = CartesianGrid.from_extent(
        (1.0, -89.01098901098901), (359.0, 89.01098901098901), (180, 91)
    )
    sol = solve_lwr(
        data, grid.spark_df(spark), maxneighbors=49,
        metric=Haversine(6371.0),
    ).collect()
    assert len(sol) == 180 * 91
    zs = [r["z"] for r in sol]
    assert all(z is not None for z in zs)
    # estimates stay within data range hull-ish bounds
    assert min(zs) > float(A[:, 2].min()) - 30
    assert max(zs) < float(A[:, 2].max()) + 30
