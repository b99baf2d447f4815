"""Simulation solver tests — mirror /root/reference/test/simulation/*."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geostatssolvers_jl_spark.grid import CartesianGrid
from geostatssolvers_jl_spark.simulation.cookie import cookie_cutter
from geostatssolvers_jl_spark.simulation.fftgs import solve_fftgs
from geostatssolvers_jl_spark.simulation.lugs import LUGSVariable, solve_lugs
from geostatssolvers_jl_spark.simulation.seqsim import SGSParams, solve_sgs
from geostatssolvers_jl_spark.variogram import (
    GaussianVariogram,
    PowerVariogram,
    SphericalVariogram,
)

GRID1D = CartesianGrid((100,))


@pytest.fixture(scope="module")
def data1d_lu(spark):
    # test/simulation/lu.jl:2 — x = 0,25,50,75,100; z = [0,1,0,1,0]
    rows = [(i, float(25 * i), float(i % 2)) for i in range(5)]
    return spark.createDataFrame(rows, "data_id long, x double, z double")


def test_lugs_conditional_1d(spark, data1d_lu):
    # lu.jl:5-13: conditional simulation reproduces data at data cells
    sol = solve_lugs(
        spark, GRID1D, nreals=3,
        variables=[LUGSVariable(variogram=SphericalVariogram(range=10.0))],
        data=data1d_lu, data_coord_cols=["x"],
    )
    rows = sol.collect()
    assert len(rows) == 300
    byreal = {}
    for r in rows:
        byreal.setdefault(r["real_id"], {})[r["cell_id"]] = r["z"]
    # data at x=0,25,50,75 snap to cells 0,25,50,75; x=100 clamps to 99
    for real in byreal.values():
        for cell, val in [(0, 0.0), (25, 1.0), (50, 0.0), (75, 1.0), (99, 0.0)]:
            assert real[cell] == pytest.approx(val, abs=1e-9)
    # realizations differ from one another away from data
    vals = [byreal[i][10] for i in sorted(byreal)]
    assert len(set(np.round(vals, 12))) > 1


def test_lugs_unconditional_mean(spark):
    # lu.jl:142-147: mean only in unconditional simulation
    sol = solve_lugs(
        spark, GRID1D, nreals=4,
        variables=[LUGSVariable(variogram=GaussianVariogram(range=10.0), mean=5.0)],
    )
    m = sol.agg(F.avg("z")).collect()[0][0]
    assert m == pytest.approx(5.0, abs=0.8)


def test_lugs_correlated_cosim(spark):
    # lu.jl:56-77: two correlated variables
    # matched variograms ⇒ pointwise correlation ≈ ρ (Oliver 2003); the
    # reference's own test (lu.jl:26-39) is smoke-only with mixed models
    sol = solve_lugs(
        spark, CartesianGrid((200,)), nreals=6,
        variables=[
            LUGSVariable(variogram=SphericalVariogram(range=10.0), var="a"),
            LUGSVariable(variogram=SphericalVariogram(range=10.0), var="b"),
        ],
        correlation=0.95,
    )
    pdf = sol.toPandas()
    corr = np.corrcoef(pdf["a"], pdf["b"])[0, 1]
    assert corr > 0.8
    # mixed-model variant still runs (reference smoke case)
    solve_lugs(
        spark, CartesianGrid((60,)), nreals=1,
        variables=[
            LUGSVariable(variogram=SphericalVariogram(range=10.0), var="a"),
            LUGSVariable(variogram=GaussianVariogram(range=10.0), var="b"),
        ],
        correlation=0.95,
    ).count()


def test_lugs_stationarity_check(spark):
    with pytest.raises(ValueError, match="stationary"):
        solve_lugs(
            spark, GRID1D, nreals=1,
            variables=[LUGSVariable(variogram=PowerVariogram())],
        )


def test_lugs_determinism(spark, data1d_lu):
    a = solve_lugs(
        spark, GRID1D, nreals=2,
        variables=[LUGSVariable(variogram=SphericalVariogram(range=10.0))],
        data=data1d_lu, data_coord_cols=["x"], seed=11,
    ).orderBy("real_id", "cell_id").collect()
    b = solve_lugs(
        spark, GRID1D, nreals=2,
        variables=[LUGSVariable(variogram=SphericalVariogram(range=10.0))],
        data=data1d_lu, data_coord_cols=["x"], seed=11,
    ).orderBy("real_id", "cell_id").collect()
    assert a == b


def test_fftgs_unconditional_2d(spark):
    # fft.jl tests: shape + moments
    grid = CartesianGrid((40, 40))
    vg = GaussianVariogram(range=5.0)
    sol = solve_fftgs(spark, grid, nreals=3, variogram=vg, mean=2.0, seed=3)
    pdf = sol.toPandas()
    assert len(pdf) == 3 * 1600
    assert pdf["z"].mean() == pytest.approx(2.0, abs=0.3)
    assert pdf.groupby("real_id")["z"].var().mean() == pytest.approx(
        1.0, rel=0.5
    )


def test_fftgs_conditional_exact_at_data(spark, data2d_3pt):
    # conditioning reproduces data at data cells (sgs.jl:18-20 semantics)
    grid = CartesianGrid((100, 100), (0.5, 0.5), (1.0, 1.0))
    sol = solve_fftgs(
        spark, grid, nreals=2,
        variogram=GaussianVariogram(range=10.0),
        data=data2d_3pt, maxneighbors=3, seed=5,
    )
    rows = sol.collect()
    byreal = {}
    for r in rows:
        byreal.setdefault(r["real_id"], {})[r["cell_id"]] = r["z"]
    for real in byreal.values():
        for (i, j), v in [((25, 25), 1.0), ((50, 75), 0.0), ((75, 50), 1.0)]:
            # data (25,25) → nearest cell floor((25-0.5)/1)=24 → (i-1,j-1)
            cell = (j - 1) * 100 + (i - 1)
            assert real[cell] == pytest.approx(v, abs=1e-9)


def test_sgs_conditioning_exact(spark, data2d_3pt):
    # test/simulation/sgs.jl:9-20 golden: every realization reproduces
    # the conditioning data exactly at the data cells
    grid = CartesianGrid((100, 100), (0.5, 0.5), (1.0, 1.0))
    sol = solve_sgs(
        spark, grid, nreals=3,
        params=SGSParams(
            variogram=SphericalVariogram(range=35.0),
            maxneighbors=3, radius=30.0,
        ),
        data=data2d_3pt, seed=9, tiles=(2, 2),
    )
    rows = sol.collect()
    assert len(rows) == 3 * 10000
    byreal = {}
    for r in rows:
        byreal.setdefault(r["real_id"], {})[r["cell_id"]] = r["z"]
    assert len(byreal) == 3
    for real in byreal.values():
        for (i, j), v in [((25, 25), 1.0), ((50, 75), 0.0), ((75, 50), 1.0)]:
            cell = (j - 1) * 100 + (i - 1)
            assert real[cell] == v


def test_sgs_determinism_across_tilings(spark):
    """Same seed + same tiling ⇒ bit-reproducible; a DIFFERENT tiling is a
    different (seed, real, tile) stream, so only ensemble statistics must
    agree (the r3 test review found the old version never varied tiles)."""
    import numpy as np

    grid = CartesianGrid((20, 20))
    p = SGSParams(variogram=GaussianVariogram(range=5.0), maxneighbors=6)
    a = solve_sgs(spark, grid, 2, p, seed=4).orderBy("real_id", "cell_id").collect()
    b = solve_sgs(spark, grid, 2, p, seed=4).orderBy("real_id", "cell_id").collect()
    assert a == b
    c = solve_sgs(spark, grid, 2, p, seed=4, tiles=(2, 2)).collect()
    assert len(c) == len(a)
    za = np.array([r["z"] for r in a])
    zc = np.array([r["z"] for r in c])
    assert abs(za.mean() - zc.mean()) < 0.3
    assert abs(za.std() - zc.std()) < 0.3


def test_cookie_cutter(spark):
    # cookie.jl semantics: master facies selects secondary values
    grid = CartesianGrid((10, 10))
    master = spark.range(2).crossJoin(
        grid.spark_df(spark).select("cell_id")
    ).selectExpr(
        "id AS real_id", "cell_id",
        "CASE WHEN cell_id < 50 THEN 0 ELSE 1 END AS f",
    )
    s0 = solve_lugs(spark, grid, 2, [LUGSVariable(variogram=GaussianVariogram(range=3.0), mean=10.0)], seed=1)
    s1 = solve_lugs(spark, grid, 2, [LUGSVariable(variogram=GaussianVariogram(range=3.0), mean=-10.0)], seed=2)
    out = cookie_cutter(master, "f", {0: s0, 1: s1})
    pdf = out.toPandas()
    assert len(pdf) == 200
    low = pdf[pdf.cell_id < 50]["z"]
    high = pdf[pdf.cell_id >= 50]["z"]
    assert low.mean() > 5.0 and high.mean() < -5.0


def test_fftgs_conditioning_single_pass_plan(spark):
    """Conditional FFTGS must be ONE mapInPandas pass — no per-realization
    driver loop, no join, no union tree (r1 ran 1 kriging job per real)."""
    from geostatssolvers_jl_spark.grid import CartesianGrid
    from geostatssolvers_jl_spark.simulation.fftgs import solve_fftgs
    from geostatssolvers_jl_spark.variogram import GaussianVariogram

    data = spark.createDataFrame(
        [(0, 12.0, 12.0, 1.0), (1, 30.0, 20.0, -1.0)],
        "data_id long, x double, y double, z double",
    )
    grid = CartesianGrid((40, 40))
    sol = solve_fftgs(
        spark, grid, nreals=64, variogram=GaussianVariogram(range=8.0),
        data=data, maxneighbors=2, seed=3,
    )
    plan = sol._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Union" not in plan
    assert plan.count("MapInPandas") == 1
    pdf = sol.toPandas()
    assert len(pdf) == 64 * 1600
    # conditioning exactness: every realization carries the datum at the
    # snapped data cells (test/simulation/fft.jl semantics)
    snap0 = 12 + 12 * 40  # floor((12-0)/1)=12 both axes
    at0 = pdf[pdf.cell_id == snap0]
    assert (at0.z == 1.0).all()


def test_sgs_index_path_equals_dense(spark):
    """The incremental bucket index must reproduce the dense rescan
    BIT-EXACTLY (same neighbor sets + canonical order => same RNG stream
    consumption => identical realizations), including on a tie-heavy
    regular grid and with a radius."""
    import numpy as np

    from geostatssolvers_jl_spark.grid import CartesianGrid
    from geostatssolvers_jl_spark.simulation.seqsim import (
        SGSParams, _simulate_tile,
    )
    from geostatssolvers_jl_spark.variogram import SphericalVariogram

    grid = CartesianGrid((24, 24))
    from geostatssolvers_jl_spark.simulation.lugs import _centroids

    pts = _centroids(grid)
    cells = np.arange(grid.ncells)
    init = {0: 1.0, 301: -0.5, 575: 2.0}
    for radius, path in [(None, "linear"), (6.0, "random"), (2.5, "linear")]:
        p = SGSParams(
            variogram=SphericalVariogram(range=8.0), maxneighbors=5,
            radius=radius, path=path,
        )
        a = _simulate_tile(
            np.random.default_rng(7), cells, pts, p, init,
        )
        b = _simulate_tile(
            np.random.default_rng(7), cells, pts, p, init, force_dense=True,
        )
        assert np.array_equal(a, b), (radius, path)


def test_multigrid_path_order_and_conditioning(spark):
    """MultiGridPath (reference path protocol, test/estimation/krig.jl:85):
    coarse lattice first, all cells visited exactly once, conditioning
    still exact."""
    import numpy as np

    from geostatssolvers_jl_spark.simulation.lugs import _centroids
    from geostatssolvers_jl_spark.simulation.seqsim import _multigrid_order

    grid = CartesianGrid((8, 8))
    pts = _centroids(grid)
    order = _multigrid_order(pts)
    assert sorted(order) == list(range(64))
    # the first wave is the stride-4 lattice: (i, j) with i%4==0, j%4==0
    first4 = set(order[:4].tolist())
    assert first4 == {0, 4, 32, 36}

    grid2 = CartesianGrid((30, 30))
    data = spark.createDataFrame(
        [(0, 5.0, 5.0, 2.0)], "data_id long, x double, y double, z double",
    )
    sol = solve_sgs(
        spark, grid2, nreals=2,
        params=SGSParams(
            variogram=GaussianVariogram(range=6.0), maxneighbors=4,
            path="multigrid",
        ),
        data=data, seed=2,
    )
    rows = sol.filter("cell_id = 155").collect()  # floor(4.5)=4 + 5*30
    assert len(rows) == 2 and all(r["z"] == 2.0 for r in rows)


def test_lugs_lu_factorization(spark, data1d_lu):
    """Pluggable factorization (lu.jl:72-73): `lu` factor must satisfy
    B·Bᵀ = C and the conditional simulation must still reproduce data."""
    import numpy as np

    from geostatssolvers_jl_spark.simulation.lugs import _lu_factor

    rng = np.random.default_rng(8)
    X = rng.normal(size=(40, 3))
    C = X @ X.T + 40 * np.eye(40)
    B = _lu_factor(C)
    assert np.allclose(B @ B.T, C, atol=1e-8)
    assert np.allclose(B, np.tril(B))  # lower-triangular factor

    sol = solve_lugs(
        spark, GRID1D, nreals=2,
        variables=[LUGSVariable(
            variogram=SphericalVariogram(range=10.0), factorization="lu",
        )],
        data=data1d_lu, data_coord_cols=["x"], seed=6,
    )
    rows = sol.filter("cell_id IN (0, 25, 50, 75, 99)").collect()
    want = {0: 0.0, 25: 1.0, 50: 0.0, 75: 1.0, 99: 0.0}
    assert len(rows) == 10
    for r in rows:
        assert r["z"] == want[r["cell_id"]]


def test_fftgs_tiled_halo(spark, data2d_3pt):
    """Tiled-halo FFTGS (fft.jl:46-47 validity rule): full cell coverage,
    per-tile stationarity (mean/sill), conditioning exact at data cells,
    deterministic rerun."""
    import numpy as np

    grid = CartesianGrid((60, 60), (0.5, 0.5), (1.0, 1.0))
    # unconditional: coverage + moments
    sol = solve_fftgs(
        spark, grid, nreals=4, variogram=GaussianVariogram(range=5.0),
        mean=7.0, seed=13, tile_dims=(2, 2),
    )
    pdf = sol.toPandas()
    assert len(pdf) == 4 * 3600
    assert sorted(pdf[pdf.real_id == 0].cell_id) == list(range(3600))
    assert abs(pdf.z.mean() - 7.0) < 0.2
    assert abs(pdf.groupby("real_id").z.var().mean() - 1.0) < 0.25
    # determinism
    pdf2 = solve_fftgs(
        spark, grid, nreals=4, variogram=GaussianVariogram(range=5.0),
        mean=7.0, seed=13, tile_dims=(2, 2),
    ).toPandas()
    a = pdf.sort_values(["real_id", "cell_id"]).z.to_numpy()
    b = pdf2.sort_values(["real_id", "cell_id"]).z.to_numpy()
    assert np.array_equal(a, b)

    # conditional: datum exact in every realization, at all 3 cells
    grid2 = CartesianGrid((100, 100), (0.5, 0.5), (1.0, 1.0))
    solc = solve_fftgs(
        spark, grid2, nreals=2, variogram=GaussianVariogram(range=10.0),
        data=data2d_3pt, maxneighbors=3, seed=5, tile_dims=(2, 2),
    )
    rows = solc.collect()
    assert len(rows) == 2 * 10000
    byreal = {}
    for r in rows:
        byreal.setdefault(r["real_id"], {})[r["cell_id"]] = r["z"]
    for real in byreal.values():
        for (i, j), v in [((25, 25), 1.0), ((50, 75), 0.0), ((75, 50), 1.0)]:
            cell = (j - 1) * 100 + (i - 1)
            assert real[cell] == pytest.approx(v, abs=1e-12)


def test_fftgs_tiled_conditional_is_distributed(spark, data2d_3pt):
    """The tiled conditional path must build its residuals as a
    distributed relation — no driver-side nreals × ndata matrix and no
    toPandas of the pass-A output (the scale bound the r4 design
    removed).  Checked by running the solve with a toPandas tripwire and
    verifying the plan string contains the residual shuffle join."""
    from unittest import mock

    try:  # pyspark ≥4: the concrete (non-Connect) implementation class
        from pyspark.sql.classic.dataframe import DataFrame as SparkDF
    except ImportError:  # pyspark 3.x
        from pyspark.sql import DataFrame as SparkDF

    grid = CartesianGrid((100, 100), (0.5, 0.5), (1.0, 1.0))
    real_topandas = SparkDF.toPandas
    calls = []

    def spy(self):
        calls.append(self.schema.simpleString())
        return real_topandas(self)

    with mock.patch.object(SparkDF, "toPandas", spy):
        sol = solve_fftgs(
            spark, grid, nreals=2,
            variogram=GaussianVariogram(range=10.0),
            data=data2d_3pt, maxneighbors=3, seed=5, tile_dims=(2, 2),
        )
        pdf = real_topandas(sol)
    # the only permitted driver collect is the snapped conditioning set
    # (one row per data-bearing cell) — never a (real_id, cell_id, z)
    # unconditional-values frame
    assert all("real_id" not in s for s in calls), calls
    assert len(pdf) == 2 * 10000
    # datum exact in every realization (fft.jl:190 hard-data overwrite)
    byreal = {}
    for r in pdf.itertuples(index=False):
        byreal.setdefault(r.real_id, {})[r.cell_id] = r.z
    for real in byreal.values():
        for (i, j), v in [((25, 25), 1.0), ((50, 75), 0.0), ((75, 50), 1.0)]:
            cell = (j - 1) * 100 + (i - 1)
            assert real[cell] == pytest.approx(v, abs=1e-12)


# ---- anisotropic (MetricBall) metrics, reference test/simulation/lu.jl:57-62


def _dir_corrs(rows, nx: int, ny: int) -> tuple[float, float]:
    """Pooled lag-1 correlation along x and y from long (real, cell, z)."""
    import collections

    byreal = collections.defaultdict(dict)
    for r in rows:
        byreal[r["real_id"]][r["cell_id"]] = r["z"]
    ax, bx, ay, by = [], [], [], []
    for real in byreal.values():
        Z = np.empty((nx, ny))
        for cid, v in real.items():
            Z[cid % nx, cid // nx] = v
        ax.append(Z[:-1, :].ravel())
        bx.append(Z[1:, :].ravel())
        ay.append(Z[:, :-1].ravel())
        by.append(Z[:, 1:].ravel())
    cx = np.corrcoef(np.concatenate(ax), np.concatenate(bx))[0, 1]
    cy = np.corrcoef(np.concatenate(ay), np.concatenate(by))[0, 1]
    return float(cx), float(cy)


def test_lugs_anisotropic_metricball(spark):
    # lu.jl:57-62: LUGS(:z => (variogram=GaussianVariogram(ball),)) with
    # ball = MetricBall((20.0, 5.0)) — ellipsoid metric + range-1 model;
    # the field must be smoother along x (range 20) than y (range 5)
    from geostatssolvers_jl_spark.distances import Anisotropic

    grid = CartesianGrid((30, 30))
    sol = solve_lugs(
        spark, grid, nreals=3,
        variables=[LUGSVariable(
            variogram=GaussianVariogram(range=1.0),
            metric=Anisotropic((20.0, 5.0)),
        )],
        seed=11,
    )
    cx, cy = _dir_corrs(sol.collect(), 30, 30)
    assert cx > cy + 0.05, (cx, cy)
    # isotropic control: no direction preferred (gap within noise)
    iso = solve_lugs(
        spark, grid, nreals=3,
        variables=[LUGSVariable(variogram=GaussianVariogram(range=10.0))],
        seed=11,
    )
    icx, icy = _dir_corrs(iso.collect(), 30, 30)
    assert abs(icx - icy) < 0.05, (icx, icy)


def test_fftgs_anisotropic_metric(spark):
    from geostatssolvers_jl_spark.distances import Anisotropic, Haversine

    grid = CartesianGrid((64, 64))
    sol = solve_fftgs(
        spark, grid, nreals=2, variogram=GaussianVariogram(range=1.0),
        seed=5, metric=Anisotropic((16.0, 4.0)),
    )
    cx, cy = _dir_corrs(sol.collect(), 64, 64)
    assert cx > cy + 0.05, (cx, cy)
    with pytest.raises(ValueError, match="Euclidean/Anisotropic"):
        solve_fftgs(
            spark, grid, nreals=1, variogram=GaussianVariogram(range=1.0),
            metric=Haversine(),
        )


def test_fftgs_tiled_anisotropic_halo(spark):
    # tiled path: halo must scale with the per-axis EFFECTIVE range
    from geostatssolvers_jl_spark.distances import Anisotropic
    from geostatssolvers_jl_spark.simulation.fftgs import _tile_layout

    grid = CartesianGrid((64, 64))
    vg = GaussianVariogram(range=1.0)
    tiles = _tile_layout(grid, (2, 2), vg, Anisotropic((8.0, 2.0)))
    # axis-x effective range 8 → halo 24; axis-y effective range 2 → 6
    t0 = tiles[0]
    assert t0["ex1"] - t0["ix1"] == 24
    assert t0["ey1"] - t0["iy1"] == 6
    sol = solve_fftgs(
        spark, grid, nreals=2, variogram=vg, seed=5,
        metric=Anisotropic((16.0, 4.0)), tile_dims=(2, 2),
    )
    cx, cy = _dir_corrs(sol.collect(), 64, 64)
    assert cx > cy + 0.05, (cx, cy)


def test_sgs_anisotropic_metric(spark):
    from geostatssolvers_jl_spark.distances import Anisotropic, Haversine

    grid = CartesianGrid((30, 30))
    sol = solve_sgs(
        spark, grid, nreals=2,
        params=SGSParams(
            variogram=GaussianVariogram(range=1.0),
            metric=Anisotropic((15.0, 3.0)),
            maxneighbors=12,
        ),
        seed=3,
    )
    cx, cy = _dir_corrs(sol.collect(), 30, 30)
    assert cx > cy + 0.05, (cx, cy)
    with pytest.raises(ValueError, match="Euclidean/Anisotropic"):
        solve_sgs(
            spark, grid, nreals=1,
            params=SGSParams(
                variogram=GaussianVariogram(range=1.0), metric=Haversine(),
            ),
            seed=3,
        ).collect()


def test_sim_metric_validation(spark):
    """All three grid simulators reject Haversine and mismatched radii at
    plan time (review finding: LUGS silently built great-circle
    covariances from planar grid coords)."""
    from geostatssolvers_jl_spark.distances import Anisotropic, Haversine

    with pytest.raises(ValueError, match="Euclidean/Anisotropic"):
        solve_lugs(
            spark, CartesianGrid((10, 10)), nreals=1,
            variables=[LUGSVariable(metric=Haversine())],
        )
    with pytest.raises(ValueError, match="radii"):
        solve_lugs(
            spark, CartesianGrid((10,)), nreals=1,
            variables=[LUGSVariable(metric=Anisotropic((20.0, 5.0)))],
        )
    with pytest.raises(ValueError, match="radii"):
        solve_sgs(
            spark, CartesianGrid((10,)), nreals=1,
            params=SGSParams(metric=Anisotropic((20.0, 5.0))),
        )


def test_sgs_3d_single_tile_covers_all_cells(spark):
    """3-D SGS through the single-tile (exact) path simulates EVERY cell
    (r4 review: the 2-D block split silently returned only the z=0 slab);
    multi-tile 3-D is rejected at plan time."""
    grid = CartesianGrid((4, 3, 5))
    sol = solve_sgs(
        spark, grid, nreals=2,
        params=SGSParams(variogram=GaussianVariogram(range=2.0),
                         maxneighbors=6),
        seed=9,
    )
    rows = sol.collect()
    assert len(rows) == 2 * 60
    cells = {r["cell_id"] for r in rows if r["real_id"] == 0}
    assert cells == set(range(60))
    with pytest.raises(ValueError, match="single tile"):
        solve_sgs(
            spark, grid, nreals=1,
            params=SGSParams(variogram=GaussianVariogram(range=2.0)),
            tiles=(2, 2),
        )


def test_sgs_tiled_seam_semivariance_bounds(spark):
    """Boundary-error metric for the tiled-SGS tile-independence
    approximation (r5 stress, BASELINE.md 'Tiled-SGS seam validation'):
    on an exact run, seam-position pairs are ordinary pairs (ratio ≈ 1);
    on a tiled run the seam semivariance is bounded above by the SILL
    (fully independent tiles cannot exceed it in expectation) and
    decreases as conditioning density approaches the variogram range.
    Protects the reference golden the single-tile path reproduces
    (test/simulation/sgs.jl:18-20) while pinning the documented
    approximation's magnitude."""
    from geostatssolvers_jl_spark.simulation.seqsim import (
        SGSParams, seam_semivariance, solve_sgs,
    )
    from geostatssolvers_jl_spark.variogram import SphericalVariogram

    side = 128
    grid = CartesianGrid((side, side), (0.5, 0.5), (1.0, 1.0))

    def mkdata(nd):
        return spark.range(nd).selectExpr(
            "id AS data_id",
            f"0.5 + CAST((id * 2654435761) % {side * side} % {side} "
            "AS DOUBLE) AS x",
            f"0.5 + CAST((id * 2654435761) % {side * side} DIV {side} "
            "AS DOUBLE) AS y",
            "sin(CAST(id * 40503 % 100000 AS DOUBLE) / 15915.494) AS z",
        )

    params = SGSParams(variogram=SphericalVariogram(range=8.0))
    sparse = solve_sgs(spark, grid, nreals=2, params=params,
                       data=mkdata(150), seed=3, tiles=(4, 4)).persist()
    m_sparse = seam_semivariance(sparse, side, 32)
    sparse.unpersist()
    dense = solve_sgs(spark, grid, nreals=2, params=params,
                      data=mkdata(3000), seed=3, tiles=(4, 4)).persist()
    m_dense = seam_semivariance(dense, side, 32)
    dense.unpersist()
    exact = solve_sgs(spark, grid, nreals=2, params=params,
                      data=mkdata(150), seed=3, tiles=None).persist()
    m_exact = seam_semivariance(exact, side, 32)
    exact.unpersist()

    # exact run: seams are ordinary pairs (measured 0.96)
    assert 0.80 <= m_exact["ratio"] <= 1.20, m_exact
    # tiled runs: seam gamma bounded by the sill-independence cap
    # (measured 0.938 sparse / 0.552 dense, sill = 1)
    assert m_sparse["seam"] <= 1.15, m_sparse
    assert m_dense["seam"] <= 1.15, m_dense
    # density monotonicity: conditioning bridges the seam (5.0 → 2.9)
    assert m_dense["ratio"] < m_sparse["ratio"] - 0.5, (m_sparse, m_dense)
    # and the seam IS worse than interior — the approximation is real
    # and this metric detects it (a no-op metric would sit at ~1)
    assert m_sparse["ratio"] > 2.0


def test_seam_semivariance_single_tile_raises(spark):
    """step >= side (single tile per axis) has no seams — the metric
    must refuse instead of emitting a malformed IN () query (review
    finding r5)."""
    from geostatssolvers_jl_spark.simulation.seqsim import (
        seam_semivariance,
    )

    sol = spark.createDataFrame(
        [(0, 0, 1.0)], "real_id long, cell_id long, z double"
    )
    with pytest.raises(ValueError, match="no tile boundaries"):
        seam_semivariance(sol, side=16, step=16)


def test_fftgs_conditional_all_null_data_raises(spark):
    """A conditional solve whose data is entirely NULL must fail loud,
    not silently return zero rows through the units⋈per_real inner
    join (ADVICE r5) — both the global and the tiled path."""
    import pytest as _pt

    from geostatssolvers_jl_spark.simulation.fftgs import solve_fftgs
    from geostatssolvers_jl_spark.variogram import GaussianVariogram

    data = spark.createDataFrame(
        [(0, 12.0, 12.0, None), (1, 30.0, 20.0, None)],
        "data_id long, x double, y double, z double",
    )
    grid = CartesianGrid((40, 40))
    with _pt.raises(ValueError, match="no usable rows"):
        solve_fftgs(spark, grid, nreals=2,
                    variogram=GaussianVariogram(range=8.0), data=data,
                    seed=3)
    with _pt.raises(ValueError, match="no usable rows"):
        solve_fftgs(spark, grid, nreals=2,
                    variogram=GaussianVariogram(range=8.0), data=data,
                    seed=3, tile_dims=(2, 2))


def test_seam_semivariance_concurrent_calls_do_not_clobber(spark):
    """Two concurrent seam diagnostics with IDENTICAL (side, step) used
    to share a temp-view name — one call's finally-drop could remove
    the other's view mid-query (ADVICE r5).  Per-call unique suffixes
    must let them run simultaneously."""
    from concurrent.futures import ThreadPoolExecutor

    from geostatssolvers_jl_spark.simulation.seqsim import (
        SGSParams, seam_semivariance, solve_sgs,
    )
    from geostatssolvers_jl_spark.variogram import SphericalVariogram

    side = 32
    grid = CartesianGrid((side, side), (0.5, 0.5), (1.0, 1.0))
    params = SGSParams(variogram=SphericalVariogram(range=8.0))
    sol = solve_sgs(spark, grid, nreals=2, params=params, seed=3,
                    tiles=(2, 2)).persist()
    try:
        sol.count()
        with ThreadPoolExecutor(max_workers=2) as ex:
            futs = [ex.submit(seam_semivariance, sol, side, 16)
                    for _ in range(2)]
            results = [f.result(timeout=120) for f in futs]
    finally:
        sol.unpersist()
    assert results[0] == results[1]
    assert all(r["n_seam"] > 0 and r["ratio"] > 0 for r in results)


def test_sgs_tiled_halo_narrows_seam(spark):
    """Halo conditioning (VERDICT r5 item 7): with data density inside
    the variogram range, a halo ≈ range must pull the seam ratio
    measurably toward the exact-run control (~1.0) versus the
    independent-tile run — because boundary cells now condition on
    NEIGHBOURING tiles' data within range.  Hard-data exactness and
    the one-row-per-cell contract must hold in the halo run, and
    output stays deterministic (same seed → identical rows)."""
    from geostatssolvers_jl_spark.simulation.seqsim import (
        SGSParams, seam_semivariance, solve_sgs,
    )
    from geostatssolvers_jl_spark.variogram import SphericalVariogram

    side = 128
    grid = CartesianGrid((side, side), (0.5, 0.5), (1.0, 1.0))

    def mkdata(nd):
        return spark.range(nd).selectExpr(
            "id AS data_id",
            f"0.5 + CAST((id * 2654435761) % {side * side} % {side} "
            "AS DOUBLE) AS x",
            f"0.5 + CAST((id * 2654435761) % {side * side} DIV {side} "
            "AS DOUBLE) AS y",
            "sin(CAST(id * 40503 % 100000 AS DOUBLE) / 15915.494) AS z",
        )

    params = SGSParams(variogram=SphericalVariogram(range=8.0))
    data = mkdata(3000)
    plain = solve_sgs(spark, grid, nreals=2, params=params, data=data,
                      seed=3, tiles=(4, 4)).persist()
    m0 = seam_semivariance(plain, side, 32)
    plain.unpersist()
    halo = solve_sgs(spark, grid, nreals=2, params=params, data=data,
                     seed=3, tiles=(4, 4), halo=8).persist()
    try:
        n = halo.count()
        assert n == 2 * side * side  # halo rows are NOT emitted
        m8 = seam_semivariance(halo, side, 32)
        # measured: 2.85 -> 1.48 at this shape; pin a conservative gap
        assert m8["ratio"] < m0["ratio"] - 0.5, (m0, m8)
        assert m8["ratio"] < 2.0, m8
        # hard data honored at snapped cells in every realization
        dpdf = data.toPandas()
        import numpy as np

        cells = ((dpdf.y - 0.5).astype(int) * side
                 + (dpdf.x - 0.5).astype(int))
        dmin = dpdf.assign(cell_id=cells).groupby("cell_id").z.min()
        hp = halo.toPandas()
        for real in (0, 1):
            hv = hp[hp.real_id == real].set_index("cell_id").z
            got = hv.loc[dmin.index].to_numpy()
            assert np.allclose(got, dmin.to_numpy()), real
        # determinism
        rerun = solve_sgs(spark, grid, nreals=2, params=params,
                          data=data, seed=3, tiles=(4, 4), halo=8)
        assert sorted(map(tuple, rerun.collect())) \
            == sorted(map(tuple, halo.collect()))
    finally:
        halo.unpersist()


def test_sgs_halo_validation(spark):
    """Review finding (r6): a negative halo silently DROPPED boundary
    cells (no tile emitted them); halo on a single-tile run silently
    did nothing.  Both must fail loudly."""
    import pytest as _pt

    from geostatssolvers_jl_spark.simulation.seqsim import (
        SGSParams, solve_sgs,
    )
    from geostatssolvers_jl_spark.variogram import SphericalVariogram

    grid = CartesianGrid((16, 16))
    params = SGSParams(variogram=SphericalVariogram(range=4.0))
    with _pt.raises(ValueError, match="halo must be >= 0"):
        solve_sgs(spark, grid, nreals=1, params=params, seed=1,
                  tiles=(2, 2), halo=-2)
    with _pt.raises(ValueError, match="TILED"):
        solve_sgs(spark, grid, nreals=1, params=params, seed=1, halo=4)


# ---- sequential indicator simulation (simulation/sis.py) ----


def _sis_fixture(spark):
    from geostatssolvers_jl_spark.grid import CartesianGrid

    data = spark.createDataFrame(
        [(0, 5.0, 5.0, 1.0), (1, 15.0, 15.0, 0.0)],
        "data_id long, x double, y double, z double")
    return data, CartesianGrid((20, 20), (0.5, 0.5), (1.0, 1.0))


def test_sis_labels_conditioning_determinism(spark):
    from geostatssolvers_jl_spark.simulation.sis import (
        SISParams, solve_sis,
    )
    from geostatssolvers_jl_spark.variogram import SphericalVariogram

    data, grid = _sis_fixture(spark)
    p = SISParams(variogram=SphericalVariogram(range=8.0, sill=0.25),
                  maxneighbors=6)
    a = solve_sis(spark, grid, nreals=2, params=p, data=data,
                  seed=7).collect()
    assert len(a) == 2 * 400
    assert all(r["z"] in (0.0, 1.0) for r in a)
    vals = {(r["real_id"], r["cell_id"]): r["z"] for r in a}
    # conditioning: data cells hold their exact category in every real
    snap = grid.snap_cell_expr(("x", "y"), "cell_id")
    data.createOrReplaceTempView("_sis_d")
    for row in spark.sql(
            f"SELECT {snap} AS cell_id, z FROM _sis_d").collect():
        for real in (0, 1):
            assert vals[(real, row["cell_id"])] == row["z"]
    b = solve_sis(spark, grid, nreals=2, params=p, data=data,
                  seed=7).collect()
    assert vals == {(r["real_id"], r["cell_id"]): r["z"] for r in b}
    spark.catalog.dropTempView("_sis_d")


def test_sis_marginal_proportions_respond(spark):
    """Unconditional SIS at (0.9, 0.1) marginals: category 0 dominates;
    at (0.1, 0.9) it flips."""
    from geostatssolvers_jl_spark.simulation.sis import (
        SISParams, solve_sis,
    )
    from geostatssolvers_jl_spark.variogram import SphericalVariogram

    _, grid = _sis_fixture(spark)
    vg = SphericalVariogram(range=4.0, sill=0.09)
    hi0 = solve_sis(spark, grid, nreals=4, params=SISParams(
        variogram=vg, proportions=(0.9, 0.1), maxneighbors=6),
        seed=3).agg({"z": "avg"}).collect()[0][0]
    hi1 = solve_sis(spark, grid, nreals=4, params=SISParams(
        variogram=vg, proportions=(0.1, 0.9), maxneighbors=6),
        seed=3).agg({"z": "avg"}).collect()[0][0]
    assert hi0 < 0.35 and hi1 > 0.65, (hi0, hi1)


def test_sis_spatial_structure_beats_iid(spark):
    """Adjacent-cell agreement must exceed the iid rate for the same
    marginals — the sequential conditioning is doing something."""
    from pyspark.sql import functions as F

    from geostatssolvers_jl_spark.simulation.sis import (
        SISParams, solve_sis,
    )
    from geostatssolvers_jl_spark.variogram import SphericalVariogram

    _, grid = _sis_fixture(spark)
    sim = solve_sis(spark, grid, nreals=2, params=SISParams(
        variogram=SphericalVariogram(range=10.0, sill=0.25),
        maxneighbors=8), seed=5).persist()
    adj = sim.alias("a").join(
        sim.alias("b"),
        (F.col("a.real_id") == F.col("b.real_id"))
        & (F.col("b.cell_id") == F.col("a.cell_id") + 1))
    r = float(adj.agg(F.avg(
        (F.col("a.z") == F.col("b.z")).cast("double"))).collect()[0][0])
    sim.unpersist()
    assert r > 0.65, r  # iid two-category ≈ 0.5-0.58 at these marginals


def test_sis_validation(spark):
    from geostatssolvers_jl_spark.simulation.sis import (
        SISParams, solve_sis,
    )
    from geostatssolvers_jl_spark.variogram import SphericalVariogram

    data, grid = _sis_fixture(spark)
    vg = SphericalVariogram(range=8.0, sill=0.25)
    with pytest.raises(ValueError, match="differ in length"):
        SISParams(variogram=vg, categories=(0.0, 1.0),
                  proportions=(1.0,)).validate()
    with pytest.raises(ValueError, match="at least 2"):
        SISParams(variogram=vg, categories=(1.0,),
                  proportions=(1.0,)).validate()
    with pytest.raises(ValueError, match="sum to 1"):
        SISParams(variogram=vg, proportions=(0.5, 0.4)).validate()
    bad = spark.createDataFrame(
        [(0, 5.0, 5.0, 3.0)], "data_id long, x double, y double, z double")
    with pytest.raises(ValueError, match="outside the category set"):
        solve_sis(spark, grid, nreals=1, params=SISParams(variogram=vg),
                  data=bad)


def test_sis_tiled_runs_and_conditions(spark):
    from geostatssolvers_jl_spark.simulation.sis import (
        SISParams, solve_sis,
    )
    from geostatssolvers_jl_spark.variogram import SphericalVariogram

    data, grid = _sis_fixture(spark)
    sim = solve_sis(spark, grid, nreals=1, params=SISParams(
        variogram=SphericalVariogram(range=8.0, sill=0.25),
        maxneighbors=6), data=data, seed=9, tiles=(2, 2), halo=4)
    rows = sim.collect()
    assert len(rows) == 400
    assert all(r["z"] in (0.0, 1.0) for r in rows)
