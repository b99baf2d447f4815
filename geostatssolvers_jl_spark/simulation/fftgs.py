"""FFT Gaussian simulation (reference: FFTGS,
``/root/reference/src/simulation/fft.jl:51-198``).

Preprocess (once): covariance image of the grid against its center cell
(``fft.jl:96-99``), spectrum ``F = √|fft(fftshift(C))|`` with the DC
component zeroed (``fft.jl:102-103``).  Per realization: phase-randomize
with white noise (``fft.jl:163``), inverse FFT (166), rescale to the target
sill and mean (169-170).  Conditioning (176-192): kriging residual
``z̄ + (zᵤ − z̄ᵤ)``, realized here through the linearity of kriging as one
kriging solve of the *residuals* per realization.

Spark realization: the ensemble is the parallel axis — ``spark.range
(nreals)`` feeds a ``mapInPandas`` that computes one full-grid FFT per
realization (numpy, single-threaded per task; partition parallelism
replaces the reference's FFTW threads, ``fft.jl:73``).  Each realization
is seeded ``(seed, real_id)`` — deterministic under any partitioning,
unlike the reference's shared global RNG (``fft.jl:59``).

Grid-size note: one realization must fit an executor (~10⁷ cells); the
reference has the same single-image constraint.  Larger domains → tile
with overlap ≥ 3× correlation range (the reference's own validity rule,
``fft.jl:46-47``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..grid import CartesianGrid
from ..variogram import Variogram, require_stationary


def _cov_image(grid: CartesianGrid, gamma: Variogram) -> np.ndarray:
    """C(center, every cell) reshaped to dims, Fortran (column-major)
    layout to match the reference's LinearIndices cell order."""
    dims = grid.dims
    idx = [np.arange(1, d + 1, dtype=np.float64) for d in dims]
    centers = [
        o + (ix - 0.5) * s for o, s, ix in zip(grid.origin, grid.spacing, idx)
    ]
    cidx = [d // 2 for d in dims]  # CartesianIndex(dims .÷ 2), 1-based
    ccoord = [
        o + (ci - 0.5) * s for o, s, ci in zip(grid.origin, grid.spacing, cidx)
    ]
    mesh = np.meshgrid(*centers, indexing="ij")
    h2 = sum((mx - cc) ** 2 for mx, cc in zip(mesh, ccoord))
    return gamma.cov(np.sqrt(h2))


def _one_realization(
    F: np.ndarray, gamma: Variogram, mean: float, dims: tuple[int, ...],
    seed: int, real_id: int,
) -> np.ndarray:
    rng = np.random.default_rng((seed, int(real_id)))
    noise = rng.random(dims)
    P = F * np.exp(1j * np.angle(np.fft.fftn(noise)))
    Z = np.real(np.fft.ifftn(P))
    sigma2 = np.mean(Z * Z)  # var with mean=0, fft.jl:169
    Z = np.sqrt(gamma.sill / sigma2) * Z + mean
    return Z


def solve_fftgs(
    spark: SparkSession,
    grid: CartesianGrid,
    nreals: int,
    variogram: Variogram,
    mean: float = 0.0,
    data: DataFrame | None = None,
    var: str = "z",
    data_coord_cols: list[str] | None = None,
    seed: int = 0,
    maxneighbors: int | None = None,
    krig_radius: float | None = None,
) -> DataFrame:
    """Returns a long DataFrame (real_id, cell_id, z) — the Ensemble sink
    (SURVEY §2.1 S4), realizations as the partition key."""
    require_stationary(variogram, "FFTGS")
    dims = grid.dims
    F = np.sqrt(np.abs(np.fft.fftn(np.fft.fftshift(_cov_image(grid, variogram)))))
    F.flat[0] = 0.0  # zero the reference level, fft.jl:103
    bc = spark.sparkContext.broadcast((F, variogram, mean, dims, seed))

    ncells = grid.ncells

    def gen(batches):
        Fb, g, mu, dd, sd = bc.value
        for pdf in batches:
            for real_id in pdf["id"].tolist():
                Z = _one_realization(Fb, g, mu, dd, sd, real_id)
                yield pd.DataFrame({
                    "real_id": np.full(ncells, real_id, dtype=np.int64),
                    "cell_id": np.arange(ncells, dtype=np.int64),
                    var: Z.ravel(order="F"),  # column-major linear index
                })

    if data is None:
        return (
            spark.range(nreals, numPartitions=min(nreals, 64))
            .mapInPandas(gen, schema=f"real_id long, cell_id long, {var} double")
        )

    # ---- conditioning: z = zᵤ + SK(resid at data cells), fft.jl:176-192 --
    # The residual-kriging correction runs INSIDE the realization task:
    # each task already holds its full-grid zᵤ, the (small, broadcast)
    # conditioning data gives resid = zdat − zᵤ[data cells] locally, and
    # the neighbor geometry (search indices / global factorization) is
    # REAL-INDEPENDENT so it is computed once per task and reused across
    # the task's realizations.  One Spark job total — no per-realization
    # driver loop, no nreals-way union tree, no (real, cell) re-join.
    from pyspark.sql import functions as Fn

    from ..operators.kriging import KrigingModel

    data_coord_cols = data_coord_cols or ["x", "y"]
    snap = grid.snap_cell_expr(tuple(data_coord_cols), "cell_id")
    dcells = (
        data.filter(f"{var} IS NOT NULL")
        .selectExpr(f"{snap} AS cell_id", f"{var} AS zdat")
        # unique cell survivor (fft.jl:133) picked DETERMINISTICALLY (min
        # value) — dropDuplicates varies with partitioning
        .groupBy("cell_id").agg(Fn.min("zdat").alias("zdat"))
    )
    dpdf = dcells.toPandas().sort_values("cell_id").reset_index(drop=True)
    dcell_ids = dpdf["cell_id"].to_numpy(np.int64)
    zdat = dpdf["zdat"].to_numpy(np.float64)
    dcoords = grid.centroids_np(dcell_ids)
    model = KrigingModel(variogram=variogram, mean=0.0)  # SK on residuals
    bc_cond = spark.sparkContext.broadcast(
        (dcell_ids, zdat, dcoords, model, maxneighbors, krig_radius)
    )
    chunk = 262_144

    def gen_cond(batches):
        from ..distances import Euclidean
        from ..neighbors import PointData, search
        from ..operators.kriging import (
            _fit_global, _predict_global, solve_systems,
        )

        Fb, g, mu0, dd, sd = bc.value
        ids_d, zd, Xd, mdl, kmax, rad = bc_cond.value
        met = Euclidean()
        nd = len(ids_d)
        pd_data = PointData(coords=Xd, values={}, ids=ids_d)
        Ainv = None          # global path: factorization, once per task
        geom_cache: dict = {}  # local path: (idx, dist) per chunk start
        cache_ok = ncells * min(kmax or 0, nd) <= 16_000_000
        for pdf in batches:
            for real_id in pdf["id"].tolist():
                Z = _one_realization(Fb, g, mu0, dd, sd, real_id)
                zu = Z.ravel(order="F")
                resid = zd - zu[ids_d]
                corr = np.empty(ncells)
                if kmax is None:
                    if Ainv is None:
                        fit0 = _fit_global(
                            mdl, PointData(Xd, {"z": resid}, ids_d), "z", met
                        )
                        Ainv = fit0
                    fit = dict(Ainv, z=resid)
                    for s in range(0, ncells, chunk):
                        e = min(ncells, s + chunk)
                        q = grid.centroids_np(np.arange(s, e))
                        corr[s:e] = _predict_global(mdl, fit, q, met)[0]
                else:
                    kk = min(kmax, nd)
                    for s in range(0, ncells, chunk):
                        e = min(ncells, s + chunk)
                        if s in geom_cache:
                            idx, dist = geom_cache[s]
                        else:
                            q = grid.centroids_np(np.arange(s, e))
                            idx, dist, _ = search(pd_data, q, kk, met, rad)
                            if cache_ok:
                                geom_cache[s] = (idx, dist)
                        valid = idx >= 0
                        zn = resid[np.maximum(idx, 0)] * valid
                        m_, _ = solve_systems(
                            mdl, grid.centroids_np(np.arange(s, e)),
                            Xd[np.maximum(idx, 0)], zn, valid, dist,
                            met, 1,
                        )
                        corr[s:e] = m_
                z = zu + np.where(np.isfinite(corr), corr, 0.0)
                z[ids_d] = zd  # hard data bit-exact at data cells
                yield pd.DataFrame({
                    "real_id": np.full(ncells, real_id, dtype=np.int64),
                    "cell_id": np.arange(ncells, dtype=np.int64),
                    var: z,
                })

    return (
        spark.range(nreals, numPartitions=min(nreals, 64))
        .mapInPandas(
            gen_cond, schema=f"real_id long, cell_id long, {var} double"
        )
    )
