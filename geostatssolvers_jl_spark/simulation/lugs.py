"""LU Gaussian simulation (reference: LUGS,
``/root/reference/src/simulation/lu.jl:67-224``).

Preprocess (once, driver side — the expensive Schur-complement blocks):
  C₂₂ = sill − γ(pairwise(sim locs))                      (lu.jl:124)
  conditional:  L₁₁ = chol(C₁₁);  B₁₂ = L₁₁ \\ C₁₂;  A₂₁ = B₁₂ᵀ
                d₂ = A₂₁ (L₁₁ \\ z₁);  L₂₂ = chol(C₂₂ − A₂₁B₁₂)
                                                          (lu.jl:131-139)
  unconditional: d₂ = 0, L₂₂ = chol(C₂₂)                  (lu.jl:127-128)
Per realization (executors): ``y₂ = d₂ + L₂₂ w₂`` with fresh standard
normals, hard data written back at data cells (lu.jl:209-218), mean added
only when unconditional (lu.jl:221).  Two-variable correlated co-simulation
mixes ``ρ·w₁ + √(1−ρ²)·w₂`` (lu.jl:210-214 / Oliver 2003).

The reference's own feasibility bound applies — full covariance
factorization, "relatively small … e.g. 100×100 grids" (lu.jl:60-65);
larger domains should use SGS/FFTGS.  Spark's leverage here is the
*ensemble* axis: preprocess artifacts broadcast once, realizations fan out
over executors with deterministic ``(seed, real_id)`` RNG streams.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..distances import Distance, Euclidean
from ..grid import CartesianGrid
from ..variogram import GaussianVariogram, Variogram, require_stationary

MAX_SIM_CELLS = 20_000  # dense L₂₂ beyond this is the wrong solver


@dataclass(frozen=True)
class LUGSVariable:
    variogram: Variogram = field(default_factory=GaussianVariogram)
    mean: float | None = None
    var: str = "z"
    # pluggable factorization (reference option `factorization`,
    # src/simulation/lu.jl:70, exercised with `lu` at
    # test/simulation/lu.jl:72-73): "cholesky" | "lu"
    factorization: str = "cholesky"
    # anisotropic neighborhoods: GeoStats' `GaussianVariogram(ball)` with
    # `MetricBall((r1, r2))` (test/simulation/lu.jl:59) = ellipsoid metric
    # + range-1 variogram; pass `Anisotropic((r1, r2))` here with a
    # range-1 variogram for the same covariance model
    metric: Distance = field(default_factory=Euclidean)


def _centroids(grid: CartesianGrid) -> np.ndarray:
    """All cell centroids in column-major linear order, (ncells, ndim)."""
    idx = [np.arange(1, d + 1, dtype=np.float64) for d in grid.dims]
    mesh = np.meshgrid(*idx, indexing="ij")
    cols = [
        (o + (m - 0.5) * s).ravel(order="F")
        for o, s, m in zip(grid.origin, grid.spacing, mesh)
    ]
    return np.column_stack(cols)


def _lu_factor(C: np.ndarray) -> np.ndarray:
    """Square-root factor of SPD ``C`` via no-pivot LU (Doolittle, outer-
    product form, vectorized per column — no scipy in the runtime):
    C = L·U with U = D·Lᵀ on SPD input, so B = L·√D satisfies B·Bᵀ = C.
    This realizes the reference's pluggable `lu` factorization option
    (src/simulation/lu.jl:70) without assuming symmetry in the algorithm."""
    n = C.shape[0]
    U = C.astype(np.float64).copy()
    L = np.eye(n)
    for k_ in range(n - 1):
        piv = U[k_, k_]
        L[k_ + 1:, k_] = U[k_ + 1:, k_] / piv
        U[k_ + 1:, k_:] -= np.outer(L[k_ + 1:, k_], U[k_, k_:])
    return L * np.sqrt(np.maximum(np.diag(U), 0.0))[None, :]


def _factor(C: np.ndarray, method: str) -> np.ndarray:
    if method == "lu":
        return _lu_factor(C)
    if method == "cholesky":
        return np.linalg.cholesky(C)
    raise ValueError(f"unknown factorization: {method}")


def _preprocess_one(
    grid: CartesianGrid, vg: Variogram, z_by_cell: dict[int, float],
    mean: float | None, factorization: str = "cholesky",
    metric: Distance | None = None,
) -> dict:
    require_stationary(vg, "LUGS")
    pts = _centroids(grid)
    n = pts.shape[0]
    if n > MAX_SIM_CELLS:
        raise ValueError(
            f"LUGS domain has {n} cells > {MAX_SIM_CELLS}; use SGS/FFTGS "
            "(the reference documents the same bound, lu.jl:60-65)"
        )
    dlocs = np.array(sorted(z_by_cell), dtype=np.int64)
    slocs = np.setdiff1d(np.arange(n), dlocs)
    met = metric if metric is not None else Euclidean()
    from ..distances import validate_planar_metric

    validate_planar_metric(met, pts.shape[1], "LUGS")
    C22 = vg.cov(met.np(pts[slocs], pts[slocs]))
    if dlocs.size == 0:
        d2 = np.zeros(len(slocs))
        L22 = _factor(_sym(C22), factorization)
        z1 = np.empty(0)
    else:
        z1 = np.array([z_by_cell[int(i)] for i in dlocs])
        C11 = vg.cov(met.np(pts[dlocs], pts[dlocs]))
        C12 = vg.cov(met.np(pts[dlocs], pts[slocs]))
        L11 = _factor(_sym(C11), factorization)
        B12 = np.linalg.solve(L11, C12)  # lower-triangular solve
        A21 = B12.T
        d2 = A21 @ np.linalg.solve(L11, z1)
        L22 = _factor(_sym(C22 - A21 @ B12), factorization)
        if mean is not None:
            import warnings

            warnings.warn("mean can only be specified in unconditional simulation")
    mu = 0.0 if mean is None else float(mean)
    return {
        "z1": z1, "d2": d2, "L22": L22, "mu": mu,
        "dlocs": dlocs, "slocs": slocs, "n": n,
    }


def _sym(C: np.ndarray) -> np.ndarray:
    C = (C + C.T) / 2.0
    # nugget-free models give semi-definite blocks for coincident points;
    # the reference's cholesky would fail the same way — add nothing.
    return C + 1e-12 * np.eye(C.shape[0])


def _lusim(rng, pre: dict, rho: float | None = None,
           w1: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    w2 = rng.standard_normal(pre["L22"].shape[1])
    if rho is None:
        y2 = pre["d2"] + pre["L22"] @ w2
    else:
        y2 = pre["d2"] + pre["L22"] @ (rho * w1 + np.sqrt(1.0 - rho**2) * w2)
    y = np.empty(pre["n"])
    y[pre["dlocs"]] = pre["z1"]
    y[pre["slocs"]] = y2
    if pre["dlocs"].size == 0:
        y = y + pre["mu"]
    return y, w2


def solve_lugs(
    spark: SparkSession,
    grid: CartesianGrid,
    nreals: int,
    variables: list[LUGSVariable],
    data: DataFrame | None = None,
    data_coord_cols: list[str] | None = None,
    correlation: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Long DataFrame (real_id, cell_id, <var> ...).  1 or 2 variables
    (lu.jl:96); two variables co-simulate with ``correlation``."""
    assert len(variables) in (1, 2), "invalid number of covariables"
    data_coord_cols = data_coord_cols or ["x", "y"][: grid.ndims]
    pres = []
    for v in variables:
        z_by_cell: dict[int, float] = {}
        if data is not None and v.var in data.columns:
            snap = grid.snap_cell_expr(tuple(data_coord_cols), "cell_id")
            # deterministic survivor per cell (min value) — dropDuplicates
            # keeps an arbitrary row, varying with partitioning
            # size bound: ≤ one row per grid cell after the groupBy (LUGS
            # factorizes an ncells² matrix on the driver anyway — the grid
            # itself must be driver-sized for this solver, lu.jl:72)
            rows = (
                data.filter(f"{v.var} IS NOT NULL")
                .selectExpr(f"{snap} AS cell_id", f"{v.var} AS zv")
                .groupBy("cell_id").agg(F.min("zv").alias("zv"))
                .collect()
            )
            z_by_cell = {int(r["cell_id"]): float(r["zv"]) for r in rows}
        pres.append(_preprocess_one(
            grid, v.variogram, z_by_cell, v.mean, v.factorization, v.metric
        ))

    names = [v.var for v in variables]
    bc = spark.sparkContext.broadcast((pres, names, correlation, seed))
    ncells = grid.ncells

    def gen(batches):
        pr, nm, rho, sd = bc.value
        for pdf in batches:
            for real_id in pdf["id"].tolist():
                rng = np.random.default_rng((sd, int(real_id)))
                out = {
                    "real_id": np.full(ncells, real_id, dtype=np.int64),
                    "cell_id": np.arange(ncells, dtype=np.int64),
                }
                y1, w1 = _lusim(rng, pr[0])
                out[nm[0]] = y1
                if len(nm) == 2:
                    y2, _ = _lusim(rng, pr[1], rho, w1)
                    out[nm[1]] = y2
                yield pd.DataFrame(out)

    cols = ", ".join(f"{n} double" for n in names)
    return spark.range(nreals, numPartitions=min(nreals, 64)).mapInPandas(
        gen, schema=f"real_id long, cell_id long, {cols}"
    )
