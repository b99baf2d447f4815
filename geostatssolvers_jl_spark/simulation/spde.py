"""SPDE Gaussian simulation (reference: SPDEGS,
``/root/reference/src/simulation/spde.jl:29-115``).

Lowest-priority solver — the reference itself ships it untested
(``test/simulation/spde.jl:2`` is a TODO) and unconditional-only.  This
implementation follows the same public construction (Lindgren et al. 2011):
GMRF with precision built from the grid Laplacian,

    Q = τ² (κ² I − Δ)^α ,  κ = 1/ℓ,  α = 2

``src/simulation/spde.jl:57-67`` builds the same precision from
Laplace-Beltrami + measure matrices on a mesh; on a regular grid the
5-point finite-difference Laplacian is the equivalent operator.

Sampling is MATRIX-FREE: with A = κ²I − Δ (SPD) and α = 2, Q = A², so
``x = A⁻¹ w`` with white noise w has Cov(x) = A⁻² = Q⁻¹.  The solve runs
conjugate gradients against the 5-point stencil — O(ncells) memory, no
dense n×n Laplacian, no cell-count bound (the round-1 dense Cholesky
needed ≤ 20k cells; a 10⁷-cell realization now fits one task the same
way FFTGS does).

Spark realization mirrors FFTGS: stencil parameters broadcast once,
realizations fan out per ``(seed, real_id)`` — deterministic under any
partitioning (CG is a fixed deterministic iteration).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..grid import CartesianGrid


def _apply_A(x: np.ndarray, kappa2: float) -> np.ndarray:
    """y = (κ²I − Δ) x on the grid (2-D five-point / 1-D three-point
    stencil, zero-Neumann-free boundary: missing neighbors contribute
    nothing, matching the dense matrix the round-1 code built)."""
    lap = -_degree(x.shape) * x
    if x.ndim == 1:
        lap[:-1] += x[1:]
        lap[1:] += x[:-1]
    else:
        lap[:-1, :] += x[1:, :]
        lap[1:, :] += x[:-1, :]
        lap[:, :-1] += x[:, 1:]
        lap[:, 1:] += x[:, :-1]
    return kappa2 * x - lap


def _degree(shape: tuple[int, ...]) -> np.ndarray:
    """Number of grid neighbors per cell (2/3/4 at edges/interior)."""
    deg = np.zeros(shape)
    if len(shape) == 1:
        deg[:] = 2.0
        deg[0] = deg[-1] = 1.0
    else:
        deg[:] = 4.0
        deg[0, :] -= 1.0
        deg[-1, :] -= 1.0
        deg[:, 0] -= 1.0
        deg[:, -1] -= 1.0
    return deg


def _cg_solve(b: np.ndarray, kappa2: float, tol: float = 1e-10,
              maxiter: int | None = None) -> np.ndarray:
    """Conjugate gradients for (κ²I − Δ) x = b, matrix-free, float64.
    Deterministic (fixed iteration, no randomized restarts)."""
    x = np.zeros_like(b)
    r = b - _apply_A(x, kappa2)
    p = r.copy()
    rs = float((r * r).sum())
    b2 = float((b * b).sum())
    if b2 == 0.0:
        return x
    maxiter = maxiter or 20 * int(np.sqrt(b.size) + 100)
    for _ in range(maxiter):
        Ap = _apply_A(p, kappa2)
        alpha = rs / float((p * Ap).sum())
        x += alpha * p
        r -= alpha * Ap
        rs_new = float((r * r).sum())
        if rs_new <= tol * tol * b2:
            break
        p = r + (rs_new / rs) * p
        rs = rs_new
    return x


def solve_spdegs(
    spark: SparkSession,
    grid: CartesianGrid,
    nreals: int,
    correlation_length: float = 10.0,
    sigma: float = 1.0,
    seed: int = 0,
    var: str = "z",
) -> DataFrame:
    """Unconditional GMRF realizations, long format (real_id, cell_id, z)."""
    if grid.ndims > 2:
        raise ValueError("SPDEGS stencil supports 1-D/2-D grids")
    n = grid.ncells
    kappa2 = (1.0 / correlation_length) ** 2
    # marginal-variance probe: one deterministic unit-noise solve scales
    # the field to std ≈ sigma (same normalization idea as round 1's
    # probe, now matrix-free)
    rng0 = np.random.default_rng((seed, 1 << 40))
    shape = grid.dims if grid.ndims > 1 else (grid.dims[0],)
    probe = _cg_solve(rng0.standard_normal(shape), kappa2)
    scale = sigma / max(float(np.sqrt((probe ** 2).mean())), 1e-12)
    bc = spark.sparkContext.broadcast((kappa2, scale, seed, shape))

    def gen(batches):
        k2, sc, sd, shp = bc.value
        nn = int(np.prod(shp))
        for pdf in batches:
            for real_id in pdf["id"].tolist():
                rng = np.random.default_rng((sd, int(real_id)))
                w = rng.standard_normal(shp)
                x = _cg_solve(w, k2) * sc
                yield pd.DataFrame({
                    "real_id": np.full(nn, real_id, dtype=np.int64),
                    "cell_id": np.arange(nn, dtype=np.int64),
                    var: x.ravel(order="F"),
                })

    return spark.range(nreals, numPartitions=min(nreals, 64)).mapInPandas(
        gen, schema=f"real_id long, cell_id long, {var} double"
    )
