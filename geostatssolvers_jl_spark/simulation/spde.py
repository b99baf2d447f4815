"""SPDE Gaussian simulation (reference: SPDEGS,
``/root/reference/src/simulation/spde.jl:29-115``).

Lowest-priority solver — the reference itself ships it untested
(``test/simulation/spde.jl:2`` is a TODO) and unconditional-only.  This
implementation follows the same public construction (Lindgren et al. 2011):
GMRF with precision built from the grid Laplacian,

    Q = τ² (κ² I − Δ)^α ,  κ = 1/ℓ,  α = 2

sampled by solving ``Lᵀ x = w`` with ``L = chol(Q)`` and white noise w —
``src/simulation/spde.jl:57-67`` builds the same precision from
Laplace-Beltrami + measure matrices on a mesh; on a regular grid the
5-point finite-difference Laplacian is the equivalent operator.

Spark realization mirrors LUGS: precision factor built once on the driver
(dense — the container has no sparse cholesky; same small-domain bound as
LUGS), broadcast, realizations fan out per ``(seed, real_id)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..grid import CartesianGrid
from .lugs import MAX_SIM_CELLS


def _laplacian(dims: tuple[int, ...]) -> np.ndarray:
    """Dense 5-point (2-D) / 3-point (1-D) grid Laplacian, column-major
    linear indexing (matches the engine's cell_id order)."""
    n = int(np.prod(dims))
    L = np.zeros((n, n))
    if len(dims) == 1:
        nx = dims[0]
        for i in range(nx):
            for di in (-1, 1):
                j = i + di
                if 0 <= j < nx:
                    L[i, j] = 1.0
                    L[i, i] -= 1.0
        return L
    nx, ny = dims
    for j in range(ny):
        for i in range(nx):
            a = j * nx + i
            for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < nx and 0 <= jj < ny:
                    b = jj * nx + ii
                    L[a, b] = 1.0
                    L[a, a] -= 1.0
    return L


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
    n = grid.ncells
    if n > MAX_SIM_CELLS:
        raise ValueError(
            f"SPDEGS dense precision needs ≤ {MAX_SIM_CELLS} cells (got {n})"
        )
    kappa = 1.0 / correlation_length
    A = kappa**2 * np.eye(n) - _laplacian(grid.dims)
    Q = A @ A  # α = 2 (spde.jl:57-64 with ν = α − d/2)
    Lc = np.linalg.cholesky(Q)
    # scale so marginal std ≈ sigma: sample x with Qx ~ N(0, Q⁻¹); std from
    # a probe solve
    probe = np.linalg.solve(Lc.T, np.ones(n) / np.sqrt(n))
    scale = sigma / max(np.sqrt(np.mean(probe**2)), 1e-12)
    bc = spark.sparkContext.broadcast((Lc, scale, seed, n))

    def gen(batches):
        Lb, sc, sd, nn = bc.value
        for pdf in batches:
            for real_id in pdf["id"].tolist():
                rng = np.random.default_rng((sd, int(real_id)))
                w = rng.standard_normal(nn)
                x = np.linalg.solve(Lb.T, w) * sc
                yield pd.DataFrame({
                    "real_id": np.full(nn, real_id, dtype=np.int64),
                    "cell_id": np.arange(nn, dtype=np.int64),
                    var: x,
                })

    return spark.range(nreals, numPartitions=min(nreals, 64)).mapInPandas(
        gen, schema=f"real_id long, cell_id long, {var} double"
    )
