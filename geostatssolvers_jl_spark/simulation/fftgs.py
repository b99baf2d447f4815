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

    reals = (
        spark.range(nreals, numPartitions=min(nreals, 64))
        .mapInPandas(gen, schema=f"real_id long, cell_id long, {var} double")
    )
    if data is None:
        return reals

    # ---- conditioning: z = zᵤ + OK(resid at data cells) -----------------
    from pyspark.sql import functions as Fn

    from ..operators.kriging import KrigingModel, solve_kriging

    data_coord_cols = data_coord_cols or ["x", "y"]
    snap = grid.snap_cell_expr(tuple(data_coord_cols), "cell_id")
    dcells = (
        data.filter(f"{var} IS NOT NULL")
        .selectExpr(f"{snap} AS cell_id", f"{var} AS zdat")
        # unique cell survivor (fft.jl:133) picked DETERMINISTICALLY (min
        # value) — dropDuplicates varies with partitioning
        .groupBy("cell_id").agg(Fn.min("zdat").alias("zdat"))
    )
    reals = reals.cache()
    gdf = grid.spark_df(spark)
    out = []
    dpdf = dcells.toPandas()
    zu_at = (
        reals.join(Fn.broadcast(dcells), "cell_id")
        .select("real_id", "cell_id", var, "zdat")
        .toPandas()
    )
    cellxy = {
        int(r["cell_id"]): None for _, r in dpdf.iterrows()
    }
    # cell centroids for the resid kriging data
    cent = gdf.join(
        Fn.broadcast(dcells.select("cell_id")), "cell_id"
    ).toPandas()
    cent = cent.set_index("cell_id")
    coord_names = [c for c in cent.columns]
    model = KrigingModel(variogram=variogram, mean=0.0)  # SK on residuals
    for real_id, grp in zu_at.groupby("real_id"):
        resid = grp.assign(resid=grp["zdat"] - grp[var])
        pts = spark.createDataFrame(
            pd.DataFrame({
                "data_id": resid["cell_id"].to_numpy(np.int64),
                "x": cent.loc[resid["cell_id"], coord_names[0]].to_numpy(),
                "y": cent.loc[resid["cell_id"], coord_names[1]].to_numpy()
                if len(coord_names) > 1 else np.zeros(len(resid)),
                "z": resid["resid"].to_numpy(np.float64),
            })
        )
        rk = solve_kriging(
            pts, gdf, var="z", model=model,
            data_coord_cols=["x", "y"][: max(1, len(coord_names))],
            query_coord_cols=coord_names,
            maxneighbors=maxneighbors, radius=krig_radius,
        ).selectExpr(
            f"CAST({real_id} AS BIGINT) AS real_id", "cell_id",
            "z AS resid",
        )
        out.append(rk)
    resid_all = out[0]
    for o in out[1:]:
        resid_all = resid_all.unionByName(o)
    conditioned = (
        reals.join(resid_all, ["real_id", "cell_id"], "left")
        .selectExpr(
            "real_id", "cell_id",
            f"{var} + coalesce(resid, 0.0) AS {var}",
        )
    )
    # hard data exact at data cells (fft conditioning keeps them via the
    # residual being exact there; enforce bit-exactness explicitly)
    return (
        conditioned.join(Fn.broadcast(dcells), "cell_id", "left")
        .selectExpr(
            "real_id", "cell_id",
            f"CASE WHEN zdat IS NOT NULL THEN zdat ELSE {var} END AS {var}",
        )
    )
