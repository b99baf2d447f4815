"""Locally weighted regression / LOESS (reference: LWRSolver,
``/root/reference/src/estimation/lwr.jl:62-158``).

Per location (``lwr.jl:127-145``): take the k nearest neighbors, normalize
distances δ = d / max(d), weight w = weightfun(δ) (default exp(−3δ²),
``lwr.jl:58``), fit weighted least squares on the affine design
X = [1 coords], predict at the location, and report
σ = ‖W·X·(XᵀWX)⁻¹·x₀‖₂ as ``var_variance`` (Gaussian-residual assumption,
``lwr.jl:50-51,142-143``).

Spark realization: the shared zero-shuffle broadcast kernel — neighbor
search and the stacked WLS solves fused in one vectorized mapInPandas
pass; one batched ``np.linalg.solve`` over (B, p, p) normal matrices.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..distances import Distance, Euclidean
from ..neighbors import PointData, collect_points, local_apply


def default_weightfun(h: np.ndarray) -> np.ndarray:
    return np.exp(-3.0 * h * h)


def _wls_solve(
    G: np.ndarray, b: np.ndarray, x0: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Solve the stacked normal systems; singular rows (k < p neighbors,
    exactly collinear coords) fall back to pinv PER ROW — a batch-wide
    pinv fallback would make every query's result depend on which OTHER
    queries share its Arrow batch (batch composition varies with
    partitioning and between the broadcast and tiled paths, breaking
    their bit-identical contract; same per-row policy as
    kriging.solve_systems)."""
    try:
        theta = np.linalg.solve(G, b[:, :, None])[:, :, 0]
        Ginv_x0 = np.linalg.solve(G, x0[:, :, None])[:, :, 0]
        return theta, Ginv_x0
    except np.linalg.LinAlgError:
        pass
    theta = np.empty_like(b)
    Ginv_x0 = np.empty_like(x0)
    for i in range(G.shape[0]):
        try:
            theta[i] = np.linalg.solve(G[i], b[i])
            Ginv_x0[i] = np.linalg.solve(G[i], x0[i])
        except np.linalg.LinAlgError:
            Gi = np.linalg.pinv(G[i])
            theta[i] = Gi @ b[i]
            Ginv_x0[i] = Gi @ x0[i]
    return theta, Ginv_x0


def lwr_kernel(var: str, weightfun: Callable, minneighbors: int,
               id_col: str = "cell_id", query_coord_cols: list[str] | None = None):
    qcols = query_coord_cols or ["cx", "cy"]

    def kernel(pdf: pd.DataFrame, d: PointData, idx: np.ndarray,
               dist: np.ndarray, nvalid: np.ndarray) -> pd.DataFrame:
        B, k = idx.shape
        dim = d.coords.shape[1]
        p = dim + 1
        z = d.values[var].astype(np.float64)
        safe = np.maximum(idx, 0)
        valid = idx >= 0
        vm = valid.astype(np.float64)

        fd = np.where(valid, dist, 0.0)
        dmax = fd.max(axis=1, keepdims=True)
        dmax = np.where(dmax > 0, dmax, 1.0)
        delta = fd / dmax
        w = np.asarray(weightfun(delta), dtype=np.float64) * vm  # (B, k)

        X = np.concatenate(
            [np.ones((B, k, 1)), d.coords[safe]], axis=2
        )  # (B, k, p)
        X = X * vm[:, :, None]
        zn = z[safe] * vm  # (B, k)

        WX = w[:, :, None] * X                     # (B, k, p)
        G = np.einsum("bkp,bkq->bpq", X, WX)       # XᵀWX (B, p, p)
        b = np.einsum("bkp,bk->bp", WX, zn)        # XᵀWz (B, p)

        q = pdf[qcols].to_numpy(np.float64)
        x0 = np.concatenate([np.ones((B, 1)), q], axis=1)  # (B, p)

        theta, Ginv_x0 = _wls_solve(G, b, x0)

        mu = np.einsum("bp,bp->b", theta, x0)
        r = WX @ Ginv_x0[:, :, None]               # W X (XᵀWX)⁻¹ x₀, (B,k,1)
        sigma = np.sqrt(np.einsum("bk,bk->b", r[:, :, 0], r[:, :, 0]))

        few = nvalid < minneighbors
        mu = np.where(few, np.nan, mu)
        sigma = np.where(few, np.nan, sigma)
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(np.int64),
            var: mu,
            f"{var}_variance": sigma,
        })

    return kernel


def solve_lwr(
    data: DataFrame | PointData,
    grid_df: DataFrame,
    var: str = "z",
    data_coord_cols: list[str] | None = None,
    query_coord_cols: list[str] | None = None,
    maxneighbors: int | None = None,
    minneighbors: int = 1,
    weightfun: Callable = default_weightfun,
    metric: Distance = Euclidean(),
    radius: float | None = None,
    id_col: str = "cell_id",
    strategy: str = "auto",
    tile_res: int | None = None,
    broadcast_limit: int = 2_000_000,
    tiled_first_replicate: str = "auto",
) -> DataFrame:
    """``strategy`` as in `solve_kriging`: 'auto' routes a DataFrame data
    side above ``broadcast_limit`` through the distributed tiled join."""
    data_coord_cols = data_coord_cols or ["x", "y"]
    query_coord_cols = query_coord_cols or ["cx", "cy"]
    if minneighbors < 1:
        raise ValueError("minneighbors must be >= 1")
    if isinstance(data, DataFrame) and maxneighbors is not None:
        from ..planner import choose_strategy, choose_tile_res

        if strategy == "auto":
            n_data = data.count()
            strategy = choose_strategy(n_data, maxneighbors, broadcast_limit)
            if tile_res is None:
                tile_res = choose_tile_res(n_data)
        if strategy == "local-tiled":
            from .tiled import lwr_tiled

            if minneighbors > maxneighbors:
                raise ValueError("invalid min/max number of neighbors")
            return lwr_tiled(
                data, grid_df, var, data_coord_cols, query_coord_cols,
                maxneighbors, minneighbors, weightfun, metric, radius,
                id_col, res=(tile_res if tile_res is not None else 6),
                first_replicate=tiled_first_replicate,
            )
    if isinstance(data, DataFrame):
        data = collect_points(
            data.filter(f"{var} IS NOT NULL"),
            data_coord_cols,
            [var],
            id_col="data_id" if "data_id" in data.columns else None,
        )
    if data.n == 0:
        raise ValueError("estimation requires data")
    k = data.n if maxneighbors is None else min(maxneighbors, data.n)
    if minneighbors > k:
        raise ValueError("invalid min/max number of neighbors")
    kernel = lwr_kernel(var, weightfun, minneighbors, id_col, query_coord_cols)
    schema = f"{id_col} long, {var} double, {var}_variance double"
    return local_apply(
        grid_df, data, query_coord_cols, k, metric, kernel, schema, radius
    )
