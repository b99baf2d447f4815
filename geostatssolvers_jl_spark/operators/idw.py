"""Inverse distance weighting estimation (reference: IDWSolver,
``/root/reference/src/estimation/idw.jl:58-153``).

Semantics reproduced exactly:
* k nearest (or radius-bounded, ``src/ui.jl:25-31``) neighbors per cell,
  sorted by distance, ties by data id;
* fewer than ``minneighbors`` → NULL outputs (``idw.jl:121-122``);
* weights ``w = 1/d^exponent`` (``idw.jl:126``); any zero distance → emit
  that datum exactly with σ = 0 (``idw.jl:129-132``, first-in-sort-order =
  min data id among d=0);
* outputs ``var`` (weighted mean) and ``var_distance`` (min distance,
  ``idw.jl:137``).

Two physical strategies:
* `idw_agg_sql` — fully declarative join+groupBy aggregation (zero UDF;
  whole-stage codegen; the same SQL text runs on DuckDB for the oracle);
* `solve_idw` — the zero-shuffle broadcast kernel (`local_apply`): search
  and weighted mean fused in one vectorized mapInPandas pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..distances import Distance, Euclidean
from ..grid import CartesianGrid
from ..neighbors import PointData, collect_points, local_apply


def idw_agg_sql(pairs: str, var: str = "z", exponent: float = 1.0,
                minneighbors: int = 1, qid: str = "cell_id",
                round_to: int | None = None) -> str:
    """Aggregation over a kNN-pair relation ``pairs(qid, data_id, dist, z)``.

    Shared Spark-SQL/DuckDB dialect; implements A1 (weighted mean) + A2
    (zero-distance exactness) of SURVEY.md §2.4 as a pure groupBy.
    """
    # FILTER keeps zero distances out of the division: Spark ANSI mode
    # evaluates every CASE branch's aggregates, and the d=0 rows are
    # handled exactly by the min_by branch (idw.jl:129-132)
    wmean = (
        f"sum({var} / pow(dist, {exponent!r})) FILTER (WHERE dist > 0.0) / "
        f"sum(1.0 / pow(dist, {exponent!r})) FILTER (WHERE dist > 0.0)"
    )
    mu = (
        f"CASE WHEN count(*) < {minneighbors} THEN NULL "
        f"WHEN min(dist) = 0.0 THEN min_by({var}, data_id) FILTER (WHERE dist = 0.0) "
        f"ELSE {wmean} END"
    )
    sigma = (
        f"CASE WHEN count(*) < {minneighbors} THEN NULL "
        f"WHEN min(dist) = 0.0 THEN 0.0 ELSE min(dist) END"
    )
    if round_to is not None:
        # + 0.0 maps -0.0 to +0.0 (a no-op otherwise) so a sign-changing
        # variable cannot hash-diverge from a Spark twin that normalizes
        # (the gate's -0.0 contract; see __spark_entry__)
        mu = f"round({mu}, {round_to}) + 0.0"
        sigma = f"round({sigma}, {round_to}) + 0.0"
    return (
        f"SELECT {qid}, {mu} AS {var}, {sigma} AS {var}_distance "
        f"FROM {pairs} GROUP BY {qid}"
    )


def idw_kernel(var: str, exponent: float, minneighbors: int,
               id_col: str = "cell_id"):
    """Vectorized IDW over stacked neighbor arrays (one Arrow batch)."""

    def kernel(pdf: pd.DataFrame, d: PointData, idx: np.ndarray,
               dist: np.ndarray, nvalid: np.ndarray) -> pd.DataFrame:
        z = d.values[var].astype(np.float64)
        zn = z[np.maximum(idx, 0)]  # (n, k); invalid slots masked below
        valid = idx >= 0
        with np.errstate(divide="ignore", invalid="ignore"):
            w = np.where(valid, 1.0 / np.power(dist, exponent), 0.0)
        sw = w.sum(axis=1)
        mu = np.where(sw > 0, (w * np.where(valid, zn, 0.0)).sum(axis=1), np.nan)
        sw_safe = np.where(sw > 0, sw, 1.0)
        mu = mu / sw_safe
        dmin = dist.min(axis=1)  # invalid slots are +inf ⇒ min is the true one
        # zero-distance exactness: first (lowest (dist, id)) slot has d=0
        zero = (dist[:, 0] == 0.0) & valid[:, 0]
        mu = np.where(zero, zn[:, 0], mu)
        sigma = np.where(zero, 0.0, dmin)
        # infinite weight sum w/o exact zero cannot happen (d>0 ⇒ finite w)
        few = nvalid < minneighbors
        mu = np.where(few, np.nan, mu)
        sigma = np.where(few, np.nan, sigma)
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(np.int64),
            var: mu,
            f"{var}_distance": sigma,
        })

    return kernel


# ----------------------------------------------------- compositional data


def closure(c: np.ndarray) -> np.ndarray:
    s = c.sum(axis=-1, keepdims=True)
    return c / s


def ilr(comp: np.ndarray) -> np.ndarray:
    """Isometric log-ratio transform (public CoDa math), (n, D) → (n, D-1)."""
    x = np.log(closure(comp))
    D = x.shape[-1]
    out = []
    for i in range(1, D):
        g = x[..., :i].mean(axis=-1)
        out.append(np.sqrt(i / (i + 1.0)) * (g - x[..., i]))
    return np.stack(out, axis=-1)


def ilr_inv(y: np.ndarray) -> np.ndarray:
    """(n, D-1) → (n, D) closed compositions."""
    D = y.shape[-1] + 1
    V = _helmert_basis(D)  # ilr basis is orthonormal ⇒ clr = y · Vᵀ
    return closure(np.exp(y @ V.T))


def _helmert_basis(D: int) -> np.ndarray:
    """Orthonormal basis of the clr hyperplane matching `ilr` above:
    row i (1-based) = sqrt(i/(i+1)) * [1/i ×i, −1, 0...]."""
    V = np.zeros((D, D - 1))
    for i in range(1, D):
        v = np.zeros(D)
        v[:i] = 1.0 / i
        v[i] = -1.0
        v = v * np.sqrt(i / (i + 1.0))
        V[:, i - 1] = v
    return V


def aitchison(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Aitchison distance = Euclidean distance between ilr coordinates."""
    return np.sqrt(((ilr(a) - ilr(b)) ** 2).sum(axis=-1))


def solve_idw_compositional(
    data: DataFrame,
    grid_df: DataFrame,
    var: str = "z",
    data_coord_cols: list[str] | None = None,
    query_coord_cols: list[str] | None = None,
    maxneighbors: int | None = None,
    minneighbors: int = 1,
    exponent: float = 1.0,
    metric: Distance = Euclidean(),
    id_col: str = "cell_id",
    strategy: str = "auto",
    tile_res: int | None = None,
    broadcast_limit: int = 2_000_000,
    tiled_first_replicate: str = "auto",
) -> DataFrame:
    """IDW over composition-valued columns (reference:
    ``test/estimation/idw.jl:47-65``): spatial neighbor search + weighted
    mean in ilr space (the Fréchet mean of the Aitchison geometry), output
    re-closed compositions as an array column.

    ``strategy`` as in `solve_idw`: 'auto' routes a data side above
    ``broadcast_limit`` rows through the distributed tiled join
    (`tiled.idw_compositional_tiled`, bit-identical results) instead of a
    driver collect."""
    data_coord_cols = data_coord_cols or ["x", "y"]
    query_coord_cols = query_coord_cols or ["cx", "cy"]
    # shared by BOTH strategies (the broadcast path must reject the same
    # inputs the tiled path does — idw.jl:95)
    if minneighbors < 1:
        raise ValueError("minneighbors must be >= 1")
    if maxneighbors is not None and minneighbors > maxneighbors:
        raise ValueError("invalid min/max number of neighbors")
    if maxneighbors is not None:
        from ..planner import choose_strategy, choose_tile_res

        if strategy == "auto":
            n_data = data.count()
            strategy = choose_strategy(n_data, maxneighbors, broadcast_limit)
            if tile_res is None:
                tile_res = choose_tile_res(n_data)
        if strategy == "local-tiled":
            from .tiled import idw_compositional_tiled

            return idw_compositional_tiled(
                data, grid_df, var, data_coord_cols, query_coord_cols,
                maxneighbors, minneighbors, exponent, metric, id_col,
                res=(tile_res if tile_res is not None else 6),
                first_replicate=tiled_first_replicate,
            )
    # collect_points gives the canonical id-sorted order, so kNN ties
    # break deterministically AND identically to the tiled path's
    # (dist, data_id) window ordering
    d0 = collect_points(
        data.filter(f"{var} IS NOT NULL"), data_coord_cols, [var],
        id_col="data_id" if "data_id" in data.columns else None,
    )
    if d0.n == 0:
        raise ValueError("estimation requires data")
    comp = np.stack(d0.values[var])
    Y = ilr(comp)
    d = PointData(
        coords=d0.coords,
        values={"_ilr": Y, var: comp},
        ids=d0.ids,
    )
    k = d.n if maxneighbors is None else min(maxneighbors, d.n)

    def kernel(qpdf, dd, idx, dist, nvalid):
        Yd = dd.values["_ilr"]
        Cd = dd.values[var]
        valid = idx >= 0
        safe = np.maximum(idx, 0)
        with np.errstate(divide="ignore"):
            w = np.where(valid, 1.0 / np.power(dist, exponent), 0.0)
        finite_w = np.where(np.isfinite(w), w, 0.0)
        sw = finite_w.sum(axis=1, keepdims=True)
        sw = np.where(sw > 0, sw, 1.0)
        ym = np.einsum("nk,nkd->nd", finite_w / sw, Yd[safe])
        out = ilr_inv(ym)
        zero = (dist[:, 0] == 0.0) & valid[:, 0]
        out[zero] = closure(Cd[safe[:, 0][zero]])
        few = nvalid < minneighbors
        vals = [None if f else row.tolist() for f, row in zip(few, out)]
        return pd.DataFrame({
            id_col: qpdf[id_col].to_numpy(np.int64),
            var: vals,
        })

    from ..neighbors import local_apply

    schema = f"{id_col} long, {var} array<double>"
    return local_apply(
        grid_df, d, query_coord_cols, k, metric, kernel, schema
    )


def solve_idw(
    data: DataFrame | PointData,
    grid_df: DataFrame,
    var: str = "z",
    data_coord_cols: list[str] | None = None,
    query_coord_cols: list[str] | None = None,
    maxneighbors: int | None = 3,
    minneighbors: int = 1,
    exponent: float = 1.0,
    metric: Distance = Euclidean(),
    radius: float | None = None,
    id_col: str = "cell_id",
    strategy: str = "auto",
    tile_res: int | None = None,
    broadcast_limit: int = 2_000_000,
    tiled_first_replicate: str = "auto",
) -> DataFrame:
    """IDW solve. ``grid_df`` must carry ``id_col`` and the query
    coordinate columns (e.g. cx, cy from `CartesianGrid.spark_df`).

    ``strategy`` as in `solve_kriging`: 'auto' routes a DataFrame data side
    above ``broadcast_limit`` through the distributed tiled join."""
    data_coord_cols = data_coord_cols or ["x", "y"]
    query_coord_cols = query_coord_cols or ["cx", "cy"]
    if minneighbors < 1:
        raise ValueError("minneighbors must be >= 1")
    if exponent <= 0:
        raise ValueError("exponent must be positive")  # idw.jl:94
    if isinstance(data, DataFrame) and maxneighbors is not None:
        from ..planner import choose_strategy, choose_tile_res

        if strategy == "auto":
            n_data = data.count()
            strategy = choose_strategy(n_data, maxneighbors, broadcast_limit)
            if tile_res is None:
                tile_res = choose_tile_res(n_data)
        if strategy == "local-tiled":
            from .tiled import idw_tiled

            if minneighbors > maxneighbors:
                raise ValueError("invalid min/max number of neighbors")
            return idw_tiled(
                data, grid_df, var, data_coord_cols, query_coord_cols,
                maxneighbors, minneighbors, exponent, metric, radius,
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
        raise ValueError("estimation requires data")  # idw.jl:93
    k = data.n if maxneighbors is None else min(maxneighbors, data.n)
    if minneighbors > k:
        raise ValueError("invalid min/max number of neighbors")  # idw.jl:95
    kernel = idw_kernel(var, exponent, minneighbors, id_col)
    schema = f"{id_col} long, {var} double, {var}_distance double"
    return local_apply(
        grid_df, data, query_coord_cols, k, metric, kernel, schema, radius
    )
