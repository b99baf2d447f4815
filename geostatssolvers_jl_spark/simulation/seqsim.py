"""Sequential simulation (reference: SeqSim + SGS,
``/root/reference/src/simulation/seq.jl:30-141``, ``sgs.jl:44-89``).

Semantics per realization (seq.jl:102-135): initialize the realization
buffer from data via nearest-cell assignment (``NearestInit`` — data values
land on their nearest grid cells and are marked simulated, which is what
makes the reference's conditioning-exactness golden hold,
``test/simulation/sgs.jl:18-20``); traverse the remaining cells along a
path; at each cell search ≤ maxneighbors *already-simulated* neighbors
(masked kNN, J3 of SURVEY §2.3), fit the CDF estimator (SGS: Simple
Kriging → conditional Normal), draw; mark simulated.

Spark realization: sequential dependence is fundamentally at odds with a
shuffle-based engine, so the *whole sequential loop* runs inside one task
per (tile, realization) — ``spark.range(nreals × ntiles)`` →
``mapInPandas``.  Tiles partition the grid; each tile conditions on ALL
original data (broadcast) plus its own already-simulated cells, but not on
other tiles' simulated values — a documented approximation that preserves
the reference's exactness golden (data cells are fixed before any draw)
and converges to the exact algorithm as maxneighbors' reach stays inside
one tile.  ``tiles=1`` reproduces the reference exactly.

RNG is ``(seed, real_id, tile)`` — deterministic under any partitioning
(the reference's shared global RNG cannot provide this; SURVEY §7 makes it
a requirement).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import CartesianGrid
from ..variogram import GaussianVariogram, Variogram, require_stationary
from .lugs import _centroids


@dataclass(frozen=True)
class SGSParams:
    variogram: Variogram = field(default_factory=GaussianVariogram)
    mean: float = 0.0
    minneighbors: int = 1
    maxneighbors: int = 10
    radius: float | None = None          # MetricBall neighborhood
    path: str = "linear"                 # "linear" | "random"
    # pluggable CDF-estimator protocol (reference: SeqSim's `estimator`
    # with fit/predictprob, seq.jl:31 + test/dummy.jl:10-13): a callable
    # (rng, query_xy, neigh_xy, neigh_z) -> drawn value.  None → the SGS
    # Simple-Kriging conditional Normal (sgs.jl:64-69).
    estimator: object | None = None


def _sk_draw(
    rng, vg: Variogram, mean: float, qxy: np.ndarray,
    nxy: np.ndarray, nz: np.ndarray,
) -> float:
    """Simple-Kriging conditional Normal draw at one location."""
    d = nxy - qxy[None, :]
    h0 = np.sqrt((d * d).sum(axis=1))
    dd = nxy[:, None, :] - nxy[None, :, :]
    H = np.sqrt((dd * dd).sum(axis=2))
    C = vg.cov(H)
    c0 = vg.cov(h0)
    try:
        lam = np.linalg.solve(C, c0)
    except np.linalg.LinAlgError:
        lam = np.linalg.lstsq(C, c0, rcond=None)[0]
    mu = mean + lam @ (nz - mean)
    var = max(vg.sill - lam @ c0, 0.0)
    return mu + np.sqrt(var) * rng.standard_normal()


def _simulate_tile(
    rng,
    cells: np.ndarray,           # linear cell ids of this tile
    pts: np.ndarray,             # their centroids (nc, dim)
    params: SGSParams,
    init_vals: dict[int, float],  # cell_id -> hard value (NearestInit)
) -> np.ndarray:
    vg, mean = params.variogram, params.mean
    nc = len(cells)
    values = np.full(nc, np.nan)
    simulated = np.zeros(nc, dtype=bool)
    pos = {int(c): i for i, c in enumerate(cells)}
    for c, v in init_vals.items():
        if c in pos:
            values[pos[c]] = v
            simulated[pos[c]] = True

    order = np.arange(nc)
    if params.path == "random":
        rng.shuffle(order)

    sigma = np.sqrt(vg.sill)
    for i in order:
        if simulated[i]:
            continue
        sel = np.nonzero(simulated)[0]
        if sel.size:
            d = pts[sel] - pts[i][None, :]
            dist = np.sqrt((d * d).sum(axis=1))
            if params.radius is not None:
                sel = sel[dist <= params.radius]
                dist = dist[dist <= params.radius]
            if sel.size > params.maxneighbors:
                part = np.argpartition(dist, params.maxneighbors - 1)
                keep = part[: params.maxneighbors]
                sel, dist = sel[keep], dist[keep]
        if sel.size < params.minneighbors:
            values[i] = mean + sigma * rng.standard_normal()
        elif params.estimator is not None:
            values[i] = params.estimator(rng, pts[i], pts[sel], values[sel])
        else:
            values[i] = _sk_draw(
                rng, vg, mean, pts[i], pts[sel], values[sel]
            )
        simulated[i] = True
    return values


def solve_sgs(
    spark: SparkSession,
    grid: CartesianGrid,
    nreals: int,
    params: SGSParams | None = None,
    data: DataFrame | None = None,
    var: str = "z",
    data_coord_cols: list[str] | None = None,
    seed: int = 0,
    tiles: tuple[int, int] | None = None,
) -> DataFrame:
    """Long DataFrame (real_id, cell_id, var).  ``tiles`` splits the grid
    for intra-realization parallelism (None → single tile = exact)."""
    params = params or SGSParams()
    require_stationary(params.variogram, "SGS")
    data_coord_cols = data_coord_cols or ["x", "y"][: grid.ndims]

    init_vals: dict[int, float] = {}
    if data is not None:
        snap = grid.snap_cell_expr(tuple(data_coord_cols), "cell_id")
        # deterministic survivor when several data rows snap to one cell:
        # min value wins (dropDuplicates keeps an arbitrary row, which
        # varies with partitioning and breaks realization reproducibility)
        rows = (
            data.filter(f"{var} IS NOT NULL")
            .selectExpr(f"{snap} AS cell_id", f"{var} AS zv")
            .groupBy("cell_id").agg(F.min("zv").alias("zv"))
            .collect()
        )
        init_vals = {int(r["cell_id"]): float(r["zv"]) for r in rows}

    pts = _centroids(grid)
    ncells = grid.ncells
    # tile decomposition over the FIRST axis in linear order keeps tiles
    # contiguous in cell_id for 1-D; for 2-D use a (tx, ty) block split
    if tiles is None:
        tiles = (1, 1)
    ntiles = tiles[0] * (tiles[1] if grid.ndims > 1 else 1)

    def tile_cells(t: int) -> np.ndarray:
        if grid.ndims == 1:
            n = grid.dims[0]
            step = -(-n // ntiles)
            return np.arange(t * step, min(n, (t + 1) * step))
        nx, ny = grid.dims[0], grid.dims[1]
        tx, ty = t % tiles[0], t // tiles[0]
        sx, sy = -(-nx // tiles[0]), -(-ny // tiles[1])
        ii = np.arange(tx * sx, min(nx, (tx + 1) * sx))
        jj = np.arange(ty * sy, min(ny, (ty + 1) * sy))
        J, I = np.meshgrid(jj, ii, indexing="ij")
        return (J * nx + I).ravel()

    from pyspark import cloudpickle

    # cloudpickle: pluggable estimators may be lambdas/closures
    bc = spark.sparkContext.broadcast(
        cloudpickle.dumps((params, init_vals, pts, seed))
    )

    def gen(batches):
        pr, iv, p_all, sd = cloudpickle.loads(bc.value)
        for pdf in batches:
            for unit in pdf["id"].tolist():
                real_id, t = int(unit) // ntiles, int(unit) % ntiles
                cells = tile_cells(t)
                rng = np.random.default_rng((sd, real_id, t))
                vals = _simulate_tile(rng, cells, p_all[cells], pr, iv)
                yield pd.DataFrame({
                    "real_id": np.full(len(cells), real_id, dtype=np.int64),
                    "cell_id": cells.astype(np.int64),
                    var: vals,
                })

    return spark.range(nreals * ntiles, numPartitions=min(nreals * ntiles, 64)).mapInPandas(
        gen, schema=f"real_id long, cell_id long, {var} double"
    )
