"""Sequential indicator simulation (SIS) — CATEGORICAL fields, the
indicator companion of SGS (public GSLIB ``sisim`` semantics,
Deutsch & Journel 1998 ch. V; the reference has no categorical
simulator — its solvers are Gaussian + the cookie cutter, so this is
an engine addition completing the simulation suite alongside the
round-6 indicator VARIOGRAMS and indicator KRIGING).

Median-IK (single shared indicator variogram) form: at each path cell
the SK weights λ solve ONE system C λ = c₀ over the already-simulated
neighbors (weights depend only on geometry, so all categories share
them); per category c the estimated probability is
p̂_c = p_c + λᵀ(1[z = c] − p_c), then the standard order corrections
(clamp ≥ 0, renormalize) and ONE uniform draw picks the category from
the cumulative — a single RNG stream event per cell, so realizations
are reproducible whatever the category count.

Distribution-over-Spark shape is `solve_sgs`'s: the whole sequential
loop runs inside one task per (tile, realization); data conditioning
by NearestInit keeps the exactness golden (a data cell's category is
fixed before any draw); RNG is (seed, real_id, tile).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..distances import Distance, Euclidean
from ..grid import CartesianGrid
from ..variogram import Variogram
from .seqsim import SGSParams, solve_sgs


@dataclass(frozen=True)
class SISParams:
    """``variogram``: the shared (median-IK) indicator variogram —
    conventionally sill ≈ p(1−p) of the dominant cut, but any
    stationary model works since the weights are what it feeds;
    ``categories``/``proportions``: the label values (stored as
    doubles in the realization buffer) and their marginal frequencies."""

    variogram: Variogram
    categories: tuple = (0.0, 1.0)
    proportions: tuple = (0.5, 0.5)
    minneighbors: int = 1
    maxneighbors: int = 10
    radius: float | None = None
    path: str = "linear"
    metric: Distance = field(default_factory=Euclidean)

    def validate(self) -> None:
        if len(self.categories) != len(self.proportions):
            raise ValueError("categories and proportions differ in length")
        if len(self.categories) < 2:
            raise ValueError("SIS needs at least 2 categories")
        if len(set(float(c) for c in self.categories)) != len(
                self.categories):
            raise ValueError("duplicate categories")
        p = np.asarray(self.proportions, dtype=np.float64)
        if (p <= 0).any() or abs(p.sum() - 1.0) > 1e-9:
            raise ValueError(
                f"proportions must be positive and sum to 1, got {p}")


def _draw_from(rng, cats: np.ndarray, probs: np.ndarray) -> float:
    """One uniform → cumulative lookup (single RNG event per cell)."""
    u = rng.uniform()
    j = int(np.searchsorted(np.cumsum(probs), u, side="right"))
    return float(cats[min(j, len(cats) - 1)])


def _sis_estimator(vg: Variogram, cats: np.ndarray, props: np.ndarray):
    def est(rng, qxy, nxy, nz):
        d = nxy - qxy[None, :]
        h0 = np.sqrt((d * d).sum(axis=1))
        dd = nxy[:, None, :] - nxy[None, :, :]
        H = np.sqrt((dd * dd).sum(axis=2))
        C = vg.cov(H) + (1e-10 * vg.sill) * np.eye(len(nz))
        c0 = vg.cov(h0)
        try:
            lam = np.linalg.solve(C, c0)
        except np.linalg.LinAlgError:
            lam = np.linalg.lstsq(C, c0, rcond=None)[0]
        ind = (nz[None, :] == cats[:, None]).astype(np.float64)
        ph = props + (ind - props[:, None]) @ lam
        ph = np.maximum(ph, 0.0)
        s = ph.sum()
        probs = props if s <= 0.0 else ph / s
        return _draw_from(rng, cats, probs)

    return est


def solve_sis(
    spark: SparkSession,
    grid: CartesianGrid,
    nreals: int,
    params: SISParams,
    data: DataFrame | None = None,
    var: str = "z",
    data_coord_cols: list[str] | None = None,
    seed: int = 0,
    tiles: tuple[int, int] | None = None,
    halo: int = 0,
) -> DataFrame:
    """Long DataFrame (real_id, cell_id, var) of category labels —
    `solve_sgs`'s distribution shape with the categorical estimator
    and a categorical few-neighbor marginal."""
    params.validate()
    cats = np.asarray([float(c) for c in params.categories])
    props = np.asarray(params.proportions, dtype=np.float64)
    if data is not None:
        bad = data.filter(
            f"{var} IS NOT NULL AND {var} NOT IN "
            f"({', '.join(repr(float(c)) for c in cats)})")
        if bad.limit(1).count() > 0:
            raise ValueError(
                f"conditioning {var} values outside the category set "
                f"{tuple(float(c) for c in cats)} (fail-loud contract)")
    sgsp = SGSParams(
        variogram=params.variogram,
        mean=0.0,  # unused: estimator + marginal cover every draw
        minneighbors=params.minneighbors,
        maxneighbors=params.maxneighbors,
        radius=params.radius,
        path=params.path,
        estimator=_sis_estimator(params.variogram, cats, props),
        marginal=lambda rng: _draw_from(rng, cats, props),
        metric=params.metric,
    )
    return solve_sgs(
        spark, grid, nreals, sgsp, data=data, var=var,
        data_coord_cols=data_coord_cols, seed=seed, tiles=tiles,
        halo=halo)
