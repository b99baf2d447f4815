"""Tiled (big-big) physical strategy for the local estimation operators.

The broadcast path (`neighbors.local_apply`) mirrors the reference's
global in-memory kd-tree (``/root/reference/src/ui.jl:27``) and is valid
while the conditioning data fits one executor.  Above
``planner.choose_strategy``'s broadcast limit the solvers route HERE:

1. exact neighbor pairs via the fully-distributed escalating tiled join
   (`neighbors.knn_join_tiled_exact` — no driver collect of either side);
2. neighbor attributes (coords + values) joined back on ``data_id``
   (ordinary shuffle equi-join, AQE-optimizable, skew-salted upstream);
3. per-query neighbor ARRAYS via ``sort_array(collect_list(struct(...)))``
   — rank-sorted, so the gathered (B, k, ·) stacks are in the identical
   (dist, data_id) order the broadcast kernel uses;
4. one vectorized ``mapInPandas`` pass runs the SAME stacked math kernels
   (`kriging.solve_systems`, IDW / LWR array kernels) over the gathered
   arrays — identical FP op order ⇒ results bit-identical to the
   broadcast path whenever the distance bits agree (proven by
   tests/test_tiled_estimation.py).  On Haversine the tiled path's
   distances come from JVM trig instead of numpy trig; 1-ulp libm
   differences can propagate to ~1e-11 relative on ill-conditioned
   (duplicate-coordinate) kriging systems — far below the round-6
   correctness gate.

Scale shape: two shuffles (pair join + group-to-arrays) over rows
proportional to queries×k, never a broadcast or driver materialization of
the data side.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..distances import Distance, Haversine
from ..neighbors import knn_join_tiled_exact

# kernel(q_pdf, qcoords (B,d), NC (B,k,d), vals {name: (B,k)},
#        dist (B,k) +inf-padded, valid (B,k)) -> pd.DataFrame
ArrayKernel = Callable[..., pd.DataFrame]

# one live final-pairs cache per application (see tiled_local_apply);
# entries are (owning SparkSession, pairs DataFrame, semanticHash) and
# every get/evict/store runs under _PAIRS_LOCK — the gate executes arms
# concurrently, so the sequence must be atomic
_LAST_PAIRS: dict = {}
_PAIRS_LOCK = __import__("threading").Lock()


def tiled_local_apply(
    grid_df: DataFrame,
    data_df: DataFrame,
    query_coord_cols: list[str],
    data_coord_cols: list[str],
    value_cols: list[str],
    k: int,
    kernel: ArrayKernel,
    out_schema: str,
    metric: Distance | None = None,
    radius: float | None = None,
    res: int = 6,
    id_col: str = "cell_id",
    salt: int = 0,
    first_replicate: str = "auto",
) -> DataFrame:
    """Search + gather + solve for a data side too big to broadcast.
    ``first_replicate``: which side the bulk tiled pass replicates ×9 —
    'queries' when the estimation grid is the smaller side (see
    `knn_join_tiled_exact`).  'auto' (default) compares the two row
    counts and replicates the smaller side — two column-pruned count
    scans, trivially amortized against the join they shape (the engine's
    own headline shape is a small estimation grid vs a 10¹²-page data
    side, where replicating the data side ×9 is exactly wrong)."""
    if len(data_coord_cols) != 2 or len(query_coord_cols) != 2:
        # SUPPORTED 3-D strategy: broadcast.  The reference's domains are
        # 1-D/2-D (CartesianGrid(100), (100,100) throughout its tests);
        # the N-D broadcast path covers 3-D data up to its documented
        # bound of ~2M conditioning rows (planner.choose_strategy's
        # broadcast_limit ≈ 2e6 × (3 coords + values) × 8 B ≈ 100 MB per
        # executor, well under executor memory).  A z-slab tiled ladder
        # (slab over z with halo ≥ search radius, 2-D tiles within each
        # slab) is the designed extension if a >2M-row 3-D corpus ever
        # materializes; it is NOT implemented, and this guard makes that
        # an explicit error instead of silently wrong neighbors.
        raise ValueError(
            "the tiled strategy tiles a 2-D (lon, lat) domain; "
            f"got {len(data_coord_cols)}-D coords — use the broadcast "
            "strategy for higher-dimensional data"
        )
    if "data_id" not in data_df.columns:
        raise ValueError(
            "tiled strategy requires a deterministic 'data_id' column "
            "(tie-break identity must not depend on partitioning)"
        )
    metric = metric or Haversine()
    qsel = grid_df.selectExpr(
        id_col,
        f"{query_coord_cols[0]} AS lon",
        f"{query_coord_cols[1]} AS lat",
    )
    dsel = data_df.selectExpr(
        "data_id",
        f"{data_coord_cols[0]} AS lon",
        f"{data_coord_cols[1]} AS lat",
    )
    if first_replicate == "auto":
        first_replicate = (
            "queries" if qsel.count() <= dsel.count() else "data"
        )
    pairs = knn_join_tiled_exact(
        qsel, dsel, k, res, metric=metric, salt=salt,
        first_replicate=first_replicate,
    )
    # the ladder returns its final pairs CACHED (callers re-scan them in
    # the attribute join + gather below); bound the pinned storage to ONE
    # live pairs relation per session — repeated tiled solves otherwise
    # accumulate a CacheManager entry each (the handle never reached the
    # caller, so the documented caller-side unpersist was unreachable).
    # cache() keeps lineage, so unpersisting the PREVIOUS solve's pairs
    # stays correct even if its result is still lazily held — it would
    # recompute, not fail.
    # the gate runs arms concurrently, so the check/evict/store sequence
    # must be atomic: interleaved threads could unpersist a pairs
    # relation another in-flight solve depends on (correct via lineage
    # but forces a full ladder re-execution) or overwrite an entry
    # without unpersisting it (stranding a pinned InMemoryRelation —
    # exactly the growth this cache bounds).  Keyed by the owning
    # SparkSession too: applicationId is shared across sessions of one
    # context, and a semanticHash hit must never hand back a DataFrame
    # built in a different session.
    sess = qsel.sparkSession
    app = sess.sparkContext.applicationId
    try:
        sem = pairs._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        sem = None
    with _PAIRS_LOCK:
        prev = _LAST_PAIRS.get(app)
        if prev is not None:
            prev_sess, prev_df, prev_sem = prev
            if (sem is not None and sem == prev_sem
                    and prev_sess is sess):
                # identical solve repeated (bench reps, retried stages):
                # the CacheManager already holds these exact pairs —
                # evicting them would force a full ladder re-execution
                pairs = prev_df
            else:
                try:
                    prev_df.unpersist()
                except Exception:
                    pass
                _LAST_PAIRS[app] = (sess, pairs, sem)
        else:
            _LAST_PAIRS[app] = (sess, pairs, sem)
    if radius is not None:
        # KBallSearch semantics: the ≤k nearest within the ball
        pairs = pairs.filter(F.col("dist") <= radius)

    # one attribute row per data_id — a plain join would FAN OUT every
    # pair row per duplicate and collect_list would gather >k structs,
    # truncating real neighbors.  data_id must identify ONE point:
    # content-derived ids (sources/delimited) collide only for
    # byte-identical rows (identical payloads, so any survivor is exact);
    # should a caller-supplied id ever collide across DIFFERENT payloads,
    # min(struct) keeps a DETERMINISTIC survivor (dropDuplicates keeps a
    # partitioning-dependent one — the nondeterminism this engine
    # eliminates everywhere else with min-based survivors)
    acols = ["_nx", "_ny"] + [f"_v_{v}" for v in value_cols]
    dvals = (
        data_df.selectExpr(
            "data_id",
            f"{data_coord_cols[0]} AS _nx",
            f"{data_coord_cols[1]} AS _ny",
            *[f"{v} AS _v_{v}" for v in value_cols],
        )
        .groupBy("data_id")
        .agg(F.min(F.struct(*acols)).alias("_srv"))
        .select("data_id", *[F.col(f"_srv.{c}").alias(c) for c in acols])
    )
    enriched = pairs.join(dvals, "data_id")
    struct_cols = [
        F.col("rank"), F.col("dist"), F.col("_nx"), F.col("_ny"),
        *[F.col(f"_v_{v}") for v in value_cols],
    ]
    nb = enriched.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct(*struct_cols))).alias("_nb")
    )
    # split the rank-sorted struct array into TYPED arrays JVM-side: Arrow
    # then delivers plain float64 numpy arrays per field, and the kernel
    # fills the (B, k) stacks with per-ROW slice assignments instead of a
    # per-ELEMENT Python dict walk (the hot path at 10⁸ queries × k)
    field_cols = ["dist", "_nx", "_ny"] + [f"_v_{v}" for v in value_cols]
    nb = nb.select(
        id_col,
        *[
            F.expr(f"transform(_nb, s -> s.{f})").alias(f"_a{f}")
            for f in field_cols
        ],
    )
    joined = grid_df.select(id_col, *query_coord_cols).join(
        nb, id_col, "left"
    )
    vnames = list(value_cols)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = len(pdf)
            qcoords = pdf[query_coord_cols].to_numpy(np.float64)
            NC = np.zeros((B, k, 2))
            dist = np.full((B, k), np.inf)
            valid = np.zeros((B, k), dtype=bool)
            vals = {v: np.zeros((B, k)) for v in vnames}
            cols = {f: pdf[f"_a{f}"].to_numpy() for f in field_cols}
            for b in range(B):
                dd = cols["dist"][b]
                if dd is None or len(dd) == 0:
                    continue
                m = min(len(dd), k)
                dist[b, :m] = dd[:m]
                valid[b, :m] = True
                NC[b, :m, 0] = cols["_nx"][b][:m]
                NC[b, :m, 1] = cols["_ny"][b][:m]
                for v in vnames:
                    vals[v][b, :m] = cols[f"_v_{v}"][b][:m]
            yield kernel(pdf, qcoords, NC, vals, dist, valid)

    return joined.mapInPandas(run, schema=out_schema)


def kriging_tiled(
    data_df: DataFrame,
    grid_df: DataFrame,
    var: str,
    model,
    data_coord_cols: list[str],
    query_coord_cols: list[str],
    k: int,
    minneighbors: int,
    metric: Distance,
    radius: float | None,
    id_col: str,
    res: int = 6,
    salt: int = 0,
    first_replicate: str = "auto",
) -> DataFrame:
    from .kriging import solve_systems

    def kernel(pdf, qcoords, NC, vals, dist, valid):
        mu, v = solve_systems(
            model, qcoords, NC, vals[var], valid, dist, metric, minneighbors
        )
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(np.int64),
            var: mu, f"{var}_variance": v,
        })

    schema = f"{id_col} long, {var} double, {var}_variance double"
    return tiled_local_apply(
        grid_df, data_df.filter(f"{var} IS NOT NULL"),
        query_coord_cols, data_coord_cols, [var], k, kernel, schema,
        metric=metric, radius=radius, res=res, id_col=id_col, salt=salt,
        first_replicate=first_replicate,
    )


def idw_tiled(
    data_df: DataFrame,
    grid_df: DataFrame,
    var: str,
    data_coord_cols: list[str],
    query_coord_cols: list[str],
    k: int,
    minneighbors: int,
    exponent: float,
    metric: Distance,
    radius: float | None,
    id_col: str,
    res: int = 6,
    salt: int = 0,
    first_replicate: str = "auto",
) -> DataFrame:
    """Tiled IDW: gathered-array form of `idw.idw_kernel` (same math/order)."""

    def kernel(pdf, qcoords, NC, vals, dist, valid):
        zn = vals[var]
        with np.errstate(divide="ignore", invalid="ignore"):
            w = np.where(valid, 1.0 / np.power(dist, exponent), 0.0)
        sw = w.sum(axis=1)
        mu = np.where(
            sw > 0, (w * np.where(valid, zn, 0.0)).sum(axis=1), np.nan
        )
        mu = mu / np.where(sw > 0, sw, 1.0)
        dmin = dist.min(axis=1)
        zero = (dist[:, 0] == 0.0) & valid[:, 0]
        mu = np.where(zero, zn[:, 0], mu)
        sigma = np.where(zero, 0.0, dmin)
        few = valid.sum(axis=1) < minneighbors
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(np.int64),
            var: np.where(few, np.nan, mu),
            f"{var}_distance": np.where(few, np.nan, sigma),
        })

    schema = f"{id_col} long, {var} double, {var}_distance double"
    return tiled_local_apply(
        grid_df, data_df.filter(f"{var} IS NOT NULL"),
        query_coord_cols, data_coord_cols, [var], k, kernel, schema,
        metric=metric, radius=radius, res=res, id_col=id_col, salt=salt,
        first_replicate=first_replicate,
    )


def idw_compositional_tiled(
    data_df: DataFrame,
    grid_df: DataFrame,
    var: str,
    data_coord_cols: list[str],
    query_coord_cols: list[str],
    k: int,
    minneighbors: int,
    exponent: float,
    metric: Distance,
    id_col: str,
    res: int = 6,
    salt: int = 0,
    first_replicate: str = "auto",
) -> DataFrame:
    """Tiled compositional IDW: the composition array column is expanded
    into D part columns + (D−1) ilr coordinate columns (computed with the
    SAME numpy `ilr` as the broadcast path, so the gathered values are
    bit-identical), then the scalar tiled machinery gathers them and the
    kernel runs the broadcast kernel's exact op order (weighted mean in
    ilr space, `ilr_inv`, zero-distance closure override)."""
    from .idw import closure, ilr, ilr_inv

    # D from one data row — a bounded driver action (first row only)
    first = data_df.filter(f"{var} IS NOT NULL").select(var).first()
    if first is None:
        raise ValueError("estimation requires data")
    D = len(first[0])
    ycols = [f"_y{j}" for j in range(D - 1)]
    ccols = [f"_c{j}" for j in range(D)]

    def expand(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            comp = np.stack(pdf[var].to_numpy())
            Y = ilr(comp)
            out = pdf[["data_id", *data_coord_cols]].copy()
            for j in range(D - 1):
                out[ycols[j]] = Y[:, j]
            for j in range(D):
                out[ccols[j]] = comp[:, j]
            yield out

    exp_schema = (
        f"data_id long, {data_coord_cols[0]} double, "
        f"{data_coord_cols[1]} double, "
        + ", ".join(f"{c} double" for c in ycols + ccols)
    )
    expanded = data_df.filter(f"{var} IS NOT NULL").select(
        "data_id", *data_coord_cols, var
    ).mapInPandas(expand, schema=exp_schema)

    def kernel(pdf, qcoords, NC, vals, dist, valid):
        Yd = np.stack([vals[c] for c in ycols], axis=-1)
        Cd = np.stack([vals[c] for c in ccols], axis=-1)
        with np.errstate(divide="ignore"):
            w = np.where(valid, 1.0 / np.power(dist, exponent), 0.0)
        finite_w = np.where(np.isfinite(w), w, 0.0)
        sw = finite_w.sum(axis=1, keepdims=True)
        sw = np.where(sw > 0, sw, 1.0)
        ym = np.einsum("nk,nkd->nd", finite_w / sw, Yd)
        out = ilr_inv(ym)
        zero = (dist[:, 0] == 0.0) & valid[:, 0]
        out[zero] = closure(Cd[:, 0][zero])
        few = valid.sum(axis=1) < minneighbors
        rows = [None if f else row.tolist() for f, row in zip(few, out)]
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(np.int64),
            var: rows,
        })

    schema = f"{id_col} long, {var} array<double>"
    return tiled_local_apply(
        grid_df, expanded, query_coord_cols, data_coord_cols,
        ycols + ccols, k, kernel, schema,
        metric=metric, radius=None, res=res, id_col=id_col, salt=salt,
        first_replicate=first_replicate,
    )


def lwr_tiled(
    data_df: DataFrame,
    grid_df: DataFrame,
    var: str,
    data_coord_cols: list[str],
    query_coord_cols: list[str],
    k: int,
    minneighbors: int,
    weightfun,
    metric: Distance,
    radius: float | None,
    id_col: str,
    res: int = 6,
    salt: int = 0,
    first_replicate: str = "auto",
) -> DataFrame:
    """Tiled LWR: gathered-array form of `lwr.lwr_kernel` (same math)."""

    def kernel(pdf, qcoords, NC, vals, dist, valid):
        B, kk = valid.shape
        vm = valid.astype(np.float64)
        fd = np.where(valid, dist, 0.0)
        dmax = fd.max(axis=1, keepdims=True)
        dmax = np.where(dmax > 0, dmax, 1.0)
        w = np.asarray(weightfun(fd / dmax), dtype=np.float64) * vm
        X = np.concatenate([np.ones((B, kk, 1)), NC], axis=2) * vm[:, :, None]
        zn = vals[var] * vm
        WX = w[:, :, None] * X
        G = np.einsum("bkp,bkq->bpq", X, WX)
        b_ = np.einsum("bkp,bk->bp", WX, zn)
        x0 = np.concatenate([np.ones((B, 1)), qcoords], axis=1)
        from .lwr import _wls_solve

        theta, Ginv_x0 = _wls_solve(G, b_, x0)
        mu = np.einsum("bp,bp->b", theta, x0)
        r = (WX @ Ginv_x0[:, :, None])[:, :, 0]
        sigma = np.sqrt(np.einsum("bk,bk->b", r, r))
        few = valid.sum(axis=1) < minneighbors
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(np.int64),
            var: np.where(few, np.nan, mu),
            f"{var}_variance": np.where(few, np.nan, sigma),
        })

    schema = f"{id_col} long, {var} double, {var}_variance double"
    return tiled_local_apply(
        grid_df, data_df.filter(f"{var} IS NOT NULL"),
        query_coord_cols, data_coord_cols, [var], k, kernel, schema,
        metric=metric, radius=radius, res=res, id_col=id_col, salt=salt,
        first_replicate=first_replicate,
    )
