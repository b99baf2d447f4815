"""Bucketed spatial index — the executor-side analogue of the reference's
kd-tree (``NearestNeighbors.jl`` via ``src/ui.jl:27``), built from scratch
in numpy (no scipy in the runtime).

Built once per broadcast payload (driver or lazily per worker process) and
queried inside ``mapInPandas`` batches.  Exact kNN with certification:

* data points land in a uniform bucket grid (CSR layout: ``starts`` +
  permutation) sized for ~``target`` points per bucket;
* queries are grouped by bucket — every query in a group shares one
  candidate set (the (2r+1)² bucket window), so each group is one small
  GEMM + argpartition over ~10² candidates instead of the full data set,
  keeping the working set cache-resident (brute force is memory-bandwidth
  bound and stops scaling across executor cores exactly there);
* float32 surrogate keys only *shortlist* a buffer of candidates; the
  final selection, ordering, and certification all use exact float64
  canonical distances (same op order as the SQL text → DuckDB oracle
  parity);
* a query is *certified* when its kth exact distance is ≤ a lower bound on
  the distance to any point outside the covered window.  The bound is the
  distance to the window's boundary curves — on the sphere: meridian great
  circles for the lon edges (periodic in Δλ, so wrap and over-pole paths
  are covered) and latitude circles for the lat edges (droppable when the
  edge sits on the data bbox: no data beyond it, and any wrapped path to
  other data crosses a meridian edge first).  Uncertified queries expand
  the ring (doubling) until certified or the window covers all data.

Ties break by original data position (== data id after `collect_points`'
canonical sort) — identical to the brute-force path and the SQL oracle.
"""

from __future__ import annotations

import numpy as np

from .distances import Distance, Haversine


class BucketIndex:
    def __init__(self, coords: np.ndarray, metric: Distance,
                 target: int = 32):
        from .distances import Anisotropic

        self.metric = metric
        self.coords = coords
        m, dim = coords.shape
        assert dim == 2, "bucket index is 2-D; use brute force otherwise"
        self.is_sphere = isinstance(metric, Haversine)
        # center the float64 ranking features on the data mean before the
        # float32 cast — large-magnitude planar coords AND tightly
        # clustered spherical unit vectors otherwise carry absolute key
        # noise past the shortlist slack (exact float64 distances always
        # use the ORIGINAL coords; see neighbors.topk_search)
        F64 = metric.rank_features(coords)
        self._fcenter = F64.mean(axis=0)
        self.features = (F64 - self._fcenter).astype(np.float32)
        # Anisotropic: bucket GEOMETRY (assignment + boundary margins)
        # lives in the scaled space, where the metric is plain Euclidean —
        # raw-coordinate margins would over-estimate the bound for
        # radii > 1 and falsely certify
        self._aniso = isinstance(metric, Anisotropic)
        geo = metric._scaled(coords) if self._aniso else coords

        lo = geo.min(axis=0)
        hi = geo.max(axis=0)
        span = np.maximum(hi - lo, 1e-9)
        # total bucket budget ≈ m/target, split by aspect but CLAMPED so
        # degenerate (near-collinear) data cannot explode one axis: the
        # span floor makes aspect ~1e11 for a single-latitude transect,
        # and unclamped nbx ≈ nb·√aspect allocated multi-MB start arrays
        # per worker; a 1-D strip of ≤ total buckets is the correct limit
        total = max(1, int(m / target))
        aspect = span[0] / span[1] if span[1] > 0 else 1.0
        self.nbx = int(np.clip(round(np.sqrt(total * aspect)), 1, total))
        self.nby = max(1, total // self.nbx)
        self.lo, self.hi, self.span = lo, hi, span
        self.wx = span[0] / self.nbx
        self.wy = span[1] / self.nby

        bx = np.clip(((geo[:, 0] - lo[0]) / span[0] * self.nbx).astype(np.int64), 0, self.nbx - 1)
        by = np.clip(((geo[:, 1] - lo[1]) / span[1] * self.nby).astype(np.int64), 0, self.nby - 1)
        bid = by * self.nbx + bx
        self.perm = np.argsort(bid, kind="stable")
        self.starts = np.searchsorted(
            bid[self.perm], np.arange(self.nbx * self.nby + 1)
        )

    # -- helpers ----------------------------------------------------------

    def _geo(self, q: np.ndarray) -> np.ndarray:
        return self.metric._scaled(q) if self._aniso else q

    def _query_bucket(self, q: np.ndarray) -> np.ndarray:
        q = self._geo(q)
        bx = np.clip(((q[:, 0] - self.lo[0]) / self.span[0] * self.nbx).astype(np.int64), 0, self.nbx - 1)
        by = np.clip(((q[:, 1] - self.lo[1]) / self.span[1] * self.nby).astype(np.int64), 0, self.nby - 1)
        return by * self.nbx + bx

    def _window_members(self, bx: int, by: int, r: int) -> np.ndarray:
        x0, x1 = max(0, bx - r), min(self.nbx - 1, bx + r)
        y0, y1 = max(0, by - r), min(self.nby - 1, by + r)
        rows = []
        for yy in range(y0, y1 + 1):
            s = self.starts[yy * self.nbx + x0]
            e = self.starts[yy * self.nbx + x1 + 1]
            if e > s:
                rows.append(self.perm[s:e])
        if not rows:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(rows) if len(rows) > 1 else rows[0]

    def _boundary_dist(self, q: np.ndarray, bx: int, by: int, r: int) -> np.ndarray:
        """Exact-metric lower bound on the distance from each query to any
        point OUTSIDE the (2r+1)² window.  Conservative; float64."""
        x_lo = self.lo[0] + max(0, bx - r) * self.wx
        x_hi = self.lo[0] + (min(self.nbx - 1, bx + r) + 1) * self.wx
        y_lo = self.lo[1] + max(0, by - r) * self.wy
        y_hi = self.lo[1] + (min(self.nby - 1, by + r) + 1) * self.wy
        open_left = bx - r <= 0      # window edge sits on the data bbox
        open_right = bx + r >= self.nbx - 1
        open_bot = by - r <= 0
        open_top = by + r >= self.nby - 1

        if not self.is_sphere:
            edges = []
            if not open_left:
                edges.append(q[:, 0] - x_lo)
            if not open_right:
                edges.append(x_hi - q[:, 0])
            if not open_bot:
                edges.append(q[:, 1] - y_lo)
            if not open_top:
                edges.append(y_hi - q[:, 1])
            if not edges:
                return np.full(q.shape[0], np.inf)
            return np.maximum(np.minimum.reduce(edges), 0.0)

        # sphere (lon/lat degrees, great-circle distance = R·angle):
        # lat edges — meridian distance R·|Δφ|; droppable at the bbox
        # (no data beyond, and wrapped paths must cross a meridian edge);
        # lon edges — distance to the FULL meridian great circle
        # R·asin(|cos φ · sin Δλ|): periodic in Δλ (wrap-safe) and the
        # poles lie on every meridian (over-pole-safe).  Never droppable:
        # beyond the bbox in longitude may wrap onto data.
        R = self.metric.radius
        phi = np.radians(q[:, 1])
        angles = []
        if not open_bot:
            angles.append(np.radians(np.maximum(q[:, 1] - y_lo, 0.0)))
        if not open_top:
            angles.append(np.radians(np.maximum(y_hi - q[:, 1], 0.0)))
        # lon edges are droppable once the window spans the full data-bbox
        # lon range: beyond it (in wrapped longitude) lies only data-free
        # space, so any data point outside the window is outside in LAT and
        # the lat edges above bound it.  Without this, near-pole queries
        # (cos φ → 0 kills the meridian bound) could never certify.
        if not (open_left and open_right):
            inside_x = (q[:, 0] >= x_lo) & (q[:, 0] <= x_hi)
            for edge in (x_lo, x_hi):
                a = np.arcsin(
                    np.abs(np.cos(phi) * np.sin(np.radians(q[:, 0] - edge)))
                )
                angles.append(np.where(inside_x, a, 0.0))
        if not angles:
            return np.full(q.shape[0], np.inf)
        return R * np.maximum(np.minimum.reduce(angles), 0.0)

    # -- main entry -------------------------------------------------------

    def topk(self, qcoords: np.ndarray, k: int, radius: float | None = None
             ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Same contract as `neighbors.topk_search`."""
        metric = self.metric
        n = qcoords.shape[0]
        m = self.coords.shape[0]
        k = min(k, m)
        out_idx = np.full((n, k), -1, dtype=np.int64)
        out_dist = np.full((n, k), np.inf, dtype=np.float64)
        if n == 0 or k == 0 or m == 0:
            return out_idx, out_dist, np.zeros(n, dtype=np.int64)

        bid = self._query_bucket(qcoords)
        order = np.argsort(bid, kind="stable")
        QF_all = (metric.rank_features(qcoords) - self._fcenter).astype(
            np.float32
        )
        bid_sorted = bid[order]
        gstarts = np.searchsorted(bid_sorted, np.arange(self.nbx * self.nby + 1))
        max_r = max(self.nbx, self.nby)
        buffer_extra = 16

        for b in np.unique(bid_sorted):
            qsel = order[gstarts[b]:gstarts[b + 1]]
            gbx, gby = int(b % self.nbx), int(b // self.nbx)
            pending = qsel
            r = 1
            while pending.size:
                cand = self._window_members(gbx, gby, r)
                full_cover = (
                    gbx - r <= 0 and gbx + r >= self.nbx - 1
                    and gby - r <= 0 and gby + r >= self.nby - 1
                )
                if full_cover:
                    # window == all data: the chunked brute path does this
                    # cache-optimally (and with identical tie semantics)
                    from .neighbors import topk_search

                    bi, bd, _ = topk_search(
                        qcoords[pending], self.coords, k, metric, radius
                    )
                    out_idx[pending] = bi
                    out_dist[pending] = bd
                    break
                if cand.size >= k:
                    from .neighbors import shortlist_topk

                    # chunk the query side so each key block stays cache-
                    # resident (same rationale as topk_search's qchunk)
                    qstep = max(32, 1_500_000 // cand.size)
                    still = []
                    for cs in range(0, pending.size, qstep):
                        psel = pending[cs:cs + qstep]
                        K = metric.rank_keys(QF_all[psel], self.features[cand])
                        nbuf = min(cand.size, k + buffer_extra)
                        sel, overflow = shortlist_topk(K, nbuf)
                        cidx = cand[sel]
                        # exact float64 distances on the shortlist
                        cd = metric.np_pairs(qcoords[psel], self.coords[cidx])
                        if radius is not None:
                            cd = np.where(cd <= radius, cd, np.inf)
                        o2 = np.lexsort((cidx, cd), axis=1)
                        cidx = np.take_along_axis(cidx, o2, axis=1)[:, :k]
                        cd = np.take_along_axis(cd, o2, axis=1)[:, :k]
                        for row, cols in overflow:
                            rcols = cand[cols]
                            rd = metric.np_pairs(
                                qcoords[psel[row]][None, :],
                                self.coords[rcols][None, :, :],
                            )[0]
                            if radius is not None:
                                rd = np.where(rd <= radius, rd, np.inf)
                            o = np.lexsort((rcols, rd))[:k]
                            cidx[row, : len(o)] = rcols[o]
                            cd[row, : len(o)] = rd[o]
                        kth = cd.max(axis=1)  # inf if any slot unfilled
                        # margins in GEO space (scaled for Anisotropic:
                        # there the metric is plain Euclidean, so the
                        # bound is exact)
                        bound = self._boundary_dist(
                            self._geo(qcoords[psel]), gbx, gby, r
                        )
                        done = kth <= bound * (1.0 - 1e-12)
                        if radius is not None:
                            # window provably covering the whole ball also
                            # certifies (even with < k in-radius neighbors)
                            done = done | (bound * (1.0 - 1e-12) >= radius)
                        if done.any():
                            dsel = psel[done]
                            valid = np.isfinite(cd[done])
                            out_idx[dsel] = np.where(valid, cidx[done], -1)
                            out_dist[dsel] = cd[done]
                        still.append(psel[~done])
                    pending = np.concatenate(still) if still else pending[:0]
                if pending.size:
                    if r >= max_r:
                        break  # unreachable: full_cover triggers first
                    # aggressive schedule: ring 1 → 4 → everything.  Each
                    # failed ring re-pays its GEMM, so a slow doubling walk
                    # costs more than jumping straight to the full window
                    r = 4 if r == 1 else max_r
        nvalid = np.isfinite(out_dist).sum(axis=1).astype(np.int64)
        return out_idx, out_dist, nvalid
