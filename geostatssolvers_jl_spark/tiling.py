"""Hierarchical lat/lon tile index (H3/S2-style, pure arithmetic).

The north rule mandates H3/S2-style tiling of geocoded web pages with
vectorized cell encoding.  The container has no `h3` wheel, so we implement
an equirectangular quadtree cell id from scratch: at resolution ``r`` the
world ( lon ∈ [-180,180), lat ∈ [-90,90) ) is a 2^r × 2^r grid; a cell id
packs ``(resolution, ty, tx)`` into one BIGINT.  Properties needed by the
engine and provided here:

* **vectorized encode** — pure `floor` arithmetic, runs JVM-side inside
  whole-stage codegen (`cell_expr`), in numpy inside pandas UDFs
  (`cell_np`), and verbatim in DuckDB for the correctness oracle.
* **parent/child** — shift tx,ty by one level (`parent_expr`).
* **k-ring** — the (2k+1)² neighbor cells of a cell, with lon wraparound;
  used for cell-ring-expansion kNN candidate generation
  (SURVEY.md §2.3 J1/J2).
* **cell size bound** — max diagonal of a cell at a latitude, which
  certifies exact-kNN termination of ring expansion.

Layout of the id:  ``cell = (r << 58) | (ty << 29) | tx`` with
``tx, ty < 2^29``.  All ops stay in signed-64 range.  **Contract:
r ≤ MAX_RES = 24** — the shared-dialect SQL DECODE of ty is a double
floor-division (``floor((cell % 2^58) / 2^29)``: Spark and DuckDB have no
common integer-division spelling), and ``ty·2^29 + tx`` must stay inside
the 53-bit double mantissa for it to be exact; res 24 is the last exact
level (≈ 2.4 m cells at the equator — far below any practical tiling).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0


MAX_RES = 24  # SQL ty-decode exactness bound, see module docstring


def nside(res: int) -> int:
    if res > MAX_RES:
        raise ValueError(
            f"tile res {res} > {MAX_RES}: the shared-dialect SQL cell "
            f"decode is only exact through res {MAX_RES}"
        )
    return 1 << res


def tx_from_cell_expr(cell: str) -> str:
    """Shared-dialect tx decode of a packed cell id."""
    return f"(({cell}) % {1 << 29})"


def ty_from_cell_expr(cell: str) -> str:
    """Shared-dialect ty decode (double floor-division — exact only for
    res ≤ MAX_RES, enforced at encode time by `nside`)."""
    return f"(CAST(floor((({cell}) % {1 << 58}) / {1 << 29}) AS BIGINT))"



def _tx_expr(lon: str, res: int) -> str:
    n = nside(res)
    # identical text parses in Spark SQL and DuckDB; clamp guards lon=180.
    return (
        f"least(CAST({n - 1} AS BIGINT), greatest(CAST(0 AS BIGINT), "
        f"CAST(floor((({lon}) + 180.0) / 360.0 * {n}) AS BIGINT)))"
    )


def _ty_expr(lat: str, res: int) -> str:
    n = nside(res)
    return (
        f"least(CAST({n - 1} AS BIGINT), greatest(CAST(0 AS BIGINT), "
        f"CAST(floor((({lat}) + 90.0) / 180.0 * {n}) AS BIGINT)))"
    )


def cell_expr(lon: str, lat: str, res: int) -> str:
    """SQL expression (Spark + DuckDB dialect subset) for the packed cell id."""
    r_bits = res * (1 << 58)
    return f"({r_bits} + {_ty_expr(lat, res)} * {1 << 29} + {_tx_expr(lon, res)})"


def parent_expr(cell: str, res: int, parent_res: int) -> str:
    """Parent cell id at a coarser resolution (pure arithmetic on the id)."""
    shift = res - parent_res
    assert shift >= 0
    d = 1 << shift
    tx = tx_from_cell_expr(cell)
    ty = ty_from_cell_expr(cell)
    r_bits = parent_res * (1 << 58)
    return (
        f"({r_bits} + CAST(floor({ty} / {d}) AS BIGINT) * {1 << 29}"
        f" + CAST(floor({tx} / {d}) AS BIGINT))"
    )


# ---------------------------------------------------------------- numpy side


def cell_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    n = nside(res)
    tx = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    ty = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    return (res << 58) + (ty << 29) + tx


def unpack_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    res = cell >> 58
    ty = (cell >> 29) & ((1 << 29) - 1)
    tx = cell & ((1 << 29) - 1)
    return res, ty, tx


def ring_np(cell: np.ndarray, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k of each input cell
    (the (2k+1)^2 'disk'), vectorized; lon wraps, lat offsets falling
    outside [0, n) are MASKED to -1 (never clamped — clamping would emit
    the same top/bottom-row cell twice, and a duplicated halo cell makes
    the tiled kNN join count one data row at two ranks, silently dropping
    the true kth neighbor for polar-row queries).

    Returns shape ``(len(cell), (2k+1)**2)``; invalid entries are -1.
    """
    res, ty, tx = unpack_np(np.asarray(cell, dtype=np.int64))
    r = int(res[0]) if len(res) else 0
    n = nside(r)
    offs = np.arange(-k, k + 1)
    dx, dy = np.meshgrid(offs, offs)
    dx, dy = dx.ravel(), dy.ravel()
    ntx = (tx[:, None] + dx[None, :]) % n
    nty = ty[:, None] + dy[None, :]
    valid = (nty >= 0) & (nty <= n - 1)
    out = (r << 58) + (nty << 29) + ntx
    return np.where(valid, out, -1)


def cell_bounds_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) of each cell."""
    res, ty, tx = unpack_np(np.asarray(cell, dtype=np.int64))
    n = np.left_shift(1, res).astype(np.float64)
    lon0 = tx / n * 360.0 - 180.0
    lat0 = ty / n * 180.0 - 90.0
    return lon0, lat0, lon0 + 360.0 / n, lat0 + 180.0 / n


def ring_table(spark, cells_df, k: int = 1, cell_col: str = "cell"):
    """DataFrame of UNIQUE (cell, neighbor) pairs for the k-disk of each
    distinct cell — the candidate-cell side of the ring-expansion kNN join.
    Runs as a vectorized mapInPandas (Arrow batches, no per-row Python).

    Invalid lat offsets are dropped (not clamped) and lon-wrap collisions
    (2k+1 ≥ n) are dedup'd, so a data row replicated through this table
    lands in each candidate cell exactly once — required for the exactness
    of the window top-k downstream (no rank-occupying duplicates)."""
    ksz = (2 * k + 1) ** 2

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            c = pdf[cell_col].to_numpy(np.int64)
            nb = ring_np(c, k)
            out = pd.DataFrame(
                {cell_col: np.repeat(c, ksz), "neighbor": nb.ravel()}
            )
            out = out[out["neighbor"] >= 0].drop_duplicates()
            yield out

    distinct = cells_df.select(cell_col).distinct()
    return distinct.mapInPandas(gen, schema=f"{cell_col} long, neighbor long")
