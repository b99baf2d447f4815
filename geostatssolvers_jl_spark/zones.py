"""Raster ↔ vector operators: point-in-polygon, zone assignment, zonal
statistics.

North-rule coverage: "spatial-join + tiling engine (H3/S2 index,
point-in-polygon, kNN, raster↔vector)" — the raster→vector direction is
zonal aggregation (per-polygon statistics over grid cells or a solved
raster), the vector→raster direction is the existing snap/tile-assign
projections (`grid.snap_cell_expr`, `tiling.cell_expr`).

Everything here is PURE ARITHMETIC SQL (half-plane tests, CASE, groupBy)
— identical text on Spark and DuckDB, whole-stage-codegen on Spark, no
UDFs; at 100 TB a zonal pass is one scan + one aggregation keyed on the
zone id (the zone list is a literal in the plan — bounded; thousands of
zones still fold into one CASE chain or, beyond that, a broadcast join
against a zone table, which `zone_assign_expr` callers can switch to
without changing the aggregation).

Polygons are CONVEX, vertices counter-clockwise; containment is the
conjunction of per-edge half-plane tests (boundary inclusive).  Concave
zones decompose into convex parts sharing one zone id — the CASE chain
ORs naturally through first-match semantics.
"""

from __future__ import annotations


def _canonical_edge(x1, y1, x2, y2):
    """Order an edge's endpoints lexicographically, returning
    ``(ax, ay, bx, by, sign)`` with ``sign = +1`` if the input direction
    was already canonical, else ``-1``.

    Why: two convex parts sharing an edge (the internal diagonals of a
    triangulated polygon; adjacent lattice zones) traverse it in
    OPPOSITE directions.  Evaluated naively, the two half-plane cross
    products are computed about different origin vertices, so in
    floating point they are NOT exact negations — a point numerically
    ON the shared edge can land strictly outside BOTH parts (measured:
    128 of 200k on-diagonal samples for a skewed quad), silently
    dropping raster cells from the zone.  Canonicalizing makes both
    parts evaluate the IDENTICAL expression (one FP value E) and test
    ``E >= 0`` on one side, ``E <= 0`` on the other — at least one
    always holds, so the shared edge never leaks."""
    if (x1, y1) <= (x2, y2):
        return x1, y1, x2, y2, 1
    return x2, y2, x1, y1, -1


def _edge_cond_sql(x1, y1, x2, y2, lon: str, lat: str) -> str:
    ax, ay, bx, by, sgn = _canonical_edge(x1, y1, x2, y2)
    e = (f"(({bx!r} - {ax!r}) * ({lat} - {ay!r}) "
         f"- ({by!r} - {ay!r}) * ({lon} - {ax!r}))")
    return f"{e} >= 0.0" if sgn > 0 else f"{e} <= 0.0"


def convex_pip_expr(verts, lon: str = "lon", lat: str = "lat") -> str:
    """Half-plane conjunction for one convex CCW polygon — the single
    source for every PIP site (the contract layer imports this; an
    inline copy diverged once already).  Edges are evaluated in
    CANONICAL endpoint order (see `_canonical_edge`) so parts sharing
    an edge cover it gaplessly in floating point."""
    conds = []
    for i in range(len(verts)):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % len(verts)]
        conds.append(_edge_cond_sql(x1, y1, x2, y2, lon, lat))
    return "(" + " AND ".join(conds) + ")"


def zone_assign_expr(zones, lon: str = "lon", lat: str = "lat") -> str:
    """CASE chain assigning each point its zone id — FIRST matching zone
    wins (deterministic under overlap), NULL outside every zone.
    ``zones``: ordered list of (zone_id, verts)."""
    arms = " ".join(
        f"WHEN {convex_pip_expr(v, lon, lat)} THEN {int(zid)}"
        for zid, v in zones
    )
    return f"CASE {arms} ELSE NULL END"


def _zonal_rollup_sql(round_to: int) -> str:
    """The shared five-aggregate zonal SELECT (count/mean/min/max/sum
    over ``(zone_id, _v)`` rows) — ONE source for the CASE form and the
    join form so the -0.0 normalization / rounding contract cannot
    diverge between them."""
    r = round_to
    return (
        f"SELECT zone_id, CAST(count(*) AS BIGINT) AS n_cells, "
        f"round(avg(_v), {r}) + 0.0 AS mean_v, "
        f"round(min(_v), {r}) + 0.0 AS min_v, "
        f"round(max(_v), {r}) + 0.0 AS max_v, "
        f"round(sum(_v), {r}) + 0.0 AS sum_v"
    )


def zonal_stats_sql(cells_rel: str, zones, value: str = "z",
                    lon: str = "cx", lat: str = "cy",
                    round_to: int = 6) -> str:
    """Per-zone statistics over a raster relation carrying cell centroids
    and a value column: (zone_id, n_cells, mean_v, min_v, max_v, sum_v).
    Cells outside every zone are excluded (zonal semantics); zones with
    no cells emit no row.  Float aggregates are rounded + ``+ 0.0``
    normalized on both engines (the -0.0 contract rule)."""
    za = zone_assign_expr(zones, lon, lat)
    # the inner projection ALIASES the value so ``value`` may be any
    # expression (qualified column, arithmetic), not just a bare name
    return (
        f"{_zonal_rollup_sql(round_to)} "
        f"FROM (SELECT {za} AS zone_id, {value} AS _v "
        f"FROM {cells_rel} _c) _z "
        f"WHERE zone_id IS NOT NULL GROUP BY zone_id"
    )


# ------------------------------------------------- concave decomposition


def signed_area(verts) -> float:
    s = 0.0
    for i in range(len(verts)):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % len(verts)]
        s += x1 * y2 - x2 * y1
    return 0.5 * s


def _cross(o, a, b) -> float:
    return ((a[0] - o[0]) * (b[1] - o[1])
            - (a[1] - o[1]) * (b[0] - o[0]))


def triangulate_polygon(verts) -> list:
    """Ear clipping (the classic O(n²) method — public knowledge, e.g.
    ear-clipping triangulation surveys) for a SIMPLE polygon without
    holes or repeated vertices, any orientation → list of CCW triangles
    whose inclusive union is exactly the inclusive polygon.  Blocking
    follows the classic rule: only REFLEX vertices can block an ear,
    and they block INCLUSIVELY (a reflex vertex exactly on the
    candidate diagonal invalidates the ear — clipping it would leave a
    non-simple ring that over-covers; found by the collinear+reflex
    fixture).  Collinear chain vertices are non-reflex, so straight
    runs still clip; zero-area (fully collinear) ears are dropped."""
    verts = [tuple(map(float, v)) for v in verts]
    if len(verts) < 3:
        raise ValueError("polygon needs at least 3 vertices")
    if signed_area(verts) < 0:
        verts.reverse()
    idx = list(range(len(verts)))
    tris = []

    def _blocked(a, b, c, skip):
        n = len(idx)
        for pos in range(n):
            j = idx[pos]
            if j in skip:
                continue
            pj, nj = verts[idx[pos - 1]], verts[idx[(pos + 1) % n]]
            if _cross(pj, verts[j], nj) >= 0:
                continue  # convex/collinear vertices cannot block
            p = verts[j]
            if (_cross(a, b, p) >= 0 and _cross(b, c, p) >= 0
                    and _cross(c, a, p) >= 0):
                return True
        return False

    while len(idx) > 3:
        n = len(idx)
        for k in range(n):
            i0, i1, i2 = idx[k - 1], idx[k], idx[(k + 1) % n]
            a, b, c = verts[i0], verts[i1], verts[i2]
            if _cross(a, b, c) <= 0:       # reflex or collinear corner
                continue
            if _blocked(a, b, c, (i0, i1, i2)):
                continue
            tris.append((a, b, c))
            idx.pop(k)
            break
        else:
            raise ValueError(
                "ear clipping found no ear — the polygon must be simple "
                "(non-self-intersecting, no repeated vertices)"
            )
    a, b, c = (verts[i] for i in idx)
    if _cross(a, b, c) > 0:
        tris.append((a, b, c))
    return tris


def decompose_zones(zones) -> list:
    """(zone_id, simple polygon) list → (zone_id, convex triangle) list,
    zone order preserved (so `zone_assign_expr`'s first-match overlap
    semantics are unchanged) — the bridge that makes every PIP/zonal
    site accept CONCAVE zones.  Convex inputs pass through untouched
    when already triangles; larger convex polygons triangulate too
    (identical containment, a few more CASE arms)."""
    out = []
    for zid, verts in zones:
        for tri in triangulate_polygon(verts):
            out.append((zid, tri))
    return out


# --------------------------------------------- zone-table broadcast form


def zone_edges_rows(zones, tile_size: float | None = None) -> list:
    """Flatten (zone_id, simple polygon) zones into the EDGE relation the
    join form consumes: one row per directed edge of each convex part,
    ``(priority, zone_id, part_id, edge_no, n_edges, x1, y1, x2, y2,
    sgn, xmin, xmax, ymin, ymax)``.  ``priority`` is the zone's list
    position (first-match overlap semantics); the bbox columns
    replicate the part's bounding box onto each edge so the join can
    range-prune before the half-plane count.  Endpoints are stored in
    CANONICAL order with ``sgn`` carrying the part's traversal
    direction (see `_canonical_edge` — closes the FP gap on edges
    shared between parts); ``edge_no`` identifies the edge within its
    part so the half-plane count is DISTINCT-based and immune to row
    replication.

    ``tile_size``: the SCALE path.  Each edge row is replicated once per
    covering tile of the part's bbox (two extra ``tile_x, tile_y``
    columns) so the cells⋈edges join becomes a hash EQUI-join on the
    tile instead of a nested-loop bbox scan — O(cells) with a bounded
    fan-out, the difference between 10 and 10,000 zones.  A cell joins
    exactly the one tile it lies in, so the per-(cell, part) edge count
    is unchanged.  Pick ``tile_size`` of the order of a typical zone
    diameter (replication = ceil(bbox/tile + 1)² rows per part)."""
    rows = []
    for prio, (zid, verts) in enumerate(zones):
        for part_id, tri in enumerate(triangulate_polygon(verts)):
            xs = [v[0] for v in tri]
            ys = [v[1] for v in tri]
            bb = (min(xs), max(xs), min(ys), max(ys))
            edges = []
            for i in range(len(tri)):
                x1, y1 = tri[i]
                x2, y2 = tri[(i + 1) % len(tri)]
                ax, ay, bx, by, sgn = _canonical_edge(x1, y1, x2, y2)
                edges.append((prio, int(zid), part_id, i, len(tri),
                              ax, ay, bx, by, sgn) + bb)
            if tile_size is None:
                rows.extend(edges)
            else:
                import math

                tx0 = math.floor(bb[0] / tile_size)
                tx1 = math.floor(bb[1] / tile_size)
                ty0 = math.floor(bb[2] / tile_size)
                ty1 = math.floor(bb[3] / tile_size)
                for tx in range(tx0, tx1 + 1):
                    for ty in range(ty0, ty1 + 1):
                        rows.extend(e + (tx, ty) for e in edges)
    return rows


ZONE_EDGES_SCHEMA = (
    "priority int, zone_id int, part_id int, edge_no int, n_edges int, "
    "x1 double, y1 double, x2 double, y2 double, sgn int, "
    "xmin double, xmax double, ymin double, ymax double"
)
ZONE_EDGES_TILED_SCHEMA = ZONE_EDGES_SCHEMA + ", tile_x long, tile_y long"


def zone_edges_values_sql(zones) -> str:
    """The edge relation as an inline VALUES list (oracle/test form —
    the Spark path registers a broadcast DataFrame instead)."""
    rows = ", ".join(
        "(" + ", ".join(repr(v) for v in r) + ")"
        for r in zone_edges_rows(zones)
    )
    return (
        f"(SELECT * FROM (VALUES {rows}) _e(priority, zone_id, part_id, "
        f"edge_no, n_edges, x1, y1, x2, y2, sgn, "
        f"xmin, xmax, ymin, ymax))"
    )


def zonal_stats_join_sql(cells_rel: str, edges_rel: str,
                         value: str = "z", id_col: str = "cell_id",
                         lon: str = "cx", lat: str = "cy",
                         round_to: int = 6,
                         tile_size: float | None = None) -> str:
    """Zonal statistics with the zone list as a RELATION instead of a
    CASE chain — the >thousands-of-zones form the CASE docstring above
    promises.  Same output schema and overlap semantics as
    `zonal_stats_sql` (first zone in list order wins; boundary
    inclusive; cells outside every zone excluded).

    Shape at scale: cells ⋈ edges on a bounding-box RANGE condition
    (with the edge table broadcast this is a broadcast-nested-loop scan
    that prunes almost all zones per cell), then one aggregation per
    (cell, candidate part) counting passed half-planes, a first-match
    window, and the zonal rollup — every post-join step keys on the
    cell id, so the 100-TB cost is one raster scan against a broadcast
    zone table.  Identical text runs on DuckDB (the broadcast hint is a
    comment there).

    ``tile_size`` (the 10k-zone path): requires ``edges_rel`` built
    with the same ``tile_size`` (tile-replicated rows) — the join gains
    a hash-equi key ``floor(coord / tile_size) = tile`` and the bbox
    test shrinks to a residual filter; a broadcast HASH join instead of
    a nested loop, O(cells · fanout) not O(cells · zones).

    Mismatch safety: the half-plane count is DISTINCT on ``edge_no``,
    so an untiled query over a TILE-REPLICATED edge relation still
    returns correct values (each (cell, part) group just carries
    replica rows); the reverse mismatch (tiled query over untiled
    edges) fails loudly at analysis on the missing ``tile_x`` column.
    The remaining foot-gun — tiled edges at one size, query at a
    DIFFERENT size — cannot be detected from SQL text; pair the two
    ``tile_size`` arguments from one variable."""
    r = round_to
    if tile_size is None:
        tile_cond = ""
    else:
        ts = float(tile_size)
        tile_cond = (
            f"CAST(floor(c._x / {ts!r}) AS BIGINT) = e.tile_x "
            f"AND CAST(floor(c._y / {ts!r}) AS BIGINT) = e.tile_y AND "
        )
    return f"""
WITH _c AS (
  SELECT {id_col} AS _pid, {lon} AS _x, {lat} AS _y, {value} AS _v
  FROM {cells_rel} _cc
), _m AS (
  SELECT /*+ BROADCAST(e) */ c._pid, c._v, e.priority, e.zone_id,
         e.part_id
  FROM _c c JOIN {edges_rel} e
    ON {tile_cond}c._x >= e.xmin AND c._x <= e.xmax
   AND c._y >= e.ymin AND c._y <= e.ymax
  GROUP BY c._pid, c._v, e.priority, e.zone_id, e.part_id, e.n_edges
  HAVING count(DISTINCT CASE
           WHEN e.sgn * ((e.x2 - e.x1) * (c._y - e.y1)
                         - (e.y2 - e.y1) * (c._x - e.x1)) >= 0.0
           THEN e.edge_no END) = e.n_edges
), _best AS (
  SELECT _pid, _v, zone_id,
         ROW_NUMBER() OVER (PARTITION BY _pid
                            ORDER BY priority, part_id) AS _rk
  FROM _m
)
{_zonal_rollup_sql(r)}
FROM _best WHERE _rk = 1 GROUP BY zone_id"""
