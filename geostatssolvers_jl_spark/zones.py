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


def convex_pip_expr(verts, lon: str = "lon", lat: str = "lat") -> str:
    """Half-plane conjunction for one convex CCW polygon — the single
    source for every PIP site (the contract layer imports this; an
    inline copy diverged once already)."""
    conds = []
    for i in range(len(verts)):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % len(verts)]
        conds.append(
            f"(({x2!r} - {x1!r}) * ({lat} - {y1!r}) "
            f"- ({y2!r} - {y1!r}) * ({lon} - {x1!r})) >= 0.0"
        )
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


def zonal_stats_sql(cells_rel: str, zones, value: str = "z",
                    lon: str = "cx", lat: str = "cy",
                    round_to: int = 6) -> str:
    """Per-zone statistics over a raster relation carrying cell centroids
    and a value column: (zone_id, n_cells, mean_v, min_v, max_v, sum_v).
    Cells outside every zone are excluded (zonal semantics); zones with
    no cells emit no row.  Float aggregates are rounded + ``+ 0.0``
    normalized on both engines (the -0.0 contract rule)."""
    za = zone_assign_expr(zones, lon, lat)
    r = round_to
    # the inner projection ALIASES the value so ``value`` may be any
    # expression (qualified column, arithmetic), not just a bare name
    return (
        f"SELECT zone_id, CAST(count(*) AS BIGINT) AS n_cells, "
        f"round(avg(_v), {r}) + 0.0 AS mean_v, "
        f"round(min(_v), {r}) + 0.0 AS min_v, "
        f"round(max(_v), {r}) + 0.0 AS max_v, "
        f"round(sum(_v), {r}) + 0.0 AS sum_v "
        f"FROM (SELECT {za} AS zone_id, {value} AS _v "
        f"FROM {cells_rel} _c) _z "
        f"WHERE zone_id IS NOT NULL GROUP BY zone_id"
    )
