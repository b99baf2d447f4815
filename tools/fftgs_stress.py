"""FFTGS conditional stress — dense conditioning × large ensemble, the
shape that broke the former driver-side residual matrix (a collected
nreals × ndata broadcast).  Residuals are now a distributed
(real_id, cell_id, resid) relation gathered per realization and
shuffle-joined to the (real × tile) simulation units, so the driver
never holds anything larger than the snapped conditioning set.

Default: 512×512 grid, ~100k conditioning cells, 64 realizations,
4×4 tiles.  Verifies hard-data exactness on a sample of realizations
and prints one JSON line.

Usage: python tools/fftgs_stress.py [side] [n_data] [nreals]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ND = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
NREALS = int(sys.argv[3]) if len(sys.argv) > 3 else 64


def main():
    import numpy as np

    from pyspark.sql import functions as F

    from geostatssolvers_jl_spark.grid import CartesianGrid
    from geostatssolvers_jl_spark.session import get_spark
    from geostatssolvers_jl_spark.simulation.fftgs import solve_fftgs
    from geostatssolvers_jl_spark.variogram import GaussianVariogram

    spark = get_spark("fftgs-stress", master="local[32]",
                      extra_conf={"spark.driver.memory": "12g"})
    grid = CartesianGrid((SIDE, SIDE), (0.5, 0.5), (1.0, 1.0))
    # deterministic pseudo-random distinct cells → one datum per cell
    data = spark.range(ND).selectExpr(
        "id AS data_id",
        f"CAST((id * 2654435761) % {SIDE * SIDE} AS BIGINT) AS cell",
    ).selectExpr(
        "data_id",
        f"0.5 + CAST(cell % {SIDE} AS DOUBLE) AS x",
        f"0.5 + CAST(cell DIV {SIDE} AS DOUBLE) AS y",
        "CAST((data_id * 97) % 1000 AS DOUBLE) / 100.0 AS z",
    )
    t0 = time.time()
    sol = solve_fftgs(
        spark, grid, nreals=NREALS,
        variogram=GaussianVariogram(range=4.0),
        data=data, var="z", maxneighbors=8, krig_radius=24.0,
        seed=11, tile_dims=(4, 4),
    )
    n_rows = sol.count()
    wall = time.time() - t0

    # hard-data exactness on a sample of realizations (fft.jl:190): the
    # engine snaps data to cells with a deterministic min-value survivor,
    # so compare against that reduction
    snap = grid.snap_cell_expr(("x", "y"), "cell_id")
    dcells = (
        data.selectExpr(f"{snap} AS cell_id", "z AS zdat")
        .groupBy("cell_id").agg(F.min("zdat").alias("zdat"))
    )
    sample = sol.filter(F.col("real_id").isin([0, NREALS // 2, NREALS - 1]))
    joined = sample.join(dcells, "cell_id")
    bad = joined.filter(F.abs(F.col("z") - F.col("zdat")) > 1e-9).count()
    checked = joined.count()

    print(json.dumps({
        "metric": "fftgs conditional stress wall",
        "value": round(wall, 1),
        "unit": "sec",
        "side": SIDE,
        "grid_cells": SIDE * SIDE,
        "n_data_rows": ND,
        "n_cond_cells": dcells.count(),
        "nreals": NREALS,
        "rows_out": n_rows,
        "exactness_checked": checked,
        "exactness_violations": bad,
        "driver_residual_matrix": None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
