"""Break down the cold first kriging_pipeline call exactly as bench.py
times it: session + warm (untimed) then phase timers inside the pipeline.

Usage: python tools/profile_cold.py [sf_dir]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main():
    from geostatssolvers_jl_spark.session import get_spark

    spark = get_spark("profile", master="local[32]")

    # ---- bench.py's _warm, verbatim
    def noop(batches):
        import numpy  # noqa: F401
        import pandas as pd  # noqa: F401
        from geostatssolvers_jl_spark import neighbors  # noqa: F401
        for b in batches:
            yield b[["id"]]

    t0 = time.time()
    spark.range(32 * 4, numPartitions=32 * 2).mapInPandas(noop, "id long").count()
    print(f"warm             {time.time()-t0:7.3f}s")

    T0 = time.time()
    t0 = time.time()
    from geostatssolvers_jl_spark.distances import Haversine
    from geostatssolvers_jl_spark.grid import CartesianGrid
    from geostatssolvers_jl_spark.operators.kriging import (
        KrigingModel, solve_kriging,
    )
    from geostatssolvers_jl_spark.sources import pages as P
    from geostatssolvers_jl_spark.variogram import GaussianVariogram
    print(f"driver imports   {time.time()-t0:7.3f}s")

    t0 = time.time()
    pg = P.geocode(P.load_pages(spark, SF_DIR), res=6)
    pagesdf = pg.selectExpr(
        "doc_id AS data_id", "lon", "lat",
        "CAST(length(text) AS DOUBLE) AS z", "cell",
    )
    grid = CartesianGrid.from_extent((-180.0, -90.0), (180.0, 90.0), (360, 180))
    gdf = grid.spark_df(spark, scramble=True, num_partitions=32)
    print(f"plan build       {time.time()-t0:7.3f}s")

    # ---- inside solve_kriging, phase by phase
    from geostatssolvers_jl_spark.neighbors import collect_points

    t0 = time.time()
    data = collect_points(
        pagesdf.filter("z IS NOT NULL"), ["lon", "lat"], ["z"],
        id_col="data_id",
    )
    print(f"collect_points   {time.time()-t0:7.3f}s  (n={data.n})")

    t0 = time.time()
    sol = solve_kriging(
        data, gdf,
        model=KrigingModel(variogram=GaussianVariogram(range=2000.0, sill=1e4)),
        data_coord_cols=["lon", "lat"], maxneighbors=8,
        metric=Haversine(6371.0),
        strategy="local-broadcast",
    )
    print(f"solve plan       {time.time()-t0:7.3f}s")

    t0 = time.time()
    n = sol.count()
    print(f"count (job)      {time.time()-t0:7.3f}s  (rows={n})")
    print(f"TOTAL pipeline   {time.time()-T0:7.3f}s")

    # second call — the warm number
    t0 = time.time()
    sol2 = solve_kriging(
        pagesdf, gdf,
        model=KrigingModel(variogram=GaussianVariogram(range=2000.0, sill=1e4)),
        data_coord_cols=["lon", "lat"], maxneighbors=8,
        metric=Haversine(6371.0),
        strategy="local-broadcast",
    )
    sol2.count()
    print(f"warm pipeline    {time.time()-t0:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
