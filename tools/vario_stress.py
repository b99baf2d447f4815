"""Scale stress for the tiled empirical-variogram pair join.

200k uniform points, maxlag sized so the ring join's candidate space is
~1.8e7 pairs (vs 2e10 brute — the O(n²) form is not runnable at this n).
Correctness at this shape is anchored separately by the gate entry's
brute-force oracle at sf0.01 and `tests/test_variography.py`'s
tiled≡brute property; here we (a) re-check losslessness on a 5k
subsample against numpy brute force and (b) time the full tiled run.

Usage: python tools/vario_stress.py [n] [maxlag]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

from geostatssolvers_jl_spark.session import get_spark
from geostatssolvers_jl_spark.variography import (
    empirical_variogram,
    fit_variogram,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    maxlag = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    spark = get_spark("vario-stress", master="local[32]",
                      shuffle_partitions=64)

    rng = np.random.default_rng(99)
    pts = pd.DataFrame({
        "data_id": np.arange(n),
        "x": rng.uniform(0.0, 1000.0, n),
        "y": rng.uniform(0.0, 1000.0, n),
        "z": rng.integers(0, 1000, n).astype(float),
    })

    # (a) losslessness re-check: 5k subsample, numpy brute force
    sub = pts.iloc[:: max(1, n // 5000)].reset_index(drop=True)
    sdf = spark.createDataFrame(sub)
    emp_sub = empirical_variogram(spark, sdf, maxlag, 10) \
        .toPandas().sort_values("bin").reset_index(drop=True)
    xy = sub[["x", "y"]].to_numpy()
    z = sub["z"].to_numpy()
    iu = np.triu_indices(len(sub), 1)
    d = np.sqrt(((xy[iu[0]] - xy[iu[1]]) ** 2).sum(1))
    dz = z[iu[0]] - z[iu[1]]
    m = (d > 0) & (d < maxlag)
    bins = np.minimum(9, np.floor(d[m] / (maxlag / 10)).astype(int))
    # totals FIRST: per-row checks alone would miss a bin the tiled
    # join dropped entirely (it would simply be absent from emp_sub)
    assert int(emp_sub.npairs.sum()) == int(m.sum()), \
        (int(emp_sub.npairs.sum()), int(m.sum()))
    for _, row in emp_sub.iterrows():
        sel = bins == row.bin
        assert int(sel.sum()) == int(row.npairs), (row.bin, sel.sum(),
                                                   row.npairs)
        g = (dz[m][sel] ** 2).sum() / (2 * sel.sum())
        assert abs(round(g, 6) - row.gamma) < 1e-9, (row.bin, g, row.gamma)
    print(f"subsample ({len(sub)} pts): tiled == numpy brute, "
          f"{int(emp_sub.npairs.sum())} pairs")

    # (b) full-n tiled timing (cold per call: fresh view each time)
    full = spark.createDataFrame(pts).repartition(64)
    times = []
    for _ in range(3):
        t0 = time.time()
        emp = empirical_variogram(spark, full, maxlag, 10)
        rows = emp.collect()
        times.append(time.time() - t0)
    npairs = sum(r["npairs"] for r in rows)
    fitted = fit_variogram(rows)
    print(f"n={n} maxlag={maxlag}: {npairs:,} pairs binned, "
          f"times={[round(t, 2) for t in times]} s "
          f"(min {min(times):.2f}), fit={type(fitted).__name__}"
          f"(range={fitted.range:.2f})")
    brute_pairs = n * (n - 1) // 2
    print(f"brute-force pair space would be {brute_pairs:,} "
          f"({brute_pairs / max(npairs, 1):.0f}x the candidates the "
          f"tiled join touches)")


if __name__ == "__main__":
    main()
