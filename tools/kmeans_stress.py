"""Distributed k-means scale point: 100k × 64-dim synthetic clustered
embeddings, planner-style k, a few Lloyd iterations — evidence that
`kmeans_fit_spark`'s per-iteration cost is one corpus scan + one
model-sized shuffle (partitions × k × (d+1) partial rows), never a
corpus-sized driver artifact.

Run: python tools/kmeans_stress.py [n_vectors] [k] [iters]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DIM = 64


def synth_embeddings(spark, n: int, n_blobs: int = 32):
    """Deterministic blobs: vector i belongs to blob i%n_blobs; each
    coordinate = blob signature ± small hash jitter.  Pure SQL, no
    driver data."""
    coords = ", ".join(
        f"CAST(pmod(hash(id % {n_blobs} * 131 + {d}), 19) - 9 AS DOUBLE) "
        f"+ CAST(pmod(hash(id * 31 + {d}), 1000) AS DOUBLE) / 2000.0"
        for d in range(DIM)
    )
    return spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(array({coords}), x -> CAST(x AS FLOAT)) AS embedding",
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from geostatssolvers_jl_spark.session import get_spark
    from geostatssolvers_jl_spark.webtext.clustering import kmeans_fit_spark

    spark = get_spark("kmeans-stress", master="local[32]")
    emb = synth_embeddings(spark, n).repartition(64).persist()
    emb.count()

    t0 = time.time()
    res1 = kmeans_fit_spark(spark, emb, n_centroids=k, iters=1)
    t1 = time.time() - t0

    t0 = time.time()
    res = kmeans_fit_spark(spark, emb, n_centroids=k, iters=iters)
    tN = time.time() - t0

    assert int(res.sizes.sum()) == n, (res.sizes.sum(), n)
    assert res.inertia <= res1.inertia + 1e-6, (res.inertia, res1.inertia)
    print(
        f"n={n} k={k} d={DIM}: 1 iter {t1:.1f} s, {iters} iters {tN:.1f} s "
        f"({tN / iters:.1f} s/iter marginal incl. init), "
        f"inertia {res1.inertia:.3e} -> {res.inertia:.3e}, "
        f"live clusters {int((res.sizes > 0).sum())}/{k}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
