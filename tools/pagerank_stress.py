"""PageRank scale point: synthetic 1M-node / 4M-edge link graph, the
persisted DataFrame loop — evidence the per-iteration cost is one
rank×edge equi-join + one partial-agg sum, with state one (node, rank)
relation (never collected).

Run: python tools/pagerank_stress.py [n_nodes] [out_degree] [iters]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from geostatssolvers_jl_spark.session import get_spark
    from geostatssolvers_jl_spark.webtext.graph import pagerank

    spark = get_spark("pagerank-stress", master="local[32]")
    nodes = spark.range(n).selectExpr("id AS doc_id")
    ks = ", ".join(str(k) for k in range(1, m + 1))
    mix = (f"((src % 1048576) * (src % 1048576) * 7 "
           f"+ (src % 999983) * 2654435761 + k * 40503) % {n}")
    edges = spark.range(n).selectExpr(
        "id AS src",
        f"explode(array({ks})) AS k",
    ).selectExpr(
        "src",
        f"CASE WHEN {mix} = src THEN (src + 1) % {n} "
        f"ELSE {mix} END AS dst",
    ).repartition(64).persist()
    ne = edges.count()

    t0 = time.time()
    out = pagerank(spark, edges, iters=iters, nodes_df=nodes, n_nodes=n)
    stats = out.selectExpr(
        "count(*) AS nn", "sum(rank_micro) AS mass",
        "max(rank_micro) AS mx").collect()[0]
    wall = time.time() - t0
    assert stats["nn"] == n
    assert 0.8 * n * 1_000_000 < stats["mass"] <= n * 1_000_000
    print(
        f"n={n} edges={ne} iters={iters}: {wall:.1f} s "
        f"({wall / iters:.1f} s/iter), mass {stats['mass']} "
        f"(per-node scale 1e6; floor-leak "
        f"{n * 1_000_000 - stats['mass']}), max rank {stats['mx']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
