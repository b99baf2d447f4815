"""Heavy-hitters scale point: ~5M token occurrences over a ~4.5M-token
distinct vocabulary with a planted 100-token hot set — evidence the
sketch-prune + exact-recount plan never shuffles the vocabulary and
still returns the exact frequent set.

Run: python tools/heavyhitters_stress.py [n_docs] [phi]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    phi = float(sys.argv[2]) if len(sys.argv) > 2 else 0.001

    from geostatssolvers_jl_spark.session import get_spark
    from geostatssolvers_jl_spark.webtext.heavyhitters import heavy_hitters

    spark = get_spark("hh-stress", master="local[32]")
    # 45 one-off tokens + 5 hot-set tokens per doc: vocabulary ≈ 45·n,
    # hot tokens each ≈ 5n/100 occurrences ≈ 0.1% of 50n total
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', "
        " concat_ws(' ', transform(sequence(0, 44), "
        "   j -> concat('u', id, '_', j))), "
        " concat_ws(' ', transform(sequence(0, 4), "
        "   j -> concat('hot', pmod(id * 7 + j * 13, 100))))"
        ") AS text",
    ).repartition(64).persist()
    docs.count()

    t0 = time.time()
    out = heavy_hitters(spark, docs, phi=phi).collect()
    wall = time.time() - t0
    hot = {r["token"]: r["cnt"] for r in out}
    assert all(t.startswith("hot") for t in hot), sorted(hot)[:5]
    assert len(hot) == 100, len(hot)
    assert sum(hot.values()) == 5 * n
    print(
        f"n_docs={n} tokens={50 * n} vocab≈{45 * n + 100} phi={phi}: "
        f"{wall:.1f} s, {len(hot)} exact heavy hitters recovered "
        f"(sketch m={max(2, int(-(-2.0 // phi)))}, partials ≤ "
        f"64·m rows — the vocabulary never shuffles)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
