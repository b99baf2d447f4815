"""Distributed-exact CART fit stress — the above-the-cap shape.

`fit_tree_spark` must reproduce the driver fit decision-for-decision on
a corpus LARGER than `fit_row_cap` (where the default 'sample' strategy
would subsample).  This runs both on the same seeded rows — the driver
fit is still feasible as ground truth at this size — and reports wall
times plus exact-match verdicts.

Usage: python tools/learn_stress.py [n_rows] [n_features]
Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
NF = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    import numpy as np

    from geostatssolvers_jl_spark.operators.learn import (
        DecisionTreeClassifier, fit_tree_spark,
    )
    from geostatssolvers_jl_spark.session import get_spark

    spark = get_spark("learn-stress", master="local[32]",
                      extra_conf={"spark.driver.memory": "12g"})
    # deterministic synthetic: Spark-side generation (no driver build of
    # the corpus), numpy-side ground truth regenerated identically
    df = spark.range(N).selectExpr(
        "id",
        *[
            f"sin(CAST((id * {2654435761 + 97 * j}) % 100000 AS DOUBLE) "
            f"/ 15915.494) AS f{j}"
            for j in range(NF)
        ],
    ).selectExpr(
        *[f"f{j}" for j in range(NF)],
        # label built only from EXISTING features so the advertised
        # [n_features] CLI works for any NF >= 1
        "CAST(" + " + ".join(
            f"f{j} * {1.0 - 0.3 * j}" for j in range(NF)
        ) + " > 0.2 AS INT) + CAST(f0 > 0.8 AS INT) AS lab",
    )
    t0 = time.time()
    dist = fit_tree_spark(df, [f"f{j}" for j in range(NF)], "lab")
    wall_dist = time.time() - t0

    t0 = time.time()
    pdf = df.toPandas()
    X = pdf[[f"f{j}" for j in range(NF)]].to_numpy(np.float64)
    y = pdf["lab"].to_numpy()
    driver = DecisionTreeClassifier().fit(X, y)
    wall_driver = time.time() - t0

    rng = np.random.default_rng(5)
    Xq = rng.uniform(-1, 1, (100_000, NF))
    same_tree = driver._tree == dist._tree
    same_pred = bool(
        np.array_equal(driver.predict(Xq), dist.predict(Xq))
    )
    print(json.dumps({
        "metric": "distributed-exact CART fit wall",
        "value": round(wall_dist, 1),
        "unit": "sec",
        "n_rows": N, "n_features": NF,
        "tree_nodes": len(dist._tree),
        "identical_tree": same_tree,
        "identical_predictions_100k": same_pred,
        "driver_fit_incl_collect_sec": round(wall_driver, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
