"""ANN/LSH parameter realism at scale (round-2 verdict softness: plane
counts were tuned on 2k vectors; the rule planes ~ log2(n / bucket_target)
needs demonstrating at real n).

Synthesizes N deterministic 64-dim vectors JVM-side (no driver
materialization) with PLANTED near-duplicate pairs, then:

1. For each candidate plane count p: builds the 6-table bucket assignment
   and computes the CANDIDATE-JOIN FANOUT analytically from the bucket
   histogram (sum over buckets of n_b^2, x tables x (p+1) probe arms) —
   the cost of each config WITHOUT running the quadratic join.
2. Runs the full candidate generation at the chosen p and reports wall,
   distinct-candidate count, and planted-pair recall.

Usage: python tools/ann_stress.py [N] [p_run]
Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
if len(sys.argv) > 2:
    P_RUN = int(sys.argv[2])
else:
    # default to the planner's own choice — the stress validates the
    # engine's actual decision, not a hand-picked constant
    from geostatssolvers_jl_spark.planner import choose_planes

    P_RUN = choose_planes(N)
DIM = 64
N_TABLES = 6


def main():
    from geostatssolvers_jl_spark.session import get_spark
    from geostatssolvers_jl_spark.webtext.similarity import (
        _lsh_candidates_cte, bucket_tables_sql,
    )

    spark = get_spark("ann-stress", master="local[32]")
    # deterministic synthetic vectors; every id % 100 == 0 (id > 0) is a
    # small perturbation of id-1 -> 'planted' near-dup pairs with known ids
    # isotropic-ish elements via integer mixing (a sinusoid family is
    # rank-2 and collapses the sign buckets); uniform in [-0.5, 0.5)
    base = "CASE WHEN id % 100 = 0 AND id > 0 THEN id - 1 ELSE id END"
    # bilinear mix: a per-id hash TIMES a per-dimension hash, mod a prime —
    # anything linear in i correlates with the (also linear-in-d) LSH
    # weight sequence and collapses the sign buckets
    mix1 = f"(({base} * 2654435761 + 12345) % 1000003)"
    mix = f"(({mix1} * (i * 40503 + 771)) % 1000003)"
    elem = (
        f"CAST(CAST({mix} AS DOUBLE) / 1000003.0 - 0.5 "
        f"+ (CASE WHEN id % 100 = 0 AND id > 0 "
        f"THEN 0.05 * sin(CAST(id AS DOUBLE) * 3.7 + CAST(i AS DOUBLE)) "
        f"ELSE 0.0 END) AS FLOAT)"
    )
    spark.range(N).selectExpr(
        "id AS vec_id",
        f"transform(sequence(1, {DIM}), i -> {elem}) AS embedding",
    ).createOrReplaceTempView("emb_stress")

    # --- per-p analytic fanout from bucket histograms (no quadratic join)
    fanout = {}
    for p in (5, 8, 10, 12):
        bt = bucket_tables_sql("spark", "emb_stress", p, N_TABLES, DIM)
        t0 = time.time()
        row = spark.sql(
            f"SELECT sum(c * c) AS s2, count(*) AS nb, max(c) AS cmax "
            f"FROM (SELECT tbl, bucket, count(*) AS c "
            f"FROM ({bt}) _b GROUP BY tbl, bucket) _h"
        ).collect()[0]
        fanout[p] = {
            "join_rows_per_probe_arm": int(row["s2"]),
            "est_candidate_rows": int(row["s2"]) * (p + 1),
            "buckets_used": int(row["nb"]),
            "max_bucket": int(row["cmax"]),
            "bucket_assign_sec": round(time.time() - t0, 1),
        }

    # --- full run at the chosen p
    cte = _lsh_candidates_cte(
        "spark", "emb_stress", P_RUN, N_TABLES, DIM,
        "p.vec_id < d.vec_id",
    )
    t0 = time.time()
    ncand = spark.sql(cte + "SELECT count(*) AS n FROM _cand").collect()[0]["n"]
    wall = time.time() - t0
    planted = spark.sql(
        f"SELECT id - 1 AS qid, id AS nid FROM range({N}) "
        f"WHERE id % 100 = 0 AND id > 0"
    )
    planted.createOrReplaceTempView("_planted")
    hit = spark.sql(
        cte + "SELECT count(*) AS n FROM _planted p "
        "JOIN _cand c ON p.qid = c.qid AND p.nid = c.nid"
    ).collect()[0]["n"]
    npl = planted.count()
    spark.stop()
    print(json.dumps({
        "n_vectors": N, "dim": DIM, "n_tables": N_TABLES,
        "fanout_by_planes": fanout,
        "run_planes": P_RUN,
        "distinct_candidates": ncand,
        "candidate_gen_sec": round(wall, 1),
        "planted_pairs": npl,
        "planted_recall": round(hit / max(npl, 1), 4),
    }))


if __name__ == "__main__":
    main()
