"""IVF planner-rule realism at scale (round 6): `planner.choose_ivf`'s
sqrt(n)-cells sizing was chosen on 500 vectors; demonstrate the full IVF
pipeline — bounded-sample k-means, n x k assignment, probe, exact
rerank — at real n with PLANTED near-duplicate pairs.

Two corpora, because quantizer quality is a property of the DATA:

* ``uniform`` — adversarial bilinear-mix vectors (concentration of
  measure makes every centroid near-equidistant in 64-D, so the coarse
  quantizer ranks cells near-randomly; the documented IVF worst case —
  real embeddings are not like this);
* ``clustered`` — 200 well-separated centers + per-vector noise (the
  shape of real text/image embeddings), where the planner-sized IVF
  must recall planted near-dups.

The assignment is the documented n*d*k cost; the rerank is bounded by
restricting the QUERY side to the planted ids + controls (the index side
stays the full corpus — exactly how a production "find my near-dups"
query runs).

Usage: python tools/ivf_stress.py [N]
Prints one JSON line per corpus.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
DIM = 64


def _corpus_sql(kind: str) -> str:
    """One SQL element expression per corpus kind (see module doc).
    Planted near-dup = id % 100 == 0 perturbs id-1.  Moduli are 2^31-1,
    NOT ann_stress's 1000003: at 100k ids the small prime produces
    ~5,000 birthday-collision EXACT-duplicate vectors, which
    legitimately outrank the planted twin and corrupt the recall metric
    (measured: 0.02 top-1 with unplanned cos-1.0 neighbors)."""
    base = "CASE WHEN id % 100 = 0 AND id > 0 THEN id - 1 ELSE id END"
    # perturbation amplitude per corpus: the twin must be its source's
    # NEAREST neighbour by construction.  Uniform inter-vector distance
    # is ~3.3 (0.05 pert fine); clustered siblings sit ~0.33 apart
    # (same center, different 0.1-noise), so the clustered pert must be
    # well inside that (0.01 -> twin distance ~0.06)
    amp = "0.05" if kind == "uniform" else "0.01"
    pert = (
        f"(CASE WHEN id % 100 = 0 AND id > 0 "
        f"THEN {amp} * sin(CAST(id AS DOUBLE) * 3.7 + CAST(i AS DOUBLE)) "
        f"ELSE 0.0 END)"
    )
    if kind == "uniform":
        mix1 = f"(({base} * 2654435761 + 12345) % 2147483647)"
        mix = f"(({mix1} * (i * 40503 + 771)) % 2147483647)"
        return (f"CAST(CAST({mix} AS DOUBLE) / 2147483647.0 - 0.5 "
                f"+ {pert} AS FLOAT)")
    # clustered: center from the cluster id g = base % 200, plus noise
    g = f"({base} % 200)"
    cmix = f"((({g} * 48271 + 11) * (i * 40503 + 771)) % 2147483647)"
    # reduce the id-mix mod 2^31-1 BEFORE the second multiply: the raw
    # product overflows BIGINT at id ~ 1e5 under ANSI mode
    nmix = (f"(((({base} * 2654435761 + 99) % 2147483647) "
            f"* (i * 65599 + 13)) % 2147483647)")
    return (
        f"CAST(CAST({cmix} AS DOUBLE) / 2147483647.0 - 0.5 "
        f"+ 0.1 * (CAST({nmix} AS DOUBLE) / 2147483647.0 - 0.5) "
        f"+ {pert} AS FLOAT)"
    )


def run_corpus(spark, kind: str) -> None:
    from geostatssolvers_jl_spark.planner import choose_ivf
    from geostatssolvers_jl_spark.webtext.similarity import (
        ann_topk_ivf_sql, ivf_ranked_sql, kmeans_centroids_np,
    )

    n_cells, nprobe = choose_ivf(N)
    elem = _corpus_sql(kind)
    spark.range(N).selectExpr(
        "id AS vec_id",
        f"transform(sequence(1, {DIM}), i -> {elem}) AS embedding",
    ).createOrReplaceTempView("emb_stress")

    # --- k-means quantizer from the bounded hash-mod sample -----------
    t0 = time.time()
    step = max(1, -(-N // 4096))
    sample = spark.sql(
        f"SELECT transform(embedding, x -> CAST(x AS DOUBLE)) AS e "
        f"FROM emb_stress WHERE pmod(hash(vec_id), {step}) = 0 "
        f"ORDER BY vec_id LIMIT 4096"
    ).collect()
    cent = kmeans_centroids_np([r["e"] for r in sample], n_cells, seed=0)
    t_kmeans = time.time() - t0
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cent)],
        "cid long, c array<double>",
    ).createOrReplaceTempView("cent_stress")

    # --- assignment + probe ranking (the n x k fold), materialized ----
    t0 = time.time()
    rk = spark.sql(ivf_ranked_sql(
        "spark", "emb_stress", nprobe=nprobe, cent_rel="cent_stress",
    ))
    rk.cache()
    n_rk = rk.count()
    t_assign = time.time() - t0
    rk.createOrReplaceTempView("rk_stress")

    # cell occupancy (skew check for the probe-side equi-join)
    occ = spark.sql(
        "SELECT count(*) AS nc, max(c) AS cmax, "
        "CAST(avg(c) AS DOUBLE) AS cavg FROM ("
        "SELECT cid, count(*) AS c FROM rk_stress WHERE rkc = 1 "
        "GROUP BY cid) _h"
    ).collect()[0]

    # --- rerank for the planted queries + controls --------------------
    qpred = "vec_id % 100 IN (0, 99)"
    t0 = time.time()
    out = spark.sql(ann_topk_ivf_sql(
        "spark", "emb_stress", k=3, nprobe=nprobe,
        cent_rel="cent_stress", rk_rel="rk_stress", query_pred=qpred,
    ))
    out.createOrReplaceTempView("ivf_out")
    nq = out.count()
    t_rerank = time.time() - t0
    hit = spark.sql(
        f"SELECT count(DISTINCT qid) AS n FROM ivf_out "
        f"WHERE qid % 100 = 99 AND nid = qid + 1 AND qid + 1 < {N}"
    ).collect()[0]["n"]
    npl = spark.sql(
        f"SELECT count(*) AS n FROM range({N}) "
        f"WHERE id % 100 = 0 AND id > 0"
    ).collect()[0]["n"]
    rk.unpersist()
    print(json.dumps({
        "corpus": kind, "n_vectors": N, "dim": DIM,
        "planner_cells": n_cells, "planner_nprobe": nprobe,
        "kmeans_sec": round(t_kmeans, 1),
        "assign_rank_sec": round(t_assign, 1),
        "ranked_rows": n_rk,
        "cells_used": int(occ["nc"]), "max_cell": int(occ["cmax"]),
        "avg_cell": round(occ["cavg"], 1),
        "rerank_queries": nq, "rerank_sec": round(t_rerank, 1),
        "planted_pairs": npl,
        "planted_top3_recall": round(hit / max(npl, 1), 4),
    }), flush=True)


def main():
    from geostatssolvers_jl_spark.session import get_spark

    spark = get_spark("ivf-stress", master="local[32]")
    for kind in ("clustered", "uniform"):
        run_corpus(spark, kind)
    spark.stop()


if __name__ == "__main__":
    main()
