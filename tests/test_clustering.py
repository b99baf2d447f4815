"""Distributed k-means (webtext.clustering): SQL-step cross-engine
exactness, trainer parity with the in-memory Lloyd reference, Lloyd
invariants (monotone inertia, empty-cluster policy, early stop), and
the IVF spark-trainer tier."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from geostatssolvers_jl_spark.webtext import clustering as km

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.createOrReplaceTempView("embeddings")
    return df


@pytest.fixture(scope="module")
def vecs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) "
        f"FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return np.asarray([r[0] for r in rows], dtype=np.float64)


def _lloyd_np(V, init, iters):
    """In-memory Lloyd with the engine's exact conventions (argmin ties
    to lowest cid, empty clusters keep their centroid)."""
    cent = np.asarray(init, dtype=np.float64).copy()
    x2 = (V * V).sum(axis=1)
    for _ in range(iters):
        c2 = (cent * cent).sum(axis=1)
        D = x2[:, None] + c2[None, :] - 2.0 * (V @ cent.T)
        lab = D.argmin(axis=1)
        for j in range(len(cent)):
            m = lab == j
            if m.any():
                cent[j] = V[m].mean(axis=0)
    return cent


def test_kmeans_sql_cross_engine_exact(spark, emb):
    """Assignment (integer argmin over the bit-identical distance fold)
    and the update step (member means) hash-exact vs DuckDB — the local
    twin of the kmeans_assign / kmeans_step gate entries."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS "
                f"SELECT * FROM '{SF}/embeddings.parquet'")
    s = spark.sql(km.kmeans_assign_sql("spark")).orderBy("vec_id").collect()
    d = con.execute(km.kmeans_assign_sql("duckdb")
                    + " ORDER BY vec_id").fetchall()
    assert len(s) == len(d) == 500
    assert all(
        (a["vec_id"], a["cid"], a["d2_r"]) == (b[0], b[1], b[2])
        for a, b in zip(s, d)
    )
    s2 = spark.sql(km.kmeans_step_sql("spark")).orderBy("cid",
                                                        "pos").collect()
    d2 = con.execute(km.kmeans_step_sql("duckdb")
                     + " ORDER BY cid, pos").fetchall()
    assert len(s2) == len(d2) == 17 * 64  # ceil(500/31) pivots × dims
    assert all(
        (a["cid"], a["pos"], a["size"], a["c_new_r"])
        == (b[0], b[1], b[2], b[3])
        for a, b in zip(s2, d2)
    )


def test_kmeans_fit_spark_matches_inmemory_lloyd(spark, emb, vecs):
    """Identical init → the distributed trainer reproduces the
    in-memory Lloyd reference (same argmin ties, same empty-cluster
    policy); FP tolerance covers partial-sum ordering only."""
    rng = np.random.default_rng(0)
    init = vecs[rng.choice(len(vecs), 8, replace=False)].copy()
    res = km.kmeans_fit_spark(spark, emb, iters=5, init=init.copy())
    ref = _lloyd_np(vecs, init, 5)
    assert np.allclose(res.centroids, ref, atol=1e-9)
    assert res.sizes.sum() == len(vecs)
    assert res.n_iter == 5


def test_kmeans_fit_monotone_inertia(spark, emb, vecs):
    """Lloyd's objective never increases with more iterations."""
    rng = np.random.default_rng(1)
    init = vecs[rng.choice(len(vecs), 6, replace=False)].copy()
    inertias = [
        km.kmeans_fit_spark(spark, emb, iters=i, init=init.copy()).inertia
        for i in (1, 2, 4)
    ]
    assert inertias[0] >= inertias[1] >= inertias[2]


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """A centroid that captures no members must survive the update
    unchanged (the numpy trainer's documented policy)."""
    pts = [(i, [float(i % 2), 0.0]) for i in range(10)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    far = np.array([1e6, 1e6])
    init = np.array([[0.0, 0.0], [1.0, 0.0], far])
    res = km.kmeans_fit_spark(spark, df, iters=3, init=init.copy(), dim=2)
    assert np.array_equal(res.centroids[2], far)
    assert res.sizes.tolist() == [5, 5, 0]


def test_kmeans_early_stop_on_convergence(spark):
    """Two well-separated blobs converge in one update; the trainer
    must stop early instead of burning the full iteration budget."""
    pts = [(i, [0.0 + (i % 3) * 0.01, 0.0]) for i in range(6)]
    pts += [(10 + i, [9.0 + (i % 3) * 0.01, 0.0]) for i in range(6)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    init = np.array([[0.0, 0.0], [9.0, 0.0]])
    res = km.kmeans_fit_spark(spark, df, iters=50, init=init.copy(),
                              dim=2, tol=1e-12)
    assert res.n_iter <= 3
    assert np.allclose(sorted(res.centroids[:, 0]), [0.01, 9.01])


def test_kmeans_fit_default_init_planner_sized(spark, emb):
    """No-init path: hash-mod sample seeding + planner cell count; every
    vector lands in some cluster."""
    res = km.kmeans_fit_spark(spark, emb, iters=2)
    from geostatssolvers_jl_spark.planner import choose_ivf

    assert len(res.centroids) == choose_ivf(500)[0]
    assert res.sizes.sum() == 500
    assert np.isfinite(res.inertia) and res.inertia > 0


def test_kmeans_fit_empty_relation_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        km.kmeans_fit_spark(spark, df, iters=1)


def test_ann_topk_ivf_spark_trainer(spark, emb):
    """The full-corpus trainer tier must match the sample tier's recall
    floor at the same operating point and be deterministic."""
    from geostatssolvers_jl_spark.webtext.similarity import (
        ann_topk_ivf, cosine_topk_spark,
    )

    spark.sql(
        "SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e "
        "FROM embeddings"
    ).createOrReplaceTempView("emb_kmt")
    brute = {
        r["qid"]: r["nid"]
        for r in spark.sql(
            cosine_topk_spark("emb_kmt", k=1, query_pred="q.vec_id < 100")
        ).collect()
    }
    got = {
        r["qid"]: r["nid"]
        for r in ann_topk_ivf(spark, emb, k=1, n_centroids=16, nprobe=6,
                              trainer="spark", trainer_iters=4).collect()
        if r["qid"] < 100
    }
    hits = sum(1 for q, n in brute.items() if got.get(q) == n)
    assert hits >= 0.7 * len(brute), f"spark-trainer recall {hits}/100"
    again = {
        r["qid"]: r["nid"]
        for r in ann_topk_ivf(spark, emb, k=1, n_centroids=16, nprobe=6,
                              trainer="spark", trainer_iters=4).collect()
        if r["qid"] < 100
    }
    assert got == again


def test_ann_topk_ivf_bad_trainer_rejected(spark, emb):
    from geostatssolvers_jl_spark.webtext.similarity import ann_topk_ivf

    with pytest.raises(ValueError, match="trainer"):
        ann_topk_ivf(spark, emb, trainer="surprise")
