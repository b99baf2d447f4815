"""Logistic-regression quality classifier (webtext.classifier):
trainer parity with an in-memory GD reference, planted-signal
recovery, convexity diagnostics, raw-weight folding, and the frozen
scoring SQL's cross-engine exactness."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from geostatssolvers_jl_spark.webtext import classifier as C

SF = "/root/testdata/sf0.01"


def _gd_np(X, y, iters, lr):
    """In-memory batch GD with the trainer's exact update rule."""
    n, k = X.shape
    w = np.zeros(k)
    b = 0.0
    losses = []
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        losses.append(float(np.mean(
            np.maximum(z, 0) - y * z + np.log1p(np.exp(-np.abs(z))))))
        err = p - y
        w -= lr * (X.T @ err) / n
        b -= lr * err.sum() / n
    return w, b, losses


def test_logreg_fit_matches_inmemory_gd(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (400, 3))
    y = (X @ np.array([1.5, -2.0, 0.5]) + 0.3
         + rng.normal(0, 0.5, 400) > 0).astype(float)
    rows = [(float(y[i]), *map(float, X[i])) for i in range(400)]
    df = spark.createDataFrame(
        rows, "y double, a double, b double, c double")
    m = C.logreg_fit_spark(df, ["a", "b", "c"], "y", iters=25, lr=0.8,
                           standardize=False)
    w_np, b_np, loss_np = _gd_np(X, y, 25, 0.8)
    assert np.allclose([m.weights[c] for c in ("a", "b", "c")], w_np,
                       atol=1e-9)
    assert abs(m.bias - b_np) < 1e-9
    assert np.allclose(m.losses, loss_np, atol=1e-9)


def test_logreg_planted_signal_recovery(spark):
    """Separable planted rule → high accuracy and monotone loss."""
    rng = np.random.default_rng(7)
    X = rng.normal(0, 1, (600, 2))
    y = (2.0 * X[:, 0] - 1.0 * X[:, 1] > 0).astype(float)
    df = spark.createDataFrame(
        [(float(y[i]), float(X[i, 0]), float(X[i, 1]))
         for i in range(600)],
        "y double, a double, b double")
    m = C.logreg_fit_spark(df, ["a", "b"], "y", iters=60, lr=1.0)
    assert all(x >= z - 1e-12 for x, z in zip(m.losses, m.losses[1:]))
    w, b = m.raw_weights()
    p = 1.0 / (1.0 + np.exp(-(X @ np.array([w["a"], w["b"]]) + b)))
    acc = float(np.mean((p >= 0.5) == (y == 1.0)))
    assert acc >= 0.97, acc
    # recovered direction matches the planted one
    assert w["a"] > 0 > w["b"]


def test_logreg_raw_weight_folding(spark):
    """Standardized-space fit scored via raw_weights() equals scoring
    the standardized features directly."""
    rng = np.random.default_rng(11)
    X = rng.normal(5.0, 3.0, (300, 2))  # non-centered, non-unit
    y = (X[:, 0] - X[:, 1] > 0).astype(float)
    df = spark.createDataFrame(
        [(float(y[i]), float(X[i, 0]), float(X[i, 1]))
         for i in range(300)],
        "y double, a double, b double")
    m = C.logreg_fit_spark(df, ["a", "b"], "y", iters=30, lr=1.0,
                           standardize=True)
    w, b = m.raw_weights()
    z_raw = X @ np.array([w["a"], w["b"]]) + b
    Xs = (X - np.array([m.means["a"], m.means["b"]])) \
        / np.array([m.stds["a"], m.stds["b"]])
    z_std = Xs @ np.array([m.weights["a"], m.weights["b"]]) + m.bias
    assert np.allclose(z_raw, z_std, atol=1e-9)


def test_logreg_validation(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "y double, a double")
    with pytest.raises(ValueError, match="no feature"):
        C.logreg_fit_spark(df, [], "y")
    with pytest.raises(ValueError, match="iters"):
        C.logreg_fit_spark(df, ["a"], "y", iters=0)
    null_df = spark.createDataFrame(
        [(1.0, None), (0.0, 1.0)], "y double, a double")
    with pytest.raises(ValueError, match="NULL"):
        C.logreg_fit_spark(null_df, ["a"], "y")
    with pytest.raises(ValueError, match="required"):
        C.logreg_score_sql("spark")
    with pytest.raises(ValueError, match="unknown features"):
        C.logreg_score_sql("spark", weights={"nope": 1.0}, bias=0.0)


def test_quality_model_distills_heuristic(spark):
    """End-to-end on the corpus: the trained smooth score reproduces
    the heuristic keep/drop label on ≥97% of documents, and the frozen
    scoring SQL is value-identical on Spark and DuckDB."""
    from geostatssolvers_jl_spark.webtext.textstats import quality_ok_expr

    spark.read.parquet(f"{SF}/documents.parquet") \
        .createOrReplaceTempView("documents")
    m = C.train_quality_model(spark, iters=80, lr=1.0)
    w, b = m.raw_weights()
    sql = C.logreg_score_sql("spark", weights=w, bias=b)
    acc = spark.sql(
        f"SELECT avg(CASE WHEN s.pred = d.y THEN 1.0 ELSE 0.0 END) a "
        f"FROM ({sql}) s JOIN (SELECT doc_id, {quality_ok_expr('text')} y "
        f"FROM documents) d ON s.doc_id = d.doc_id").collect()[0]["a"]
    assert acc >= 0.97, acc
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF}/documents.parquet'")
    got = spark.sql(sql).orderBy("doc_id").collect()
    exp = con.execute(C.logreg_score_sql("duckdb", weights=w, bias=b)
                      + " ORDER BY doc_id").fetchall()
    assert all((a["doc_id"], a["p_r"], a["pred"]) == (e[0], e[1], e[2])
               for a, e in zip(got, exp))
    assert not math.isnan(b)
