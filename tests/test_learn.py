"""PointwiseLearn tests — mirror /root/reference/test/learning/pointwise.jl."""

from __future__ import annotations

import numpy as np
import pytest

from geostatssolvers_jl_spark.operators.learn import (
    DecisionTreeClassifier,
    pointwise_learn,
)


def _make_frames(spark):
    # F9 fixture (pointwise.jl:4-17): seeded synthetic classification field
    rng = np.random.default_rng(1234)
    n = 100
    ii, jj = np.meshgrid(np.arange(1, n + 1), np.arange(1, n + 1), indexing="ij")
    X = np.sin(ii / 10.0)
    Y = np.sin(jj / 10.0)
    Z = (np.sin(4.0 * (np.abs(X) + np.abs(Y))) < 0).astype(np.int64)
    Xt = X + 0.1 * rng.standard_normal((n, n))
    Yt = Y + 0.1 * rng.standard_normal((n, n))
    cell = (jj - 1) * n + (ii - 1)
    src = spark.createDataFrame(
        list(zip(cell.ravel().tolist(), X.ravel().tolist(),
                 Y.ravel().tolist(), Z.ravel().tolist())),
        "cell_id long, X double, Y double, Z long",
    )
    tgt = spark.createDataFrame(
        list(zip(cell.ravel().tolist(), Xt.ravel().tolist(),
                 Yt.ravel().tolist())),
        "cell_id long, X double, Y double",
    )
    # truth keyed BY CELL ID: Z.ravel()[k] belongs to cell.ravel()[k],
    # not to cell k — indexing truth by position only worked because this
    # field happens to be i<->j symmetric (r3 test review)
    truth = {int(c): int(z) for c, z in zip(cell.ravel(), Z.ravel())}
    return src, tgt, truth


def test_pointwise_learn_error_rate(spark):
    # golden: misclassification < 0.15 (pointwise.jl:35-36)
    src, tgt, truth = _make_frames(spark)
    pred = pointwise_learn(src, tgt, ["X", "Y"], "Z")
    rows = {r["cell_id"]: r["Z"] for r in pred.collect()}
    err = float(np.mean([rows[c] != z for c, z in truth.items()]))
    assert err < 0.15, err


def test_cart_classifier_numpy():
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (500, 2))
    y = (X[:, 0] * X[:, 1] > 0).astype(np.int64)
    clf = DecisionTreeClassifier(max_depth=6).fit(X, y)
    acc = (clf.predict(X) == y).mean()
    assert acc > 0.93


def test_error_rate_query(spark):
    """A8 classification error rate as a declarative aggregation."""
    src, tgt, truth = _make_frames(spark)
    pred = pointwise_learn(src, tgt, ["X", "Y"], "Z")
    joined = pred.alias("p").join(
        src.selectExpr("cell_id", "Z AS Ztrue"), "cell_id"
    )
    err = joined.selectExpr(
        "avg(CAST(Z <> Ztrue AS DOUBLE)) AS err"
    ).collect()[0]["err"]
    assert err < 0.15


def test_pointwise_learn_fit_row_cap(spark):
    """A source above fit_row_cap must NOT land on the driver whole: the
    fit samples ~cap rows (r2 verdict perf item — full-source toPandas is
    a driver OOM at 100 TB) and still predicts every target row."""
    import numpy as np

    from geostatssolvers_jl_spark.operators.learn import pointwise_learn

    n = 600
    rng = np.random.default_rng(3)
    xs = rng.uniform(0, 10, n)
    src = spark.createDataFrame(
        [(float(x), int(x > 5)) for x in xs], "f double, lab long"
    )
    tgt = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1.0, 2.0, 8.0, 9.0])],
        "id long, f double",
    )
    class Recording(DecisionTreeClassifier):
        n_fit = None

        def fit(self, X, y):
            Recording.n_fit = len(X)
            return super().fit(X, y)

    out = pointwise_learn(
        src, tgt, ["f"], "lab", model=Recording(), fit_row_cap=100
    )
    rows = {r["id"]: r["lab"] for r in out.collect()}
    assert len(rows) == 4
    # the fit must have seen ~cap rows, NOT the full 600-row source —
    # removing the sampling branch would otherwise pass silently
    assert Recording.n_fit is not None and Recording.n_fit <= 160
    # a ~100-row sample of a cleanly separable rule still learns it
    assert rows[0] == 0 and rows[1] == 0 and rows[2] == 1 and rows[3] == 1


def test_fit_tree_spark_matches_driver_fit(spark):
    """The distributed histogram fit (`fit_tree_spark`) must reproduce
    the driver fit decision-for-decision on a cap-exceeding corpus:
    identical tree array, identical predictions — src/learning/
    pointwise.jl:39 fits the whole source, and this is the path that
    honours it above fit_row_cap without a driver collect."""
    import numpy as np
    import pandas as pd

    from geostatssolvers_jl_spark.operators.learn import (
        DecisionTreeClassifier, fit_tree_spark, pointwise_learn,
    )

    rng = np.random.default_rng(11)
    n = 5000
    X = rng.normal(0, 1, (n, 3))
    y = ((X[:, 0] + 0.5 * X[:, 1] ** 2 - X[:, 2] > 0.2).astype(int)
         + (X[:, 1] > 1.0).astype(int))
    pdf = pd.DataFrame(
        {"f0": X[:, 0], "f1": X[:, 1], "f2": X[:, 2], "lab": y}
    )
    df = spark.createDataFrame(pdf).repartition(8)

    driver = DecisionTreeClassifier().fit(X, y)
    dist = fit_tree_spark(df, ["f0", "f1", "f2"], "lab")
    assert np.array_equal(driver.classes_, dist.classes_)
    assert driver._tree == dist._tree
    Xq = rng.normal(0, 1, (2000, 3))
    assert np.array_equal(driver.predict(Xq), dist.predict(Xq))

    # end-to-end through pointwise_learn with a cap the corpus exceeds:
    # the distributed strategy must NOT sample (exact fit), and the
    # predictions must equal the driver fit's
    target = spark.createDataFrame(
        pd.DataFrame({"f0": Xq[:, 0], "f1": Xq[:, 1], "f2": Xq[:, 2]})
    )
    out = pointwise_learn(
        df, target, ["f0", "f1", "f2"], "lab",
        fit_row_cap=100, fit_strategy="distributed",
    ).toPandas()
    got = out.sort_values(["f0", "f1", "f2"]).lab.to_numpy()
    idx = np.lexsort((Xq[:, 2], Xq[:, 1], Xq[:, 0]))
    want = driver.predict(Xq)[idx]
    assert np.array_equal(got, want)


def test_fit_tree_spark_rejects_pluggable_models(spark):
    import pandas as pd
    import pytest as _pt

    from geostatssolvers_jl_spark.operators.learn import pointwise_learn

    df = spark.createDataFrame(
        pd.DataFrame({"f0": [0.0, 1.0], "lab": [0, 1]})
    )

    class Custom:
        def fit(self, X, y):
            return self

        def predict(self, X):
            return [0] * len(X)

    with _pt.raises(ValueError, match="distributed"):
        pointwise_learn(df, df, ["f0"], "lab", model=Custom(),
                        fit_strategy="distributed")


def test_fit_tree_spark_rejects_null_features(spark):
    """NULL features have no driver-fit NaN counterpart in SQL ordering —
    the distributed fit must refuse loudly (review finding r5)."""
    import pandas as pd
    import pytest as _pt

    from geostatssolvers_jl_spark.operators.learn import fit_tree_spark

    df = spark.createDataFrame(
        [(0.1, 0), (None, 1), (0.5, 0), (0.9, 1)], "f0 double, lab int"
    )
    with _pt.raises(ValueError, match="non-NULL"):
        fit_tree_spark(df, ["f0"], "lab")


def test_fit_tree_spark_rejects_null_labels(spark):
    """A NULL label used to slip past the feature-only guard, map to a
    NULL _yi, and crash later with an opaque TypeError in the stats
    loop (ADVICE r5) — it must trip the same loud ValueError."""
    import pandas as pd
    import pytest as _pt

    from geostatssolvers_jl_spark.operators.learn import fit_tree_spark

    df = spark.createDataFrame(
        [(0.1, 0), (0.3, None), (0.5, 0), (0.9, 1)], "f0 double, lab int"
    )
    with _pt.raises(ValueError, match="non-NULL"):
        fit_tree_spark(df, ["f0"], "lab")
