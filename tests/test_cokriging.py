"""Ordinary co-kriging (operators.cokriging): decoupling to ordinary
kriging at zero cross-correlation, exact interpolation at primary
data, variance reduction from an informative secondary, and the LMC
validity guard."""

from __future__ import annotations

import numpy as np
import pytest

from geostatssolvers_jl_spark.grid import CartesianGrid
from geostatssolvers_jl_spark.operators.cokriging import (
    CoKrigingModel, solve_cokriging,
)
from geostatssolvers_jl_spark.operators.kriging import (
    KrigingModel, solve_kriging,
)
from geostatssolvers_jl_spark.variogram import GaussianVariogram


def _grid(spark, n=8):
    return CartesianGrid(dims=(n, n), origin=(0.0, 0.0),
                         spacing=(100.0 / n, 100.0 / n)).spark_df(spark)


@pytest.fixture()
def sec2d(spark):
    """Secondary variable at OTHER locations (z2 loosely tracks z)."""
    return spark.createDataFrame(
        [(10, 30.0, 40.0, 0.8), (11, 60.0, 60.0, 0.5),
         (12, 40.0, 70.0, 0.2), (13, 80.0, 30.0, 0.9)],
        "data_id long, x double, y double, z2 double",
    )


def test_cokriging_decouples_at_zero_cross(spark, data2d_3pt, sec2d):
    """cross sill = 0 ⇒ the secondary weights solve a homogeneous system
    with Σλ₂ = 0 ⇒ λ₂ = 0 ⇒ the estimate IS ordinary kriging."""
    g = GaussianVariogram(range=35.0, sill=1.0)
    co = solve_cokriging(
        data2d_3pt, sec2d, _grid(spark),
        model=CoKrigingModel(
            variogram=g, variogram2=g,
            cross=GaussianVariogram(range=35.0, sill=0.0)),
        var="z", var2="z2",
    ).orderBy("cell_id").collect()
    ok = solve_kriging(
        data2d_3pt, _grid(spark), var="z",
        model=KrigingModel(variogram=g),
    ).orderBy("cell_id").collect()
    assert len(co) == len(ok) == 64
    for a, b in zip(co, ok):
        assert abs(a["z"] - b["z"]) < 1e-8, (a, b)
        assert abs(a["z_variance"] - b["z_variance"]) < 1e-8


def test_cokriging_exact_at_primary_data(spark, data2d_3pt, sec2d):
    queries = data2d_3pt.selectExpr(
        "data_id AS cell_id", "x AS cx", "y AS cy")
    g = GaussianVariogram(range=35.0, sill=1.0)
    out = {
        r["cell_id"]: r
        for r in solve_cokriging(
            data2d_3pt, sec2d, queries,
            model=CoKrigingModel(
                variogram=g, variogram2=g,
                cross=GaussianVariogram(range=35.0, sill=0.6)),
            var="z", var2="z2",
        ).collect()
    }
    truth = {r["data_id"]: r["z"] for r in data2d_3pt.collect()}
    for i, z in truth.items():
        assert abs(out[i]["z"] - z) < 1e-4, (i, out[i]["z"], z)
        assert out[i]["z_variance"] < 1e-4


def test_cokriging_informative_secondary_reduces_variance(spark,
                                                          data2d_3pt):
    """A dense correlated secondary must not INCREASE estimation
    variance anywhere, and must strictly reduce it away from the
    primary data (the whole point of co-kriging)."""
    rng = np.random.default_rng(5)
    pts = [(100 + i, float(x), float(y),
            float(np.sin(x / 30.0) + np.cos(y / 25.0)))
           for i, (x, y) in enumerate(rng.uniform(0, 100, (40, 2)))]
    sec = spark.createDataFrame(
        pts, "data_id long, x double, y double, z2 double")
    g = GaussianVariogram(range=35.0, sill=1.0)
    mk = dict(var="z", var2="z2")
    co = {r["cell_id"]: r["z_variance"] for r in solve_cokriging(
        data2d_3pt, sec, _grid(spark),
        model=CoKrigingModel(variogram=g, variogram2=g,
                             cross=GaussianVariogram(range=35.0,
                                                     sill=0.7)),
        **mk).collect()}
    ok = {r["cell_id"]: r["z_variance"] for r in solve_kriging(
        data2d_3pt, _grid(spark), var="z",
        model=KrigingModel(variogram=g)).collect()}
    assert all(co[c] <= ok[c] + 1e-8 for c in ok)
    assert sum(1 for c in ok if co[c] < ok[c] - 1e-4) > len(ok) * 0.5


def test_cokriging_validity_and_empty_guards(spark, data2d_3pt, sec2d):
    g = GaussianVariogram(range=35.0, sill=1.0)
    with pytest.raises(ValueError, match="positive-definite"):
        solve_cokriging(
            data2d_3pt, sec2d, _grid(spark),
            model=CoKrigingModel(
                variogram=g, variogram2=g,
                cross=GaussianVariogram(range=35.0, sill=1.5)),
            var="z", var2="z2")
    empty = spark.createDataFrame(
        [], "data_id long, x double, y double, z2 double")
    with pytest.raises(ValueError, match="secondary"):
        solve_cokriging(
            data2d_3pt, empty, _grid(spark),
            model=CoKrigingModel(
                variogram=g, variogram2=g,
                cross=GaussianVariogram(range=35.0, sill=0.5)),
            var="z", var2="z2")


def test_cokriging_plan_zero_shuffle(spark, data2d_3pt, sec2d):
    """The global co-kriging plan is the broadcast kernel: no Exchange
    between the grid Range scan and the MapInPandas prediction."""
    g = GaussianVariogram(range=35.0, sill=1.0)
    out = solve_cokriging(
        data2d_3pt, sec2d, _grid(spark),
        model=CoKrigingModel(
            variogram=g, variogram2=g,
            cross=GaussianVariogram(range=35.0, sill=0.5)),
        var="z", var2="z2")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# ---- indicator kriging (operators/indicator.py) ----


def test_indicator_kriging_ccdf_properties(spark, data2d_3pt):
    """prob ∈ [0,1], non-decreasing across thresholds per cell; a
    threshold above max(z) gives exactly 1 everywhere (OK weights sum
    to one, so kriging a constant-1 indicator returns 1)."""
    from geostatssolvers_jl_spark.operators.indicator import (
        solve_indicator_kriging,
    )

    g = GaussianVariogram(range=35.0, sill=1.0)
    out = solve_indicator_kriging(
        data2d_3pt, _grid(spark), thresholds=(0.5, 2.0),
        model=KrigingModel(variogram=g), maxneighbors=3,
        strategy="local-broadcast",
    ).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell_id"], {})[r["threshold"]] = r["prob"]
    assert len(by_cell) == 64
    for probs in by_cell.values():
        assert 0.0 <= probs[0.5] <= probs[2.0] <= 1.0
        # all z ≤ 2.0 → the indicator is constantly 1
        assert abs(probs[2.0] - 1.0) < 1e-9


def test_indicator_kriging_correct_order_contract(spark, data2d_3pt):
    """correct_order=False exposes the raw per-threshold estimates
    (possibly outside [0,1]); the corrected form is their
    clamp + running max, verified cell by cell."""
    from geostatssolvers_jl_spark.operators.indicator import (
        solve_indicator_kriging,
    )

    g = GaussianVariogram(range=35.0, sill=1.0)
    kw = dict(thresholds=(0.5, 0.8, 2.0),
              model=KrigingModel(variogram=g), maxneighbors=3,
              strategy="local-broadcast")
    raw = solve_indicator_kriging(
        data2d_3pt, _grid(spark), correct_order=False, **kw).collect()
    cor = solve_indicator_kriging(
        data2d_3pt, _grid(spark), **kw).collect()
    rawm = {(r["cell_id"], r["threshold"]): r["prob"] for r in raw}
    expected = {}
    for cid in {c for c, _ in rawm}:
        run = 0.0
        for t in (0.5, 0.8, 2.0):
            run = max(run, min(max(rawm[(cid, t)], 0.0), 1.0))
            expected[(cid, t)] = run
    for r in cor:
        assert abs(r["prob"]
                   - expected[(r["cell_id"], r["threshold"])]) < 1e-12


def test_indicator_kriging_validation(spark, data2d_3pt):
    from geostatssolvers_jl_spark.operators.indicator import (
        solve_indicator_kriging,
    )

    with pytest.raises(ValueError, match="no thresholds"):
        solve_indicator_kriging(data2d_3pt, _grid(spark), thresholds=())
    with pytest.raises(ValueError, match="duplicate"):
        solve_indicator_kriging(data2d_3pt, _grid(spark),
                                thresholds=(1.0, 1.0))


def test_indicator_kriging_null_values_stay_missing(spark):
    """A NULL z must be excluded from every threshold's solve, not
    silently counted as 'above threshold'."""
    from geostatssolvers_jl_spark.operators.indicator import (
        solve_indicator_kriging,
    )

    pts = spark.createDataFrame(
        [(0, 25.0, 25.0, 1.0), (1, 50.0, 75.0, None),
         (2, 75.0, 50.0, 0.0)],
        "data_id long, x double, y double, z double",
    )
    g = GaussianVariogram(range=35.0, sill=1.0)
    out = solve_indicator_kriging(
        pts, _grid(spark), thresholds=(0.5,),
        model=KrigingModel(variogram=g), maxneighbors=2,
        strategy="local-broadcast",
    ).collect()
    # with the NULL excluded only 2 data points exist; a query AT the
    # NULL point's location is a plain 2-point estimate, never exactly
    # the 1.0 that counting the NULL row as indicator-1 would produce
    assert len(out) == 64
    assert all(0.0 <= r["prob"] <= 1.0 for r in out)


# ---- collocated co-kriging (MM1 raster covariate) ----


def _grid_with_covariate(spark, n=8):
    g = _grid(spark, n)
    # deterministic smooth covariate at every estimation location
    return g.selectExpr("*", "sin(cx / 20.0) + cos(cy / 30.0) AS y2")


def test_collocated_decouples_at_zero_rho(spark, data2d_3pt):
    """ρ = 0 ⇒ λ₂ = 0 ⇒ the estimate IS simple kriging at the same
    mean (the collocated row decouples)."""
    from geostatssolvers_jl_spark.operators.cokriging import (
        CollocatedModel, solve_cokriging_collocated,
    )

    g = GaussianVariogram(range=35.0, sill=1.0)
    co = solve_cokriging_collocated(
        data2d_3pt, _grid_with_covariate(spark),
        model=CollocatedModel(variogram=g, rho=0.0, sec_variance=1.0,
                              mean=0.6, sec_mean=0.0),
        maxneighbors=3,
    ).orderBy("cell_id").collect()
    sk = solve_kriging(
        data2d_3pt, _grid(spark), var="z",
        model=KrigingModel(variogram=g, mean=0.6), maxneighbors=3,
        strategy="local-broadcast",
    ).orderBy("cell_id").collect()
    assert len(co) == len(sk) == 64
    for a, b in zip(co, sk):
        assert abs(a["z"] - b["z"]) < 1e-9
        assert abs(a["z_variance"] - b["z_variance"]) < 1e-9


def test_collocated_exact_at_primary_data(spark, data2d_3pt):
    """λ = eᵢ, λ₂ = 0 satisfies the MM1 system at a datum — exact
    whatever the collocated secondary holds there."""
    from geostatssolvers_jl_spark.operators.cokriging import (
        CollocatedModel, solve_cokriging_collocated,
    )

    queries = data2d_3pt.selectExpr(
        "data_id AS cell_id", "x AS cx", "y AS cy",
        "CAST(42.0 AS DOUBLE) AS y2")  # arbitrary secondary values
    g = GaussianVariogram(range=35.0, sill=1.0)
    out = {r["cell_id"]: r for r in solve_cokriging_collocated(
        data2d_3pt, queries,
        model=CollocatedModel(variogram=g, rho=0.7, sec_variance=4.0,
                              mean=0.6, sec_mean=40.0),
        maxneighbors=3,
    ).collect()}
    for r in data2d_3pt.collect():
        assert abs(out[r["data_id"]]["z"] - r["z"]) < 1e-4
        assert out[r["data_id"]]["z_variance"] < 1e-4


def test_collocated_secondary_reduces_variance(spark, data2d_3pt):
    from geostatssolvers_jl_spark.operators.cokriging import (
        CollocatedModel, solve_cokriging_collocated,
    )

    g = GaussianVariogram(range=35.0, sill=1.0)
    base = dict(maxneighbors=3)
    mk = lambda rho: CollocatedModel(  # noqa: E731
        variogram=g, rho=rho, sec_variance=1.0, mean=0.6, sec_mean=0.0)
    v0 = {r["cell_id"]: r["z_variance"] for r in
          solve_cokriging_collocated(
              data2d_3pt, _grid_with_covariate(spark), model=mk(0.0),
              **base).collect()}
    v8 = {r["cell_id"]: r["z_variance"] for r in
          solve_cokriging_collocated(
              data2d_3pt, _grid_with_covariate(spark), model=mk(0.8),
              **base).collect()}
    assert all(v8[c] <= v0[c] + 1e-9 for c in v0)
    assert sum(1 for c in v0 if v8[c] < v0[c] - 1e-6) > len(v0) * 0.9


def test_collocated_validation_and_null_secondary(spark, data2d_3pt):
    from geostatssolvers_jl_spark.operators.cokriging import (
        CollocatedModel, solve_cokriging_collocated,
    )

    g = GaussianVariogram(range=35.0, sill=1.0)
    with pytest.raises(ValueError, match="rho"):
        CollocatedModel(variogram=g, rho=1.5, sec_variance=1.0,
                        mean=0.0, sec_mean=0.0).validate()
    with pytest.raises(ValueError, match="sec_variance"):
        CollocatedModel(variogram=g, rho=0.5, sec_variance=0.0,
                        mean=0.0, sec_mean=0.0).validate()
    bad_grid = _grid(spark).selectExpr(
        "*", "CASE WHEN cell_id = 3 THEN NULL "
             "ELSE CAST(1.0 AS DOUBLE) END AS y2")
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception), match="NULL y2"):
        solve_cokriging_collocated(
            data2d_3pt, bad_grid,
            model=CollocatedModel(variogram=g, rho=0.5,
                                  sec_variance=1.0, mean=0.6,
                                  sec_mean=0.0),
            maxneighbors=3,
        ).collect()


def test_collocated_plan_zero_shuffle(spark, data2d_3pt):
    from geostatssolvers_jl_spark.operators.cokriging import (
        CollocatedModel, solve_cokriging_collocated,
    )

    g = GaussianVariogram(range=35.0, sill=1.0)
    out = solve_cokriging_collocated(
        data2d_3pt, _grid_with_covariate(spark),
        model=CollocatedModel(variogram=g, rho=0.5, sec_variance=1.0,
                              mean=0.6, sec_mean=0.0),
        maxneighbors=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_etype_hand_computed_and_quantized_agree(spark):
    """Two cells with hand-computable ccdfs: e = Σ mid·Δp + tail; the
    quantized BIGINT form equals the float form at nano scale."""
    import duckdb

    from geostatssolvers_jl_spark.operators.indicator import etype_sql

    con = duckdb.connect()
    con.execute("""CREATE VIEW ccdf AS SELECT * FROM (VALUES
        (0, 0.4, 0.25), (0, 0.75, 0.5),
        (1, 0.4, 1.0), (1, 0.75, 1.0)) _v(cell_id, threshold, prob)""")
    out = dict(con.execute(
        etype_sql("ccdf", (0.4, 0.75), 0.0, 1.0)
        + " ORDER BY cell_id").fetchall())
    # cell 0: .2*.25 + .575*.25 + .875*.5 = 0.631250; cell 1: .2
    assert out == {0: 0.63125, 1: 0.2}
    q = dict(con.execute(
        etype_sql("ccdf", (0.4, 0.75), 0.0, 1.0, quantized=True)
        + " ORDER BY cell_id").fetchall())
    assert q == {0: 631_250_000, 1: 200_000_000}
    # spark agrees on the same relation
    spark.createDataFrame(
        [(0, 0.4, 0.25), (0, 0.75, 0.5), (1, 0.4, 1.0), (1, 0.75, 1.0)],
        "cell_id long, threshold double, prob double",
    ).createOrReplaceTempView("ccdf_s")
    sq = {r["cell_id"]: r["e_nano"] for r in spark.sql(
        etype_sql("ccdf_s", (0.4, 0.75), 0.0, 1.0,
                  quantized=True)).collect()}
    assert sq == q
    spark.catalog.dropTempView("ccdf_s")


def test_etype_validation():
    from geostatssolvers_jl_spark.operators.indicator import etype_sql

    with pytest.raises(ValueError, match="no thresholds"):
        etype_sql("c", (), 0.0, 1.0)
    with pytest.raises(ValueError, match="inside"):
        etype_sql("c", (0.5,), 0.6, 1.0)
    with pytest.raises(ValueError, match="not exact at 3"):
        etype_sql("c", (1.0 / 3.0,), 0.0, 1.0, quantized=True)


def test_quantile_map_hand_computed_and_monotone(spark):
    """Hand-checkable crossings on a 2-threshold ccdf, cross-engine
    integer identity, and monotonicity in p."""
    import duckdb

    from geostatssolvers_jl_spark.operators.indicator import quantile_sql

    con = duckdb.connect()
    con.execute("""CREATE VIEW ccdf AS SELECT * FROM (VALUES
        (0, 0.4, 0.25), (0, 0.75, 0.5),
        (1, 0.4, 1.0),  (1, 0.75, 1.0),
        (2, 0.4, 0.0),  (2, 0.75, 0.0)) _v(cell_id, threshold, prob)""")
    med = dict(con.execute(
        quantile_sql("ccdf", (0.4, 0.75), 0.5, 0.0, 1.0)
        + " ORDER BY cell_id").fetchall())
    # cell 0: crosses 0.5 exactly at t=0.75; cell 1: within [0, 0.4]
    # at 0.5/1.0 of the bin → 0.2; cell 2: upper tail [0.75, 1] at
    # (0.5−0)/(1−0) → 0.875
    assert med == {0: 750_000_000, 1: 200_000_000, 2: 875_000_000}
    q25 = dict(con.execute(
        quantile_sql("ccdf", (0.4, 0.75), 0.25, 0.0, 1.0)
        + " ORDER BY cell_id").fetchall())
    assert all(q25[c] <= med[c] for c in med)
    spark.createDataFrame(
        [(0, 0.4, 0.25), (0, 0.75, 0.5), (1, 0.4, 1.0), (1, 0.75, 1.0),
         (2, 0.4, 0.0), (2, 0.75, 0.0)],
        "cell_id long, threshold double, prob double",
    ).createOrReplaceTempView("ccdf_q")
    sq = {r["cell_id"]: r["q_nano"] for r in spark.sql(
        quantile_sql("ccdf_q", (0.4, 0.75), 0.5, 0.0, 1.0)).collect()}
    assert sq == med
    spark.catalog.dropTempView("ccdf_q")
    # float form agrees at 1e-9 scale
    f = dict(con.execute(
        quantile_sql("ccdf", (0.4, 0.75), 0.5, 0.0, 1.0,
                     quantized=False) + " ORDER BY cell_id").fetchall())
    assert all(abs(f[c] - med[c] / 1e9) < 1e-9 for c in med)


def test_quantile_map_validation():
    from geostatssolvers_jl_spark.operators.indicator import quantile_sql

    with pytest.raises(ValueError, match="p must"):
        quantile_sql("c", (0.5,), 1.0, 0.0, 1.0)
    with pytest.raises(ValueError, match="no thresholds"):
        quantile_sql("c", (), 0.5, 0.0, 1.0)
    with pytest.raises(ValueError, match="exact at 3"):
        quantile_sql("c", (1.0 / 3.0,), 0.5, 0.0, 1.0)
