"""Big-big tiled kNN join: certified rows must equal the exact kNN."""

from __future__ import annotations

import numpy as np
import pytest

from geostatssolvers_jl_spark.distances import Haversine
from geostatssolvers_jl_spark.neighbors import (
    collect_points,
    knn_join_tiled,
    knn_pairs,
)


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.default_rng(5)
    nd, nq = 3000, 400
    d = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
            zip(rng.uniform(-30, 30, nd), rng.uniform(-20, 20, nd)))],
        "data_id long, lon double, lat double",
    )
    q = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
            zip(rng.uniform(-28, 28, nq), rng.uniform(-18, 18, nq)))],
        "cell_id long, lon double, lat double",
    )
    return d, q


def test_tiled_certified_matches_exact(spark, points):
    d, q = points
    out = knn_join_tiled(q, d, k=3, res=5, metric=Haversine(6371.0))
    rows = out.collect()
    # the join must produce candidates for every query (dense data here)
    got = {}
    for r in rows:
        got.setdefault(r["cell_id"], []).append(r)
    # exact reference via broadcast path
    data = collect_points(d, ["lon", "lat"], [], id_col="data_id")
    exact = knn_pairs(q, data, ["lon", "lat"], k=3, metric=Haversine(6371.0),
                      id_col="cell_id").collect()
    want = {}
    for r in exact:
        want.setdefault(r["cell_id"], {})[r["rank"]] = (r["data_id"], r["dist"])
    n_cert = 0
    for cid, rs in got.items():
        if all(r["certified"] for r in rs):
            n_cert += 1
            for r in rs:
                wd, wdist = want[cid][r["rank"]]
                assert r["data_id"] == wd, (cid, r["rank"])
                assert r["dist"] == pytest.approx(wdist, abs=1e-9)
    # at res 5 over a dense 60°x40° box, most queries certify at ring 1
    assert n_cert > len(got) * 0.5
    assert len(got) == 400


def test_tiled_exact_equals_brute(spark, points):
    """The escalating tiled join must equal brute-force kNN row-for-row."""
    from geostatssolvers_jl_spark.neighbors import knn_join_tiled_exact

    d, q = points
    out = knn_join_tiled_exact(q, d, k=3, res=5, metric=Haversine(6371.0))
    got = {(r["cell_id"], r["rank"]): (r["data_id"], round(r["dist"], 9))
           for r in out.collect()}
    data = collect_points(d, ["lon", "lat"], [], id_col="data_id")
    exact = knn_pairs(q, data, ["lon", "lat"], k=3, metric=Haversine(6371.0),
                      id_col="cell_id").collect()
    want = {(r["cell_id"], r["rank"]): (r["data_id"], round(r["dist"], 9))
            for r in exact}
    assert got == want


def test_tiled_exact_sparse_escalation(spark):
    """Sparse data forces escalation; results still exact."""
    import numpy as np

    from geostatssolvers_jl_spark.neighbors import knn_join_tiled_exact

    rng = np.random.default_rng(11)
    d = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
            zip(rng.uniform(-170, 170, 25), rng.uniform(-80, 80, 25)))],
        "data_id long, lon double, lat double",
    )
    q = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
            zip(rng.uniform(-179, 179, 60), rng.uniform(-85, 85, 60)))],
        "cell_id long, lon double, lat double",
    )
    out = knn_join_tiled_exact(q, d, k=4, res=6, metric=Haversine(6371.0))
    data = collect_points(d, ["lon", "lat"], [], id_col="data_id")
    exact = knn_pairs(q, data, ["lon", "lat"], k=4, metric=Haversine(6371.0),
                      id_col="cell_id").collect()
    got = sorted((r["cell_id"], r["rank"], r["data_id"]) for r in out.collect())
    want = sorted((r["cell_id"], r["rank"], r["data_id"]) for r in exact)
    assert got == want
