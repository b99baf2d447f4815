"""End-to-end pipeline walkthrough — the path a GeoStatsSolvers.jl user
takes through this engine, at web scale.

    python examples/end_to_end.py [sf_dir]       (default sf0.01)

Stages (each maps to a reference concept or a north-rule addition):
  1. ingest + clean      — canonical-url dedup, exact text dedup, PII
                           redaction, quality/repetition filters
  1b. language ID        — trained trigram-NB classifier over the
                           cleaned corpus (webtext/langmodel.py)
  2. split               — deterministic train/val/test assignment
  3. georeference        — geocode pages, H3-style tile assignment
                           (the reference's `georef` + domain)
  4. estimate            — local Ordinary Kriging over a world grid
                           (the reference's `solve(EstimationProblem,
                           Kriging(...))`), strategy auto-planned
  5. simulate            — a small conditional SGS ensemble (the
                           reference's `SimulationProblem`)
  6. sink                — partitioned parquet + lineage manifest,
                           resumable (north-rule checkpoint contract)
  7. learn               — PointwiseLearn with the distributed-exact
                           CART fit over the train split

Run output: one line per stage with row counts / timings.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from geostatssolvers_jl_spark.distances import Haversine
    from geostatssolvers_jl_spark.grid import CartesianGrid
    from geostatssolvers_jl_spark.operators.kriging import (
        KrigingModel, solve_kriging,
    )
    from geostatssolvers_jl_spark.session import get_spark
    from geostatssolvers_jl_spark.simulation.seqsim import (
        SGSParams, solve_sgs,
    )
    from geostatssolvers_jl_spark.sources import pages as P
    from geostatssolvers_jl_spark.sources.delimited import write_solution
    from geostatssolvers_jl_spark.variogram import GaussianVariogram
    from geostatssolvers_jl_spark.webtext.textstats import (
        redact_pii_sql, repetition_ratio_sql,
    )
    from geostatssolvers_jl_spark.webtext.urls import (
        split_assign_sql, url_canonical_sql,
    )

    t_all = time.time()
    spark = get_spark("end-to-end", master="local[8]")

    def stage(name, t0, **kv):
        kvs = " ".join(f"{k}={v}" for k, v in kv.items())
        print(f"[{name:<10}] {time.time() - t0:6.2f}s  {kvs}", flush=True)

    # ---- 1. ingest + clean ------------------------------------------
    t0 = time.time()
    spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    canon = spark.sql(url_canonical_sql("spark"))
    n_groups = canon.count()
    survivors = canon.selectExpr("keep_doc AS doc_id")
    red = spark.sql(redact_pii_sql("spark"))
    rep = spark.sql(repetition_ratio_sql("spark"))
    clean = (
        spark.table("documents")
        .join(survivors, "doc_id", "semi")                 # url dedup
        .join(red.select("doc_id", "n_redacted"), "doc_id")
        .join(rep.select("doc_id", "rep_ratio"), "doc_id")
        .filter("rep_ratio IS NULL OR rep_ratio < 0.9")    # spam filter
    )
    n_clean = clean.count()
    stage("clean", t0, url_groups=n_groups, kept=n_clean)

    # ---- 1b. language ID (trained trigram NB over the cleaned set) --
    t0 = time.time()
    from geostatssolvers_jl_spark.webtext.langmodel import langid_model

    pred = langid_model(spark, clean)
    n_langs = pred.select("pred_lang").distinct().count()
    stage("langid", t0, docs=n_clean, langs=n_langs)

    # ---- 1c. quality / keywords / topics / authority -----------------
    # (r6 continuation: the trained-classifier + clustering + link-graph
    # tier of the curation pipeline)
    t0 = time.time()
    from geostatssolvers_jl_spark.webtext.classifier import (
        logreg_score_sql, train_quality_model,
    )
    from geostatssolvers_jl_spark.webtext.clustering import (
        kmeans_fit_spark,
    )
    from geostatssolvers_jl_spark.webtext.graph import (
        pagerank_sql, synth_edges_sql,
    )
    from geostatssolvers_jl_spark.webtext.heavyhitters import heavy_hitters
    from geostatssolvers_jl_spark.webtext.ranking import tfidf_topterms

    clean.createOrReplaceTempView("documents")
    qm = train_quality_model(spark, iters=40, lr=1.0)
    w, b = qm.raw_weights()
    n_quality = spark.sql(logreg_score_sql(
        "spark", weights=w, bias=b)).filter("pred = 1").count()
    n_keywords = tfidf_topterms(spark, clean, topk=3).count()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    km = kmeans_fit_spark(spark, emb, n_centroids=8, iters=4)
    n_hot = heavy_hitters(spark, clean, phi=0.01).count()
    top_auth = spark.sql(pagerank_sql(
        "spark", edges_rel=None)).orderBy("rank_micro",
                                          ascending=False).first()
    stage("curate+", t0, quality_keep=n_quality, keywords=n_keywords,
          topics=int((km.sizes > 0).sum()), hot_tokens=n_hot,
          top_authority=int(top_auth["doc_id"]))

    # ---- 2. split ----------------------------------------------------
    t0 = time.time()
    clean.createOrReplaceTempView("documents")  # downstream reads the view
    split = spark.sql(split_assign_sql("spark"))
    n_train = split.filter("split = 'train'").count()
    stage("split", t0, train=n_train, total=n_clean)

    # ---- 3. georeference (of the CLEANED set) -----------------------
    t0 = time.time()
    pg = P.geocode(P.load_pages(spark, SF), res=6)
    pagesdf = pg.selectExpr(
        "doc_id AS data_id", "lon", "lat",
        "CAST(length(text) AS DOUBLE) AS z", "cell",
    ).join(clean.selectExpr("doc_id AS data_id"), "data_id", "semi")
    n_pages = pagesdf.count()
    stage("georef", t0, pages=n_pages)

    # ---- 3b. variography — fit the model FROM the data --------------
    # (the front end the reference delegates to Variography.jl: tiled
    # Matheron empirical variogram + WLS fit; the fitted model feeds
    # the kriging stage below instead of a hand-picked one)
    t0 = time.time()
    from geostatssolvers_jl_spark.variography import (
        empirical_variogram, fit_variogram,
    )

    emp = empirical_variogram(
        spark, pagesdf.selectExpr("data_id", "lon AS x", "lat AS y", "z"),
        maxlag=60.0, nlags=12)
    fitted_deg = fit_variogram(emp)
    # empirical lags are planar DEGREES; the kriging below runs under
    # haversine KM — rescale the fitted range (1° ≈ 111.19 km at the
    # equator; the demo-grade conversion, anisotropy ignored)
    fitted = type(fitted_deg)(range=fitted_deg.range * 111.19,
                              sill=fitted_deg.sill,
                              nugget=fitted_deg.nugget)
    stage("variography", t0, model=type(fitted).__name__,
          range_km=round(fitted.range, 1))

    # ---- 4. estimate -------------------------------------------------
    t0 = time.time()
    grid = CartesianGrid.from_extent((-180.0, -90.0), (180.0, 90.0), (90, 45))
    sol = solve_kriging(
        pagesdf, grid.spark_df(spark),
        model=KrigingModel(variogram=fitted),
        data_coord_cols=["lon", "lat"], maxneighbors=8,
        metric=Haversine(6371.0),
    )
    n_cells = sol.count()
    stage("krige", t0, cells=n_cells)

    # ---- 4b. zonal rollup of the solved raster (raster→vector) ------
    # a CONCAVE L-shaped zone (ear-clipped into triangles) + a convex
    # quad, first-match overlap — per-zone statistics over the kriging
    # surface in one scan + one aggregation
    t0 = time.time()
    from geostatssolvers_jl_spark.zones import (
        decompose_zones, zonal_stats_sql,
    )

    zones = [
        (1, [(-180.0, -90.0), (0.0, -90.0), (0.0, 0.0), (-90.0, 0.0),
             (-90.0, 90.0), (-180.0, 90.0)]),      # concave west L
        (2, [(-60.0, -90.0), (60.0, -90.0), (60.0, 90.0),
             (-60.0, 90.0)]),                      # overlapping quad
    ]
    sol.join(grid.spark_df(spark), "cell_id") \
        .createOrReplaceTempView("_demo_raster")
    zstats = spark.sql(zonal_stats_sql(
        "_demo_raster", decompose_zones(zones), value="z",
        lon="cx", lat="cy",
    )).collect()
    spark.catalog.dropTempView("_demo_raster")
    stage("zonal", t0, zones=len(zstats))

    # ---- 5. simulate -------------------------------------------------
    t0 = time.time()
    sim = solve_sgs(
        spark, CartesianGrid((40, 40)), nreals=4,
        params=SGSParams(variogram=GaussianVariogram(range=5.0),
                         maxneighbors=8),
        seed=1,
    )
    n_sim = sim.count()
    stage("simulate", t0, rows=n_sim, reals=4)

    # ---- 5b. categorical simulate + exceedance map (r6 continuation) -
    t0 = time.time()
    from geostatssolvers_jl_spark.operators.indicator import (
        solve_indicator_kriging,
    )
    from geostatssolvers_jl_spark.simulation.sis import (
        SISParams, solve_sis,
    )
    from geostatssolvers_jl_spark.variogram import SphericalVariogram

    med = pagesdf.selectExpr("percentile(z, 0.5) AS m").collect()[0]["m"]
    ccdf = solve_indicator_kriging(
        pagesdf.selectExpr("data_id", "lon AS x", "lat AS y", "z"),
        CartesianGrid((40, 20), (-180.0, -90.0), (9.0, 9.0))
        .spark_df(spark),
        thresholds=(med,),
        model=KrigingModel(variogram=GaussianVariogram(
            range=2000.0, sill=0.25)),
        maxneighbors=8, strategy="local-broadcast",
        metric=Haversine(6371.0), query_coord_cols=["cx", "cy"],
        data_coord_cols=["x", "y"],
    )
    n_ccdf = ccdf.count()
    sim_cat = solve_sis(
        spark, CartesianGrid((40, 40)), nreals=2,
        params=SISParams(
            variogram=SphericalVariogram(range=6.0, sill=0.25),
            maxneighbors=8),
        seed=2,
    )
    n_cat = sim_cat.count()
    stage("simulate-cat", t0, ccdf_cells=n_ccdf, sis_rows=n_cat)

    # ---- 6. sink -----------------------------------------------------
    t0 = time.time()
    out = Path(tempfile.mkdtemp(prefix="geostats_demo_")) / "solution"
    write_solution(sol, str(out), partition_by=None)
    n_back = spark.read.parquet(str(out)).count()
    stage("sink", t0, rows=n_back, path=out)

    # ---- 7. learn (distributed exact fit over the split) ------------
    t0 = time.time()
    from geostatssolvers_jl_spark.operators.learn import pointwise_learn

    lsrc = clean.join(split.select("doc_id", "split"), "doc_id").selectExpr(
        "CAST(length(text) AS DOUBLE) AS f_len",
        "CAST(n_chars AS DOUBLE) AS f_chars",
        "CAST(lang = 'en' AS INT) AS lab",
        "split",
    )
    pred2 = pointwise_learn(
        lsrc.filter("split = 'train'").select("f_len", "f_chars", "lab"),
        lsrc.filter("split <> 'train'").select("f_len", "f_chars"),
        ["f_len", "f_chars"], "lab", fit_strategy="distributed",
    )
    n_scored = pred2.count()
    stage("learn", t0, scored=n_scored, fit="distributed-exact")

    print(f"TOTAL {time.time() - t_all:.1f}s  OK")


if __name__ == "__main__":
    main()
