"""Explicit skew salting tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from geostatssolvers_jl_spark.skew import salt_hot_keys, two_stage_count


def test_salt_hot_keys(spark):
    # one hot key (50k rows), many cold ones
    df = spark.range(60000).selectExpr(
        "CASE WHEN id < 50000 THEN 7 ELSE 100 + id % 100 END AS cell",
        "id AS row_id",
    )
    salted = salt_hot_keys(df, "cell", threshold=10000, hash_cols=["row_id"])
    agg = salted.groupBy("cell").agg(
        F.countDistinct("salt").alias("n_salts"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    by_cell = {r["cell"]: r for r in agg}
    assert by_cell[7]["n_salts"] == 5  # 50k / 10k
    cold = [r for r in agg if r["cell"] != 7]
    assert all(r["n_salts"] == 1 for r in cold)
    # deterministic: same salt assignment on re-run (resume-safe)
    a = salted.orderBy("row_id").select("salt").collect()
    b = salt_hot_keys(df, "cell", threshold=10000, hash_cols=["row_id"]) \
        .orderBy("row_id").select("salt").collect()
    assert a == b


def test_two_stage_count_correct(spark):
    df = spark.range(30000).selectExpr("id % 3 AS cell", "id AS row_id")
    out = {r["cell"]: r["n_rows"] for r in
           two_stage_count(df, "cell", threshold=1000).collect()}
    assert out == {0: 10000, 1: 10000, 2: 10000}


def test_salt_hot_null_key(spark):
    """A hot NULL key (failed geocodes) must be salted too (r4 review:
    the null-unsafe join left every NULL-cell row at salt 0 — the exact
    giant-task problem the function exists to fix)."""
    df = spark.range(30000).selectExpr(
        "CASE WHEN id < 25000 THEN NULL ELSE 100 + id % 50 END AS cell",
        "id AS row_id",
    )
    salted = salt_hot_keys(df, "cell", threshold=5000, hash_cols=["row_id"])
    nulls = salted.filter("cell IS NULL")
    n_salts = nulls.select("salt").distinct().count()
    assert n_salts == 5  # 25k / 5k
