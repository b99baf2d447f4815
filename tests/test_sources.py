"""Delimited / JSON georef sources: deterministic content ids, schema
enforcement, round trips (SURVEY §2.1 S2/S3)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from geostatssolvers_jl_spark.sources.delimited import (
    read_georef_delimited, read_georef_json, write_solution,
)

DATA_DIR = Path(__file__).parent / "data"


def test_delimited_deterministic_ids(spark):
    df = read_georef_delimited(
        spark, str(DATA_DIR / "coords.txt"),
        "x double, y double, z double", ["x", "y"],
    )
    rows = df.collect()
    A = np.loadtxt(DATA_DIR / "coords.txt")
    assert len(rows) == len(A)
    ids1 = sorted(r["data_id"] for r in rows)
    assert len(set(ids1)) == len(A)  # no content collisions on this file
    # ids stable under repartitioning (content-derived, not positional)
    ids2 = sorted(
        r["data_id"]
        for r in read_georef_delimited(
            spark, str(DATA_DIR / "coords.txt"),
            "x double, y double, z double", ["x", "y"],
        ).repartition(13).collect()
    )
    assert ids1 == ids2
    with pytest.raises(ValueError):
        read_georef_delimited(
            spark, str(DATA_DIR / "coords.txt"),
            "x double, y double, z double", ["lon"],
        )


def test_json_source_and_solution_sink(spark, tmp_path):
    src = tmp_path / "pts.jsonl"
    src.write_text("\n".join(
        json.dumps({"x": float(i), "y": float(i % 5), "z": i * 0.5})
        for i in range(40)
    ))
    df = read_georef_json(
        spark, str(src), "x double, y double, z double", ["x", "y"],
    )
    assert df.count() == 40
    assert df.select("data_id").distinct().count() == 40

    # sink: partitioned write + read-back equality
    out = tmp_path / "sol"
    from geostatssolvers_jl_spark.operators.idw import solve_idw
    from geostatssolvers_jl_spark.grid import CartesianGrid

    grid = CartesianGrid((10, 10))
    sol = solve_idw(df, grid.spark_df(spark), maxneighbors=3,
                    strategy="local-broadcast")
    write_solution(sol.withColumn("shard", sol.cell_id % 4), str(out),
                   partition_by=["shard"])
    back = spark.read.parquet(str(out))
    assert back.count() == 100
    a = {r["cell_id"]: r["z"] for r in sol.collect()}
    b = {r["cell_id"]: r["z"] for r in back.collect()}
    assert a == b


def test_spark_submit_pyfiles_deployment():
    """The north star's deployment mode: the engine arrives ONLY via
    `spark-submit --py-files pkg.zip` (PYTHONPATH scrubbed) and runs the
    flagship pipeline shape end-to-end — executors import the package from
    the shipped zip, not the checkout."""
    import os
    import subprocess
    import sys
    import tempfile
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    with tempfile.TemporaryDirectory() as td:
        zip_path = str(Path(td) / "pkg.zip")
        subprocess.run(
            [sys.executable, str(root / "tools" / "make_pyfiles_zip.py"),
             zip_path],
            check=True, cwd=td,
        )
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        out = subprocess.run(
            ["spark-submit", "--master", "local[4]",
             "--py-files", zip_path,
             str(root / "tools" / "submit_smoke_job.py")],
            capture_output=True, text=True, timeout=300, env=env, cwd=td,
        )
        assert "SUBMIT_SMOKE rows=2592 non_null=2592" in out.stdout, (
            out.stdout[-2000:], out.stderr[-2000:],
        )


def test_write_solution_table_v2_append(spark, tmp_path):
    """The catalog sink exercises the REAL DataFrameWriterV2
    create/append path (the API an Iceberg catalog implements) against
    the built-in V2 session catalog: first write creates, later writes
    append, results and partitioning readable back through the catalog."""
    from geostatssolvers_jl_spark.sources.delimited import (
        write_solution_table,
    )

    # unique per pytest run: a previous session's orphaned managed-table
    # location (spark-warehouse/<name>) blocks create even after DROP
    tbl = f"spark_catalog.default.sol_v2_{abs(hash(str(tmp_path))) % 10**8}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    a = spark.createDataFrame(
        [(0, 1.5, 10), (1, 2.5, 10), (2, 3.5, 11)],
        "cell_id long, z double, unit int",
    )
    write_solution_table(a, tbl, partition_by=["unit"], mode="append")
    b = spark.createDataFrame([(3, 4.5, 12)], "cell_id long, z double, unit int")
    write_solution_table(b, tbl, mode="append")
    got = spark.table(tbl)
    assert got.count() == 4
    assert {r["unit"] for r in got.select("unit").distinct().collect()} == {10, 11, 12}
    # overwrite = createOrReplace (full replace)
    write_solution_table(b, tbl, mode="overwrite")
    assert spark.table(tbl).count() == 1
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_iceberg_catalog_roundtrip_or_recorded_proof(spark, tmp_path):
    """North-rule closure for the Iceberg claim: if an Iceberg Spark
    runtime jar is available, run a REAL catalog create → V2 append →
    snapshot-read round-trip; otherwise skip with the recorded proof
    that this sandbox cannot ship the jar (no jar anywhere on the
    filesystem, no network to fetch one — verified 2026-08-17:
    `find / -name '*iceberg*.jar'` empty, Maven Central DNS resolution
    fails).  The moment a jar lands in pyspark/jars or SPARK_CLASSPATH,
    this test stops skipping and the V2 append path gets live coverage.
    The live path runs in a SUBPROCESS: an Iceberg catalog must be
    registered at session build time, and stopping/rebuilding the
    session-scoped fixture in-process would poison every later test."""
    import glob
    import os
    import subprocess
    import sys

    jar_dirs = []
    try:
        import pyspark

        jar_dirs.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:
        pass
    jar_dirs += os.environ.get("SPARK_CLASSPATH", "").split(os.pathsep)
    jars = [
        j for d in jar_dirs if d
        for j in glob.glob(os.path.join(d, "*iceberg*spark*.jar"))
    ]
    if not jars:
        pytest.skip(
            "no Iceberg Spark runtime jar on the classpath and no "
            "network to fetch one (environment limit, not a code gap — "
            "see SURVEY §8)"
        )
    script = f"""
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
from pyspark.sql import SparkSession
from geostatssolvers_jl_spark.sources.delimited import write_solution_table

wh = {repr(str(tmp_path / 'iceberg_wh'))}
s2 = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.ice.type", "hadoop")
    .config("spark.sql.catalog.ice.warehouse", wh)
    .getOrCreate()
)
df = s2.createDataFrame(
    [(0, 1.5, 10), (1, 2.5, 11)], "cell_id long, z double, unit int"
)
write_solution_table(df, "ice.db.sol", partition_by=["unit"],
                     mode="append", provider="iceberg")
write_solution_table(df, "ice.db.sol", mode="append", provider="iceberg")
assert s2.table("ice.db.sol").count() == 4
snaps = s2.sql("SELECT * FROM ice.db.sol.snapshots").count()
assert snaps >= 2  # one per commit — the Iceberg lineage contract
s2.stop()
print("ICEBERG_ROUNDTRIP_OK")
"""
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ICEBERG_ROUNDTRIP_OK" in res.stdout
