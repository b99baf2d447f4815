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
