"""Checkpoint / resume with per-partition lineage + row-count metrics.

North-rule requirement: "every stage checkpoints per-partition lineage +
row-count metrics ... so a killed job resumes without recompute"
(BASELINE.json).  The reference has no notion of this (single-process);
it is an engine addition (SURVEY.md §2.9, §4).

Model: a *stage* writes its output partitioned by a **unit key** (tile
cell, realization id, shard id...).  Each successfully written unit gets a
manifest row ``(unit, rows, stage, wall_s)`` committed *after* the data.
On restart, `pending_units` anti-joins the input's units against the
manifest — only unfinished units are recomputed.  Unit writes are
idempotent (dynamic partition overwrite), so a crash between data and
manifest commit re-runs that unit harmlessly.

Sandbox backend is parquet directories; on a production cluster the same
two tables are Iceberg tables and the manifest commit is the Iceberg
snapshot commit — the control flow is identical, only ``format("iceberg")``
changes (`FORMAT` below).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FORMAT = "parquet"  # "iceberg" in production

MANIFEST_SCHEMA = "unit long, rows long, stage string, wall_s double"


def _manifest_path(base: str) -> str:
    return f"{base}/_lineage_manifest"


def _sidecar_write(spark: SparkSession, path: str, payload: str) -> None:
    """Write a tiny driver-side sidecar file through the Hadoop
    FileSystem API, so it lands next to the Spark-written data even when
    ``base`` is a non-local URI (hdfs://, s3a://) — a driver-local
    ``open()`` would silently write into a bogus local directory and the
    all-empty-stage resume fallback would never find it."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()


def _sidecar_read(spark: SparkSession, path: str) -> str | None:
    """Read a sidecar written by `_sidecar_write`; None if absent.
    Goes through the Hadoop FileSystem API (not ``spark.read.text`` —
    file sources IGNORE ``_``-prefixed files, and the underscore prefix
    is deliberate so the stage's parquet read skips the sidecar), so any
    URI the writer could reach is readable — no driver-local I/O.  One
    py4j round-trip per line; the sidecar is one JSON line."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    reader = jvm.java.io.BufferedReader(
        jvm.java.io.InputStreamReader(fs.open(jpath), "UTF-8")
    )
    try:
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
        return "\n".join(lines)
    finally:
        reader.close()


def read_manifest(spark: SparkSession, base: str, stage: str) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        m = spark.read.schema(MANIFEST_SCHEMA).format(FORMAT).load(
            _manifest_path(base)
        )
        return m.filter(F.col("stage") == stage)
    except AnalysisException:
        # path not found = fresh run.  A CORRUPT or transiently unreadable
        # manifest must SURFACE (a blanket except would silently schedule
        # a full recompute of every unit and append duplicate rows)
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def pending_units(
    units: DataFrame, spark: SparkSession, base: str, stage: str,
    unit_col: str = "unit",
) -> DataFrame:
    """Anti-join this stage's work units against the done-manifest."""
    done = read_manifest(spark, base, stage).select(
        F.col("unit").alias(unit_col)
    )
    return units.join(done, unit_col, "left_anti")


def commit_units(
    df: DataFrame,
    base: str,
    stage: str,
    unit_col: str = "unit",
    units: DataFrame | None = None,
) -> DataFrame:
    """Write one batch of finished units + their manifest rows.

    ``df`` must carry ``unit_col``; data lands partitioned by it so a
    re-run of the same unit overwrites in place (idempotent).  Returns the
    manifest rows written (the per-partition lineage record).

    ``units``: the FULL set of work units this batch covers — a unit whose
    compute legitimately produced zero rows still gets a manifest row
    (rows = 0); without it such units would stay pending forever and every
    'resume' would re-run the whole stage.
    """
    t0 = time.time()
    # persist so the manifest counts reuse the materialized rows instead of
    # re-executing the whole compute DAG (each unit's kriging would run
    # TWICE per commit otherwise — and a nondeterministic compute could
    # write counts that disagree with the committed data)
    df = df.withColumn("unit", F.col(unit_col).cast("long")).persist()
    try:
        (
            df.write.format(FORMAT)
            .mode("overwrite")
            .partitionBy("unit")
            .option("partitionOverwriteMode", "dynamic")
            .save(f"{base}/{stage}")
        )
        wall = time.time() - t0
        # schema sidecar (driver-side, tiny): an all-empty stage writes
        # ZERO parquet part files under partitionBy, so a later read
        # cannot infer the schema — the sidecar makes the empty stage
        # readable instead of wedging every subsequent resume
        import json as _json

        _sidecar_write(
            df.sparkSession,
            f"{base}/{stage}/_engine_schema.json",
            _json.dumps(df.schema.jsonValue()),
        )
        # lineage rows for THIS batch only — never rescan previously-
        # committed units (at 10^12-row scale a full rescan per batch is
        # the bottleneck)
        counts = df.groupBy("unit").agg(F.count(F.lit(1)).alias("rows"))
        if units is not None:
            allu = units.select(
                F.col(unit_col).cast("long").alias("unit")
            ).distinct()
            counts = allu.join(counts, "unit", "left").fillna(0, ["rows"])
        counts = counts.select(
            "unit", "rows", F.lit(stage).alias("stage"),
            F.lit(wall).alias("wall_s"),
        )
        # ONE execution of the counts plan feeds both the manifest append
        # and the returned rows: collect first (tiny — one row per unit),
        # then write the collected batch.  Appending the live plan and
        # re-executing it for the return value would run the counts twice,
        # and when `units` is supplied that plan reads the manifest path
        # being appended to (via pending_units' anti-join) — a file-index
        # refresh between the two executions would make the second see the
        # just-written rows and return a wrong result.
        rows = counts.collect()
        spark = df.sparkSession
        out = spark.createDataFrame(rows, counts.schema)
        out.write.format(FORMAT).mode("append").save(_manifest_path(base))
    finally:
        df.unpersist()
    return out


def run_stage_resumable(
    spark: SparkSession,
    base: str,
    stage: str,
    units: DataFrame,
    compute,  # Callable[[DataFrame], DataFrame]: pending units -> output rows
    unit_col: str = "unit",
) -> DataFrame:
    """Compute only unfinished units, commit data + lineage, return the
    stage's full output (previous + new)."""
    todo = pending_units(units, spark, base, stage, unit_col)
    if todo.limit(1).count() > 0:
        out = compute(todo)
        commit_units(out, base, stage, unit_col, units=todo)
    from pyspark.errors import AnalysisException

    try:
        return spark.read.format(FORMAT).load(f"{base}/{stage}")
    except AnalysisException:
        # a stage whose every unit legitimately produced 0 rows has
        # manifest entries but no data files — return a typed empty
        # frame from the schema sidecar instead of wedging every resume
        import json as _json

        from pyspark.sql.types import StructType

        txt = _sidecar_read(spark, f"{base}/{stage}/_engine_schema.json")
        if txt is not None:
            schema = StructType.fromJson(_json.loads(txt))
            return spark.createDataFrame([], schema)
        raise
