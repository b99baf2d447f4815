"""Delimited / JSON georef sources (SURVEY §2.1 S2).

The reference loads conditioning data with ``readdlm`` and georefs it
(``georef((z=z,), collect(zip(x, y)))``, e.g.
``/root/reference/test/estimation/lwr.jl:40-48``).  Spark equivalents:
``spark.read.csv`` / ``spark.read.json`` with an explicit schema (schema
inference is a full extra scan at 100 TB — always pass one), plus a
deterministic ``data_id`` derived from the ROW CONTENT, not from
``monotonically_increasing_id`` (which depends on partitioning and would
make kNN tie-breaks irreproducible across cluster layouts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _content_id(cols: list[str]) -> str:
    """Deterministic 63-bit id from the row content: stable under any
    partitioning / file split (ties in kNN break on this id, so it must
    not depend on read order).  Collisions are detectable (distinct count
    drops) and astronomically unlikely below ~10⁹ rows per load."""
    # coalesce each column: '||' propagates NULL, which would give every
    # row with ANY missing field the same data_id = NULL — breaking the
    # deterministic tie-break contract and making the distinct-count
    # collision check blind (all NULLs count as one)
    parts = " || '|' || ".join(
        f"coalesce(CAST({c} AS STRING), '<NULL>')" for c in cols
    )
    return (
        f"CAST(conv(substr(md5({parts}), 1, 15), 16, 10) AS BIGINT)"
    )


def read_georef_delimited(
    spark: SparkSession,
    path: str,
    schema: str,
    coord_cols: list[str],
    sep: str = "\t",
    header: bool = False,
    id_col: str = "data_id",
) -> DataFrame:
    """Delimited file → georef'd DataFrame with deterministic ids.

    ``schema`` names every column (e.g. ``"x double, y double, z double"``);
    ``coord_cols`` marks the coordinate columns (the rest are variables).
    """
    df = spark.read.csv(path, sep=sep, schema=schema, header=header)
    cols = [f.split()[0] for f in schema.split(",")]
    dedup_key = [c.strip() for c in cols]
    out = df.selectExpr(f"{_content_id(dedup_key)} AS {id_col}", "*")
    for c in coord_cols:
        if c not in df.columns:
            raise ValueError(f"coordinate column {c!r} not in schema")
    return out


def read_georef_json(
    spark: SparkSession,
    path: str,
    schema: str,
    coord_cols: list[str],
    id_col: str = "data_id",
) -> DataFrame:
    """JSON-lines file → georef'd DataFrame with deterministic ids."""
    df = spark.read.schema(schema).json(path)
    cols = [f.split()[0].strip() for f in schema.split(",")]
    out = df.selectExpr(f"{_content_id(cols)} AS {id_col}", "*")
    for c in coord_cols:
        if c not in df.columns:
            raise ValueError(f"coordinate column {c!r} not in schema")
    return out


def write_solution(
    df: DataFrame, path: str, fmt: str = "parquet",
    partition_by: list[str] | None = None, mode: str = "overwrite",
) -> None:
    """Solution sink (S3): partitioned columnar write; production swaps
    ``fmt`` for 'iceberg' with identical semantics (see lineage.py for the
    checkpointed/resumable variant)."""
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def write_solution_table(
    df: DataFrame, table: str,
    partition_by: list[str] | None = None, mode: str = "append",
    provider: str = "parquet",
) -> None:
    """Catalog-table solution sink through the DataFrameWriterV2 path
    (``df.writeTo(...)``) — the exact API surface an Iceberg catalog
    implements.  Pointing ``table`` at a configured Iceberg catalog
    (``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``
    + ``provider='iceberg'``) runs the SAME code with snapshot semantics;
    this environment ships no Iceberg runtime, so the tested configuration
    is Spark's built-in V2 session catalog with the parquet provider (see
    SURVEY §8 for the precise tested/untested boundary).

    ``mode='append'`` creates the table on first write, appends after;
    ``mode='overwrite'`` is ``createOrReplace`` (a full-table replace —
    the V2 analogue of the path sink's overwrite).

    Tested/untested boundary (no Iceberg runtime ships here): the V2
    CREATE path (builder + partitionedBy) runs against the session
    catalog and is test-covered; ``writeTo(...).append()`` requires a V2
    catalog — the session catalog exposes parquet tables as v1 and Spark
    rejects V2 appends into them, so appends fall back to the equivalent
    v1 ``insertInto`` (positional, partition-aware; columns aligned to
    the table schema first) with a warnings-module notice.  On an Iceberg
    catalog the V2 append executes directly.  The fallback triggers match
    Spark's STRUCTURED error class first (``getErrorClass()`` — stable
    across message rewording) and only fall back to the current error
    text ("v1 table" / "TABLE_OPERATION"); if a future Spark changes
    both, the sink fails loudly instead of silently switching paths —
    the correct failure direction for a write."""
    from pyspark.sql import functions as F
    from pyspark.errors import AnalysisException

    def _is_v1_rejection(e, needle: str) -> bool:
        # structured error class beats message-substring matching: the
        # class survives message rewording across Spark minors.  Match
        # ONLY the TABLE_OPERATION subclass — a bare UNSUPPORTED_FEATURE
        # match would route unrelated rejections (e.g. an unsupported
        # partition spec) into the drop+create fallback and destroy the
        # existing table where a re-raise would have left it intact
        try:
            ec = e.getErrorClass() or ""
        except Exception:
            ec = ""
        if "TABLE_OPERATION" in ec:
            return True
        return needle in str(e)

    spark = df.sparkSession
    wt = df.writeTo(table).using(provider)
    if partition_by:
        wt = wt.partitionedBy(*[F.col(c) for c in partition_by])
    if mode == "overwrite":
        try:
            wt.createOrReplace()
        except AnalysisException as e:
            if not _is_v1_rejection(e, "TABLE_OPERATION"):
                raise
            # v1 session catalog: no REPLACE TABLE AS SELECT — drop+create
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            wt.create()
    elif mode == "append":
        if spark.catalog.tableExists(table):
            try:
                df.writeTo(table).append()
            except AnalysisException as e:
                if not _is_v1_rejection(e, "v1 table"):
                    raise
                # session-catalog (v1) fallback; identical row semantics.
                # insertInto is positional and partition-aware, so align
                # columns to the table schema first
                import warnings

                warnings.warn(
                    f"{table} is a v1 catalog table; appending via "
                    "insertInto instead of DataFrameWriterV2"
                )
                cols = spark.table(table).columns
                df.select(*cols).write.insertInto(table)
        else:
            wt.create()
    else:
        raise ValueError(f"unknown mode: {mode}")
