"""Explicit skew handling for hot tiles (north rule: "skewed hot tiles are
salted and re-sharded explicitly").

AQE's skew-join splitting handles shuffle-join skew, but grouped
`applyInPandas` work keyed by tile cell is invisible to it: one hot cell
(a dense metro area at 10¹² pages) becomes one giant task.  `salt_hot_keys`
re-shards such cells *explicitly*: cells whose row count exceeds the
threshold get a salt column derived from a stable row hash, splitting each
hot cell into `ceil(count/threshold)` subgroups; cold cells keep salt 0.
Downstream grouped work keys on (cell, salt); aggregations that must see
the whole cell re-combine with a second (tiny) agg keyed by cell — the
classic two-stage salted aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_hot_keys(
    df: DataFrame,
    key: str = "cell",
    threshold: int = 100_000,
    hash_cols: list[str] | None = None,
) -> DataFrame:
    """Add a ``salt`` column: 0 for cold keys; 0..n_salt-1 for hot keys,
    derived from a deterministic row hash (never random — resume-safe)."""
    # default: hash ALL non-key columns — hashing just one (e.g. a
    # low-cardinality lang column constant within a hot metro cell) makes
    # the salt a single value and the re-shard a silent no-op
    hash_cols = hash_cols or [c for c in df.columns if c != key]
    if not hash_cols:
        raise ValueError(
            "salt_hot_keys needs at least one non-key column to hash "
            "(a key-only frame has no deterministic row identity to salt on)"
        )
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("_cnt"))
    hot = counts.filter(F.col("_cnt") > threshold).select(
        key,
        F.ceil(F.col("_cnt") / threshold).cast("int").alias("_n_salt"),
    )
    # NULL-safe equality: groupBy counts the NULL-key group (e.g. 10⁶
    # failed-geocode rows with cell=NULL), but a plain `key` join can't
    # match NULL==NULL — the hottest group would silently keep salt 0,
    # the exact giant-task problem this function exists to fix
    out = df.join(
        F.broadcast(hot), df[key].eqNullSafe(hot[key]), "left"
    ).drop(hot[key])
    return out.withColumn(
        "salt",
        F.when(
            F.col("_n_salt").isNull(), F.lit(0)
        ).otherwise(
            F.pmod(F.xxhash64(*[F.col(c) for c in hash_cols]), F.col("_n_salt")).cast("int")
        ),
    ).drop("_n_salt")


def two_stage_count(df: DataFrame, key: str = "cell",
                    threshold: int = 100_000) -> DataFrame:
    """Salted two-stage aggregation example: per-key counts that never
    build a single hot-task — partial agg on (key, salt), final on key."""
    salted = salt_hot_keys(df, key, threshold)
    partial = salted.groupBy(key, "salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("n_rows"))
