"""Incremental pages ingestion (Structured Streaming).

The reference has no streaming surface (SURVEY.md §2.9); the engine's
incremental story is (a) the batch checkpoint/resume in `lineage.py` and
(b) this Structured-Streaming ingest for continuously arriving crawl
shards: ``readStream`` over a parquet/json drop directory → geocode → tile
assign → watermarked per-tile/per-window counts → sink.  The same geocode
and tiling expressions as the batch path, so tile assignments are
identical whether a page arrived in a batch load or through the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tiling
from ..sources.pages import lat_expr, lon_expr

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, text string, lang string"
)


def stream_pages(spark: SparkSession, drop_dir: str) -> DataFrame:
    """Streaming DataFrame of pages from a drop directory."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .json(drop_dir)
    )


def _geocoded(pages: DataFrame, res: int, extra: list[str]) -> DataFrame:
    """Shared stream-side geocode + tile projection — the SAME lon/lat/
    cell expressions as the batch path (sources.pages), in one place, so
    batch and streaming tile assignments cannot silently diverge."""
    return pages.selectExpr(
        "url", "warc_ts", *extra,
        f"{lon_expr('text')} AS lon",
        f"{lat_expr('text')} AS lat",
    ).selectExpr(
        "*", f"{tiling.cell_expr('lon', 'lat', res)} AS cell"
    )


def tile_counts_stream(
    pages: DataFrame, res: int = 6, window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked per-tile page counts per event-time window — the
    streaming analogue of `q_tile_assign`; late pages beyond the watermark
    are dropped, state is bounded."""
    geo = _geocoded(pages, res, ["text", "lang"])
    return (
        geo.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.approx_count_distinct("url").alias("n_urls"),
        )
    )


def incremental_cell_stats(pages: DataFrame, res: int = 6) -> DataFrame:
    """CUSTOM STATEFUL operator (``applyInPandasWithState``): per-tile
    running moments (n, mean, variance) of page length, updated
    incrementally across micro-batches — the streaming analogue of the
    batch A1/A6 aggregations, with O(tiles) state that survives restarts
    through the checkpoint.  Emits one updated row per touched tile per
    trigger."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    geo = _geocoded(pages, res, ["CAST(length(text) AS DOUBLE) AS z"])

    def update(key, pdfs, state):
        n, s, s2 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["z"].sum())
            s2 += float((pdf["z"] * pdf["z"]).sum())
        state.update((n, s, s2))
        mean = s / n if n else 0.0
        yield pd.DataFrame({
            "cell": [key[0]], "n_pages": [n], "mean_len": [mean],
            "var_len": [max(s2 / n - mean * mean, 0.0) if n else 0.0],
        })

    return geo.groupBy("cell").applyInPandasWithState(
        update,
        outputStructType="cell long, n_pages long, mean_len double, "
                         "var_len double",
        stateStructType="n long, s double, s2 double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(pages: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """STREAMING exact dedup: first-seen wins per text fingerprint within
    the watermark horizon (`dropDuplicatesWithinWatermark` — state is
    bounded by the horizon, unlike a global dropDuplicates whose state
    grows with the corpus).  The batch analogue is the `dedup_exact`
    entry's min-per-md5 group; a page whose md5 already appeared inside
    the horizon is suppressed, so the downstream pipeline (geocode → tile
    → estimate) sees each text once.  At 10¹² docs the horizon IS the
    dedup contract: cross-horizon repeats re-enter, exactly like a
    re-crawl in a fresh batch run."""
    # NULL text would collapse to one NULL key and dropDuplicates* treats
    # NULL keys as duplicates of each other — null-text pages are NOT
    # duplicates, so they key on their url; null-text AND null-url rows
    # fall through to a timestamp key so they don't collapse either
    # (concat() is NULL if ANY argument is NULL, so each tier must be a
    # fully-non-null expression for the rows it covers)
    # tier prefixes must be mutually unreachable: 'nulltext:'+url can
    # never equal 'nullrow:'+ts (prefixes diverge at a fixed character),
    # whereas 'null:'+url collided with 'nullrow:'+ts for a url starting
    # with 'row:' — wrongly suppressing a distinct page
    fp = pages.selectExpr(
        "url", "warc_ts", "text",
        "coalesce(md5(text), concat('nulltext:', url), "
        "concat('nullrow:', cast(warc_ts AS string))) AS text_md5",
    )
    return fp.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["text_md5"]
    )


def run_available(stream_df: DataFrame, checkpoint: str,
                  mode: str = "append") -> list:
    """Drain everything currently available (Trigger.AvailableNow) into an
    in-memory table and return the rows — used by tests; production sinks
    swap ``format("memory")`` for Iceberg/parquet with the same semantics.
    ``append`` emits only watermark-closed windows (bounded state, the
    production mode); ``complete`` emits every window (test introspection).
    """
    import hashlib as _hashlib

    # per-checkpoint table name: a fixed name would collide across two
    # streams drained in one session (second start() fails or the collect
    # reads the wrong stream's table)
    name = "drain_" + _hashlib.md5(checkpoint.encode()).hexdigest()[:12]
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "AvailableNow drain did not finish within 300 s — partial "
            "results would otherwise be returned silently"
        )
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}").collect()
