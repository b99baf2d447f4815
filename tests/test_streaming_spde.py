"""Structured-Streaming ingest + SPDEGS smoke/semantics tests."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from geostatssolvers_jl_spark.grid import CartesianGrid
from geostatssolvers_jl_spark.simulation.spde import solve_spdegs


def test_spdegs_smoke_and_smoothness(spark):
    grid = CartesianGrid((30, 30))
    sol = solve_spdegs(spark, grid, nreals=3, correlation_length=5.0, seed=2)
    pdf = sol.toPandas()
    assert len(pdf) == 3 * 900
    Z = pdf.pivot(index="cell_id", columns="real_id", values="z").to_numpy()
    Z = Z.reshape(30, 30, 3, order="F")
    # spatial smoothness: adjacent-cell correlation far above lag-10
    a = np.corrcoef(Z[:-1].ravel(), Z[1:].ravel())[0, 1]
    b = np.corrcoef(Z[:-10].ravel(), Z[10:].ravel())[0, 1]
    assert a > 0.8 and a > b + 0.2
    # determinism
    sol2 = solve_spdegs(spark, grid, nreals=3, correlation_length=5.0, seed=2)
    assert sorted(pdf.itertuples(index=False)) == sorted(
        sol2.toPandas().itertuples(index=False)
    )


def test_streaming_tile_counts(spark, tmp_path):
    from geostatssolvers_jl_spark.streaming.ingest import (
        run_available,
        stream_pages,
        tile_counts_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    rows = []
    for i in range(200):
        rows.append({
            "url": f"https://s.example.org/{i}",
            "warc_ts": f"2024-01-01T00:{i % 60:02d}:00.000Z",
            "text": f"stream document number {i} with deterministic text",
            "lang": "en",
        })
    (drop / "batch1.json").write_text(
        "\n".join(json.dumps(r) for r in rows[:120])
    )
    (drop / "batch2.json").write_text(
        "\n".join(json.dumps(r) for r in rows[120:])
    )

    stream = tile_counts_stream(stream_pages(spark, str(drop)), res=4)
    # complete mode sees every window; append (production) would emit only
    # watermark-closed ones — that cut is asserted separately below
    out = run_available(stream, str(tmp_path / "ckpt"), mode="complete")
    assert sum(r["n_pages"] for r in out) == 200

    stream2 = tile_counts_stream(stream_pages(spark, str(drop)), res=4)
    closed = run_available(stream2, str(tmp_path / "ckpt2"), mode="append")
    # events span 00:00–00:59, watermark 30m ⇒ only windows ending ≤ 00:29
    assert 0 < sum(r["n_pages"] for r in closed) < 200
    # only windows ENDING before the 00:29 watermark may close —
    # minute <= 30 would tolerate a leaked just-beyond-watermark window
    assert all(r["window"]["end"].minute < 30 for r in closed)
    assert all(r["window"]["end"].minute <= 30 for r in closed)
    # tile assignment identical to the batch expression
    from geostatssolvers_jl_spark import tiling
    from geostatssolvers_jl_spark.sources.pages import lat_expr, lon_expr

    batch = spark.createDataFrame(
        [(r["text"],) for r in rows], "text string"
    ).selectExpr(
        f"{tiling.cell_expr(lon_expr('text'), lat_expr('text'), 4)} AS cell"
    )
    batch_cells = {r["cell"] for r in batch.collect()}
    stream_cells = {r["cell"] for r in out}
    assert stream_cells == batch_cells


def test_spdegs_scales_past_dense_bound(spark):
    """The matrix-free CG sampler must handle grids far beyond the dense
    Cholesky bound (round 1: <= 20k cells) in one task."""
    grid = CartesianGrid((300, 300))  # 90k cells — 4.5x the old bound
    sol = solve_spdegs(spark, grid, nreals=1, correlation_length=8.0, seed=4)
    pdf = sol.toPandas()
    assert len(pdf) == 90000
    s = pdf.z.std()
    assert 0.5 < s < 2.0  # sigma-normalized field


def test_incremental_cell_stats_stateful(spark, tmp_path):
    """applyInPandasWithState custom operator: state accumulates ACROSS
    triggers (second drop of files updates the same tiles' running
    moments through the checkpoint) and matches the batch moments."""
    import numpy as np

    from geostatssolvers_jl_spark.streaming.ingest import (
        incremental_cell_stats, run_available, stream_pages,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    ck = str(tmp_path / "ckpt")

    def rows(lo, hi):
        return [{
            "url": f"https://s.example.org/{i}",
            "warc_ts": "2024-01-01T00:00:00.000Z",
            "text": f"stream document number {i} " + "x" * (i % 37),
            "lang": "en",
        } for i in range(lo, hi)]

    (drop / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in rows(0, 120)))

    def run(qname):
        collected = []

        def sink(df, _bid):
            collected.extend(df.collect())

        stream = incremental_cell_stats(stream_pages(spark, str(drop)), res=3)
        q = (
            stream.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        return collected

    out1 = run("cs1")
    assert sum(r["n_pages"] for r in out1) == 120

    (drop / "b2.json").write_text(
        "\n".join(json.dumps(r) for r in rows(120, 200)))
    out2 = run("cs2")
    # updated rows carry CUMULATIVE counts: totals over latest-per-cell
    latest = {r["cell"]: r for r in out2}
    got = {c: r["n_pages"] for c, r in latest.items()}
    for c, r in {r["cell"]: r for r in out1}.items():
        got.setdefault(c, r["n_pages"])
    assert sum(got.values()) == 200
    # moments match the batch computation for one touched cell
    from geostatssolvers_jl_spark import tiling
    from geostatssolvers_jl_spark.sources.pages import lat_expr, lon_expr

    batch = spark.createDataFrame(
        [(r["text"],) for r in rows(0, 200)], "text string"
    ).selectExpr(
        f"{lon_expr('text')} AS lon", f"{lat_expr('text')} AS lat",
        "CAST(length(text) AS DOUBLE) AS z",
    ).selectExpr(f"{tiling.cell_expr('lon', 'lat', 3)} AS cell", "z")
    want = {
        r["cell"]: (r["n"], r["m"]) for r in batch.groupBy("cell").agg(
            F.count("z").alias("n"), F.avg("z").alias("m")).collect()
    }
    for c, r in latest.items():
        n, m = want[c]
        assert r["n_pages"] == n
        assert np.isclose(r["mean_len"], m)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Exact streaming dedup: duplicate texts inside the watermark horizon
    are suppressed (first-seen wins), distinct texts all pass; the dedup
    key is the same md5 fingerprint as the batch dedup_exact entry."""
    from geostatssolvers_jl_spark.streaming.ingest import (
        dedup_stream, run_available, stream_pages,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    rows = []
    for i in range(60):
        rows.append({
            "url": f"https://s.example.org/{i}",
            "warc_ts": f"2024-01-01T00:{i % 60:02d}:00.000Z",
            # 20 distinct texts, each repeated 3x under different urls
            "text": f"duplicated stream document number {i % 20}",
            "lang": "en",
        })
    (drop / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in rows[:40])
    )
    (drop / "b2.json").write_text(
        "\n".join(json.dumps(r) for r in rows[40:])
    )

    out = run_available(
        dedup_stream(stream_pages(spark, str(drop)), watermark="2 hours"),
        str(tmp_path / "ckpt"),
        mode="append",
    )
    md5s = [r["text_md5"] for r in out]
    assert len(md5s) == 20          # one survivor per distinct text
    assert len(set(md5s)) == 20


def test_streaming_dedup_null_rows_do_not_collapse(spark, tmp_path):
    """NULL-text pages key on url; NULL-text AND NULL-url pages key on
    their timestamp — neither group may collapse to one survivor (r3
    advice: concat('null:', url) is NULL when url is NULL, and
    dropDuplicatesWithinWatermark treats NULL keys as duplicates)."""
    import json as _json

    from geostatssolvers_jl_spark.streaming.ingest import (
        dedup_stream, run_available, stream_pages,
    )

    drop = tmp_path / "drop_null"
    drop.mkdir()
    rows = [
        # 3 null-text pages with distinct urls
        {"url": f"https://n.example.org/{i}",
         "warc_ts": f"2024-01-01T00:0{i}:00.000Z", "text": None, "lang": "en"}
        for i in range(3)
    ] + [
        # 3 fully-null rows at distinct timestamps
        {"url": None, "warc_ts": f"2024-01-01T00:1{i}:00.000Z",
         "text": None, "lang": "en"}
        for i in range(3)
    ]
    (drop / "b.json").write_text("\n".join(_json.dumps(r) for r in rows))
    out = run_available(
        dedup_stream(stream_pages(spark, str(drop)), watermark="2 hours"),
        str(tmp_path / "ckpt_null"),
        mode="append",
    )
    assert len(out) == 6
    keys = [r["text_md5"] for r in out]
    assert len(set(keys)) == 6 and all(k is not None for k in keys)


def test_streaming_dedup_key_tiers_cannot_collide(spark, tmp_path):
    """A null-text page whose url starts with 'row:' must not share a
    dedup key with a fully-null row at the matching timestamp (r4 review:
    'null:' + 'row:X' == 'nullrow:' + 'X')."""
    import json as _json

    from geostatssolvers_jl_spark.streaming.ingest import (
        dedup_stream, run_available, stream_pages,
    )

    drop = tmp_path / "drop_collide"
    drop.mkdir()
    ts = "2024-01-01 00:05:00"
    rows = [
        {"url": f"row:{ts}", "warc_ts": "2024-01-01T00:05:00.000Z",
         "text": None, "lang": "en"},
        {"url": None, "warc_ts": "2024-01-01T00:05:00.000Z",
         "text": None, "lang": "en"},
    ]
    (drop / "b.json").write_text("\n".join(_json.dumps(r) for r in rows))
    out = run_available(
        dedup_stream(stream_pages(spark, str(drop)), watermark="2 hours"),
        str(tmp_path / "ckpt_collide"),
        mode="append",
    )
    assert len(out) == 2
    assert len({r["text_md5"] for r in out}) == 2


def test_streaming_sessionization_matches_batch(spark, tmp_path):
    """`sessionize_stream` (applyInPandasWithState, vectorized segment
    fold) must emit exactly the batch `sessionize_sql` sessions minus
    each user's final (still-open) one — including sessions that SPAN
    the two file drops (state carries the open session across triggers
    through the checkpoint)."""
    import json as _json

    from geostatssolvers_jl_spark.streaming.sessions import (
        sessionize_sql, sessionize_stream,
    )

    drop = tmp_path / "events_drop"
    drop.mkdir()
    ck = str(tmp_path / "sess_ckpt")
    base = 1_700_000_000  # epoch seconds
    # user 1: three sessions (gaps 2000 s); user 2: one long session
    # spanning both drops; user 3: single event (stays open, never emits)
    def ev(uid, off, val):
        from datetime import datetime, timezone

        ts = datetime.fromtimestamp(base + off, tz=timezone.utc)
        return {"user_id": uid,
                "ts": ts.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z",
                "value": val}

    batch1 = ([ev(1, 0, 1.0), ev(1, 60, 2.0), ev(1, 2500, 3.0)]
              + [ev(2, 0, 5.0), ev(2, 900, 5.0)])
    batch2 = ([ev(1, 2600, 4.0), ev(1, 6000, 9.0)]
              + [ev(2, 1800, 5.0)] + [ev(3, 0, 7.0)])
    (drop / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in batch1))

    schema = "user_id long, ts timestamp, value double"
    collected = []

    def run():
        stream = sessionize_stream(
            spark.readStream.schema(schema).json(str(drop)), gap_s=1800
        )
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(lambda df, _b: collected.extend(df.collect()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)

    run()
    (drop / "b2.json").write_text(
        "\n".join(_json.dumps(r) for r in batch2))
    run()

    got = sorted(
        (r["user_id"], r["n_events"], r["start_us"], r["end_us"],
         round(r["total_value"], 6))
        for r in collected
    )
    # batch reference over ALL events
    allrows = [(i, r["user_id"], r["ts"].replace("Z", "+00:00"),
                r["value"]) for i, r in enumerate(batch1 + batch2)]
    bdf = spark.createDataFrame(
        [(i, u, t, v) for i, u, t, v in allrows],
        "event_id long, user_id long, ts_s string, value double",
    ).selectExpr("event_id", "user_id",
                 "to_timestamp(ts_s) AS ts", "value")
    bdf.createOrReplaceTempView("_sess_events")
    batch = spark.sql(sessionize_sql("spark", "_sess_events")).collect()
    # drop each user's LAST session (still open in the stream)
    last_no = {}
    for r in batch:
        last_no[r["user_id"]] = max(
            last_no.get(r["user_id"], 0), r["session_no"])
    want = sorted(
        (r["user_id"], r["n_events"], r["start_us"], r["end_us"],
         round(r["total_value"], 6))
        for r in batch if r["session_no"] != last_no[r["user_id"]]
    )
    assert got == want and len(got) == 2  # user1 closed 2 sessions


def test_streaming_sessionization_multi_chunk_ordering(spark, tmp_path):
    """Arrow delivers a group's rows in chunks with no cross-chunk order
    guarantee — with maxRecordsPerBatch forced tiny, sessions spanning
    chunk boundaries must still come out time-ordered (regression for
    the concat-before-sort fix)."""
    import json as _json
    from datetime import datetime, timezone

    from geostatssolvers_jl_spark.streaming.sessions import (
        sessionize_sql, sessionize_stream,
    )

    drop = tmp_path / "mc_drop"
    drop.mkdir()
    ck = str(tmp_path / "mc_ckpt")
    base = 1_700_000_000
    # one user, 30 events in 3 sessions of 10 (gaps 5000 s); written in
    # REVERSED order so any chunk-local sort sees descending time
    evs = []
    for sess in range(3):
        for i in range(10):
            off = sess * 5000 + i * 10
            ts = datetime.fromtimestamp(base + off, tz=timezone.utc)
            evs.append({
                "user_id": 1,
                "ts": ts.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z",
                "value": 1.0,
            })
    evs.reverse()
    (drop / "b1.json").write_text("\n".join(_json.dumps(r) for r in evs))

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    collected = []
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
        schema = "user_id long, ts timestamp, value double"
        stream = sessionize_stream(
            spark.readStream.schema(schema).json(str(drop)), gap_s=1800
        )
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(lambda df, _b: collected.extend(df.collect()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )
    # sessions 1 and 2 closed (10 events each, total 10.0); session 3
    # stays open in state
    got = sorted((r["n_events"], round(r["total_value"], 6))
                 for r in collected)
    assert got == [(10, 10.0), (10, 10.0)], collected


def test_sessionize_sql_matches_numpy_reference(spark):
    """Batch sessionization vs an independent numpy reference over a
    seeded random corpus (50 users × ~40 events, random gaps straddling
    the threshold) — session boundaries, counts, extents, and value
    sums must all agree."""
    import numpy as np
    from datetime import datetime, timezone

    from geostatssolvers_jl_spark.streaming.sessions import sessionize_sql

    rng = np.random.default_rng(29)
    gap_s = 1800
    rows = []
    expected = []
    eid = 0
    base = 1_700_000_000_000_000  # micros
    for uid in range(50):
        n = int(rng.integers(1, 40))
        # gaps cluster around the threshold to exercise the boundary
        gaps = rng.choice(
            [10_000_000, 1_799_000_000, 1_800_000_000, 1_801_000_000,
             5_000_000_000],
            size=n,
        )
        t = base + int(rng.integers(0, 10**9))
        us = []
        for g in gaps:
            us.append(t)
            t += int(g)
        vals = np.round(rng.uniform(0, 10, n), 2)
        for u, v in zip(us, vals):
            ts = datetime.fromtimestamp(u / 1e6, tz=timezone.utc)
            rows.append((eid, uid,
                         ts.strftime("%Y-%m-%d %H:%M:%S.%f"), float(v)))
            eid += 1
        # numpy reference: strict > gap starts a new session
        us_a = np.array(us)
        breaks = np.concatenate(
            ([0], np.nonzero(np.diff(us_a) > gap_s * 1_000_000)[0] + 1,
             [n])
        )
        for sno in range(len(breaks) - 1):
            a, b = breaks[sno], breaks[sno + 1]
            expected.append((
                uid, sno + 1, b - a, int(us_a[a]), int(us_a[b - 1]),
                round(float(vals[a:b].sum()), 6),
            ))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, value double"
    ).selectExpr("event_id", "user_id",
                 "to_timestamp(ts_s) AS ts", "value")
    df.createOrReplaceTempView("_prop_events")
    got = sorted(
        (r["user_id"], r["session_no"], r["n_events"], r["start_us"],
         r["end_us"], round(r["total_value"], 6))
        for r in spark.sql(sessionize_sql("spark", "_prop_events")).collect()
    )
    assert got == sorted(expected)


def test_streaming_sessionization_late_data_monotone_state(spark, tmp_path):
    """Late events — even several late SEGMENTS with internal gaps —
    must merge into the open session without moving its end backwards:
    a later on-time event then continues the SAME session exactly as
    the batch form would (review finding r5: a late segment could
    hijack the open-session slot and permanently diverge the stream
    from the batch twin)."""
    import json as _json
    from datetime import datetime, timezone

    from geostatssolvers_jl_spark.streaming.sessions import (
        sessionize_stream,
    )

    drop = tmp_path / "late_drop"
    drop.mkdir()
    ck = str(tmp_path / "late_ckpt")
    base = 1_700_000_000

    def ev(off, val):
        ts = datetime.fromtimestamp(base + off, tz=timezone.utc)
        return {"user_id": 1,
                "ts": ts.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z",
                "value": val}

    collected = []

    def run():
        schema = "user_id long, ts timestamp, value double"
        stream = sessionize_stream(
            spark.readStream.schema(schema).json(str(drop)), gap_s=1800
        )
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(lambda df, _b: collected.extend(df.collect()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)

    # trigger 1: open session at offsets [10000, 10060]
    (drop / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in [ev(10000, 1.0), ev(10060, 1.0)]))
    run()
    # trigger 2: TWO late segments (0 and 5000 — internal gap 5000 s
    # > 1800) plus one on-time event 100 s after the open session's end
    (drop / "b2.json").write_text(
        "\n".join(_json.dumps(r) for r in
                  [ev(0, 10.0), ev(5000, 20.0), ev(10160, 1.0)]))
    run()
    # nothing closed yet: the on-time event CONTINUED the open session
    assert collected == [], collected
    # trigger 3: a gap closes it — one session with all 5 events,
    # start extended back to the earliest late event, end monotone
    (drop / "b3.json").write_text(_json.dumps(ev(20000, 1.0)))
    run()
    assert len(collected) == 1
    r = collected[0]
    assert r["n_events"] == 5
    assert r["start_us"] == base * 1_000_000
    assert r["end_us"] == (base + 10160) * 1_000_000
    assert round(r["total_value"], 6) == 33.0


def test_ts_to_us_resolution_pinned():
    """Timestamp→micros conversion must be identical whether pandas
    delivers datetime64[ns] or datetime64[us] (pandas-2.x resolution
    path): the old astype(int64)//1000 was silently 1000x off for [us]
    input (ADVICE r5)."""
    import pandas as pd

    from geostatssolvers_jl_spark.streaming.sessions import _ts_to_us

    stamps = ["2024-03-01 00:00:00.123456", "2024-03-01 06:30:15.000001"]
    ns = pd.Series(pd.to_datetime(stamps)).astype("datetime64[ns]")
    us = pd.Series(pd.to_datetime(stamps)).astype("datetime64[us]")
    got_ns = _ts_to_us(ns).tolist()
    got_us = _ts_to_us(us).tolist()
    assert got_ns == got_us
    # absolute anchor: epoch micros of the first stamp
    assert got_ns[0] == 1709251200123456


def test_streaming_sessionization_watermark_late_replay(spark, tmp_path):
    """`sessionize_stream_watermark` (VERDICT r5 item 4): late events
    within the watermark are incorporated EXACTLY — a session already
    provisionally emitted gets a corrected re-emission — and the
    is_final rows equal the batch sessions sealed by the final
    watermark (streaming-with-watermark ≡ batch on data older than the
    watermark).  Quiet users finalize through the event-time timeout."""
    import json as _json
    from datetime import datetime, timezone

    from geostatssolvers_jl_spark.streaming.sessions import (
        sessionize_sql, sessionize_stream_watermark,
    )

    drop = tmp_path / "wm_drop"
    drop.mkdir()
    ck = str(tmp_path / "wm_ckpt")
    base = 1_700_000_000
    gap_s, wm_s = 1800, 3600

    def ev(uid, off, val):
        ts = datetime.fromtimestamp(base + off, tz=timezone.utc)
        return {"user_id": uid,
                "ts": ts.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z",
                "value": val}

    # run1: u1 session A {0,60,120}, session B opens {10000}
    # run2: u1 LATE 9000 (behind max-event 10000 but ahead of the
    #        watermark 6400) -> B grows backwards to {9000,10000};
    #        13000 opens C.  A (end 120) finalizes (wm 6400, horizon
    #        4600).
    # run3: u2 only -> u1 untouched (timeout not yet passed)
    # run4: u2 far-future event -> watermark jumps; u1's TIMEOUT fires
    #        and finalizes B and C with no new u1 traffic.
    # u3: ONE session of 10 events spanning the horizon — once the
    # watermark passes, its frozen prefix must COMPRESS into the state
    # aggregate (bounded state) without changing the sealed totals
    runs = [
        [ev(1, 0, 1.0), ev(1, 60, 2.0), ev(1, 120, 3.0),
         ev(1, 10000, 4.0)]
        + [ev(3, 1000 * k, float(k)) for k in range(10)],
        [ev(1, 9000, 0.5), ev(1, 13000, 6.0), ev(3, 10000, 11.0)],
        [ev(2, 100000, 7.0), ev(1, 13100, 1.5)],
        [ev(2, 100100, 8.0)],
    ]
    schema = "user_id long, ts timestamp, value double"
    collected = []

    for i, batch in enumerate(runs):
        (drop / f"b{i}.json").write_text(
            "\n".join(_json.dumps(r) for r in batch))
        stream = sessionize_stream_watermark(
            spark.readStream.schema(schema).json(str(drop)),
            gap_s=gap_s, watermark_s=wm_s,
        )
        q = (
            stream.writeStream.outputMode("update")
            .foreachBatch(lambda df, _b: collected.extend(df.collect()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)

    US = 1_000_000
    finals = sorted(
        (r["user_id"], r["n_events"], r["start_us"], r["end_us"],
         round(r["total_value"], 6))
        for r in collected if r["is_final"]
    )
    # batch twin over ALL events (the late one included — it was inside
    # the watermark), restricted to sessions the final watermark sealed
    allrows = [(i, r["user_id"], r["ts"].replace("Z", "+00:00"),
                r["value"]) for i, r in
               enumerate(x for b in runs for x in b)]
    bdf = spark.createDataFrame(
        allrows, "event_id long, user_id long, ts_s string, value double"
    ).selectExpr("event_id", "user_id", "to_timestamp(ts_s) AS ts",
                 "value")
    bdf.createOrReplaceTempView("_wm_events")
    batch = spark.sql(
        sessionize_sql("spark", "_wm_events", gap_s=gap_s)).collect()
    spark.catalog.dropTempView("_wm_events")
    final_wm_us = (base + 100000 - wm_s) * US  # wm before the last batch
    want = sorted(
        (r["user_id"], r["n_events"], r["start_us"], r["end_us"],
         round(r["total_value"], 6))
        for r in batch if r["end_us"] + gap_s * US < final_wm_us
    )
    assert finals == want
    assert len(finals) == 4  # u1's A, B, C + u3's spanning session
    u3 = next(f for f in finals if f[0] == 3)
    assert u3 == (3, 11, base * US, (base + 10000) * US,
                  round(sum(range(10)) + 11.0, 6))
    # the LATE event genuinely corrected session B before it sealed:
    # final B spans [9000, 10000] with 2 events, and an earlier
    # PROVISIONAL emission of B carried only the on-time event
    b_final = next(f for f in finals
                   if f[2] == (base + 9000) * US)
    assert b_final[1] == 2 and b_final[3] == (base + 10000) * US
    prov_b = [r for r in collected if not r["is_final"]
              and r["user_id"] == 1
              and r["start_us"] == (base + 10000) * US
              and r["n_events"] == 1]
    assert prov_b, "pre-correction provisional emission of B missing"
    # selective re-emission (r6 review): at run3 u1's event 13100 only
    # touches session C — the untouched open session B must NOT be
    # re-broadcast; its corrected form was emitted exactly once (run2)
    prov_b2 = [r for r in collected if not r["is_final"]
               and r["user_id"] == 1
               and r["start_us"] == (base + 9000) * US]
    assert len(prov_b2) == 1, prov_b2
    # every batch session's FINAL state appeared among emissions
    # (corrections re-emitted; open tails provisionally emitted)
    emitted = {(r["user_id"], r["n_events"], r["start_us"], r["end_us"],
                round(r["total_value"], 6)) for r in collected}
    for r in batch:
        key = (r["user_id"], r["n_events"], r["start_us"], r["end_us"],
               round(r["total_value"], 6))
        assert key in emitted, f"batch session never emitted: {key}"


def test_watermark_sessionization_multi_chunk_ordering(spark, tmp_path):
    """The watermark operator concatenates Arrow chunks before sorting,
    like the absorb-mode one — with maxRecordsPerBatch forced tiny and
    events written in REVERSED order, sealed sessions must still come
    out exactly (the absorb-mode regression, extended to the new
    operator)."""
    import json as _json
    from datetime import datetime, timezone

    from geostatssolvers_jl_spark.streaming.sessions import (
        sessionize_stream_watermark,
    )

    drop = tmp_path / "wmc_drop"
    drop.mkdir()
    ck = str(tmp_path / "wmc_ckpt")
    base = 1_700_000_000
    evs = []
    for sess in range(3):
        for i in range(10):
            off = sess * 5000 + i * 10
            ts = datetime.fromtimestamp(base + off, tz=timezone.utc)
            evs.append({"user_id": 1,
                        "ts": ts.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3]
                        + "Z",
                        "value": 1.0})
    evs.reverse()
    (drop / "b1.json").write_text("\n".join(_json.dumps(r) for r in evs))
    # a far-future second drop advances the watermark past all three
    far = datetime.fromtimestamp(base + 10**6, tz=timezone.utc)
    (drop / "b2.json").write_text(_json.dumps({
        "user_id": 2,
        "ts": far.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z",
        "value": 0.0}))

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    collected = []
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
        schema = "user_id long, ts timestamp, value double"
        for _ in range(2):
            q = (
                sessionize_stream_watermark(
                    spark.readStream.schema(schema).json(str(drop)),
                    gap_s=1800, watermark_s=3600,
                )
                .writeStream.outputMode("update")
                .foreachBatch(
                    lambda df, _b: collected.extend(df.collect()))
                .option("checkpointLocation", ck)
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(300)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    US = 1_000_000
    finals = sorted(
        (r["n_events"], r["start_us"], r["end_us"],
         round(r["total_value"], 6))
        for r in collected if r["is_final"] and r["user_id"] == 1
    )
    want = [
        (10, (base + s * 5000) * US, (base + s * 5000 + 90) * US, 10.0)
        for s in range(3)
    ]
    assert finals == want, finals
