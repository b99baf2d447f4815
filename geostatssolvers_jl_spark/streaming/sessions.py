"""Gap-based event sessionization — batch AND streaming forms.

A session is a maximal run of one user's events where consecutive gaps
are ≤ ``gap_s`` seconds — the classic clickstream/training-telemetry
operator.  The reference has no notion of it (SURVEY §2.9: no streaming
surface); it belongs to the engine's north-rule incremental story.

Two implementations over the same semantics:

* `sessionize_sql` — batch, portable SQL (lag → gap flag → running sum
  session number → per-session aggregation).  All arithmetic is INTEGER
  MICROSECONDS (``unix_micros`` / ``epoch_us``), so the DuckDB twin is
  value-exact: no timestamp-to-float rounding and no timezone
  dependence (the events_hourly lesson).  Scale shape: two windows and
  one aggregation, all partitioned by ``user_id`` — one shuffle key end
  to end, AQE-splittable, skew bounded by the hottest user.
* `sessionize_stream` — Structured Streaming custom stateful operator
  (``applyInPandasWithState``): per-user state carries the OPEN
  session; each trigger merges the user's new events in event-time
  order, emits every session CLOSED by an observed gap, and keeps the
  still-open tail in state.  The open session is emitted only when a
  later event closes it — so the streaming output over any replayed
  prefix equals the batch result minus each user's final (still-open)
  session, which is exactly what tests/test_streaming_spde.py pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _micros(dialect: str, ts: str) -> str:
    # events.ts is TIMESTAMP_NTZ: Spark's unix_micros rejects NTZ, and a
    # CAST to TIMESTAMP would interpret the wall time in the SESSION
    # timezone (the events_hourly lesson).  unix_timestamp(NTZ) +
    # date_format microseconds is timezone-independent and equals
    # DuckDB's epoch_us exactly (verified at both UTC and +05:30).
    if dialect == "spark":
        return (
            f"(CAST(unix_timestamp({ts}) AS BIGINT) * 1000000 "
            f"+ CAST(date_format({ts}, 'SSSSSS') AS BIGINT))"
        )
    return f"epoch_us({ts})"


def sessionize_sql(dialect: str, events_rel: str = "events",
                   gap_s: int = 1800) -> str:
    """(user_id, session_no, n_events, start_us, end_us, total_value) —
    one row per session, session_no 1-based per user in time order.
    Ties on identical timestamps break by event_id (deterministic)."""
    us = _micros(dialect, "ts")
    gap_us = gap_s * 1_000_000
    return f"""
WITH _e AS (
  SELECT user_id, event_id, {us} AS us, value FROM {events_rel}
), _lag AS (
  SELECT user_id, event_id, us, value,
         lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS prev_us
  FROM _e
), _mark AS (
  SELECT user_id, event_id, us, value,
         CASE WHEN prev_us IS NULL OR us - prev_us > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM _lag
), _sess AS (
  SELECT user_id, us, value,
         CAST(sum(new_s) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_no
  FROM _mark
)
SELECT user_id, session_no,
       CAST(count(*) AS BIGINT) AS n_events,
       min(us) AS start_us, max(us) AS end_us,
       round(sum(value), 6) + 0.0 AS total_value
FROM _sess GROUP BY user_id, session_no"""


SESSION_STATE_SCHEMA = (
    "start_us long, last_us long, n_events long, total_value double"
)
SESSION_OUT_SCHEMA = (
    "user_id long, n_events long, start_us long, end_us long, "
    "total_value double"
)


def _ts_to_us(series):
    """Timestamp Series → int64 epoch MICROseconds, resolution-pinned.

    Arrow/pandas may deliver the column as datetime64[ns] or
    datetime64[us] (pandas-2.x resolution path); a bare
    ``astype(int64) // 1000`` would be silently 1000x off in the [us]
    case.  Converting through datetime64[us] pins the unit regardless
    of the delivered resolution."""
    return series.to_numpy(dtype="datetime64[us]").astype("int64")


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Streaming sessionization: ``events`` is a streaming DataFrame with
    (user_id long, ts timestamp, value double).  Emits one row per
    session CLOSED by an observed gap; the open tail session lives in
    state across triggers (checkpointed — a restarted query resumes its
    open sessions).

    In-order contract: within and across triggers events are merged in
    event-time order per user; LATE events (older than the open
    session's last timestamp) would need a watermark + re-emit policy —
    this operator follows the engine's streaming-dedup tier and merges
    ALL of them into the open session (count/sum absorbed, start
    extended backwards if needed; the open session's END is MONOTONE,
    so already-emitted output is never contradicted and future on-time
    events sessionize exactly as the batch form would).  Documented
    approximation; the batch form is the exact reference for replayable
    data."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    import pandas as pd

    gap_us = gap_s * 1_000_000

    def fn(key, pdfs, state):
        # vectorized segment fold (no per-event Python): gap breaks via
        # np.diff, per-segment sums via np.add.reduceat — the open
        # session from state is prepended as segment context
        import numpy as np

        user_id = int(key[0])
        if state.exists:
            start_us, last_us, n_ev, tot = state.get
        else:
            start_us = last_us = None
            n_ev, tot = 0, 0.0
        closed = []
        # the iterator delivers the group's rows in ARROW CHUNKS with no
        # cross-chunk ordering guarantee — sorting per chunk would build
        # sessions out of order whenever a trigger carries more than one
        # batch for a user.  Concatenate first, sort ONCE (per-trigger
        # per-user data; bounded by the trigger, not the stream).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]) \
                .sort_values("ts")
            us = _ts_to_us(pdf["ts"])
            vals = pdf["value"].to_numpy(np.float64)
            if last_us is not None:
                # merge ALL late events (us ≤ open session's end) into
                # the open session FIRST: running the segment fold over
                # them would let a late segment hijack the open-session
                # slot and move state backwards past already-emitted
                # output, permanently diverging from the batch twin
                nlate = int(np.searchsorted(us, last_us, side="right"))
                if nlate:
                    n_ev += nlate
                    tot += float(vals[:nlate].sum())
                    start_us = min(start_us, int(us[0]))
                    us, vals = us[nlate:], vals[nlate:]
        if chunks and len(us):
            starts = np.concatenate(
                ([0], np.nonzero(np.diff(us) > gap_us)[0] + 1)
            )
            ends = np.concatenate((starts[1:], [len(us)]))
            seg_n = ends - starts
            seg_sum = np.add.reduceat(vals, starts)
            seg_start = us[starts]
            seg_end = us[ends - 1]
            k = 0
            if last_us is not None and us[0] - last_us <= gap_us:
                # first segment continues the open session (all events
                # here are strictly later than last_us after the late
                # merge above)
                last_us = int(seg_end[0])
                n_ev += int(seg_n[0])
                tot += float(seg_sum[0])
                k = 1
            if k < len(starts):
                # open session (if any) is closed by the next segment
                if last_us is not None:
                    closed.append(
                        (user_id, n_ev, start_us, last_us, tot)
                    )
                # all but the LAST new segment are closed by their
                # successor; the last becomes the open session
                for j in range(k, len(starts) - 1):
                    closed.append((
                        user_id, int(seg_n[j]), int(seg_start[j]),
                        int(seg_end[j]), float(seg_sum[j]),
                    ))
                j = len(starts) - 1
                start_us = int(seg_start[j])
                last_us = int(seg_end[j])
                n_ev = int(seg_n[j])
                tot = float(seg_sum[j])
        state.update((start_us, last_us, n_ev, tot))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "n_events", "start_us", "end_us",
                         "total_value"],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
