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
* `sessionize_stream_watermark` — the late-data policy the absorb-mode
  operator documents away: a watermark bounds lateness, late events
  within it re-emit corrected session rows (update semantics), and
  sessions seal append-exactly once the watermark passes end + gap —
  streaming ≡ batch on everything the watermark has sealed, with
  horizon-bounded state (see its docstring).
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


SESSION_WM_STATE_SCHEMA = (
    "ev_us array<long>, ev_val array<double>, p_start long, p_last long, "
    "p_n long, p_tot double"
)
SESSION_WM_OUT_SCHEMA = SESSION_OUT_SCHEMA + ", is_final boolean"


def sessionize_stream_watermark(events: DataFrame, gap_s: int = 1800,
                                watermark_s: int = 3600) -> DataFrame:
    """Watermarked sessionization with LATE-DATA RE-EMISSION (the policy
    `sessionize_stream`'s docstring defers to; VERDICT r5 item 4).

    The watermark bounds lateness: events older than ``watermark_s``
    behind the observed max event time are dropped by the engine.
    Within the bound, late events are incorporated EXACTLY — including
    extending an already-provisionally-emitted session backwards — and
    corrected versions re-emit (update semantics, ``is_final=false``).
    A session becomes immutable once the watermark passes
    ``end + gap_s`` (no admissible event can chain to it: any future
    event has ts ≥ watermark > end + gap); it then emits ONCE with
    ``is_final=true`` and leaves state.  Streaming parity: the
    is_final rows equal the batch `sessionize_sql` sessions whose
    ``end + gap`` lies behind the final watermark — exact on everything
    the watermark has sealed, which is the property
    tests/test_streaming_spde.py pins over a late-event replay.

    State per user is BOUNDED by the lateness horizon, not the stream:
    raw events are retained only while ``ts ≥ watermark − gap`` (newer
    events could still chain among them); the frozen prefix of the
    oldest open session is COMPRESSED to one (start, last, n, sum)
    aggregate.  Only the earliest open session can span the horizon —
    its predecessor's end is older still and was finalized — so one
    aggregate suffices.  Sessions with no follow-up traffic finalize
    through an event-time TIMEOUT set at ``end + gap`` (fires when the
    watermark passes it), so quiet users don't hold state forever.
    One shuffle key (user_id), integer-microsecond arithmetic, same as
    the append-mode operator."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    import pandas as pd

    gap_us = gap_s * 1_000_000

    def fn(key, pdfs, state):
        import numpy as np

        user_id = int(key[0])
        wm_us = state.getCurrentWatermarkMs() * 1000
        horizon = wm_us - gap_us
        if state.exists:
            ev_us0, ev_val0, p_start, p_last, p_n, p_tot = state.get
            ev_us0 = np.asarray(ev_us0, dtype=np.int64)
            ev_val0 = np.asarray(ev_val0, dtype=np.float64)
        else:
            ev_us0 = np.zeros(0, np.int64)
            ev_val0 = np.zeros(0, np.float64)
            p_start = p_last = 0
            p_n, p_tot = 0, 0.0

        chunks = [pdf for pdf in pdfs if len(pdf)]
        had_new = bool(chunks)
        if chunks:
            pdf = (pd.concat(chunks) if len(chunks) > 1 else chunks[0])
            new_us = _ts_to_us(pdf["ts"])
            new_val = pdf["value"].to_numpy(np.float64)
            # defensive lateness bound (Spark already drops rows behind
            # the watermark; enforce the contract regardless)
            keep = new_us >= wm_us
            ev_us = np.concatenate((ev_us0, new_us[keep]))
            ev_val = np.concatenate((ev_val0, new_val[keep]))
            is_new = np.concatenate((
                np.zeros(len(ev_us0), bool),
                np.ones(int(keep.sum()), bool),
            ))
            order = np.argsort(ev_us, kind="stable")
            ev_us, ev_val = ev_us[order], ev_val[order]
            is_new = is_new[order]
        else:
            ev_us, ev_val = ev_us0, ev_val0
            is_new = np.zeros(len(ev_us), bool)

        # ---- fold sessions over [compressed prefix] + retained events
        sessions = []  # (start, end, n, tot, ev_lo, ev_hi) index range
        if len(ev_us):
            starts = np.concatenate(
                ([0], np.nonzero(np.diff(ev_us) > gap_us)[0] + 1))
            ends = np.concatenate((starts[1:], [len(ev_us)]))
            seg_sum = np.add.reduceat(ev_val, starts)
            for j in range(len(starts)):
                sessions.append([
                    int(ev_us[starts[j]]), int(ev_us[ends[j] - 1]),
                    int(ends[j] - starts[j]), float(seg_sum[j]),
                    int(starts[j]), int(ends[j]),
                ])
        if p_n > 0:
            if sessions and sessions[0][0] - p_last <= gap_us:
                s = sessions[0]
                s[0] = min(int(p_start), s[0])
                s[2] += int(p_n)
                s[3] += float(p_tot)
            else:
                sessions.insert(
                    0, [int(p_start), int(p_last), int(p_n),
                        float(p_tot), 0, 0])

        out = []
        n_final = 0
        for s in sessions:
            if s[1] < horizon:
                out.append((user_id, s[2], s[0], s[1], s[3], True))
                n_final += 1
            else:
                break
        remaining = sessions[n_final:]
        if had_new:
            # provisional (correctable) re-emissions — update semantics.
            # Only sessions this batch actually TOUCHED re-emit: every
            # change (extend, backward-extend, merge) involves at least
            # one new event inside the session's range, so a user with
            # many open sessions doesn't rebroadcast all of them on
            # every trigger (sink volume stays O(changed), not O(open))
            for s in remaining:
                if is_new[s[4]:s[5]].any():
                    out.append((user_id, s[2], s[0], s[1], s[3], False))

        # ---- rebuild bounded state ---------------------------------
        if not remaining:
            state.remove()
        else:
            first = remaining[0]
            # events of finalized sessions drop; sub-horizon events of
            # the earliest remaining session compress into the prefix
            # aggregate (their session membership is sealed — no
            # admissible event can land between two sub-horizon events)
            lo, hi = first[4], first[5]
            keep_from = lo
            if p_n > 0 and n_final == 0:
                np_start, np_last = int(p_start), int(p_last)
                np_n, np_tot = int(p_n), float(p_tot)
            else:
                np_start, np_last, np_n, np_tot = 0, 0, 0, 0.0
            while keep_from < hi and ev_us[keep_from] < horizon:
                if np_n == 0:
                    np_start = int(ev_us[keep_from])
                np_last = int(ev_us[keep_from])
                np_n += 1
                np_tot += float(ev_val[keep_from])
                keep_from += 1
            retained = slice(keep_from, None)
            state.update((
                ev_us[retained].tolist(), ev_val[retained].tolist(),
                np_start, np_last, np_n, np_tot,
            ))
            # finalize on watermark passage even with no new traffic
            earliest_end_ms = (min(s[1] for s in remaining)
                               + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(
                max(earliest_end_ms, state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "n_events", "start_us", "end_us",
                         "total_value", "is_final"],
            )

    return (
        events.withWatermark("ts", f"{watermark_s} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_WM_OUT_SCHEMA,
            stateStructType=SESSION_WM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
