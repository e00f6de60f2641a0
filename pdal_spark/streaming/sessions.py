"""Stateful streaming sessionization — the event-time custom
stateful operator the reference's stream mode cannot express.

PDAL stream mode is chunked batch with no cross-chunk state
(SURVEY.md §2.10; pdal/Streamable.cpp): an operator like
filters.separatescanline sees the whole view at once. In a true
stream, a session (scanline) can SPAN micro-batches, so the
distributed engine carries per-key open-session state in the
Structured Streaming state store via applyInPandasWithState — the
gap-based session semantics match operators.transform
.separate_scanline on the same data (equivalence tested in
tests/test_streaming_sessions.py, including a driver restart:
state survives in the checkpoint and a session spanning two runs
closes correctly).

Emission contract ("append" mode): a session row is emitted when a
LATER event of the same key proves the gap closed it. Each key's
final session stays open in state until more data (or a flush
sentinel) arrives — standard stream semantics; the batch
equivalence therefore compares all-but-last sessions per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSIONS_SCHEMA = (
    "skey bigint, session_start double, session_end double, "
    "n_events bigint"
)
_STATE_SCHEMA = "start double, last double, n bigint"


def sessionize_stream(
    events: DataFrame,
    gap: float,
    key: str = "user_id",
    ts: str = "ts_s",
) -> DataFrame:
    """events: a STREAMING DataFrame with integer `key` and numeric
    event-time seconds `ts`. Returns the stream of CLOSED sessions
    (skey, session_start, session_end, n_events); the per-key open
    tail lives in the state store across micro-batches and restarts.

    Events are sorted within each micro-batch; across batches the
    state's open session absorbs in-order arrivals (late events
    older than the open session's last timestamp still extend the
    session count but not its bounds — documented simplification;
    a watermark-based variant would drop them instead).
    """
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    g = float(gap)

    def fn(
        kt, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        times: list[float] = []
        for pdf in pdfs:
            times.extend(float(v) for v in pdf[ts])
        times.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        out = []
        for t in times:
            if start is None:
                start, last, n = t, t, 1
            elif t - last <= g:
                last = max(last, t)
                n += 1
            else:
                out.append((int(kt[0]), start, last, int(n)))
                start, last, n = t, t, 1
        if start is not None:
            state.update((start, last, int(n)))
        yield pd.DataFrame(
            out,
            columns=["skey", "session_start", "session_end",
                     "n_events"],
        )

    return events.groupBy(key).applyInPandasWithState(
        fn,
        SESSIONS_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_sessionize(
    spark,
    src_path: str,
    checkpoint: str,
    out_path: str,
    gap: float,
    key: str = "user_id",
    ts: str = "ts_s",
    schema=None,
) -> None:
    """One availableNow pass: read new files under src_path,
    sessionize with state carried in `checkpoint`, append closed
    sessions to out_path. Re-running after more files appear resumes
    from the checkpointed state store (exactly-once file tracking +
    session state both recover)."""
    if schema is None:
        schema = spark.read.parquet(src_path).schema
    stream = spark.readStream.schema(schema).parquet(src_path)
    closed = sessionize_stream(stream, gap, key=key, ts=ts)
    q = (
        closed.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_cell_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    ts: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
    res: int = 6,
) -> DataFrame:
    """Event-time windowed H3-cell density over a stream with a
    watermark — the late-data semantics PDAL's chunked stream mode
    has no notion of: rows later than `watermark_delay` behind the
    max observed event time are DROPPED (in append mode a window only
    emits once the watermark passes its end, so its count is final
    and exactly-once in the sink).

    Returns (window_start, window_end, cell, n) — the streaming
    counterpart of operators.hexbin.h3bin per event-time window.
    """
    from pyspark.sql import functions as F

    from pdal_spark.operators.h3 import h3_encode

    enc = h3_encode(
        events.withWatermark(ts, watermark_delay), lat, lon, res=res
    )
    agg = (
        enc.groupBy(
            F.window(F.col(ts), window_duration).alias("w"),
            F.col("h3_cell").alias("cell"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell",
            "n",
        )
    )
    return agg


def geofence_stream(
    events: DataFrame,
    fences: list[tuple[int, float, float, float, float]],
    key: str = "user_id",
    ts: str = "ts_s",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Stateful geofence ENTER/EXIT detection over a point stream —
    the spatial x streaming composition (fleet/asset monitoring,
    region-visit attribution): `fences` is a small list of
    (fence_id, x0, x1, y0, y1) bboxes riding the closure; per
    (key, fence) the state store remembers the inside/outside flag
    across micro-batches AND restarts, and only TRANSITIONS are
    emitted: (skey, fence_id, event = 'enter'|'exit', at_ts).

    Semantics: points ordered by event time within the batch; a point
    inside the bbox flips outside->inside (enter), the first outside
    point after flips back (exit). State is one bitmask per key —
    bounded, mergeable with checkpoint recovery like
    sessionize_stream.

    Null coordinates/timestamps are dropped (a NULL must not kill the
    long-running query). Ordering is per micro-batch: a late event
    arriving in a LATER batch is folded into that batch's order, so
    cross-batch out-of-order arrival can emit enter/exit swapped —
    feed watermark-sorted input if strict global ordering matters.
    """
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    fl = [(int(f), float(a), float(b), float(c), float(d))
          for f, a, b, c, d in fences]

    def fn(
        kt, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in pdfs:
            sub = pdf[[ts, lon, lat]].dropna()
            rows.extend(
                (float(t), float(x), float(y))
                for t, x, y in zip(sub[ts], sub[lon], sub[lat])
            )
        rows.sort()
        mask = state.get[0] if state.exists else 0
        out = []
        for t, x, y in rows:
            for i, (fid, x0, x1, y0, y1) in enumerate(fl):
                inside = x0 <= x <= x1 and y0 <= y <= y1
                was = bool(mask & (1 << i))
                if inside and not was:
                    out.append((int(kt[0]), fid, "enter", t))
                    mask |= 1 << i
                elif was and not inside:
                    out.append((int(kt[0]), fid, "exit", t))
                    mask &= ~(1 << i)
        state.update((mask,))
        if out:
            yield pd.DataFrame(
                out, columns=["skey", "fence_id", "event", "at_ts"]
            )

    return events.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=(
            "skey long, fence_id int, event string, at_ts double"
        ),
        stateStructType="mask long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def geofence_stream_ordered(
    events: DataFrame,
    fences: list[tuple[int, float, float, float, float]],
    key: str = "user_id",
    ts: str = "ts_s",
    lat: str = "lat",
    lon: str = "lon",
    delay: str = "10 seconds",
) -> DataFrame:
    """geofence_stream with STRICT event-time ordering across
    micro-batches — closes the base op's documented caveat (a late
    event in a later batch could emit enter/exit swapped).

    Events buffer in per-key state; transitions are emitted only for
    events at or below the CURRENT WATERMARK (event-time max minus
    ``delay``), replayed in (ts, lon, lat) order. A late event inside
    the allowed lateness therefore lands in its true position before
    anything after it is folded into the mask; events later than the
    watermark allows are dropped by Spark upstream (standard
    watermark semantics). State = mask + the bounded pending buffer
    (at most `delay` worth of events per key).

    Requires an event-time column: `ts` (double epoch seconds) is
    cast to timestamp and `withWatermark(..., delay)` is applied
    here. Emission timing: an event becomes visible one batch after
    the watermark passes it (the watermark advances at batch END).

    Idle-key flush: a key that stops sending data is still flushed —
    EventTimeTimeout re-arms on the earliest pending event, so when
    OTHER keys advance the watermark past it, Spark invokes this key
    with hasTimedOut and the buffered transitions drain. Without the
    timeout (NoTimeout), applyInPandasWithState only calls fn for
    keys present in the batch and an idle key's transitions would
    stay locked in state forever.
    """
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    fl = [(int(f), float(a), float(b), float(c), float(d))
          for f, a, b, c, d in fences]

    wm = events.withColumn(
        "__evt", F.col(ts).cast("timestamp")
    ).withWatermark("__evt", delay)

    def fn(
        kt, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            mask, pts_, pxs, pys = state.get
            pend = list(zip(pts_, pxs, pys))
        else:
            mask, pend = 0, []
        for pdf in pdfs:
            sub = pdf[[ts, lon, lat]].dropna()
            pend.extend(
                (float(t), float(x), float(y))
                for t, x, y in zip(sub[ts], sub[lon], sub[lat])
            )
        pend.sort()
        wm_s = state.getCurrentWatermarkMs() / 1000.0
        ready = [p for p in pend if p[0] <= wm_s]
        pend = [p for p in pend if p[0] > wm_s]
        out = []
        for t, x, y in ready:
            for i, (fid, x0, x1, y0, y1) in enumerate(fl):
                inside = x0 <= x <= x1 and y0 <= y <= y1
                was = bool(mask & (1 << i))
                if inside and not was:
                    out.append((int(kt[0]), fid, "enter", t))
                    mask |= 1 << i
                elif was and not inside:
                    out.append((int(kt[0]), fid, "exit", t))
                    mask &= ~(1 << i)
        state.update((
            mask,
            [p[0] for p in pend],
            [p[1] for p in pend],
            [p[2] for p in pend],
        ))
        if pend:
            # wake this key once the watermark passes its earliest
            # pending event (timeout ts must exceed the watermark)
            state.setTimeoutTimestamp(
                max(int(pend[0][0] * 1000.0) + 1,
                    state.getCurrentWatermarkMs() + 1)
            )
        if out:
            yield pd.DataFrame(
                out, columns=["skey", "fence_id", "event", "at_ts"]
            )

    return wm.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=(
            "skey long, fence_id int, event string, at_ts double"
        ),
        stateStructType=(
            "mask long, pts array<double>, pxs array<double>,"
            " pys array<double>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


POLITE_SCHEMA = ("req_id long, host long, arrival_us long, "
                 "fetch_us long, wait_us long")
_POLITE_STATE = "last_fetch_us long"


def politeness_stream(
    requests: DataFrame,
    delay_us: int,
    host: str = "host",
    arrival_us: str = "arrival_us",
    req_id: str = "req_id",
) -> DataFrame:
    """Streaming per-host politeness scheduler — the online form of
    operators.temporal.politeness_schedule: each micro-batch's
    requests are served in arrival order, each fetch starting no
    earlier than delay_us after the host's previous fetch, with the
    host's last fetch time carried in the state store across
    micro-batches and restarts (fetch_i = max(arrival_i,
    last_fetch + delay)). Within a batch the recurrence is the same
    max-plus form the batch operator closes over; across batches
    the single last_fetch_us long IS the sufficient state.

    Like sessionize_stream, ordering is per-micro-batch: a late
    request arriving after its host's later fetch already committed
    is scheduled AFTER it (the schedule never rewrites history —
    exactly what a real fetcher does).
    """
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    d = int(delay_us)

    def fn(
        kt, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in pdfs:
            for r, a in zip(pdf[req_id], pdf[arrival_us]):
                rows.append((int(r), int(a)))
        rows.sort(key=lambda t: (t[1], t[0]))
        last = state.get[0] if state.exists else None
        out = []
        for r, a in rows:
            f = a if last is None else max(a, last + d)
            out.append((r, int(kt[0]), a, f, f - a))
            last = f
        if last is not None:
            state.update((int(last),))
        yield pd.DataFrame(
            out,
            columns=["req_id", "host", "arrival_us", "fetch_us",
                     "wait_us"],
        )

    return requests.groupBy(host).applyInPandasWithState(
        fn,
        POLITE_SCHEMA,
        _POLITE_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_politeness(
    spark,
    src_path: str,
    checkpoint: str,
    out_path: str,
    delay_us: int,
    schema: str = "req_id long, host long, arrival_us long",
) -> None:
    """One availableNow pass of politeness_stream: read new request
    files under src_path, schedule with per-host last-fetch state in
    `checkpoint`, append (req_id, host, arrival_us, fetch_us,
    wait_us) to out_path. Re-running after more files appear resumes
    each host's clock from the state store."""
    stream = spark.readStream.schema(schema).parquet(src_path)
    sched = politeness_stream(stream, delay_us)
    q = (
        sched.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


ANOM_SCHEMA = ("akey long, value double, z double, n_seen long")
_ANOM_STATE = "n long, mean double, m2 double"


def anomaly_stream(
    events: DataFrame,
    threshold: float = 3.0,
    warmup: int = 5,
    key: str = "user_id",
    value: str = "value",
    order: str = "event_id",
) -> DataFrame:
    """Streaming per-key z-score anomaly detector: each key's
    running (n, mean, M2) lives in the state store (Welford's
    recurrence — the numerically-stable single-pass form), carried
    across micro-batches AND restarts. A row is emitted when its
    value deviates more than `threshold` sigmas from the key's
    statistics as of BEFORE that row (and at least `warmup` values
    were seen), then absorbed into the state either way — so a level
    shift alarms once and then becomes the new normal, exactly how a
    production rate monitor behaves.

    Rows are processed in `order` within each micro-batch; like
    sessionize_stream, cross-batch ordering is arrival order.
    """
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    t = float(threshold)
    wu = int(warmup)

    def fn(
        kt, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in pdfs:
            sub = pdf[[order, value]].dropna()
            rows.extend(
                (int(o), float(v))
                for o, v in zip(sub[order], sub[value])
            )
        rows.sort(key=lambda r: r[0])
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        out = []
        for _, v in rows:
            if n >= wu and m2 > 0.0:
                sd = (m2 / n) ** 0.5
                z = (v - mean) / sd
                if abs(z) > t:
                    out.append((int(kt[0]), v, z, n))
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        if rows:
            state.update((int(n), float(mean), float(m2)))
        yield pd.DataFrame(
            out, columns=["akey", "value", "z", "n_seen"]
        )

    return events.groupBy(key).applyInPandasWithState(
        fn,
        ANOM_SCHEMA,
        _ANOM_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_anomaly(
    spark,
    src_path: str,
    checkpoint: str,
    out_path: str,
    threshold: float = 3.0,
    warmup: int = 5,
    schema: str = "event_id long, user_id long, value double",
) -> None:
    """One availableNow anomaly pass; per-key Welford state recovers
    from the checkpoint across runs."""
    stream = spark.readStream.schema(schema).parquet(src_path)
    q = (
        anomaly_stream(stream, threshold, warmup)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dwell_stream(
    points,
    t2: int,
    min_n: int = 2,
    key: str = "key",
    ts: str = "ts_s",
    mx: str = "mx",
    my: str = "my",
):
    """Stateful streaming stay-point detection — the streaming twin
    of operators.temporal.stay_points: per key, emit a CLOSED dwell
    segment whenever the step displacement exceeds sqrt(t2) (a new
    segment opens at the breaking ping). The final open segment
    stays in state across micro-batches and across availableNow
    restarts (checkpointed), exactly like sessionize_stream's open
    session.

    State: (last mx, last my, seg start ts, seg last ts, n, sum mx,
    sum my). Emitted rows: (key, n, t_start, t_end, cx, cy) with
    integer-div centroids (truncation toward zero — matching the
    batch op on non-negative grids; shift coords non-negative
    upstream for exact batch parity on negatives).

    Ordering: rows sort by ts WITHIN a micro-batch; a late ping
    arriving in a later batch folds into that batch's order (the
    geofence_stream caveat). NULL coordinates drop.
    """
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    thr = int(t2)
    keep = int(min_n)

    def fn(
        kt, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in pdfs:
            sub = pdf[[ts, mx, my]].dropna()
            rows.extend(
                (float(t), int(x), int(y))
                for t, x, y in zip(sub[ts], sub[mx], sub[my])
            )
        rows.sort()
        if state.exists:
            lx, ly, t0, t1, n, sx, sy = state.get
        else:
            lx = ly = t0 = t1 = n = sx = sy = None
        out = []
        for t, x, y in rows:
            if n is None:
                lx, ly, t0, t1, n, sx, sy = x, y, t, t, 1, x, y
                continue
            d2 = (x - lx) * (x - lx) + (y - ly) * (y - ly)
            if d2 > thr:
                if n >= keep:
                    out.append(
                        (kt[0], n, t0, t1, sx // n, sy // n)
                    )
                lx, ly, t0, t1, n, sx, sy = x, y, t, t, 1, x, y
            else:
                lx, ly, t1 = x, y, t
                n += 1
                sx += x
                sy += y
        if n is not None:
            state.update((lx, ly, t0, t1, n, sx, sy))
        if out:
            yield pd.DataFrame(
                out,
                columns=["key", "n", "t_start", "t_end", "cx", "cy"],
            )

    return points.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=(
            "key long, n long, t_start double, t_end double,"
            " cx long, cy long"
        ),
        stateStructType=(
            "lx long, ly long, t0 double, t1 double, n long,"
            " sx long, sy long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dwell(
    spark,
    src_path: str,
    checkpoint: str,
    out_path: str,
    t2: int,
    min_n: int = 2,
    key: str = "key",
    ts: str = "ts_s",
    schema=None,
) -> None:
    """One availableNow pass of :func:`dwell_stream` (the
    run_sessionize harness): closed dwell segments append to
    out_path; the open segment and file progress recover from the
    checkpoint on the next pass."""
    if schema is None:
        schema = spark.read.parquet(src_path).schema
    stream = spark.readStream.schema(schema).parquet(src_path)
    closed = dwell_stream(stream, t2=t2, min_n=min_n, key=key, ts=ts)
    q = (
        closed.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
