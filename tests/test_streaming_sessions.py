"""Stateful streaming sessionization: closed sessions must match the
batch computation, INCLUDING a session spanning two separate
availableNow runs (state recovered from the checkpoint — the
streaming analog of TileJob's snapshot resume)."""

import pandas as pd

from pdal_spark.streaming.sessions import run_sessionize

GAP = 10.0


def _batch_sessions(rows):
    """All-but-last session per key, computed naively."""
    by_key = {}
    for k, t in rows:
        by_key.setdefault(k, []).append(t)
    out = []
    for k, ts in by_key.items():
        ts.sort()
        sessions = []
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last <= GAP:
                last = t
                n += 1
            else:
                sessions.append((k, start, last, n))
                start = last = t
                n = 1
        sessions.append((k, start, last, n))
        out.extend(sessions[:-1])  # final session still open
    return sorted(out)


def test_sessions_survive_restart(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    src.mkdir()

    # wave 1: user 1 has one complete session (0..5) then the start
    # of another at 100; user 2 has an open session
    wave1 = [(1, 0.0), (1, 4.0), (1, 5.0), (1, 100.0),
             (2, 50.0), (2, 55.0)]
    # wave 2: user 1's 100-session continues (103) then a gap closes
    # it at 200; user 2's session closes via gap at 300
    wave2 = [(1, 103.0), (1, 200.0), (2, 300.0), (2, 301.0)]

    for i, wave in enumerate([wave1, wave2]):
        spark.createDataFrame(
            wave, "user_id long, ts_s double"
        ).write.parquet(str(src / f"wave{i}.parquet"))
        run_sessionize(
            spark, f"{src}/*", ckpt, out, GAP,
            schema="user_id long, ts_s double",
        )

    got = sorted(
        (int(r["skey"]), float(r["session_start"]),
         float(r["session_end"]), int(r["n_events"]))
        for _, r in pd.concat(
            [pd.read_parquet(out)]
        ).iterrows()
    )
    want = _batch_sessions(wave1 + wave2)
    assert got == want, (got, want)
    # the cross-run session (100, 103) must be one closed session
    assert (1, 100.0, 103.0, 2) in got


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    """Watermark semantics: a second availableNow run whose rows are
    older than watermark_delay behind the recovered max event time
    must NOT change already-emitted windows (append mode emits a
    window once, finally)."""
    import datetime as dt

    from pdal_spark.streaming.sessions import windowed_cell_counts

    src = tmp_path / "wsrc"
    src.mkdir()
    ckpt, out = str(tmp_path / "wckpt"), str(tmp_path / "wout")

    def t(minute):
        return dt.datetime(2026, 1, 1, 12, minute)

    # wave 1: window [12:00, 13:00) rows + a 14:40 row that pushes
    # the watermark past 13:00 -> the 12:xx window becomes final
    wave1 = [(1, t(0), 10.0, 10.0), (2, t(30), 10.0, 10.0),
             (3, 160, 10.0, 10.0)]
    wave1 = [(i, tt if not isinstance(tt, int) else t(0)
              + dt.timedelta(minutes=tt), la, lo)
             for i, tt, la, lo in wave1]
    # wave 2: a LATE 12:45 row — behind watermark, must be dropped
    wave2 = [(9, t(45), 10.0, 10.0)]

    import pandas as pd

    for i, wave in enumerate([wave1, wave2]):
        spark.createDataFrame(
            wave, "event_id long, ts timestamp, lat double, lon double"
        ).write.parquet(str(src / f"w{i}.parquet"))
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, lat double, lon double"
        ).parquet(f"{src}/*")
        q = (
            windowed_cell_counts(stream, "1 hour", "10 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    got = pd.read_parquet(out)
    noon = got[got["window_start"] == pd.Timestamp(2026, 1, 1, 12)]
    # the noon window emitted with wave-1's 2 rows; the late wave-2
    # row (12:45 < watermark) did not re-open or grow it
    assert len(noon) == 1 and int(noon["n"].iloc[0]) == 2


def test_streaming_dedup_across_restarts(spark, tmp_path):
    """streaming_exact_dedup must drop duplicates across micro-batch
    runs: a page seen in run 1 is suppressed when it reappears in
    run 2 (dedup state recovered from the checkpoint)."""
    from pdal_spark.streaming.ingest import streaming_exact_dedup

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    passed = []

    def sink(df, _i):
        passed.extend(
            (r["doc_id"], r["text"]) for r in df.collect()
        )

    wave1 = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["aa", "bb", "aa"]}
    )
    spark.createDataFrame(wave1).coalesce(1).write.parquet(
        str(src / "w1")
    )
    streaming_exact_dedup(
        spark, str(src / "*"), sink, ckpt, text="text"
    )
    # within-run dedup: one of the two "aa" docs dropped
    assert sorted(t for _, t in passed) == ["aa", "bb"]

    wave2 = pd.DataFrame(
        {"doc_id": [3, 4], "text": ["aa", "cc"]}  # "aa" is a rerun dup
    )
    spark.createDataFrame(wave2).coalesce(1).write.parquet(
        str(src / "w2")
    )
    passed.clear()
    streaming_exact_dedup(
        spark, str(src / "*"), sink, ckpt, text="text"
    )
    # cross-run dedup: only the genuinely new page passes
    assert [t for _, t in passed] == ["cc"]


def test_streaming_warc_ingest_exactly_once(spark, tmp_path):
    """New segments are picked up per run; re-running with no new
    files appends NOTHING (checkpoint file tracking = exactly-once)."""
    from pdal_spark.sources.warc import write_warc_file
    from pdal_spark.streaming.ingest import streaming_warc_ingest

    seg = tmp_path / "segs"; seg.mkdir()
    dest = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    write_warc_file(
        str(seg / "a.warc"),
        [("https://a/1", "2026-01-01T00:00:00Z", "response",
          b"<p>one</p>")],
    )
    streaming_warc_ingest(spark, str(seg), dest, ckpt)
    assert spark.read.parquet(dest).count() == 1

    # no new files -> no new rows
    streaming_warc_ingest(spark, str(seg), dest, ckpt)
    assert spark.read.parquet(dest).count() == 1

    # a new segment arrives -> only it is processed
    write_warc_file(
        str(seg / "b.warc"),
        [("https://b/2", "2026-01-02T00:00:00Z", "response",
          b"<p>two</p>")],
    )
    streaming_warc_ingest(spark, str(seg), dest, ckpt)
    out = spark.read.parquet(dest).toPandas()
    assert sorted(out.text) == ["one", "two"]
