"""Streaming politeness scheduler: within one run the schedule must
match the batch operator (same max-plus recurrence); across two
availableNow runs a host's clock must carry — the first fetch of
run 2 waits out the delay from run 1's LAST fetch, recovered from
the checkpointed state store."""

import pandas as pd

from pdal_spark.streaming.sessions import run_politeness

DELAY = 1_000_000  # 1 s in us


def _batch(rows, delay):
    """fetch_i = max(arrival_i, fetch_{i-1} + delay) per host."""
    by_host = {}
    for r, h, a in sorted(rows, key=lambda t: (t[2], t[0])):
        by_host.setdefault(h, []).append((r, a))
    out = {}
    for h, rs in by_host.items():
        last = None
        for r, a in rs:
            f = a if last is None else max(a, last + delay)
            out[r] = f
            last = f
    return out


def test_politeness_matches_batch_and_survives_restart(
    spark, tmp_path
):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # wave 1: host 7 gets a burst at t=0 (three requests queue up,
    # each 1 s apart); host 9 a single request.
    wave1 = [(1, 7, 0), (2, 7, 100), (3, 7, 200), (4, 9, 0)]
    # wave 2: host 7's next request arrives only 0.3 s after its
    # wave-1 LAST fetch (t=2_000_000) -> must wait until 3_000_000;
    # host 9's arrives long after its clock -> no wait.
    wave2 = [(5, 7, 2_300_000), (6, 9, 99_000_000)]

    for i, wave in enumerate([wave1, wave2]):
        spark.createDataFrame(
            wave, "req_id long, host long, arrival_us long"
        ).write.parquet(str(src / f"w{i}.parquet"))
        run_politeness(spark, f"{src}/*", ckpt, out, DELAY)

    got = {
        int(r.req_id): int(r.fetch_us)
        for r in pd.read_parquet(out).itertuples()
    }
    want = _batch(wave1 + wave2, DELAY)
    assert got == want, (got, want)
    # the cross-run carry specifically: req 5 waited for req 3's
    # fetch (2_000_000) + delay, not its own arrival
    assert got[5] == 3_000_000 and got[6] == 99_000_000

    # waits are non-negative and hosts never fetch < delay apart
    df = pd.read_parquet(out)
    assert (df.wait_us >= 0).all()
    for _, g in df.groupby("host"):
        f = g.fetch_us.sort_values().to_numpy()
        assert (f[1:] - f[:-1] >= DELAY).all()


def test_politeness_stream_matches_batch_operator(spark, tmp_path):
    """Single-run equivalence against operators.temporal
    .politeness_schedule on a bigger randomized-ish fixture."""
    from pdal_spark.operators.temporal import politeness_schedule

    rows = [
        (i, (i * 2654435761) % 5, ((i * 40503) % 97) * 250_000)
        for i in range(200)
    ]
    src = tmp_path / "src2"
    src.mkdir()
    spark.createDataFrame(
        rows, "req_id long, host long, arrival_us long"
    ).write.parquet(str(src / "w0.parquet"))
    run_politeness(
        spark, f"{src}/*", str(tmp_path / "ck2"),
        str(tmp_path / "o2"), DELAY,
    )
    got = {
        int(r.req_id): int(r.fetch_us)
        for r in pd.read_parquet(str(tmp_path / "o2")).itertuples()
    }
    batch = politeness_schedule(
        spark.createDataFrame(
            rows, "req_id long, host long, arrival_us long"
        ),
        host="host", arrival_us="arrival_us",
        delay_us=DELAY, id_col="req_id",
    )
    want = {
        int(r.req_id): int(r.fetch_us) for r in batch.collect()
    }
    assert got == want
