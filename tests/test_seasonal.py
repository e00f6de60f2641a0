"""seasonal_decompose invariants: exact additive reconstruction,
recovery of a planted square-wave seasonality on a linear trend,
and degenerate constant series."""

from pdal_spark.operators.temporal import SD_Q, seasonal_decompose


def _series(spark, vals, key="a"):
    return spark.createDataFrame(
        [(key, i, float(v)) for i, v in enumerate(vals)],
        ["k", "o", "v"],
    )


def test_reconstruction_identity_and_planted_wave(spark):
    p = 4
    # linear trend + exact square wave with period 4
    wave = [6, -2, -6, 2]
    vals = [10.0 + 0.5 * i + wave[i % p] for i in range(48)]
    out = seasonal_decompose(
        _series(spark, vals), key="k", order_col="o", value="v",
        period=p,
    ).collect()
    assert len(out) == 48
    for r in out:
        if r.trend2p_q is not None:
            # additive identity holds EXACTLY on the 2p*Q scale
            assert r.v_q * 2 * p == \
                r.trend2p_q + r.seas2p_q + r.rem2p_q
    # the planted seasonal amplitude is recovered (2p*Q scale)
    seas = {r.phase: r.seas2p_q for r in out
            if r.seas2p_q is not None}
    for ph in range(p):
        want = wave[ph] * 2 * p * SD_Q
        assert abs(seas[ph] - want) <= 2 * p * SD_Q // 100, ph
    # remainder is tiny: the series is exactly trend+seasonal
    rems = [abs(r.rem2p_q) for r in out if r.rem2p_q is not None]
    assert max(rems) <= 2 * p * SD_Q // 100


def test_constant_series_all_zero(spark):
    out = seasonal_decompose(
        _series(spark, [5.0] * 20), key="k", order_col="o",
        value="v", period=4,
    ).collect()
    for r in out:
        if r.trend2p_q is not None:
            assert r.trend2p_q == 5 * SD_Q * 2 * 4
            assert r.seas2p_q == 0 and r.rem2p_q == 0


def test_short_series_trend_null_everywhere(spark):
    out = seasonal_decompose(
        _series(spark, [1.0, 2.0, 3.0]), key="k", order_col="o",
        value="v", period=4,
    ).collect()
    assert len(out) == 3
    assert all(r.trend2p_q is None and r.rem2p_q is None
               for r in out)
