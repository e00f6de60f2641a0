"""Property tests for the HDR-histogram bucket algebra (pure SQL
fragments, evaluated in DuckDB — no Spark session needed): bucket ids
monotone in value, lower bound <= value < lb * (1 + 2^-S), and the
small-value range exact."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from pdal_spark import sqlgen as G
from pdal_spark.operators.sketch import (
    HDR_SUB_BITS,
    hdr_bucket_sql,
    hdr_lb_sql,
)

_S = HDR_SUB_BITS


def _eval(vals: list[int]) -> list[tuple[int, int, int]]:
    con = duckdb.connect()
    b = hdr_bucket_sql("v", _S, G.DUCKDB)
    lb = hdr_lb_sql("v", _S, G.DUCKDB)
    rows = con.execute(
        f"SELECT v, {b} AS bucket, {lb} AS lb FROM (SELECT "
        "unnest(?::BIGINT[]) AS v)", [vals]
    ).fetchall()
    return rows


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**52),
                min_size=1, max_size=50))
def test_hdr_bucket_monotone_and_bounded(vals):
    rows = _eval(sorted(vals))
    prev_bucket = None
    for v, bucket, lb in rows:
        assert lb <= v, (v, lb)
        if lb >= (1 << _S):
            # relative-error contract only above the exact range
            assert v < lb * (1.0 + 2.0 ** -_S) + 1
        else:
            assert lb == v  # exact singleton buckets below 2^S
        if prev_bucket is not None:
            assert bucket >= prev_bucket  # monotone in value
        prev_bucket = bucket


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=2**52))
def test_hdr_lb_is_bucket_representative(v):
    # every value in a bucket reports the same lb (lb is a function
    # of the bucket): check v and its lb land in the same bucket
    rows = dict((x, (b, lb)) for x, b, lb in _eval([v]))
    b_v, lb_v = rows[v]
    rows2 = dict((x, (b, lb)) for x, b, lb in _eval([lb_v]))
    assert rows2[lb_v] == (b_v, lb_v)
