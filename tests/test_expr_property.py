"""Property-based dual-dialect equivalence for the PDAL expression
compiler (functions/expr.py): randomly generated expressions from the
MathParser grammar must evaluate IDENTICALLY in Spark and DuckDB.
The reference ships no property testing (SURVEY §5.5); this corpus
guards the compiler against dialect drift beyond the fixed gate
sweep (`expression_functions`).

Exact tier: +, -, *, floor, ceil, abs, sqrt(abs(.)) — IEEE-identical,
compared bit-exact. Trig/exp tier rides along rounded(6) like the
gates.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdal_spark import sqlgen as G
from pdal_spark.functions.expr import compile_expression

DIMS = ["qty", "tax"]
ROWS = [
    (float(q), float(t) / 8.0)
    for q in range(-6, 7, 3)
    for t in range(-4, 5, 2)
]


@st.composite
def exprs(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        leaf = draw(
            st.one_of(
                st.sampled_from(DIMS),
                st.integers(min_value=-9, max_value=9).map(
                    lambda v: f"{v}.5"
                ),
            )
        )
        return leaf
    kind = draw(st.sampled_from(
        ["add", "sub", "mul", "neg", "floor", "ceil", "abs", "sqrt"]
    ))
    a = draw(exprs(depth=depth + 1))
    if kind in ("add", "sub", "mul"):
        b = draw(exprs(depth=depth + 1))
        op = {"add": "+", "sub": "-", "mul": "*"}[kind]
        return f"({a} {op} {b})"
    if kind == "neg":
        return f"(-{a})"
    if kind == "sqrt":
        return f"sqrt(abs({a}))"
    return f"{kind}({a})"


@pytest.fixture(scope="module")
def harness(spark):
    sdf = spark.createDataFrame(ROWS, "qty double, tax double")
    sdf.createOrReplaceTempView("prop_rows")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE prop_rows AS SELECT * FROM (VALUES "
        + ", ".join(f"({q}, {t})" for q, t in ROWS)
        + ") v(qty, tax)"
    )
    return spark, con


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=exprs())
def test_compiled_expression_matches_duckdb(harness, e):
    spark, con = harness
    s_sql = compile_expression(e, G.SPARK)
    d_sql = compile_expression(e, G.DUCKDB)
    got = [
        r[0]
        for r in spark.sql(
            f"SELECT {s_sql} FROM prop_rows ORDER BY qty, tax"
        ).collect()
    ]
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {d_sql} FROM prop_rows ORDER BY qty, tax"
        ).fetchall()
    ]
    assert len(got) == len(want)
    for g_v, w_v in zip(got, want):
        assert (g_v is None) == (w_v is None)
        if g_v is not None:
            # exact-tier ops only -> bit equality
            assert g_v == w_v or (g_v != g_v and w_v != w_v), (
                e, g_v, w_v,
            )


# --- DimRange compiler (functions/dimrange.py) -----------------------------

@st.composite
def range_specs(draw):
    dim = draw(st.sampled_from(DIMS))
    neg = draw(st.booleans())
    lo = draw(st.one_of(
        st.none(), st.integers(min_value=-6, max_value=4)
    ))
    hi = draw(st.one_of(
        st.none(),
        st.integers(min_value=(lo if lo is not None else -6),
                    max_value=6),
    ))
    if lo is None and hi is None:
        lo = 0
    incl_lo = draw(st.booleans())
    incl_hi = draw(st.booleans())
    lb = "[" if incl_lo else "("
    rb = "]" if incl_hi else ")"
    body = f"{lb}{'' if lo is None else lo}:" \
           f"{'' if hi is None else hi}{rb}"
    return f"{dim}{'!' if neg else ''}{body}"


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(specs=st.lists(range_specs(), min_size=1, max_size=3))
def test_compiled_ranges_match_duckdb(harness, specs):
    from pdal_spark.functions.dimrange import compile_ranges

    spark, con = harness
    s_sql = compile_ranges(specs, G.SPARK)
    d_sql = compile_ranges(specs, G.DUCKDB)
    got = spark.sql(
        f"SELECT qty, tax FROM prop_rows WHERE {s_sql}"
        " ORDER BY qty, tax"
    ).collect()
    want = con.execute(
        f"SELECT qty, tax FROM prop_rows WHERE {d_sql}"
        " ORDER BY qty, tax"
    ).fetchall()
    assert [(r[0], r[1]) for r in got] == [
        (r[0], r[1]) for r in want
    ], specs


# --- Mongo predicate compiler (functions/mongo.py) -------------------------

@st.composite
def mongo_queries(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        dim = draw(st.sampled_from(DIMS))
        op = draw(st.sampled_from(
            ["$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in",
             "$nin"]
        ))
        if op in ("$in", "$nin"):
            vals = draw(st.lists(
                st.integers(min_value=-6, max_value=6),
                min_size=1, max_size=3,
            ))
            return {dim: {op: [float(v) for v in vals]}}
        v = float(draw(st.integers(min_value=-6, max_value=6)))
        return {dim: {op: v}}
    combo = draw(st.sampled_from(["$and", "$or"]))
    subs = draw(st.lists(
        mongo_queries(depth=depth + 1), min_size=2, max_size=3
    ))
    return {combo: subs}


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=mongo_queries())
def test_compiled_mongo_matches_duckdb(harness, q):
    from pdal_spark.functions.mongo import compile_mongo

    spark, con = harness
    s_sql = compile_mongo(q, G.SPARK)
    d_sql = compile_mongo(q, G.DUCKDB)
    got = spark.sql(
        f"SELECT qty, tax FROM prop_rows WHERE {s_sql}"
        " ORDER BY qty, tax"
    ).collect()
    want = con.execute(
        f"SELECT qty, tax FROM prop_rows WHERE {d_sql}"
        " ORDER BY qty, tax"
    ).fetchall()
    assert [(r[0], r[1]) for r in got] == [
        (r[0], r[1]) for r in want
    ], q
