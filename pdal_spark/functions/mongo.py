"""filters.mongo — MongoDB-style JSON predicate compiler.

Reference: filters/MongoExpressionFilter.cpp (115 LoC) keeps points
matching a Mongo query document: implicit AND across fields,
`$and/$or/$not/$nor` combinators, `$eq/$gt/$gte/$lt/$lte/$ne/$in/
$nin` comparisons. Compiled here to a SQL predicate string in either
dialect (same dual-dialect scheme as functions.expr), so the engine
runs it as a Catalyst filter and the DuckDB oracle runs the identical
logic.
"""

from __future__ import annotations

import json

from pdal_spark.sqlgen import Dialect, SPARK, fnum


def _lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return fnum(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise ValueError(f"unsupported literal {v!r}")


_CMP = {"$eq": "=", "$gt": ">", "$gte": ">=", "$lt": "<",
        "$lte": "<=", "$ne": "<>"}


def _field(name: str, cond, d: Dialect) -> str:
    if not isinstance(cond, dict):
        return f"(`{name}` = {_lit(cond)})" if d.name == "spark" else (
            f'("{name}" = {_lit(cond)})'
        )
    col = f"`{name}`" if d.name == "spark" else f'"{name}"'
    parts = []
    for op, val in cond.items():
        if op in _CMP:
            parts.append(f"({col} {_CMP[op]} {_lit(val)})")
        elif op == "$in":
            parts.append(
                f"({col} IN ({', '.join(_lit(v) for v in val)}))"
            )
        elif op == "$nin":
            parts.append(
                f"({col} NOT IN ({', '.join(_lit(v) for v in val)}))"
            )
        elif op == "$not":
            parts.append(f"(NOT {_field(name, val, d)})")
        else:
            raise ValueError(f"unsupported mongo operator '{op}'")
    return "(" + " AND ".join(parts) + ")"


def compile_mongo(query: dict | str, d: Dialect = SPARK) -> str:
    """Mongo query document -> SQL predicate string."""
    if isinstance(query, str):
        query = json.loads(query)
    parts = []
    for key, val in query.items():
        if key == "$and":
            parts.append(
                "(" + " AND ".join(compile_mongo(q, d) for q in val) + ")"
            )
        elif key == "$or":
            parts.append(
                "(" + " OR ".join(compile_mongo(q, d) for q in val) + ")"
            )
        elif key == "$nor":
            parts.append(
                "(NOT ("
                + " OR ".join(compile_mongo(q, d) for q in val)
                + "))"
            )
        elif key == "$not":
            parts.append(f"(NOT {compile_mongo(val, d)})")
        elif key.startswith("$"):
            raise ValueError(f"unsupported mongo combinator '{key}'")
        else:
            parts.append(_field(key, val, d))
    return "(" + " AND ".join(parts) + ")" if parts else "TRUE"
