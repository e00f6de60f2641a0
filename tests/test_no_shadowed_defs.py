"""Guard against silently-shadowed definitions: a module defining
the same top-level name twice keeps only the later one (this shipped
a duplicate operator once — contour_segments — and earlier a
dsir_weights arity bug). AST-scan every engine module."""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / "pdal_spark"


def test_no_duplicate_toplevel_defs():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        seen: set[str] = set()
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                if node.name in seen:
                    offenders.append(f"{path.name}:{node.name}")
                seen.add(node.name)
    assert not offenders, f"shadowed top-level defs: {offenders}"


def test_gate_registry_loads_and_rejects_duplicates():
    from pdal_spark.gate import GATES, gate

    assert len(GATES) >= 442
    try:
        gate(next(iter(GATES)), None)(lambda s, d: None)
    except ValueError:
        pass
    else:
        raise AssertionError("duplicate gate name not rejected")
