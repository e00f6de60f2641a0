"""DimRange parser — filters.range's predicate mini-language.

Reference (filters/private/DimRange.cpp):
- syntax: ``Name[lo:hi]`` with ``(``/``)`` for exclusive bounds,
  missing bound = +-infinity, leading ``!`` after the name negates;
- valuePasses (:125-136): fail if NaN or out of bounds; negation
  inverts *fail* (so a negated range PASSES NaN — mirrored exactly);
- list semantics (:186-212): OR across ranges of the SAME dimension,
  AND across dimensions.

Compiled to a single SQL predicate string (both dialects share it).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pdal_spark.sqlgen import Dialect, SPARK, fnum

_RANGE_RE = re.compile(
    r"\s*(?P<name>[A-Za-z_][A-Za-z_0-9]*)\s*(?P<neg>!?)\s*"
    r"(?P<lb>[\[(])\s*(?P<lo>[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?)?\s*:"
    r"\s*(?P<hi>[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?)?\s*(?P<ub>[\])])\s*$"
)


@dataclass(frozen=True)
class DimRange:
    name: str
    lo: float | None
    hi: float | None
    inc_lo: bool
    inc_hi: bool
    negate: bool

    @classmethod
    def parse(cls, s: str) -> "DimRange":
        m = _RANGE_RE.match(s)
        if not m:
            raise ValueError(f"bad DimRange: {s!r}")
        return cls(
            name=m.group("name"),
            lo=float(m.group("lo")) if m.group("lo") else None,
            hi=float(m.group("hi")) if m.group("hi") else None,
            inc_lo=m.group("lb") == "[",
            inc_hi=m.group("ub") == "]",
            negate=m.group("neg") == "!",
        )

    def sql(self, d: Dialect) -> str:
        col = f"`{self.name}`" if d.name == "spark" else f'"{self.name}"'
        fails = [f"isnan(cast({col} as double))"]
        if self.lo is not None:
            op = "<" if self.inc_lo else "<="
            fails.append(f"({col} {op} {fnum(self.lo)})")
        if self.hi is not None:
            op = ">" if self.inc_hi else ">="
            fails.append(f"({col} {op} {fnum(self.hi)})")
        fail = "(" + " OR ".join(fails) + ")"
        return fail if self.negate else f"(NOT {fail})"


def compile_ranges(specs: list[str], d: Dialect = SPARK) -> str:
    """OR within same dimension, AND across dimensions
    (DimRangeList::pointPasses, DimRange.cpp:186-212)."""
    if not specs:
        raise ValueError("empty range list")
    by_dim: dict[str, list[DimRange]] = {}
    for s in specs:
        r = DimRange.parse(s)
        by_dim.setdefault(r.name, []).append(r)
    groups = []
    for _, ranges in sorted(by_dim.items()):
        groups.append("(" + " OR ".join(r.sql(d) for r in ranges) + ")")
    return "(" + " AND ".join(groups) + ")"
