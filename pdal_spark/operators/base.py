"""Cross-cutting stage semantics.

Every PDAL stage supports ``where`` / ``where_merge`` (reference:
pdal/Stage.hpp:86-91 WhereMergeMode, pdal/Stage.cpp:61-76 splitView,
pdal/Filter.cpp:74-89): rows failing the predicate bypass the stage,
and are merged back into the output unless where_merge=false.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame


def apply_where(
    df: DataFrame,
    op: Callable[[DataFrame], DataFrame],
    where: Column | str | None = None,
    where_merge: bool = True,
) -> DataFrame:
    """Run ``op`` only on rows passing ``where``.

    where_merge=True  -> untouched complement is unioned back
                         (PDAL WhereMergeMode::True / Auto for filters)
    where_merge=False -> complement is dropped
                         (WhereMergeMode::False — one view per split)

    The complement keeps rows where the predicate is false OR null,
    matching PDAL's "point doesn't pass the test" semantics.
    """
    if where is None:
        return op(df)
    cond = df[where] if isinstance(where, str) else where
    passed = op(df.where(cond))
    if not where_merge:
        return passed
    skipped = df.where(~cond.eqNullSafe(True))
    # op may add columns; align schemas by name, nulls for new cols.
    return passed.unionByName(skipped, allowMissingColumns=True)
