"""readers.stac analog — static STAC catalog/ItemCollection pruning.

Reference: plugins/draco-era readers.stac (doc/stages/readers.stac,
StacReader) walks a SpatioTemporal Asset Catalog, filters Items by
bbox / datetime / id / collection, and reads the matching assets.
The Spark shape: the catalog JSON is parsed DRIVER-side (it is
metadata, not data — typically KBs for millions of assets when
sharded), Items are pruned by the same predicates, and the surviving
assets' parquet hrefs become one unioned scan. This is the same
file-skipping contract as readers.tindex / Iceberg manifest pruning
(SURVEY.md §4): predicate evaluation against per-file metadata
BEFORE any data I/O.

Supported catalog shapes (all static JSON, no network):
- an ItemCollection: {"type": "FeatureCollection", "features": [...]}
- a Catalog with "links" of rel=item/child pointing at local JSON
- a bare list of Items

Item fields used: id, bbox [xmin, ymin, xmax, ymax],
properties.datetime (ISO-8601), collection, assets.*.href (assets
whose href ends in .parquet are readable; others are ignored).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from functools import reduce

from pyspark.sql import DataFrame, SparkSession


def _parse_dt(s: str) -> datetime:
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt


def _walk(path_or_obj, base_dir: str | None = None) -> list[dict]:
    """Resolve a catalog file / dict / list into a flat Item list,
    following local rel=item / rel=child links."""
    if isinstance(path_or_obj, str):
        base_dir = os.path.dirname(os.path.abspath(path_or_obj))
        with open(path_or_obj) as f:
            obj = json.load(f)
    else:
        obj = path_or_obj
    if isinstance(obj, list):
        return [i for i in obj if isinstance(i, dict)]
    t = obj.get("type")
    if t == "FeatureCollection":
        return list(obj.get("features", []))
    if t == "Feature":
        return [obj]
    if t in ("Catalog", "Collection"):
        items: list[dict] = []
        for link in obj.get("links", []):
            if link.get("rel") not in ("item", "child"):
                continue
            href = link.get("href", "")
            if not href or href.startswith(("http://", "https://")):
                continue  # no network in this environment
            target = (
                href if os.path.isabs(href)
                else os.path.join(base_dir or ".", href)
            )
            items.extend(_walk(target))
        return items
    return []


def prune_items(
    items: list[dict],
    bounds: tuple[float, float, float, float] | None = None,
    datetime_range: tuple[str, str] | None = None,
    ids: list[str] | None = None,
    collections: list[str] | None = None,
) -> list[dict]:
    """StacReader's Item predicates: bbox intersection
    (bounds = (xmin, xmax, ymin, ymax) like readers.tindex),
    inclusive datetime window, id allow-list, collection
    allow-list."""
    out = []
    want_ids = set(ids) if ids else None
    want_cols = set(collections) if collections else None
    dt0 = _parse_dt(datetime_range[0]) if datetime_range else None
    dt1 = _parse_dt(datetime_range[1]) if datetime_range else None
    for it in items:
        if want_ids is not None and it.get("id") not in want_ids:
            continue
        if (
            want_cols is not None
            and it.get("collection") not in want_cols
        ):
            continue
        if bounds is not None:
            bb = it.get("bbox")
            if not bb or len(bb) < 4:
                continue
            qx0, qx1, qy0, qy1 = (float(v) for v in bounds)
            bx0, by0, bx1, by1 = (float(v) for v in bb[:4])
            if bx1 < qx0 or bx0 > qx1 or by1 < qy0 or by0 > qy1:
                continue
        if dt0 is not None:
            ds = (it.get("properties") or {}).get("datetime")
            if not ds:
                continue
            d = _parse_dt(ds)
            if d < dt0 or d > dt1:
                continue
        out.append(it)
    return out


def item_assets(items: list[dict]) -> list[str]:
    """Readable (parquet) asset hrefs of the Items, deduplicated,
    order-stable."""
    seen: dict[str, None] = {}
    for it in items:
        for asset in (it.get("assets") or {}).values():
            href = asset.get("href", "")
            if href.endswith(".parquet"):
                seen.setdefault(href, None)
    return list(seen)


def read_stac(
    spark: SparkSession,
    catalog,
    bounds: tuple[float, float, float, float] | None = None,
    datetime_range: tuple[str, str] | None = None,
    ids: list[str] | None = None,
    collections: list[str] | None = None,
) -> DataFrame:
    """Prune the catalog's Items, then scan the surviving parquet
    assets as one DataFrame. Raises if nothing matches (like
    readers.tindex on an empty selection)."""
    items = prune_items(
        _walk(catalog), bounds=bounds, datetime_range=datetime_range,
        ids=ids, collections=collections,
    )
    paths = item_assets(items)
    if not paths:
        raise ValueError("stac: no items match the query predicates")
    scans = [spark.read.parquet(p) for p in paths]
    return reduce(lambda a, b: a.unionByName(b), scans)
