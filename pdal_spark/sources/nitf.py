"""readers.nitf analog — NITF 2.1 containers carrying LAS point
clouds in a "LIDARA DES" data extension segment.

Derivation: the MIL-STD-2500C fixed-width file-header layout (the
segment-length ledger: FL/HL then per-segment subheader+data length
pairs for images, graphics, texts, DES) and the reference's
convention (plugins/nitf/io/NitfReader.cpp:59-66): one LIDARA DES
holding a complete LAS/LAZ byte stream; multi-DES splits are
unsupported there too. The image segments are rasters and are not
point data.

The extracted blob goes through the proven sources.las machinery
(uncompressed np.frombuffer decode, or the LAZ codecs — native C
kernels when built). Validation: the reference's own fixture
test/data/nitf/autzen-utm10.ntf decodes point-for-point equal to
its .las twin in the same directory.

Scale shape: one Spark task per .ntf file (format-zoo convention);
planning reads the fixed header ledger only.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_VERSIONS = (b"NITF02.10", b"NSIF01.00")

# file-header fixed widths up to the segment ledger (MIL-STD-2500C)
_PRE_FL = (9, 2, 4, 10, 14, 80, 1, 2, 11, 2, 20, 2, 8, 4, 1, 8,
           43, 1, 40, 1, 8, 15, 5, 5, 1, 3, 24, 18)


def nitf_las_extent(path: str) -> tuple[int, int]:
    """(offset, length) of the LIDARA DES data (a complete LAS/LAZ
    stream) inside a NITF file, from the header ledger alone."""
    with open(path, "rb") as fh:
        head = fh.read(4096)
    if head[:9] not in _VERSIONS:
        raise ValueError(
            f"readers.nitf: {head[:9]!r} is not NITF 2.1 / NSIF 1.0")
    pos = sum(_PRE_FL)

    def take(n):
        nonlocal pos
        v = head[pos:pos + n]
        pos += n
        return v

    int(take(12))          # FL
    hl = int(take(6))
    numi = int(take(3))
    imgs = [(int(take(6)), int(take(10))) for _ in range(numi)]
    nums = int(take(3))
    segs = [(int(take(4)), int(take(6))) for _ in range(nums)]
    int(take(3))           # NUMX (reserved)
    numt = int(take(3))
    texts = [(int(take(4)), int(take(5))) for _ in range(numt)]
    numdes = int(take(3))
    dess = [(int(take(4)), int(take(9))) for _ in range(numdes)]
    if not dess:
        raise ValueError("readers.nitf: no DES segments (need a "
                         "LIDARA DES with LAS data)")

    off = hl
    for sh, ln in imgs:
        off += sh + ln
    for sh, ln in segs:
        off += sh + ln
    for sh, ln in texts:
        off += sh + ln
    with open(path, "rb") as fh:
        for sh, ln in dess:
            fh.seek(off)
            sub = fh.read(min(sh, 64))
            # DE + DESID(25): "LIDARA DES" (NitfFileReader.cpp:228)
            if sub[:2] == b"DE" and b"LIDARA" in sub[:32]:
                return off + sh, ln
            off += sh + ln
    raise ValueError("readers.nitf: no LIDARA DES found "
                     "(point-cloud NITF requires one)")


def nitf_quickinfo(path: str) -> dict:
    """Header-only preview: the embedded LAS header's facts."""
    from pdal_spark.sources.las import _parse_las_header

    off, length = nitf_las_extent(path)
    with open(path, "rb") as fh:
        fh.seek(off)
        blob = fh.read(min(length, 65536))
    hdr = _parse_las_header(blob)
    return {
        "las_offset": off, "las_length": length,
        "point_count": hdr["count"], "point_format": hdr["fmt"],
        "compressed": hdr["laz"] is not None,
    }


def read_nitf(spark: SparkSession, path: str) -> DataFrame:
    """Read NITF file(s) (file or glob): extract each LIDARA DES
    LAS stream and decode it with the sources.las machinery."""
    import glob as _glob
    import os

    from pdal_spark.sources.las import _dims, _parse_las_header

    files = sorted(_glob.glob(path)) if not os.path.isfile(path) \
        else [path]
    if not files:
        raise ValueError(f"readers.nitf: no files match {path!r}")

    tasks = []
    fmt0 = None
    for fp in files:
        off, length = nitf_las_extent(fp)
        with open(fp, "rb") as fh:
            fh.seek(off)
            hdr = _parse_las_header(fh.read(min(length, 65536)))
        if fmt0 is None:
            fmt0 = hdr["fmt"]
        elif hdr["fmt"] != fmt0:
            raise ValueError(
                f"{fp}: embedded point format {hdr['fmt']} differs "
                f"from the first file's {fmt0}")
        tasks.append((fp, off, length))

    cols = ", ".join(f"`{c}` {t}" for c, t in _dims(fmt0))
    plan = spark.createDataFrame(
        tasks, "path string, off long, length long") \
        .repartition(len(tasks))

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdal_spark.sources.las import (
            _decode_las,
            _parse_las_header,
        )

        for pdf in it:
            for row in pdf.itertuples(index=False):
                with open(row.path, "rb") as fh:
                    fh.seek(int(row.off))
                    blob = fh.read(int(row.length))
                yield _decode_las(blob, _parse_las_header(blob))

    return plan.mapInPandas(decode, cols)
