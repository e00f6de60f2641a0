"""WARC reader — the archive format Common-Crawl web corpora ship in
(readers.* analog for the webtext payload; same role as PDAL's format
readers in io/, e.g. io/LasReader.cpp: container -> columnar rows).

Distributed pattern: one WARC FILE per task. `spark.read.format
("binaryFile")` gives (path, content) rows; each file's records are
parsed ROW-LOCALLY inside a mapInPandas batch (never split a record
across tasks — the same per-file parallelism CC's own tooling uses).
At 100 TB the unit of parallelism is the ~1 GB WARC segment, which is
exactly this layout; no shuffle happens until a downstream op needs
one.

Only `response` records are emitted, as
(url, warc_ts, record_type, payload):

    WARC/1.0
    WARC-Type: response
    WARC-Target-URI: https://...
    WARC-Date: 2026-01-01T00:00:00Z
    Content-Length: <n>
    <blank line>
    <n bytes of payload>
    <blank line><blank line>

This parser handles the strict subset above (the shape CC writes);
it is deliberately dependency-free (no warcio in this environment).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "url string, warc_ts string, record_type string, payload binary"
)

_SEP = b"\r\n\r\n"


def _parse_warc_bytes(data: bytes) -> Iterator[tuple]:
    """Yield (url, ts, type, payload) per record. Strict-subset
    parser: header block up to the first CRLFCRLF, payload sized by
    Content-Length."""
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(_SEP, pos)
        if head_end < 0:
            return
        header = data[pos:head_end].decode("utf-8", "replace")
        if not header.startswith("WARC/"):
            # skip garbage until the next version line
            nxt = data.find(b"WARC/1.", head_end)
            if nxt < 0:
                return
            pos = nxt
            continue
        fields = {}
        for line in header.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", "0"))
        except ValueError:
            clen = 0
        body_start = head_end + len(_SEP)
        payload = data[body_start:body_start + clen]
        yield (
            fields.get("warc-target-uri", ""),
            fields.get("warc-date", ""),
            fields.get("warc-type", ""),
            payload,
        )
        # records are terminated by two CRLFs after the payload
        pos = body_start + clen
        while data[pos:pos + 2] == b"\r\n":
            pos += 2


def read_warc(
    spark: SparkSession,
    path: str,
    record_type: str = "response",
) -> DataFrame:
    """WARC files under `path` -> (url, warc_ts, record_type,
    payload) DataFrame, one task per file."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(_parse_warc_bytes(bytes(content)))
            out = pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "record_type", "payload"],
            )
            if record_type:
                out = out[out.record_type == record_type]
            yield out

    return files.select("content").mapInPandas(parse, WARC_SCHEMA)


def write_warc_file(path: str, records: list[tuple]) -> None:
    """Serialize (url, ts, rtype, payload-bytes) records into one
    WARC file (test/fixture helper — the inverse of the parser)."""
    with open(path, "wb") as fh:
        for url, ts, rtype, payload in records:
            head = (
                f"WARC/1.0\r\n"
                f"WARC-Type: {rtype}\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {ts}\r\n"
                f"Content-Length: {len(payload)}\r\n"
            ).encode()
            fh.write(head + b"\r\n" + payload + b"\r\n\r\n")
