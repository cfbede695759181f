"""WARC ingest: Common-Crawl-style archives -> the pages table.

The engine's input_hint corpus is "Common-Crawl-style web pages"; the
wire format those actually arrive in is WARC (ISO 28500): records of
``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<block>\\r\\n\\r\\n``, where a
``response`` record's block is an HTTP response (status line +
headers + body). This module parses that format distributed — same
shape as osmxml: one binaryFile task per archive, one Arrow parse
stage, codegen downstream — yielding (url, warc_ts, html, n_bytes)
rows ready for `extract.extract_points` / the text ops.

Supports plain ``.warc`` and gzip archives (Common Crawl gzips each
record as its own member; Python's gzip transparently decompresses
concatenated members, so both per-record-gzip and whole-file-gzip
read identically). Malformed records degrade per record, never per
job. `encode_warc` writes spec-shaped fixtures for tests.

Parallelism = archive count (Common Crawl ships ~1 GB segments by the
tens of thousands, so the file-per-task model is the natural fit).
"""

from __future__ import annotations

import gzip
import zlib
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, n_bytes int"


def encode_warc(records: list, compress: bool = False) -> bytes:
    """[(url, iso_ts, html_bytes)] -> WARC bytes (response records
    wrapped in minimal HTTP responses), optionally gzipped."""
    out = []
    for url, ts, html in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(html)).encode() +
                b"\r\n\r\n" + html)
        hdr = ("WARC/1.0\r\n"
               "WARC-Type: response\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: {ts}\r\n"
               f"Content-Length: {len(http)}\r\n"
               "Content-Type: application/http; msgtype=response\r\n"
               "\r\n").encode()
        out.append(hdr + http + b"\r\n\r\n")
    blob = b"".join(out)
    return gzip.compress(blob) if compress else blob


def _next_record(payload: bytes, i: int) -> int:
    """Next record start at/after `i`, anchored on a true boundary:
    offset 0 or preceded by the \\r\\n\\r\\n record separator, and
    followed by a version digit ('WARC/1.'). A bare b'WARC/' substring
    can occur inside an HTML body that QUOTES a WARC header; resyncing
    on it after a corrupt Content-Length would yield garbage rows."""
    while True:
        j = payload.find(b"WARC/", i)
        if j < 0:
            return -1
        if ((j == 0 or payload[max(0, j - 4):j] == b"\r\n\r\n")
                and payload[j + 5:j + 6].isdigit()):
            return j
        i = j + 1


def _parse_warc(payload: bytes) -> list:
    """WARC bytes -> [(url, ts, html, n_bytes)]; per-record tolerance."""
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError, zlib.error):
            # truncated/corrupt archive: skip the archive, not the job
            return []
    rows = []
    i, n = 0, len(payload)
    while i < n:
        j = _next_record(payload, i)
        if j < 0:
            break
        he = payload.find(b"\r\n\r\n", j)
        if he < 0:
            break
        headers = {}
        for line in payload[j:he].decode("latin-1").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "-1"))
        except ValueError:
            length = -1
        if length < 0:
            i = he + 4
            continue
        block = payload[he + 4:he + 4 + length]
        i = he + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts = None
        raw_ts = headers.get("warc-date", "")
        for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
            try:
                # tz-aware: 'Z' is UTC regardless of the session's
                # spark.sql.session.timeZone
                ts = datetime.strptime(raw_ts, fmt) \
                    .replace(tzinfo=timezone.utc)
                break
            except ValueError:
                continue
        if url is None:
            continue
        # strip the embedded HTTP response header
        be = block.find(b"\r\n\r\n")
        html = block[be + 4:] if block[:5] in (b"HTTP/",) and be >= 0 \
            else block
        rows.append((url, ts, bytearray(html), len(html)))
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Parse .warc / .warc.gz archive(s) at `path` (glob ok) into the
    pages table (url, warc_ts, html, n_bytes)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(_parse_warc(bytes(content)))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html",
                                              "n_bytes"])

    return files.mapInPandas(_parse, schema=PAGES_SCHEMA)
