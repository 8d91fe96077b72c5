"""WARC source: read Common-Crawl-style WARC files into the pages schema.

The reference fetches live HTML; a 100 TB corpus arrives as WARC archives.
This source turns a directory of ``.warc`` / ``.warc.gz`` files into the
engine's ``pages`` DataFrame:

* file discovery + distribution via Spark's ``binaryFile`` source (one
  task per file — WARCs are the natural parallelism unit; Common Crawl
  ships ~1 GB segments),
* record parsing in an Arrow-batched ``mapInPandas`` (pure Python WARC/1.x
  parser: response records only, HTTP header split, charset-agnostic raw
  bytes out),
* the result feeds ``crawl.prepare_pages`` unchanged.

Writer included for tests/fixtures: ``write_warc`` serializes rows into a
spec-conformant WARC file (WARC/1.0, Content-Length framed).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.types as T

WARC_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("warc_file", T.StringType()),
    ]
)

_CRLF = b"\r\n"


def _resync(stream: io.BytesIO) -> bool:
    """Scan forward to the next plausible record header ('WARC/' at a
    line start); False when none remains.  One bad record must cost at
    most itself, never the rest of a ~1 GB segment."""
    pos = stream.tell()
    rest = stream.read()
    if rest.startswith(b"WARC/"):
        stream.seek(pos)
        return True
    i = rest.find(b"\nWARC/")
    if i < 0:
        return False
    stream.seek(pos + i + 1)
    return True


def _parse_warc_stream(buf: bytes, source_name: str) -> Iterator[dict]:
    """Yield response records from one WARC byte stream.

    Malformed records (bad framing, non-numeric Content-Length) are
    skipped by resyncing to the next record header instead of silently
    aborting the whole file or failing the Spark task."""
    stream = io.BytesIO(buf)
    while True:
        # skip blank lines between records
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            if not _resync(stream):
                return
            continue
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if h in (_CRLF, b"\n", b""):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            if not _resync(stream):
                return
            continue
        block = stream.read(length)
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
        except ValueError:
            ts = datetime(1970, 1, 1, tzinfo=timezone.utc)
        # split HTTP response header from payload
        status, content_type, payload = 200, "text/html", block
        sep = block.find(b"\r\n\r\n")
        if block.startswith(b"HTTP/") and sep != -1:
            head, payload = block[:sep], block[sep + 4 :]
            lines = head.split(_CRLF)
            try:
                status = int(lines[0].split()[1])
            except (IndexError, ValueError):
                status = 200
            for hl in lines[1:]:
                if hl.lower().startswith(b"content-type:"):
                    content_type = hl.split(b":", 1)[1].strip().decode("latin-1")
        yield {
            "url": url,
            "warc_ts": ts,
            "html": payload,
            "status": status,
            "content_type": content_type,
            "warc_file": source_name,
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .warc(.gz) files -> pages-shaped DataFrame."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_PAGES_SCHEMA.fields]
        for b in batches:
            rows: list[dict] = []
            for _, r in b.iterrows():
                raw = bytes(r["content"])
                if r["path"].endswith(".gz"):
                    raw = gzip.decompress(raw)
                rows.extend(_parse_warc_stream(raw, r["path"]))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(parse, WARC_PAGES_SCHEMA)


def write_warc(rows: list[dict], path: str, compress: bool = False) -> None:
    """Serialize pages rows into a WARC/1.0 file (test/fixture writer)."""
    out = io.BytesIO()
    for r in rows:
        payload = bytes(r["html"])
        http = (
            f"HTTP/1.1 {r.get('status', 200)} OK\r\n"
            f"Content-Type: {r.get('content_type', 'text/html')}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("latin-1") + payload
        ts = r.get("warc_ts") or datetime(1970, 1, 1, tzinfo=timezone.utc)
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n\r\n"
        ).encode("latin-1")
        out.write(head + http + _CRLF + _CRLF)
    data = out.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
