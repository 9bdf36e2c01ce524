"""WARC source connector: Common-Crawl-style web-archive ingestion.

The engine's data model starts at an Iceberg/parquet table of pages
(url, warc_ts, html, text, lang) — BASELINE.json's input hint — but the
upstream artifact is WARC (ISO 28500, public format): the record stream
Common Crawl publishes. This reader turns WARC files into that pages
table:

- files arrive via Spark's ``binaryFile`` source (one task per file —
  the standard CC processing grain: archives are ~1 GB, a 100 TB crawl
  is ~10^5 files fanned across the cluster; no shuffle anywhere, the
  parse is map-only);
- each task splits its file on record boundaries (``WARC/1.0`` header
  lines), parses the WARC header block (WARC-Type, WARC-Target-URI,
  WARC-Date, Content-Length), takes exactly Content-Length payload
  bytes, and for ``response`` records strips the embedded HTTP header
  block to the entity body;
- non-response records (request/metadata/warcinfo) are dropped — they
  carry no page content.

Gzip note: Common Crawl ships per-record gzip members (.warc.gz).
This reader handles the UNCOMPRESSED stream; a .gz path decompresses
whole-file first (binaryFile content is in memory anyway). Member-wise
streaming decompression is an I/O optimization, not a semantic change.

The ``warc_ingest`` registry entry pins the parser by ROUNDTRIP: the
query synthesizes a deterministic WARC file from the documents table,
reads it back through this parser, and the DuckDB oracle reconstructs
the expected rows directly from documents — the reader must exactly
invert the writer, byte counts included (north rule's byte-identical
text invariant, applied at the ingestion boundary).

Reference analog: none (DADS reads flat binary doubles; SURVEY §2.1 D1);
this is the §2.4/web-corpus ingestion source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["parse_warc_bytes", "read_warc", "build_warc_record"]

_CRLF = b"\r\n"


def build_warc_record(
    url: str, date_iso: str, body: bytes, rec_type: str = "response"
) -> bytes:
    """One spec-shaped WARC record (with an HTTP/1.1 200 header block for
    responses) — the writer half the roundtrip tests invert."""
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" if (
        rec_type == "response"
    ) else b""
    payload = http + body
    header = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {rec_type}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {date_iso}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + _CRLF
    )
    return header + payload + _CRLF + _CRLF


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC stream: [{url, warc_date, rec_type, body}] for
    response records. Pure function over bytes — the per-task kernel."""
    out = []
    pos = 0
    n = len(data)
    while True:
        start = data.find(b"WARC/1.0\r\n", pos)
        if start < 0:
            break
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        pos = body_start + length
        if headers.get("warc-type") == "response":
            http_end = payload.find(_CRLF + _CRLF)
            body = payload[http_end + 4 :] if http_end >= 0 else payload
            out.append(
                {
                    "url": headers.get("warc-target-uri", ""),
                    "warc_date": headers.get("warc-date", ""),
                    "rec_type": "response",
                    "body": body,
                }
            )
        if pos >= n:
            break
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files at ``path`` (glob ok) -> DataFrame
    (url, warc_ts timestamp, html binary, n_bytes long). Map-only: one
    ``binaryFile`` row per archive, one parse kernel per task."""
    import gzip

    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r["content"])
                if r["path"].endswith(".gz"):
                    data = gzip.decompress(data)
                for rec in parse_warc_bytes(data):
                    rows.append(
                        {
                            "url": rec["url"],
                            "warc_date": rec["warc_date"],
                            "html": rec["body"],
                            "n_bytes": len(rec["body"]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_date", "html", "n_bytes"]
            )

    parsed = files.mapInPandas(
        parse, "url string, warc_date string, html binary, n_bytes long"
    )
    from pyspark.sql import functions as F

    return parsed.select(
        "url",
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        "html",
        "n_bytes",
    )
