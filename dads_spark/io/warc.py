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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

__all__ = [
    "parse_warc_bytes",
    "read_warc",
    "build_warc_record",
    "wet_records",
]

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


def wet_records(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    shard_col: str | None = None,
) -> DataFrame:
    """Assemble Common-Crawl-style WET conversion records (the
    extracted-text sibling of the WARC response archive: one
    ``WARC-Type: conversion`` record per page, header block + UTF-8 text
    body) and their byte offsets into the concatenated member stream.

    Header layout per the WARC 1.1 / Common Crawl WET convention:

        WARC/1.0\\r\\n
        WARC-Type: conversion\\r\\n
        WARC-Target-URI: <url>\\r\\n
        WARC-Date: <ISO-8601 UTC seconds>\\r\\n
        Content-Type: text/plain\\r\\n
        Content-Length: <UTF-8 BYTE length of body>\\r\\n
        \\r\\n
        <text>\\r\\n\\r\\n

    Content-Length counts BYTES of the body (octet_length, not
    characters — the r3 warc_ingest lesson); record_len likewise.
    ``offset`` is the running byte start of each record in url order —
    the CDX pointer a reader seeks to. Output: url, offset, record_len,
    record.

    Scale shape: header assembly is per-row codegen (concat +
    octet_length + date_format); the offset cumsum is ONE window over the
    output order. At 100 TB you partition the stream into shard files and
    run the window per shard — pass ``shard_col`` and the offset window
    partitions by it (offsets are per-member-file in real WET output
    anyway); without it the cumsum is a single-task window, fine only for
    one member file.
    """
    body = F.coalesce(F.col(text_col), F.lit(""))
    crlf = F.lit("\r\n")
    record = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: conversion"), crlf,
        F.lit("WARC-Target-URI: "), F.col(url_col), crlf,
        F.lit("WARC-Date: "),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'"), crlf,
        F.lit("Content-Type: text/plain"), crlf,
        F.lit("Content-Length: "),
        F.octet_length(body).cast("string"), crlf,
        crlf,
        body, crlf, crlf,
    )
    shard_cols = [shard_col] if shard_col else []
    staged = df.select(
        *shard_cols, F.col(url_col).alias("url"), record.alias("record")
    ).withColumn("record_len", F.octet_length("record").cast("long"))
    w = (
        Window.partitionBy(shard_col).orderBy("url")
        if shard_col
        else Window.orderBy("url")
    )
    return staged.select(
        *shard_cols,
        "url",
        (
            F.coalesce(
                F.sum("record_len").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        )
        .cast("long")
        .alias("offset"),
        "record_len",
        "record",
    )
