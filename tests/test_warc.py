"""WARC source connector (io/warc.py): record parsing, HTTP stripping,
non-response skipping, gzip, distributed read."""

from __future__ import annotations

import gzip

from dads_spark.io import build_warc_record, parse_warc_bytes, read_warc


def _stream() -> bytes:
    return (
        build_warc_record(
            "https://a.com/1", "2024-01-01T00:00:01Z", b"<html>one</html>"
        )
        + build_warc_record(
            "https://a.com/2", "2024-01-01T00:00:02Z", b"GET", rec_type="request"
        )
        + build_warc_record(
            "https://b.com/3", "2024-01-01T00:00:03Z", b"body\r\n\r\nwith gap"
        )
    )


def test_parse_warc_bytes_semantics():
    recs = parse_warc_bytes(_stream())
    # request record skipped; HTTP headers stripped; body bytes exact —
    # including one that CONTAINS a blank line (Content-Length framing,
    # not delimiter scanning, must bound the payload)
    assert [(r["url"], r["body"]) for r in recs] == [
        ("https://a.com/1", b"<html>one</html>"),
        ("https://b.com/3", b"body\r\n\r\nwith gap"),
    ]
    assert all(r["rec_type"] == "response" for r in recs)
    assert recs[0]["warc_date"] == "2024-01-01T00:00:01Z"


def test_parse_handles_truncated_and_garbage():
    assert parse_warc_bytes(b"") == []
    assert parse_warc_bytes(b"not a warc at all") == []
    # truncated header: no record, no crash
    assert parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n") == []


def test_read_warc_distributed_and_gzip(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_stream())
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(
            build_warc_record(
                "https://c.com/9", "2024-01-02T10:00:00Z", b"zipped"
            )
        )
    )
    out = read_warc(spark, str(tmp_path / "*.warc*")).collect()
    got = {r["url"]: (r["n_bytes"], bytes(r["html"])) for r in out}
    assert got == {
        "https://a.com/1": (16, b"<html>one</html>"),
        "https://b.com/3": (16, b"body\r\n\r\nwith gap"),
        "https://c.com/9": (6, b"zipped"),
    }
    ts = {r["url"]: r["warc_ts"] for r in out}
    assert ts["https://c.com/9"].year == 2024 and ts["https://c.com/9"].hour == 10
