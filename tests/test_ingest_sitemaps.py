"""Tests: sitemap parse/coverage, magic-byte sniffing, TSDB ingest
(LWW compaction + out-of-order stats), PromQL resets/changes,
front-coded string dictionary."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- sitemaps


def test_parse_sitemap_fields_and_edges(spark):
    from dads_spark.ops import parse_sitemap

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a.com/x?a=1&amp;b=2</loc>"
        "<lastmod>2024-01-02T03:04:05</lastmod></url>"
        "<url>\n  <loc>\n    https://a.com/pad\n  </loc>\n</url>"
        "<url><loc><![CDATA[https://a.com/cdata?raw=&]]></loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"  # no loc: dropped
        "</urlset>"
    )
    df = spark.createDataFrame([("a.com", xml)], "host string, sitemap_xml string")
    rows = {
        r["loc"]: r["lastmod"]
        for r in parse_sitemap(df).collect()
    }
    assert rows == {
        "https://a.com/x?a=1&b=2": "2024-01-02T03:04:05",
        "https://a.com/pad": None,
        "https://a.com/cdata?raw=&": None,
    }


def test_parse_sitemap_index_entries_excluded(spark):
    from dads_spark.ops import parse_sitemap

    xml = (
        "<sitemapindex>"
        "<sitemap><loc>https://a.com/sitemap1.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame([("a.com", xml)], "host string, sitemap_xml string")
    assert parse_sitemap(df).count() == 0


def test_crawl_coverage_statuses(spark):
    from dads_spark.ops import crawl_coverage

    declared = spark.createDataFrame(
        [
            ("h", "u/ok", "2023-01-01T00:00:00"),
            ("h", "u/stale", "2025-01-01T00:00:00"),
            ("h", "u/gap", None),
            ("h", "u/nolm", None),  # crawled, no lastmod -> ok
        ],
        "host string, loc string, lastmod string",
    )
    pages = spark.createDataFrame(
        [("u/ok",), ("u/stale",), ("u/orphan",), ("u/nolm",)],
        "url string",
    ).select("url", F.to_timestamp(F.lit("2024-06-01 12:00:00")).alias("warc_ts"))
    out = {r["url"]: r["status"] for r in crawl_coverage(declared, pages).collect()}
    assert out == {
        "u/ok": "ok",
        "u/stale": "stale",
        "u/gap": "gap",
        "u/orphan": "orphan",
        "u/nolm": "ok",
    }


# ------------------------------------------------------------------- sniff


def test_sniff_magic_bytes(spark):
    from dads_spark.ops import (
        make_bmp,
        make_png,
        make_wav_pcm,
        sniff_content_type,
    )

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    cases = [
        (make_png(img), "png"),
        (make_bmp(img), "bmp"),
        (make_wav_pcm(np.zeros(4, dtype=np.int16)), "wav"),
        (b"RIFF\x00\x00\x00\x00AVI \x00\x00", "avi"),
        (b"%PDF-1.4 x", "pdf"),
        (b"\x1f\x8b\x08rest", "gzip"),
        (b"PK\x03\x04rest", "zip"),
        (b"GIF87athing", "gif"),
        (b"GIF89athing", "gif"),
        (b"WARC/1.0\r\n", "warc"),
        (b"\r\n\t <!DOCTYPE HTML><html>", "html"),
        (b"<HTML><body>x</body>", "html"),
        (b"plain text, no markup", "unknown"),
        (b"", "unknown"),
        (b"\x89PN", "unknown"),  # truncated magic
    ]
    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(cases)], "media_id long, payload binary"
    )
    got = {
        r["media_id"]: r["sniffed_type"]
        for r in sniff_content_type(df).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: got {got[i]}, want {want}"


# ------------------------------------------------------------------ ingest


def _writes(spark):
    # (series, ts, ver, value): re-deliveries at t=10, out-of-order at t=5
    rows = [
        ("a", 10, 1, 100),
        ("a", 10, 3, 103),  # winner at t=10 (highest ver)
        ("a", 10, 2, 999),  # higher value but lower ver: must lose
        ("a", 20, 4, 120),
        ("a", 5, 5, 105),   # arrives AFTER t=20 was seen: out of order
        ("b", 7, 1, 70),
    ]
    return spark.createDataFrame(
        rows, "series string, ts_e long, ingest_ver long, value long"
    )


def test_lww_compact_picks_highest_version(spark):
    from dads_spark.rollup import lww_compact

    out = {
        (r["series"], r["ts_e"]): (r["value"], r["ingest_ver"], r["n_writes"])
        for r in lww_compact(
            _writes(spark), ["series"], "ts_e", "ingest_ver", "value"
        ).collect()
    }
    assert out[("a", 10)] == (103, 3, 3)
    assert out[("a", 20)] == (120, 4, 1)
    assert out[("a", 5)] == (105, 5, 1)
    assert out[("b", 7)] == (70, 1, 1)


def test_lww_value_breaks_version_ties(spark):
    from dads_spark.rollup import lww_compact

    df = spark.createDataFrame(
        [("s", 1, 7, 10), ("s", 1, 7, 30), ("s", 1, 7, 20)],
        "series string, ts_e long, ingest_ver long, value long",
    )
    row = lww_compact(df, ["series"], "ts_e", "ingest_ver", "value").collect()[0]
    assert (row["value"], row["n_writes"]) == (30, 3)


def test_out_of_order_stats(spark):
    from dads_spark.rollup import out_of_order_stats

    out = {
        r["series"]: r
        for r in out_of_order_stats(
            _writes(spark), ["series"], "ts_e", "ingest_ver"
        ).collect()
    }
    a = out["a"]
    # arrivals in ver order: t=10,999@10,103@10... ts walk: 10,10,10,20,5
    assert a["n_arrivals"] == 5
    assert a["n_points"] == 3
    assert a["n_out_of_order"] == 3  # two duplicate t=10 + the t=5 jump
    assert a["max_backwards_s"] == 15  # 20 -> 5
    b = out["b"]
    assert (b["n_out_of_order"], b["max_backwards_s"]) == (0, 0)


# ------------------------------------------------------------------ promql


def test_resets_changes_hand_case(spark):
    from dads_spark.rollup import resets_changes

    # one series, 100s step/window=200s: values 5,7,7,3,4
    rows = [("m", t, v) for t, v in [(50, 5), (120, 7), (170, 7), (220, 3), (260, 4)]]
    df = spark.createDataFrame(rows, "metric string, ts_e long, value long")
    out = {
        r["eval_ts"]: (r["n_samples"], r["resets"], r["changes"])
        for r in resets_changes(
            df, ["metric"], "ts_e", "value", window_s=200, step_s=100
        ).collect()
    }
    # window (0,200]: samples 50,120,170 -> pairs (5,7),(7,7): 0 resets, 1 change
    assert out[200] == (3, 0, 1)
    # window (100,300]: samples 120,170,220,260 -> pairs (7,7),(7,3),(3,4):
    # 1 reset (drop to 3), 2 changes
    assert out[300] == (4, 1, 2)
    # window (200,400]: samples 220,260 -> pair (3,4): 0 resets 1 change
    assert out[400] == (2, 0, 1)


# --------------------------------------------------------------- frontcode


def test_frontcode_block_roundtrip_and_restarts():
    from dads_spark.compress import frontcode_block, frontdecode_block

    strs = sorted(
        f"https://www.example.com/articles/en/{i % 5}/item-{i}".encode()
        for i in range(100)
    )
    pl, suf, sl = frontcode_block(strs, block=16)
    assert list(pl[::16]) == [0] * len(pl[::16])  # restart points raw
    assert frontdecode_block(pl, suf, sl) == strs
    # prefix coding must actually compress sorted URLs
    assert len(suf) < sum(len(s) for s in strs) * 0.5


@pytest.mark.parametrize("strs", [[], [b"only"], [b"", b"a", b"aa", b"ab"]])
def test_frontcode_edge_lists(strs):
    from dads_spark.compress import frontcode_block, frontdecode_block

    pl, suf, sl = frontcode_block(strs, block=4)
    assert frontdecode_block(pl, suf, sl) == strs


def test_frontcode_hypothesis_style_random():
    import random

    from dads_spark.compress import frontcode_block, frontdecode_block

    rng = random.Random(7)
    for _ in range(25):
        n = rng.randrange(0, 40)
        strs = sorted(
            {
                bytes(
                    rng.choice(b"abc")
                    for _ in range(rng.randrange(0, 12))
                )
                for _ in range(n)
            }
        )
        pl, suf, sl = frontcode_block(strs, block=rng.choice([1, 2, 16]))
        assert frontdecode_block(pl, suf, sl) == strs


def test_frontcode_roundtrip_distributed(spark):
    from dads_spark.compress import frontcode_roundtrip

    df = spark.createDataFrame(
        [("g1", f"https://g1.com/a/{i}") for i in range(40)]
        + [("g2", f"https://g2.com/b/{i}") for i in range(17)],
        "domain string, url string",
    )
    out = frontcode_roundtrip(df, "domain", "url").toPandas()
    assert sorted(out["url"]) == sorted(
        {f"https://g1.com/a/{i}" for i in range(40)}
        | {f"https://g2.com/b/{i}" for i in range(17)}
    )
    # byte accounting: encoded < raw on URL-shaped dictionaries
    per = out.groupby("domain").first()
    assert (per["enc_bytes"] < per["raw_bytes"]).all()


# --------------------------------------------------------------------- cdx


def test_surt_key_transform(spark):
    from dads_spark.ops import surt_key

    cases = [
        ("https://www.Example.COM:443/A/b?Q=1", "com,example)/a/b?q=1"),
        ("http://sub.host.example.co.uk:80/x", "uk,co,example,host,sub)/x"),
        ("https://example.com", "com,example)/"),
        ("example.com/path", "com,example)/path"),  # schemeless
        ("https://example.com:8080/p", "com,example:8080)/p"),  # non-default port kept
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    from pyspark.sql import functions as F2

    got = [r["s"] for r in df.select(surt_key(F2.col("url")).alias("s")).collect()]
    assert got == [w for _, w in cases]


def test_parse_cdxj_and_malformed(spark):
    from dads_spark.ops import parse_cdxj

    good = (
        'com,a)/x 20240102030405 {"url": "https://a.com/x", "status": '
        '"200", "mime": "text/html", "digest": "sha1:Z", "length": 42}'
    )
    df = spark.createDataFrame(
        [(good,), ("not a cdx line",), ("a)/x 2024 {}",)], "line string"
    )
    rows = parse_cdxj(df).collect()
    ok = [r for r in rows if r["surt"] is not None]
    assert len(ok) == 1
    r = ok[0]
    assert (r["surt"], r["cdx_ts"], r["status"], r["length"]) == (
        "com,a)/x", 20240102030405, 200, 42
    )


def test_latest_captures_digest_collapse(spark):
    from dads_spark.ops import latest_captures

    rows = [
        # same surt: digest D1 at t1/t2 (re-crawl unchanged), D2 at t3
        ("s)/", 1, "u", 200, "text/html", "D1", 10),
        ("s)/", 2, "u", 200, "text/html", "D1", 10),
        ("s)/", 3, "u", 200, "text/html", "D2", 10),
        ("s)/", 4, "u", 404, "text/html", "D3", 10),  # non-2xx: ignored
        ("t)/", 9, "v", 204, "text/html", "E", 5),
    ]
    df = spark.createDataFrame(
        rows,
        "surt string, cdx_ts long, url string, status long, mime string,"
        " digest string, length long",
    )
    out = {r["surt"]: r for r in latest_captures(df).collect()}
    s = out["s)/"]
    assert (s["digest"], s["first_ts"], s["last_ts"]) == ("D2", 3, 3)
    assert (s["n_captures"], s["n_distinct_digests"]) == (3, 2)
    # D1's unchanged re-crawl: if D1 were newest its first_ts would be 1
    t = out["t)/"]
    assert (t["digest"], t["first_ts"], t["n_captures"]) == ("E", 9, 1)
