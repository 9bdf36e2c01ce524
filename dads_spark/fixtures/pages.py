"""Deterministic synthetic `pages` table (FIXTURES.md F1, input_hint shape).

Columns exactly (url string, warc_ts timestamp, html binary, text string,
lang string). Zipf-skewed domains (two hot domains take a large share —
exercises salting), per-domain arrival over a 28-day window with planted
silent days (exercises gap-fill), deterministic token-soup text (byte-
identity invariant), per-domain language distribution (lang-mix metric).
Generated locally with NumPy and handed to Spark via Arrow — no external
data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

N_DOMAINS = 64
BASE_TS = np.datetime64("2024-01-01T00:00:00")
WINDOW_DAYS = 28
LANGS = np.array(["en", "de", "fr", "es", "other"])
_WORDS = np.array(
    "the a web page crawl data spark series time anomaly rollup tier bucket "
    "domain text lang count byte window graph score node edge path query".split()
)


def pages_pandas(n_rows: int = 10_000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # Zipf(a=1.3) over a fixed domain list, clipped to the list size
    ranks = np.minimum(rng.zipf(1.3, n_rows), N_DOMAINS) - 1
    domains = np.array([f"d{i:02d}.example.org" for i in range(N_DOMAINS)])
    dom = domains[ranks]

    # arrival: uniform over 28 days, but domain i is silent on day (i mod 7)
    seconds = rng.integers(0, WINDOW_DAYS * 86400, n_rows)
    day = seconds // 86400
    silent = (day % 7) == (ranks % 7)
    seconds = np.where(silent, (seconds + 86400) % (WINDOW_DAYS * 86400), seconds)
    warc_ts = BASE_TS + seconds.astype("timedelta64[s]")

    # deterministic token-soup text, length ~ lognormal
    n_tokens = np.maximum(3, rng.lognormal(2.5, 0.5, n_rows).astype(int))
    starts = rng.integers(0, len(_WORDS), n_rows)
    texts = [
        " ".join(_WORDS[(starts[i] + np.arange(n_tokens[i])) % len(_WORDS)])
        for i in range(n_rows)
    ]

    # per-domain language distribution: rotate a fixed simplex by domain
    base = np.array([0.55, 0.15, 0.12, 0.10, 0.08])
    lang_idx = np.empty(n_rows, dtype=np.int64)
    u = rng.random(n_rows)
    for i in range(N_DOMAINS):
        mask = ranks == i
        probs = np.roll(base, i % 5)
        lang_idx[mask] = np.searchsorted(np.cumsum(probs), u[mask])
    lang = LANGS[np.minimum(lang_idx, len(LANGS) - 1)]

    urls = np.array([f"https://{d}/p/{i:08d}" for i, d in enumerate(dom)])
    html = [f"<html><body>{t}</body></html>".encode() for t in texts]
    return pd.DataFrame(
        {"url": urls, "warc_ts": warc_ts, "html": html, "text": texts, "lang": lang}
    )


def pages_table(spark: SparkSession, n_rows: int = 10_000, seed: int = 42) -> DataFrame:
    pdf = pages_pandas(n_rows, seed)
    return spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
