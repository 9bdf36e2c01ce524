"""End-to-end north-rule job: pages -> tiers -> gapfill -> compress -> anomaly,
resumable, text bytes untouched."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from dads_spark.compress import decode_timestamps, decode_values
from dads_spark.fixtures.pages import pages_table
from dads_spark.jobs import PagesRollupJob
from dads_spark.rollup import text_identity_fingerprint
from dads_spark.s2g import S2GParams


@pytest.fixture(scope="module")
def pages(spark):
    return pages_table(spark, 8000).cache()


def test_full_pipeline_and_resume(spark, pages, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("job"))
    params = S2GParams(m=20, c=6, S=30, ell=30)
    desc = {"source": "pages-fixture", "n": 8000}

    job = PagesRollupJob(spark, root, s2g_params=params)
    out = job.run(pages, desc)
    assert len(job.ran_stages) == 14 and not job.skipped_stages

    # tiers conserve totals
    hour_total = out["hour"].agg(F.sum("doc_count")).collect()[0][0]
    week_total = out["week"].agg(F.sum("doc_count")).collect()[0][0]
    assert hour_total == week_total == 8000

    # gap-fill produced dense hourly series with some filled buckets
    gf = out["gapfilled"]
    assert gf.filter(F.col("gap_filled")).count() > 0

    # compressed blobs round-trip for one domain
    row = out["compressed"].orderBy(F.col("n_points").desc()).first()
    ts = decode_timestamps(bytes(row["ts_blob"]), row["n_points"])
    vals = decode_values(bytes(row["value_blob"]), row["n_points"])
    assert len(ts) == len(vals) == row["n_points"]
    assert (np.diff(ts) == 3600).all()  # dense after gap-fill

    # anomaly outputs exist for long-enough series
    assert out["s2g_scores"].count() > 0

    # digest cascade: day p50/p90 derived from the MERGED hour sketches
    # (out["sketch_day"] reads only the persisted sketch_hour stage) must
    # sit within the sketch's 2% rank-error bound of the exact day
    # quantiles computed from raw text lengths
    from dads_spark.rollup import bucket_expr
    from dads_spark.rollup.series import with_domain

    raw = (
        with_domain(pages)
        .select(
            "domain",
            bucket_expr("warc_ts", "day").cast("string").alias("bucket_day"),
            F.octet_length("text").cast("double").alias("text_len"),
        )
        .toPandas()
    )
    got = out["day_quantiles"].toPandas()
    assert len(got) > 0
    checked = 0
    for (dom, day), grp in raw.groupby(["domain", "bucket_day"]):
        vals = np.sort(grp["text_len"].to_numpy())
        sub = got[(got.domain == dom) & (got.bucket_day == day)]
        if sub.empty:
            continue
        for _, r in sub.iterrows():
            # rank error: where the sketch value falls in the exact CDF.
            # Duplicated values occupy a rank INTERVAL [lo, hi]; the error
            # is the distance from the target prob to that interval.
            n = max(len(vals), 1)
            lo = np.searchsorted(vals, r["value"], side="left") / n
            hi = np.searchsorted(vals, r["value"], side="right") / n
            err = max(lo - r["prob"], r["prob"] - hi, 0.0)
            assert err <= 0.02 + 1.0 / n, (dom, day, r["prob"], lo, hi)
            checked += 1
    assert checked > 0

    # distinct cascade: day distinct-url estimates derived by UNIONING the
    # persisted hour HLL sketches (distinct_day reads only distinct_hour)
    # sit within the sketch's error envelope of exact COUNT(DISTINCT url)
    exact_d = (
        with_domain(pages)
        .groupBy("domain", bucket_expr("warc_ts", "day").alias("bucket_ts"))
        .agg(F.countDistinct("url").alias("exact"))
    )
    est = out["day_distinct_urls"].join(exact_d, ["domain", "bucket_ts"])
    est_rows = est.collect()
    assert est_rows
    for r in est_rows:
        assert abs(r["approx_distinct"] - r["exact"]) <= max(0.05 * r["exact"], 1)

    # analytics stages emit per-domain rows from committed tiers only
    assert out["forecast_baselines"].count() > 0
    assert out["count_drift"].count() > 0
    for r in out["count_drift"].collect():
        assert 0 <= r["tv"] <= 1
    cps = out["changepoints"]
    assert cps.filter(~F.col("cp_idx").between(1, F.col("n") - 1)).count() == 0

    # resume: everything committed -> all skipped
    job2 = PagesRollupJob(spark, root, s2g_params=params)
    job2.run(pages, desc)
    assert len(job2.skipped_stages) == 14 and not job2.ran_stages


def test_text_bytes_untouched(spark, pages):
    before = text_identity_fingerprint(pages).withColumnRenamed("text_sha256", "a")
    after = text_identity_fingerprint(pages).withColumnRenamed("text_sha256", "b")
    assert before.join(after, "url").filter(F.col("a") != F.col("b")).count() == 0
