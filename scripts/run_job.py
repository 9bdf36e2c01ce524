#!/usr/bin/env python
"""spark-submit entry point for the full pages -> tiers -> anomaly job.

The north rule requires the engine be runnable via
``spark-submit --py-files dads_spark.zip`` on a multi-executor cluster:

    python -c "from dads_spark.session import package_zip; print(package_zip())"
    spark-submit --master <master> --py-files /tmp/dads_spark.zip \
        scripts/run_job.py --pages <parquet-or-synth:N> --out <dir>

``--pages`` is either a parquet path with the input_hint schema
(url, warc_ts, html, text, lang) or ``synth:N`` for the deterministic
N-row fixture table. Every tier stage commits a checkpoint manifest under
<out>/checkpoints; re-running with the same input resumes from the last
committed stage (kill it mid-run and run it again to see).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet path or synth:N")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--master", default=None, help="override spark master")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dads_spark.jobs import PagesRollupJob
    from dads_spark.rollup import write_tier
    from dads_spark.session import get_spark

    spark = get_spark(app_name="dads_spark_job", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.pages.startswith("synth:"):
        from dads_spark.fixtures.pages import pages_table

        n = int(args.pages.split(":", 1)[1])
        pages = pages_table(spark, n)
        input_desc = {"source": "synth", "n": n}
    else:
        pages = spark.read.parquet(args.pages)
        input_desc = {"source": args.pages}

    job = PagesRollupJob(spark, ckpt_root=os.path.join(args.out, "checkpoints"))
    out = job.run(pages, input_desc)

    counts = {}
    for name in ("hour", "day", "week"):
        write_tier(out[name], os.path.join(args.out, f"tier_{name}"))
        counts[name] = spark.read.parquet(os.path.join(args.out, f"tier_{name}")).count()
    out["s2g_scores"].write.mode("overwrite").parquet(os.path.join(args.out, "s2g_scores"))
    out["discord_ranges"].write.mode("overwrite").parquet(
        os.path.join(args.out, "discords")
    )
    counts["s2g_scores"] = spark.read.parquet(os.path.join(args.out, "s2g_scores")).count()
    counts["discords"] = spark.read.parquet(os.path.join(args.out, "discords")).count()

    summary = {
        "ran_stages": job.ran_stages,
        "skipped_stages": job.skipped_stages,
        "row_counts": counts,
        "stage_metrics": [
            {
                k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in row.items()
            }
            for row in job.metrics.rows()
        ],
    }
    print("JOB_SUMMARY " + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
