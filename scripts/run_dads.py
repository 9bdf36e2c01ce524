#!/usr/bin/env python
"""Drop-in CLI for the reference's master invocation: binary series in,
score text file out.

The reference is launched as (README.md:49-54, bootstrap/command/
MasterCommand.java:21-46):

    java -jar dads.jar master --sequence data.bin --sub-sequence-length 50 \
        --convolution-size 16 --intersection-segments 50 --query-length 75 \
        --output scores.txt [--threads N] [--distribution HOMOGENEOUS] ...

This script accepts the same flags so a reference user can run the exact
command shape against the Spark engine:

    python scripts/run_dads.py --sequence data.bin --sub-sequence-length 50 \
        --convolution-size 16 --intersection-segments 50 --query-length 75 \
        --output scores.txt --threads 8 --slices 8

Flag mapping:
- ``--threads N``       -> ``local[N]`` (or set --master for a cluster)
- ``--slices P``        -> slice count of the distributed pipeline (the
  reference's processor count). As in the reference, scores are
  bit-identical to the dataflow at the SAME slicing; different slicings
  move per-slice summation boundaries and differ in the last ulp.
- ``--distribution``    -> HOMOGENEOUS = equal slices;
  HETEROGENEOUS = memory-proportional slices
  (HeterogeneousSequenceSliceDistributionFactory.java:57-98 semantics) —
  pass the per-processor memory budgets via ``--memories 4096,8192,...``
  (the reference reads them from cluster registration; Spark executors are
  uniform, so the budgets are explicit here). Without --memories,
  HETEROGENEOUS falls back to equal slices with a warning.
- ``--no-sequence-matrix`` / ``--no-smart-scoring`` are accepted for CLI
  compatibility and ignored: this engine always uses the virtual (Hankel)
  matrix and incremental scoring, which produce identical results to the
  naive paths (the reference's own flags are optimizations, not semantics:
  AbstractCommand.java:42-46)
- ``--min-slaves`` / ``--work-load-factor`` are cluster-bootstrap knobs
  with no Spark analog; accepted and ignored with a warning.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sequence", required=True, help="binary big-endian double file")
    ap.add_argument("--sub-sequence-length", type=int, required=True, dest="m")
    ap.add_argument("--convolution-size", type=int, required=True, dest="c")
    ap.add_argument("--intersection-segments", type=int, required=True, dest="S")
    ap.add_argument("--query-length", type=int, required=True, dest="ell")
    ap.add_argument("--output", required=True, help="score text file directory")
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--slices", type=int, default=None,
                    help="slice count (default: --threads)")
    ap.add_argument("--master", default=None, help="override spark master")
    ap.add_argument("--distribution", default="HOMOGENEOUS",
                    choices=["HOMOGENEOUS", "HETEROGENEOUS"])
    ap.add_argument("--memories", default=None,
                    help="comma-separated per-processor memory budgets for "
                         "HETEROGENEOUS (e.g. 4096,8192,8192)")
    ap.add_argument("--min-slaves", type=int, default=None)
    ap.add_argument("--work-load-factor", type=float, default=None)
    ap.add_argument("--no-sequence-matrix", action="store_true")
    ap.add_argument("--no-smart-scoring", action="store_true")
    args = ap.parse_args(argv)

    if args.distribution == "HETEROGENEOUS" and not args.memories:
        print("warning: HETEROGENEOUS without --memories; using equal "
              "slices (results differ only in last-ulp summation order, "
              "as between any two slicings in the reference)", file=sys.stderr)
    for flag, name in ((args.min_slaves, "--min-slaves"),
                       (args.work_load_factor, "--work-load-factor")):
        if flag is not None:
            print(f"warning: {name} is a reference cluster-bootstrap knob; "
                  "ignored under Spark", file=sys.stderr)

    from dads_spark.io import binary_series_df, write_scores_text
    from dads_spark.s2g import S2GParams
    from dads_spark.s2g.pipeline import run_s2g_distributed
    from dads_spark.session import get_spark

    params = S2GParams(m=args.m, c=args.c, S=args.S, ell=args.ell)
    n_slices = args.slices or args.threads
    spark = get_spark(
        app_name="dads_spark_cli",
        master=args.master or f"local[{args.threads}]",
        shuffle_partitions=max(args.threads, n_slices),
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    series = binary_series_df(spark, args.sequence)
    n = series.count()
    slices = None
    if args.distribution == "HETEROGENEOUS" and args.memories:
        from dads_spark.s2g.core import slice_bounds_weighted

        weights = [float(w) for w in args.memories.split(",")]
        slices = slice_bounds_weighted(n, weights, params.m)
        n_slices = len(slices)
    scores = run_s2g_distributed(
        spark, series, params, n_slices=n_slices, n=n, slices=slices
    )
    write_scores_text(scores, args.output)
    wall = time.perf_counter() - t0
    n_scores = spark.read.text(args.output).count()
    print(f"DADS_RUN points={n} windows={n_scores} slices={n_slices} "
          f"wall_sec={wall:.2f} output={args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
