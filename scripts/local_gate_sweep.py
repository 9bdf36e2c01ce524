#!/usr/bin/env python
"""Local replica of the driver's per-round correctness gate: run the
first N queries() entries (the driver samples exactly 50) against their
oracle_sql() twins at sf0.01 and write a CORRECTNESS_LOCAL-style JSON.

Usage: python scripts/local_gate_sweep.py [out.json] [N] [sf_dir]
N=0 sweeps the FULL registry (the pre-judge full-coverage artifact).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gate_sweep.json"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

    import __spark_entry__ as em
    from dads_spark.session import get_spark
    from tests.compare import compare_query, duckdb_conn

    spark = get_spark(
        app_name="gate_sweep", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    oracles = em.oracle_sql()
    names = list(qs)[:n] if n else list(qs)
    con = duckdb_conn(sf_dir)
    results: dict[str, dict] = {}
    n_bad = 0
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            if name in oracles:
                r = compare_query(spark, con, qs[name], oracles[name], sf_dir)
                ok = r["ok"]
                results[name] = {
                    "rows_match": r["rows_match"],
                    "schema_match": r["cols_match"] and r["kinds_match"],
                    "hash_match": r["hash_match"],
                    "spark_rows": r["spark_rows"],
                    "oracle_rows": r["duck_rows"],
                    "err": None,
                }
            else:
                cnt = qs[name](spark, sf_dir).count()
                ok = cnt >= 0
                results[name] = {"rows_only": True, "spark_rows": cnt, "err": None}
        except Exception as ex:  # noqa: BLE001 — the sweep must finish
            ok = False
            results[name] = {"err": repr(ex)[:500]}
        n_bad += 0 if ok else 1
        print(
            f"[{i+1}/{len(names)}] {name}: {'OK' if ok else 'FAIL'} "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"swept {len(names)} entries, {n_bad} bad -> {out_path}")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
