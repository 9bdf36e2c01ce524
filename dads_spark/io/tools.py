"""Equivalents of the reference's offline script toolkit.

The reference ships three helper scripts around its binary format
(SURVEY.md §3 E3); each has a counterpart here so a reference user keeps
their workflow:

- ``convert_text_to_binary`` — script/sequence-converter/convert.py:8-29
  (one decimal per line -> big-endian doubles).
- ``replicate_series``      — script/sequence-converter/replicate.py:12-39
  (tile a fixture to K/M/B points for scale tests).
- ``score_diff``            — script/value-diff/result_diff.py:5-33
  (line-by-line comparison of two score files: max/avg absolute diff).
- ``node_diff`` / ``write_nodes`` — script/value-diff/node_diff.py:5-57
  (``{seg}_{node} distance`` dumps compared key-by-key; the writer emits
  the same format from this engine's node collections).
- ``matrix_diff``           — script/value-diff/matrix_diff.py:22-60
  (plain matrix dumps: header line, blank line, tab-separated rows —
  elementwise max/avg absolute diff).
- ``extract_statistics`` / ``metrics_report`` — script/statistics/extract.py
  + script/visualization/visualize.py (per-stage duration/utilization
  extraction and display, over this engine's ``_metrics`` table instead of
  Akka log lines).
"""

from __future__ import annotations

import re

import numpy as np

from .binary import read_binary_series, write_binary_series


def convert_text_to_binary(text_path: str, bin_path: str) -> int:
    """Text series (one decimal per line) -> reference binary format.
    Returns the number of values written."""
    vals = np.loadtxt(text_path, dtype=np.float64, ndmin=1)
    write_binary_series(bin_path, vals)
    return len(vals)


def replicate_series(src_path: str, dst_path: str, n_points: int) -> int:
    """Tile a binary series until it reaches ``n_points`` values (the
    reference's K/M/B scale-up tool). Returns the final length."""
    base = read_binary_series(src_path)
    if len(base) == 0:
        raise ValueError("empty source series")
    reps = -(-n_points // len(base))
    out = np.tile(base, reps)[:n_points]
    write_binary_series(dst_path, out)
    return len(out)


def score_diff(path_a: str, path_b: str) -> dict:
    """Line-by-line score comparison: same shape as the reference's
    result_diff.py report (count, max_diff, avg_diff)."""
    a = np.loadtxt(path_a, dtype=np.float64, ndmin=1)
    b = np.loadtxt(path_b, dtype=np.float64, ndmin=1)
    if len(a) != len(b):
        return {"count": 0, "length_mismatch": (len(a), len(b))}
    d = np.abs(a - b)
    return {
        "count": int(len(d)),
        "max_diff": float(d.max()) if len(d) else 0.0,
        "avg_diff": float(d.mean()) if len(d) else 0.0,
        "n_exact": int((d == 0).sum()),
    }


def write_nodes(nodes_by_segment, path: str) -> int:
    """Dump node collections in the reference's node format — one
    ``{segment}_{node_index} distance`` line per node, segments ascending
    (node_diff.py expects positionally aligned files). Returns line count."""
    n = 0
    with open(path, "w") as out:
        for seg in sorted(nodes_by_segment):
            for idx, dist in enumerate(np.asarray(nodes_by_segment[seg])):
                print(f"{{{seg}_{idx}}} {float(dist)}", file=out)
                n += 1
    return n


_NODE_LINE = re.compile(r"\{(?P<seg>\d+)_(?P<idx>\d+)\} (?P<dist>[0-9.Ee+-]+)")


def node_diff(path_a: str, path_b: str) -> dict:
    """Key-matched comparison of two node dumps (reference node_diff.py
    semantics: positional line pairing, (segment, node_index) keys must
    agree, distances diffed; malformed/mismatched lines counted, not
    compared)."""
    stats = {"count": 0, "max_diff": 0.0, "avg_diff": 0.0,
             "n_key_mismatch": 0, "n_malformed": 0}
    total = 0.0
    with open(path_a) as fa, open(path_b) as fb:
        for line_a in fa:
            line_b = fb.readline()
            la, lb = line_a.strip(), line_b.strip()
            if not la and not lb:
                continue
            ma, mb = _NODE_LINE.fullmatch(la), _NODE_LINE.fullmatch(lb)
            if ma is None or mb is None:
                stats["n_malformed"] += 1
                continue
            if (ma.group("seg"), ma.group("idx")) != (mb.group("seg"), mb.group("idx")):
                stats["n_key_mismatch"] += 1
                continue
            d = abs(float(ma.group("dist")) - float(mb.group("dist")))
            stats["count"] += 1
            total += d
            if d > stats["max_diff"]:
                stats["max_diff"] = d
    if stats["count"]:
        stats["avg_diff"] = total / stats["count"]
    return stats


def write_matrix(mat, path: str, header: str = "matrix") -> None:
    """Write a 2-D array in the reference's plain matrix dump format:
    header line, blank line, then tab-separated rows."""
    mat = np.asarray(mat, dtype=np.float64)
    with open(path, "w") as out:
        print(f"{header} {mat.shape[0]}x{mat.shape[1]}", file=out)
        print("", file=out)
        for row in mat:
            print("\t".join(repr(float(v)) for v in row), file=out)


def matrix_diff(path_a: str, path_b: str) -> dict:
    """Elementwise comparison of two plain matrix dumps (reference
    matrix_diff.py diff_plain semantics: headers must match, then max/avg
    absolute elementwise difference)."""
    with open(path_a) as fa, open(path_b) as fb:
        ha, hb = next(fa), next(fb)
        if ha != hb:
            return {"count": 0, "header_mismatch": (ha.strip(), hb.strip())}
        next(fa), next(fb)  # blank separator line
        max_diff = total = 0.0
        count = 0
        for line_a in fa:
            vals_a = [float(x) for x in line_a.split("\t") if x.strip()]
            vals_b = [float(x) for x in next(fb).split("\t") if x.strip()]
            if len(vals_a) != len(vals_b):
                return {"count": count, "shape_mismatch": True}
            for va, vb in zip(vals_a, vals_b):
                d = abs(va - vb)
                total += d
                count += 1
                if d > max_diff:
                    max_diff = d
    return {
        "count": count,
        "max_diff": max_diff,
        "avg_diff": total / count if count else 0.0,
    }


def extract_statistics(metrics_rows, out_csv: str | None = None) -> dict:
    """Statistics-extract counterpart: per-stage duration/bytes rows (from
    ``StageMetricsCollector.rows()`` or the persisted ``_metrics`` table)
    -> summary dict (+ optional CSV, one line per stage, like the
    reference's per-processor CSV outputs)."""
    rows = sorted(metrics_rows, key=lambda r: r.get("started_at") or 0.0)
    cols = ["stage", "wall_sec", "executor_run_ms", "n_tasks",
            "input_bytes", "output_bytes", "shuffle_read_bytes",
            "shuffle_write_bytes"]
    if out_csv:
        with open(out_csv, "w") as out:
            print(",".join(cols), file=out)
            for r in rows:
                print(",".join(str(r.get(c, "")) for c in cols), file=out)
    wall = sum(r.get("wall_sec") or 0.0 for r in rows)
    run_s = sum(r.get("executor_run_ms") or 0 for r in rows) / 1000.0
    return {
        "n_stages": len(rows),
        "total_wall_sec": wall,
        "total_executor_sec": run_s,
        "total_shuffle_bytes": sum(r.get("shuffle_write_bytes") or 0 for r in rows),
        "stages": [r.get("stage") for r in rows],
    }


def metrics_report(metrics_rows, n_cores: int = 1, width: int = 40) -> str:
    """Visualization counterpart (text, no plotting deps): per-stage wall
    bars plus executor utilization (executor time / (wall x cores)) — the
    quantity the reference's utilization plots show per processor."""
    rows = sorted(metrics_rows, key=lambda r: r.get("started_at") or 0.0)
    if not rows:
        return "(no stage metrics)"
    longest = max(len(r["stage"]) for r in rows)
    max_wall = max(r.get("wall_sec") or 0.0 for r in rows) or 1.0
    lines = []
    for r in rows:
        wall = r.get("wall_sec") or 0.0
        util = (r.get("executor_run_ms") or 0) / 1000.0 / (wall * n_cores) if wall else 0.0
        bar = "#" * max(1, round(width * wall / max_wall))
        lines.append(
            f"{r['stage']:<{longest}}  {wall:8.3f}s  util={min(util, 1.0):5.1%}  {bar}"
        )
    return "\n".join(lines)
