"""Model-based sequence test for SnapshotStore: random-but-deterministic
interleavings of commit / upsert / MOR delete / compact / rollback /
vacuum, checked after EVERY op against a pure-Python reference model,
plus a disk-leak invariant after every vacuum (on-disk data dirs and
delete sidecars must be exactly those the kept snapshot entries
reference). Both r4 advisory leaks — the superseded stacked sidecar
vacuum skip and the orphan-sidecar version floor — are the class of bug
this pins mechanically."""

from __future__ import annotations

import os
import random

from dads_spark.checkpoint import SnapshotStore


def _rows_df(spark, rows):
    # rows: dict k -> tag
    return spark.createDataFrame(
        [(k, t) for k, t in sorted(rows.items())], "k long, tag string"
    )


def _read_rows(store, table, version=None):
    return {
        r["k"]: r["tag"] for r in store.read(table, version).collect()
    }


def _disk_state(root, table):
    data_base = os.path.join(root, "data", table)
    dirs = set()
    if os.path.isdir(data_base):
        dirs = {
            os.path.join(data_base, e)
            for e in os.listdir(data_base)
            if e.startswith("v=")
        }
    side_base = os.path.join(root, table)
    sides = set()
    if os.path.isdir(side_base):
        sides = {
            os.path.join(side_base, e)
            for e in os.listdir(side_base)
            if e.startswith("_deletes_v")
        }
    return dirs, sides


def _run_sequence(spark, root, seed, n_ops=12):
    rng = random.Random(seed)
    store = SnapshotStore(spark, root)
    t = "t"
    # model: list of per-version expected row dicts, index == version
    model: list[dict] = []
    next_key = 100

    def latest():
        return model[-1]

    # initial commit
    init = {i: "v0" for i in range(rng.randint(3, 8))}
    store.commit(t, _rows_df(spark, init))
    model.append(dict(init))

    for step in range(n_ops):
        op = rng.choice(
            ["commit", "upsert", "mor", "mor", "compact", "rollback", "vacuum"]
        )
        if op == "commit":
            rows = {
                next_key + i: f"c{step}" for i in range(rng.randint(2, 5))
            }
            next_key += 10
            store.commit(t, _rows_df(spark, rows))
            model.append(dict(rows))
        elif op == "upsert":
            cur = latest()
            # touch one existing key (if any) + one new key
            delta = {}
            if cur:
                delta[rng.choice(sorted(cur))] = f"u{step}"
            delta[next_key] = f"u{step}"
            next_key += 1
            store.upsert(t, _rows_df(spark, delta), ["k"])
            model.append({**cur, **delta})
        elif op == "mor":
            cur = latest()
            if not cur:
                continue
            doomed = rng.sample(sorted(cur), k=min(2, len(cur)))
            store.delete_keys_mor(
                t, _rows_df(spark, {k: "x" for k in doomed}), ["k"]
            )
            model.append({k: v for k, v in cur.items() if k not in doomed})
        elif op == "compact":
            v = store.compact_deletes(t)
            if v == len(model) - 1:
                continue  # no sidecar: no-op, no new version
            model.append(dict(latest()))
        elif op == "rollback":
            v = rng.randrange(len(model))
            try:
                store.rollback(t, v)
            except ValueError:
                continue  # vacuumed target: legal refusal
            model.append(dict(model[v]))
        else:  # vacuum
            keep = rng.randint(1, 3)
            store.vacuum(t, keep_last=keep)
            # disk-leak invariant: on-disk state == exactly what the
            # kept entries reference
            entries = [s for s in store.history() if s["table"] == t]
            versions = sorted(s["version"] for s in entries)
            kept = set(versions[-keep:])
            kept_entries = [s for s in entries if s["version"] in kept]
            want_dirs = {s["path"] for s in kept_entries}
            want_sides = {
                s["delete_path"]
                for s in kept_entries
                if s.get("delete_path")
            }
            dirs, sides = _disk_state(root, t)
            assert dirs == want_dirs, (seed, step, dirs, want_dirs)
            assert sides == want_sides, (seed, step, sides, want_sides)

        # after every op: latest read matches the model
        assert _read_rows(store, t) == latest(), (seed, step, op)

    # versions still on disk must time-travel correctly
    entries = [s for s in store.history() if s["table"] == t]
    for s in entries:
        if os.path.exists(s["path"]):
            v = s["version"]
            if not s.get("delete_path") or os.path.exists(s["delete_path"]):
                assert _read_rows(store, t, v) == model[v], (seed, v)


def test_snapshot_store_model_sequences(spark, tmp_path):
    for seed in (7, 21, 42):
        _run_sequence(spark, str(tmp_path / f"s{seed}"), seed)
