"""Pin the r5 driver-gate rotation (the round's central deliverable):
queries() registration order IS the gate's execution order, so an
accidental insertion or reorder would silently re-spend the 50 scarce
driver slots on already-certified entries. Asserts the window is exactly
the 50 documented never-driver-checked names, every one oracle-gated,
and the registry stays frozen at 378."""

from __future__ import annotations

import json
import os

import __spark_entry__ as em

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

R5_WINDOW = [
    # composed flagship pins
    "doc_triage", "series_triage", "log_observability", "fetch_decision",
    "e2e_curation", "exp_hist_cascade", "topk_rate", "lww_tier",
    "seasonal_conformal", "anomaly_scorecard", "polite_schedule",
    # storage contracts
    "mor_deletes", "compaction_plan", "rle_roundtrip_hour",
    # codec family
    "chimp_roundtrip_hour", "alp_roundtrip_hour", "simple8b_roundtrip_hour",
    "frontcode_urls", "pla_segments",
    # PromQL family
    "promql_rate", "predict_linear", "histogram_quantile", "promql_resets",
    # ingest family
    "lww_compact", "cdc_apply", "watermark_tuning", "ooo_stats",
    # graph family
    "trustrank", "label_propagation", "kcore", "modularity",
    # streaming joins
    "streaming_left_join", "streaming_enrich",
    # statistics battery
    "control_chart", "seasonal_esd", "runs_test", "spearman_corr",
    "wasserstein_drift", "vopt_histogram", "haar_synopsis",
    # alphabetical remainder head
    "ab_test", "acf_period", "alert_hysteresis", "ams_f2", "anchor_text",
    "ann_sq8", "asap_smooth", "attribution", "benford_digits", "bfs_hops",
]


def test_gate_window_is_the_documented_rotation():
    names = list(em.queries())
    assert names[:50] == R5_WINDOW
    assert len(names) == 378, "registry is frozen at 378 this round"
    assert len(set(names)) == 378


def test_gate_window_entries_all_oracle_gated():
    oracles = em.oracle_sql()
    missing = [n for n in R5_WINDOW if n not in oracles]
    assert missing == [], f"window entries without oracle SQL: {missing}"


def test_gate_window_entries_never_driver_checked_through_r4():
    checked: set[str] = set()
    for r in (1, 2, 3, 4):
        path = os.path.join(REPO, f"CORRECTNESS_r0{r}.json")
        checked |= set(json.load(open(path)))
    stale = [n for n in R5_WINDOW if n in checked]
    assert stale == [], (
        f"window entries that already have driver rows (wasted slots): {stale}"
    )
