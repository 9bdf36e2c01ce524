"""Property tests (hypothesis) for pure-Python kernels — no Spark, so
hundreds of examples stay cheap."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from dads_spark.oracles import pelt_oracle
from dads_spark.io.warc import build_warc_record, parse_warc_bytes
from dads_spark.rollup.changepoint import auto_penalty, pelt_changepoints


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=2, max_size=120),
    st.floats(min_value=0.1, max_value=500.0, allow_nan=False),
)
def test_pelt_always_equals_unpruned_dp(values, penalty):
    x = np.asarray(values, dtype=np.float64)
    assert pelt_changepoints(x, penalty) == pelt_oracle(x, penalty)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=2, max_size=80))
def test_pelt_auto_penalty_yields_valid_segmentation(values):
    x = np.asarray(values, dtype=np.float64)
    cps = pelt_changepoints(x, auto_penalty(x))
    assert cps == sorted(set(cps))
    assert all(0 < c < len(x) for c in cps)


_url = st.from_regex(r"https://[a-z]{1,8}\.com/[a-z0-9/]{0,12}", fullmatch=True)
_body = st.binary(min_size=0, max_size=300)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(_url, _body), min_size=0, max_size=8))
def test_warc_roundtrip_any_bodies(records):
    # bodies may contain CRLFs, blank lines, even fake WARC headers —
    # Content-Length framing must recover every byte exactly
    stream = b"".join(
        build_warc_record(u, "2024-01-01T00:00:00Z", b) for u, b in records
    )
    got = parse_warc_bytes(stream)
    assert [(r["url"], r["body"]) for r in got] == records


@settings(max_examples=60, deadline=None)
@given(_body)
def test_warc_request_records_always_skipped(body):
    stream = build_warc_record(
        "https://x.com/a", "2024-01-01T00:00:00Z", body, rec_type="request"
    ) + build_warc_record("https://x.com/b", "2024-01-01T00:00:00Z", b"keep")
    got = parse_warc_bytes(stream)
    assert [(r["url"], r["body"]) for r in got] == [("https://x.com/b", b"keep")]
