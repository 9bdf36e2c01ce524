"""Category word-blocklist scanner."""

from __future__ import annotations

from dads_spark.ops import blockword_scan


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_blockword_counts_and_case(spark):
    df = _docs(spark, [
        "Join the MERGE now join",          # joins: 3 (case-blind)
        "filter scan filter plain words",   # scans: 3
        "nothing here at all",
    ])
    out = {r["doc_id"]: r for r in blockword_scan(
        df, "text", {"joins": ["join", "merge"], "scans": ["filter", "scan"]},
        ["doc_id"],
    ).collect()}
    assert out[0]["n_joins"] == 3 and out[0]["n_scans"] == 0
    assert out[1]["n_scans"] == 3 and out[1]["n_joins"] == 0
    assert out[2]["n_blocked_total"] == 0 and not out[2]["flagged"]
    assert out[0]["n_tokens"] == 5


def test_blockword_whole_word_only(spark):
    df = _docs(spark, ["joining merger rejoin join"])
    r = blockword_scan(
        df, "text", {"j": ["join", "merge"]}, ["doc_id"]
    ).collect()[0]
    assert r["n_j"] == 1   # substrings never match


def test_blockword_terms_are_regex_escaped(spark):
    df = _docs(spark, ["price is 3.50 here", "price is 3x50 here"])
    out = {r["doc_id"]: r for r in blockword_scan(
        df, "text", {"p": ["3.50"]}, ["doc_id"]
    ).collect()}
    assert out[0]["n_p"] == 1
    assert out[1]["n_p"] == 0   # '.' must not match 'x'


def test_blockword_flag_threshold_integer_boundary(spark):
    # 1 hit in 50 tokens = 200 per 10k: flagged iff threshold < 200
    text = "join " + "word " * 49
    df = _docs(spark, [text.strip()])
    hit = blockword_scan(
        df, "text", {"j": ["join"]}, ["doc_id"], flag_per_10k=199
    ).collect()[0]
    miss = blockword_scan(
        df, "text", {"j": ["join"]}, ["doc_id"], flag_per_10k=200
    ).collect()[0]
    assert hit["flagged"] is True
    assert miss["flagged"] is False   # strict >: exactly at rate = not flagged
