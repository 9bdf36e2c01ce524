"""Front-coding (incremental prefix encoding) for sorted string columns.

The string-axis sibling of the numeric codecs: URL lists, label values,
and postings keys are stored sorted, and adjacent sorted strings share
long prefixes (every URL of a host starts with the host). Front-coding
— the Lucene/ZSTD-dictionary-era standard for term dictionaries —
stores each string as (length of prefix shared with its predecessor,
remaining suffix), with RESTART POINTS every ``block`` entries (entry 0
of a block is stored raw) so a reader can random-access a block without
decoding the whole group.

Encode is vectorized: the group's sorted strings become one padded
uint8 matrix and every adjacent-pair common-prefix length falls out of
one ``cumprod(a[1:] == a[:-1])`` sum — no per-character Python. Decode
walks entries within a block (<= ``block`` short iterations, the same
bounded loop a real reader pays). The wire format per group is three
arrays (prefix_lens, suffix_lens, concatenated suffix bytes): columnar,
Arrow-friendly, and mergeable by concatenation of blocks.

Scale shape: encode/decode run inside ``applyInPandas`` per group (one
Arrow batch per host/shard — the grain the label dictionary is built
at); the only shuffle is the groupBy the dictionary build already pays.

Reference analog: none; §2.3 "compressed storage" (string axis, beside
Gorilla/Chimp/ALP/simple-8b).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["frontcode_block", "frontdecode_block", "frontcode_roundtrip"]


def frontcode_block(strs: list[bytes], block: int = 16):
    """Encode a SORTED list of byte strings. Returns
    (prefix_lens, suffix_bytes_concat, suffix_lens). Entry i stores
    suffix strs[i][prefix_lens[i]:]; prefix_lens[i] = 0 at every
    block restart (i % block == 0)."""
    n = len(strs)
    if n == 0:
        return np.zeros(0, np.int32), b"", np.zeros(0, np.int32)
    maxlen = max(len(s) for s in strs)
    mat = np.zeros((n, max(maxlen, 1)), dtype=np.uint8)
    lens = np.empty(n, dtype=np.int32)
    for i, s in enumerate(strs):  # fill: one memcpy per string
        lens[i] = len(s)
        mat[i, : len(s)] = np.frombuffer(s, np.uint8)
    if n > 1:
        eq = mat[1:] == mat[:-1]
        # common prefix length = run of leading equal bytes, capped by
        # both strings' lengths
        cpl = np.cumprod(eq, axis=1).sum(axis=1).astype(np.int32)
        cpl = np.minimum(cpl, np.minimum(lens[1:], lens[:-1]))
    else:
        cpl = np.zeros(0, np.int32)
    prefix = np.concatenate([[0], cpl]).astype(np.int32)
    prefix[::block] = 0  # restart points decode with no predecessor
    suffixes = [s[int(p) :] for s, p in zip(strs, prefix)]
    suf_lens = np.array([len(s) for s in suffixes], dtype=np.int32)
    return prefix, b"".join(suffixes), suf_lens


def frontdecode_block(
    prefix_lens: np.ndarray, suffix_bytes: bytes, suffix_lens: np.ndarray
) -> list[bytes]:
    """Invert :func:`frontcode_block`: rebuild each string from its
    predecessor's prefix + stored suffix (restarts reset the chain)."""
    out: list[bytes] = []
    offs = np.concatenate([[0], np.cumsum(suffix_lens)])
    prev = b""
    for i, p in enumerate(prefix_lens):
        suf = suffix_bytes[int(offs[i]) : int(offs[i + 1])]
        cur = prev[: int(p)] + suf
        out.append(cur)
        prev = cur
    return out


def frontcode_roundtrip(
    df: DataFrame,
    group_col: str = "domain",
    str_col: str = "url",
    block: int = 16,
) -> DataFrame:
    """Distributed dictionary round-trip: per group, the DISTINCT sorted
    strings are front-coded and decoded again; rows come back as
    (group, str, raw_bytes, enc_bytes) so hash equality against a
    ``SELECT DISTINCT`` oracle proves losslessness under real
    partitioning while the byte columns carry the measured compression.
    enc_bytes counts suffix bytes + 8 per entry (two int32 lengths) —
    the honest columnar wire cost."""
    out_schema = StructType(
        [
            StructField(group_col, StringType()),
            StructField(str_col, StringType()),
            StructField("raw_bytes", LongType()),
            StructField("enc_bytes", LongType()),
        ]
    )

    def rt(pdf: pd.DataFrame) -> pd.DataFrame:
        strs = sorted(set(pdf[str_col].astype(str)))
        bs = [s.encode("utf-8") for s in strs]
        pl, suf, sl = frontcode_block(bs, block=block)
        decoded = [d.decode("utf-8") for d in frontdecode_block(pl, suf, sl)]
        enc_total = int(len(suf)) + 8 * len(bs)
        raw_total = int(sum(len(b) for b in bs))
        g = pdf[group_col].iloc[0]
        # the DECODED strings are returned: the gate's hash equality
        # against SELECT DISTINCT is the roundtrip proof itself
        return pd.DataFrame(
            {
                group_col: np.repeat(g, len(decoded)),
                str_col: decoded,
                "raw_bytes": np.repeat(raw_total, len(strs)),
                "enc_bytes": np.repeat(enc_total, len(strs)),
            }
        )

    return df.select(group_col, str_col).groupBy(group_col).applyInPandas(
        rt, out_schema
    )
