"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The actual codec calls are STUBBED
(this environment ships no image/audio libraries): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
byte-hash "decode" exercises the full Spark plumbing — schema, batch shape,
partitioning — which is the part that matters for the engine.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, mime string, width int, height int, n_frames int"
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive cheap metadata JVM-side: byte length + magic-byte mime sniff."""
    magic = F.hex(F.substring(F.col(payload_col), 1, 4))
    return df.withColumn("n_bytes", F.octet_length(payload_col)).withColumn(
        "sniffed_mime",
        F.when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic.startswith("89504E47"), "image/png")
        .otherwise("application/octet-stream"),
    )


def _fake_decode(payload: bytes, feat_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash-seeded features."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "big")
    return np.random.default_rng(seed).normal(size=feat_dim)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    feat_dim: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract each payload -> (id, features array<double>).

    Real decoding requires an image/audio library not present in this
    environment; pass ``fake=True`` for the deterministic stand-in. The
    Spark-side contract (arrow batching, schema, per-partition work) is
    identical either way.
    """

    def run(it):
        for pdf in it:
            feats = []
            for payload in pdf[payload_col]:
                if not fake:
                    raise NotImplementedError(
                        "real media decode needs PIL/av; run with fake=True"
                    )
                feats.append(_fake_decode(bytes(payload), feat_dim))
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} long, features array<double>"
    )


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
    fake: bool = False,
) -> DataFrame:
    """Frame-sample video payloads -> one row per sampled frame.

    Stub decode; the exploded output shape (id, frame_no, frame binary) is
    the real contract downstream stages build on.
    """

    def run(it):
        for pdf in it:
            ids, frame_nos, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if not fake:
                    raise NotImplementedError(
                        "real frame sampling needs av; run with fake=True"
                    )
                payload = bytes(payload)
                n_frames = max(1, len(payload) // 64)
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    frame_nos.append(fno)
                    frames.append(payload[fno * 64 : (fno + 1) * 64])
            yield pd.DataFrame({id_col: ids, "frame_no": frame_nos, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} long, frame_no int, frame binary"
    )


def resize_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Resize image payloads -> (id, resized binary, out_w, out_h).

    Real resizing needs an image library (absent here): ``fake=True``
    exercises the full plumbing with a deterministic stand-in whose output
    length is ``target_w * target_h`` bytes (one fake luma byte per pixel,
    sampled from the payload by position hash) — schema, Arrow batching,
    and size accounting behave exactly as a real resize stage.
    """

    def run(it):
        for pdf in it:
            ids, blobs = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if not fake:
                    raise NotImplementedError(
                        "real image resize needs PIL; run with fake=True"
                    )
                src = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(src) == 0:
                    src = np.zeros(1, dtype=np.uint8)
                # nearest-neighbour sample over the byte stream: cheap,
                # deterministic, output size = target pixel count
                idx = (
                    np.arange(target_w * target_h, dtype=np.int64)
                    * len(src)
                    // (target_w * target_h)
                )
                ids.append(mid)
                blobs.append(src[idx].tobytes())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "resized": blobs,
                    "out_w": np.full(len(ids), target_w, dtype=np.int32),
                    "out_h": np.full(len(ids), target_h, dtype=np.int32),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} long, resized binary, out_w int, out_h int"
    )


def wav_pcm_stats(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decoding — no stub: RIFF/WAVE PCM needs no codec
    library, so this is a genuine binary-media decode path end to end.

    Parses the RIFF container (chunk walk: 'fmt ' then 'data'), validates
    PCM/16-bit, decodes the little-endian int16 samples with one
    ``np.frombuffer`` per payload, and emits EXACT integer waveform
    statistics per file: (id, sample_rate, n_channels, n_samples,
    sum_amp, sum_sq, peak) — sum/sumsq over int64 are exact, so the
    whole decode is oracle-pinnable bit-for-bit. Malformed payloads
    (bad magic, missing chunks, non-PCM) yield a row with
    sample_rate = -1 rather than failing the batch (a corrupt blob on a
    10^12-doc crawl must not kill the job).

    Arrow-batched mapInPandas, one vectorized decode per payload — the
    same plumbing the stubbed image/video codecs document, now exercised
    by a REAL format.
    """
    import struct

    def run(it):
        for pdf in it:
            out = {
                id_col: [], "sample_rate": [], "n_channels": [],
                "n_samples": [], "sum_amp": [], "sum_sq": [], "peak": [],
            }
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                row = (-1, -1, 0, 0, 0, 0)
                try:
                    if b[0:4] == b"RIFF" and b[8:12] == b"WAVE":
                        pos, fmt, data = 12, None, None
                        while pos + 8 <= len(b):
                            cid = b[pos : pos + 4]
                            (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                            body = b[pos + 8 : pos + 8 + clen]
                            if cid == b"fmt ":
                                fmt = struct.unpack("<HHIIHH", body[:16])
                            elif cid == b"data":
                                data = body
                            pos += 8 + clen + (clen & 1)
                        if fmt and data is not None and fmt[0] == 1 and fmt[5] == 16:
                            x = np.frombuffer(data, dtype="<i2").astype(np.int64)
                            row = (
                                int(fmt[2]),
                                int(fmt[1]),
                                len(x) // fmt[1],
                                int(x.sum()),
                                int((x * x).sum()),
                                int(np.abs(x).max()) if len(x) else 0,
                            )
                except (struct.error, IndexError):
                    pass
                out[id_col].append(mid)
                for k, v in zip(
                    ("sample_rate", "n_channels", "n_samples",
                     "sum_amp", "sum_sq", "peak"),
                    row,
                ):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} long, sample_rate long, n_channels long, n_samples long, "
        "sum_amp long, sum_sq long, peak long",
    )


def make_wav_pcm(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Minimal mono 16-bit PCM WAV writer (header + LE samples) — the
    fixture-side inverse of :func:`wav_pcm_stats`, shared by tests and
    the gate's deterministic staging."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def bmp_stats(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL image decoding — no stub: 24-bit uncompressed BMP needs no
    codec library. Parses BITMAPFILEHEADER + BITMAPINFOHEADER, validates
    bpp=24 / BI_RGB, decodes the bottom-up pixel rows with the 4-byte
    row-stride padding, and emits EXACT integer channel statistics:
    (id, width, height, sum_r, sum_g, sum_b, max_lum) with
    lum = 2*g + r + b (an integer luminance proxy — no float weights).
    Malformed payloads yield width = -1 (corrupt-blob tolerance, like
    wav_pcm_stats)."""
    import struct

    def run(it):
        for pdf in it:
            out = {
                id_col: [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [], "max_lum": [],
            }
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                row = (-1, 0, 0, 0, 0, 0)
                try:
                    if b[0:2] == b"BM":
                        (off,) = struct.unpack("<I", b[10:14])
                        w, h = struct.unpack("<ii", b[18:26])
                        bpp, comp = struct.unpack("<HI", b[28:34])
                        if bpp == 24 and comp == 0 and w > 0 and h > 0:
                            stride = (w * 3 + 3) & ~3
                            px = np.frombuffer(
                                b, dtype=np.uint8, count=stride * h, offset=off
                            ).reshape(h, stride)[::-1, : w * 3]
                            px = px.reshape(h, w, 3).astype(np.int64)
                            bl, gr, rd = px[..., 0], px[..., 1], px[..., 2]
                            lum = 2 * gr + rd + bl
                            row = (
                                w, h,
                                int(rd.sum()), int(gr.sum()), int(bl.sum()),
                                int(lum.max()),
                            )
                except (struct.error, ValueError, IndexError):
                    pass
                out[id_col].append(mid)
                for k, v in zip(
                    ("width", "height", "sum_r", "sum_g", "sum_b", "max_lum"),
                    row,
                ):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} long, width long, height long, sum_r long, sum_g long, "
        "sum_b long, max_lum long",
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """The PNG Paeth predictor (spec section 9, filter type 4), on int
    arrays: pick whichever of left/up/upper-left is closest to
    left + up - upper_left, ties resolved left > up > upper-left."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Invert the five PNG scanline filters. Rows None/Sub/Up are fully
    vectorized (Sub is a per-channel prefix sum); Average/Paeth have a
    true sequential dependency on the in-row left neighbor, so those
    rows walk pixels with channel-vector ops (w steps/row, numpy per
    step)."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(raw[y * (stride + 1)])
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)].astype(
            np.int64
        )
        if f == 0:
            rec = line
        elif f == 1:  # Sub: prefix sum over pixels, per channel
            rec = (np.cumsum(line.reshape(w, ch), axis=0) % 256).reshape(
                stride
            )
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential on left neighbor
            rec = np.zeros(stride, dtype=np.int64)
            up = prev.reshape(w, ch)
            cur = line.reshape(w, ch)
            rw = rec.reshape(w, ch)
            left = np.zeros(ch, dtype=np.int64)
            ul = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                if f == 3:
                    pred = (left + up[x]) // 2
                else:
                    pred = _paeth(left, up[x], ul)
                rw[x] = (cur[x] + pred) % 256
                left, ul = rw[x], up[x]
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, ch)


def png_stats(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL compressed-image decoding — PNG's codec stack is zlib
    (stdlib) plus per-scanline prediction filters, so unlike JPEG no
    media library is required and the decode is still a genuine
    entropy-coded path (inflate + filter inversion), not a raw-pixel
    walk like BMP. Supports the common web shapes: 8-bit depth, color
    types 2 (RGB) and 6 (RGBA, alpha ignored in the stats), interlace
    0. Walks the chunk stream (length/type/data/crc), inflates the
    concatenated IDAT payload, inverts all five scanline filters
    (None/Sub/Up/Average/Paeth), and emits the same exact integer
    channel statistics as ``bmp_stats``: (id, width, height, sum_r,
    sum_g, sum_b, max_lum) with lum = 2*g + r + b. Malformed payloads
    yield width = -1."""
    import struct
    import zlib

    def run(it):
        for pdf in it:
            out = {
                id_col: [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [], "max_lum": [],
            }
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                row = (-1, 0, 0, 0, 0, 0)
                try:
                    if b[:8] == b"\x89PNG\r\n\x1a\n":
                        pos, ihdr, idat = 8, None, []
                        while pos + 8 <= len(b):
                            (ln,) = struct.unpack(">I", b[pos : pos + 4])
                            typ = b[pos + 4 : pos + 8]
                            data = b[pos + 8 : pos + 8 + ln]
                            pos += 12 + ln  # skip crc
                            if typ == b"IHDR":
                                ihdr = struct.unpack(">IIBBBBB", data)
                            elif typ == b"IDAT":
                                idat.append(data)
                            elif typ == b"IEND":
                                break
                        w, h, depth, ctype, comp, filt, inter = ihdr
                        if (
                            depth == 8 and ctype in (2, 6)
                            and comp == 0 and filt == 0 and inter == 0
                        ):
                            ch = 3 if ctype == 2 else 4
                            raw = np.frombuffer(
                                zlib.decompress(b"".join(idat)), np.uint8
                            )
                            if len(raw) == h * (w * ch + 1):
                                px = _png_unfilter(raw, h, w, ch)
                                rd, gr, bl = (
                                    px[..., 0], px[..., 1], px[..., 2],
                                )
                                lum = 2 * gr + rd + bl
                                row = (
                                    w, h,
                                    int(rd.sum()), int(gr.sum()),
                                    int(bl.sum()), int(lum.max()),
                                )
                except (struct.error, ValueError, IndexError,
                        zlib.error, TypeError):
                    pass
                out[id_col].append(mid)
                for k, v in zip(
                    ("width", "height", "sum_r", "sum_g", "sum_b", "max_lum"),
                    row,
                ):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} long, width long, height long, sum_r long, sum_g long, "
        "sum_b long, max_lum long",
    )


def make_png(img: np.ndarray, row_filters=None) -> bytes:
    """Minimal PNG writer (8-bit RGB/RGBA, interlace 0) — the
    fixture-side inverse of :func:`png_stats`. ``row_filters`` chooses
    the filter TYPE per scanline (default all 0) and applies the
    forward filter, so a decoder must genuinely invert Sub/Up/Average/
    Paeth to recover the pixels."""
    import struct
    import zlib

    h, w, ch = img.shape
    ctype = 2 if ch == 3 else 6
    filters = row_filters if row_filters is not None else [0] * h
    px = img.astype(np.int64)
    lines = []
    prev = np.zeros((w, ch), dtype=np.int64)
    for y in range(h):
        f = int(filters[y])
        cur = px[y]
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            enc = cur.copy()
            enc[1:] = cur[1:] - cur[:-1]
        elif f == 2:
            enc = cur - prev
        elif f in (3, 4):
            enc = np.zeros_like(cur)
            left = np.zeros(ch, dtype=np.int64)
            ul = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                pred = (
                    (left + prev[x]) // 2 if f == 3
                    else _paeth(left, prev[x], ul)
                )
                enc[x] = cur[x] - pred
                left, ul = cur[x], prev[x]
        else:
            raise ValueError(f"unknown PNG filter {f}")
        lines.append(bytes([f]) + (enc % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def make_bmp(rgb: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB BMP writer (bottom-up rows, 4-byte stride
    padding) — the fixture-side inverse of :func:`bmp_stats`."""
    import struct

    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    # BMP stores BGR bottom-up
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    off = 14 + 40
    head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return head + info + data


def sniff_content_type(
    df: DataFrame, payload_col: str = "payload", html_probe_bytes: int = 256
) -> DataFrame:
    """Content-type detection by magic bytes — the ingest-side gate a
    multimodal crawl pipeline runs on every fetched payload BEFORE
    routing it to a decoder (served Content-Type headers are famously
    unreliable; magic sniffing is the WHATWG/`file(1)` practice). Pure
    JVM codegen: one uppercase-hex projection of the first 16 bytes,
    then a longest-prefix CASE — no Python, no shuffle, the corpus
    stays map-only.

    Detected (public signatures): png, jpeg, gif, bmp, wav + avi
    (RIFF subtypes), pdf, gzip, zip, warc (the 'WARC/' magic), html
    (leading-whitespace-tolerant '<' probe within ``html_probe_bytes``
    looking for <html/<!doctype, ASCII case-insensitive), else
    'unknown'. Adds a ``sniffed_type`` column.
    """
    hx = F.upper(F.hex(F.substring(F.col(payload_col), 1, 16)))
    head = F.lower(
        # cast the probe prefix to string: invalid UTF-8 bytes decode
        # lossily but '<html'/'<!doctype' survive whenever present
        F.substring(F.col(payload_col), 1, html_probe_bytes).cast("string")
    )
    # NOT F.ltrim: Spark's ltrim strips ' ' only — HTML probes must
    # tolerate leading \n/\t/\r too
    is_html = F.regexp_replace(head, r"^\s+", "").startswith("<") & (
        head.contains("<html") | head.contains("<!doctype")
    )
    sniffed = (
        F.when(hx.startswith("89504E470D0A1A0A"), "png")
        .when(hx.startswith("FFD8FF"), "jpeg")
        .when(
            hx.startswith("474946383761") | hx.startswith("474946383961"),
            "gif",
        )
        .when(
            hx.startswith("52494646")
            & (F.substring(hx, 17, 8) == "57415645"),
            "wav",
        )
        .when(
            hx.startswith("52494646")
            & (F.substring(hx, 17, 8) == "41564920"),
            "avi",
        )
        .when(hx.startswith("25504446"), "pdf")
        .when(hx.startswith("1F8B"), "gzip")
        .when(hx.startswith("504B0304"), "zip")
        .when(hx.startswith("574152432F"), "warc")
        .when(hx.startswith("424D"), "bmp")
        .when(is_html, "html")
        .otherwise("unknown")
    )
    return df.withColumn("sniffed_type", sniffed)
