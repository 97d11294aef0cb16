"""Multimodal column plumbing (tier C): image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched Pandas UDFs.

Decode kernels are REAL in this codec-less container for three formats:
WAV audio (stdlib `wave`), uncompressed 24-bit BMP images (stdlib byte
parsing — header, stride padding, bottom-up rows), and non-interlaced
8-bit PNG (stdlib `zlib` inflate + the five scanline unfilters). Other
image formats use PIL when importable, else a deterministic digest
stand-in, clearly marked. Everything around the kernels — schema, batch
iteration, partition sizing, UDF signatures — is identical either way.

Design for 100 TB of media:
- media stays a `binary` column next to its metadata struct; no
  row-per-pixel explosion inside the engine.
- kernels run via mapInPandas (Arrow batches) — per-batch Python overhead,
  not per-row; spark.sql.execution.arrow.maxRecordsPerBatch bounds batch
  memory for large blobs.
- derived features (embeddings, thumbnails) come back as fixed-width
  array/binary columns so downstream joins/dedup stay columnar.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


# Codec auto-detect (VERDICT #8): real decode wherever the environment
# provides PIL; this container doesn't, so the deterministic stand-in is
# the auto path here. The try lives at module scope so executors resolve
# it once per worker, not per batch.
try:
    from PIL import Image as _PILImage  # type: ignore

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False


def _fake_decode(payload: bytes | None) -> np.ndarray:
    """Deterministic stand-in decoder: digest → unit-norm feature vector."""
    if payload is None:
        payload = b""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    vec = (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)
    n = float(np.linalg.norm(vec))
    return vec / n if n else vec


def _pil_decode(payload: bytes | None) -> np.ndarray:
    """Real decode kernel: grayscale 4×4 thumbnail → unit-norm float32[16].

    Undecodable payloads yield the zero vector (drop-don't-fail, the same
    contract as the lenient JSON parse — callers filter on norm > 0).
    """
    import io

    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    try:
        img = _PILImage.open(io.BytesIO(bytes(payload))).convert("L")
    except Exception:  # noqa: BLE001 — any codec failure = undecodable
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    side = int(FEATURE_DIM**0.5)
    vec = (
        np.asarray(img.resize((side, side)), dtype=np.float64).ravel() / 255.0
    ).astype(np.float32)
    n = float(np.linalg.norm(vec))
    return vec / n if n else vec


def _is_bmp(payload: bytes | None) -> bool:
    return payload is not None and len(payload) >= 2 and bytes(payload[:2]) == b"BM"


def _gray_feature(gray: np.ndarray | None) -> np.ndarray:
    """Shared pixel->feature kernel for every real image decoder: 4x4
    area-style block means of the grayscale, /255, unit-normed with a
    SEQUENTIAL square fold so the result is bit-reproducible against a
    SQL oracle doing the same arithmetic. None / too-small input yields
    the zero vector (drop-don't-fail)."""
    import math

    zeros = np.zeros(FEATURE_DIM, dtype=np.float64)
    side = int(FEATURE_DIM**0.5)
    if gray is None or gray.shape[0] < side or gray.shape[1] < side:
        return zeros
    try:
        v = _grid_means(gray, side, side).reshape(-1) / 255.0
        acc = 0.0  # sequential fold — matches list_reduce oracle order
        for x in v:
            acc += float(x) * float(x)
        n = math.sqrt(acc)
        return v / n if n else v
    except Exception:  # noqa: BLE001 — any parse failure = undecodable
        return zeros


def _bmp_decode(payload: bytes | None) -> np.ndarray:
    """Real image decode with ZERO dependencies: uncompressed 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB) via stdlib byte slicing — the image twin
    of the stdlib WAV path, so the image kernel is real in codec-less
    environments too. Parses the actual format: pixel-array offset from
    the file header, signed height (negative = top-down rows), 4-byte
    row stride padding; features via the shared `_gray_feature` kernel.
    """
    return _gray_feature(_bmp_gray(payload))


def _bmp_gray(payload: bytes | None) -> np.ndarray | None:
    """Parse an uncompressed 24-bit BMP into an (h, w) float64 grayscale
    array (channel mean), or None if unparseable. Handles pixel-array
    offset, 4-byte stride padding, bottom-up and top-down row order.
    Channel sums are exact small ints, so /3.0 is one well-defined
    rounding; equal-channel (gray) fixtures stay exact integers."""
    try:
        if payload is None or len(payload) < 54:
            return None
        data = bytes(payload)
        if data[:2] != b"BM":
            return None
        off = int.from_bytes(data[10:14], "little")
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        comp = int.from_bytes(data[30:34], "little")
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None
        top_down = h < 0
        h = abs(h)
        stride = (w * 3 + 3) // 4 * 4
        if off + stride * h > len(data):
            return None
        px = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)
        rows = px[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]  # BMP stores rows bottom-up by default
        return rows.astype(np.int64).sum(axis=2) / 3.0
    except Exception:  # noqa: BLE001 — any parse failure = undecodable
        return None


def _grid_means(gray: np.ndarray, gw: int, gh: int) -> np.ndarray:
    """Area-style (gh, gw) block means of a grayscale array — bucket
    y*gh//h / x*gw//w, uneven buckets for non-multiple sides. Block sums
    of exact-int grays are exact, so mean = sum/size is one well-defined
    division per cell (bit-reproducible against a SQL twin)."""
    h, w = gray.shape
    ys = (np.arange(h) * gh) // h
    xs = (np.arange(w) * gw) // w
    out = np.empty((gh, gw), dtype=np.float64)
    for by in range(gh):
        rsel = gray[ys == by]
        for bx in range(gw):
            blk = rsel[:, xs == bx]
            out[by, bx] = blk.sum() / blk.size
    return out


def image_gray(payload: bytes | None) -> np.ndarray | None:
    """Format-dispatching grayscale decode: BMP, PNG, or baseline JPEG
    via the stdlib parsers (all three share the exact channel-mean gray
    contract), None if no real parser handles the payload. The common
    entry point for pixel-level operators that must not care how the
    image was serialized — which is the entire premise of perceptual
    dedup (a re-encoded copy is still the same image)."""
    if _is_bmp(payload):
        g = _bmp_gray(payload)
        if g is not None:
            return g
    if _is_png(payload):
        g = _png_gray(payload)
        if g is not None:
            return g
    if _is_jpeg(payload):
        g = _jpeg_gray(payload)
        if g is not None:
            return g
    return None


def image_dhash(
    payload: bytes | None, gw: int = 5, gh: int = 4
) -> int:
    """Perceptual difference hash (dHash) of an image payload (any
    stdlib-decodable format — BMP, PNG, baseline JPEG).

    Classic image near-dup fingerprint: reduce to a (gh, gw) grayscale
    grid, then bit k = 1 iff cell (r, c) > cell (r, c+1) for
    k = r*(gw-1) + c — gh*(gw-1) bits total (16 with the defaults;
    production images use 8×9 → 64 bits, the test fixtures are only
    8×6 px so the grid must not exceed the image). Robust to uniform
    brightness shifts (comparisons, not values) — exactly why real
    crawl pipelines dedup images on dHash/pHash rather than byte
    digests. Unparseable or too-small payloads hash to 0. Pair search
    is :func:`operators.dedup.simhash_hamming_pairs` on the hash
    column — same pigeonhole banding, never all-pairs.
    """
    gray = image_gray(payload)
    if gray is None or gray.shape[0] < gh or gray.shape[1] < gw:
        return 0
    grid = _grid_means(gray, gw, gh)
    bits = 0
    for r in range(gh):
        for c in range(gw - 1):
            if grid[r, c] > grid[r, c + 1]:
                bits |= 1 << (r * (gw - 1) + c)
    return bits


def make_bmp(pixels: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (stdlib only) — real image payloads for the real decode path,
    exactly like make_wav for audio. Writes the canonical bottom-up row
    order with 4-byte stride padding so the parser's hard parts are
    exercised, and stores channels in BMP's on-disk BGR order."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) // 4 * 4
    # vectorized: flip rows (bottom-up), swap RGB->BGR, pad each row to
    # the 4-byte stride
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    body = padded.tobytes()
    off = 14 + 40
    size = off + len(body)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return bytes(header) + bytes(body)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# bit-depth-8 color types the stdlib parser handles: gray, RGB, gray+A, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _is_png(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) >= 8
        and bytes(payload[:8]) == _PNG_MAGIC
    )


def _png_gray(payload: bytes | None) -> np.ndarray | None:
    """Parse a non-interlaced 8-bit PNG (gray/RGB/gray+alpha/RGBA) into an
    (h, w) float64 grayscale array, or None if unparseable — stdlib only
    (`zlib` inflate + the five scanline unfilters: None/Sub/Up/Average/
    Paeth, per the PNG spec §9). Gray = mean of the color channels
    (alpha ignored); RGB channel sums are exact small ints, so /3.0 is
    one well-defined rounding — the same arithmetic contract as
    `_bmp_gray`, which is what lets the closed-form SQL oracle cover
    PNG-decoded pixels too."""
    import zlib

    try:
        if not _is_png(payload):
            return None
        data = bytes(payload)
        pos, w = 8, None
        idat = bytearray()
        while pos + 8 <= len(data):
            ln = int.from_bytes(data[pos : pos + 4], "big")
            ctype = data[pos + 4 : pos + 8]
            chunk = data[pos + 8 : pos + 8 + ln]
            if ctype == b"IHDR":
                w = int.from_bytes(chunk[0:4], "big")
                h = int.from_bytes(chunk[4:8], "big")
                depth, color = chunk[8], chunk[9]
                interlace = chunk[12]
                if (
                    depth != 8
                    or color not in _PNG_CHANNELS
                    or interlace != 0
                    or w <= 0
                    or h <= 0
                ):
                    return None
                ch = _PNG_CHANNELS[color]
            elif ctype == b"IDAT":
                idat += chunk
            elif ctype == b"IEND":
                break
            pos += 12 + ln
        if w is None or not idat:
            return None
        raw = zlib.decompress(bytes(idat))
        rowlen = 1 + w * ch
        if len(raw) < rowlen * h:
            return None
        out = np.zeros((h, w * ch), dtype=np.uint8)
        prev = np.zeros(w * ch, dtype=np.int64)
        for y in range(h):
            row = raw[y * rowlen : (y + 1) * rowlen]
            ftype = row[0]
            cur = np.frombuffer(row, dtype=np.uint8, count=w * ch, offset=1)
            cur = cur.astype(np.int64)
            if ftype == 0:  # None
                rec = cur
            elif ftype == 2:  # Up
                rec = (cur + prev) & 0xFF
            else:  # Sub/Average/Paeth need the left neighbor sequentially
                rec = np.zeros(w * ch, dtype=np.int64)
                for i in range(w * ch):
                    a = rec[i - ch] if i >= ch else 0  # left
                    b = prev[i]  # up
                    if ftype == 1:
                        pred = a
                    elif ftype == 3:
                        pred = (a + b) // 2
                    elif ftype == 4:
                        c = prev[i - ch] if i >= ch else 0  # up-left
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    else:
                        return None
                    rec[i] = (cur[i] + pred) & 0xFF
            out[y] = rec.astype(np.uint8)
            prev = rec
        px = out.reshape(h, w, ch).astype(np.int64)
        ncolor = 1 if ch in (1, 2) else 3  # drop the alpha channel
        if ncolor == 1:
            return px[:, :, 0].astype(np.float64)
        return px[:, :, :3].sum(axis=2) / 3.0
    except Exception:  # noqa: BLE001 — any parse failure = undecodable
        return None


def _png_decode(payload: bytes | None) -> np.ndarray:
    """Real PNG decode → the shared `_gray_feature` kernel over
    `_png_gray` pixels (same closed-form oracle as BMP/JPEG)."""
    return _gray_feature(_png_gray(payload))


def make_png(pixels: np.ndarray, filter_mix: bool = True) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG
    (stdlib zlib only) — real payloads for the real decode path. With
    ``filter_mix`` (default) row y uses filter type y % 5, so fixtures
    exercise every unfilter branch (None/Sub/Up/Average/Paeth), not just
    the trivial one."""
    import zlib

    h, w, _ = pixels.shape
    px = pixels.astype(np.int64)
    lines = bytearray()
    prev = np.zeros((w, 3), dtype=np.int64)
    for y in range(h):
        row = px[y]
        f = (y % 5) if filter_mix else 0
        if f == 0:
            enc = row
        elif f == 1:  # Sub
            left = np.vstack([np.zeros((1, 3), dtype=np.int64), row[:-1]])
            enc = (row - left) & 0xFF
        elif f == 2:  # Up
            enc = (row - prev) & 0xFF
        elif f == 3:  # Average
            left = np.vstack([np.zeros((1, 3), dtype=np.int64), row[:-1]])
            enc = (row - (left + prev) // 2) & 0xFF
        else:  # Paeth
            enc = np.zeros_like(row)
            for x in range(w):
                for c in range(3):
                    a = int(row[x - 1, c]) if x > 0 else 0
                    b = int(prev[x, c])
                    cc = int(prev[x - 1, c]) if x > 0 else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                    enc[x, c] = (int(row[x, c]) - pred) & 0xFF
        lines.append(f)
        lines += enc.astype(np.uint8).tobytes()
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + ctype + body + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, truecolor, deflate, adaptive, no interlace
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def _is_jpeg(payload: bytes | None) -> bool:
    from . import jpeg as _J

    return _J.is_jpeg(payload)


def _jpeg_gray(payload: bytes | None) -> np.ndarray | None:
    """Baseline JPEG → grayscale via the stdlib+numpy codec
    (operators/jpeg.py); None for variants it can't handle (progressive,
    arithmetic, 12-bit) so callers fall through to PIL."""
    from . import jpeg as _J

    return _J.jpeg_gray(payload)


def make_jpeg(pixels: np.ndarray, quant_value: int = 1) -> bytes:
    """Baseline JFIF encoder (operators/jpeg.py) — real JPEG payloads for
    the real decode path, like make_bmp/make_png/make_wav."""
    from . import jpeg as _J

    return _J.make_jpeg(pixels, quant_value)


def _jpeg_decode(payload: bytes | None) -> np.ndarray:
    """Real JPEG decode → the shared `_gray_feature` kernel over
    `_jpeg_gray` pixels (exact for block-constant quant-1 fixtures,
    see operators/jpeg.py)."""
    return _gray_feature(_jpeg_gray(payload))


def _wav_decode(payload: bytes | None) -> np.ndarray:
    """Real audio decode: WAV via the stdlib `wave` module — PCM needs no
    external codec, so unlike image/video this path is ALWAYS real.

    Feature = FEATURE_DIM RMS-energy bins over the sample stream (a
    crude envelope), unit-normed; undecodable payloads yield the zero
    vector (drop-don't-fail, same contract as the other kernels).
    """
    import io
    import wave

    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    try:
        with wave.open(io.BytesIO(bytes(payload))) as w:
            raw = w.readframes(w.getnframes())
        samples = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
    except Exception:  # noqa: BLE001 — any codec failure = undecodable
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    if samples.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    bins = np.array_split(samples, FEATURE_DIM)
    vec = np.array(
        [np.sqrt((b * b).mean()) if b.size else 0.0 for b in bins],
        dtype=np.float64,
    ).astype(np.float32)
    n = float(np.linalg.norm(vec))
    return vec / n if n else vec


def decode_audio(payload: bytes | None, fake: bool | None = None) -> np.ndarray:
    """Audio decode kernel. The real path (stdlib WAV) always exists;
    ``fake=True`` forces the deterministic digest stand-in."""
    if fake:
        return _fake_decode(payload)
    return _wav_decode(payload)


def decode_image(payload: bytes | None, fake: bool | None = None) -> np.ndarray:
    """Image decode kernel. Dispatch, most-reproducible-first:

    - BMP-magic payloads the stdlib parser can actually read
      (uncompressed 24-bit) take it first: real pixel decode with zero
      dependencies and engine-pinned arithmetic, so results never depend
      on which codec lib is installed (PIL's resampling would give
      different floats). BMP variants the parser can't handle (palette,
      16/32-bit, RLE) fall through to PIL like any other format —
      routing them to the stdlib path would silently zero them even with
      a capable codec present.
    - other formats: PIL when importable, else the deterministic digest
      stand-in (``fake=None`` auto) or NotImplementedError
      (``fake=False`` demands a real codec).
    - ``fake=True``: always the stand-in (reproducible digest oracles).

    Every path honors the same contract: bytes in, fixed-width unit-norm
    float vector out (undecodable → zero vector on the real paths).
    """
    if fake:
        return _fake_decode(payload)
    # each stdlib parser runs ONCE: the can-this-path-handle-it probe IS
    # the decode, so keep the grayscale and feature it directly (the
    # previous `_x_gray(p) is not None ... return _x_decode(p)` shape
    # decoded every payload twice — measured 2x on the jpeg kernel)
    if _is_bmp(payload):
        g = _bmp_gray(payload)
        if g is not None:
            return _gray_feature(g)
        # BMP variants the parser can't handle (palette, 16/32-bit,
        # RLE) fall through to PIL like any other format
    if _is_png(payload):
        # stdlib zlib + unfilter: real pixels, engine-pinned arithmetic
        # (same grid-mean/unit-norm kernel as BMP). PNG variants the
        # parser can't handle (16-bit, palette, interlaced) fall through
        # to PIL like any other format.
        g = _png_gray(payload)
        if g is not None:
            return _gray_feature(g)
    if _is_jpeg(payload):
        # baseline JPEG: stdlib+numpy Huffman/IDCT decode, real pixels
        # (operators/jpeg.py). Progressive/arithmetic/12-bit fall
        # through to PIL like any other format.
        g = _jpeg_gray(payload)
        if g is not None:
            return _gray_feature(g)
    if HAVE_PIL:
        return _pil_decode(payload)
    if fake is None:
        return _fake_decode(payload)
    raise NotImplementedError(
        "no image codec for this payload in this environment: only "
        "uncompressed 24-bit BMP and non-interlaced 8-bit PNG decode "
        "without PIL; pass fake=True (or fake=None for auto-fallback) "
        "for the deterministic stand-in"
    )


def extract_features(
    media: DataFrame, fake: bool | None = True, carry: tuple[str, ...] = ()
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    One Python worker call per Arrow batch; payload bytes never transit the
    driver. Output is a fixed-width float vector per media row, ready for
    the similarity/dedup operators (operators/similarity.py).

    ``carry`` names input columns to pass through the kernel unchanged —
    at scale this keeps sidecar metadata (fingerprints, source tags) in the
    same single scan instead of re-reading the table and joining back.
    """
    carried = [media.schema[c] for c in carry]
    out_schema = StructType(list(DECODED_SCHEMA.fields) + carried)

    def decode_one(kind: str, payload) -> np.ndarray:
        # kind-aware dispatch on the auto/real path; fake=True keeps every
        # kind on the digest stand-in (the reproducible-oracle mode)
        if not fake and kind == "audio":
            return decode_audio(payload, fake=fake)
        return decode_image(payload, fake=fake)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_one(k, p).tolist()
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [
                    len(p) if p is not None else 0 for p in pdf["payload"]
                ],
                "feature": feats,
            }
            for c in carry:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=out_schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode.

    The expensive decode happens later in extract_features; this step is
    pure metadata arithmetic (sequence over duration), fully JVM-side, and
    demonstrates how a 2-hour video becomes 7200 decode tasks that
    parallelize across the cluster instead of one giant task.
    """
    n_frames = F.greatest(
        (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int"),
        F.lit(1),
    )
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("frame_offset_ms", F.col("frame_idx") * every_ms)
    )


def make_wav(freq_hz: float, n_samples: int = 800, rate: int = 8000) -> bytes:
    """Deterministic mono 16-bit PCM WAV (stdlib only) — a real audio
    payload for the real decode path."""
    import io
    import math
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        # sample VALUES stay per-sample libm math.sin (np.sin's SIMD libm
        # can differ by ulps — the oracle replays these exact doubles);
        # only the int16 little-endian serialization is vectorized
        vals = [
            int(20000 * math.sin(2 * math.pi * freq_hz * t / rate))
            for t in range(n_samples)
        ]
        w.writeframes(np.array(vals, dtype="<i2").tobytes())
    return buf.getvalue()


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (binary payloads;
    audio rows carry REAL WAV bytes and image rows REAL BMP bytes so the
    stdlib decode paths run end-to-end)."""
    rows: list[tuple[Any, ...]] = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "audio":
            payload = make_wav(200.0 + 13.0 * i)
        elif kind == "image":
            yy, xx = np.mgrid[0:8, 0:6]
            g = ((i * 37 + yy * 11 + xx * 5) % 256).astype(np.uint8)
            payload = make_bmp(np.stack([g, g, g], axis=-1))
        else:
            payload = hashlib.sha256(str(i).encode()).digest() * (i % 7 + 1)
        rows.append(
            (
                f"m{i:04d}",
                kind,
                bytearray(payload),
                f"{kind}/fake",
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                5000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def wav_spectral_features(
    media: "DataFrame",
    id_col: str = "media_id",
    freq_col: str = "freq",
    n_samples: int = 800,
    rate: int = 8000,
    bins: tuple[int, ...] = (1, 2, 3, 4),
) -> "DataFrame":
    """Real-audio spectral features: synthesize a WAV per row (tone at
    ``freq_col``), decode it through the stdlib ``wave`` module, and
    compute closed-form DFT magnitudes at the given bin indices — the
    engine-portable spectral kernel (an FFT would reassociate the sums;
    bin count is fixed, so O(n_samples * bins) explicit sums cost the
    same asymptotics per row and replay exactly in SQL).

    Portability contract (verified bit-level in the oracle): samples are
    ``trunc(20000 * sin(2*pi*f*t/rate))`` with libm sin (Python
    ``math.sin`` == DuckDB ``sin`` on this platform — pinned by the
    gate); DFT factors come from ``math.cos``/``math.sin`` per (k, t),
    NOT np.cos (SIMD libm may differ by ulps); accumulation is a
    sequential fold over t, vectorized across the row axis only.

    Returns (id, n_samples, m1..m{len(bins)}) with raw double
    magnitudes; callers snap/log them for export.
    """
    import math

    import pandas as pd_  # local alias: keep the closure self-contained

    out_schema = f"{id_col} string, n_samples long, " + ", ".join(
        f"m{k} double" for k in bins
    )

    cosf = {
        k: np.array(
            [math.cos(2 * math.pi * k * t / n_samples) for t in range(n_samples)]
        )
        for k in bins
    }
    sinf = {
        k: np.array(
            [math.sin(2 * math.pi * k * t / n_samples) for t in range(n_samples)]
        )
        for k in bins
    }

    def batches(it):
        import io
        import wave

        # per-batch memo: synth+decode is a pure function of the freq (and
        # the fixed n_samples/rate), so identical tones in one Arrow batch
        # decode once — NOT a cross-run cache (rebuilt every task); the
        # tone table here has 4 distinct frequencies across the corpus
        memo: dict[float, np.ndarray] = {}

        for pdf in it:
            ids = pdf[id_col].tolist()
            freqs = pdf[freq_col].tolist()
            X = np.empty((len(ids), n_samples), dtype=np.float64)
            for j, f in enumerate(freqs):
                key = float(f)
                samples = memo.get(key)
                if samples is None:
                    payload = make_wav(key, n_samples, rate)
                    with wave.open(io.BytesIO(payload)) as w:
                        raw = w.readframes(w.getnframes())
                    samples = np.frombuffer(raw, dtype=np.int16).astype(
                        np.float64
                    )
                    memo[key] = samples
                X[j] = samples
            cols: dict[str, object] = {
                id_col: ids,
                "n_samples": [n_samples] * len(ids),
            }
            # transpose once: the fold walks t, and XT[t] is a contiguous
            # row (the X[:, t] stride walk measured 5x slower); the
            # accumulation order per (k, row) is unchanged — bit-identical
            XT = np.ascontiguousarray(X.T)
            for k in bins:
                re = np.zeros(len(ids))
                im = np.zeros(len(ids))
                ck, sk = cosf[k], sinf[k]
                for t in range(n_samples):  # sequential fold, rows vectorized
                    xt = XT[t]
                    re += xt * ck[t]
                    im += xt * sk[t]
                cols[f"m{k}"] = np.sqrt(re * re + im * im)
            yield pd_.DataFrame(cols)

    return media.select(id_col, freq_col).mapInPandas(batches, out_schema)
