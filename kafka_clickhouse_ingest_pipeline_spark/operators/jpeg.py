"""Baseline JPEG codec — stdlib + numpy only, no codec libraries.

Closes the last environment-gated multimodal format: BMP and PNG decode
are real (operators/multimodal.py), and JPEG previously fell back to the
deterministic digest stand-in whenever PIL was absent. This module
implements the baseline DCT process of the JPEG standard (ITU-T T.81):

- decoder ``jpeg_gray``: marker parse (SOI/APPn/COM/DQT/DHT/SOF0/DRI/
  SOS), canonical Huffman decode with 0xFF00 byte-unstuffing and RSTn
  restart handling, DC prediction + EXTEND, AC run-length/ZRL/EOB,
  dequantization, inverse zigzag, 8×8 IDCT (orthonormal basis matrix —
  the (1/4)·C(u)C(v) convention of T.81 A.3.3 equals the orthonormal
  scaling), level shift, clamp. Generic sampling loop: any h_i×v_i
  factors (4:4:4, 4:2:2, 4:2:0) with nearest-neighbor upsampling;
  1-component scans return luma directly, 3-component scans convert
  YCbCr→RGB per JFIF and reduce to gray = (R+G+B)/3 — the same
  channel-mean contract as ``_bmp_gray`` / ``_png_gray``.
- encoder ``make_jpeg``: the inverse pipeline with the T.81 Annex K
  typical Huffman tables, for grayscale or RGB (encoded 4:4:4). With the
  default all-ones quantization table, a per-8×8-block-CONSTANT image
  roundtrips EXACTLY: such a block has only a DC coefficient
  (8·(v−128), an integer), quantization by 1 is lossless, and the IDCT
  of a DC-only block is the constant DC/8 — which is what lets a
  closed-form SQL oracle verify real JPEG decode byte-for-byte
  (queries/multimodal.py). Arbitrary images roundtrip within ±1 gray
  level at quality=1 (pinned in tests with the full AC Huffman path).

Reference parity: the reference pipeline moves payloads as opaque bytes
(publisher/internal/api/handler.go:59-81, publisher/internal/kafka/
publisher.go:59-63); decoding media inside the engine is the tier-C
multimodal mandate (SURVEY.md §2), not a reference port.

Progressive (SOF2), arithmetic coding, 12-bit precision and hierarchical
modes are out of scope: the decoder returns None for them and
``decode_image`` falls through to PIL exactly as unsupported PNG/BMP
variants do.
"""

from __future__ import annotations

import numpy as np

# --- shared constants ----------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3 "typical" luminance Huffman tables (public spec constants)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis T: F = T·f·Tᵀ is exactly T.81's
    (1/4)·C(u)C(v)·Σ f·cos·cos forward transform."""
    x = np.arange(8)
    t = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0) * np.sqrt(0.25)
    t[0, :] = np.sqrt(0.125)
    return t


_T = _dct_basis()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the T.81 C.2 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value lookup for the decoder."""
    return {
        (length, code): val
        for val, (code, length) in _canonical_codes(bits, vals).items()
    }


def is_jpeg(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) >= 3
        and bytes(payload[:3]) == b"\xff\xd8\xff"
    )


# --- encoder -------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # T.81 F.1.2.3 byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per F.1.2.3

    def raw(self, data: bytes) -> None:
        """Emit marker bytes verbatim (caller must byte_align first)."""
        self.out += data

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    pred: int,
    dc: dict[int, tuple[int, int]],
    ac: dict[int, tuple[int, int]],
) -> int:
    coef = _T @ (block - 128.0) @ _T.T
    q = np.round(coef / quant).astype(np.int64).reshape(-1)[_ZIGZAG]

    def magnitude(v: int) -> tuple[int, int]:
        # uint8 inputs can never overflow the Annex K tables: the largest
        # achievable |AC| over all level-shifted uint8 blocks is ~1020
        # (sign-aligned basis extreme; brute-forced over every (u,v) and
        # pinned in tests) < 1023 = size-10 max, and |DC diff| <= 2040 <
        # 2047 = size-11 max.
        size = int(abs(v)).bit_length()
        return size, (v if v >= 0 else v + (1 << size) - 1)

    diff = int(q[0]) - pred
    size, extend = magnitude(diff)
    w.put(*dc[size])
    if size:
        w.put(extend, size)

    run = 0
    last_nz = max([i for i in range(1, 64) if q[i]], default=0)
    for i in range(1, last_nz + 1):
        if q[i] == 0:
            run += 1
            continue
        while run >= 16:
            w.put(*ac[0xF0])  # ZRL
            run -= 16
        size, extend = magnitude(int(q[i]))
        w.put(*ac[run * 16 + size])
        w.put(extend, size)
        run = 0
    if last_nz < 63:
        w.put(*ac[0x00])  # EOB
    return int(q[0])


def _marker(tag: int, body: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(body) + 2).to_bytes(2, "big") + body


def _pad_to_blocks(p: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = p.shape
    full = np.empty((bh * 8, bw * 8))
    full[:h, :w] = p
    full[h:, :w] = p[h - 1 : h, :]  # edge replicate
    full[:, w:] = full[:, w - 1 : w]
    return full


def make_jpeg(
    pixels: np.ndarray,
    quant_value: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Serialize an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG (one all-``quant_value`` quantization table,
    Annex K Huffman tables for every component).

    ``quant_value=1`` keeps quantization lossless; block-constant inputs
    then roundtrip exactly through ``jpeg_gray`` (DC-only blocks).
    ``subsampling='420'`` (color only) encodes chroma at quarter
    resolution with the standard 2x2-luma-per-MCU interleave;
    ``restart_interval=N`` emits DRI + a byte-aligned RSTn marker with
    DC-predictor reset every N MCUs — both exist chiefly so the
    DECODER's generic-sampling and restart paths are exercised by real
    bitstreams, not just read by reviewers."""
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [  # JFIF YCbCr, clamped to [0, 255]
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        planes = [np.clip(p, 0.0, 255.0) for p in planes]

    sub420 = subsampling == "420" and not gray
    quant = np.full((8, 8), float(quant_value))
    dc = _canonical_codes(_DC_BITS, _DC_VALS)
    ac = _canonical_codes(_AC_BITS, _AC_VALS)

    writer = _BitWriter()
    preds = [0] * len(planes)
    n_mcu = 0
    # T.81 places RSTn only BETWEEN restart intervals: when the MCU count
    # is a multiple of the interval, a marker after the last MCU would sit
    # between the entropy data and EOI, which strict decoders reject
    if sub420:
        total_mcu = (-(-h // 16)) * (-(-w // 16))
    else:
        total_mcu = (-(-h // 8)) * (-(-w // 8))

    def maybe_restart() -> None:
        nonlocal preds, n_mcu
        n_mcu += 1
        if (
            restart_interval
            and n_mcu % restart_interval == 0
            and n_mcu < total_mcu
        ):
            writer.byte_align()
            writer.raw(
                bytes([0xFF, 0xD0 + (n_mcu // restart_interval - 1) % 8])
            )
            preds = [0] * len(planes)

    if not sub420:
        bh, bw = -(-h // 8), -(-w // 8)
        padded = [_pad_to_blocks(p, bh, bw) for p in planes]
        for by in range(bh):  # 4:4:4 -> MCU = one block per component
            for bx in range(bw):
                for ci, plane in enumerate(padded):
                    block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    preds[ci] = _encode_block(
                        writer, block, quant, preds[ci], dc, ac
                    )
                maybe_restart()
    else:
        mh, mw = -(-h // 16), -(-w // 16)  # MCU grid, 16x16 px each
        y_plane = _pad_to_blocks(planes[0], mh * 2, mw * 2)
        # chroma at quarter resolution: 2x2 means of the padded plane
        chroma = [
            _pad_to_blocks(p, mh * 2, mw * 2)
            .reshape(mh * 8, 2, mw * 8, 2)
            .mean(axis=(1, 3))
            for p in planes[1:]
        ]
        for my in range(mh):
            for mx in range(mw):
                for by in range(2):  # 4 luma blocks, raster order
                    for bx in range(2):
                        y0, x0 = (my * 2 + by) * 8, (mx * 2 + bx) * 8
                        preds[0] = _encode_block(
                            writer,
                            y_plane[y0 : y0 + 8, x0 : x0 + 8],
                            quant,
                            preds[0],
                            dc,
                            ac,
                        )
                for ci, cp in enumerate(chroma, start=1):
                    preds[ci] = _encode_block(
                        writer,
                        cp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                        quant,
                        preds[ci],
                        dc,
                        ac,
                    )
                maybe_restart()

    qz = np.round(quant).astype(np.int64).reshape(-1)[_ZIGZAG]
    ncomp = 1 if gray else 3
    samp = [0x22, 0x11, 0x11] if sub420 else [0x11, 0x11, 0x11]
    sof_comps = b"".join(
        bytes([cid + 1, samp[cid], 0]) for cid in range(ncomp)
    )
    sos_comps = b"".join(bytes([cid + 1, 0x00]) for cid in range(ncomp))
    dri = (
        _marker(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval
        else b""
    )

    def huff_body(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)

    return (
        b"\xff\xd8"  # SOI
        + _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _marker(0xDB, bytes([0x00]) + bytes(int(v) for v in qz))
        + _marker(
            0xC0,
            bytes([8])
            + h.to_bytes(2, "big")
            + w.to_bytes(2, "big")
            + bytes([ncomp])
            + sof_comps,
        )
        + _marker(0xC4, huff_body(0, 0, _DC_BITS, _DC_VALS))
        + _marker(0xC4, huff_body(1, 0, _AC_BITS, _AC_VALS))
        + dri
        + _marker(0xDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
        + writer.flush()
        + b"\xff\xd9"  # EOI
    )


# --- decoder -------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing.
    Stops at any real marker (FFxx, xx not in {00, D0..D7})."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: consumed by align_restart
            else:
                return False  # real marker: segment over
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def bits(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # per F.2.2.5 missing bits read as 1-padding
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def align_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            val = table.get((length, code))
            if val is not None:
                return val
        raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_gray(payload: bytes | None) -> np.ndarray | None:
    """Decode a baseline JPEG into an (h, w) float64 grayscale array, or
    None if the payload is not a baseline JPEG this parser handles
    (callers then fall through to PIL, mirroring the PNG/BMP contract)."""
    try:
        if not is_jpeg(payload):
            return None
        data = bytes(payload)
        pos = 2
        qtabs: dict[int, np.ndarray] = {}
        htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        frame = None
        restart_interval = 0
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            tag = data[pos + 1]
            if tag == 0xFF:  # fill byte (T.81 B.1.1.2)
                pos += 1
                continue
            if tag == 0xD9:  # EOI
                break
            seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
            body = data[pos + 4 : pos + 2 + seglen]
            if tag == 0xDB:  # DQT: one or more tables
                i = 0
                while i < len(body):
                    prec, tid = body[i] >> 4, body[i] & 0x0F
                    n = 64 * (2 if prec else 1)
                    raw = body[i + 1 : i + 1 + n]
                    vals = (
                        np.frombuffer(raw, dtype=">u2").astype(np.int64)
                        if prec
                        else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                    )
                    tab = np.zeros(64, dtype=np.int64)
                    tab[_ZIGZAG] = vals
                    qtabs[tid] = tab.reshape(8, 8)
                    i += 1 + n
            elif tag == 0xC4:  # DHT: one or more tables
                i = 0
                while i + 17 <= len(body):
                    cls, tid = body[i] >> 4, body[i] & 0x0F
                    bits = list(body[i + 1 : i + 17])
                    nvals = sum(bits)
                    vals = list(body[i + 17 : i + 17 + nvals])
                    htabs[(cls, tid)] = _decode_table(bits, vals)
                    i += 17 + nvals
            elif tag == 0xC0 or tag == 0xC1:  # baseline / extended sequential
                if body[0] != 8:
                    return None
                fh = int.from_bytes(body[1:3], "big")
                fw = int.from_bytes(body[3:5], "big")
                ncomp = body[5]
                comps = []
                for c in range(ncomp):
                    cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                    comps.append((cid, samp >> 4, samp & 0x0F, qid))
                frame = (fh, fw, comps)
            elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                         0xCD, 0xCE, 0xCF):
                return None  # progressive/arithmetic/hierarchical
            elif tag == 0xDD:  # DRI
                restart_interval = int.from_bytes(body[0:2], "big")
            elif tag == 0xDA:  # SOS
                if frame is None:
                    return None
                fh, fw, comps = frame
                ns = body[0]
                scan = {}
                for c in range(ns):
                    cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                    scan[cid] = (tids >> 4, tids & 0x0F)
                planes = _decode_scan(
                    data, pos + 2 + seglen, fh, fw, comps, scan,
                    qtabs, htabs, restart_interval,
                )
                if planes is None:
                    return None
                return _planes_to_gray(planes, fh, fw)
            pos += 2 + seglen
        return None
    except Exception:  # noqa: BLE001 — any parse failure = undecodable
        return None


def _decode_scan(data, pos, fh, fw, comps, scan, qtabs, htabs, restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = []
    for _, ch, cv, _ in comps:
        planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8)))
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, qid) in enumerate(comps):
                dcid, acid = scan[cid]
                dct = htabs[(0, dcid)]
                act = htabs[(1, acid)]
                quant = qtabs[qid]
                for by in range(cv):
                    for bx in range(ch):
                        q = np.zeros(64, dtype=np.int64)
                        size = reader.huff(dct)
                        preds[ci] += _extend(reader.bits(size), size)
                        q[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = reader.huff(act)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:  # only ZRL is legal
                                    return None
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                return None
                            q[k] = _extend(reader.bits(size), size)
                            k += 1
                        coef = (q[_ZIGZAG_INV] * quant.reshape(-1)).reshape(8, 8)
                        block = _T.T @ coef @ _T + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # clamp, then upsample each plane to full frame resolution
    out = []
    for (cid, ch, cv, _), plane in zip(comps, planes):
        plane = np.clip(np.round(plane), 0, 255)
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(plane[:fh, :fw])
    return out


_ZIGZAG_INV = np.argsort(_ZIGZAG)


def _planes_to_gray(planes: list[np.ndarray], fh: int, fw: int) -> np.ndarray:
    if len(planes) == 1:
        return planes[0].astype(np.float64)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = np.clip(np.round(y + 1.402 * cr), 0, 255)
    g = np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255)
    b = np.clip(np.round(y + 1.772 * cb), 0, 255)
    return (r + g + b) / 3.0
