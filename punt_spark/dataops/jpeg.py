"""Pure-numpy baseline JPEG codec (ITU T.81 / JFIF) — no external image
library, which is the whole point: this container has no PIL/ffmpeg, and
the reference's video path hands frames around as opaque JPEG bytes. With
this module the multimodal operators decode PIXELS, not byte histograms.

Scope (honest, spec-cited):

* ``jpeg_encode``: baseline sequential DCT, 8-bit, single scan. Color as
  YCbCr 4:4:4 (no subsampling — simplest layout that every baseline
  decoder accepts), grayscale as one component. Annex K quantization
  tables scaled by the libjpeg quality formula, Annex K Huffman tables
  (emitted in DHT, so decode does not depend on remembering them right).
* ``jpeg_decode``: baseline sequential (SOF0/SOF1) with ARBITRARY
  sampling factors (4:4:4, 4:2:0, 4:2:2, ...), interleaved or
  single-component scans, restart markers, 8- or 16-bit DQT precision,
  0xFF00 byte unstuffing. Progressive (SOF2) and arithmetic coding raise
  ``ValueError`` — the callers' per-row error path.

The entropy loop is plain Python over a numpy bit array — fine for the
frame-sample/thumbnail sizes the multimodal ops feed it (a 48×48 frame is
~100 blocks); the surrounding Spark plumbing batches via Arrow and the
payloads never shuffle. DCT/IDCT, color transforms, quantization and
upsampling are vectorized numpy over all blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constant tables (ITU T.81 Annex K — public spec) ------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)

# zigzag scan: ZIGZAG[k] = raster index of the k-th zigzag coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)  # raster index -> zigzag position

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix T: coeffs = T @ block @ T.T — exactly
    T.81's FDCT up to the spec's scaling, and T.T @ coeffs @ T inverts it."""
    x = np.arange(8)
    u = x[:, None]
    T = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2.0 / 8.0)
    T[0] /= np.sqrt(2.0)
    return T


_DCT = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the standard IJG quality formula."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 Annex C."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# --- bit I/O -----------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF→0xFF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    """Reads the entropy-coded segment: 0xFF00 unstuffed; any other 0xFF
    marker ends the stream (the scan decoder splits at RSTn beforehand)."""

    def __init__(self, data: bytes):
        # unstuff once into a flat bit array (vectorized)
        arr = np.frombuffer(data, dtype=np.uint8)
        if len(arr):
            stuffed = np.zeros(len(arr), dtype=bool)
            ff = arr[:-1] == 0xFF
            stuffed[1:] = ff & (arr[1:] == 0x00)
            arr = arr[~stuffed]
        self.bits = np.unpackbits(arr)
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated entropy-coded segment")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if self.pos + n > len(self.bits):
            raise ValueError("truncated entropy-coded segment")
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a ``size``-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    """Magnitude category (bit length of |v|)."""
    return int(abs(v)).bit_length()


# --- encoder -----------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _plane_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """(h, w) plane → (n_blocks, 64) zigzagged quantized int32 coeffs,
    blocks in raster order; all-blocks FDCT+quantization is one einsum."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    bh, bw = p.shape[0] // 8, p.shape[1] // 8
    blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coeffs = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT)
    q = np.round(coeffs / qtbl).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _encode_block(
    zz: np.ndarray, pred: int, dc_codes: dict, ac_codes: dict, bw: _BitWriter
) -> int:
    """One zigzagged quantized block → entropy bits; returns the new DC
    predictor."""
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc_th] + bits + vals)


def jpeg_encode(arr: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) grayscale → baseline JFIF JPEG bytes.

    Color is YCbCr 4:4:4 single-scan interleaved; quant + Huffman tables
    are emitted in the stream, so any baseline decoder (including
    :func:`jpeg_decode`) reads it back without shared state."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError(f"jpeg_encode wants uint8, got {arr.dtype}")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError(f"unsupported image size {w}x{h}")
    ql, qc = _quality_tables(quality)

    planes = (
        [arr.astype(np.float64)]
        if gray
        else [ _rgb_to_ycbcr(arr)[..., i] for i in range(3) ]
    )
    qtbls = [ql] if gray else [ql, qc, qc]
    tbl_ids = [0] if gray else [0, 1, 1]
    comp_blocks = [
        _plane_blocks(p, q) for p, q in zip(planes, qtbls)
    ]

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    huff = [(dc_l, ac_l)] if gray else [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    bw = _BitWriter()
    preds = [0] * len(planes)
    # 4:4:4 / single-component: every component has one block per MCU,
    # MCUs in raster order
    for b in range(comp_blocks[0].shape[0]):
        for c in range(len(planes)):
            preds[c] = _encode_block(
                comp_blocks[c][b], preds[c], huff[c][0], huff[c][1], bw
            )
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = ql.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    out += _seg(0xFFDB, b"\x00" + zz_l)
    if not gray:
        zz_c = qc.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += _seg(0xFFDB, b"\x01" + zz_c)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, tbl_ids[i]])
    out += _seg(0xFFC0, sof)
    out += _seg(0xFFC4, _dht_payload(0x00, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xFFC4, _dht_payload(0x10, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        out += _seg(0xFFC4, _dht_payload(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += _seg(0xFFC4, _dht_payload(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------


class _HuffTable:
    """Canonical-code decoder: walk bits, match against per-length first/
    last code ranges (T.81 Annex F DECODE procedure)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("invalid Huffman code in entropy stream")
            code = (code << 1) | br.read_bit()
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _decode_block(
    br: _BitReader, dc_tbl: _HuffTable, ac_tbl: _HuffTable, pred: int
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int32)
    size = dc_tbl.decode(br)
    diff = _extend(br.read_bits(size), size) if size else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = ac_tbl.decode(br)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(br.read_bits(size), size)
        k += 1
    return zz, dc


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB, or (h, w) for a
    single-component (grayscale) stream. See module docstring for scope;
    anything outside it raises ``ValueError`` (the per-row error path)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq), ...])
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS — no image data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > n:
            raise ValueError("truncated marker segment")
        seglen = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated marker segment")
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                cnt = 64 * (2 if pq else 1)
                raw = seg[i : i + cnt]
                if len(raw) < cnt:
                    raise ValueError("truncated DQT")
                vals = (
                    np.frombuffer(raw, dtype=">u2")
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8)
                ).astype(np.float64)
                tbl = np.zeros(64)
                tbl[ZIGZAG] = vals
                qtables[tq] = tbl.reshape(8, 8)
                i += cnt
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("truncated DHT")
                htables[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (marker 0xFF{marker:02X}); "
                "only baseline sequential (SOF0/SOF1) is supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            return _decode_scan(
                payload, pos, frame, seg, qtables, htables, restart_interval
            )
        # else: APPn/COM/etc — skipped
    raise ValueError("no SOS marker — truncated JPEG")


def _entropy_spans(payload: bytes, pos: int) -> list[bytes]:
    """Split the post-SOS entropy data at RSTn markers; stop at the first
    real (non-RST, non-stuffing) marker."""
    spans = []
    start = pos
    i = pos
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF:
            m = payload[i + 1]
            if m == 0x00:
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                spans.append(payload[start:i])
                i += 2
                start = i
                continue
            spans.append(payload[start:i])
            return spans
        i += 1
    spans.append(payload[start:n])
    return spans


def _decode_scan(payload, pos, frame, sos, qtables, htables, restart_interval):
    h, w, comps = frame
    ns = sos[0]
    scan_tbls = {}
    for c in range(ns):
        cid, tt = sos[1 + 2 * c], sos[2 + 2 * c]
        scan_tbls[cid] = (tt >> 4, tt & 0x0F)
    if ns != len(comps):
        raise ValueError(
            "multi-scan (non-interleaved color) streams are not supported"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    if ns == 1:
        # single-component scan: MCU = one data unit, raster over the
        # component's own block grid
        cid, hi, vi, _tq = comps[0]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        mcus_x, mcus_y = -(-cw // 8), -(-ch // 8)
        units = [(cid, 0, 0)]
    else:
        units = [
            (cid, bx, by)
            for cid, hi, vi, _tq in comps
            for by in range(vi)
            for bx in range(hi)
        ]

    planes = {}
    for cid, hi, vi, _tq in comps:
        if ns == 1:
            pw, ph = mcus_x * 8, mcus_y * 8
        else:
            pw, ph = mcus_x * hi * 8, mcus_y * vi * 8
        planes[cid] = np.zeros((ph, pw), dtype=np.float64)
    comp_by_id = {c[0]: c for c in comps}

    spans = _entropy_spans(payload, pos)
    span_idx = 0
    br = _BitReader(spans[0])
    preds = {c[0]: 0 for c in comps}
    total_mcus = mcus_x * mcus_y
    for m in range(total_mcus):
        if restart_interval and m and m % restart_interval == 0:
            span_idx += 1
            if span_idx >= len(spans):
                raise ValueError("missing restart marker in entropy stream")
            br = _BitReader(spans[span_idx])
            preds = {c[0]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for cid, bx, by in units:
            _cid, hi, vi, tq = comp_by_id[cid]
            tdc, tac = scan_tbls[cid]
            if (0, tdc) not in htables or (1, tac) not in htables:
                raise ValueError("missing Huffman table for scan")
            if tq not in qtables:
                raise ValueError("missing quantization table for component")
            zz, preds[cid] = _decode_block(
                br, htables[(0, tdc)], htables[(1, tac)], preds[cid]
            )
            block = np.zeros(64)
            block[ZIGZAG] = zz
            coeffs = block.reshape(8, 8) * qtables[tq]
            pix = _DCT.T @ coeffs @ _DCT + 128.0
            if ns == 1:
                y0, x0 = my * 8, mx * 8
            else:
                y0 = (my * vi + by) * 8
                x0 = (mx * hi + bx) * 8
            planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix

    # upsample to full resolution and crop
    full = []
    for cid, hi, vi, _tq in comps:
        p = planes[cid]
        if ns != 1 and (hi != hmax or vi != vmax):
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    return _ycbcr_to_rgb(np.stack(full, axis=-1))
