"""Pure-numpy baseline JPEG codec (dataops/jpeg.py): round-trip quality
pins, bit-level plumbing, error paths, and decoder generality (4:2:0
subsampling + restart markers) via a test-local encoder harness that
emits layouts the production encoder deliberately doesn't."""

import struct

import numpy as np
import pytest

from punt_spark.dataops import jpeg
from punt_spark.dataops.jpeg import (
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _encode_block,
    _plane_blocks,
    _quality_tables,
    _seg,
    jpeg_decode,
    jpeg_encode,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / mse) if mse else np.inf


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=2,
    ).astype(np.uint8)


def test_dct_matrix_orthonormal():
    T = jpeg._DCT
    assert np.allclose(T @ T.T, np.eye(8), atol=1e-12)


def test_roundtrip_color_quality_ladder():
    img = _gradient(37, 53)  # odd dims exercise edge padding + crop
    last = 0.0
    for q in (50, 75, 90):
        dec = jpeg_decode(jpeg_encode(img, quality=q))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        p = _psnr(img, dec)
        assert p > 35, (q, p)
        assert p > last  # higher quality → strictly better reconstruction
        last = p


def test_roundtrip_noise_and_gray():
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 31, 3)).astype(np.uint8)
    p = _psnr(noise, jpeg_decode(jpeg_encode(noise, quality=90)))
    assert p > 25  # noise is the worst case for a DCT codec
    gray = _gradient(20, 28)[..., 0]
    dec = jpeg_decode(jpeg_encode(gray, quality=85))
    assert dec.ndim == 2 and dec.shape == gray.shape
    assert _psnr(gray, dec) > 40


@pytest.mark.parametrize("shape", [(1, 1, 3), (8, 8, 3), (7, 9), (16, 8, 3)])
def test_roundtrip_small_shapes(shape):
    rng = np.random.default_rng(sum(shape))
    a = rng.integers(0, 256, shape).astype(np.uint8)
    d = jpeg_decode(jpeg_encode(a, quality=95))
    assert d.shape == a.shape
    assert _psnr(a, d) > 25


def test_bit_stuffing_roundtrip():
    """0xFF bytes in the entropy stream must be stuffed with 0x00 on
    write and transparently unstuffed on read."""
    bw = _BitWriter()
    bw.write(0xFF, 8)
    bw.write(0xFF, 8)
    bw.write(0b1010, 4)
    data = bw.flush()
    assert data == b"\xff\x00\xff\x00\xaf"  # pad bits are 1s
    br = _BitReader(data)
    assert br.read_bits(8) == 0xFF
    assert br.read_bits(8) == 0xFF
    assert br.read_bits(4) == 0b1010


def test_decode_error_paths():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"garbage")
    img = jpeg_encode(_gradient(16, 16), quality=80)
    with pytest.raises(ValueError):
        jpeg_decode(img[: len(img) // 2])  # truncated mid-stream
    # progressive (SOF2) is out of scope and must say so
    sof2 = img.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(sof2)


def _encode_420_with_restarts(img: np.ndarray, restart_every: int) -> bytes:
    """Test-local encoder: YCbCr 4:2:0 (2×2-mean chroma downsample,
    2×2 Y blocks per MCU) with DRI/RSTn restart markers — the layouts
    real camera JPEGs use and the production encoder doesn't emit, so
    the decoder's generality is tested against a stream we control."""
    h, w = img.shape[:2]
    assert h % 16 == 0 and w % 16 == 0  # keep the harness simple
    ql, qc = _quality_tables(85)
    ycc = jpeg._rgb_to_ycbcr(img)
    y = ycc[..., 0]
    cb = ycc[..., 1].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = ycc[..., 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    yb = _plane_blocks(y, ql)  # raster order over a (h/8, w/8) grid
    cbb = _plane_blocks(cb, qc)
    crb = _plane_blocks(cr, qc)
    ybw, cbw = w // 8, w // 16

    dc_l = _canonical_codes(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    ac_l = _canonical_codes(jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
    dc_c = _canonical_codes(jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS)
    ac_c = _canonical_codes(jpeg.AC_CHROMA_BITS, jpeg.AC_CHROMA_VALS)

    mcus_x, mcus_y = w // 16, h // 16
    spans, bw_ = [], _BitWriter()
    preds = [0, 0, 0]
    m = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_every and m and m % restart_every == 0:
                spans.append(bw_.flush())
                bw_ = _BitWriter()
                preds = [0, 0, 0]
            for by in range(2):
                for bx in range(2):
                    blk = yb[(2 * my + by) * ybw + (2 * mx + bx)]
                    preds[0] = _encode_block(blk, preds[0], dc_l, ac_l, bw_)
            preds[1] = _encode_block(cbb[my * cbw + mx], preds[1], dc_c, ac_c, bw_)
            preds[2] = _encode_block(crb[my * cbw + mx], preds[2], dc_c, ac_c, bw_)
            m += 1
    spans.append(bw_.flush())
    entropy = bytearray(spans[0])
    for i, s in enumerate(spans[1:]):
        entropy += bytes([0xFF, 0xD0 + (i % 8)]) + s

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFDB, b"\x00" + ql.reshape(-1)[jpeg.ZIGZAG].astype(np.uint8).tobytes())
    out += _seg(0xFFDB, b"\x01" + qc.reshape(-1)[jpeg.ZIGZAG].astype(np.uint8).tobytes())
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    ))
    out += _seg(0xFFC4, jpeg._dht_payload(0x00, jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS))
    out += _seg(0xFFC4, jpeg._dht_payload(0x10, jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS))
    out += _seg(0xFFC4, jpeg._dht_payload(0x01, jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS))
    out += _seg(0xFFC4, jpeg._dht_payload(0x11, jpeg.AC_CHROMA_BITS, jpeg.AC_CHROMA_VALS))
    if restart_every:
        out += _seg(0xFFDD, struct.pack(">H", restart_every))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_420_subsampled_with_restarts():
    img = _gradient(32, 48)
    for restart_every in (0, 2):  # plain and RST-segmented streams
        dec = jpeg_decode(_encode_420_with_restarts(img, restart_every))
        assert dec.shape == img.shape
        # smooth gradient: 2x2 chroma subsampling loses little
        assert _psnr(img, dec) > 30, restart_every
    # luma channel specifically must be near-exact (it is NOT subsampled)
    dec = jpeg_decode(_encode_420_with_restarts(img, 2))
    luma = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    assert np.abs(luma(dec.astype(float)) - luma(img.astype(float))).mean() < 3.0


def test_quality_tables_monotone():
    t50, _ = _quality_tables(50)
    t90, _ = _quality_tables(90)
    t10, _ = _quality_tables(10)
    assert (t90 <= t50).all() and (t50 <= t10).all()
    assert (t90 >= 1).all() and (t10 <= 255).all()
