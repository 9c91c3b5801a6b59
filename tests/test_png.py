"""Pure-stdlib PNG codec (dataops/png.py): lossless round-trip pins,
decoder generality over color types and scanline filters the production
encoder deliberately doesn't emit (built via a test-local chunk writer),
and every declared error path."""

import struct
import zlib

import numpy as np
import pytest

from punt_spark.dataops.png import _SIG, _chunk, png_decode, png_encode


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


def _make_png(w, h, color_type, raw_scanlines, palette=None, depth=8, interlace=0):
    """Hand-rolled PNG from pre-filtered scanline bytes — lets tests emit
    filter types and color types png_encode never produces."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    parts = [_SIG, _chunk(b"IHDR", ihdr)]
    if palette is not None:
        parts.append(_chunk(b"PLTE", palette.astype(np.uint8).tobytes()))
    parts.append(_chunk(b"IDAT", zlib.compress(raw_scanlines)))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


def test_rgb_roundtrip_lossless():
    img = _gradient(23, 17)  # odd sizes: no padding assumptions
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_gray_roundtrip_lossless():
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (19, 31), dtype=np.uint8)
    dec = png_decode(png_encode(gray))
    assert dec.shape == (19, 31)
    assert np.array_equal(dec, gray)


def test_noise_roundtrip_lossless():
    # incompressible content still round-trips exactly (PNG is lossless)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_one_pixel_and_one_row():
    px = np.array([[[1, 2, 3]]], dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(px)), px)
    row = _gradient(1, 40)
    assert np.array_equal(png_decode(png_encode(row)), row)


def _filtered_rgb(img, ftype):
    """Apply a PNG filter forward (spec RFC 2083 §6) so the decoder's
    undo is exercised against an independent forward implementation."""
    h, w, _ = img.shape
    stride = w * 3
    px = img.reshape(h, stride).astype(np.int16)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = px[y]
        line = np.zeros(stride, dtype=np.int16)
        for x in range(stride):
            a = int(cur[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (int(cur[x]) - pred) & 0xFF
        out += bytes([ftype]) + line.astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_each_filter_type(ftype):
    img = _gradient(9, 7)
    payload = _make_png(7, 9, 2, _filtered_rgb(img, ftype))
    assert np.array_equal(png_decode(payload), img)


def test_decode_mixed_filters_per_row():
    img = _gradient(10, 6)
    # row y gets filter y % 5 — splice rows from per-filter encodings
    stride = 6 * 3 + 1
    rows = []
    for y in range(10):
        full = _filtered_rgb(img, y % 5)
        rows.append(full[y * stride : (y + 1) * stride])
    payload = _make_png(6, 10, 2, b"".join(rows))
    assert np.array_equal(png_decode(payload), img)


def test_decode_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]])
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    dec = png_decode(_make_png(3, 2, 3, raw, palette=palette))
    assert np.array_equal(dec, palette[idx])


def test_decode_rgba_composites_over_black():
    # full alpha → exact color; zero alpha → black; half → scaled
    rgba = np.array(
        [[[200, 100, 50, 255], [200, 100, 50, 0], [200, 100, 50, 128]]],
        dtype=np.uint8,
    )
    raw = b"\x00" + rgba.tobytes()
    dec = png_decode(_make_png(3, 1, 6, raw))
    assert dec.shape == (1, 3, 3)
    assert np.array_equal(dec[0, 0], [200, 100, 50])
    assert np.array_equal(dec[0, 1], [0, 0, 0])
    assert np.array_equal(dec[0, 2], (rgba[0, 2, :3] * (128 / 255)).astype(np.uint8))


def test_decode_gray_alpha():
    ga = np.array([[[100, 255], [100, 0]]], dtype=np.uint8)
    dec = png_decode(_make_png(2, 1, 4, b"\x00" + ga.tobytes()))
    assert np.array_equal(dec[0, 0], [100, 100, 100])
    assert np.array_equal(dec[0, 1], [0, 0, 0])


def test_multiple_idat_chunks_concatenate():
    img = _gradient(8, 8)
    comp = zlib.compress(_filtered_rgb(img, 0))
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)
    payload = b"".join(
        [
            _SIG,
            _chunk(b"IHDR", ihdr),
            _chunk(b"IDAT", comp[: len(comp) // 2]),
            _chunk(b"IDAT", comp[len(comp) // 2 :]),
            _chunk(b"IEND", b""),
        ]
    )
    assert np.array_equal(png_decode(payload), img)


def test_error_paths():
    img = _gradient(4, 4)
    good = png_encode(img)
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"BM" + good)
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(_make_png(2, 2, 0, b"\x00" * 6, depth=16))
    with pytest.raises(ValueError, match="interlaced"):
        png_decode(_make_png(2, 2, 2, b"\x00" * 14, interlace=1))
    with pytest.raises(ValueError, match="color type"):
        png_decode(_make_png(2, 2, 5, b"\x00" * 10))
    with pytest.raises(ValueError, match="without PLTE"):
        png_decode(_make_png(2, 2, 3, b"".join(b"\x00\x00\x00" for _ in range(2))))
    with pytest.raises(ValueError, match="truncated PNG pixel"):
        png_decode(_make_png(4, 4, 2, _filtered_rgb(img, 0)[: 2 * 13]))
    with pytest.raises(ValueError, match="filter type"):
        png_decode(_make_png(2, 1, 2, b"\x07" + b"\x00" * 6))
    with pytest.raises(ValueError, match="palette index"):
        palette = np.array([[1, 2, 3]])
        png_decode(_make_png(2, 1, 3, b"\x00\x00\x05", palette=palette))
    # encoder contract
    with pytest.raises(ValueError, match="uint8"):
        png_encode(img.astype(np.float32))
    with pytest.raises(ValueError, match="shape"):
        png_encode(np.zeros((2, 2, 4), dtype=np.uint8))
