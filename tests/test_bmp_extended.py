"""Extended BMP decode (_read_pixels): 8-bit paletted (uncompressed +
RLE8), 32-bit BGRA, top-down and bottom-up rows — against an
independent writer with its own RLE8 compressor."""

from __future__ import annotations

import struct

import numpy as np

from fluent_plugin_sql_spark.operators.multimodal import _read_pixels


def _bmp_header(w, h, bpp, data_size, n_colors=0, compression=0, top_down=False):
    off = 14 + 40 + 4 * n_colors
    file_hdr = b"BM" + struct.pack("<IHHI", off + data_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp,
        compression, data_size, 2835, 2835, n_colors, 0,
    )
    return file_hdr + info


def encode_bmp24(px, top_down=False):
    h, w, _ = px.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = px if top_down else px[::-1]
    data = bytearray()
    for y in range(h):
        data += rows[y, :, ::-1].tobytes()  # RGB -> BGR
        data += b"\x00" * (stride - w * 3)
    return _bmp_header(w, h, 24, len(data), top_down=top_down) + bytes(data)


def encode_bmp32(px, top_down=False):
    h, w, _ = px.shape
    rows = px if top_down else px[::-1]
    data = bytearray()
    for y in range(h):
        for x in range(w):
            r, g, b = rows[y, x]
            data += bytes([b, g, r, 0xAA])  # BGRA
    return _bmp_header(w, h, 32, len(data), top_down=top_down) + bytes(data)


def encode_bmp8(idx, palette, top_down=False, rle=False):
    h, w = idx.shape
    rows = idx if top_down else idx[::-1]
    if not rle:
        stride = (w + 3) // 4 * 4
        data = bytearray()
        for y in range(h):
            data += rows[y].tobytes() + b"\x00" * (stride - w)
        compression = 0
    else:
        data = bytearray()
        for y in range(h):
            x = 0
            while x < w:
                run = 1
                while x + run < w and run < 255 and rows[y, x + run] == rows[y, x]:
                    run += 1
                if run >= 2:
                    data += bytes([run, rows[y, x]])
                    x += run
                else:
                    # absolute mode needs >= 3 literals; single pixels
                    # still encode fine as a run of 1
                    data += bytes([1, rows[y, x]])
                    x += 1
            data += bytes([0, 0])  # end of line
        data += bytes([0, 1])  # end of bitmap
        compression = 1
    n_colors = len(palette)
    hdr = _bmp_header(w, h, 8, len(data), n_colors, compression, top_down)
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([b, g, r, 0])
    return hdr[: 14 + 40] + bytes(pal) + bytes(data)


PAL = np.array(
    [[10, 20, 30], [200, 0, 0], [0, 200, 0], [0, 0, 200], [255, 255, 0]],
    np.uint8,
)


def _rng(seed):
    return np.random.default_rng(seed)


def test_bmp24_both_orientations():
    img = _rng(1).integers(0, 256, (7, 9, 3)).astype(np.uint8)
    assert np.array_equal(_read_pixels(encode_bmp24(img)), img)
    assert np.array_equal(_read_pixels(encode_bmp24(img, top_down=True)), img)


def test_bmp32_drops_alpha():
    img = _rng(2).integers(0, 256, (5, 6, 3)).astype(np.uint8)
    assert np.array_equal(_read_pixels(encode_bmp32(img)), img)
    assert np.array_equal(_read_pixels(encode_bmp32(img, top_down=True)), img)


def test_bmp8_paletted():
    idx = _rng(3).integers(0, 5, (11, 13)).astype(np.uint8)
    arr = _read_pixels(encode_bmp8(idx, PAL))
    assert np.array_equal(arr, PAL[idx])
    arr_td = _read_pixels(encode_bmp8(idx, PAL, top_down=True))
    assert np.array_equal(arr_td, PAL[idx])


def test_bmp8_rle():
    # flat regions + speckle: exercises runs, length-1 runs, EOL/EOB
    idx = np.full((9, 20), 2, np.uint8)
    idx[3, 5] = 1
    idx[7, :] = _rng(4).integers(0, 5, 20).astype(np.uint8)
    arr = _read_pixels(encode_bmp8(idx, PAL, rle=True))
    assert np.array_equal(arr, PAL[idx])


def test_bmp_corrupt_and_unsupported():
    idx = _rng(5).integers(0, 5, (6, 6)).astype(np.uint8)
    payload = encode_bmp8(idx, PAL)
    assert _read_pixels(payload[:30]) is None
    # 4-bit stays out of scope
    p4 = bytearray(payload)
    struct.pack_into("<H", p4, 28, 4)
    assert _read_pixels(bytes(p4)) is None
    # palette index past the table (corrupt the FIRST pixel byte — the
    # last data byte is row padding and never indexes the palette)
    off = struct.unpack_from("<I", payload, 10)[0]
    bad = bytearray(payload)
    bad[off] = 99
    assert _read_pixels(bytes(bad)) is None


def test_bmp_fuzz_never_raises():
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 5, (8, 8)).astype(np.uint8)
    for payload in (encode_bmp8(idx, PAL, rle=True), encode_bmp32(PAL[idx])):
        base = bytearray(payload)
        for _ in range(150):
            p = bytearray(base)
            pos = int(rng.integers(0, len(p)))
            p[pos] = int(rng.integers(0, 256))
            out = _read_pixels(bytes(p))
            assert out is None or out.ndim == 3
