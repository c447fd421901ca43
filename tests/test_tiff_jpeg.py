"""New-style JPEG-in-TIFF (compression 7, TIFF TechNote 2) through
operators/multimodal.tiff_pixels: an INDEPENDENT container writer here
wraps per-strip/per-tile JPEG streams from the test JPEG encoder, with
and without a shared tag-347 JPEGTables stream, and the decode is
checked against jpeg_pixels run directly on the same streams — so the
container assembly is verified without trusting the decoder under
test."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.multimodal import (
    _read_pixels,
    jpeg_pixels,
    tiff_pixels,
)
from test_jpeg_decode import Q1, _rng, encode_jpeg


def split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a full interchange JPEG into (tables_blob, abbreviated
    stream): DQT/DHT segments move to an SOI..EOI tables-only stream
    (the tag-347 JPEGTables shape), everything else stays."""
    assert stream[:2] == b"\xff\xd8"
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 2 <= len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data + EOI follow verbatim
            rest += stream[pos:]
            break
        (seg_len,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + seg_len]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
        pos += 2 + seg_len
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def encode_tiff_jpeg(
    chunks,
    w,
    h,
    photometric=6,
    jpeg_tables=None,
    endian="<",
    rows_per_strip=None,
    tile_dims=None,
):
    """TIFF container whose strip (default) or tile (``tile_dims =
    (tw, th)``) data is compression-7 JPEG streams given in ``chunks``;
    optional ``jpeg_tables`` becomes tag 347 (type UNDEFINED)."""
    header = (b"II" + struct.pack("<H", 42)) if endian == "<" else (
        b"MM" + struct.pack(">H", 42)
    )
    pos = 8
    offsets = []
    for s in chunks:
        offsets.append(pos)
        pos += len(s)
    ifd_off = pos + (pos % 2)
    header += struct.pack(endian + "I", ifd_off)

    spp = 3 if photometric in (2, 6) else 1
    entries = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [8] * spp),
        (259, 3, [7]),
        (262, 3, [photometric]),
        (277, 3, [spp]),
    ]
    if tile_dims is not None:
        tw, th = tile_dims
        entries += [
            (322, 4, [tw]),
            (323, 4, [th]),
            (324, 4, offsets),
            (325, 4, [len(s) for s in chunks]),
        ]
    else:
        entries += [
            (273, 4, offsets),
            (278, 4, [rows_per_strip or h]),
            (279, 4, [len(s) for s in chunks]),
        ]
    if jpeg_tables is not None:
        entries.append((347, 7, list(jpeg_tables)))
    entries.sort()

    tsize = {3: 2, 4: 4, 7: 1}
    tcode = {3: "H", 4: "I", 7: "B"}
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    extra = bytearray()
    ifd = struct.pack(endian + "H", len(entries))
    for tag, typ, values in entries:
        total = tsize[typ] * len(values)
        if total <= 4:
            packed = struct.pack(
                endian + str(len(values)) + tcode[typ], *values
            )
            packed += b"\x00" * (4 - total)
            ifd += struct.pack(endian + "HHI", tag, typ, len(values)) + packed
        else:
            ifd += struct.pack(
                endian + "HHII", tag, typ, len(values),
                extra_base + len(extra),
            )
            extra += struct.pack(
                endian + str(len(values)) + tcode[typ], *values
            )
    ifd += struct.pack(endian + "I", 0)

    body = bytearray(header)
    for s in chunks:
        body += s
    body += b"\x00" * (ifd_off - len(body))
    body += ifd + extra
    return bytes(body)


def _photo(h, w, seed):
    g = _rng(seed)
    base = g.integers(0, 256, (h, w, 3))
    return base.astype(np.uint8)


class TestJpegInTiff:
    def test_single_strip_interchange(self):
        px = _photo(24, 32, 1)
        stream = encode_jpeg(px, Q1)
        tif = encode_tiff_jpeg([stream], 32, 24)
        out = tiff_pixels(tif)
        ref = jpeg_pixels(stream)
        assert out is not None
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("endian", ["<", ">"])
    def test_multistrip_shared_tables(self, endian):
        # 24 rows in 3 strips of 8; DQT/DHT hoisted into tag 347, each
        # strip an abbreviated stream — the common libtiff layout
        px = _photo(24, 16, 2)
        strips, tables = [], None
        for y0 in range(0, 24, 8):
            full = encode_jpeg(px[y0 : y0 + 8], Q1)
            t, abbrev = split_jpeg_tables(full)
            tables = t
            strips.append(abbrev)
            # the abbreviated stream alone must NOT decode (no tables)
            assert jpeg_pixels(abbrev) is None
        tif = encode_tiff_jpeg(
            strips, 16, 24, jpeg_tables=tables, rows_per_strip=8,
            endian=endian,
        )
        out = tiff_pixels(tif)
        ref = np.vstack(
            [jpeg_pixels(encode_jpeg(px[y0 : y0 + 8], Q1))
             for y0 in range(0, 24, 8)]
        )
        assert out is not None
        np.testing.assert_array_equal(out, ref)

    def test_short_last_strip(self):
        # h=20, rows_per_strip=8 -> strips of 8, 8, 4; the last strip's
        # JPEG is 4 rows tall (MCU-padded internally, cropped by dims)
        px = _photo(20, 16, 3)
        strips = [
            encode_jpeg(px[y0 : min(y0 + 8, 20)], Q1)
            for y0 in range(0, 20, 8)
        ]
        tif = encode_tiff_jpeg(strips, 16, 20, rows_per_strip=8)
        out = tiff_pixels(tif)
        ref = np.vstack([jpeg_pixels(s) for s in strips])
        assert out is not None
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("photometric,invert", [(1, False), (0, True)])
    def test_gray_and_whiteiszero(self, photometric, invert):
        g = _rng(4).integers(0, 256, (16, 16)).astype(np.uint8)
        stream = encode_jpeg(g, Q1, gray=True)
        tif = encode_tiff_jpeg([stream], 16, 16, photometric=photometric)
        out = tiff_pixels(tif)
        ref = jpeg_pixels(stream)
        if invert:
            ref = 255 - ref
        assert out is not None
        np.testing.assert_array_equal(out, ref)

    def test_tiled_edge_crop(self):
        # 20x28 image, 16x16 tiles -> 2x2 grid; edge tiles encoded at
        # full tile size (edge-padded) per TechNote 2, then cropped
        px = _photo(20, 28, 5)
        tw = th = 16
        padded = np.pad(px, ((0, 12), (0, 4), (0, 0)), mode="edge")
        tiles = []
        for ty in range(2):
            for tx in range(2):
                tiles.append(
                    encode_jpeg(
                        padded[ty * th : (ty + 1) * th,
                               tx * tw : (tx + 1) * tw], Q1
                    )
                )
        tif = encode_tiff_jpeg(tiles, 28, 20, tile_dims=(tw, th))
        out = tiff_pixels(tif)
        assert out is not None
        canvas = np.zeros((32, 32, 3), np.uint8)
        for ti, t in enumerate(tiles):
            ty, tx = divmod(ti, 2)
            canvas[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = (
                jpeg_pixels(t)
            )
        np.testing.assert_array_equal(out, canvas[:20, :28])

    def test_tiled_shared_tables(self):
        px = _photo(16, 32, 6)
        tiles, tables = [], None
        for tx in range(2):
            full = encode_jpeg(px[:, tx * 16 : (tx + 1) * 16], Q1)
            tables, abbrev = split_jpeg_tables(full)
            tiles.append(abbrev)
        tif = encode_tiff_jpeg(
            tiles, 32, 16, tile_dims=(16, 16), jpeg_tables=tables
        )
        out = tiff_pixels(tif)
        assert out is not None
        ref = np.hstack(
            [jpeg_pixels(encode_jpeg(px[:, tx * 16 : (tx + 1) * 16], Q1))
             for tx in range(2)]
        )
        np.testing.assert_array_equal(out, ref)

    def test_read_pixels_routes_jpeg_tiff(self):
        px = _photo(16, 16, 7)
        stream = encode_jpeg(px, Q1)
        tif = encode_tiff_jpeg([stream], 16, 16)
        out = _read_pixels(tif)
        assert out is not None
        np.testing.assert_array_equal(out, jpeg_pixels(stream))

    def test_corrupt_rejected_not_raised(self):
        px = _photo(16, 16, 8)
        stream = encode_jpeg(px, Q1)
        tables, abbrev = split_jpeg_tables(stream)
        # tables blob missing SOI/EOI framing
        assert tiff_pixels(
            encode_tiff_jpeg([abbrev], 16, 16, jpeg_tables=tables[2:])
        ) is None
        assert tiff_pixels(
            encode_tiff_jpeg([abbrev], 16, 16, jpeg_tables=tables[:-2])
        ) is None
        # strip payload that is not a JPEG stream
        assert tiff_pixels(
            encode_tiff_jpeg([b"\x00" * 64], 16, 16)
        ) is None
        # strip stream decodes smaller than its declared region
        assert tiff_pixels(encode_tiff_jpeg([stream], 64, 64)) is None
        # chunk count/offset beyond payload
        tif = bytearray(encode_tiff_jpeg([stream], 16, 16))
        assert tiff_pixels(bytes(tif[: len(tif) // 2])) is None
        # old-style JPEG (compression 6) stays out of scope
        bad = tif.replace(
            struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 7, 0),
            struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 6, 0),
        )
        assert tiff_pixels(bytes(bad)) is None

    def test_tile_canvas_byte_cap(self):
        # a tiny payload declaring a huge tile grid must be rejected by
        # the BYTES-bound canvas cap before any allocation
        px = _photo(16, 16, 9)
        stream = encode_jpeg(px, Q1)
        tif = encode_tiff_jpeg(
            [stream], 16, 16, tile_dims=(4096, 4096)
        )
        assert tiff_pixels(tif) is None

    def test_fuzz_never_raises(self):
        px = _photo(16, 16, 10)
        stream = encode_jpeg(px, Q1)
        tables, abbrev = split_jpeg_tables(stream)
        tif = encode_tiff_jpeg(
            [abbrev], 16, 16, jpeg_tables=tables
        )
        g = _rng(11)
        for _ in range(200):
            buf = bytearray(tif)
            for _ in range(int(g.integers(1, 8))):
                buf[int(g.integers(0, len(buf)))] = int(g.integers(0, 256))
            out = tiff_pixels(bytes(buf))  # must return, never raise
            assert out is None or (
                out.ndim == 3 and out.dtype == np.uint8
            )
