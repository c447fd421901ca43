"""Binary PNM family (operators/multimodal._read_pixels): P6 RGB,
P5 graymap, P4 bitmap — including the 16-bit (maxval > 255) layout
whose samples are 2-byte big-endian (assuming 1 byte would silently
decode wrong pixels) and netpbm maxval scaling."""

from __future__ import annotations

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.multimodal import (
    _read_pixels,
    parse_image_header,
)


def header(magic, w, h, maxval=None, comment=False):
    head = magic + b"\n"
    if comment:
        head += b"# a comment line\n"
    head += b"%d %d\n" % (w, h)
    if maxval is not None:
        head += b"%d\n" % maxval
    return head


class TestPnm:
    def test_p6_maxval_255_unchanged(self):
        px = np.random.default_rng(1).integers(0, 256, (5, 7, 3))
        px = px.astype(np.uint8)
        out = _read_pixels(header(b"P6", 7, 5, 255) + px.tobytes())
        np.testing.assert_array_equal(out, px)

    def test_p6_16bit_big_endian(self):
        px16 = np.random.default_rng(2).integers(0, 65536, (4, 6, 3))
        px16 = px16.astype(np.uint16)
        payload = header(b"P6", 6, 4, 65535) + px16.astype(">u2").tobytes()
        assert parse_image_header(payload) == ("ppm", 6, 4, 3)
        out = _read_pixels(payload)
        expect = np.round(px16.astype(np.float64) * 255.0 / 65535.0)
        np.testing.assert_array_equal(out, expect.astype(np.uint8))

    def test_p6_16bit_not_misread_as_8bit(self):
        # the regression this exists for: a 16-bit PPM must NOT decode
        # as if its first half were 8-bit rows
        px16 = np.full((4, 4, 3), 0x0102, np.uint16)
        payload = header(b"P6", 4, 4, 65535) + px16.astype(">u2").tobytes()
        out = _read_pixels(payload)
        assert out is not None and out.shape == (4, 4, 3)
        # 0x0102 / 65535 * 255 = 1.004... -> 1, never the raw bytes 1,2
        assert set(np.unique(out)) == {1}

    def test_p6_low_maxval_scales(self):
        # maxval 15: sample 15 must map to 255, 7 to round(7*17)=119
        data = bytes([15, 7, 0] * 4)
        out = _read_pixels(header(b"P6", 2, 2, 15) + data)
        assert out[0, 0, 0] == 255 and out[0, 0, 1] == 119
        assert out[0, 0, 2] == 0

    def test_p5_gray_replicates(self):
        g = np.arange(12, dtype=np.uint8).reshape(3, 4)
        out = _read_pixels(header(b"P5", 4, 3, 255, comment=True) + g.tobytes())
        for c in range(3):
            np.testing.assert_array_equal(out[:, :, c], g)

    def test_p5_16bit(self):
        g16 = np.array([[0, 32768, 65535]], np.uint16)
        out = _read_pixels(header(b"P5", 3, 1, 65535) + g16.astype(">u2").tobytes())
        np.testing.assert_array_equal(out[0, :, 0], [0, 128, 255])

    def test_p4_bitmap_one_is_black_row_padded(self):
        # 10 px wide: rows pad to 2 bytes; bit 1 = black (0), 0 = white
        rows = np.zeros((2, 10), np.uint8)
        rows[0, 0] = 1
        rows[1, 9] = 1
        data = np.packbits(rows, axis=1).tobytes()
        payload = header(b"P4", 10, 2) + data
        assert parse_image_header(payload) == ("pbm", 10, 2, 1)
        out = _read_pixels(payload)
        assert out.shape == (2, 10, 3)
        assert out[0, 0, 0] == 0 and out[0, 1, 0] == 255
        assert out[1, 9, 0] == 0 and out[1, 8, 0] == 255

    @pytest.mark.parametrize("bad", [
        header(b"P6", 4, 4, 0) + bytes(48),        # maxval 0
        header(b"P6", 4, 4, 70000) + bytes(200),   # maxval > 16 bit
        header(b"P6", 4, 4, 255) + bytes(10),      # truncated data
        header(b"P5", 4, 4, 255) + bytes(3),       # truncated gray
        header(b"P4", 16, 4) + bytes(3),           # truncated bitmap
        b"P6\nnot numbers\n",                      # garbage header
        header(b"P6", 1 << 14, 1 << 14, 255),      # absurd dims cap
    ])
    def test_rejects_never_raises(self, bad):
        assert _read_pixels(bad) is None

    def test_fuzz_never_raises(self):
        g = np.random.default_rng(9)
        base = bytearray(
            header(b"P5", 8, 8, 65535)
            + np.zeros(128, np.uint8).tobytes()
        )
        for _ in range(200):
            buf = bytearray(base)
            for _ in range(int(g.integers(1, 5))):
                buf[int(g.integers(0, len(buf)))] = int(g.integers(0, 256))
            out = _read_pixels(bytes(buf))
            assert out is None or out.dtype == np.uint8
