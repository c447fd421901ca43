"""Pure-stdlib PNG pixel decode (operators/multimodal.png_pixels).

The fixtures are built by an INDEPENDENT encoder implemented here: it
applies the PNG spec's five filter types on the encode side (the decoder
implements the inverse), so a round-trip equality is a real two-sided
check of the unfiltering math, not a mirror of the decoder's own code.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.multimodal import (
    _read_pixels,
    png_pixels,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def encode_png(px: np.ndarray, color_type: int, filters: list[int],
               plte: np.ndarray | None = None) -> bytes:
    """Minimal spec-correct encoder: px is (h, w, channels) uint8 where
    channels matches the color type (1/3/1/2/4 for types 0/2/3/4/6);
    ``filters[y]`` picks the filter applied to row y."""
    h, w, c = px.shape
    bpp = c
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    flat = px.reshape(h, w * c).astype(np.int16)
    prev = np.zeros(w * c, np.int16)
    for y in range(h):
        row = flat[y]
        f = filters[y]
        left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]]) if w * c > bpp else np.zeros_like(row)
        upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]]) if w * c > bpp else np.zeros_like(row)
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            filt = (row - left) % 256
        elif f == 2:  # Up
            filt = (row - prev) % 256
        elif f == 3:  # Average
            filt = (row - ((left + prev) >> 1)) % 256
        elif f == 4:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (row - pred) % 256
        else:
            raise ValueError(f)
        raw.append(f)
        raw.extend(int(v) & 0xFF for v in filt)
        prev = row
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    # split IDAT in two chunks to exercise the concat path
    comp = zlib.compress(bytes(raw))
    mid = len(comp) // 2
    out += _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
    out += _chunk(b"IEND", b"")
    return out


def _rand(h, w, c, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


class TestPngPixels:
    def test_rgb_all_filter_types_round_trip(self):
        px = _rand(5, 7, 3, 1)
        payload = encode_png(px, 2, [0, 1, 2, 3, 4])
        got = png_pixels(payload)
        assert got is not None and got.shape == (5, 7, 3)
        np.testing.assert_array_equal(got, px)

    def test_rgba_drops_alpha(self):
        px = _rand(4, 3, 4, 2)
        got = png_pixels(encode_png(px, 6, [4, 3, 2, 1]))
        np.testing.assert_array_equal(got, px[:, :, :3])

    def test_gray_replicates_to_rgb(self):
        px = _rand(3, 4, 1, 3)
        got = png_pixels(encode_png(px, 0, [0, 1, 4]))
        np.testing.assert_array_equal(got, np.repeat(px, 3, axis=2))

    def test_gray_alpha(self):
        px = _rand(2, 5, 2, 4)
        got = png_pixels(encode_png(px, 4, [2, 4]))
        np.testing.assert_array_equal(got, np.repeat(px[:, :, :1], 3, axis=2))

    def test_palette_resolves_plte(self):
        plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        idx = np.array([[0, 1], [2, 0]], np.uint8)[:, :, None]
        got = png_pixels(encode_png(idx, 3, [0, 0], plte=plte))
        np.testing.assert_array_equal(got, plte[idx[:, :, 0]])

    def test_read_pixels_dispatches_png(self):
        px = _rand(2, 2, 3, 5)
        got = _read_pixels(encode_png(px, 2, [0, 0]))
        np.testing.assert_array_equal(got, px)

    def test_out_of_scope_and_corrupt_return_none(self):
        px = _rand(2, 2, 3, 6)
        good = encode_png(px, 2, [0, 0])
        assert png_pixels(good[:40]) is None  # truncated mid-chunk
        assert png_pixels(b"\x89PNG\r\n\x1a\n") is None  # no chunks
        assert png_pixels(None) is None
        # 16-bit depth: patch IHDR bit-depth byte (offset 24) and refuse
        deep = bytearray(good)
        deep[24] = 16
        assert png_pixels(bytes(deep)) is None
        # interlaced: IHDR interlace byte (offset 28)
        adam7 = bytearray(good)
        adam7[28] = 1
        assert png_pixels(bytes(adam7)) is None
        # palette index past PLTE = corrupt
        plte = np.array([[1, 2, 3]], np.uint8)
        bad_idx = np.array([[5]], np.uint8)[:, :, None]
        assert png_pixels(encode_png(bad_idx, 3, [0], plte=plte)) is None

    def test_strict_pixel_features_pass_on_png(self, spark):
        """The SURVEY §8 gap this closes: strict-mode pixel features on a
        PNG payload now succeed instead of strict-raising."""
        from fluent_plugin_sql_spark.operators.multimodal import (
            extract_pixel_features,
            resize_images,
        )

        px = _rand(8, 6, 3, 7)
        payload = encode_png(px, 2, [0, 1, 2, 3, 4, 0, 1, 2])
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id long, payload binary"
        )
        row = extract_pixel_features(df, strict=True).collect()[0]
        assert row["width"] == 6 and row["height"] == 8
        exp = px.reshape(-1, 3).mean(axis=0)
        got = np.array(row["channel_means"])
        np.testing.assert_allclose(got, exp, rtol=1e-9)

        res = resize_images(df, 3, 4, strict=True).collect()[0]
        assert (res["width"], res["height"]) == (3, 4)
        # resized payload is canonical PPM of nearest-neighbor picks
        yi, xi = (np.arange(4) * 8) // 4, (np.arange(3) * 6) // 3
        exp_px = px[yi][:, xi]
        body = bytes(res["payload"]).split(b"255\n", 1)[1]
        np.testing.assert_array_equal(
            np.frombuffer(body, np.uint8).reshape(4, 3, 3), exp_px
        )

    def test_jpeg_still_strict_raises(self, spark):
        from fluent_plugin_sql_spark.operators.multimodal import (
            extract_pixel_features,
        )

        jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 32  # SOI + APP0 fragment
        df = spark.createDataFrame(
            [(1, jpeg)], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match="codec"):
            extract_pixel_features(df, strict=True).collect()


# ---- extended matrix: bit depths 1/2/4/16 and Adam7 interlace ----

ADAM7 = (
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
)


def _pack_rows(samples, bit_depth):
    """(h, w, c) sample values -> list of packed per-row byte arrays."""
    h, w, c = samples.shape
    if bit_depth == 8:
        return [samples[y].reshape(-1).astype(np.uint8) for y in range(h)]
    if bit_depth == 16:
        flat = samples.reshape(h, w * c).astype(">u2")
        return [np.frombuffer(flat[y].tobytes(), np.uint8) for y in range(h)]
    rows = []
    for y in range(h):
        vals = samples[y].reshape(-1).astype(np.uint8)
        bits = (
            (vals[:, None] >> np.arange(bit_depth - 1, -1, -1)) & 1
        ).reshape(-1).astype(np.uint8)
        rows.append(np.packbits(bits))
    return rows


def _filter_row(row, prev, bpp, f):
    r = row.astype(np.int16)
    p = prev.astype(np.int16)
    left = np.concatenate([np.zeros(bpp, np.int16), r[:-bpp]]) if len(r) > bpp else np.zeros_like(r)
    upleft = np.concatenate([np.zeros(bpp, np.int16), p[:-bpp]]) if len(r) > bpp else np.zeros_like(r)
    if f == 0:
        out = r
    elif f == 1:
        out = (r - left) % 256
    elif f == 2:
        out = (r - p) % 256
    elif f == 3:
        out = (r - ((left + p) >> 1)) % 256
    else:
        pr = left + p - upleft
        pa, pb, pc = np.abs(pr - left), np.abs(pr - p), np.abs(pr - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, upleft))
        out = (r - pred) % 256
    return out.astype(np.uint8)


def encode_png_ex(samples, color_type, bit_depth, interlace=0, plte=None):
    """Independent encoder over the full fixed matrix: samples is
    (h, w, c) with values in the sample range for the depth; rows are
    filtered with a 0..4 cycling filter chain, per Adam7 pass when
    interlaced."""
    h, w, c = samples.shape
    bpp = max(1, c * bit_depth // 8)

    def filtered(sub):
        raw = bytearray()
        rows = _pack_rows(sub, bit_depth)
        prev = np.zeros(len(rows[0]) if rows else 0, np.uint8)
        for y, row in enumerate(rows):
            f = y % 5
            raw.append(f)
            raw.extend(_filter_row(row, prev, bpp, f).tobytes())
            prev = row
        return raw

    raw = bytearray()
    if interlace == 0:
        raw = filtered(samples)
    else:
        for xs, xstep, ys, ystep in ADAM7:
            sub = samples[ys::ystep, xs::xstep]
            if sub.shape[0] and sub.shape[1]:
                raw += filtered(sub)
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    comp = zlib.compress(bytes(raw))
    out += _chunk(b"IDAT", comp) + _chunk(b"IEND", b"")
    return out


class TestPngExtendedMatrix:
    def test_16bit_rgb_high_byte(self):
        rng = np.random.default_rng(3)
        hi = rng.integers(0, 256, (9, 7, 3))
        samples = hi * 257  # low byte == high byte -> exact
        arr = png_pixels(encode_png_ex(samples, 2, 16))
        assert np.array_equal(arr, hi.astype(np.uint8))

    def test_16bit_gray_random(self):
        rng = np.random.default_rng(5)
        samples = rng.integers(0, 65536, (12, 5, 1))
        arr = png_pixels(encode_png_ex(samples, 0, 16))
        want = (samples[:, :, 0] >> 8).astype(np.uint8)
        assert np.array_equal(arr[:, :, 0], want)
        assert np.array_equal(arr[:, :, 0], arr[:, :, 2])

    def test_4bit_gray_scales_to_255(self):
        samples = (np.arange(16).reshape(2, 8) % 16)[:, :, None]
        arr = png_pixels(encode_png_ex(samples, 0, 4))
        assert np.array_equal(arr[:, :, 0], (samples[:, :, 0] * 17).astype(np.uint8))

    def test_1bit_checkerboard(self):
        samples = ((np.indices((10, 11)).sum(axis=0)) % 2)[:, :, None]
        arr = png_pixels(encode_png_ex(samples, 0, 1))
        assert set(np.unique(arr)) == {0, 255}
        assert arr[0, 0, 0] == 0 and arr[0, 1, 0] == 255

    def test_2bit_palette(self):
        plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]])
        samples = (np.arange(28).reshape(4, 7) % 4)[:, :, None]
        arr = png_pixels(encode_png_ex(samples, 3, 2, plte=plte))
        assert np.array_equal(arr, plte[samples[:, :, 0]])

    def test_adam7_rgb_exact(self):
        rng = np.random.default_rng(11)
        samples = rng.integers(0, 256, (21, 17, 3))
        arr = png_pixels(encode_png_ex(samples, 2, 8, interlace=1))
        assert np.array_equal(arr, samples.astype(np.uint8))

    @pytest.mark.parametrize("h,w", [(1, 1), (2, 2), (3, 3), (5, 7), (8, 8), (9, 16)])
    def test_adam7_small_dims_empty_passes(self, h, w):
        rng = np.random.default_rng(h * 100 + w)
        samples = rng.integers(0, 256, (h, w, 3))
        arr = png_pixels(encode_png_ex(samples, 2, 8, interlace=1))
        assert arr is not None and np.array_equal(arr, samples.astype(np.uint8))

    def test_adam7_4bit_palette(self):
        plte = np.arange(48).reshape(16, 3)
        rng = np.random.default_rng(7)
        samples = rng.integers(0, 16, (13, 9, 1))
        arr = png_pixels(encode_png_ex(samples, 3, 4, interlace=1, plte=plte))
        assert np.array_equal(arr, plte[samples[:, :, 0]].astype(np.uint8))

    def test_adam7_16bit_gray(self):
        rng = np.random.default_rng(13)
        samples = rng.integers(0, 65536, (10, 10, 1))
        arr = png_pixels(encode_png_ex(samples, 0, 16, interlace=1))
        assert np.array_equal(arr[:, :, 0], (samples[:, :, 0] >> 8).astype(np.uint8))

    def test_invalid_combinations_rejected(self):
        samples = np.zeros((4, 4, 1), int)
        p = bytearray(encode_png_ex(samples, 0, 8))
        p[24] = 3  # depth byte -> illegal depth 3
        assert png_pixels(bytes(p)) is None
        p = bytearray(encode_png_ex(samples, 0, 8))
        p[28] = 2  # interlace byte -> unknown method
        assert png_pixels(bytes(p)) is None


def test_huge_claimed_dims_rejected_before_allocation():
    """A corrupt IHDR claiming ~16-billion-pixel Adam7 dims must fail
    the expected-size check before the output array is allocated."""
    samples = np.zeros((4, 4, 3), int)
    p = bytearray(encode_png_ex(samples, 2, 8, interlace=1))
    p[16:24] = struct.pack(">II", 0xFFFFF, 0xFFFFF)
    assert png_pixels(bytes(p)) is None


def test_fuzz_byte_mutations_never_raise():
    rng = np.random.default_rng(99)
    samples = rng.integers(0, 256, (12, 12, 3))
    for interlace in (0, 1):
        payload = bytearray(encode_png_ex(samples, 2, 8, interlace=interlace))
        for _ in range(150):
            p = bytearray(payload)
            pos = int(rng.integers(0, len(p)))
            p[pos] = int(rng.integers(0, 256))
            out = png_pixels(bytes(p))
            assert out is None or out.ndim == 3


def test_decompression_bomb_capped():
    """IDAT inflating far beyond what the declared dims consume: the
    inflate is capped at the expected scanline size, so the valid
    prefix decodes and the bomb tail is never allocated."""
    samples = np.arange(4 * 4 * 3).reshape(4, 4, 3) % 256
    good = encode_png_ex(samples, 2, 8)
    # rebuild with the same scanlines + 512 MiB of zeros in ONE stream
    rows = bytearray()
    for y in range(4):
        rows.append(0)
        rows += bytes(samples[y].astype(np.uint8).reshape(-1))
    bomb_raw = bytes(rows) + b"\x00" * (512 << 20)
    comp = zlib.compress(bomb_raw, 9)
    assert len(comp) < 2 << 20  # the bomb compresses tiny
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", comp)
        + _chunk(b"IEND", b"")
    )
    arr = png_pixels(payload)
    assert arr is not None and np.array_equal(arr, png_pixels(good))
