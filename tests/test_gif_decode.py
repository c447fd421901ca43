"""GIF decode (operators/multimodal.gif_frames) against an INDEPENDENT
minimal encoder written here — its own LZW compressor (hash-table
string matching, LSB-first bit packing, explicit CLEAR/END), interlace
row extraction, and animation blocks — so the lossless round trip is a
real two-sided check of the LZW, interlace, palette, transparency, and
compositing logic."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.multimodal import (
    _read_pixels,
    gif_frames,
    gif_pixels,
    parse_image_header,
)

GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, width):
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0


def lzw_compress(indices, min_code_size):
    """GIF-flavored LZW: emits CLEAR up front, grows code width at
    dictionary-size boundaries, resets at 4096, ends with END."""
    clear = 1 << min_code_size
    end = clear + 1
    w = _LsbWriter()
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    w.put(clear, width)
    cur = b""
    for v in indices:
        nxt = cur + bytes([int(v)])
        if nxt in table:
            cur = nxt
            continue
        w.put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            w.put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([int(v)])
    if cur:
        w.put(table[cur], width)
    w.put(end, width)
    w.flush()
    return bytes(w.out)


def _subblocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames,
    palette,
    bg_index=0,
    interlace=False,
    offsets=None,
    transparent=None,
    disposals=None,
):
    """frames: list of 2-D index arrays (may be smaller than the canvas
    when offsets are given — the canvas is the first frame's size unless
    all offsets fit); palette: (n, 3) uint8."""
    n_colors = len(palette)
    depth = max(2, (n_colors - 1).bit_length())
    h, w = frames[0].shape
    if offsets is None:
        offsets = [(0, 0)] * len(frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), bg_index, 0])
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += b"\x00" * (3 * ((1 << depth) - n_colors))
    out += pal
    for fi, frame in enumerate(frames):
        fh, fw = frame.shape
        fx, fy = offsets[fi]
        disp = (disposals or [0] * len(frames))[fi]
        if transparent is not None or disp:
            packed = (disp << 2) | (1 if transparent is not None else 0)
            out += bytes([0x21, 0xF9, 4, packed, 0, 0, transparent or 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", fx, fy, fw, fh)
        out += bytes([0x40 if interlace else 0])
        if interlace:
            rows = []
            for start, step in GIF_INTERLACE:
                rows.extend(range(start, fh, step))
            data = np.concatenate([frame[r] for r in rows]).reshape(-1)
        else:
            data = frame.reshape(-1)
        mcs = max(2, depth)
        out += bytes([mcs]) + _subblocks(lzw_compress(data, mcs))
    out += b"\x3B"
    return bytes(out)


PAL8 = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
     [255, 255, 0], [0, 255, 255], [255, 0, 255], [200, 200, 200]],
    np.uint8,
)


def _rand_idx(h, w, n, seed):
    return np.random.default_rng(seed).integers(0, n, (h, w)).astype(np.uint8)


class TestGifDecode:
    def test_single_frame_exact(self):
        idx = _rand_idx(17, 23, 8, 1)
        frames = gif_frames(encode_gif([idx], PAL8))
        assert frames is not None and len(frames) == 1
        assert np.array_equal(frames[0], PAL8[idx])

    def test_interlaced_exact(self):
        idx = _rand_idx(19, 11, 8, 2)
        frames = gif_frames(encode_gif([idx], PAL8, interlace=True))
        assert np.array_equal(frames[0], PAL8[idx])

    def test_large_palette_code_width_growth(self):
        # 256-color palette forces 9..12-bit LZW codes
        pal = np.arange(256 * 3, dtype=np.uint8).reshape(256, 3) % 256
        idx = _rand_idx(40, 40, 256, 3)
        frames = gif_frames(encode_gif([idx], pal))
        assert np.array_equal(frames[0], pal[idx])

    def test_dictionary_reset_path(self):
        # high-entropy 64x64 at 256 colors overflows 4096 codes -> CLEAR
        pal = np.arange(256 * 3, dtype=np.uint8).reshape(256, 3) % 256
        idx = _rand_idx(64, 64, 256, 4)
        frames = gif_frames(encode_gif([idx], pal))
        assert np.array_equal(frames[0], pal[idx])

    def test_animation_compositing_offsets_transparency(self):
        base = np.full((16, 16), 7, np.uint8)  # gray canvas
        patch = np.full((4, 6), 1, np.uint8)  # red overlay
        patch[1:3, 2:4] = 3  # blue hole... actually color 3
        over = patch.copy()
        over[0, 0] = 0  # transparent pixel (index 0 declared transparent)
        payload = encode_gif(
            [base, over],
            PAL8,
            offsets=[(0, 0), (5, 8)],
            transparent=0,
        )
        frames = gif_frames(payload)
        assert len(frames) == 2
        assert np.array_equal(frames[0], PAL8[base])
        want = PAL8[base].copy()
        region = PAL8[over]
        mask = (over != 0)[:, :, None]
        want[8:12, 5:11] = np.where(mask, region, want[8:12, 5:11])
        assert np.array_equal(frames[1], want)

    def test_disposal_background_restore(self):
        base = np.full((8, 8), 2, np.uint8)
        dot = np.full((2, 2), 1, np.uint8)
        payload = encode_gif(
            [base, dot, dot],
            PAL8,
            bg_index=0,
            offsets=[(0, 0), (1, 1), (5, 5)],
            disposals=[0, 2, 0],
        )
        frames = gif_frames(payload)
        assert len(frames) == 3
        # frame 2's dot region was restored to BACKGROUND (black), so
        # frame 3 shows black where frame 2's dot was
        assert np.array_equal(frames[2][1:3, 1:3], np.zeros((2, 2, 3)))
        assert np.array_equal(frames[2][5:7, 5:7], PAL8[dot])

    def test_header_and_read_pixels_route(self):
        idx = _rand_idx(9, 13, 8, 5)
        payload = encode_gif([idx], PAL8)
        assert parse_image_header(payload) == ("gif", 13, 9, 3)
        assert np.array_equal(_read_pixels(payload), PAL8[idx])
        assert np.array_equal(gif_pixels(payload), PAL8[idx])

    def test_corrupt_rejected(self):
        idx = _rand_idx(8, 8, 8, 6)
        payload = encode_gif([idx], PAL8)
        assert gif_frames(payload[: len(payload) // 2]) is None
        assert gif_frames(b"GIF87a\x00") is None
        assert gif_frames(b"nope") is None
        assert gif_frames(None) is None

    def test_fuzz_never_raises(self):
        rng = np.random.default_rng(77)
        idx = _rand_idx(12, 12, 8, 7)
        payload = bytearray(encode_gif([idx, idx], PAL8, transparent=0))
        for _ in range(200):
            p = bytearray(payload)
            pos = int(rng.integers(0, len(p)))
            p[pos] = int(rng.integers(0, 256))
            out = gif_frames(bytes(p))
            assert out is None or all(f.ndim == 3 for f in out)

    def test_sample_video_frames_gif(self, spark):
        from fluent_plugin_sql_spark.operators.multimodal import (
            sample_video_frames,
        )

        fills = [1, 2, 3, 4, 5]
        frames = [np.full((6, 10), v, np.uint8) for v in fills]
        payload = encode_gif(frames, PAL8)
        df = spark.createDataFrame(
            [(9, payload)], "doc_id long, payload binary"
        )
        rows = sorted(
            sample_video_frames(df, every_k=2, max_frames=3, strict=True)
            .collect(),
            key=lambda r: r["frame_idx"],
        )
        assert [r["frame_idx"] for r in rows] == [0, 2, 4]
        assert all(r["n_frames"] == 5 for r in rows)
        assert all((r["width"], r["height"]) == (10, 6) for r in rows)
        for r, v in zip(rows, (fills[0], fills[2], fills[4])):
            want = PAL8[v].mean()
            assert abs(r["brightness"] - want) < 1e-6

    def test_huge_claimed_dims_rejected_before_allocation(self):
        """A 14-byte corrupt header claiming 65535x65535 must return
        None, not allocate a 12 GiB canvas."""
        bad = b"GIF89a" + struct.pack("<HH", 65535, 65535) + b"\x00\x00\x00"
        assert gif_frames(bad) is None
        assert gif_pixels(bad) is None
