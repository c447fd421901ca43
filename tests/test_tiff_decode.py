"""TIFF decode (operators/multimodal.tiff_pixels) against an
INDEPENDENT writer implemented here — its own IFD layout, strip
splitting, and PackBits compressor — covering both byte orders, gray /
RGB / palette / 1-bit bilevel, WhiteIsZero inversion, multi-strip
assembly, and RLE."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.multimodal import (
    _read_pixels,
    parse_image_header,
    tiff_pixels,
)


class _MsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, width):
        self.acc = (self.acc << width) | code
        self.n += width
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = 0
            self.n = 0


def tiff_lzw_encode(data: bytes) -> bytes:
    """Independent TIFF LZW (spec §13): MSB-first, CLEAR=256/EOI=257,
    EARLY CHANGE — width bumps when the NEXT code to assign is
    (1<<width)-1, one entry before overflow — and a table reset at
    4094 entries."""
    CLEAR, EOI = 256, 257
    w = _MsbWriter()
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    w.put(CLEAR, width)
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        w.put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # stay in phase with the early-change decoder: IT bumps after
        # its own (one-behind) insertion reaches 2^w - 1, which from
        # the encoder's (one-ahead) counter is next_code == 2^w
        if next_code >= (1 << width) and width < 12:
            width += 1
        elif next_code >= 4094:
            w.put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        w.put(table[cur], width)
    w.put(EOI, width)
    w.flush()
    return bytes(w.out)


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs of >=3 identical bytes become repeats."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal stretch until the next long run
        j = i
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def encode_tiff(
    px,
    endian="<",
    photometric=None,
    palette=None,
    bits=8,
    rows_per_strip=None,
    packbits=False,
    lzw=False,
    deflate=False,
    predictor=1,
    orientation=None,
):
    """px: (h, w) gray/palette-index/bilevel or (h, w, 3) RGB."""
    import zlib

    h, w = px.shape[:2]
    spp = 3 if px.ndim == 3 else 1
    if photometric is None:
        photometric = 2 if spp == 3 else 1
    rows_per_strip = rows_per_strip or h
    if predictor == 2:
        # horizontal differencing (tag 317): per-row per-channel left
        # deltas mod 256, computed from the ORIGINAL neighbors
        assert bits == 8
        d = px.reshape(h, w, spp).astype(np.int16)
        out = d.copy()
        out[:, 1:] = d[:, 1:] - d[:, :-1]
        px = (out % 256).astype(np.uint8).reshape(px.shape)
    if bits == 1:
        rows = [np.packbits(px[y].astype(np.uint8)).tobytes() for y in range(h)]
    elif bits == 16:
        dt = np.dtype(np.uint16).newbyteorder(endian)
        rows = [px[y].astype(dt).tobytes() for y in range(h)]
    else:
        rows = [px[y].astype(np.uint8).tobytes() for y in range(h)]
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = b"".join(rows[y0 : y0 + rows_per_strip])
        if lzw:
            strips.append(tiff_lzw_encode(raw))
        elif packbits:
            strips.append(packbits_encode(raw))
        elif deflate:
            strips.append(zlib.compress(raw))
        else:
            strips.append(raw)

    # layout: header(8) | strip data | IFD | out-of-line values
    header = struct.pack(endian + "HH", 0x4949 if endian == "<" else 0x4D4D, 42)
    if endian == ">":
        header = b"MM" + struct.pack(">H", 42)
    else:
        header = b"II" + struct.pack("<H", 42)
    data_start = 8
    offsets = []
    pos = data_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    ifd_off = pos + (pos % 2)
    header += struct.pack(endian + "I", ifd_off)

    entries = []
    extra = bytearray()
    extra_base = None  # filled after entry count known

    def entry(tag, typ, values):
        entries.append((tag, typ, values))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [bits] * spp)
    entry(
        259,
        3,
        [5 if lzw else (32773 if packbits else (8 if deflate else 1))],
    )
    if predictor != 1:
        entry(317, 3, [predictor])
    entry(262, 3, [photometric])
    if orientation is not None:
        entry(274, 3, [orientation])
    entry(273, 4, offsets)
    entry(277, 3, [spp])
    entry(278, 4, [rows_per_strip])
    entry(279, 4, [len(s) for s in strips])
    if palette is not None:
        cmap = []
        for ch in range(3):  # all R, then all G, then all B — 16-bit
            col = [0] * 256
            for i, c in enumerate(palette):
                col[i] = int(c[ch]) << 8
            cmap += col
        entry(320, 3, cmap)
    entries.sort()

    n_entries = len(entries)
    extra_base = ifd_off + 2 + 12 * n_entries + 4
    ifd = struct.pack(endian + "H", n_entries)
    tsize = {3: 2, 4: 4}
    tcode = {3: "H", 4: "I"}
    for tag, typ, values in entries:
        total = tsize[typ] * len(values)
        if total <= 4:
            packed = struct.pack(endian + str(len(values)) + tcode[typ], *values)
            packed += b"\x00" * (4 - total)
            ifd += struct.pack(endian + "HHI", tag, typ, len(values)) + packed
        else:
            ifd += struct.pack(
                endian + "HHII", tag, typ, len(values), extra_base + len(extra)
            )
            extra += struct.pack(endian + str(len(values)) + tcode[typ], *values)
    ifd += struct.pack(endian + "I", 0)  # no next IFD

    body = bytearray(header)
    for s in strips:
        body += s
    body += b"\x00" * (ifd_off - len(body))
    body += ifd
    body += extra
    return bytes(body)


def _rng(seed):
    return np.random.default_rng(seed)


class TestTiffDecode:
    @pytest.mark.parametrize("endian", ["<", ">"])
    def test_rgb_both_endians(self, endian):
        img = _rng(1).integers(0, 256, (13, 17, 3)).astype(np.uint8)
        arr = tiff_pixels(encode_tiff(img, endian=endian))
        assert np.array_equal(arr, img)

    def test_gray_replicates(self):
        img = _rng(2).integers(0, 256, (9, 9)).astype(np.uint8)
        arr = tiff_pixels(encode_tiff(img))
        assert np.array_equal(arr[:, :, 0], img)
        assert np.array_equal(arr[:, :, 0], arr[:, :, 2])

    def test_white_is_zero_inverts(self):
        img = _rng(3).integers(0, 256, (6, 8)).astype(np.uint8)
        arr = tiff_pixels(encode_tiff(img, photometric=0))
        assert np.array_equal(arr[:, :, 0], 255 - img)

    def test_bilevel_scan(self):
        img = (_rng(4).integers(0, 2, (21, 30))).astype(np.uint8)
        arr = tiff_pixels(encode_tiff(img, bits=1, photometric=1))
        assert np.array_equal(arr[:, :, 0], img * 255)
        # WhiteIsZero bilevel (the fax/scan default): 0 = white
        arr0 = tiff_pixels(encode_tiff(img, bits=1, photometric=0))
        assert np.array_equal(arr0[:, :, 0], 255 - img * 255)

    def test_palette(self):
        pal = _rng(5).integers(0, 256, (16, 3)).astype(np.uint8)
        idx = _rng(6).integers(0, 16, (7, 11)).astype(np.uint8)
        arr = tiff_pixels(encode_tiff(idx, photometric=3, palette=pal))
        assert np.array_equal(arr, pal[idx])

    def test_multi_strip(self):
        img = _rng(7).integers(0, 256, (23, 10, 3)).astype(np.uint8)
        arr = tiff_pixels(encode_tiff(img, rows_per_strip=4))
        assert np.array_equal(arr, img)

    def test_packbits_rle(self):
        # flat regions compress well; random tail exercises literals
        img = np.full((20, 16), 200, np.uint8)
        img[15:] = _rng(8).integers(0, 256, (5, 16)).astype(np.uint8)
        payload = encode_tiff(img, packbits=True, rows_per_strip=6)
        raw = encode_tiff(img, rows_per_strip=6)
        assert len(payload) < len(raw)  # RLE actually engaged
        assert np.array_equal(tiff_pixels(payload), tiff_pixels(raw))

    def test_packbits_bilevel_multistrip_bigendian(self):
        img = (_rng(9).integers(0, 2, (33, 25))).astype(np.uint8)
        payload = encode_tiff(
            img, endian=">", bits=1, photometric=0,
            rows_per_strip=7, packbits=True,
        )
        arr = tiff_pixels(payload)
        assert np.array_equal(arr[:, :, 0], 255 - img * 255)

    def test_header_parse_and_routing(self):
        img = _rng(10).integers(0, 256, (5, 12, 3)).astype(np.uint8)
        payload = encode_tiff(img, endian=">")
        assert parse_image_header(payload) == ("tiff", 12, 5, 3)
        assert np.array_equal(_read_pixels(payload), img)

    def test_corrupt_and_unsupported_rejected(self):
        img = _rng(11).integers(0, 256, (6, 6)).astype(np.uint8)
        payload = bytearray(encode_tiff(img))
        assert tiff_pixels(bytes(payload[: len(payload) // 2])) is None
        assert tiff_pixels(b"II*\x00\xff\xff\xff\xff") is None
        assert tiff_pixels(None) is None
        # claimed JPEG-in-TIFF compression -> None (tag 259 patch)
        jpg = bytearray(encode_tiff(img))
        i = jpg.find(struct.pack("<HH", 259, 3))
        jpg[i + 8] = 7  # compression = JPEG
        assert tiff_pixels(bytes(jpg)) is None
        # claimed LZW over non-LZW bytes -> None, not an exception
        lzw = bytearray(encode_tiff(img))
        lzw[i + 8] = 5
        assert tiff_pixels(bytes(lzw)) is None

    def test_fuzz_never_raises(self):
        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, (10, 10, 3)).astype(np.uint8)
        payload = bytearray(encode_tiff(img, packbits=True))
        for _ in range(200):
            p = bytearray(payload)
            pos = int(rng.integers(0, len(p)))
            p[pos] = int(rng.integers(0, 256))
            out = tiff_pixels(bytes(p))
            assert out is None or out.ndim == 3


class TestTiffLzw:
    def test_lzw_rgb_roundtrip(self):
        img = _rng(20).integers(0, 256, (18, 14, 3)).astype(np.uint8)
        payload = encode_tiff(img, lzw=True)
        assert np.array_equal(tiff_pixels(payload), img)

    def test_lzw_width_growth_and_reset(self):
        # high-entropy data forces 10/11/12-bit codes and a table reset
        img = _rng(21).integers(0, 256, (80, 80)).astype(np.uint8)
        payload = encode_tiff(img, lzw=True)
        arr = tiff_pixels(payload)
        assert np.array_equal(arr[:, :, 0], img)

    def test_lzw_compresses_flat_regions(self):
        img = np.full((64, 64), 130, np.uint8)
        payload = encode_tiff(img, lzw=True)
        raw = encode_tiff(img)
        assert len(payload) < len(raw) // 4
        assert np.array_equal(tiff_pixels(payload)[:, :, 0], img)

    def test_lzw_multistrip_bigendian_palette(self):
        pal = _rng(22).integers(0, 256, (16, 3)).astype(np.uint8)
        idx = _rng(23).integers(0, 16, (29, 13)).astype(np.uint8)
        payload = encode_tiff(
            idx, endian=">", photometric=3, palette=pal,
            rows_per_strip=5, lzw=True,
        )
        assert np.array_equal(tiff_pixels(payload), pal[idx])

    def test_lzw_fuzz_never_raises(self):
        rng = np.random.default_rng(24)
        img = rng.integers(0, 256, (12, 12, 3)).astype(np.uint8)
        payload = bytearray(encode_tiff(img, lzw=True))
        for _ in range(200):
            p = bytearray(payload)
            pos = int(rng.integers(0, len(p)))
            p[pos] = int(rng.integers(0, 256))
            out = tiff_pixels(bytes(p))
            assert out is None or out.ndim == 3


def encode_tiff_tiled(
    px, tw, th, endian="<", lzw=False, packbits=False, deflate=False,
    predictor=1,
):
    """Tiled-layout writer: raster-scanned (th, tw) tiles, edge tiles
    edge-padded to full size."""
    import zlib

    h, w = px.shape[:2]
    spp = 3 if px.ndim == 3 else 1
    tiles_x, tiles_y = -(-w // tw), -(-h // th)
    padded = np.pad(
        px.reshape(h, w, spp),
        ((0, tiles_y * th - h), (0, tiles_x * tw - w), (0, 0)),
        mode="edge",
    )
    tiles = []
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            t = padded[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            if predictor == 2:
                # per-tile rows: deltas reset at each tile row
                d = t.astype(np.int16)
                o = d.copy()
                o[:, 1:] = d[:, 1:] - d[:, :-1]
                t = (o % 256).astype(np.uint8)
            raw = t.astype(np.uint8).tobytes()
            if lzw:
                raw = tiff_lzw_encode(raw)
            elif packbits:
                raw = packbits_encode(raw)
            elif deflate:
                raw = zlib.compress(raw)
            tiles.append(raw)

    header = (b"II" + struct.pack("<H", 42)) if endian == "<" else (
        b"MM" + struct.pack(">H", 42)
    )
    pos = 8
    offsets = []
    for t in tiles:
        offsets.append(pos)
        pos += len(t)
    ifd_off = pos + (pos % 2)
    header += struct.pack(endian + "I", ifd_off)

    entries = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8] * spp),
        (259, 3, [5 if lzw else (32773 if packbits else (8 if deflate else 1))]),
        (262, 3, [2 if spp == 3 else 1]), (277, 3, [spp]),
        (322, 4, [tw]), (323, 4, [th]),
        (324, 4, offsets), (325, 4, [len(t) for t in tiles]),
    ]
    if predictor != 1:
        entries.append((317, 3, [predictor]))
    entries.sort()
    extra = bytearray()
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    ifd = struct.pack(endian + "H", len(entries))
    tsize = {3: 2, 4: 4}
    tcode = {3: "H", 4: "I"}
    for tag, typ, values in entries:
        total = tsize[typ] * len(values)
        if total <= 4:
            packed = struct.pack(endian + str(len(values)) + tcode[typ], *values)
            ifd += struct.pack(endian + "HHI", tag, typ, len(values))
            ifd += packed + b"\x00" * (4 - total)
        else:
            ifd += struct.pack(
                endian + "HHII", tag, typ, len(values), extra_base + len(extra)
            )
            extra += struct.pack(endian + str(len(values)) + tcode[typ], *values)
    ifd += struct.pack(endian + "I", 0)

    body = bytearray(header)
    for t in tiles:
        body += t
    body += b"\x00" * (ifd_off - len(body))
    return bytes(body + ifd + extra)


class TestTiffTiled:
    def test_tiled_rgb_exact(self):
        img = _rng(30).integers(0, 256, (37, 45, 3)).astype(np.uint8)
        arr = tiff_pixels(encode_tiff_tiled(img, 16, 16))
        assert np.array_equal(arr, img)

    def test_tiled_gray_lzw_bigendian(self):
        img = _rng(31).integers(0, 256, (40, 33)).astype(np.uint8)
        payload = encode_tiff_tiled(img, 16, 32, endian=">", lzw=True)
        arr = tiff_pixels(payload)
        assert np.array_equal(arr[:, :, 0], img)

    def test_tiled_packbits_edge_tiles(self):
        # dims NOT multiples of the tile size in both axes
        img = _rng(32).integers(0, 256, (17, 19, 3)).astype(np.uint8)
        arr = tiff_pixels(encode_tiff_tiled(img, 16, 16, packbits=True))
        assert np.array_equal(arr, img)

    def test_tiled_corrupt_and_fuzz(self):
        img = _rng(33).integers(0, 256, (20, 20, 3)).astype(np.uint8)
        payload = bytearray(encode_tiff_tiled(img, 16, 16, lzw=True))
        assert tiff_pixels(bytes(payload[: len(payload) // 2])) is None
        rng = np.random.default_rng(34)
        for _ in range(150):
            p = bytearray(payload)
            pos = int(rng.integers(0, len(p)))
            p[pos] = int(rng.integers(0, 256))
            out = tiff_pixels(bytes(p))
            assert out is None or out.ndim == 3


class TestTiffDeflatePredictor:
    """Deflate compression (tag 259 = 8 / legacy 32946) and tag-317
    horizontal differencing — the standard LZW/Deflate companion that,
    unhandled, silently decodes wrong pixels."""

    @pytest.mark.parametrize("endian", ["<", ">"])
    def test_deflate_rgb_multistrip(self, endian):
        img = _rng(40).integers(0, 256, (21, 15, 3)).astype(np.uint8)
        payload = encode_tiff(
            img, endian=endian, deflate=True, rows_per_strip=6
        )
        assert np.array_equal(tiff_pixels(payload), img)

    def test_deflate_gray(self):
        img = _rng(41).integers(0, 256, (12, 30)).astype(np.uint8)
        arr = tiff_pixels(encode_tiff(img, deflate=True))
        assert np.array_equal(arr[:, :, 0], img)

    def test_legacy_adobe_deflate_tag_32946(self):
        img = _rng(42).integers(0, 256, (9, 11, 3)).astype(np.uint8)
        payload = encode_tiff(img, deflate=True)
        patched = payload.replace(
            struct.pack("<HHIHH", 259, 3, 1, 8, 0),
            struct.pack("<HHIHH", 259, 3, 1, 32946, 0),
        )
        assert patched != payload  # the entry was found and rewritten
        assert np.array_equal(tiff_pixels(patched), img)

    @pytest.mark.parametrize("codec", ["lzw", "deflate"])
    def test_predictor2_rgb(self, codec):
        img = _rng(43).integers(0, 256, (18, 25, 3)).astype(np.uint8)
        payload = encode_tiff(
            img, predictor=2, rows_per_strip=5, **{codec: True}
        )
        assert np.array_equal(tiff_pixels(payload), img)

    def test_predictor2_gray_deflate(self):
        img = _rng(44).integers(0, 256, (14, 23)).astype(np.uint8)
        payload = encode_tiff(img, deflate=True, predictor=2)
        assert np.array_equal(tiff_pixels(payload)[:, :, 0], img)

    def test_predictor2_tiled_deflate_edge_tiles(self):
        img = _rng(45).integers(0, 256, (17, 19, 3)).astype(np.uint8)
        payload = encode_tiff_tiled(img, 16, 16, deflate=True, predictor=2)
        assert np.array_equal(tiff_pixels(payload), img)

    def test_predictor2_actually_required(self):
        # the same bytes WITHOUT the 317 entry must NOT decode to the
        # image (guards against the predictor being silently ignored)
        img = _rng(46).integers(0, 256, (10, 12, 3)).astype(np.uint8)
        with_pred = encode_tiff(img, deflate=True, predictor=2)
        stripped = with_pred.replace(
            struct.pack("<HHIHH", 317, 3, 1, 2, 0),
            struct.pack("<HHIHH", 317, 3, 1, 1, 0),
        )
        assert stripped != with_pred
        out = tiff_pixels(stripped)
        assert out is not None and not np.array_equal(out, img)

    def test_unknown_predictor_and_bilevel_predictor_rejected(self):
        img = _rng(47).integers(0, 256, (8, 8, 3)).astype(np.uint8)
        p3 = encode_tiff(img, deflate=True, predictor=2).replace(
            struct.pack("<HHIHH", 317, 3, 1, 2, 0),
            struct.pack("<HHIHH", 317, 3, 1, 3, 0),
        )
        assert tiff_pixels(p3) is None
        bil = (_rng(48).integers(0, 2, (16, 16))).astype(np.uint8)
        pb = bytearray(encode_tiff(bil, bits=1, photometric=1))
        pb = bytes(pb)  # bilevel baseline decodes
        assert tiff_pixels(pb) is not None

    def test_deflate_corrupt_and_bomb_guard(self):
        import zlib

        img = _rng(49).integers(0, 256, (16, 16, 3)).astype(np.uint8)
        payload = bytearray(encode_tiff(img, deflate=True))
        # truncated stream
        assert tiff_pixels(bytes(payload[: len(payload) - 40])) is None
        # a strip inflating far PAST the geometric expectation must be
        # rejected by the bounded inflate, not ballooned
        big = zlib.compress(b"\x00" * (1 << 22))
        assert len(big) < 1 << 16
        fake = encode_tiff(
            np.zeros((4, 4, 3), np.uint8), deflate=True
        ).replace(zlib.compress(b"\x00" * 48), big)
        assert tiff_pixels(fake) is None
        rng = np.random.default_rng(50)
        for _ in range(150):
            p = bytearray(payload)
            p[int(rng.integers(0, len(p)))] = int(rng.integers(0, 256))
            out = tiff_pixels(bytes(p))
            assert out is None or out.ndim == 3


class TestTiff16Bit:
    """16-bit samples (scientific/scanned TIFFs): high byte kept, same
    16→8 convention as the PNG decoder; both byte orders; gray + RGB;
    all stdlib codecs."""

    @pytest.mark.parametrize("endian", ["<", ">"])
    def test_rgb16_both_endians(self, endian):
        img16 = _rng(60).integers(0, 65536, (11, 14, 3)).astype(np.uint16)
        arr = tiff_pixels(encode_tiff(img16, bits=16, endian=endian))
        np.testing.assert_array_equal(arr, (img16 >> 8).astype(np.uint8))

    @pytest.mark.parametrize("codec", ["lzw", "packbits", "deflate"])
    def test_gray16_compressed(self, codec):
        img16 = _rng(61).integers(0, 65536, (9, 21)).astype(np.uint16)
        payload = encode_tiff(
            img16, bits=16, photometric=1, rows_per_strip=4,
            **{codec: True},
        )
        arr = tiff_pixels(payload)
        np.testing.assert_array_equal(
            arr[:, :, 0], (img16 >> 8).astype(np.uint8)
        )

    def test_white_is_zero16_inverts(self):
        img16 = _rng(62).integers(0, 65536, (6, 7)).astype(np.uint16)
        arr = tiff_pixels(encode_tiff(img16, bits=16, photometric=0))
        np.testing.assert_array_equal(
            arr[:, :, 0], 255 - (img16 >> 8).astype(np.uint8)
        )

    def test_predictor_on_16bit_rejected(self):
        # tag-317 differencing on 16-bit samples is out of scope: a
        # predictor-2 file whose BitsPerSample entry is rewritten to 16
        # must return None, never silently-wrong bytes
        img = _rng(63).integers(0, 256, (5, 5)).astype(np.uint8)
        p2 = encode_tiff(img, deflate=True, predictor=2).replace(
            struct.pack("<HHIHH", 258, 3, 1, 8, 0),
            struct.pack("<HHIHH", 258, 3, 1, 16, 0),
        )
        assert tiff_pixels(p2) is None

    def test_truncated16_and_fuzz(self):
        img16 = _rng(64).integers(0, 65536, (8, 8, 3)).astype(np.uint16)
        payload = bytearray(encode_tiff(img16, bits=16, lzw=True))
        assert tiff_pixels(bytes(payload[: len(payload) // 2])) is None
        rng = np.random.default_rng(65)
        for _ in range(120):
            p = bytearray(payload)
            p[int(rng.integers(0, len(p)))] = int(rng.integers(0, 256))
            out = tiff_pixels(bytes(p))
            assert out is None or out.ndim == 3
