"""jpeg_pixels (operators/multimodal.py) — baseline JPEG decode against
an INDEPENDENT minimal encoder written here (its own zigzag constant,
its own DCT, fixed-length Huffman code assignment declared via DHT), so
a shared-bug round trip is structurally impossible: the decoder must
reconstruct canonical codes from BITS/HUFFVAL, walk the zigzag per
T.81 Figure A.6, and invert the DCT to agree with this encoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.multimodal import (
    _read_pixels,
    jpeg_pixels,
    parse_image_header,
)

# the standard zigzag sequence, written out literally (T.81 Figure A.6)
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
    np.int32,
)

# encoder-side Huffman: every symbol at one fixed code length, declared
# canonically through DHT.  DC: 12 categories at length 4.  AC: the 162
# baseline symbols (EOB, ZRL, (run 0-15) x (size 1-10)) at length 8.
DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _fixed_table(symbols, length):
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    codes = {sym: (i, length) for i, sym in enumerate(symbols)}
    return counts, symbols, codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad


def _dct2(block):
    # direct DCT-II sum (deliberately not the decoder's matrix form)
    f = block.astype(np.float64) - 128.0
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        f[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


def _category(v):
    return int(v).bit_length() if v else 0


def _encode_block(wtr, coefs_zz, dc_pred, dc_codes, ac_codes):
    dc = int(coefs_zz[0])
    diff = dc - dc_pred
    t = _category(abs(diff))
    code, ln = dc_codes[t]
    wtr.put(code, ln)
    if t:
        wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coefs_zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(coefs_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            wtr.put(code, ln)
            run -= 16
        s = _category(abs(v))
        assert s <= 10, "test image drives AC size beyond the table"
        code, ln = ac_codes[(run << 4) | s]
        wtr.put(code, ln)
        wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        wtr.put(code, ln)
    return dc


def _plane_blocks(plane, q):
    """plane -> list of quantized zigzag coefficient arrays, raster order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = []
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            fq = np.round(_dct2(blk) / q.reshape(8, 8)).astype(np.int64)
            blocks.append(fq.flatten()[ZIGZAG])
    return blocks, pw // 8


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(tc, th, counts, symbols):
    return _seg(0xC4, bytes([tc << 4 | th]) + bytes(counts) + bytes(symbols))


def encode_jpeg(rgb, qy, qc=None, subsample=(1, 1), gray=False, restart=0):
    """Minimal baseline JFIF encoder.  ``qy``/``qc``: 64-entry natural-order
    quant tables.  ``subsample``: chroma (h, v) decimation factors."""
    qc = qy if qc is None else qc
    dc_counts, dc_syms, dc_codes = _fixed_table(DC_SYMS, 4)
    ac_counts, ac_syms, ac_codes = _fixed_table(AC_SYMS, 8)

    if gray:
        y = rgb.astype(np.float64) if rgb.ndim == 2 else rgb[:, :, 0].astype(np.float64)
        planes = [np.clip(np.round(y), 0, 255)]
        samps = [(1, 1)]
        qts = [qy]
        qids = [0]
    else:
        r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        sh, sv = subsample
        if (sh, sv) != (1, 1):
            h, w = y.shape
            ph, pw = -(-h // sv) * sv, -(-w // sh) * sh
            def down(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return p.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
            cb, cr = down(cb), down(cr)
        planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
        samps = [(sh, sv), (1, 1), (1, 1)]
        qts = [qy, qc, qc]
        qids = [0, 1, 1]

    h, w = planes[0].shape
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per component: quantized blocks padded out to the full MCU grid
    comp_blocks = []
    for p, (chs, cvs), q in zip(planes, samps, qts):
        want_bx, want_by = mcus_x * chs, mcus_y * cvs
        ph, pw = p.shape
        full = np.pad(
            p,
            ((0, want_by * 8 - ph), (0, want_bx * 8 - pw)),
            mode="edge",
        )
        blocks, bx = _plane_blocks(full, q)
        assert bx == want_bx
        comp_blocks.append((blocks, want_bx, chs, cvs))

    wtr = _BitWriter()
    dc_pred = [0] * len(planes)
    n_mcus = mcus_x * mcus_y
    rst = 0
    for mcu in range(n_mcus):
        if restart and mcu and mcu % restart == 0:
            wtr.align()
            wtr.out.append(0xFF)
            wtr.out.append(0xD0 + rst % 8)
            rst += 1
            dc_pred = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci, (blocks, bx, chs, cvs) in enumerate(comp_blocks):
            for by_i in range(cvs):
                for bx_i in range(chs):
                    bi = (my * cvs + by_i) * bx + (mx * chs + bx_i)
                    dc_pred[ci] = _encode_block(
                        wtr, blocks[bi], dc_pred[ci], dc_codes, ac_codes
                    )
    wtr.align()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(qy[z]) for z in ZIGZAG))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(int(qc[z]) for z in ZIGZAG))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci, ((chs, cvs), qid) in enumerate(zip(samps, qids)):
        sof += bytes([ci + 1, (chs << 4) | cvs, qid])
    out += _seg(0xC0, bytes(sof))
    out += _dht(0, 0, dc_counts, dc_syms)
    out += _dht(1, 0, ac_counts, ac_syms)
    if not gray:
        out += _dht(0, 1, dc_counts, dc_syms)
        out += _dht(1, 1, ac_counts, ac_syms)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        td_ta = 0 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


Q1 = np.ones(64, np.int32)


def _rng(seed):
    return np.random.default_rng(seed)


class TestJpegDecode:
    def test_constant_gray_exact(self):
        img = np.full((16, 16), 77, np.uint8)
        arr = jpeg_pixels(encode_jpeg(img, Q1, gray=True))
        assert arr is not None and arr.shape == (16, 16, 3)
        assert np.all(arr == 77)

    def test_gray_gradient_odd_dims(self):
        img = (
            np.linspace(0, 255, 13 * 20).reshape(13, 20).astype(np.uint8)
        )
        arr = jpeg_pixels(encode_jpeg(img, Q1, gray=True))
        assert arr.shape == (13, 20, 3)
        assert np.max(np.abs(arr[:, :, 0].astype(int) - img.astype(int))) <= 2
        assert np.array_equal(arr[:, :, 0], arr[:, :, 1])

    def test_rgb_444_near_lossless(self):
        img = _rng(7).integers(90, 166, (24, 17, 3)).astype(np.uint8)
        arr = jpeg_pixels(encode_jpeg(img, Q1))
        assert arr.shape == (24, 17, 3)
        # q=1 4:4:4: only color-transform + DCT rounding noise
        assert np.max(np.abs(arr.astype(int) - img.astype(int))) <= 4

    def test_rgb_420_blockwise_constant(self):
        # constant within 16x16 tiles -> 4:2:0 subsampling is lossless
        tiles = _rng(11).integers(60, 196, (2, 3, 3)).astype(np.uint8)
        img = np.repeat(np.repeat(tiles, 16, axis=0), 16, axis=1)
        arr = jpeg_pixels(encode_jpeg(img, Q1, subsample=(2, 2)))
        assert arr.shape == (32, 48, 3)
        assert np.max(np.abs(arr.astype(int) - img.astype(int))) <= 4

    def test_420_odd_dims_crop(self):
        img = np.full((17, 21, 3), (10, 200, 99), np.uint8)
        arr = jpeg_pixels(encode_jpeg(img, Q1, subsample=(2, 2)))
        assert arr.shape == (17, 21, 3)
        assert np.max(np.abs(arr.astype(int) - img.astype(int))) <= 4

    def test_real_quant_table_coarse(self):
        # a coarse flat table: decode within quantization error bound
        q = np.full(64, 16, np.int32)
        img = np.full((8, 8), 100, np.uint8) + np.diag(
            np.arange(8, dtype=np.uint8)
        )
        arr = jpeg_pixels(encode_jpeg(img, q, gray=True))
        assert arr is not None
        assert np.max(np.abs(arr[:, :, 0].astype(int) - img.astype(int))) <= 16

    def test_restart_markers(self):
        img = _rng(3).integers(80, 176, (16, 48, 3)).astype(np.uint8)
        plain = jpeg_pixels(encode_jpeg(img, Q1))
        with_rst = jpeg_pixels(encode_jpeg(img, Q1, restart=2))
        assert with_rst is not None
        assert np.array_equal(plain, with_rst)
        assert np.max(np.abs(with_rst.astype(int) - img.astype(int))) <= 4

    def test_header_parse_dims(self):
        img = np.zeros((9, 31, 3), np.uint8)
        payload = encode_jpeg(img, Q1)
        assert parse_image_header(payload) == ("jpeg", 31, 9, 3)
        gray = encode_jpeg(img[:, :, 0], Q1, gray=True)
        assert parse_image_header(gray) == ("jpeg", 31, 9, 1)

    def test_read_pixels_routes_jpeg(self):
        img = np.full((8, 8, 3), 42, np.uint8)
        arr = _read_pixels(encode_jpeg(img, Q1))
        assert arr is not None and np.max(np.abs(arr.astype(int) - 42)) <= 2

    def test_progressive_rejected(self):
        img = np.zeros((8, 8, 3), np.uint8)
        payload = bytearray(encode_jpeg(img, Q1))
        i = payload.index(bytes([0xFF, 0xC0]))
        payload[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
        assert jpeg_pixels(bytes(payload)) is None

    def test_truncated_stream_rejected(self):
        img = _rng(5).integers(0, 255, (16, 16, 3)).astype(np.uint8)
        payload = encode_jpeg(img, Q1)
        assert jpeg_pixels(payload[: len(payload) // 2]) is None

    def test_garbage_rejected(self):
        assert jpeg_pixels(b"\xff\xd8\xff\xe0" + b"\x00" * 32) is None
        assert jpeg_pixels(None) is None
        assert jpeg_pixels(b"\x00\x01") is None


class TestJpegSparkIntegration:
    def test_pixel_features_strict_on_jpeg(self, spark):
        from fluent_plugin_sql_spark.operators.multimodal import (
            extract_pixel_features,
        )

        img1 = np.full((16, 16, 3), (200, 50, 120), np.uint8)
        img2 = np.full((8, 24, 3), 30, np.uint8)
        df = spark.createDataFrame(
            [(1, encode_jpeg(img1, Q1)), (2, encode_jpeg(img2, Q1))],
            "doc_id long, payload binary",
        )
        rows = {
            r["doc_id"]: r
            for r in extract_pixel_features(df, strict=True).collect()
        }
        assert rows[1]["width"] == 16 and rows[1]["height"] == 16
        means = rows[1]["channel_means"]
        for got, want in zip(means, (200, 50, 120)):
            assert abs(got - want) <= 2
        assert rows[2]["width"] == 24 and rows[2]["height"] == 8
        assert all(abs(m - 30) <= 2 for m in rows[2]["channel_means"])

    def test_decode_images_real_jpeg_dims(self, spark):
        from fluent_plugin_sql_spark.operators.multimodal import decode_images

        img = np.zeros((40, 25, 3), np.uint8)
        df = spark.createDataFrame(
            [(7, encode_jpeg(img, Q1))], "doc_id long, payload binary"
        )
        r = decode_images(df, strict=True).collect()[0]
        assert (r["width"], r["height"], r["channels"]) == (25, 40, 3)


class TestMjpegSplit:
    def test_spans_partition_stream(self):
        from fluent_plugin_sql_spark.operators.multimodal import (
            mjpeg_frame_spans,
        )

        rng = np.random.default_rng(9)
        frames = [
            encode_jpeg(
                rng.integers(64, 192, (16, 16, 3)).astype(np.uint8), Q1
            )
            for _ in range(5)
        ]
        stream = b"".join(frames)
        spans = mjpeg_frame_spans(stream)
        assert len(spans) == 5
        # spans tile the stream exactly and round-trip each frame
        pos = 0
        for (s, e), f in zip(spans, frames):
            assert (s, e) == (pos, pos + len(f))
            assert jpeg_pixels(stream[s:e]) is not None
            pos = e
        assert pos == len(stream)

    def test_marker_bytes_inside_dqt_do_not_split(self):
        """A quant table whose first two zigzag entries are 255, 216
        puts a literal FF D8 (SOI byte pair) INSIDE the DQT segment —
        a naive substring splitter would cut the frame there; the
        structural walk must not."""
        from fluent_plugin_sql_spark.operators.multimodal import (
            mjpeg_frame_spans,
        )

        q = np.ones(64, np.int32)
        q[0], q[1] = 255, 216
        img = np.full((8, 8), 130, np.uint8)
        f = encode_jpeg(img, q, gray=True)
        assert b"\xff\xd8" in f[2:]  # the trap exists
        spans = mjpeg_frame_spans(f + f)
        assert spans == [(0, len(f)), (len(f), 2 * len(f))]

    def test_truncated_tail_keeps_whole_frames(self):
        from fluent_plugin_sql_spark.operators.multimodal import (
            mjpeg_frame_spans,
        )

        img = np.full((8, 8, 3), 90, np.uint8)
        f = encode_jpeg(img, Q1)
        stream = f + f + f[: len(f) // 2]
        spans = mjpeg_frame_spans(stream)
        assert spans == [(0, len(f)), (len(f), 2 * len(f))]
        assert mjpeg_frame_spans(b"notvideo") == []

    def test_sample_video_frames_spark(self, spark):
        from fluent_plugin_sql_spark.operators.multimodal import (
            sample_video_frames,
        )

        rng = np.random.default_rng(21)
        fills = [40, 90, 140, 190, 240]
        clip = b"".join(
            encode_jpeg(np.full((8, 16, 3), v, np.uint8), Q1) for v in fills
        )
        df = spark.createDataFrame([(3, clip)], "doc_id long, payload binary")
        rows = sorted(
            sample_video_frames(df, every_k=2, max_frames=2, strict=True)
            .collect(),
            key=lambda r: r["frame_idx"],
        )
        # every 2nd frame of 5, capped at 2 -> frames 0 and 2
        assert [r["frame_idx"] for r in rows] == [0, 2]
        assert all(r["n_frames"] == 5 for r in rows)
        assert all((r["width"], r["height"]) == (16, 8) for r in rows)
        for r, want in zip(rows, (fills[0], fills[2])):
            assert abs(r["brightness"] - want) <= 2


def test_gray_with_declared_2x2_sampling_is_noninterleaved():
    """T.81 A.2.3: a single-component scan ignores SOF sampling factors
    (non-interleaved, one data unit per MCU).  Some encoders declare
    2x2 on grayscale; the block walk must stay ceil(w/8) x ceil(h/8)."""
    img = (
        np.linspace(10, 240, 24 * 24).reshape(24, 24).astype(np.uint8)
    )
    payload = bytearray(encode_jpeg(img, Q1, gray=True))
    i = payload.index(bytes([0xFF, 0xC0]))
    assert payload[i + 11] == 0x11
    payload[i + 11] = 0x22  # declare 2x2 sampling on the lone component
    arr = jpeg_pixels(bytes(payload))
    assert arr is not None and arr.shape == (24, 24, 3)
    assert np.max(np.abs(arr[:, :, 0].astype(int) - img.astype(int))) <= 2


def test_header_parse_truncation_and_null_never_raise():
    """parse_image_header: NULL and every truncation prefix of a valid
    stream return None or a tuple — never raise.  Pins the SOF
    off-by-one (payload ending exactly before the ncomp byte)."""
    assert parse_image_header(None) is None
    assert parse_image_header(b"") is None
    # SOI + SOF0 cut exactly after the width bytes (ncomp missing)
    trunc = bytes.fromhex("ffd8ffc0000808001000 10".replace(" ", ""))
    assert parse_image_header(trunc) is None
    img = np.zeros((8, 8, 3), np.uint8)
    payload = encode_jpeg(img, Q1)
    for cut in range(len(payload)):
        r = parse_image_header(payload[:cut])
        assert r is None or isinstance(r, tuple)
