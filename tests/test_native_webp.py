"""System-libwebp ctypes bindings (operators/native_codecs) and the
cross-validation they unlock:

- the from-scratch VP8L decoder (operators/multimodal.webp_pixels) is
  checked EXACTLY against streams produced by the REFERENCE C encoder
  (WebPEncodeLosslessRGB) — real cwebp output, not just our own test
  encoder, closing the self-consistent-but-wrong loophole;
- the pure-python test encoder (tests/test_webp_decode.encode_vp8l) is
  checked EXACTLY against the reference C decoder (WebPDecodeRGB), so
  the whole VP8L test suite's stimulus side is reference-validated too;
- lossy VP8 — the documented pure-python codec boundary — decodes
  through the native hook, still and animated, under the same
  never-raise drop contract.

All tests skip when the system library is absent; the package itself
never requires it.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators import native_codecs as nc
from fluent_plugin_sql_spark.operators.multimodal import (
    image_quality_features,
    sample_video_frames,
    webp_frames,
    webp_pixels,
)
from test_webp_decode import _photo, encode_vp8l

pytestmark = pytest.mark.skipif(
    not nc.webp_available(), reason="system libwebp not present"
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255**2 / mse)


def _strip_container(payload):
    """The bare VP8/VP8L bitstream inside a still RIFF container."""
    pos = 12
    while pos + 8 <= len(payload):
        fc = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        if fc in (b"VP8 ", b"VP8L"):
            return fc, payload[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz % 2)
    raise AssertionError("no image chunk")


def _anim_lossy(frames, canvas_wh, offsets, quality=90.0):
    """Animated WebP whose ANMF sub-chunks are LOSSY (VP8) streams —
    the payload class webp_frames can only handle via vp8_decode."""
    cw, ch = canvas_wh
    chunks = []
    vp8x = bytes([0x02, 0, 0, 0]) + (cw - 1).to_bytes(3, "little") + (
        ch - 1
    ).to_bytes(3, "little")
    chunks.append(b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x)
    anim = bytes([0, 0, 0, 255]) + struct.pack("<H", 0)
    chunks.append(b"ANIM" + struct.pack("<I", len(anim)) + anim)
    for fr, (x, y) in zip(frames, offsets):
        fh, fw = fr.shape[:2]
        _, stream = _strip_container(nc.webp_encode_rgb(fr, quality))
        sub = b"VP8 " + struct.pack("<I", len(stream)) + stream
        if len(stream) % 2:
            sub += b"\x00"
        body = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + (40).to_bytes(3, "little")
            + bytes([0])
            + sub
        )
        chunks.append(b"ANMF" + struct.pack("<I", len(body)) + body)
        if len(body) % 2:
            chunks.append(b"\x00")
    body = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _smooth(h, w, seed=0):
    """Lossy-friendly smooth gradient (noise-free so PSNR is high)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        120.0
        + 60 * np.sin(xx / 11.0)[:, :, None]
        + 50 * np.cos(yy / 13.0)[:, :, None]
        + np.array([0.0, 10.0, -10.0])[None, None, :]
    )
    return np.clip(base, 0, 255).astype(np.uint8)


class TestCrossValidation:
    """The reference-implementation checks the pure-python VP8L work
    could not have until a system libwebp appeared."""

    @pytest.mark.parametrize(
        "im",
        [
            _photo(48, 64, seed=3),             # predictor + cross-color
            _photo(33, 47, seed=9, levels=8),   # palette → color-indexing
            np.full((21, 13, 3), 77, np.uint8),  # flat → LZ77/cache heavy
            np.tile(
                np.arange(64, dtype=np.uint8)[None, :, None] * 4, (5, 1, 3)
            ),                                   # ramp → subtract-green
            _photo(1, 300, seed=1),              # single-row edge geometry
            _photo(117, 1, seed=2),              # single-column
        ],
        ids=["photo", "palette", "flat", "ramp", "row", "col"],
    )
    def test_c_encoder_to_python_decoder_exact(self, im):
        payload = nc.webp_encode_lossless_rgb(im)
        assert payload is not None
        got = webp_pixels(payload)
        assert got is not None, "python decoder rejected a cwebp stream"
        np.testing.assert_array_equal(got, im)

    @pytest.mark.parametrize("kwargs", [
        dict(),
        dict(cache_bits=4),
        dict(lz77=True),
        dict(cache_bits=6, lz77=True),
    ])
    def test_python_encoder_to_c_decoder_exact(self, kwargs):
        im = _photo(40, 56, seed=11, levels=32)
        payload = encode_vp8l(im, **kwargs)
        got = nc.webp_decode_rgb(payload)
        assert got is not None, "reference decoder rejected our stream"
        np.testing.assert_array_equal(got, im)


class TestLossyVp8:
    def test_still_decode_dims_and_psnr(self):
        im = _smooth(50, 70)
        payload = nc.webp_encode_rgb(im, 90.0)
        assert payload is not None
        # pure python: documented boundary
        assert webp_pixels(payload) is None
        got = nc.webp_decode_rgb(payload)
        assert got.shape == im.shape
        assert _psnr(got, im) > 30.0

    def test_raw_anmf_style_stream_decodes(self):
        im = _smooth(24, 36)
        fourcc, raw = _strip_container(nc.webp_encode_rgb(im, 90.0))
        assert fourcc == b"VP8 "
        got = nc.webp_decode_rgb(raw)  # bare stream, no RIFF
        assert got.shape == im.shape
        assert _psnr(got, im) > 30.0

    def test_hook_routes_webp_native_and_others_python(self):
        im = _smooth(20, 30)
        lossy = nc.webp_encode_rgb(im, 90.0)
        assert nc.native_image_decode(lossy).shape == im.shape
        ppm = f"P6\n30 20\n255\n".encode() + im.tobytes()
        np.testing.assert_array_equal(nc.native_image_decode(ppm), im)
        assert nc.native_image_decode(None) is None
        assert nc.native_image_decode(b"\x00garbage") is None

    def test_animated_lossy_frames_via_hook(self):
        f0 = _smooth(20, 20, 0)
        f1 = 255 - _smooth(10, 12, 0)
        payload = _anim_lossy([f0, f1], (20, 20), [(0, 0), (4, 2)])
        # without the hook: whole-asset drop, matching the contract
        assert webp_frames(payload) is None
        frames = webp_frames(payload, vp8_decode=nc.webp_decode_rgb)
        assert frames is not None and len(frames) == 2
        assert frames[0].shape == (20, 20, 3)
        assert _psnr(frames[0], f0) > 30.0
        # frame 2 composites at offset (4, 2) over frame 1's canvas
        np.testing.assert_array_equal(
            frames[1][:2, :], frames[0][:2, :]
        )
        assert _psnr(frames[1][2:12, 4:16], f1) > 28.0

    def test_still_lossy_single_frame_via_hook(self):
        im = _smooth(18, 22)
        payload = nc.webp_encode_rgb(im, 90.0)
        frames = webp_frames(payload, vp8_decode=nc.webp_decode_rgb)
        assert frames is not None and len(frames) == 1
        assert _psnr(frames[0], im) > 30.0


class TestDegradation:
    def test_absent_library_falls_back_to_python(self, monkeypatch):
        im = _photo(16, 16, seed=4, levels=16)
        lossless = nc.webp_encode_lossless_rgb(im)
        lossy = nc.webp_encode_rgb(im, 80.0)
        monkeypatch.setattr(nc, "_WEBP", (True, None))
        assert not nc.webp_available()
        assert nc.webp_decode_rgb(lossless) is None
        assert nc.webp_encode_lossless_rgb(im) is None
        # the hook degrades: lossless via the from-scratch decoder,
        # lossy to None (drop contract) — never an error
        np.testing.assert_array_equal(nc.native_image_decode(lossless), im)
        assert nc.native_image_decode(lossy) is None

    def test_fuzz_never_raises(self):
        g = np.random.default_rng(21)
        base = bytearray(nc.webp_encode_rgb(_smooth(12, 12), 80.0))
        for _ in range(150):
            buf = bytearray(base)
            for _ in range(int(g.integers(1, 6))):
                buf[int(g.integers(0, len(buf)))] = int(g.integers(0, 256))
            out = nc.webp_decode_rgb(bytes(buf))
            assert out is None or out.dtype == np.uint8
            out2 = nc.native_image_decode(bytes(buf))
            assert out2 is None or out2.dtype == np.uint8

    def test_dimension_bomb_refused(self):
        # a VP8X/VP8 header advertising absurd dims must not allocate
        im = _smooth(8, 8)
        payload = bytearray(nc.webp_encode_rgb(im, 80.0))
        monster = nc.MAX_PIXELS * 4
        assert nc.webp_decode_rgb(bytes(payload)) is not None
        # truncated data with a plausible header: None, not a crash
        assert nc.webp_decode_rgb(bytes(payload[:20])) is None
        assert monster > nc.MAX_PIXELS


@pytest.mark.usefixtures("spark")
class TestSparkIntegration:
    def test_quality_features_over_lossy_webp(self, spark):
        ims = {d: _smooth(16 + d, 20 + d, d) for d in range(4)}
        rows = [
            (d, bytearray(nc.webp_encode_rgb(im, 90.0)))
            for d, im in ims.items()
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        # built-in decoder: every row drops (lossy boundary)
        assert image_quality_features(df, strict=False).count() == 0
        out = {
            r.doc_id: r
            for r in image_quality_features(
                df, strict=True, decode=nc.native_image_decode
            ).collect()
        }
        assert len(out) == 4
        for d, im in ims.items():
            r = out[d]
            assert (r.width, r.height) == (20 + d, 16 + d)
            assert abs(r.brightness - im.mean()) < 3.0

    def test_video_sampler_over_animated_lossy(self, spark):
        f0, f1 = _smooth(20, 20, 0), _smooth(20, 20, 1)
        payload = _anim_lossy([f0, f1], (20, 20), [(0, 0), (0, 0)])
        df = spark.createDataFrame(
            [(7, bytearray(payload))], "doc_id long, payload binary"
        )
        assert sample_video_frames(df, every_k=1).count() == 0
        got = sample_video_frames(
            df, every_k=1, vp8_decode=nc.webp_decode_rgb
        ).collect()
        assert len(got) == 2
        assert {r.frame_idx for r in got} == {0, 1}
        assert all(r.n_frames == 2 and r.width == 20 for r in got)
