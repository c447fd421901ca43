"""G.711 A-law / µ-law WAV decode (operators/multimodal) against an
INDEPENDENT implementation: the test compands linear samples with its
own encoder (the ITU G.711 segment search, written scalar-style here),
and decode(encode(x)) must reproduce each sample within the segment's
quantization step — plus a direct 256-entry table check against a
separately written scalar expander."""

from __future__ import annotations

import struct

import numpy as np

from fluent_plugin_sql_spark.operators.multimodal import (
    _g711_lut,
    wav_pcm16_samples,
)


# --- independent scalar G.711 (encode + decode), written from the spec ---

_ULAW_SEG_ENDS = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]


def linear2ulaw(x):
    # ITU G.711 mu-law companding on the 16-bit linear scale
    if x < 0:
        x = 0x84 - x
        mask = 0x7F
    else:
        x = x + 0x84
        mask = 0xFF
    x = min(x, 0x7FFF)
    seg = next(s for s, e in enumerate(_ULAW_SEG_ENDS) if x <= e)
    uval = (seg << 4) | ((x >> (seg + 3)) & 0x0F)
    return uval ^ mask


def ulaw2linear_scalar(code):
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


_ALAW_SEG_ENDS = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]


def linear2alaw(x):
    # ITU G.711 A-law companding on the 16-bit linear scale
    if x >= 0:
        mask = 0xD5  # sign bit set after the ^0x55 toggle
    else:
        mask = 0x55
        x = -x - 8
    x = min(max(x, 0), 0x7FFF)
    seg = next((s for s, e in enumerate(_ALAW_SEG_ENDS) if x <= e), 8)
    if seg >= 8:
        aval = 0x7F
    elif seg < 2:
        aval = (seg << 4) | ((x >> 4) & 0x0F)
    else:
        aval = (seg << 4) | ((x >> (seg + 3)) & 0x0F)
    return aval ^ mask


def alaw2linear_scalar(code):
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def _wav(fmt_tag, channels, bits, frames: bytes):
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, 8000,
                      8000 * channels * bits // 8, channels * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestG711:
    def test_lut_matches_scalar_spec(self):
        ulut = _g711_lut(7)
        alut = _g711_lut(6)
        for code in range(256):
            assert int(ulut[code]) == ulaw2linear_scalar(code)
            assert int(alut[code]) == alaw2linear_scalar(code)

    def test_ulaw_roundtrip_within_segment_step(self):
        rng = np.random.default_rng(3)
        xs = np.concatenate([
            rng.integers(-32768, 32768, 500),
            np.array([0, -1, 1, 127, -128, 0x7FFF, -0x8000, 0x84, -0x84]),
        ])
        for x in xs:
            code = linear2ulaw(int(x))
            y = ulaw2linear_scalar(code)
            seg = (~code & 0x70) >> 4
            step = 8 << seg  # mu-law quantization interval in segment
            assert abs(int(x) - y) <= step
            assert (int(x) >= 0) == (y >= 0) or y == 0

    def test_alaw_roundtrip_within_segment_step(self):
        rng = np.random.default_rng(5)
        for x in rng.integers(-32768, 32768, 500):
            code = linear2alaw(int(x))
            y = alaw2linear_scalar(code)
            seg = ((code ^ 0x55) & 0x70) >> 4
            step = 16 << max(seg, 1)
            assert abs(int(x) - y) <= step
            assert (int(x) >= 0) == (y >= 0)

    def test_wav_container_ulaw_stereo(self):
        rng = np.random.default_rng(7)
        lin = rng.integers(-30000, 30000, 64)
        codes = bytes(linear2ulaw(int(v)) for v in lin)
        payload = _wav(7, 2, 8, codes)
        out = wav_pcm16_samples(payload)
        assert out is not None and out.shape == (32, 2)
        want = np.array(
            [ulaw2linear_scalar(c) for c in codes], np.int16
        ).reshape(32, 2)
        assert np.array_equal(out, want)

    def test_wav_container_alaw_mono(self):
        codes = bytes(range(256))
        payload = _wav(6, 1, 8, codes)
        out = wav_pcm16_samples(payload)
        assert out.shape == (256, 1)
        assert np.array_equal(
            out[:, 0], np.array([alaw2linear_scalar(c) for c in codes])
        )

    def test_unknown_format_rejected(self):
        payload = _wav(0x11, 1, 4, b"\x00" * 16)  # IMA ADPCM: no codec
        assert wav_pcm16_samples(payload) is None
        # PCM path unchanged
        pcm = np.arange(-8, 8, dtype="<i2").tobytes()
        assert wav_pcm16_samples(_wav(1, 1, 16, pcm)).shape == (16, 1)

    def test_audio_rms_on_ulaw(self, spark):
        from fluent_plugin_sql_spark.operators.multimodal import (
            audio_rms_windows,
        )

        # constant-magnitude square wave companded to mu-law: decode
        # then RMS per window equals the expanded magnitude exactly
        amp = 8000
        code_p, code_n = linear2ulaw(amp), linear2ulaw(-amp)
        dec_p = ulaw2linear_scalar(code_p)
        frames = bytes([code_p, code_n] * 128)
        payload = _wav(7, 1, 8, frames)
        df = spark.createDataFrame(
            [(4, payload)], "doc_id long, payload binary"
        )
        rows = audio_rms_windows(df, n_windows=2, strict=True).collect()
        assert len(rows) == 2
        # decoded +amp and -amp magnitudes differ by <= 1 in mu-law's
        # symmetric table, so RMS ~= |dec_p|
        for r in rows:
            assert abs(r["rms"] - abs(dec_p)) <= 1.0
