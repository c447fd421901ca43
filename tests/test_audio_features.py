"""Windowed audio-analysis features (operators/multimodal.
audio_features_windows): zero-crossing rate and spectral centroid
checked against closed-form values on exactly-periodic synthetic
signals (square waves whose period divides the window land on exact
DFT bins — no leakage, so the expected centroid is a rational/simple
closed form)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.multimodal import (
    audio_features_windows,
    wav_pcm16_samples,
)


def pcm16_wav(samples, rate=8000, channels=1):
    data = np.asarray(samples, np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels,
                      2 * channels, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def square(W, k, A=16000):
    return np.tile(
        np.concatenate([np.full(k, A), np.full(k, -A)]), W // (2 * k)
    ).astype(np.int16)


class TestAudioFeatureMath:
    """Reference-math checks for the exact signals used by the gate
    query `audio_zcr_centroid`, plus decoder-level edge cases."""

    @pytest.mark.parametrize("k,zcr,centroid", [
        (1, 1.0, 4000.0),
        (2, round(31 / 63, 6), 2000.0),
        (4, round(15 / 63, 6), 1292.893219),
    ])
    def test_square_wave_closed_forms(self, k, zcr, centroid):
        s = square(64, k).astype(np.float64)
        sg = np.sign(s)
        assert round(float((sg[1:] != sg[:-1]).mean()), 6) == zcr
        spec = np.abs(np.fft.rfft(s)) ** 2
        spec[0] = 0
        freqs = np.fft.rfftfreq(64, 1 / 8000)
        assert round(float((freqs * spec).sum() / spec.sum()), 6) == centroid
        assert round(float(np.sqrt((s**2).mean())), 6) == 16000.0

    def test_wav_roundtrip_carries_rate(self):
        from fluent_plugin_sql_spark.operators.multimodal import (
            parse_wav_header,
        )

        wav = pcm16_wav(square(128, 2), rate=16000)
        assert parse_wav_header(wav)[1] == 16000
        sm = wav_pcm16_samples(wav)
        assert sm.shape == (128, 1)
        np.testing.assert_array_equal(sm[:, 0], square(128, 2))

    def test_constant_signal_centroid_zero(self):
        # DC-only window: spectrum after DC exclusion is empty -> 0.0
        s = np.full(64, 5000.0)
        spec = np.abs(np.fft.rfft(s)) ** 2
        spec[0] = 0
        assert spec.sum() == 0.0


@pytest.mark.usefixtures("spark")
class TestAudioFeaturesSpark:
    def test_end_to_end_square_waves(self, spark):
        rows = []
        for d in range(6):
            k = 1 << (d % 3)
            rows.append((d, bytearray(pcm16_wav(square(128, k)))))
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = audio_features_windows(df, n_windows=2, strict=True)
        got = {(r.doc_id, r.window_idx): r for r in out.collect()}
        assert len(got) == 12
        expect = {
            1: (1.0, 4000.0),
            2: (round(31 / 63, 6), 2000.0),
            4: (round(15 / 63, 6), 1292.893219),
        }
        for d in range(6):
            k = 1 << (d % 3)
            for w in range(2):
                r = got[(d, w)]
                assert r.n_samples == 64
                assert r.rms == 16000.0
                assert r.zcr == expect[k][0]
                assert abs(r.centroid_hz - expect[k][1]) < 1e-6

    def test_strict_raise_and_drop(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"not a wav"))], "doc_id long, payload binary"
        )
        assert audio_features_windows(df, strict=False).count() == 0
        with pytest.raises(Exception):
            audio_features_windows(df, strict=True).collect()


def _wav(fmt_tag, bits, data, channels=1, rate=8000, extensible=False):
    block = max(1, channels * bits // 8)
    if extensible:
        # WAVE_FORMAT_EXTENSIBLE: cbSize=22, validBits, channelMask,
        # SubFormat GUID with the real format code leading
        guid = struct.pack("<H", fmt_tag) + b"\x00\x00" + bytes(12)
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, channels, rate, rate * block, block,
            bits, 22, bits, 0,
        ) + guid
    else:
        fmt = struct.pack(
            "<HHIIHH", fmt_tag, channels, rate, rate * block, block, bits
        )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestWavBitDepths:
    """PCM depth matrix beyond 16-bit: 8-bit unsigned, 24-bit, 32-bit
    int, IEEE float32 — each downconverted to the int16 contract — plus
    the WAVE_FORMAT_EXTENSIBLE wrapper and truncation tolerance."""

    def test_pcm8_unsigned_recentres(self):
        sm = wav_pcm16_samples(_wav(1, 8, bytes([0, 128, 255])))
        np.testing.assert_array_equal(sm[:, 0], [-32768, 0, 32512])

    def test_pcm24_sign_extend_top16(self):
        vals = [1 << 22, -(1 << 22), 0x123456, -1]
        data = b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
        )
        sm = wav_pcm16_samples(_wav(1, 24, data))
        np.testing.assert_array_equal(
            sm[:, 0], [v >> 8 for v in vals]
        )

    def test_pcm32_top16(self):
        vals = [0x12345678, -(1 << 30), 0]
        data = b"".join(
            struct.pack("<i", v) for v in vals
        )
        sm = wav_pcm16_samples(_wav(1, 32, data))
        np.testing.assert_array_equal(sm[:, 0], [v >> 16 for v in vals])

    def test_float32_clipped_scaled_nan_safe(self):
        data = struct.pack("<6f", 1.0, -1.0, 2.0, -3.0, 0.0, float("nan"))
        sm = wav_pcm16_samples(_wav(3, 32, data))
        np.testing.assert_array_equal(
            sm[:, 0], [32767, -32767, 32767, -32767, 0, 0]
        )

    def test_extensible_wrapper_matches_plain(self):
        s = square(64, 2)
        data = s.tobytes()
        plain = wav_pcm16_samples(_wav(1, 16, data))
        ext = wav_pcm16_samples(_wav(1, 16, data, extensible=True))
        np.testing.assert_array_equal(plain, ext)

    def test_extensible_truncated_fmt_rejected(self):
        payload = bytearray(_wav(1, 16, square(8, 1).tobytes(),
                                 extensible=True))
        # shrink the fmt chunk's declared size below the GUID
        i = payload.index(b"fmt ")
        struct.pack_into("<I", payload, i + 4, 16)
        # size lies about the layout: walker must not decode garbage
        out = wav_pcm16_samples(bytes(payload))
        assert out is None or isinstance(out, np.ndarray)

    def test_truncated_depths_clamp_not_raise(self):
        for bits, fmt_tag in ((24, 1), (32, 1), (32, 3)):
            data = b"\x01\x02\x03\x04\x05"  # not a whole sample
            sm = wav_pcm16_samples(_wav(fmt_tag, bits, data))
            assert sm is None or sm.shape[0] <= 1

    def test_stereo_24bit_channel_split(self):
        l, r = 0x010000, 0x020000
        data = (l.to_bytes(3, "little") + r.to_bytes(3, "little")) * 4
        sm = wav_pcm16_samples(_wav(1, 24, data, channels=2))
        assert sm.shape == (4, 2)
        np.testing.assert_array_equal(sm[:, 0], [l >> 8] * 4)
        np.testing.assert_array_equal(sm[:, 1], [r >> 8] * 4)
