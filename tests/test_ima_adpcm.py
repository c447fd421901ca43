"""IMA/DVI ADPCM WAV decode (operators/multimodal.wav_pcm16_samples,
fmt 17) against an INDEPENDENT encoder implemented here.  The encoder
tracks its own reconstructed-predictor sequence (the standard quantize/
dequantize feedback loop), so the decoder's output must equal that
reconstruction BIT-EXACTLY — a far stronger check than an SNR bound on
this lossy codec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.multimodal import (
    parse_wav_header,
    wav_pcm16_samples,
)

STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
INDEX = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def _encode_channel(samples, pred, idx):
    """Code one channel's samples (after the header sample) and return
    (nibbles, reconstruction) where reconstruction is the decoder-side
    predictor sequence the nibbles produce."""
    nibbles, recon = [], []
    for s in samples:
        step = STEPS[idx]
        delta = int(s) - pred
        nib = 0
        if delta < 0:
            nib = 8
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        # decoder-side dequantize with the same integer arithmetic
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        idx = max(0, min(88, idx + INDEX[nib]))
        nibbles.append(nib)
        recon.append(pred)
    return nibbles, recon, pred, idx


def encode_ima_wav(samples, samples_per_block=None, rate=8000):
    """samples: (n, channels) int array.  Returns (wav_bytes,
    reconstruction) where reconstruction is the exact (m, channels)
    int16 matrix a correct decoder must produce."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    spb = samples_per_block or n  # header sample + coded samples
    assert (spb - 1) % 8 == 0, "coded samples must fill whole 4-byte groups"
    block_align = 4 * ch + (spb - 1) // 2 * ch
    blocks = []
    recon_rows = []
    for b0 in range(0, n, spb):
        blk_samples = samples[b0 : b0 + spb]
        if len(blk_samples) < spb:
            break  # encoder emits whole blocks only
        blk = bytearray()
        chan_nibbles = []
        chan_recon = []
        for c in range(ch):
            pred = int(blk_samples[0, c])
            idx = 0
            blk_hdr_at = len(blk)
            blk += struct.pack("<hBB", pred, idx, 0)
            nibs, rec, _p, _i = _encode_channel(
                blk_samples[1:, c], pred, idx
            )
            chan_nibbles.append(nibs)
            chan_recon.append([pred] + rec)
            assert blk[blk_hdr_at + 2] == idx
        # 4-byte groups, round-robin over channels, low nibble first
        per_group = 8
        ngroups = (spb - 1) // per_group
        for g in range(ngroups * ch):
            c = g % ch
            gi = g // ch
            chunk = chan_nibbles[c][gi * 8 : gi * 8 + 8]
            for k in range(0, 8, 2):
                blk.append(chunk[k] | (chunk[k + 1] << 4))
        assert len(blk) == block_align
        blocks.append(bytes(blk))
        recon_rows.append(
            np.array(chan_recon, np.int16).T  # (spb, ch)
        )
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHH", 17, ch, rate, rate * block_align // spb, block_align, 4
    )
    wav = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", len(wav)) + wav
    recon = np.vstack(recon_rows) if recon_rows else np.empty((0, ch), np.int16)
    return wav, recon


def _sine(n, ch, seed):
    g = np.random.default_rng(seed)
    t = np.arange(n)
    out = np.stack(
        [
            np.round(
                12000 * np.sin(2 * np.pi * t / (20 + 7 * c))
                + g.integers(-300, 300, n)
            )
            for c in range(ch)
        ],
        axis=1,
    )
    return np.clip(out, -32768, 32767).astype(np.int64)


class TestImaAdpcm:
    def test_mono_single_block_exact(self):
        wav, recon = encode_ima_wav(_sine(33, 1, 1))
        out = wav_pcm16_samples(wav)
        assert out is not None and out.shape == recon.shape
        np.testing.assert_array_equal(out, recon)

    def test_mono_multi_block_exact(self):
        wav, recon = encode_ima_wav(_sine(99, 1, 2), samples_per_block=33)
        out = wav_pcm16_samples(wav)
        np.testing.assert_array_equal(out, recon)

    def test_stereo_round_robin_exact(self):
        wav, recon = encode_ima_wav(_sine(34, 2, 3), samples_per_block=17)
        out = wav_pcm16_samples(wav)
        assert out.shape == (34, 2)
        np.testing.assert_array_equal(out, recon)

    def test_lossy_but_close(self):
        src = _sine(257, 1, 4)
        wav, _ = encode_ima_wav(src[:257], samples_per_block=257)
        out = wav_pcm16_samples(wav).astype(np.float64)[:, 0]
        # the step size starts at its minimum and needs ~50 samples to
        # adapt to a 12k-amplitude waveform; judge tracking after that
        err = (out - src[:, 0])[64:]
        assert np.sqrt((err**2).mean()) < 500  # tracks the waveform

    def test_clamp_extremes(self):
        # force predictor saturation both ways
        src = np.array(
            [0] + [32767] * 16 + [-32768] * 16, np.int64
        )
        wav, recon = encode_ima_wav(src)
        out = wav_pcm16_samples(wav)
        np.testing.assert_array_equal(out, recon)
        assert recon[:, 0].max() <= 32767 and recon[:, 0].min() >= -32768

    def test_header_meta_parses(self):
        wav, _ = encode_ima_wav(_sine(33, 1, 5))
        meta = parse_wav_header(wav)
        assert meta is not None and meta[0] == 1 and meta[2] == 4

    def test_truncated_tail_block_dropped(self):
        wav, recon = encode_ima_wav(_sine(66, 1, 6), samples_per_block=33)
        # chop into the second block's data: only block 1 survives
        cut = wav[: len(wav) - 10]
        out = wav_pcm16_samples(cut)
        assert out is not None
        np.testing.assert_array_equal(out, recon[:33])

    def test_corrupt_rejected_not_raised(self):
        wav, _ = encode_ima_wav(_sine(33, 1, 7))
        # step index byte > 88 in the block header
        bad = bytearray(wav)
        data_at = wav.rindex(b"data") + 8
        bad[data_at + 2] = 100
        assert wav_pcm16_samples(bytes(bad)) is None
        # block_align smaller than the per-channel headers
        bad2 = bytearray(wav)
        fmt_at = wav.index(b"fmt ") + 8
        struct.pack_into("<H", bad2, fmt_at + 12, 4)
        assert wav_pcm16_samples(bytes(bad2)) is None
        # data chunk shorter than one block
        wav3, _ = encode_ima_wav(_sine(33, 1, 8))
        data_hdr = wav3.rindex(b"data")
        short = wav3[: data_hdr + 8 + 3]
        assert wav_pcm16_samples(short) is None

    def test_fuzz_never_raises(self):
        wav, _ = encode_ima_wav(_sine(66, 2, 9), samples_per_block=33)
        g = np.random.default_rng(10)
        for _ in range(200):
            buf = bytearray(wav)
            for _ in range(int(g.integers(1, 6))):
                buf[int(g.integers(0, len(buf)))] = int(g.integers(0, 256))
            out = wav_pcm16_samples(bytes(buf))
            assert out is None or out.dtype == np.int16
