"""Property-based coverage (hypothesis) for the round-8 additions:
the full PNM family, the WAV PCM depth matrix, and k-means driver-side
invariants.  All decoder properties run WITHOUT Spark (pure function
level), so hypothesis can afford hundreds of examples."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fluent_plugin_sql_spark.operators.multimodal import (
    _read_pixels,
    parse_image_header,
    wav_pcm16_samples,
)

# ------------------------------------------------------------------ PNM


@settings(max_examples=120, deadline=None)
@given(
    w=st.integers(1, 17),
    h=st.integers(1, 13),
    maxval=st.integers(1, 65535),
    rgb=st.booleans(),
    comment=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_pnm_p5_p6_roundtrip_any_maxval(w, h, maxval, rgb, comment, seed):
    g = np.random.default_rng(seed)
    ch = 3 if rgb else 1
    vals = g.integers(0, maxval + 1, (h, w, ch))
    magic = b"P6" if rgb else b"P5"
    head = magic + (b"\n# c\n" if comment else b"\n")
    head += b"%d %d\n%d\n" % (w, h, maxval)
    if maxval <= 255:
        body = vals.astype(np.uint8).tobytes()
    else:
        body = vals.astype(">u2").tobytes()
    payload = head + body
    parsed = parse_image_header(payload)
    assert parsed == ("ppm" if rgb else "pgm", w, h, ch)
    out = _read_pixels(payload)
    assert out is not None and out.shape == (h, w, 3)
    expect = np.round(vals.astype(np.float64) * (255.0 / maxval))
    expect = expect.astype(np.uint8)
    if not rgb:
        expect = np.repeat(expect, 3, axis=2)
    np.testing.assert_array_equal(out, expect)


@settings(max_examples=80, deadline=None)
@given(
    w=st.integers(1, 30),
    h=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_pnm_p4_roundtrip_row_padding(w, h, seed):
    g = np.random.default_rng(seed)
    bits = g.integers(0, 2, (h, w)).astype(np.uint8)
    payload = b"P4\n%d %d\n" % (w, h) + np.packbits(bits, axis=1).tobytes()
    out = _read_pixels(payload)
    assert out is not None and out.shape == (h, w, 3)
    np.testing.assert_array_equal(out[:, :, 0], (1 - bits) * 255)


@settings(max_examples=150, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_pnm_arbitrary_bytes_never_raise(data):
    for magic in (b"P4", b"P5", b"P6"):
        out = _read_pixels(magic + data)
        assert out is None or out.dtype == np.uint8


# ------------------------------------------------------------------ WAV


def _wav(fmt_tag, bits, data, channels, extensible):
    block = max(1, channels * bits // 8)
    if extensible:
        guid = struct.pack("<H", fmt_tag) + b"\x00\x00" + bytes(12)
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, channels, 8000, 8000 * block, block,
            bits, 22, bits, 0,
        ) + guid
    else:
        fmt = struct.pack(
            "<HHIIHH", fmt_tag, channels, 8000, 8000 * block, block, bits
        )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@settings(max_examples=120, deadline=None)
@given(
    depth=st.sampled_from([8, 16, 24, 32]),
    channels=st.integers(1, 3),
    n=st.integers(0, 50),
    extensible=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_pcm_depths_roundtrip(depth, channels, n, extensible, seed):
    g = np.random.default_rng(seed)
    total = n * channels
    if depth == 8:
        raw = g.integers(0, 256, total).astype(np.uint8)
        data = raw.tobytes()
        expect = (raw.astype(np.int16) - 128) << 8
    elif depth == 16:
        raw = g.integers(-(1 << 15), 1 << 15, total).astype(np.int16)
        data = raw.astype("<i2").tobytes()
        expect = raw
    elif depth == 24:
        raw = g.integers(-(1 << 23), 1 << 23, total).astype(np.int64)
        data = b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in raw
        )
        expect = (raw >> 8).astype(np.int16)
    else:
        raw = g.integers(-(1 << 31), 1 << 31, total).astype(np.int64)
        data = b"".join(struct.pack("<i", int(v)) for v in raw)
        expect = (raw >> 16).astype(np.int16)
    sm = wav_pcm16_samples(_wav(1, depth, data, channels, extensible))
    assert sm is not None and sm.shape == (n, channels)
    np.testing.assert_array_equal(sm.reshape(-1), expect)


@settings(max_examples=80, deadline=None)
@given(
    n=st.integers(0, 40),
    channels=st.integers(1, 2),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_float32_bounded_and_monotone(n, channels, seed):
    g = np.random.default_rng(seed)
    f = (g.normal(0, 1.2, n * channels)).astype("<f4")
    sm = wav_pcm16_samples(_wav(3, 32, f.tobytes(), channels, False))
    assert sm.shape == (n, channels)
    flat = sm.reshape(-1).astype(np.int64)
    assert abs(flat).max(initial=0) <= 32767
    # clipping preserves order: sort order of inputs matches outputs
    order_in = np.argsort(f.astype(np.float64), kind="stable")
    assert (np.diff(flat[order_in]) >= 0).all()


@settings(max_examples=150, deadline=None)
@given(data=st.binary(min_size=0, max_size=150))
def test_wav_arbitrary_tail_never_raises(data):
    out = wav_pcm16_samples(b"RIFF\x00\x01\x00\x00WAVE" + data)
    assert out is None or out.dtype == np.int16
