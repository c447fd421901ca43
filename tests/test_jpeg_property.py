"""Property-based coverage for jpeg_pixels: ANY small image, any
dimensions (including non-multiples of 8/16), any chroma subsampling,
restart intervals on/off — encode with the independent test encoder and
the decode must land within the quantization-noise bound."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from fluent_plugin_sql_spark.operators.multimodal import jpeg_pixels

from test_jpeg_decode import Q1, encode_jpeg


@st.composite
def images(draw, max_dim=25):
    h = draw(st.integers(1, max_dim))
    w = draw(st.integers(1, max_dim))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    # mid-range values keep every AC category within the encoder's
    # size<=10 table for q=1; decoder correctness is range-independent
    return rng.integers(64, 192, (h, w, 3)).astype(np.uint8)


@settings(max_examples=25, deadline=None)
@given(images(), st.booleans())
def test_rgb_444_roundtrip_any_dims(img, use_restart):
    payload = encode_jpeg(img, Q1, restart=3 if use_restart else 0)
    arr = jpeg_pixels(payload)
    assert arr is not None
    assert arr.shape == img.shape
    assert np.max(np.abs(arr.astype(int) - img.astype(int))) <= 4


@settings(max_examples=15, deadline=None)
@given(images(max_dim=20), st.sampled_from([(2, 1), (1, 2), (2, 2)]))
def test_subsampled_dims_and_luma(img, subsample):
    """Chroma decimation loses color detail but never geometry or luma:
    output dims must match exactly and the luma channel (Y is carried at
    full resolution) must survive the YCbCr round trip."""
    arr = jpeg_pixels(encode_jpeg(img, Q1, subsample=subsample))
    assert arr is not None
    assert arr.shape == img.shape
    y_in = (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    )
    y_out = (
        0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    )
    assert np.max(np.abs(y_in - y_out)) <= 6


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 25), st.integers(1, 25), st.integers(0, 255))
def test_gray_constant_exact_any_dims(h, w, v):
    img = np.full((h, w), v, np.uint8)
    arr = jpeg_pixels(encode_jpeg(img, Q1, gray=True))
    assert arr is not None and arr.shape == (h, w, 3)
    assert np.all(arr == v)


@settings(max_examples=20, deadline=None)
@given(images(max_dim=16), st.integers(0, 400))
def test_truncation_never_crashes(img, cut):
    """Any prefix of a valid stream: decode returns an array or None,
    never raises — the drop-row contract of non-strict pipelines."""
    payload = encode_jpeg(img, Q1)
    out = jpeg_pixels(payload[: min(cut, len(payload))])
    assert out is None or out.shape == (*img.shape[:2], 3)


def test_huge_claimed_dims_rejected_without_allocation():
    """A corrupt SOF claiming 65535x65535 must return None fast instead
    of reserving a multi-GiB coefficient store."""
    img = np.full((8, 8, 3), 100, np.uint8)
    payload = bytearray(encode_jpeg(img, Q1))
    i = payload.index(bytes([0xFF, 0xC0]))
    payload[i + 5 : i + 9] = b"\xff\xff\xff\xff"  # h = w = 65535
    assert jpeg_pixels(bytes(payload)) is None


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_fuzz_byte_mutations_never_raise(seed):
    """Random single-byte corruptions of a valid stream: decode returns
    an array or None, never raises and never explodes memory — the
    non-strict drop contract under hostile inputs."""
    rng = np.random.default_rng(seed)
    img = rng.integers(64, 192, (16, 16, 3)).astype(np.uint8)
    payload = bytearray(encode_jpeg(img, Q1))
    for _ in range(40):
        p = bytearray(payload)
        pos = int(rng.integers(0, len(p)))
        p[pos] = int(rng.integers(0, 256))
        out = jpeg_pixels(bytes(p))
        assert out is None or out.ndim == 3
