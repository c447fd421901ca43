"""Image-quality curation signals (operators/multimodal.
image_quality_features): Laplacian-variance sharpness, Hasler-Süsstrunk
colorfulness, brightness/contrast — verified against closed forms on
constructed images (uniform → all zeros; linear ramp → zero Laplacian;
checkerboard → exact interior Laplacian ±8A) and against a direct
numpy re-derivation on random photos."""

from __future__ import annotations

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.multimodal import (
    image_quality_features,
)


def ppm(px):
    h, w = px.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


def _run(spark, images):
    df = spark.createDataFrame(
        [(i, bytearray(ppm(im))) for i, im in enumerate(images)],
        "doc_id long, payload binary",
    )
    out = image_quality_features(df, strict=True)
    return {r.doc_id: r for r in out.collect()}


@pytest.mark.usefixtures("spark")
class TestImageQuality:
    def test_uniform_image_all_zero(self, spark):
        im = np.full((8, 10, 3), 77, np.uint8)
        r = _run(spark, [im])[0]
        assert (r.width, r.height) == (10, 8)
        assert r.brightness == 77.0
        assert r.contrast == 0.0
        assert r.sharpness == 0.0
        assert r.colorfulness == 0.0

    def test_linear_ramp_has_zero_laplacian(self, spark):
        # gray ramp: gradient is constant, so the 4-neighbor Laplacian
        # vanishes on the interior — sharp = 0 despite contrast > 0
        ramp = np.tile(np.arange(16, dtype=np.uint8) * 10, (8, 1))
        im = np.repeat(ramp[:, :, None], 3, axis=2)
        r = _run(spark, [im])[0]
        assert r.sharpness == 0.0
        assert r.contrast > 0
        assert r.colorfulness == 0.0  # grayscale

    def test_checkerboard_exact_laplacian(self, spark):
        # ±A checkerboard: every interior Laplacian is ±8A with equal
        # mass -> variance exactly (8A)^2... mean is 0 by symmetry on
        # an even interior grid
        A = 100.0
        yy, xx = np.mgrid[0:10, 0:10]
        board = np.where((yy + xx) % 2 == 0, 128 + A / 2, 128 - A / 2)
        im = np.repeat(board[:, :, None], 3, axis=2).astype(np.uint8)
        r = _run(spark, [im])[0]
        # interior Laplacian = 4c - 4*opposite = ±4A... with all four
        # neighbors opposite-colored: 4*(c - opp) = ±4A
        lap_mag = 4 * A
        assert abs(r.sharpness - lap_mag**2) < 1e-6

    def test_matches_numpy_reference_on_photos(self, spark):
        g = np.random.default_rng(5)
        ims = [g.integers(0, 256, (12, 14, 3)).astype(np.uint8)
               for _ in range(3)]
        got = _run(spark, ims)
        for i, im in enumerate(ims):
            f = im.astype(np.float64)
            gray = f.mean(axis=2)
            lap = (4 * gray[1:-1, 1:-1] - gray[:-2, 1:-1] - gray[2:, 1:-1]
                   - gray[1:-1, :-2] - gray[1:-1, 2:])
            rg = f[:, :, 0] - f[:, :, 1]
            yb = 0.5 * (f[:, :, 0] + f[:, :, 1]) - f[:, :, 2]
            color = np.sqrt(rg.var() + yb.var()) + 0.3 * np.sqrt(
                rg.mean() ** 2 + yb.mean() ** 2
            )
            r = got[i]
            assert r.brightness == round(float(gray.mean()), 6)
            assert r.contrast == round(float(gray.std()), 6)
            assert r.sharpness == round(float(lap.var()), 6)
            assert r.colorfulness == round(float(color), 6)

    def test_tiny_image_sharpness_zero(self, spark):
        im = np.full((2, 2, 3), 9, np.uint8)
        r = _run(spark, [im])[0]
        assert r.sharpness == 0.0  # no interior pixels

    def test_strict_and_drop_contract(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"\x00garbage"))], "doc_id long, payload binary"
        )
        assert image_quality_features(df, strict=False).count() == 0
        with pytest.raises(Exception):
            image_quality_features(df, strict=True).collect()
