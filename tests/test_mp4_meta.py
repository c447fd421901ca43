"""MP4/ISO-BMFF metadata walk: exact field recovery, version-1 boxes,
largesize/size-0 boxes, truncation + corruption fuzz (never raises),
and the operator's strict/drop contract."""

from __future__ import annotations

import struct

import pytest

from fluent_plugin_sql_spark.operators.multimodal import (
    parse_mp4_meta,
    video_container_meta,
)
from fluent_plugin_sql_spark.plans.functions_surface import (
    _mp4_box,
    _mp4_bytes,
)


class TestParse:
    def test_exact_fields(self):
        p = _mp4_bytes(640, 360, 12345, codec=b"avc1", brand=b"isom",
                       n_audio_tracks=2)
        m = parse_mp4_meta(p)
        assert m == {
            "major_brand": "isom",
            "duration_ms": 12345,
            "n_tracks": 3,
            "width": 640,
            "height": 360,
            "codec": "avc1",
        }

    def test_audio_only_file(self):
        # video trak degenerated to 0×0 → no dims; codec still reported
        p = _mp4_bytes(0, 0, 777, codec=b"mp4a")
        m = parse_mp4_meta(p)
        assert m["width"] is None and m["height"] is None
        assert m["codec"] == "mp4a"
        assert m["duration_ms"] == 777

    def test_version1_mvhd_and_tkhd(self):
        # hand-build v1 boxes: 64-bit times/duration
        mvhd = bytearray(112)
        mvhd[0] = 1
        struct.pack_into(">I", mvhd, 20, 90000)  # timescale
        struct.pack_into(">Q", mvhd, 24, 90000 * 7)  # duration = 7 s
        tkhd = bytearray(96)
        tkhd[0] = 1
        struct.pack_into(">I", tkhd, 88, 1920 << 16)
        struct.pack_into(">I", tkhd, 92, 1080 << 16)
        entry = struct.pack(">I", 16) + b"hvc1" + bytes(8)
        stsd = _mp4_box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        trak = _mp4_box(
            b"trak",
            _mp4_box(b"tkhd", bytes(tkhd))
            + _mp4_box(b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd))),
        )
        moov = _mp4_box(b"moov", _mp4_box(b"mvhd", bytes(mvhd)) + trak)
        p = _mp4_box(b"ftyp", b"mp42" + bytes(4)) + moov
        m = parse_mp4_meta(p)
        assert m["duration_ms"] == 7000
        assert (m["width"], m["height"]) == (1920, 1080)
        assert m["codec"] == "hvc1"

    def test_largesize_box(self):
        inner = _mp4_bytes(32, 16, 500)
        moov_idx = inner.index(b"moov") - 4
        # wrap the ftyp in a 64-bit-size box form: size=1 + largesize
        ftyp_body = b"isom" + bytes(4)
        big_ftyp = (
            struct.pack(">I", 1)
            + b"ftyp"
            + struct.pack(">Q", 16 + len(ftyp_body))
            + ftyp_body
        )
        p = big_ftyp + inner[moov_idx:]
        m = parse_mp4_meta(p)
        assert m["major_brand"] == "isom"
        assert m["duration_ms"] == 500

    def test_size_zero_extends_to_eof(self):
        p = _mp4_bytes(32, 16, 500)
        moov_idx = p.index(b"moov") - 4
        patched = bytearray(p)
        struct.pack_into(">I", patched, moov_idx, 0)  # moov: to EOF
        m = parse_mp4_meta(bytes(patched[: moov_idx + 8 + 108 + 200]))
        assert m is not None
        assert m["duration_ms"] == 500

    def test_non_bmff_returns_none(self):
        assert parse_mp4_meta(b"\x89PNG\r\n\x1a\nrest") is None
        assert parse_mp4_meta(b"") is None
        assert parse_mp4_meta(None) is None
        assert parse_mp4_meta(b"RIFF\x00\x00\x00\x00WAVE") is None

    def test_truncation_fuzz_never_raises(self):
        p = _mp4_bytes(48, 32, 4321, n_audio_tracks=1)
        for n in range(len(p)):
            m = parse_mp4_meta(p[:n])  # must not raise
            assert m is None or isinstance(m, dict)

    def test_corruption_fuzz_never_raises(self):
        import random

        rng = random.Random(42)
        p = _mp4_bytes(48, 32, 4321, n_audio_tracks=2)
        for _ in range(300):
            b = bytearray(p)
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            m = parse_mp4_meta(bytes(b))
            assert m is None or isinstance(m, dict)

    def test_garbage_size_fields_never_raise(self):
        p = bytearray(_mp4_bytes(48, 32, 4321))
        struct.pack_into(">I", p, 0, 7)  # size < 8
        assert parse_mp4_meta(bytes(p)) is None or True
        p2 = bytearray(_mp4_bytes(48, 32, 4321))
        struct.pack_into(">I", p2, 0, 2**31)  # size beyond EOF
        parse_mp4_meta(bytes(p2))  # must not raise


class TestOperator:
    def test_strict_and_drop(self, spark):
        rows = [
            (1, _mp4_bytes(64, 48, 100)),
            (2, b"not a video"),
            (3, _mp4_bytes(128, 96, 200, codec=b"vp09", brand=b"mp42")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r.doc_id: r for r in video_container_meta(df).collect()}
        assert set(got) == {1, 3}
        assert (got[1].width, got[1].height, got[1].duration_ms) == (64, 48, 100)
        assert got[3].codec == "vp09" and got[3].major_brand == "mp42"
        with pytest.raises(Exception, match="ISO-BMFF"):
            video_container_meta(df, strict=True).collect()
