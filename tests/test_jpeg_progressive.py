"""Progressive JPEG decode (SOF2: spectral selection + successive
approximation, T.81 annex G) against an INDEPENDENT progressive encoder
written here.  The strongest assertion available: the progressive
encoder quantizes with the same block math as the baseline test encoder,
so `jpeg_pixels(progressive_stream)` must be BIT-IDENTICAL to
`jpeg_pixels(sequential_stream)` of the same image — any drift in DC
point-transform handling, EOB-run bookkeeping, or refinement correction
bits breaks exact equality."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.multimodal import jpeg_pixels

from test_jpeg_decode import (
    Q1,
    ZIGZAG,
    _BitWriter,
    _category,
    _fixed_table,
    _plane_blocks,
    _seg,
    _dht,
    encode_jpeg,
)

DC_SYMS = list(range(12))
# progressive AC alphabet: EOBn (r 0-14), ZRL, and (run, size 1-10)
PROG_AC_SYMS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)


def _prep_components(rgb, qy, qc, subsample, gray):
    """Same color/subsample/quantize pipeline as the baseline encoder —
    per component: (zigzag-quantized blocks on the padded MCU grid,
    full-grid block width, true block dims (bw, bh), sampling)."""
    qc = qy if qc is None else qc
    if gray:
        y = rgb.astype(np.float64) if rgb.ndim == 2 else rgb[:, :, 0].astype(np.float64)
        planes = [np.clip(np.round(y), 0, 255)]
        samps = [(1, 1)]
        qts = [qy]
    else:
        r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        sh, sv = subsample
        if (sh, sv) != (1, 1):
            h0, w0 = y.shape
            ph, pw = -(-h0 // sv) * sv, -(-w0 // sh) * sh

            def down(p):
                p = np.pad(p, ((0, ph - h0), (0, pw - w0)), mode="edge")
                return p.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))

            cb, cr = down(cb), down(cr)
        planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
        samps = [subsample, (1, 1), (1, 1)]
        qts = [qy, qc, qc]

    h, w = planes[0].shape
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    comps = []
    for p, (chs, cvs), q in zip(planes, samps, qts):
        want_bx, want_by = mcus_x * chs, mcus_y * cvs
        ph0, pw0 = p.shape
        full = np.pad(
            p, ((0, want_by * 8 - ph0), (0, want_bx * 8 - pw0)), mode="edge"
        )
        blocks, bx = _plane_blocks(full, q)
        bw, bh = -(-pw0 // 8), -(-ph0 // 8)
        comps.append((blocks, want_bx, bw, bh, (chs, cvs)))
    return comps, h, w, mcus_x, mcus_y, qts, samps


def _sos(scan_entries, ss, se, ah, al):
    body = bytearray([len(scan_entries)])
    for cid, td, ta in scan_entries:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, bytes(body))


def _rst(wtr, counter):
    wtr.align()
    wtr.out.append(0xFF)
    wtr.out.append(0xD0 + counter % 8)


def _emit_dc_first(wtr, comps, mcus_x, mcus_y, al, dc_codes, restart=0):
    preds = [0] * len(comps)
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart and mcu and mcu % restart == 0:
            _rst(wtr, rst)
            rst += 1
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, (blocks, bxf, _bw, _bh, (chs, cvs)) in enumerate(comps):
            for by in range(cvs):
                for bx in range(chs):
                    bi = (my * cvs + by) * bxf + (mx * chs + bx)
                    dc = int(blocks[bi][0]) >> al  # arithmetic point transform
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    t = _category(abs(diff))
                    code, ln = dc_codes[t]
                    wtr.put(code, ln)
                    if t:
                        wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _emit_dc_refine(wtr, comps, mcus_x, mcus_y, al, restart=0):
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart and mcu and mcu % restart == 0:
            _rst(wtr, rst)
            rst += 1
        my, mx = divmod(mcu, mcus_x)
        for blocks, bxf, _bw, _bh, (chs, cvs) in comps:
            for by in range(cvs):
                for bx in range(chs):
                    bi = (my * cvs + by) * bxf + (mx * chs + bx)
                    wtr.put((int(blocks[bi][0]) >> al) & 1, 1)


def _block_indices(comp):
    """True (non-padded) block walk order for non-interleaved scans."""
    _blocks, bxf, bw, bh, _s = comp
    return [by * bxf + bx for by in range(bh) for bx in range(bw)]


def _emit_ac_first(wtr, comp, ss, se, al, ac_codes, restart=0):
    blocks = comp[0]
    eob_run = 0
    rst = 0

    def flush():
        nonlocal eob_run
        if eob_run:
            r = eob_run.bit_length() - 1
            code, ln = ac_codes[r << 4]
            wtr.put(code, ln)
            if r:
                wtr.put(eob_run - (1 << r), r)
            eob_run = 0

    for unit, bi in enumerate(_block_indices(comp)):
        if restart and unit and unit % restart == 0:
            flush()
            _rst(wtr, rst)
            rst += 1
        czz = blocks[bi]
        tv = []
        for k in range(ss, se + 1):
            v = int(czz[k])
            tv.append((abs(v) >> al) * (1 if v >= 0 else -1))
        last_nz = -1
        for i, v in enumerate(tv):
            if v:
                last_nz = i
        if last_nz < 0:
            eob_run += 1
            if eob_run == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for i in range(last_nz + 1):
            v = tv[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                code, ln = ac_codes[0xF0]
                wtr.put(code, ln)
                r -= 16
            s = abs(v).bit_length()
            assert s <= 10
            code, ln = ac_codes[(r << 4) | s]
            wtr.put(code, ln)
            wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if last_nz < se - ss:
            eob_run += 1
            if eob_run == 0x7FFF:
                flush()
    flush()


def _emit_ac_refine(wtr, comp, ss, se, al, ac_codes, restart=0):
    blocks = comp[0]
    eob_run = 0
    rst = 0
    pending: list[int] = []

    def flush():
        nonlocal eob_run, pending
        if eob_run:
            r = eob_run.bit_length() - 1
            code, ln = ac_codes[r << 4]
            wtr.put(code, ln)
            if r:
                wtr.put(eob_run - (1 << r), r)
            for b in pending:
                wtr.put(b, 1)
            pending = []
            eob_run = 0

    for unit, bi in enumerate(_block_indices(comp)):
        if restart and unit and unit % restart == 0:
            flush()
            _rst(wtr, rst)
            rst += 1
        czz = blocks[bi]
        vals = [int(czz[k]) for k in range(ss, se + 1)]
        absv = [abs(v) >> al for v in vals]
        r = 0
        br: list[int] = []
        for i, v in enumerate(vals):
            a = absv[i]
            if a == 0:
                r += 1
                continue
            if a > 1:  # already significant: one correction bit
                br.append(a & 1)
                continue
            # newly significant (magnitude exactly 1 at this level)
            flush()  # deferred EOB run from prior blocks goes first
            while r > 15:
                code, ln = ac_codes[0xF0]
                wtr.put(code, ln)
                for b in br:
                    wtr.put(b, 1)
                br = []
                r -= 16
            code, ln = ac_codes[(r << 4) | 1]
            wtr.put(code, ln)
            wtr.put(1 if v > 0 else 0, 1)
            for b in br:
                wtr.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eob_run += 1
            pending.extend(br)
            if eob_run == 0x7FFF:
                flush()
    flush()


def encode_jpeg_progressive(
    rgb,
    qy,
    qc=None,
    subsample=(1, 1),
    gray=False,
    dc_al=0,
    ac_al=0,
    bands=((1, 5), (6, 63)),
    restart=0,
):
    """Minimal progressive (SOF2) encoder: interleaved DC first scan at
    ``dc_al``, DC refinement scans down to bit 0, then per-component AC
    band scans at ``ac_al`` with EOB-run coding, then AC refinement
    scans down to bit 0."""
    comps, h, w, mcus_x, mcus_y, qts, samps = _prep_components(
        rgb, qy, qc, subsample, gray
    )
    dc_counts, dc_syms, dc_codes = _fixed_table(DC_SYMS, 4)
    ac_counts, ac_syms, ac_codes = _fixed_table(PROG_AC_SYMS, 8)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(qts[0][z]) for z in ZIGZAG))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(int(qts[1][z]) for z in ZIGZAG))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for ci, (chs, cvs) in enumerate(samps):
        sof += bytes([ci + 1, (chs << 4) | cvs, 0 if ci == 0 else 1])
    out += _seg(0xC2, bytes(sof))
    out += _dht(0, 0, dc_counts, dc_syms)
    out += _dht(1, 0, ac_counts, ac_syms)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))

    def scan(entries, ss, se, ah, al, emit):
        nonlocal out
        out += _sos(entries, ss, se, ah, al)
        wtr = _BitWriter()
        emit(wtr)
        wtr.align()
        out += wtr.out

    all_entries = [(ci + 1, 0, 0) for ci in range(len(comps))]
    # DC: first pass at dc_al, then refinements down to bit 0
    scan(
        all_entries, 0, 0, 0, dc_al,
        lambda wtr: _emit_dc_first(
            wtr, comps, mcus_x, mcus_y, dc_al, dc_codes, restart
        ),
    )
    for level in range(dc_al - 1, -1, -1):
        scan(
            all_entries, 0, 0, level + 1, level,
            lambda wtr, lv=level: _emit_dc_refine(
                wtr, comps, mcus_x, mcus_y, lv, restart
            ),
        )
    # AC: per component, spectral bands at ac_al, then refinements
    for ci, comp in enumerate(comps):
        for ss, se in bands:
            scan(
                [(ci + 1, 0, 0)], ss, se, 0, ac_al,
                lambda wtr, c=comp, a=ss, b=se: _emit_ac_first(
                    wtr, c, a, b, ac_al, ac_codes, restart
                ),
            )
    for level in range(ac_al - 1, -1, -1):
        for ci, comp in enumerate(comps):
            for ss, se in bands:
                scan(
                    [(ci + 1, 0, 0)], ss, se, level + 1, level,
                    lambda wtr, c=comp, a=ss, b=se, lv=level: _emit_ac_refine(
                        wtr, c, a, b, lv, ac_codes, restart
                    ),
                )
    out += b"\xff\xd9"
    return bytes(out)


def _rng(seed):
    return np.random.default_rng(seed)


class TestProgressiveDecode:
    def test_spectral_selection_only_gray(self):
        img = np.linspace(0, 255, 24 * 17).reshape(24, 17).astype(np.uint8)
        seq = jpeg_pixels(encode_jpeg(img, Q1, gray=True))
        prog = jpeg_pixels(encode_jpeg_progressive(img, Q1, gray=True))
        assert prog is not None
        assert np.array_equal(prog, seq)

    def test_spectral_selection_only_rgb(self):
        img = _rng(2).integers(80, 176, (21, 19, 3)).astype(np.uint8)
        seq = jpeg_pixels(encode_jpeg(img, Q1))
        prog = jpeg_pixels(encode_jpeg_progressive(img, Q1))
        assert np.array_equal(prog, seq)

    def test_many_bands(self):
        img = _rng(3).integers(80, 176, (16, 16, 3)).astype(np.uint8)
        seq = jpeg_pixels(encode_jpeg(img, Q1))
        prog = jpeg_pixels(
            encode_jpeg_progressive(
                img, Q1, bands=((1, 2), (3, 8), (9, 20), (21, 63))
            )
        )
        assert np.array_equal(prog, seq)

    def test_dc_successive_approximation(self):
        img = _rng(5).integers(0, 256, (16, 24, 3)).astype(np.uint8)
        seq = jpeg_pixels(encode_jpeg(img, Q1))
        prog = jpeg_pixels(encode_jpeg_progressive(img, Q1, dc_al=2))
        assert np.array_equal(prog, seq)

    def test_ac_successive_approximation(self):
        img = _rng(7).integers(90, 166, (16, 16, 3)).astype(np.uint8)
        seq = jpeg_pixels(encode_jpeg(img, Q1))
        prog = jpeg_pixels(encode_jpeg_progressive(img, Q1, ac_al=1))
        assert np.array_equal(prog, seq)

    def test_full_progression(self):
        img = _rng(11).integers(70, 186, (24, 21, 3)).astype(np.uint8)
        seq = jpeg_pixels(encode_jpeg(img, Q1))
        prog = jpeg_pixels(
            encode_jpeg_progressive(img, Q1, dc_al=1, ac_al=2)
        )
        assert np.array_equal(prog, seq)

    def test_chroma_subsampled_progressive(self):
        tiles = _rng(13).integers(60, 196, (2, 2, 3)).astype(np.uint8)
        img = np.repeat(np.repeat(tiles, 16, axis=0), 16, axis=1)
        seq = jpeg_pixels(encode_jpeg(img, Q1, subsample=(2, 2)))
        prog = jpeg_pixels(
            encode_jpeg_progressive(img, Q1, subsample=(2, 2), dc_al=1, ac_al=1)
        )
        assert np.array_equal(prog, seq)

    def test_subsampled_odd_dims(self):
        """4:2:0 with dims not multiples of 16: the luma AC scans cover
        ceil(w/8) x ceil(h/8) true blocks, NOT the padded MCU grid —
        the non-interleaved geometry the spec mandates."""
        img = np.full((19, 23, 3), (10, 200, 99), np.uint8)
        seq = jpeg_pixels(encode_jpeg(img, Q1, subsample=(2, 2)))
        prog = jpeg_pixels(
            encode_jpeg_progressive(img, Q1, subsample=(2, 2), ac_al=1)
        )
        assert prog.shape == (19, 23, 3)
        assert np.array_equal(prog, seq)

    def test_eob_runs_across_blocks(self):
        """A mostly-flat image with one busy corner: long runs of
        all-zero AC bands across consecutive blocks force EOBn > 1
        symbols with extra bits (and, in refinement, deferred
        correction-bit buffers)."""
        img = np.full((40, 40), 128, np.uint8)
        img[:8, :8] = _rng(17).integers(0, 256, (8, 8)).astype(np.uint8)
        seq = jpeg_pixels(encode_jpeg(img, Q1, gray=True))
        prog = jpeg_pixels(
            encode_jpeg_progressive(img, Q1, gray=True, ac_al=1)
        )
        assert np.array_equal(prog, seq)

    def test_coarse_quant_progressive(self):
        q = np.full(64, 8, np.int32)
        img = _rng(19).integers(0, 256, (24, 24, 3)).astype(np.uint8)
        seq = jpeg_pixels(encode_jpeg(img, q))
        prog = jpeg_pixels(encode_jpeg_progressive(img, q, dc_al=1, ac_al=1))
        assert np.array_equal(prog, seq)

    def test_truncated_progressive_rejected(self):
        img = _rng(23).integers(0, 256, (16, 16, 3)).astype(np.uint8)
        payload = encode_jpeg_progressive(img, Q1, ac_al=1)
        assert jpeg_pixels(payload[: len(payload) // 3]) is None

    def test_header_reports_progressive_dims(self):
        from fluent_plugin_sql_spark.operators.multimodal import (
            parse_image_header,
        )

        img = np.zeros((9, 31, 3), np.uint8)
        payload = encode_jpeg_progressive(img, Q1)
        assert parse_image_header(payload) == ("jpeg", 31, 9, 3)


class TestProgressiveRestart:
    def test_restart_intervals_all_scan_kinds(self):
        """DRI + RST markers inside every progressive scan kind
        (DC first, DC refine, AC first, AC refine): predictors and
        EOB-runs reset at each segment, and the result must still be
        bit-identical to the sequential encoding."""
        img = _rng(31).integers(70, 186, (24, 40, 3)).astype(np.uint8)
        seq = jpeg_pixels(encode_jpeg(img, Q1))
        prog = jpeg_pixels(
            encode_jpeg_progressive(img, Q1, dc_al=1, ac_al=1, restart=3)
        )
        assert prog is not None
        assert np.array_equal(prog, seq)

    def test_restart_with_flat_regions_eobrun_reset(self):
        """EOB-runs may never span a restart boundary: a mostly-flat
        image guarantees long runs that the interval chops up."""
        img = np.full((32, 64), 128, np.uint8)
        img[:8, :8] = _rng(37).integers(0, 256, (8, 8)).astype(np.uint8)
        img[24:, 56:] = _rng(41).integers(0, 256, (8, 8)).astype(np.uint8)
        seq = jpeg_pixels(encode_jpeg(img, Q1, gray=True))
        prog = jpeg_pixels(
            encode_jpeg_progressive(img, Q1, gray=True, ac_al=1, restart=2)
        )
        assert np.array_equal(prog, seq)
