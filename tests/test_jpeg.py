"""Baseline JPEG codec (operators/jpeg.py) — round trips, marker
handling, subsampling, restart intervals, and multimodal dispatch.

The encoder and decoder are independent implementations of ITU-T T.81
baseline (encoder emits its tables in DQT/DHT; decoder trusts only the
file), so a round trip exercises both directions of the format for
real: markers, canonical Huffman, byte stuffing, zigzag, quantization,
DCT. Fidelity is asserted as PSNR floors per quality level.
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_python_sqlite_spark.operators import jpeg as J
from etl_python_sqlite_spark.operators import multimodal as M


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else float(10 * np.log10(255.0**2 / mse))


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 4) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)


def _smoothish(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.clip(
        128 + 60 * np.sin(xx / 7.0) + 50 * np.cos(yy / 5.0)
        + rng.normal(0, 4, (h, w)),
        0, 255,
    )
    return np.stack(
        [base, np.clip(base * 0.8 + 20, 0, 255), np.clip(255 - base, 0, 255)],
        axis=-1,
    ).astype(np.uint8)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("quality,floor", [(95, 30.0), (75, 28.0)])
def test_roundtrip_psnr(sub, quality, floor):
    img = _smoothish(40, 56)
    blob = J.encode_jpeg(img, quality=quality, subsampling=sub)
    dec = J.decode_jpeg(blob)
    assert (dec.width, dec.height) == (56, 40)
    assert dec.pixels.shape == (40, 56, 3) and dec.pixels.dtype == np.uint8
    assert _psnr(img, dec.pixels) >= floor


def test_quality_monotone_size():
    img = _smoothish(48, 48)
    sizes = [len(J.encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_444_beats_420_on_chroma_detail():
    img = _gradient(32, 32)  # saturated per-channel ramps = chroma detail
    d444 = J.decode_jpeg(J.encode_jpeg(img, quality=90, subsampling="4:4:4"))
    d420 = J.decode_jpeg(J.encode_jpeg(img, quality=90, subsampling="4:2:0"))
    assert _psnr(img, d444.pixels) > _psnr(img, d420.pixels)


def test_restart_intervals_equivalent():
    """RSTn markers change the byte stream but not the decoded pixels."""
    img = _smoothish(40, 40, seed=3)
    plain = J.decode_jpeg(J.encode_jpeg(img, quality=85)).pixels
    for ri in (1, 2, 5):
        blob = J.encode_jpeg(img, quality=85, restart_interval=ri)
        assert bytes((0xFF, 0xD0)) in blob  # at least one RST0
        assert (J.decode_jpeg(blob).pixels == plain).all()
    blob420 = J.encode_jpeg(img, quality=85, subsampling="4:2:0",
                            restart_interval=2)
    ref420 = J.decode_jpeg(
        J.encode_jpeg(img, quality=85, subsampling="4:2:0")
    ).pixels
    assert (J.decode_jpeg(blob420).pixels == ref420).all()


def test_grayscale_single_component():
    yy, xx = np.mgrid[0:24, 0:40]
    g = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    blob = J.encode_jpeg(g, quality=90)
    dec = J.decode_jpeg(blob)
    assert dec.n_components == 1
    assert dec.pixels.shape == (24, 40, 3)
    # channels replicated
    assert (dec.pixels[..., 0] == dec.pixels[..., 1]).all()
    assert _psnr(np.stack([g, g, g], axis=-1), dec.pixels) >= 35.0


@pytest.mark.parametrize("h,w", [(1, 1), (7, 9), (17, 16), (8, 8), (15, 31)])
@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_non_multiple_of_mcu_dimensions(h, w, sub):
    rng = np.random.default_rng(h * 100 + w)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=90, subsampling=sub))
    assert (dec.width, dec.height) == (w, h)
    assert dec.pixels.shape == (h, w, 3)


def test_flat_color_is_near_exact():
    img = np.full((16, 16, 3), 77, np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    assert np.abs(dec.pixels.astype(int) - 77).max() <= 2


def test_markers_and_structure():
    blob = J.encode_jpeg(_gradient(16, 16), quality=80)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in blob
    assert b"\xff\xdb" in blob and b"\xff\xc0" in blob
    assert b"\xff\xc4" in blob and b"\xff\xda" in blob


def test_decoder_reads_tables_from_file_not_defaults():
    """Quality changes the DQT in the stream; the decoder must dequantize
    with the stream's table (a default-table decoder would be wildly off
    at q=30)."""
    img = _smoothish(32, 32, seed=11)
    lo = J.decode_jpeg(J.encode_jpeg(img, quality=30)).pixels
    hi = J.decode_jpeg(J.encode_jpeg(img, quality=95)).pixels
    assert _psnr(img, hi) > _psnr(img, lo) > 20.0


def test_unsupported_process_and_bad_input_gates():
    # arithmetic-coded (SOF9/SOF10) stays honestly gated; SOF2 decodes now
    with pytest.raises(NotImplementedError, match="SOF9"):
        J.decode_jpeg(b"\xff\xd8\xff\xc9\x00\x10" + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="SOF10"):
        J.decode_jpeg(b"\xff\xd8\xff\xca\x00\x10" + b"\x00" * 16)
    with pytest.raises(ValueError):
        J.decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\xff\xd8\xff\xd9")  # no scan
    # truncated scan data surfaces as ValueError, not a crash
    blob = J.encode_jpeg(_gradient(16, 16), quality=80)
    with pytest.raises(ValueError):
        J.decode_jpeg(blob[: len(blob) // 2])


def test_encode_input_validation():
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((4, 4, 3), np.float64))
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((4, 4, 3), np.uint8), subsampling="4:1:1")


def test_multimodal_dispatch():
    """decode_image and decode_media_metadata route FFD8 to the codec."""
    img = _smoothish(24, 16, seed=5)
    blob = J.encode_jpeg(img, quality=90)
    dec = M.decode_image(blob)
    assert (dec.width, dec.height) == (16, 24)
    meta = M._decode_one("image", blob)
    assert meta["format"] == "jpeg" and meta["decode_ok"]
    assert (meta["width"], meta["height"]) == (16, 24)


def test_annex_k_coverage_asserts():
    """The import-time completeness asserts really cover the encode
    alphabet (every (run, size) the baseline encoder can emit)."""
    needed = {0x00, 0xF0} | {
        (r << 4) | s for r in range(16) for s in range(1, 11)
    }
    assert needed <= set(J._AC_LUM_VALS) | {0x00}
    assert needed <= set(J._AC_CHROM_VALS)


def test_progressive_roundtrip_matches_baseline():
    """Progressive (SOF2) encode → decode must be BIT-IDENTICAL to the
    baseline decode of the same pixels at the same quality: both paths
    share the quantized coefficients, so the multi-scan spectral-
    selection + successive-approximation script (DC Al=1 → AC bands at
    Al=2/1 → DC/AC refinements) must reassemble every coefficient
    exactly. Covers gray, 4:4:4, 4:2:0, odd dims (MCU pad columns
    outside the non-interleaved AC grids), and EOB/ZRL-heavy content."""
    cases = [
        (_smoothish(16, 16)[:, :, 0], "4:4:4"),      # grayscale
        (_smoothish(24, 33, seed=3), "4:4:4"),
        (_smoothish(24, 33, seed=4), "4:2:0"),       # luma pad col ≠ grid
        (_gradient(41, 57), "4:2:0"),
        (np.zeros((8, 8, 3), np.uint8), "4:4:4"),    # all-EOB scans
        (_gradient(9, 17), "4:4:4"),
    ]
    for px, sub in cases:
        base = J.decode_jpeg(J.encode_jpeg(px, quality=85, subsampling=sub))
        blob = J.encode_jpeg(px, quality=85, subsampling=sub, progressive=True)
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob  # SOF2 frame
        prog = J.decode_jpeg(blob)
        assert prog.width == base.width and prog.height == base.height
        assert np.array_equal(prog.pixels, base.pixels)


def test_progressive_multimodal_dispatch():
    img = _smoothish(24, 16, seed=9)
    blob = J.encode_jpeg(img, quality=90, progressive=True)
    meta = M._decode_one("image", blob)
    assert meta["decode_ok"] and meta["format"] == "jpeg"
    assert (meta["width"], meta["height"]) == (16, 24)


def test_progressive_rejects_restart_intervals():
    with pytest.raises(ValueError, match="baseline"):
        J.encode_jpeg(_gradient(16, 16), progressive=True, restart_interval=2)


def test_progressive_eob_run_decoding():
    """EOBn symbols (run-of-EOBs over MULTIPLE blocks) never come out of
    our encoder (Annex-K tables lack them), so the decoder's EOB-run
    path is pinned with a hand-built stream: 3 grayscale blocks, a DC
    first scan, then an AC first scan where block 1 codes one
    coefficient and ends with EOB2 (r=1, covering block 2), and block 3
    ends with a plain EOB. Expected pixels come from the module's own
    reconstruction over hand-built coefficient planes."""
    import struct as S

    # custom Huffman tables: DC sizes {0,1,2}, AC symbols {0x00,0x10,0x02}
    dc_bits = [0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = [0, 1, 2]
    ac_bits = [0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x10, 0x02]
    dc_codes = J._canonical_codes(dc_bits, dc_vals)
    ac_codes = J._canonical_codes(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    qt = np.ones(64, np.int64)  # identity quantization
    out += b"\xff\xdb" + S.pack(">H", 67) + bytes([0])
    out += bytes(int(qt[J.ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xc2" + S.pack(">HBHHB", 11, 8, 8, 24, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc4" + S.pack(">H", 19 + 3) + bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
    out += b"\xff\xc4" + S.pack(">H", 19 + 3) + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)

    # DC first scan (Ss=0 Se=0 Ah=0 Al=0): DCs 8, 8, 12 (diffs 8, 0, 4)
    out += b"\xff\xda" + S.pack(">H", 8) + bytes([1, 1, 0x00, 0, 0, 0x00])
    bw = J._BitWriter()
    for diff in (3, 0, -1):  # sizes 2, 0, 1 — inside the 3-symbol table
        size = J._category(diff)
        c, ln = dc_codes[size]
        bw.write(c, ln)
        if size:
            amp = diff if diff >= 0 else diff + (1 << size) - 1
            bw.write(amp, size)
    bw.pad_to_byte()
    out += bw.buf

    # AC first scan (Ss=1 Se=63 Al=0): block1 codes k=1 val 2 then EOB2
    # (r=1, 1 appended bit = 0 -> eob_run covers block 2); block3 EOB
    out += b"\xff\xda" + S.pack(">H", 8) + bytes([1, 1, 0x00, 1, 63, 0x00])
    bw = J._BitWriter()
    c, ln = ac_codes[0x02]  # run 0, size 2
    bw.write(c, ln)
    bw.write(2, 2)  # value +2
    c, ln = ac_codes[0x10]  # EOBn, r=1
    bw.write(c, ln)
    bw.write(0, 1)  # eob_run = (1<<1)-1 + 0 = 1 extra block
    c, ln = ac_codes[0x00]  # plain EOB for block 3
    bw.write(c, ln)
    bw.pad_to_byte()
    out += bw.buf
    out += b"\xff\xd9"

    dec = J.decode_jpeg(bytes(out))
    assert (dec.width, dec.height) == (24, 8)

    # expected: reconstruct from hand-built planes via the module itself
    planes = {1: np.zeros((3, 64), np.int64)}
    planes[1][0, 0], planes[1][1, 0], planes[1][2, 0] = 3, 3, 2
    planes[1][0, 1] = 2
    comps = [J._Component(1, 1, 1, 0)]
    want = J._reconstruct_pixels((24, 8, comps), planes, {0: qt})
    assert np.array_equal(dec.pixels, want)
