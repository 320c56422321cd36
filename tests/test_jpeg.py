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


def test_progressive_and_bad_input_gates():
    with pytest.raises(NotImplementedError, match="SOF2"):
        J.decode_jpeg(b"\xff\xd8\xff\xc2\x00\x10" + b"\x00" * 16)
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
