"""Native-codec fast path (functions/native_codecs): libjpeg shim +
libwebp ctypes vs the pure-python oracle codecs.

The contract under test is INTERCHANGEABILITY — a pixel-invariant /
phash-integrity verdict must not depend on which backend decoded:

- same accept/reject envelope on the planted-damage corpus rules
  (truncation, marker kill, progressive, DRI, missing EOI);
- WebP-lossless pixels bit-exact (VP8L is lossless on both sides);
- JPEG pixels within IDCT-rounding distance (PSNR >= 40 dB between
  backends at the corpus quality), and identical 40 dB verdicts vs the
  reference pixels;
- the T.81 zigzag order itself, transcribed from the standard as a
  literal (the derivation once produced the TRANSPOSED order — a
  self-consistent encode/decode pair that only the libjpeg
  cross-certification could catch).

No Spark session needed: the codecs are plain functions; the Spark-side
plumbing is covered by the oracle queries (images_jpeg_validation /
images_webp_validation) and tests/test_pipeline_ops.py.
"""

import numpy as np
import pytest

from jsonschema_spark.functions import native_codecs as nc
from jsonschema_spark.functions.jpeg import (
    _ZIGZAG, decode_jpeg, encode_jpeg)
from jsonschema_spark.functions.webp import decode_webp, encode_webp

needs_jpeg = pytest.mark.skipif(not nc.jpeg_native_available(),
                                reason="libjpeg shim unavailable")
needs_webp = pytest.mark.skipif(not nc.webp_native_available(),
                                reason="libwebp unavailable")


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_zigzag_is_the_t81_order():
    """Pin the derived zigzag against the order transcribed from ITU
    T.81 Figure 5 (also libjpeg jutils.c jpeg_natural_order)."""
    t81 = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
           12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
           28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
           37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
           54, 47, 55, 62, 63]
    assert list(_ZIGZAG) == t81


@needs_webp
def test_webp_native_bit_exact_and_envelope():
    rng = np.random.default_rng(3)
    for shape in ((23, 31), (1, 1), (40, 1), (16, 16)):
        img = rng.integers(0, 255, size=(*shape, 3)).astype(np.uint8)
        blob = encode_webp(img)
        ours = decode_webp(blob)
        nat = nc.decode_webp_native(blob)
        assert np.array_equal(ours, nat)
        assert np.array_equal(nat, img)          # lossless
        # envelope: both reject truncation / corrupt signature
        assert nc.decode_webp_native(blob[:len(blob) // 2]) is None
        assert nc.decode_webp_native(b"JUNK" + blob[4:]) is None
    assert nc.decode_webp_native(b"") is None


@needs_jpeg
def test_jpeg_native_envelope_matches_pure():
    """Accept/reject parity on every stream class the pure decoder
    documents: intact, truncated, progressive-marker, nonzero DRI,
    missing EOI, corpus marker-kill."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(32, 24, 3)).astype(np.uint8)
    blob = encode_jpeg(img, quality=90)
    cases = [
        blob,
        blob[:len(blob) // 2],                       # truncated
        blob.replace(b"\xff\xc0", b"\xff\xc2", 1),   # progressive SOF
        blob[:158] + b"\x00" + blob[159:],           # SOF marker kill
        b"XX" + blob[2:],                            # bad SOI
        blob[:-2],                                   # EOI stripped
    ]
    for i, c in enumerate(cases):
        p = decode_jpeg(c)
        n = nc.decode_jpeg_native(c)
        assert (p is None) == (n is None), f"case {i} envelope split"
    assert decode_jpeg(blob) is not None


@needs_jpeg
def test_jpeg_native_pixels_within_idct_rounding():
    """On accepted streams the two backends agree to IDCT-rounding
    distance (>= 40 dB at every quality/subsampling combination,
    >= 48 dB at the corpus settings), with identical dims — so PSNR
    verdicts vs the reference pixels match on both sides of 40 dB."""
    rng = np.random.default_rng(11)
    for q, ss, floor in ((98, "4:4:4", 48.0), (90, "4:4:4", 48.0),
                         (90, "4:2:0", 45.0), (75, "4:2:0", 40.0)):
        for shape in ((16, 16), (9, 13), (48, 35)):
            img = rng.integers(0, 255, size=(*shape, 3)).astype(np.uint8)
            blob = encode_jpeg(img, quality=q, subsampling=ss)
            p = decode_jpeg(blob)
            n = nc.decode_jpeg_native(blob)
            assert p.shape == n.shape == img.shape
            assert _psnr(p, n) >= floor, (q, ss, shape, _psnr(p, n))


@needs_jpeg
def test_jpeg_corpus_verdicts_backend_independent():
    """The jpeg_images_df planted-damage rules (sources/images.py:358 —
    id%251 truncation, id%157 pre-encode damage, id%311 marker kill),
    replicated blob-for-blob driver-side: decode_ok AND the 40 dB
    verdict agree between backends on every row."""
    from jsonschema_spark.operators.multimodal import expected_pixels
    size = 16
    for i in range(0, 400):
        image_id = f"jpg_{i:012x}"
        px = expected_pixels(image_id, size, size)
        if i % 157 == 0 and i % 251 != 0 and i % 311 != 0:
            px = px.copy()
            px[size // 2, :, :] = 255 - px[size // 2, :, :]
        blob = encode_jpeg(px, quality=98)
        if i % 251 == 0:
            blob = blob[:len(blob) // 2]
        elif i % 311 == 0 and i != 0:
            blob = blob[:158] + b"\x00" + blob[159:]
        p = decode_jpeg(blob)
        n = nc.decode_jpeg_native(blob)
        assert (p is None) == (n is None), f"row {i} envelope split"
        if p is None:
            continue
        ref = expected_pixels(image_id, size, size)
        vp = _psnr(p, ref) >= 40.0
        vn = _psnr(n, ref) >= 40.0
        assert vp == vn, (i, _psnr(p, ref), _psnr(n, ref))


def test_fancy_upsample_matches_libjpeg_formulas():
    """Pin the vectorized h2v1/h2v2 triangular filters to libjpeg
    jdsample.c's exact arithmetic on a hand-computed example."""
    from jsonschema_spark.functions.jpeg import (
        _h2v1_fancy_upsample, _h2v2_fancy_upsample)
    s = np.array([[0, 16, 32]], np.int32)
    out = _h2v1_fancy_upsample(s)
    # [s0, (3*0+16+2)>>2, (3*16+0+1)>>2, (3*16+32+2)>>2,
    #  (3*32+16+1)>>2, s2]
    assert out.tolist() == [[0, 4, 12, 20, 28, 32]]
    s2 = np.array([[0, 16], [32, 48]], np.int32)
    out2 = _h2v2_fancy_upsample(s2)
    assert out2.shape == (4, 4)
    # row 0 colsums: 3*s + above(dup) = [0, 64]
    # left edge (0*4+8)>>4 = 0; (3*0+64+7)>>4 = 4;
    # (3*64+0+8)>>4 = 12; right edge (64*4+7)>>4 = 16
    assert out2[0].tolist() == [0, 4, 12, 16]
    # row 1 colsums: 3*[0,16] + [32,48] = [32, 96]
    assert out2[1].tolist() == [(32 * 4 + 8) >> 4, (32 * 3 + 96 + 7) >> 4,
                                (96 * 3 + 32 + 8) >> 4, (96 * 4 + 7) >> 4]


@needs_jpeg
@needs_webp
def test_set_native_codecs_override_and_dispatch():
    """decode_blob routes to the native tier when enabled and back to
    pure python under set_native_codecs(False), with interchangeable
    results (bit-exact for WebP, rounding-close for JPEG)."""
    from jsonschema_spark.operators.multimodal import decode_blob
    rng = np.random.default_rng(13)
    img = rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
    jb = encode_jpeg(img, quality=98)
    wb = encode_webp(img)
    try:
        nc.set_native_codecs(True)
        jn, wn = decode_blob(jb), decode_blob(wb)
        nc.set_native_codecs(False)
        assert not nc.jpeg_native_available()
        jp, wp = decode_blob(jb), decode_blob(wb)
    finally:
        nc.set_native_codecs(None)
    assert np.array_equal(wn, wp)
    assert _psnr(jn, jp) >= 48.0
    assert nc.native_codec_status()["enabled"] in (True, False)
