"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns with typed metadata, as mandated
by the north-star input shape.  Two decode tiers share the same Arrow
plumbing (schema, batching, UDF signature):

- ``decode_images`` — the fast stub: parses the synthetic header
  written by ``sources.images._payload`` (for the 8M-row benchmark
  table whose payloads are compact placeholders);
- ``decode_images_real`` — a REAL codec path: Windows BMP decodes with
  the built-in struct+numpy codec (``encode_bmp``/``decode_bmp``),
  PNG with the built-in pure-python codec (``encode_png``/
  ``decode_png`` — spec-conformant chunks/CRCs/zlib/all five scanline
  filters; zlib is stdlib, so the COMPRESSED tier needs no
  third-party library), baseline JPEG with ``functions/jpeg`` (the
  lossy tier) and WebP-lossless with ``functions/webp`` (VP8L,
  libwebp-interoperable).  Unrecognised formats fall back to Pillow
  when importable.  PSNR
  is measured against the per-id deterministic reference image, a
  true decoded-pixel comparison (``sources.images.bmp_images_df`` /
  ``png_images_df`` generate real payloads with planted
  truncation/corruption).

The per-row invariant from BASELINE.json input_hint (decoded-pixel
PSNR >= 40 dB vs the reference decode + caption equality) is
``psnr_check``: with the stub codec, "pixels" are the deterministic
byte body, so PSNR is exact (inf) for intact payloads and degrades for
truncated ones — the planted-violation path stays testable end-to-end.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = ("image_id string, fmt string, header_ok boolean, "
                 "decoded_w int, decoded_h int, payload_len int, psnr double")


def _codec_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def _parse_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Parse the 16-byte synthetic header (magic|w hex|h hex|checksum)
    and compute the stub PSNR: exact match of the expected deterministic
    body -> inf (capped 99.0); truncation/corruption -> low."""
    out = {"image_id": [], "fmt": [], "header_ok": [], "decoded_w": [],
           "decoded_h": [], "payload_len": [], "psnr": []}
    for image_id, fmt, blob in zip(pdf["image_id"], pdf["fmt"],
                                   pdf["bytes"]):
        out["image_id"].append(image_id)
        out["fmt"].append(fmt)
        n = len(blob) if blob is not None else 0
        out["payload_len"].append(n)
        ok = blob is not None and n >= 16 and blob[:4] == b"IMG0"
        out["header_ok"].append(bool(ok))
        if ok:
            try:
                w = int(blob[4:8], 16)
                h = int(blob[8:12], 16)
            except ValueError:
                w = h = 0
                out["header_ok"][-1] = False
            out["decoded_w"].append(w)
            out["decoded_h"].append(h)
            # stub decode: body bytes ARE the pixels; a full-length body
            # has zero reconstruction error
            body = np.frombuffer(blob[16:], dtype=np.uint8)
            expected_len = min(240, (w * h) // 65536 + 16)
            if len(body) >= expected_len:
                out["psnr"].append(99.0)
            else:
                # missing samples count as max error (255)
                mse = (255.0 ** 2) * (expected_len - len(body)) / max(
                    expected_len, 1)
                psnr = 99.0 if mse == 0 else min(
                    99.0, 10 * np.log10(255.0 ** 2 / mse))
                out["psnr"].append(float(psnr))
        else:
            out["decoded_w"].append(0)
            out["decoded_h"].append(0)
            out["psnr"].append(0.0)
    return pd.DataFrame(out)


def _carry_schema(df: DataFrame, carry) -> str:
    reserved = {f.split()[0] for f in DECODE_SCHEMA.split(", ")} | {"bytes"}
    clash = [c for c in carry if c in reserved]
    if clash:
        raise ValueError(
            f"carry column(s) {clash} collide with decode input/output "
            f"names {sorted(reserved)}; rename before decoding")
    return DECODE_SCHEMA + "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in carry)


def decode_images(df: DataFrame, carry: tuple = ()) -> DataFrame:
    """Stub decode over Arrow batches (mapInPandas).  Batch sizes are
    bounded by spark.sql.execution.arrow.maxRecordsPerBatch so image
    payload batches can't blow executor memory.  `carry` columns pass
    through the decode untouched, so per-row invariants need NO join
    back to the source (image_id is not guaranteed unique — a join on
    it would both shuffle and cross-match duplicate ids)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _parse_batch(pdf)
            for c in carry:
                out[c] = list(pdf[c])
            yield out

    return df.select("image_id", "fmt", "bytes", *carry).mapInPandas(
        run, schema=_carry_schema(df, carry))


# ------------------------------------------------- real BMP codec ---------
#
# Windows BMP v3 (BITMAPINFOHEADER, 24-bit BGR, bottom-up, rows padded
# to 4 bytes) is decodable with struct+numpy alone — a REAL standard
# format, viewable by any image tool, with no library dependency.  This
# gives the pixel-invariant pipeline one genuinely decoded format;
# PNG (below), baseline JPEG (functions/jpeg) and WebP-lossless
# (functions/webp) complete the built-in set — no third-party
# dependency anywhere in the decode path.

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG file bytes (8-bit truecolor,
    non-interlaced, filter type 0 per scanline, zlib-compressed IDAT
    with correct CRCs).  A real, spec-conformant encoder — any PNG
    reader decodes it; no Pillow involved."""
    import zlib
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * 3)          # filter byte 0 + row
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def _png_unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4).  Up/None vectorize whole
    rows; Sub is a per-channel cumulative sum (uint8 wraparound makes
    cumsum exact); Average/Paeth depend nonlinearly on the left pixel,
    so they walk pixels within the row with numpy ops per step."""
    stride = 1 + w * bpp
    rows = raw.reshape(h, stride)
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].copy()
        if ftype == 0:
            pass
        elif ftype == 1:                       # Sub
            cur = np.cumsum(cur.reshape(w, bpp), axis=0,
                            dtype=np.uint32).astype(np.uint8).reshape(-1)
        elif ftype == 2:                       # Up
            cur += prev
        elif ftype == 3:                       # Average
            cur = cur.reshape(w, bpp)
            pv = prev.reshape(w, bpp).astype(np.uint16)
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(w):
                cur[x] = (cur[x] + ((left + pv[x]) >> 1)).astype(np.uint8)
                left = cur[x].astype(np.uint16)
            cur = cur.reshape(-1)
        elif ftype == 4:                       # Paeth
            cur = cur.reshape(w, bpp)
            pv = prev.reshape(w, bpp).astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            ul = np.zeros(bpp, dtype=np.int16)
            for x in range(w):
                p = left + pv[x] - ul
                pa, pb, pc = (np.abs(p - left), np.abs(p - pv[x]),
                              np.abs(p - ul))
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, pv[x], ul))
                cur[x] = (cur[x] + pred).astype(np.uint8)
                left = cur[x].astype(np.int16)
                ul = pv[x]
            cur = cur.reshape(-1)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur
        prev = cur
    return out


def decode_png(blob: bytes):
    """PNG file bytes -> (h, w, 3) uint8 RGB, or None if malformed.

    Pure-python/numpy: signature + chunk walk with CRC verification,
    zlib-inflated IDAT, all five scanline filters.  8-bit color types
    0 (grey, broadcast to RGB), 2 (RGB), and 6 (RGBA, alpha dropped);
    interlaced and paletted images return None (out of the typed
    pipeline's data model, documented)."""
    import zlib
    try:
        if blob[:8] != PNG_SIG:
            return None
        pos, ihdr, idat = 8, None, []
        n = len(blob)
        while pos + 8 <= n:
            (length,) = struct.unpack_from(">I", blob, pos)
            tag = blob[pos + 4:pos + 8]
            data = blob[pos + 8:pos + 8 + length]
            if len(data) < length:
                return None                     # truncated chunk
            (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
            if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
                return None                     # corrupt chunk
            if tag == b"IHDR":
                ihdr = data
            elif tag == b"IDAT":
                idat.append(data)
            elif tag == b"IEND":
                break
            pos += 12 + length
        else:
            return None                         # no IEND reached
        if ihdr is None or not idat:
            return None
        w, h, depth, ctype, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", ihdr)
        if depth != 8 or comp != 0 or filt != 0 or interlace != 0 \
                or ctype not in (0, 2, 6) or w <= 0 or h <= 0:
            return None
        bpp = {0: 1, 2: 3, 6: 4}[ctype]
        raw = np.frombuffer(zlib.decompress(b"".join(idat)),
                            dtype=np.uint8)
        if raw.size != h * (1 + w * bpp):
            return None
        px = _png_unfilter(raw, h, w, bpp).reshape(h, w, bpp)
        if ctype == 0:
            return np.repeat(px, 3, axis=2)
        if ctype == 6:
            return px[:, :, :3].copy()
        return px
    except (struct.error, ValueError, zlib.error):
        return None


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> BMP file bytes."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    body_len = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + body_len, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, body_len,
                       2835, 2835, 0, 0)
    bgr = pixels[::-1, :, ::-1]                    # bottom-up, RGB->BGR
    if pad:
        rows = np.zeros((h, row + pad), dtype=np.uint8)
        rows[:, :row] = bgr.reshape(h, row)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + info + body


def decode_bmp(blob: bytes):
    """BMP file bytes -> (h, w, 3) uint8 RGB, or None if malformed."""
    try:
        if blob[:2] != b"BM" or len(blob) < 54:
            return None
        offset = struct.unpack_from("<I", blob, 10)[0]
        size, w, h, planes, bpp = struct.unpack_from("<IiiHH", blob, 14)
        if size != 40 or bpp != 24 or w <= 0 or h == 0:
            return None
        flip = h > 0
        h = abs(h)
        row = w * 3
        stride = row + ((-row) % 4)
        need = offset + stride * h
        if len(blob) < need:
            return None
        body = np.frombuffer(blob, dtype=np.uint8,
                             count=stride * h, offset=offset)
        bgr = body.reshape(h, stride)[:, :row].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
        return rgb[::-1] if flip else rgb
    except (struct.error, ValueError):
        return None


def expected_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """The deterministic reference image for `image_id`: a seeded
    gradient+hash pattern — what the reference decode of an intact
    payload must reproduce (the per-row allclose/PSNR invariant's
    ground truth)."""
    seed = int.from_bytes(
        __import__("hashlib").md5(image_id.encode()).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return base


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else float(
        min(99.0, 10 * np.log10(255.0 ** 2 / mse)))


def decode_blob(blob, use_pil: bool = False):
    """Magic-byte codec dispatch shared by every real-decode pass: BMP,
    PNG, baseline JPEG and WebP-lossless; anything else tries Pillow
    when importable.  Returns an (h, w, 3) uint8 array or None on any
    structural failure.

    JPEG and WebP dispatch to the NATIVE fast path (libjpeg shim /
    libwebp via ctypes, functions/native_codecs) when available —
    same accept/reject envelope and bit-exact (WebP) / PSNR-equivalent
    (JPEG IDCT rounding) pixels vs the built-in pure-python codecs,
    which remain the fallback and the cross-certification oracle
    (differential tests in tests/test_native_codecs.py).  Disable with
    JSONSCHEMA_SPARK_NATIVE=0."""
    if blob is None:
        return None
    if blob[:2] == b"BM":
        return decode_bmp(bytes(blob))
    if blob[:8] == PNG_SIG:
        return decode_png(bytes(blob))
    if blob[:2] == b"\xff\xd8":
        from ..functions import native_codecs as nc
        if nc.jpeg_native_available():
            return nc.decode_jpeg_native(bytes(blob))
        from ..functions.jpeg import decode_jpeg
        return decode_jpeg(bytes(blob))
    if blob[:4] == b"RIFF" and blob[12:16] == b"VP8L":
        # lossless WebP only — lossy VP8/VP8X RIFF payloads fall
        # through to the Pillow path below
        from ..functions import native_codecs as nc
        if nc.webp_native_available():
            return nc.decode_webp_native(bytes(blob))
        from ..functions.webp import decode_webp
        return decode_webp(bytes(blob))
    if use_pil:  # pragma: no cover
        import io

        import PIL.Image
        try:
            return np.asarray(
                PIL.Image.open(io.BytesIO(bytes(blob))).convert("RGB"))
        except Exception:
            return None
    return None


def decode_images_real(df: DataFrame, carry: tuple = ()) -> DataFrame:
    """Real codec path over Arrow batches: BMP, PNG, baseline JPEG
    and WebP-lossless blobs decode with the built-in numpy codecs
    (functions/jpeg supplies the lossy tier the north rule's
    PSNR>=40dB invariant is written for; functions/webp the
    libwebp-interoperable VP8L tier); other formats use Pillow when
    importable and are reported as header_ok=False otherwise.  PSNR is measured against
    the deterministic reference image for the id (`expected_pixels`)
    — a true decoded-pixel comparison.  `carry` columns pass through
    (see decode_images)."""
    use_pil = _codec_available()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "fmt", "header_ok",
                                   "decoded_w", "decoded_h",
                                   "payload_len", "psnr")}
            for image_id, fmt, blob in zip(pdf["image_id"], pdf["fmt"],
                                           pdf["bytes"]):
                out["image_id"].append(image_id)
                out["fmt"].append(fmt)
                out["payload_len"].append(
                    len(blob) if blob is not None else 0)
                px = decode_blob(blob, use_pil=use_pil)
                if px is None:
                    out["header_ok"].append(False)
                    out["decoded_w"].append(0)
                    out["decoded_h"].append(0)
                    out["psnr"].append(0.0)
                    continue
                hh, ww = px.shape[:2]
                out["header_ok"].append(True)
                out["decoded_w"].append(int(ww))
                out["decoded_h"].append(int(hh))
                out["psnr"].append(psnr(px, expected_pixels(
                    str(image_id), ww, hh)))
            res = pd.DataFrame(out)
            for c in carry:
                res[c] = list(pdf[c])
            yield res

    return df.select("image_id", "fmt", "bytes", *carry).mapInPandas(
        run, schema=_carry_schema(df, carry))


_DCT32 = None


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (type-II, norm='ortho')."""
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


def dct_phash(px: np.ndarray) -> int:
    """63-bit DCT perceptual hash of an (h, w, 3) uint8 image — the
    derivation contract for the north-star table's ``phash`` column
    (BASELINE.json input_hint: phash:int64).

    Spec (deterministic, documented so independent implementations
    agree bit-for-bit): Rec.601 grayscale -> nearest-neighbor sample
    to 32x32 (index ``floor(i*dim/32)``) -> orthonormal 2-D DCT-II ->
    top-left 8x8 coefficient block, DC dropped (63 coefficients) ->
    bit j (row-major) set iff coef_j > median(coefs).  Only bits 0..62
    are used, so the result is always a non-negative int64 — it can
    live in the table's ``phash >= 0`` schema unchanged."""
    return dct_phash_batch([px])[0]


def _gray32(px: np.ndarray) -> np.ndarray:
    """Rec.601 gray + nearest-neighbor 32x32 sample (dct_phash spec).
    Samples FIRST (bit-identical: the same uint8 values go through the
    same weighted sum either way) so the gray math touches 32x32x3
    regardless of source resolution."""
    h, w = px.shape[:2]
    ys = (np.arange(32) * h) // 32
    xs = (np.arange(32) * w) // 32
    s = px[np.ix_(ys, xs)]
    return s[..., 0] * 0.299 + s[..., 1] * 0.587 + s[..., 2] * 0.114


_BIT_WEIGHTS = (1 << np.arange(63, dtype=np.uint64))


def dct_phash_batch(imgs) -> list:
    """:func:`dct_phash` over a whole Arrow batch: the per-image
    gray/resample stays per-image (shapes differ), but the 32x32 DCTs
    run as ONE broadcast matmul chain and the median/threshold/bit-pack
    as batched numpy — the per-call numpy dispatch overhead dominated
    tiny matmuls (measured: einsum and np.stack are both traps here —
    40x and 10x slower than the preallocated matmul chain).
    Bit-identical to the documented single-image spec (asserted in
    tests)."""
    global _DCT32
    if not imgs:
        return []
    if _DCT32 is None:
        _DCT32 = _dct_matrix(32)
    # per-image work is ONLY the 32x32 nearest-neighbor sample (two
    # basic-index ops, sample grids memoized per size); gray weighting
    # and the DCTs run once over the whole (B, 32, 32[, 3]) batch
    grids: dict = {}
    s = np.empty((len(imgs), 32, 32, 3), np.uint8)
    for i, px in enumerate(imgs):
        h, w = px.shape[:2]
        if (h, w) not in grids:
            grids[(h, w)] = ((np.arange(32) * h) // 32,
                             (np.arange(32) * w) // 32)
        ys, xs = grids[(h, w)]
        s[i] = px[ys][:, xs]
    g = s[..., 0] * 0.299 + s[..., 1] * 0.587 + s[..., 2] * 0.114
    # two single LARGE dgemms instead of a broadcast matmul (which
    # loops a tiny dgemm per image), and only the 8 DCT rows/cols the
    # hash reads (16x fewer FLOPs): coefs[b] = M8 @ g[b] @ M8.T
    B = len(imgs)
    m8 = _DCT32[:8]                                     # (8, 32)
    t1 = (m8 @ g.transpose(1, 0, 2).reshape(32, B * 32))
    t1 = t1.reshape(8, B, 32).transpose(1, 0, 2)        # (B, 8, 32)
    coefs = (t1.reshape(B * 8, 32) @ m8.T).reshape(B, 64)
    coefs = coefs[:, 1:]                                 # drop DC
    med = np.median(coefs, axis=1, keepdims=True)
    bits = coefs > med                                   # (B, 63)
    return [int(v) for v in (bits * _BIT_WEIGHTS).sum(axis=1)]


def luma_stats(px: np.ndarray) -> tuple:
    """Decoded-tier quality metrics: full-resolution Rec.601 luma mean
    and population std (contrast).  Double math over the whole frame —
    the documented contract the planted-corpus oracle and the numpy
    unit tests both pin."""
    luma = (px[..., 0] * 0.299 + px[..., 1] * 0.587
            + px[..., 2] * 0.114)
    return float(luma.mean()), float(luma.std())


def _batch_luma(pxs, ok_idx) -> tuple:
    means = [float("nan")] * len(pxs)
    stds = [float("nan")] * len(pxs)
    for i in ok_idx:
        m, s = luma_stats(pxs[i])
        means[i], stds[i] = m, s
    return means, stds


def decode_luma_stats(df: DataFrame, carry: tuple = (),
                      with_psnr: bool = False) -> DataFrame:
    """Standalone decoded-tier luma stats: one mapInPandas pass (real
    codecs) -> (image_id, fmt, decode_ok, luma_mean, luma_std[, psnr,
    decoded_w, decoded_h][, carry]).  Used by the
    `image_quality_decoded` block when no phash-integrity pass exists
    to fuse with (dataset.py fuses into
    :func:`phash_integrity_check`'s decode otherwise — decoding is the
    expensive stage and must not run twice).  ``with_psnr=True``
    additionally emits the pixel-invariant columns from the SAME
    decode, so the `pixel_invariant` (real tier) + `image_quality_decoded`
    combination also pays exactly one decode pass.  Undecodable rows
    carry NaN stats and decode_ok=False; they are the pixel-invariant's
    finding, not a quality violation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = _codec_available()
        for pdf in batches:
            pxs = [decode_blob(b, use_pil=use_pil) for b in pdf["bytes"]]
            ok_idx = [i for i, p in enumerate(pxs) if p is not None]
            means, stds = _batch_luma(pxs, ok_idx)
            res = pd.DataFrame({
                "image_id": list(pdf["image_id"]),
                "fmt": list(pdf["fmt"]),
                "decode_ok": [p is not None for p in pxs],
                "luma_mean": means,
                "luma_std": stds,
            })
            if with_psnr:
                psnrs, dws, dhs = [], [], []
                for image_id, px in zip(pdf["image_id"], pxs):
                    if px is None:
                        psnrs.append(0.0)
                        dws.append(0)
                        dhs.append(0)
                    else:
                        hh, ww = px.shape[:2]
                        psnrs.append(psnr(px, expected_pixels(
                            str(image_id), ww, hh)))
                        dws.append(int(ww))
                        dhs.append(int(hh))
                res["psnr"] = psnrs
                res["decoded_w"] = dws
                res["decoded_h"] = dhs
            for c in carry:
                res[c] = list(pdf[c])
            yield res

    extra = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in carry)
    if with_psnr:
        extra = ", psnr double, decoded_w int, decoded_h int" + extra
    return df.select("image_id", "fmt", "bytes", *carry).mapInPandas(
        run, schema="image_id string, fmt string, decode_ok boolean, "
                    "luma_mean double, luma_std double" + extra)


def phash_integrity_check(df: DataFrame, carry: tuple = (),
                          with_psnr: bool = False,
                          with_luma: bool = False) -> DataFrame:
    """Verify the stored ``phash`` column against the perceptual hash
    RECOMPUTED from decoded pixels — the cross-column integrity check
    that ties the codec tier to the table's phash metadata (a corrupt
    or stale phash silently breaks every phash-keyed dedup downstream,
    so a 100 TB ingest validates it like any other constraint).

    One joinless mapInPandas pass: decode blob (built-in codecs),
    :func:`dct_phash` the pixels, hamming vs the stored value via int
    xor bit_count.  Output per row: decode_ok, stored vs computed
    phash, hamming (NULL when undecodable or stored phash is NULL).
    Callers assert ``hamming == 0`` for lossless formats or
    ``hamming <= t`` for lossy re-encodes.

    ``with_psnr=True`` additionally emits (psnr, decoded_w, decoded_h)
    from the SAME decode — the fused one-scan path when both the pixel
    invariant and phash integrity are configured (decoding is the
    expensive stage; it must not run twice).  ``with_luma=True``
    likewise rides (luma_mean, luma_std) for the decoded-tier
    image-quality block on the same pixels (NaN when undecodable —
    callers gate on decode_ok).

    The stored phash travels into Arrow as a STRING: pandas coerces an
    int64 column containing any NULL to float64, which silently loses
    low bits of 63-bit values (> 2^53) and would fabricate mismatches
    on every other row of the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = _codec_available()
        for pdf in batches:
            out = {k: [] for k in ("image_id", "fmt", "decode_ok",
                                   "stored_phash", "computed_phash",
                                   "hamming")}
            if with_psnr:
                for k in ("psnr", "decoded_w", "decoded_h"):
                    out[k] = []
            # decode per image, then hash the decodable ones as ONE
            # batched DCT (dct_phash_batch) — per-image numpy dispatch
            # on 32x32 matmuls was the pass's hot spot once decode went
            # native
            pxs = [decode_blob(b, use_pil=use_pil) for b in pdf["bytes"]]
            ok_idx = [i for i, p in enumerate(pxs) if p is not None]
            if with_luma:
                lmeans, lstds = _batch_luma(pxs, ok_idx)
            comps: list = [None] * len(pxs)
            for i, hsh in zip(ok_idx,
                              dct_phash_batch([pxs[i] for i in ok_idx])):
                comps[i] = hsh
            for j, (image_id, fmt, stored) in enumerate(zip(
                    pdf["image_id"], pdf["fmt"], pdf["_phash_str"])):
                out["image_id"].append(image_id)
                out["fmt"].append(fmt)
                stored_i = None if stored is None else int(stored)
                out["stored_phash"].append(stored_i)
                px, comp = pxs[j], comps[j]
                if px is None:
                    out["decode_ok"].append(False)
                    out["computed_phash"].append(None)
                    out["hamming"].append(None)
                    if with_psnr:
                        out["psnr"].append(0.0)
                        out["decoded_w"].append(0)
                        out["decoded_h"].append(0)
                    continue
                out["decode_ok"].append(True)
                out["computed_phash"].append(comp)
                out["hamming"].append(
                    None if stored_i is None
                    else int(bin(comp ^ stored_i).count("1")))
                if with_psnr:
                    hh, ww = px.shape[:2]
                    out["psnr"].append(psnr(px, expected_pixels(
                        str(image_id), ww, hh)))
                    out["decoded_w"].append(int(ww))
                    out["decoded_h"].append(int(hh))
            res = pd.DataFrame(out)
            # int-lists containing None become float64 in pandas,
            # truncating 63-bit values — force nullable Int64
            for c in ("stored_phash", "computed_phash", "hamming"):
                res[c] = pd.array(out[c], dtype="Int64")
            if with_luma:
                res["luma_mean"] = lmeans
                res["luma_std"] = lstds
            for c in carry:
                res[c] = list(pdf[c])
            yield res

    extra = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in carry)
    if with_luma:
        extra = ", luma_mean double, luma_std double" + extra
    if with_psnr:
        extra = ", psnr double, decoded_w int, decoded_h int" + extra
    return df.select(
        "image_id", "fmt", "bytes",
        F.col("phash").cast("string").alias("_phash_str"), *carry
    ).mapInPandas(
        run, schema="image_id string, fmt string, decode_ok boolean, "
                    "stored_phash long, computed_phash long, hamming int"
                    + extra)


def psnr_check(df: DataFrame, min_psnr: float = 40.0) -> DataFrame:
    """Decoded-pixel invariant (BASELINE.json input_hint): violation rows
    for payloads whose stub-decoded PSNR falls below `min_psnr` or whose
    header metadata disagrees with the table's (w, h).

    (w, h) ride through the decode pass, so this is ONE narrow
    mapInPandas scan — no shuffle, and no join on image_id (which is
    not unique: planted duplicate ids would cross-match and double
    count)."""
    joined = decode_images(df, carry=("w", "h"))
    bad = joined.filter(
        (~F.col("header_ok"))
        | (F.col("psnr") < min_psnr)
        | (F.col("decoded_w") != F.col("w"))
        | (F.col("decoded_h") != F.col("h")))
    return bad.select(
        "image_id",
        F.lit("pixelInvariant").alias("keyword"),
        F.lit("$.bytes").alias("json_path"),
        F.lit("x-spark/pixel/psnr").alias("schema_path"),
        F.concat(F.lit("decoded payload fails PSNR/metadata invariant "
                       "(psnr="),
                 F.round("psnr", 2).cast("string"),
                 F.lit(")")).alias("message"),
        F.col("psnr").cast("string").alias("failing_value"),
    )


def psnr_check_real(df: DataFrame, min_psnr: float = 40.0) -> DataFrame:
    """The decoded-pixel invariant over REAL payloads (BMP via the
    built-in numpy codec, others via Pillow when importable): violation
    rows for blobs that fail to decode, decode to the wrong dimensions,
    or reconstruct below `min_psnr` against the reference pixels.
    One narrow joinless scan — see psnr_check."""
    joined = decode_images_real(df, carry=("w", "h"))
    bad = joined.filter(
        (~F.col("header_ok"))
        | (F.col("psnr") < min_psnr)
        | (F.col("decoded_w") != F.col("w"))
        | (F.col("decoded_h") != F.col("h")))
    return bad.select(
        "image_id",
        F.lit("pixelInvariant").alias("keyword"),
        F.lit("$.bytes").alias("json_path"),
        F.lit("x-spark/pixel/psnr").alias("schema_path"),
        F.concat(F.lit("decoded payload fails PSNR/metadata invariant "
                       "(psnr="),
                 F.round("psnr", 2).cast("string"),
                 F.lit(")")).alias("message"),
        F.col("psnr").cast("string").alias("failing_value"),
    )


# --------------------------------------------- transforms: resize ---------

def resize_images(df: DataFrame, out_w: int, out_h: int,
                  id_col: str = "image_id",
                  bytes_col: str = "bytes") -> DataFrame:
    """Decode -> nearest-neighbour resize -> re-encode, one Arrow-batched
    mapInPandas pass (brief: 'resize as Pandas UDFs over mapInPandas').
    Real math for BMP payloads (the built-in codec); undecodable blobs
    yield a NULL payload row so planted corruption stays visible
    downstream instead of killing the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "bytes": [], "w": [], "h": []}
            for image_id, blob in zip(pdf[id_col], pdf[bytes_col]):
                out["image_id"].append(image_id)
                px = decode_bmp(bytes(blob)) if blob is not None else None
                if px is None:
                    out["bytes"].append(None)
                    out["w"].append(0)
                    out["h"].append(0)
                    continue
                h, w = px.shape[:2]
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                resized = px[yi][:, xi]
                out["bytes"].append(encode_bmp(resized))
                out["w"].append(out_w)
                out["h"].append(out_h)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("image_id"),
                     F.col(bytes_col).alias(bytes_col)).mapInPandas(
        run, schema="image_id string, bytes binary, w int, h int")


def image_features(df: DataFrame, id_col: str = "image_id",
                   bytes_col: str = "bytes",
                   hist_bins: int = 8) -> DataFrame:
    """Feature extraction (brief: 'feature-extract'): per-channel means
    + a luminance histogram from the DECODED pixels, one mapInPandas
    pass.  The feature vector is embedding-shaped (array<double>), so
    it feeds the similarity/dedup operators directly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "decoded": [], "mean_rgb": [],
                   "luma_hist": []}
            for image_id, blob in zip(pdf[id_col], pdf[bytes_col]):
                out["image_id"].append(image_id)
                px = decode_bmp(bytes(blob)) if blob is not None else None
                if px is None:
                    out["decoded"].append(False)
                    out["mean_rgb"].append(None)
                    out["luma_hist"].append(None)
                    continue
                luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                        + 0.114 * px[:, :, 2])
                hist, _ = np.histogram(luma, bins=hist_bins,
                                       range=(0.0, 256.0))
                out["decoded"].append(True)
                out["mean_rgb"].append(
                    [float(px[:, :, c].mean()) for c in range(3)])
                out["luma_hist"].append(
                    (hist / max(px.shape[0] * px.shape[1], 1)).tolist())
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("image_id"),
                     F.col(bytes_col).alias(bytes_col)).mapInPandas(
        run, schema="image_id string, decoded boolean, "
                    "mean_rgb array<double>, luma_hist array<double>")


# ------------------------------------------ video: frame sampling --------
#
# Deterministic container: b'VID0' | uint32 n_frames | n x (uint32 len |
# BMP file bytes).  A real-enough shape for the frame-sample plumbing
# (schema, partitioning, batch sizes, per-frame decode) while staying
# dependency-free; a production deployment swaps decode_video for an
# ffmpeg/pyav-backed iterator with the SAME signature.

def encode_video(frames) -> bytes:
    parts = [b"VID0", struct.pack("<I", len(frames))]
    for px in frames:
        blob = encode_bmp(px)
        parts.append(struct.pack("<I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def iter_video_frames(blob: bytes):
    """Yield (frame_idx, bmp_bytes) WITHOUT materializing all frames —
    the per-row memory shape frame sampling needs."""
    if blob is None or blob[:4] != b"VID0" or len(blob) < 8:
        return
    (n,) = struct.unpack_from("<I", blob, 4)
    off = 8
    for i in range(n):
        if off + 4 > len(blob):
            return
        (ln,) = struct.unpack_from("<I", blob, off)
        off += 4
        if off + ln > len(blob):
            return
        yield i, blob[off:off + ln]
        off += ln


def sample_frames(df: DataFrame, stride: int,
                  id_col: str = "video_id",
                  bytes_col: str = "bytes") -> DataFrame:
    """Frame sampling (brief: 'frame-sample'): every `stride`-th frame
    of each video payload becomes its own row (video_id, frame_idx,
    frame_bytes, w, h) — one mapInPandas pass, frames decoded lazily
    so a long video never fully materializes per row."""
    if stride < 1:
        raise ValueError("stride must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "frame_bytes": [],
                   "w": [], "h": []}
            for video_id, blob in zip(pdf[id_col], pdf[bytes_col]):
                for i, fb in iter_video_frames(
                        bytes(blob) if blob is not None else None):
                    if i % stride:
                        continue
                    px = decode_bmp(fb)
                    out["video_id"].append(video_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(fb)
                    out["w"].append(0 if px is None else px.shape[1])
                    out["h"].append(0 if px is None else px.shape[0])
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("video_id"),
                     F.col(bytes_col).alias(bytes_col)).mapInPandas(
        run, schema="video_id string, frame_idx int, "
                    "frame_bytes binary, w int, h int")


# ---------------------------------------- caption-equality invariant ------

def caption_check(df: DataFrame, expected,
                  caption_col: str = "caption",
                  id_cols: tuple = ("image_id",)) -> DataFrame:
    """The *caption equality* half of the north-rule per-row invariant
    (BASELINE.json input_hint: "decoded-pixel allclose ... + caption
    equality"): violation rows where the table's caption differs from
    the caller-supplied reference-caption expression (NULL-safe
    equality — a NULL caption vs a non-NULL reference is a mismatch).

    `expected` is a Column (e.g. ``sources.images.reference_caption``
    over the generating id), so the whole check is ONE codegen'd narrow
    scan — no UDF, no shuffle, `bytes` pruned."""
    cap = F.col(caption_col)
    bad = df.filter(~cap.eqNullSafe(expected))
    return bad.select(
        *id_cols,
        F.lit("captionEquality").alias("keyword"),
        F.lit(f"$.{caption_col}").alias("json_path"),
        F.lit("x-spark/caption/equality").alias("schema_path"),
        F.when(cap.isNull(), F.lit("caption is null, reference is not"))
         .when(F.length(cap) == 0, F.lit("caption is empty"))
         .otherwise(F.lit("caption differs from reference"))
        .alias("message"),
        F.substring(F.coalesce(cap, F.lit("<null>")), 1, 64)
        .alias("failing_value"),
    )


# ------------------------------------------------- real WAV codec ---------
#
# RIFF/WAVE PCM (16-bit little-endian) is the third REAL format the
# multimodal tier decodes with struct+numpy alone — audio payloads get
# the same treatment as BMP/PNG images and VID0 video: a genuine
# standard container, planted corruption, header fields byte-parseable
# by an independent SQL oracle.

def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """(n,) or (n, channels) int16 PCM -> canonical 44-byte-header WAV
    file bytes (RIFF + fmt + data chunks)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes):
    """WAV file bytes -> ((n, channels) int16 array, sample_rate), or
    None if malformed: bad magic, truncated data chunk (actual bytes <
    declared size), non-PCM format, or non-16-bit samples."""
    try:
        if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
            return None
        (riff_len,) = struct.unpack_from("<I", blob, 4)
        if len(blob) < 8 + riff_len:
            return None                          # container truncated
        pos, fmt, data = 12, None, None
        n = len(blob)
        while pos + 8 <= n:
            tag = blob[pos:pos + 4]
            (length,) = struct.unpack_from("<I", blob, pos + 4)
            chunk = blob[pos + 8:pos + 8 + length]
            if len(chunk) < length:
                return None                      # chunk truncated
            if tag == b"fmt ":
                fmt = chunk
            elif tag == b"data":
                data = chunk
            pos += 8 + length + (length & 1)     # chunks are word-aligned
        if fmt is None or data is None or len(fmt) < 16:
            return None
        audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from(
            "<HHIIHH", fmt)
        if audio_fmt != 1 or bits != 16 or ch < 1:
            return None
        samples = np.frombuffer(data, dtype="<i2")
        if len(samples) % ch:
            return None
        return samples.reshape(-1, ch), int(rate)
    except (struct.error, ValueError):
        return None


def expected_samples(audio_id: str, n: int) -> np.ndarray:
    """Deterministic int16 reference signal for `audio_id` — the audio
    analogue of expected_pixels."""
    seed = int.from_bytes(
        __import__("hashlib").md5(audio_id.encode()).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(-2 ** 15, 2 ** 15, size=n, dtype=np.int64) \
        .astype(np.int16)


def snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    """Signal-to-noise ratio in dB (capped 99; shape mismatch -> 0)."""
    if ref.shape != got.shape:
        return 0.0
    err = ref.astype(np.float64) - got.astype(np.float64)
    pe = np.mean(err ** 2)
    if pe == 0:
        return 99.0
    ps = np.mean(ref.astype(np.float64) ** 2)
    return float(min(99.0, 10 * np.log10(max(ps, 1e-12) / pe)))


AUDIO_DECODE_SCHEMA = ("audio_id string, header_ok boolean, "
                       "decoded_rate int, decoded_samples int, "
                       "snr double")


def decode_audio(df: DataFrame, carry: tuple = ()) -> DataFrame:
    """Real WAV decode over Arrow batches; SNR measured against the
    per-id deterministic reference signal (true decoded-sample
    comparison).  `carry` columns pass through — same joinless shape
    as decode_images."""
    schema = AUDIO_DECODE_SCHEMA + "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in carry)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "header_ok",
                                   "decoded_rate", "decoded_samples",
                                   "snr")}
            for audio_id, blob in zip(pdf["audio_id"], pdf["bytes"]):
                out["audio_id"].append(audio_id)
                dec = decode_wav(bytes(blob)) if blob is not None else None
                if dec is None:
                    out["header_ok"].append(False)
                    out["decoded_rate"].append(0)
                    out["decoded_samples"].append(0)
                    out["snr"].append(0.0)
                    continue
                samples, rate = dec
                mono = samples[:, 0]
                out["header_ok"].append(True)
                out["decoded_rate"].append(rate)
                out["decoded_samples"].append(len(mono))
                out["snr"].append(snr_db(
                    expected_samples(str(audio_id), len(mono)), mono))
            res = pd.DataFrame(out)
            for c in carry:
                res[c] = list(pdf[c])
            yield res

    return df.select("audio_id", "bytes", *carry).mapInPandas(
        run, schema=schema)


def audio_features(df: DataFrame, id_col: str = "audio_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Per-clip audio features from the REAL decode: RMS level, peak,
    zero-crossing rate, duration — one mapInPandas pass, numpy math
    (the audio analogue of image_features)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"audio_id": [], "ok": [], "duration_s": [],
                   "rms": [], "peak": [], "zcr": []}
            for audio_id, blob in zip(pdf[id_col], pdf[bytes_col]):
                out["audio_id"].append(audio_id)
                dec = decode_wav(bytes(blob)) if blob is not None else None
                if dec is None:
                    out["ok"].append(False)
                    for k in ("duration_s", "rms", "peak", "zcr"):
                        out[k].append(0.0)
                    continue
                samples, rate = dec
                x = samples[:, 0].astype(np.float64) / 32768.0
                out["ok"].append(True)
                out["duration_s"].append(len(x) / rate)
                out["rms"].append(float(np.sqrt(np.mean(x ** 2)))
                                  if len(x) else 0.0)
                out["peak"].append(float(np.max(np.abs(x)))
                                   if len(x) else 0.0)
                out["zcr"].append(float(np.mean(
                    np.abs(np.diff(np.signbit(x).astype(np.int8)))))
                    if len(x) > 1 else 0.0)
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(
        run, schema="audio_id string, ok boolean, duration_s double, "
                    "rms double, peak double, zcr double")
