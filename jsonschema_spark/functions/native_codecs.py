"""Native-codec fast path: libjpeg / libwebp decode behind the engine's
existing decode seam.

The pure-python codecs (``functions/jpeg.py``, ``functions/webp.py``) are
the engine's correctness oracle — spec-complete, cross-certified against
libwebp bit-for-bit — but their per-image Python entropy loop is the one
named wall-clock scale-killer at 10^12 images (~hundreds of decodes/s/core
vs tens of thousands native).  This module supplies drop-in native
decoders with the SAME accept/reject envelope so the verdict of a
pixel-invariant / phash-integrity pass cannot depend on which backend ran:

- **WebP (lossless VP8L)** — pure ctypes over ``libwebp.so.7``.
  ``WebPDecodeRGBA`` returns NULL on any structural error (no process
  aborts), and VP8L is lossless, so native and pure decodes are bit-exact
  by construction (certified both directions in tests/test_webp.py).

- **JPEG (baseline JFIF)** — libjpeg's classic API calls ``exit()`` on
  error unless the caller installs a ``setjmp`` error trampoline, which
  ctypes cannot express.  A ~60-line C shim (compiled once per machine
  with the system ``cc`` into a content-addressed cache, atomically
  renamed so concurrent Spark workers race safely) wraps the decode in
  ``setjmp``/``longjmp`` and **treats libjpeg warnings as failures** —
  libjpeg pads truncated streams with fake EOI and emits JWRN_JPEG_EOF
  instead of failing, while the engine's pure decoder (and the planted
  truncation oracles) require truncation to FAIL.  A pure-python marker
  walk (:func:`jpeg_envelope_ok`, the structural half of
  ``functions/jpeg.py decode_jpeg`` — markers only, no entropy decode)
  runs first so non-baseline / progressive / DRI streams that the pure
  decoder rejects are rejected natively too, regardless of libjpeg's
  broader format support.

On a real cluster the shim would be prebuilt and shipped via
``spark-submit --py-files``/``--archives``; compiling lazily per machine
is the single-JVM-local equivalent.  Everything degrades gracefully: no
compiler, no headers, or no shared library simply reports unavailable and
the dispatcher (``operators/multimodal.decode_blob``) keeps the pure
path.  Set ``JSONSCHEMA_SPARK_NATIVE=0`` to force pure-python everywhere
(workers inherit it via ``spark.executorEnv``).

Reference parity note: the reference validates with pure-python
(jsonschema has no codecs at all); the decode tier itself is this
engine's extension for the north-star image+caption table, so the only
parity contract is internal — native verdicts == pure verdicts, asserted
by differential tests over the planted-damage corpora.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import struct
import subprocess
import tempfile

import numpy as np

__all__ = [
    "jpeg_native_available", "webp_native_available",
    "decode_jpeg_native", "decode_webp_native",
    "jpeg_envelope_ok", "native_codec_status",
]


_FORCE = None                 # in-process override; None = env decides


def set_native_codecs(on) -> None:
    """Force the native tier on/off for THIS process (tests compare
    both backends in-process); ``None`` restores env control.  Spark
    workers are separate processes — use JSONSCHEMA_SPARK_NATIVE=0 (via
    ``spark.executorEnv``) to flip the tier cluster-wide."""
    global _FORCE
    _FORCE = on


def native_enabled() -> bool:
    """Global kill switch (read per-process so Spark workers honor it
    via ``spark.executorEnv.JSONSCHEMA_SPARK_NATIVE``)."""
    if _FORCE is not None:
        return _FORCE
    return os.environ.get("JSONSCHEMA_SPARK_NATIVE", "1") != "0"


# ------------------------------------------------------------------ WebP --

_WEBP = "unset"


def _libwebp():
    global _WEBP
    if _WEBP != "unset":
        return _WEBP
    _WEBP = None
    try:
        lib = ctypes.CDLL("libwebp.so.7")
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        try:
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            lib._jss_free = lib.WebPFree
        except AttributeError:      # ancient libwebp: free() is correct
            libc = ctypes.CDLL(None)
            libc.free.argtypes = [ctypes.c_void_p]
            lib._jss_free = libc.free
        _WEBP = lib
    except OSError:
        _WEBP = None
    return _WEBP


def webp_native_available() -> bool:
    return native_enabled() and _libwebp() is not None


def decode_webp_native(blob: bytes):
    """RIFF/WebP bytes -> (h, w, 3) uint8 RGB via libwebp, or None on
    any structural failure.  Bit-exact vs functions/webp.decode_webp
    for the lossless VP8L streams the dispatcher routes here."""
    lib = _libwebp()
    if lib is None:
        raise RuntimeError("libwebp.so.7 not loadable")
    if not blob:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(bytes(blob), len(blob),
                           ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    try:
        n = h.value * w.value * 4
        rgba = np.ctypeslib.as_array(p, shape=(n,)).reshape(
            h.value, w.value, 4)
        return rgba[:, :, :3].copy()
    finally:
        lib._jss_free(ctypes.cast(p, ctypes.c_void_p))


# ------------------------------------------------------------------ JPEG --

# setjmp trampoline + warnings-as-errors; see module docstring.  The
# scanline loop reads directly into the caller-visible malloc'd buffer.
_JPEG_SHIM_SRC = r"""
#include <stdlib.h>
#include <setjmp.h>
#include <stdio.h>
#include <jpeglib.h>

struct jss_err { struct jpeg_error_mgr mgr; jmp_buf jb; };

static void jss_error_exit(j_common_ptr cinfo) {
    struct jss_err *e = (struct jss_err *)cinfo->err;
    longjmp(e->jb, 1);
}
static void jss_emit_message(j_common_ptr cinfo, int msg_level) {
    (void)cinfo; (void)msg_level;   /* silence; num_warnings still counts */
}

/* Decode to tightly-packed RGB.  Returns 0 and sets *out/*w/*h on
 * success (caller frees with jss_free); negative on any failure,
 * INCLUDING recoverable-corruption warnings (truncation must fail). */
int jss_decode_rgb(const unsigned char *buf, unsigned long n,
                   unsigned char **out, int *w, int *h) {
    struct jpeg_decompress_struct cinfo;
    struct jss_err jerr;
    unsigned char *pix = NULL;
    *out = NULL; *w = 0; *h = 0;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jss_error_exit;
    jerr.mgr.emit_message = jss_emit_message;
    if (setjmp(jerr.jb)) {
        free(pix);
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, n);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    if (cinfo.output_components != 3
        || cinfo.output_width == 0 || cinfo.output_height == 0) {
        jpeg_destroy_decompress(&cinfo);
        return -3;
    }
    unsigned long stride = (unsigned long)cinfo.output_width * 3;
    pix = (unsigned char *)malloc(stride * cinfo.output_height);
    if (!pix) { jpeg_destroy_decompress(&cinfo); return -4; }
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char *row = pix + stride * cinfo.output_scanline;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    int ww = (int)cinfo.output_width, hh = (int)cinfo.output_height;
    long warnings = cinfo.err->num_warnings;
    jpeg_destroy_decompress(&cinfo);
    if (warnings) { free(pix); return -5; }
    *out = pix; *w = ww; *h = hh;
    return 0;
}

void jss_free(unsigned char *p) { free(p); }
"""

_JPEG_SHIM = "unset"


def _shim_cache_dir() -> str:
    d = os.environ.get(
        "JSONSCHEMA_SPARK_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "jsonschema_spark_native"))
    os.makedirs(d, exist_ok=True)
    return d


def _jpeg_shim():
    """Compile-once-per-machine loader.  Content-addressed filename +
    atomic rename make concurrent worker compiles idempotent; any
    failure (no cc, no jpeglib.h, no -ljpeg) caches as unavailable."""
    global _JPEG_SHIM
    if _JPEG_SHIM != "unset":
        return _JPEG_SHIM
    _JPEG_SHIM = None
    try:
        fp = hashlib.sha256(_JPEG_SHIM_SRC.encode()).hexdigest()[:16]
        cache = _shim_cache_dir()
        so = os.path.join(cache, f"jpegshim_{fp}.so")
        if not os.path.exists(so):
            with tempfile.TemporaryDirectory(dir=cache) as td:
                src = os.path.join(td, "shim.c")
                with open(src, "w") as f:
                    f.write(_JPEG_SHIM_SRC)
                tmp = os.path.join(td, "shim.so")
                subprocess.run(
                    ["cc", "-O2", "-shared", "-fPIC", src, "-o", tmp,
                     "-ljpeg"],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, so)     # same fs (dir=cache): atomic
        lib = ctypes.CDLL(so)
        lib.jss_decode_rgb.restype = ctypes.c_int
        lib.jss_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.jss_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _JPEG_SHIM = lib
    except Exception:
        _JPEG_SHIM = None
    return _JPEG_SHIM


def jpeg_native_available() -> bool:
    return native_enabled() and _jpeg_shim() is not None


def jpeg_envelope_ok(blob: bytes) -> bool:
    """Structural half of ``functions/jpeg.py decode_jpeg`` (marker walk
    only — no entropy decode): accept exactly the streams whose MARKER
    structure the pure decoder accepts, so libjpeg's wider format
    support (progressive, restart intervals, grayscale, 12-bit) can't
    widen the native path's envelope.  Mirrors decode_jpeg's checks at
    functions/jpeg.py:426-508 condition for condition."""
    try:
        if blob[:2] != b"\xff\xd8":
            return False
        frame_seen = False
        pos = 2
        n = len(blob)
        while pos + 4 <= n:
            if blob[pos] != 0xFF:
                return False
            marker = blob[pos + 1]
            if marker == 0xD9:                     # EOI before SOS
                return False
            seg_len = struct.unpack_from(">H", blob, pos + 2)[0]
            seg = blob[pos + 4:pos + 2 + seg_len]
            if len(seg) != seg_len - 2:
                return False
            if marker == 0xDB:                     # DQT: 8-bit only
                sp = 0
                while sp < len(seg):
                    if seg[sp] >> 4 != 0:
                        return False
                    sp += 65
            elif marker == 0xC0:                   # SOF0 baseline
                prec, nc = seg[0], seg[5]
                if prec != 8 or nc != 3:
                    return False
                for c in range(nc):
                    hv = seg[7 + 3 * c]
                    hi, vi = hv >> 4, hv & 0x0F
                    if not (1 <= hi <= 4 and 1 <= vi <= 4):
                        return False
                frame_seen = True
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return False                       # non-baseline frame
            elif marker == 0xDD:                   # DRI must be zero
                if struct.unpack_from(">H", seg, 0)[0] != 0:
                    return False
            elif marker == 0xDA:                   # SOS
                if not frame_seen or seg[0] != 3:
                    return False
                data_start = pos + 2 + seg_len
                return blob.rfind(b"\xff\xd9") >= data_start
            pos += 2 + seg_len
        return False
    except (IndexError, struct.error):
        return False


def decode_jpeg_native(blob: bytes):
    """Baseline JFIF JPEG bytes -> (h, w, 3) uint8 RGB via libjpeg, or
    None — same envelope as functions/jpeg.decode_jpeg (marker precheck
    + warnings-as-errors; see module docstring)."""
    lib = _jpeg_shim()
    if lib is None:
        raise RuntimeError("libjpeg shim unavailable")
    blob = bytes(blob)
    if not jpeg_envelope_ok(blob):
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.jss_decode_rgb(blob, len(blob), ctypes.byref(out),
                            ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    try:
        n = h.value * w.value * 3
        return np.ctypeslib.as_array(out, shape=(n,)).reshape(
            h.value, w.value, 3).copy()
    finally:
        lib.jss_free(out)


def native_codec_status() -> dict:
    """One-line availability report (docs / tests / MICROBENCH)."""
    return {"enabled": native_enabled(),
            "jpeg": _jpeg_shim() is not None,
            "webp": _libwebp() is not None}
