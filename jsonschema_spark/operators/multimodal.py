"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns with typed metadata, as mandated
by the north-star input shape.  The Spark-side plumbing — schema,
Arrow batch shape, partition-capped batch sizes, UDF signatures — is
real and tested; the *codec* step is stubbed: real decoders (Pillow,
ffmpeg) are not in this container, so ``decode_images`` parses the
deterministic synthetic header written by
``jsonschema_spark.sources.images._payload`` and computes a
deterministic fake pixel statistic, while ``decode_images_real`` raises
``NotImplementedError`` unless a codec is importable.

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


def decode_images(df: DataFrame) -> DataFrame:
    """Stub decode over Arrow batches (mapInPandas).  Batch sizes are
    bounded by spark.sql.execution.arrow.maxRecordsPerBatch so image
    payload batches can't blow executor memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _parse_batch(pdf)

    return df.select("image_id", "fmt", "bytes").mapInPandas(
        run, schema=DECODE_SCHEMA)


def decode_images_real(df: DataFrame) -> DataFrame:
    """Real codec path — requires an image library not present in this
    container.  The plumbing (same schema/batching) is shared with the
    stub; only the per-blob decode differs."""
    if not _codec_available():
        raise NotImplementedError(
            "real image decoding requires Pillow, which is not installed "
            "in this environment; use decode_images() (deterministic stub)")
    raise NotImplementedError("codec integration pending")  # pragma: no cover


def psnr_check(df: DataFrame, min_psnr: float = 40.0) -> DataFrame:
    """Decoded-pixel invariant (BASELINE.json input_hint): violation rows
    for payloads whose stub-decoded PSNR falls below `min_psnr` or whose
    header metadata disagrees with the table's (w, h)."""
    decoded = decode_images(df)
    meta = df.select("image_id", "w", "h")
    joined = decoded.join(meta, "image_id")
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
