"""Image-metadata quality + caption-image alignment checks
(operators/quality.py, the `image_quality` / `alignment` x-spark
blocks)."""

import math

import numpy as np
import pytest

from jsonschema_spark.operators.quality import (alignment_violations,
                                                cosine_columns,
                                                image_quality_violations)
from jsonschema_spark.spec import SchemaCompileError, _check_x_spark


def _imgs(spark):
    rows = [
        # id, w, h, nbytes  (payload synthesized as that many bytes)
        ("ok",        100, 100, 5000),
        ("wide",      6400,  20, 5000),     # aspect 320
        ("tall",        20, 6400, 5000),    # aspect 1/320
        ("tiny",         8,   8, 500),      # 64 px < min_pixels
        ("truncated",  100, 100, 6),        # < min_bytes
        ("bloated",     10,  10, 90000),    # 900 bytes/px > max
        ("zero_w",       0, 100, 500),      # geometry checks skipped
        ("null_dims", None, None, 500),     # geometry checks skipped
        ("null_bytes", 100, 100, None),     # byte checks skipped
    ]
    data = [(i, w, h, (b"x" * n) if n is not None else None)
            for (i, w, h, n) in rows]
    return spark.createDataFrame(
        data, "image_id string, w int, h int, bytes binary")


CFG = {"min_aspect": 0.01, "max_aspect": 100.0,
       "min_pixels": 100, "max_pixels": 10_000_000,
       "min_bytes": 16, "max_bytes": 50_000,
       "min_bytes_per_pixel": 0.001, "max_bytes_per_pixel": 100.0}


def test_image_quality_flags_each_band(spark):
    out = image_quality_violations(_imgs(spark), CFG, ["image_id"])
    got = {(r["image_id"], r["keyword"]) for r in out.collect()}
    assert ("wide", "imageQuality:aspect") in got
    assert ("tall", "imageQuality:aspect") in got
    assert ("tiny", "imageQuality:pixels") in got
    assert ("truncated", "imageQuality:bytes") in got
    assert ("bloated", "imageQuality:bytes") in got      # 90000 > 50000
    assert ("bloated", "imageQuality:bytesPerPixel") in got
    assert not any(i == "ok" for i, _ in got)


def test_image_quality_skips_bad_geometry_and_null_bytes(spark):
    out = image_quality_violations(_imgs(spark), CFG, ["image_id"])
    got = {(r["image_id"], r["keyword"]) for r in out.collect()}
    # non-positive / NULL dims: no geometry or ratio findings (the row
    # keywords own those defects); NULL bytes: no byte findings
    assert not any(i in ("zero_w", "null_dims")
                   and k in ("imageQuality:aspect", "imageQuality:pixels",
                             "imageQuality:bytesPerPixel")
                   for i, k in got)
    assert not any(i == "null_bytes" and "bytes" in k.lower()
                   for i, k in got)


def test_image_quality_messages_use_integer_dims(spark):
    out = image_quality_violations(_imgs(spark), CFG, ["image_id"])
    msg = {r["image_id"]: r["message"] for r in out.collect()
           if r["keyword"] == "imageQuality:aspect"}
    assert "6400x20" in msg["wide"]        # no float-formatted ratios


def test_image_quality_single_threshold(spark):
    out = image_quality_violations(_imgs(spark), {"min_bytes": 16},
                                   ["image_id"])
    got = {(r["image_id"], r["keyword"]) for r in out.collect()}
    assert got == {("truncated", "imageQuality:bytes")}


def _emb(spark):
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.8, 0.6, 0.0, 0.0]          # cos vs a = 0.8
    c = [0.0, 0.0, 1.0, 0.0]          # cos vs a = 0.0
    rows = [
        ("high", a, a),
        ("mid", a, b),
        ("low", a, c),
        ("missing_txt", a, None),
        ("zero_img", [0.0, 0.0, 0.0, 0.0], a),
    ]
    return spark.createDataFrame(
        rows, "pair_id string, img array<float>, txt array<float>")


def test_alignment_thresholds_and_missing(spark):
    cfg = {"image_col": "img", "text_col": "txt", "min_cosine": 0.5}
    out = alignment_violations(_emb(spark), cfg, ["pair_id"])
    got = {(r["pair_id"], r["keyword"]) for r in out.collect()}
    assert got == {("low", "alignment:cosine"),
                   ("missing_txt", "alignment:missing"),
                   ("zero_img", "alignment:missing")}
    # raise the bar: mid (0.8) trips too
    cfg["min_cosine"] = 0.9
    got = {(r["pair_id"], r["keyword"])
           for r in alignment_violations(_emb(spark), cfg,
                                         ["pair_id"]).collect()}
    assert ("mid", "alignment:cosine") in got
    assert ("high", "alignment:cosine") not in got


def test_cosine_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(50):
        u = rng.normal(size=16).astype(np.float32)
        v = rng.normal(size=16).astype(np.float32)
        rows.append((i, u.tolist(), v.tolist()))
    df = spark.createDataFrame(rows,
                               "i long, u array<float>, v array<float>")
    from pyspark.sql import functions as F
    got = {r["i"]: r["cos"] for r in df.select(
        "i", cosine_columns(F.col("u"), F.col("v")).alias("cos")).collect()}
    for i, u, v in rows:
        u64 = np.asarray(u, dtype=np.float64)
        v64 = np.asarray(v, dtype=np.float64)
        exp = float(u64 @ v64 / (np.linalg.norm(u64) * np.linalg.norm(v64)))
        assert math.isclose(got[i], exp, rel_tol=1e-12), (i, got[i], exp)


def test_spec_grammar_image_quality():
    _check_x_spark({"image_quality": {"min_aspect": 0.1}}, "#/x-spark")
    with pytest.raises(SchemaCompileError, match="unknown key"):
        _check_x_spark({"image_quality": {"min_aspct": 0.1}}, "#/x-spark")
    with pytest.raises(SchemaCompileError, match="at least one threshold"):
        _check_x_spark({"image_quality": {"w_col": "w"}}, "#/x-spark")
    with pytest.raises(SchemaCompileError, match="must be a number"):
        _check_x_spark({"image_quality": {"min_bytes": "16"}}, "#/x-spark")
    with pytest.raises(SchemaCompileError, match="<= max_aspect"):
        _check_x_spark({"image_quality": {"min_aspect": 2.0,
                                          "max_aspect": 1.0}}, "#/x-spark")


def test_spec_grammar_alignment():
    _check_x_spark({"alignment": {"image_col": "a", "text_col": "b"}},
                   "#/x-spark")
    with pytest.raises(SchemaCompileError, match="embedding column"):
        _check_x_spark({"alignment": {"image_col": "a"}}, "#/x-spark")
    with pytest.raises(SchemaCompileError, match=r"\[-1, 1\]"):
        _check_x_spark({"alignment": {"image_col": "a", "text_col": "b",
                                      "min_cosine": 2.0}}, "#/x-spark")
    with pytest.raises(SchemaCompileError, match="unknown key"):
        _check_x_spark({"alignment": {"image_col": "a", "text_col": "b",
                                      "min_cos": 0.5}}, "#/x-spark")


def test_validate_dataset_integration(spark):
    """Both blocks run through validate_dataset alongside row keywords
    and emit into the unified violation stream."""
    from jsonschema_spark import validate_dataset
    rows = [
        ("ok", 100, 100, b"x" * 5000, [1.0, 0.0], [1.0, 0.0]),
        ("bad", 6400, 20, b"x" * 5, [1.0, 0.0], [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, bytes binary, "
              "img array<float>, txt array<float>")
    schema = {
        "type": "object",
        "properties": {"w": {"maximum": 5000}},
        "x-spark": {
            "image_quality": {"max_aspect": 100.0, "min_bytes": 16},
            "alignment": {"image_col": "img", "text_col": "txt",
                          "min_cosine": 0.5},
        },
    }
    out = validate_dataset(df, schema, ["image_id"])
    got = {(r["image_id"], r["keyword"]) for r in out.collect()}
    assert got == {("bad", "maximum"),
                   ("bad", "imageQuality:aspect"),
                   ("bad", "imageQuality:bytes"),
                   ("bad", "alignment:cosine")}
