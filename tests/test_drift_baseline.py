"""Drift vs a persisted baseline snapshot (north-star: per-partition
histograms/KS compared against a saved clean-snapshot stats table)."""

from pyspark.sql import functions as F

from jsonschema_spark.operators.drift import (check_against_baseline,
                                              drift_statistics, histogram,
                                              load_baseline, save_baseline)
from jsonschema_spark.sources.images import images_df


def test_baseline_roundtrip_no_drift(spark, tmp_path):
    img = images_df(spark, 10_000)
    path = str(tmp_path / "baseline")
    save_baseline(img, path,
                  numeric={"w": (0.0, 4096.0, 16)},
                  categorical=["fmt"])
    # identical data -> zero drift violations
    v = check_against_baseline(img, path,
                               numeric={"w": (0.0, 4096.0, 16)},
                               categorical=["fmt"], max_ks=0.01)
    assert v.count() == 0
    # baseline loads back exactly
    base = load_baseline(spark, path, "w")
    cur = histogram(img, "w", 0.0, 4096.0, 16).withColumn(
        "bucket", F.col("bucket").cast("string"))
    s = drift_statistics(cur, base)
    assert s["ks"] == 0.0 and s["l1"] == 0.0


def test_shifted_distribution_flags_drift(spark, tmp_path):
    img = images_df(spark, 10_000)
    path = str(tmp_path / "baseline2")
    save_baseline(img, path, numeric={"w": (0.0, 4096.0, 16)})
    shifted = img.withColumn("w", F.col("w") * 2 + 500)
    v = check_against_baseline(shifted, path,
                               numeric={"w": (0.0, 4096.0, 16)},
                               max_ks=0.05)
    rows = {r["keyword"] for r in v.collect()}
    assert "drift:ks" in rows
