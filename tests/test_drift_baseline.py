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


def test_partitioned_drift_matches_per_partition_reference(spark):
    """The distributed per-partition scorer agrees with the driver-side
    drift_statistics run partition-by-partition, and a planted shifted
    partition stands out on every statistic."""
    from jsonschema_spark.operators.drift import partitioned_drift
    img = images_df(spark, 12_000, with_id=True)
    # plant one drifted partition: ids ending 0-2 keep w, 3 gets w*3
    part = (F.col("id") % 4).cast("string")
    df = img.select(
        part.alias("grp"),
        F.when(F.col("id") % 4 == 3, F.col("w") * 3)
        .otherwise(F.col("w")).alias("w"))
    base = histogram(df.filter(F.col("grp") != "3"), "w", 0.0, 4096.0, 16)
    out = {r.part: r for r in
           partitioned_drift(df, "grp", "w", 0.0, 4096.0, 16,
                             base).collect()}
    assert set(out) == {"0", "1", "2", "3"}
    # distributed numbers == driver-side reference, partition by partition
    for g in out:
        cur = histogram(df.filter(F.col("grp") == g), "w", 0.0, 4096.0, 16)
        ref = drift_statistics(cur, base)
        assert abs(out[g].ks - ref["ks"]) < 1e-9
        assert abs(out[g].l1 - ref["l1"]) < 1e-9
        assert abs(out[g].chi2 - ref["chi2"]) < 1e-6
        assert out[g].n_rows == ref["n_current"]
    # the planted partition dominates every statistic
    for stat in ("ks", "l1", "chi2", "psi"):
        vals = {g: getattr(out[g], stat) for g in out}
        assert max(vals, key=vals.get) == "3", (stat, vals)
    assert out["3"].ks > 0.15 and out["0"].ks < 0.05


def test_validate_dataset_per_partition_drift(spark, tmp_path):
    """x-spark.drift with "by": per-partition scoring inside the unified
    checker — only the shifted partition trips, its violation row names
    the partition, and the clean partitions stay silent."""
    from jsonschema_spark.operators.drift import save_baseline
    from jsonschema_spark import SchemaCompileError, validate_dataset
    import pytest

    clean = spark.range(8_000).selectExpr(
        "id", "double(id % 100) as w",
        "case when id % 2 = 0 then 'png' else 'jpeg' end as fmt")
    path = str(tmp_path / "bl")
    save_baseline(clean, path, numeric={"w": (0.0, 200.0, 20)})
    # shift ONLY the jpeg partition's distribution
    shifted = spark.range(8_000).selectExpr(
        "id",
        "case when id % 2 = 0 then double(id % 100) "
        "else double(id % 100) + 80.0 end as w",
        "case when id % 2 = 0 then 'png' else 'jpeg' end as fmt")
    spec = {"type": "object",
            "x-spark": {"drift": {"baseline": path, "by": "fmt",
                                  "numeric": {"w": [0.0, 200.0, 20]},
                                  "max_ks": 0.05}}}
    v = validate_dataset(shifted, spec).collect()
    assert len(v) == 1
    assert v[0]["keyword"] == "drift:ks"
    assert "partition fmt=jpeg" in v[0]["message"]
    assert float(v[0]["failing_value"]) > 0.05
    # identical data: every partition clean
    assert validate_dataset(clean, spec).count() == 0
    # grammar: by + categorical is rejected up front
    bad = {"type": "object",
           "x-spark": {"drift": {"baseline": path, "by": "fmt",
                                 "categorical": ["fmt"]}}}
    with pytest.raises(SchemaCompileError, match="numeric columns only"):
        validate_dataset(shifted, bad)


def test_drift_null_threshold_and_missing_baseline_column(spark, tmp_path):
    """Review-r4 guards: a present-but-JSON-null max_ks falls back to
    the 0.1 default in BOTH modes (instead of TypeError / silently
    disabling the predicate), and a baseline snapshot missing the
    profiled column raises a pointed error in by-mode instead of a
    silent pass."""
    import pytest
    from jsonschema_spark import validate_dataset
    from jsonschema_spark.operators.drift import save_baseline

    df = spark.range(2_000).selectExpr(
        "id", "double(id % 100) as w",
        "case when id % 2 = 0 then 'png' else 'jpeg' end as fmt")
    path = str(tmp_path / "bl")
    save_baseline(df, path, numeric={"w": (0.0, 200.0, 20)})
    for extra in ({}, {"by": "fmt"}):
        spec = {"x-spark": {"drift": {"baseline": path,
                                      "numeric": {"w": [0.0, 200.0, 20]},
                                      "max_ks": None, "max_l1": None,
                                      **extra}}}
        assert validate_dataset(df, spec).count() == 0  # default 0.1, clean
    bad = {"x-spark": {"drift": {"baseline": path, "by": "fmt",
                                 "numeric": {"h": [0.0, 200.0, 20]}}}}
    with pytest.raises(ValueError, match="no histogram for column 'h'"):
        validate_dataset(df, bad).count()
