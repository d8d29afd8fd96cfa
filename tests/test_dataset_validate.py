"""validate_dataset: the x-spark extension block end-to-end — row-level
keywords + uniqueness + referential + stats + pixel invariant unified."""

from pyspark.sql import functions as F

from jsonschema_spark import CompiledValidator, validate_dataset
from jsonschema_spark.sources.images import (IMAGES_SCHEMA, images_df,
                                             licenses_df)


def test_validate_dataset_unifies_all_check_tiers(spark):
    img = images_df(spark, 10_000, with_license=True).cache()
    spec = dict(IMAGES_SCHEMA)
    spec["x-spark"] = dict(spec["x-spark"])
    spec["x-spark"]["pixel_invariant"] = {"min_psnr": 40.0}
    spec["x-spark"]["stats"] = {"caption": {"max_null_rate": 0.0001}}
    v = validate_dataset(img, spec, ["image_id"],
                         tables={"licenses": licenses_df(spark)}).cache()
    kinds = {r["keyword"] for r in v.select("keyword").distinct().collect()}
    # every tier contributes (planted violations guarantee nonzero counts)
    assert "pattern" in kinds                      # row keyword
    assert "uniqueItems:image_id" in kinds         # uniqueness
    assert "uniqueItems:phash" in kinds
    assert "referential:license_id" in kinds       # referential
    assert "pixelInvariant" in kinds               # pixel invariant
    assert "stats:max_null_rate" in kinds          # dataset stats
    # row-level subset must equal CompiledValidator exactly
    row_schema = {k: s for k, s in spec.items() if k != "x-spark"}
    want = CompiledValidator(row_schema, img).violations(
        img, ["image_id"]).count()
    got = v.filter(~F.col("schema_path").startswith("x-spark")).count()
    assert got == want
    img.unpersist()


def test_validate_dataset_missing_table_raises(spark):
    img = images_df(spark, 100, with_license=True)
    try:
        validate_dataset(img, IMAGES_SCHEMA, ["image_id"], tables={})
        assert False, "expected ValueError"
    except ValueError as e:
        assert "licenses" in str(e)
