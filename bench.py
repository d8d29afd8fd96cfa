#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": N, "unit": "sec",
             "queries": {...}, "sf": ...}

Also measures the north-star constraint-eval throughput (validated
rows/sec over the synthetic image+caption table) — the BASELINE.json
metric — and reports it alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
IMAGES_ROWS = int(os.environ.get("BENCH_IMAGES_ROWS", 8_000_000))


def _force(df) -> int:
    """Force full computation without sink cost (noop datasource)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    from jsonschema_spark.session import get_spark
    import __spark_entry__ as entrymod

    # heap sized for 32 concurrent aggregation tasks (8g GC-thrashes)
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # JVM + codegen warm-up so the first measured query isn't paying it
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        _force(queries[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    # north-star throughput: row-level validation of the synthetic
    # image+caption table READ FROM PARQUET (the stored-table scan the
    # BASELINE.json metric is defined over; generation cost excluded)
    import tempfile

    from jsonschema_spark import CompiledValidator
    from jsonschema_spark.sources.images import IMAGES_SCHEMA, images_df
    img_path = os.path.join(tempfile.gettempdir(),
                            f"bench_images_{IMAGES_ROWS}")
    if not os.path.exists(os.path.join(img_path, "_SUCCESS")):
        (images_df(spark, IMAGES_ROWS, partitions=CPUS * 2)
         .write.mode("overwrite").parquet(img_path))
    img = spark.read.parquet(img_path)
    spec = {k: v for k, v in IMAGES_SCHEMA.items() if k != "x-spark"}
    v = CompiledValidator(spec, img)
    t0 = time.perf_counter()
    ok, bad = v.counts(img)
    dt = time.perf_counter() - t0
    rows_per_sec = IMAGES_ROWS / dt

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "validation_throughput_rows_per_sec": round(rows_per_sec),
        "validation_rows": IMAGES_ROWS,
        "validation_invalid_rows": bad,
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
