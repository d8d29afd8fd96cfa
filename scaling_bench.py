#!/usr/bin/env python
"""N -> 4N scaling measurement (north_rule: throughput scaling efficiency
>= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two parallelism levels — local[8] and local[32] — on the
same materialized input, and we report throughput at both plus
efficiency = (T_32 / T_8) / 4.  Each level runs in its own subprocess
(fresh JVM) so thread pools / codegen caches can't leak between levels.

Jobs measured:
- scan_validate: row-level constraint eval (narrow, scan-bound)
- full_check:    row-level + uniqueness (shuffle) + referential (broadcast
                 anti-join) — the shuffle-bound path where scaling is won
                 or lost.

Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
ROWS = int(os.environ.get("SCALING_ROWS", 4_000_000))
DATA = os.path.join("/tmp", f"scaling_images_{ROWS}")
LEVELS = (8, 32)
REPEATS = 3

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
cores = int(sys.argv[1])
rows = int(sys.argv[2])
data = sys.argv[3]
from jsonschema_spark.session import get_spark
from jsonschema_spark import CompiledValidator
from jsonschema_spark.sources.images import IMAGES_SCHEMA, images_df, licenses_df
from jsonschema_spark.operators.uniqueness import duplicate_keys
from jsonschema_spark.operators.referential import orphans
from pyspark.sql import functions as F

spark = get_spark("scaling-%%d" %% cores, cores=cores, shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
if not os.path.exists(os.path.join(data, "_SUCCESS")):
    images_df(spark, rows, partitions=64, with_license=True) \
        .write.mode("overwrite").parquet(data)
img = spark.read.parquet(data)
spec = {k: v for k, v in IMAGES_SCHEMA.items() if k != "x-spark"}
v = CompiledValidator(spec, img)
lic = licenses_df(spark)
spark.range(1_000_000).selectExpr("sum(id)").collect()   # warm-up

def scan_validate():
    return v.counts(img)

def full_check():
    ok, bad = v.counts(img)
    dups = duplicate_keys(img, ["image_id"]).count()
    dups2 = duplicate_keys(img, ["phash"]).count()
    orph = orphans(img, "license_id", lic, "license_id").count()
    return ok, bad, dups, dups2, orph

out = {"cores": cores, "rows": rows}
for name, fn in (("scan_validate", scan_validate), ("full_check", full_check)):
    best = None
    for _ in range(%(repeats)d):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = {"seconds": round(best, 3),
                 "rows_per_sec": round(rows / best)}
print("RESULT " + json.dumps(out))
spark.stop()
""" % {"repo": REPO, "repeats": REPEATS}


def run_level(cores: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER, str(cores), str(ROWS), DATA],
        capture_output=True, text=True, timeout=1800)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker local[{cores}] produced no result:\n"
                       f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main() -> None:
    results = {c: run_level(c) for c in LEVELS}
    n, n4 = LEVELS
    lines = [
        "# BENCH/BASELINE.md — N vs 4N scaling measurement",
        "",
        f"Job: validate the synthetic image+caption table "
        f"({ROWS:,} rows, parquet at {DATA}) — row-level constraint eval "
        f"(`scan_validate`) and row-level + uniqueness(image_id, phash) + "
        f"referential license check (`full_check`).",
        f"Sandbox proxy for N->4N executors per the driver instruction: "
        f"same job, same input, local[{n}] vs local[{n4}] "
        f"(fresh JVM each), best of {REPEATS} runs.",
        "",
        "| job | local[8] rows/s | local[32] rows/s | speedup | "
        "efficiency (speedup/4) |",
        "|---|---|---|---|---|",
    ]
    effs = {}
    for job in ("scan_validate", "full_check"):
        r8 = results[n][job]["rows_per_sec"]
        r32 = results[n4][job]["rows_per_sec"]
        speedup = r32 / r8
        eff = speedup / (n4 / n)
        effs[job] = eff
        lines.append(f"| {job} | {r8:,} | {r32:,} | {speedup:.2f}x | "
                     f"**{eff:.2f}** |")
    lines += [
        "",
        f"Raw: `{json.dumps(results)}`",
        "",
        "north_rule target: efficiency >= 0.8 from N to 4N.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"results": results, "efficiency": effs}))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
