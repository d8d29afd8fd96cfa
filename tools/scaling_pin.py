#!/usr/bin/env python
"""Pin the binding constraint of the sub-0.8 scaling jobs
(VERDICT-r5 #5): BENCH/BASELINE.md shows full_check 0.60,
full_check_stored 0.58 and phash_neardup 0.56 N->4N efficiency, and
argues the cap is the single VM's memory subsystem via a NUMPY
sort+group bound.  This script closes the gap between that numpy bound
and the Spark jobs with SPARK-NATIVE micro-kernels: the exact
primitives the three jobs add on top of the 0.90-efficient
compute_validate path — a random-key hash aggregation (what uniqueness
adds), an exchange + aggregation (what the shuffle adds), and a
fan-out join probe (what the enumerate near-dup join adds) — each run
at local[8] and local[32] in fresh JVMs on generated-in-flight data
(zero I/O, shuffle on tmpfs).

If the Spark-native kernels reproduce the same ~0.55-0.65 ceiling
while pure expression evaluation holds ~0.85+, the jobs' misses are
pinned to the shared-DRAM random-access kernel — a single-box artifact
(a real N->4N cluster adds memory channels with its executors) — and
not to a plan defect.  Writes BENCH/SCALING_PIN_r06.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(os.environ.get("PIN_ROWS", 64_000_000))
LEVELS = (8, 32)
REPEATS = 3

_WORKER = r"""
import json, sys, time
sys.path.insert(0, @REPO@)
cores = int(sys.argv[1])
rows = @ROWS@
from jsonschema_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("pin-%d" % cores, cores=cores,
                  shuffle_partitions=cores * 4)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

base = spark.range(0, rows, 1, cores * 8)

def expr_eval():
    # pure codegen expression chain, no keys, no exchange — the
    # compute_validate analogue.  16x the base rows and a 16-term
    # hash chain so the job runs seconds, not the sub-second regime
    # where scheduling overhead swamps the scaling signal
    wide = spark.range(0, rows * 16, 1, cores * 8)
    pred = None
    for s in range(16):
        c = F.xxhash64("id", F.lit(s)) % 1000003
        t = (c > 10) & (c % 7 != 3)
        pred = t if pred is None else (pred & t)
    return wide.select(F.sum(pred.cast("long"))).collect()[0][0]

def hash_agg():
    # random-key hash aggregation (the uniqueness-check kernel):
    # xxhash64 keys ~ all-distinct, partial agg does not collapse
    return (base.groupBy(F.xxhash64("id").alias("k"))
            .count().select(F.sum("count")).collect()[0][0])

def exchange_agg():
    # explicit exchange + second-level agg (the shuffle kernel)
    return (base.repartition(cores * 4, F.xxhash64("id"))
            .groupBy(F.pmod(F.xxhash64("id"), F.lit(1000000)).alias("k"))
            .count().select(F.sum("count")).collect()[0][0])

def fanout_join():
    # key fan-out + self-join probe (the enumerate near-dup kernel):
    # 8x probe expansion on exact keys, tiny match rate
    n = rows // 16
    small = spark.range(0, n, 1, cores * 8)
    probes = small.select(
        F.explode(F.array(*[F.xxhash64("id", F.lit(i)).alias(f"h{i}")
                            for i in range(8)])).alias("k"))
    build = small.select(F.xxhash64("id", F.lit(0)).alias("k"))
    return probes.join(build, "k").count()

out = {"cores": cores, "rows": rows}
for name, fn in (("expr_eval", expr_eval), ("hash_agg", hash_agg),
                 ("exchange_agg", exchange_agg),
                 ("fanout_join", fanout_join)):
    best = None
    for _ in range(@REPEATS@):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
print("RESULT " + json.dumps(out))
spark.stop()
""".replace("@REPO@", repr(REPO)).replace("@ROWS@", str(ROWS)) \
    .replace("@REPEATS@", str(REPEATS))

KERNELS = ("expr_eval", "hash_agg", "exchange_agg", "fanout_join")

WHAT = {
    "expr_eval": "pure codegen expression chain (compute_validate "
                 "analogue) — control",
    "hash_agg": "random-key hash aggregation = what uniqueness adds to "
                "full_check / full_check_stored",
    "exchange_agg": "exchange + two-level aggregation = the shuffle "
                    "kernel of full_check",
    "fanout_join": "8x key fan-out + exact-key join probe = the "
                   "enumerate near-dup kernel of phash_neardup",
}


def run_level(cores: int) -> dict:
    env = dict(os.environ)
    shm = "/dev/shm/spark-pin"
    os.makedirs(shm, exist_ok=True)
    env["SPARK_LOCAL_DIRS"] = shm
    env.setdefault("SPARK_DRIVER_MEM", f"{max(8, cores)}g")
    proc = subprocess.run([sys.executable, "-c", _WORKER, str(cores)],
                          capture_output=True, text=True, timeout=2400,
                          env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(proc.stdout[-2000:] + proc.stderr[-2000:])


def main() -> None:
    results = {}
    for c in LEVELS + LEVELS:       # interleave, keep per-level best
        r = run_level(c)
        if c not in results:
            results[c] = r
        else:
            for k in KERNELS:
                results[c][k] = min(results[c][k], r[k])
    n, n4 = LEVELS
    lines = [
        "# BENCH/SCALING_PIN_r06.md — Spark-native kernel pin for the "
        "sub-0.8 scaling jobs",
        "",
        "Companion to BENCH/BASELINE.md (VERDICT-r5 #5).  Same-shape "
        f"Spark micro-kernels on {ROWS:,} generated rows (zero I/O, "
        "fresh JVM per level, shuffle on tmpfs, interleaved best-of-"
        f"{REPEATS}):",
        "",
        f"| kernel | local[{n}] s | local[{n4}] s | speedup | "
        "efficiency | what it isolates |",
        "|---|---|---|---|---|---|",
    ]
    effs = {}
    for k in KERNELS:
        t8, t32 = results[n][k], results[n4][k]
        sp = t8 / t32
        eff = sp / (n4 / n)
        effs[k] = round(eff, 3)
        lines.append(f"| {k} | {t8:.1f} | {t32:.1f} | {sp:.2f}x | "
                     f"**{eff:.2f}** | {WHAT[k]} |")
    lines += [
        "",
        "Reading: if `expr_eval` holds near the machine's 0.83-0.90 "
        "CPU ceiling while the key/shuffle/join kernels land in the "
        "same 0.5-0.65 band as full_check (0.60), full_check_stored "
        "(0.58) and phash_neardup (0.56), then those jobs' north-rule "
        "misses are the shared-DRAM random-access bound of this single "
        "VM — the exact kernels they add over the 0.90-scaling "
        "validation path — and not a plan defect.  A real N->4N "
        "cluster adds memory channels with its executors, so the bound "
        "has no cluster analogue.",
        "",
        f"Raw: `{json.dumps(results)}`",
    ]
    out_path = os.path.join(REPO, "BENCH", "SCALING_PIN_r06.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"results": results, "efficiency": effs}))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
