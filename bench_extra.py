#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink and optionally dumps `.explain("formatted")`
to plans/r06/.  Does NOT replace bench.py (which is frozen for driver
measurement) — this is the round-6 optimization workbench.

Usage:
    python bench_extra.py [--sf-dir DIR] [--rounds N] [--plans TAG] q1 q2 ...
    python bench_extra.py --all            # every registered query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="dump explain('formatted') to plans/r06/<q>_<TAG>.txt")
    ap.add_argument("--ansi", action="store_true",
                    help="run with spark.sql.ansi.enabled=true (driver parity)")
    args = ap.parse_args()

    from jsonschema_spark.session import get_spark
    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus,
                      max_partition_bytes=32 << 20)
    if args.ansi:
        spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = entrymod.queries()
    names = list(queries) if args.all else args.names
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if args.plans:
        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)

    out: dict[str, object] = {}
    for name in names:
        # setup pass (builds frame; performs any one-time eager writes)
        df = queries[name](spark, args.sf_dir)
        if args.plans:
            p = os.path.join(REPO, "plans", "r06",
                             f"{name}_{args.plans}.txt")
            with open(p, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        samples = []
        for _ in range(args.rounds):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            queries[name](spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        if samples:
            out[name] = {"min": min(samples), "samples": samples}
            print(f"  {name}: {min(samples):.3f}s  {samples}",
                  file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": cpus,
                      "ansi": args.ansi, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
