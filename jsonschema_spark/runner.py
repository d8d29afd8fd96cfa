"""Resumable validation runs: per-partition manifest + lineage + metrics.

The reference is stateless per instance; at 10^12-row scale a validation
job must be interruptible and resumable (north_rule).  Strategy (the
parquet-dir stand-in for an Iceberg MERGE, SURVEY.md §4.2):

- the input is split into **partition groups** by a partition expression
  (e.g. ``fmt``, or a bucketed hash of ``image_id``);
- each group's violations are appended under ``out/violations/part=<k>``
  and a manifest row (rows, invalid counts, timing, run lineage) is
  appended atomically *after* the group's data — the manifest row is the
  commit record;
- resume = anti-join pending groups against committed manifest rows:
  completed groups are skipped, half-written groups are overwritten
  (dynamic partition overwrite), so the protocol is idempotent under
  retries.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .validator import CompiledValidator

MANIFEST_SCHEMA = ("partition_key string, run_id string, rows long, "
                   "invalid_rows long, violation_rows long, passed boolean, "
                   "started_at double, finished_at double, "
                   "input_lineage string")


@dataclass
class RunResult:
    run_id: str
    completed: list[str]
    skipped: list[str]


class ValidationRun:
    """Drives a resumable, partition-grouped validation of one table."""

    def __init__(self, spark: SparkSession, out_dir: str,
                 schema: dict, partition_col: str = "fmt"):
        self.spark = spark
        self.out_dir = out_dir
        self.schema = schema
        self.partition_col = partition_col
        self.manifest_path = os.path.join(out_dir, "manifest")
        self.violations_path = os.path.join(out_dir, "violations")

    # ------------------------------------------------------------ manifest
    def committed_partitions(self) -> set[str]:
        try:
            rows = (self.spark.read.schema(MANIFEST_SCHEMA)
                    .parquet(self.manifest_path)
                    .select("partition_key").distinct().collect())
            return {r["partition_key"] for r in rows}
        except Exception:
            return set()

    def manifest(self) -> DataFrame:
        return self.spark.read.schema(MANIFEST_SCHEMA).parquet(
            self.manifest_path)

    # ---------------------------------------------------------------- run
    def run(self, df: DataFrame, id_cols: Sequence[str],
            lineage: Optional[dict[str, Any]] = None) -> RunResult:
        run_id = uuid.uuid4().hex[:12]
        validator = CompiledValidator(self.schema, df)
        # filesystem-safe group key: NULL/empty/odd values get sentinels
        raw = F.col(self.partition_col).cast("string")
        part = F.when(raw.isNull(), F.lit("__null__")) \
                .when(F.length(F.trim(raw)) == 0, F.lit("__empty__")) \
                .when(~raw.rlike("^[A-Za-z0-9_.-]+$"),
                      F.concat(F.lit("__h_"), F.substring(F.md5(raw), 1, 12))) \
                .otherwise(raw)
        groups = [r["k"] for r in
                  df.select(part.alias("k")).distinct().collect()]
        done = self.committed_partitions()
        completed, skipped = [], []
        lineage_json = json.dumps(lineage or {}, sort_keys=True)
        for key in sorted(groups):
            if key in done:
                skipped.append(key)
                continue
            t0 = time.time()
            grp = df.filter(part == key)
            viols = (validator.violations(grp, id_cols)
                     .withColumn("part", F.lit(key)))
            # data first (overwrite = idempotent under retry)...
            (viols.write.mode("overwrite")
             .parquet(os.path.join(self.violations_path, f"part={key}")))
            counts = grp.select(
                F.count(F.lit(1)).alias("rows"),
                F.sum((~validator.valid_column).cast("long")).alias("bad"),
            ).collect()[0]
            n_viol = self.spark.read.parquet(
                os.path.join(self.violations_path, f"part={key}")).count()
            # ...then the manifest row commits the group
            row = [(key, run_id, counts["rows"], counts["bad"] or 0,
                    n_viol, (counts["bad"] or 0) == 0, t0, time.time(),
                    lineage_json)]
            (self.spark.createDataFrame(row, MANIFEST_SCHEMA)
             .write.mode("append").parquet(self.manifest_path))
            completed.append(key)
        return RunResult(run_id, completed, skipped)
