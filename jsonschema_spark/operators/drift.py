"""Distribution-drift checks: histograms + KS / L1 / chi-square vs a
baseline snapshot.

No direct reference analogue (closest is enum-membership frequency,
/root/reference/jsonschema/_keywords.py:269-271); mandated by
BASELINE.json north_star.  Histograms are a single groupBy over a
native bucket expression (partial+final agg — the only shuffle), and the
statistic comparison runs on the tiny aggregated frames.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_expr(col: str, lo: float, hi: float, bins: int):
    """Equal-width bucket index in [0, bins): floor((x-lo)/step), clamped.
    Plain arithmetic (not width_bucket) so a DuckDB oracle can reproduce
    it exactly."""
    step = (hi - lo) / bins
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(step)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))


def histogram(df: DataFrame, col: str, lo: float, hi: float,
              bins: int = 32) -> DataFrame:
    """(bucket, n) — one shuffle, map-side combined."""
    return (df.filter(F.col(col).isNotNull())
            .groupBy(bucket_expr(col, lo, hi, bins).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n")))


def categorical_histogram(df: DataFrame, col: str) -> DataFrame:
    return (df.groupBy(F.col(col).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n")))


def drift_statistics(current: DataFrame, baseline: DataFrame) -> dict:
    """KS (max |CDF diff|), L1/total-variation, and chi-square over two
    (bucket, n) histograms.  Joins two already-aggregated tiny frames —
    driver cost only."""
    cur = current.withColumnRenamed("n", "n_cur")
    base = baseline.withColumnRenamed("n", "n_base")
    joined = (cur.join(base, "bucket", "full_outer")
              .fillna(0, ["n_cur", "n_base"])
              .orderBy("bucket"))
    rows = joined.collect()
    tot_c = sum(r["n_cur"] for r in rows) or 1
    tot_b = sum(r["n_base"] for r in rows) or 1
    ks = 0.0
    l1 = 0.0
    chi2 = 0.0
    cum_c = cum_b = 0
    for r in rows:
        pc = r["n_cur"] / tot_c
        pb = r["n_base"] / tot_b
        cum_c += r["n_cur"]
        cum_b += r["n_base"]
        ks = max(ks, abs(cum_c / tot_c - cum_b / tot_b))
        l1 += abs(pc - pb)
        expected = pb * tot_c
        if expected > 0:
            chi2 += (r["n_cur"] - expected) ** 2 / expected
    return {"ks": ks, "l1": l1 / 2.0, "chi2": chi2,
            "n_current": tot_c, "n_baseline": tot_b}


def save_baseline(df: DataFrame, path: str,
                  numeric: dict[str, tuple[float, float, int]] = {},
                  categorical: Sequence[str] = ()) -> None:
    """Persist a baseline-stats snapshot: one histogram per profiled
    column, tagged, under `path` (the parquet stand-in for an Iceberg
    snapshot table keyed by snapshot id).  `numeric` maps column ->
    (lo, hi, bins)."""
    parts = []
    for col, (lo, hi, bins) in numeric.items():
        parts.append(histogram(df, col, lo, hi, bins)
                     .withColumn("column", F.lit(col))
                     .withColumn("bucket", F.col("bucket").cast("string")))
    for col in categorical:
        parts.append(categorical_histogram(df, col)
                     .withColumn("column", F.lit(col))
                     .withColumn("bucket", F.col("bucket").cast("string")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(path)


def load_baseline(spark, path: str, col: str) -> DataFrame:
    """One column's histogram back out of a saved snapshot."""
    return (spark.read.parquet(path)
            .filter(F.col("column") == col)
            .select("bucket", "n"))


def check_against_baseline(df: DataFrame, baseline_path: str,
                           numeric: dict[str, tuple[float, float, int]] = {},
                           categorical: Sequence[str] = (),
                           max_ks: float = 0.1,
                           max_l1: Optional[float] = None) -> DataFrame:
    """Drift violations of `df` vs a saved snapshot, per profiled
    column — the north-star 'distribution-drift vs baseline snapshot'
    check end-to-end."""
    spark = df.sparkSession
    out = None
    for col, (lo, hi, bins) in numeric.items():
        cur = (histogram(df, col, lo, hi, bins)
               .withColumn("bucket", F.col("bucket").cast("string")))
        v = drift_violations(cur, load_baseline(spark, baseline_path, col),
                             col, max_ks, max_l1)
        out = v if out is None else out.unionByName(v)
    for col in categorical:
        cur = (categorical_histogram(df, col)
               .withColumn("bucket", F.col("bucket").cast("string")))
        v = drift_violations(cur, load_baseline(spark, baseline_path, col),
                             col, max_ks, max_l1)
        out = v if out is None else out.unionByName(v)
    return out


def drift_violations(current: DataFrame, baseline: DataFrame, col: str,
                     max_ks: float = 0.1,
                     max_l1: Optional[float] = None) -> DataFrame:
    """Violation rows (keyword 'drift:<stat>') when the drift statistic
    between two histograms of `col` exceeds its threshold."""
    stats = drift_statistics(current, baseline)
    rows = []
    if stats["ks"] > max_ks:
        rows.append(("drift:ks", f"$.{col}", f"x-spark/drift/{col}/ks",
                     f"KS statistic {stats['ks']:.4f} exceeds {max_ks}",
                     f"{stats['ks']:.6f}"))
    if max_l1 is not None and stats["l1"] > max_l1:
        rows.append(("drift:l1", f"$.{col}", f"x-spark/drift/{col}/l1",
                     f"L1 distance {stats['l1']:.4f} exceeds {max_l1}",
                     f"{stats['l1']:.6f}"))
    spark = current.sparkSession
    schema = ("keyword string, json_path string, schema_path string, "
              "message string, failing_value string")
    return spark.createDataFrame(rows, schema)


def partitioned_drift(df: DataFrame, part_col: str, col: str,
                      lo: float, hi: float, bins: int,
                      baseline: DataFrame) -> DataFrame:
    """Per-partition drift vs ONE baseline histogram — the north-star
    shape verbatim (BASELINE.json north_star: "distribution-drift
    checks comparing per-partition histograms/KS statistics against a
    baseline snapshot"), computed fully DISTRIBUTED: no driver-side
    per-partition loop, so 100k partitions cost one shuffle + one
    window, not 100k jobs.

    Plan: one groupBy(part, bucket) count (the only wide shuffle over
    the data) -> dense (part x bucket) grid from a codegen'd sequence
    explode -> broadcast-joined baseline counts -> within-partition
    cumulative sums (window over bucket) -> per-partition aggregates:

    - ks:   max |CDF_cur - CDF_base|
    - l1:   total-variation distance, sum|p_cur - p_base| / 2
    - chi2: sum (n_cur - E)^2 / E over buckets with baseline mass
    - psi:  population stability index with add-one (Laplace)
            smoothing on both sides so empty buckets stay finite:
            sum (pc' - pb') * ln(pc'/pb'), p' = (n+1)/(tot+bins)

    `baseline` is a (bucket, n) histogram built with the SAME
    `bucket_expr` bounds (e.g. `histogram(...)` of the snapshot).
    Rows of `df` with NULL `part_col`/`col` are excluded, matching the
    table-scope `drift_statistics`.  Every expression is native (the
    windows are tiny: `bins` rows per partition), so a SQL engine can
    reproduce the numbers bit-for-bit — see the `drift_partitioned`
    driver oracle."""
    cur = (df.filter(F.col(col).isNotNull() & F.col(part_col).isNotNull())
           .groupBy(F.col(part_col).alias("part"),
                    bucket_expr(col, lo, hi, bins).alias("bucket"))
           .agg(F.count(F.lit(1)).alias("n_cur")))
    return score_histograms(cur, bins, baseline)


def score_histograms(cur: DataFrame, bins: int,
                     baseline: DataFrame) -> DataFrame:
    """Score pre-aggregated per-partition histograms ``(part, bucket,
    n_cur)`` against one baseline ``(bucket, n)`` histogram — the
    shared scoring core of :func:`partitioned_drift` and the streaming
    windowed-drift path (where the histogram aggregation already
    happened under a watermark and each finalized window is a
    partition)."""
    from pyspark.sql import Window

    parts = cur.select("part").distinct()
    grid = parts.select(
        "part", F.explode(F.sequence(F.lit(0), F.lit(bins - 1)))
        .alias("bucket"))
    base = baseline.select(F.col("bucket").cast("long").alias("bucket"),
                           F.col("n").cast("long").alias("n_base"))
    j = (grid.join(F.broadcast(base), "bucket", "left")
         .join(cur, ["part", "bucket"], "left")
         .fillna(0, ["n_cur", "n_base"]))
    by_part = Window.partitionBy("part")
    cum = (Window.partitionBy("part").orderBy("bucket")
           .rowsBetween(Window.unboundedPreceding, 0))
    tot_c = F.sum("n_cur").over(by_part)
    tot_b = F.sum("n_base").over(by_part)
    pc, pb = F.col("n_cur") / tot_c, F.col("n_base") / tot_b
    pcs = (F.col("n_cur") + 1) / (tot_c + bins)
    pbs = (F.col("n_base") + 1) / (tot_b + bins)
    expected = pb * tot_c
    scored = j.select(
        "part", "n_cur", "n_base",
        (F.abs(F.sum("n_cur").over(cum) / tot_c
               - F.sum("n_base").over(cum) / tot_b)).alias("_ks_term"),
        F.abs(pc - pb).alias("_l1_term"),
        F.when(expected > 0,
               F.pow(F.col("n_cur") - expected, F.lit(2.0)) / expected)
        .otherwise(F.lit(0.0)).alias("_chi2_term"),
        ((pcs - pbs) * F.log(pcs / pbs)).alias("_psi_term"))
    return (scored.groupBy("part")
            .agg(F.sum("n_cur").alias("n_rows"),
                 F.max("_ks_term").alias("ks"),
                 (F.sum("_l1_term") / 2.0).alias("l1"),
                 F.sum("_chi2_term").alias("chi2"),
                 F.sum("_psi_term").alias("psi")))
