"""Single-pass column statistics + stats-level constraint checks.

The lift of ``minimum``/``maximum``/``required`` from row scope to
dataset scope (SURVEY.md §2.6, reference anchors
/root/reference/jsonschema/_keywords.py:149-164,304-309).  All requested
stats for all columns are fused into ONE ``df.agg(...)`` so the table is
scanned exactly once; ``approx_percentile`` sketches merge
per-partition, so the plan is a partial+final aggregate with no extra
shuffle stages regardless of how many columns are profiled.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def column_stats(df: DataFrame, columns: Optional[Sequence[str]] = None,
                 quantiles: Sequence[float] = (0.25, 0.5, 0.75),
                 accuracy: int = 10_000) -> DataFrame:
    """One row per profiled column: count / nulls / null_rate / min / max /
    approx quantiles / approx distinct.  Single scan, single agg."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns else list(fields)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        dt = fields[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.approx_count_distinct(c).alias(f"{c}__distinct"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(c).alias(f"{c}__min"))
            aggs.append(F.max(c).alias(f"{c}__max"))
            aggs.append(F.percentile_approx(
                c, list(quantiles), accuracy).alias(f"{c}__q"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(F.length(c)).alias(f"{c}__min"))
            aggs.append(F.max(F.length(c)).alias(f"{c}__max"))
            aggs.append(F.percentile_approx(
                F.length(c), list(quantiles), accuracy).alias(f"{c}__q"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
            aggs.append(F.lit(None).cast("array<double>").alias(f"{c}__q"))
    wide = df.agg(*aggs)

    # unpivot driver-side metadata-free: build one struct per column then
    # explode — still a single-row frame, negligible cost
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_rows").alias("rows"),
            F.col(f"{c}__nulls").alias("nulls"),
            (F.col(f"{c}__nulls") / F.col("_rows")).alias("null_rate"),
            F.col(f"{c}__min").cast("double").alias("min"),
            F.col(f"{c}__max").cast("double").alias("max"),
            F.col(f"{c}__q").cast("array<double>").alias("quantiles"),
            F.col(f"{c}__distinct").alias("approx_distinct"),
        )
        for c in cols
    ]
    return (wide.select(F.explode(F.array(*structs)).alias("s"))
            .select("s.*"))


def stats_violations(df: DataFrame, rules: dict[str, dict[str, Any]]) -> DataFrame:
    """Dataset-level assertions over aggregates -> violation rows.

    ``rules`` maps column -> {max_null_rate, min, max, min_distinct}.
    Output mirrors the row-level violation schema with json_path = $.col
    and keyword = 'stats:<rule>'.
    """
    stats = column_stats(df, list(rules)).collect()
    by_col = {r["column"]: r for r in stats}
    rows = []
    for col, rule in rules.items():
        s = by_col[col]
        def viol(kw, msg, val):
            rows.append((kw, f"$.{col}", f"x-spark/stats/{col}/{kw}",
                         msg, str(val)))
        if "max_null_rate" in rule and s["null_rate"] > rule["max_null_rate"]:
            viol("stats:max_null_rate",
                 f"null rate {s['null_rate']:.4f} exceeds "
                 f"{rule['max_null_rate']}", s["null_rate"])
        if "min" in rule and s["min"] is not None and s["min"] < rule["min"]:
            viol("stats:min", f"min {s['min']} below {rule['min']}", s["min"])
        if "max" in rule and s["max"] is not None and s["max"] > rule["max"]:
            viol("stats:max", f"max {s['max']} above {rule['max']}", s["max"])
        if "min_distinct" in rule and s["approx_distinct"] < rule["min_distinct"]:
            viol("stats:min_distinct",
                 f"approx distinct {s['approx_distinct']} below "
                 f"{rule['min_distinct']}", s["approx_distinct"])
    spark = df.sparkSession
    schema = ("keyword string, json_path string, schema_path string, "
              "message string, failing_value string")
    return spark.createDataFrame(rows, schema)
