"""Error ranking + aggregation — `best_match` / `ErrorTree` analogues.

Reference: ``best_match``/``by_relevance`` rank errors (shallower
instance path wins; `anyOf`/`oneOf` are weak matches —
/root/reference/jsonschema/exceptions.py:396-490, WEAK_MATCHES at
:24) and ``ErrorTree`` indexes errors by instance path
(exceptions.py:315-393).  Vectorized: one window / one groupBy over the
violation-rows table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WEAK_MATCHES = ("anyOf", "oneOf")  # exceptions.py:24


def best_match(violations: DataFrame,
               id_cols: Sequence[str]) -> DataFrame:
    """One row per instance: its most relevant violation.

    Relevance mirrors by_relevance: strong keywords beat weak ones,
    then the shallower instance path wins, ties broken deterministically
    by (json_path, keyword).
    """
    depth = F.size(F.split(F.col("json_path"), r"\.|\[")) - 1
    weak = F.col("keyword").isin(*WEAK_MATCHES).cast("int")
    w = (Window.partitionBy(*[F.col(c) for c in id_cols])
         .orderBy(weak.asc(), depth.asc(),
                  F.col("json_path").asc(), F.col("keyword").asc()))
    return (violations
            .withColumn("_rank", F.row_number().over(w))
            .filter(F.col("_rank") == 1)
            .drop("_rank"))


def error_tree(violations: DataFrame) -> DataFrame:
    """`ErrorTree` as a groupBy: per instance path, total errors and the
    set of failed keywords with counts."""
    return (violations
            .groupBy("json_path")
            .agg(F.count(F.lit(1)).alias("total_errors"),
                 F.sort_array(F.collect_set("keyword")).alias("keywords"))
            .orderBy("json_path"))


def error_counts_by_keyword(violations: DataFrame) -> DataFrame:
    return (violations.groupBy("keyword", "json_path")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("keyword", "json_path"))


def standard_output(violations: DataFrame) -> DataFrame:
    """The official JSON-Schema "basic" output-format unit shape
    (/root/reference/json/output-tests/draft2020-12/output-schema.json):
    one row per output unit with ``valid``, ``keywordLocation`` (a JSON
    pointer through the schema incl. applicators), ``instanceLocation``,
    and ``error``.  Our schema_path is slash-joined from the root, so the
    pointer is '/' + schema_path; json_path renders to a pointer by
    mapping `$`->'' , `.k`->'/k', `[i]`->'/i'."""
    kw_loc = F.concat(F.lit("/"), F.col("schema_path"))
    inst = F.col("json_path")
    inst_ptr = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(inst, r"^\$", ""),
            r"\['([^']*)'\]", "/$1"),
        r"\[(\d+)\]", "/$1")
    inst_ptr = F.regexp_replace(inst_ptr, r"\.", "/")
    return violations.select(
        F.lit(False).alias("valid"),
        kw_loc.alias("keywordLocation"),
        inst_ptr.alias("instanceLocation"),
        F.col("message").alias("error"),
    )
