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

import pandas as pd
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


def best_match_deep(violations_ctx: DataFrame, id_cols: Sequence[str],
                    max_depth: int = 4) -> DataFrame:
    """`best_match` WITH context descent (exceptions.py:440-490): pick
    the most relevant top-level error; while it is an anyOf/oneOf
    composite, descend into its *context* rows (branch errors, from
    :meth:`CompiledValidator.violations_with_context`) choosing the
    deepest — i.e. most specific — branch error, exactly the reference's
    ``min`` by relevance; stop when the two most relevant context errors
    tie (heapq.nsmallest(2) equality rule).

    Relevance mirrors by_relevance (exceptions.py:415-425): instance
    depth dominates, then weak-keyword demotion; json_path/keyword break
    ties deterministically (the reference's path ordering on siblings).
    `max_depth` bounds the descent (= max anyOf/oneOf nesting)."""
    depth = F.size(F.split(F.col("json_path"), r"\.|\[")) - 1
    weak = F.col("keyword").isin(*WEAK_MATCHES).cast("int")
    vv = (violations_ctx.withColumn("_depth", depth)
          .withColumn("_weak", weak))
    payload = ["keyword", "json_path", "schema_path", "message",
               "failing_value"]
    top = vv.filter(F.col("context_of").isNull())
    w = Window.partitionBy(*[F.col(c) for c in id_cols]).orderBy(
        F.col("_depth").asc(), F.col("_weak").asc(),
        F.col("json_path").asc(), F.col("keyword").asc())
    best = (top.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*id_cols, *payload))
    ctx_cols = payload + ["context_of", "_depth", "_weak"]
    ctx_r = vv.filter(F.col("context_of").isNotNull()).select(
        *id_cols, *[F.col(c).alias("c_" + c) for c in ctx_cols])
    for _ in range(max_depth):
        j = (best.join(ctx_r, list(id_cols), "left")
             .withColumn("_cand",
                         F.coalesce(F.col("c_context_of")
                                    == F.col("schema_path"), F.lit(False))
                         & F.col("keyword").isin(*WEAK_MATCHES)))
        key = F.struct(F.col("c__depth"), F.col("c_json_path"),
                       F.col("c__weak"))
        w2 = Window.partitionBy(*[F.col(c) for c in id_cols]).orderBy(
            F.col("_cand").desc(),
            F.col("c__depth").desc_nulls_last(),
            F.col("c_json_path").asc_nulls_last(),
            F.col("c__weak").desc_nulls_last(),
            F.col("c_keyword").asc_nulls_last())
        j = (j.withColumn("_rn", F.row_number().over(w2))
             .withColumn("_next_key", F.lead(key).over(w2))
             .withColumn("_next_cand", F.lead(F.col("_cand")).over(w2)))
        first = j.filter(F.col("_rn") == 1)
        tie = (F.coalesce(F.col("_next_cand"), F.lit(False))
               & (key == F.col("_next_key")))
        promote = F.col("_cand") & ~tie
        best = first.select(
            *id_cols,
            *[F.when(promote, F.col("c_" + c)).otherwise(F.col(c))
              .alias(c) for c in payload])
    return best


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


def _jsonpath_to_pointer(c):
    """Column: engine JSONPath -> RFC 6901 JSON pointer, positional."""
    import re as _re
    from pyspark.sql.functions import pandas_udf

    seg = _re.compile(r"\.(\w+)|\[(\d+)\]|\['((?:[^'\\]|\\.)*)'\]")

    def esc(s: str) -> str:
        return s.replace("~", "~0").replace("/", "~1")

    @pandas_udf("string")
    def conv(s: pd.Series) -> pd.Series:
        def one(path):
            if path is None:
                return None
            out, pos = [], 1  # skip leading '$'
            for m in seg.finditer(path, 1):
                if m.start() != pos:
                    return path  # not our grammar: pass through verbatim
                pos = m.end()
                name = m.group(1) or m.group(2) or m.group(3) or ""
                out.append("/" + esc(name))
            return "".join(out)
        return s.map(one)

    return conv(c)


def standard_output(violations: DataFrame) -> DataFrame:
    """The official JSON-Schema "basic" output-format unit shape
    (/root/reference/json/output-tests/draft2020-12/output-schema.json):
    one row per output unit with ``valid``, ``keywordLocation`` (a JSON
    pointer through the schema incl. applicators), ``instanceLocation``,
    and ``error``.  Our schema_path is slash-joined from the root, so the
    pointer is '/' + schema_path; json_path renders to a pointer by a
    positional parse (`$`->'' , `.k`->'/k', `[i]`->'/i', `['odd k']` ->
    '/odd k') with RFC 6901 `~0`/`~1` escaping — a global dot
    substitution would corrupt bracket-quoted names containing dots, so
    this is an Arrow-batched parse (reporting path, violations-sized)."""
    kw_loc = F.concat(F.lit("/"), F.col("schema_path"))
    inst_ptr = _jsonpath_to_pointer(F.col("json_path"))
    return violations.select(
        F.lit(False).alias("valid"),
        kw_loc.alias("keywordLocation"),
        inst_ptr.alias("instanceLocation"),
        F.col("message").alias("error"),
    )
