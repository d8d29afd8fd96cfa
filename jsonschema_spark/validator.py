"""Compiled validator — the engine's ``Validator`` protocol analogue.

The reference's ``Validator`` precompiles a keyword list per schema and
exposes ``iter_errors`` / ``is_valid``
(/root/reference/jsonschema/protocols.py:106-189,
/root/reference/jsonschema/validators.py:282-500).  Ours compiles once on
the driver into named boolean Columns and exposes the vectorized
equivalents:

- ``with_valid(df)``     — ``is_valid`` as a boolean column over the scan
- ``violations(df)``     — ``iter_errors`` as a violation-rows DataFrame
- ``manifest(df)``       — per-partition pass/fail aggregate

Everything row-level is one narrow scan: no shuffle, whole-stage codegen
for native predicates, Arrow-batched pandas UDFs only where Python-exact
semantics demand them.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .compiler.context import CompileContext
from .compiler.node import Check
from .compiler.registry import (KeywordRegistry, compile_subschema,
                                default_registry)
from .spec import check_schema


class CompiledValidator:
    """A constraint spec compiled against one DataFrame schema."""

    def __init__(self, schema: Any, df: DataFrame,
                 registry: Optional[KeywordRegistry] = None,
                 schema_store: Optional[dict] = None,
                 format_checker: bool = False,
                 retrieve=None):
        """`schema_store` pre-registers external documents by URI — the
        analogue of passing a populated ``referencing.Registry`` to the
        reference's validator (validators.py:1070-1095).
        `retrieve` is a driver-side ``Callable[[uri], schema]`` consulted
        for $ref targets absent from the store (the
        ``referencing.Registry(retrieve=...)`` /
        ``RefResolver.resolve_remote`` analogue, validators.py:108-133);
        pass :func:`jsonschema_spark.compiler.resolver.urlopen_retrieve`
        to opt into HTTP(S) fetching explicitly — never implicit.
        `format_checker=True` opts into format assertion, mirroring
        ``Draft202012Validator(schema, format_checker=...)``
        (_keywords.py:223-228); the default is annotation-only like the
        reference."""
        extra = frozenset(getattr(registry, "type_predicates", ()) or ())
        check_schema(schema, extra_types=extra)
        self.schema = schema
        if registry is None:
            # validator_for: $schema picks the draft profile
            # (validators.py:1335-1410); default = 2020-12
            from .compiler.legacy import registry_for
            registry = registry_for(schema)
        self.registry = registry or default_registry()
        if format_checker and not self.registry.assert_formats:
            self.registry = self.registry.extend({})
            self.registry.assert_formats = True
        from .compiler.legacy import draft_of
        from .compiler.resolver import Resolver
        # URI semantics must follow the schema's draft: a draft4 schema
        # using the legacy location-independent identifier {"id": "#x"}
        # resolves through Resolver's draft<=7 rules, not 2020-12
        # (validator_for -> resolver wiring, validators.py:1335-1410)
        resolver = Resolver(draft_of(schema), retrieve=retrieve)
        for uri, doc in (schema_store or {}).items():
            resolver.add_document(uri, doc)
        root_uri = resolver.add_root(schema)
        if schema_store:
            # a registered custom meta-schema's $vocabulary trims the
            # active keyword set (2020-12 core §8.1)
            from .compiler.legacy import apply_vocabulary
            self.registry = apply_vocabulary(self.registry, schema,
                                             resolver)
        ctx = CompileContext(
            registry=self.registry, target=None, dtype=None,
            root_schema=schema if isinstance(schema, dict) else None,
            row_fields=list(df.schema.fields),
            resolver=resolver, base_uri=root_uri,
            dynamic_scope=(root_uri,))
        node = compile_subschema(ctx, schema)
        self.checks: list[Check] = node.checks
        #: anyOf/oneOf branch errors (ValidationError.context analogue,
        #: exceptions.py:120-131) — excluded from validity and from the
        #: default violations output, consumed by best_match descent
        self.context_checks: list[Check] = node.context
        self._extra_ok = node._extra_ok
        self.warnings: list[str] = list(ctx.warnings)
        #: compile-time annotation units (readOnly/title/default/...)
        #: with applicability predicates — see annotation_units()
        self.annotations = list(ctx.annotations)

    # ------------------------------------------------------------- is_valid
    @property
    def valid_column(self) -> Column:
        preds = [c.pred for c in self.checks] + list(self._extra_ok)
        if not preds:
            return F.lit(True)
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out

    def with_valid(self, df: DataFrame, col: str = "valid") -> DataFrame:
        return df.withColumn(col, self.valid_column)

    # ---------------------------------------------------------- iter_errors
    def _violation_array(self) -> Column:
        """Array of violation structs (empty when the row passes).
        ``type_match`` carries ``error._matches_type()``
        (exceptions.py:184-197) — the 5th ``by_relevance`` element,
        consumed by :func:`operators.bestmatch.best_match`."""
        structs = [
            F.when(~F.coalesce(c.pred, F.lit(True)), F.struct(
                F.lit(c.keyword).alias("keyword"),
                F.lit(c.json_path).alias("json_path"),
                F.lit(c.schema_path).alias("schema_path"),
                c.message.cast("string").alias("message"),
                c.failing_value.cast("string").alias("failing_value"),
                (c.type_match if c.type_match is not None
                 else F.lit(False)).alias("type_match"),
            ))
            for c in self.checks
        ]
        if not structs:
            return F.array().cast(
                "array<struct<keyword:string,json_path:string,"
                "schema_path:string,message:string,failing_value:string,"
                "type_match:boolean>>")
        return F.filter(F.array(*structs), lambda x: x.isNotNull())

    def violations(self, df: DataFrame,
                   id_cols: Sequence[str] = ()) -> DataFrame:
        """One row per (instance row × failed keyword) — the vectorized
        ``iter_errors``.  Rows with no violations are filtered before the
        explode so passing data never materializes error structs."""
        arr = self._violation_array()
        keep = [F.col(c) for c in id_cols]
        exploded = (df
                    .select(*keep, arr.alias("_violations"))
                    .filter(F.size("_violations") > 0)
                    .select(*keep, F.explode("_violations").alias("_v")))
        return exploded.select(
            *keep,
            F.col("_v.keyword").alias("keyword"),
            F.col("_v.json_path").alias("json_path"),
            F.col("_v.schema_path").alias("schema_path"),
            F.col("_v.message").alias("message"),
            F.col("_v.failing_value").alias("failing_value"),
            F.col("_v.type_match").alias("type_match"),
        )

    def violations_with_context(self, df: DataFrame,
                                id_cols: Sequence[str] = ()) -> DataFrame:
        """Like :meth:`violations` plus anyOf/oneOf *context* rows
        (branch errors that explain why a composite failed —
        ``ValidationError.context``, exceptions.py:120-131), each
        carrying ``context_of`` = the composite's schema_path (NULL for
        top-level errors).  Context rows fire only when their composite
        fails; they feed :func:`operators.bestmatch.best_match_deep`."""
        structs = [
            F.when(~F.coalesce(c.pred, F.lit(True)), F.struct(
                F.lit(c.keyword).alias("keyword"),
                F.lit(c.json_path).alias("json_path"),
                F.lit(c.schema_path).alias("schema_path"),
                c.message.cast("string").alias("message"),
                c.failing_value.cast("string").alias("failing_value"),
                F.lit(c.context_of).cast("string").alias("context_of"),
                (c.type_match if c.type_match is not None
                 else F.lit(False)).alias("type_match"),
            ))
            for c in self.checks + self.context_checks
        ]
        ddl = ("array<struct<keyword:string,json_path:string,"
               "schema_path:string,message:string,failing_value:string,"
               "context_of:string,type_match:boolean>>")
        arr = (F.filter(F.array(*structs), lambda x: x.isNotNull())
               if structs else F.array().cast(ddl))
        keep = [F.col(c) for c in id_cols]
        exploded = (df
                    .select(*keep, arr.alias("_violations"))
                    .filter(F.size("_violations") > 0)
                    .select(*keep, F.explode("_violations").alias("_v")))
        return exploded.select(
            *keep, F.col("_v.keyword").alias("keyword"),
            F.col("_v.json_path").alias("json_path"),
            F.col("_v.schema_path").alias("schema_path"),
            F.col("_v.message").alias("message"),
            F.col("_v.failing_value").alias("failing_value"),
            F.col("_v.context_of").alias("context_of"),
            F.col("_v.type_match").alias("type_match"))

    # ---------------------------------------------------------- annotations
    def annotation_units(self, df: DataFrame,
                         id_cols: Sequence[str] = ()) -> DataFrame:
        """2020-12 "basic" output-format *annotation* units: one row per
        (valid instance row × applicable annotation keyword), with RFC
        6901 keywordLocation / instanceLocation and the annotation value
        as a JSON string.  Failed validation produces no annotations
        (json/output-tests/draft2020-12/content/general.json), and an
        annotation applies only where its owning subschema successfully
        applied (e.g. a satisfied anyOf branch)."""
        import json as _json

        from .operators.bestmatch import _jsonpath_to_pointer
        valid = self.valid_column
        structs = [
            F.when(valid & F.coalesce(a.pred, F.lit(False)), F.struct(
                F.lit(a.keyword).alias("keyword"),
                F.lit("/" + a.schema_path).alias("keywordLocation"),
                F.lit(a.json_path).alias("json_path"),
                F.lit(_json.dumps(a.value)).alias("annotation_json"),
            ))
            for a in self.annotations
        ]
        ddl = ("array<struct<keyword:string,keywordLocation:string,"
               "json_path:string,annotation_json:string>>")
        arr = (F.filter(F.array(*structs), lambda x: x.isNotNull())
               if structs else F.array().cast(ddl))
        keep = [F.col(c) for c in id_cols]
        exploded = (df.select(*keep, arr.alias("_anns"))
                    .filter(F.size("_anns") > 0)
                    .select(*keep, F.explode("_anns").alias("_a")))
        return exploded.select(
            *keep,
            F.lit(True).alias("valid"),
            F.col("_a.keyword").alias("keyword"),
            F.col("_a.keywordLocation").alias("keywordLocation"),
            _jsonpath_to_pointer(F.col("_a.json_path"))
            .alias("instanceLocation"),
            F.col("_a.annotation_json").alias("annotation_json"))

    # ------------------------------------------------------------- manifest
    def manifest(self, df: DataFrame,
                 partition_by: Optional[Sequence[str]] = None) -> DataFrame:
        """Per-partition pass/fail manifest — ``is_valid`` aggregated
        (validators.py:485-500 lifted to groupBy)."""
        annotated = df.withColumn("_valid", self.valid_column)
        if partition_by:
            keys = [F.col(c) for c in partition_by]
            grouped = annotated.groupBy(*keys)
        else:
            grouped = annotated.groupBy(
                F.spark_partition_id().alias("partition_id"))
        return grouped.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((~F.col("_valid")).cast("long")).alias("invalid_rows"),
            (F.sum((~F.col("_valid")).cast("long")) == 0).alias("passed"),
        )

    def counts(self, df: DataFrame) -> tuple[int, int]:
        row = (df.select(self.valid_column.alias("v"))
                 .agg(F.sum(F.col("v").cast("long")).alias("ok"),
                      F.count(F.lit(1)).alias("n"))).collect()[0]
        ok = row["ok"] or 0
        return int(ok), int(row["n"] - ok)


def validate(df: DataFrame, schema: Any,
             id_cols: Sequence[str] = (),
             registry: Optional[KeywordRegistry] = None,
             format_checker: bool = False) -> DataFrame:
    """Convenience: violations DataFrame for `df` under `schema`."""
    return CompiledValidator(
        schema, df, registry,
        format_checker=format_checker).violations(df, id_cols)


def is_valid(df: DataFrame, schema: Any,
             registry: Optional[KeywordRegistry] = None,
             format_checker: bool = False) -> DataFrame:
    """df + boolean `valid` column."""
    return CompiledValidator(
        schema, df, registry,
        format_checker=format_checker).with_valid(df)
