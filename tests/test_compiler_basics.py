"""Unit tests for the keyword compilers over typed columns.

Each case mirrors reference semantics from
/root/reference/jsonschema/_keywords.py (see docstrings in
jsonschema_spark/compiler/keywords.py).
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark import CompiledValidator, SchemaCompileError, check_schema


def _valid_flags(spark, ddl, rows, schema, **kw):
    df = spark.createDataFrame(rows, ddl)
    v = CompiledValidator(schema, df, **kw)
    return [r["valid"] for r in
            v.with_valid(df).orderBy("_i").select("valid").collect()]


def test_range_keywords(spark):
    ddl = "_i int, x double"
    rows = [(0, 1.0), (1, 5.0), (2, 10.0), (3, None)]
    schema = {"properties": {"x": {"minimum": 1, "exclusiveMaximum": 10}}}
    assert _valid_flags(spark, ddl, rows, schema) == [True, True, False, True]


def test_multiple_of_float_parity(spark):
    # reference float fast path: quotient = instance / dB (exact IEEE)
    ddl = "_i int, x double"
    # NaN excluded: not JSON-representable (the reference raises on it)
    rows = [(0, 0.0075), (1, 0.00751), (2, 4.5), (3, 123.4567)]
    schema = {"properties": {"x": {"multipleOf": 0.0001}}}
    import jsonschema
    expected = [jsonschema.Draft202012Validator(
        {"multipleOf": 0.0001}).is_valid(r[1]) for r in rows]
    assert _valid_flags(spark, ddl, rows, schema) == expected


def test_string_keywords(spark):
    ddl = "_i int, s string"
    rows = [(0, "abc"), (1, ""), (2, "x" * 10), (3, None), (4, "abd")]
    schema = {"properties": {"s": {"minLength": 1, "maxLength": 5,
                                   "pattern": "ab[cz]"}}}
    # None = absent property -> passes (properties not applied)
    assert _valid_flags(spark, ddl, rows, schema) == [
        True, False, False, True, False]


def test_enum_bool_is_not_int(spark):
    # bool != int for enum (_types.py:34-38, _utils.py:151-159)
    ddl = "_i int, b boolean"
    rows = [(0, True), (1, False)]
    schema = {"properties": {"b": {"enum": [0, 1]}}}
    assert _valid_flags(spark, ddl, rows, schema) == [False, False]
    schema = {"properties": {"b": {"enum": [True]}}}
    assert _valid_flags(spark, ddl, rows, schema) == [True, False]


def test_integer_valued_float_is_integer(spark):
    # draft6+: 1.0 is an integer (_types.py:195-201)
    ddl = "_i int, x double"
    rows = [(0, 1.0), (1, 1.5)]
    schema = {"properties": {"x": {"type": "integer"}}}
    assert _valid_flags(spark, ddl, rows, schema) == [True, False]


def test_required_and_dependent_required(spark):
    ddl = "_i int, a string, b string"
    rows = [(0, "x", "y"), (1, "x", None), (2, None, None)]
    schema = {"required": ["a"], "dependentRequired": {"a": ["b"]}}
    assert _valid_flags(spark, ddl, rows, schema) == [True, False, False]


def test_array_keywords(spark):
    ddl = "_i int, a array<int>"
    rows = [(0, [1, 2, 3]), (1, [1, 1]), (2, []), (3, [1, 2, 3, 4, 5, 6])]
    schema = {"properties": {"a": {"minItems": 1, "maxItems": 5,
                                   "uniqueItems": True}}}
    assert _valid_flags(spark, ddl, rows, schema) == [
        True, False, False, False]


def test_items_and_contains(spark):
    ddl = "_i int, a array<int>"
    rows = [(0, [1, 2, 3]), (1, [1, 2, 300]), (2, [5, 6])]
    schema = {"properties": {"a": {
        "items": {"maximum": 100},
        "contains": {"minimum": 3}, "maxContains": 2}}}
    assert _valid_flags(spark, ddl, rows, schema) == [True, False, True]


def test_prefix_items(spark):
    ddl = "_i int, a array<int>"
    rows = [(0, [1, 50]), (1, [99, 50]), (2, [1])]
    schema = {"properties": {"a": {"prefixItems": [{"maximum": 10},
                                                   {"minimum": 10}]}}}
    assert _valid_flags(spark, ddl, rows, schema) == [True, False, True]


def test_composition(spark):
    ddl = "_i int, x int"
    rows = [(0, 5), (1, 15), (2, 25)]
    schema = {"properties": {"x": {"anyOf": [{"maximum": 10},
                                             {"minimum": 20}]}}}
    assert _valid_flags(spark, ddl, rows, schema) == [True, False, True]
    schema = {"properties": {"x": {"oneOf": [{"maximum": 20},
                                             {"minimum": 10}]}}}
    assert _valid_flags(spark, ddl, rows, schema) == [True, False, True]
    schema = {"properties": {"x": {"not": {"minimum": 10}}}}
    assert _valid_flags(spark, ddl, rows, schema) == [True, False, False]


def test_if_then_else(spark):
    ddl = "_i int, x int, y string"
    rows = [(0, 5, "small"), (1, 5, "big"), (2, 50, "big"), (3, 50, "small")]
    schema = {"if": {"properties": {"x": {"maximum": 10}}},
              "then": {"properties": {"y": {"const": "small"}}},
              "else": {"properties": {"y": {"const": "big"}}}}
    assert _valid_flags(spark, ddl, rows, schema) == [
        True, False, True, False]


def test_ref_defs(spark):
    ddl = "_i int, x int, y int"
    rows = [(0, 5, 5), (1, 5, 500)]
    schema = {"$defs": {"small": {"maximum": 100}},
              "properties": {"x": {"$ref": "#/$defs/small"},
                             "y": {"$ref": "#/$defs/small"}}}
    assert _valid_flags(spark, ddl, rows, schema) == [True, False]


def test_nested_struct(spark):
    ddl = "_i int, meta struct<author:string, stars:int>"
    rows = [(0, ("alice", 5)), (1, ("bob", 50)), (2, None)]
    schema = {"properties": {"meta": {
        "type": "object", "required": ["author"],
        "properties": {"stars": {"maximum": 10}}}}}
    assert _valid_flags(spark, ddl, rows, schema) == [True, False, True]


def test_boolean_schema_false(spark):
    ddl = "_i int, x int"
    rows = [(0, 1), (1, None)]
    schema = {"properties": {"x": False}}
    # present -> fails, absent -> passes
    assert _valid_flags(spark, ddl, rows, schema) == [False, True]


def test_violation_rows_shape(spark):
    df = spark.createDataFrame([("a", 0), ("b", 5)], "id string, x int")
    v = CompiledValidator(
        {"properties": {"x": {"minimum": 1}}}, df)
    out = v.violations(df, ["id"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id"], r["keyword"], r["json_path"]) == ("a", "minimum", "$.x")
    assert r["schema_path"] == "properties/x/minimum"


def test_check_schema_rejects_malformed():
    with pytest.raises(SchemaCompileError):
        check_schema({"minimum": "ten"})
    with pytest.raises(SchemaCompileError):
        check_schema({"pattern": "["})
    with pytest.raises(SchemaCompileError):
        check_schema({"required": "name"})
    with pytest.raises(SchemaCompileError):
        check_schema({"type": "strng"})
    check_schema({"minimum": 1, "pattern": "^a$", "required": ["x"]})


def test_unknown_keyword_warns(spark):
    df = spark.createDataFrame([("a",)], "s string")
    v = CompiledValidator({"properties": {"s": {"frobnicate": 1}}}, df)
    assert any("frobnicate" in w for w in v.warnings)
    assert v.with_valid(df).first()["valid"] is True


def test_format_keywords(spark):
    ddl = "_i int, s string"
    fc = {"format_checker": True}
    schema = {"properties": {"s": {"format": "ipv4"}}}
    rows = [(0, "1.2.3.4"), (1, "256.1.1.1"), (2, "01.1.1.1"), (3, "x")]
    assert _valid_flags(spark, ddl, rows, schema, **fc) == [
        True, False, False, False]
    # annotation-only by default, like the reference without a
    # FormatChecker (_keywords.py:223-228)
    assert _valid_flags(spark, ddl, rows, schema) == [True] * 4
    schema = {"properties": {"s": {"format": "uuid"}}}
    rows = [(0, "12345678-1234-5678-1234-567812345678"), (1, "not-a-uuid")]
    assert _valid_flags(spark, ddl, rows, schema, **fc) == [True, False]
    # unknown format always passes (_format.py:133-134)
    schema = {"properties": {"s": {"format": "no-such-format"}}}
    assert _valid_flags(spark, ddl, rows, schema, **fc) == [True, True]


def test_redefine_type(spark):
    """TypeChecker.redefine analogue (_types.py:122-154): a registry
    copy with a custom/overridden type predicate."""
    from pyspark.sql import functions as F
    from jsonschema_spark.compiler.registry import default_registry

    # new type name: "even_int"
    reg = default_registry().redefine_type(
        "even_int", lambda ctx: (ctx.target % 2 == 0)
        if ctx.is_integral() else F.lit(False))
    ddl = "_i int, x int"
    rows = [(0, 2), (1, 3), (2, None)]
    schema = {"properties": {"x": {"type": "even_int"}}}
    assert _valid_flags(spark, ddl, rows, schema, registry=reg) == [
        True, False, True]
    # overriding a built-in: "string" now also requires non-empty
    reg2 = default_registry().redefine_type(
        "string", lambda ctx: (F.length(ctx.target) > 0)
        if ctx.is_string() else F.lit(False))
    ddl = "_i int, s string"
    rows = [(0, "a"), (1, "")]
    schema = {"properties": {"s": {"type": "string"}}}
    assert _valid_flags(spark, ddl, rows, schema, registry=reg2) == [
        True, False]
    # the default registry is untouched
    assert _valid_flags(spark, ddl, rows, schema) == [True, True]


def test_draft4_legacy_anchor_via_public_api(spark):
    """ADVICE-r2 regression: CompiledValidator must build its Resolver
    with the schema's OWN draft semantics.  A draft4 schema using the
    legacy location-independent identifier {"id": "#foo"} resolves via
    Resolver's draft<=7 `id` rules (referencing's draft<=7 id_of), not
    2020-12's — previously this raised SchemaCompileError through the
    public API while passing under conformance's draft-aware wiring."""
    ddl = "_i int, x int"
    rows = [(0, 1), (1, 200)]
    schema = {
        "$schema": "http://json-schema.org/draft-04/schema#",
        "definitions": {"pos": {"id": "#foo", "maximum": 100}},
        "properties": {"x": {"$ref": "#foo"}},
    }
    assert _valid_flags(spark, ddl, rows, schema) == [True, False]
    # draft<=7: $ref siblings (including `id`) are ignored
    schema7 = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "definitions": {"pos": {"minimum": 0}},
        "properties": {"x": {"$ref": "#/definitions/pos",
                             "minimum": 1000}},
    }
    assert _valid_flags(spark, ddl, rows, schema7) == [True, True]


def test_schema_store_per_resource_draft(spark):
    """ADVICE-r3: a schema_store document declaring its own `$schema`
    resolves under THAT draft's identifier rules.  Here a draft4 doc
    uses a legacy location-independent `id: "#big"` anchor — invisible
    under 2020-12 rules — while the root is 2020-12; the $ref through
    the anchor must still bind."""
    from jsonschema_spark import CompiledValidator

    store = {
        "https://example.test/legacy": {
            "$schema": "http://json-schema.org/draft-04/schema#",
            "definitions": {
                "big": {"id": "#big", "minimum": 100},
            },
        },
    }
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "properties": {
            "n": {"$ref": "https://example.test/legacy#big"},
        },
    }
    df = spark.createDataFrame([(1, 5), (2, 150)], "id int, n int")
    v = CompiledValidator(schema, df, schema_store=store)
    bad = {r["id"] for r in
           v.with_valid(df).filter("NOT valid").select("id").collect()}
    assert bad == {1}


def test_boolean_false_schema_violations(spark):
    """Regression (r4 code review): a boolean `False` root schema's
    $falseSchema check bypasses the type_match annotation pass; the
    violation array must still build (type_match=False, the reference's
    TypeError -> False for error.schema=False)."""
    from jsonschema_spark import CompiledValidator
    df = spark.createDataFrame([(1,)], "x int")
    v = CompiledValidator(False, df)
    rows = v.violations(df, ["x"]).collect()
    assert len(rows) == 1 and rows[0]["keyword"] == "$falseSchema"
    assert rows[0]["type_match"] is False
    assert v.violations_with_context(df, ["x"]).count() == 1


def test_annotation_units_property_level(spark):
    """Annotation units from a property subschema: emitted only for
    valid rows where the property is present, with pointer locations
    and the JSON-encoded value."""
    from jsonschema_spark import CompiledValidator
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "toolong")],
        "id int, s string")
    schema = {"properties": {
        "s": {"maxLength": 3, "title": "short code",
              "deprecated": True}}}
    v = CompiledValidator(schema, df)
    units = v.annotation_units(df, ["id"]).collect()
    by_row = {}
    for r in units:
        by_row.setdefault(r["id"], []).append(
            (r["keyword"], r["keywordLocation"], r["instanceLocation"],
             r["annotation_json"]))
    # row 1: present + valid -> both annotations
    assert sorted(by_row[1]) == [
        ("deprecated", "/properties/s/deprecated", "/s", "true"),
        ("title", "/properties/s/title", "/s", '"short code"'),
    ]
    # row 2: property absent -> no units; row 3: invalid row -> none
    assert 2 not in by_row and 3 not in by_row


def test_empty_composition_lists(spark):
    """`anyOf: []` / `oneOf: []` violate the meta-schema (minItems 1);
    the engine rejects them up front with SchemaCompileError — the
    eager analogue of the reference's `check_schema` (the reference's
    *validator* lazily tolerates them and fails every instance; our
    compile step surfaces the malformed spec instead, never an
    IndexError from the branch-OR fold)."""
    ddl = "_i int, x int"
    df = spark.createDataFrame([(0, 1)], ddl)
    for kw in ("anyOf", "oneOf", "allOf"):
        with pytest.raises(SchemaCompileError, match="non-empty"):
            CompiledValidator({"properties": {"x": {kw: []}}}, df)


def test_retrieve_hook_fetches_and_caches(spark):
    """Resolver(retrieve=) — the referencing.Registry(retrieve=...) /
    RefResolver.resolve_remote analogue: called once per unregistered
    absolute URI, result indexed under both the retrieval URI and its
    own $id, transitive $refs inside retrieved documents retrieved in
    turn."""
    from jsonschema_spark import CompiledValidator

    calls = []
    docs = {
        "https://example.test/range": {
            "$id": "https://example.test/range",
            "properties": {"n": {"$ref": "limits#pos"}},
        },
        "https://example.test/limits": {
            "$anchor_holder": None,  # unknown keyword: data, not schema
            "$defs": {"pos": {"$anchor": "pos", "minimum": 10}},
        },
    }

    def retrieve(uri):
        calls.append(uri)
        return docs[uri]

    schema = {
        "properties": {
            "a": {"$ref": "https://example.test/range"},
            "b": {"$ref": "https://example.test/range"},
        },
    }
    df = spark.createDataFrame(
        [(1, (5,), (50,)), (2, (50,), (5,))],
        "id int, a struct<n:int>, b struct<n:int>")
    v = CompiledValidator(schema, df, retrieve=retrieve)
    flags = [r["valid"] for r in
             v.with_valid(df).orderBy("id").select("valid").collect()]
    assert flags == [False, False]
    ok = spark.createDataFrame([(1, (50,), (50,))],
                               "id int, a struct<n:int>, b struct<n:int>")
    assert v.with_valid(ok).head()["valid"] is True
    # each URI retrieved exactly once despite two $refs + anchor hops
    assert sorted(calls) == ["https://example.test/limits",
                             "https://example.test/range"]


def test_retrieve_hook_errors(spark):
    from jsonschema_spark import CompiledValidator
    from jsonschema_spark.compiler.registry import SchemaCompileError

    df = spark.createDataFrame([(1,)], "n int")

    def boom(uri):
        raise KeyError(uri)

    with pytest.raises(SchemaCompileError, match="retrieve.*failed"):
        CompiledValidator({"$ref": "https://missing.test/x"}, df,
                          retrieve=boom)
    with pytest.raises(SchemaCompileError, match="unresolvable"):
        CompiledValidator({"$ref": "https://missing.test/x"}, df,
                          retrieve=lambda uri: None)
    # no hook at all: unchanged behavior
    with pytest.raises(SchemaCompileError, match="unresolvable"):
        CompiledValidator({"$ref": "https://missing.test/x"}, df)


def test_expr_cache_reuses_identical_helper_columns(spark):
    """The per-root-compile expression cache must hand back the SAME
    Column object for the same (target, derivation) — and must NOT
    collide across targets or dtypes (a collision would attach one
    column's rendering to another's violation rows)."""
    import pyspark.sql.types as T

    from jsonschema_spark.compiler.context import CompileContext
    from jsonschema_spark.compiler.registry import (cached_expr, cached_lit,
                                                    default_registry,
                                                    fmt_message, stringify)

    a, b = F.col("a"), F.col("b")
    ctx = CompileContext(registry=default_registry(), target=a,
                         dtype=T.StringType())
    # same target + same derivation -> identical object (one py4j build)
    assert stringify(ctx) is stringify(ctx)
    assert fmt_message(ctx, "%s is bad") is fmt_message(ctx, "%s is bad")
    assert cached_lit(ctx, False) is cached_lit(ctx, False)
    # different template / literal -> different columns
    assert fmt_message(ctx, "%s is bad") is not fmt_message(ctx, "%s worse")
    assert cached_lit(ctx, False) is not cached_lit(ctx, True)
    assert cached_lit(ctx, False) is not cached_lit(ctx, 0)  # bool != int
    # child() shares the cache; a child bound to ANOTHER target must
    # not see the first target's entries
    child = ctx.child(target=b, dtype=T.IntegerType())
    assert child.expr_cache is ctx.expr_cache
    assert str(stringify(child)) != str(stringify(ctx))
    # dtype class rides in the fmt key: same target, array dtype ->
    # to_json rendering, not the string cast
    arr_ctx = ctx.child(dtype=T.ArrayType(T.StringType()))
    assert str(fmt_message(arr_ctx, "%s is bad")) \
        != str(fmt_message(ctx, "%s is bad"))
    # cached targets are pinned: building many short-lived targets
    # cannot produce a stale id()-collision hit
    seen = set()
    for i in range(50):
        c = ctx.child(target=F.col(f"x{i}"))
        col = cached_expr(c, "isnull", c.target.isNull)
        assert str(col) not in seen
        seen.add(str(col))


def test_expr_cache_does_not_leak_across_compiles(spark):
    """Two root compiles get independent caches (a fresh
    CompileContext starts empty) — nothing persists process-wide."""
    df = spark.createDataFrame([(1, "x")], "n int, s string")
    spec = {"properties": {"n": {"minimum": 0}, "s": {"minLength": 1}}}
    v1 = CompiledValidator(spec, df)
    v2 = CompiledValidator(spec, df)
    assert v1.counts(df) == v2.counts(df) == (1, 0)
