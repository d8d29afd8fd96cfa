"""Keyword registry + the subschema compile loop.

The reference generates validator classes from a ``keyword -> callable``
mapping via ``create()`` (/root/reference/jsonschema/validators.py:136-513)
and supports extension via ``extend()`` (validators.py:516-598).  Ours maps
``keyword -> compiler function`` where a compiler returns a :class:`Node`
of boolean Column predicates (or ``None`` when the keyword is statically
inapplicable to the bound Spark type — the vectorized analogue of the
reference ignoring e.g. ``minimum`` on a string instance).

Compiler signature::

    fn(ctx: CompileContext, value: Any, schema: dict) -> Node | None
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .context import CompileContext, schema_path_join
from .node import Check, Node, static_node

CompilerFn = Callable[[CompileContext, Any, dict], Optional[Node]]

#: annotation keywords whose values surface as output units (2020-12
#: core §7.7 / output "basic" format annotation units)
ANNOTATION_VALUE_KEYWORDS = frozenset({
    "title", "description", "default", "deprecated", "readOnly",
    "writeOnly", "examples",
})

#: keywords that are annotations / handled structurally, never compiled
ANNOTATION_KEYWORDS = frozenset({
    "$schema", "$id", "id", "$comment", "$defs", "definitions", "$anchor",
    "$dynamicAnchor", "$recursiveAnchor", "$vocabulary", "title",
    "description", "default",
    "examples", "deprecated", "readOnly", "writeOnly",
    "contentMediaType", "contentEncoding", "contentSchema",
    # handled by sibling compilers, not standalone:
    "then", "else", "minContains", "maxContains",
    # engine extension block (dataset-level checks), handled by runner:
    "x-spark",
})


class KeywordRegistry:
    """Mutable keyword->compiler mapping; ``extend()`` mirrors the
    reference's validator-extension API (validators.py:516-598)."""

    #: pre-2019 drafts drop sibling keywords next to $ref
    ref_ignores_siblings: bool = False
    #: format is annotation-only unless opted in — the reference's
    #: ``format_checker is not None`` gate (_keywords.py:223-228)
    assert_formats: bool = False

    def __init__(self, compilers: Optional[dict[str, CompilerFn]] = None):
        self._compilers: dict[str, CompilerFn] = dict(compilers or {})
        #: custom `type` predicates: name -> fn(ctx) -> Column|None
        #: (None = statically satisfied) — see redefine_type
        self.type_predicates: dict[str, Any] = {}

    def register(self, keyword: str, fn: CompilerFn) -> None:
        self._compilers[keyword] = fn

    def get(self, keyword: str) -> Optional[CompilerFn]:
        return self._compilers.get(keyword)

    def extend(self, compilers: dict[str, CompilerFn]) -> "KeywordRegistry":
        merged = dict(self._compilers)
        merged.update(compilers)
        out = KeywordRegistry(merged)
        out.ref_ignores_siblings = self.ref_ignores_siblings
        out.assert_formats = self.assert_formats
        out.type_predicates = dict(self.type_predicates)
        return out

    def redefine_type(self, name: str, fn: Any) -> "KeywordRegistry":
        """TypeChecker.redefine analogue (_types.py:122-154): returns a
        copy where JSON type `name` compiles via `fn(ctx) -> Column |
        None` (None = statically satisfied for the bound Spark type).
        Redefining a built-in name overrides it; new names extend the
        vocabulary accepted by `type`."""
        out = self.extend({})
        out.type_predicates[name] = fn
        return out

    def without(self, *keywords: str) -> "KeywordRegistry":
        """Copy minus `keywords` — drafts that predate a keyword must
        *ignore* it (the reference builds each draft class from an
        explicit keyword subset, validators.py:601-857; anything else is
        an unknown keyword and validates nothing)."""
        out = self.extend({})
        for kw in keywords:
            out._compilers.pop(kw, None)
        return out

    def keywords(self) -> set[str]:
        return set(self._compilers)


def cached_expr(ctx: CompileContext, op: str, build) -> Column:
    """Per-root-compile cache for target-derived helper Columns (see
    ``CompileContext.expr_cache``).  ``op`` names the derivation; the
    built Column depends only on (target, op).  The target is pinned in
    the cache value so its ``id()`` cannot be recycled mid-compile."""
    cache = getattr(ctx, "expr_cache", None)
    if cache is None:
        return build()
    key = (id(ctx.target), op)
    hit = cache.get(key)
    if hit is not None:
        return hit[1]
    col = build()
    cache[key] = (ctx.target, col)
    return col


def cached_lit(ctx: CompileContext, value) -> Column:
    """Per-root-compile cache for common literal Columns (False/True/
    small ints appear hundreds of times per compile, one JVM round trip
    each)."""
    cache = getattr(ctx, "expr_cache", None)
    if cache is None:
        return F.lit(value)
    key = ("lit", type(value).__name__, value)
    hit = cache.get(key)
    if hit is not None:
        return hit[1]
    col = F.lit(value)
    cache[key] = (None, col)
    return col


def fmt_message(ctx: CompileContext, template: str) -> Column:
    """Cached ``F.format_string(template, stringify(ctx))`` — the
    standard one-value violation message.  The same bound target gets
    the identical message Column for the identical template (the dtype
    class rides in the key because stringify's rendering branch depends
    on it)."""
    return cached_expr(
        ctx, f"fmt:{type(ctx.dtype).__name__}:{template}",
        lambda: F.format_string(template, stringify(ctx)))


def stringify(ctx: CompileContext) -> Column:
    """Stringified failing value for the violation row."""
    if ctx.target is None:
        return F.lit(None).cast("string")
    if ctx.is_array() or ctx.is_struct() or ctx.is_map():
        return cached_expr(ctx, "str_json", lambda: F.to_json(ctx.target))
    if ctx.is_binary():
        return cached_expr(ctx, "str_b64", lambda: F.base64(ctx.target))
    return cached_expr(ctx, "str_cast",
                       lambda: ctx.target.cast("string"))


def guard(ctx: CompileContext, pred: Column) -> Column:
    """NULL-at-binding = property absent: every bound check passes on NULL
    (the reference never applies a property subschema to a missing key —
    /root/reference/jsonschema/_keywords.py:290-301 iterates only present
    properties).  Array elements set ``null_is_absent=False`` because a
    JSON null *element* is a present null instance.
    """
    if ctx.target is None or not getattr(ctx, "null_is_absent", True):
        return pred
    return cached_expr(ctx, "isnull", lambda: ctx.target.isNull()) | pred


def type_match_column(ctx: CompileContext, schema: Any) -> Column:
    """``ValidationError._matches_type()`` (exceptions.py:184-197) as a
    compile-time Column: True when `schema`'s ``type`` matches the
    runtime JSON type of the bound instance.  No ``type`` keyword (or a
    non-string form) folds to False, mirroring the reference's
    KeyError/TypeError -> False.  NULL targets match only a declared
    "null" type (array-element scope); absent-property NULLs never
    surface because their checks are guard-passed."""
    expected = schema.get("type") if isinstance(schema, dict) else None
    if not isinstance(expected, (str, list)):
        return cached_lit(ctx, False)
    types = [expected] if isinstance(expected, str) else expected
    if ctx.target is None:  # row scope: the instance is an object
        return cached_lit(ctx, any(t in ("object", "any")
                                   for t in types if isinstance(t, str)))
    return cached_expr(
        ctx, f"tm:{types!r}:{type(ctx.dtype).__name__}",
        lambda: _type_match_build(ctx, types))


def _type_match_build(ctx: CompileContext, types: list) -> Column:
    from .keywords import _type_pred_for
    disj: Optional[Column] = None
    static = False
    for t in types:
        if not isinstance(t, str):  # draft3 type-as-schema entries
            continue
        try:
            p = _type_pred_for(ctx, t)
        except SchemaCompileError:
            continue
        if p is None:
            static = True  # non-null values of this Spark type match
        else:
            disj = p if disj is None else (disj | p)
    base: Optional[Column] = None
    if static:
        base = cached_expr(ctx, "isnotnull", ctx.target.isNotNull)
    if disj is not None:
        base = disj if base is None else (base | disj)
    if base is None:
        return cached_lit(ctx, False)
    if disj is None and static:
        # pure isNotNull can't be NULL — coalesce would be a no-op
        return cached_expr(
            ctx, "type_match_nn",
            lambda: F.coalesce(base, F.lit(False)))
    return F.coalesce(base, cached_lit(ctx, False))


def compile_subschema(ctx: CompileContext, schema: Any) -> Node:
    """Compile one (sub)schema against the bound target expression.

    Boolean schemas short-circuit like the reference
    (validators.py:369-379): ``True`` accepts everything, ``False``
    rejects any *present* instance.
    """
    if schema is True or schema == {}:
        return Node()
    if schema is False:
        n = Node()
        pred = F.lit(False)
        n.checks.append(Check(
            keyword="$falseSchema", json_path=ctx.json_path,
            schema_path=ctx.schema_path or "$falseSchema",
            pred=guard(ctx, pred),
            message=F.lit("False schema does not allow any value"),
            failing_value=stringify(ctx),
        ))
        return n
    if not isinstance(schema, dict):
        raise SchemaCompileError(
            f"schema at {ctx.schema_path or '<root>'} must be a dict or bool, "
            f"got {type(schema).__name__}")

    # $id-embedded resource entry: rebase refs and extend the dynamic
    # scope (the compile-time image of validators.py:1070-1095's
    # resolver.in_scope / descend push).
    if ctx.resolver is not None:
        nb = ctx.resolver.node_base.get(id(schema))
        if nb is not None and nb != ctx.base_uri:
            ctx = ctx.child()
            ctx.base_uri = nb
            ctx.dynamic_scope = ctx.dynamic_scope + (nb,)
            # a referenced resource declaring a different $schema is
            # processed under that draft's keyword semantics — the
            # reference gets this from referencing's per-resource
            # specification (suite optional/cross-draft.json)
            root = ctx.resolver.documents.get(nb)
            if isinstance(root, dict):
                from .legacy import PROFILES, registry_for
                if root.get("$schema") in PROFILES:
                    reg2 = registry_for(root) or default_registry()
                    reg2 = reg2.extend({})
                    reg2.assert_formats = ctx.registry.assert_formats
                    ctx.registry = reg2

    # pre-2019 drafts ignore $ref siblings (_legacy_keywords.py:9-21,
    # applicable_validators wiring at validators.py:632-760); 2020-12
    # evaluates them alongside.  Profile registries set the flag.
    if "$ref" in schema and getattr(ctx.registry, "ref_ignores_siblings",
                                    False):
        schema = {"$ref": schema["$ref"]}
    out = Node()
    # _matches_type annotation (exceptions.py:184-197,421): checks
    # surfacing at THIS level have error.schema == `schema`; descendant
    # checks were annotated at their own level (type_match already set)
    tm: Optional[Column] = None

    def annotate(chk: Check) -> None:
        nonlocal tm
        if chk.type_match is None:
            if tm is None:
                tm = type_match_column(ctx, schema)
            chk.type_match = tm

    for keyword, value in schema.items():
        fn = ctx.registry.get(keyword)
        if fn is None:
            if keyword in ANNOTATION_KEYWORDS:
                continue
            # unknown keywords are ignored by the reference (filtered at
            # precompile, validators.py:293-297); we warn once.
            ctx.warn(f"unknown keyword {keyword!r} ignored")
            continue
        node = fn(ctx.child(schema_fragment=None), value, schema)
        if node is None:
            continue
        for chk in node.checks:
            if not chk.skip_null_guard:
                chk.pred = guard(ctx, chk.pred)
            annotate(chk)
            out.checks.append(chk)
        for chk in node.context:
            if not chk.skip_null_guard:
                chk.pred = guard(ctx, chk.pred)
            annotate(chk)
            out.context.append(chk)
        out._extra_ok.extend(guard(ctx, p) for p in node._extra_ok)

    # annotation keywords produce output units (2020-12 "basic" format)
    # when the owning subschema successfully applies to a present
    # instance — collected compile-time into ctx.annotations
    present = set(schema) & ANNOTATION_VALUE_KEYWORDS
    if present:
        from .node import AnnotationUnit
        applies = guard(ctx, out.ok) if ctx.target is not None else out.ok
        if ctx.target is not None and getattr(ctx, "null_is_absent", True):
            applies = ctx.target.isNotNull() & applies
        for kw in sorted(present):
            ctx.annotations.append(AnnotationUnit(
                keyword=kw, json_path=ctx.json_path,
                schema_path=schema_path_join(ctx.schema_path, kw),
                value=schema[kw], pred=applies))
    return out


def make_check(ctx: CompileContext, keyword: str, pred: Column,
               message: Column, schema_suffix: Optional[str] = None) -> Node:
    n = Node()
    sp = schema_path_join(ctx.schema_path, schema_suffix or keyword)
    n.checks.append(Check(
        keyword=keyword, json_path=ctx.json_path, schema_path=sp,
        pred=pred, message=message, failing_value=stringify(ctx),
    ))
    return n


class SchemaCompileError(ValueError):
    """Engine analogue of the reference's ``SchemaError``
    (/root/reference/jsonschema/exceptions.py:209-215)."""


_DEFAULT: Optional[KeywordRegistry] = None


def default_registry() -> KeywordRegistry:
    """The draft-2020-12 profile registry (built lazily)."""
    global _DEFAULT
    if _DEFAULT is None:
        from . import applicators, keywords  # circular-safe: late import
        reg = KeywordRegistry()
        keywords.register_all(reg)
        applicators.register_all(reg)
        # $recursiveRef is 2019-09 only (validators.py:812-857 has no
        # entry for it); `dependencies` is supported as the optional
        # compatibility keyword (suite
        # optional/dependencies-compatibility.json — a superset of the
        # reference, which ignores it)
        from .legacy import c_dependencies
        reg.register("dependencies", c_dependencies)
        _DEFAULT = reg.without("$recursiveRef")
    return _DEFAULT
