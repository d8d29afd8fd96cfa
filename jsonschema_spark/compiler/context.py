"""Compile-time context threaded through keyword compilers.

Mirrors what the reference's ``descend()`` carries down the schema tree —
instance path, schema path, and the resolver scope
(/root/reference/jsonschema/validators.py:396-446) — except ours is pure
compile-time state: no data flows through it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace
from typing import TYPE_CHECKING, Any, Optional

from pyspark.sql import Column
from pyspark.sql import types as T

if TYPE_CHECKING:
    from .registry import KeywordRegistry

_IDENT = re.compile(r"^\w+$")


def json_path_join(base: str, fragment: Any) -> str:
    """Render a JSONPath the way ``ValidationError.json_path`` does
    (/root/reference/jsonschema/exceptions.py:152-163): ``$`` root,
    ``.prop`` for identifier-like keys, ``['odd key']`` otherwise,
    ``[i]`` for array indexes.
    """
    if isinstance(fragment, int):
        return f"{base}[{fragment}]"
    if _IDENT.match(str(fragment)):
        return f"{base}.{fragment}"
    return f"{base}['{fragment}']"


def pointer_escape(name: Any) -> str:
    """RFC 6901 escaping for ONE pointer segment: ``~`` -> ``~0``,
    ``/`` -> ``~1``.  Applied wherever a *schema-controlled name*
    (property name, pattern, dependency key) is embedded in a schema
    path, so a property called ``~a/b`` renders as ``~0a~1b`` — the
    official output-tests' keywordLocation expectation
    (json/output-tests/draft2020-12/content/escape.json).  Keyword
    fragments themselves (``anyOf``, ``properties``, ...) never contain
    ``/``/``~`` and are joined verbatim."""
    return str(name).replace("~", "~0").replace("/", "~1")


def schema_path_join(base: str, fragment: Any) -> str:
    return f"{base}/{fragment}" if base else str(fragment)


@dataclass
class CompileContext:
    """State for compiling one subschema against one bound expression."""

    registry: "KeywordRegistry"
    target: Optional[Column]          # bound instance expression (None = row scope)
    dtype: Optional[T.DataType]       # Spark type of `target` (None = row scope)
    json_path: str = "$"
    schema_path: str = ""
    root_schema: Optional[dict] = None   # for $ref / $defs resolution
    row_fields: Optional[list[T.StructField]] = None  # row-scope column list
    #: True when a NULL target means "property absent" (column / struct
    #: field binding); False for array elements, where NULL is a present
    #: JSON null instance.
    null_is_absent: bool = True
    #: Data-model policy for OBJECT-MEMBER bindings: what
    #: ``null_is_absent`` should reset to when binding a struct field /
    #: map value, regardless of the current scope's flag.  ``None``
    #: (default) inherits the current flag — the original behavior,
    #: right for suite mode where every NULL is a present JSON null.
    #: Document/table mode sets True so members of structs INSIDE
    #: ARRAYS go back to NULL==absent after the element scope set
    #: null_is_absent=False (a null *element* is present; a NULL
    #: *member* of that element is absent — how field-union struct
    #: types represent objects with differing key sets).
    absent_policy: Optional[bool] = None
    #: URI-based reference machinery (compiler/resolver.py) — the
    #: referencing-registry analogue.  base_uri is the current schema
    #: resource's base; dynamic_scope the resources entered so far
    #: (outermost first), for $dynamicRef/$recursiveRef.
    resolver: Optional[Any] = None
    base_uri: str = ""
    dynamic_scope: tuple = ()
    #: (id(referent), json_path) pairs currently on the compile stack —
    #: revisiting one means the schema recurses without consuming
    #: instance depth: a genuine infinite loop, raised as a compile error
    #: (never silently passed).
    ref_stack: frozenset = frozenset()
    #: True when the bound target is a statically-absent object member
    #: (NULL literal): value checks pass vacuously, so $ref recursion in
    #: this scope is cut off as a pass, not an error.
    statically_absent: bool = False
    max_ref_depth: int = 64
    #: compile-time $ref expansion memo, shared down the tree (like
    #: `warnings`) and scoped to one root compile.  Keyed by
    #: (referent identity, json_path, target expression string, dtype,
    #: binding flags, resource base, dynamic scope) — everything the
    #: compiled Columns can depend on.  See applicators._compile_referent.
    ref_memo: dict = field(default_factory=dict)
    #: per-root-compile Column cache for target-derived helper
    #: expressions that every keyword check rebuilds identically
    #: (stringified failing value, the NULL-absent guard, common
    #: literals).  Each py4j Column construction is a JVM round trip
    #: (~0.1ms); a node with five keyword checks otherwise pays it five
    #: times over for byte-identical expressions.  Keyed on
    #: (id(target), op) with the target Column pinned in the value so
    #: CPython cannot recycle the id while the cache lives; shared down
    #: the tree by `child()`'s `replace` like `ref_memo`/`warnings`.
    expr_cache: dict = field(default_factory=dict)
    warnings: list[str] = field(default_factory=list)
    #: AnnotationUnit rows collected during compile (annotation keywords
    #: like readOnly/title/default with their locations + applicability
    #: predicates) — shared down the tree like `warnings`.
    annotations: list = field(default_factory=list)

    def child(self, *, target: Optional[Column] = None,
              dtype: Optional[T.DataType] = None,
              path_fragment: Any = None,
              schema_fragment: Any = None,
              null_is_absent: Optional[bool] = None,
              row_fields: Optional[list[T.StructField]] = "KEEP") -> "CompileContext":
        jp = self.json_path if path_fragment is None else json_path_join(self.json_path, path_fragment)
        sp = self.schema_path if schema_fragment is None else schema_path_join(self.schema_path, schema_fragment)
        rf = self.row_fields if row_fields == "KEEP" else row_fields
        nia = self.null_is_absent if null_is_absent is None else null_is_absent
        return replace(self, target=target if target is not None else self.target,
                       dtype=dtype if dtype is not None else self.dtype,
                       json_path=jp, schema_path=sp, row_fields=rf,
                       null_is_absent=nia, warnings=self.warnings)

    def warn(self, msg: str) -> None:
        self.warnings.append(f"{self.schema_path or '<root>'}: {msg}")

    # --- static type classification helpers -------------------------------
    def is_string(self) -> bool:
        return isinstance(self.dtype, T.StringType)

    def is_numeric(self) -> bool:
        return isinstance(self.dtype, (T.ByteType, T.ShortType, T.IntegerType,
                                       T.LongType, T.FloatType, T.DoubleType,
                                       T.DecimalType))

    def is_integral(self) -> bool:
        return isinstance(self.dtype, (T.ByteType, T.ShortType, T.IntegerType,
                                       T.LongType))

    def is_boolean(self) -> bool:
        return isinstance(self.dtype, T.BooleanType)

    def is_array(self) -> bool:
        return isinstance(self.dtype, T.ArrayType)

    def is_struct(self) -> bool:
        return isinstance(self.dtype, T.StructType)

    def is_map(self) -> bool:
        return isinstance(self.dtype, T.MapType)

    def is_binary(self) -> bool:
        return isinstance(self.dtype, T.BinaryType)
