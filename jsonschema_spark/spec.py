"""Constraint-spec meta-validation — the ``check_schema`` analogue.

The reference validates every schema against its meta-schema before use
(``Validator.check_schema``, /root/reference/jsonschema/validators.py:306-316)
and raises ``SchemaError``.  We run a structural meta-check of the keyword
vocabulary the engine compiles, driver-side, before any Spark plan is
built — fail fast, no cluster time wasted on a malformed spec.
"""

from __future__ import annotations

import re
from typing import Any

from .compiler.registry import SchemaCompileError

_TYPES = {"object", "array", "string", "integer", "number", "boolean",
          "null", "any"}

_NUMBER_KW = ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum")
_NONNEG_INT_KW = ("minLength", "maxLength", "minItems", "maxItems",
                  "minProperties", "maxProperties", "minContains",
                  "maxContains")
_SCHEMA_KW = ("not", "if", "then", "else", "items", "contains",
              "additionalProperties", "propertyNames", "unevaluatedItems",
              "unevaluatedProperties")
_SCHEMA_LIST_KW = ("allOf", "anyOf", "oneOf", "prefixItems")
_SCHEMA_MAP_KW = ("properties", "patternProperties", "dependentSchemas",
                  "$defs", "definitions")


def _is_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def check_schema(schema: Any, path: str = "#",
                 extra_types: frozenset = frozenset()) -> None:
    """Raise :class:`SchemaCompileError` if the spec is malformed.
    `extra_types` admits registry-redefined type names
    (KeywordRegistry.redefine_type, the TypeChecker.redefine
    analogue)."""
    if isinstance(schema, bool):
        return
    if not isinstance(schema, dict):
        raise SchemaCompileError(f"{path}: schema must be an object or "
                                 f"boolean, got {type(schema).__name__}")

    def bad(kw: str, why: str) -> SchemaCompileError:
        return SchemaCompileError(f"{path}/{kw}: {why}")

    if "type" in schema:
        v = schema["type"]
        vals = v if isinstance(v, list) else [v]
        for t in vals:
            if isinstance(t, dict):          # draft3: type may be a schema
                check_schema(t, f"{path}/type", extra_types)
            elif not (isinstance(t, str) and (t in _TYPES
                                              or t in extra_types)):
                raise bad("type", f"invalid type value {v!r}")
    if "enum" in schema:
        if not isinstance(schema["enum"], list) or not schema["enum"]:
            raise bad("enum", "must be a non-empty array")
    for kw in _NUMBER_KW:
        if kw in schema and not _is_number(schema[kw]):
            # draft4 spells exclusiveMinimum/Maximum as boolean modifiers
            # of minimum/maximum (_legacy_keywords.py:138-167)
            if kw.startswith("exclusive") and isinstance(schema[kw], bool):
                continue
            raise bad(kw, "must be a number")
    if "multipleOf" in schema:
        v = schema["multipleOf"]
        if not _is_number(v) or v <= 0:
            raise bad("multipleOf", "must be a positive number")
    for kw in _NONNEG_INT_KW:
        if kw in schema:
            v = schema[kw]
            if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                raise bad(kw, "must be a non-negative integer")
    if "pattern" in schema:
        if not isinstance(schema["pattern"], str):
            raise bad("pattern", "must be a string")
        try:
            re.compile(schema["pattern"])
        except re.error as e:
            raise bad("pattern", f"invalid regex: {e}")
    if "required" in schema:
        v = schema["required"]
        if not isinstance(v, bool):          # draft3: boolean form
            if (not isinstance(v, list)
                    or not all(isinstance(x, str) for x in v)):
                raise bad("required", "must be an array of strings")
    if "dependentRequired" in schema:
        v = schema["dependentRequired"]
        if not isinstance(v, dict) or not all(
                isinstance(deps, list)
                and all(isinstance(d, str) for d in deps)
                for deps in v.values()):
            raise bad("dependentRequired",
                      "must map property names to arrays of strings")
    if "uniqueItems" in schema and not isinstance(schema["uniqueItems"], bool):
        raise bad("uniqueItems", "must be a boolean")
    if "format" in schema and not isinstance(schema["format"], str):
        raise bad("format", "must be a string")
    for kw in ("$ref", "$dynamicRef"):
        if kw in schema and not isinstance(schema[kw], str):
            raise bad(kw, "must be a string")

    if "dependencies" in schema:
        v = schema["dependencies"]
        if not isinstance(v, dict):
            raise bad("dependencies", "must be an object")
        for name, dep in v.items():
            if isinstance(dep, list):
                if not all(isinstance(d, str) for d in dep):
                    raise bad("dependencies",
                              f"{name!r}: array form must hold strings")
            else:
                check_schema(dep, f"{path}/dependencies/{name}", extra_types)
    for kw in _SCHEMA_KW:
        if kw in schema:
            v = schema[kw]
            if kw == "items" and isinstance(v, list):
                # draft4-2019 positional form (_legacy_keywords.py:92-103)
                for i, sub in enumerate(v):
                    check_schema(sub, f"{path}/items/{i}", extra_types)
                continue
            check_schema(v, f"{path}/{kw}", extra_types)
    if "additionalItems" in schema:
        check_schema(schema["additionalItems"], f"{path}/additionalItems", extra_types)
    for kw in _SCHEMA_LIST_KW:
        if kw in schema:
            v = schema[kw]
            if not isinstance(v, list) or (kw != "prefixItems" and not v):
                raise bad(kw, "must be a non-empty array of schemas")
            for i, sub in enumerate(v):
                check_schema(sub, f"{path}/{kw}/{i}", extra_types)
    for kw in _SCHEMA_MAP_KW:
        if kw in schema:
            v = schema[kw]
            if not isinstance(v, dict):
                raise bad(kw, "must be an object of schemas")
            for name, sub in v.items():
                if kw == "patternProperties":
                    try:
                        re.compile(name)
                    except re.error as e:
                        raise bad(kw, f"invalid regex key {name!r}: {e}")
                check_schema(sub, f"{path}/{kw}/{name}", extra_types)
