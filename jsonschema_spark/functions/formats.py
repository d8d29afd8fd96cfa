"""`format` checkers as vectorized Column predicates.

Mirrors /root/reference/jsonschema/_format.py: a registry of per-format
checks; non-strings always pass (handled by the compiler's static type
gate); **unknown formats always pass** (_format.py:133-134).  The
reference gates each check on an optional dependency import
(_format.py:266,287,396,...); our analogue is that every format below is
expressible natively (regex / try_to_date) or with a stdlib-backed pandas
UDF, so nothing is gated in this environment.

Register custom formats with :func:`register_format` — the analogue of
``FormatChecker.checks`` (_format.py:58-85).
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

FormatFn = Callable[[Column], Column]

_REGISTRY: dict[str, FormatFn] = {}


def register_format(name: str, fn: FormatFn) -> None:
    _REGISTRY[name] = fn


def format_predicate(col: Column, name: str) -> Optional[Column]:
    """Predicate for format `name`, or None when unknown (always passes)."""
    fn = _REGISTRY.get(name)
    return fn(col) if fn is not None else None


def known_formats() -> set[str]:
    return set(_REGISTRY)


# --- native (regex / builtin) formats --------------------------------------

_IPV4 = (r"\A((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
         r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\z")

_UUID = (r"\A[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
         r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\z")

_HOSTNAME = (r"\A(?=.{1,253}\.?\z)[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
             r"(\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*\.?\z")

_TIME_BODY = r"([01][0-9]|2[0-3]):[0-5][0-9]:([0-5][0-9]|60)(\.[0-9]+)?"
_TZ = r"([Zz]|[+-]([01][0-9]|2[0-3]):[0-5][0-9])"
_DATE_BODY = r"[0-9]{4}-[0-9]{2}-[0-9]{2}"

_DURATION = (r"\AP(?!\z)([0-9]+W|"
             r"([0-9]+Y)?([0-9]+M)?([0-9]+D)?"
             r"(T(?=[0-9])([0-9]+H)?([0-9]+M)?([0-9]+(\.[0-9]+)?S)?)?)\z")

_JSON_POINTER = r"\A(/([^/~]|~[01])*)*\z"
_REL_JSON_POINTER = r"\A(0|[1-9][0-9]*)(#|(/([^/~]|~[01])*)*)\z"


def _email(c: Column) -> Column:
    # intentionally loose, like the reference (_format.py:235-240)
    return c.contains("@")


def _date(c: Column) -> Column:
    # regex + real-calendar check (_format.py:19,423-433)
    return (c.rlike(f"\\A{_DATE_BODY}\\z")
            & F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).isNotNull())


def _date_time(c: Column) -> Column:
    # RFC 3339 (rfc3339_validator semantics, _format.py:396-413): structural
    # regex (incl. leap-second :60) + calendar validity of the date part.
    rx = f"\\A{_DATE_BODY}[Tt ]{_TIME_BODY}{_TZ}\\z"
    return (c.rlike(rx)
            & F.try_to_timestamp(F.substring(c, 1, 10), F.lit("yyyy-MM-dd")).isNotNull())


def _time(c: Column) -> Column:
    return c.rlike(f"\\A{_TIME_BODY}{_TZ}\\z")


def _ipv6(c: Column) -> Column:
    # stdlib `ipaddress` via Arrow batch; scope-ids rejected like the
    # reference (_format.py:258-263).
    @F.pandas_udf("boolean")
    def _check(s: pd.Series) -> pd.Series:
        import ipaddress

        def ok(v):
            if v is None or "%" in v:
                return False
            try:
                ipaddress.IPv6Address(v)
                return True
            except ValueError:
                return False
        return s.map(ok).astype("boolean")
    return _check(c)


def _regex_fmt(c: Column) -> Column:
    # `re.compile` succeeds (_format.py:416-420)
    @F.pandas_udf("boolean")
    def _check(s: pd.Series) -> pd.Series:
        import re

        def ok(v):
            if v is None:
                return False
            try:
                re.compile(v)
                return True
            except re.error:
                return False
        return s.map(ok).astype("boolean")
    return _check(c)


def _uri(c: Column) -> Column:
    # scheme-required absolute URI, no whitespace / control chars
    return c.rlike(r"\A[A-Za-z][A-Za-z0-9+.-]*:[^\s]*\z") & ~c.rlike(r"\s")


def _uri_reference(c: Column) -> Column:
    return ~c.rlike(r"[\s\\]") & ~c.rlike(r"[^\x00-\x7f]")


_CSS21_COLORS = ("aqua black blue fuchsia gray green lime maroon navy "
                 "olive orange purple red silver teal white yellow").split()


def _color(c: Column) -> Column:
    # CSS2.1 names + #hex (webcolors semantics, _format.py:443-453);
    # \A/\z anchors — Java's $ matches before a trailing newline
    return c.isin(*_CSS21_COLORS) | c.rlike(r"\A#[0-9a-fA-F]{3}\z") \
        | c.rlike(r"\A#[0-9a-fA-F]{6}\z")


_URI_TEMPLATE = (r"\A([^\x00-\x20\x7f\"'%<>\\^`{|}]|%[0-9A-Fa-f]{2}|"
                 r"\{[+#./;?&=,!@|]?((\w|%[0-9A-Fa-f]{2})(\.?(\w|"
                 r"%[0-9A-Fa-f]{2}))*(:[1-9][0-9]{0,3}|\*)?)(,((\w|"
                 r"%[0-9A-Fa-f]{2})(\.?(\w|%[0-9A-Fa-f]{2}))*"
                 r"(:[1-9][0-9]{0,3}|\*)?))*\})*\z")


def _iri(c: Column) -> Column:
    # scheme-required absolute IRI: URI grammar + non-ASCII allowed
    return c.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:") & ~c.rlike(r"[\s\\]")


def _idn_hostname(c: Column) -> Column:
    # stdlib idna codec via Arrow batch (reference wraps the idna lib,
    # _format.py:287-301)
    @F.pandas_udf("boolean")
    def _check(s: pd.Series) -> pd.Series:
        def ok(v):
            if v is None or not v:
                return False
            try:
                v.encode("idna")
                return True
            except UnicodeError:
                return False
        return s.map(ok).astype("boolean")
    return _check(c)


register_format("color", _color)
register_format("uri-template", lambda c: c.rlike(_URI_TEMPLATE))
register_format("iri", _iri)
register_format("iri-reference", lambda c: ~c.rlike(r"[\s\\]"))
register_format("idn-hostname", _idn_hostname)
register_format("email", _email)
register_format("idn-email", _email)
register_format("ipv4", lambda c: c.rlike(_IPV4))
register_format("ip-address", lambda c: c.rlike(_IPV4))  # draft3 name
register_format("ipv6", _ipv6)
register_format("hostname", lambda c: c.rlike(_HOSTNAME))
register_format("host-name", lambda c: c.rlike(_HOSTNAME))
register_format("uuid", lambda c: c.rlike(_UUID))
register_format("date", _date)
register_format("date-time", _date_time)
register_format("time", _time)
register_format("duration", lambda c: c.rlike(_DURATION))
register_format("json-pointer", lambda c: c.rlike(_JSON_POINTER))
register_format("relative-json-pointer", lambda c: c.rlike(_REL_JSON_POINTER))
register_format("regex", _regex_fmt)
register_format("uri", _uri)
register_format("uri-reference", _uri_reference)
