"""Typed attribute specifier syntax (VERDICT r1 missing #4).

Mirrors the reference's attribute syntax v1
(specs/attribute_syntax_v1.md:1-14; spec/attributes/syntax/ValueType.java:
49-154, AttrSpec.java:59-86, AttrValue.java:69-90, AttrSet.java:65-82):

- ``AttrSpec``: ``[/path][:.]attr`` — optional manifest section path plus an
  identifier attribute name.
- ``AttrValue``: ``[(typename)]literal`` — optional explicit type hint, else
  the type is inferred from the literal with the reference's suffix rules
  (``42b`` byte, ``42s`` short, ``42``/``42i`` int, ``42L`` / >=10 digits
  long, ``4.2``/``4.2f`` float (<=7 digits), double otherwise, ``(string)``
  fallback).
- ``AttrSet``: ``spec = value``.

Numeric parses enforce the Java type ranges so an overflowing literal fails
with a specific message rather than silently widening (the reference's
stated contract, ValueType.java:41-47).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum


class ValueType(Enum):
    BYTE = "byte"
    SHORT = "short"
    INT = "int"
    LONG = "long"
    FLOAT = "float"
    DOUBLE = "double"
    STRING = "string"


_RANGES = {
    ValueType.BYTE: (-(1 << 7), (1 << 7) - 1),
    ValueType.SHORT: (-(1 << 15), (1 << 15) - 1),
    ValueType.INT: (-(1 << 31), (1 << 31) - 1),
    ValueType.LONG: (-(1 << 63), (1 << 63) - 1),
}

_SUFFIX = {
    ValueType.BYTE: "bB",
    ValueType.SHORT: "sS",
    ValueType.INT: "iI",
    ValueType.LONG: "lL",
    ValueType.FLOAT: "fF",
    ValueType.DOUBLE: "dD",
}


def _strip_suffix(vt: ValueType, literal: str) -> str:
    sfx = _SUFFIX.get(vt)
    if sfx and literal and literal[-1] in sfx:
        return literal[:-1]
    return literal


def parse_typed(vt: ValueType, literal: str):
    """ValueType.parse analogue: suffix-stripped parse with Java range
    enforcement."""
    body = _strip_suffix(vt, literal)
    if vt == ValueType.STRING:
        return literal
    if vt in (ValueType.FLOAT, ValueType.DOUBLE):
        try:
            return float(body)
        except ValueError:
            raise ValueError(f"not a {vt.value} literal: {literal!r}") from None
    try:
        n = int(body)
    except ValueError:
        raise ValueError(f"not a {vt.value} literal: {literal!r}") from None
    lo, hi = _RANGES[vt]
    if not (lo <= n <= hi):
        raise ValueError(f"{literal!r} overflows {vt.value} range [{lo}, {hi}]")
    return n


def value_type_of(literal: str) -> ValueType:
    """ValueType.fromLiteral:144-176, rule-for-rule."""
    n_digits = sum(c.isdigit() for c in literal)
    if re.fullmatch(r"[+-]?\d+[bB]", literal):
        return ValueType.BYTE
    if re.fullmatch(r"[+-]?\d{10,}", literal):
        return ValueType.LONG
    if re.fullmatch(r"[+-]?\d+[lL]", literal):
        return ValueType.LONG
    if re.fullmatch(r"[+-]?\d+[sS]", literal):
        return ValueType.SHORT
    if re.fullmatch(r"[+-]?\d+[iI]?", literal):
        return ValueType.INT
    if re.fullmatch(r"[+-]?\d+\.\d+", literal):
        return ValueType.FLOAT if n_digits <= 7 else ValueType.DOUBLE
    if re.fullmatch(r"[+-]?\d+(\.\d+)?[fF]", literal):
        return ValueType.FLOAT
    if re.fullmatch(r"[+-]?\d+(\.\d+)?[dD]", literal):
        return ValueType.DOUBLE
    return ValueType.STRING


_SPEC_RX = re.compile(r"(?P<path>/|(?:/[^:/.]+)+)?[:.]?(?P<attr>[a-zA-Z_][a-zA-Z0-9_]*)")
_VALUE_RX = re.compile(r"(?:\((?P<typename>[a-zA-Z0-9_]+)\))?(?P<literal>.+)", re.DOTALL)
_SET_RX = re.compile(
    r"(?P<attrname>(?:/|(?:/[^:/.]+)+)?[:.]?[a-zA-Z_][a-zA-Z0-9_]*)"
    r"\s*=\s*"
    r"(?P<attrvalue>(?:\([a-zA-Z0-9_]+\))?.+)",
    re.DOTALL,
)


@dataclass(frozen=True)
class AttrSpec:
    """``[/section/path][:.]name`` (AttrSpec.java:59-86); default path "/"."""

    path: str
    attr: str

    @classmethod
    def parse(cls, spec: str) -> "AttrSpec":
        m = _SPEC_RX.fullmatch(spec)
        if not m:
            raise ValueError(f"invalid attribute spec format: {spec!r}")
        return cls((m.group("path") or "/").strip(), m.group("attr"))


@dataclass(frozen=True)
class AttrValue:
    """Typed value: explicit ``(typename)`` hint or inferred from the
    literal (AttrValue.java:69-90)."""

    type: ValueType
    literal: str
    value: object

    @classmethod
    def parse(cls, spec: str) -> "AttrValue":
        m = _VALUE_RX.fullmatch(spec)
        if not m:
            raise ValueError(f"invalid attribute value format: {spec!r}")
        typename = (m.group("typename") or "").strip()
        literal = m.group("literal")
        if typename:
            try:
                vt = ValueType[typename.upper()]
            except KeyError:
                raise ValueError(f"unknown value type {typename!r}") from None
        else:
            vt = value_type_of(literal)
        return cls(vt, literal, parse_typed(vt, literal))


@dataclass(frozen=True)
class AttrSet:
    """``spec = value`` assignment (AttrSet.java:65-82)."""

    spec: AttrSpec
    value: AttrValue

    @classmethod
    def parse(cls, text: str) -> "AttrSet":
        m = _SET_RX.fullmatch(text)
        if not m:
            raise ValueError(f"invalid attribute set format: {text!r}")
        return cls(AttrSpec.parse(m.group("attrname")), AttrValue.parse(m.group("attrvalue")))
