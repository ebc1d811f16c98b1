"""PNode -> SQL / CQL / CDDL render codecs (P7 in SURVEY §2.2).

SQL has two dialects:

- ``reference``: byte-conformant with the reference's PNodeSqlCodec
  (PNodeSqlCodec.java:44-129): ``F0 > 42``, ``name IN ('a', 'b')``,
  parenthesized conjugates joined by `` AND ``/`` OR ``, `=`/`!=`, text
  quoting ``'it''s'``, TRUE/FALSE, NULL, and (notably) MATCHES rendered as
  LIKE — the reference renders regex predicates as LIKE even though its
  evaluator does full regex; we preserve that quirk in this dialect only.
- ``duckdb`` (also valid ANSI for most engines): semantically faithful
  rendering for oracle-differencing — MATCHES becomes
  ``regexp_full_match(col, 'pattern')`` and EQ-with-NULL becomes
  ``col IS NULL``, matching the evaluator's actual behavior.
"""

from __future__ import annotations

from nbdatatools_spark.predicates.pnode import Conjugate, PNode, PredicateLeaf

_SQL_OP = {"GT": ">", "LT": "<", "EQ": "=", "NE": "!=", "GE": ">=", "LE": "<="}


def _render_value(v) -> str:
    """Literal rendering per PNodeSqlCodec.java:121-129."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def _field_ref(leaf: PredicateLeaf) -> str:
    """fieldName if present else F<index> (PNodeSqlCodec.java:83-85)."""
    return leaf.field_name if leaf.field_name is not None else f"F{leaf.field}"


def render_sql(node: PNode, dialect: str = "reference") -> str:
    if isinstance(node, Conjugate):
        sep = f" {node.op} "
        return "(" + sep.join(render_sql(c, dialect) for c in node.nodes) + ")"
    assert isinstance(node, PredicateLeaf)
    ref = _field_ref(node)
    op = node.op
    first = node.values[0]
    if op == "IN":
        vals = ", ".join(_render_value(v) for v in node.values)
        return f"{ref} IN ({vals})"
    if op == "MATCHES":
        if dialect == "reference":
            return f"{ref} LIKE {_render_value(first)}"
        return f"regexp_full_match({ref}, {_render_value(first)})"
    if first is None and dialect != "reference":
        # semantic dialect: EQ NULL == IS NULL; other ops never match
        return f"{ref} IS NULL" if op == "EQ" else "FALSE"
    return f"{ref} {_SQL_OP[op]} {_render_value(first)}"


def render_cql(node: PNode) -> str:
    """CQL WHERE-fragment renderer, conformant with the reference's
    PNodeCqlCodec (PNodeCqlCodec.java:48-113): conjugates join children
    with the bare op and NO parenthesized grouping (CQL has no OR/paren
    grouping); MATCHES is not a CQL keyword and renders as
    ``field /* MATCHES */ 'pattern'`` with the raw pattern unescaped;
    comparands otherwise use SQL literal quoting."""
    if isinstance(node, Conjugate):
        sep = f" {node.op} "
        return sep.join(render_cql(c) for c in node.nodes)
    assert isinstance(node, PredicateLeaf)
    ref = _field_ref(node)
    if node.op == "IN":
        return f"{ref} IN ({', '.join(_render_value(v) for v in node.values)})"
    if node.op == "MATCHES":
        raw = node.values[0] if node.values else ""
        return f"{ref} /* MATCHES */ '{raw}'"
    return f"{ref} {_SQL_OP[node.op]} {_render_value(node.values[0])}"


def _cddl_type(v) -> str:
    """CDDL type keyword of the first comparand (PNodeCddlCodec.java:81-92);
    bool precedes int — Python bools are ints."""
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "tstr"
    if isinstance(v, (bytes, bytearray)):
        return "bstr"
    if v is None:
        return "null"
    return "int"


def _cddl_value(v) -> str:
    """CDDL literal (PNodeCddlCodec.java:120-128): double-quoted text with
    escaped quotes, lowercase booleans, bare numbers, h'...' bytes."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return '"' + v.replace('"', '\\"') + '"'
    if isinstance(v, (bytes, bytearray)):
        return "h'...'"
    return str(v)


_CDDL_OP = dict(_SQL_OP, IN="IN", MATCHES="MATCHES")


def render_cddl(node: PNode) -> str:
    """CDDL-style renderer, conformant with the reference's PNodeCddlCodec
    (PNodeCddlCodec.java:47-117): conjugates as ``AND { a, b }``, leaves as
    ``field: <type> <op> <value|[values]>``."""
    if isinstance(node, Conjugate):
        return f"{node.op} {{ " + ", ".join(render_cddl(c) for c in node.nodes) + " }"
    assert isinstance(node, PredicateLeaf)
    first = node.values[0] if node.values else 0
    vals = (
        _cddl_value(node.values[0])
        if len(node.values) == 1
        else "[" + ", ".join(_cddl_value(v) for v in node.values) + "]"
    )
    return f"{_field_ref(node)}: {_cddl_type(first)} {_CDDL_OP[node.op]} {vals}"
