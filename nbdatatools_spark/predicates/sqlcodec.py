"""PNode -> SQL WHERE-fragment renderer (P7 in SURVEY §2.2).

Two dialects:

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
