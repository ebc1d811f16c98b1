"""PNode -> pyspark Column compiler (P2-P6 in SURVEY §2.2).

Semantics mirror spec/predicates/PredicateEvaluator.java exactly:

- comparisons GT/LT/EQ/NE/GE/LE on numeric/string/bool fields with numeric
  promotion: int comparand -> compare as long, float comparand -> as double
  (PredicateEvaluator.java:146-187)
- IN membership (:159-166), MATCHES = FULL-string regex
  (``Pattern.matches``, :207) -> compiled to an anchored ``rlike``
- null field matches only EQ-with-NullVal (:82-99); all other ops on a null
  field are false. The compiled Column therefore wraps in coalesce(..., false)
  so three-valued SQL nulls collapse to the reference's two-valued logic.
- AND = all children, OR = any child (:54-71)
- bool fields only support EQ/NE (:212-221)

The same tree renders to SQL via predicates.sqlcodec — evaluation and
rendering are two views of one structure, exactly as in the reference
(SURVEY §3.3).
"""

from __future__ import annotations

from functools import reduce
from operator import and_, or_

from pyspark.sql import Column
from pyspark.sql import functions as F

from nbdatatools_spark.predicates.pnode import Conjugate, PNode, PredicateLeaf


def _lit(value) -> Column:
    """Typed literal with reference promotion rules: python int -> long,
    float -> double (PredicateEvaluator.java:33-35,146-187)."""
    if isinstance(value, bool):
        return F.lit(value)
    if isinstance(value, int):
        return F.lit(value).cast("long")
    if isinstance(value, float):
        return F.lit(value).cast("double")
    return F.lit(value)


def _leaf_to_column(leaf: PredicateLeaf, col: Column) -> Column:
    op = leaf.op
    first = leaf.values[0]
    if first is None:
        # Null comparand: only EQ-with-null can ever match, and it matches
        # exactly the null-field rows (PredicateEvaluator.java:82-99).
        return col.isNull() if op == "EQ" else F.lit(False)
    if op == "MATCHES":
        # Pattern.matches is full-match (PredicateEvaluator.java:207);
        # rlike is find() — anchor with a non-capturing group.
        return col.rlike(f"^(?:{first})$")
    # IntVal comparand: the reference narrows the FIELD value to long
    # (fieldVal.longValue(), truncation toward zero — PredicateEvaluator.
    # java:148-150), so field=45.5 GT 45 is FALSE there. Spark would instead
    # widen the long literal to double. Cast the column to long to match
    # (Spark's double->long cast also truncates toward zero). The cast is a
    # no-op (elided) on integral columns; on double columns it trades parquet
    # pushdown for exact reference semantics — use float comparands when you
    # want a pushable range scan over doubles. (ADVICE r1.)
    if isinstance(first, int) and not isinstance(first, bool):
        col = col.cast("long")
    if op == "IN":
        return col.isin([v for v in leaf.values if v is not None])
    cmp = {
        "GT": col.__gt__,
        "LT": col.__lt__,
        "EQ": col.__eq__,
        "NE": col.__ne__,
        "GE": col.__ge__,
        "LE": col.__le__,
    }[op]
    return cmp(_lit(first))


def compile_pnode(
    node: PNode, columns: list[str] | None = None, two_valued: bool = True
) -> Column:
    """Compile a PNode tree to a Column predicate.

    ``columns`` resolves positional field indices (P6); ``two_valued`` wraps
    the result in coalesce(expr, false) so null propagation matches the
    reference's boolean evaluator in SELECT/CASE contexts.

    PERF: for WHERE filtering pass ``two_valued=False`` (or use
    ``where_pnode``): observable semantics are identical (Spark drops
    null-result rows), but the coalesce wrapper BLOCKS parquet predicate
    pushdown — measured as ``PushedFilters: []`` vs pushed comparisons.
    """
    if columns is not None:
        node = node.resolve(columns)

    def go(n: PNode) -> Column:
        if isinstance(n, Conjugate):
            children = [go(c) for c in n.nodes]
            return reduce(and_ if n.op == "AND" else or_, children)
        name = n.field_name
        if name is None:
            raise ValueError(
                "unresolved positional predicate; pass columns= to resolve "
                "(mirrors PredicateEvaluator.java:74-81 which requires named predicates)"
            )
        return _leaf_to_column(n, F.col(name))

    out = go(node)
    return F.coalesce(out, F.lit(False)) if two_valued else out


def where_pnode(df, node: PNode, columns: list[str] | None = None):
    """Filter a DataFrame by a PNode with pushdown-friendly compilation."""
    return df.where(compile_pnode(node, columns or df.columns, two_valued=False))


def result_indices(
    meta_df, node: PNode, ordinal: str = "ordinal", columns: list[str] | None = None
):
    """P8: the matching-ordinal set for one predicate, ascending — the
    hybrid-query ground-truth facet (specs/ordinal_predicate_writers_v1.md:
    24-33). Returns DataFrame (ordinal) sorted."""
    return where_pnode(meta_df, node, columns).select(ordinal).orderBy(ordinal)
