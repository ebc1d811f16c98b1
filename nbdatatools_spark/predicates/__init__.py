from nbdatatools_spark.predicates.pnode import (  # noqa: F401
    PNode,
    PredicateLeaf,
    Conjugate,
    parse_pnode,
)
from nbdatatools_spark.predicates.compiler import compile_pnode  # noqa: F401
from nbdatatools_spark.predicates.sqlcodec import render_sql  # noqa: F401
