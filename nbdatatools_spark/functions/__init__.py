from nbdatatools_spark.functions.distance import (  # noqa: F401
    cosine_distance,
    cosine_similarity,
    dot_product,
    dot_product_distance,
    euclidean_distance,
    l2_norm,
    manhattan_distance,
    distance_expr,
    METRICS,
)
from nbdatatools_spark.functions.text import (  # noqa: F401
    token_count,
    normalize_text,
    doc_fingerprint,
    punct_ratio,
    stopword_ratio,
    quality_score,
    char_ngrams,
    word_shingles,
)
from nbdatatools_spark.functions.units import parse_unit_count  # noqa: F401
