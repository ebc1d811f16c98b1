from nbdatatools_spark.operators.knn import exact_knn, knn_recall  # noqa: F401
from nbdatatools_spark.operators.windows import window_slice, rebase_ordinals  # noqa: F401
