from nbdatatools_spark.plans.tokens import Templatizer, compute_spec_tokens  # noqa: F401
