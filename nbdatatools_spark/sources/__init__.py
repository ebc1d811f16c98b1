from nbdatatools_spark.sources.xvec import (  # noqa: F401
    read_xvec,
    write_xvec,
    xvec_dtype,
    XVEC_FORMATS,
)
from nbdatatools_spark.sources.csv_vec import read_csv_vectors  # noqa: F401
from nbdatatools_spark.sources.dataset import DatasetManifest, load_dataset  # noqa: F401
from nbdatatools_spark.sources.catalog import Catalog  # noqa: F401
