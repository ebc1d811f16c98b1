from nbdatatools_spark.sources.xvec import (  # noqa: F401
    read_xvec,
    write_xvec,
    xvec_dtype,
    XVEC_FORMATS,
)
from nbdatatools_spark.sources.csv_vec import read_csv_vectors  # noqa: F401
from nbdatatools_spark.sources.dataset import DatasetManifest, load_dataset  # noqa: F401
from nbdatatools_spark.sources.catalog import Catalog  # noqa: F401
from nbdatatools_spark.sources.slab import SlabStore  # noqa: F401
from nbdatatools_spark.sources.sqlite_store import (  # noqa: F401
    read_predicate_store,
    read_sqlite_table,
)


def _read_parquet(spark, path):
    return spark.read.parquet(path)


# X1 reader registry — the ServiceLoader-SPI analogue
# (services/VectorFileIO.java:37-368): format key -> ingest callable
# (spark, path) -> DataFrame. Extensions register by inserting here.
READERS = {
    "fvec": read_xvec,
    "ivec": read_xvec,
    "bvec": read_xvec,
    "dvec": read_xvec,
    "svec": read_xvec,
    "mvec": read_xvec,
    "csv": read_csv_vectors,
    "parquet": _read_parquet,
}


def open_vectors(spark, path: str):
    """Extension-dispatched ingest (VectorFileIO.open analogue)."""
    ext = path.rsplit(".", 1)[-1].lower().rstrip("s") if "." in path else "parquet"
    ext = ext if ext in READERS else path.rsplit(".", 1)[-1].lower()
    if ext not in READERS:
        raise ValueError(f"no reader registered for {path!r} (have {sorted(READERS)})")
    return READERS[ext](spark, path)
