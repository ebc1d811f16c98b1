import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbdatatools_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nbdatatools-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# --- slow-test marking (round 11, VERDICT r10 "next round" #1) ----------
#
# The 10-round equivalence/property sweep suite outgrew the driver's
# pytest time budget (1146+ tests / ~79 min; the driver's run was cut
# mid-suite and reported red on TIME, not failures). The exhaustive
# sweeps are marked `slow` from the checked-in profile list
# (tests/slow_tests.json, generated from a full-suite --durations=0 run:
# every test whose cumulative call time was >= ~2.2s, EXCEPT each file's
# fastest test, which always stays in the default run so every operator
# family keeps a fast pin). pytest.ini deselects `slow` by default;
# run everything with:  python -m pytest tests/ -m "slow or not slow"
import json as _json

with open(os.path.join(os.path.dirname(__file__), "slow_tests.json")) as _fh:
    _SLOW_IDS = set(_json.load(_fh))


def pytest_collection_modifyitems(config, items):
    import re as _re

    for item in items:
        nodeid = _re.sub(r"\[.*\]$", "", item.nodeid)
        if nodeid in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)
