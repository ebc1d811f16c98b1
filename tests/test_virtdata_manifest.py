"""virtdata manifest wiring (VERDICT r4 Missing #3): a dataset.yaml facet
declaring a model-backed generated source (dataset_yaml_v1.md:89-94,143-145)
resolves through the manifest loader to the index-deterministic generator."""

import json

import pytest

from nbdatatools_spark.datagen import generate_vectors
from nbdatatools_spark.sources.dataset import FacetSpec, load_dataset


def _rows(df):
    return sorted(
        (r["ordinal"], tuple(round(float(x), 6) for x in r["vector"]))
        for r in df.collect()
    )


def test_type_inference_rules():
    # explicit type wins; .json infers virtdata; everything else xvec
    assert FacetSpec.parse("base.fvec").resolved_type() == "xvec"
    assert FacetSpec.parse("model.json[100]").resolved_type() == "virtdata"
    assert FacetSpec.parse({"source": "weird.bin", "type": "virtdata"}).resolved_type() == "virtdata"
    assert FacetSpec.parse({"source": "model.json", "type": "xvec"}).resolved_type() == "xvec"


def test_virtdata_facet_equals_direct_generator(spark, tmp_path):
    root = tmp_path / "vds"
    root.mkdir()
    model = {"dimensions": 6, "seed": 7, "variability": 0.5}
    (root / "model.json").write_text(json.dumps(model))
    (root / "dataset.yaml").write_text(
        """
profiles:
  default:
    base: model.json[40]
    query:
      source: model.json
      window: 10..20
"""
    )
    m = load_dataset(str(root))
    base = m.facet(spark, "base")
    direct = generate_vectors(spark, count=40, dimensions=6, seed=7, variability=0.5)
    assert _rows(base) == _rows(direct)

    # windowed virtdata view: same generator, sliced + re-based like xvec
    q = m.facet(spark, "query")
    assert q.count() == 10


def test_virtdata_count_from_model(spark, tmp_path):
    root = tmp_path / "vds2"
    root.mkdir()
    (root / "model.json").write_text(json.dumps({"dimensions": 4, "count": 25}))
    (root / "dataset.yaml").write_text(
        "profiles:\n  default:\n    base: model.json\n"
    )
    m = load_dataset(str(root))
    assert m.facet(spark, "base").count() == 25


def test_virtdata_errors(spark, tmp_path):
    root = tmp_path / "vds3"
    root.mkdir()
    (root / "nodim.json").write_text(json.dumps({"count": 10}))
    (root / "nocount.json").write_text(json.dumps({"dimensions": 4}))
    (root / "dataset.yaml").write_text(
        "profiles:\n  default:\n    base: nodim.json\n    query: nocount.json\n"
    )
    m = load_dataset(str(root))
    with pytest.raises(ValueError, match="dimensions"):
        m.facet(spark, "base")
    with pytest.raises(ValueError, match="window .*or"):
        m.facet(spark, "query")
