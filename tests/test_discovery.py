"""TestDataSources config-chain discovery (discovery/TestDataSources.java,
docs/specs/catalog.md §2): layered catalogs.yaml -> catalog.json ->
dataset.yaml resolution through one aggregated Catalog."""

import json
import struct

import numpy as np
import pytest

from nbdatatools_spark.sources.dataset import load_dataset
from nbdatatools_spark.sources.discovery import TestDataSources


def _write_fvec(path, n, dim=4, seed=7):
    rng = np.random.default_rng(seed)
    with open(path, "wb") as f:
        for row in rng.normal(size=(n, dim)).astype("<f4"):
            f.write(struct.pack("<i", dim) + row.tobytes())


@pytest.fixture()
def config_tree(tmp_path):
    """Two-layer tree: a config dir whose catalogs.yaml points at (a) a
    catalog dir with direct + layout entries and (b) a bare dataset dir."""
    cat_dir = tmp_path / "cat1"
    cat_dir.mkdir()
    (cat_dir / "testxvec").mkdir()
    (cat_dir / "catalog.json").write_text(
        json.dumps(
            [
                {
                    "name": "sift-128",
                    "url": "sift-128/",
                    "attributes": {"distance_function": "L2", "dimensions": "128"},
                    "profiles": {"default": {"base_vectors": "base.fvec"}},
                    "tags": {"family": "sift"},
                },
                {
                    "name": "test-layout",
                    "path": "testxvec/dataset.yaml",
                    "layout": {
                        "attributes": {"distance_function": "COSINE"},
                        "profiles": {"default": {"base": "base.fvec"}},
                    },
                },
            ]
        )
    )

    ds_dir = tmp_path / "ds1"
    ds_dir.mkdir()
    _write_fvec(ds_dir / "base.fvec", 12)
    (ds_dir / "dataset.yaml").write_text(
        "name: standalone-ds\n"
        "attributes:\n  vendor: acme\n"
        "profiles:\n  default:\n    base: base.fvec\n"
    )

    config_dir = tmp_path / "config"
    config_dir.mkdir()
    # relative entries resolve against the list file's directory
    (config_dir / "catalogs.yaml").write_text("- ../cat1\n- ../ds1\n")
    return tmp_path


def test_configure_resolves_two_layers(config_tree):
    cat = TestDataSources().configure(str(config_tree / "config")).catalog()
    assert [e.name for e in cat.entries] == ["sift-128", "test-layout", "standalone-ds"]

    sift = cat.find_exact("sift-128")
    # relative url resolved against the catalog.json location
    assert sift.url.startswith(str(config_tree))
    assert sift.attributes["dimensions"] == "128"

    layout = cat.find_exact("test-layout")
    assert layout.url.endswith("testxvec/dataset.yaml")
    assert layout.attributes["distance_function"] == "COSINE"
    assert "default" in layout.profiles


def test_dataset_dir_entry_loads_as_manifest(spark, config_tree):
    cat = TestDataSources().configure(str(config_tree / "config")).catalog()
    entry = cat.match_one("standalone-ds")
    m = load_dataset(entry.url)
    assert m.name == "standalone-ds"
    assert m.facet(spark, "base", "default").count() == 12


def test_explicit_dataset_yaml_location(config_tree):
    cat = (
        TestDataSources()
        .add_catalogs(str(config_tree / "ds1" / "dataset.yaml"))
        .catalog()
    )
    assert [e.name for e in cat.entries] == ["standalone-ds"]


def test_configure_missing_dir_raises_and_optional_does_not(config_tree, tmp_path):
    with pytest.raises(FileNotFoundError):
        TestDataSources().configure(str(tmp_path / "nope"))
    src = TestDataSources().configure_optional(str(tmp_path / "nope"))
    assert src.locations == () and src.optional_locations == ()


def test_optional_bad_location_skipped_required_raises(config_tree):
    good = str(config_tree / "cat1")
    cat = (
        TestDataSources()
        .add_catalogs(good)
        .add_optional_catalogs(str(config_tree / "missing"))
        .catalog()
    )
    assert len(cat.entries) == 2
    with pytest.raises(Exception):
        TestDataSources().add_catalogs(str(config_tree / "missing")).catalog()


def test_empty_chain_raises(config_tree):
    with pytest.raises(ValueError):
        TestDataSources().catalog()


def test_source_order_wins_name_conflicts(config_tree, tmp_path):
    shadow = tmp_path / "cat2"
    shadow.mkdir()
    (shadow / "catalog.json").write_text(
        json.dumps([{"name": "sift-128", "url": "/elsewhere"}])
    )
    cat = (
        TestDataSources()
        .add_catalogs(str(config_tree / "cat1"), str(shadow))
        .catalog()
    )
    assert len([e for e in cat.entries if e.name == "sift-128"]) == 2
    # aggregation preserves source order; exact lookup takes the first
    assert cat.find_exact("sift-128").url != "/elsewhere"
