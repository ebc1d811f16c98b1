"""Slab store, sqlite ingest, facet ops, converters, ULID."""

import sqlite3

import numpy as np
import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.functions.ulid import (
    ulid_decode,
    ulid_encode,
    ulid_timestamp_col,
    ulid_timestamp_ms,
)
from nbdatatools_spark.operators.facets import (
    align_facets,
    expand_neighbors,
    find_vectors,
    sample_facet,
    select_by_ordinals,
)
from nbdatatools_spark.sources.convert import (
    hf_embeddings_to_vectors,
    write_vectors_json,
    write_vectors_yaml,
)
from nbdatatools_spark.sources.slab import SlabStore
from nbdatatools_spark.sources.sqlite_store import read_predicate_store


# --- slab ----------------------------------------------------------------

def test_slab_roundtrip(spark, tmp_path):
    rows = [(ns, i, bytes([i % 250]) * (i % 7 + 1)) for ns in ("a", "b") for i in range(100)]
    df = spark.createDataFrame(rows, "namespace STRING, ordinal BIGINT, data BINARY")
    store = SlabStore.create(spark, str(tmp_path / "slab"), df)
    assert store.get("a", 5) == bytes([5]) * 6
    assert store.get("a", 12345) is None
    got = {r["ordinal"]: bytes(r["data"]) for r in store.get_all("b", [1, 3, 7]).collect()}
    assert set(got) == {1, 3, 7} and got[3] == bytes([3]) * 4
    assert sorted(store.namespaces()) == ["a", "b"]
    # append + rewrite keep contents
    extra = spark.createDataFrame([("a", 200, b"xyz")], "namespace STRING, ordinal BIGINT, data BINARY")
    store.append(extra)
    assert store.get("a", 200) == b"xyz"
    store.rewrite()
    assert store.count() == 201 and store.get("a", 200) == b"xyz"


def test_slab_rejects_bad_schema(spark, tmp_path):
    bad = spark.createDataFrame([(1,)], "x BIGINT")
    with pytest.raises(ValueError, match="namespace"):
        SlabStore.create(spark, str(tmp_path / "s2"), bad)


# --- sqlite --------------------------------------------------------------

def test_sqlite_predicate_store(spark, tmp_path):
    db = str(tmp_path / "preds.db")
    con = sqlite3.connect(db)
    # the backend's actual table names (SQLitePredicateWriter.java:73-76)
    con.execute("CREATE TABLE predicates (ordinal INTEGER PRIMARY KEY, data BLOB)")
    con.execute("CREATE TABLE result_indices (ordinal INTEGER PRIMARY KEY, data BLOB)")
    for i in range(20):
        con.execute("INSERT INTO predicates VALUES (?, ?)", (i, bytes([i])))
        con.execute("INSERT INTO result_indices VALUES (?, ?)", (i, bytes([i, i])))
    con.commit()
    con.close()
    tables = read_predicate_store(spark, db)
    assert set(tables) == {"predicates", "result_indices"}
    assert tables["predicates"].count() == 20
    row = tables["result_indices"].where(F.col("ordinal") == 3).collect()[0]
    assert bytes(row["data"]) == bytes([3, 3])


# --- facet ops -----------------------------------------------------------

@pytest.fixture(scope="module")
def facet_tables(spark):
    base = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)], "ordinal BIGINT, vector ARRAY<FLOAT>"
    )
    neigh = spark.createDataFrame(
        [(0, [1, 2]), (1, [0, 3])], "ordinal BIGINT, indices ARRAY<INT>"
    )
    dist = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, [0.0, 0.3])], "ordinal BIGINT, distances ARRAY<FLOAT>"
    )
    return base, neigh, dist


def test_align_facets(facet_tables):
    base, neigh, dist = facet_tables
    joined = align_facets(indices=neigh, distances=dist)
    rows = {r["ordinal"]: r for r in joined.collect()}
    assert set(rows) == {0, 1}
    assert list(rows[0]["indices_indices"]) == [1, 2]
    assert rows[1]["distances_distances"][0] == pytest.approx(0.0)


def test_expand_neighbors(facet_tables):
    base, neigh, _ = facet_tables
    out = expand_neighbors(neigh, base).orderBy("query_ordinal", "rank").collect()
    assert [(r["query_ordinal"], r["rank"], r["base_ordinal"]) for r in out] == [
        (0, 1, 1), (0, 2, 2), (1, 1, 0), (1, 2, 3),
    ]
    assert out[0]["vector"] == [1.0, 0.0]  # FK resolved to base vector


def test_select_find_sample(facet_tables):
    base, _, _ = facet_tables
    assert select_by_ordinals(base, [2, 4]).count() == 2
    assert find_vectors(base, F.col("vector")[0] > 7.0).count() == 2
    first3 = sample_facet(base, 3).collect()
    assert [r["ordinal"] for r in first3] == [0, 1, 2]
    r1 = [r["ordinal"] for r in sample_facet(base, 4, random=True, seed=9).collect()]
    r2 = [r["ordinal"] for r in sample_facet(base, 4, random=True, seed=9).collect()]
    assert r1 == r2 and len(set(r1)) == 4  # deterministic seeded sample


# --- converters ----------------------------------------------------------

def test_hf_converter_and_json_yaml_egress(spark, tmp_path):
    hf = spark.createDataFrame(
        [(i, [0.5 * i, 1.0]) for i in range(5)], "row_id BIGINT, emb ARRAY<DOUBLE>"
    )
    vecs = hf_embeddings_to_vectors(hf, ordinal_col="row_id")
    assert vecs.schema["vector"].dataType.simpleString() == "array<float>"
    jdir = str(tmp_path / "j")
    write_vectors_json(vecs, jdir)
    assert spark.read.json(jdir).count() == 5
    ypath = str(tmp_path / "v.yaml")
    write_vectors_yaml(vecs, ypath)
    import yaml

    loaded = yaml.safe_load(open(ypath))
    assert len(loaded) == 5 and loaded[2]["ordinal"] == 2


def test_hf_fetch_gated():
    from nbdatatools_spark.sources.convert import fetch_hf_dataset

    with pytest.raises(NotImplementedError, match="huggingface_hub"):
        fetch_hf_dataset("some/dataset", "/tmp/x")


# --- ulid ----------------------------------------------------------------

def test_ulid_roundtrip_and_timestamp(spark):
    raw = (1469918176385).to_bytes(6, "big") + bytes(range(10))
    text = ulid_encode(raw)
    assert len(text) == 26
    assert ulid_decode(text) == raw
    assert ulid_timestamp_ms(text) == 1469918176385
    with pytest.raises(ValueError):
        ulid_decode("!" * 26)
    with pytest.raises(ValueError):
        ulid_decode("8" + "Z" * 25)  # > 2^128

    df = spark.createDataFrame([(text,)], "u STRING")
    ts = df.select(ulid_timestamp_col(F.col("u")).alias("ts")).collect()[0]["ts"]
    assert int(ts.timestamp() * 1000) == 1469918176385


def test_ulid_timestamp_col_aliases_and_invalid(spark):
    """Column and driver decoders agree on Crockford aliases (I/L/O -> 1/1/0)
    and the Column decoder yields NULL (not a wrong value) for invalid chars
    (ADVICE r1)."""
    raw = (1469918176385).to_bytes(6, "big") + bytes(range(10))
    text = ulid_encode(raw)
    # swap 0 -> O and 1 -> I in the time prefix (alias chars)
    aliased = text[:10].replace("0", "O").replace("1", "I") + text[10:]
    assert ulid_timestamp_ms(aliased) == 1469918176385  # driver side accepts
    df = spark.createDataFrame([(aliased,), ("U" * 26,)], "u STRING")
    got = [
        r["ts"]
        for r in df.select(ulid_timestamp_col(F.col("u")).alias("ts"))
        .orderBy(F.col("ts").asc_nulls_last())
        .collect()
    ]
    assert int(got[0].timestamp() * 1000) == 1469918176385
    assert got[1] is None  # 'U' is not in the alphabet -> NULL
