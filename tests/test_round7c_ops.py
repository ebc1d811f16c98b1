"""Round-7 batch-3 operator closed-forms: HLL distinct, source JSD,
association rules."""

import math
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_hll_distinct_closed_form(spark):
    from nbdatatools_spark.operators.lm import hll_distinct

    # pure-python replica of the md5-uint52 HLL at p=8
    docs = spark.createDataFrame(
        [(i, f"tok{i % 97} tok{i % 53} shared") for i in range(400)],
        "doc_id long, text string",
    )
    r = hll_distinct(docs, precision=8).first()
    toks = set()
    for i in range(400):
        toks |= {f"tok{i % 97}", f"tok{i % 53}", "shared"}
    assert r["exact_distinct"] == len(toks)
    assert r["n_tokens"] == 1200
    assert r["registers"] == 256

    import hashlib

    m, rbits = 256, 44
    regs = {}
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:13], 16)
        reg, w = h % m, h >> 8
        rank = (rbits + 1) if w == 0 else rbits - w.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rank)
    zeros = m - len(regs)
    hsum = sum(2.0 ** -v for v in regs.values()) + zeros
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / hsum
    want = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) else raw
    assert r["hll_estimate"] == pytest.approx(want, abs=1e-4)
    assert r["zero_registers"] == zeros
    assert r["rel_error"] == pytest.approx(
        (r["hll_estimate"] - len(toks)) / len(toks), abs=1e-5
    )
    with pytest.raises(ValueError):
        hll_distinct(docs, precision=3)


def test_hll_estimate_tracks_cardinality(spark):
    from nbdatatools_spark.operators.lm import hll_distinct

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(25))) for i in range(400)],
        "doc_id long, text string",
    )
    r = hll_distinct(docs, precision=8).first()
    assert r["exact_distinct"] == 10000
    # HLL at p=8 has ~6.5% std error; 4 sigma bound
    assert abs(r["rel_error"]) < 0.26


def test_source_jsd_closed_form(spark):
    from nbdatatools_spark.operators.analysis import source_jsd

    # identical distributions -> JSD 0; disjoint -> JSD 1
    rows = (
        [("s1", "aa bb")] * 10
        + [("s2", "aa bb")] * 10
        + [("s3", "cc dd")] * 10
    )
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_jsd(df, vocab_size=16).collect()
    }
    assert out[("s1", "s2")]["jsd_bits"] == pytest.approx(0.0, abs=1e-6)
    assert out[("s1", "s2")]["shared_tokens"] == 2
    assert out[("s1", "s3")]["jsd_bits"] == pytest.approx(1.0, abs=1e-6)
    assert out[("s2", "s3")]["jsd_bits"] == pytest.approx(1.0, abs=1e-6)

    # half-overlapping: p = (.5,.5,0), q = (0,.5,.5) on (aa,bb,cc)
    rows = [("x", "aa bb")] * 10 + [("y", "bb cc")] * 10
    df = spark.createDataFrame(rows, "source string, text string")
    r = source_jsd(df, vocab_size=16).first()
    want = 0.5 * (0.5 + 0.5 * math.log2(2 * 0.5 / 1.0)) * 2 + 0.5 * (
        0.5 * math.log2(2 * 0.5 / 1.0)
    ) * 0  # shared term is 0 bits (p==q on bb); disjoint mass .5 each side
    assert r["jsd_bits"] == pytest.approx(0.5, abs=1e-6)
    with pytest.raises(ValueError):
        source_jsd(df, vocab_size=0)


def test_source_jsd_partition_invariant(spark, documents):
    from nbdatatools_spark.operators.analysis import source_jsd

    a = source_jsd(documents, vocab_size=64).collect()
    b = source_jsd(documents.repartition(7), vocab_size=64).collect()
    assert a == b
    for r in a:
        assert -1e-9 <= r["jsd_bits"] <= 1.0 + 1e-9


def test_association_rules_closed_form(spark):
    from nbdatatools_spark.operators.analysis import association_rules

    rows = [
        (1, "bread"), (1, "butter"), (1, "milk"),
        (2, "bread"), (2, "butter"),
        (3, "bread"), (3, "milk"),
        (4, "beer"),
        (4, "beer"),  # duplicate line collapses via distinct
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(
            df, "basket", "item", min_pair_count=2
        ).collect()
    }
    assert set(out) == {("bread", "butter"), ("bread", "milk")}
    r = out[("bread", "butter")]
    assert r["n_a"] == 3 and r["n_b"] == 2 and r["n_ab"] == 2
    assert r["support"] == pytest.approx(2 / 4, abs=1e-6)
    assert r["conf_a_to_b"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["conf_b_to_a"] == pytest.approx(1.0, abs=1e-6)
    assert r["lift"] == pytest.approx(2 * 4 / (3 * 2), abs=1e-6)
    with pytest.raises(ValueError):
        association_rules(df, "basket", "item", min_pair_count=0)
    with pytest.raises(ValueError):
        association_rules(df, "basket", "item", max_basket_items=1)


def test_association_rules_basket_cap(spark):
    from nbdatatools_spark.operators.analysis import association_rules

    # one mega-basket would dominate; the cap drops it entirely
    rows = [(99, f"item{i}") for i in range(50)] + [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = association_rules(
        df, "basket", "item", min_pair_count=2, max_basket_items=10
    ).collect()
    assert len(out) == 1
    assert out[0]["item_a"] == "a" and out[0]["item_b"] == "b"
    # n_baskets counts only capped baskets
    assert out[0]["support"] == pytest.approx(1.0, abs=1e-6)


def test_association_rules_partition_invariant(spark):
    from nbdatatools_spark.operators.analysis import association_rules

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    a = association_rules(li, "l_orderkey", "l_suppkey", min_pair_count=2)
    b = association_rules(
        li.repartition(7), "l_orderkey", "l_suppkey", min_pair_count=2
    )
    assert a.collect() == b.collect()
