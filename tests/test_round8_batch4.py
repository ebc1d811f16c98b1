"""Round-8 batch 4: Cochran's Q, Friedman, shift function, shard mixing,
and the streaming Page-Hinkley stream==batch pin."""

import math
import os

import pytest
from pyspark.sql import functions as F


def test_cochran_q_differential(spark):
    from nbdatatools_spark.operators.evaluation import cochran_q

    import random

    rnd = random.Random(23)
    table = {i: [rnd.random() < 0.3, rnd.random() < 0.5, rnd.random() < 0.7]
             for i in range(40)}
    rows = [
        (i, f"t{j}", bool(v)) for i, vs in table.items() for j, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "item long, t string, f boolean")
    r = cochran_q(df, "item", "t", "f").collect()[0]
    k = 3
    cj = [sum(table[i][j] for i in table) for j in range(k)]
    ri = [sum(table[i]) for i in table]
    tt = sum(ri)
    num = sum((c - tt / k) ** 2 for c in cj)
    den = k * tt - sum(r_ * r_ for r_ in ri)
    q = k * (k - 1) * num / den
    assert (r["n_items"], r["k_treatments"], r["dof"]) == (40, 3, 2)
    assert abs(r["q_stat"] - q) < 1e-6


def test_cochran_q_unanimous_null_and_ragged(spark):
    from nbdatatools_spark.operators.evaluation import cochran_q

    rows = [(i, f"t{j}", True) for i in range(10) for j in range(3)]
    df = spark.createDataFrame(rows, "item long, t string, f boolean")
    r = cochran_q(df, "item", "t", "f").collect()[0]
    assert r["q_stat"] is None  # kT - sum R_i^2 == 0
    rows += [(99, "t0", False)]
    df = spark.createDataFrame(rows, "item long, t string, f boolean")
    r = cochran_q(df, "item", "t", "f").collect()[0]
    assert r["n_items_dropped"] == 1 and r["n_items"] == 10


def test_friedman_classic_no_ties(spark):
    from nbdatatools_spark.operators.stats import friedman_test

    # 4 blocks x 3 treatments, distinct values per block
    data = {
        0: [1.0, 2.0, 3.0],
        1: [1.5, 2.5, 3.5],
        2: [3.0, 1.0, 2.0],
        3: [1.0, 3.0, 2.0],
    }
    rows = [(b, f"t{j}", v) for b, vs in data.items() for j, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    # classic statistic: 12/(n k (k+1)) * sum Rj^2 - 3 n (k+1)
    n, k = 4, 3
    ranks = {j: 0.0 for j in range(k)}
    for b, vs in data.items():
        order = sorted(range(k), key=lambda j: vs[j])
        for pos, j in enumerate(order):
            ranks[j] += pos + 1
    classic = 12.0 / (n * k * (k + 1)) * sum(v * v for v in ranks.values()) - 3 * n * (
        k + 1
    )
    assert (r["n_blocks"], r["k_treatments"], r["dof"]) == (4, 3, 2)
    assert abs(r["chi2"] - classic) < 1e-6


def test_friedman_all_tied_is_null(spark):
    from nbdatatools_spark.operators.stats import friedman_test

    rows = [(b, f"t{j}", 1.0) for b in range(5) for j in range(3)]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    assert friedman_test(df, "b", "t", "v").collect()[0]["chi2"] is None


def test_shift_function_pure_location_shift(spark):
    from nbdatatools_spark.operators.stats import shift_function

    import random

    rnd = random.Random(31)
    base = [rnd.gauss(0, 1) for _ in range(4000)]
    rows = [("g", "a", v) for v in base] + [("g", "b", v + 2.0) for v in base]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    out = shift_function(df, "g", "c", "v").collect()
    assert len(out) == 9
    # identical shapes shifted by +2: every decile shift is exactly 2
    for r in out:
        assert abs(r["shift"] - 2.0) < 1e-6
        assert abs(r["q_b"] - (r["q_a"] + 2.0)) < 1e-6


def test_shift_function_variance_stretch_signature(spark):
    from nbdatatools_spark.operators.stats import shift_function

    import random

    rnd = random.Random(37)
    base = sorted(rnd.gauss(0, 1) for _ in range(4000))
    rows = [("g", "a", v) for v in base] + [("g", "b", v * 3.0) for v in base]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    out = {r["p"]: r["shift"] for r in shift_function(df, "g", "c", "v").collect()}
    # pure scale change: negative shift in the left tail, positive right
    assert out[0.1] < -0.5 and out[0.9] > 0.5
    assert abs(out[0.5]) < 0.2


def test_shard_mixing_report(spark, documents):
    from nbdatatools_spark.operators.packing import shard_mixing_report

    out = shard_mixing_report(
        documents, n_shards=8, weight_col="n_chars", group_col="source"
    ).collect()
    assert len(out) == 8
    assert sum(r["n_rows"] for r in out) == documents.count()
    for r in out:
        assert r["entropy"] >= 0.0
        assert 0.0 <= r["mixing_ratio"] <= 1.05  # serpentine mixes well


def test_shard_mixing_single_source(spark):
    from nbdatatools_spark.operators.packing import shard_mixing_report

    df = spark.createDataFrame(
        [(i, "only", (i % 7) + 1) for i in range(40)],
        "doc_id long, source string, n_chars int",
    )
    out = shard_mixing_report(df, 4, "n_chars").collect()
    for r in out:
        assert r["entropy"] == 0.0
        assert r["mixing_ratio"] is None  # corpus entropy is 0


def test_stream_page_hinkley_equals_batch(spark, tmp_path):
    from nbdatatools_spark.operators.temporal import page_hinkley
    from nbdatatools_spark.streaming.stateful import running_page_hinkley

    sf = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    batch = page_hinkley(ev, ts_col="ts", delta=0.5, lambda_=10.0).orderBy(
        "day"
    ).collect()
    daily = [
        (str(r["day"]), i, float(r["n_events"])) for i, r in enumerate(batch)
    ]
    src = str(tmp_path / "ph_src")
    os.makedirs(src)
    n = len(daily)
    schema = "ts string, event_id long, value double"
    for i in range(3):
        lo, hi = i * n // 3, (i + 1) * n // 3
        spark.createDataFrame(daily[lo:hi], schema).coalesce(1).write.parquet(
            os.path.join(src, f"slice={i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/slice=*")
        .withColumn("event_type", F.lit("all"))
    )
    out = running_page_hinkley(
        stream, key_col="event_type", value_col="value",
        order_cols=("ts", "event_id"), delta=0.5, lambda_=10.0,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ph_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ph_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from ph_state order by n desc limit 1"
    ).collect()
    final = rows[0]
    last = batch[-1]
    assert final["n"] == len(batch)
    assert abs(final["m_t"] - last["m_t"]) < 1e-6
    assert abs(final["ph"] - last["ph"]) < 1e-6
    assert final["is_alarm"] == last["is_alarm"]
