"""Bucketed co-located join: the write-once/join-free layout must actually
elide both exchanges (and produce the same rows as the plain join)."""

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.colocate import (
    bucketed_join,
    join_shuffle_count,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "t_orders_b", ["custkey"], 8, path=str(root / "orders"),
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "t_customer_b", ["custkey"], 8, path=str(root / "customer"),
    )
    yield "t_orders_b", "t_customer_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the test exercises the SMJ path a big-big join takes
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, lt, rt, ["custkey"])
        assert join_shuffle_count(joined) == 0, "bucketed join still shuffles"
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, ["custkey"]).groupBy().agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plain = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
    )
    assert joined.collect() == plain.collect()


def test_unbucketed_same_join_does_shuffle(spark, sf_dir):
    """Control: the identical join without bucketing costs two exchanges."""
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
        assert join_shuffle_count(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


# --- Z-order layout ---------------------------------------------------------

def test_zorder_value_matches_python_morton(spark):
    from nbdatatools_spark.operators.colocate import zorder_value

    bits = 8
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 2, 100, 255) for b in (0, 3, 200, 255)],
        "a long, b long",
    )
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn(
            "z", zorder_value(["a", "b"], [(0, 255), (0, 255)], bits)
        ).collect()
    }

    def morton(a, b):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b), (a, b)


def test_zorder_layout_bounds_both_dims(spark, tmp_path):
    """Per-file spans: a z-ordered layout bounds BOTH columns' min/max
    ranges (so row-group stats skip on either filter); a single-column
    sort bounds only its own."""
    import random

    from pyspark.sql import functions as F

    from nbdatatools_spark.operators.colocate import write_zordered

    rng = random.Random(11)
    data = [(rng.randrange(10_000), rng.randrange(10_000)) for _ in range(20_000)]
    df = spark.createDataFrame(data, "x long, y long")

    zpath = str(tmp_path / "zord")
    write_zordered(df, zpath, ["x", "y"], bits=12, num_files=16)
    spath = str(tmp_path / "xsort")
    df.repartitionByRange(16, F.col("x")).sortWithinPartitions("x").write.parquet(spath)

    def file_spans(path, col):
        out = (
            spark.read.parquet(path)
            .withColumn("__f", F.input_file_name())
            .groupBy("__f")
            .agg((F.max(col) - F.min(col)).alias("span"))
            .agg(F.avg("span"))
            .first()[0]
        )
        return out / 10_000.0  # normalize by domain

    # single-column sort: x tightly bounded, y unbounded (~full domain)
    assert file_spans(spath, "x") < 0.15
    assert file_spans(spath, "y") > 0.8
    # z-order: BOTH dims bounded well below the full domain
    assert file_spans(zpath, "x") < 0.5
    assert file_spans(zpath, "y") < 0.5


def test_zorder_validation(spark):
    import pytest as _pytest

    from nbdatatools_spark.operators.colocate import zorder_value

    with _pytest.raises(ValueError):
        zorder_value(["a"], [(0, 1)])
    with _pytest.raises(ValueError):
        zorder_value(["a", "b", "c"], [(0, 1)] * 3, bits=21)


def test_layout_report_reflects_sorted_compaction(spark, tmp_path):
    """layout_report reads footer stats distributed; after a sorted
    compaction the per-file key spans are near-disjoint, and the report
    shows it without touching data pages."""
    from nbdatatools_spark.operators.colocate import compact_parquet, layout_report

    src = str(tmp_path / "raw")
    spark.range(0, 200_000).withColumn("k", (F.col("id") * 7919) % 1000).withColumn(
        "pad", F.md5(F.col("id").cast("string"))
    ).repartition(16).write.parquet(src)
    dst = str(tmp_path / "sorted")
    n_files = compact_parquet(spark, src, dst, target_mb=1, sort_cols=["k"])

    rep = layout_report(spark, dst, cols=["k"]).collect()
    assert {r.column for r in rep} == {"k"}
    assert sum(r.n_rows for r in rep) == 200_000
    by_file = {}
    for r in rep:
        lo, hi = int(r.min), int(r.max)
        cur = by_file.get(r.file)
        by_file[r.file] = (
            (lo, hi) if cur is None else (min(cur[0], lo), max(cur[1], hi))
        )
    assert len(by_file) == n_files
    spans = sorted(by_file.values())
    # consecutive files overlap at most at the boundary key (range
    # partitioning): total span ~ domain, not n_files * domain
    total = sum(hi - lo for lo, hi in spans)
    assert total <= 1000 * 1.2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        layout_report(spark, str(tmp_path / "missing"))
