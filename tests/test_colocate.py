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
