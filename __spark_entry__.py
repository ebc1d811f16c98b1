"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (or a §7.8
training-data extension) implemented Spark-first via nbdatatools_spark;
``oracle_sql()`` carries the DuckDB-equivalent ANSI SQL. Column names and
types are aligned on both sides; aggregates over doubles are either computed
in DECIMAL (exact, engine-independent) or rounded well below the noise floor.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbdatatools_spark.functions.distance import l2_norm
from nbdatatools_spark.functions.text import (
    STOPWORDS,
    doc_fingerprint,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from nbdatatools_spark.operators.analysis import describe, dim_moments, ks_statistic_normal
from nbdatatools_spark.operators.dedup import (
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_candidates,
    simhash_near_dups,
)
from nbdatatools_spark.operators.knn import knn_pairs, exact_knn, knn_recall
from nbdatatools_spark.operators.shuffle import seeded_shuffle
from nbdatatools_spark.operators.similarity import brute_force_topk, lsh_topk
from nbdatatools_spark.operators.windows import rebase_ordinals, window_slice
from nbdatatools_spark.predicates import compile_pnode, parse_pnode
from nbdatatools_spark.predicates.compiler import where_pnode
from nbdatatools_spark.streaming.events import (
    sessionize,
    sliding_window_agg,
    tumbling_window_agg,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
        # rejects; read nanos as long and truncate to micros (identical to
        # DuckDB's ns->us truncation, so oracle timestamps match exactly).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def _ts(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """_t plus the scan-parallelism guard (session.spread_small_input):
    for gates whose FIRST stage is a heavy map-side text kernel (regex
    quality stacks, line reshaping) — an under-split scan single-threads
    that kernel (optimization round 10, guide §2.5). No-op when the scan
    already has >= defaultParallelism splits, i.e. on production
    layouts. Used only where the win was measured; an exchange on every
    light gate costs more than it buys (see spread_small_input)."""
    from nbdatatools_spark.session import spread_small_input

    return spread_small_input(_t(spark, sf_dir, name))


def _dec2(col):
    """Exact 2-decimal money cast applied BEFORE arithmetic, so downstream
    products/sums are exact decimal math — engine-independent to the bit."""
    return F.col(col).cast("decimal(18,2)") if isinstance(col, str) else col.cast("decimal(18,2)")


def _dbl(col):
    """Final-output cast DECIMAL -> DOUBLE. The decimal value is exact, and
    decimal->double is deterministic IEEE round-to-nearest in both Spark and
    DuckDB, so the hashed value is engine-independent. Decimal columns are
    never emitted from gate queries: a Decimal('255.00') canonicalizes with
    trailing zeros in one engine and as the float 255.0 in the other, which
    is exactly the round-1 hash-mismatch mechanism (VERDICT.md, What's wrong
    #1 — all 7 non-KNN hash-fail queries emitted DECIMAL columns)."""
    return col.cast("double")


# ---------------------------------------------------------------------------
# Relational core (scans, filters, joins, aggregations — S5, P2+, J*, A*)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped scan+agg over lineitem. Sums in DECIMAL (exact)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "2001-09-02")
    # avg columns: exact decimal sum, then ONE double division — deterministic
    # regardless of partitioning (unlike avg(double), whose summation order
    # varies with the shuffle plan).
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dbl(F.sum(_dec2("l_quantity"))).alias("sum_qty"),
            _dbl(F.sum(_dec2("l_extendedprice"))).alias("sum_base_price"),
            _dbl(F.sum(_dec2("l_extendedprice") * (1 - _dec2("l_discount")))).alias(
                "sum_disc_price"
            ),
            _dbl(
                F.sum(
                    _dec2("l_extendedprice") * (1 - _dec2("l_discount")) * (1 + _dec2("l_tax"))
                )
            ).alias("sum_charge"),
            (_dbl(F.sum(_dec2("l_quantity"))) / F.count("*")).alias("avg_qty"),
            (_dbl(F.sum(_dec2("l_extendedprice"))) / F.count("*")).alias("avg_price"),
            (_dbl(F.sum(_dec2("l_discount"))) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark, sf_dir):
    """customer ⋈ orders ⋈ lineitem, revenue top-10 (broadcast dims)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dbl(F.sum(_dec2("l_extendedprice") * (1 - _dec2("l_discount")))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_region_revenue(spark, sf_dir):
    """region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem star join — all dims
    broadcast; single shuffle on the groupBy keys."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _dbl(F.sum(_dec2("l_extendedprice") * (1 - _dec2("l_discount")))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returned items per customer —
    lineitem(R) ⋈ broadcast(orders window) ⋈ broadcast(customer ⋈ nation);
    one shuffle on the groupBy key."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _dbl(F.sum(_dec2("l_extendedprice") * (1 - _dec2("l_discount")))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — conditional DECIMAL aggregate
    over lineitem ⋈ broadcast(part)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    )
    disc = _dec2("l_extendedprice") * (1 - _dec2("l_discount"))
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(
            (
                F.sum(
                    F.when(F.col("p_type") == "PROMO", disc).otherwise(
                        F.lit(0).cast("decimal(12,4)")
                    )
                ).cast("double")
                * 100.0
                / F.sum(disc).cast("double")
            ),
            6,
        ).alias("promo_revenue_pct")
    )


def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: customers with orders above a quantity threshold —
    groupBy-HAVING on lineitem, semi-joined back then re-aggregated."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec2("l_quantity")).alias("__qty"))
        .where(F.col("__qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            _dbl(_dec2("o_totalprice")).alias("o_totalprice"),
            _dbl(F.col("__qty")).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


def agg_priority_count(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderdate") >= "1997-01-01")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Predicate system (P2-P8): PNode JSON -> Column, same tree -> oracle SQL
# ---------------------------------------------------------------------------

PNODE_RANGE = '{"op":"AND","nodes":[{"fieldName":"o_totalprice","op":"GT","values":[50000.0]},{"fieldName":"o_totalprice","op":"LT","values":[60000.0]}]}'
PNODE_IN = '{"fieldName":"c_mktsegment","op":"IN","values":["BUILDING","MACHINERY"]}'
PNODE_REGEX = '{"fieldName":"p_type","op":"MATCHES","values":["(ECO|PRO).*"]}'
PNODE_NESTED = (
    '{"op":"AND","nodes":['
    '{"op":"OR","nodes":[{"fieldName":"l_quantity","op":"GE","values":[45.0]},'
    '{"fieldName":"l_discount","op":"GE","values":[0.09]}]},'
    '{"fieldName":"l_returnflag","op":"NE","values":["A"]}]}'
)
PNODE_NULL_EQ = '{"fieldName":"maybe_type","op":"EQ","values":[null]}'


def pnode_range_filter(spark, sf_dir):
    pred = compile_pnode(parse_pnode(PNODE_RANGE), two_valued=False)
    return (
        _t(spark, sf_dir, "orders")
        .where(pred)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


def pnode_in_filter(spark, sf_dir):
    pred = compile_pnode(parse_pnode(PNODE_IN), two_valued=False)
    return (
        _t(spark, sf_dir, "customer")
        .where(pred)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .orderBy("c_mktsegment")
    )


def pnode_regex_filter(spark, sf_dir):
    pred = compile_pnode(parse_pnode(PNODE_REGEX), two_valued=False)
    return (
        _t(spark, sf_dir, "part")
        .where(pred)
        .groupBy("p_type")
        .agg(F.count("*").alias("n"))
        .orderBy("p_type")
    )


def pnode_nested_andor(spark, sf_dir):
    pred = compile_pnode(parse_pnode(PNODE_NESTED), two_valued=False)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(pred)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), _dbl(F.sum(_dec2("l_quantity"))).alias("sum_qty"))
        .orderBy("l_returnflag")
    )


def pnode_null_eq(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "maybe_type", F.expr("nullif(event_type, 'error')")
    )
    pred = compile_pnode(parse_pnode(PNODE_NULL_EQ), two_valued=False)
    return ev.where(pred).select("event_id").orderBy("event_id")


def predicate_store_roundtrip(spark, sf_dir):
    """S9 + metadata codec end-to-end (VERDICT r1 missing #1/#2): encode
    events metadata through the reference's record codec into a SQLite
    predicate store (reference DDL + blob wire formats), read it back through
    the typed facet views, compile the STORED predicate blob, and evaluate it
    against the DECODED metadata_content. The oracle computes the same
    ordinals straight from the parquet — any codec/view divergence breaks the
    hash."""
    import sqlite3
    import tempfile

    from nbdatatools_spark.predicates.wire import encode_pnode
    from nbdatatools_spark.sources.metadata_codec import (
        FieldDescriptor,
        FieldType,
        MetadataLayout,
        encode_record,
    )
    from nbdatatools_spark.sources.sqlite_store import read_predicate_store_typed

    layout = MetadataLayout(
        (
            FieldDescriptor("user_id", FieldType.INT),
            FieldDescriptor("event_type", FieldType.TEXT),
            FieldDescriptor("value", FieldType.FLOAT),
        )
    )
    rows = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_id") < 2000)
        .select("event_id", "user_id", "event_type", "value")
        .collect()
    )
    node = parse_pnode(
        '{"op":"AND","nodes":[{"fieldName":"user_id","op":"LE","values":[200]},'
        '{"fieldName":"event_type","op":"IN","values":["click","purchase"]}]}'
    )
    db = os.path.join(tempfile.gettempdir(), f"predstore_{abs(hash(sf_dir))}.db")
    con = sqlite3.connect(db)
    try:
        for t in ("predicates", "result_indices", "metadata_layout", "metadata_content"):
            con.execute(f"DROP TABLE IF EXISTS {t}")
        con.execute("CREATE TABLE predicates (ordinal INTEGER PRIMARY KEY, data BLOB)")
        con.execute("CREATE TABLE metadata_layout (id INTEGER PRIMARY KEY, data BLOB)")
        con.execute("CREATE TABLE metadata_content (ordinal INTEGER PRIMARY KEY, data BLOB)")
        con.execute("INSERT INTO metadata_layout (id, data) VALUES (0, ?)", (layout.encode(),))
        con.executemany(
            "INSERT INTO metadata_content (ordinal, data) VALUES (?, ?)",
            [
                (
                    r["event_id"],
                    encode_record(
                        layout,
                        {
                            "user_id": r["user_id"],
                            "event_type": r["event_type"],
                            "value": r["value"],
                        },
                    ),
                )
                for r in rows
            ],
        )
        con.execute(
            "INSERT INTO predicates (ordinal, data) VALUES (0, ?)",
            (encode_pnode(node, fmt="typed"),),
        )
        con.commit()
    finally:
        con.close()

    store = read_predicate_store_typed(spark, db)
    stored_json = store["predicates"].where(F.col("ordinal") == 0).collect()[0]["pnode_json"]
    pred = compile_pnode(parse_pnode(stored_json), two_valued=False)
    return (
        store["metadata_content"].where(pred).select("ordinal").orderBy("ordinal")
    )


def result_indices_hybrid(spark, sf_dir):
    """P8: matching-ordinal facet for a predicate over metadata-like columns
    (hybrid-query ground-truth shape, ordinal_predicate_writers_v1.md:24-33)."""
    pred = compile_pnode(
        parse_pnode(
            '{"op":"AND","nodes":[{"fieldName":"user_id","op":"LE","values":[200]},'
            '{"fieldName":"event_type","op":"IN","values":["click","purchase"]}]}'
        ),
        two_valued=False,
    )
    ev = _t(spark, sf_dir, "events")
    return ev.where(pred).select(F.col("event_id").alias("ordinal")).orderBy("ordinal")


# ---------------------------------------------------------------------------
# Windows / slices / top-k / permutation (P1, W1, W2, O2, U4)
# ---------------------------------------------------------------------------

def window_slice_rebase(spark, sf_dir):
    """Multi-interval ordinal window + logical re-basing (P1+W2)."""
    ev = _t(spark, sf_dir, "events")
    sliced = window_slice(ev, ["100..200", "500..600"], ordinal="event_id")
    return rebase_ordinals(sliced, ordinal="event_id", out="logical_ordinal").select(
        "logical_ordinal", "event_id", "event_type"
    )


def topk_orders_per_customer(spark, sf_dir):
    """Grouped top-k (W1 pattern on relational data)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .where(F.col("o_custkey") <= 100)
        .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
    )


def shuffled_events(spark, sf_dir):
    """U4 seeded deterministic permutation (portable md5 sort key)."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    return seeded_shuffle(ev, seed=42, ordinal="event_id").select(
        "event_id", "new_ordinal"
    )


def union_concat(spark, sf_dir):
    """U1 concatenation with provenance column."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "purchase").withColumn("src", F.lit("p"))
    b = ev.where(F.col("event_type") == "error").withColumn("src", F.lit("e"))
    return a.unionByName(b).select("src", "event_id", "user_id").orderBy("event_id")


# ---------------------------------------------------------------------------
# Vector facet ops (A1-A4, P9, F1-F4, J2) over embeddings
# ---------------------------------------------------------------------------

def describe_embeddings(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("ordinal"), F.col("embedding").alias("vector")
    )
    return describe(emb)


def zero_vector_count(spark, sf_dir):
    from nbdatatools_spark.operators.analysis import count_zero_vectors

    emb = _t(spark, sf_dir, "embeddings").select(F.col("embedding").alias("vector"))
    return count_zero_vectors(emb)


def dim_moments_embeddings(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(F.col("embedding").alias("vector"))
    m = dim_moments(emb)
    return m.select(
        "dim",
        "n",
        F.round("mean", 6).alias("mean"),
        F.round("variance", 6).alias("variance"),
        F.round("skewness", 6).alias("skewness"),
        F.round("min", 6).alias("min"),
        F.round("max", 6).alias("max"),
    ).orderBy("dim")


def vector_norms(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    return emb.select(
        "vec_id", F.round(l2_norm(F.col("embedding")), 6).alias("l2_norm")
    ).orderBy("vec_id")


def knn_cosine_topk(spark, sf_dir):
    """J2 exact KNN, cosine. Gate uses impl="expr" — sequential fold matching
    DuckDB's list_inner_product evaluation order bit-for-bit (the GEMM/BLAS
    kernel is the bench/scale path; its float-summation order differs in the
    last bits, ADVICE.md r1). `+ 0.0` collapses the self-match -0.0/0.0
    representation split (IEEE: -0.0 + 0.0 == +0.0)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    pairs = brute_force_topk(q, emb, k=10, metric="cosine", impl="expr")
    return pairs.select(
        "query_id", "rank", "base_id", (F.round("distance", 6) + 0.0).alias("distance")
    )


def knn_euclidean_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    pairs = brute_force_topk(q, emb, k=5, metric="euclidean", impl="expr")
    return pairs.select(
        "query_id", "rank", "base_id", F.round("distance", 6).alias("distance")
    )


# ---------------------------------------------------------------------------
# Text / documents (extensions: dedup, quality, tokens, fingerprints)
# ---------------------------------------------------------------------------

def doc_exact_dedup(spark, sf_dir):
    """Exact dedup survivors. groupBy(min) instead of a ranking window: a
    hash aggregate with map-side partial beats shuffle+sort when only the
    survivor id is needed (the row-preserving form lives in
    operators.dedup.exact_dedup)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(doc_fingerprint(F.col("text")).alias("fingerprint"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")
    )


def doc_dup_fingerprints(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(doc_fingerprint(F.col("text")).alias("fingerprint"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("survivor_id"))
        .where(F.col("n") > 1)
        .orderBy("fingerprint")
    )


def doc_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
    ).orderBy("doc_id")


def doc_subword_tokens(spark, sf_dir):
    """BPE-ish pre-token counts (GPT-2 pre-split regex, JVM-side)."""
    from nbdatatools_spark.functions.text import subword_token_count

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return docs.select(
        "doc_id", subword_token_count(F.col("text")).alias("n_subword_tokens")
    ).orderBy("doc_id")


def doc_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken), portable md5
    k-gram hashes so DuckDB replicates the selection exactly. Output is the
    fingerprint-set cardinality AND its minimum — a strong algorithmic
    signature (any selection divergence moves one of them)."""
    from nbdatatools_spark.functions.text import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200).select("doc_id", "text")
    fp = winnow_fingerprints(docs, portable=True)
    return fp.select(
        "doc_id",
        F.size("fingerprints").alias("n_fingerprints"),
        F.array_min("fingerprints").alias("min_fingerprint"),
    ).orderBy("doc_id")


def doc_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return docs.select(
        "doc_id", F.round(quality_score(F.col("text")), 6).alias("quality")
    ).orderBy("doc_id")


def doc_lang_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Events: windowed/sessionized aggregations (streaming semantics as batch)
# ---------------------------------------------------------------------------

def events_tumbling_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = tumbling_window_agg(ev, "1 hour", keys=["event_type"])
    return out.select(
        "window_start",
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    ).orderBy("window_start", "event_type")


def events_sliding_windows(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = sliding_window_agg(ev, "1 hour", "30 minutes")
    return out.select(
        "window_start", "n_events", F.round("sum_value", 4).alias("sum_value")
    ).orderBy("window_start")


def events_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") <= 50)
    out = sessionize(ev, gap="30 minutes")
    return out.select(
        "user_id",
        F.col("session_id").cast("bigint").alias("session_id"),
        "session_start",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    ).orderBy("user_id", "session_id")


def events_user_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy("user_id")
    )


def events_json_extract(spark, sf_dir):
    """F8-adjacent: JSON field extraction from the props payload."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    ).orderBy("event_id")




# ---------------------------------------------------------------------------
# Round-1 widening: pushdown showcase, anti-join, rollups, frames, hybrid KNN
# ---------------------------------------------------------------------------

def q6_revenue_delta(spark, sf_dir):
    """TPC-H Q6-shaped: pure filter+agg — every predicate reaches the scan."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _dbl(F.sum(_dec2("l_extendedprice") * _dec2("l_discount"))).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def monthly_revenue_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            _dbl(F.sum(_dec2("o_totalprice"))).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("month")
    )


def customers_without_orders(spark, sf_dir):
    """Anti-join (complement of P8's match set — SURVEY §2.3)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def knn_dot_topk(spark, sf_dir):
    """J2 with the dot-product metric (DistanceFunction.java:26)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    pairs = brute_force_topk(q, emb, k=5, metric="dot_product", impl="expr")
    return pairs.select(
        "query_id", "rank", "base_id", F.round("distance", 6).alias("distance")
    )


def hybrid_filtered_knn(spark, sf_dir):
    """Hybrid ground truth: predicate i (label == i % 3) ∧ top-5 cosine
    (ordinal_predicate_writers_v1.md:24-33)."""
    from nbdatatools_spark.operators.hybrid import hybrid_ground_truth

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("ordinal"), F.col("embedding").alias("vector")
    )
    meta = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("ordinal"), "label"
    )
    q = emb.where(F.col("ordinal") < 10)
    preds = [
        (i, '{"fieldName":"label","op":"EQ","values":[%d]}' % (i % 3)) for i in range(10)
    ]
    nn = hybrid_ground_truth(q, emb, meta, preds, k=5, metric="cosine")
    return nn.select(
        F.col("ordinal").alias("query_id"),
        F.posexplode(F.arrays_zip("indices", "distances")).alias("pos", "pair"),
    ).select(
        "query_id",
        (F.col("pos") + 1).alias("rank"),
        F.col("pair.indices").alias("base_id"),
        F.round("pair.distances", 6).alias("distance"),
    )


def events_cume_dist(spark, sf_dir):
    """W3 empirical-CDF primitive over event values."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_type",
        "event_id",
        F.round(F.cume_dist().over(w), 6).alias("cdf"),
    ).orderBy("event_type", "event_id")


def clean_embeddings(spark, sf_dir):
    """U3 cleanfvec on the embeddings table (drop zeros + exact-dup vectors,
    lowest-id survivor)."""
    from nbdatatools_spark.operators.dedup import clean_vectors

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("ordinal"), F.col("embedding").alias("vector")
    )
    return clean_vectors(emb).select(F.col("ordinal").alias("vec_id")).orderBy("vec_id")


def events_time_parts(spark, sf_dir):
    """Scalar date/time extraction functions."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 3000)
    return ev.select(
        "event_id",
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hh"),
        F.dayofmonth("ts").alias("dom"),
    ).orderBy("event_id")


def part_price_histogram(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy(F.floor(F.col("p_retailprice") / 100).cast("bigint").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


def supplier_balance_rank(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    return s.select(
        "s_suppkey", "s_name", F.row_number().over(w).alias("bal_rank")
    ).orderBy("bal_rank")


def orders_running_total(spark, sf_dir):
    """Window frame (rows unbounded preceding) running revenue per customer."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        _dbl(F.sum(_dec2("o_totalprice")).over(w)).alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# Rows-only entries (approximate / non-SQL-expressible — driver records a
# weaker check; correctness covered by pytest oracles instead)
# ---------------------------------------------------------------------------

def ann_lsh_topk(spark, sf_dir):
    """Approximate cosine top-k via random-hyperplane LSH buckets. The
    hyperplanes are seeded and inlined as literals, so the ENTIRE algorithm
    (signatures, bucket join, ranking) is replicated in generated DuckDB SQL
    — promoted from rows-only (VERDICT next-round #3)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    out = lsh_topk(q, emb, k=10, dim=64, n_bits=8)
    return out.select(
        "query_id", "rank", "base_id", (F.round("distance", 6) + 0.0).alias("distance")
    ).orderBy("query_id", "rank")


def minhash_candidate_pairs(spark, sf_dir):
    """MinHash banded-LSH candidates, portable md5 path so the exact banding
    algorithm (KM double hashing, 8 bands of 4) is replicated in DuckDB and
    hash-gated (was rows-only in r1; VERDICT next-round #3)."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        docs, num_hashes=32, bands=8, shingle_size=5, impl="md5"
    ).orderBy("id_a", "id_b")


def events_asof_join(spark, sf_dir):
    """Backward-inclusive as-of join (operators/temporal.py::asof_join):
    each purchase event gains the latest at-or-before view event of the
    same user — the union-tag + keyed-window shape (ONE shuffle on
    user_id, no range-condition nested-loop). Oracle replays it as a
    rank-1 range join in DuckDB (exact integer micros lag; matched value
    copied verbatim, no float arithmetic)."""
    from nbdatatools_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    views = ev.where(F.col("event_type") == "view")
    j = asof_join(
        purchases, views, on="ts", by="user_id", tie="event_id",
        values=("event_id", "value"),
    )
    return j.select(
        "event_id",
        "user_id",
        "matched_event_id",
        "matched_value",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("matched_ts").cast("timestamp"))
        ).alias("lag_us"),
    ).orderBy("event_id")


def doc_c4_filters(spark, sf_dir):
    """C4 heuristic cleaning (Raffel et al. 2020, arXiv:1910.10683 §2.2;
    functions/text.py::c4_*): line retention (terminal punctuation, >=3
    words, no javascript boilerplate) + page retention (no lorem ipsum, no
    code braces, >=3 sentence terminators) — pure Catalyst predicates,
    map-side only.

    The synthetic corpus has no punctuation or newlines, so the raw rules
    are vacuous on it; the query first RESHAPES each doc deterministically
    (7-word lines; every 3rd line unpunctuated; lines 5 and 16 prefixed
    'javascript '; doc_id%17==3 injects a lorem-ipsum line, doc_id%19==7 a
    brace line) so every rule actually fires, and the DuckDB oracle
    replays both the reshaping and the rules with list ops."""
    from nbdatatools_spark.functions.text import (
        c4_clean_lines,
        c4_keep_line,
        c4_page_keep,
    )

    docs = _ts(spark, sf_dir, "documents")  # heavy line-reshape kernel (r10)
    w = F.split(F.trim(F.col("text")), r"\s+")
    nl = F.greatest(F.ceil(F.size(w) / F.lit(7)).cast("int"), F.lit(1))
    body = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.concat(
            F.when(i % 11 == 5, F.lit("javascript ")).otherwise(F.lit("")),
            F.concat_ws(" ", F.slice(w, i * 7 + 1, 7)),
            F.when(i % 3 == 0, F.lit("")).otherwise(F.lit(".")),
        ),
    )
    pre_lorem = F.when(
        F.col("doc_id") % 17 == 3, F.array(F.lit("lorem ipsum dolor."))
    ).otherwise(F.array().cast("array<string>"))
    pre_brace = F.when(
        F.col("doc_id") % 19 == 7, F.array(F.lit("code { sample."))
    ).otherwise(F.array().cast("array<string>"))
    shaped = docs.select(
        "doc_id",
        F.concat_ws("\n", F.concat(pre_lorem, pre_brace, body)).alias("__text"),
    )
    cleaned = c4_clean_lines(F.col("__text"))
    return shaped.select(
        "doc_id",
        # lambda wrapper is REQUIRED: F.filter would call the bare
        # two-parameter function as (element, index) — see c4_keep_line
        F.size(
            F.filter(F.split("__text", "\n"), lambda l: c4_keep_line(l))
        ).alias("n_lines_kept"),
        F.length(cleaned).alias("n_chars_clean"),
        c4_page_keep(cleaned).cast("int").alias("page_keep"),
    ).orderBy("doc_id")


def doc_minhash_dedup_transitive(spark, sf_dir):
    """End-to-end transitive MinHash dedup (dedup.py::minhash_dedup
    transitive=True): banded LSH candidates -> exact Jaccard verify ->
    connected components (min-label propagation, dedup.py::
    connected_components) -> single survivor (min id) per near-dup
    cluster. Oracle replays the whole chain in DuckDB with a RECURSIVE
    reachability CTE, so the closure itself is hash-gated."""
    from nbdatatools_spark.operators.dedup import minhash_dedup

    docs = _t(spark, sf_dir, "documents")
    out = minhash_dedup(
        docs,
        num_hashes=32,
        bands=8,
        shingle_size=5,
        threshold=0.5,
        transitive=True,
        impl="md5",
    )
    return out.select("doc_id").orderBy("doc_id")


def simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs, portable 60-bit md5 simhash. The oracle is
    BRUTE-FORCE hamming<=8 over all pairs — pigeonhole blocking (9 chunks)
    must reproduce it exactly, so the gate also proves blocking recall=1."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return simhash_near_dups(docs, max_hamming=8, shingle_size=4, impl="md5").orderBy(
        "id_a", "id_b"
    )


def embedding_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup, exact method on a subset (the LSH-blocked
    scale path is exercised in tests; exact here so DuckDB can oracle it)."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    pairs = embedding_near_dups(emb, threshold=0.3, method="exact")
    return pairs.select(
        "id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim")
    ).orderBy("id_a", "id_b")


def _semdedup_centroids(k: int = 8, dim: int = 64, seed: int = 1234) -> list[list[float]]:
    """Seeded Gaussian centroids shared bit-for-bit between the Spark
    queries and their DuckDB oracles (the ann_lsh_topk hyperplane
    convention): generated driver-side, inlined as literals on both sides."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [[float(x) for x in row] for row in rng.normal(size=(k, dim))]


def _emb_with_injected_dups(spark, sf_dir, n_dups: int = 25, id_shift: int = 10_000):
    """embeddings plus exact duplicates of vec_id < n_dups under shifted ids
    — the cleanfvec-style dup injection (datagen/TestDataFiles.java:71-98),
    done in-query so the dedup operators have real work at every SF."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dups = (
        emb.where(F.col("vec_id") < n_dups)
        .withColumn("vec_id", F.col("vec_id") + id_shift)
    )
    return emb.unionByName(dups)


def embedding_cluster_assign(spark, sf_dir):
    """Shuffle-free nearest-centroid assignment
    (clustering.centroid_assign): the k x d centroid table is inlined as a
    literal struct array and the per-row argmin is a single projection — the
    SemDeDup / IVF assignment shape (no crossJoin, no Window shuffle)."""
    from nbdatatools_spark.operators.clustering import centroid_assign

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = centroid_assign(
        emb, _semdedup_centroids(), metric="cosine", vec_col="embedding", dist_col="cdist"
    )
    return out.select(
        "vec_id", "centroid_id", (F.round("cdist", 6) + 0.0).alias("cdist")
    ).orderBy("vec_id")


def embedding_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) with pinned seeded
    centroids and tau=0.95. At dim 64 a random-pair cosine is ~N(0, 1/64)
    (and the measured non-identical max in this corpus is ~0.51), so only
    the injected duplicate cliques exceed tau; the greedy within-cluster
    survivor is then exactly the visit-order minimum ((centroid_sim ASC,
    vec_id ASC)) of each clique, which the DuckDB oracle replicates with a
    NOT EXISTS over the >= tau pair set. Chains (a~b~c, a!~c) cannot occur
    at this margin, so greedy == clique-minimum is exact, not approximate."""
    from nbdatatools_spark.operators.clustering import semantic_dedup

    emb = _emb_with_injected_dups(spark, sf_dir)
    out = semantic_dedup(
        emb,
        threshold=0.95,
        id_col="vec_id",
        vec_col="embedding",
        centroids=_semdedup_centroids(),
    )
    return out.select("vec_id", "centroid_id").orderBy("vec_id")


def ks_normal_embeddings(spark, sf_dir):
    """A4 K-S goodness-of-fit vs per-dim fitted normal. Oracle-able: the
    A-S 7.1.26 erf closed form is replicated verbatim in DuckDB SQL; round(4)
    sits far above engine libm last-ulp noise yet far below the 0.03
    decision threshold."""
    emb = _t(spark, sf_dir, "embeddings").select(F.col("embedding").alias("vector"))
    return ks_statistic_normal(emb).select(
        "dim", (F.round("ks_stat", 4) + 0.0).alias("ks_stat")
    ).orderBy("dim")


def fit_embeddings_model(spark, sf_dir):
    """Full A4 model-extraction pipeline: 7 parametric candidates +
    composite/multimodal + empirical fallback, K-S selected.

    Pinned-invariant oracle gate (the events_approx_distinct pattern —
    VERDICT r4 'What's wrong' #3/#4): the EM/special-function selection
    is not SQL-expressible, so the gate hashes a derived-claim table the
    oracle CAN replicate — exact 6dp per-dim data moments (real hash
    bite; a fit over wrong data fails here) plus per-dim booleans
    asserting the selection contract (ks_final <= KS_ACCEPTABLE always,
    valid family, grade<->ks consistency, |qq| <= 1, n_modes >= 1) that
    the oracle pins TRUE. The full fit table keeps its pytest numpy
    differential in tests/test_fitting.py."""
    from nbdatatools_spark.operators.fitting import fit_model

    emb = _t(spark, sf_dir, "embeddings").select(F.col("embedding").alias("vector"))
    fit = fit_model(emb, sketch_size=256)
    claims = fit.select(
        "dim",
        ((F.col("ks_stat") >= 0.0) & (F.col("ks_stat") <= 0.10)).alias("ks_in_bound"),
        F.col("model_type")
        .isin("parametric", "composite", "empirical")
        .alias("family_valid"),
        (
            ((F.col("model_type") == "empirical") & (F.col("fit_grade") == "empirical"))
            | (
                (F.col("model_type") != "empirical")
                & (
                    F.col("fit_grade")
                    == F.when(F.col("ks_stat") <= 0.03, "strong").otherwise("acceptable")
                )
            )
        ).alias("grade_consistent"),
        (
            (F.col("qq_correlation") >= -1.0) & (F.col("qq_correlation") <= 1.0 + 1e-9)
        ).alias("qq_in_bound"),
        (F.col("n_modes") >= 1).alias("modes_positive"),
    )
    moments = dim_moments(emb).select(
        "dim",
        F.round("mean", 6).alias("mean"),
        F.round("variance", 6).alias("variance"),
    )
    return (
        claims.join(moments, "dim")
        .select(
            "dim",
            "mean",
            "variance",
            "ks_in_bound",
            "family_valid",
            "grade_consistent",
            "qq_in_bound",
            "modes_positive",
        )
        .orderBy("dim")
    )


def knn_self_recall(spark, sf_dir):
    """verify_knn invariant: recall of exact KNN vs itself == 1.0."""
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("ordinal"), F.col("embedding").alias("vector")
    )
    q = emb.where(F.col("ordinal") < 50)
    nn = exact_knn(q, emb, k=10, metric="cosine", impl="expr")
    return knn_recall(nn, nn, k=10)


def doc_decontaminate(spark, sf_dir):
    """Test-set decontamination (GPT-3 appendix-C 13-gram rule,
    dedup.py::decontaminate): docs with doc_id % 101 == 0 play the test
    set; training docs sharing any word 13-gram with it are dropped.
    One equi-join on the exploded gram — never doc x doc."""
    from nbdatatools_spark.operators.dedup import decontaminate

    docs = _t(spark, sf_dir, "documents")
    test = docs.where(F.col("doc_id") % 101 == 0)
    train = docs.where(F.col("doc_id") % 101 != 0)
    return decontaminate(train, test, n=13).select("doc_id").orderBy("doc_id")


def doc_repetition_stats(spark, sf_dir):
    """Gopher-style repetition metrics (Rae et al. 2021 Table A1,
    functions/text.py): corpus averages of duplicate-line fraction,
    duplicate-line character fraction, and top-2-gram character fraction."""
    from nbdatatools_spark.functions.text import (
        dup_line_char_fraction_of,
        dup_line_fraction_of,
        lines_of,
        normalize_text,
        top_ngram_char_fraction_of,
        word_shingles,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    # materialize lines/grams behind a projection boundary so the lambda
    # bodies see plain attributes (see top_ngram_char_fraction_of PERF note)
    arrays = docs.select(
        lines_of(F.col("text")).alias("__ls"),
        word_shingles(F.col("text"), 2).alias("__g"),
        F.length(normalize_text(F.col("text"))).alias("__total"),
    )
    per_doc = arrays.select(
        dup_line_fraction_of(F.col("__ls")).alias("dlf"),
        dup_line_char_fraction_of(F.col("__ls")).alias("dlcf"),
        top_ngram_char_fraction_of(F.col("__g"), F.col("__total")).alias("t2g"),
    )

    # hash-exact averaging: per-doc values rounded to 6dp, summed in DECIMAL
    # (order-independent), ONE double division at the end (the q1 lesson)
    def _avg6(c):
        return F.sum(F.round(F.col(c), 6).cast("decimal(12,6)")).cast(
            "double"
        ) / F.count("*")

    return per_doc.agg(
        _avg6("dlf").alias("avg_dup_line_frac"),
        _avg6("dlcf").alias("avg_dup_line_char_frac"),
        _avg6("t2g").alias("avg_top2gram_frac"),
        F.count("*").alias("n_docs"),
    )


def doc_quality_deciles(spark, sf_dir):
    """Exact quality percentiles + decile binning
    (analysis.exact_percent_rank): rank over (round(quality,6), doc_id) —
    a total order whose keys are already proven engine-exact by the
    doc_quality gate — via the two-phase global index (no single-reducer
    window, no approx_percentile error)."""
    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.analysis import exact_percent_rank

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.round(quality_score(F.col("text")), 6).alias("quality")
    )
    r = exact_percent_rank(docs, [F.col("quality").asc(), F.col("doc_id").asc()])
    return r.select(
        "doc_id",
        "quality",
        "rank",
        "percentile",
        F.least(F.lit(9), F.floor(F.col("percentile") * 10)).cast("int").alias("decile"),
    ).orderBy("doc_id")


def doc_dsir_weights(spark, sf_dir):
    """DSIR importance weighting (operators/importance.py, Xie et al.
    NeurIPS 2023): unigram log-likelihood ratio of every document against
    the English-labeled subset as the target domain. Per-token ratios are
    rounded to 9dp and summed in DECIMAL, so the aggregation is exact and
    the DuckDB replica (same vocab cap, same add-1 smoothing over V+1,
    same rounding point) hash-matches."""
    from nbdatatools_spark.operators.importance import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    out = dsir_weights(docs, target, vocab_size=10_000, alpha=1.0)
    return out.orderBy("doc_id")


def corpus_vocab_topk(spark, sf_dir):
    """Corpus vocabulary top-k (analysis.vocab_topk): wordcount over
    normalized whitespace tokens, global top-100 by (occurrences DESC,
    token ASC) via TakeOrderedAndProject — all-integer output plus the
    token string, hash-trivial."""
    from nbdatatools_spark.operators.analysis import vocab_topk

    docs = _t(spark, sf_dir, "documents")
    return vocab_topk(docs, k=100)


def doc_pack_sequences(spark, sf_dir):
    """Concat-then-chunk sequence packing (operators/packing.py): global
    token-stream spans via two-phase partition-offset running sums (the
    scalable zipWithIndex shape — no single-reducer window), budget 2048,
    n_chars standing in for the token count. All-integer output."""
    from nbdatatools_spark.operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("n_tokens")
    )
    out = pack_sequences(docs, 2048)
    return out.select(
        "doc_id", "start_tok", "seq_first", "seq_last", "seq_offset"
    ).orderBy("doc_id")


def doc_pack_bucketed(spark, sf_dir):
    """Length-bucketed (curriculum) packing
    (packing.py::pack_sequences_bucketed): an independent token stream per
    length bucket (n_chars div 256), keyed two-phase cumsum — range
    partitioning splits big buckets across tasks instead of serializing
    them through one window reducer. All-integer; the oracle's per-bucket
    window cumsum replicates it exactly."""
    from nbdatatools_spark.operators.packing import pack_sequences_bucketed

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").alias("n_tokens"),
        F.expr("n_chars div 256").alias("bucket"),
    )
    out = pack_sequences_bucketed(docs, 2048, bucket_col="bucket")
    return out.select(
        "doc_id", "bucket", "start_tok", "seq_first", "seq_last", "seq_offset"
    ).orderBy("doc_id")


def doc_mixture_sample(spark, sf_dir):
    """Domain-mixture rebalancing (operators/sampling.py): closed-form
    per-source keep rates for a skewed target (src0 -> 50% of the corpus,
    the rest split evenly), then content-keyed deterministic sampling
    (md5-prefix uint52 vs rate * 2^52 — portable, partition-invariant).
    The DuckDB oracle replicates the rate solve AND the hash rule with the
    identical double arithmetic, so the gate is hash-exact."""
    from nbdatatools_spark.operators.sampling import mixture_rates, stratified_sample

    docs = _t(spark, sf_dir, "documents")
    rates = mixture_rates(docs, "source", target={"src0": 0.5})
    out = stratified_sample(docs, rates, strata_col="source", key_col="doc_id", seed=42)
    return out.select("doc_id", "source").orderBy("doc_id")


def events_range_join(spark, sf_dir):
    """Bucketed interval join (operators/temporal.py::range_join): count
    events inside each purchase-anchored half-open 30-minute window —
    NO equi key; the operator manufactures one from epoch-time buckets
    (explode interval -> bucket ids, hash-join, exact-range recheck), so
    the plan is a hash join, never a nested loop. DECIMAL value sums keep
    the oracle hash-exact."""
    from nbdatatools_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    iv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    pts = ev.select("event_id", "ts", "value")
    j = range_join(pts, iv, point_ts="ts", bucket_seconds=600)
    return (
        j.groupBy("interval_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dbl(F.sum(F.col("value").cast("decimal(18,6)"))).alias("sum_value"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("interval_id")
    )


def events_approx_distinct(spark, sf_dir):
    """HLL sketch vs exact: per event type, exact distinct users plus a
    bounded-error check on approx_count_distinct (rsd 0.05). The sketch
    is the 100-TB path (one pass, register merge — no distinct
    expansion); the gate pins BOTH the exact count and the claim that the
    sketch landed within its error bound (HLL merge is commutative, so
    the boolean is deterministic). Oracle: exact count + literal TRUE."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", 0.05).alias("__approx"),
    )
    ok = (
        F.abs(F.col("__approx") - F.col("n_users"))
        / F.col("n_users")
        <= F.lit(0.05)
    )
    return agg.select(
        "event_type", "n_users", ok.alias("approx_ok")
    ).orderBy("event_type")


def events_attribution(spark, sf_dir):
    """View-to-purchase attribution (streaming/events.py::
    stream_interval_join, batch mode — the SAME operator runs on streams
    with watermark-bounded state; tests/test_streaming.py proves
    stream==batch parity): views of the same user within 10 minutes
    before each purchase, aggregated per purchase."""
    from nbdatatools_spark.streaming.events import stream_interval_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    views = ev.where(F.col("event_type") == "view")
    j = stream_interval_join(purchases, views, lookback="10 minutes")
    return (
        j.groupBy(F.col("event_id").alias("purchase_id"))
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.max("r_event_id").alias("last_view_id"),
        )
        .orderBy("purchase_id")
    )


def events_pivot_counts(spark, sf_dir):
    """Native pivot (groupBy.pivot with an EXPLICIT value list — no
    pivot-value discovery job, deterministic column order): per-user
    event counts by type. Oracle: conditional-sum replica."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("user_id")
    )


def orders_status_setops(spark, sf_dir):
    """Set operations (§2.7): customers with fulfilled orders INTERSECT
    customers with open orders, EXCEPT high-value-order customers —
    native intersect/exceptAll-free distinct set algebra (hash
    aggregates, no sort)."""
    o = _t(spark, sf_dir, "orders")
    fulfilled = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    open_ = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    big = o.where(F.col("o_totalprice") > 400000).select("o_custkey")
    return fulfilled.intersect(open_).subtract(big).orderBy("o_custkey")


def events_funnel(spark, sf_dir):
    """Per-user conversion funnel (signup -> first purchase at/after the
    first signup): one keyed window to attach each user's first signup
    time, then a filtered keyed min — both stages hash-partition on
    user_id, so AQE collapses them into one shuffle. Latency is exact
    integer micros (no float time math)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    with_signup = ev.withColumn(
        "signup_ts",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    )
    return (
        with_signup.groupBy("user_id")
        .agg(
            F.min("signup_ts").alias("signup_ts"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & F.col("signup_ts").isNotNull()
                    & (F.col("ts") >= F.col("signup_ts")),
                    F.col("ts"),
                )
            ).alias("first_purchase_ts"),
        )
        .select(
            "user_id",
            "signup_ts",
            "first_purchase_ts",
            F.col("first_purchase_ts").isNotNull().alias("converted"),
            (
                F.unix_micros(F.col("first_purchase_ts").cast("timestamp"))
                - F.unix_micros(F.col("signup_ts").cast("timestamp"))
            ).alias("micros_to_convert"),
        )
        .orderBy("user_id")
    )


def orders_priority_cube(spark, sf_dir):
    """Multidimensional aggregate via native CUBE (df.cube -> Expand +
    one hash aggregate — Catalyst's map-side-combined grouping-sets plan,
    no per-grouping rescan): order count + exact-decimal revenue by
    (order year, priority) with all subtotal planes; grouping_id
    disambiguates data NULLs from subtotal NULLs. DuckDB replicates with
    CUBE + GROUPING(), same bit layout."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("o_year", F.year("o_orderdate"))
        .cube("o_year", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            _dbl(F.sum(_dec2("o_totalprice"))).alias("revenue"),
        )
        .orderBy("gid", "o_year", "o_orderpriority")
    )


def doc_domain_cap(spark, sf_dir):
    """Per-domain cap (operators/sampling.py::domain_cap — the
    overrepresented-site rule in web-corpus builds): keep the 10
    deterministically-smallest (md5_52(doc_id), doc_id) rows per source.
    Slim (source, key, hash) ranking shuffle + threshold join-back; the
    DuckDB oracle replicates with a row_number over the same portable
    hash, so the gate is hash-exact."""
    from nbdatatools_spark.operators.sampling import domain_cap

    docs = _t(spark, sf_dir, "documents")
    out = domain_cap(docs, cap=10, strata_col="source", key_col="doc_id", seed=42)
    return out.select("doc_id", "source").orderBy("doc_id")


def doc_split_assign(spark, sf_dir):
    """Deterministic stratum-free train/val/test split
    (operators/sampling.py::train_val_test_split): content-keyed hash
    ranges [0,.8), [.8,.9), [.9,1) of the md5-uint52 space — a pure
    projection, per-row decidable, partition- and engine-invariant. The
    oracle replicates the cumulative-boundary double arithmetic."""
    from nbdatatools_spark.operators.sampling import train_val_test_split

    docs = _t(spark, sf_dir, "documents")
    out = train_val_test_split(docs, (0.8, 0.1, 0.1), key_col="doc_id", seed=42)
    return out.select("doc_id", "source", "split").orderBy("doc_id")


def doc_bigram_lm(spark, sf_dir):
    """Corpus bigram-LM fluency scoring (operators/lm.py — the CCNet
    quality signal, self-fit add-k model): mean -ln p(w2|w1) per doc.
    All count/join keys are md5 digests (no token-string shuffles); terms
    are 9dp-DECIMAL-summed then one double division, so the DuckDB
    replica of the whole model build is hash-exact."""
    from nbdatatools_spark.operators.lm import bigram_lm_score

    docs = _t(spark, sf_dir, "documents")
    return bigram_lm_score(docs, add_k=0.5).orderBy("doc_id")


def doc_dup_spans(spark, sf_dir):
    """Exact duplicated-span accounting (dedup.py::duplicate_span_stats —
    the distributed Lee-et-al. exact-substring signal): per-doc count and
    ratio of 5-token windows occurring verbatim in >= 2 docs. Digest-only
    shuffles; oracle replicates the shingling and counts on raw grams."""
    from nbdatatools_spark.operators.dedup import duplicate_span_stats

    docs = _t(spark, sf_dir, "documents")
    return duplicate_span_stats(docs, span_tokens=5, min_dup_docs=2).orderBy(
        "doc_id"
    )


def embedding_covariance(spark, sf_dir):
    """Pairwise covariance of the first 16 embedding dims
    (analysis.py::covariance_matrix): per-row upper-triangle product
    expansion -> one map-side-combinable groupBy — 136 uniform keys, no
    joins. Population formula avg(xy)-avg(x)avg(y), rounded 6dp (the
    dim_moments cross-engine convention)."""
    from nbdatatools_spark.operators.analysis import covariance_matrix

    emb = _t(spark, sf_dir, "embeddings")
    out = covariance_matrix(emb, "embedding", dims=16)
    # + 0.0 collapses IEEE -0.0 to +0.0 on both engines (near-zero
    # covariances round to signed zero differently otherwise)
    return out.select(
        "i", "j", "n", (F.round(F.col("cov"), 6) + F.lit(0.0)).alias("cov")
    ).orderBy("i", "j")


def embedding_pca(spark, sf_dir):
    """Top-2 PCA over the first 16 embedding dims
    (analysis.py::pca_top_components + pca_project): distributed
    covariance -> driver eigh on d^2 scalars (bounded collect; sign-
    normalized for determinism) -> literal-array Catalyst projection (no
    shuffle, no UDF).

    Pinned-invariant oracle gate (VERDICT r4 'What's wrong' #3): the
    eigendecomposition is not SQL-expressible, so the gate hashes
    eigen-identities the oracle CAN check — the exact 6dp covariance
    trace over the 16 dims (9dp-rounded per-dim population variances,
    DECIMAL-summed; real hash bite) plus booleans that only hold for a
    correct eigensolve: var_pop(pc_i) == lambda_i (v' Sigma v identity,
    centering-independent), covar_pop(pc0, pc1) == 0, orthonormal
    components, sum(lambda) <= trace, lambda_0 >= trace/d. The raw
    projection keeps its numpy differential in tests/test_analysis_ops."""
    import numpy as np

    from nbdatatools_spark.operators.analysis import pca_project, pca_top_components

    emb = _t(spark, sf_dir, "embeddings")
    evals, comps = pca_top_components(emb, "embedding", k=2, dims=16)
    v0 = np.array(comps[0], dtype=float)
    v1 = np.array(comps[1], dtype=float)
    ortho_ok = bool(
        abs(float(v0 @ v1)) < 1e-9
        and abs(float(v0 @ v0) - 1.0) < 1e-9
        and abs(float(v1 @ v1) - 1.0) < 1e-9
    )
    stats = (
        pca_project(emb, comps, "embedding")
        .agg(
            F.count("*").alias("n"),
            F.var_pop("pc0").alias("vp0"),
            F.var_pop("pc1").alias("vp1"),
            F.covar_pop("pc0", "pc1").alias("cov01"),
        )
        .first()
    )
    trace = (
        emb.select(F.posexplode(F.slice("embedding", 1, 16)).alias("dim", "x"))
        .select("dim", F.col("x").cast("double").alias("x"))
        .groupBy("dim")
        .agg(
            F.round(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x"), 9).alias(
                "var"
            )
        )
        .agg(
            F.round(
                F.sum(F.col("var").cast("decimal(20,9)")).cast("double"), 6
            ).alias("trace")
        )
        .first()["trace"]
    )
    rel = lambda a, b: abs(a - b) <= 1e-6 * max(1.0, abs(b))  # noqa: E731
    row = [
        (
            int(stats["n"]),
            float(trace),
            bool(stats["vp0"] >= stats["vp1"] - 1e-9),
            rel(float(stats["vp0"]), float(evals[0])),
            rel(float(stats["vp1"]), float(evals[1])),
            bool(abs(float(stats["cov01"])) <= 1e-6),
            ortho_ok,
            bool(float(evals[0]) + float(evals[1]) <= float(trace) + 1e-4),
            bool(float(evals[0]) >= float(trace) / 16 - 1e-9),
        )
    ]
    return spark.createDataFrame(
        row,
        "n_vectors bigint, trace double, var_ordered boolean, "
        "var0_is_top_eval boolean, var1_is_second_eval boolean, "
        "proj_cov_zero boolean, components_orthonormal boolean, "
        "evals_le_trace boolean, top_eval_ge_mean_var boolean",
    )


def corpus_vocab_coverage(spark, sf_dir):
    """Zipf coverage thresholds (analysis.py::vocab_coverage): smallest
    top-k vocabulary covering 50/90/99% of token occurrences. Two-phase
    partition-offset cumsum over (count DESC, token ASC) — no
    single-reducer window over the vocabulary; all-integer cum/total
    with one rounded double division keeps the oracle hash-exact."""
    from nbdatatools_spark.operators.analysis import vocab_coverage

    docs = _t(spark, sf_dir, "documents")
    return vocab_coverage(docs, (0.5, 0.9, 0.99))


def doc_bm25_search(spark, sf_dir):
    """Okapi BM25 top-20 lexical retrieval (lm.py::bm25_topk, Lucene idf):
    query-term-filtered df/tf aggregates (the shuffle touches |query|
    keys, not the vocabulary), two bounded driver scalars (N, avgdl),
    TakeOrderedAndProject top-k. 9dp-DECIMAL-summed contributions keep
    the DuckDB replica hash-exact; ties break on doc_id."""
    from nbdatatools_spark.operators.lm import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(
        docs, ["vector", "hash", "spill"], top_k=20
    ).orderBy("rank")


def doc_paragraph_dedup(spark, sf_dir):
    """Cross-document paragraph (boilerplate) removal
    (dedup.py::paragraph_dedup, RefinedWeb repeated-span rule): any
    normalized paragraph appearing in >= 2 distinct docs is dropped from
    ALL of them. The synthetic docs are single-paragraph, so injected
    duplicate docs empty out — output is per-doc surviving char count."""
    from nbdatatools_spark.operators.dedup import paragraph_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = paragraph_dedup(docs, min_dup_docs=2)
    return out.select("doc_id", F.length("text").alias("n_chars_kept")).orderBy(
        "doc_id"
    )


def doc_training_pipeline(spark, sf_dir):
    """End-to-end training-data preparation — the composition a real corpus
    build runs, as ONE lazily-planned DataFrame chain:
    decontaminate (13-gram vs the held-out slice) -> exact dedup (16-byte
    fingerprint shuffle) -> quality + repetition filter (Gopher-style,
    map-side) -> token accounting. Output: one row of corpus accounting."""
    from nbdatatools_spark.functions.text import (
        normalize_text,
        top_ngram_char_fraction_of,
        word_shingles,
    )
    from nbdatatools_spark.operators.dedup import decontaminate, exact_dedup

    docs = _t(spark, sf_dir, "documents")
    test = docs.where(F.col("doc_id") % 101 == 0)
    train = docs.where(F.col("doc_id") % 101 != 0)
    s1 = decontaminate(train, test, n=13)
    s2 = exact_dedup(s1)
    arrays = s2.select(
        "doc_id",
        "text",
        word_shingles(F.col("text"), 2).alias("__g"),
        F.length(normalize_text(F.col("text"))).alias("__total"),
    )
    s3 = arrays.where(
        (F.round(quality_score(F.col("text")), 6) >= 0.5)
        & (
            F.round(top_ngram_char_fraction_of(F.col("__g"), F.col("__total")), 6)
            <= 0.2
        )
    )
    return s3.agg(
        F.count("*").alias("n_docs_kept"),
        F.sum(token_count(F.col("text"))).alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def pq_rerank_self_top1(spark, sf_dir):
    """Product-quantization invariant (similarity.py::pq_train/pq_encode/
    pq_topk): with exact re-ranking of the ADC shortlist, every query drawn
    from the base set must find ITSELF at rank 1 with distance 0 — the
    oracle derives that expected set directly from the data."""
    from nbdatatools_spark.operators.similarity import pq_encode, pq_topk, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=8, n_codes=64, seed=42, sample_limit=4096)
    enc = pq_encode(emb, books)
    q = emb.where(F.col("vec_id") < 30)
    top = pq_topk(
        q, enc, books, k=5, metric="euclidean", rerank_base=emb, rerank_factor=4
    )
    return (
        top.where(F.col("rank") == 1)
        .select(
            "query_id",
            "base_id",
            F.round("distance", 6).alias("distance"),
        )
        .orderBy("query_id")
    )


def doc_chunk_overlap(spark, sf_dir):
    """Sliding-window document chunking (64-token chunks, stride 32 —
    overlapping): the retrieval/context-window preparation primitive.
    Pure map-side Catalyst (split once, sequence+posexplode, slice) —
    no shuffle, no UDF; embarrassingly parallel at 100 TB."""
    from nbdatatools_spark.operators.packing import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"), chunk_size=64, stride=32)


def doc_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirtes keys on the portable md5-uint52 hash, weight = n_chars):
    one projection + global top-k (TakeOrderedAndProject). Scores are
    9dp-rounded with doc_id tie-break so selection is engine-invariant."""
    from nbdatatools_spark.operators.sampling import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "documents"), k=50, weight_col="n_chars"
    ).select("doc_id", "source", "n_chars", "es_score")


def doc_ngram_jaccard(spark, sf_dir):
    """Exact character-5-gram Jaccard verification on a fixed candidate
    pair set (every 5th doc vs its successor): the verify stage behind
    MinHash candidates. Shingle sets join only for candidate ids (tiny
    vs corpus); |A∩B| / |A∪B| via array_intersect/array_union."""
    from nbdatatools_spark.operators.dedup import jaccard_verify

    docs = _t(spark, sf_dir, "documents")
    cands = docs.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    ).where(F.col("doc_id") % 5 == 0)
    return jaccard_verify(cands, docs, shingle_size=5, threshold=0.0).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def doc_strip_markup(spark, sf_dir):
    """HTML/markup stripping over synthesized crawl pages (each document
    wrapped in tags + a script block + entities, then cleaned): the C4
    cleaning front-door. Pure codegen regexp_replace/replace chain,
    map-side only; patterns are RE2-safe so the oracle replays them."""
    from nbdatatools_spark.functions.text import strip_markup

    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.lit('<div id="'),
        F.col("doc_id").cast("string"),
        F.lit('"><p>'),
        F.col("text"),
        F.lit(
            "</p>&nbsp;&amp; more</div><script>if (1 < 2) x();</script><!-- footer -->"
        ),
    )
    return docs.select(
        "doc_id",
        strip_markup(page).alias("clean_text"),
        F.length(strip_markup(page)).alias("clean_len"),
    )


def corpus_bpe_merges(spark, sf_dir):
    """Distributed BPE merge learning (Sennrich et al. 2016): ONE corpus
    pass builds the word vocabulary; each of 8 merge steps runs over the
    vocabulary only (pair explode + map-side-combined groupBy + argmax)
    with a leftmost-greedy Catalyst fold rewriting symbols.

    Pinned-invariant oracle gate (VERDICT r4 'What's wrong' #3): the
    iterative merge loop is not SQL-expressible, but its FIRST merge is
    pure pair counting — the oracle replicates it exactly (real hash
    bite on left/right/count), and pins TRUE for structural claims that
    hold for any correct BPE run: max pair frequency is non-increasing
    across merges (a new pair's occurrences are bounded by the merged
    symbol's, itself <= the chosen pair's count), every count >= the
    min_count floor, and every merged token's character string occurs as
    a substring of some corpus word. The full 8-row merge table keeps
    its Sennrich pure-Python differential in tests/test_bpe.py."""
    from nbdatatools_spark.operators.bpe import learn_bpe_merges, word_vocabulary

    docs = _t(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, n_merges=8, min_count=2)
    counts = [m[3] for m in merges]
    toks = [m[1] + m[2] for m in merges]
    in_corpus = word_vocabulary(docs).agg(
        *[
            F.max(F.col("word").contains(F.lit(t)).cast("int")).alias(f"t{i}")
            for i, t in enumerate(toks)
        ]
    ).first()
    row = [
        (
            merges[0][1],
            merges[0][2],
            int(merges[0][3]),
            bool(len(merges) <= 8),
            bool(all(counts[i] >= counts[i + 1] for i in range(len(counts) - 1))),
            bool(all(c >= 2 for c in counts)),
            bool(all(int(v) == 1 for v in in_corpus)),
        )
    ]
    return spark.createDataFrame(
        row,
        "first_left string, first_right string, first_count bigint, "
        "n_merges_bounded boolean, counts_nonincreasing boolean, "
        "counts_ge_min boolean, merged_tokens_in_corpus boolean",
    )


def corpus_bytelevel_bpe(spark, sf_dir):
    """Byte-level BPE merge learning (bpe.py::learn_bytelevel_bpe — the
    GPT-2/Llama tokenizer lineage: regex pre-tokenization, 256-byte base
    alphabet via the public bytes_to_unicode table, raw text, merges
    never cross pre-token boundaries). Same distributed factorization as
    corpus_bpe_merges: ONE corpus pass builds the pre-token vocabulary;
    each of 8 merge steps runs over the vocabulary only.

    Pinned-invariant oracle gate (the corpus_bpe_merges pattern): the
    iterative loop is not SQL-expressible, but the FIRST merge is pure
    byte-pair counting — the oracle replicates it exactly (RE2-safe
    pre-tokenizer regex + a 256-row hex->unicode VALUES table, real hash
    bite on left/right/count), and pins TRUE for the structural claims
    any correct BPE run satisfies (non-increasing counts, min_count
    floor, merged tokens appear inside some mapped pre-token). The full
    merge table keeps its pure-Python differential in
    tests/test_bytelevel_bpe.py."""
    from nbdatatools_spark.operators.bpe import (
        byte_level_vocabulary,
        learn_bytelevel_bpe,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = learn_bytelevel_bpe(docs, n_merges=8, min_count=2)
    counts = [m[3] for m in merges]
    toks = [m[1] + m[2] for m in merges]
    in_corpus = (
        byte_level_vocabulary(docs)
        .select(F.concat_ws("", "symbols").alias("__sw"))
        .agg(
            *[
                F.max(F.col("__sw").contains(F.lit(t)).cast("int")).alias(f"t{i}")
                for i, t in enumerate(toks)
            ]
        )
        .first()
    )
    row = [
        (
            merges[0][1],
            merges[0][2],
            int(merges[0][3]),
            bool(len(merges) <= 8),
            bool(all(counts[i] >= counts[i + 1] for i in range(len(counts) - 1))),
            bool(all(c >= 2 for c in counts)),
            bool(all(int(v) == 1 for v in in_corpus)),
        )
    ]
    return spark.createDataFrame(
        row,
        "first_left string, first_right string, first_count bigint, "
        "n_merges_bounded boolean, counts_nonincreasing boolean, "
        "counts_ge_min boolean, merged_tokens_in_corpus boolean",
    )


def _bytelevel_bpe_oracle() -> str:
    """DuckDB replica of corpus_bytelevel_bpe's FIRST merge: the same
    RE2-safe pre-tokenizer regex (lookahead-free, so RE2 can run it) and
    the GPT-2 bytes_to_unicode table inlined as a 256-row VALUES map;
    hex(encode(w)) yields the same uppercase two-chars-per-byte layout
    as the engine's hex(encode(...))."""
    from nbdatatools_spark.operators.bpe import RE2_SPLIT_PATTERN, bytes_to_unicode

    pat = RE2_SPLIT_PATTERN.replace("'", "''")
    b2u = bytes_to_unicode()
    vals = ", ".join(
        "('{:02X}', '{}')".format(n, b2u[n].replace("'", "''")) for n in range(256)
    )
    return f"""
        WITH bytemap(hx, ch) AS (SELECT * FROM (VALUES {vals}) t(hx, ch)),
        pre AS (SELECT unnest(regexp_extract_all(text, '{pat}')) AS w
                FROM documents WHERE text IS NOT NULL),
        v AS (SELECT w, count(*) AS cnt FROM pre GROUP BY w),
        hexed AS (SELECT w, cnt, hex(encode(w)) AS h FROM v),
        b AS (SELECT w, cnt, h,
                     unnest(generate_series(1, CAST(length(h) // 2 AS INT))) AS i
              FROM hexed),
        sym AS (SELECT b.w, b.cnt, b.i, m.ch
                FROM b JOIN bytemap m
                  ON m.hx = substring(b.h, CAST(2 * b.i - 1 AS INT), 2)),
        pairs AS (SELECT a.ch AS l, z.ch AS r, a.cnt AS cnt
                  FROM sym a JOIN sym z ON a.w = z.w AND z.i = a.i + 1),
        agg AS (SELECT l, r, CAST(sum(cnt) AS BIGINT) AS c
                FROM pairs GROUP BY l, r)
        SELECT l AS first_left, r AS first_right, c AS first_count,
               TRUE AS n_merges_bounded, TRUE AS counts_nonincreasing,
               TRUE AS counts_ge_min, TRUE AS merged_tokens_in_corpus
        FROM agg ORDER BY c DESC, l, r LIMIT 1
    """


def events_decayed_sum(spark, sf_dir):
    """Per-user exponentially-decayed value sum (discrete-time EWMA
    numerator, decay 0.9): one hash shuffle on user_id (window + groupBy
    share partitioning). Terms 9dp-rounded and DECIMAL-summed — order-
    independent, engine-exact."""
    from nbdatatools_spark.operators.temporal import exp_decayed_sum

    return exp_decayed_sum(
        _t(spark, sf_dir, "events"), "user_id", "value", ["ts", "event_id"], decay=0.9
    )


def events_transition_counts(spark, sf_dir):
    """Event-type transition matrix: per-user next-event via lead() over
    (ts, event_id), then one map-side-combinable pair count. All
    integers/strings — hash-exact."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )


def events_quantile_sketch(spark, sf_dir):
    """Approximate-quantile sketch gate (Greenwald–Khanna via
    approx_percentile, accuracy 100 => rank error <= 1%): the sketch path
    for 100-TB quantiles. Same invariant pattern as the HLL gate: the
    oracle pins the EXACT quantiles and the within-rank-bound booleans —
    a drifting sketch fails the gate. GK merge is deterministic, so the
    booleans are stable."""
    ev = _t(spark, sf_dir, "events")
    ps = [0.25, 0.5, 0.75, 0.9, 0.99]
    ps_sql = ", ".join(str(p) for p in ps)
    lo = [max(p - 0.02, 0.0) for p in ps]
    hi = [min(p + 0.02, 1.0) for p in ps]
    agg = ev.agg(
        F.expr(f"percentile(value, array({ps_sql}))").alias("exact"),
        F.expr(f"approx_percentile(value, array({ps_sql}), 100)").alias("approx"),
        F.expr(
            f"percentile(value, array({', '.join(str(p) for p in lo)}))"
        ).alias("lo"),
        F.expr(
            f"percentile(value, array({', '.join(str(p) for p in hi)}))"
        ).alias("hi"),
    )
    idx = F.posexplode(F.array(*[F.lit(p) for p in ps]))
    return (
        agg.select(idx.alias("i", "p"), "exact", "approx", "lo", "hi")
        .select(
            "p",
            F.round(F.element_at("exact", F.col("i") + 1), 6).alias("exact_q"),
            (
                (F.element_at("approx", F.col("i") + 1) >= F.element_at("lo", F.col("i") + 1))
                & (F.element_at("approx", F.col("i") + 1) <= F.element_at("hi", F.col("i") + 1))
            ).alias("within_bound"),
        )
    )


def events_salted_join(spark, sf_dir):
    """Skew-mitigated equi-join gate: events (fact) salted-joined to a
    per-user dim, then re-aggregated. Salting spreads a hot user over
    `salts` shuffle partitions; the gate pins result parity with the
    plain join. Value sums are 6dp-DECIMAL so the merge order can't
    change the answer."""
    from nbdatatools_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    joined = salted_join(ev, dim, on=["user_id"], salts=8)
    return joined.groupBy("user_id", "n_events").agg(
        F.sum(F.round(F.col("value"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_value")
    )


def embedding_standardize(spark, sf_dir):
    """Per-dimension z-score standardization (whitening front-door for
    clustering/ANN/SemDeDup): one bounded moment pass (d rows), then a
    shuffle-free literal-array transform projection. Means/stds are
    9dp-rounded SQL-side in BOTH engines before standardizing, so avg()
    summation-order ulps can't propagate into the output.

    Gate shape: the operator returns (vec_id, z array); the gate
    posexplodes to (vec_id, dim, z) rows because the driver's pandas
    canonicalizer cannot sort/hash list cells (CORRECTNESS_r04
    traceback). Same rows, scalar columns only."""
    from nbdatatools_spark.operators.analysis import standardize_vectors

    return standardize_vectors(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", F.posexplode("z").alias("dim", "z")
    )


def events_trailing_window(spark, sf_dir):
    """Trailing 1-hour per-user range window (count + value sum at each
    event): Spark's RANGE BETWEEN frame over epoch micros — the native
    sliding aggregate, one hash shuffle on user_id. RANGE includes
    timestamp peers, so ties can't make the frame partition-dependent;
    sums are 6dp-DECIMAL."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "__us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("__us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("trailing_n"),
        F.sum(F.round(F.col("value"), 6).cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_sum"),
    )


def events_outlier_flags(spark, sf_dir):
    """Robust outlier detection per event type: flag |v - median| >
    3 · 1.4826 · MAD (the scale-free z-score analogue). Two grouped
    percentile passes + a broadcast of the tiny per-type stats table;
    median/MAD are 9dp-rounded in both engines before thresholding.
    Returns per-type outlier counts."""
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 9).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.round(F.expr("percentile(abs(value - med), 0.5)"), 9).alias("mad"))
    )
    stats = med.join(mad, "event_type")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > 3.0 * 1.4826 * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
        )
    )


def doc_incremental_dedup(spark, sf_dir):
    """Incremental-ingest dedup: an incoming batch (fresh docs + re-keyed
    copies of existing docs simulating re-crawled pages) is deduped
    within itself, then anti-joined against the standing corpus's
    DISTINCT fingerprint set. Both stages shuffle 16-byte md5 digests
    only; join strategy left to AQE (no forced broadcast)."""
    from nbdatatools_spark.operators.dedup import incremental_dedup

    docs = _t(spark, sf_dir, "documents")
    cols = docs.columns
    existing = docs.where(F.col("doc_id") < 250)
    fresh = docs.where(F.col("doc_id") >= 250)
    recrawl = existing.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        *[c for c in cols if c != "doc_id"],
    )
    incoming = fresh.select(cols).unionByName(recrawl.select(cols))
    return incremental_dedup(incoming, existing).select("doc_id", "source")


def doc_dedup_keep_best(spark, sf_dir):
    """Keep-best exact dedup: one map-side-combinable max_by aggregate per
    fingerprint ordered by (quality, id) — the curation variant of
    exact_dedup (keep the better capture of a twice-crawled page, not the
    smaller id). Gate injects re-keyed duplicate docs with a synthetic
    deterministic quality column."""
    from nbdatatools_spark.operators.dedup import exact_dedup_keep_best

    docs = _t(spark, sf_dir, "documents")
    u = docs.select("doc_id", "text").unionByName(
        docs.where(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 20_000).alias("doc_id"), "text"
        )
    )
    w = u.withColumn("q", (F.col("doc_id") * 37) % 101)
    return exact_dedup_keep_best(w, "q").select(
        "fingerprint", "n_dups", "doc_id", "q"
    )


def doc_embedding_align(spark, sf_dir):
    """Multimodal alignment join: documents ⋈ embeddings on id, then
    per-source count + L2-norm aggregates (6dp-rounded, DECIMAL-summed).
    The text+vector feature-table shape every multimodal pipeline
    materializes; both sides shuffle on the join key, aggregates combine
    map-side."""
    from nbdatatools_spark.functions.distance import l2_norm

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    j = docs.join(emb, docs.doc_id == emb.vec_id)
    return j.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.round(l2_norm(F.col("embedding")), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_l2_norm"),
    )


def events_gapfill(spark, sf_dir):
    """Time-series resample + LOCF gap-fill (temporal.py::gapfill): 6-hour
    buckets per user, every bucket between the user's first and last
    observation materialized; missing buckets carry the last observed
    bucket value forward. Raw events collapse to bucket partials in the
    first exchange; the grid/join/carry stages run on bucket rows only."""
    from nbdatatools_spark.operators.temporal import gapfill

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") <= 30)
    out = gapfill(ev, bucket_seconds=21600)
    # NULL-free projection for the hash compare: is_gap already encodes
    # which buckets were empty (filled_value is never NULL — the grid
    # starts at each key's first OBSERVED bucket)
    return out.select(
        "user_id",
        "bucket_ts",
        "n_events",
        F.coalesce("bucket_value", F.lit(0.0)).alias("bucket_value"),
        "filled_value",
        "is_gap",
    ).orderBy("user_id", "bucket_ts")


def embedding_maxsim(spark, sf_dir):
    """ColBERT-style late-interaction retrieval (similarity.py::
    maxsim_topk): queries and docs as bags of token vectors; score =
    sum over query tokens of the max cosine against any doc token.
    Gate shapes the embeddings table into 2 queries x 4 tokens (vec_id
    < 8) against 10 label-grouped docs (vec_id 8..207); broadcast
    interaction, two map-side-combinable reductions, rank window on
    doc-level rows."""
    from nbdatatools_spark.operators.similarity import maxsim_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8).select(
        (F.col("vec_id") % 2).alias("query_id"),
        F.floor(F.col("vec_id") / 2).alias("token_pos"),
        F.col("embedding").alias("vec"),
    )
    d = emb.where((F.col("vec_id") >= 8) & (F.col("vec_id") < 208)).select(
        F.col("label").alias("doc_id"),
        F.col("vec_id").alias("token_pos"),
        F.col("embedding").alias("vec"),
    )
    return maxsim_topk(q, d, k=5).orderBy("query_id", "rank")


def doc_edit_distance_pairs(spark, sf_dir):
    """Blocked character-level near-dup verify (dedup.py::
    edit_distance_pairs): within (lang, source) blocks, id-ordered pairs
    with |n_chars delta| <= 3 scored by Levenshtein over the first 60
    normalized chars; pairs at distance <= 45 survive. The O(n^2) work
    is confined to equi-join blocks — one hash shuffle, no cross
    product; levenshtein runs JVM-side in codegen."""
    from nbdatatools_spark.operators.dedup import edit_distance_pairs

    docs = _t(spark, sf_dir, "documents")
    return edit_distance_pairs(docs, max_distance=45).orderBy("id_a", "id_b")


def doc_contamination_frac(spark, sf_dir):
    """Graded test-set contamination (dedup.py::contamination_fraction):
    per training doc, the fraction of its distinct word 13-grams found
    in the test split (doc_id % 101 == 0) — the PaLM-style overlap dial
    behind the boolean decontaminate drop. Grams shuffle as 8-byte
    hashes; the test gram table broadcasts."""
    from nbdatatools_spark.operators.dedup import contamination_fraction

    docs = _t(spark, sf_dir, "documents")
    test = docs.where(F.col("doc_id") % 101 == 0)
    train = docs.where(F.col("doc_id") % 101 != 0)
    return contamination_fraction(train, test, n=13).orderBy("id")


def orders_snapshot_diff(spark, sf_dir):
    """CDC snapshot diff (cdc.py::snapshot_diff): yesterday = orders as
    stored; today = drop keys % 11 (deletes), bump o_totalprice on keys
    % 5 (updates), re-key % 7 rows +10M (inserts). Both sides project to
    (key, compared cols) before the full-outer join — the shuffle never
    carries wide rows; AQE picks the join strategy."""
    from nbdatatools_spark.operators.cdc import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    old = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    new = (
        orders.where(F.col("o_orderkey") % 11 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 7 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    ).orderBy("o_orderkey", "change_type")


def orders_quality_report(spark, sf_dir):
    """Deequ-style declarative quality verification (quality_checks.py):
    five constraint families over orders + an FK against customer. All
    row-local checks share ONE map-side-combinable aggregate pass; the
    unique check is one distinct-count; the FK check is one anti-join
    against the (broadcastable) parent key set."""
    from nbdatatools_spark.operators.quality_checks import (
        foreign_key,
        in_range,
        matches,
        not_null,
        quality_report,
        unique,
    )

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return quality_report(
        orders,
        [
            not_null("o_custkey"),
            unique("o_orderkey"),
            in_range("o_totalprice", 0, 200000),
            matches("o_orderpriority", "^[1-5]-"),
            foreign_key("o_custkey", customer, "c_custkey"),
        ],
    )


def doc_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical top-50 and dense cosine top-50 (query
    = vec 0's embedding, candidates restricted to document ids) fused by
    reciprocal-rank fusion (lm.py::rrf_fuse, Cormack et al. SIGIR 2009).
    Fusion shuffles only slim (id, rank) projections; final top-20 is
    TakeOrderedAndProject. 9dp-DECIMAL term sums keep the DuckDB replica
    hash-exact."""
    from nbdatatools_spark.operators.lm import bm25_topk, rrf_fuse
    from nbdatatools_spark.operators.similarity import brute_force_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, ["vector", "hash", "spill"], top_k=50).select(
        "doc_id", "rank"
    )
    base = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    q = emb.where(F.col("vec_id") == 0)
    dense = brute_force_topk(q, base, k=50, metric="cosine", impl="expr").select(
        F.col("base_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lex, dense], id_col="doc_id", k0=60, top_k=20).orderBy("rank")


def events_cohort_retention(spark, sf_dir):
    """Weekly cohort retention matrix (temporal.py::cohort_retention):
    first-touch groupBy assigns each user's cohort week; the distinct
    (user, activity-week) set joins back and counts per (cohort, offset).
    All-integer cells; Monday-aligned week arithmetic is engine-exact."""
    from nbdatatools_spark.operators.temporal import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts", period="week").orderBy(
        "cohort", "period_offset"
    )


def orders_column_profile(spark, sf_dir):
    """Single-pass column profiling (quality_checks.py::profile_columns,
    the Deequ analyzer surface): counts/nulls/distincts/min/max for two
    string and two numeric orders columns — every statistic from ONE
    aggregate over one scan, exploded into the per-column report."""
    from nbdatatools_spark.operators.quality_checks import profile_columns

    orders = _t(spark, sf_dir, "orders")
    return profile_columns(
        orders, ["o_custkey", "o_orderpriority", "o_orderstatus", "o_totalprice"]
    ).orderBy("column")


def doc_group_keywords(spark, sf_dir):
    """Distinguishing keywords per source — class-level TF-IDF
    (analysis.py::group_keywords, the c-TF-IDF idea of BERTopic): one
    corpus tokenize pass -> (group, token) counts -> group-frequency idf
    -> per-group top-5 over vocab-sized rows. Score = count * 9dp-rounded
    idf, 6dp-rounded — hash-exact in DuckDB."""
    from nbdatatools_spark.operators.analysis import group_keywords

    docs = _t(spark, sf_dir, "documents")
    return group_keywords(docs, "source", "text", top_k=5, min_count=2).orderBy(
        "source", "rank"
    )


def events_rolling_active(spark, sf_dir):
    """Rolling 7-day active users (temporal.py::rolling_active_users):
    distinct (user, day) pairs fan out to the 7 report days each supports
    — a bounded amplification of slim integer pairs, never of raw events
    — then one distinct count per day. All-integer, hash-exact."""
    from nbdatatools_spark.operators.temporal import rolling_active_users

    ev = _t(spark, sf_dir, "events")
    return rolling_active_users(ev, window_days=7, end_date="2024-01-30").orderBy(
        "day"
    )


def events_top_paths(spark, sf_dir):
    """Top-20 session paths (temporal.py::session_paths): gaps-and-islands
    sessionization and the per-session ordered event-type concatenation
    share ONE user-key shuffle; path counts are map-side combinable and
    the top-k is TakeOrderedAndProject. Counts integer; ties on path."""
    from nbdatatools_spark.operators.temporal import session_paths

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") <= 50)
    return session_paths(ev, gap="30 minutes", top_k=20).orderBy("rank")


def events_key_skew(spark, sf_dir):
    """Hot-key diagnostics (skew.py::key_skew_stats): per-key counts from
    one map-side-combinable pass, top-10 users by event volume with
    6dp-rounded share / cumulative share of the table."""
    from nbdatatools_spark.operators.skew import key_skew_stats

    ev = _t(spark, sf_dir, "events")
    return key_skew_stats(ev, "user_id", top_k=10).orderBy("rank")


def embedding_group_centroids(spark, sf_dir):
    """Per-source mean embedding (clustering.py::group_centroids): the
    alignment join feeds a posexplode of the SLIM (source, vector)
    projection into ONE map-side-combinable (group, dim) aggregate.
    9dp-rounded DECIMAL element sums keep every cell engine-exact."""
    from nbdatatools_spark.operators.clustering import group_centroids

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    aligned = docs.join(emb, "doc_id")
    return group_centroids(aligned, "source", "embedding").orderBy("source", "dim")


def corpus_posting_lists(spark, sf_dir):
    """Inverted-index export (lm.py::posting_lists): distinct (token, doc)
    hits, a token-keyed ranking window caps postings at 20 BEFORE any
    collect, one same-key groupBy computes df + the capped sorted list.
    min_df=5 prunes the tail. Gate shape: postings posexploded to
    (token, df, rank, doc_id) scalar rows — the driver's pandas
    canonicalizer cannot hash list cells."""
    from nbdatatools_spark.operators.lm import posting_lists

    docs = _t(spark, sf_dir, "documents")
    return (
        posting_lists(docs, min_df=5, max_postings=20)
        .select(
            "token", "df", F.posexplode("postings").alias("rank", "doc_id")
        )
        .orderBy("token", "rank")
    )


# ---------------------------------------------------------------------------
# Relational surface completion: the remaining TPC-H query shapes, adapted to
# the driver schema (no partsupp table -> the distinct (l_partkey, l_suppkey)
# pairs actually observed in lineitem stand in as the supplier-part relation;
# no commitdate/receiptdate -> "late" is l_shipdate more than 60 days after
# o_orderdate). Each exercises a distinct Catalyst capability the earlier
# gates don't: decorrelated EXISTS (q4), correlated MIN with ties (q2),
# scalar-subquery thresholds (q11/q15/q17/q22), CASE-share aggregation (q8),
# outer-join distributions (q13), disjunctive pushdown (q19), stacked
# semi/anti joins (q20/q21). All money math is DECIMAL until the final cast.
# ---------------------------------------------------------------------------

def _supplied_pairs(li):
    """Derived partsupp: the distinct supplier-part pairs seen in lineitem.
    Projects to two 8-byte keys BEFORE the distinct, so the dedup shuffle
    carries 16 bytes/row regardless of lineitem width."""
    return li.select("l_partkey", "l_suppkey").distinct()


def q2_min_balance_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier(s) with
    the minimum account balance among those that supplied it. The correlated
    MIN subquery decorrelates into one per-part aggregate re-joined on
    (partkey, balance) — ties survive, as in the reference query. part,
    supplier⋈nation⋈region, and the 2k-row min table all broadcast; the only
    wide shuffle is the 16-byte pair distinct."""
    li = _t(spark, sf_dir, "lineitem")
    ps = _supplied_pairs(li)
    p = _t(spark, sf_dir, "part").where(F.col("p_size").isin(15, 30))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    mins = cand.groupBy(F.col("p_partkey").alias("mk_partkey")).agg(
        F.min("s_acctbal").alias("mk_minbal")
    )
    return (
        cand.join(
            F.broadcast(mins),
            (cand.p_partkey == mins.mk_partkey) & (cand.s_acctbal == mins.mk_minbal),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "s_suppkey")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey")
    )


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: priority distribution of orders with at least one
    late-shipped item. The correlated EXISTS is decorrelated by hand into
    witness keys: join lineitem against the date-filtered orders (small by
    the date predicate — AQE turns the sort-merge into a broadcast join at
    runtime, unforced so a wide date window can still shuffle), keep the
    late rows, and distinct the 8-byte orderkeys. The wide lineitem rows
    never enter a shuffle — the direct o⋈li left-semi formulation shuffled
    ALL of lineitem on orderkey (measured 4.5x at the sf0.1→sf1 step;
    this shape is ~flat, 1.0x)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    late_keys = (
        li.join(
            o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey")
        )
        .where(F.datediff("l_shipdate", "o_orderdate") > 60)
        .select("o_orderkey")
        .distinct()
    )
    sel = o.join(late_keys, "o_orderkey", "left_semi")
    return (
        sel.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between two nations by year — the
    supplier-nation × customer-nation revenue matrix for the NATION_3 ↔
    NATION_7 corridor. All four dims broadcast; one shuffle on the 3-column
    grouping key."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7") | (
        F.col("supp_nation") == "NATION_7"
    ) & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dbl(F.sum(_dec2("l_extendedprice") * (1 - _dec2("l_discount")))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_2's share of the ASIA customer market for
    ECONOMY parts, by order year. The share is a conditional-sum ratio inside
    ONE aggregate pass (no second scan); numerator and denominator stay
    DECIMAL-exact until a single final division."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cn = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = _dec2("l_extendedprice") * (1 - _dec2("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cn), o.o_custkey == cn.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                _dbl(
                    F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0).cast("decimal(18,2)")))
                )
                / _dbl(F.sum(vol))
            ).alias("mkt_share"),
            _dbl(F.sum(vol)).alias("total_volume"),
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit on 'red' parts by supplier nation and order
    year. Star join with every dim broadcast, one shuffle on (nation, year)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_dbl(F.sum(_dec2("l_extendedprice") * (1 - _dec2("l_discount")))).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose traded value exceeds 1.4× the mean
    per-part value (a scale-invariant form of Q11's fraction-of-total
    threshold — the absolute fraction shrinks as the part table grows). The
    scalar subquery is a one-row aggregate over the per-part rollup,
    broadcast back via crossJoin — no collect, no second scan of lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_dec2("l_extendedprice") * (1 - _dec2("l_discount"))).alias("__val")
    )
    total = per_part.agg(F.sum("__val").alias("__tot"), F.count("*").alias("__cnt"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(_dbl(F.col("__val")) > 1.4 * (_dbl(F.col("__tot")) / F.col("__cnt")))
        .select("l_partkey", _dbl(F.col("__val")).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of customers by order count, zeros
    included — left outer join then two stacked aggregates. The second
    groupBy runs over at most max-orders-per-customer distinct keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over a quarter.
    The MAX scalar subquery is a one-row aggregate over the per-supplier
    rollup, broadcast back — ties preserved, no window over a single
    unpartitioned ordering."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_dec2("l_extendedprice") * (1 - _dec2("l_discount"))).alias("__rev")
    )
    mx = rev.agg(F.max("__rev").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("__rev") == F.col("__mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            _dbl(F.col("__rev")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def doc_gopher_filter(spark, sf_dir):
    """Full Gopher page-level rule set (Rae et al. 2021 Table A1) as per-doc
    flags (functions/text.py::gopher_quality_flags): word-count bounds, mean
    word length, symbol ratio, bullet/ellipsis line fractions, alpha-word
    fraction, stopword presence, and the conjunction. Pure Catalyst,
    map-side only; every ratio is one int/int division so the DuckDB oracle
    reproduces the doubles exactly."""
    from nbdatatools_spark.functions.text import gopher_quality_flags

    docs = _ts(spark, sf_dir, "documents")  # heavy rule stack (r10)
    return (
        docs.select("doc_id", gopher_quality_flags(F.col("text")).alias("g"))
        .select("doc_id", "g.*")
        .orderBy("doc_id")
    )


def doc_token_entropy(spark, sf_dir):
    """Per-doc unigram Shannon entropy (operators/lm.py::token_entropy) —
    the lexical-diversity quality signal. Digest-keyed count shuffle; 9dp
    decimal-summed c*ln(c) terms; one double expression per doc."""
    from nbdatatools_spark.operators.lm import token_entropy

    docs = _t(spark, sf_dir, "documents")
    return token_entropy(docs).orderBy("doc_id")


def embedding_hard_negatives(spark, sf_dir):
    """Hard-negative mining (similarity.py::hard_negatives): top-5 nearest
    DIFFERENT-label vectors per query. Gate pins impl="expr" (sequential
    fold = DuckDB list_inner_product order); the GEMM label-mask kernel is
    the scale path, differential-tested in tests/test_ann_recall.py."""
    from nbdatatools_spark.operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 16)
    pairs = hard_negatives(q, emb, k=5, impl="expr")
    return pairs.select(
        "query_id", "rank", "base_id", (F.round("distance", 6) + 0.0).alias("distance")
    )


def embedding_dim_quantiles(spark, sf_dir):
    """Exact per-dimension quartiles (analysis.py::dim_quantiles) — the
    distribution companion to dim_moments. One (dim, value) shuffle, exact
    sort-based percentile with SQL-standard interpolation."""
    from nbdatatools_spark.operators.analysis import dim_quantiles

    emb = _t(spark, sf_dir, "embeddings")
    return dim_quantiles(emb, vec="embedding")


def embedding_winsorize(spark, sf_dir):
    """Per-dim winsorization (analysis.py::winsorize_vectors): clip every
    component into its dimension's exact [p1, p99] range. One d-row
    quantile pass; the clip is a shuffle-free literal-array projection.
    Gate shape: posexploded to (vec_id, dim, clipped) scalar rows — the
    driver's pandas canonicalizer cannot hash list cells."""
    from nbdatatools_spark.operators.analysis import winsorize_vectors

    emb = _t(spark, sf_dir, "embeddings")
    return (
        winsorize_vectors(emb, lo_q=0.01, hi_q=0.99)
        .select("vec_id", F.posexplode("clipped").alias("dim", "clipped"))
        .orderBy("vec_id", "dim")
    )


def doc_readability(spark, sf_dir):
    """Flesch-Kincaid readability (text.py::readability_stats): portable
    vowel-group syllable heuristic, sentinel sentence split; all-integer
    counts, two divisions, one linear combination — engine-exact at 6dp."""
    from nbdatatools_spark.functions.text import readability_stats

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", readability_stats(F.col("text")).alias("r"))
        .select("doc_id", "r.*")
        .orderBy("doc_id")
    )


def events_funnel_steps(spark, sf_dir):
    """Generalized 3-step funnel (temporal.py::funnel_steps): view -> click
    -> purchase within 7 days of the first view; strict temporal order with
    (ts, event_id) tie-break. Each stage is a per-user keyed min on one
    user partitioning; raw events shuffle once per stage projection."""
    from nbdatatools_spark.operators.temporal import funnel_steps

    ev = _t(spark, sf_dir, "events")
    return funnel_steps(
        ev, steps=["view", "click", "purchase"], within_seconds=7 * 86400
    )


def events_trending(spark, sf_dir):
    """Trending items: top-3 event types per daily window by count, dense
    rank with (count DESC, type) ties. One map-side-combinable (day, type)
    aggregate; the rank window runs over the aggregated rows (≤ days×types),
    never raw events."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("day").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .orderBy("day", "rank")
    )


def events_weekly_deltas(spark, sf_dir):
    """Week-over-week reporting: weekly event counts and value sums with
    lag deltas and a percent change (one double division, 6dp). The lag
    window runs over the weekly rollup (handful of rows), partitioned by
    event_type so no single-reducer hazard."""
    ev = _t(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _dbl(F.sum(F.round("value", 6).cast("decimal(20,6)"))).alias("total_value"),
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("n").over(w)
    return weekly.select(
        "week",
        "event_type",
        "n",
        "total_value",
        (F.col("n") - F.coalesce(prev, F.col("n"))).alias("delta_n"),
        F.round(
            F.when(prev.isNull() | (prev == 0), F.lit(0.0)).otherwise(
                (F.col("n") - prev).cast("double") / prev
            ),
            6,
        ).alias("pct_change"),
    ).orderBy("event_type", "week")


def embedding_bq_hamming(spark, sf_dir):
    """Binary-quantization scan (similarity.py::bq_topk): sign-bit packed
    codes (d/64 bigint words, two's-complement bit 63), top-5 by Hamming
    with (hamming, base_id) ties. The base side streams past a broadcast
    query-code block touching d/8 bytes per vector."""
    from nbdatatools_spark.operators.similarity import bq_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    return bq_topk(q, emb, k=5, dim=64).orderBy("query_id", "rank")


def embedding_matryoshka(spark, sf_dir):
    """Matryoshka prefix truncation (similarity.py::truncate_embeddings):
    first 16 dims, re-normalized to unit L2. Pure projection — slice + one
    fold per row; 6dp rounding after one division per element. Gate
    shape: posexploded to (vec_id, dim, value) scalar rows — the driver's
    pandas canonicalizer cannot hash list cells."""
    from nbdatatools_spark.operators.similarity import truncate_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    return (
        truncate_embeddings(emb, dims=16)
        .select("vec_id", F.posexplode("embedding").alias("dim", "value"))
        .orderBy("vec_id", "dim")
    )


def doc_sentence_stats(spark, sf_dir):
    """Per-doc sentence structure (text.py::sentence_stats): count, mean
    words per sentence, terminal-punctuation fraction. Sentinel-split
    segmentation (group-reference replacement then split — portable to
    RE2, which lacks lookbehind); map-side only."""
    from nbdatatools_spark.functions.text import sentence_stats

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", sentence_stats(F.col("text")).alias("s"))
        .select("doc_id", "s.*")
        .orderBy("doc_id")
    )


def doc_config_pipeline(spark, sf_dir):
    """Declarative pipeline-as-config (plans/pipeline.py::run_pipeline):
    the curation chain [lang_filter -> quality_filter -> exact_dedup ->
    split -> token_stats] expressed as a step list (loadable from YAML),
    composed into ONE lazily-planned frame. The oracle replays the same
    composition from the individual steps' SQL fragments — hash equality
    proves the runner composes exactly."""
    from nbdatatools_spark.plans.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents")
    steps = [
        {"op": "lang_filter", "langs": ["en"]},
        {"op": "quality_filter", "min_score": 0.3},
        {"op": "exact_dedup"},
        {"op": "split", "fractions": [0.8, 0.1, 0.1]},
        {"op": "token_stats"},
    ]
    out, _report = run_pipeline(docs, steps)
    return out.select("doc_id", "split", "n_tokens").orderBy("doc_id")


def events_cooccurrence(spark, sf_dir):
    """Market-basket co-occurrence with lift (analysis.py::
    cooccurrence_stats): users as baskets, event types as items. One
    (user, type) distinct; pair join keyed on user; lift arithmetic on
    pair-cardinality rows."""
    from nbdatatools_spark.operators.analysis import cooccurrence_stats

    ev = _t(spark, sf_dir, "events")
    return cooccurrence_stats(ev, basket_col="user_id", item_col="event_type")


def doc_group_percent_rank(spark, sf_dir):
    """Within-group score normalization (analysis.py::group_percent_rank):
    percent rank of engine-exact rounded quality inside each source group.
    Groups partition the window — per-task state is one group's rows."""
    from nbdatatools_spark.operators.analysis import group_percent_rank

    docs = _t(spark, sf_dir, "documents")
    slim = docs.select(
        "doc_id", "source", F.round(quality_score(F.col("text")), 6).alias("quality")
    )
    return group_percent_rank(slim, ["source"], "quality").orderBy("doc_id")


def events_ab_test(spark, sf_dir):
    """Two-proportion A/B readout (analysis.py::ab_test_report): synthetic
    3-way split on user_id % 3, conversion = any purchase event. One
    user-grain aggregate then variant-level counts; pooled-variance z with
    an A-S-erf two-sided p-value (4dp: exp's last ulp is libm-dependent,
    the ks gate discipline)."""
    from nbdatatools_spark.operators.analysis import ab_test_report

    ev = _t(spark, sf_dir, "events")
    variant = F.concat(F.lit("v"), (F.col("user_id") % 3).cast("string"))
    return ab_test_report(ev, variant, F.col("event_type") == "purchase")


def doc_entity_resolution(spark, sf_dir):
    """End-to-end entity resolution: blocked edit-distance pairing
    (dedup.py::edit_distance_pairs — O(n²) confined to (lang, source)
    blocks) -> exact transitive clusters (connected_components: min-label
    propagation over the pair graph, 8-byte-key joins) -> quality-based
    survivorship (max_by on (quality, -id): best quality wins, ties to the
    lowest id). One lazily-planned chain, the doc_training_pipeline
    composition discipline; the oracle replays the whole chain incl. a
    RECURSIVE reachability CTE."""
    from nbdatatools_spark.operators.dedup import connected_components, edit_distance_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = edit_distance_pairs(docs, max_distance=45)
    comp = connected_components(pairs)
    labeled = (
        docs.select("doc_id", F.round(quality_score(F.col("text")), 6).alias("quality"))
        .join(comp, F.col("doc_id") == comp.id, "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster"),
            "quality",
        )
    )
    best = labeled.groupBy("cluster").agg(
        F.max_by(
            "doc_id",
            F.struct(F.col("quality").alias("q"), (-F.col("doc_id")).alias("nid")),
        ).alias("__survivor")
    )
    return (
        labeled.join(F.broadcast(best), "cluster")
        .select(
            "doc_id",
            "cluster",
            (F.col("doc_id") == F.col("__survivor")).alias("survivor"),
            "quality",
        )
        .orderBy("doc_id")
    )


def events_multi_touch(spark, sf_dir):
    """Multi-touch attribution (temporal.py::multi_touch_attribution):
    linear credit split of purchase value across view/click touches in the
    prior 24h; unmatched conversions credit 'direct' in full (conservation:
    total credit == total converted value). One user-keyed equi-join; the
    per-conversion windows reuse its partitioning."""
    from nbdatatools_spark.operators.temporal import multi_touch_attribution

    ev = _t(spark, sf_dir, "events")
    return multi_touch_attribution(
        ev, conversion_type="purchase", touch_types=("view", "click"),
        lookback_seconds=86400, model="linear",
    )


def orders_incremental_agg(spark, sf_dir):
    """Incremental view maintenance (cdc.py::incremental_agg_update): update
    a per-status (count, revenue) aggregate under the same upsert/delete
    batch as orders_apply_changes WITHOUT rescanning the merged snapshot —
    signed delta algebra over the change keys only. The oracle recomputes
    from scratch on the post-merge snapshot: the two paths share no code,
    so the hash match proves the incremental identity itself."""
    from nbdatatools_spark.operators.cdc import incremental_agg_update

    o = _t(spark, sf_dir, "orders")
    target = o.where(F.col("o_orderdate") < "2000-01-01").select(
        "o_orderkey", "o_orderstatus", _dec2("o_totalprice").alias("price")
    )
    upserts = (
        o.where(F.col("o_orderdate") >= "2000-01-01")
        .select(
            "o_orderkey",
            "o_orderstatus",
            (_dec2("o_totalprice") * F.lit(2).cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("price"),
        )
        .withColumn("op", F.lit("upsert"))
    )
    deletes = (
        o.where((F.col("o_orderdate") < "2000-01-01") & (F.col("o_orderkey") % 37 == 0))
        .select("o_orderkey", "o_orderstatus", _dec2("o_totalprice").alias("price"))
        .withColumn("op", F.lit("delete"))
    )
    changes = upserts.unionByName(deletes)
    state = target.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("price").alias("price")
    )
    out = incremental_agg_update(
        state,
        target,
        changes,
        group_cols=["o_orderstatus"],
        key_cols=["o_orderkey"],
        sum_cols=["price"],
    )
    return out.select(
        "o_orderstatus", "n", _dbl(F.col("price")).alias("revenue")
    ).orderBy("o_orderstatus")


def embedding_psi_drift(spark, sf_dir):
    """Per-dim Population Stability Index (analysis.py::embedding_psi)
    between the first 250 vectors (baseline) and the rest (current) — the
    production drift monitor. Two map-side bin projections union into ONE
    uniform (dim, bin) groupBy; 9dp decimal-summed smoothing terms."""
    from nbdatatools_spark.operators.analysis import embedding_psi

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_psi(
        emb.where(F.col("vec_id") < 250),
        emb.where(F.col("vec_id") >= 250),
        vec="embedding",
        n_bins=10,
        lo=-4.0,
        hi=4.0,
    )


def orders_apply_changes(spark, sf_dir):
    """MERGE INTO semantics (cdc.py::apply_changes): apply a change batch
    (upserts = post-cutoff orders with re-priced totals, deletes = a keyed
    subset) to the pre-cutoff snapshot; one anti-join (AQE broadcasts the
    delta) + unionByName. Emits the new snapshot keyed rows."""
    from nbdatatools_spark.operators.cdc import apply_changes

    o = _t(spark, sf_dir, "orders")
    target = o.where(F.col("o_orderdate") < "2000-01-01").select(
        "o_orderkey", "o_orderstatus", _dbl(_dec2("o_totalprice")).alias("o_totalprice")
    )
    upserts = (
        o.where(F.col("o_orderdate") >= "2000-01-01")
        .select(
            "o_orderkey",
            "o_orderstatus",
            _dbl(_dec2("o_totalprice") * F.lit(2).cast("decimal(18,2)")).alias("o_totalprice"),
        )
        .withColumn("op", F.lit("upsert"))
    )
    deletes = (
        o.where((F.col("o_orderdate") < "2000-01-01") & (F.col("o_orderkey") % 37 == 0))
        .select("o_orderkey", "o_orderstatus", _dbl(_dec2("o_totalprice")).alias("o_totalprice"))
        .withColumn("op", F.lit("delete"))
    )
    changes = upserts.unionByName(deletes)
    return apply_changes(target, changes, ["o_orderkey"]).orderBy("o_orderkey")


def events_scd2_history(spark, sf_dir):
    """SCD Type-2 history (cdc.py::scd2_history) over three 10-day activity
    snapshots of the events table: per-user (n_events, top_type) attribute
    runs become half-open validity intervals; absence from a snapshot
    closes the interval (gap = delete + re-insert). One key shuffle carries
    lag/run-number/rollup/lead; the snapshot calendar broadcasts."""
    from nbdatatools_spark.operators.cdc import scd2_history

    ev = _t(spark, sf_dir, "events")
    snaps = ev.groupBy(
        "user_id",
        (F.floor((F.dayofmonth("ts") - 1) / 10) + 1).cast("int").alias("snap"),
    ).agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.max("event_type").alias("top_type"),
    )
    out = scd2_history(snaps, ["user_id"], "snap")
    return out.select(
        "user_id",
        "n_ev",
        "top_type",
        "valid_from",
        "valid_to",
        "is_current",
    ).orderBy("user_id", "valid_from")


def q12_lateness_priority(spark, sf_dir):
    """TPC-H Q12 shape (no shipmode column -> lateness buckets): count
    high- vs low-priority orders per shipping-lag bucket. The CASE sums run
    inside one aggregate pass; the orders dim broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lag = F.datediff("l_shipdate", "o_orderdate")
    bucket = (
        F.when(lag > 90, "very_late").when(lag > 30, "late").otherwise("ontime")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size) over
    the derived supplier-part relation, excluding one brand, one type, and
    suppliers with negative balance (NOT IN -> broadcast anti-join)."""
    li = _t(spark, sf_dir, "lineitem")
    ps = _supplied_pairs(li)
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders for one brand were dropped. The correlated per-part AVG
    decorrelates into a per-part aggregate broadcast back onto lineitem —
    lineitem is scanned twice but never shuffled wide (the avg table is
    |part| rows)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    avg_qty = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("aq_partkey"))
        .agg((_dbl(F.sum(_dec2("l_quantity"))) / F.count("*")).alias("aq_avg"))
    )
    return (
        li.join(F.broadcast(avg_qty), li.l_partkey == F.col("aq_partkey"))
        .where(F.col("l_quantity") < 0.5 * F.col("aq_avg"))
        .agg((_dbl(F.sum(_dec2("l_extendedprice"))) / F.lit(7.0)).alias("avg_yearly"))
    )


def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under a disjunction of three brand/size/
    quantity conjunctions. The whole predicate is a single Catalyst filter
    over the broadcast part join — each disjunct prunes on both join sides
    (partkey filter pushes to the part scan, quantity to lineitem)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.where(cond).agg(
        _dbl(F.sum(_dec2("l_extendedprice") * (1 - _dec2("l_discount")))).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q20_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who moved a significant volume of 'small'
    parts in 1997 — nested semi-joins (supplier ⊂ qualifying pairs ⊂
    filtered parts) with a per-pair HAVING threshold. The per-(supp, part)
    rollup shuffles two 8-byte keys + one decimal."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("small"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    qualifying = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec2("l_quantity")).alias("__qty"))
        .where(F.col("__qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


def q21_late_sole_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
    multi-supplier finished order. The EXISTS/NOT-EXISTS pair collapses into
    per-order aggregates — equivalent semantics without two correlated
    self-joins of lineitem. The (order, supplier) pre-aggregate replaces a
    double countDistinct, which would Expand every row 3x for the two
    distinct aggregates; per-pair max(late) then plain count/sum gets the
    same numbers with map-side combine at every step."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    flagged = (
        li.join(F.broadcast(o.select("o_orderkey", "o_orderdate")), li.l_orderkey == F.col("o_orderkey"))
        .withColumn("__late", (F.datediff("l_shipdate", "o_orderdate") > 60).cast("int"))
    )
    per_pair = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("__late").alias("__late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_supp"),
        F.sum("__late").alias("__n_late"),
    )
    culprits = (
        per_pair.where(F.col("__late") == 1)
        .join(
            per_order.where((F.col("__n_supp") > 1) & (F.col("__n_late") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
    )
    return (
        culprits.join(F.broadcast(s), culprits.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: well-funded customers with no recent orders, by
    nation. Global scalar AVG (one-row broadcast) + anti-join against the
    recent-orders keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= "2000-08-01")
    n = _t(spark, sf_dir, "nation")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (_dbl(F.sum(_dec2("c_acctbal"))) / F.count("*")).alias("__avg")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            _dbl(F.sum(_dec2("c_acctbal"))).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def corpus_pmi_bigrams(spark, sf_dir):
    """Top-50 PMI collocations (lm.py::pmi_bigrams, Church & Hanks 1990):
    adjacent-pair mutual information over the corpus — the boilerplate /
    collocation detector. Vocab-keyed aggregates + two equi-joins +
    TakeOrderedAndProject; totals are two bounded driver scalars (the
    bm25 pattern). pmi = round(ln of exact integer ratios, 6)."""
    from nbdatatools_spark.operators.lm import pmi_bigrams

    return pmi_bigrams(_t(spark, sf_dir, "documents"), min_count=5, top_k=50).select(
        F.col("left").alias("w1"),
        F.col("right").alias("w2"),
        "n_pair",
        "pmi",
        "rank",
    )


def corpus_zipf_fit(spark, sf_dir):
    """Zipf rank-frequency fit (analysis.py::zipf_fit): least-squares
    ln(freq)~ln(rank) over the top-500 vocabulary — one-row corpus-health
    readout (slope/intercept/R^2). Partial top-k feeds a <=500-row rank
    window; regression terms 9dp-rounded and DECIMAL-summed."""
    from nbdatatools_spark.operators.analysis import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"), top_v=500, min_count=2)


def doc_winnow_pairs(spark, sf_dir):
    """Partial-duplicate candidates via winnowing fingerprint overlap
    (dedup.py::winnow_candidate_pairs, the MOSS join): fingerprint
    equi-join with a hot-bucket cap — never doc x doc. Docs sharing >= 3
    selected fingerprints (shared substrings >= k+w-1 chars each)."""
    from nbdatatools_spark.operators.dedup import winnow_candidate_pairs

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return winnow_candidate_pairs(
        docs, k=5, w=4, min_shared=3, max_bucket=200, portable=True
    ).orderBy("id_a", "id_b")


def doc_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity tiers (lm.py::perplexity_buckets,
    Wenzek et al. 1911.00359 §4.3): bigram-LM score every doc, rank via
    the two-phase partition-offset global index (no single-reducer
    window), cut into 3 equal-count tiers with pure integer arithmetic
    (nb*rank DIV n — no double-boundary hazard)."""
    from nbdatatools_spark.operators.lm import perplexity_buckets

    return perplexity_buckets(_t(spark, sf_dir, "documents"), n_buckets=3).orderBy(
        "doc_id"
    )


def corpus_source_overlap(spark, sf_dir):
    """Cross-slice contamination matrix (dedup.py::source_overlap_matrix):
    distinct shared word 5-grams + gram-set Jaccard for every source pair.
    Grams shuffle as xxhash64 digests only; the overlap join is
    digest-keyed with per-digest buckets bounded by |slices|."""
    from nbdatatools_spark.operators.dedup import source_overlap_matrix

    return source_overlap_matrix(
        _t(spark, sf_dir, "documents"), group_col="source", n=5
    ).orderBy("slice_a", "slice_b")


def doc_remove_dup_spans(spark, sf_dir):
    """ExactSubstr duplicated-span removal (dedup.py::remove_duplicate_spans,
    Lee et al. 2107.06499): every 13-token window occurring >= 2 times in
    the corpus is cut from every doc; kept tokens re-joined. Digest-keyed
    count + one digest equi-join; per-doc mask via sort-based
    array_except."""
    from nbdatatools_spark.operators.dedup import remove_duplicate_spans

    return remove_duplicate_spans(
        _t(spark, sf_dir, "documents"), k=13, min_occurrences=2
    ).orderBy("doc_id")


def doc_dedup_cluster_sizes(spark, sf_dir):
    """Near-dup cluster-size histogram (dedup.py::dedup_cluster_sizes):
    LSH candidates -> Jaccard verify -> connected components -> per-size
    cluster counts (singletons included). The pre-dedup audit of how the
    duplicate mass distributes. Oracle replays the chain incl. RECURSIVE
    reachability, then the same two aggregates."""
    from nbdatatools_spark.operators.dedup import dedup_cluster_sizes

    return dedup_cluster_sizes(
        _t(spark, sf_dir, "documents"),
        num_hashes=32,
        bands=8,
        shingle_size=5,
        threshold=0.5,
        impl="md5",
    ).orderBy("cluster_size")


def doc_token_budget_select(spark, sf_dir):
    """Best-first selection under a global token budget
    (sampling.py::token_budget_select): rank by (quality DESC, doc_id),
    two-phase partition-offset cumsum lays the global token stream, keep
    the whole-document prefix fitting 10k tokens. The 'best N tokens'
    assembly step of a curation run."""
    from nbdatatools_spark.functions.text import quality_score, token_count
    from nbdatatools_spark.operators.sampling import token_budget_select

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return token_budget_select(
        docs, 10_000, quality_col="quality", token_col="n_tokens"
    ).orderBy("doc_id")


def events_pagerank(spark, sf_dir):
    """Weighted PageRank over the event-type transition graph
    (graph.py::pagerank, 10 fixed power steps, damping 0.85): which states
    accumulate journey mass. Each step is one edge-keyed join + one
    dst-keyed aggregate — the web-scale power-iteration shape. 9dp
    DECIMAL-summed contributions make every rank bit-replayable; the
    oracle chains 10 explicit iteration CTEs."""
    from nbdatatools_spark.operators.graph import pagerank

    edges = events_transition_counts(spark, sf_dir)
    pr = pagerank(
        edges, src="from_type", dst="to_type", weight="n_transitions",
        damping=0.85, iterations=10,
    )
    return pr.select(
        F.col("node").alias("event_type"), F.round("rank", 6).alias("rank")
    ).orderBy("event_type")


def doc_tfidf_topterms(spark, sf_dir):
    """Per-document tf-idf keywords (analysis.py::tfidf_top_terms): ONE
    (doc, token) tf pass + vocab-sized df aggregate + per-doc top-3
    ranking window (per-task state = one doc's vocabulary). score =
    round(tf * round(ln(N/df), 9), 6), ties on token ASC."""
    from nbdatatools_spark.operators.analysis import tfidf_top_terms

    return tfidf_top_terms(
        _t(spark, sf_dir, "documents"), top_k=3, min_df=2
    ).orderBy("doc_id", "rank")


def corpus_packing_report(spark, sf_dir):
    """Packing-parameter tuning readout (packing.py::packing_report): per
    candidate sequence length, the sequence count / padding waste /
    oversized-doc exposure of a concat-then-chunk run — ONE map-side
    aggregate, closed-form rows."""
    from nbdatatools_spark.functions.text import token_count
    from nbdatatools_spark.operators.packing import packing_report

    docs = _t(spark, sf_dir, "documents").select(
        token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return packing_report(docs, [128, 256, 512]).orderBy("max_tokens")


def doc_curriculum_interleave(spark, sf_dir):
    """Deterministic stratified training order
    (sampling.py::curriculum_interleave): round-robin across lang tiers —
    within-tier ranks from ONE two-phase global index minus per-tier
    offsets, final position a second two-phase index over the integer
    interleave key. Pure-integer output, bit-replayable."""
    from nbdatatools_spark.operators.sampling import curriculum_interleave

    return curriculum_interleave(
        _t(spark, sf_dir, "documents").select("doc_id", "lang"), tier_col="lang"
    ).orderBy("training_pos")


def embedding_outliers(spark, sf_dir):
    """Top-20 diagonal-Mahalanobis embedding outliers
    (analysis.py::mahalanobis_outliers): d-row moment fit + broadcast
    join + per-vector DECIMAL-summed z² + TakeOrderedAndProject."""
    from nbdatatools_spark.operators.analysis import mahalanobis_outliers

    return mahalanobis_outliers(
        _t(spark, sf_dir, "embeddings"), top_k=20
    ).orderBy("rank")


def doc_winnow_verify(spark, sf_dir):
    """Winnowing detect -> verify (dedup.py::winnow_verify): candidate
    pairs scored by fingerprint overlap coefficient |A∩B|/min(|A|,|B|),
    kept at >= 0.6 — the MOSS containment verdict the fingerprint join
    only approximates. Pair-keyed joins; never doc x doc."""
    from nbdatatools_spark.operators.dedup import winnow_verify

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return winnow_verify(
        docs, k=5, w=4, min_shared=3, max_bucket=200, min_overlap=0.6,
        portable=True,
    ).orderBy("id_a", "id_b")


def doc_langid_eval(spark, sf_dir):
    """Lang-ID confusion matrix (functions.text.detect_lang vs the
    ground-truth lang label): the evaluation readout for the marker-word
    heuristic — per (label, predicted) doc counts. Pure map-side scoring
    + one small groupBy; ties in the per-language scores break toward
    the larger language code (array_max struct semantics, replicated by
    the oracle's struct max)."""
    from nbdatatools_spark.functions.text import detect_lang

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("label"),
            detect_lang(F.col("text")).alias("predicted"),
        )
        .groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("label", "predicted")
    )


def embedding_lloyd_kmeans(spark, sf_dir):
    """Deterministic fixed-iteration Lloyd k-means (clustering.py::
    lloyd_fixed_iterations, k=8, 2 iterations): init = 8 smallest vec_ids
    (6dp), assignment = map-side argmin over broadcast-literal centroids
    on (round(l2,6), cid), means = 9dp-DECIMAL sums rounded to 6dp. The
    oracle unrolls both iterations as CTE chains with the SAME sequential
    zip-fold distance (list_reduce), so every assignment replays
    bit-for-bit. Per-iteration bill: one projection + one (cid,dim)
    aggregate; driver state = k*d means."""
    from nbdatatools_spark.operators.clustering import lloyd_fixed_iterations

    emb = _t(spark, sf_dir, "embeddings")
    return lloyd_fixed_iterations(emb, k=8, iterations=2)


def embedding_sq8_error(spark, sf_dir):
    """Per-dimension SQ8 reconstruction-error audit (similarity.py::
    sq8_error_report): quantize-dequantize round trip vs the affine
    quantizer's span/510 guarantee. One bounded (dim) min/max pass, one
    map-side encode+decode projection, one (dim) aggregate with
    DECIMAL-exact MSE."""
    from nbdatatools_spark.operators.similarity import sq8_error_report

    emb = _t(spark, sf_dir, "embeddings")
    return sq8_error_report(emb)


def events_seasonal_decompose(spark, sf_dir):
    """Classical additive trend/seasonal/residual decomposition of the
    daily event-count series (temporal.py::seasonal_decompose): centered
    7-day moving-average trend, per-weekday DECIMAL-mean seasonal,
    residual. Windows run over the DATE-grain series (calendar-bounded
    state), never raw events."""
    from nbdatatools_spark.operators.temporal import seasonal_decompose

    ev = _t(spark, sf_dir, "events")
    return seasonal_decompose(ev)


def events_cusum_change(spark, sf_dir):
    """One-sided CUSUM change detection on daily counts (temporal.py::
    cusum_changepoints): the sequential recursion re-expressed CLOSED-FORM
    as cumsum minus running-min — two plain windows over the date-grain
    series, DECIMAL-exact running sum, no stateful scan."""
    from nbdatatools_spark.operators.temporal import cusum_changepoints

    ev = _t(spark, sf_dir, "events")
    return cusum_changepoints(ev)


def events_mad_outliers(spark, sf_dir):
    """Robust per-type outlier accounting via Median Absolute Deviation
    (temporal.py::mad_outliers): med/mad from exact interpolated
    percentile(0.5) (DuckDB quantile_cont semantics), flags at 3*1.4826
    sigma-equivalents. Two keyed percentile aggregates + one map-side
    flag pass."""
    from nbdatatools_spark.operators.temporal import mad_outliers

    ev = _t(spark, sf_dir, "events")
    return mad_outliers(ev)


def events_concurrency(spark, sf_dir):
    """Sweep-line interval-overlap counting (temporal.py::
    interval_concurrency): each event occupies [ts, ts+10min); +1/-1
    boundary deltas, ends-before-starts tie order, ONE time-ordered
    running sum -> max concurrency per hour. The classic
    interval-scheduling primitive as two windows."""
    from nbdatatools_spark.operators.temporal import interval_concurrency

    ev = _t(spark, sf_dir, "events")
    return interval_concurrency(ev, duration_minutes=10, bucket="hour")


def events_triangle_count(spark, sf_dir):
    """Triangle census of the user co-visitation graph (graph.py::
    cooccurrence_edges + triangle_stats): edges join users sharing >= 3
    distinct (event_type, hour) buckets, buckets capped at 100 users
    (the LSH max_bucket discipline); DEGREE-ordered orientation bounds
    the wedge join by sqrt(2m) out-degree. One-row census with the
    global clustering coefficient."""
    from nbdatatools_spark.operators.graph import cooccurrence_edges, triangle_stats

    ev = _t(spark, sf_dir, "events")
    occ = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
    )
    edges = cooccurrence_edges(
        occ, ["event_type", "h"], "user_id", max_bucket=100, min_support=3
    )
    return triangle_stats(edges, src="src", dst="dst")


def doc_dataset_card(spark, sf_dir):
    """Per-source dataset card (analysis.py::dataset_card): the
    datasheet summary a training-data release ships — volume, token
    stats, exact-dup rate (md5-digest discipline), language-mix entropy
    (DECIMAL-summed), punctuation profile. Two keyed aggregates joined
    on the slice key."""
    from nbdatatools_spark.operators.analysis import dataset_card

    docs = _t(spark, sf_dir, "documents")
    return dataset_card(docs)


def doc_rake_keyphrases(spark, sf_dir):
    """Corpus RAKE keyphrase extraction (analysis.py::rake_keyphrases):
    stopword- AND punctuation-run segmentation (punctuation runs become
    sentinel boundary tokens, so phrases never span sentence boundaries
    — ADVICE r6) via ONE per-doc window, integer degree/frequency word
    scores, DECIMAL-summed phrase scores, top-25
    TakeOrderedAndProject."""
    from nbdatatools_spark.operators.analysis import rake_keyphrases

    docs = _t(spark, sf_dir, "documents")
    return rake_keyphrases(docs, top_n=25)


def doc_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities (lm.py::
    kneser_ney_bigrams, d=0.75): continuation-count smoothing, the
    KenLM-default upgrade over add-k. All-integer model tables joined
    digest-keyed; ONE fixed-shape double expression per bigram; top-20
    by probability."""
    from nbdatatools_spark.operators.lm import kneser_ney_bigrams

    docs = _t(spark, sf_dir, "documents")
    return kneser_ney_bigrams(docs, discount=0.75, top_n=20)


def doc_minhash_calibration(spark, sf_dir):
    """MinHash estimator calibration (dedup.py::minhash_calibration,
    impl="md5"): estimated vs exact Jaccard + absolute error on every
    banded LSH candidate pair — quantifies how tight num_hashes=32 is on
    THIS corpus. The full signature/banding chain and both ratios replay
    in the oracle bit-for-bit."""
    from nbdatatools_spark.operators.dedup import minhash_calibration

    docs = _t(spark, sf_dir, "documents")
    return minhash_calibration(
        docs, num_hashes=32, bands=8, shingle_size=5, impl="md5"
    )


def doc_ipf_balance(spark, sf_dir):
    """Iterative proportional fitting of (lang x source) sampling
    weights toward uniform marginals (sampling.py::ipf_weights, 2
    rounds): the two-constraint generalization of domain_cap. One
    corpus-grain aggregate, then bounded cell-table iterations with
    DECIMAL-exact marginal sums."""
    from nbdatatools_spark.operators.sampling import ipf_weights

    docs = _t(spark, sf_dir, "documents")
    return ipf_weights(docs, row_col="lang", col_col="source", iterations=2)


def embedding_whiten(spark, sf_dir):
    """ZCA whitening of the first 16 embedding dims (analysis.py::
    zca_whiten): covariance -> driver eigh -> literal-matrix projection.
    Pinned-invariant oracle gate (the embedding_pca pattern): the
    eigensolve is not SQL-expressible, so the gate hashes the SQL-
    checkable covariance trace (real hash bite) plus booleans only a
    correct whitening satisfies — per-dim var_pop(w_j) == 1, pairwise
    covar_pop == 0, mean == 0. The raw transform keeps its numpy
    differential in tests/test_round6b_ops."""
    from nbdatatools_spark.operators.analysis import zca_whiten

    emb = _t(spark, sf_dir, "embeddings")
    wdf, evals = zca_whiten(emb, "embedding", dims=16, eps=1e-9)
    aggs = [F.count(F.lit(1)).alias("n")]
    for j in range(16):
        aggs.append(F.var_pop(f"w{j}").alias(f"vp{j}"))
        aggs.append(F.avg(f"w{j}").alias(f"mu{j}"))
    aggs.append(F.covar_pop("w0", "w1").alias("c01"))
    aggs.append(F.covar_pop("w2", "w9").alias("c29"))
    st = wdf.agg(*aggs).first()
    trace = (
        emb.select(F.posexplode(F.slice("embedding", 1, 16)).alias("dim", "x"))
        .select("dim", F.col("x").cast("double").alias("x"))
        .groupBy("dim")
        .agg(
            F.round(
                F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x"), 9
            ).alias("var")
        )
        .agg(
            F.round(
                F.sum(F.col("var").cast("decimal(20,9)")).cast("double"), 6
            ).alias("trace")
        )
        .first()["trace"]
    )
    unit_var = all(abs(float(st[f"vp{j}"]) - 1.0) < 1e-3 for j in range(16))
    zero_mean = all(abs(float(st[f"mu{j}"])) < 1e-6 for j in range(16))
    decorr = abs(float(st["c01"])) < 1e-6 and abs(float(st["c29"])) < 1e-6
    evals_pos = all(v > 0 for v in evals[:16])
    row = [
        (
            int(st["n"]),
            float(trace),
            bool(unit_var),
            bool(zero_mean),
            bool(decorr),
            bool(evals_pos),
        )
    ]
    return spark.createDataFrame(
        row,
        "n_vectors bigint, trace double, unit_variance boolean, "
        "zero_mean boolean, decorrelated boolean, evals_positive boolean",
    )


def embedding_jl_projection(spark, sf_dir):
    """Johnson-Lindenstrauss projection audit (analysis.py::jl_project,
    64 -> 16 dims): the projection matrix derives every entry from
    md5 + Box-Muller (content-addressed, engine-independent), so the
    ORACLE REBUILDS THE WHOLE MATRIX and replays the projection — a
    fully SQL-replicable randomized algorithm. Gate output: per fixed
    pair (vec_id, vec_id+1, id % 5 == 0), original vs projected
    euclidean distance and their ratio (the JL distortion)."""
    from nbdatatools_spark.operators.analysis import jl_project

    emb = _t(spark, sf_dir, "embeddings")
    proj = jl_project(emb, "embedding", out_dim=16, dims=64, seed=42)
    a = proj.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__va"),
        F.col("projected").alias("__pa"),
    ).where(F.col("id_a") % 5 == 0)
    b = proj.select(
        (F.col("vec_id") - 1).alias("id_a"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__vb"),
        F.col("projected").alias("__pb"),
    )
    fold = lambda u, v: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(u, v, lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double"))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        a.join(b, "id_a")
        .select(
            "id_a",
            "id_b",
            F.round(fold(F.col("__va"), F.col("__vb")), 6).alias("orig_dist"),
            F.round(fold(F.col("__pa"), F.col("__pb")), 6).alias("proj_dist"),
        )
        .withColumn(
            "ratio",
            F.when(
                F.col("orig_dist") > 0,
                F.round(F.col("proj_dist") / F.col("orig_dist"), 6),
            ),
        )
        .orderBy("id_a")
    )


def events_scd2_pit(spark, sf_dir):
    """Point-in-time (AS OF) fact join against the SCD2 dimension
    (cdc.py::pit_join over cdc.py::scd2_history): purchase activity per
    (user, snapshot) joins the dimension version valid AT that snapshot
    — the warehouse-classic "facts see the dim as it was". The as-of
    union-tag carry does it in ONE keyed shuffle; the oracle joins the
    disjoint validity intervals directly. Output: per (snap, version
    top_type) purchase totals."""
    from nbdatatools_spark.operators.cdc import pit_join

    ev = _t(spark, sf_dir, "events")
    dim = events_scd2_history(spark, sf_dir)
    facts = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            (F.floor((F.dayofmonth("ts") - 1) / 10) + 1)
            .cast("int")
            .alias("snap"),
        )
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    joined = pit_join(
        facts,
        dim.select("user_id", "n_ev", "top_type", "valid_from", "valid_to"),
        keys=["user_id"],
        time_col="snap",
        values=("n_ev", "top_type"),
    )
    return (
        joined.groupBy("snap", F.col("dim_top_type").alias("version_top_type"))
        .agg(
            F.sum("n_purchases").cast("bigint").alias("n_purchases"),
            F.count(F.lit(1)).alias("n_users"),
        )
        .orderBy("snap", "version_top_type")
    )


def doc_contrastive_pairs(spark, sf_dir):
    """Contrastive training-pair mining (packing.py::
    contrastive_chunk_pairs, 32-token disjoint chunks): anchor/positive
    = adjacent chunks of one document, negative = first chunk of the
    next chunk-bearing document (deterministic, never same-doc — a
    single-chunked-doc corpus emits NULL negatives instead of wrapping
    to itself). One equi-self-join on (doc, chunk_id+1) plus a
    doc-grain lead window."""
    from nbdatatools_spark.operators.packing import contrastive_chunk_pairs

    docs = _t(spark, sf_dir, "documents")
    return contrastive_chunk_pairs(docs, chunk_size=32)


def doc_ngram_novelty(spark, sf_dir):
    """Per-document 8-gram novelty (dedup.py::ngram_novelty): fraction
    of each doc's distinct word 8-grams that no earlier-id document
    contains — the marginal-novelty ranking signal. Digest-keyed
    distinct + one min aggregate + one join; raw grams never shuffle."""
    from nbdatatools_spark.operators.dedup import ngram_novelty

    docs = _t(spark, sf_dir, "documents")
    return ngram_novelty(docs, n=8)


def corpus_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth (analysis.py::vocab_growth, 10
    buckets): cumulative distinct vocabulary vs cumulative tokens over
    the id-ordered corpus — how much new data still buys new vocabulary.
    First-bucket-per-digest makes the cumulative distinct ONE min
    aggregate, no per-prefix rescans."""
    from nbdatatools_spark.operators.analysis import vocab_growth

    docs = _t(spark, sf_dir, "documents")
    return vocab_growth(docs, n_buckets=10)


# ---------------------------------------------------------------------------
# Round-6 batch 3: corpus QC + sketch-audit family
# ---------------------------------------------------------------------------

def doc_fertility(spark, sf_dir):
    """Tokenizer fertility/compression per document (functions/text.py::
    fertility_stats; cf. Rust et al. 2021's fertility metric): byte/char
    counts, whitespace vs GPT-2-pre-split token counts, subwords-per-word
    and bytes-per-subword at 6dp. Pure-codegen map-side projection."""
    from nbdatatools_spark.functions.text import fertility_stats

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fertility_stats(F.col("text")).alias("f"))
        .select("doc_id", "f.*")
        .orderBy("doc_id")
    )


def _qc_text_variant(kind):
    """Deterministically inject damage/script markers so the QC gates
    exercise non-zero paths on the clean synthetic corpus; the oracle
    replays the identical CASE chain."""
    t = F.col("text")
    if kind == "encoding":
        return (
            F.when(F.col("doc_id") % 7 == 0, F.concat(t, F.lit(" Ã© â€™ �")))
            .when(F.col("doc_id") % 11 == 0, F.concat(t, F.lit("\x07")))
            .otherwise(t)
        )
    return (
        F.when(F.col("doc_id") % 5 == 0, F.concat(t, F.lit(" привет")))
        .when(F.col("doc_id") % 6 == 0, F.concat(t, F.lit(" 你好 123")))
        .when(F.col("doc_id") % 9 == 0, F.concat(t, F.lit(" مرحبا Ελλάδα 한국")))
        .otherwise(t)
    )


def doc_encoding_quality(spark, sf_dir):
    """Encoding-sanity QC (functions/text.py::encoding_quality): U+FFFD /
    control / mojibake-marker counts and the non-ASCII ratio, over a
    corpus with deterministically injected damage (doc_id % 7 gets
    mojibake + replacement chars, % 11 a bare BEL). Keep-only regex
    counts — map-side codegen only."""
    from nbdatatools_spark.functions.text import encoding_quality

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", encoding_quality(_qc_text_variant("encoding")).alias("e"))
        .select("doc_id", "e.*")
        .orderBy("doc_id")
    )


def doc_script_profile(spark, sf_dir):
    """Writing-script census (functions/text.py::script_profile): per-doc
    character counts for 7 script classes (literal codepoint ranges, no
    \\p{Script}), dominant script with fixed-priority tie-break, over a
    corpus with injected Cyrillic/CJK/Arabic/Greek/Hangul snippets."""
    from nbdatatools_spark.functions.text import script_profile

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", script_profile(_qc_text_variant("script")).alias("s"))
        .select("doc_id", "s.*")
        .orderBy("doc_id")
    )


def doc_length_drift(spark, sf_dir):
    """Token-length drift per source vs src0 (analysis.py::length_drift):
    PSI over fixed-width token-count bins, add-one smoothed, 9dp terms
    DECIMAL-summed. One slim (group, bin) shuffle + a broadcast of the
    10-row reference histogram."""
    from nbdatatools_spark.operators.analysis import length_drift

    docs = _t(spark, sf_dir, "documents")
    return length_drift(docs, reference="src0", n_bins=10, bin_width=64)


def doc_bloom_decontaminate(spark, sf_dir):
    """Bloom-prefiltered 13-gram decontamination (dedup.py::
    bloom_decontaminate, Kirsch-Mitzenmacher double hashing over
    md5-uint52 prefixes): train = non-test docs PLUS re-idded copies of
    the test docs (guaranteed true hits), screened map-side against a
    deliberately small 8192-bit / k=2 filter so false positives appear
    and the exact-confirm stage is exercised. The train side never
    shuffles before the per-doc verdict."""
    from nbdatatools_spark.operators.dedup import bloom_decontaminate

    docs = _t(spark, sf_dir, "documents")
    test = docs.where(F.col("doc_id") % 101 == 0)
    train = docs.where(F.col("doc_id") % 101 != 0).unionByName(
        test.withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    return bloom_decontaminate(train, test, n=13, m_bits=8192, k=2).orderBy("id")


def corpus_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy-hitter audit (lm.py::cms_heavy_hitters,
    Cormode & Muthukrishnan 2005): 4x1024 sketch over the token stream
    (fixed size regardless of corpus), exact top-20 tokens with their
    sketch estimates and overestimates. Sketch build = one (d, pos)
    groupBy with map-side combine."""
    from nbdatatools_spark.operators.lm import cms_heavy_hitters

    docs = _t(spark, sf_dir, "documents")
    return cms_heavy_hitters(docs, depth=4, width=1024, topk=20)


def embedding_silhouette(spark, sf_dir):
    """Simplified silhouette per label cluster (clustering.py::
    simplified_silhouette — centroid variant, O(n*k) not O(n^2)):
    mean own-centroid distance, nearest-other distance, and mean
    silhouette per label; knn-convention distance folds and the
    group_centroids DECIMAL discipline keep it engine-exact."""
    from nbdatatools_spark.operators.clustering import simplified_silhouette

    emb = _t(spark, sf_dir, "embeddings")
    return simplified_silhouette(emb)


# ---------------------------------------------------------------------------
# Round-6 batch 4: augmentation + audit family (tail + PENDING_FIRST_RECORDING
# until the round-7 window rotation)
# ---------------------------------------------------------------------------

def doc_span_corruption(spark, sf_dir):
    """T5 span-corruption pair generation (packing.py::span_corruption,
    Raffel et al. 2020 §3.3.4): deterministic md5-seeded span masks,
    sentinel-numbered input/target pair per document. One doc-grain
    window pass — no recursion, no cross-doc shuffle."""
    from nbdatatools_spark.operators.packing import span_corruption

    docs = _t(spark, sf_dir, "documents")
    return span_corruption(docs, mask_rate=0.15, mean_span=3, seed=42)


def embedding_hubness(spark, sf_dir):
    """k-occurrence hubness audit (knn.py::hubness_stats, Radovanovic
    et al. 2010): how many other vectors list each vector in their
    10-NN (self excluded); anti-hubs report 0. expr impl for bit-exact
    oracle parity (GEMM is the scale default)."""
    from nbdatatools_spark.operators.knn import hubness_stats

    emb = _t(spark, sf_dir, "embeddings")
    return hubness_stats(emb, k=10, metric="cosine", impl="expr")


def corpus_source_similarity(spark, sf_dir):
    """Pairwise tf-idf cosine between sources (lm.py::source_similarity):
    digest-keyed token joins, 9dp DECIMAL-summed products — the
    vector-space source-mix audit."""
    from nbdatatools_spark.operators.lm import source_similarity

    docs = _t(spark, sf_dir, "documents")
    return source_similarity(docs)


def embedding_robust_scale(spark, sf_dir):
    """Median/IQR robust scaling per dimension (analysis.py::
    robust_scale_vectors — RobustScaler semantics): exact interpolated
    percentiles per dim, broadcast d-row stats, map-side scale. Exploded
    (id, dim, z) scalar shape (driver-hashable)."""
    from nbdatatools_spark.operators.analysis import robust_scale_vectors

    emb = _t(spark, sf_dir, "embeddings")
    return robust_scale_vectors(emb)


def doc_boilerplate_prefixes(spark, sf_dir):
    """Boilerplate line-prefix mining (dedup.py::boilerplate_prefixes):
    top first-5-token line openings by distinct-doc spread — the
    template detector upstream of paragraph_dedup."""
    from nbdatatools_spark.operators.dedup import boilerplate_prefixes

    docs = _t(spark, sf_dir, "documents")
    return boilerplate_prefixes(docs, k_tokens=5, min_docs=2, top_n=50)


# ---------------------------------------------------------------------------
# Round-6 batch 5: filter-evaluation metrics + reciprocal/cross-corpus dedup
# (tail + PENDING_FIRST_RECORDING until the round-7 window rotation)
# ---------------------------------------------------------------------------

def _scored_docs(spark, sf_dir):
    """Shared frame for the evaluation gates: 6dp quality score (rounded
    so per-score grouping is engine-exact) + a long-document label."""
    from nbdatatools_spark.functions.text import quality_score

    # _ts: the regex quality stack is the heavy first stage (round 10)
    docs = _ts(spark, sf_dir, "documents")
    return docs.select(
        F.round(quality_score(F.col("text")), 6).alias("score"),
        (F.col("n_chars") >= 400).alias("y"),
    )


def doc_quality_auc(spark, sf_dir):
    """Exact ROC-AUC of the heuristic quality score against the
    long-document label (evaluation.py::ranking_auc, Mann-Whitney
    rank-sum with tie-averaged ranks; two-phase running sum — no
    single-reducer window)."""
    from nbdatatools_spark.operators.evaluation import ranking_auc

    return ranking_auc(_scored_docs(spark, sf_dir), "score", "y")


def doc_score_calibration(spark, sf_dir):
    """Reliability-diagram table for the quality score (evaluation.py::
    calibration_bins): 10 fixed bins on [0, 1], per-bin count, DECIMAL
    mean score, observed positive rate."""
    from nbdatatools_spark.operators.evaluation import calibration_bins

    return calibration_bins(
        _scored_docs(spark, sf_dir), "score", "y", n_bins=10, lo=0.0, hi=1.0
    )


def doc_filter_agreement(spark, sf_dir):
    """Cohen's kappa between two filter decisions (evaluation.py::
    filter_agreement): the quality >= 0.5 rule vs the n_chars >= 400
    rule — 2x2 confusion counts, raw agreement, chance-corrected kappa.
    ONE map-side-combining aggregate."""
    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.evaluation import filter_agreement

    docs = _t(spark, sf_dir, "documents")
    flags = docs.select(
        (F.round(quality_score(F.col("text")), 6) >= 0.5).alias("a"),
        (F.col("n_chars") >= 400).alias("b"),
    )
    return filter_agreement(flags, "a", "b")


def embedding_mutual_knn(spark, sf_dir):
    """Mutual 10-NN pairs (knn.py::mutual_knn_pairs): reciprocal
    neighborhood near-dup mining — one self-KNN + one reversed-key
    equi-join, never all-pairs. expr impl for oracle parity."""
    from nbdatatools_spark.operators.knn import mutual_knn_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return mutual_knn_pairs(emb, k=10, metric="cosine", impl="expr")


def doc_cross_corpus_near_dups(spark, sf_dir):
    """Cross-corpus near-dup pairs (dedup.py::cross_corpus_near_dups):
    corpus A = even doc ids, corpus B = odd ids PLUS re-idded copies of
    every 10th even doc (guaranteed cross hits at jaccard 1.0). Banded
    LSH on the tagged union, cross-side filter, exact Jaccard verify at
    0.5. md5 impl for oracle parity (numpy kernel is the scale default)."""
    from nbdatatools_spark.operators.dedup import cross_corpus_near_dups

    docs = _t(spark, sf_dir, "documents")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1).unionByName(
        docs.where((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 10 == 0))
        .withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    return cross_corpus_near_dups(
        a, b, num_hashes=32, bands=8, shingle_size=5, threshold=0.5, impl="md5"
    )


# ---------------------------------------------------------------------------
# Round-6 batch 6: robust statistics (tail + PENDING_FIRST_RECORDING)
# ---------------------------------------------------------------------------

def events_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend of each event type's daily volume
    (temporal.py::theil_sen): slope = median pairwise slope over the
    date-grain series, intercept = median residual. Grouped O(n^2)
    bounded by series length; exact interpolated medians."""
    from nbdatatools_spark.operators.temporal import theil_sen

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    series = daily.select(
        "event_type",
        F.datediff("d", F.lit("1970-01-01")).cast("double").alias("x"),
        "y",
    )
    return theil_sen(series, "event_type", "x", "y")


def events_bootstrap_ci(spark, sf_dir):
    """Deterministic bootstrap 95% CI for each event type's mean daily
    volume (temporal.py::bootstrap_mean_ci, 200 md5-seeded resamples —
    partition-invariant, engine-replayable draws)."""
    from nbdatatools_spark.operators.temporal import bootstrap_mean_ci

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    return bootstrap_mean_ci(
        daily, "event_type", "d", "cnt", n_boot=200, alpha=0.05, seed=42
    )


def embedding_cka(spark, sf_dir):
    """Linear CKA between the full 64-dim embedding and its 8-dim prefix
    (analysis.py::linear_cka, Kornblith et al. 2019) — how much geometry
    the Matryoshka truncation keeps. One dim-pair covariance table,
    DECIMAL-disciplined; all three Frobenius norms read the same table."""
    from nbdatatools_spark.operators.analysis import linear_cka

    emb = _t(spark, sf_dir, "embeddings")
    return linear_cka(emb, vec="embedding", m=8, id_col="vec_id")


def events_dp_counts(spark, sf_dir):
    """Differentially-private event-type counts (analysis.py::dp_counts,
    Laplace mechanism at eps = 1) in AUDIT mode: a pinned seed makes the
    md5 noise reproducible and SQL-replayable, and audit=True keeps
    true_count/abs_error for the eps-calibration check. This is the
    mechanism AUDIT, not a private release — the production default
    (seed=None) draws a fresh secret seed per release and emits
    noisy_count only (the ADVICE r6 contract)."""
    from nbdatatools_spark.operators.analysis import dp_counts

    ev = _t(spark, sf_dir, "events")
    return dp_counts(ev, "event_type", epsilon=1.0, seed=42, audit=True)


def orders_rollup_revenue(spark, sf_dir):
    """ROLLUP revenue report over (priority, status) — subtotals + grand
    total with grouping_id disambiguating NULL keys from rolled-up
    levels. Beyond-reference relational surface (the reference has no
    grouping sets; SURVEY §2.4); DECIMAL-exact money sums."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            _dbl(F.sum(_dec2("o_totalprice"))).alias("revenue"),
        )
        .select("gid", "o_orderpriority", "o_orderstatus", "n_orders", "revenue")
        .orderBy("gid", "o_orderpriority", "o_orderstatus")
    )


def doc_pii_redaction(spark, sf_dir):
    """PII scrub audit (functions/text.py::redact_pii + pii_counts):
    emails/IPs/phones injected deterministically (doc_id % 4/7/5), typed
    placeholders substituted in redaction order so a dotted quad never
    double-counts as a phone. Chained codegen regex — map-side only."""
    from nbdatatools_spark.functions.text import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    injected = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(t, F.lit(" contact bob@example.com now")))
        .when(F.col("doc_id") % 7 == 0, F.concat(t, F.lit(" from 192.168.10.42 today")))
        .when(F.col("doc_id") % 5 == 0, F.concat(t, F.lit(" call 555-123-4567")))
        .otherwise(t)
    )
    return (
        docs.select("doc_id", injected.alias("__t"))
        .select(
            "doc_id",
            pii_counts(F.col("__t")).alias("c"),
            redact_pii(F.col("__t")).alias("redacted"),
        )
        .select("doc_id", "c.*", "redacted")
        .orderBy("doc_id")
    )


def events_k_anonymity(spark, sf_dir):
    """k-anonymity audit at k=5 over the (event_type, day, value-decile)
    quasi-identifier tuple (quality_checks.py::k_anonymity) — the
    equivalence classes a grouped release would expose. The release-gate
    companion to events_dp_counts."""
    from nbdatatools_spark.operators.quality_checks import k_anonymity

    ev = _t(spark, sf_dir, "events")
    quasi = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.least(F.greatest(F.floor(F.col("value") / 10), F.lit(0)), F.lit(9))
        .cast("int")
        .alias("value_bin"),
    )
    return k_anonymity(quasi, ["event_type", "day", "value_bin"], k=5)


# ---------------------------------------------------------------------------
# Round-7 batch 1: multimodal perceptual-hash dedup
# ---------------------------------------------------------------------------

def media_near_dup_pairs(spark, sf_dir):
    """Image near-duplicate pairs via 64-bit dHash + pigeonhole Hamming
    blocking (multimodal.py::image_dhash + media_near_dup_pairs,
    dedup.py::hamming_near_dup_pairs) — the perceptual-hash face of the
    dedup family, end-to-end through the REAL BMP codec: deterministic
    16x18 gray images (pixel = first md5 byte of 'px:<d>:<y>:<x>') are
    encoded to 24-bit BMP bytes, decoded back, channel-meaned, 2x2
    block-pooled to the 8x9 dHash grid and packed. Pixels come from TWO
    md5s per row (32 hex chars + 4 = 18 byte-pairs), let-bound so the
    digest is computed once per row, not once per pixel — 32 md5/doc vs
    the naive 288 (measured 6.1s -> ~2s at sf0.1). Planted structure:
    doc_id % 10 == 1 copies doc_id-1's image exactly (hamming 0);
    doc_id % 20 == 3 copies it with pixel (0,0) bumped +100 (hamming <=
    2). Every arithmetic step is exact in IEEE doubles (gray = 3v/3,
    block = sum/4), so the DuckDB oracle replays the full hash chain
    bit-for-bit — without touching BMP bytes, which the codec round-trip
    pytest covers instead. Hamming joins are chunk-equi-keyed (never
    all-pairs); the oracle's all-pairs form is the small-n audit."""
    from nbdatatools_spark.functions.media_codecs import encode_bmp
    from nbdatatools_spark.operators import multimodal as mm

    # _ts: 32 md5s + a BMP codec round-trip per row (round 10)
    docs = _ts(spark, sf_dir, "documents").select("doc_id")
    d_eff = F.when(
        (F.col("doc_id") % 10 == 1) | (F.col("doc_id") % 20 == 3),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    from nbdatatools_spark.functions.text import _let

    # 36 hex chars per row = 18 pixels from TWO md5s; the rowhex array is
    # LET-BOUND (functions.text._let) so each row digest is computed once
    # — an attribute reference inside the nested pixel lambdas would be
    # re-inlined by CollapseProject and re-evaluated per pixel
    rowhex = F.expr(
        "transform(sequence(0, 15), y -> "
        "concat(md5(concat('pxr:', CAST(__de AS STRING), ':', "
        "CAST(y AS STRING))), "
        "substring(md5(concat('pxr2:', CAST(__de AS STRING), ':', "
        "CAST(y AS STRING))), 1, 4)))"
    )

    def pixels_of(rh):
        return F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda y: F.transform(
                F.sequence(F.lit(0), F.lit(17)),
                lambda x: F.when(
                    F.col("__bump") & (y == 0) & (x == 0),
                    F.least(
                        F.conv(
                            F.element_at(rh, 1).substr(F.lit(1), F.lit(2)), 16, 10
                        ).cast("int")
                        + 100,
                        F.lit(255),
                    ),
                ).otherwise(
                    F.conv(
                        F.element_at(rh, y.cast("int") + 1).substr(
                            (x.cast("int") * 2 + 1).cast("int"), F.lit(2)
                        ),
                        16,
                        10,
                    ).cast("int")
                ),
            ),
        )

    pix = docs.select(
        F.col("doc_id").alias("media_id"),
        d_eff.alias("__de"),
        (F.col("doc_id") % 20 == 3).alias("__bump"),
    ).select(
        "media_id",
        _let(rowhex, pixels_of).alias("pixels"),
    )

    def to_bmp(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            # Arrow hands nested lists as object arrays of row arrays —
            # stack explicitly before the uint8 cast
            blobs = [
                encode_bmp(np.stack([np.asarray(row) for row in px]).astype(np.uint8))
                for px in pdf["pixels"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image/bmp",
                    "data": blobs,
                    "meta": [None] * len(pdf),
                }
            )

    media = pix.mapInPandas(
        to_bmp,
        "media_id BIGINT, kind STRING, data BINARY, "
        "meta STRUCT<width INT, height INT, channels INT, sample_rate INT, "
        "duration_ms BIGINT>",
    )
    return mm.media_near_dup_pairs(media, max_hamming=3).orderBy("id_a", "id_b")


def corpus_unigram_lm(spark, sf_dir):
    """Unigram-LM (SentencePiece-style) tokenizer training
    (unigram.py::unigram_train, Kudo 2018): seed substring vocabulary ->
    hard-EM Viterbi re-estimation over the DISTINCT-word table -> pruned
    piece probabilities. Pinned-invariant oracle gate (the
    corpus_bpe_merges pattern): the EM loop is not SQL-expressible, but
    the SEED stage is pure weighted substring counting — the oracle
    replicates the top-5 multi-char seed pieces exactly (real hash
    bite) — and the booleans pin contracts any correct trainer
    satisfies: piece probs sum to 1, per-iteration Viterbi LL is
    monotone non-decreasing (the hard-EM guarantee), every corpus
    character survives pruning, the vocab respects its bound, and a
    20-doc encode round-trip reconstructs the normalized text. The full
    trainer keeps its pure-Python differential in tests/test_unigram.py.
    """
    from nbdatatools_spark.functions.text import normalize_text
    from nbdatatools_spark.operators.unigram import (
        seed_vocabulary,
        unigram_encode,
        unigram_train,
    )

    docs = _t(spark, sf_dir, "documents")
    pieces, hist = unigram_train(
        docs, vocab_size=512, max_piece_len=6, seed_size=2000, n_iter=2
    )
    # ONE seed collection serves both checks: its len>=2 head is the
    # oracle-replicated hash bite, its len==1 rows are the corpus
    # alphabet (seed_vocabulary includes every single char by
    # construction — same set as corpus_base_chars, one pass cheaper)
    seed_rows = seed_vocabulary(docs, max_piece_len=6, seed_size=2000).collect()
    top_seed = sorted(
        (r for r in seed_rows if len(r["piece"]) >= 2),
        key=lambda r: (-r["freq"], r["piece"]),
    )[:5]
    chars = sorted(r["piece"] for r in seed_rows if len(r["piece"]) == 1)
    table = {p for p, _ in pieces}
    probs_normalized = abs(sum(pr for _, pr in pieces) - 1.0) < 1e-6
    ll_monotone = all(b >= a - 1e-6 for a, b in zip(hist, hist[1:]))
    singles_retained = all(c in table for c in chars)
    vocab_bounded = len(pieces) <= 512 + len(chars)
    sample = docs.orderBy("doc_id").limit(20)
    rt = unigram_encode(sample, pieces).select(
        (
            F.concat_ws("", "unigram_tokens")
            == F.regexp_replace(normalize_text(F.col("text")), " ", "")
        ).alias("ok")
    )
    encode_roundtrip = bool(rt.agg(F.min("ok")).first()[0])
    rows = [
        (
            r["piece"],
            int(r["freq"]),
            probs_normalized,
            ll_monotone,
            singles_retained,
            vocab_bounded,
            encode_roundtrip,
        )
        for r in top_seed
    ]
    return spark.createDataFrame(
        rows,
        "piece string, seed_freq bigint, probs_normalized boolean, "
        "ll_monotone boolean, singles_retained boolean, "
        "vocab_bounded boolean, encode_roundtrip boolean",
    ).orderBy(F.desc("seed_freq"), "piece")


def doc_sentence_dedup(spark, sf_dir):
    """Cross-document repeated-sentence removal (dedup.py::
    sentence_dedup, min_docs=2 — the RefinedWeb line-dedup rule at
    sentence grain): sentinel-split sentences shuffle as md5 digests,
    one count-distinct-docs aggregate flags repeats, survivors re-join
    in position order. All integers/strings — hash-exact."""
    from nbdatatools_spark.operators.dedup import sentence_dedup

    docs = _t(spark, sf_dir, "documents")
    return sentence_dedup(docs, min_docs=2)


def doc_temperature_mix(spark, sf_dir):
    """Temperature-scaled source mixture (sampling.py::
    temperature_mixture_rates, T=2, token weights): p_s ∝ w_s^(1/2)
    flattens the source distribution; rate_s = (q_s/w_s)·min_u(w_u/q_u)
    — the normalizer cancels, so the whole computation is per-stratum
    ratios + one global min (no cross-strata sum; order-independent,
    engine-exact at 6dp). Fully distributed: the strata table never
    reaches the driver."""
    from nbdatatools_spark.functions.text import token_count
    from nbdatatools_spark.operators.sampling import temperature_mixture_rates

    docs = _t(spark, sf_dir, "documents").select(
        "source", token_count(F.col("text")).alias("__tok")
    )
    return temperature_mixture_rates(
        docs, strata_col="source", temperature=2.0, weight_col="__tok"
    )


def doc_containment_pairs(spark, sf_dir):
    """Asymmetric containment near-dups (dedup.py::containment_verify
    over md5 banded-LSH candidates): c_ab = |A∩B|/|A| catches short
    documents embedded in long ones where Jaccard stays low (excerpt
    mirrors, quote farms). Candidates are bucket-equi-joined (never
    all-pairs); the exact set intersection runs on candidates only.
    int/int ratios at 6dp — hash-exact."""
    from nbdatatools_spark.operators.dedup import (
        containment_verify,
        minhash_lsh_candidates,
    )

    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(
        docs, num_hashes=32, bands=8, shingle_size=5, impl="md5"
    )
    return containment_verify(
        cand, docs, shingle_size=5, threshold=0.2
    ).orderBy("id_a", "id_b")


def embedding_cluster_purity(spark, sf_dir):
    """External cluster validation (clustering.py::lloyd_assignments +
    cluster_label_agreement): purity + NMI of the deterministic k=8
    2-iteration Lloyd clustering against the embeddings' ground-truth
    labels — the Manning-IR evaluation pair, the audit that says whether
    unsupervised curation clusters track real classes. The oracle
    unrolls the SAME Lloyd CTEs as embedding_lloyd_kmeans down to
    per-row assignments, joins labels, and replays the 9dp-DECIMAL
    entropy/MI sums. One row (n, n_clusters, n_labels, purity, nmi)."""
    from nbdatatools_spark.operators.clustering import (
        cluster_label_agreement,
        lloyd_assignments,
    )

    emb = _t(spark, sf_dir, "embeddings")
    assign = lloyd_assignments(emb, k=8, iterations=2)
    return cluster_label_agreement(assign, emb)


def embedding_knn_accuracy(spark, sf_dir):
    """Leave-one-out 3-NN label accuracy (knn.py::knn_label_accuracy,
    cosine, majority vote with (count DESC, label ASC) ties): the
    supervised audit of embedding geometry, per-label + grand-total
    ROLLUP. expr impl for oracle parity (the hubness/mutual-knn policy:
    gate-side exact quadratic at sf0.01; production rides the GEMM
    partial top-k, and at corpus scale the neighbor lists come from the
    ANN family)."""
    from nbdatatools_spark.operators.knn import knn_label_accuracy

    emb = _t(spark, sf_dir, "embeddings")
    return knn_label_accuracy(emb, k=3, metric="cosine", impl="expr")


def events_autocorrelation(spark, sf_dir):
    """Daily-series autocorrelation function at lags 0..14 (temporal.py::
    autocorrelation): the periodicity probe — one map-side date-grain
    aggregate, then the lag self-join and moment sums run on the
    calendar-bounded DAY table only. Deviations/products round(9)-then-
    DECIMAL-sum (order-independent); acf at 6dp — hash-exact."""
    from nbdatatools_spark.operators.temporal import autocorrelation

    ev = _t(spark, sf_dir, "events")
    return autocorrelation(ev, max_lag=14)


def events_survival_km(spark, sf_dir):
    """Kaplan-Meier survival over user lifetimes (temporal.py::
    kaplan_meier, censor_days=1): right-censoring-honest retention —
    subjects whose last event touches the final day of the data horizon
    are censored, not churned (the sf events table is a 30-day window
    with near-universal final-day activity, so a 1-day censor boundary
    is the informative setting). One groupBy(user) reduces events to subjects;
    the product-limit curve rides exp(cumsum(round(ln(1 - d/n), 9)))
    with DECIMAL sums over the duration grain (calendar-bounded), a
    total-death step floors S to exactly 0 via a running flag (no
    ln(0)). survival at 6dp — hash-exact."""
    from nbdatatools_spark.operators.temporal import kaplan_meier

    ev = _t(spark, sf_dir, "events")
    return kaplan_meier(ev, censor_days=1)


def orders_benford(spark, sf_dir):
    """Benford first-digit audit of o_totalprice (quality_checks.py::
    benford_audit): string-based leading-digit extraction (no
    floor(log10) float hazard at powers of ten), 9-key groupBy, global
    chi-square folded from the digit table. Expected probs via
    round(ln(1+1/d)/ln(10), 9) on both engines — hash-exact."""
    from nbdatatools_spark.operators.quality_checks import benford_audit

    orders = _t(spark, sf_dir, "orders")
    return benford_audit(orders, "o_totalprice")


def doc_lang_source_chi2(spark, sf_dir):
    """Chi-square independence of lang x source (quality_checks.py::
    chi_square_independence): the corpus bias audit — one contingency
    groupBy, the full R x C grid restored by a marginal cross join so
    UNOBSERVED cells still contribute (0-E)^2/E, Cramér's V effect
    size. Cell terms round(9)-then-DECIMAL-sum — hash-exact."""
    from nbdatatools_spark.operators.quality_checks import (
        chi_square_independence,
    )

    docs = _t(spark, sf_dir, "documents")
    return chi_square_independence(docs, "lang", "source")


def corpus_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct-token audit (lm.py::hll_distinct, p=8): the
    cardinality sibling of the CMS gate — 256 registers regardless of
    corpus size, md5-uint52 hashing (low 8 bits pick the register,
    leading-zero rank of the 44-bit suffix feeds the max), the harmonic
    denominator as an EXACT int64 sum of 2^(45-M). The oracle rebuilds
    every register in SQL (bin() bit-length parity checked both
    engines). Estimate + linear-counting branch at 6dp — hash-exact."""
    from nbdatatools_spark.operators.lm import hll_distinct

    docs = _t(spark, sf_dir, "documents")
    return hll_distinct(docs, precision=8)


def corpus_source_jsd(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions (analysis.py::source_jsd, top-512 vocab): the
    distributional source-mix audit. Disjoint-support mass contributes
    exactly p*log2(2) = p bits, so the pair sum needs only ONE shared-
    token equi-join plus the slice-pair grid (no outer join); pairs
    with zero shared tokens surface as JSD = 1. round(9)-DECIMAL term
    sums; 6dp output — hash-exact."""
    from nbdatatools_spark.operators.analysis import source_jsd

    docs = _t(spark, sf_dir, "documents")
    return source_jsd(docs, vocab_size=512)


def orders_association_rules(spark, sf_dir):
    """Market-basket association rules over order line items
    (analysis.py::association_rules on lineitem l_orderkey x l_partkey,
    min_pair_count=3): support / both confidences / lift at the pair
    grain. The only quadratic is per-basket and capped (baskets over 64
    distinct items are dropped before the pair join — the frequent-
    itemset guard); the pair join is basket-key equi-colocated, never
    all-pairs. Lift routes through doubles — hash-exact."""
    from nbdatatools_spark.operators.analysis import association_rules

    li = _t(spark, sf_dir, "lineitem")
    return association_rules(
        li, "l_orderkey", "l_partkey", min_pair_count=3
    )


def doc_isotonic_calibration(spark, sf_dir):
    """Isotonic (PAV) recalibration of the quality score at the bin
    grain (evaluation.py::isotonic_calibration): the pool-adjacent-
    violators SOLUTION in closed form via the minimax identity
    iso_i = max_{j<=i} min_{k>=i} wmean(j..k) — a bounded relational
    plan (B-row prefix sums, B^2 interval means, B^3 fold), never the
    sequential pooling loop. Non-decreasing by construction; interval
    means at 9dp, outputs 6dp — hash-exact."""
    from nbdatatools_spark.operators.evaluation import isotonic_calibration

    return isotonic_calibration(
        _scored_docs(spark, sf_dir), "score", "y", n_bins=10, lo=0.0, hi=1.0
    )


def doc_sliced_auc(spark, sf_dir):
    """Per-source exact ROC-AUC (evaluation.py::grouped_ranking_auc):
    the slice-fairness readout — rank-sum identity per source with
    tie-averaged ranks; the running sum is a KEYED window over
    per-(source, score) groups (parallel across sources, no global
    sort), NULL for degenerate slices. Rank sums are exact
    half-integer arithmetic — hash-exact."""
    from nbdatatools_spark.operators.evaluation import grouped_ranking_auc

    docs = _t(spark, sf_dir, "documents")
    from nbdatatools_spark.functions.text import quality_score

    scored = docs.select(
        "source",
        F.round(quality_score(F.col("text")), 6).alias("score"),
        (F.col("n_chars") >= 400).alias("y"),
    )
    return grouped_ranking_auc(scored, "score", "y", "source")


def embedding_intrinsic_dim(spark, sf_dir):
    """Participation-ratio intrinsic dimension (analysis.py::
    intrinsic_dimension, first 32 dims): PR = trace(C)^2 / ||C||_F^2 —
    the truncation-budget audit, no eigendecomposition. Gate pins
    impl='expr' (the DuckDB-replayable dim-pair chain, CKA's sibling);
    production auto-routes d > 16 through the bit-equal int64-gramian
    gemm pass (nothing n*d^2-sized shuffles)."""
    from nbdatatools_spark.operators.analysis import intrinsic_dimension

    emb = _t(spark, sf_dir, "embeddings")
    return intrinsic_dimension(emb, dims=32, impl="expr")


def doc_textrank_keywords(spark, sf_dir):
    """Corpus TextRank keywords (analysis.py::textrank_keywords,
    window=2, 6 iterations, min_count=10, top-25): the word
    co-occurrence graph ranked with the shared 9dp-DECIMAL PageRank
    recursion — the oracle unrolls all 6 iterations into chained CTEs
    over the SAME edge construction (offset equi-joins on (doc, pos),
    linear in corpus tokens). Cut and order on (6dp rank DESC, token) —
    engine-exact."""
    from nbdatatools_spark.operators.analysis import textrank_keywords

    docs = _t(spark, sf_dir, "documents")
    return textrank_keywords(
        docs, window=2, iterations=6, min_count=10, topk=25, id_col="doc_id"
    )


def doc_length_batching(spark, sf_dir):
    """Length-grouped vs arrival-order batching padding audit
    (packing.py::length_batching_audit, B=32): per-batch padded tokens
    under both orders via the two-phase global row index (no
    single-reducer window). Integer accounting; ratio at 6dp —
    hash-exact."""
    from nbdatatools_spark.operators.packing import length_batching_audit

    docs = _t(spark, sf_dir, "documents")
    return length_batching_audit(docs, batch_size=32)


def _textrank_oracle(
    iterations: int = 6,
    damping: float = 0.85,
    window: int = 2,
    min_count: int = 10,
    topk: int = 25,
) -> str:
    """DuckDB replica of textrank_keywords: the candidate-filtered word
    co-occurrence graph + graph.pagerank's fixed power iteration unrolled
    into chained CTEs (same per-edge round(,9)-then-DECIMAL contribution
    sums as _pagerank_oracle — identical expression trees)."""
    d = repr(float(damping))
    its = []
    for t in range(1, iterations + 1):
        its.append(f"""
        r{t} AS (
            SELECT nodes.node,
                   round((1.0 - {d}) / nn.n
                         + {d} * coalesce(CAST(inc.i AS DOUBLE), 0.0), 9) AS rank
            FROM nodes CROSS JOIN nn
            LEFT JOIN (
                SELECT ew.d AS node,
                       sum(CAST(round((r{t - 1}.rank * ew.w) / ew.ow, 9)
                                AS DECIMAL(28,9))) AS i
                FROM ew JOIN r{t - 1} ON ew.s = r{t - 1}.node
                GROUP BY ew.d) inc
              ON nodes.node = inc.node)""")
    return f"""
        WITH nrm AS (SELECT doc_id AS doc, {_NORM} AS t FROM documents),
        arr AS (SELECT doc, regexp_split_to_array(t, '\\s+') AS a
                FROM nrm WHERE length(t) > 0),
        tokp AS (SELECT doc, CAST(generate_subscripts(a, 1) - 1 AS INT)
                        AS pos, unnest(a) AS w
                 FROM arr),
        fp AS (SELECT doc, pos, w FROM tokp
               WHERE length(w) > 0 AND w NOT IN ({_STOPWORD_SQL_LIST})),
        cand AS (SELECT w FROM fp GROUP BY w
                 HAVING count(*) >= {min_count}),
        cp AS (SELECT fp.doc, fp.pos, fp.w FROM fp JOIN cand USING (w)),
        offs AS (SELECT CAST(unnest(generate_series(1, {window})) AS INT)
                        AS o),
        prs AS (SELECT least(a.w, b.w) AS u, greatest(a.w, b.w) AS v
                FROM cp a CROSS JOIN offs
                JOIN cp b ON b.doc = a.doc AND b.pos = a.pos + offs.o
                WHERE a.w <> b.w),
        und AS (SELECT u, v, CAST(count(*) AS DOUBLE) AS w
                FROM prs GROUP BY u, v),
        e AS (SELECT u AS s, v AS d, w FROM und
              UNION ALL SELECT v AS s, u AS d, w FROM und),
        nodes AS MATERIALIZED (SELECT s AS node FROM e UNION SELECT d FROM e),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        ow AS (SELECT s, sum(w) AS ow FROM e GROUP BY s),
        ew AS (SELECT e.s, e.d, e.w, ow.ow FROM e JOIN ow USING (s)),
        r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
        {",".join(its)}
        SELECT node AS token, round(rank, 6) AS rank
        FROM r{iterations} ORDER BY rank DESC, token LIMIT {topk}
    """


def events_cross_correlation(spark, sf_dir):
    """Lead-lag cross-correlation click -> purchase at lags -7..7
    (temporal.py::cross_correlation): the "does A lead B" probe —
    autocorrelation's discipline (one events scan, signed-lag joins and
    moment sums on the calendar-bounded day grain), ccf normalized by
    sqrt(den_a * den_b). round(9)-DECIMAL sums; 6dp — hash-exact."""
    from nbdatatools_spark.operators.temporal import cross_correlation

    ev = _t(spark, sf_dir, "events")
    return cross_correlation(ev, "click", "purchase", max_lag=7)


def orders_rfm_segments(spark, sf_dir):
    """RFM customer segmentation, 5 equal-population tiers per axis
    (analysis.py::rfm_segments): one groupBy(customer), then each
    dimension ranks with the two-phase global row index and buckets by
    floor(idx*B/n) — no ntile, no single-reducer window. Money rides
    round(,2)-DECIMAL sums so rank order is engine-exact; ties split by
    (value, customer). Segment-grid counts + DECIMAL averages —
    hash-exact."""
    from nbdatatools_spark.operators.analysis import rfm_segments

    orders = _t(spark, sf_dir, "orders")
    return rfm_segments(orders, n_buckets=5)


def doc_filter_yield(spark, sf_dir):
    """Quality-filter yield curve (evaluation.py::filter_yield_curve,
    21 thresholds, token-weighted): docs and tokens retained per
    score >= t cut — the threshold-picking budget readout. One scan,
    21-key conditional aggregate; integer counts, 6dp fractions —
    hash-exact."""
    from nbdatatools_spark.functions.text import quality_score, token_count
    from nbdatatools_spark.operators.evaluation import filter_yield_curve

    base = _t(spark, sf_dir, "documents").select(
        F.round(quality_score(F.col("text")), 6).alias("score"),
        token_count(F.col("text")).cast("long").alias("ntok"),
    )
    return filter_yield_curve(base, "score", "ntok", n_steps=20)


def corpus_source_dup_rate(spark, sf_dir):
    """Per-source exact-duplicate pressure (dedup.py::source_dup_rate):
    corpus-wide md5(normalized text) digest counts, one join back, one
    per-source aggregate — which feeds are pumping copies. Integer
    counts, 6dp rate — hash-exact."""
    from nbdatatools_spark.operators.dedup import source_dup_rate

    docs = _t(spark, sf_dir, "documents")
    return source_dup_rate(docs)


def corpus_source_gini(spark, sf_dir):
    """Source-concentration audit (analysis.py::source_concentration):
    Lorenz curve + Gini of per-source token mass — one token-count
    aggregate to the slice grain, ranking window over the bounded slice
    table, DECIMAL-exact Gini sum (int64-overflow-proof at 100-TB token
    masses). Integer weights, 6dp shares — hash-exact."""
    from nbdatatools_spark.operators.analysis import source_concentration

    docs = _t(spark, sf_dir, "documents")
    return source_concentration(docs)


def embedding_isotropy_sample(spark, sf_dir):
    """Isotropy audit (analysis.py::embedding_isotropy, S=64): the 64
    vectors with smallest md5(id) (order-free deterministic draw), all
    C(64,2) exact cosines via the knn decimal-fold convention, mean /
    mean-abs / max-abs — the narrow-cone pre-check before whitening.
    Sample is a TakeOrdered regardless of corpus size; the S^2 block is
    a broadcast self-join of a bounded frame — hash-exact."""
    from nbdatatools_spark.operators.analysis import embedding_isotropy

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_isotropy(emb, sample_size=64)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordering matters: the driver records correctness rows for the FIRST
    50 entries only. Window-management invariant (hold this when adding
    queries):

    - every entry past index 49 MUST already have a hash-green row in a
      prior round's CORRECTNESS_r*.json (union over recorded rounds —
      tests/test_plans.py::test_recording_window_invariant checks it), so
      union(rounds) covers every query;
    - new queries go INSIDE the window, displacing long-stable green
      entries to the tail;
    - fit_embeddings_model stays at EXACTLY index 49 (last recorded
      slot): it runs driver-side sketch jobs during plan construction,
      and in round 1 a failure there shadowed everything after it — at
      position 49 a failure can only shadow the already-recorded tail.

    Round-10 layout (the planned rotation — VERDICT r9 task #1): slots
    0-18 = 19 of the 23 round-10 candidates staged in round 9 (every
    one judge-verified against the local DuckDB oracle at sf0.001 AND
    sf0.01 AND sf0.1, and under 7 shuffle partitions, before rotation
    — all hash-exact; no rows-only gates in this batch); slots 19-43 =
    the three rows-only-by-design gates that can never satisfy the
    tail's ever-hash-green invariant and must stay inside the window
    (events_kcore, embedding_dbscan — iterative fixpoints,
    tests/test_stats_graph.py + tests/test_dbscan.py;
    doc_compression_ratio — DEFLATE) plus 22 re-record fillers from
    the displaced round-9 window head (every filler hash-green in
    CORRECTNESS_r09, so re-recording is harmless and keeps the window
    exactly 50); slots 44-47 = the four remaining round-10 candidates
    that run driver-side jobs during plan construction
    (doc_sinkhorn_shift / doc_unimax_budget tiny aggregates;
    corpus_wordpiece / corpus_sentencepiece trainer merge-loop
    collects) — deliberately LATE so a construction failure can only
    shadow the slots after it (the fit_embeddings_model rationale);
    slot 48 = corpus_lsa_topics (rows-only by design —
    eigendecomposition, tests/test_lsa.py — and also
    construction-heavy); slot 49 = fit_embeddings_model (pinned).
    Every other registry entry is hash-green in the union of recorded
    rounds (r1-r9) and sits in the tail. Round-11 work stages in
    candidate_queries() until rotation.
    """
    return {
        # -- slots 0-18: round-10 candidates, first driver recording
        #    (all judge-verified in round 9 before rotation) --
        "doc_reservoir_sample": doc_reservoir_sample,
        "doc_stratified_sample": doc_stratified_sample,
        "corpus_fertility_sweep": corpus_fertility_sweep,
        "doc_fineweb_filter": doc_fineweb_filter,
        "doc_group_split": doc_group_split,
        "doc_krippendorff": doc_krippendorff,
        "embedding_davies_bouldin": embedding_davies_bouldin,
        "embedding_calinski_harabasz": embedding_calinski_harabasz,
        "embedding_hopkins": embedding_hopkins,
        "embedding_lof": embedding_lof,
        "events_link_prediction": events_link_prediction,
        "doc_distinct_ngrams": doc_distinct_ngrams,
        "doc_temperature_scaling": doc_temperature_scaling,
        "doc_ece": doc_ece,
        "doc_packing_efficiency": doc_packing_efficiency,
        "corpus_vocab_richness": corpus_vocab_richness,
        "doc_distinct_ngrams_hll": doc_distinct_ngrams_hll,
        "doc_hill_tail": doc_hill_tail,
        "doc_rarity_scores": doc_rarity_scores,
        # -- slots 19-43: rows-only-by-design gates (must stay inside
        #    the window) + re-record fillers from the displaced round-9
        #    window head (all hash-green in CORRECTNESS_r09) --
        "events_kcore": events_kcore,
        "embedding_dbscan": embedding_dbscan,
        "doc_compression_ratio": doc_compression_ratio,
        "events_mann_whitney": events_mann_whitney,
        "events_kruskal_wallis": events_kruskal_wallis,
        "events_levene_test": events_levene_test,
        "events_spearman_corr": events_spearman_corr,
        "events_mann_kendall": events_mann_kendall,
        "doc_source_fdr": doc_source_fdr,
        "events_assortativity": events_assortativity,
        "doc_fleiss_kappa": doc_fleiss_kappa,
        "doc_lexical_diversity": doc_lexical_diversity,
        "embedding_two_sample_shift": embedding_two_sample_shift,
        "events_page_hinkley": events_page_hinkley,
        "events_trimmed_mean": events_trimmed_mean,
        "doc_sampling_ess": doc_sampling_ess,
        "doc_brier_decomposition": doc_brier_decomposition,
        "events_welch_anova": events_welch_anova,
        "doc_cramers_v": doc_cramers_v,
        "doc_cochran_q": doc_cochran_q,
        "doc_friedman_test": doc_friedman_test,
        "events_shift_function": events_shift_function,
        "doc_shard_mixing": doc_shard_mixing,
        "events_ks_test": events_ks_test,
        "embedding_decontaminate": embedding_decontaminate,
        # -- slots 44-47: construction-heavy round-10 candidates, LATE
        #    by the shadowing rationale (see docstring) --
        "doc_sinkhorn_shift": doc_sinkhorn_shift,
        "doc_unimax_budget": doc_unimax_budget,
        "corpus_wordpiece": corpus_wordpiece,
        "corpus_sentencepiece": corpus_sentencepiece,
        # slot 48 — corpus_lsa_topics runs driver-side eigendecomposition
        # jobs during plan construction; LATE so a failure shadows only
        # the slot after it (49 is pinned green r5-r9). See docstring.
        "corpus_lsa_topics": corpus_lsa_topics,
        # position 49 — last recorded slot; see docstring.
        "fit_embeddings_model": fit_embeddings_model,
        # -- tail: every entry below is hash-green in a recorded round --
        "doc_mcnemar": doc_mcnemar,
        "doc_concordance": doc_concordance,
        "doc_agreement_limits": doc_agreement_limits,
        "events_hits": events_hits,
        "events_label_propagation": events_label_propagation,
        "embedding_kcenter": embedding_kcenter,
        "doc_cosine_threshold_pairs": doc_cosine_threshold_pairs,
        "doc_metadata_mi": doc_metadata_mi,
        "corpus_negative_sampling": corpus_negative_sampling,
        "events_burstiness": events_burstiness,
        "doc_score_quantile_align": doc_score_quantile_align,
        "corpus_ppmi_invariants": corpus_ppmi_invariants,
        "corpus_log_odds": corpus_log_odds,
        "doc_ndcg_by_source": doc_ndcg_by_source,
        "doc_rbo_scorers": doc_rbo_scorers,
        "doc_selection_parity": doc_selection_parity,
        "doc_wasserstein_shift": doc_wasserstein_shift,
        "doc_domain_reweight": doc_domain_reweight,
        "events_diff_in_diff": events_diff_in_diff,
        "doc_conformal_threshold": doc_conformal_threshold,
        "embedding_knn_overlap": embedding_knn_overlap,
        "doc_balanced_shards": doc_balanced_shards,
        "events_histogram_quantiles": events_histogram_quantiles,
        "doc_span_corruption": doc_span_corruption,
        "embedding_hubness": embedding_hubness,
        "corpus_source_similarity": corpus_source_similarity,
        "embedding_robust_scale": embedding_robust_scale,
        "doc_boilerplate_prefixes": doc_boilerplate_prefixes,
        "doc_quality_auc": doc_quality_auc,
        "doc_score_calibration": doc_score_calibration,
        "doc_filter_agreement": doc_filter_agreement,
        "embedding_mutual_knn": embedding_mutual_knn,
        "doc_cross_corpus_near_dups": doc_cross_corpus_near_dups,
        "events_theil_sen": events_theil_sen,
        "events_bootstrap_ci": events_bootstrap_ci,
        "embedding_cka": embedding_cka,
        "events_dp_counts": events_dp_counts,
        "orders_rollup_revenue": orders_rollup_revenue,
        "doc_pii_redaction": doc_pii_redaction,
        "events_k_anonymity": events_k_anonymity,
        "doc_rake_keyphrases": doc_rake_keyphrases,
        "media_near_dup_pairs": media_near_dup_pairs,
        "corpus_unigram_lm": corpus_unigram_lm,
        "doc_sentence_dedup": doc_sentence_dedup,
        "doc_temperature_mix": doc_temperature_mix,
        "doc_containment_pairs": doc_containment_pairs,
        "embedding_cluster_purity": embedding_cluster_purity,
        "embedding_knn_accuracy": embedding_knn_accuracy,
        "events_autocorrelation": events_autocorrelation,
        "corpus_bytelevel_bpe": corpus_bytelevel_bpe,
        "embedding_procrustes": embedding_procrustes,
        "events_survival_km": events_survival_km,
        "orders_benford": orders_benford,
        "doc_lang_source_chi2": doc_lang_source_chi2,
        "corpus_hll_distinct": corpus_hll_distinct,
        "corpus_source_jsd": corpus_source_jsd,
        "orders_association_rules": orders_association_rules,
        "doc_isotonic_calibration": doc_isotonic_calibration,
        "doc_sliced_auc": doc_sliced_auc,
        "embedding_intrinsic_dim": embedding_intrinsic_dim,
        "doc_textrank_keywords": doc_textrank_keywords,
        "doc_length_batching": doc_length_batching,
        "events_cross_correlation": events_cross_correlation,
        "orders_rfm_segments": orders_rfm_segments,
        "doc_filter_yield": doc_filter_yield,
        "corpus_source_dup_rate": corpus_source_dup_rate,
        "corpus_source_gini": corpus_source_gini,
        "embedding_isotropy_sample": embedding_isotropy_sample,
        "q9_product_profit": q9_product_profit,
        "q13_customer_distribution": q13_customer_distribution,
        "q15_top_supplier": q15_top_supplier,
        "q16_supplier_part_counts": q16_supplier_part_counts,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "q20_part_suppliers": q20_part_suppliers,
        "q21_late_sole_suppliers": q21_late_sole_suppliers,
        "q22_idle_customers": q22_idle_customers,
        "corpus_pmi_bigrams": corpus_pmi_bigrams,
        "corpus_zipf_fit": corpus_zipf_fit,
        "doc_winnow_pairs": doc_winnow_pairs,
        "doc_perplexity_buckets": doc_perplexity_buckets,
        "corpus_source_overlap": corpus_source_overlap,
        "doc_remove_dup_spans": doc_remove_dup_spans,
        "doc_dedup_cluster_sizes": doc_dedup_cluster_sizes,
        "doc_token_budget_select": doc_token_budget_select,
        "events_pagerank": events_pagerank,
        "doc_tfidf_topterms": doc_tfidf_topterms,
        "corpus_packing_report": corpus_packing_report,
        "doc_curriculum_interleave": doc_curriculum_interleave,
        "embedding_outliers": embedding_outliers,
        "doc_winnow_verify": doc_winnow_verify,
        "doc_langid_eval": doc_langid_eval,
        "embedding_lloyd_kmeans": embedding_lloyd_kmeans,
        "embedding_sq8_error": embedding_sq8_error,
        "events_seasonal_decompose": events_seasonal_decompose,
        "events_cusum_change": events_cusum_change,
        "events_mad_outliers": events_mad_outliers,
        "events_concurrency": events_concurrency,
        "events_triangle_count": events_triangle_count,
        "doc_dataset_card": doc_dataset_card,
        "doc_kneser_ney": doc_kneser_ney,
        "doc_minhash_calibration": doc_minhash_calibration,
        "doc_ipf_balance": doc_ipf_balance,
        "embedding_whiten": embedding_whiten,
        "embedding_jl_projection": embedding_jl_projection,
        "events_scd2_pit": events_scd2_pit,
        "doc_contrastive_pairs": doc_contrastive_pairs,
        "doc_ngram_novelty": doc_ngram_novelty,
        "corpus_vocab_growth": corpus_vocab_growth,
        "doc_fertility": doc_fertility,
        "doc_encoding_quality": doc_encoding_quality,
        "doc_script_profile": doc_script_profile,
        "doc_length_drift": doc_length_drift,
        "doc_bloom_decontaminate": doc_bloom_decontaminate,
        "corpus_cms_heavy_hitters": corpus_cms_heavy_hitters,
        "embedding_silhouette": embedding_silhouette,
        "predicate_store_roundtrip": predicate_store_roundtrip,
        "knn_cosine_topk": knn_cosine_topk,
        "knn_euclidean_topk": knn_euclidean_topk,
        "knn_dot_topk": knn_dot_topk,
        "hybrid_filtered_knn": hybrid_filtered_knn,
        "clean_embeddings": clean_embeddings,
        "doc_exact_dedup": doc_exact_dedup,
        "doc_token_stats": doc_token_stats,
        "window_slice_rebase": window_slice_rebase,
        "topk_orders_per_customer": topk_orders_per_customer,
        "zero_vector_count": zero_vector_count,
        "dim_moments_embeddings": dim_moments_embeddings,
        "vector_norms": vector_norms,
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_region_revenue": q5_region_revenue,
        "pnode_range_filter": pnode_range_filter,
        "pnode_in_filter": pnode_in_filter,
        "pnode_regex_filter": pnode_regex_filter,
        "pnode_nested_andor": pnode_nested_andor,
        "pnode_null_eq": pnode_null_eq,
        "result_indices_hybrid": result_indices_hybrid,
        "union_concat": union_concat,
        "describe_embeddings": describe_embeddings,
        "shuffled_events": shuffled_events,
        "doc_training_pipeline": doc_training_pipeline,
        "events_pivot_counts": events_pivot_counts,
        "events_outlier_flags": events_outlier_flags,
        "embedding_standardize": embedding_standardize,
        "embedding_pca": embedding_pca,
        "corpus_bpe_merges": corpus_bpe_merges,
        "events_gapfill": events_gapfill,
        "embedding_maxsim": embedding_maxsim,
        "doc_edit_distance_pairs": doc_edit_distance_pairs,
        "doc_contamination_frac": doc_contamination_frac,
        "orders_snapshot_diff": orders_snapshot_diff,
        "orders_quality_report": orders_quality_report,
        "doc_rrf_fusion": doc_rrf_fusion,
        "events_cohort_retention": events_cohort_retention,
        "orders_column_profile": orders_column_profile,
        "doc_group_keywords": doc_group_keywords,
        "events_rolling_active": events_rolling_active,
        "events_top_paths": events_top_paths,
        "events_key_skew": events_key_skew,
        "embedding_group_centroids": embedding_group_centroids,
        "corpus_posting_lists": corpus_posting_lists,
        "q2_min_balance_supplier": q2_min_balance_supplier,
        "q4_order_priority": q4_order_priority,
        "q7_nation_volume": q7_nation_volume,
        "q8_market_share": q8_market_share,
        "q11_important_parts": q11_important_parts,
        "q12_lateness_priority": q12_lateness_priority,
        "doc_gopher_filter": doc_gopher_filter,
        "doc_token_entropy": doc_token_entropy,
        "embedding_hard_negatives": embedding_hard_negatives,
        "embedding_dim_quantiles": embedding_dim_quantiles,
        "orders_apply_changes": orders_apply_changes,
        "events_scd2_history": events_scd2_history,
        "embedding_psi_drift": embedding_psi_drift,
        "orders_incremental_agg": orders_incremental_agg,
        "events_multi_touch": events_multi_touch,
        "doc_entity_resolution": doc_entity_resolution,
        "events_ab_test": events_ab_test,
        "events_cooccurrence": events_cooccurrence,
        "doc_group_percent_rank": doc_group_percent_rank,
        "embedding_winsorize": embedding_winsorize,
        "doc_config_pipeline": doc_config_pipeline,
        "doc_sentence_stats": doc_sentence_stats,
        "embedding_matryoshka": embedding_matryoshka,
        "embedding_bq_hamming": embedding_bq_hamming,
        "events_trending": events_trending,
        "events_weekly_deltas": events_weekly_deltas,
        "events_funnel_steps": events_funnel_steps,
        "doc_readability": doc_readability,
        "ann_lsh_topk": ann_lsh_topk,
        "minhash_candidate_pairs": minhash_candidate_pairs,
        "simhash_pairs": simhash_pairs,
        "ks_normal_embeddings": ks_normal_embeddings,
        "knn_self_recall": knn_self_recall,
        "pq_rerank_self_top1": pq_rerank_self_top1,
        "doc_decontaminate": doc_decontaminate,
        "doc_repetition_stats": doc_repetition_stats,
        "doc_mixture_sample": doc_mixture_sample,
        "doc_pack_sequences": doc_pack_sequences,
        "doc_dsir_weights": doc_dsir_weights,
        "doc_quality_deciles": doc_quality_deciles,
        "corpus_vocab_topk": corpus_vocab_topk,
        "doc_paragraph_dedup": doc_paragraph_dedup,
        "doc_minhash_dedup_transitive": doc_minhash_dedup_transitive,
        "doc_c4_filters": doc_c4_filters,
        "events_asof_join": events_asof_join,
        "doc_domain_cap": doc_domain_cap,
        "doc_split_assign": doc_split_assign,
        "events_range_join": events_range_join,
        "doc_bigram_lm": doc_bigram_lm,
        "orders_priority_cube": orders_priority_cube,
        "doc_dup_spans": doc_dup_spans,
        "events_funnel": events_funnel,
        "corpus_vocab_coverage": corpus_vocab_coverage,
        "embedding_covariance": embedding_covariance,
        "doc_pack_bucketed": doc_pack_bucketed,
        "events_approx_distinct": events_approx_distinct,
        "events_attribution": events_attribution,
        "doc_bm25_search": doc_bm25_search,
        "orders_status_setops": orders_status_setops,
        "doc_chunk_overlap": doc_chunk_overlap,
        "doc_weighted_sample": doc_weighted_sample,
        "doc_ngram_jaccard": doc_ngram_jaccard,
        "doc_strip_markup": doc_strip_markup,
        "events_decayed_sum": events_decayed_sum,
        "events_transition_counts": events_transition_counts,
        "events_quantile_sketch": events_quantile_sketch,
        "events_salted_join": events_salted_join,
        "events_trailing_window": events_trailing_window,
        "doc_incremental_dedup": doc_incremental_dedup,
        "doc_dedup_keep_best": doc_dedup_keep_best,
        "doc_embedding_align": doc_embedding_align,
        "doc_subword_tokens": doc_subword_tokens,
        "doc_quality": doc_quality,
        "doc_lang_stats": doc_lang_stats,
        "embedding_near_dup_pairs": embedding_near_dup_pairs,
        "embedding_cluster_assign": embedding_cluster_assign,
        "embedding_semantic_dedup": embedding_semantic_dedup,
        "doc_winnow_fingerprints": doc_winnow_fingerprints,
        "events_cume_dist": events_cume_dist,
        "doc_dup_fingerprints": doc_dup_fingerprints,
        "agg_priority_count": agg_priority_count,
        "q10_returned_items": q10_returned_items,
        "q14_promo_revenue": q14_promo_revenue,
        "q18_large_orders": q18_large_orders,
        "q6_revenue_delta": q6_revenue_delta,
        "monthly_revenue_rollup": monthly_revenue_rollup,
        "customers_without_orders": customers_without_orders,
        "events_tumbling_hourly": events_tumbling_hourly,
        "events_sliding_windows": events_sliding_windows,
        "events_sessionize": events_sessionize,
        "events_user_stats": events_user_stats,
        "events_json_extract": events_json_extract,
        "events_time_parts": events_time_parts,
        "part_price_histogram": part_price_histogram,
        "supplier_balance_rank": supplier_balance_rank,
        "orders_running_total": orders_running_total,
    }


# Tail entries still awaiting their first driver CORRECTNESS row. Empty
# since the round-7 rotation: every registry entry either has a recorded
# hash-green row or sits inside the round-7 window (slots 0-49).
PENDING_FIRST_RECORDING: frozenset[str] = frozenset()


_STOPWORD_SQL_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

# Shared SQL fragments (DuckDB dialect) mirroring functions/text.py exactly.
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"
_NTOK = f"(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(len({_TOKENS}) AS INT) END)"
_PUNCT = (
    "(CASE WHEN length(text) = 0 THEN 0.0 ELSE "
    "CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END)"
)
_LTOKENS = "regexp_split_to_array(trim(lower(text)), '\\s+')"
_SWRATIO = (
    f"(CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE "
    f"CAST(len(list_filter({_LTOKENS}, x -> list_contains([{_STOPWORD_SQL_LIST}], x))) AS DOUBLE)"
    f" / len({_LTOKENS}) END)"
)
_COS_DIST = (
    "1 - list_inner_product(q.e, b.e)"
    "/(sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(b.e, b.e)))"
)
# 6dp-rounded heuristic quality score (the doc_quality oracle expression,
# shared by the evaluation-metric oracles).
_QUALITY6 = (
    f"round(least(length(text) / 500.0, 1.0) * 0.4"
    f" + least({_SWRATIO} * 4.0, 1.0) * 0.3"
    f" + greatest(0.0, 1.0 - {_PUNCT} * 5.0) * 0.3, 6)"
)
# Tagged union for the cross-corpus near-dup oracle: corpus A = even ids,
# corpus B = odd ids + re-idded copies of every 10th even doc.
_CROSS_SRC = (
    "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0"
    " UNION ALL SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1"
    " UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents"
    " WHERE doc_id % 2 = 0 AND doc_id % 10 = 0)"
)


def _winnow_oracle(k: int = 5, w: int = 4) -> str:
    """DuckDB replica of winnow_fingerprints(portable=True): md5-prefix
    k-gram hashes -> sliding-window minima -> distinct set."""
    return f"""
        WITH nrm AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
            FROM documents WHERE doc_id < 200),
        h AS (
            SELECT doc_id,
                   list_transform(
                       list_transform(range(1, greatest(length(t) - {k - 1}, 1) + 1),
                                      i -> substring(t, CAST(i AS INT), {k})),
                       g -> ('0x' || substring(md5(g), 1, 15))::BIGINT) AS hs
            FROM nrm),
        fp AS (
            SELECT doc_id,
                   list_distinct(
                       list_transform(range(1, greatest(len(hs) - {w - 1}, 1) + 1),
                                      i -> list_aggregate(list_slice(hs, CAST(i AS INT), CAST(i + {w - 1} AS INT)), 'min'))) AS f
            FROM h)
        SELECT doc_id, CAST(len(f) AS INT) AS n_fingerprints,
               list_aggregate(f, 'min') AS min_fingerprint
        FROM fp ORDER BY doc_id
    """


def _minhash_ctes(num_hashes: int = 32, bands: int = 8, k: int = 5,
                  max_bucket: int = 2000,
                  source: str = "documents") -> str:
    """Shared WITH-body replicating minhash_lsh_candidates(impl="md5") up to
    the ``capped`` banded table: KM double hashing over two 52-bit md5
    slices, banded keys, bucket cap. ``source`` is any relation expression
    with (doc_id, text) columns — pass a parenthesized UNION for
    cross-corpus replicas."""
    rpb = num_hashes // bands
    mask = (1 << 52) - 1
    mins = ", ".join(f"min((h1 + {i} * h2) & {mask}) AS m{i}" for i in range(num_hashes))
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, ('0x' || substring(md5('{b}:' || {cat}), 1, 15))::BIGINT AS band_hash FROM m".format(
            b=b,
            cat=" || ',' || ".join(f"m{b * rpb + j}" for j in range(rpb)),
        )
        for b in range(bands)
    )
    return f"""
        nrm AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
            FROM {source}),
        sh AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(length(t) - {k - 1}, 1) + 1),
                                         i -> substring(t, CAST(i AS INT), {k}))) AS g
            FROM nrm),
        h AS (
            SELECT doc_id, ('0x' || substring(md5(g), 1, 13))::BIGINT AS h1,
                           ('0x' || substring(md5(g), 14, 13))::BIGINT AS h2
            FROM sh),
        m AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id),
        banded AS ({band_selects}),
        capped AS (
            SELECT doc_id, band, band_hash FROM (
                SELECT doc_id, band, band_hash,
                       count(*) OVER (PARTITION BY band, band_hash) AS bn
                FROM banded)
            WHERE bn <= {max_bucket})"""


def _minhash_oracle(num_hashes: int = 32, bands: int = 8, k: int = 5,
                    max_bucket: int = 2000) -> str:
    """DuckDB replica of minhash_lsh_candidates(impl="md5")."""
    return f"""
        WITH {_minhash_ctes(num_hashes, bands, k, max_bucket)}
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM capped a JOIN capped b
          ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        ORDER BY id_a, id_b
    """


def _minhash_transitive_oracle(num_hashes: int = 32, bands: int = 8, k: int = 5,
                               max_bucket: int = 2000,
                               threshold: float = 0.5) -> str:
    """DuckDB replica of minhash_dedup(transitive=True, impl="md5"):
    banded candidates -> exact shingle-set Jaccard verify -> exact
    connected components via a RECURSIVE reachability CTE -> keep the
    minimum id per component. Jaccard arithmetic mirrors jaccard_verify
    exactly: |A∩B| and |A∪B| are exact ints over distinct shingle sets,
    one IEEE double division, so the threshold test agrees bit-for-bit."""
    return f"""
        WITH RECURSIVE {_minhash_ctes(num_hashes, bands, k, max_bucket)},
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM capped a JOIN capped b
              ON a.band = b.band AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id),
        sets AS (
            SELECT doc_id,
                   list_distinct(
                       list_transform(range(1, greatest(length(t) - {k - 1}, 1) + 1),
                                      i -> substring(t, CAST(i AS INT), {k}))) AS g
            FROM nrm),
        ver AS (
            SELECT c.id_a, c.id_b
            FROM cand c
            JOIN sets sa ON sa.doc_id = c.id_a
            JOIN sets sb ON sb.doc_id = c.id_b
            WHERE CAST(len(list_intersect(sa.g, sb.g)) AS DOUBLE)
                  / len(list_distinct(list_concat(sa.g, sb.g))) >= {threshold}),
        edges AS (
            SELECT id_a AS s, id_b AS d FROM ver
            UNION
            SELECT id_b, id_a FROM ver),
        reach(id, r) AS (
            SELECT s, d FROM edges
            UNION
            SELECT w.id, e.d FROM reach w JOIN edges e ON e.s = w.r),
        dropped AS (
            SELECT id FROM (
                SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id)
            WHERE comp < id)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id FROM dropped)
        ORDER BY doc_id
    """


def _minhash_cluster_sizes_oracle(num_hashes: int = 32, bands: int = 8, k: int = 5,
                                  max_bucket: int = 2000,
                                  threshold: float = 0.5) -> str:
    """DuckDB replica of dedup_cluster_sizes: the _minhash_transitive_oracle
    chain (banded candidates -> exact Jaccard verify -> RECURSIVE
    reachability components), then every doc joins its component
    (singletons = own id) and two aggregates form the histogram."""
    return f"""
        WITH RECURSIVE {_minhash_ctes(num_hashes, bands, k, max_bucket)},
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM capped a JOIN capped b
              ON a.band = b.band AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id),
        sets AS (
            SELECT doc_id,
                   list_distinct(
                       list_transform(range(1, greatest(length(t) - {k - 1}, 1) + 1),
                                      i -> substring(t, CAST(i AS INT), {k}))) AS g
            FROM nrm),
        ver AS (
            SELECT c.id_a, c.id_b
            FROM cand c
            JOIN sets sa ON sa.doc_id = c.id_a
            JOIN sets sb ON sb.doc_id = c.id_b
            WHERE CAST(len(list_intersect(sa.g, sb.g)) AS DOUBLE)
                  / len(list_distinct(list_concat(sa.g, sb.g))) >= {threshold}),
        edges AS (
            SELECT id_a AS s, id_b AS d FROM ver
            UNION
            SELECT id_b, id_a FROM ver),
        reach(id, r) AS (
            SELECT s, d FROM edges
            UNION
            SELECT w.id, e.d FROM reach w JOIN edges e ON e.s = w.r),
        comp AS (
            SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
        allc AS (
            SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        sizes AS (SELECT comp, count(*) AS cluster_size FROM allc GROUP BY comp)
        SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters
        FROM sizes GROUP BY cluster_size ORDER BY cluster_size
    """


def _pagerank_oracle(iterations: int = 10, damping: float = 0.85) -> str:
    """DuckDB replica of graph.pagerank over the transition graph: the
    fixed power iteration unrolled into explicit chained CTEs (r1..rN) —
    per-edge contributions round(,9)-then-DECIMAL-summed, rank update one
    double multiply-add rounded to 9dp; identical expression trees to the
    engine, so every iteration agrees bit-for-bit."""
    d = repr(float(damping))
    its = []
    for t in range(1, iterations + 1):
        its.append(f"""
        r{t} AS (
            SELECT nodes.node,
                   round((1.0 - {d}) / nn.n
                         + {d} * coalesce(CAST(inc.i AS DOUBLE), 0.0), 9) AS rank
            FROM nodes CROSS JOIN nn
            LEFT JOIN (
                SELECT ew.d AS node,
                       sum(CAST(round((r{t - 1}.rank * ew.w) / ew.ow, 9)
                                AS DECIMAL(28,9))) AS i
                FROM ew JOIN r{t - 1} ON ew.s = r{t - 1}.node
                GROUP BY ew.d) inc
              ON nodes.node = inc.node)""")
    return f"""
        WITH p AS (
            SELECT user_id, event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events),
        e AS (
            SELECT from_type AS s, to_type AS d,
                   CAST(count(*) AS DOUBLE) AS w
            FROM p WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type),
        nodes AS MATERIALIZED (SELECT s AS node FROM e UNION SELECT d FROM e),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        ow AS (SELECT s, sum(w) AS ow FROM e GROUP BY s),
        ew AS (SELECT e.s, e.d, e.w, ow.ow FROM e JOIN ow USING (s)),
        r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
        {",".join(its)}
        SELECT node AS event_type, round(rank, 6) AS rank
        FROM r{iterations} ORDER BY event_type
    """


def _langid_eval_oracle(min_score: float = 0.05) -> str:
    """DuckDB replica of detect_lang: marker-fraction scores generated
    from the SAME _LANG_MARKERS lists, argmax via struct max (score then
    lang — ties toward the larger code, matching Spark's array_max)."""
    from nbdatatools_spark.functions.text import _LANG_MARKERS

    score_cols = []
    structs = []
    for lang, words in _LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        score_cols.append(
            f"CAST(len(list_filter(t, x -> x IN ({lst}))) AS DOUBLE)"
            f" / greatest(len(t), 1) AS s_{lang}"
        )
        structs.append(f"{{'score': s_{lang}, 'lang': '{lang}'}}")
    return f"""
        WITH tk AS (
            SELECT lang AS label,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t
            FROM documents),
        sc AS (SELECT label, {", ".join(score_cols)} FROM tk),
        b AS (SELECT label,
                     list_aggregate([{", ".join(structs)}], 'max') AS best
              FROM sc)
        SELECT label,
               CASE WHEN best.score >= {min_score} THEN best.lang
                    ELSE 'und' END AS predicted,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM b GROUP BY 1, 2 ORDER BY label, predicted
    """


def _simhash_oracle(max_hamming: int = 8, k: int = 4) -> str:
    """DuckDB replica of the portable 60-bit simhash, verified BRUTE-FORCE:
    all pairs with exact hamming <= max_hamming. The Spark side answers via
    pigeonhole blocking, so a hash match proves blocking recall = 1."""
    n_bits = 60
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(n_bits)
    )
    assemble = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END" for b in range(n_bits)
    )
    return f"""
        WITH nrm AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
            FROM documents WHERE doc_id < 300),
        sh AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(range(1, greatest(length(t) - {k - 1}, 1) + 1),
                                         i -> substring(t, CAST(i AS INT), {k}))) AS g
            FROM nrm),
        h AS (SELECT doc_id, ('0x' || substring(md5(g), 1, 15))::BIGINT AS h FROM sh),
        v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
        s AS (SELECT doc_id, ({assemble}) AS simhash FROM v)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
        ORDER BY id_a, id_b
    """


def _ann_lsh_oracle(k: int = 10, dim: int = 64, n_bits: int = 8, seed: int = 42) -> str:
    """DuckDB replica of lsh_topk: the seeded hyperplanes are generated with
    the SAME driver-side RNG and inlined as array literals, so signatures,
    bucket equi-join, cosine distances, and the (dist, bid) tie-break all
    reproduce bit-for-bit."""
    from nbdatatools_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_bits, seed)
    sig_terms = " + ".join(
        "(CASE WHEN list_inner_product(e, [{vals}]) > 0 THEN {bit} ELSE 0 END)".format(
            vals=", ".join(repr(float(x)) for x in plane), bit=1 << j
        )
        for j, plane in enumerate(planes)
    )
    return f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        s AS (SELECT vec_id, e, ({sig_terms}) AS sig FROM v),
        q AS (SELECT vec_id AS qid, e AS qe, sig FROM s WHERE vec_id < 20),
        pairs AS (
            SELECT q.qid, s.vec_id AS bid,
                   1 - list_inner_product(q.qe, s.e)
                       / (sqrt(list_inner_product(q.qe, q.qe))
                          * sqrt(list_inner_product(s.e, s.e))) AS dist
            FROM q JOIN s ON q.sig = s.sig),
        ranked AS (
            SELECT qid, bid, dist,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY dist ASC NULLS LAST, bid ASC) AS rn
            FROM pairs)
        SELECT qid AS query_id, CAST(rn AS INT) AS rank, bid AS base_id,
               round(dist, 6) + 0.0 AS distance
        FROM ranked WHERE rn <= {k}
        ORDER BY query_id, rank
    """


def _cluster_assign_oracle(k: int = 8, dim: int = 64, seed: int = 1234) -> str:
    """DuckDB replica of centroid_assign: same seeded centroids inlined as
    DOUBLE[] literals, same cosine-distance formula
    (1 - dot/(sqrt(dot_aa)*sqrt(dot_bb)), sequential folds on both engines),
    argmin via row_number ordered (cdist ASC, cid ASC) — the struct
    tie-break centroid_assign uses."""
    cents = _semdedup_centroids(k, dim, seed)
    vals = ",\n                 ".join(
        "({i}, [{v}]::DOUBLE[])".format(
            i=i, v=", ".join(repr(x) for x in c)
        )
        for i, c in enumerate(cents)
    )
    return f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        c(cid, ce) AS (VALUES {vals}),
        d AS (SELECT vec_id, cid,
                     1.0 - list_inner_product(e, ce)
                           / (sqrt(list_inner_product(e, e))
                              * sqrt(list_inner_product(ce, ce))) AS cd
              FROM v CROSS JOIN c),
        r AS (SELECT vec_id, cid, cd,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cd ASC NULLS LAST, cid ASC) AS rn
              FROM d)
        SELECT vec_id, CAST(cid AS INT) AS centroid_id, round(cd, 6) + 0.0 AS cdist
        FROM r WHERE rn = 1 ORDER BY vec_id
    """


def _semantic_dedup_oracle(
    k: int = 8,
    dim: int = 64,
    seed: int = 1234,
    tau: float = 0.95,
    n_dups: int = 25,
    id_shift: int = 10_000,
) -> str:
    """DuckDB replica of embedding_semantic_dedup. Because only duplicate
    CLIQUES clear tau (see the query docstring), greedy == "keep x iff no
    y with cos(x, y) >= tau precedes x in (centroid_sim ASC, vec_id ASC)
    visit order". centroid_sim is computed with the exact Spark arithmetic
    (1.0 - cdist) so clique ties resolve identically on both engines."""
    cents = _semdedup_centroids(k, dim, seed)
    vals = ",\n                 ".join(
        "({i}, [{v}]::DOUBLE[])".format(
            i=i, v=", ".join(repr(x) for x in c)
        )
        for i, c in enumerate(cents)
    )
    return f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            UNION ALL
            SELECT vec_id + {id_shift}, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE vec_id < {n_dups}),
        c(cid, ce) AS (VALUES {vals}),
        d AS (SELECT vec_id, e, cid,
                     1.0 - list_inner_product(e, ce)
                           / (sqrt(list_inner_product(e, e))
                              * sqrt(list_inner_product(ce, ce))) AS cd
              FROM base CROSS JOIN c),
        a AS (SELECT vec_id, e, cid, 1.0 - cd AS csim
              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY cd ASC NULLS LAST, cid ASC) AS rn
                    FROM d)
              WHERE rn = 1)
        SELECT x.vec_id, CAST(x.cid AS INT) AS centroid_id
        FROM a x
        WHERE NOT EXISTS (
            SELECT 1 FROM a y
            WHERE y.vec_id <> x.vec_id
              AND list_inner_product(x.e, y.e)
                  / (sqrt(list_inner_product(x.e, x.e))
                     * sqrt(list_inner_product(y.e, y.e))) >= {tau}
              AND (y.csim < x.csim
                   OR (y.csim = x.csim AND y.vec_id < x.vec_id)))
        ORDER BY x.vec_id
    """


def _bq_hamming_oracle(k: int = 5, n_queries: int = 10, dim: int = 64) -> str:
    """DuckDB replica of bq_topk (no rerank): identical literal-weight sign
    packing (bit 63 carries the two's-complement sign weight) and
    bit_count(xor) Hamming, same (hamming, base_id) tie-break."""
    def weight(i: int) -> str:
        # -(1<<63) parses as unary minus over an overflowing positive
        # literal; spell it as (-max-1) so it stays in INT64
        return f"{1 << i}::BIGINT" if i < 63 else "(-9223372036854775807::BIGINT - 1)"

    terms = " + ".join(
        f"CASE WHEN embedding[{i + 1}] > 0 THEN {weight(i)} ELSE 0::BIGINT END"
        for i in range(dim)
    )
    return f"""
        WITH codes AS (
            SELECT vec_id, ({terms}) AS w FROM embeddings),
        pairs AS (
            SELECT q.vec_id AS qid, b.vec_id AS bid,
                   CAST(bit_count(xor(q.w, b.w)) AS INT) AS hamming
            FROM codes q CROSS JOIN codes b
            WHERE q.vec_id < {n_queries}),
        ranked AS (
            SELECT qid, bid, hamming,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY hamming ASC, bid ASC) AS rn
            FROM pairs)
        SELECT qid AS query_id, CAST(rn AS INT) AS rank, bid AS base_id, hamming
        FROM ranked WHERE rn <= {k}
        ORDER BY query_id, rank
    """


def _ks_normal_oracle() -> str:
    """DuckDB replica of ks_statistic_normal: ECDF via cume_dist, normal CDF
    via the same Abramowitz-Stegun 7.1.26 erf closed form (term-for-term
    identical arithmetic; round(4) absorbs libm last-ulp divergence)."""
    import math

    sqrt2 = repr(math.sqrt(2.0))
    erf = (
        "(CASE WHEN z < 0 THEN -1.0 ELSE 1.0 END) * "
        "(1.0 - (0.254829592 * t - 0.284496736 * power(t, 2) + 1.421413741 * power(t, 3)"
        " - 1.453152027 * power(t, 4) + 1.061405429 * power(t, 5)) * exp(-abs(z) * abs(z)))"
    )
    return f"""
        WITH e AS (
            SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS value
            FROM embeddings),
        st AS (SELECT dim, avg(value) AS mu, stddev_pop(value) AS sigma FROM e GROUP BY dim),
        c AS (SELECT dim, value,
                     cume_dist() OVER (PARTITION BY dim ORDER BY value) AS cdf
              FROM e),
        zt AS (SELECT c.dim, c.cdf,
                      (c.value - st.mu) / (st.sigma * {sqrt2}) AS z,
                      1.0 / (1.0 + 0.3275911 * abs((c.value - st.mu) / (st.sigma * {sqrt2}))) AS t
               FROM c JOIN st ON c.dim = st.dim)
        SELECT dim, round(max(abs(cdf - 0.5 * (1.0 + {erf}))), 4) + 0.0 AS ks_stat
        FROM zt GROUP BY dim ORDER BY dim
    """


def _lloyd_assign_ctes(k: int = 8, iterations: int = 2) -> str:
    """Shared WITH-body replicating clustering._lloyd_final_assign down to
    the per-row FINAL assignment table ``bf(vec_id, cid, d)`` — unrolled
    iteration CTEs with the SAME sequential zip-fold euclidean distance
    (list_reduce == Spark's F.aggregate left fold, bit-identical) and the
    same 9dp-DECIMAL mean / 6dp rounding discipline."""
    dist = (
        "round(sqrt(list_reduce(list_transform(list_zip(e.v, c.c), "
        "s -> (s[1] - s[2]) * (s[1] - s[2])), (x, y) -> x + y)), 6)"
    )
    parts = [f"""
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cent0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
                   list_transform(v, x -> round(x, 6)) AS c
            FROM emb ORDER BY vec_id LIMIT {k})"""]
    for it in range(1, iterations + 1):
        prev = f"cent{it - 1}"
        parts.append(f"""
        a{it} AS (
            SELECT e.vec_id, e.v, c.cid, {dist} AS d
            FROM emb e CROSS JOIN {prev} c),
        b{it} AS (
            SELECT vec_id, v, cid FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
                FROM a{it}) WHERE rn = 1),
        ex{it} AS (
            SELECT cid, CAST(generate_subscripts(v, 1) - 1 AS INT) AS dim,
                   CAST(round(unnest(v), 9) AS DECIMAL(20,9)) AS term
            FROM b{it}),
        m{it} AS (
            SELECT cid, list(m ORDER BY dim) AS c2 FROM (
                SELECT cid, dim,
                       round(CAST(CAST(sum(term) AS DECIMAL(38,9)) AS DOUBLE)
                             / count(*), 6) AS m
                FROM ex{it} GROUP BY cid, dim) GROUP BY cid),
        cent{it} AS (
            SELECT p.cid, COALESCE(n.c2, p.c) AS c
            FROM {prev} p LEFT JOIN m{it} n ON p.cid = n.cid)""")
    fin = iterations
    body = ",".join(parts)
    return f"""{body},
        af AS (
            SELECT e.vec_id, c.cid, {dist} AS d
            FROM emb e CROSS JOIN cent{fin} c),
        bf AS (
            SELECT vec_id, cid, d FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
                FROM af) WHERE rn = 1)"""


def _lloyd_oracle(k: int = 8, iterations: int = 2) -> str:
    """DuckDB replica of clustering.lloyd_fixed_iterations (the final
    per-cluster aggregate over the shared assignment CTEs)."""
    return f"""
        WITH {_lloyd_assign_ctes(k, iterations)}
        SELECT cid AS centroid_id, count(*) AS n_assigned,
               round(CAST(CAST(sum(CAST(round(d * d, 9) AS DECIMAL(20,9)))
                     AS DECIMAL(38,9)) AS DOUBLE), 6) AS inertia
        FROM bf GROUP BY cid ORDER BY centroid_id
    """


def _minhash_calibration_oracle(num_hashes: int = 32, bands: int = 8,
                                k: int = 5, max_bucket: int = 2000) -> str:
    """DuckDB replica of dedup.minhash_calibration(impl="md5"): the shared
    banding CTEs -> candidate pairs -> slot-agreement estimator over the
    m-table signatures -> exact distinct-shingle Jaccard (the
    jaccard_verify fragment) -> absolute error."""
    agree = " + ".join(
        f"(CASE WHEN ma.m{i} = mb.m{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return f"""
        WITH {_minhash_ctes(num_hashes, bands, k, max_bucket)},
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM capped a JOIN capped b
              ON a.band = b.band AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id),
        est AS (
            SELECT c.id_a, c.id_b,
                   round(CAST({agree} AS DOUBLE) / {float(num_hashes)}, 6)
                     AS est_jaccard
            FROM cand c JOIN m ma ON ma.doc_id = c.id_a
                        JOIN m mb ON mb.doc_id = c.id_b),
        sets AS (
            SELECT doc_id,
                   list_distinct(
                       list_transform(range(1, greatest(length(t) - {k - 1}, 1) + 1),
                                      i -> substring(t, CAST(i AS INT), {k}))) AS g
            FROM nrm),
        ex AS (
            SELECT e.id_a, e.id_b, e.est_jaccard,
                   round(CAST(len(list_intersect(sa.g, sb.g)) AS DOUBLE)
                         / len(list_distinct(list_concat(sa.g, sb.g))), 6)
                     AS exact_jaccard
            FROM est e JOIN sets sa ON sa.doc_id = e.id_a
                       JOIN sets sb ON sb.doc_id = e.id_b)
        SELECT id_a, id_b, est_jaccard, exact_jaccard,
               round(abs(est_jaccard - exact_jaccard), 6) AS abs_err
        FROM ex ORDER BY id_a, id_b
    """


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
                   CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15'
              AND l_shipdate > TIMESTAMP '1998-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC
        """,
        "agg_priority_count": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name, n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-04-01'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "q14_promo_revenue": """
            SELECT round(
                     CAST(sum(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                   * (1 - CAST(l_discount AS DECIMAL(12,2)))
                              ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE) * 100.0
                     / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
                     6) AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-02-01'
        """,
        "q18_large_orders": """
            WITH big AS (
                SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250)
            SELECT c_custkey, c_name, o_orderkey,
                   CAST(o_orderdate AS DATE) AS o_orderdate,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
                   CAST(qty AS DOUBLE) AS total_qty
            FROM orders
            JOIN big ON o_orderkey = big.l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 50
        """,
        "pnode_range_filter": """
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE (o_totalprice > 50000.0 AND o_totalprice < 60000.0)
            ORDER BY o_orderkey
        """,
        "pnode_in_filter": """
            SELECT c_mktsegment, count(*) AS n FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "pnode_regex_filter": """
            SELECT p_type, count(*) AS n FROM part
            WHERE regexp_full_match(p_type, '(ECO|PRO).*')
            GROUP BY p_type ORDER BY p_type
        """,
        "pnode_nested_andor": """
            SELECT l_returnflag, count(*) AS n,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem
            WHERE ((l_quantity >= 45.0 OR l_discount >= 0.09) AND l_returnflag != 'A')
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "pnode_null_eq": """
            SELECT event_id FROM events
            WHERE nullif(event_type, 'error') IS NULL
            ORDER BY event_id
        """,
        "result_indices_hybrid": """
            SELECT event_id AS ordinal FROM events
            WHERE (user_id <= 200 AND event_type IN ('click', 'purchase'))
            ORDER BY ordinal
        """,
        "predicate_store_roundtrip": """
            SELECT event_id AS ordinal FROM events
            WHERE event_id < 2000
              AND (user_id <= 200 AND event_type IN ('click', 'purchase'))
            ORDER BY ordinal
        """,
        "window_slice_rebase": """
            SELECT CAST(row_number() OVER (ORDER BY event_id) - 1 AS BIGINT) AS logical_ordinal,
                   event_id, event_type
            FROM events
            WHERE (event_id >= 100 AND event_id < 200) OR (event_id >= 500 AND event_id < 600)
        """,
        "topk_orders_per_customer": """
            SELECT o_custkey, CAST(rank AS INT) AS rank, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
                FROM orders) t
            WHERE rank <= 3 AND o_custkey <= 100
        """,
        "shuffled_events": """
            SELECT event_id,
                   CAST(row_number() OVER (ORDER BY md5('42:' || CAST(event_id AS VARCHAR)) ASC, event_id ASC) - 1 AS BIGINT) AS new_ordinal
            FROM events WHERE event_id < 1000
        """,
        "union_concat": """
            SELECT 'p' AS src, event_id, user_id FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT 'e' AS src, event_id, user_id FROM events WHERE event_type = 'error'
            ORDER BY event_id
        """,
        "describe_embeddings": """
            SELECT count(*) AS count,
                   min(vec_id) AS min_ordinal, max(vec_id) AS max_ordinal,
                   count(DISTINCT len(embedding)) AS n_distinct_dims,
                   CAST(min(len(embedding)) AS INT) AS min_dim,
                   CAST(max(len(embedding)) AS INT) AS max_dim,
                   CAST(sum(CASE WHEN list_aggregate(list_transform(embedding, x -> abs(x)), 'sum') = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
            FROM embeddings
        """,
        "zero_vector_count": """
            SELECT CAST(sum(CASE WHEN list_aggregate(list_transform(embedding, x -> abs(x)), 'sum') = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
                   count(*) AS n_total
            FROM embeddings
        """,
        "dim_moments_embeddings": """
            WITH e AS (
                SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS value
                FROM embeddings),
            m AS (
                SELECT dim, count(*) AS n, avg(value) AS mean,
                       avg(value * value) AS m2raw, avg(value * value * value) AS m3raw,
                       min(value) AS vmin, max(value) AS vmax
                FROM e GROUP BY dim)
            SELECT dim, n, round(mean, 6) AS mean,
                   round(m2raw - mean * mean, 6) AS variance,
                   round((m3raw - 3 * mean * m2raw + 2 * mean * mean * mean)
                         / power(sqrt(m2raw - mean * mean), 3), 6) AS skewness,
                   round(vmin, 6) AS min, round(vmax, 6) AS max
            FROM m ORDER BY dim
        """,
        "vector_norms": """
            SELECT vec_id,
                   round(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
            FROM embeddings WHERE vec_id < 100 ORDER BY vec_id
        """,
        "knn_cosine_topk": f"""
            WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 20),
                 b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
                 pairs AS (
                    SELECT q.vec_id AS qid, b.vec_id AS bid, {_COS_DIST} AS dist
                    FROM q CROSS JOIN b),
                 ranked AS (
                    SELECT qid, bid, dist,
                           row_number() OVER (PARTITION BY qid ORDER BY dist ASC, bid ASC) AS rn
                    FROM pairs)
            SELECT qid AS query_id, CAST(rn AS INT) AS rank, bid AS base_id,
                   round(dist, 6) + 0.0 AS distance
            FROM ranked WHERE rn <= 10
        """,
        "embedding_near_dup_pairs": """
            WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                       FROM embeddings WHERE vec_id < 300)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_inner_product(a.e, b.e)
                         / (sqrt(list_inner_product(a.e, a.e))
                            * sqrt(list_inner_product(b.e, b.e))), 6) AS cosine_sim
            FROM s a JOIN s b ON a.vec_id < b.vec_id
            WHERE list_inner_product(a.e, b.e)
                  / (sqrt(list_inner_product(a.e, a.e))
                     * sqrt(list_inner_product(b.e, b.e))) >= 0.3
            ORDER BY id_a, id_b
        """,
        "knn_euclidean_topk": """
            WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 10),
                 b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
                 pairs AS (
                    SELECT q.vec_id AS qid, b.vec_id AS bid,
                           sqrt(greatest(0.0,
                                list_inner_product(q.e, q.e) - 2 * list_inner_product(q.e, b.e)
                                + list_inner_product(b.e, b.e))) AS dist
                    FROM q CROSS JOIN b),
                 ranked AS (
                    SELECT qid, bid, dist,
                           row_number() OVER (PARTITION BY qid ORDER BY dist ASC, bid ASC) AS rn
                    FROM pairs)
            SELECT qid AS query_id, CAST(rn AS INT) AS rank, bid AS base_id,
                   round(dist, 6) AS distance
            FROM ranked WHERE rn <= 5
        """,
        "doc_exact_dedup": f"""
            SELECT min(doc_id) AS doc_id, md5({_NORM}) AS fingerprint
            FROM documents GROUP BY 2 ORDER BY doc_id
        """,
        "doc_dup_fingerprints": f"""
            SELECT md5({_NORM}) AS fingerprint, count(*) AS n, min(doc_id) AS survivor_id
            FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY fingerprint
        """,
        "doc_token_stats": f"""
            SELECT doc_id, {_NTOK} AS n_tokens,
                   round({_PUNCT}, 6) AS punct_ratio,
                   round({_SWRATIO}, 6) AS stopword_ratio
            FROM documents WHERE doc_id < 200 ORDER BY doc_id
        """,
        "doc_subword_tokens": """
            SELECT doc_id,
                   CAST(len(list_filter(
                       regexp_extract_all(text,
                           '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+|\\s+'),
                       x -> regexp_matches(x, '\\S'))) AS INT) AS n_subword_tokens
            FROM documents WHERE doc_id < 200 ORDER BY doc_id
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   round(least(length(text) / 500.0, 1.0) * 0.4
                         + least({_SWRATIO} * 4.0, 1.0) * 0.3
                         + greatest(0.0, 1.0 - {_PUNCT} * 5.0) * 0.3, 6) AS quality
            FROM documents WHERE doc_id < 200 ORDER BY doc_id
        """,
        "doc_lang_stats": """
            SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "events_tumbling_hourly": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
        """,
        "events_sliding_windows": """
            WITH starts AS (
                SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
                UNION ALL
                SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS window_start, value FROM events)
            SELECT window_start, count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM starts GROUP BY window_start ORDER BY window_start
        """,
        "events_sessionize": """
            WITH marked AS (
                SELECT user_id, event_id, ts, value,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_sess
                FROM events WHERE user_id <= 50),
            sess AS (
                SELECT user_id, ts, value,
                       sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM marked)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   min(ts) AS session_start, count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
        """,
        "events_user_stats": """
            SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value,
                   min(ts) AS first_ts, max(ts) AS last_ts,
                   count(DISTINCT event_type) AS n_types
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "events_json_extract": """
            SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events WHERE event_id < 2000 ORDER BY event_id
        """,
        "q6_revenue_delta": """
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        """,
        "monthly_revenue_rollup": """
            SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_orders
            FROM orders GROUP BY 1 ORDER BY month
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey
        """,
        "knn_dot_topk": """
            WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 10),
                 b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
                 pairs AS (
                    SELECT q.vec_id AS qid, b.vec_id AS bid,
                           -list_inner_product(q.e, b.e) AS dist
                    FROM q CROSS JOIN b),
                 ranked AS (
                    SELECT qid, bid, dist,
                           row_number() OVER (PARTITION BY qid ORDER BY dist ASC, bid ASC) AS rn
                    FROM pairs)
            SELECT qid AS query_id, CAST(rn AS INT) AS rank, bid AS base_id,
                   round(dist, 6) AS distance
            FROM ranked WHERE rn <= 5
        """,
        "hybrid_filtered_knn": f"""
            WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 10),
                 b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
                 pairs AS (
                    SELECT q.vec_id AS qid, b.vec_id AS bid, {_COS_DIST} AS dist
                    FROM q JOIN b ON b.label = q.vec_id % 3),
                 ranked AS (
                    SELECT qid, bid, dist,
                           row_number() OVER (PARTITION BY qid ORDER BY dist ASC, bid ASC) AS rn
                    FROM pairs)
            SELECT qid AS query_id, CAST(rn AS INT) AS rank, bid AS base_id,
                   round(dist, 6) AS distance
            FROM ranked WHERE rn <= 5
        """,
        "events_cume_dist": """
            SELECT event_type, event_id,
                   round(cume_dist() OVER (PARTITION BY event_type ORDER BY value), 6) AS cdf
            FROM events WHERE user_id <= 20
            ORDER BY event_type, event_id
        """,
        "clean_embeddings": """
            SELECT min(vec_id) AS vec_id FROM embeddings
            WHERE list_aggregate(list_transform(embedding, x -> abs(x)), 'sum') != 0
            GROUP BY embedding ORDER BY vec_id
        """,
        "events_time_parts": """
            SELECT event_id, CAST(dayofweek(ts) AS INT) AS dow,
                   CAST(hour(ts) AS INT) AS hh, CAST(dayofmonth(ts) AS INT) AS dom
            FROM events WHERE event_id < 3000 ORDER BY event_id
        """,
        "part_price_histogram": """
            SELECT CAST(floor(p_retailprice / 100) AS BIGINT) AS bucket, count(*) AS n
            FROM part GROUP BY 1 ORDER BY bucket
        """,
        "supplier_balance_rank": """
            SELECT s_suppkey, s_name,
                   CAST(row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS INT) AS bal_rank
            FROM supplier ORDER BY bal_rank
        """,
        "orders_running_total": """
            SELECT o_custkey, o_orderkey,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                        OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                              ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
            FROM orders WHERE o_custkey <= 50
            ORDER BY o_custkey, o_orderkey
        """,
        # algorithm-replica oracles (generated SQL) — promoted from rows-only
        # in round 2 (VERDICT next-round #3)
        "doc_winnow_fingerprints": _winnow_oracle(),
        "minhash_candidate_pairs": _minhash_oracle(),
        "doc_minhash_dedup_transitive": _minhash_transitive_oracle(),
        "doc_dedup_cluster_sizes": _minhash_cluster_sizes_oracle(),
        "events_pagerank": _pagerank_oracle(),
        "doc_langid_eval": _langid_eval_oracle(),
        # per-doc tf-idf: normalized tokens, vocab df with min_df prune,
        # score = round(tf * round(ln(N/df), 9), 6), per-doc rank window
        "doc_tfidf_topterms": """
            WITH nrm AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
                FROM documents),
            tk AS (SELECT doc_id,
                          CASE WHEN length(nt) = 0 THEN []::VARCHAR[]
                               ELSE regexp_split_to_array(nt, ' ') END AS t
                   FROM nrm),
            tf AS (SELECT doc_id, u.w AS token, count(*) AS tf
                   FROM tk, unnest(t) AS u(w) GROUP BY doc_id, u.w),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            dfq AS (SELECT token, count(*) AS df FROM tf
                    GROUP BY token HAVING count(*) >= 2),
            scored AS (
                SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
                       round(tf.tf * round(ln(n / df), 9), 6) AS score
                FROM tf JOIN dfq USING (token), nn),
            r AS (SELECT *,
                         CAST(row_number() OVER (
                             PARTITION BY doc_id
                             ORDER BY score DESC, token ASC) AS INT) AS rank
                  FROM scored)
            SELECT doc_id, token, tf, df, score, rank
            FROM r WHERE rank <= 3 ORDER BY doc_id, rank
        """,
        # packing report: one scalar aggregate, per-candidate closed form
        "corpus_packing_report": f"""
            WITH q AS (SELECT CAST({_NTOK} AS BIGINT) AS nt FROM documents),
            s AS (SELECT CAST(sum(nt) AS BIGINT) AS total,
                         CAST(sum(CASE WHEN nt > 128 THEN 1 ELSE 0 END) AS BIGINT) AS o128,
                         CAST(sum(CASE WHEN nt > 256 THEN 1 ELSE 0 END) AS BIGINT) AS o256,
                         CAST(sum(CASE WHEN nt > 512 THEN 1 ELSE 0 END) AS BIGINT) AS o512
                  FROM q)
            SELECT c.max_tokens,
                   CAST(ceil(s.total / CAST(c.max_tokens AS DOUBLE)) AS BIGINT)
                       AS n_sequences,
                   s.total AS total_tokens,
                   CAST(CAST(ceil(s.total / CAST(c.max_tokens AS DOUBLE)) AS BIGINT)
                        * c.max_tokens - s.total AS BIGINT) AS padding_tokens,
                   CASE WHEN ceil(s.total / CAST(c.max_tokens AS DOUBLE)) > 0
                        THEN round(
                            (CAST(ceil(s.total / CAST(c.max_tokens AS DOUBLE)) AS BIGINT)
                             * c.max_tokens - s.total)
                            / (CAST(ceil(s.total / CAST(c.max_tokens AS DOUBLE)) AS BIGINT)
                               * CAST(c.max_tokens AS DOUBLE)), 6)
                        ELSE 0.0 END AS padding_frac,
                   CASE c.max_tokens WHEN 128 THEN s.o128
                                     WHEN 256 THEN s.o256
                                     ELSE s.o512 END AS n_oversized_docs
            FROM s, (VALUES (128), (256), (512)) AS c(max_tokens)
            ORDER BY c.max_tokens
        """,
        # curriculum interleave: per-tier 0-based ranks, integer round-robin
        # key rank*n_tiers + tier_idx, dense global rank of the key
        "doc_curriculum_interleave": """
            WITH nt AS (SELECT count(DISTINCT lang) AS n FROM documents),
            ti AS (SELECT lang,
                          CAST(row_number() OVER (ORDER BY lang) - 1 AS INT)
                              AS tier_idx
                   FROM (SELECT DISTINCT lang FROM documents)),
            r AS (SELECT d.doc_id, d.lang, ti.tier_idx,
                         CAST(row_number() OVER (PARTITION BY d.lang
                                                 ORDER BY d.doc_id) - 1
                              AS BIGINT) AS rank_in_tier
                  FROM documents d JOIN ti USING (lang)),
            k AS (SELECT doc_id, lang, tier_idx, rank_in_tier,
                         rank_in_tier * nt.n + tier_idx AS key
                  FROM r, nt)
            SELECT doc_id, lang, tier_idx, rank_in_tier,
                   CAST(row_number() OVER (ORDER BY key, doc_id) - 1 AS BIGINT)
                       AS training_pos
            FROM k ORDER BY training_pos
        """,
        # diagonal-Mahalanobis outliers: 9dp mu/sd (naive-moment sd, the
        # standardize fit), 9dp z^2 DECIMAL-summed, round(sqrt, 6) top-20
        "embedding_outliers": """
            WITH e AS (
                SELECT vec_id,
                       CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings),
            m AS (
                SELECT dim, round(avg(v), 9) AS mu,
                       round(sqrt(avg(v * v) - avg(v) * avg(v)), 9) AS sd
                FROM e GROUP BY dim),
            t AS (
                SELECT e.vec_id,
                       CAST(CASE WHEN m.sd > 0
                                 THEN round(((e.v - m.mu) / m.sd)
                                            * ((e.v - m.mu) / m.sd), 9)
                                 ELSE 0.0 END AS DECIMAL(28,9)) AS z2
                FROM e JOIN m USING (dim)),
            d AS (SELECT vec_id,
                         round(sqrt(CAST(sum(z2) AS DOUBLE)), 6) AS mdist
                  FROM t GROUP BY vec_id),
            r AS (SELECT vec_id, mdist,
                         CAST(row_number() OVER (ORDER BY mdist DESC,
                                                 vec_id ASC) AS INT) AS rank
                  FROM d)
            SELECT vec_id, mdist, rank FROM r WHERE rank <= 20 ORDER BY rank
        """,
        # winnow verify: the doc_winnow_pairs pipeline + overlap
        # coefficient |A∩B|/min(|A|,|B|) on the full fingerprint sets
        "doc_winnow_verify": """
            WITH nrm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents WHERE doc_id < 300),
            h AS (
                SELECT doc_id,
                       list_transform(
                           list_transform(range(1, greatest(length(t) - 4, 1) + 1),
                                          i -> substring(t, CAST(i AS INT), 5)),
                           g -> ('0x' || substring(md5(g), 1, 15))::BIGINT) AS hs
                FROM nrm),
            fp AS (
                SELECT doc_id,
                       list_distinct(
                           list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                                          i -> list_aggregate(
                                              list_slice(hs, CAST(i AS INT),
                                                         CAST(i + 3 AS INT)),
                                              'min'))) AS f
                FROM h),
            ex AS (SELECT doc_id, unnest(f) AS fpv FROM fp),
            hot AS (SELECT fpv FROM ex GROUP BY fpv HAVING count(*) > 200),
            pr AS (SELECT * FROM ex WHERE fpv NOT IN (SELECT fpv FROM hot)),
            cand AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(count(*) AS BIGINT) AS n_shared
                FROM pr a JOIN pr b ON a.fpv = b.fpv AND a.doc_id < b.doc_id
                GROUP BY 1, 2 HAVING count(*) >= 3)
            SELECT c.id_a, c.id_b, c.n_shared,
                   round(CAST(len(list_intersect(fa.f, fb.f)) AS DOUBLE)
                         / least(len(fa.f), len(fb.f)), 6) AS overlap
            FROM cand c
            JOIN fp fa ON fa.doc_id = c.id_a
            JOIN fp fb ON fb.doc_id = c.id_b
            WHERE round(CAST(len(list_intersect(fa.f, fb.f)) AS DOUBLE)
                        / least(len(fa.f), len(fb.f)), 6) >= 0.6
            ORDER BY id_a, id_b
        """,
        # as-of join: rank-1 range-join replica, exact integer micros lag
        "events_asof_join": """
            WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
            v AS (SELECT * FROM events WHERE event_type = 'view'),
            j AS (
                SELECT p.event_id, p.user_id,
                       v.event_id AS matched_event_id,
                       v.value AS matched_value,
                       epoch_us(p.ts) - epoch_us(v.ts) AS lag_us,
                       row_number() OVER (
                           PARTITION BY p.event_id
                           ORDER BY v.ts DESC, v.event_id DESC) AS rn
                FROM p JOIN v
                  ON p.user_id = v.user_id AND v.ts <= p.ts)
            SELECT event_id, user_id, matched_event_id, matched_value, lag_us
            FROM j WHERE rn = 1
            UNION ALL
            SELECT p.event_id, p.user_id, NULL, NULL, NULL
            FROM p WHERE p.event_id NOT IN (SELECT event_id FROM j)
            ORDER BY event_id
        """,
        # C4 line + page retention rules over the same deterministic
        # reshaping (7-word lines, punctuation/javascript/lorem/brace
        # injection) — list-op replica
        "doc_c4_filters": """
            WITH base AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
                FROM documents),
            shaped AS (
                SELECT doc_id,
                       list_concat(list_concat(
                           CASE WHEN doc_id % 17 = 3
                                THEN ['lorem ipsum dolor.'] ELSE [] END,
                           CASE WHEN doc_id % 19 = 7
                                THEN ['code { sample.'] ELSE [] END),
                           list_transform(
                               range(0, greatest(CAST(ceil(len(w) / 7.0) AS INT), 1)),
                               i -> (CASE WHEN i % 11 = 5 THEN 'javascript ' ELSE '' END)
                                    || array_to_string(w[CAST(i*7+1 AS INT):CAST(i*7+7 AS INT)], ' ')
                                    || (CASE WHEN i % 3 = 0 THEN '' ELSE '.' END)))
                       AS ls
                FROM base),
            l AS (
                SELECT doc_id,
                       list_filter(ls, x ->
                           right(trim(x), 1) IN ('.', '!', '?', '"')
                           AND len(regexp_split_to_array(trim(x), '\\s+')) >= 3
                           AND NOT contains(lower(trim(x)), 'javascript')) AS kept
                FROM shaped),
            c AS (
                SELECT doc_id, CAST(len(kept) AS INT) AS n_lines_kept,
                       coalesce(array_to_string(kept, chr(10)), '') AS cleaned
                FROM l)
            SELECT doc_id, n_lines_kept,
                   CAST(length(cleaned) AS INT) AS n_chars_clean,
                   CAST(NOT contains(lower(cleaned), 'lorem ipsum')
                        AND NOT contains(lower(cleaned), '{')
                        AND len(regexp_extract_all(cleaned, '[.!?]')) >= 3
                        AS INT) AS page_keep
            FROM c ORDER BY doc_id
        """,
        "simhash_pairs": _simhash_oracle(),
        "ks_normal_embeddings": _ks_normal_oracle(),
        "ann_lsh_topk": _ann_lsh_oracle(),
        "embedding_cluster_assign": _cluster_assign_oracle(),
        "embedding_semantic_dedup": _semantic_dedup_oracle(),
        # verify_knn invariant (README.md:54 `verify_knn`): exact KNN verified
        # against itself must have recall exactly 1.0 for every query — the
        # oracle derives the expected (1.0, n_queries) pair from the data.
        "knn_self_recall": """
            SELECT CAST(1.0 AS DOUBLE) AS mean_recall, count(*) AS n_queries
            FROM embeddings WHERE vec_id < 50
        """,
        # GPT-3 13-gram decontamination: gram explode on both sides, one
        # equi-join, anti-join back — replicated with DuckDB list ops
        "doc_decontaminate": """
            WITH nrm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents),
            toks AS (
                SELECT doc_id, string_split(t, ' ') AS w FROM nrm WHERE length(t) > 0),
            tg AS (
                SELECT DISTINCT array_to_string(w[i:i+12], ' ') AS gram
                FROM (SELECT w, unnest(generate_series(1, greatest(len(w)-12, 1))) AS i
                      FROM toks WHERE doc_id % 101 = 0)),
            bad AS (
                SELECT DISTINCT doc_id
                FROM (SELECT doc_id, array_to_string(w[i:i+12], ' ') AS gram
                      FROM (SELECT doc_id, w,
                                   unnest(generate_series(1, greatest(len(w)-12, 1))) AS i
                            FROM toks WHERE doc_id % 101 <> 0))
                JOIN tg USING (gram))
            SELECT doc_id FROM documents
            WHERE doc_id % 101 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
            ORDER BY doc_id
        """,
        # Gopher repetition metrics: per-doc list math mirrored exactly,
        # decimal-summed 6dp values, one double division
        "doc_repetition_stats": """
            WITH per AS (
                SELECT
                  CASE WHEN len(ls) = 0 THEN 0.0
                       ELSE CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS dlf,
                  CASE WHEN total IS NULL OR total = 0 THEN 0.0
                       ELSE CAST(dupc AS DOUBLE) / total END AS dlcf,
                  CASE WHEN len(g) = 0 OR length(t) = 0 THEN 0.0
                       ELSE CAST(list_max(cnts) * length(
                              list_max(list_filter(g, x -> len(list_filter(g, y -> y = x)) = list_max(cnts)))
                            ) AS DOUBLE) / length(t) END AS t2g
                FROM (
                  SELECT t, ls, g,
                         list_sum(list_transform(ls, x -> length(x))) AS total,
                         list_sum(list_transform(ls, x ->
                             CASE WHEN len(list_filter(ls, y -> y = x)) > 1
                                  THEN length(x) ELSE 0 END)) AS dupc,
                         list_transform(g, x -> len(list_filter(g, y -> y = x))) AS cnts
                  FROM (
                    SELECT t, ls,
                           CASE WHEN length(t) = 0 THEN []
                                ELSE list_transform(
                                       generate_series(1, greatest(len(w)-1, 1)),
                                       i -> array_to_string(w[i:i+1], ' ')) END AS g
                    FROM (
                      SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t,
                             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w,
                             list_filter(
                               list_transform(string_split(text, chr(10)), x -> trim(x)),
                               x -> length(x) > 0) AS ls
                      FROM documents WHERE doc_id < 300))))
            SELECT
              CAST(SUM(CAST(round(dlf, 6) AS DECIMAL(12,6))) AS DOUBLE)/COUNT(*) AS avg_dup_line_frac,
              CAST(SUM(CAST(round(dlcf, 6) AS DECIMAL(12,6))) AS DOUBLE)/COUNT(*) AS avg_dup_line_char_frac,
              CAST(SUM(CAST(round(t2g, 6) AS DECIMAL(12,6))) AS DOUBLE)/COUNT(*) AS avg_top2gram_frac,
              COUNT(*) AS n_docs
            FROM per
        """,
        # paragraph/boilerplate removal: single-paragraph synthetic docs, so
        # a doc keeps its text iff its normalized hash is unique corpus-wide
        # exact percentiles: row_number over the engine-exact
        # (round(quality,6), doc_id) total order; rank/(n-1) is an
        # integer-over-integer division — identical doubles both engines
        "doc_quality_deciles": """
            WITH q AS (
                SELECT doc_id,
                       round(least(length(text) / 500.0, 1.0) * 0.4
                             + least((CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> list_contains(['the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'are', 'was', 'were', 'for', 'on', 'with', 'as', 'by', 'at', 'it', 'this', 'that', 'be', 'from'], x))) AS DOUBLE) / len(regexp_split_to_array(trim(lower(text)), '\\s+')) END) * 4.0, 1.0) * 0.3
                             + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END) * 5.0) * 0.3, 6) AS quality
                FROM documents),
            r AS (SELECT doc_id, quality,
                         row_number() OVER (ORDER BY quality, doc_id) - 1 AS rank
                  FROM q),
            n AS (SELECT CAST(count(*) AS DOUBLE) - 1.0 AS denom FROM q)
            SELECT doc_id, quality, rank,
                   rank / denom AS percentile,
                   CAST(least(9, floor(rank / denom * 10)) AS INT) AS decile
            FROM r, n ORDER BY doc_id
        """,
        # DSIR: unigram models with add-1 smoothing over V+1 outcomes,
        # per-token ln ratios rounded to 9dp then DECIMAL-summed per doc —
        # the round-before-sum makes the aggregate order-independent and
        # engine-exact (ln last-ulp divergence sits 7 digits below the
        # rounding point)
        "doc_dsir_weights": """
            WITH tok AS (
                SELECT doc_id, lang,
                       unnest(string_split(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                           ' ')) AS token
                FROM documents),
            tok2 AS (SELECT * FROM tok WHERE length(token) > 0),
            rc AS (SELECT token, count(*) AS n_raw FROM tok2 GROUP BY token),
            tc AS (SELECT token, count(*) AS n_tgt FROM tok2 WHERE lang = 'en'
                   GROUP BY token),
            j AS (SELECT COALESCE(rc.token, tc.token) AS token,
                         COALESCE(n_raw, 0) AS n_raw,
                         COALESCE(n_tgt, 0) AS n_tgt
                  FROM rc FULL OUTER JOIN tc ON rc.token = tc.token),
            vocab AS (SELECT * FROM j
                      ORDER BY (n_raw + n_tgt) DESC, token ASC LIMIT 10000),
            tot AS (SELECT CAST(sum(n_raw) AS DOUBLE) + 1.0 * 10001 AS denom_r,
                           CAST(sum(n_tgt) AS DOUBLE) + 1.0 * 10001 AS denom_t
                    FROM j),
            ratios AS (
                SELECT token,
                       CAST(round(ln((n_tgt + 1.0) / (n_raw + 1.0))
                                  + ln(denom_r / denom_t), 9)
                            AS DECIMAL(20,9)) AS log_ratio
                FROM vocab, tot),
            scored AS (
                SELECT t.doc_id, r.log_ratio
                FROM tok2 t JOIN ratios r ON t.token = r.token),
            per AS (
                SELECT doc_id, count(*) AS n_tokens,
                       CAST(sum(log_ratio) AS DOUBLE) AS dsir_logweight
                FROM scored GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(per.n_tokens, 0) AS n_tokens,
                   COALESCE(per.dsir_logweight, 0.0) AS dsir_logweight
            FROM documents d LEFT JOIN per USING (doc_id)
            ORDER BY d.doc_id
        """,
        # vocabulary top-k: normalize -> single-space split -> count; the
        # (n_occurrences DESC, token ASC) tie-break is total, so top-100 is
        # engine-stable
        "corpus_vocab_topk": """
            WITH t AS (
                SELECT doc_id,
                       unnest(string_split(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                           ' ')) AS token
                FROM documents),
            g AS (SELECT token,
                         count(*) AS n_occurrences,
                         count(DISTINCT doc_id) AS n_docs
                  FROM t WHERE length(token) > 0
                  GROUP BY token)
            SELECT token, n_occurrences, n_docs
            FROM g ORDER BY n_occurrences DESC, token ASC LIMIT 100
        """,
        # sequence packing: exclusive running sum + integer div/mod — all
        # integers, engine-exact (DuckDB sum(BIGINT) is HUGEINT, cast back)
        "doc_pack_sequences": """
            WITH c AS (
                SELECT doc_id, n_chars,
                       CAST(COALESCE(sum(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS start_tok
                FROM documents)
            SELECT doc_id, start_tok,
                   start_tok // 2048 AS seq_first,
                   CASE WHEN n_chars > 0 THEN (start_tok + n_chars - 1) // 2048
                        ELSE start_tok // 2048 END AS seq_last,
                   start_tok % 2048 AS seq_offset
            FROM c ORDER BY doc_id
        """,
        # bucketed packing: same integer math, per-bucket window cumsum
        "doc_pack_bucketed": """
            WITH c AS (
                SELECT doc_id, n_chars, n_chars // 256 AS bucket,
                       CAST(COALESCE(sum(n_chars) OVER (PARTITION BY n_chars // 256
                                ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS start_tok
                FROM documents)
            SELECT doc_id, bucket, start_tok,
                   start_tok // 2048 AS seq_first,
                   CASE WHEN n_chars > 0 THEN (start_tok + n_chars - 1) // 2048
                        ELSE start_tok // 2048 END AS seq_last,
                   start_tok % 2048 AS seq_offset
            FROM c ORDER BY doc_id
        """,
        # mixture rebalancing: replicate the closed-form rate solve
        # (T = min_s(w_s/p_s), rate_s = p_s*T/w_s) and the md5-uint52
        # content-hash keep rule with identical double arithmetic
        "doc_mixture_sample": """
            WITH w AS (SELECT source, CAST(count(*) AS DOUBLE) AS ws
                       FROM documents GROUP BY source),
            k AS (SELECT count(*) AS ns FROM w),
            p AS (SELECT source, ws,
                         CASE WHEN source = 'src0' THEN 0.5
                              ELSE (1.0 - 0.5) / (ns - 1) END AS ps
                  FROM w, k),
            t AS (SELECT min(ws * 1.0 / ps) AS tt FROM p),
            r AS (SELECT source, ps * tt / ws AS rate FROM p, t),
            h AS (SELECT doc_id, d.source,
                         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT AS hv
                  FROM documents d)
            SELECT h.doc_id, h.source
            FROM h JOIN r USING (source)
            WHERE hv < rate * 4503599627370496.0
            ORDER BY doc_id
        """,
        # pairwise covariance, population formula, same avg-then-round
        # convention as dim_moments
        "embedding_covariance": """
            WITH p AS (
                SELECT i.i AS i, j.j AS j,
                       CAST(embedding[i.i + 1] AS DOUBLE) AS x,
                       CAST(embedding[j.j + 1] AS DOUBLE) AS y
                FROM embeddings,
                     generate_series(0, 15) AS i(i),
                     generate_series(0, 15) AS j(j)
                WHERE j.j >= i.i)
            SELECT i, j, count(*) AS n,
                   round(avg(x * y) - avg(x) * avg(y), 6) + 0.0 AS cov
            FROM p GROUP BY i, j ORDER BY i, j
        """,
        # Zipf coverage: same tokenization as corpus_vocab_topk; rank and
        # running sum over (count DESC, token ASC)
        "corpus_vocab_coverage": """
            WITH t AS (
                SELECT unnest(string_split(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                           ' ')) AS token
                FROM documents),
            c AS (SELECT token, count(*) AS n FROM t
                  WHERE length(token) > 0 GROUP BY token),
            tot AS (SELECT sum(n) AS total FROM c),
            r AS (SELECT row_number() OVER (ORDER BY n DESC, token ASC) AS rnk,
                         sum(n) OVER (ORDER BY n DESC, token ASC
                                      ROWS UNBOUNDED PRECEDING) AS cum
                  FROM c),
            ps AS (SELECT * FROM (VALUES (CAST(0.5 AS DOUBLE)),
                                         (CAST(0.9 AS DOUBLE)),
                                         (CAST(0.99 AS DOUBLE))) AS v(p)),
            sel AS (SELECT p, min(rnk) AS k
                    FROM ps, r, tot WHERE cum >= p * total GROUP BY p)
            SELECT sel.p AS threshold, sel.k AS k_tokens,
                   round(CAST(r.cum AS DOUBLE) / tot.total, 6) AS coverage
            FROM sel JOIN r ON r.rnk = sel.k, tot
            ORDER BY threshold
        """,
        # pivot: conditional-count replica with the same explicit columns
        "events_pivot_counts": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        # set algebra: INTERSECT / EXCEPT (both distinct in both engines)
        "orders_status_setops": """
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_totalprice > 400000
            ORDER BY o_custkey
        """,
        # interval-join attribution: views within 10 min before a purchase
        "events_attribution": """
            SELECT p.event_id AS purchase_id,
                   count(*) AS n_views,
                   max(v.event_id) AS last_view_id
            FROM events p JOIN events v
              ON p.user_id = v.user_id
             AND v.ts >= p.ts - INTERVAL 10 MINUTE
             AND v.ts <= p.ts
            WHERE p.event_type = 'purchase' AND v.event_type = 'view'
            GROUP BY p.event_id ORDER BY purchase_id
        """,
        # approx-distinct invariant: oracle pins the exact counts and the
        # within-bound claim; a drifting sketch fails the gate
        "events_approx_distinct": """
            SELECT event_type, count(DISTINCT user_id) AS n_users,
                   TRUE AS approx_ok
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # signup -> first-purchase funnel; latency in exact integer micros
        "events_funnel": """
            WITH s AS (SELECT user_id,
                              min(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts
                       FROM events GROUP BY user_id),
            p AS (SELECT e.user_id, min(e.ts) AS first_purchase_ts
                  FROM events e JOIN s USING (user_id)
                  WHERE e.event_type = 'purchase'
                    AND s.signup_ts IS NOT NULL AND e.ts >= s.signup_ts
                  GROUP BY e.user_id)
            SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
                   p.first_purchase_ts IS NOT NULL AS converted,
                   epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts)
                     AS micros_to_convert
            FROM s LEFT JOIN p USING (user_id) ORDER BY user_id
        """,
        # duplicated 5-token spans: same shingling as word_shingles
        # (normalize, space-split, starts 1..max(len-4,1))
        "doc_dup_spans": """
            WITH nrm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents),
            toks AS (
                SELECT doc_id, string_split(t, ' ') AS w FROM nrm WHERE length(t) > 0),
            spans AS (
                SELECT doc_id, array_to_string(w[i:i+4], ' ') AS g
                FROM (SELECT doc_id, w,
                             unnest(generate_series(1, greatest(len(w)-4, 1))) AS i
                      FROM toks)),
            dup AS (SELECT g FROM spans GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
            per AS (SELECT doc_id, count(*) AS n,
                           sum(CASE WHEN g IN (SELECT g FROM dup) THEN 1 ELSE 0 END) AS nd
                    FROM spans GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(n, 0) AS INT) AS n_spans,
                   CAST(coalesce(nd, 0) AS INT) AS n_dup_spans,
                   round(CAST(nd AS DOUBLE) / n, 6) AS dup_span_ratio
            FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id
        """,
        # CUBE with GROUPING() bit layout matching Spark grouping_id():
        # for cube(a, b), gid = GROUPING(a)*2 + GROUPING(b)
        "orders_priority_cube": """
            SELECT year(o_orderdate) AS o_year, o_orderpriority,
                   GROUPING(year(o_orderdate)) * 2
                     + GROUPING(o_orderpriority) AS gid,
                   count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders
            GROUP BY CUBE (year(o_orderdate), o_orderpriority)
            ORDER BY gid, o_year, o_orderpriority
        """,
        # bigram LM: full model build (unigram/bigram counts, V, add-k
        # smoothing) replicated; 9dp-rounded -ln terms DECIMAL-summed
        "doc_bigram_lm": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t
                FROM documents),
            uni AS (
                SELECT u.w AS w, count(*) AS n1
                FROM toks, unnest(t) AS u(w) GROUP BY u.w),
            v AS (SELECT count(*) AS vs FROM uni),
            bg AS (
                SELECT doc_id, b.bg AS bg, split_part(b.bg, ' ', 1) AS w1
                FROM toks,
                     unnest(list_transform(generate_series(2, len(t)),
                                           i -> t[i-1] || ' ' || t[i])) AS b(bg)),
            c2 AS (SELECT bg, count(*) AS n2 FROM bg GROUP BY bg),
            terms AS (
                SELECT doc_id,
                       CAST(round(-ln((n2 + 0.5) / (n1 + 0.5 * vs)), 9)
                            AS DECIMAL(20,9)) AS term
                FROM bg JOIN c2 USING (bg) JOIN uni ON bg.w1 = uni.w, v),
            per AS (SELECT doc_id, count(*) AS nb,
                           CAST(sum(term) AS DECIMAL(38,9)) AS s
                    FROM terms GROUP BY doc_id)
            SELECT d.doc_id, CAST(coalesce(nb, 0) AS INT) AS n_bigrams,
                   round(CAST(s AS DOUBLE) / nb, 6) AS lm_score
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN per USING (doc_id)
            ORDER BY doc_id
        """,
        # BM25: Lucene idf, query-filtered df/tf, 9dp decimal-summed
        # contributions; literal doubles via explicit casts so the
        # arithmetic matches Spark's inlined Python doubles bit-for-bit
        "doc_bm25_search": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t
                FROM documents),
            lens AS (SELECT doc_id, len(t) AS dl FROM toks),
            stats AS (SELECT count(*) AS n,
                             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                      FROM lens),
            hits AS (SELECT doc_id, u.w AS w FROM toks, unnest(t) AS u(w)
                     WHERE u.w IN ('hash', 'spill', 'vector')),
            dfc AS (SELECT w, count(DISTINCT doc_id) AS dfreq FROM hits GROUP BY w),
            tf AS (SELECT doc_id, w, count(*) AS tfreq FROM hits GROUP BY doc_id, w),
            contrib AS (
                SELECT tf.doc_id,
                       CAST(round(
                         round(ln(1.0 + (CAST(n AS DOUBLE) - dfreq + 0.5)
                                        / (dfreq + 0.5)), 9)
                         * (tfreq * (CAST(1.2 AS DOUBLE) + 1.0))
                         / (tfreq + CAST(1.2 AS DOUBLE)
                            * (CAST(0.25 AS DOUBLE)
                               + CAST(0.75 AS DOUBLE) * dl / avgdl)),
                       9) AS DECIMAL(20,9)) AS c
                FROM tf JOIN dfc USING (w)
                     JOIN lens ON tf.doc_id = lens.doc_id, stats),
            scored AS (SELECT doc_id,
                              round(CAST(CAST(sum(c) AS DECIMAL(38,9)) AS DOUBLE), 6) AS score
                       FROM contrib GROUP BY doc_id),
            ranked AS (SELECT doc_id, score,
                              CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
                       FROM scored)
            SELECT doc_id, score, rank FROM ranked WHERE rank <= 20 ORDER BY rank
        """,
        # range join: plain BETWEEN theta-join in the oracle; the Spark
        # side manufactures the epoch-bucket equi key
        "events_range_join": """
            WITH iv AS (SELECT event_id AS interval_id, ts AS start_ts,
                               ts + INTERVAL 30 MINUTE AS end_ts
                        FROM events WHERE event_type = 'purchase')
            SELECT interval_id,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                   min(e.event_id) AS first_event,
                   max(e.event_id) AS last_event
            FROM iv JOIN events e ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
            GROUP BY interval_id ORDER BY interval_id
        """,
        # per-domain cap: survivors are the cap smallest (md5_52(key), key)
        # per stratum — replicated as a row_number over the same hash
        "doc_domain_cap": """
            WITH h AS (SELECT doc_id, source,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT AS hv
                   FROM documents),
            r AS (SELECT doc_id, source, row_number() OVER
                   (PARTITION BY source ORDER BY hv, doc_id) AS rn FROM h)
            SELECT doc_id, source FROM r WHERE rn <= 10 ORDER BY doc_id
        """,
        # train/val/test split: hash-range membership; boundary doubles
        # accumulate left-to-right exactly as the Spark builder does
        # (explicit DOUBLE casts — DuckDB decimal literals would round
        # differently)
        "doc_split_assign": """
            WITH h AS (SELECT doc_id, source,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT AS hv
                   FROM documents)
            SELECT doc_id, source,
                   CASE WHEN hv < CAST(0.8 AS DOUBLE) * 4503599627370496.0 THEN 'train'
                        WHEN hv < (CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE)) * 4503599627370496.0 THEN 'val'
                        ELSE 'test' END AS split
            FROM h ORDER BY doc_id
        """,
        "doc_paragraph_dedup": """
            WITH h AS (
                SELECT doc_id, text,
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f,
                       length(trim(text)) > 0 AS nonempty
                FROM documents),
            dup AS (
                SELECT f FROM h WHERE nonempty
                GROUP BY f HAVING count(DISTINCT doc_id) >= 2)
            SELECT doc_id,
                   CASE WHEN nonempty AND f IN (SELECT f FROM dup)
                        THEN 0 ELSE length(text) END AS n_chars_kept
            FROM h ORDER BY doc_id
        """,
        # end-to-end pipeline: chains the decontamination, dedup, quality,
        # and repetition replicas, then token accounting
        "doc_training_pipeline": f"""
            WITH nrm AS (
                SELECT doc_id, text,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents),
            toks AS (
                SELECT doc_id, string_split(t, ' ') AS w FROM nrm WHERE length(t) > 0),
            tg AS (
                SELECT DISTINCT array_to_string(w[i:i+12], ' ') AS gram
                FROM (SELECT w, unnest(generate_series(1, greatest(len(w)-12, 1))) AS i
                      FROM toks WHERE doc_id % 101 = 0)),
            bad AS (
                SELECT DISTINCT doc_id
                FROM (SELECT doc_id, array_to_string(w[i:i+12], ' ') AS gram
                      FROM (SELECT doc_id, w,
                                   unnest(generate_series(1, greatest(len(w)-12, 1))) AS i
                            FROM toks WHERE doc_id % 101 <> 0))
                JOIN tg USING (gram)),
            kept1 AS (
                SELECT doc_id FROM documents
                WHERE doc_id % 101 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)),
            kept2 AS (
                SELECT min(n.doc_id) AS doc_id
                FROM nrm n JOIN kept1 USING (doc_id)
                GROUP BY md5(n.t)),
            g2 AS (
                SELECT n.doc_id, n.text, n.t,
                       CASE WHEN length(n.t) = 0 THEN []
                            ELSE list_transform(
                                   generate_series(1, greatest(len(tk.w)-1, 1)),
                                   i -> array_to_string(tk.w[i:i+1], ' ')) END AS g
                FROM nrm n JOIN kept2 USING (doc_id)
                LEFT JOIN toks tk ON tk.doc_id = n.doc_id),
            kept3 AS (
                SELECT doc_id, text FROM g2
                WHERE round(least(length(text) / 500.0, 1.0) * 0.4
                            + least({_SWRATIO} * 4.0, 1.0) * 0.3
                            + greatest(0.0, 1.0 - {_PUNCT} * 5.0) * 0.3, 6) >= 0.5
                  AND round(CASE WHEN len(g) = 0 OR length(t) = 0 THEN 0.0
                       ELSE CAST(list_max(list_transform(g, x -> len(list_filter(g, y -> y = x))))
                                 * length(list_max(list_filter(g, x ->
                                     len(list_filter(g, y -> y = x)) =
                                     list_max(list_transform(g, z -> len(list_filter(g, y2 -> y2 = z)))))))
                            AS DOUBLE) / length(t) END, 6) <= 0.2)
            SELECT count(*) AS n_docs_kept,
                   CAST(sum({_NTOK}) AS BIGINT) AS total_tokens,
                   min(doc_id) AS first_doc,
                   max(doc_id) AS last_doc
            FROM kept3
        """,
        # PQ+rerank invariant: a query from the base set finds itself at
        # rank 1, exact distance 0 (the ADC shortlist always contains the
        # zero-quantization-error self code, and the exact re-rank puts it
        # first with the (distance, base_id) tie-break).
        "pq_rerank_self_top1": """
            SELECT vec_id AS query_id, vec_id AS base_id,
                   CAST(0.0 AS DOUBLE) AS distance
            FROM embeddings WHERE vec_id < 30 ORDER BY query_id
        """,
        # sliding-window chunking: starts step by 32, chunk = 64 tokens
        "doc_chunk_overlap": """
            WITH nrm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents),
            toks AS (
                SELECT doc_id, string_split(t, ' ') AS w FROM nrm WHERE length(t) > 0),
            st AS (
                SELECT doc_id, w, unnest(generate_series(0, len(w)-1, 32)) AS s
                FROM toks)
            SELECT doc_id,
                   CAST(s // 32 AS INT) AS chunk_id,
                   CAST(s AS INT) AS start_token,
                   CAST(least(64, len(w) - s) AS INT) AS n_chunk_tokens,
                   array_to_string(w[s+1:s+64], ' ') AS chunk_text
            FROM st ORDER BY doc_id, chunk_id
        """,
        # Efraimidis-Spirtes keys on the shared md5-uint52 convention:
        # u = (h+1)/2^52, score = ln(u)/w, top-50 by (score DESC, doc_id)
        "doc_weighted_sample": """
            WITH h AS (
                SELECT doc_id, source, n_chars,
                       ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT AS hv
                FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
            SELECT doc_id, source, n_chars,
                   round(ln((hv + 1) / 4503599627370496.0) / n_chars, 9) AS es_score
            FROM h ORDER BY es_score DESC, doc_id LIMIT 50
        """,
        # exact char-5-gram Jaccard on the fixed (id, id+1 | id%5=0) pairs
        "doc_ngram_jaccard": """
            WITH nrm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents),
            sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(1, greatest(len(t)-4, 1)),
                           i -> substr(t, CAST(i AS INT), 5))) AS s
                FROM nrm),
            c AS (SELECT doc_id AS id_a, doc_id + 1 AS id_b
                  FROM documents WHERE doc_id % 5 = 0)
            SELECT c.id_a, c.id_b,
                   round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
            FROM c JOIN sh sa ON sa.doc_id = c.id_a
                   JOIN sh sb ON sb.doc_id = c.id_b
            ORDER BY id_a
        """,
        # markup strip: same synthesized page, same RE2-safe pattern chain
        # ('g' flag — Spark regexp_replace is replace-all by default)
        "doc_strip_markup": """
            WITH page AS (
                SELECT doc_id,
                       '<div id="' || CAST(doc_id AS VARCHAR) || '"><p>' || text ||
                       '</p>&nbsp;&amp; more</div><script>if (1 < 2) x();</script><!-- footer -->' AS s
                FROM documents),
            c1 AS (SELECT doc_id, regexp_replace(s, '(?is)<script[^>]*>.*?</script\\s*>', ' ', 'g') AS s FROM page),
            c2 AS (SELECT doc_id, regexp_replace(s, '(?is)<style[^>]*>.*?</style\\s*>', ' ', 'g') AS s FROM c1),
            c3 AS (SELECT doc_id, regexp_replace(s, '(?s)<!--.*?-->', ' ', 'g') AS s FROM c2),
            c4 AS (SELECT doc_id, regexp_replace(s, '(?s)<[^>]*>', ' ', 'g') AS s FROM c3),
            c5 AS (SELECT doc_id,
                          replace(replace(replace(replace(replace(replace(s,
                              '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                              '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS s
                   FROM c4),
            fin AS (SELECT doc_id, trim(regexp_replace(s, '\\s+', ' ', 'g')) AS s FROM c5)
            SELECT doc_id, s AS clean_text, CAST(length(s) AS INT) AS clean_len
            FROM fin ORDER BY doc_id
        """,
        # EWMA numerator: v_i * 0.9^(n-i) terms, 9dp-rounded, DECIMAL-summed
        "events_decayed_sum": """
            WITH r AS (
                SELECT user_id, value,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM events)
            SELECT user_id, count(*) AS n_events,
                   CAST(sum(CAST(round(value * power(0.9, n - i), 9)
                                 AS DECIMAL(38,9))) AS DOUBLE) AS decayed_sum
            FROM r GROUP BY user_id ORDER BY user_id
        """,
        "events_transition_counts": """
            WITH p AS (
                SELECT user_id, event_type AS from_type,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS to_type
                FROM events)
            SELECT from_type, to_type, count(*) AS n_transitions
            FROM p WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type ORDER BY from_type, to_type
        """,
        # sketch invariant gate: oracle pins EXACT quantiles + the
        # within-rank-bound booleans (GK merge is deterministic)
        "events_quantile_sketch": """
            WITH q AS (SELECT quantile_cont(value, [0.25, 0.5, 0.75, 0.9, 0.99]) AS qs
                       FROM events)
            SELECT CAST(p AS DOUBLE) AS p, round(qs[i], 6) AS exact_q,
                   TRUE AS within_bound
            FROM q, (VALUES (1, 0.25), (2, 0.5), (3, 0.75), (4, 0.9), (5, 0.99)) AS t(i, p)
            ORDER BY p
        """,
        # z-score standardization: same 9dp-rounded mu/sd fit, same
        # element-wise projection; exploded to scalar (vec_id, dim, z)
        # rows — the driver's pandas canonicalizer can't hash list cells
        "embedding_standardize": """
            WITH e AS (
                SELECT CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings),
            m AS (
                SELECT dim, round(avg(v), 9) AS mu,
                       round(sqrt(avg(v * v) - avg(v) * avg(v)), 9) AS sd
                FROM e GROUP BY dim),
            arr AS (SELECT list(mu ORDER BY dim) AS mus,
                           list(sd ORDER BY dim) AS sds
                    FROM m),
            z AS (
                SELECT vec_id,
                       list_transform(generate_series(1, len(embedding)),
                           i -> CASE WHEN sds[i] = 0.0 THEN 0.0
                                     ELSE round((CAST(embedding[i] AS DOUBLE) - mus[i]) / sds[i], 6)
                                END) AS zs
                FROM embeddings, arr)
            SELECT vec_id,
                   CAST(generate_subscripts(zs, 1) - 1 AS INT) AS dim,
                   CAST(unnest(zs) AS DOUBLE) AS z
            FROM z ORDER BY vec_id, dim
        """,
        # PCA pinned-invariant gate: exact trace (9dp per-dim population
        # variances DECIMAL-summed, 6dp) + TRUE for the eigen-identities
        # only a correct eigensolve satisfies (see embedding_pca docstring)
        "embedding_pca": """
            WITH e AS (
                SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings),
            m AS (SELECT dim, round(avg(x * x) - avg(x) * avg(x), 9) AS var
                  FROM e WHERE dim < 16 GROUP BY dim),
            t AS (SELECT round(CAST(sum(CAST(var AS DECIMAL(20,9))) AS DOUBLE), 6)
                         AS trace FROM m),
            n AS (SELECT count(*) AS n_vectors FROM embeddings)
            SELECT n.n_vectors, t.trace,
                   TRUE AS var_ordered,
                   TRUE AS var0_is_top_eval,
                   TRUE AS var1_is_second_eval,
                   TRUE AS proj_cov_zero,
                   TRUE AS components_orthonormal,
                   TRUE AS evals_le_trace,
                   TRUE AS top_eval_ge_mean_var
            FROM n, t
        """,
        # BPE pinned-invariant gate: the FIRST merge is pure weighted
        # adjacent-pair counting over the word vocabulary — replicated
        # exactly (normalize -> split -> char pairs -> argmax with the
        # (count DESC, left, right) tie-break); structural claims pinned
        "corpus_bpe_merges": f"""
            WITH nrm AS (SELECT {_NORM} AS t FROM documents),
            w AS (SELECT unnest(string_split(t, ' ')) AS word
                  FROM nrm WHERE length(t) > 0),
            v AS (SELECT word, count(*) AS cnt FROM w
                  WHERE word <> '' GROUP BY word),
            p AS (SELECT substring(word, CAST(i AS INT), 1) AS left_,
                         substring(word, CAST(i + 1 AS INT), 1) AS right_, cnt
                  FROM (SELECT word, cnt,
                               unnest(generate_series(1, length(word) - 1)) AS i
                        FROM v WHERE length(word) >= 2)),
            agg AS (SELECT left_, right_, CAST(sum(cnt) AS BIGINT) AS c
                    FROM p GROUP BY left_, right_)
            SELECT left_ AS first_left, right_ AS first_right, c AS first_count,
                   TRUE AS n_merges_bounded, TRUE AS counts_nonincreasing,
                   TRUE AS counts_ge_min, TRUE AS merged_tokens_in_corpus
            FROM agg ORDER BY c DESC, left_, right_ LIMIT 1
        """,
        # byte-level sibling: first merge replicated with the RE2-safe
        # pre-tokenizer + the bytes_to_unicode VALUES table
        "corpus_bytelevel_bpe": _bytelevel_bpe_oracle(),
        # fit pinned-invariant gate: exact 6dp per-dim data moments (the
        # dim_moments replica) + TRUE for the selection-contract booleans
        "fit_embeddings_model": """
            WITH e AS (
                SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS value
                FROM embeddings),
            m AS (SELECT dim, avg(value) AS mean, avg(value * value) AS m2raw
                  FROM e GROUP BY dim)
            SELECT dim, round(mean, 6) AS mean,
                   round(m2raw - mean * mean, 6) AS variance,
                   TRUE AS ks_in_bound, TRUE AS family_valid,
                   TRUE AS grade_consistent, TRUE AS qq_in_bound,
                   TRUE AS modes_positive
            FROM m ORDER BY dim
        """,
        # PMI collocations: exact integer count ratios, one 6dp-rounded ln,
        # (pmi DESC, w1, w2) rank; P counts ALL adjacent positions (incl.
        # empty tokens) exactly like the engine's greatest(size-1, 0)
        "corpus_pmi_bigrams": """
            WITH toks AS (
                SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t
                FROM documents),
            uni AS (SELECT u.w AS w, count(*) AS n1
                    FROM toks, unnest(t) AS u(w) WHERE u.w <> '' GROUP BY u.w),
            tot AS (SELECT CAST(sum(n1) AS DOUBLE) AS n FROM uni),
            ptot AS (SELECT CAST(sum(greatest(len(t) - 1, 0)) AS DOUBLE) AS p
                     FROM toks),
            prs AS (SELECT t[i-1] AS l, t[i] AS r
                    FROM (SELECT t, unnest(generate_series(2, len(t))) AS i
                          FROM toks)
                    WHERE t[i-1] <> '' AND t[i] <> ''),
            pc AS (SELECT l, r, count(*) AS n_pair FROM prs
                   GROUP BY l, r HAVING count(*) >= 5),
            scored AS (
                SELECT pc.l AS w1, pc.r AS w2, pc.n_pair,
                       round(ln((n_pair / p) / ((ul.n1 / n) * (ur.n1 / n))), 6) AS pmi
                FROM pc JOIN uni ul ON pc.l = ul.w
                        JOIN uni ur ON pc.r = ur.w, tot, ptot)
            SELECT w1, w2, n_pair, pmi,
                   CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS rank
            FROM scored ORDER BY pmi DESC, w1, w2 LIMIT 50
        """,
        # Zipf fit: 9dp regression terms DECIMAL-summed, closed-form
        # slope/intercept/R^2 with IDENTICAL expression trees both engines
        "corpus_zipf_fit": """
            WITH toks AS (
                SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t
                FROM documents),
            cnt AS (SELECT u.w AS w, count(*) AS n
                    FROM toks, unnest(t) AS u(w) WHERE u.w <> ''
                    GROUP BY u.w HAVING count(*) >= 2),
            top AS (SELECT w, n FROM cnt ORDER BY n DESC, w ASC LIMIT 500),
            xy AS (SELECT
                       round(ln(CAST(row_number() OVER (ORDER BY n DESC, w ASC)
                                     AS DOUBLE)), 9) AS x,
                       round(ln(CAST(n AS DOUBLE)), 9) AS y
                   FROM top),
            s AS (SELECT
                      CAST(count(*) AS DOUBLE) AS v,
                      CAST(sum(CAST(round(x, 9) AS DECIMAL(30,9))) AS DOUBLE) AS sx,
                      CAST(sum(CAST(round(y, 9) AS DECIMAL(30,9))) AS DOUBLE) AS sy,
                      CAST(sum(CAST(round(x * x, 9) AS DECIMAL(30,9))) AS DOUBLE) AS sxx,
                      CAST(sum(CAST(round(x * y, 9) AS DECIMAL(30,9))) AS DOUBLE) AS sxy,
                      CAST(sum(CAST(round(y * y, 9) AS DECIMAL(30,9))) AS DOUBLE) AS syy
                  FROM xy)
            SELECT CAST(v AS BIGINT) AS n_ranks,
                   round((v * sxy - sx * sy) / (v * sxx - sx * sx), 6) AS slope,
                   round((sy - ((v * sxy - sx * sy) / (v * sxx - sx * sx)) * sx) / v,
                         6) AS intercept,
                   round(((v * sxy - sx * sy)
                          / (sqrt(v * sxx - sx * sx) * sqrt(v * syy - sy * sy)))
                         * ((v * sxy - sx * sy)
                            / (sqrt(v * sxx - sx * sx) * sqrt(v * syy - sy * sy))),
                         6) AS r_squared
            FROM s
        """,
        # winnowing pair candidates: same md5-prefix fingerprint pipeline
        # as doc_winnow_fingerprints, hot-bucket drop, fingerprint
        # equi-join with (id_a < id_b), >= 3 shared
        "doc_winnow_pairs": """
            WITH nrm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents WHERE doc_id < 300),
            h AS (
                SELECT doc_id,
                       list_transform(
                           list_transform(range(1, greatest(length(t) - 4, 1) + 1),
                                          i -> substring(t, CAST(i AS INT), 5)),
                           g -> ('0x' || substring(md5(g), 1, 15))::BIGINT) AS hs
                FROM nrm),
            fp AS (
                SELECT doc_id,
                       list_distinct(
                           list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                                          i -> list_aggregate(
                                              list_slice(hs, CAST(i AS INT),
                                                         CAST(i + 3 AS INT)),
                                              'min'))) AS f
                FROM h),
            ex AS (SELECT doc_id, unnest(f) AS fp FROM fp),
            hot AS (SELECT fp FROM ex GROUP BY fp HAVING count(*) > 200),
            pr AS (SELECT * FROM ex WHERE fp NOT IN (SELECT fp FROM hot))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 3
            ORDER BY id_a, id_b
        """,
        # CCNet perplexity tiers: full bigram-LM replica (doc_bigram_lm's
        # CTE chain), 0-based rank over (lm_score, doc_id), pure-integer
        # bucket cut (3*rk)//n — no double boundary anywhere
        "doc_perplexity_buckets": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t
                FROM documents),
            uni AS (
                SELECT u.w AS w, count(*) AS n1
                FROM toks, unnest(t) AS u(w) GROUP BY u.w),
            v AS (SELECT count(*) AS vs FROM uni),
            bg AS (
                SELECT doc_id, b.bg AS bg, split_part(b.bg, ' ', 1) AS w1
                FROM toks,
                     unnest(list_transform(generate_series(2, len(t)),
                                           i -> t[i-1] || ' ' || t[i])) AS b(bg)),
            c2 AS (SELECT bg, count(*) AS n2 FROM bg GROUP BY bg),
            terms AS (
                SELECT doc_id,
                       CAST(round(-ln((n2 + 0.5) / (n1 + 0.5 * vs)), 9)
                            AS DECIMAL(20,9)) AS term
                FROM bg JOIN c2 USING (bg) JOIN uni ON bg.w1 = uni.w, v),
            per AS (SELECT doc_id, count(*) AS nb,
                           CAST(sum(term) AS DECIMAL(38,9)) AS s
                    FROM terms GROUP BY doc_id),
            scored AS (
                SELECT d.doc_id, CAST(coalesce(nb, 0) AS INT) AS n_bigrams,
                       round(CAST(s AS DOUBLE) / nb, 6) AS lm_score
                FROM (SELECT doc_id FROM documents) d
                LEFT JOIN per USING (doc_id)),
            hs AS (
                SELECT doc_id, n_bigrams, lm_score,
                       row_number() OVER (ORDER BY lm_score ASC, doc_id ASC)
                           - 1 AS rk,
                       count(*) OVER () AS n
                FROM scored WHERE lm_score IS NOT NULL)
            SELECT doc_id, n_bigrams, lm_score,
                   CAST(least(2, (3 * rk) // n) AS INT) AS bucket,
                   list_extract(['head', 'middle', 'tail'],
                                CAST(least(2, (3 * rk) // n) AS INT) + 1)
                       AS bucket_label
            FROM hs
            UNION ALL
            SELECT doc_id, n_bigrams, lm_score,
                   CAST(NULL AS INT) AS bucket, 'unscored' AS bucket_label
            FROM scored WHERE lm_score IS NULL
            ORDER BY doc_id
        """,
        # cross-slice gram overlap: same normalize+shingle fragments as the
        # engine's word_shingles (whole-doc gram when len < n), distinct
        # (slice, gram), gram equi-join with slice_a < slice_b
        "corpus_source_overlap": """
            WITH nrm AS (
                SELECT source,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
                FROM documents),
            tk AS (SELECT source,
                          CASE WHEN length(nt) = 0 THEN []::VARCHAR[]
                               ELSE regexp_split_to_array(nt, ' ') END AS t
                   FROM nrm),
            g AS (SELECT DISTINCT source,
                         array_to_string(list_slice(t, i, i + 4), ' ') AS gram
                  FROM tk,
                       unnest(generate_series(1, greatest(len(t) - 4, 1))) AS s(i)
                  WHERE len(t) > 0),
            tot AS (SELECT source, count(*) AS n FROM g GROUP BY source),
            sh AS (SELECT a.source AS slice_a, b.source AS slice_b,
                          count(*) AS n_shared
                   FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
                   GROUP BY 1, 2)
            SELECT slice_a, slice_b,
                   CAST(n_shared AS BIGINT) AS n_shared,
                   CAST(ta.n AS BIGINT) AS n_a,
                   CAST(tb.n AS BIGINT) AS n_b,
                   round(CAST(n_shared AS DOUBLE) / (ta.n + tb.n - n_shared), 6)
                       AS jaccard
            FROM sh JOIN tot ta ON sh.slice_a = ta.source
                    JOIN tot tb ON sh.slice_b = tb.source
            ORDER BY slice_a, slice_b
        """,
        # ExactSubstr span removal: positional 13-grams on raw (unlowered)
        # tokens, dup = total occurrences >= 2 (intra-doc repeats count),
        # covered-position mask, kept tokens re-joined with single spaces
        "doc_remove_dup_spans": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
                FROM documents),
            g AS (SELECT doc_id, i,
                         array_to_string(list_slice(t, i, i + 12), ' ') AS gram
                  FROM toks, unnest(generate_series(1, len(t) - 12)) AS s(i)
                  WHERE len(t) >= 13),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
            hits AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (gram)),
            cp AS (SELECT h.doc_id,
                          unnest(generate_series(h.i, least(h.i + 12, len(t.t)))) AS p
                   FROM hits h JOIN toks t USING (doc_id)),
            cov AS (SELECT doc_id, list(DISTINCT p) AS c FROM cp GROUP BY doc_id),
            kept AS (SELECT t.doc_id, t.t AS t,
                            list_filter(
                                generate_series(1, len(t.t)),
                                p -> NOT list_contains(coalesce(cov.c, []), p)) AS kp
                     FROM toks t LEFT JOIN cov USING (doc_id))
            SELECT doc_id,
                   coalesce(array_to_string(list_transform(kp, p -> t[p]), ' '), '')
                       AS clean_text,
                   CAST(len(t) AS INT) AS n_tokens,
                   CAST(len(t) - len(kp) AS INT) AS n_removed
            FROM kept ORDER BY doc_id
        """,
        # token-budget prefix: identical 6dp quality + token counts, one
        # window cumsum over the SAME (quality DESC, doc_id) total order —
        # integer arithmetic end-to-end, so the prefix cut agrees exactly
        "doc_token_budget_select": f"""
            WITH q AS (
                SELECT doc_id,
                       round(least(length(text) / 500.0, 1.0) * 0.4
                             + least({_SWRATIO} * 4.0, 1.0) * 0.3
                             + greatest(0.0, 1.0 - {_PUNCT} * 5.0) * 0.3,
                             6) AS quality,
                       CAST({_NTOK} AS BIGINT) AS n_tokens
                FROM documents),
            c AS (
                SELECT doc_id, quality, n_tokens,
                       CAST(coalesce(sum(n_tokens) OVER (
                           ORDER BY quality DESC, doc_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS BIGINT) AS start_tok
                FROM q)
            SELECT doc_id, quality, n_tokens, start_tok
            FROM c WHERE start_tok + n_tokens <= 10000
            ORDER BY doc_id
        """,
        # trailing 1h per-user range frame over epoch micros (RANGE
        # includes ts peers => tie-order independent)
        "events_trailing_window": """
            SELECT event_id, user_id,
                   count(*) OVER w AS trailing_n,
                   CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6))) OVER w
                        AS DOUBLE) AS trailing_sum
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """,
        # robust outliers: |v - median| > 3 * 1.4826 * MAD, med/mad
        # 9dp-rounded before thresholding in both engines
        "events_outlier_flags": """
            WITH med AS (
                SELECT event_type, round(quantile_cont(value, 0.5), 9) AS med
                FROM events GROUP BY event_type),
            mad AS (
                SELECT e.event_type,
                       round(quantile_cont(abs(e.value - m.med), 0.5), 9) AS mad
                FROM events e JOIN med m USING (event_type)
                GROUP BY e.event_type),
            s AS (SELECT med.event_type, med.med, mad.mad
                  FROM med JOIN mad USING (event_type))
            SELECT e.event_type, count(*) AS n_events,
                   CAST(sum(CASE WHEN abs(e.value - s.med) > 3.0 * 1.4826 * s.mad
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   max(s.med) AS med, max(s.mad) AS mad
            FROM events e JOIN s USING (event_type)
            GROUP BY e.event_type ORDER BY e.event_type
        """,
        # salted-join parity: plain join + 6dp-DECIMAL value sums
        "events_salted_join": """
            WITH dim AS (SELECT user_id, count(*) AS n_events
                         FROM events GROUP BY user_id)
            SELECT e.user_id, d.n_events,
                   CAST(sum(CAST(round(e.value, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
            FROM events e JOIN dim d USING (user_id)
            GROUP BY e.user_id, d.n_events ORDER BY user_id
        """,
        # incremental dedup: within-batch min-id survivor + anti-join
        # against the standing corpus's distinct fingerprints
        "doc_incremental_dedup": f"""
            WITH nrm AS (
                SELECT doc_id, source, md5({_NORM}) AS fp FROM documents),
            ex AS (SELECT DISTINCT fp FROM nrm WHERE doc_id < 250),
            inc AS (
                SELECT doc_id, source, fp FROM nrm WHERE doc_id >= 250
                UNION ALL
                SELECT doc_id + 10000, source, fp FROM nrm
                WHERE doc_id < 250 AND doc_id % 5 = 0),
            batch AS (
                SELECT doc_id, source, fp,
                       row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
                FROM inc)
            SELECT doc_id, source FROM batch
            WHERE rn = 1 AND fp NOT IN (SELECT fp FROM ex)
            ORDER BY doc_id
        """,
        # keep-best dedup: arg-max by (q, doc_id) per fingerprint
        "doc_dedup_keep_best": f"""
            WITH u AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 20000, text FROM documents WHERE doc_id % 4 = 0),
            w AS (SELECT doc_id, (doc_id * 37) % 101 AS q,
                         md5({_NORM}) AS fp
                  FROM u),
            r AS (SELECT fp, doc_id, q,
                         row_number() OVER (PARTITION BY fp
                                            ORDER BY q DESC, doc_id DESC) AS rn,
                         count(*) OVER (PARTITION BY fp) AS n_dups
                  FROM w)
            SELECT fp AS fingerprint, n_dups, doc_id, q
            FROM r WHERE rn = 1 ORDER BY fingerprint
        """,
        # multimodal alignment join: per-source doc counts + 6dp-DECIMAL
        # L2-norm sums over the doc_id = vec_id join
        "doc_embedding_align": """
            SELECT d.source, count(*) AS n_docs,
                   CAST(sum(CAST(round(sqrt(list_inner_product(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(e.embedding AS DOUBLE[]))), 6)
                            AS DECIMAL(38,6))) AS DOUBLE) AS sum_l2_norm
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
            GROUP BY d.source ORDER BY d.source
        """,
        # 6h-bucket resample + LOCF gap-fill: observed bucket partials,
        # per-user generate_series grid, left join, IGNORE NULLS carry
        "events_gapfill": """
            WITH obs AS (
                SELECT user_id,
                       CAST(floor(epoch_us(ts) / 21600000000) AS BIGINT) AS b,
                       CAST(count(*) AS INT) AS n_events,
                       CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                            AS DOUBLE) AS bucket_value
                FROM events WHERE user_id <= 30 GROUP BY 1, 2),
            bounds AS (SELECT user_id, min(b) AS b0, max(b) AS b1
                       FROM obs GROUP BY 1),
            grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS b
                     FROM bounds),
            j AS (SELECT g.user_id, g.b, o.n_events, o.bucket_value
                  FROM grid g LEFT JOIN obs o USING (user_id, b))
            SELECT user_id,
                   make_timestamp(b * 21600000000) AS bucket_ts,
                   CAST(coalesce(n_events, 0) AS INT) AS n_events,
                   coalesce(bucket_value, 0.0) AS bucket_value,
                   last_value(bucket_value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS filled_value,
                   n_events IS NULL AS is_gap
            FROM j ORDER BY user_id, b
        """,
        # ColBERT MaxSim: per-(query, token, doc) max of 9dp-rounded
        # cosine, 9dp-DECIMAL-summed per (query, doc), rank by
        # (score DESC, doc ASC)
        "embedding_maxsim": """
            WITH q AS (SELECT vec_id % 2 AS qid,
                              CAST(floor(vec_id / 2) AS BIGINT) AS qpos,
                              CAST(embedding AS DOUBLE[]) AS e
                       FROM embeddings WHERE vec_id < 8),
            d AS (SELECT label AS did, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings WHERE vec_id >= 8 AND vec_id < 208),
            inter AS (
                SELECT q.qid, q.qpos, d.did,
                       round(list_inner_product(q.e, d.e)
                             / (sqrt(list_inner_product(q.e, q.e))
                                * sqrt(list_inner_product(d.e, d.e))), 9) AS sim
                FROM q CROSS JOIN d),
            best AS (SELECT qid, qpos, did, max(sim) AS best
                     FROM inter GROUP BY 1, 2, 3),
            scores AS (SELECT qid, did,
                              CAST(sum(CAST(best AS DECIMAL(38,9)))
                                   AS DOUBLE) AS maxsim_score
                       FROM best GROUP BY 1, 2),
            ranked AS (SELECT qid, did, maxsim_score,
                              row_number() OVER (
                                  PARTITION BY qid
                                  ORDER BY maxsim_score DESC, did ASC) AS rn
                       FROM scores)
            SELECT qid AS query_id, CAST(rn AS INT) AS rank,
                   did AS doc_id, maxsim_score
            FROM ranked WHERE rn <= 5 ORDER BY query_id, rank
        """,
        # blocked Levenshtein verify: (lang, source) blocks, id-ordered,
        # |n_chars delta| <= 3, distance over first 60 normalized chars
        "doc_edit_distance_pairs": f"""
            WITH s AS (SELECT lang, source, doc_id, n_chars,
                              substr({_NORM}, 1, 60) AS t
                       FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(levenshtein(a.t, b.t) AS INT) AS edit_distance
            FROM s a JOIN s b
              ON a.lang = b.lang AND a.source = b.source
             AND a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 3
            WHERE levenshtein(a.t, b.t) <= 45
            ORDER BY id_a, id_b
        """,
        # graded contamination: distinct 13-grams per train doc, fraction
        # present in the test split's gram set (same shingling as
        # doc_decontaminate)
        "doc_contamination_frac": """
            WITH nrm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents),
            toks AS (
                SELECT doc_id, string_split(t, ' ') AS w
                FROM nrm WHERE length(t) > 0),
            tg AS (
                SELECT DISTINCT array_to_string(w[i:i+12], ' ') AS gram
                FROM (SELECT w, unnest(generate_series(1, greatest(len(w)-12, 1))) AS i
                      FROM toks WHERE doc_id % 101 = 0)),
            trg AS (
                SELECT DISTINCT doc_id, array_to_string(w[i:i+12], ' ') AS gram
                FROM (SELECT doc_id, w,
                             unnest(generate_series(1, greatest(len(w)-12, 1))) AS i
                      FROM toks WHERE doc_id % 101 <> 0)),
            per AS (
                SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
                       CAST(sum(CASE WHEN gram IN (SELECT gram FROM tg)
                                     THEN 1 ELSE 0 END) AS INT) AS n_contaminated
                FROM trg GROUP BY 1)
            SELECT d.doc_id AS id,
                   CAST(coalesce(p.n_grams, 0) AS INT) AS n_grams,
                   CAST(coalesce(p.n_contaminated, 0) AS INT) AS n_contaminated,
                   CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 0.0
                        ELSE round(CAST(p.n_contaminated AS DOUBLE)
                                   / p.n_grams, 6) END AS contamination_frac
            FROM documents d LEFT JOIN per p USING (doc_id)
            WHERE d.doc_id % 101 <> 0 ORDER BY id
        """,
        # CDC snapshot diff: synthesized new snapshot (deletes % 11,
        # +1.0 price updates % 5, re-keyed inserts % 7), full outer join,
        # IS DISTINCT FROM change detection, unchanged rows dropped
        "orders_snapshot_diff": """
            WITH old AS (
                SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
            new AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                            ELSE o_totalprice END AS o_totalprice,
                       o_orderstatus
                FROM orders WHERE o_orderkey % 11 <> 0
                UNION ALL
                SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
                FROM orders WHERE o_orderkey % 7 = 0),
            j AS (
                SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                            WHEN n.o_orderkey IS NULL THEN 'delete'
                            WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                              OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                            THEN 'update'
                            ELSE 'unchanged' END AS change_type
                FROM old o FULL OUTER JOIN new n
                  ON o.o_orderkey = n.o_orderkey)
            SELECT o_orderkey, change_type FROM j
            WHERE change_type <> 'unchanged'
            ORDER BY o_orderkey, change_type
        """,
        # Deequ-style quality report: one row per check, names sorted
        "orders_quality_report": """
            SELECT "check", n_violations, n_violations = 0 AS passed
            FROM (
                SELECT 'not_null(o_custkey)' AS "check",
                       CAST((SELECT count(*) FROM orders
                             WHERE o_custkey IS NULL) AS BIGINT) AS n_violations
                UNION ALL
                SELECT 'unique(o_orderkey)',
                       CAST((SELECT count(*) - count(DISTINCT o_orderkey)
                             FROM orders) AS BIGINT)
                UNION ALL
                SELECT 'in_range(o_totalprice,0,200000)',
                       CAST((SELECT count(*) FROM orders
                             WHERE o_totalprice IS NOT NULL
                               AND (o_totalprice < 0 OR o_totalprice > 200000))
                            AS BIGINT)
                UNION ALL
                SELECT 'matches(o_orderpriority)',
                       CAST((SELECT count(*) FROM orders
                             WHERE o_orderpriority IS NOT NULL
                               AND NOT regexp_matches(o_orderpriority, '^[1-5]-'))
                            AS BIGINT)
                UNION ALL
                SELECT 'foreign_key(o_custkey)',
                       CAST((SELECT count(*) FROM orders o
                             WHERE o.o_custkey IS NOT NULL
                               AND o.o_custkey NOT IN
                                   (SELECT c_custkey FROM customer
                                    WHERE c_custkey IS NOT NULL)) AS BIGINT)
            ) ORDER BY "check"
        """,
        # RRF hybrid retrieval: bm25 top-50 + dense cosine top-50 (query =
        # vec 0), fused by 9dp-rounded reciprocal-rank terms, DECIMAL-summed
        "doc_rrf_fusion": f"""
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t
                FROM documents),
            lens AS (SELECT doc_id, len(t) AS dl FROM toks),
            stats AS (SELECT count(*) AS n,
                             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                      FROM lens),
            hits AS (SELECT doc_id, u.w AS w FROM toks, unnest(t) AS u(w)
                     WHERE u.w IN ('hash', 'spill', 'vector')),
            dfc AS (SELECT w, count(DISTINCT doc_id) AS dfreq FROM hits GROUP BY w),
            tf AS (SELECT doc_id, w, count(*) AS tfreq FROM hits GROUP BY doc_id, w),
            contrib AS (
                SELECT tf.doc_id,
                       CAST(round(
                         round(ln(1.0 + (CAST(n AS DOUBLE) - dfreq + 0.5)
                                        / (dfreq + 0.5)), 9)
                         * (tfreq * (CAST(1.2 AS DOUBLE) + 1.0))
                         / (tfreq + CAST(1.2 AS DOUBLE)
                            * (CAST(0.25 AS DOUBLE)
                               + CAST(0.75 AS DOUBLE) * dl / avgdl)),
                       9) AS DECIMAL(20,9)) AS c
                FROM tf JOIN dfc USING (w)
                     JOIN lens ON tf.doc_id = lens.doc_id, stats),
            bscored AS (SELECT doc_id,
                               round(CAST(CAST(sum(c) AS DECIMAL(38,9)) AS DOUBLE), 6) AS score
                        FROM contrib GROUP BY doc_id),
            lex AS (SELECT doc_id,
                           CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
                    FROM bscored),
            bb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
                   WHERE vec_id IN (SELECT doc_id FROM documents)),
            qq AS (SELECT e FROM bb WHERE vec_id = 0),
            dpairs AS (SELECT b.vec_id AS doc_id, {_COS_DIST} AS dist
                       FROM bb b CROSS JOIN qq q),
            dense AS (SELECT doc_id,
                             CAST(row_number() OVER (ORDER BY dist ASC, doc_id ASC) AS INT) AS rank
                      FROM dpairs),
            unioned AS (
                SELECT doc_id, rank FROM lex WHERE rank <= 50
                UNION ALL
                SELECT doc_id, rank FROM dense WHERE rank <= 50),
            fused AS (
                SELECT doc_id,
                       CAST(count(*) AS INT) AS n_lists,
                       round(CAST(CAST(sum(CAST(round(
                           CAST(1.0 AS DOUBLE) / (60 + rank), 9)
                           AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS DOUBLE), 6)
                           AS rrf_score
                FROM unioned GROUP BY doc_id),
            rranked AS (
                SELECT doc_id, n_lists, rrf_score,
                       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS rank
                FROM fused)
            SELECT doc_id, n_lists, rrf_score, rank
            FROM rranked WHERE rank <= 20 ORDER BY rank
        """,
        # cohort retention: Monday week-trunc both engines; offsets are
        # exact integer days/7
        "events_cohort_retention": """
            WITH first AS (
                SELECT user_id,
                       CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
                FROM events GROUP BY user_id),
            act AS (
                SELECT DISTINCT user_id,
                       CAST(date_trunc('week', ts) AS DATE) AS p
                FROM events)
            SELECT cohort,
                   CAST(date_diff('day', cohort, p) / 7 AS INT) AS period_offset,
                   count(*) AS n_users
            FROM act JOIN first USING (user_id)
            GROUP BY cohort, period_offset
            ORDER BY cohort, period_offset
        """,
        # column profile: one UNION-ALL branch per column; numerics report
        # rounded doubles, strings report min/max strings
        "orders_column_profile": """
            SELECT * FROM (
                SELECT 'o_custkey' AS "column",
                       count(*) AS n_rows,
                       count(*) - count(o_custkey) AS n_null,
                       count(DISTINCT o_custkey) AS n_distinct,
                       NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str,
                       round(CAST(min(o_custkey) AS DOUBLE), 6) AS min_num,
                       round(CAST(max(o_custkey) AS DOUBLE), 6) AS max_num
                FROM orders
                UNION ALL
                SELECT 'o_orderpriority', count(*),
                       count(*) - count(o_orderpriority),
                       count(DISTINCT o_orderpriority),
                       min(o_orderpriority), max(o_orderpriority),
                       NULL::DOUBLE, NULL::DOUBLE
                FROM orders
                UNION ALL
                SELECT 'o_orderstatus', count(*),
                       count(*) - count(o_orderstatus),
                       count(DISTINCT o_orderstatus),
                       min(o_orderstatus), max(o_orderstatus),
                       NULL::DOUBLE, NULL::DOUBLE
                FROM orders
                UNION ALL
                SELECT 'o_totalprice', count(*),
                       count(*) - count(o_totalprice),
                       count(DISTINCT o_totalprice),
                       NULL::VARCHAR, NULL::VARCHAR,
                       round(CAST(min(o_totalprice) AS DOUBLE), 6),
                       round(CAST(max(o_totalprice) AS DOUBLE), 6)
                FROM orders
            ) ORDER BY "column"
        """,
        # class-level tf-idf keywords: idf over group frequency, 9dp idf,
        # 6dp score, per-group top-5
        "doc_group_keywords": """
            WITH t AS (
                SELECT source,
                       unnest(string_split(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                           ' ')) AS token
                FROM documents),
            c AS (SELECT source, token, count(*) AS n_occurrences
                  FROM t WHERE length(token) > 0
                  GROUP BY source, token),
            gf AS (SELECT token, count(*) AS n_groups_with FROM c GROUP BY token),
            g AS (SELECT count(DISTINCT source) AS ng FROM documents),
            s AS (SELECT source, c.token, n_occurrences, n_groups_with,
                         round(n_occurrences
                               * round(ln(CAST(ng AS DOUBLE) / n_groups_with), 9),
                               6) AS score
                  FROM c JOIN gf USING (token), g
                  WHERE n_occurrences >= 2),
            r AS (SELECT source, token, n_occurrences, n_groups_with, score,
                         CAST(row_number() OVER (
                             PARTITION BY source
                             ORDER BY score DESC, token ASC) AS INT) AS rank
                  FROM s)
            SELECT source, token, n_occurrences, n_groups_with, score, rank
            FROM r WHERE rank <= 5 ORDER BY source, rank
        """,
        # rolling 7-day actives: activity days fan out to the report days
        # they support; count(DISTINCT user) dedups overlapping windows
        "events_rolling_active": """
            WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
            fan AS (SELECT user_id, CAST(u.day AS DATE) AS day
                    FROM act, unnest(generate_series(
                        CAST(d AS TIMESTAMP),
                        CAST(d AS TIMESTAMP) + INTERVAL 6 DAY,
                        INTERVAL 1 DAY)) AS u(day))
            SELECT day, count(DISTINCT user_id) AS n_active
            FROM fan WHERE day <= DATE '2024-01-30'
            GROUP BY day ORDER BY day
        """,
        # session paths: gaps-and-islands + ordered string_agg, exact
        # (ts, event_id) ordering both engines
        "events_top_paths": """
            WITH e AS (SELECT user_id, event_id, event_type, ts
                       FROM events WHERE user_id <= 50),
            m AS (SELECT user_id, event_id, event_type, ts,
                         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                              THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (SELECT user_id, event_id, event_type, ts,
                         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
                  FROM m),
            p AS (SELECT user_id, session_id,
                         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
                  FROM s GROUP BY user_id, session_id),
            c AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY path),
            r AS (SELECT path, n_sessions,
                         CAST(row_number() OVER (ORDER BY n_sessions DESC, path ASC)
                              AS INT) AS rank
                  FROM c)
            SELECT path, n_sessions, rank FROM r WHERE rank <= 20 ORDER BY rank
        """,
        # hot-key stats: integer counts + one double division per share
        "events_key_skew": """
            WITH c AS (SELECT user_id AS key, count(*) AS n
                       FROM events GROUP BY user_id),
            t AS (SELECT count(*) AS total FROM events),
            r AS (SELECT key, n,
                         row_number() OVER (ORDER BY n DESC, key ASC) AS rn,
                         sum(n) OVER (ORDER BY n DESC, key ASC
                                      ROWS UNBOUNDED PRECEDING) AS cum
                  FROM c)
            SELECT CAST(rn AS INT) AS rank, key, n,
                   round(n / CAST(total AS DOUBLE), 6) AS share,
                   round(cum / CAST(total AS DOUBLE), 6) AS cum_share
            FROM r, t WHERE rn <= 10 ORDER BY rank
        """,
        # per-source centroids: 9dp-rounded DECIMAL element sums, one
        # rounded double division per cell
        "embedding_group_centroids": """
            WITH a AS (SELECT d.source, CAST(e.embedding AS DOUBLE[]) AS emb
                       FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
            ex AS (SELECT source,
                          CAST(generate_subscripts(emb, 1) - 1 AS INT) AS dim,
                          CAST(round(unnest(emb), 9) AS DECIMAL(20,9)) AS term
                   FROM a)
            SELECT source, dim, count(*) AS n_vectors,
                   round(CAST(CAST(sum(term) AS DECIMAL(38,9)) AS DOUBLE)
                         / count(*), 6) AS mean
            FROM ex GROUP BY source, dim ORDER BY source, dim
        """,
        # posting lists: distinct hits, rank-capped postings, df over all
        "corpus_posting_lists": """
            WITH t AS (
                SELECT doc_id,
                       unnest(string_split(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                           ' ')) AS token
                FROM documents),
            h AS (SELECT DISTINCT doc_id, token FROM t WHERE length(token) > 0),
            r AS (SELECT token, doc_id,
                         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
                  FROM h),
            g AS (SELECT token, count(*) AS df FROM r GROUP BY token)
            SELECT r.token, g.df, CAST(r.rn - 1 AS INT) AS rank, r.doc_id
            FROM r JOIN g USING (token)
            WHERE g.df >= 5 AND r.rn <= 20
            ORDER BY token, rank
        """,
        "q2_min_balance_supplier": """
            WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
            eu AS (
                SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE'),
            cand AS (
                SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
                FROM ps
                JOIN part ON ps.l_partkey = p_partkey
                JOIN eu ON ps.l_suppkey = eu.s_suppkey
                WHERE p_size IN (15, 30)),
            mins AS (SELECT p_partkey AS mk_partkey, min(s_acctbal) AS mk_minbal
                     FROM cand GROUP BY p_partkey)
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey
            FROM cand JOIN mins
              ON p_partkey = mk_partkey AND s_acctbal = mk_minbal
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-07-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND date_diff('day', CAST(o_orderdate AS DATE),
                                  CAST(l_shipdate AS DATE)) > 60)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "q7_nation_volume": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
               OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        "q8_market_share": """
            WITH flat AS (
                SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                       CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol,
                       sn.n_name AS supp_nation
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation cn ON c_nationkey = cn.n_nationkey
                JOIN region ON cn.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation sn ON s_nationkey = sn.n_nationkey
                WHERE p_type = 'ECONOMY' AND r_name = 'ASIA')
            SELECT o_year,
                   CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol
                                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                     / CAST(sum(vol) AS DOUBLE) AS mkt_share,
                   CAST(sum(vol) AS DOUBLE) AS total_volume
            FROM flat
            GROUP BY o_year
            ORDER BY o_year
        """,
        "q9_product_profit": """
            SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
            GROUP BY 1, 2
            ORDER BY nation, o_year DESC
        """,
        "q11_important_parts": """
            WITH per_part AS (
                SELECT l_partkey,
                       sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS val
                FROM lineitem GROUP BY l_partkey),
            tot AS (SELECT sum(val) AS t, count(*) AS c FROM per_part)
            SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
            FROM per_part, tot
            WHERE CAST(val AS DOUBLE) > 1.4 * (CAST(t AS DOUBLE) / c)
            ORDER BY part_value DESC, l_partkey
        """,
        "q13_customer_distribution": """
            WITH counts AS (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer
                LEFT JOIN orders ON c_custkey = o_custkey
                     AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey)
            SELECT c_count, count(*) AS custdist
            FROM counts
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "q15_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1997-04-01'
                GROUP BY l_suppkey),
            mx AS (SELECT max(r) AS m FROM rev)
            SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
            FROM rev CROSS JOIN mx
            JOIN supplier ON l_suppkey = s_suppkey
            WHERE r = m
            ORDER BY s_suppkey
        """,
        "q12_lateness_priority": """
            SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                       CAST(l_shipdate AS DATE)) > 90 THEN 'very_late'
                        WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                       CAST(l_shipdate AS DATE)) > 30 THEN 'late'
                        ELSE 'ontime' END AS ship_bucket,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1 ORDER BY 1
        """,
        "q16_supplier_part_counts": """
            WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM ps JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
              AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "q17_small_quantity_revenue": """
            WITH aq AS (
                SELECT l_partkey AS aq_partkey,
                       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                         / count(*) AS aq_avg
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                WHERE p_brand = 'Brand#3'
                GROUP BY l_partkey)
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     / 7.0 AS avg_yearly
            FROM lineitem JOIN aq ON l_partkey = aq_partkey
            WHERE l_quantity < 0.5 * aq_avg
        """,
        "q19_disjunctive_revenue": """
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "q20_part_suppliers": """
            WITH qualifying AS (
                SELECT DISTINCT l_suppkey
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                WHERE p_name LIKE 'small%'
                  AND l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01'
                GROUP BY l_suppkey, l_partkey
                HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 40)
            SELECT s_suppkey, s_name, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (SELECT l_suppkey FROM qualifying)
            ORDER BY s_suppkey
        """,
        "q21_late_sole_suppliers": """
            WITH flagged AS (
                SELECT l_orderkey, l_suppkey,
                       CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                           CAST(l_shipdate AS DATE)) > 60
                            THEN 1 ELSE 0 END AS late
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'),
            per_order AS (
                SELECT l_orderkey,
                       count(DISTINCT l_suppkey) AS n_supp,
                       count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
                FROM flagged GROUP BY l_orderkey),
            culprits AS (
                SELECT DISTINCT f.l_orderkey, f.l_suppkey
                FROM flagged f
                JOIN per_order p ON f.l_orderkey = p.l_orderkey
                WHERE f.late = 1 AND p.n_supp > 1 AND p.n_late = 1)
            SELECT s_name, count(*) AS numwait
            FROM culprits JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 20
        """,
        "q22_idle_customers": """
            WITH avg_bal AS (
                SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                         / count(*) AS a
                FROM customer WHERE c_acctbal > 0)
            SELECT n_name, count(*) AS numcust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
            FROM customer CROSS JOIN avg_bal
            JOIN nation ON c_nationkey = n_nationkey
            WHERE c_acctbal > a
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-08-01')
            GROUP BY n_name
            ORDER BY n_name
        """,
        "doc_gopher_filter": f"""
            WITH t AS (
                SELECT doc_id, text,
                       {_TOKENS} AS toks,
                       {_NTOK} AS n,
                       list_filter(list_transform(string_split(text, chr(10)),
                                                  l -> trim(l)),
                                   l -> length(l) > 0) AS ls
                FROM documents),
            m AS (
                SELECT doc_id, n,
                       CASE WHEN n = 0 THEN 0.0
                            ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
                                      AS DOUBLE) / n END AS mean_wl,
                       CASE WHEN n = 0 THEN 0.0
                            ELSE CAST(len(list_filter(toks,
                                          x -> regexp_matches(x, '[a-zA-Z]')))
                                      AS DOUBLE) / n END AS alpha_frac,
                       CASE WHEN n = 0 THEN 0.0
                            ELSE CAST((length(text) - length(replace(text, '#', '')))
                                      + (length(text) - length(replace(text, '...', ''))) / 3
                                      AS DOUBLE) / n END AS sym_ratio,
                       CASE WHEN len(ls) = 0 THEN 0.0
                            ELSE CAST(len(list_filter(ls,
                                          l -> starts_with(l, '-') OR starts_with(l, '*')
                                               OR starts_with(l, '•')))
                                      AS DOUBLE) / len(ls) END AS bullet_frac,
                       CASE WHEN len(ls) = 0 THEN 0.0
                            ELSE CAST(len(list_filter(ls, l -> ends_with(l, '...')))
                                      AS DOUBLE) / len(ls) END AS ellipsis_frac,
                       len(list_intersect(
                           list_distinct(CASE WHEN length(trim(text)) = 0
                                              THEN CAST([] AS VARCHAR[])
                                              ELSE {_LTOKENS} END),
                           [{_STOPWORD_SQL_LIST}])) AS sw_present
                FROM t)
            SELECT doc_id,
                   (n >= 50 AND n <= 100000) AS ok_word_count,
                   (mean_wl >= 3.0 AND mean_wl <= 10.0) AS ok_mean_word_len,
                   (sym_ratio <= 0.1) AS ok_symbol_ratio,
                   (bullet_frac <= 0.9) AS ok_bullet,
                   (ellipsis_frac <= 0.3) AS ok_ellipsis,
                   (alpha_frac >= 0.8) AS ok_alpha,
                   (sw_present >= 2) AS ok_stopwords,
                   ((n >= 50 AND n <= 100000) AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
                    AND sym_ratio <= 0.1 AND bullet_frac <= 0.9
                    AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
                    AND sw_present >= 2) AS keep,
                   round(mean_wl, 6) AS mean_word_len,
                   round(sym_ratio, 6) AS symbol_ratio,
                   round(alpha_frac, 6) AS alpha_frac,
                   n AS n_words
            FROM m ORDER BY doc_id
        """,
        "doc_token_entropy": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
                FROM documents WHERE length(trim(text)) > 0),
            cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
            agg AS (
                SELECT doc_id, sum(c) AS n, count(*) AS nd,
                       sum(CAST(round(c * ln(CAST(c AS DOUBLE)), 9)
                                AS DECIMAL(20,9))) AS s
                FROM cnt GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(CAST(n AS INT), 0) AS n_tokens,
                   COALESCE(CAST(nd AS INT), 0) AS n_distinct,
                   CASE WHEN n IS NULL THEN NULL
                        ELSE round(ln(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / n, 6)
                   END AS entropy
            FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
            ORDER BY d.doc_id
        """,
        "embedding_hard_negatives": f"""
            WITH q AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                       FROM embeddings WHERE vec_id < 16),
                 b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                       FROM embeddings),
                 pairs AS (
                    SELECT q.vec_id AS qid, b.vec_id AS bid, {_COS_DIST} AS dist
                    FROM q JOIN b ON q.label <> b.label
                    WHERE list_inner_product(b.e, b.e) > 0
                      AND list_inner_product(q.e, q.e) > 0),
                 ranked AS (
                    SELECT qid, bid, dist,
                           row_number() OVER (PARTITION BY qid
                                              ORDER BY dist ASC, bid ASC) AS rn
                    FROM pairs)
            SELECT qid AS query_id, CAST(rn AS INT) AS rank, bid AS base_id,
                   round(dist, 6) + 0.0 AS distance
            FROM ranked WHERE rn <= 5
        """,
        "embedding_dim_quantiles": """
            WITH v AS (
                SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings)
            SELECT dim, count(*) AS n,
                   round(quantile_cont(x, 0.25), 6) AS q25,
                   round(quantile_cont(x, 0.5), 6) AS q50,
                   round(quantile_cont(x, 0.75), 6) AS q75
            FROM v GROUP BY dim ORDER BY dim
        """,
        "orders_apply_changes": """
            WITH target AS (
                SELECT o_orderkey, o_orderstatus,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
                FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'),
            upserts AS (
                SELECT o_orderkey, o_orderstatus,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2))
                            * CAST(2 AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
                FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
            deletes AS (
                SELECT o_orderkey FROM orders
                WHERE o_orderdate < TIMESTAMP '2000-01-01' AND o_orderkey % 37 = 0),
            change_keys AS (
                SELECT o_orderkey FROM upserts
                UNION ALL SELECT o_orderkey FROM deletes)
            SELECT * FROM (
                SELECT t.* FROM target t
                WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM change_keys)
                UNION ALL
                SELECT * FROM upserts)
            ORDER BY o_orderkey
        """,
        "events_scd2_history": """
            WITH snaps AS (
                SELECT user_id,
                       CAST(floor((day(ts) - 1) / 10) + 1 AS INT) AS snap,
                       count(*) AS n_ev, max(event_type) AS top_type
                FROM events GROUP BY 1, 2),
            cal AS (
                SELECT snap AS c_snap,
                       CAST(row_number() OVER (ORDER BY snap) AS INT) AS idx
                FROM (SELECT DISTINCT snap FROM snaps)),
            rows_ AS (
                SELECT user_id, n_ev, top_type, snap, idx
                FROM snaps JOIN cal ON snap = c_snap),
            marked AS (
                SELECT *,
                       lag(idx) OVER w AS prev_idx,
                       lag(n_ev) OVER w AS prev_n,
                       lag(top_type) OVER w AS prev_t
                FROM rows_
                WINDOW w AS (PARTITION BY user_id ORDER BY idx)),
            runs_in AS (
                SELECT *,
                       CASE WHEN prev_idx IS NULL OR prev_idx <> idx - 1
                                 OR prev_n <> n_ev OR prev_t <> top_type
                            THEN 1 ELSE 0 END AS chg
                FROM marked),
            numbered AS (
                SELECT *,
                       sum(chg) OVER (PARTITION BY user_id ORDER BY idx
                                      ROWS UNBOUNDED PRECEDING) AS run
                FROM runs_in),
            runs AS (
                SELECT user_id, run, min(snap) AS valid_from,
                       max(idx) AS max_idx,
                       max(n_ev) AS n_ev, max(top_type) AS top_type
                FROM numbered GROUP BY user_id, run),
            last_idx AS (SELECT max(idx) AS li FROM cal)
            SELECT user_id, CAST(n_ev AS BIGINT) AS n_ev, top_type,
                   valid_from,
                   (SELECT c_snap FROM cal WHERE idx = max_idx + 1) AS valid_to,
                   (max_idx = (SELECT li FROM last_idx)) AS is_current
            FROM runs
            ORDER BY user_id, valid_from
        """,
        "embedding_psi_drift": """
            WITH v AS (
                SELECT vec_id,
                       CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings),
            binned AS (
                SELECT dim,
                       least(greatest(CAST(floor((x - (-4.0)) / 0.8) AS INT), 0), 9)
                         AS bin,
                       CASE WHEN vec_id < 250 THEN 0 ELSE 1 END AS side
                FROM v),
            counts AS (
                SELECT dim, bin,
                       sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS cb,
                       sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cc
                FROM binned GROUP BY dim, bin),
            totals AS (
                SELECT dim, sum(cb) AS nb, sum(cc) AS nc FROM counts GROUP BY dim),
            grid AS (
                SELECT t.dim, t.nb, t.nc, gs.bin
                FROM totals t, (SELECT unnest(generate_series(0, 9)) AS bin) gs),
            full_ AS (
                SELECT g.dim, g.nb, g.nc, g.bin,
                       COALESCE(c.cb, 0) AS cb, COALESCE(c.cc, 0) AS cc
                FROM grid g LEFT JOIN counts c
                  ON g.dim = c.dim AND g.bin = c.bin),
            terms AS (
                SELECT dim, cb, cc,
                       CAST(round(
                           (CAST(cb + 1 AS DOUBLE) / (nb + 10)
                            - CAST(cc + 1 AS DOUBLE) / (nc + 10))
                           * ln((CAST(cb + 1 AS DOUBLE) / (nb + 10))
                                / (CAST(cc + 1 AS DOUBLE) / (nc + 10))), 9)
                         AS DECIMAL(20,9)) AS term
                FROM full_)
            SELECT dim,
                   round(CAST(sum(term) AS DOUBLE), 6) AS psi,
                   CAST(sum(cb) AS BIGINT) AS n_baseline,
                   CAST(sum(cc) AS BIGINT) AS n_current
            FROM terms GROUP BY dim ORDER BY dim
        """,
        "orders_incremental_agg": """
            WITH target AS (
                SELECT o_orderkey, o_orderstatus,
                       CAST(o_totalprice AS DECIMAL(18,2)) AS price
                FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'),
            upserts AS (
                SELECT o_orderkey, o_orderstatus,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2))
                            * CAST(2 AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS price
                FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
            deletes AS (
                SELECT o_orderkey FROM orders
                WHERE o_orderdate < TIMESTAMP '2000-01-01' AND o_orderkey % 37 = 0),
            change_keys AS (
                SELECT o_orderkey FROM upserts
                UNION ALL SELECT o_orderkey FROM deletes),
            merged AS (
                SELECT o_orderstatus, price FROM target
                WHERE o_orderkey NOT IN (SELECT o_orderkey FROM change_keys)
                UNION ALL
                SELECT o_orderstatus, price FROM upserts)
            SELECT o_orderstatus, count(*) AS n,
                   CAST(sum(price) AS DOUBLE) AS revenue
            FROM merged GROUP BY o_orderstatus
            ORDER BY o_orderstatus
        """,
        "events_multi_touch": """
            WITH conv AS (
                SELECT user_id AS u, ts AS cts, event_id AS cid, value AS val
                FROM events WHERE event_type = 'purchase'),
            touch AS (
                SELECT user_id AS u, ts AS tts, event_id AS tid,
                       event_type AS channel
                FROM events WHERE event_type IN ('view', 'click')),
            matched AS (
                SELECT c.cid, c.val, t.channel
                FROM conv c JOIN touch t ON c.u = t.u
                 AND t.tts <= c.cts
                 AND t.tts > c.cts - INTERVAL '86400 seconds'),
            counted AS (
                SELECT cid, val, channel,
                       count(*) OVER (PARTITION BY cid) AS n
                FROM matched),
            direct AS (
                SELECT cid, val, 'direct' AS channel, CAST(1 AS BIGINT) AS n
                FROM conv
                WHERE cid NOT IN (SELECT cid FROM matched)),
            rows_ AS (
                SELECT cid, val, channel, n FROM counted
                UNION ALL SELECT cid, val, channel, n FROM direct)
            SELECT channel,
                   round(CAST(sum(CAST(round(val / n, 9) AS DECIMAL(20,9)))
                              AS DOUBLE), 6) AS credit,
                   count(*) AS n_touches,
                   count(DISTINCT cid) AS n_conversions
            FROM rows_ GROUP BY channel ORDER BY channel
        """,
        "doc_entity_resolution": f"""
            WITH RECURSIVE s AS (
                SELECT lang, source, doc_id, n_chars,
                       substr({_NORM}, 1, 60) AS t
                FROM documents),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM s a JOIN s b
                  ON a.lang = b.lang AND a.source = b.source
                 AND a.doc_id < b.doc_id
                 AND abs(a.n_chars - b.n_chars) <= 3
                WHERE levenshtein(a.t, b.t) <= 45),
            edges AS (
                SELECT id_a AS es, id_b AS ed FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
            reach(id, r) AS (
                SELECT es, ed FROM edges
                UNION
                SELECT w.id, e.ed FROM reach w JOIN edges e ON e.es = w.r),
            comp AS (
                SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id),
            labeled AS (
                SELECT d.doc_id,
                       COALESCE(c.component, d.doc_id) AS cluster,
                       round(least(length(d.text) / 500.0, 1.0) * 0.4
                             + least({_SWRATIO.replace('text', 'd.text')} * 4.0, 1.0) * 0.3
                             + greatest(0.0, 1.0 - {_PUNCT.replace('text', 'd.text')} * 5.0) * 0.3,
                             6) AS quality
                FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
            best AS (
                SELECT cluster, doc_id AS survivor_id FROM (
                    SELECT cluster, doc_id,
                           row_number() OVER (PARTITION BY cluster
                                              ORDER BY quality DESC, doc_id ASC) AS rn
                    FROM labeled)
                WHERE rn = 1)
            SELECT l.doc_id, l.cluster,
                   (l.doc_id = b.survivor_id) AS survivor, l.quality
            FROM labeled l JOIN best b ON l.cluster = b.cluster
            ORDER BY l.doc_id
        """,
        "events_ab_test": """
            WITH per_user AS (
                SELECT concat('v', CAST(user_id % 3 AS VARCHAR)) AS v, user_id,
                       max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
                FROM events GROUP BY 1, 2),
            per_variant AS (
                SELECT v, count(*) AS users, CAST(sum(c) AS BIGINT) AS conv
                FROM per_user GROUP BY v),
            pairs AS (
                SELECT a.v AS variant_a, a.users AS users_a, a.conv AS conv_a,
                       b.v AS variant_b, b.users AS users_b, b.conv AS conv_b
                FROM per_variant a JOIN per_variant b ON a.v < b.v),
            stats AS (
                SELECT *,
                       CAST(conv_a AS DOUBLE) / users_a AS ra,
                       CAST(conv_b AS DOUBLE) / users_b AS rb,
                       CAST(conv_a + conv_b AS DOUBLE) / (users_a + users_b) AS pp
                FROM pairs),
            zcalc AS (
                SELECT *,
                       CASE WHEN sqrt(pp * (1.0 - pp)
                                      * (1.0 / users_a + 1.0 / users_b)) = 0.0
                            THEN 0.0
                            ELSE (ra - rb)
                                 / sqrt(pp * (1.0 - pp)
                                        * (1.0 / users_a + 1.0 / users_b))
                       END AS z
                FROM stats),
            tcalc AS (
                SELECT *,
                       1.0 / (1.0 + 0.3275911 * abs(z / 1.4142135623730951)) AS t,
                       z / 1.4142135623730951 AS zz
                FROM zcalc)
            SELECT variant_a, variant_b, users_a, conv_a,
                   round(ra, 6) AS rate_a,
                   users_b, conv_b, round(rb, 6) AS rate_b,
                   round(z, 6) + 0.0 AS z,
                   round(1.0 - ((CASE WHEN abs(zz) < 0 THEN -1.0 ELSE 1.0 END)
                         * (1.0 - (0.254829592 * t - 0.284496736 * power(t, 2)
                                   + 1.421413741 * power(t, 3)
                                   - 1.453152027 * power(t, 4)
                                   + 1.061405429 * power(t, 5))
                           * exp(-abs(zz) * abs(zz)))), 4) + 0.0 AS p_value
            FROM tcalc ORDER BY variant_a, variant_b
        """,
        "events_cooccurrence": """
            WITH hits AS (
                SELECT DISTINCT user_id AS b, event_type AS i FROM events),
            n AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS nb FROM hits),
            item_counts AS (
                SELECT i, count(*) AS ni FROM hits GROUP BY i),
            pair_counts AS (
                SELECT a.i AS item_a, b2.i AS item_b, count(*) AS n_both
                FROM hits a JOIN hits b2 ON a.b = b2.b AND a.i < b2.i
                GROUP BY 1, 2)
            SELECT item_a, item_b, n_both,
                   ca.ni AS n_a, cb.ni AS n_b,
                   round(n_both / nb, 6) AS support,
                   round((n_both * nb) / (CAST(ca.ni AS DOUBLE) * cb.ni), 6) AS lift
            FROM pair_counts
            JOIN item_counts ca ON item_a = ca.i
            JOIN item_counts cb ON item_b = cb.i
            CROSS JOIN n
            ORDER BY item_a, item_b
        """,
        "doc_group_percent_rank": f"""
            SELECT doc_id, source,
                   round(least(length(text) / 500.0, 1.0) * 0.4
                         + least({_SWRATIO} * 4.0, 1.0) * 0.3
                         + greatest(0.0, 1.0 - {_PUNCT} * 5.0) * 0.3, 6) AS quality,
                   round(percent_rank() OVER (
                       PARTITION BY source
                       ORDER BY round(least(length(text) / 500.0, 1.0) * 0.4
                                      + least({_SWRATIO} * 4.0, 1.0) * 0.3
                                      + greatest(0.0, 1.0 - {_PUNCT} * 5.0) * 0.3, 6) ASC),
                         6) AS pct_rank
            FROM documents ORDER BY doc_id
        """,
        "embedding_winsorize": """
            WITH v AS (
                SELECT vec_id,
                       CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings),
            bounds AS (
                SELECT dim,
                       round(quantile_cont(x, 0.01), 9) AS lo,
                       round(quantile_cont(x, 0.99), 9) AS hi
                FROM v GROUP BY dim),
            clipped AS (
                SELECT v.vec_id, v.dim,
                       round(least(greatest(v.x, b.lo), b.hi), 6) AS c
                FROM v JOIN bounds b ON v.dim = b.dim)
            SELECT vec_id, dim, c AS clipped
            FROM clipped ORDER BY vec_id, dim
        """,
        "doc_config_pipeline": f"""
            WITH kept AS (
                SELECT doc_id, text FROM documents
                WHERE lang IN ('en')
                  AND round(least(length(text) / 500.0, 1.0) * 0.4
                            + least({_SWRATIO} * 4.0, 1.0) * 0.3
                            + greatest(0.0, 1.0 - {_PUNCT} * 5.0) * 0.3, 6) >= 0.3),
            dedup AS (
                SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5({_NORM})),
            final AS (
                SELECT k.doc_id, k.text FROM kept k
                JOIN dedup d ON k.doc_id = d.doc_id),
            h AS (
                SELECT doc_id, text,
                       ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT AS hv
                FROM final)
            SELECT doc_id,
                   CASE WHEN hv < CAST(0.8 AS DOUBLE) * 4503599627370496.0 THEN 'train'
                        WHEN hv < (CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE)) * 4503599627370496.0 THEN 'val'
                        ELSE 'test' END AS split,
                   {_NTOK} AS n_tokens
            FROM h ORDER BY doc_id
        """,
        "doc_sentence_stats": """
            WITH segs AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0
                            THEN CAST([] AS VARCHAR[])
                            ELSE list_filter(
                                list_transform(
                                    string_split(
                                        regexp_replace(trim(text),
                                                       '([.!?])\\s+',
                                                       '\\1' || chr(1), 'g'),
                                        chr(1)),
                                    s -> trim(s)),
                                s -> length(s) > 0)
                       END AS ss
                FROM documents)
            SELECT doc_id,
                   CAST(len(ss) AS INT) AS n_sentences,
                   round(CASE WHEN len(ss) = 0 THEN 0.0
                              ELSE CAST(list_sum(list_transform(ss,
                                       s -> len(regexp_split_to_array(trim(s), '\\s+'))))
                                   AS DOUBLE) / len(ss) END, 6)
                     AS mean_words_per_sentence,
                   round(CASE WHEN len(ss) = 0 THEN 0.0
                              ELSE CAST(len(list_filter(ss,
                                       s -> regexp_matches(s, '[.!?]$')))
                                   AS DOUBLE) / len(ss) END, 6) AS terminal_frac
            FROM segs ORDER BY doc_id
        """,
        "embedding_matryoshka": """
            WITH p AS (
                SELECT vec_id,
                       list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS pre
                FROM embeddings),
            n AS (
                SELECT vec_id, pre,
                       sqrt(list_inner_product(pre, pre)) AS nrm
                FROM p),
            z AS (
                SELECT vec_id,
                       CASE WHEN nrm = 0.0 THEN pre
                            ELSE list_transform(pre, x -> round(x / nrm, 6))
                       END AS e
                FROM n)
            SELECT vec_id,
                   CAST(generate_subscripts(e, 1) - 1 AS INT) AS dim,
                   CAST(unnest(e) AS DOUBLE) AS value
            FROM z ORDER BY vec_id, dim
        """,
        "embedding_bq_hamming": _bq_hamming_oracle(),
        "events_trending": """
            WITH counts AS (
                SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
                FROM events GROUP BY 1, 2),
            ranked AS (
                SELECT day, event_type, n,
                       CAST(row_number() OVER (PARTITION BY day
                                               ORDER BY n DESC, event_type ASC)
                            AS INT) AS rank
                FROM counts)
            SELECT day, event_type, n, rank FROM ranked
            WHERE rank <= 3 ORDER BY day, rank
        """,
        "doc_readability": f"""
            WITH seg AS (
                SELECT doc_id,
                       {_TOKENS} AS toks,
                       {_NTOK} AS n_words,
                       CASE WHEN length(trim(text)) = 0
                            THEN CAST([] AS VARCHAR[])
                            ELSE list_filter(
                                list_transform(
                                    string_split(
                                        regexp_replace(trim(text),
                                                       '([.!?])\\s+',
                                                       '\\1' || chr(1), 'g'),
                                        chr(1)),
                                    s -> trim(s)),
                                s -> length(s) > 0)
                       END AS ss
                FROM documents),
            m AS (
                SELECT doc_id, n_words,
                       CAST(len(ss) AS INT) AS n_sentences,
                       greatest(CAST(len(ss) AS INT), 1) AS sents_div,
                       CASE WHEN n_words = 0 THEN 0
                            ELSE CAST(list_sum(list_transform(toks,
                                 t -> greatest(len(regexp_extract_all(lower(t),
                                                   '[aeiouy]+')), 1))) AS INT)
                       END AS n_syllables
                FROM seg)
            SELECT doc_id, n_words, n_sentences, n_syllables,
                   CASE WHEN n_words = 0 THEN NULL
                        ELSE round(0.39 * (CAST(n_words AS DOUBLE) / sents_div)
                                   + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
                                   - 15.59, 6) END AS fk_grade,
                   CASE WHEN n_words = 0 THEN NULL
                        ELSE round(206.835
                                   - 1.015 * (CAST(n_words AS DOUBLE) / sents_div)
                                   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words),
                                   6) END AS fk_ease
            FROM m ORDER BY doc_id
        """,
        "events_funnel_steps": """
            WITH s1 AS (
                SELECT u, t0 FROM (
                    SELECT user_id AS u, ts AS t0,
                           row_number() OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS rn
                    FROM events WHERE event_type = 'view')
                WHERE rn = 1),
            s2 AS (
                SELECT u, t0, tprev FROM (
                    SELECT s1.u, s1.t0, e.ts AS tprev,
                           row_number() OVER (PARTITION BY s1.u
                                              ORDER BY e.ts, e.event_id) AS rn
                    FROM s1 JOIN events e
                      ON e.user_id = s1.u AND e.event_type = 'click'
                     AND e.ts >= s1.t0)
                WHERE rn = 1
                  AND tprev <= t0 + INTERVAL '604800 seconds'),
            s3 AS (
                SELECT u, t0, tprev FROM (
                    SELECT s2.u, s2.t0, e.ts AS tprev,
                           row_number() OVER (PARTITION BY s2.u
                                              ORDER BY e.ts, e.event_id) AS rn
                    FROM s2 JOIN events e
                      ON e.user_id = s2.u AND e.event_type = 'purchase'
                     AND e.ts >= s2.tprev)
                WHERE rn = 1
                  AND tprev <= t0 + INTERVAL '604800 seconds'),
            c AS (SELECT (SELECT count(*) FROM s1) AS n1,
                         (SELECT count(*) FROM s2) AS n2,
                         (SELECT count(*) FROM s3) AS n3)
            SELECT * FROM (
                SELECT 1 AS step_index, 'view' AS step, n1 AS n_users,
                       round(CASE WHEN n1 = 0 THEN 0.0 ELSE n1 / CAST(n1 AS DOUBLE) END, 6) AS pct_of_first,
                       round(CASE WHEN n1 = 0 THEN 0.0 ELSE n1 / CAST(n1 AS DOUBLE) END, 6) AS pct_of_prev
                FROM c
                UNION ALL
                SELECT 2, 'click', n2,
                       round(CASE WHEN n1 = 0 THEN 0.0 ELSE n2 / CAST(n1 AS DOUBLE) END, 6),
                       round(CASE WHEN n1 = 0 THEN 0.0 ELSE n2 / CAST(n1 AS DOUBLE) END, 6)
                FROM c
                UNION ALL
                SELECT 3, 'purchase', n3,
                       round(CASE WHEN n1 = 0 THEN 0.0 ELSE n3 / CAST(n1 AS DOUBLE) END, 6),
                       round(CASE WHEN n2 = 0 THEN 0.0 ELSE n3 / CAST(n2 AS DOUBLE) END, 6)
                FROM c)
            ORDER BY step_index
        """,
        "events_weekly_deltas": """
            WITH weekly AS (
                SELECT date_trunc('week', ts) AS week, event_type,
                       count(*) AS n,
                       CAST(sum(CAST(round(value, 6) AS DECIMAL(20,6)))
                            AS DOUBLE) AS total_value
                FROM events GROUP BY 1, 2),
            lagd AS (
                SELECT *, lag(n) OVER (PARTITION BY event_type ORDER BY week)
                       AS prev
                FROM weekly)
            SELECT week, event_type, n, total_value,
                   (n - COALESCE(prev, n)) AS delta_n,
                   round(CASE WHEN prev IS NULL OR prev = 0 THEN 0.0
                              ELSE CAST(n - prev AS DOUBLE) / prev END, 6)
                     AS pct_change
            FROM lagd ORDER BY event_type, week
        """,
        "embedding_lloyd_kmeans": _lloyd_oracle(k=8, iterations=2),
        "embedding_sq8_error": """
            WITH emb AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            ex AS (SELECT CAST(generate_subscripts(v, 1) - 1 AS INT) AS dim,
                          unnest(v) AS x
                   FROM emb),
            bounds AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM ex GROUP BY dim),
            coded AS (
                SELECT e.dim, e.x, b.lo, b.hi,
                       CASE WHEN b.hi = b.lo THEN 0
                            ELSE greatest(0, least(255,
                                 CAST(round((e.x - b.lo) * 255.0 / (b.hi - b.lo))
                                      AS INT))) END AS code
                FROM ex e JOIN bounds b ON e.dim = b.dim),
            err AS (
                SELECT dim, lo, hi,
                       x - (lo + (CAST(code AS DOUBLE) * (hi - lo)) / 255.0) AS e
                FROM coded)
            SELECT dim, round(min(lo), 6) AS lo, round(min(hi), 6) AS hi,
                   round(CAST(CAST(sum(CAST(round(e * e, 12) AS DECIMAL(24,12)))
                         AS DECIMAL(38,12)) AS DOUBLE) / count(*), 9) AS mse,
                   max(round(abs(e), 9)) AS max_abs_err,
                   max(round(abs(e), 9))
                     <= (min(hi) - min(lo)) / 510.0
                        + (min(hi) - min(lo)) / 255.0 * 1e-9 + 1e-12
                     AS within_bound
            FROM err GROUP BY dim ORDER BY dim
        """,
        "events_seasonal_decompose": """
            WITH daily AS (
                SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS value
                FROM events GROUP BY 1),
            tr AS (
                SELECT day, value,
                       CASE WHEN count(*) OVER w = 7
                            THEN round(sum(value) OVER w / 7, 6) END AS trend
                FROM daily
                WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
            det AS (
                SELECT *, CAST(round(value - trend, 9) AS DECIMAL(20,9)) AS dt
                FROM tr),
            seas AS (
                SELECT dayofweek(day) + 1 AS dow,
                       round(CAST(CAST(sum(dt) AS DECIMAL(38,9)) AS DOUBLE)
                             / count(*), 6) AS seasonal
                FROM det WHERE trend IS NOT NULL GROUP BY 1)
            SELECT t.day, t.value, t.trend, s.seasonal,
                   round(t.value - t.trend - s.seasonal, 6) AS residual
            FROM tr t LEFT JOIN seas s ON dayofweek(t.day) + 1 = s.dow
            ORDER BY t.day
        """,
        "events_cusum_change": """
            WITH daily AS (
                SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
                FROM events GROUP BY 1),
            ranked AS (
                SELECT *, row_number() OVER (ORDER BY day) AS rn FROM daily),
            base AS (
                SELECT CAST(sum(n_events) AS DOUBLE) / count(*) AS mu,
                       count(*) AS n,
                       CAST(sum(n_events * n_events) AS DOUBLE) AS ss
                FROM ranked WHERE rn <= 7),
            basestd AS (
                SELECT mu, sqrt(greatest(0.0, ss / n - mu * mu)) AS sigma
                FROM base),
            scored AS (
                SELECT day, n_events,
                       round((n_events - b.mu)
                             / (CASE WHEN b.sigma > 0 THEN b.sigma ELSE 1.0 END), 9)
                         AS z
                FROM ranked CROSS JOIN basestd b),
            run AS (
                SELECT *,
                       CAST(CAST(sum(CAST(round(z - 0.5, 9) AS DECIMAL(20,9)))
                            OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                            AS DECIMAL(38,9)) AS DOUBLE) AS r
                FROM scored),
            run2 AS (
                SELECT *, least(0.0, min(r) OVER (ORDER BY day ROWS UNBOUNDED
                          PRECEDING)) AS rmin
                FROM run)
            SELECT day, n_events, round(z, 6) AS z,
                   round(r - rmin, 6) AS cusum_pos,
                   round(r - rmin, 6) > 4.0 AS is_alarm
            FROM run2 ORDER BY day
        """,
        "events_mad_outliers": """
            WITH med AS (
                SELECT event_type AS key, quantile_cont(value, 0.5) AS med
                FROM events GROUP BY 1),
            j AS (
                SELECT e.event_type AS key, e.value AS v, m.med
                FROM events e JOIN med m ON e.event_type = m.key),
            mad AS (
                SELECT key, quantile_cont(abs(v - med), 0.5) AS mad
                FROM j GROUP BY key),
            f AS (SELECT j.key, j.v, j.med, mad.mad
                  FROM j JOIN mad ON j.key = mad.key),
            agg AS (
                SELECT key, count(*) AS n, round(min(med), 6) AS med,
                       round(min(mad), 6) AS mad,
                       CAST(sum(CASE WHEN abs(v - med) > (3.0 * 1.4826) * mad
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
                FROM f GROUP BY key)
            SELECT key, n, med, mad, n_outliers,
                   round(n_outliers / CAST(n AS DOUBLE), 6) AS outlier_frac
            FROM agg ORDER BY key
        """,
        "events_concurrency": """
            WITH b AS (
                SELECT ts AS t, 1 AS delta FROM events
                UNION ALL
                SELECT ts + INTERVAL 10 MINUTE AS t, -1 AS delta FROM events),
            c AS (
                SELECT t, delta,
                       CAST(sum(delta) OVER (ORDER BY t, delta
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrent
                FROM b)
            SELECT date_trunc('hour', t) AS bucket_start,
                   max(concurrent) AS max_concurrent
            FROM c WHERE delta = 1 GROUP BY 1 ORDER BY 1
        """,
        "events_triangle_count": """
            WITH occ0 AS (
                SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
                FROM events),
            kept AS (
                SELECT event_type, h FROM occ0
                GROUP BY event_type, h HAVING count(*) <= 100),
            occ AS (
                SELECT o.event_type, o.h, o.user_id
                FROM occ0 o JOIN kept k
                  ON o.event_type = k.event_type AND o.h = k.h),
            edges AS (
                SELECT a.user_id AS a, b.user_id AS b
                FROM occ a JOIN occ b
                  ON a.event_type = b.event_type AND a.h = b.h
                 AND a.user_id < b.user_id
                GROUP BY a.user_id, b.user_id
                HAVING count(*) >= 3),
            deg AS (
                SELECT node, count(*) AS deg FROM (
                    SELECT a AS node FROM edges
                    UNION ALL SELECT b FROM edges) GROUP BY node),
            w AS (
                SELECT count(*) AS n_nodes,
                       CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
                FROM deg),
            tri AS (
                SELECT count(*) AS n_triangles
                FROM edges e1
                JOIN edges e2 ON e1.b = e2.a
                JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
            ne AS (SELECT count(*) AS n_edges FROM edges)
            SELECT w.n_nodes, ne.n_edges, w.n_wedges, tri.n_triangles,
                   CASE WHEN w.n_wedges > 0
                        THEN round(3.0 * tri.n_triangles / w.n_wedges, 6)
                        ELSE 0.0 END AS clustering_coeff
            FROM w, ne, tri
        """,
        "doc_dataset_card": f"""
            WITH doc AS (
                SELECT source AS slice, lang, {_NTOK} AS ntok,
                       md5({_NORM}) AS dig,
                       CAST(round({_PUNCT}, 9) AS DECIMAL(20,9)) AS punct
                FROM documents),
            ps AS (
                SELECT slice, count(*) AS n_docs,
                       CAST(sum(ntok) AS BIGINT) AS total_tokens,
                       round(CAST(sum(ntok) AS DOUBLE) / count(*), 6)
                         AS mean_tokens,
                       round(quantile_cont(ntok, 0.5), 6) AS p50_tokens,
                       count(DISTINCT dig) AS nd,
                       round(CAST(CAST(sum(punct) AS DECIMAL(38,9)) AS DOUBLE)
                             / count(*), 6) AS mean_punct_ratio
                FROM doc GROUP BY slice),
            lc AS (SELECT slice, lang, count(*) AS nl
                   FROM doc GROUP BY slice, lang),
            st AS (SELECT slice, CAST(sum(nl) AS BIGINT) AS n,
                          count(*) AS n_langs
                   FROM lc GROUP BY slice),
            ent AS (
                SELECT lc.slice, st.n_langs,
                       round(-CAST(CAST(sum(CAST(round(
                             (CAST(nl AS DOUBLE) / n)
                             * ln(CAST(nl AS DOUBLE) / n), 12)
                             AS DECIMAL(24,12))) AS DECIMAL(38,12)) AS DOUBLE), 6)
                         AS lang_entropy
                FROM lc JOIN st ON lc.slice = st.slice
                GROUP BY lc.slice, st.n_langs)
            SELECT ps.slice, ps.n_docs, ps.total_tokens, ps.mean_tokens,
                   ps.p50_tokens,
                   round(1.0 - nd / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
                   ent.n_langs, ent.lang_entropy, ps.mean_punct_ratio
            FROM ps JOIN ent ON ps.slice = ent.slice ORDER BY ps.slice
        """,
        "doc_rake_keyphrases": f"""
            WITH arrs AS (
                SELECT doc_id AS doc,
                       regexp_split_to_array(
                           trim(regexp_replace(lower(text), '[^a-z\\s]+', ' 0 ',
                                               'g')),
                           '\\s+') AS a
                FROM documents),
            toks AS (
                SELECT doc, CAST(generate_subscripts(a, 1) AS INT) AS pos,
                       unnest(a) AS w
                FROM arrs),
            toks2 AS (SELECT doc, pos, w FROM toks WHERE length(w) > 0),
            marked AS (
                SELECT doc, pos, w,
                       CASE WHEN w IN ({_STOPWORD_SQL_LIST}) OR w = '0'
                            THEN 1 ELSE 0 END AS isstop
                FROM toks2),
            runs AS (
                SELECT doc, pos, w,
                       sum(isstop) OVER (PARTITION BY doc ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS run
                FROM marked QUALIFY isstop = 0),
            ph AS (
                SELECT doc, run, string_agg(w, ' ' ORDER BY pos) AS phrase,
                       count(*) AS plen
                FROM runs GROUP BY doc, run HAVING count(*) <= 4),
            words AS (
                SELECT plen, unnest(regexp_split_to_array(phrase, ' ')) AS w
                FROM ph),
            ws AS (
                SELECT w, CAST(sum(plen) AS BIGINT) AS deg, count(*) AS freq
                FROM words GROUP BY w),
            pt AS (SELECT DISTINCT phrase FROM ph),
            pwx AS (
                SELECT phrase, unnest(regexp_split_to_array(phrase, ' ')) AS w
                FROM pt),
            scored AS (
                SELECT phrase,
                       CAST(CAST(sum(CAST(round(CAST(deg AS DOUBLE) / freq, 9)
                            AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS DOUBLE)
                         AS score
                FROM pwx JOIN ws USING (w) GROUP BY phrase),
            cnt AS (SELECT phrase, count(*) AS n_occurrences
                    FROM ph GROUP BY phrase)
            SELECT s.phrase, c.n_occurrences, round(s.score, 6) AS score
            FROM scored s JOIN cnt c USING (phrase)
            ORDER BY score DESC, phrase LIMIT 25
        """,
        "doc_kneser_ney": f"""
            WITH t AS (
                SELECT {_LTOKENS} AS a FROM documents
                WHERE length(trim(text)) > 0),
            prs AS (
                SELECT unnest(list_transform(range(2, len(a) + 1),
                              i -> struct_pack(w1 := a[i - 1], w2 := a[i]))) AS p
                FROM t WHERE len(a) >= 2),
            pairs AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM prs),
            types AS (SELECT w1, w2, count(*) AS nb FROM pairs GROUP BY w1, w2),
            c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
            nf AS (SELECT w1, count(*) AS nf FROM types GROUP BY w1),
            np AS (SELECT w2, count(*) AS np FROM types GROUP BY w2),
            nt AS (SELECT count(*) AS nt FROM types)
            SELECT t.w1, t.w2, t.nb AS n_bigram,
                   round(greatest(t.nb - 0.75, 0.0) / c1.c1
                         + ((0.75 * nf.nf) / c1.c1)
                           * (np.np / CAST(nt.nt AS DOUBLE)), 9) AS p_kn
            FROM types t
            JOIN c1 USING (w1) JOIN nf USING (w1) JOIN np USING (w2)
            CROSS JOIN nt
            ORDER BY p_kn DESC, w1, w2 LIMIT 20
        """,
        "doc_minhash_calibration": _minhash_calibration_oracle(
            num_hashes=32, bands=8, k=5, max_bucket=2000),
        "doc_ipf_balance": """
            WITH cells AS (
                SELECT lang AS row_key, source AS col_key, count(*) AS n
                FROM documents GROUP BY 1, 2),
            t AS (
                SELECT CAST(sum(n) AS DOUBLE) / count(DISTINCT row_key) AS rt,
                       CAST(sum(n) AS DOUBLE) / count(DISTINCT col_key) AS ct
                FROM cells),
            rm1 AS (
                SELECT row_key,
                       CAST(CAST(sum(CAST(round(n * 1.0, 9) AS DECIMAL(24,9)))
                            AS DECIMAL(38,9)) AS DOUBLE) AS rm
                FROM cells GROUP BY row_key),
            c1 AS (
                SELECT c.row_key, c.col_key, c.n,
                       round(1.0 * (t.rt / r.rm), 9) AS weight
                FROM cells c JOIN rm1 r USING (row_key) CROSS JOIN t),
            cm1 AS (
                SELECT col_key,
                       CAST(CAST(sum(CAST(round(n * weight, 9) AS DECIMAL(24,9)))
                            AS DECIMAL(38,9)) AS DOUBLE) AS cm
                FROM c1 GROUP BY col_key),
            c2 AS (
                SELECT c.row_key, c.col_key, c.n,
                       round(c.weight * (t.ct / m.cm), 9) AS weight
                FROM c1 c JOIN cm1 m USING (col_key) CROSS JOIN t),
            rm2 AS (
                SELECT row_key,
                       CAST(CAST(sum(CAST(round(n * weight, 9) AS DECIMAL(24,9)))
                            AS DECIMAL(38,9)) AS DOUBLE) AS rm
                FROM c2 GROUP BY row_key),
            c3 AS (
                SELECT c.row_key, c.col_key, c.n,
                       round(c.weight * (t.rt / r.rm), 9) AS weight
                FROM c2 c JOIN rm2 r USING (row_key) CROSS JOIN t),
            cm2 AS (
                SELECT col_key,
                       CAST(CAST(sum(CAST(round(n * weight, 9) AS DECIMAL(24,9)))
                            AS DECIMAL(38,9)) AS DOUBLE) AS cm
                FROM c3 GROUP BY col_key),
            c4 AS (
                SELECT c.row_key, c.col_key, c.n,
                       round(c.weight * (t.ct / m.cm), 9) AS weight
                FROM c3 c JOIN cm2 m USING (col_key) CROSS JOIN t)
            SELECT row_key, col_key, n, weight,
                   round(n * weight, 6) AS weighted_n
            FROM c4 ORDER BY row_key, col_key
        """,
        "embedding_whiten": """
            WITH e AS (
                SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings),
            m AS (SELECT dim, round(avg(x * x) - avg(x) * avg(x), 9) AS var
                  FROM e WHERE dim < 16 GROUP BY dim),
            t AS (SELECT round(CAST(sum(CAST(var AS DECIMAL(20,9))) AS DOUBLE), 6)
                         AS trace FROM m),
            n AS (SELECT count(*) AS n_vectors FROM embeddings)
            SELECT n.n_vectors, t.trace,
                   TRUE AS unit_variance,
                   TRUE AS zero_mean,
                   TRUE AS decorrelated,
                   TRUE AS evals_positive
            FROM n, t
        """,
        "embedding_jl_projection": """
            WITH grid AS (
                SELECT i.range AS i, j.range AS j,
                       md5('jl:42:' || i.range || ':' || j.range) AS h
                FROM range(64) i, range(16) j),
            r AS (
                SELECT i, j,
                       sqrt(-2.0 * ln((('0x' || substring(h, 1, 13))::BIGINT + 0.5)
                                      / 4503599627370496.0))
                       * cos(2.0 * 3.141592653589793
                             * ((('0x' || substring(h, 14, 13))::BIGINT + 0.5)
                                / 4503599627370496.0)) AS g
                FROM grid),
            rmat AS (SELECT j, list(g ORDER BY i) AS col FROM r GROUP BY j),
            emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
            proj AS (
                SELECT e.vec_id, m.j,
                       list_reduce(list_transform(list_zip(e.v, m.col),
                                   s -> s[1] * s[2]), (x, y) -> x + y)
                         * 0.25 AS y
                FROM emb e CROSS JOIN rmat m),
            pv AS (SELECT vec_id, list(y ORDER BY j) AS py
                   FROM proj GROUP BY vec_id),
            p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
                FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1
                WHERE a.vec_id % 5 = 0),
            d AS (
                SELECT p.id_a, p.id_b,
                       round(sqrt(list_reduce(list_transform(list_zip(p.va, p.vb), s -> (s[1] - s[2]) * (s[1] - s[2])), (x, y) -> x + y)), 6) AS orig_dist,
                       round(sqrt(list_reduce(list_transform(list_zip(pa.py, pb.py), s -> (s[1] - s[2]) * (s[1] - s[2])), (x, y) -> x + y)), 6) AS proj_dist
                FROM p JOIN pv pa ON pa.vec_id = p.id_a
                       JOIN pv pb ON pb.vec_id = p.id_b)
            SELECT id_a, id_b, orig_dist, proj_dist,
                   CASE WHEN orig_dist > 0
                        THEN round(proj_dist / orig_dist, 6) END AS ratio
            FROM d ORDER BY id_a
        """,
        "events_scd2_pit": """
            WITH snaps AS (
                SELECT user_id,
                       CAST(floor((day(ts) - 1) / 10) + 1 AS INT) AS snap,
                       count(*) AS n_ev, max(event_type) AS top_type
                FROM events GROUP BY 1, 2),
            cal AS (
                SELECT snap AS c_snap,
                       CAST(row_number() OVER (ORDER BY snap) AS INT) AS idx
                FROM (SELECT DISTINCT snap FROM snaps)),
            rows_ AS (
                SELECT user_id, n_ev, top_type, snap, idx
                FROM snaps JOIN cal ON snap = c_snap),
            marked AS (
                SELECT *,
                       lag(idx) OVER w AS prev_idx,
                       lag(n_ev) OVER w AS prev_n,
                       lag(top_type) OVER w AS prev_t
                FROM rows_
                WINDOW w AS (PARTITION BY user_id ORDER BY idx)),
            runs_in AS (
                SELECT *,
                       CASE WHEN prev_idx IS NULL OR prev_idx <> idx - 1
                                 OR prev_n <> n_ev OR prev_t <> top_type
                            THEN 1 ELSE 0 END AS chg
                FROM marked),
            numbered AS (
                SELECT *,
                       sum(chg) OVER (PARTITION BY user_id ORDER BY idx
                                      ROWS UNBOUNDED PRECEDING) AS run
                FROM runs_in),
            ver AS (
                SELECT user_id, min(snap) AS valid_from,
                       max(idx) AS max_idx, max(top_type) AS top_type
                FROM numbered GROUP BY user_id, run),
            verx AS (
                SELECT user_id, valid_from, top_type,
                       (SELECT c_snap FROM cal WHERE idx = max_idx + 1)
                         AS valid_to
                FROM ver),
            facts AS (
                SELECT user_id,
                       CAST(floor((day(ts) - 1) / 10) + 1 AS INT) AS snap,
                       count(*) AS n_purchases
                FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
            pit AS (
                SELECT f.snap, v.top_type AS version_top_type,
                       f.n_purchases
                FROM facts f JOIN verx v
                  ON f.user_id = v.user_id
                 AND v.valid_from <= f.snap
                 AND (v.valid_to IS NULL OR f.snap < v.valid_to))
            SELECT snap, version_top_type,
                   CAST(sum(n_purchases) AS BIGINT) AS n_purchases,
                   count(*) AS n_users
            FROM pit GROUP BY 1, 2 ORDER BY snap, version_top_type
        """,
        "doc_contrastive_pairs": """
            WITH nrm AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
                FROM documents),
            tk AS (SELECT doc_id, string_split(nt, ' ') AS t
                   FROM nrm WHERE nt <> ''),
            chunks AS (
                SELECT doc_id,
                       CAST(s.start // 32 AS INT) AS chunk_id,
                       array_to_string(list_slice(t, s.start + 1, s.start + 32),
                                       ' ') AS chunk_text
                FROM tk, unnest(range(0, len(t), 32)) AS s(start)),
            pairs AS (
                SELECT a.doc_id, a.chunk_id AS chunk_a, b.chunk_id AS chunk_b,
                       a.chunk_text AS anchor, b.chunk_text AS positive
                FROM chunks a JOIN chunks b
                  ON a.doc_id = b.doc_id AND b.chunk_id = a.chunk_id + 1),
            dwc AS (SELECT DISTINCT doc_id FROM chunks),
            nxt AS (
                SELECT doc_id,
                       COALESCE(lead(doc_id) OVER (ORDER BY doc_id),
                                first_value(doc_id) OVER (ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND UNBOUNDED FOLLOWING))
                         AS negative_doc
                FROM dwc),
            firsts AS (
                SELECT doc_id AS negative_doc, chunk_text AS negative
                FROM chunks WHERE chunk_id = 0)
            SELECT p.doc_id, p.chunk_a, p.chunk_b, p.anchor, p.positive,
                   n.negative_doc, f.negative
            FROM pairs p
            JOIN nxt n ON p.doc_id = n.doc_id
            JOIN firsts f ON n.negative_doc = f.negative_doc
            ORDER BY p.doc_id, p.chunk_a
        """,
        "doc_ngram_novelty": """
            WITH nrm AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
                FROM documents),
            tk AS (SELECT doc_id,
                          CASE WHEN length(nt) = 0 THEN []::VARCHAR[]
                               ELSE regexp_split_to_array(nt, ' ') END AS t
                   FROM nrm),
            g AS (SELECT DISTINCT doc_id,
                         array_to_string(list_slice(t, i, i + 7), ' ') AS gram
                  FROM tk,
                       unnest(generate_series(1, greatest(len(t) - 7, 1)))
                         AS s(i)
                  WHERE len(t) > 0),
            fo AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
            SELECT g.doc_id,
                   count(*) AS n_grams,
                   CAST(sum(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel,
                   round(CAST(sum(CASE WHEN fo.first_doc = g.doc_id
                                       THEN 1 ELSE 0 END) AS BIGINT)
                         / CAST(count(*) AS DOUBLE), 6) AS novel_frac
            FROM g JOIN fo ON g.gram = fo.gram
            GROUP BY g.doc_id ORDER BY g.doc_id
        """,
        "corpus_vocab_growth": f"""
            WITH ranked AS (
                SELECT doc_id, {_LTOKENS} AS t,
                       ntile(10) OVER (ORDER BY doc_id) AS bucket
                FROM documents),
            tok AS (
                SELECT bucket, unnest(t) AS w
                FROM ranked WHERE length(trim(array_to_string(t, ''))) >= 0),
            tok2 AS (SELECT bucket, md5(w) AS h FROM tok WHERE w IS NOT NULL
                     AND w <> ''),
            pbt AS (SELECT bucket, count(*) AS ntok FROM tok2 GROUP BY bucket),
            fb AS (SELECT h, min(bucket) AS fbk FROM tok2 GROUP BY h),
            nv AS (SELECT fbk AS bucket, count(*) AS nvv FROM fb GROUP BY fbk),
            cum AS (
                SELECT p.bucket,
                       CAST(sum(p.ntok) OVER (ORDER BY p.bucket
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
                       CAST(sum(COALESCE(n.nvv, 0)) OVER (ORDER BY p.bucket
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
                FROM pbt p LEFT JOIN nv n ON p.bucket = n.bucket)
            SELECT bucket, cum_tokens, cum_vocab,
                   round(cum_vocab / CAST(cum_tokens AS DOUBLE), 9)
                     AS vocab_per_token
            FROM cum ORDER BY bucket
        """,
        # fertility: byte/char/token counts + ratios, all map-side exprs
        "doc_fertility": """
            WITH c AS (
                SELECT doc_id,
                       CAST(strlen(text) AS INT) AS nb,
                       CAST(length(text) AS INT) AS nc,
                       (CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) END) AS nw,
                       CAST(len(list_filter(
                           regexp_extract_all(text,
                               '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+|\\s+'),
                           x -> regexp_matches(x, '\\S'))) AS INT) AS ns
                FROM documents)
            SELECT doc_id, nb AS n_bytes, nc AS n_chars, nw AS n_ws_tokens,
                   ns AS n_subword_tokens,
                   CASE WHEN nw > 0 THEN round(CAST(ns AS DOUBLE) / nw, 6) END AS fertility,
                   CASE WHEN ns > 0 THEN round(CAST(nb AS DOUBLE) / ns, 6) END AS bytes_per_subword
            FROM c ORDER BY doc_id
        """,
        # encoding QC over the injected-damage variant; keep-only regex counts
        "doc_encoding_quality": """
            WITH t2 AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN text || ' Ã© â€™ �'
                            WHEN doc_id % 11 = 0 THEN text || chr(7)
                            ELSE text END AS t
                FROM documents),
            c AS (
                SELECT doc_id, length(t) AS n,
                       CAST(length(t) - length(replace(t, '�', '')) AS INT) AS nr,
                       CAST(length(regexp_replace(t,
                           '[^\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')) AS INT) AS nc,
                       CAST(len(regexp_extract_all(t,
                           'Ã[©¨¤¶¼± ]|â€[™œ”“–—]|Â[ °£]')) AS INT) AS nm,
                       CAST(length(regexp_replace(t, '[\\x00-\\x7f]', '', 'g')) AS INT) AS na
                FROM t2)
            SELECT doc_id, nr AS n_replacement, nc AS n_control, nm AS n_mojibake,
                   na AS n_non_ascii,
                   CASE WHEN n = 0 THEN 0.0
                        ELSE round(CAST(na AS DOUBLE) / n, 6) END AS non_ascii_ratio,
                   (nr = 0 AND nc = 0 AND nm = 0) AS is_clean
            FROM c ORDER BY doc_id
        """,
        # script census over the injected-snippet variant; literal ranges
        "doc_script_profile": """
            WITH t2 AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0 THEN text || ' привет'
                            WHEN doc_id % 6 = 0 THEN text || ' 你好 123'
                            WHEN doc_id % 9 = 0 THEN text || ' مرحبا Ελλάδα 한국'
                            ELSE text END AS t
                FROM documents),
            c AS (
                SELECT doc_id, length(t) AS n,
                       CAST(length(regexp_replace(t, '[^A-Za-z]', '', 'g')) AS INT) AS nl,
                       CAST(length(regexp_replace(t, '[^0-9]', '', 'g')) AS INT) AS nd,
                       CAST(length(regexp_replace(t, '[^Ѐ-ӿ]', '', 'g')) AS INT) AS ncy,
                       CAST(length(regexp_replace(t, '[^Ͱ-Ͽ]', '', 'g')) AS INT) AS ngr,
                       CAST(length(regexp_replace(t, '[^一-鿿]', '', 'g')) AS INT) AS ncj,
                       CAST(length(regexp_replace(t, '[^؀-ۿ]', '', 'g')) AS INT) AS nar,
                       CAST(length(regexp_replace(t, '[^가-힯]', '', 'g')) AS INT) AS nha
                FROM t2),
            g AS (SELECT *, greatest(nl, nd, ncy, ngr, ncj, nar, nha) AS best FROM c)
            SELECT doc_id, nl AS n_latin, nd AS n_digit, ncy AS n_cyrillic,
                   ngr AS n_greek, ncj AS n_cjk, nar AS n_arabic, nha AS n_hangul,
                   CASE WHEN best = 0 THEN 'none'
                        WHEN nl = best THEN 'latin'
                        WHEN nd = best THEN 'digit'
                        WHEN ncy = best THEN 'cyrillic'
                        WHEN ngr = best THEN 'greek'
                        WHEN ncj = best THEN 'cjk'
                        WHEN nar = best THEN 'arabic'
                        ELSE 'hangul' END AS dominant,
                   CASE WHEN n = 0 THEN 0.0
                        ELSE round(CAST(best AS DOUBLE) / n, 6) END AS dominant_ratio
            FROM g ORDER BY doc_id
        """,
        # token-length PSI per source vs src0; add-one smoothing, 9dp
        # DECIMAL-summed terms (the embedding_psi discipline)
        "doc_length_drift": """
            WITH d0 AS (
                SELECT source AS grp,
                       least(CAST(floor(CAST(ntok AS DOUBLE) / 64) AS INT), 9) AS bin
                FROM (SELECT source,
                             (CASE WHEN length(trim(text)) = 0 THEN 0
                                   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS ntok
                      FROM documents)),
            counts AS (SELECT grp, bin, count(*) AS c FROM d0 GROUP BY 1, 2),
            tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1),
            grid AS (SELECT grp, n, unnest(generate_series(0, 9)) AS bin FROM tot),
            fullg AS (SELECT g.grp, g.n, g.bin, coalesce(c.c, 0) AS c
                      FROM grid g LEFT JOIN counts c ON c.grp = g.grp AND c.bin = g.bin),
            ref AS (SELECT bin, c AS cr, n AS nr FROM fullg WHERE grp = 'src0'),
            terms AS (
                SELECT f.grp, f.n, r.nr,
                       CAST(round(((r.cr + 1.0) / (r.nr + 10) - (f.c + 1.0) / (f.n + 10))
                                  * ln(((r.cr + 1.0) / (r.nr + 10))
                                       / ((f.c + 1.0) / (f.n + 10))), 9)
                            AS DECIMAL(20,9)) AS term
                FROM fullg f JOIN ref r USING (bin))
            SELECT grp, round(CAST(CAST(sum(term) AS DECIMAL(38,9)) AS DOUBLE), 6) AS psi,
                   CAST(max(n) AS BIGINT) AS n_docs,
                   CAST(max(nr) AS BIGINT) AS n_reference
            FROM terms GROUP BY grp ORDER BY grp
        """,
        # bloom decontamination: KM double hashing over md5-uint52 prefixes,
        # m=8192 k=2; bloom hit = both positions in the test-set bit set
        "doc_bloom_decontaminate": """
            WITH tr AS (
                SELECT doc_id AS id, text FROM documents WHERE doc_id % 101 <> 0
                UNION ALL
                SELECT doc_id + 1000000 AS id, text FROM documents WHERE doc_id % 101 = 0),
            g_tr AS (
                SELECT DISTINCT id, array_to_string(w[i:i+12], ' ') AS gram
                FROM (SELECT id, w, unnest(generate_series(1, greatest(len(w) - 12, 1))) AS i
                      FROM (SELECT id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
                            FROM tr
                            WHERE length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) > 0))
                WHERE length(array_to_string(w[i:i+12], ' ')) > 0),
            te_g AS (
                SELECT DISTINCT array_to_string(w[i:i+12], ' ') AS gram
                FROM (SELECT w, unnest(generate_series(1, greatest(len(w) - 12, 1))) AS i
                      FROM (SELECT string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
                            FROM documents
                            WHERE doc_id % 101 = 0
                              AND length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) > 0))
                WHERE length(array_to_string(w[i:i+12], ' ')) > 0),
            pos AS (
                SELECT DISTINCT (h1 + i * (2 * h2 + 1)) % 8192 AS p
                FROM (SELECT ('0x' || substring(md5(gram), 1, 13))::BIGINT AS h1,
                             ('0x' || substring(md5(gram), 14, 13))::BIGINT AS h2
                      FROM te_g),
                     (SELECT unnest(generate_series(0, 1)) AS i)),
            trpos AS (
                SELECT id, gram, (h1 + i * (2 * h2 + 1)) % 8192 AS p
                FROM (SELECT id, gram,
                             ('0x' || substring(md5(gram), 1, 13))::BIGINT AS h1,
                             ('0x' || substring(md5(gram), 14, 13))::BIGINT AS h2
                      FROM g_tr),
                     (SELECT unnest(generate_series(0, 1)) AS i)),
            bl AS (SELECT id, gram FROM trpos JOIN pos USING (p)
                   GROUP BY id, gram HAVING count(*) = 2),
            perdoc AS (
                SELECT t.id,
                       coalesce(gc.n_grams, 0) AS n_grams,
                       coalesce(bc.n_bloom, 0) AS n_bloom,
                       coalesce(ec.n_exact, 0) AS n_exact
                FROM (SELECT id FROM tr) t
                LEFT JOIN (SELECT id, count(*) AS n_grams FROM g_tr GROUP BY id) gc USING (id)
                LEFT JOIN (SELECT id, count(*) AS n_bloom FROM bl GROUP BY id) bc USING (id)
                LEFT JOIN (SELECT id, count(*) AS n_exact
                           FROM g_tr WHERE gram IN (SELECT gram FROM te_g)
                           GROUP BY id) ec USING (id))
            SELECT id, CAST(n_grams AS INT) AS n_grams,
                   CAST(n_bloom AS INT) AS n_bloom_hits,
                   n_bloom > 0 AS bloom_flagged,
                   CAST(n_exact AS INT) AS n_exact_hits,
                   n_exact > 0 AS contaminated,
                   (n_bloom > 0 AND n_exact = 0) AS false_positive
            FROM perdoc ORDER BY id
        """,
        # CMS audit: 4x1024 sketch rebuilt in SQL; estimate = min over rows
        "corpus_cms_heavy_hitters": """
            WITH nrm AS (SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                         FROM documents),
            tok AS (SELECT unnest(string_split(t, ' ')) AS token
                    FROM nrm WHERE length(t) > 0),
            tk AS (SELECT token FROM tok WHERE length(token) > 0),
            ds AS (SELECT unnest(generate_series(0, 3)) AS d),
            cells AS (
                SELECT d,
                       ('0x' || substring(md5(CAST(d AS VARCHAR) || ':' || token), 1, 13))::BIGINT % 1024 AS pos,
                       count(*) AS cnt
                FROM tk, ds GROUP BY 1, 2),
            exact AS (SELECT token, count(*) AS exact_n FROM tk GROUP BY token
                      ORDER BY exact_n DESC, token LIMIT 20),
            est AS (
                SELECT e.token, e.exact_n, min(c.cnt) AS cms_est
                FROM exact e
                CROSS JOIN ds
                JOIN cells c
                  ON c.d = ds.d
                 AND c.pos = ('0x' || substring(md5(CAST(ds.d AS VARCHAR) || ':' || e.token), 1, 13))::BIGINT % 1024
                GROUP BY e.token, e.exact_n)
            SELECT token, exact_n, CAST(cms_est AS BIGINT) AS cms_est,
                   CAST(cms_est - exact_n AS BIGINT) AS overestimate
            FROM est ORDER BY exact_n DESC, token
        """,
        # simplified silhouette: 9dp DECIMAL centroids, knn-convention
        # |x|^2-2xc+|c|^2 distances, 6dp per-row values, DECIMAL means
        "embedding_silhouette": """
            WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                       FROM embeddings),
            ex AS (SELECT label,
                          CAST(generate_subscripts(e, 1) - 1 AS INT) AS dim,
                          CAST(round(unnest(e), 9) AS DECIMAL(20,9)) AS t
                   FROM v),
            cd AS (SELECT label, dim,
                          round(CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE)
                                / count(*), 9) AS m
                   FROM ex GROUP BY 1, 2),
            cent AS (SELECT label AS c_label, list(m ORDER BY dim) AS c
                     FROM cd GROUP BY 1),
            p AS (SELECT v.vec_id, v.label, cent.c_label,
                         sqrt(greatest(0.0,
                              list_inner_product(v.e, v.e)
                              - 2 * list_inner_product(v.e, cent.c)
                              + list_inner_product(cent.c, cent.c))) AS d
                  FROM v CROSS JOIN cent),
            pv AS (SELECT vec_id, label,
                          round(min(CASE WHEN c_label = label THEN d END), 6) AS a,
                          round(min(CASE WHEN c_label <> label THEN d END), 6) AS b
                   FROM p GROUP BY 1, 2),
            s AS (SELECT label, a, b,
                         CASE WHEN greatest(a, b) > 0
                              THEN round((b - a) / greatest(a, b), 6)
                              ELSE 0.0 END AS sil
                  FROM pv)
            SELECT label, count(*) AS n_vectors,
                   round(CAST(CAST(sum(CAST(a AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS DOUBLE) / count(*), 6) AS mean_a,
                   round(CAST(CAST(sum(CAST(b AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS DOUBLE) / count(*), 6) AS mean_b,
                   round(CAST(CAST(sum(CAST(sil AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS DOUBLE) / count(*), 6) AS mean_silhouette
            FROM s GROUP BY label ORDER BY label
        """,
        # T5 span corruption: the md5 start/length draws, bounded-frame
        # reach window, and sentinel numbering all replayed in SQL
        "doc_span_corruption": f"""
            WITH tok AS (
                SELECT doc_id AS id,
                       CAST(generate_subscripts(w, 1) - 1 AS INT) AS pos,
                       unnest(w) AS tok
                FROM (SELECT doc_id,
                             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
                      FROM documents
                      WHERE length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) > 0)),
            m AS (
                SELECT id, pos, tok,
                       (('0x' || substring(md5(CAST(id AS VARCHAR) || ':' || CAST(pos AS VARCHAR) || ':42'), 1, 13))::BIGINT
                        < {int(0.15 / 3 * (1 << 52))}) AS start,
                       CAST(1 + (('0x' || substring(md5(CAST(id AS VARCHAR) || ':' || CAST(pos AS VARCHAR) || ':42'), 14, 13))::BIGINT % 5) AS INT) AS len
                FROM tok WHERE length(tok) > 0),
            r AS (
                SELECT *, max(CASE WHEN start THEN pos + len END)
                          OVER (PARTITION BY id ORDER BY pos
                                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS reach
                FROM m),
            f AS (SELECT *, coalesce(reach, -1) > pos AS masked FROM r),
            g AS (SELECT *, masked AND NOT coalesce(
                                lag(masked) OVER (PARTITION BY id ORDER BY pos),
                                FALSE) AS span_start
                  FROM f),
            s AS (SELECT *, CAST(sum(CASE WHEN span_start THEN 1 ELSE 0 END)
                                 OVER (PARTITION BY id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) - 1 AS INT) AS span_id
                  FROM g),
            p AS (
                SELECT id, pos, masked, span_start,
                       CASE WHEN span_start THEN '<extra_id_' || span_id || '>'
                            WHEN NOT masked THEN tok END AS in_piece,
                       CASE WHEN span_start THEN '<extra_id_' || span_id || '>' || ' ' || tok
                            WHEN masked THEN tok END AS tgt_piece
                FROM s)
            SELECT id, count(*) AS n_tokens,
                   CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS INT) AS n_masked,
                   CAST(sum(CASE WHEN span_start THEN 1 ELSE 0 END) AS INT) AS n_spans,
                   coalesce(array_to_string(list_filter(list(in_piece ORDER BY pos),
                                               x -> x IS NOT NULL), ' '), '') AS corrupted,
                   coalesce(array_to_string(list_filter(list(tgt_piece ORDER BY pos),
                                               x -> x IS NOT NULL), ' '), '') AS target
            FROM p GROUP BY id ORDER BY id
        """,
        # hubness: full-rank cosine 10-NN occurrence counts, anti-hubs = 0
        "embedding_hubness": """
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            pairs AS (
                SELECT q.vec_id AS qid, b.vec_id AS bid,
                       1 - list_inner_product(q.e, b.e)
                           / (sqrt(list_inner_product(q.e, q.e))
                              * sqrt(list_inner_product(b.e, b.e))) AS dist
                FROM v q CROSS JOIN v b WHERE q.vec_id <> b.vec_id),
            rk AS (SELECT qid, bid,
                          row_number() OVER (PARTITION BY qid ORDER BY dist ASC, bid ASC) AS rn
                   FROM pairs),
            occ AS (SELECT bid AS id, CAST(count(*) AS INT) AS k_occurrence
                    FROM rk WHERE rn <= 10 GROUP BY 1)
            SELECT v.vec_id AS id, coalesce(o.k_occurrence, 0) AS k_occurrence
            FROM v LEFT JOIN occ o ON o.id = v.vec_id ORDER BY id
        """,
        # source similarity: tf-idf weights on md5-16 token keys, DECIMAL
        # dot/norm sums, dynamic slice count
        "corpus_source_similarity": """
            WITH tk AS (
                SELECT source AS grp, substring(md5(w), 1, 16) AS h
                FROM (SELECT source, unnest(string_split(nrm, ' ')) AS w
                      FROM (SELECT source,
                                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nrm
                            FROM documents)
                      WHERE length(nrm) > 0)
                WHERE length(w) > 0),
            tf AS (SELECT grp, h, count(*) AS tf FROM tk GROUP BY 1, 2),
            dfq AS (SELECT h, count(*) AS dft FROM tf GROUP BY 1),
            wts AS (
                SELECT grp, h,
                       round(CAST(tf AS DOUBLE)
                             * ln((SELECT CAST(count(DISTINCT source) AS DOUBLE)
                                   FROM documents) / dft), 9) AS w
                FROM tf JOIN dfq USING (h)),
            nrm2 AS (SELECT grp,
                            sqrt(CAST(CAST(sum(CAST(round(w * w, 9) AS DECIMAL(28,9)))
                                           AS DECIMAL(38,9)) AS DOUBLE)) AS nrm
                     FROM wts GROUP BY 1),
            dots AS (
                SELECT a.grp AS source_a, b.grp AS source_b,
                       CAST(CAST(sum(CAST(round(a.w * b.w, 9) AS DECIMAL(28,9)))
                                 AS DECIMAL(38,9)) AS DOUBLE) AS dot
                FROM wts a JOIN wts b ON a.h = b.h AND a.grp < b.grp
                GROUP BY 1, 2)
            SELECT na.grp AS source_a, nb.grp AS source_b,
                   CASE WHEN na.nrm > 0 AND nb.nrm > 0 AND dot IS NOT NULL
                        THEN round(dot / (na.nrm * nb.nrm), 6)
                        ELSE 0.0 END AS cosine
            FROM nrm2 na
            CROSS JOIN nrm2 nb
            LEFT JOIN dots ON dots.source_a = na.grp AND dots.source_b = nb.grp
            WHERE na.grp < nb.grp
            ORDER BY source_a, source_b
        """,
        # robust scaling: quantile_cont == Spark interpolated percentile
        "embedding_robust_scale": """
            WITH ex AS (
                SELECT vec_id AS id,
                       CAST(generate_subscripts(e, 1) - 1 AS INT) AS dim,
                       unnest(e) AS v
                FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
            st AS (SELECT dim,
                          quantile_cont(v, 0.5) AS med,
                          quantile_cont(v, 0.25) AS q1,
                          quantile_cont(v, 0.75) AS q3
                   FROM ex GROUP BY dim)
            SELECT id, dim,
                   CASE WHEN q3 > q1 THEN round((v - med) / (q3 - q1), 6) END AS z
            FROM ex JOIN st USING (dim) ORDER BY id, dim
        """,
        # boilerplate prefixes: first-5-token line openings, distinct-doc
        # spread, deterministic (n_docs DESC, prefix) top-50
        "doc_boilerplate_prefixes": """
            WITH ln_ AS (
                SELECT doc_id AS id, trim(l) AS line
                FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                      FROM documents)
                WHERE length(trim(l)) > 0),
            pl AS (
                SELECT id,
                       array_to_string(
                           (string_split(trim(regexp_replace(lower(line), '\\s+', ' ', 'g')), ' '))[1:5],
                           ' ') AS prefix
                FROM ln_),
            pd AS (SELECT id, prefix, count(*) AS n
                   FROM pl WHERE length(prefix) > 0 GROUP BY 1, 2),
            ag AS (SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(sum(n) AS BIGINT) AS n_lines
                   FROM pd GROUP BY 1)
            SELECT prefix, n_docs, n_lines FROM ag
            WHERE n_docs >= 2 ORDER BY n_docs DESC, prefix LIMIT 50
        """,
        # exact ROC-AUC by rank-sum: per-score collapse, tie-averaged ranks
        "doc_quality_auc": f"""
            WITH sc AS (SELECT {_QUALITY6} AS s,
                               CAST(n_chars >= 400 AS INT) AS y
                        FROM documents),
            g AS (SELECT s, count(*) AS n, sum(y) AS np FROM sc GROUP BY s),
            r AS (SELECT n, np,
                         coalesce(sum(n) OVER (ORDER BY s
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                              0) AS bef
                  FROM g)
            SELECT CAST(sum(np) AS BIGINT) AS n_pos,
                   CAST(sum(n) - sum(np) AS BIGINT) AS n_neg,
                   round((sum(np * (bef + (n + 1) / 2.0))
                          - (sum(np) * (sum(np) + 1)) / 2.0)
                         / (sum(np) * (sum(n) - sum(np))), 6) AS auc
            FROM r
        """,
        # reliability diagram: fixed [0,1] bins, DECIMAL mean score
        "doc_score_calibration": f"""
            WITH sc AS (SELECT {_QUALITY6} AS s,
                               CAST(n_chars >= 400 AS INT) AS y
                        FROM documents),
            b AS (SELECT least(greatest(CAST(floor((s - 0.0) / 0.1) AS INT), 0), 9) AS bin,
                         s, y
                  FROM sc)
            SELECT bin, count(*) AS n,
                   round(CAST(CAST(sum(CAST(round(s, 9) AS DECIMAL(20,9)))
                              AS DECIMAL(38,9)) AS DOUBLE) / count(*), 6) AS mean_score,
                   round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS positive_rate
            FROM b GROUP BY bin ORDER BY bin
        """,
        # Cohen's kappa from the 2x2 table; NULL when both filters constant
        "doc_filter_agreement": f"""
            WITH f AS (SELECT CAST({_QUALITY6} >= 0.5 AS INT) AS a,
                              CAST(n_chars >= 400 AS INT) AS b
                       FROM documents),
            c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(a * b) AS BIGINT) AS n11,
                         CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
                         CAST(sum((1 - a) * b) AS BIGINT) AS n01,
                         CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
                  FROM f),
            k AS (SELECT n, n11, n10, n01, n00,
                         (n11 + n00) / CAST(n AS DOUBLE) AS po,
                         ((n11 + n10) / CAST(n AS DOUBLE)) * ((n11 + n01) / CAST(n AS DOUBLE))
                         + ((n01 + n00) / CAST(n AS DOUBLE)) * ((n10 + n00) / CAST(n AS DOUBLE)) AS pe
                  FROM c)
            SELECT n, n11, n10, n01, n00,
                   round(po, 6) AS agreement,
                   CASE WHEN pe < 1.0 THEN round((po - pe) / (1 - pe), 6) END AS kappa
            FROM k
        """,
        # mutual 10-NN: directed top-10 edges self-joined on the reversed key
        "embedding_mutual_knn": f"""
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            pairs AS (
                SELECT q.vec_id AS qid, b.vec_id AS bid, {_COS_DIST} AS dist
                FROM v q CROSS JOIN v b WHERE q.vec_id <> b.vec_id),
            rk AS (SELECT qid, bid, dist,
                          row_number() OVER (PARTITION BY qid ORDER BY dist ASC, bid ASC) AS rn
                   FROM pairs),
            e AS (SELECT qid, bid, dist FROM rk WHERE rn <= 10)
            SELECT a.qid AS id_a, a.bid AS id_b, round(a.dist, 6) AS distance
            FROM e a JOIN e b ON a.qid = b.bid AND a.bid = b.qid AND a.qid < a.bid
            ORDER BY id_a, id_b
        """,
        # cross-corpus near dups: banding over the tagged union, cross-side
        # filter, exact Jaccard verify at 0.5
        "doc_cross_corpus_near_dups": f"""
            WITH {_minhash_ctes(32, 8, 5, 2000, source=_CROSS_SRC)},
            cand AS (
                SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
                FROM capped a JOIN capped b
                  ON a.band = b.band AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id),
            sided AS (
                SELECT x, y,
                       CASE WHEN x >= 1000000 OR x % 2 = 1 THEN 1 ELSE 0 END AS sx,
                       CASE WHEN y >= 1000000 OR y % 2 = 1 THEN 1 ELSE 0 END AS sy
                FROM cand),
            crossp AS (
                SELECT DISTINCT CASE WHEN sx = 0 THEN x ELSE y END AS id_a,
                                CASE WHEN sx = 0 THEN y ELSE x END AS id_b
                FROM sided WHERE sx <> sy),
            sets AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, greatest(length(t) - 4, 1) + 1),
                           i -> substring(t, CAST(i AS INT), 5))) AS g
                FROM nrm),
            ver AS (
                SELECT c.id_a, c.id_b,
                       CAST(len(list_intersect(sa.g, sb.g)) AS DOUBLE)
                       / len(list_distinct(list_concat(sa.g, sb.g))) AS j
                FROM crossp c
                JOIN sets sa ON sa.doc_id = c.id_a
                JOIN sets sb ON sb.doc_id = c.id_b)
            SELECT id_a, id_b, round(j, 6) AS jaccard
            FROM ver WHERE j >= 0.5 ORDER BY id_a, id_b
        """,
        # Theil-Sen: median pairwise slope + median residual, quantile_cont
        "events_theil_sen": """
            WITH daily AS (
                SELECT event_type AS g,
                       CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS DOUBLE) AS x,
                       CAST(count(*) AS DOUBLE) AS y
                FROM events GROUP BY 1, CAST(ts AS DATE)),
            sl AS (SELECT a.g, (b.y - a.y) / (b.x - a.x) AS sl
                   FROM daily a JOIN daily b ON a.g = b.g AND a.x < b.x),
            ms AS (SELECT g, quantile_cont(sl, 0.5) AS slope FROM sl GROUP BY g),
            np AS (SELECT g, count(*) AS n_points FROM daily GROUP BY g),
            mi AS (SELECT d.g, quantile_cont(d.y - ms.slope * d.x, 0.5) AS intercept
                   FROM daily d JOIN ms ON ms.g = d.g GROUP BY d.g)
            SELECT np.g AS event_type, CAST(np.n_points AS BIGINT) AS n_points,
                   round(ms.slope, 6) AS slope, round(mi.intercept, 6) AS intercept
            FROM np JOIN ms ON ms.g = np.g JOIN mi ON mi.g = np.g
            ORDER BY event_type
        """,
        # bootstrap CI: md5-seeded draws replayed, DECIMAL replicate means
        "events_bootstrap_ci": """
            WITH daily AS (
                SELECT event_type AS g, CAST(ts AS DATE) AS o,
                       CAST(count(*) AS DOUBLE) AS v
                FROM events GROUP BY 1, 2),
            series AS (
                SELECT g, v,
                       CAST(row_number() OVER (PARTITION BY g ORDER BY o) - 1 AS INT) AS idx
                FROM daily),
            sizes AS (SELECT g, count(*) AS n FROM series GROUP BY g),
            draws AS (
                SELECT s.g, b.b,
                       CAST(('0x' || substring(md5(s.g || ':' || CAST(b.b AS VARCHAR)
                                 || ':' || CAST(i.i AS VARCHAR) || ':42'), 1, 13))::BIGINT
                            % s.n AS INT) AS idx
                FROM sizes s,
                     (SELECT unnest(generate_series(0, 199)) AS b) b,
                     LATERAL (SELECT unnest(generate_series(0, CAST(s.n - 1 AS INT))) AS i) i),
            bm AS (
                SELECT d.g, d.b,
                       CAST(CAST(sum(CAST(round(se.v, 9) AS DECIMAL(24,9)))
                                 AS DECIMAL(38,9)) AS DOUBLE) / count(*) AS m
                FROM draws d JOIN series se ON se.g = d.g AND se.idx = d.idx
                GROUP BY d.g, d.b),
            pt AS (
                SELECT g, CAST(count(*) AS BIGINT) AS n,
                       round(CAST(CAST(sum(CAST(round(v, 9) AS DECIMAL(24,9)))
                                  AS DECIMAL(38,9)) AS DOUBLE) / count(*), 6) AS mean
                FROM series GROUP BY g),
            ci AS (SELECT g, round(quantile_cont(m, 0.025), 6) AS ci_lo,
                          round(quantile_cont(m, 0.975), 6) AS ci_hi
                   FROM bm GROUP BY g)
            SELECT pt.g AS event_type, pt.n, pt.mean, ci.ci_lo, ci.ci_hi
            FROM pt JOIN ci ON ci.g = pt.g ORDER BY event_type
        """,
        # linear CKA: full dim-pair covariance table, three Frobenius blocks
        "embedding_cka": """
            WITH ex AS (
                SELECT vec_id AS rid,
                       CAST(generate_subscripts(e, 1) - 1 AS INT) AS i,
                       unnest(e) AS v
                FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
            sums AS (
                SELECT a.i AS i, b.i AS j, count(*) AS n,
                       CAST(CAST(sum(CAST(round(a.v * b.v, 9) AS DECIMAL(25,9)))
                                 AS DECIMAL(38,9)) AS DOUBLE) AS sxy
                FROM ex a JOIN ex b ON a.rid = b.rid GROUP BY 1, 2),
            means AS (
                SELECT i, round(CAST(CAST(sum(CAST(round(v, 9) AS DECIMAL(20,9)))
                                AS DECIMAL(38,9)) AS DOUBLE) / count(*), 9) AS mu
                FROM ex GROUP BY i),
            cov AS (
                SELECT s.i, s.j, s.n,
                       round(s.sxy / s.n - mi.mu * mj.mu, 9) AS c
                FROM sums s
                JOIN means mi ON mi.i = s.i
                JOIN means mj ON mj.i = s.j),
            agg AS (
                SELECT max(n) AS n,
                       CAST(CAST(sum(CASE WHEN j < 8
                                 THEN CAST(round(c * c, 12) AS DECIMAL(24,12)) END)
                                 AS DECIMAL(38,12)) AS DOUBLE) AS fxy,
                       CAST(CAST(sum(CAST(round(c * c, 12) AS DECIMAL(24,12)))
                                 AS DECIMAL(38,12)) AS DOUBLE) AS fxx,
                       CAST(CAST(sum(CASE WHEN i < 8 AND j < 8
                                 THEN CAST(round(c * c, 12) AS DECIMAL(24,12)) END)
                                 AS DECIMAL(38,12)) AS DOUBLE) AS fyy
                FROM cov)
            SELECT CAST(64 AS INT) AS d, CAST(8 AS INT) AS m,
                   CAST(n AS BIGINT) AS n,
                   round(fxy / sqrt(fxx * fyy), 6) AS cka
            FROM agg
        """,
        # Laplace-mechanism counts: md5 uniform -> inverse-CDF noise
        "events_dp_counts": """
            WITH c AS (SELECT event_type AS g, count(*) AS n
                       FROM events GROUP BY 1),
            u AS (SELECT g, n,
                         (('0x' || substring(md5(g || ':42'), 1, 13))::BIGINT + 0.5)
                         / 4503599627370496.0 - 0.5 AS uu
                  FROM c),
            z AS (SELECT g, n,
                         -1.0 * sign(uu) * ln(1.0 - 2.0 * abs(uu)) AS noise
                  FROM u)
            SELECT g AS event_type,
                   round(n + noise, 6) AS noisy_count,
                   CAST(n AS BIGINT) AS true_count,
                   round(abs(noise), 6) AS abs_error
            FROM z ORDER BY event_type
        """,
        # ROLLUP subtotals: grouping_id == DuckDB GROUPING bitmask
        "orders_rollup_revenue": """
            SELECT CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid,
                   o_orderpriority, o_orderstatus,
                   count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
            ORDER BY gid, o_orderpriority, o_orderstatus
        """,
        # PII scrub: chained global regexp_replace in redaction order;
        # counts on the previous stage's output (no double counting)
        "doc_pii_redaction": """
            WITH t0 AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 4 = 0 THEN text || ' contact bob@example.com now'
                            WHEN doc_id % 7 = 0 THEN text || ' from 192.168.10.42 today'
                            WHEN doc_id % 5 = 0 THEN text || ' call 555-123-4567'
                            ELSE text END AS t
                FROM documents),
            s1 AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
                       regexp_replace(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '[EMAIL]', 'g') AS t1
                FROM t0),
            s2 AS (
                SELECT doc_id, n_emails,
                       CAST(len(regexp_extract_all(t1,
                           '\\b(?:(?:25[0-5]|2[0-4]\\d|1?\\d?\\d)\\.){3}(?:25[0-5]|2[0-4]\\d|1?\\d?\\d)\\b')) AS INT) AS n_ips,
                       regexp_replace(t1,
                           '\\b(?:(?:25[0-5]|2[0-4]\\d|1?\\d?\\d)\\.){3}(?:25[0-5]|2[0-4]\\d|1?\\d?\\d)\\b',
                           '[IP]', 'g') AS t2
                FROM s1),
            s3 AS (
                SELECT doc_id, n_emails, n_ips,
                       CAST(len(regexp_extract_all(t2,
                           '\\b(?:\\+?\\d{1,3}[-. ])?(?:\\(\\d{2,4}\\)[-. ]?)?\\d{3,4}[-. ]\\d{3,4}(?:[-. ]\\d{2,4})?\\b')) AS INT) AS n_phones,
                       regexp_replace(t2,
                           '\\b(?:\\+?\\d{1,3}[-. ])?(?:\\(\\d{2,4}\\)[-. ]?)?\\d{3,4}[-. ]\\d{3,4}(?:[-. ]\\d{2,4})?\\b',
                           '[PHONE]', 'g') AS redacted
                FROM s2)
            SELECT doc_id, n_emails, n_phones, n_ips, redacted
            FROM s3 ORDER BY doc_id
        """,
        # k-anonymity: equivalence classes below k over the quasi tuple
        "events_k_anonymity": """
            WITH q AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(least(greatest(floor(value / 10), 0), 9) AS INT) AS value_bin
                FROM events)
            SELECT event_type, day, value_bin, count(*) AS n
            FROM q GROUP BY 1, 2, 3 HAVING count(*) < 5
            ORDER BY event_type, day, value_bin
        """,
        # dHash replay without BMP bytes: pixel fn -> exact 2x2 block means
        # (sum/4.0, IEEE-exact quarters) -> 8x9 gradient bits -> all-pairs
        # hamming (small-n audit of the engine's pigeonhole chunk join)
        "media_near_dup_pairs": """
            WITH eff AS (
                SELECT doc_id AS d,
                       CASE WHEN doc_id % 10 = 1 OR doc_id % 20 = 3
                            THEN doc_id - 1 ELSE doc_id END AS de,
                       (doc_id % 20 = 3) AS bump
                FROM documents),
            grid AS (
                SELECT y.y AS y, x.x AS x
                FROM (SELECT unnest(range(16)) AS y) y
                CROSS JOIN (SELECT unnest(range(18)) AS x) x),
            px AS (
                SELECT d, y, x,
                       CASE WHEN bump AND y = 0 AND x = 0
                            THEN least(('0x' || substr(
                                md5('pxr:' || de || ':0'), 1, 2))::INT + 100, 255)
                            ELSE ('0x' || substr(
                                md5('pxr:' || de || ':' || y)
                                || substr(md5('pxr2:' || de || ':' || y), 1, 4),
                                x * 2 + 1, 2))::INT
                       END AS v
                FROM eff CROSS JOIN grid),
            blk AS (
                SELECT d, y // 2 AS r, x // 2 AS c, sum(v) / 4.0 AS m
                FROM px GROUP BY d, y // 2, x // 2),
            bits AS (
                SELECT l.d AS d, l.r * 8 + l.c AS b,
                       CASE WHEN rt.m > l.m THEN 1 ELSE 0 END AS bit
                FROM blk l JOIN blk rt
                  ON rt.d = l.d AND rt.r = l.r AND rt.c = l.c + 1
                WHERE l.c < 8),
            ham AS (
                SELECT p.d AS id_a, q.d AS id_b,
                       CAST(sum(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END)
                            AS INT) AS hamming
                FROM bits p JOIN bits q ON p.b = q.b AND p.d < q.d
                GROUP BY p.d, q.d)
            SELECT id_a, id_b, hamming FROM ham
            WHERE hamming <= 3 ORDER BY id_a, id_b
        """,
        # unigram-LM pinned-invariant gate: seed substring counting is
        # SQL-exact (top-5 multi-char pieces); EM contracts pin TRUE
        "corpus_unigram_lm": f"""
            WITH nrm AS (SELECT {_NORM} AS t FROM documents),
            w AS (SELECT unnest(string_split(t, ' ')) AS word
                  FROM nrm WHERE length(t) > 0),
            v AS (SELECT word, count(*) AS cnt FROM w
                  WHERE word <> '' GROUP BY word),
            s1 AS (SELECT word, cnt,
                          unnest(generate_series(1, length(word) - 1)) AS i
                   FROM v WHERE length(word) >= 2),
            s2 AS (SELECT word, cnt, i,
                          unnest(generate_series(
                              2, least(6, length(word) - i + 1))) AS l
                   FROM s1),
            subs AS (SELECT substring(word, CAST(i AS INT), CAST(l AS INT))
                            AS piece, cnt
                     FROM s2),
            agg AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS seed_freq
                    FROM subs GROUP BY piece)
            SELECT piece, seed_freq,
                   TRUE AS probs_normalized, TRUE AS ll_monotone,
                   TRUE AS singles_retained, TRUE AS vocab_bounded,
                   TRUE AS encode_roundtrip
            FROM agg ORDER BY seed_freq DESC, piece LIMIT 5
        """,
        # leave-one-out 3-NN label accuracy: exact cosine rank (the
        # mutual-knn oracle shape), majority vote, ROLLUP totals
        "embedding_knn_accuracy": f"""
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label
                       FROM embeddings),
            pairs AS (
                SELECT q.vec_id AS qid, q.label AS ql, b.vec_id AS bid,
                       b.label AS bl, {_COS_DIST} AS dist
                FROM v q CROSS JOIN v b WHERE q.vec_id <> b.vec_id),
            rk AS (SELECT qid, ql, bl,
                          row_number() OVER (PARTITION BY qid
                              ORDER BY dist ASC, bid ASC) AS rn
                   FROM pairs),
            nb AS (SELECT qid, ql, bl FROM rk WHERE rn <= 3),
            votes AS (SELECT qid, ql, bl, count(*) AS v
                      FROM nb GROUP BY qid, ql, bl),
            pred AS (SELECT qid, ql, bl AS pred FROM (
                         SELECT *, row_number() OVER (PARTITION BY qid
                             ORDER BY v DESC, bl ASC) AS rv
                         FROM votes) WHERE rv = 1),
            sc AS (SELECT ql AS true_label,
                          CASE WHEN pred = ql THEN 1 ELSE 0 END AS ok
                   FROM pred)
            SELECT CAST(GROUPING(true_label) AS INT) AS gid, true_label,
                   count(*) AS n, CAST(sum(ok) AS BIGINT) AS n_correct,
                   round(CAST(sum(ok) AS DOUBLE) / count(*), 6) AS accuracy
            FROM sc GROUP BY ROLLUP (true_label)
            ORDER BY gid, true_label
        """,
        # purity/NMI over the shared Lloyd assignment CTEs + label join;
        # entropy/MI terms 9dp-rounded and DECIMAL-summed (token_entropy
        # ln discipline)
        "embedding_cluster_purity": f"""
            WITH {_lloyd_assign_ctes(8, 2)},
            lab AS (SELECT vec_id, label FROM embeddings),
            ct AS (SELECT b.cid AS c, l.label AS lbl, count(*) AS nij
                   FROM bf b JOIN lab l USING (vec_id)
                   GROUP BY b.cid, l.label),
            tot AS (SELECT CAST(sum(nij) AS BIGINT) AS ntot FROM ct),
            nc AS (SELECT c, CAST(sum(nij) AS BIGINT) AS nc FROM ct GROUP BY c),
            nl AS (SELECT lbl, CAST(sum(nij) AS BIGINT) AS nl FROM ct GROUP BY lbl),
            hc AS (SELECT -CAST(CAST(sum(CAST(round(
                       (nc / CAST(ntot AS DOUBLE))
                       * ln(CAST(nc AS DOUBLE) / ntot), 9) AS DECIMAL(20,9)))
                       AS DECIMAL(38,9)) AS DOUBLE) AS h
                   FROM nc CROSS JOIN tot),
            hl AS (SELECT -CAST(CAST(sum(CAST(round(
                       (nl / CAST(ntot AS DOUBLE))
                       * ln(CAST(nl AS DOUBLE) / ntot), 9) AS DECIMAL(20,9)))
                       AS DECIMAL(38,9)) AS DOUBLE) AS h
                   FROM nl CROSS JOIN tot),
            mi AS (SELECT CAST(CAST(sum(CAST(round(
                       (ct.nij / CAST(ntot AS DOUBLE))
                       * ln((CAST(ct.nij AS DOUBLE) * ntot)
                            / (CAST(nc.nc AS DOUBLE) * nl.nl)), 9)
                       AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS DOUBLE) AS mi,
                       max(ntot) AS nrows,
                       count(DISTINCT ct.c) AS kc,
                       count(DISTINCT ct.lbl) AS kl
                   FROM ct JOIN nc USING (c) JOIN nl USING (lbl)
                   CROSS JOIN tot),
            maj AS (SELECT CAST(sum(mx) AS BIGINT) AS maj FROM (
                        SELECT c, max(nij) AS mx FROM ct GROUP BY c))
            SELECT CAST(mi.nrows AS BIGINT) AS n,
                   CAST(kc AS INT) AS n_clusters,
                   CAST(kl AS INT) AS n_labels,
                   round(maj / CAST(mi.nrows AS DOUBLE), 6) AS purity,
                   CASE WHEN hc.h > 0 AND hl.h > 0
                        THEN round(mi.mi / sqrt(hc.h * hl.h), 6) END AS nmi
            FROM mi CROSS JOIN maj CROSS JOIN hc CROSS JOIN hl
        """,
        # sentence dedup: sentinel-split sentences, digest-keyed
        # count-distinct-docs dup set, position-ordered rebuild
        "doc_sentence_dedup": """
            WITH segs AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0
                            THEN CAST([] AS VARCHAR[])
                            ELSE list_filter(
                                list_transform(
                                    string_split(
                                        regexp_replace(trim(text),
                                                       '([.!?])\\s+',
                                                       '\\1' || chr(1), 'g'),
                                        chr(1)),
                                    x -> trim(x)),
                                x -> length(x) > 0)
                       END AS ss
                FROM documents),
            s AS (
                SELECT doc_id,
                       CAST(generate_subscripts(ss, 1) AS INT) AS pos,
                       unnest(ss) AS sent
                FROM segs),
            dups AS (
                SELECT md5(sent) AS h FROM s
                GROUP BY md5(sent) HAVING count(DISTINCT doc_id) >= 2),
            kept AS (
                SELECT doc_id, pos, sent FROM s
                WHERE md5(sent) NOT IN (SELECT h FROM dups)),
            reb AS (
                SELECT doc_id, CAST(count(*) AS INT) AS kept_n,
                       string_agg(sent, ' ' ORDER BY pos, sent) AS t
                FROM kept GROUP BY doc_id),
            tot AS (SELECT doc_id, CAST(count(*) AS INT) AS n
                    FROM s GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(tot.n, 0) AS n_sentences,
                   COALESCE(tot.n, 0) - COALESCE(reb.kept_n, 0) AS n_removed,
                   COALESCE(reb.t, '') AS text_dedup
            FROM documents d
            LEFT JOIN tot ON tot.doc_id = d.doc_id
            LEFT JOIN reb ON reb.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        # temperature mixture: per-stratum ratios + one global min —
        # no cross-strata sum anywhere (the normalizer cancels)
        "doc_temperature_mix": f"""
            WITH w AS (
                SELECT source AS stratum, CAST(sum({_NTOK}) AS BIGINT) AS weight
                FROM documents GROUP BY source),
            q AS (SELECT stratum, weight,
                         round(exp(ln(CAST(weight AS DOUBLE)) / 2.0), 9) AS qv
                  FROM w),
            m AS (SELECT min(weight / qv) AS minr FROM q)
            SELECT stratum, weight,
                   round(1.0 * qv / weight * minr, 6) AS rate,
                   round(1.0 * qv * minr, 6) AS expected_weight
            FROM q CROSS JOIN m ORDER BY stratum
        """,
        # containment: md5 banded-LSH candidates (shared CTEs) + exact
        # distinct-shingle intersection ratios
        "doc_containment_pairs": f"""
            WITH {_minhash_ctes(32, 8, 5, 2000)},
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM capped a JOIN capped b
                  ON a.band = b.band AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id),
            dg AS (SELECT DISTINCT doc_id, g FROM sh),
            sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                   FROM dg GROUP BY doc_id),
            inter AS (
                SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS ni
                FROM cand c
                JOIN dg ga ON ga.doc_id = c.id_a
                JOIN dg gb ON gb.doc_id = c.id_b AND gb.g = ga.g
                GROUP BY c.id_a, c.id_b),
            scored AS (
                SELECT i.id_a, i.id_b,
                       round(1.0 * i.ni / sa.n, 6) AS c_ab,
                       round(1.0 * i.ni / sb.n, 6) AS c_ba
                FROM inter i
                JOIN sz sa ON sa.doc_id = i.id_a
                JOIN sz sb ON sb.doc_id = i.id_b)
            SELECT id_a, id_b, c_ab, c_ba,
                   greatest(c_ab, c_ba) AS containment
            FROM scored WHERE greatest(c_ab, c_ba) >= 0.2
            ORDER BY id_a, id_b
        """,
        # ACF: day-grain series, round(9)-DECIMAL moment sums, calendar-
        # day lag join — mirrors temporal.autocorrelation's expression
        # tree exactly
        "events_autocorrelation": """
            WITH daily AS (
                SELECT CAST(ts AS DATE) AS day,
                       CAST(count(*) AS DOUBLE) AS value
                FROM events GROUP BY 1),
            st AS (
                SELECT round(
                    CAST(CAST(sum(CAST(round(value, 9) AS DECIMAL(25,9)))
                              AS DECIMAL(38,9)) AS DOUBLE) / count(*), 9
                ) AS mu FROM daily),
            dev AS (SELECT day, round(value - mu, 9) AS d
                    FROM daily CROSS JOIN st),
            den AS (
                SELECT CAST(CAST(sum(CAST(round(d * d, 9) AS DECIMAL(30,9)))
                                 AS DECIMAL(38,9)) AS DOUBLE) AS den
                FROM dev),
            lags AS (SELECT CAST(unnest(generate_series(0, 14)) AS INTEGER)
                            AS lag),
            pairs AS (
                SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
                       CAST(CAST(sum(CAST(round(a.d * b.d, 9)
                                          AS DECIMAL(30,9)))
                                 AS DECIMAL(38,9)) AS DOUBLE) AS num
                FROM dev a CROSS JOIN lags l
                JOIN dev b ON b.day = a.day + l.lag
                GROUP BY l.lag)
            SELECT lag, n_pairs,
                   CASE WHEN den <> 0.0 THEN round(num / den, 6) END AS acf
            FROM pairs CROSS JOIN den ORDER BY lag
        """,
        # Kaplan-Meier: subject lifetimes, duration-grain product-limit
        # via exp(cumsum(round(ln(factor), 9))) with the total-death flag
        "events_survival_km": """
            WITH subj AS (
                SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
                FROM events GROUP BY user_id),
            h AS (SELECT max(ts) AS max_ts FROM events),
            life AS (
                SELECT date_diff('day', CAST(first_ts AS DATE),
                                 CAST(last_ts AS DATE)) AS dur,
                       date_diff('day', CAST(last_ts AS DATE),
                                 CAST(max_ts AS DATE)) >= 1 AS observed
                FROM subj CROSS JOIN h),
            grain AS (
                SELECT dur,
                       CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_events,
                       CAST(sum(CASE WHEN observed THEN 0 ELSE 1 END)
                            AS BIGINT) AS n_censored
                FROM life GROUP BY dur),
            ar AS (
                SELECT dur, n_events, n_censored,
                       CAST(n_events + n_censored
                            + coalesce(sum(n_events + n_censored) OVER
                                (ORDER BY dur ROWS BETWEEN 1 FOLLOWING
                                 AND UNBOUNDED FOLLOWING), 0)
                            AS BIGINT) AS n_at_risk
                FROM grain),
            fac AS (
                SELECT dur, n_at_risk, n_events, n_censored,
                       round(1.0 - CAST(n_events AS DOUBLE) / n_at_risk, 9)
                           AS factor
                FROM ar),
            cur AS (
                SELECT dur, n_at_risk, n_events, n_censored,
                       max(CASE WHEN factor = 0.0 THEN 1 ELSE 0 END)
                           OVER w AS dead,
                       CAST(CAST(sum(CAST(CASE WHEN factor > 0.0
                                          THEN round(ln(factor), 9)
                                          ELSE 0.0 END AS DECIMAL(25,9)))
                                 OVER w AS DECIMAL(38,9)) AS DOUBLE)
                           AS lnsum
                FROM fac
                WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW))
            SELECT dur AS duration_days, n_at_risk, n_events, n_censored,
                   CASE WHEN dead = 1 THEN 0.0
                        ELSE round(exp(lnsum), 6) END AS survival
            FROM cur WHERE n_events > 0 ORDER BY duration_days
        """,
        # Benford: string leading-digit, full 1..9 grid, global chi2
        "orders_benford": """
            WITH sig AS (
                SELECT substring(regexp_replace(
                           CAST(o_totalprice AS VARCHAR), '[^1-9]', '',
                           'g'), 1, 1) AS digit
                FROM orders
                WHERE o_totalprice > 0),
            cnt AS (SELECT digit, CAST(count(*) AS BIGINT) AS c
                    FROM sig WHERE digit <> '' GROUP BY digit),
            grid AS (SELECT CAST(unnest(generate_series(1, 9)) AS VARCHAR)
                            AS digit),
            counts AS (
                SELECT grid.digit, coalesce(cnt.c, 0) AS n_obs
                FROM grid LEFT JOIN cnt ON cnt.digit = grid.digit),
            tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM counts),
            scored AS (
                SELECT CAST(counts.digit AS INTEGER) AS digit, n_obs,
                       round(ln(1.0 + 1.0 / CAST(counts.digit AS DOUBLE))
                             / ln(10.0), 9) AS p_expected,
                       round(CAST(n_obs AS DOUBLE) / n, 6) AS p_observed,
                       n
                FROM counts CROSS JOIN tot),
            c2 AS (
                SELECT round(
                    CAST(CAST(sum(CAST(round(
                        pow(n_obs - n * p_expected, 2)
                        / (n * p_expected), 9) AS DECIMAL(30,9)))
                        AS DECIMAL(38,9)) AS DOUBLE), 6) AS chi2
                FROM scored)
            SELECT digit, n_obs, p_expected, p_observed, chi2
            FROM scored CROSS JOIN c2 ORDER BY digit
        """,
        # chi-square independence: contingency + restored zero cells
        "doc_lang_source_chi2": """
            WITH base AS (
                SELECT coalesce(CAST(lang AS VARCHAR), '<null>') AS a,
                       coalesce(CAST(source AS VARCHAR), '<null>') AS b
                FROM documents),
            cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o
                      FROM base GROUP BY a, b),
            ma AS (SELECT a, CAST(sum(o) AS BIGINT) AS na
                   FROM cells GROUP BY a),
            mb AS (SELECT b, CAST(sum(o) AS BIGINT) AS nb
                   FROM cells GROUP BY b),
            nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
            grid AS (
                SELECT ma.na, mb.nb, coalesce(c.o, 0) AS o
                FROM ma CROSS JOIN mb
                LEFT JOIN cells c ON c.a = ma.a AND c.b = mb.b),
            terms AS (
                SELECT round(
                    pow(o - CAST(na AS DOUBLE) * nb / n, 2)
                    / (CAST(na AS DOUBLE) * nb / n), 9) AS term
                FROM grid CROSS JOIN nn),
            stat AS (
                SELECT CAST(CAST(sum(CAST(term AS DECIMAL(30,9)))
                                 AS DECIMAL(38,9)) AS DOUBLE) AS chi2_raw
                FROM terms),
            dims AS (SELECT CAST(count(DISTINCT a) AS BIGINT) AS levels_a,
                            CAST(count(DISTINCT b) AS BIGINT) AS levels_b
                     FROM cells)
            SELECT n, levels_a, levels_b,
                   (levels_a - 1) * (levels_b - 1) AS dof,
                   round(chi2_raw, 6) AS chi2,
                   round(sqrt(chi2_raw
                              / (n * least(levels_a - 1, levels_b - 1))),
                         6) AS cramers_v
            FROM nn CROSS JOIN dims CROSS JOIN stat
        """,
        # HLL: md5-uint52 registers rebuilt in SQL, exact int64 harmonic
        # sum via bit shifts, linear-counting branch
        "corpus_hll_distinct": """
            WITH nrm AS (SELECT trim(regexp_replace(lower(text), '\\s+',
                                ' ', 'g')) AS t FROM documents),
            tok AS (SELECT unnest(string_split(t, ' ')) AS token
                    FROM nrm WHERE length(t) > 0),
            tk AS (SELECT token FROM tok WHERE length(token) > 0),
            hs AS (SELECT ('0x' || substring(md5(token), 1, 13))::BIGINT
                          AS h FROM tk),
            hr AS (SELECT CAST(h % 256 AS INT) AS reg, h >> 8 AS w
                   FROM hs),
            rk AS (SELECT reg, CASE WHEN w = 0 THEN 45
                               ELSE 44 - length(bin(w)) + 1 END AS rank
                   FROM hr),
            regs AS (SELECT reg, max(rank) AS mx FROM rk GROUP BY reg),
            sk AS (SELECT CAST(count(*) AS BIGINT) AS used,
                          CAST(sum(CAST(1 AS BIGINT) << (45 - mx))
                               AS BIGINT) AS hsum_used
                   FROM regs),
            cnts AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens,
                            CAST(count(DISTINCT token) AS BIGINT)
                                AS exact_distinct
                     FROM tk),
            o AS (SELECT n_tokens, exact_distinct,
                         CAST(256 AS INT) AS registers,
                         CAST(256 - used AS BIGINT) AS zero_registers,
                         CAST(hsum_used + (256 - used)
                              * (CAST(1 AS BIGINT) << 45)
                              AS BIGINT) AS hsum
                  FROM cnts CROSS JOIN sk),
            e AS (SELECT *,
                         CAST(0.7182725932495458 AS DOUBLE) * 256 * 256
                         * 35184372088832.0 / hsum AS raw
                  FROM o),
            est AS (SELECT n_tokens, exact_distinct, registers,
                           zero_registers,
                           CASE WHEN raw <= 640.0 AND zero_registers > 0
                                THEN round(256.0 * ln(256.0
                                           / zero_registers), 6)
                                ELSE round(raw, 6) END AS hll_estimate
                    FROM e)
            SELECT n_tokens, exact_distinct, registers, zero_registers,
                   hll_estimate,
                   round((hll_estimate - exact_distinct)
                         / exact_distinct, 6) AS rel_error
            FROM est
        """,
        # pairwise JSD: top-512 vocab, shared-support equi-join + the
        # disjoint mass in closed form, zero-overlap pairs restored by
        # the slice-pair grid
        "corpus_source_jsd": """
            WITH nrm AS (SELECT source AS g,
                                trim(regexp_replace(lower(text), '\\s+',
                                ' ', 'g')) AS t FROM documents),
            tok AS (SELECT g, unnest(string_split(t, ' ')) AS token
                    FROM nrm WHERE length(t) > 0),
            tk AS (SELECT g, token FROM tok WHERE length(token) > 0),
            top AS (SELECT token FROM (
                        SELECT token, count(*) AS n FROM tk
                        GROUP BY token ORDER BY n DESC, token LIMIT 512)),
            cnt AS (SELECT g, tk.token, CAST(count(*) AS BIGINT) AS c
                    FROM tk JOIN top ON tk.token = top.token
                    GROUP BY g, tk.token),
            tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS t
                    FROM cnt GROUP BY g),
            probs AS (SELECT g, token,
                             round(CAST(c AS DOUBLE) / t, 9) AS p
                      FROM cnt JOIN tot USING (g)),
            sh AS (
                SELECT a.g AS source_a, b.g AS source_b,
                       CAST(count(*) AS BIGINT) AS shared_tokens,
                       CAST(CAST(sum(CAST(round(a.p, 9) AS DECIMAL(20,9)))
                            AS DECIMAL(38,9)) AS DOUBLE) AS sa,
                       CAST(CAST(sum(CAST(round(b.p, 9) AS DECIMAL(20,9)))
                            AS DECIMAL(38,9)) AS DOUBLE) AS sb,
                       CAST(CAST(sum(CAST(round(a.p * ln(2.0 * a.p
                                / (a.p + b.p)) / ln(2.0), 9)
                            AS DECIMAL(20,9))) AS DECIMAL(38,9))
                            AS DOUBLE) AS ta,
                       CAST(CAST(sum(CAST(round(b.p * ln(2.0 * b.p
                                / (a.p + b.p)) / ln(2.0), 9)
                            AS DECIMAL(20,9))) AS DECIMAL(38,9))
                            AS DOUBLE) AS tb
                FROM probs a JOIN probs b
                  ON a.token = b.token AND a.g < b.g
                GROUP BY 1, 2),
            grid AS (SELECT a.g AS source_a, b.g AS source_b
                     FROM tot a JOIN tot b ON a.g < b.g)
            SELECT source_a, source_b,
                   coalesce(shared_tokens, 0) AS shared_tokens,
                   round(0.5 * (coalesce(ta, 0.0)
                                + (1.0 - coalesce(sa, 0.0)))
                         + 0.5 * (coalesce(tb, 0.0)
                                  + (1.0 - coalesce(sb, 0.0))),
                         6) AS jsd_bits
            FROM grid LEFT JOIN sh USING (source_a, source_b)
            ORDER BY source_a, source_b
        """,
        # association rules: distinct basket items, 64-item basket cap,
        # basket-key pair equi-join, double-routed lift
        "orders_association_rules": """
            WITH it AS (SELECT DISTINCT l_orderkey AS bk,
                               l_partkey AS itm FROM lineitem),
            ok AS (SELECT bk FROM it GROUP BY bk
                   HAVING count(*) <= 64),
            capped AS (SELECT it.bk, it.itm FROM it JOIN ok USING (bk)),
            nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS nb
                   FROM capped),
            marg AS (SELECT itm, CAST(count(*) AS BIGINT) AS n
                     FROM capped GROUP BY itm),
            pairs AS (
                SELECT a.itm AS item_a, b.itm AS item_b,
                       CAST(count(*) AS BIGINT) AS n_ab
                FROM capped a JOIN capped b
                  ON a.bk = b.bk AND a.itm < b.itm
                GROUP BY 1, 2 HAVING count(*) >= 3)
            SELECT item_a, item_b, ma.n AS n_a, mb.n AS n_b, n_ab,
                   round(CAST(n_ab AS DOUBLE) / nb, 6) AS support,
                   round(CAST(n_ab AS DOUBLE) / ma.n, 6) AS conf_a_to_b,
                   round(CAST(n_ab AS DOUBLE) / mb.n, 6) AS conf_b_to_a,
                   round(CAST(n_ab AS DOUBLE) * nb
                         / (CAST(ma.n AS DOUBLE) * mb.n), 6) AS lift
            FROM pairs
            JOIN marg ma ON ma.itm = pairs.item_a
            JOIN marg mb ON mb.itm = pairs.item_b
            CROSS JOIN nb
            ORDER BY n_ab DESC, item_a, item_b
        """,
        # isotonic calibration: PAV via the minimax identity over the
        # 10-bin table — prefix sums, interval means, min-then-max fold
        "doc_isotonic_calibration": f"""
            WITH sc AS (SELECT {_QUALITY6} AS s,
                               CAST(n_chars >= 400 AS INT) AS y
                        FROM documents),
            b AS (SELECT least(greatest(CAST(floor((s - 0.0) / 0.1)
                              AS INT), 0), 9) AS bin, s, y
                  FROM sc),
            bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                            CAST(sum(y) AS BIGINT) AS sy,
                            round(CAST(CAST(sum(CAST(round(s, 9)
                                 AS DECIMAL(20,9))) AS DECIMAL(38,9))
                                 AS DOUBLE) / count(*), 6) AS mean_score
                     FROM b GROUP BY bin),
            pre AS (SELECT bin, n, sy, mean_score,
                           CAST(sum(n) OVER w AS BIGINT) AS cn,
                           CAST(sum(sy) OVER w AS BIGINT) AS cy
                    FROM bins
                    WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW)),
            lh AS (SELECT bin AS b2, cn, cy, cn - n AS pn,
                          cy - sy AS py FROM pre),
            iv AS (SELECT j.b2 AS j, k.b2 AS k,
                          round((k.cy - j.py) / (k.cn - j.pn), 9) AS m
                   FROM lh j JOIN lh k ON j.b2 <= k.b2),
            mn AS (SELECT p.bin AS i, iv.j, min(iv.m) AS lo_m
                   FROM pre p JOIN iv
                     ON iv.j <= p.bin AND iv.k >= p.bin
                   GROUP BY 1, 2),
            iso AS (SELECT i, round(max(lo_m), 6) AS isotonic_rate
                    FROM mn GROUP BY i)
            SELECT pre.bin, pre.n, pre.mean_score,
                   round(CAST(sy AS DOUBLE) / n, 6) AS positive_rate,
                   isotonic_rate
            FROM pre JOIN iso ON iso.i = pre.bin ORDER BY bin
        """,
        # per-source AUC: keyed rank-sum windows, NULL on degenerate
        # slices
        "doc_sliced_auc": f"""
            WITH sc AS (SELECT source, {_QUALITY6} AS s,
                               CAST(n_chars >= 400 AS INT) AS y
                        FROM documents),
            g AS (SELECT source, s, count(*) AS n, sum(y) AS np
                  FROM sc GROUP BY source, s),
            r AS (SELECT source, n, np,
                         coalesce(sum(n) OVER (PARTITION BY source
                              ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS bef
                  FROM g),
            p AS (SELECT source, CAST(sum(np) AS BIGINT) AS n_pos,
                         CAST(sum(n) - sum(np) AS BIGINT) AS n_neg,
                         sum(np * (bef + (n + 1) / 2.0)) AS rpos
                  FROM r GROUP BY source)
            SELECT source, n_pos, n_neg,
                   CASE WHEN n_pos > 0 AND n_neg > 0
                        THEN round((rpos - (n_pos * (n_pos + 1)) / 2.0)
                                   / (CAST(n_pos AS DOUBLE) * n_neg), 6)
                   END AS auc
            FROM p ORDER BY source
        """,
        # participation-ratio intrinsic dim: the CKA expr covariance
        # chain, trace + Frobenius folds
        "embedding_intrinsic_dim": """
            WITH ex AS (
                SELECT vec_id AS rid,
                       CAST(generate_subscripts(e, 1) - 1 AS INT) AS i,
                       unnest(e) AS v
                FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                      FROM embeddings)),
            ex2 AS (SELECT * FROM ex WHERE i < 32),
            sums AS (
                SELECT a.i AS i, b.i AS j, count(*) AS n,
                       CAST(CAST(sum(CAST(round(a.v * b.v, 9)
                                 AS DECIMAL(25,9))) AS DECIMAL(38,9))
                            AS DOUBLE) AS sxy
                FROM ex2 a JOIN ex2 b ON a.rid = b.rid GROUP BY 1, 2),
            means AS (
                SELECT i, round(CAST(CAST(sum(CAST(round(v, 9)
                                AS DECIMAL(20,9))) AS DECIMAL(38,9))
                                AS DOUBLE) / count(*), 9) AS mu
                FROM ex2 GROUP BY i),
            cov AS (
                SELECT s.i, s.j, s.n,
                       round(s.sxy / s.n - mi.mu * mj.mu, 9) AS c
                FROM sums s
                JOIN means mi ON mi.i = s.i
                JOIN means mj ON mj.i = s.j),
            agg AS (
                SELECT max(n) AS n,
                       CAST(CAST(sum(CASE WHEN i = j
                                 THEN CAST(c AS DECIMAL(20,9)) END)
                                 AS DECIMAL(38,9)) AS DOUBLE) AS tr_raw,
                       CAST(CAST(sum(CAST(round(c * c, 12)
                                 AS DECIMAL(24,12))) AS DECIMAL(38,12))
                            AS DOUBLE) AS fr_raw
                FROM cov)
            SELECT CAST(32 AS INT) AS d, CAST(n AS BIGINT) AS n,
                   round(tr_raw, 6) AS trace,
                   round(fr_raw, 6) AS frob_sq,
                   round(tr_raw * tr_raw / fr_raw, 6) AS intrinsic_dim
            FROM agg
        """,
        "doc_textrank_keywords": _textrank_oracle(),
        # length batching: global row indexes per strategy, integer
        # padding accounting
        "doc_length_batching": f"""
            WITH base AS (SELECT doc_id AS id,
                                 CAST({_NTOK} AS BIGINT) AS len
                          FROM documents),
            arr AS (SELECT len, row_number() OVER (ORDER BY id) - 1
                           AS idx FROM base),
            srt AS (SELECT len, row_number() OVER (ORDER BY len, id) - 1
                           AS idx FROM base),
            pa AS (SELECT CAST(floor(idx / 32) AS BIGINT) AS b,
                          count(*) AS n, max(len) AS mx, sum(len) AS sm
                   FROM arr GROUP BY 1),
            ps AS (SELECT CAST(floor(idx / 32) AS BIGINT) AS b,
                          count(*) AS n, max(len) AS mx, sum(len) AS sm
                   FROM srt GROUP BY 1),
            ta AS (SELECT 'arrival' AS strategy,
                          CAST(sum(n) AS BIGINT) AS n_docs,
                          CAST(count(*) AS BIGINT) AS n_batches,
                          CAST(sum(sm) AS BIGINT) AS total_tokens,
                          CAST(sum(n * mx - sm) AS BIGINT)
                              AS padded_tokens
                   FROM pa),
            ts AS (SELECT 'sorted' AS strategy,
                          CAST(sum(n) AS BIGINT) AS n_docs,
                          CAST(count(*) AS BIGINT) AS n_batches,
                          CAST(sum(sm) AS BIGINT) AS total_tokens,
                          CAST(sum(n * mx - sm) AS BIGINT)
                              AS padded_tokens
                   FROM ps),
            u AS (SELECT * FROM ta UNION ALL SELECT * FROM ts)
            SELECT strategy, n_docs, n_batches, total_tokens,
                   padded_tokens,
                   round(CAST(padded_tokens AS DOUBLE)
                         / (padded_tokens + total_tokens), 6)
                       AS waste_ratio
            FROM u ORDER BY strategy
        """,
        # lead-lag CCF: two day-grain series, signed-lag join, round(9)-
        # DECIMAL moment sums — autocorrelation's SQL with two sides
        "events_cross_correlation": """
            WITH daily AS (
                SELECT event_type AS k, CAST(ts AS DATE) AS day,
                       CAST(count(*) AS DOUBLE) AS value
                FROM events WHERE event_type IN ('click', 'purchase')
                GROUP BY 1, 2),
            mua AS (SELECT round(
                        CAST(CAST(sum(CAST(round(value, 9)
                             AS DECIMAL(25,9))) AS DECIMAL(38,9))
                             AS DOUBLE) / count(*), 9) AS mu_a
                    FROM daily WHERE k = 'click'),
            mub AS (SELECT round(
                        CAST(CAST(sum(CAST(round(value, 9)
                             AS DECIMAL(25,9))) AS DECIMAL(38,9))
                             AS DOUBLE) / count(*), 9) AS mu_b
                    FROM daily WHERE k = 'purchase'),
            deva AS (SELECT day AS day_a, round(value - mu_a, 9) AS d_a
                     FROM daily CROSS JOIN mua WHERE k = 'click'),
            devb AS (SELECT day AS day_b, round(value - mu_b, 9) AS d_b
                     FROM daily CROSS JOIN mub WHERE k = 'purchase'),
            dena AS (SELECT CAST(CAST(sum(CAST(round(d_a * d_a, 9)
                          AS DECIMAL(30,9))) AS DECIMAL(38,9)) AS DOUBLE)
                          AS den_a FROM deva),
            denb AS (SELECT CAST(CAST(sum(CAST(round(d_b * d_b, 9)
                          AS DECIMAL(30,9))) AS DECIMAL(38,9)) AS DOUBLE)
                          AS den_b FROM devb),
            lags AS (SELECT CAST(unnest(generate_series(-7, 7)) AS INTEGER)
                            AS lag),
            pairs AS (
                SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
                       CAST(CAST(sum(CAST(round(a.d_a * b.d_b, 9)
                            AS DECIMAL(30,9))) AS DECIMAL(38,9))
                            AS DOUBLE) AS num
                FROM deva a CROSS JOIN lags l
                JOIN devb b ON b.day_b = a.day_a + l.lag
                GROUP BY l.lag)
            SELECT lag, n_pairs,
                   CASE WHEN den_a <> 0.0 AND den_b <> 0.0
                        THEN round(num / sqrt(den_a * den_b), 6) END AS ccf
            FROM pairs CROSS JOIN dena CROSS JOIN denb ORDER BY lag
        """,
        # RFM: customer-grain reduce, row_number ranks (ties by
        # (value, customer)), floor(idx*B/n) equal-population cuts
        "orders_rfm_segments": """
            WITH cust AS (
                SELECT o_custkey AS cust,
                       max(CAST(o_orderdate AS DATE)) AS last_day,
                       CAST(count(*) AS BIGINT) AS freq,
                       CAST(sum(CAST(round(o_totalprice, 2)
                            AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS money
                FROM orders GROUP BY o_custkey),
            h AS (SELECT max(last_day) AS h FROM cust),
            base AS (SELECT cust,
                            date_diff('day', last_day, h) AS recency,
                            freq, money
                     FROM cust CROSS JOIN h),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
            rb AS (SELECT cust, CAST(floor((row_number() OVER
                       (ORDER BY recency, cust) - 1) * 5 / n) AS INT)
                       AS r_bucket
                   FROM base CROSS JOIN nn),
            fb AS (SELECT cust, CAST(floor((row_number() OVER
                       (ORDER BY freq, cust) - 1) * 5 / n) AS INT)
                       AS f_bucket
                   FROM base CROSS JOIN nn),
            mb AS (SELECT cust, CAST(floor((row_number() OVER
                       (ORDER BY money, cust) - 1) * 5 / n) AS INT)
                       AS m_bucket
                   FROM base CROSS JOIN nn)
            SELECT r_bucket, f_bucket, m_bucket,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   round(CAST(CAST(sum(CAST(recency AS DECIMAL(20,0)))
                        AS DECIMAL(38,0)) AS DOUBLE) / count(*), 6)
                       AS avg_recency_days,
                   round(CAST(CAST(sum(CAST(freq AS DECIMAL(20,0)))
                        AS DECIMAL(38,0)) AS DOUBLE) / count(*), 6)
                       AS avg_orders,
                   round(CAST(CAST(sum(money) AS DECIMAL(38,2))
                        AS DOUBLE) / count(*), 6) AS avg_monetary
            FROM base
            JOIN rb USING (cust) JOIN fb USING (cust) JOIN mb USING (cust)
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        # yield curve: 21-threshold conditional aggregate over the
        # quality score, token-weighted
        "doc_filter_yield": f"""
            WITH base AS (SELECT {_QUALITY6} AS s,
                                 CAST({_NTOK} AS BIGINT) AS w
                          FROM documents),
            grid AS (SELECT round(CAST(unnest(generate_series(0, 20))
                            AS DOUBLE) / 20.0, 6) AS threshold),
            agg AS (
                SELECT threshold,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(CASE WHEN s >= threshold THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_kept,
                       CAST(sum(w) AS BIGINT) AS weight_total,
                       CAST(sum(CASE WHEN s >= threshold THEN w ELSE 0 END)
                            AS BIGINT) AS weight_kept
                FROM base CROSS JOIN grid GROUP BY threshold)
            SELECT threshold, n_docs, n_kept,
                   CASE WHEN n_docs > 0
                        THEN round(CAST(n_kept AS DOUBLE) / n_docs, 6)
                   END AS doc_yield,
                   weight_total, weight_kept,
                   CASE WHEN weight_total > 0
                        THEN round(CAST(weight_kept AS DOUBLE)
                                   / weight_total, 6)
                   END AS weight_yield
            FROM agg ORDER BY threshold
        """,
        # per-source dup pressure: corpus-wide normalized-text digests
        "corpus_source_dup_rate": f"""
            WITH base AS (SELECT source AS g, md5({_NORM}) AS h
                          FROM documents),
            counts AS (SELECT h, CAST(count(*) AS BIGINT) AS c
                       FROM base GROUP BY h)
            SELECT g AS source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_docs,
                   CAST(count(DISTINCT base.h) AS BIGINT)
                       AS n_distinct_texts,
                   round(CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*), 6) AS dup_rate
            FROM base JOIN counts ON counts.h = base.h
            GROUP BY g ORDER BY source
        """,
        # Lorenz/Gini over per-source token mass: DECIMAL-exact Gini sum
        "corpus_source_gini": f"""
            WITH w AS (SELECT source AS g,
                              CAST(sum({_NTOK}) AS BIGINT) AS w
                       FROM documents GROUP BY source),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(w) AS BIGINT) AS tw FROM w),
            ranked AS (SELECT g, w,
                              CAST(row_number() OVER (ORDER BY w, g)
                                   AS INT) AS rank
                       FROM w),
            gini AS (
                SELECT round(
                    CAST(CAST(sum(CAST(2 * rank - n - 1 AS DECIMAL(20,0))
                              * CAST(w AS DECIMAL(18,0)))
                              AS DECIMAL(38,0)) AS DOUBLE)
                    / (CAST(max(n) AS DOUBLE) * max(tw)), 6) AS gini
                FROM ranked CROSS JOIN tot)
            SELECT rank, g AS source, w AS weight,
                   round(CAST(w AS DOUBLE) / tw, 6) AS share,
                   round(CAST(sum(w) OVER (ORDER BY rank
                              ROWS UNBOUNDED PRECEDING) AS DOUBLE) / tw,
                         6) AS cum_share,
                   gini
            FROM ranked CROSS JOIN tot CROSS JOIN gini ORDER BY rank
        """,
        # isotropy: smallest-md5(id) 64-sample, exact pairwise cosines
        # via the decimal-fold-equivalent grouped sums
        "embedding_isotropy_sample": """
            WITH s AS (SELECT vec_id AS id,
                              CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                       LIMIT 64),
            ex AS (SELECT id, CAST(generate_subscripts(v, 1) AS INT) AS i,
                          unnest(v) AS x
                   FROM s),
            dots AS (
                SELECT a.id AS ia, b.id AS ib,
                       CAST(CAST(sum(CAST(round(a.x * b.x, 9)
                            AS DECIMAL(25,9))) AS DECIMAL(25,9))
                            AS DOUBLE) AS dot
                FROM ex a JOIN ex b ON a.i = b.i AND a.id < b.id
                GROUP BY 1, 2),
            nrms AS (
                SELECT id, sqrt(CAST(CAST(sum(CAST(round(x * x, 9)
                            AS DECIMAL(25,9))) AS DECIMAL(25,9))
                            AS DOUBLE)) AS nr
                FROM ex GROUP BY id),
            cosv AS (
                SELECT round(dot / (na.nr * nb.nr), 9) AS cos
                FROM dots
                JOIN nrms na ON na.id = dots.ia
                JOIN nrms nb ON nb.id = dots.ib),
            stats AS (
                SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                       round(CAST(CAST(sum(CAST(cos AS DECIMAL(20,9)))
                            AS DECIMAL(38,9)) AS DOUBLE) / count(*), 6)
                           AS mean_cos,
                       round(CAST(CAST(sum(CAST(abs(cos)
                            AS DECIMAL(20,9))) AS DECIMAL(38,9))
                            AS DOUBLE) / count(*), 6) AS mean_abs_cos,
                       round(max(abs(cos)), 6) AS max_abs_cos
                FROM cosv),
            ns AS (SELECT CAST(count(*) AS INT) AS n_sampled FROM s)
            SELECT n_sampled, n_pairs, mean_cos, mean_abs_cos, max_abs_cos
            FROM ns CROSS JOIN stats
        """,
        # round-8 rotated gates (oracles defined next to their queries,
        # lower in this file; doc_compression_ratio is rows-only by design)
        **_rotated_round8_oracles(),
        # round-9 rotated gates (oracles defined next to their queries,
        # lower in this file; events_kcore / embedding_dbscan /
        # corpus_lsa_topics are rows-only by design)
        **_rotated_round9_oracles(),
        # round-10 rotated gates (oracles defined next to their queries,
        # lower in this file; no rows-only gates in this batch)
        **_rotated_round10_oracles(),
    }


# ============================================================================
# ROUND-8 ROTATED GATES — defined here (build order), registered in the
# live queries()/oracle_sql() window since the round-8 rotation.
#
# These 22 gates were staged as round-8 candidates during round 7 (the
# zero-PENDING-carryover discipline, r6 verdict #7), judge-verified
# hash-exact at sf0.001/sf0.01/7-shuffle-partitions, and rotated into
# window slots 0-20 (+ embedding_procrustes at slot 48) at the round-8
# head. New round-9 work stages in candidate_queries()/candidate_oracles()
# at the bottom of this file; `scripts/check_oracle.py --candidates`
# sweeps that registry and tests/test_candidates.py pins it at sf0.001.
# ============================================================================

def events_hits(spark, sf_dir):
    """HITS hub/authority scores over the event-type transition graph
    (graph.py::hits_scores, 5 fixed synchronous rounds): which states
    route journeys (hubs) vs receive them (authorities) — PageRank's
    bipartite-role sibling. Each half-step is one edge-keyed join + one
    keyed aggregate; 9dp DECIMAL-summed raw scores and DECIMAL-summed
    squared norms make every value bit-replayable; the oracle chains 5
    explicit iteration CTE pairs."""
    from nbdatatools_spark.operators.graph import hits_scores

    edges = events_transition_counts(spark, sf_dir)
    h = hits_scores(edges, src="from_type", dst="to_type", iterations=5)
    return h.select(
        F.col("node").alias("event_type"),
        F.round("authority", 6).alias("authority"),
        F.round("hub", 6).alias("hub"),
    ).orderBy("event_type")


def events_label_propagation(spark, sf_dir):
    """Synchronous label-propagation communities over the user
    co-visitation graph (graph.py::label_propagation, 4 fixed rounds,
    self-vote, ties to the smallest label) — the community readout on
    the SAME capped/supported edge list the triangle census uses. All
    integer arithmetic; the oracle unrolls every round with a QUALIFY
    arg-max."""
    from nbdatatools_spark.operators.graph import (
        cooccurrence_edges,
        label_propagation,
    )

    ev = _t(spark, sf_dir, "events")
    occ = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
    )
    edges = cooccurrence_edges(
        occ, ["event_type", "h"], "user_id", max_bucket=100, min_support=3
    )
    return (
        label_propagation(edges, iterations=4)
        .select(F.col("node").alias("user_id"), "community")
        .orderBy("user_id")
    )


def embedding_kcenter(spark, sf_dir):
    """Greedy k-center (farthest-point) coreset selection over the full
    embedding table (clustering.py::kcenter_select, k=8, seed = min id):
    the diversity-driven data-selection primitive (Sener & Savarese
    ICLR'18). Squared distances via the x.x - 2x.c + c.c identity with
    left-to-right folds (the knn_euclidean discipline), 9dp-rounded,
    argmax ties to the smallest id; the oracle unrolls all 8 selections
    into chained ORDER BY ... LIMIT 1 CTEs."""
    from nbdatatools_spark.operators.clustering import kcenter_select

    emb = _t(spark, sf_dir, "embeddings")
    sel = kcenter_select(emb, k=8)
    return sel.select(
        "rank", "vec_id", F.round("sq_dist", 6).alias("sq_dist")
    ).orderBy("rank")


def doc_cosine_threshold_pairs(spark, sf_dir):
    """EXACT cosine-threshold similarity join (dedup.py::
    cosine_threshold_pairs, tau=0.9) — prefix-filtered AllPairs (Bayardo
    et al. WWW'07): the zero-recall-loss near-dup join. Tokens shuffle
    as md5 digests; candidates come from rarest-first prefix postings
    only; verify is candidate-keyed. The oracle replays the identical
    pipeline (global (df, digest) order, DECIMAL suffix norms, DECIMAL
    dot products) — hash-exact."""
    from nbdatatools_spark.operators.dedup import cosine_threshold_pairs

    docs = _t(spark, sf_dir, "documents")
    return cosine_threshold_pairs(docs, threshold=0.9).orderBy("id_a", "id_b")


def doc_metadata_mi(spark, sf_dir):
    """Mutual information + NMI between language and source
    (quality_checks.py::mutual_information): the information-theoretic
    bias audit (chi2's sibling) — how much knowing the source tells you
    about the language. One contingency aggregate; 9dp DECIMAL-summed
    cell terms — hash-exact."""
    from nbdatatools_spark.operators.quality_checks import mutual_information

    return mutual_information(_t(spark, sf_dir, "documents"), "lang", "source")


def corpus_negative_sampling(spark, sf_dir):
    """word2vec negative-sampling table (lm.py::negative_sampling_table,
    top-100 vocab, count^0.75): sampling weights + inverse-CDF cumulative
    boundaries. DECIMAL-normalized weights and a vocab-bounded running
    DECIMAL sum — hash-exact."""
    from nbdatatools_spark.operators.lm import negative_sampling_table

    return negative_sampling_table(
        _t(spark, sf_dir, "documents"), vocab_size=100
    )


def events_burstiness(spark, sf_dir):
    """Per-user inter-arrival burstiness B = (sigma-mu)/(sigma+mu)
    (temporal.py::burstiness, Goh & Barabási 2008): the bot-vs-human
    cadence audit. Integer microsecond gaps, DECIMAL moment sums, one
    keyed lag window ordered by (ts, event_id) — hash-exact."""
    from nbdatatools_spark.operators.temporal import burstiness

    ev = _t(spark, sf_dir, "events")
    return burstiness(ev, min_events=3, tie_col="event_id").orderBy("user_id")


def doc_score_quantile_align(spark, sf_dir):
    """Per-slice score quantile alignment (evaluation.py::
    score_quantile_align): replace the quality score with its
    tie-averaged percent rank INSIDE each source, so one global cut
    means the same thing on every slice (the fix for the per-source
    scorer bias doc_sliced_auc diagnoses). Keyed windows over per-(source,
    score) groups only — hash-exact."""
    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.evaluation import score_quantile_align

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.round(quality_score(F.col("text")), 6).alias("score"),
    )
    out = score_quantile_align(docs, "score", "source")
    return out.select("doc_id", "source", "score", "score_pct").orderBy("doc_id")


def doc_compression_ratio(spark, sf_dir):
    """DEFLATE compression-ratio quality signal (functions/text.py::
    compression_ratio): zlib level-6 compressed-bytes / raw-bytes per
    document — the classic repetition/boilerplate page filter (Dolma,
    RedPajama-v2 family). DEFLATE is not SQL-expressible, so this is a
    ROWS-ONLY gate by design (pytest pins the zlib differential and the
    repetitive < diverse ordering); the Arrow-batched pandas UDF is the
    module's one intentional Python kernel."""
    from nbdatatools_spark.functions.text import compression_ratio

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return docs.select(
        "doc_id", compression_ratio(F.col("text")).alias("compression_ratio")
    ).orderBy("doc_id")


def _hits_oracle(iterations: int = 5) -> str:
    """DuckDB replica of graph.hits_scores over the transition graph:
    every synchronous round unrolled — raw sums are round(,9)-then-
    DECIMAL(28,9)-summed per in/out neighborhood, the L2 norm is sqrt of
    a DECIMAL sum of 9dp squares, the normalized score one double divide
    rounded to 9dp; identical expression trees to the engine."""
    its = []
    for t in range(1, iterations + 1):
        its.append(f"""
        ar{t} AS MATERIALIZED (
            SELECT nodes.node, coalesce(CAST(s.v AS DOUBLE), 0.0) AS v
            FROM nodes LEFT JOIN (
                SELECT e.d AS node,
                       sum(CAST(round(h{t - 1}.v, 9) AS DECIMAL(28,9))) AS v
                FROM e JOIN h{t - 1} ON e.s = h{t - 1}.node
                GROUP BY e.d) s ON nodes.node = s.node),
        an{t} AS MATERIALIZED (
            SELECT sqrt(CAST(sum(CAST(round(v * v, 9) AS DECIMAL(28,9)))
                        AS DOUBLE)) AS n
            FROM ar{t}),
        a{t} AS MATERIALIZED (
            SELECT node, CASE WHEN n > 0.0 THEN round(v / n, 9)
                              ELSE 0.0 END AS v
            FROM ar{t} CROSS JOIN an{t}),
        hr{t} AS MATERIALIZED (
            SELECT nodes.node, coalesce(CAST(s.v AS DOUBLE), 0.0) AS v
            FROM nodes LEFT JOIN (
                SELECT e.s AS node,
                       sum(CAST(round(a{t}.v, 9) AS DECIMAL(28,9))) AS v
                FROM e JOIN a{t} ON e.d = a{t}.node
                GROUP BY e.s) s ON nodes.node = s.node),
        hn{t} AS MATERIALIZED (
            SELECT sqrt(CAST(sum(CAST(round(v * v, 9) AS DECIMAL(28,9)))
                        AS DOUBLE)) AS n
            FROM hr{t}),
        h{t} AS MATERIALIZED (
            SELECT node, CASE WHEN n > 0.0 THEN round(v / n, 9)
                              ELSE 0.0 END AS v
            FROM hr{t} CROSS JOIN hn{t})""")
    return f"""
        WITH p AS (
            SELECT user_id, event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events),
        e AS (
            SELECT DISTINCT from_type AS s, to_type AS d
            FROM p WHERE to_type IS NOT NULL),
        nodes AS MATERIALIZED (SELECT s AS node FROM e UNION SELECT d FROM e),
        h0 AS MATERIALIZED (SELECT node, 1.0 AS v FROM nodes),
        {",".join(its)}
        SELECT a{iterations}.node AS event_type,
               round(a{iterations}.v, 6) AS authority,
               round(h{iterations}.v, 6) AS hub
        FROM a{iterations} JOIN h{iterations} USING (node)
        ORDER BY event_type
    """


def _lpa_oracle(iterations: int = 4) -> str:
    """DuckDB replica of graph.label_propagation over the co-visitation
    graph (the triangle census's edge construction verbatim): every
    synchronous round unrolled — neighbor + self votes counted per
    (node, label), arg-max by (count DESC, label ASC) via QUALIFY."""
    its = []
    for t in range(1, iterations + 1):
        its.append(f"""
        v{t} AS MATERIALIZED (
            SELECT node, c, count(*) AS cnt FROM (
                SELECT bo.a AS node, l{t - 1}.c AS c
                FROM bidir bo JOIN l{t - 1} ON bo.b = l{t - 1}.node
                UNION ALL
                SELECT node, c FROM l{t - 1})
            GROUP BY node, c),
        l{t} AS MATERIALIZED (
            SELECT node, c FROM v{t}
            QUALIFY row_number() OVER (PARTITION BY node
                                       ORDER BY cnt DESC, c ASC) = 1)""")
    return f"""
        WITH occ0 AS (
            SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
            FROM events),
        kept AS (
            SELECT event_type, h FROM occ0
            GROUP BY event_type, h HAVING count(*) <= 100),
        occ AS (
            SELECT o.event_type, o.h, o.user_id
            FROM occ0 o JOIN kept k
              ON o.event_type = k.event_type AND o.h = k.h),
        edges AS (
            SELECT a.user_id AS a, b.user_id AS b
            FROM occ a JOIN occ b
              ON a.event_type = b.event_type AND a.h = b.h
             AND a.user_id < b.user_id
            GROUP BY a.user_id, b.user_id
            HAVING count(*) >= 3),
        bidir AS MATERIALIZED (SELECT a, b FROM edges
                 UNION ALL SELECT b AS a, a AS b FROM edges),
        nodes AS MATERIALIZED (SELECT DISTINCT a AS node FROM bidir),
        l0 AS MATERIALIZED (SELECT node, node AS c FROM nodes),
        {",".join(its)}
        SELECT node AS user_id, c AS community
        FROM l{iterations} ORDER BY user_id
    """


def _kcenter_oracle(k: int = 8) -> str:
    """DuckDB replica of clustering.kcenter_select: the greedy
    farthest-point loop unrolled — seed = min id, every squared distance
    the x.x - 2x.c + c.c identity over list_inner_product (bit-matching
    the engine's folds), clamped + 9dp-rounded, argmax ties to the
    smallest id."""
    steps = []
    finals = ["SELECT 1 AS rank, id AS vec_id, CAST(NULL AS DOUBLE) AS sq_dist FROM c1"]
    for t in range(2, k + 1):
        prev_m = f"m{t - 1}"
        steps.append(f"""
        c{t} AS MATERIALIZED (SELECT id, e, ss, mind FROM {prev_m}
                 ORDER BY mind DESC, id ASC LIMIT 1)""")
        if t < k:
            steps.append(f"""
        m{t} AS MATERIALIZED (
            SELECT m.id, m.e, m.ss,
                   least(m.mind,
                         round(greatest(0.0, m.ss
                               - 2 * list_inner_product(m.e, c.e) + c.ss),
                               9)) AS mind
            FROM {prev_m} m CROSS JOIN c{t} c WHERE m.id <> c.id)""")
        finals.append(
            f"SELECT {t}, id, round(mind, 6) FROM c{t}"
        )
    return f"""
        WITH pts AS (
            SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e,
                   list_inner_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])) AS ss
            FROM embeddings),
        c1 AS MATERIALIZED (SELECT id, e, ss FROM pts ORDER BY id ASC LIMIT 1),
        m1 AS MATERIALIZED (
            SELECT p.id, p.e, p.ss,
                   round(greatest(0.0, p.ss
                         - 2 * list_inner_product(p.e, c.e) + c.ss), 9) AS mind
            FROM pts p CROSS JOIN c1 c WHERE p.id <> c.id),
        {",".join(steps)}
        SELECT * FROM ({" UNION ALL ".join(finals)}) ORDER BY rank
    """


def _cosine_pairs_oracle(threshold: float = 0.9) -> str:
    """DuckDB replica of dedup.cosine_threshold_pairs: the full AllPairs
    pipeline — md5 token digests, integer norm, global (df ASC, digest
    ASC) order, DECIMAL suffix norms with the 1e-6 soundness slack,
    prefix-posting candidate join, DECIMAL dot-product verify."""
    tau2 = repr(threshold * threshold - 1e-6)
    tau = repr(float(threshold))
    return f"""
        WITH tok AS (
            SELECT doc_id AS id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
            FROM documents WHERE length(trim(text)) > 0),
        tf AS (
            SELECT id, md5(t) AS h, count(*) AS tf
            FROM tok WHERE t <> '' GROUP BY id, md5(t)),
        nrm AS (
            SELECT id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS nr
            FROM tf GROUP BY id),
        post AS (
            SELECT tf.id, tf.h, CAST(tf AS DOUBLE) / nr AS w
            FROM tf JOIN nrm ON tf.id = nrm.id),
        dfq AS (SELECT h, count(*) AS df FROM post GROUP BY h),
        sfx AS (
            SELECT post.id, post.h, post.w,
                   CAST(sum(CAST(round(w * w, 9) AS DECIMAL(20,9)))
                        OVER (PARTITION BY post.id
                              ORDER BY dfq.df ASC, post.h ASC
                              ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS DOUBLE) AS s
            FROM post JOIN dfq ON post.h = dfq.h),
        pre AS (SELECT id, h FROM sfx WHERE s >= {tau2}),
        cand AS (
            SELECT DISTINCT pa.id AS a, pb.id AS b
            FROM pre pa JOIN pre pb ON pa.h = pb.h AND pa.id < pb.id),
        ver AS (
            SELECT c.a, c.b,
                   CAST(CAST(sum(CAST(round(wa.w * wb.w, 9)
                        AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS DOUBLE) AS cos
            FROM cand c
            JOIN post wa ON wa.id = c.a
            JOIN post wb ON wb.id = c.b AND wb.h = wa.h
            GROUP BY c.a, c.b
            HAVING CAST(CAST(sum(CAST(round(wa.w * wb.w, 9)
                  AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS DOUBLE) >= {tau})
        SELECT a AS id_a, b AS id_b, round(cos, 6) AS cosine
        FROM ver ORDER BY id_a, id_b
    """


def _rotated_round8_oracles() -> dict[str, str]:
    """DuckDB oracles for the 22 round-8 rotated gates, merged into
    oracle_sql() since the round-8 rotation (doc_compression_ratio
    is rows-only by design: DEFLATE is not SQL-expressible)."""
    return {
        "events_hits": _hits_oracle(5),
        "events_label_propagation": _lpa_oracle(4),
        "embedding_kcenter": _kcenter_oracle(8),
        "doc_cosine_threshold_pairs": _cosine_pairs_oracle(0.9),
        "doc_metadata_mi": """
            WITH base AS (
                SELECT coalesce(CAST(lang AS VARCHAR), '<null>') AS a,
                       coalesce(CAST(source AS VARCHAR), '<null>') AS b
                FROM documents),
            cells AS (SELECT a, b, count(*) AS o FROM base GROUP BY a, b),
            ma AS (SELECT a, CAST(sum(o) AS BIGINT) AS na FROM cells GROUP BY a),
            mb AS (SELECT b, CAST(sum(o) AS BIGINT) AS nb FROM cells GROUP BY b),
            n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
            mi AS (
                SELECT CAST(CAST(sum(CAST(round(
                           (CAST(o AS DOUBLE) / n.n)
                           * ln(CAST(o AS DOUBLE) * n.n
                                / (CAST(na AS DOUBLE) * nb)), 9)
                       AS DECIMAL(30,9))) AS DECIMAL(38,9)) AS DOUBLE) AS v
                FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN n),
            ha AS (
                SELECT CAST(CAST(sum(CAST(round(
                           -(CAST(na AS DOUBLE) / n.n)
                           * ln(CAST(na AS DOUBLE) / n.n), 9)
                       AS DECIMAL(30,9))) AS DECIMAL(38,9)) AS DOUBLE) AS v
                FROM ma CROSS JOIN n),
            hb AS (
                SELECT CAST(CAST(sum(CAST(round(
                           -(CAST(nb AS DOUBLE) / n.n)
                           * ln(CAST(nb AS DOUBLE) / n.n), 9)
                       AS DECIMAL(30,9))) AS DECIMAL(38,9)) AS DOUBLE) AS v
                FROM mb CROSS JOIN n),
            dims AS (SELECT CAST(count(DISTINCT a) AS BIGINT) AS levels_a,
                            CAST(count(DISTINCT b) AS BIGINT) AS levels_b
                     FROM cells)
            SELECT n.n, dims.levels_a, dims.levels_b,
                   round(mi.v, 6) AS mi,
                   round(ha.v, 6) AS h_a,
                   round(hb.v, 6) AS h_b,
                   CASE WHEN ha.v > 0.0 AND hb.v > 0.0
                        THEN round(mi.v / sqrt(ha.v * hb.v), 6) END AS nmi
            FROM n CROSS JOIN dims CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb
        """,
        "corpus_negative_sampling": """
            WITH tok AS (
                SELECT unnest(regexp_split_to_array(trim(lower(text)),
                                                    '\\s+')) AS token
                FROM documents WHERE length(trim(text)) > 0),
            g AS (
                SELECT token, CAST(count(*) AS BIGINT) AS count
                FROM tok WHERE token <> ''
                GROUP BY token
                ORDER BY count DESC, token ASC LIMIT 100),
            w AS (
                SELECT token, count,
                       CAST(round(pow(CAST(count AS DOUBLE), 0.75), 9)
                            AS DECIMAL(20,9)) AS wv
                FROM g),
            z AS (SELECT CAST(sum(wv) AS DECIMAL(38,9)) AS z FROM w)
            SELECT CAST(row_number() OVER (ORDER BY count DESC, token ASC)
                        AS INT) AS rank,
                   token, count,
                   round(CAST(wv AS DOUBLE) / CAST(z AS DOUBLE), 9) AS weight,
                   round(CAST(sum(wv) OVER (ORDER BY count DESC, token ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS DOUBLE) / CAST(z AS DOUBLE), 9) AS cum_weight
            FROM w CROSS JOIN z ORDER BY rank
        """,
        "events_burstiness": """
            WITH g AS (
                SELECT user_id,
                       epoch_us(ts) - lag(epoch_us(ts))
                           OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS g
                FROM events),
            s AS (
                SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                       count(g) AS n_gaps,
                       CAST(sum(g) AS BIGINT) AS sgi,
                       CAST(sum(g) AS DOUBLE) AS sg,
                       CAST(sum(CAST(g AS HUGEINT) * g) AS DOUBLE) AS sg2
                FROM g GROUP BY user_id HAVING count(*) >= 3)
            SELECT user_id, n_events,
                   -- pure-integer half-up micro mean (6dp-seconds ==
                   -- integer micros; float round ties at sf0.1)
                   CAST((2 * sgi + n_gaps) // (2 * n_gaps) AS DOUBLE)
                       / 1000000.0 AS mean_gap_s,
                   round(sqrt(greatest(0.0, sg2 / n_gaps
                              - (sg / n_gaps) * (sg / n_gaps))) / 1000000.0,
                         6) AS std_gap_s,
                   CASE WHEN sqrt(greatest(0.0, sg2 / n_gaps
                                 - (sg / n_gaps) * (sg / n_gaps)))
                             + sg / n_gaps > 0.0
                        THEN round((sqrt(greatest(0.0, sg2 / n_gaps
                                        - (sg / n_gaps) * (sg / n_gaps)))
                                    - sg / n_gaps)
                                   / (sqrt(greatest(0.0, sg2 / n_gaps
                                          - (sg / n_gaps) * (sg / n_gaps)))
                                      + sg / n_gaps), 6)
                   END AS burstiness
            FROM s ORDER BY user_id
        """,
        "corpus_ppmi_invariants": _ppmi_oracle(2, 512),
        "corpus_log_odds": _log_odds_oracle(0.01, 25),
        "doc_ndcg_by_source": _ndcg_oracle(10),
        "doc_rbo_scorers": _rbo_oracle(20, 0.9),
        "doc_selection_parity": _SELECTION_PARITY_ORACLE,
        "doc_wasserstein_shift": _WASSERSTEIN_ORACLE,
        "doc_domain_reweight": _domain_reweight_oracle(2.0, 0.1),
        "events_diff_in_diff": _DIFF_IN_DIFF_ORACLE,
        "doc_conformal_threshold": _conformal_oracle(0.1),
        "embedding_procrustes": _PROCRUSTES_ORACLE,
        "embedding_knn_overlap": _knn_overlap_oracle(10, 16),
        "doc_balanced_shards": _balanced_shards_oracle(8),
        "events_histogram_quantiles": _histogram_quantiles_oracle(0.0, 512.0, 64),
        "doc_score_quantile_align": f"""
            WITH sc AS (SELECT doc_id, source, {_QUALITY6} AS score
                        FROM documents),
            g AS (SELECT source, score, count(*) AS n
                  FROM sc GROUP BY source, score),
            t AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot
                  FROM g GROUP BY source),
            r AS (SELECT source, score,
                         CAST(coalesce(sum(n) OVER (PARTITION BY source
                              ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS DOUBLE)
                         + (n + 1) / 2.0 AS avg_rank
                  FROM g),
            p AS (SELECT r.source, r.score,
                         CASE WHEN t.tot > 1
                              THEN round((avg_rank - 1) / (t.tot - 1), 6)
                              ELSE 0.5 END AS score_pct
                  FROM r JOIN t ON r.source = t.source)
            SELECT sc.doc_id, sc.source, sc.score, p.score_pct
            FROM sc JOIN p ON sc.source = p.source AND sc.score = p.score
            ORDER BY sc.doc_id
        """,
    }


def corpus_ppmi_invariants(spark, sf_dir):
    """Pinned-invariant gate for PPMI-SVD static word vectors
    (lm.py::ppmi_word_vectors — Levy & Goldberg 2014; the SVD runs on
    the driver over the vocab-bounded PPMI matrix, so the vectors
    themselves are not SQL-expressible; the fit_embeddings_model
    discipline applies).

    Exact SQL-replicable scalars (computed here as DataFrame ops with
    the identical expression trees the oracle replays): vocabulary
    size, total symmetric co-occurrence count T, the PPMI Frobenius
    norm^2 (9dp DECIMAL-summed squared cells), and the arg-max PPMI
    cell with its (wa, wb) tie-break. Boolean contract on the SVD
    output (exact order statistics, tolerance only for the 6dp vector
    rounding): truncated energy <= Frobenius^2; energy >= d/V share of
    Frobenius^2 (top-d of V nonneg values); one vector per vocab
    token; every vector exactly min(dim, V) wide."""
    from nbdatatools_spark.functions.text import normalize_text, tokens
    from nbdatatools_spark.operators.lm import ppmi_word_vectors

    window, vocab_size, dim = 2, 512, 64
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        F.col("doc_id").alias("doc"),
        F.posexplode_outer(tokens(normalize_text(F.col("text")))).alias(
            "pos", "w"
        ),
    ).where(F.length("w") > 0)
    vocab = (
        base.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "w")
        .limit(vocab_size)
        .localCheckpoint(eager=False)
    )
    cpos = base.join(F.broadcast(vocab.select("w")), "w").localCheckpoint(
        eager=False
    )
    offs = spark.range(1, window + 1).select(F.col("id").cast("int").alias("o"))
    a = cpos.select("doc", "pos", F.col("w").alias("wa"))
    b = cpos.select("doc", F.col("pos").alias("pos_b"), F.col("w").alias("wb"))
    raw = (
        a.join(F.broadcast(offs), F.lit(True))
        .join(b, (b["doc"] == a["doc"]) & (b["pos_b"] == a["pos"] + F.col("o")))
        .select("wa", "wb")
    )
    pairs = (
        raw.union(raw.select(F.col("wb").alias("wa"), F.col("wa").alias("wb")))
        .groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .localCheckpoint(eager=False)
    )
    na = pairs.groupBy("wa").agg(F.sum("n_ab").alias("na"))
    nb = pairs.groupBy("wb").agg(F.sum("n_ab").alias("nb"))
    tot = pairs.agg(F.sum("n_ab").alias("T"))
    ppmi_cells = (
        pairs.join(na, "wa")
        .join(nb, "wb")
        .crossJoin(F.broadcast(tot))
        .select(
            "wa",
            "wb",
            F.log(
                (F.col("n_ab").cast("double") * F.col("T"))
                / (F.col("na").cast("double") * F.col("nb"))
            ).alias("pmi"),
        )
        .where(F.col("pmi") > 0.0)
        .localCheckpoint(eager=False)
    )
    frob = ppmi_cells.agg(
        F.round(
            F.sum(F.round(F.col("pmi") * F.col("pmi"), 9).cast("decimal(30,9)"))
            .cast("decimal(38,9)")
            .cast("double"),
            6,
        ).alias("frobenius_sq")
    )
    top = (
        ppmi_cells.orderBy(F.desc("pmi"), "wa", "wb")
        .limit(1)
        .select(
            F.col("wa").alias("top_pair_wa"),
            F.col("wb").alias("top_pair_wb"),
            F.round("pmi", 6).alias("top_ppmi"),
        )
    )
    nv = vocab.agg(F.count(F.lit(1)).alias("n_vocab"))

    # --- SVD-output booleans (driver-side; the fit_model sketch shape) ---
    vec_rows = ppmi_word_vectors(
        docs, window=window, vocab_size=vocab_size, dim=dim
    ).collect()
    frob_val = float(frob.collect()[0]["frobenius_sq"])  # ||PPMI||_F^2
    top_val = float(top.collect()[0]["top_ppmi"])  # max cell
    v_count = int(nv.collect()[0]["n_vocab"])
    d_eff = min(dim, v_count)
    # W = U_d sqrt(S_d), so ||W||_F^2 = sum of the top-d singular VALUES
    # (truncated nuclear norm) and every row norm^2 <= s_1. Spectral
    # bounds tying the SVD output to the SQL scalars: s_1 <= ||F||,
    # s_1 >= max|cell|, energy <= d * s_1.
    fnorm = frob_val ** 0.5
    energy = sum(sum(x * x for x in r["vector"]) for r in vec_rows)
    max_rownsq = max(
        (sum(x * x for x in r["vector"]) for r in vec_rows), default=0.0
    )
    tol = 1e-3  # absorbs the 6dp per-coordinate vector rounding
    flags = {
        "energy_le_rank_bound": energy <= d_eff * fnorm + tol,
        "energy_ge_top_cell": energy >= top_val - tol,
        "max_vec_normsq_le_fnorm": max_rownsq <= fnorm + tol,
        "vocab_complete": len(vec_rows) == v_count,
        "dims_ok": all(len(r["vector"]) == d_eff for r in vec_rows),
    }
    flag_cols = [F.lit(bool(v)).alias(k) for k, v in flags.items()]
    return (
        nv.crossJoin(F.broadcast(tot.select(F.col("T").alias("total_pairs"))))
        .crossJoin(F.broadcast(frob))
        .crossJoin(F.broadcast(top))
        .select(
            "n_vocab",
            "total_pairs",
            "frobenius_sq",
            "top_pair_wa",
            "top_pair_wb",
            "top_ppmi",
            *flag_cols,
        )
    )


def _ppmi_oracle(window: int = 2, vocab_size: int = 512) -> str:
    """DuckDB replica of corpus_ppmi_invariants' exact scalars (the
    identical co-occurrence + PPMI expression trees; tokp follows the
    textrank token-position CTE) + literal TRUEs for the SVD contract."""
    return f"""
        WITH nrm AS (
            SELECT doc_id AS doc,
                   CASE WHEN length({_NORM}) = 0 THEN []::VARCHAR[]
                        ELSE string_split({_NORM}, ' ') END AS a
            FROM documents),
        tokp AS (
            SELECT doc, CAST(generate_subscripts(a, 1) - 1 AS INT) AS pos,
                   unnest(a) AS w
            FROM nrm),
        tk AS (SELECT doc, pos, w FROM tokp WHERE length(w) > 0),
        vocab AS (
            SELECT w, count(*) AS freq FROM tk GROUP BY w
            ORDER BY freq DESC, w LIMIT {vocab_size}),
        cpos AS (SELECT tk.doc, tk.pos, tk.w FROM tk
                 JOIN vocab ON tk.w = vocab.w),
        raw AS (
            SELECT a.w AS wa, b.w AS wb
            FROM cpos a
            JOIN (SELECT unnest(generate_series(1, {window})) AS o) offs ON TRUE
            JOIN cpos b ON b.doc = a.doc AND b.pos = a.pos + offs.o),
        pairs AS (
            SELECT wa, wb, count(*) AS n_ab FROM (
                SELECT wa, wb FROM raw
                UNION ALL SELECT wb AS wa, wa AS wb FROM raw)
            GROUP BY wa, wb),
        na AS (SELECT wa, sum(n_ab) AS na FROM pairs GROUP BY wa),
        nb AS (SELECT wb, sum(n_ab) AS nb FROM pairs GROUP BY wb),
        tot AS (SELECT sum(n_ab) AS T FROM pairs),
        cells AS (
            SELECT wa, wb,
                   ln((CAST(n_ab AS DOUBLE) * T)
                      / (CAST(na AS DOUBLE) * nb)) AS pmi
            FROM pairs JOIN na USING (wa) JOIN nb USING (wb) CROSS JOIN tot),
        pos_cells AS (SELECT * FROM cells WHERE pmi > 0.0),
        frob AS (
            SELECT round(CAST(CAST(sum(CAST(round(pmi * pmi, 9)
                       AS DECIMAL(30,9))) AS DECIMAL(38,9)) AS DOUBLE), 6)
                   AS frobenius_sq
            FROM pos_cells),
        top AS (
            SELECT wa AS top_pair_wa, wb AS top_pair_wb,
                   round(pmi, 6) AS top_ppmi
            FROM pos_cells ORDER BY pmi DESC, wa, wb LIMIT 1),
        nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab FROM vocab),
        tp AS (SELECT CAST(T AS BIGINT) AS total_pairs FROM tot)
        SELECT n_vocab, total_pairs, frobenius_sq,
               top_pair_wa, top_pair_wb, top_ppmi,
               TRUE AS energy_le_rank_bound,
               TRUE AS energy_ge_top_cell,
               TRUE AS max_vec_normsq_le_fnorm,
               TRUE AS vocab_complete,
               TRUE AS dims_ok
        FROM nv CROSS JOIN tp CROSS JOIN frob CROSS JOIN top
    """


def corpus_log_odds(spark, sf_dir):
    """"Fightin' Words" log-odds-with-Dirichlet-prior corpus comparison
    (analysis.py::log_odds_tokens, en vs de, alpha=0.01, top-25/side):
    which tokens are STATISTICALLY over-represented per slice — the
    sampling-variance-honest "what changed between these corpora"
    readout (Monroe et al. 2008). One conditional-sum vocab aggregate;
    two TakeOrderedAndProjects; double arithmetic over integer counts —
    hash-exact."""
    from nbdatatools_spark.operators.analysis import log_odds_tokens

    docs = _t(spark, sf_dir, "documents")
    return log_odds_tokens(
        docs, "lang", "en", "de", alpha=0.01, top_k=25
    )


def doc_ndcg_by_source(spark, sf_dir):
    """Per-source nDCG@10 of the quality score against the long-document
    gain (evaluation.py::ndcg_at_k): the top-weighted ranking-quality
    readout per slice — AUC's graded, position-discounted sibling. Two
    keyed ranking windows + one keyed aggregate; per-rank terms
    9dp-DECIMAL-summed; the log2 discount is replicated as ln(x)/ln(2)
    in both engines — hash-exact."""
    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.evaluation import ndcg_at_k

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.round(quality_score(F.col("text")), 6).alias("score"),
        (F.col("n_chars") >= 400).cast("int").alias("gain"),
    )
    return ndcg_at_k(scored, "score", "gain", k=10, group_col="source")


def doc_rbo_scorers(spark, sf_dir):
    """Rank-biased overlap between the heuristic quality ranking and the
    raw-length ranking (evaluation.py::rbo_overlap, k=20, p=0.9): the
    top-weighted scorer-agreement readout (Webber et al. 2010). Both
    rankings restricted to rank <= k before the depth grid (TakeOrdered-
    sized state); depth terms 9dp-DECIMAL-summed — hash-exact."""
    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.evaluation import rbo_overlap

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("sa"),
        F.col("n_chars").cast("double").alias("sb"),
    )
    return rbo_overlap(scored, "sa", "sb", k=20, p=0.9)


def doc_selection_parity(spark, sf_dir):
    """Per-source selection-rate parity of the quality >= 0.5 cut
    (evaluation.py::selection_parity): the demographic-parity audit for
    data curation — which slices a filter disproportionately drops. One
    contingency aggregate — hash-exact."""
    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.evaluation import selection_parity

    docs = _t(spark, sf_dir, "documents")
    kept = docs.select(
        "source",
        (F.round(quality_score(F.col("text")), 6) >= 0.5).alias("keep"),
    )
    return selection_parity(kept, "keep", "source")


def _log_odds_oracle(alpha: float = 0.01, top_k: int = 25) -> str:
    a = repr(float(alpha))
    return f"""
        WITH tok AS (
            SELECT lang = 'en' AS isa,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
            FROM documents WHERE lang IN ('en', 'de')
              AND length(trim(text)) > 0),
        counts AS (
            SELECT w, CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ya,
                   CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS yb
            FROM tok WHERE w <> '' GROUP BY w),
        tot AS (SELECT CAST(sum(ya) AS BIGINT) AS na,
                       CAST(sum(yb) AS BIGINT) AS nb,
                       CAST(count(*) AS BIGINT) AS v
                FROM counts),
        scored AS (
            SELECT w AS token, ya AS count_a, yb AS count_b,
                   round((ln((ya + {a}) / (na + {a} * v - ya - {a}))
                          - ln((yb + {a}) / (nb + {a} * v - yb - {a})))
                         / sqrt(1.0 / (ya + {a}) + 1.0 / (yb + {a})), 6) AS z
            FROM counts CROSS JOIN tot)
        SELECT 'a' AS side, token, count_a, count_b, z FROM
            (SELECT * FROM scored ORDER BY z DESC, token LIMIT {top_k})
        UNION ALL
        SELECT 'b', token, count_a, count_b, z FROM
            (SELECT * FROM scored ORDER BY z ASC, token LIMIT {top_k})
    """


def _ndcg_oracle(k: int = 10) -> str:
    term = (
        "CAST(round((pow(2.0, CAST(gain AS DOUBLE)) - 1.0)"
        " / (ln(CAST({r} AS DOUBLE) + 1.0) / ln(2.0)), 9) AS DECIMAL(30,9))"
    )
    return f"""
        WITH sc AS (SELECT doc_id, source, {_QUALITY6} AS score,
                           CAST(n_chars >= 400 AS INT) AS gain
                    FROM documents),
        r AS (SELECT source AS g, gain,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY score DESC, doc_id ASC) AS r,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY gain DESC, doc_id ASC) AS ri
              FROM sc),
        agg AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n_items,
                   CAST(CAST(sum(CASE WHEN r <= {k} THEN
                       {term.format(r="r")} END) AS DECIMAL(38,9))
                       AS DOUBLE) AS dcg,
                   CAST(CAST(sum(CASE WHEN ri <= {k} THEN
                       {term.format(r="ri")} END) AS DECIMAL(38,9))
                       AS DOUBLE) AS idcg
            FROM r GROUP BY g)
        SELECT g AS "group", n_items,
               round(coalesce(dcg, 0.0), 6) AS dcg,
               round(coalesce(idcg, 0.0), 6) AS idcg,
               CASE WHEN idcg > 0.0 THEN round(dcg / idcg, 6) END AS ndcg
        FROM agg ORDER BY g
    """


def _rbo_oracle(k: int = 20, p: float = 0.9) -> str:
    pr = repr(float(p))
    one_minus = repr(1.0 - float(p))
    return f"""
        WITH sc AS (SELECT doc_id, {_QUALITY6} AS sa,
                           CAST(n_chars AS DOUBLE) AS sb
                    FROM documents),
        ra AS (SELECT doc_id AS id,
                      row_number() OVER (ORDER BY sa DESC, doc_id ASC) AS ra
               FROM sc QUALIFY ra <= {k}),
        rb AS (SELECT doc_id AS id,
                      row_number() OVER (ORDER BY sb DESC, doc_id ASC) AS rb
               FROM sc QUALIFY rb <= {k}),
        m AS (SELECT greatest(ra.ra, rb.rb) AS m FROM ra JOIN rb USING (id)),
        depths AS (SELECT CAST(unnest(generate_series(1, {k})) AS INT) AS d),
        xd AS (SELECT d, count(m.m) AS x
               FROM depths LEFT JOIN m ON m.m <= depths.d GROUP BY d),
        terms AS (
            SELECT d, x,
                   CAST(round(pow(CAST({pr} AS DOUBLE), d - 1)
                              * CAST(x AS DOUBLE) / d, 9)
                        AS DECIMAL(30,9)) AS t
            FROM xd),
        agg AS (
            SELECT max(CASE WHEN d = {k} THEN x END) AS xk,
                   CAST({one_minus} AS DOUBLE)
                   * CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE) AS rmin
            FROM terms)
        SELECT {k} AS k, CAST({pr} AS DOUBLE) AS p,
               CAST(xk AS INT) AS overlap_at_k,
               round(rmin, 6) AS rbo_min,
               round(rmin + pow(CAST({pr} AS DOUBLE), {k})
                     * xk / CAST({k} AS DOUBLE), 6) AS rbo_ext
        FROM agg
    """


_SELECTION_PARITY_ORACLE = f"""
    WITH base AS (
        SELECT coalesce(CAST(source AS VARCHAR), '<null>') AS g,
               {_QUALITY6} >= 0.5 AS k
        FROM documents),
    per AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN k THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
            FROM base GROUP BY g),
    overall AS (SELECT CAST(sum(n_kept) AS DOUBLE) / sum(n) AS orate FROM per)
    SELECT g AS source, n, n_kept,
           round(CAST(n_kept AS DOUBLE) / n, 6) AS keep_rate,
           CASE WHEN orate > 0.0
                THEN round((CAST(n_kept AS DOUBLE) / n) / orate, 6)
           END AS rate_ratio
    FROM per CROSS JOIN overall ORDER BY source
"""


def doc_wasserstein_shift(spark, sf_dir):
    """Exact 1-D Wasserstein-1 distance between en and de document-length
    distributions (analysis.py::wasserstein_1d): the drift family's
    metric member — PSI/KS say THAT mass moved, W1 says HOW FAR in value
    units. Two-phase range-partitioned cumsums (no single-reducer
    window); per-value terms 9dp-DECIMAL-summed — hash-exact and
    partition-invariant by construction."""
    from nbdatatools_spark.operators.analysis import wasserstein_1d

    docs = _t(spark, sf_dir, "documents")
    return wasserstein_1d(docs, "n_chars", "lang", "en", "de")


def doc_domain_reweight(spark, sf_dir):
    """DoReMi-style loss-driven domain reweighting (sampling.py::
    domain_reweight, eta=2, smoothing=0.1; Xie et al. NeurIPS 2023):
    upweight the sources the proxy loss finds hardest — the loss-driven
    member of the mixture family (mixture_rates = target shares,
    temperature_mixture_rates = power tilt). The heuristic quality score
    stands in as the per-document proxy loss. One domain-keyed aggregate;
    DECIMAL loss sums and DECIMAL normalizer — hash-exact."""
    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.sampling import domain_reweight

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source", F.round(quality_score(F.col("text")), 6).alias("loss")
    )
    return domain_reweight(scored, "source", "loss", eta=2.0, smoothing=0.1)


_WASSERSTEIN_ORACLE = """
    WITH base AS (
        SELECT CAST(n_chars AS DOUBLE) AS v, lang = 'en' AS isa
        FROM documents WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL),
    g AS (SELECT v,
                 CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ia,
                 CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS ib
          FROM base GROUP BY v),
    tot AS (SELECT CAST(sum(ia) AS BIGINT) AS n_a,
                   CAST(sum(ib) AS BIGINT) AS n_b FROM g),
    cum AS (SELECT v,
                   sum(ia) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS ca,
                   sum(ib) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cb,
                   lead(v) OVER (ORDER BY v) AS nxt
            FROM g),
    terms AS (
        SELECT n_a, n_b,
               CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN
                    round(abs(CAST(ca AS DOUBLE) / n_a
                              - CAST(cb AS DOUBLE) / n_b)
                          * (coalesce(nxt, v) - v), 9)
               END AS DECIMAL(30,9)) AS t
        FROM cum CROSS JOIN tot)
    SELECT n_a, n_b,
           CASE WHEN n_a > 0 AND n_b > 0
                THEN round(CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE), 6)
           END AS wasserstein
    FROM terms GROUP BY n_a, n_b
"""


def _domain_reweight_oracle(eta: float = 2.0, smoothing: float = 0.1) -> str:
    e = repr(float(eta))
    one_minus = repr(1.0 - float(smoothing))
    s = repr(float(smoothing))
    return f"""
        WITH sc AS (SELECT coalesce(CAST(source AS VARCHAR), '<null>') AS d,
                           {_QUALITY6} AS l
                    FROM documents),
        per AS (SELECT d, CAST(count(*) AS BIGINT) AS n,
                       CAST(count(l) AS BIGINT) AS nl,
                       CAST(CAST(sum(CAST(round(l, 9) AS DECIMAL(30,9)))
                            AS DECIMAL(38,9)) AS DOUBLE) AS sl
                FROM sc GROUP BY d),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                       CAST(sum(nl) AS BIGINT) AS tnl,
                       CAST(CAST(sum(CAST(sl AS DECIMAL(38,9)))
                            AS DECIMAL(38,9)) AS DOUBLE) AS tsl,
                       CAST(count(*) AS BIGINT) AS nd
                FROM per),
        tilted AS (
            SELECT d, n, nd,
                   CAST(n AS DOUBLE) / tn AS share,
                   CASE WHEN nl > 0 THEN sl / nl END AS ml,
                   round((CAST(n AS DOUBLE) / tn)
                         * exp(CAST({e} AS DOUBLE)
                               * (coalesce(sl / nl, tsl / tnl)
                                  - tsl / tnl)), 9) AS w
            FROM per CROSS JOIN tot),
        z AS (SELECT CAST(CAST(sum(CAST(w AS DECIMAL(20,9)))
                     AS DECIMAL(38,9)) AS DOUBLE) AS z FROM tilted)
        SELECT d AS source, n AS n_rows,
               round(share, 6) AS share,
               round(ml, 6) AS mean_loss,
               round(CAST({one_minus} AS DOUBLE) * w / z
                     + CAST({s} AS DOUBLE) / nd, 6) AS weight
        FROM tilted CROSS JOIN z ORDER BY source
    """


def events_diff_in_diff(spark, sf_dir):
    """Difference-in-differences over the event stream (temporal.py::
    diff_in_diff; even user_ids as the 'treated' cohort, cutoff at
    mid-January): the quasi-experimental effect readout that nets out
    the shared time trend — ab_test_report's observational sibling. One
    (treat, post) contingency aggregate with 9dp-DECIMAL cell sums —
    hash-exact."""
    from nbdatatools_spark.operators.temporal import diff_in_diff

    ev = _t(spark, sf_dir, "events")
    tagged = ev.withColumn("treat", F.col("user_id") % 2 == 0)
    return diff_in_diff(tagged, "treat", "value", cutoff="2024-01-16")


def doc_conformal_threshold(spark, sf_dir):
    """Per-source split-conformal calibration thresholds at alpha=0.1
    (evaluation.py::conformal_threshold): the exact
    ceil((n+1)(1-alpha))-th order statistic of the quality score per
    slice — the distribution-free coverage knob. One keyed ranking
    window; tie-safe (equal scores share the selected VALUE) —
    hash-exact."""
    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.evaluation import conformal_threshold

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source", F.round(quality_score(F.col("text")), 6).alias("score")
    )
    return conformal_threshold(scored, "score", alpha=0.1, group_col="source")


def embedding_procrustes(spark, sf_dir):
    """Pinned-invariant gate for orthogonal Procrustes alignment
    (analysis.py::procrustes_align, Schönemann 1966) against a PLANTED
    orthogonal transform (dimension reversal + alternating sign flips):
    the embedding-snapshot drift tool must recover it exactly. Exact
    SQL-replicable scalars: n, d, and both traces (9dp-DECIMAL element
    sums; the planted transform preserves squared entries bit-for-bit,
    so trace_b replays from the SAME expression). Boolean contract on
    the driver SVD: residual ~ 0, nuclear norm = trace (B = A R0 makes
    M = A^T A R0, so sum of singular values = trace(A^T A)), recovered
    R orthonormal."""
    from nbdatatools_spark.operators.analysis import procrustes_align

    emb = _t(spark, sf_dir, "embeddings")
    rot = emb.select(
        "vec_id",
        F.expr(
            "transform(sequence(1, size(embedding)), i -> CAST("
            "element_at(embedding, size(embedding) - i + 1)"
            " * (CASE WHEN i % 2 = 0 THEN -1.0 ELSE 1.0 END) AS DOUBLE))"
        ).alias("embedding"),
    )
    r, stats = procrustes_align(emb, rot)
    row = stats.collect()[0]
    import numpy as np

    rm = np.asarray(r)
    ortho = float(np.abs(rm.T @ rm - np.eye(rm.shape[0])).max()) < 1e-6
    flags = {
        "residual_le_tol": row["residual_sq"] <= 1e-3,
        "nuclear_eq_trace": abs(row["nuclear_m"] - row["trace_a"]) <= 1e-3,
        "rotation_orthonormal": ortho,
    }
    # exact scalars re-derived as DataFrame expressions (the oracle's
    # expression trees); booleans pinned from the driver SVD above
    traces = emb.select(
        F.explode("embedding").alias("__x")
    ).agg(
        F.round(
            F.sum(
                F.round(
                    F.col("__x").cast("double") * F.col("__x").cast("double"),
                    9,
                ).cast("decimal(30,9)")
            )
            .cast("decimal(38,9)")
            .cast("double"),
            6,
        ).alias("trace_a")
    )
    n_d = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size("embedding")).alias("d"),
    )
    return (
        n_d.crossJoin(F.broadcast(traces))
        .select(
            "n",
            "d",
            "trace_a",
            F.col("trace_a").alias("trace_b"),
            *[F.lit(bool(v)).alias(k) for k, v in flags.items()],
        )
    )


_DIFF_IN_DIFF_ORACLE = """
    WITH cells AS (
        SELECT user_id % 2 = 0 AS t,
               ts >= TIMESTAMP '2024-01-16' AS post,
               CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(sum(CAST(round(CAST(value AS DOUBLE), 9)
                    AS DECIMAL(30,9))) AS DECIMAL(38,9)) AS DOUBLE) AS s
        FROM events GROUP BY 1, 2),
    wide AS (
        SELECT max(CASE WHEN t AND NOT post THEN n END) AS n_t_pre,
               max(CASE WHEN t AND post THEN n END) AS n_t_post,
               max(CASE WHEN NOT t AND NOT post THEN n END) AS n_c_pre,
               max(CASE WHEN NOT t AND post THEN n END) AS n_c_post,
               max(CASE WHEN t AND NOT post THEN s END)
                   / max(CASE WHEN t AND NOT post THEN n END) AS mtpre,
               max(CASE WHEN t AND post THEN s END)
                   / max(CASE WHEN t AND post THEN n END) AS mtpost,
               max(CASE WHEN NOT t AND NOT post THEN s END)
                   / max(CASE WHEN NOT t AND NOT post THEN n END) AS mcpre,
               max(CASE WHEN NOT t AND post THEN s END)
                   / max(CASE WHEN NOT t AND post THEN n END) AS mcpost
        FROM cells)
    SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
           round(mtpre, 6) AS mean_t_pre,
           round(mtpost, 6) AS mean_t_post,
           round(mcpre, 6) AS mean_c_pre,
           round(mcpost, 6) AS mean_c_post,
           round((mtpost - mtpre) - (mcpost - mcpre), 6) AS did
    FROM wide
"""


def _conformal_oracle(alpha: float = 0.1) -> str:
    keep = repr(1.0 - float(alpha))
    return f"""
        WITH sc AS (SELECT source, {_QUALITY6} AS s FROM documents),
        c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
              FROM sc GROUP BY source),
        q AS (SELECT source, n,
                     least(CAST(ceil((n + 1) * CAST({keep} AS DOUBLE))
                                AS BIGINT), n) AS qi
              FROM c),
        r AS (SELECT source, s,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY s ASC) AS rn
              FROM sc)
        SELECT r.source AS "group", q.n, q.qi AS q_index,
               round(r.s, 6) AS threshold
        FROM r JOIN q ON r.source = q.source AND r.rn = q.qi
        ORDER BY "group"
    """


_PROCRUSTES_ORACLE = """
    WITH x AS (
        SELECT CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
    tr AS (
        SELECT round(CAST(CAST(sum(CAST(round(v * v, 9) AS DECIMAL(30,9)))
                   AS DECIMAL(38,9)) AS DOUBLE), 6) AS trace_a
        FROM x),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(max(len(embedding)) AS INT) AS d
           FROM embeddings)
    SELECT nd.n, nd.d, tr.trace_a, tr.trace_a AS trace_b,
           TRUE AS residual_le_tol,
           TRUE AS nuclear_eq_trace,
           TRUE AS rotation_orthonormal
    FROM nd CROSS JOIN tr
"""


def embedding_knn_overlap(spark, sf_dir):
    """Neighborhood preservation under Matryoshka-style truncation
    (knn.py::knn_overlap, k=10): mean overlap between each vector's
    full-dimension 10-NN set and its first-16-dims 10-NN set — the
    direct QA readout for dimension truncation / projection / model
    swaps (recall@k is this with B = the ANN index). Gate pins
    impl='expr' for fold parity (the knn_cosine_topk discipline); GEMM
    is the production path. Per-point overlaps 9dp-DECIMAL-summed —
    hash-exact."""
    from nbdatatools_spark.operators.knn import knn_overlap

    emb = _t(spark, sf_dir, "embeddings")
    trunc = emb.select(
        "vec_id",
        F.expr(
            "transform(slice(embedding, 1, 16), x -> CAST(x AS FLOAT))"
        ).alias("embedding"),
    )
    return knn_overlap(emb, trunc, k=10, impl="expr")


def _knn_overlap_oracle(k: int = 10, trunc: int = 16) -> str:
    def knn_cte(rel: str) -> str:
        return f"""(
            SELECT q.id AS qid, b.id AS bid
            FROM {rel} q CROSS JOIN {rel} b
            WHERE q.id <> b.id
            QUALIFY row_number() OVER (
                PARTITION BY q.id
                ORDER BY ({_COS_DIST}) ASC NULLS LAST, b.id ASC) <= {k})"""
    return f"""
        WITH a AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        t AS (SELECT vec_id AS id,
                     list_slice(CAST(embedding AS DOUBLE[]), 1, {trunc}) AS e
              FROM embeddings),
        ea AS MATERIALIZED {knn_cte("a")},
        eb AS MATERIALIZED {knn_cte("t")},
        ka AS (SELECT qid, count(*) AS ka FROM ea GROUP BY qid),
        kb AS (SELECT qid, count(*) AS kb FROM eb GROUP BY qid),
        com AS (SELECT ea.qid, count(*) AS nc
                FROM ea JOIN eb ON ea.qid = eb.qid AND ea.bid = eb.bid
                GROUP BY ea.qid),
        pp AS (SELECT round(CAST(coalesce(nc, 0) AS DOUBLE)
                            / least(ka, kb), 9) AS ov,
                      (ka IS NULL OR kb IS NULL) AS unc
               FROM ka FULL OUTER JOIN kb USING (qid)
               LEFT JOIN com USING (qid))
        SELECT CAST(count(*) AS BIGINT) AS n_points, CAST({k} AS INT) AS k,
               round(CAST(CAST(sum(CAST(ov AS DECIMAL(20,9)))
                    AS DECIMAL(38,9)) AS DOUBLE) / count(*), 6)
                   AS mean_overlap,
               round(min(ov), 6) AS min_overlap,
               round(CAST(sum(CASE WHEN ov >= 1.0 THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*), 6) AS frac_perfect,
               CAST(sum(CASE WHEN unc THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_uncovered
        FROM pp
    """


def doc_balanced_shards(spark, sf_dir):
    """Balanced training-shard assignment audit (packing.py::
    shard_balance_report, 8 shards by n_chars): serpentine deal over the
    (weight DESC, id) two-phase global index — N output files whose
    token totals match so no data-loader rank starves. All integer
    arithmetic on the index — hash-exact."""
    from nbdatatools_spark.operators.packing import shard_balance_report

    docs = _t(spark, sf_dir, "documents")
    return shard_balance_report(docs, 8, "n_chars")


def _balanced_shards_oracle(n_shards: int = 8) -> str:
    n2 = 2 * n_shards
    return f"""
        WITH idx AS (
            SELECT n_chars,
                   row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1
                       AS i
            FROM documents),
        a AS (SELECT n_chars,
                     CAST(CASE WHEN i % {n2} < {n_shards} THEN i % {n2}
                          ELSE {n2} - 1 - (i % {n2}) END AS INT) AS shard
              FROM idx),
        per AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
                       CAST(sum(n_chars) AS BIGINT) AS total_weight
                FROM a GROUP BY shard),
        m AS (SELECT CAST(sum(total_weight) AS DOUBLE) / count(*) AS mw
              FROM per)
        SELECT shard, n_rows, total_weight,
               round(total_weight / mw, 6) AS weight_ratio
        FROM per CROSS JOIN m ORDER BY shard
    """


def events_histogram_quantiles(spark, sf_dir):
    """Streaming-mergeable histogram-sketch quantiles (analysis.py::
    histogram_quantiles, 64 bins on [0, 512], p in {.25, .5, .75, .9,
    .99}): the fixed-grid quantile whose state the streaming build
    (streaming.events.stream_value_histogram) shares verbatim —
    completes the sketch trio (HLL distinct, CMS frequency, histogram
    QUANTILE). Bin counts + one n_bins-row cumulative window + linear
    interpolation, all double-over-integers — hash-exact."""
    from nbdatatools_spark.operators.analysis import histogram_quantiles

    ev = _t(spark, sf_dir, "events")
    return histogram_quantiles(
        ev, "value", probs=(0.25, 0.5, 0.75, 0.9, 0.99),
        lo=0.0, hi=512.0, n_bins=64,
    )


def _histogram_quantiles_oracle(
    lo: float = 0.0, hi: float = 512.0, n_bins: int = 64
) -> str:
    w = (float(hi) - float(lo)) / n_bins
    probs = "(0.25), (0.5), (0.75), (0.9), (0.99)"
    return f"""
        WITH h AS (
            SELECT least(greatest(CAST(floor((CAST(value AS DOUBLE)
                       - CAST({lo!r} AS DOUBLE)) / CAST({w!r} AS DOUBLE))
                       AS INT), 0), {n_bins - 1}) AS bin,
                   count(*) AS n
            FROM events WHERE value IS NOT NULL GROUP BY 1),
        c AS (SELECT bin, n,
                     sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND CURRENT ROW) AS cum
              FROM h),
        tot AS (SELECT sum(n) AS total FROM h),
        grid AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES {probs}) t(p)),
        cand AS (
            SELECT p, total,
                   min({{'bin': bin, 'n': n, 'cum': cum}}) AS b
            FROM grid CROSS JOIN tot
            LEFT JOIN c ON CAST(cum AS DOUBLE) >= p * CAST(total AS DOUBLE)
            GROUP BY p, total)
        SELECT p, CAST(total AS BIGINT) AS n, CAST(b.bin AS INT) AS bin,
               round(least(CAST({lo!r} AS DOUBLE) + CAST({w!r} AS DOUBLE)
                     * (b.bin + (p * CAST(total AS DOUBLE)
                        - (CAST(b.cum AS DOUBLE) - b.n)) / b.n),
                     CAST({hi!r} AS DOUBLE)), 6) AS estimate
        FROM cand ORDER BY p
    """


# ---------------------------------------------------------------------------
# Round-8 batch 1: nonparametric hypothesis tests + agreement + graph QA
# ---------------------------------------------------------------------------


def events_mann_whitney(spark, sf_dir):
    """Two-sample Mann-Whitney U per event type (stats.py::mann_whitney_u):
    does the event value differ in distribution between the user_id%2
    variants — the heavy-tail-proof replacement for the t-test in A/B
    readouts. Tie-averaged ranks via the two-phase (group, value) count
    index (no data-sized window); tie-corrected z, A-S-erf p at 4dp."""
    from nbdatatools_spark.operators.stats import mann_whitney_u

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ev = ev.withColumn(
        "variant", F.concat(F.lit("v"), (F.col("user_id") % 2).cast("string"))
    )
    return mann_whitney_u(ev, "event_type", "variant", "value")


def events_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H per event type (stats.py::kruskal_wallis) across
    the user_id%3 variants — the k-sample rank test behind 'did ANY of
    the cohorts shift'. Same two-phase rank machinery as mann_whitney;
    tie-corrected H; all inputs integer counts and exact .5-ranks."""
    from nbdatatools_spark.operators.stats import kruskal_wallis

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ev = ev.withColumn(
        "variant", F.concat(F.lit("v"), (F.col("user_id") % 3).cast("string"))
    )
    return kruskal_wallis(ev, "event_type", "variant", "value")


def events_levene_test(spark, sf_dir):
    """Brown-Forsythe robust equality-of-variance test per event type
    (stats.py::brown_forsythe) across user_id%3 variants: one-way ANOVA F
    on median-centered absolute deviations — did a cohort's value become
    more VOLATILE even if its level held. Exact interpolated medians,
    DECIMAL-summed moments, no windows."""
    from nbdatatools_spark.operators.stats import brown_forsythe

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ev = ev.withColumn(
        "variant", F.concat(F.lit("v"), (F.col("user_id") % 3).cast("string"))
    )
    return brown_forsythe(ev, "event_type", "variant", "value")


def events_spearman_corr(spark, sf_dir):
    """Spearman rank correlation per event type (stats.py::spearman_corr)
    between day-of-month and value — the monotone drift detector that
    survives outliers where Pearson saturates. Two two-phase rank passes
    joined back row-level; DECIMAL-summed Pearson on exact .5-ranks."""
    from nbdatatools_spark.operators.stats import spearman_corr

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ev = ev.withColumn("dom", F.dayofmonth("ts").cast("double"))
    return spearman_corr(ev, "event_type", "dom", "value")


def events_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotone trend of each event type's daily volume
    (stats.py::mann_kendall): pairwise sign sum over the date-grain
    series (the theil_sen bounded O(n^2)-within-group convention),
    tie-corrected variance, +-1 continuity-corrected z, trend verdict
    at p < 0.05."""
    from nbdatatools_spark.operators.stats import mann_kendall

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    series = daily.select(
        "event_type",
        F.datediff("d", F.lit("1970-01-01")).cast("double").alias("x"),
        "y",
    )
    return mann_kendall(series, "event_type", "x", "y")


def doc_source_fdr(spark, sf_dir):
    """Per-source English-rate anomaly screen with Benjamini-Hochberg FDR
    control (stats.py::bh_adjust): a two-proportion z-test of each
    source's P(lang='en') against the REST of the corpus (pooled-variance
    z, A-S-erf two-sided p at 4dp — the ab_test discipline), then the
    BH step-up over the 20-source family. The multiple-comparisons
    discipline a per-slice QC dashboard needs before flagging sources.
    Family-sized ranking windows run over the 20-row aggregate only."""
    from nbdatatools_spark.operators.stats import bh_adjust, _erf

    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("__tn"), F.sum("n_en").alias("__tk")
    )
    j = per.crossJoin(F.broadcast(tot))
    ns = F.col("n_docs").cast("double")
    nr = (F.col("__tn") - F.col("n_docs")).cast("double")
    ps = F.col("n_en").cast("double") / ns
    pr = (F.col("__tk") - F.col("n_en")).cast("double") / nr
    pp = F.col("__tk").cast("double") / F.col("__tn").cast("double")
    se = F.sqrt(pp * (1.0 - pp) * (1.0 / ns + 1.0 / nr))
    z = F.when(se == 0.0, F.lit(0.0)).otherwise((ps - pr) / se)
    import math as _math

    p = F.round(
        1.0 - _erf(F.abs(z) / F.lit(_math.sqrt(2.0))), 4
    ) + 0.0
    tested = j.select(
        "source",
        F.col("n_docs"),
        F.round(ps, 6).alias("en_rate"),
        (F.round(z, 6) + 0.0).alias("z"),
        p.alias("p_raw"),
    )
    adjusted = bh_adjust(tested, "p_raw", ["source"], alpha=0.05)
    return (
        tested.select("source", "n_docs", "en_rate", "z")
        .join(adjusted, "source")
        .select(
            "source", "n_docs", "en_rate", "z",
            "p_value", "p_rank", "p_adj", "rejected",
        )
        .orderBy("source")
    )


def events_assortativity(spark, sf_dir):
    """Degree assortativity of the user co-visitation graph
    (graph.py::degree_assortativity, Newman 2002) over the SAME edges as
    events_triangle_count: Pearson correlation of endpoint degrees over
    the doubled edge-end list — do heavy users co-occur with heavy users.
    One-row census; DECIMAL-summed correlation."""
    from nbdatatools_spark.operators.graph import (
        cooccurrence_edges,
        degree_assortativity,
    )

    ev = _t(spark, sf_dir, "events")
    occ = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
    )
    edges = cooccurrence_edges(
        occ, ["event_type", "h"], "user_id", max_bucket=100, min_support=3
    )
    return degree_assortativity(edges, src="src", dst="dst")


def events_kcore(spark, sf_dir):
    """2-core of the user co-visitation graph (graph.py::kcore, Seidman
    1983): iterative peeling to the maximal subgraph of degree >= 2 —
    non-degenerate at every test SF (the 3-core is empty at sf0.001) —
    the density filter before community analysis. Fixpoint of a
    shrinking set (not SQL-expressible: rows-only driver check; the
    bit-exact evidence is tests/test_stats_graph.py's differential vs a
    pure-Python peeler)."""
    from nbdatatools_spark.operators.graph import cooccurrence_edges, kcore

    ev = _t(spark, sf_dir, "events")
    occ = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
    )
    edges = cooccurrence_edges(
        occ, ["event_type", "h"], "user_id", max_bucket=100, min_support=3
    )
    return kcore(edges, k=2, src="src", dst="dst")


def doc_fleiss_kappa(spark, sf_dir):
    """Fleiss' kappa across THREE document 'raters' — the quality filter
    (quality_score >= 0.5), the length filter (n_chars >= 400), and the
    language filter (lang = 'en') (evaluation.py::fleiss_kappa, Fleiss
    1971): how much the stacked curation heuristics agree beyond their
    base rates, the multi-rater generalization of doc_filter_agreement's
    Cohen kappa. One (item, category) aggregate; bounded reduces."""
    from nbdatatools_spark.operators.evaluation import fleiss_kappa

    docs = _t(spark, sf_dir, "documents")
    verdicts = (
        docs.select(
            "doc_id",
            F.lit("quality").alias("rater"),
            (F.round(quality_score(F.col("text")), 6) >= 0.5).alias("keep"),
        )
        .unionByName(
            docs.select(
                "doc_id",
                F.lit("length").alias("rater"),
                (F.col("n_chars") >= 400).alias("keep"),
            )
        )
        .unionByName(
            docs.select(
                "doc_id",
                F.lit("lang").alias("rater"),
                (F.col("lang") == "en").alias("keep"),
            )
        )
    )
    return fleiss_kappa(verdicts, "doc_id", "rater", "keep")


def doc_lexical_diversity(spark, sf_dir):
    """Per-source lexical diversity (analysis.py::lexical_diversity):
    Guiraud root TTR, hapax ratio, Yule's K over the vocab_topk
    tokenizer — the vocabulary-richness readout that separates template
    farms from varied prose. Frequency-of-frequencies table, all-integer
    until the final divisions."""
    from nbdatatools_spark.operators.analysis import lexical_diversity

    return lexical_diversity(
        _t(spark, sf_dir, "documents"), group_col="source", text_col="text"
    )


def embedding_two_sample_shift(spark, sf_dir):
    """Distribution shift between label<5 and label>=5 embeddings via
    RBF-kernel MMD^2 (Gretton et al. 2012) and energy distance (Szekely
    & Rizzo 2004) (stats.py::two_sample_distance): the joint-geometry
    two-sample test that catches what per-dim PSI misses. Deterministic
    md5-ordered 64-vector samples; per-dim DECIMAL squared distances;
    9dp-quantized kernels before DECIMAL block sums (libm-proof)."""
    from nbdatatools_spark.operators.stats import two_sample_distance

    emb = _t(spark, sf_dir, "embeddings")
    return two_sample_distance(
        emb.where(F.col("label") < 5),
        emb.where(F.col("label") >= 5),
        vec="embedding",
        id_col="vec_id",
        gamma=None,
        sample_size=64,
    )


# ---------------------------------------------------------------------------
# Round-8 batch 2: LSA topics, Page-Hinkley, robust means, ESS, Brier
# ---------------------------------------------------------------------------


def corpus_lsa_topics(spark, sf_dir):
    """LSA topic sketch (lm.py::lsa_topics, Deerwester et al. 1990):
    truncated SVD of the tf-idf doc-term matrix via ONE doc-keyed
    gramian self-join + a driver eigendecomposition bounded by the
    128-term vocabulary (the ppmi_word_vectors collect shape), top-8
    |loading| terms per topic, deterministic sign convention. Rows-only
    driver check (eigensolvers are platform-floating); numpy
    differential + orthonormality invariants in tests/test_lsa.py."""
    from nbdatatools_spark.operators.lm import lsa_topics

    return lsa_topics(
        _t(spark, sf_dir, "documents"),
        vocab_size=128, n_topics=5, top_terms=8, min_df=2,
    )


def events_page_hinkley(spark, sf_dir):
    """Page-Hinkley mean-shift detection on the daily event-count series
    (temporal.py::page_hinkley, Page 1954): running-mean deviations with
    closed-form cumsum + running-min — the baseline-free sibling of
    events_cusum_change. Calendar-bounded windows, DECIMAL cumsums."""
    from nbdatatools_spark.operators.temporal import page_hinkley

    ev = _t(spark, sf_dir, "events")
    return page_hinkley(ev, ts_col="ts", delta=0.5, lambda_=10.0)


def events_trimmed_mean(spark, sf_dir):
    """Per-event-type trimmed (10%) and winsorized means of the event
    value (stats.py::trimmed_stats): the robust location readouts for
    heavy-tailed metrics. One percentile aggregate broadcast back, one
    DECIMAL-mean pass."""
    from nbdatatools_spark.operators.stats import trimmed_stats

    ev = _t(spark, sf_dir, "events")
    return trimmed_stats(ev, "event_type", "value", trim=0.1)


def doc_sampling_ess(spark, sf_dir):
    """Kish effective sample size per source with n_chars as the
    sampling weight (stats.py::effective_sample_size, Kish 1965):
    ESS = (sum w)^2 / sum w^2 — how much of each slice's row count is
    REAL under length-weighted sampling, the variance sanity gauge for
    every reweighting scheme. One aggregate."""
    from nbdatatools_spark.operators.stats import effective_sample_size

    docs = _t(spark, sf_dir, "documents")
    return effective_sample_size(docs, "source", "n_chars")


def doc_brier_decomposition(spark, sf_dir):
    """Brier score + Murphy decomposition of the quality score against
    the length label (evaluation.py::brier_decomposition, Murphy 1973):
    reliability / resolution / uncertainty over 10 fixed bins with the
    within-bin residual emitted — completes the calibration family
    (bins, isotonic, quantile-align) with the proper-scoring view."""
    from nbdatatools_spark.operators.evaluation import brier_decomposition

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        F.round(quality_score(F.col("text")), 6).alias("score"),
        (F.col("n_chars") >= 400).alias("label"),
    )
    return brier_decomposition(scored, "score", "label", n_bins=10)


# ---------------------------------------------------------------------------
# Round-8 batch 3: DBSCAN, Welch ANOVA, Cramér's V
# ---------------------------------------------------------------------------


def embedding_dbscan(spark, sf_dir):
    """Density-based clustering of the first 300 embeddings
    (clustering.py::dbscan, Ester et al. 1996): eps-neighbor pairs at
    cosine >= 0.3 (exact method on the bounded subset — the LSH-blocked
    path is the corpus default), core/border/noise roles, clusters =
    components of the core-core graph. Rows-only driver check (iterative
    fixpoint); the pure-Python differential in tests/test_dbscan.py is
    the correctness evidence."""
    from nbdatatools_spark.operators.clustering import dbscan

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    return dbscan(emb, eps_cosine=0.7, min_pts=4, method="exact")


def events_welch_anova(spark, sf_dir):
    """Welch's heteroscedastic one-way ANOVA of the event value across
    the user_id%3 variants per event type (stats.py::welch_anova, Welch
    1951) — the mean test that survives the unequal variances
    events_levene_test detects. DECIMAL moments, closed-form F and
    Welch-Satterthwaite df2."""
    from nbdatatools_spark.operators.stats import welch_anova

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ev = ev.withColumn(
        "variant", F.concat(F.lit("v"), (F.col("user_id") % 3).cast("string"))
    )
    return welch_anova(ev, "event_type", "variant", "value")


def doc_cramers_v(spark, sf_dir):
    """Cramér's V (bias-corrected, Bergsma 2013) between document
    language and source (stats.py::cramers_v): the EFFECT SIZE behind
    doc_lang_source_chi2's test statistic — at corpus scale everything
    is 'significant'; V says whether the association is material.
    Cell-table chi2 with the zero-cell mass added in closed form."""
    from nbdatatools_spark.operators.stats import cramers_v

    docs = _t(spark, sf_dir, "documents")
    return cramers_v(docs, "lang", "source")


# ---------------------------------------------------------------------------
# Round-8 batch 4: Cochran Q, Friedman, shift function, shard mixing
# ---------------------------------------------------------------------------


def doc_cochran_q(spark, sf_dir):
    """Cochran's Q across the three binary document filters (quality,
    length, language — the fleiss raters) (evaluation.py::cochran_q,
    Cochran 1950): do the filters PASS at the same rate on the same
    docs — the significance companion to doc_fleiss_kappa's agreement
    magnitude. Two bounded reduces over a 0/1 projection."""
    from nbdatatools_spark.operators.evaluation import cochran_q

    docs = _t(spark, sf_dir, "documents")
    verdicts = (
        docs.select(
            "doc_id",
            F.lit("quality").alias("rater"),
            (F.round(quality_score(F.col("text")), 6) >= 0.5).alias("keep"),
        )
        .unionByName(
            docs.select(
                "doc_id",
                F.lit("length").alias("rater"),
                (F.col("n_chars") >= 400).alias("keep"),
            )
        )
        .unionByName(
            docs.select(
                "doc_id",
                F.lit("lang").alias("rater"),
                (F.col("lang") == "en").alias("keep"),
            )
        )
    )
    return cochran_q(verdicts, "doc_id", "rater", "keep")


def doc_friedman_test(spark, sf_dir):
    """Friedman rank test across three document scorers — quality score,
    capped length share, English indicator — blocked by document
    (stats.py::friedman_test, Friedman 1937 / Conover ties): do the
    scorers rank documents identically. Within-block ranks from a
    k^2-per-block self-join (k=3), DECIMAL reduces."""
    from nbdatatools_spark.operators.stats import friedman_test

    docs = _t(spark, sf_dir, "documents")
    scores = (
        docs.select(
            "doc_id",
            F.lit("quality").alias("scorer"),
            F.round(quality_score(F.col("text")), 6).alias("score"),
        )
        .unionByName(
            docs.select(
                "doc_id",
                F.lit("length").alias("scorer"),
                F.round(
                    F.least(F.col("n_chars") / 1000.0, F.lit(1.0)), 6
                ).alias("score"),
            )
        )
        .unionByName(
            docs.select(
                "doc_id",
                F.lit("lang").alias("scorer"),
                (F.col("lang") == "en").cast("int").cast("double").alias("score"),
            )
        )
    )
    return friedman_test(scores, "doc_id", "scorer", "score")


def events_shift_function(spark, sf_dir):
    """Doksum shift function of the event value between the user_id%2
    variants per event type (stats.py::shift_function, Doksum 1974):
    per-decile quantile differences — WHERE the distribution moved, not
    just whether. Exact interpolated percentile arrays, one aggregate
    per (group, class)."""
    from nbdatatools_spark.operators.stats import shift_function

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ev = ev.withColumn(
        "variant", F.concat(F.lit("v"), (F.col("user_id") % 2).cast("string"))
    )
    return shift_function(ev, "event_type", "variant", "value")


def doc_shard_mixing(spark, sf_dir):
    """Shard mixing audit (packing.py::shard_mixing_report): per-shard
    source entropy over the balanced_shards(8, n_chars) assignment vs
    the corpus's source entropy — balanced token mass is not enough; a
    data-loader rank must also see a MIX of domains. Two-phase shard
    assignment + bounded entropy reduces, 9dp-rounded logs."""
    from nbdatatools_spark.operators.packing import shard_mixing_report

    docs = _t(spark, sf_dir, "documents")
    return shard_mixing_report(
        docs, n_shards=8, weight_col="n_chars", group_col="source"
    )


# ---------------------------------------------------------------------------
# Round-8 batch 5: two-sample KS + semantic decontamination
# ---------------------------------------------------------------------------


def events_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov test of the event value between the
    user_id%2 variants per event type (stats.py::ks_two_sample): the
    supremum ECDF gap — the whole-distribution companion to the
    mann_whitney location test. Two-phase cumulative class counts (no
    data-sized window), asymptotic Kolmogorov p via a bounded 100-term
    series at 4dp."""
    from nbdatatools_spark.operators.stats import ks_two_sample

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ev = ev.withColumn(
        "variant", F.concat(F.lit("v"), (F.col("user_id") % 2).cast("string"))
    )
    return ks_two_sample(ev, "event_type", "variant", "value")


def embedding_decontaminate(spark, sf_dir):
    """Embedding-space test-set decontamination
    (dedup.py::semantic_decontaminate): train = vec_id < 400, test =
    re-idded copies of every 10th train vector (planted leakage, the
    cross-corpus fixture convention); the broadcast-test path whose join
    predicate IS the cosine threshold — the semantic sibling of the
    13-gram decontamination rule. Exact DECIMAL-fold cosines."""
    from nbdatatools_spark.operators.dedup import semantic_decontaminate

    emb = _t(spark, sf_dir, "embeddings")
    train = emb.where(F.col("vec_id") < 400)
    test = train.where(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1000000)
    )
    return semantic_decontaminate(
        train, test, threshold=0.95, method="broadcast"
    )


def doc_concordance(spark, sf_dir):
    """Lin's concordance correlation per source between the quality
    score and the capped length share (stats.py::concordance_ccc, Lin
    1989): Pearson r rewards any linear relation; CCC also punishes
    scale/location bias — the 'can one scorer replace the other'
    readout. ONE DECIMAL-moment aggregate per source."""
    from nbdatatools_spark.operators.stats import concordance_ccc

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        F.round(quality_score(F.col("text")), 6).alias("q"),
        F.round(F.least(F.col("n_chars") / 1000.0, F.lit(1.0)), 6).alias("l"),
    )
    return concordance_ccc(scored, "source", "q", "l")


def doc_agreement_limits(spark, sf_dir):
    """Bland-Altman limits of agreement per source for the same scorer
    pair (stats.py::agreement_limits, Bland & Altman 1986): systematic
    bias and the +-1.96 sd band of per-document disagreement — the
    points-scale companion to doc_concordance. One difference-moment
    aggregate."""
    from nbdatatools_spark.operators.stats import agreement_limits

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        F.round(quality_score(F.col("text")), 6).alias("q"),
        F.round(F.least(F.col("n_chars") / 1000.0, F.lit(1.0)), 6).alias("l"),
    )
    return agreement_limits(scored, "source", "q", "l")


def doc_mcnemar(spark, sf_dir):
    """McNemar's paired test between the quality and length filters
    (evaluation.py::mcnemar_test, McNemar 1947): is the b-vs-c
    disagreement SYMMETRIC — the significance behind
    doc_filter_agreement's kappa on the same filter pair. One
    2x2 aggregate; df=1 chi-square p via the closed-form erf identity."""
    from nbdatatools_spark.operators.evaluation import mcnemar_test

    docs = _t(spark, sf_dir, "documents")
    return mcnemar_test(
        docs,
        F.round(quality_score(F.col("text")), 6) >= 0.5,
        F.col("n_chars") >= 400,
    )


# ============================================================================
# CANDIDATE STAGING — new gates built after this round's recording
# window is attested land HERE (with their oracles), not in queries():
# the window layout above stays attested and PENDING_FIRST_RECORDING
# stays empty (the r6 verdict #7 discipline). They rotate into window
# slots at the next round's head. `scripts/check_oracle.py --candidates
# <sf_dir>` sweeps this registry with the same bit-exact compare as the
# live one, and tests/test_candidates.py pins it at sf0.001.
# ============================================================================


def doc_reservoir_sample(spark, sf_dir):
    """Deterministic fixed-size uniform sample (sampling.py::
    reservoir_sample — the bottom-k sketch formulation: the k smallest
    content-keyed md5-uint52 hashes ARE a uniform k-reservoir, with no
    sequential state and exact-k output). Partition/engine/run-invariant
    by construction; plan is one projection + TakeOrderedAndProject (no
    full sort, no shuffle). Oracle replays the md5 hash order in DuckDB
    on the shared uint52 convention."""
    from nbdatatools_spark.operators.sampling import reservoir_sample

    docs = _t(spark, sf_dir, "documents")
    return (
        reservoir_sample(docs, k=40, key_col="doc_id", seed=42)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


def doc_stratified_sample(spark, sf_dir):
    """Deterministic exactly-k-per-stratum sample (sampling.py::
    stratified_reservoir — per-source bottom-k sketch: rank by the
    content-keyed hash within each source, keep the first 8). ONE
    shuffle on the stratum key; output invariant to partitioning. The
    fixed-SIZE sibling of the rate-based stratified_sample the mixture
    pipeline uses. Oracle: DuckDB row_number over the same md5-uint52
    order."""
    from nbdatatools_spark.operators.sampling import stratified_reservoir

    docs = _t(spark, sf_dir, "documents")
    return (
        stratified_reservoir(docs, k=8, strata_col="source", key_col="doc_id", seed=42)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


def corpus_fertility_sweep(spark, sf_dir):
    """Tokenizer fertility vs vocabulary size (bpe.py::fertility_sweep,
    Ács 2019's fertility metric over BPE merge checkpoints 0/2/4/8):
    ONE corpus pass builds the word vocabulary; the merge loop and every
    checkpoint's re-fold run over the vocabulary only. Checkpoint 0 is
    character segmentation, so its token total IS the corpus-weighted
    total word length — exactly SQL-computable, giving the oracle real
    hash bite on (char_tokens, total_words) as EXACT integers (they
    encode the checkpoint-0 fertility with no float in the hash); later
    checkpoints are pinned against the monotone contract (each merge
    strictly reduces total tokens; fertility non-increasing; vocab
    non-decreasing). The merge table itself is differential-tested in
    tests/test_bpe.py; the sweep's invariants in
    tests/test_round10_candidates.py."""
    from nbdatatools_spark.operators.bpe import fertility_sweep

    docs = _t(spark, sf_dir, "documents")
    out = fertility_sweep(docs, checkpoints=(0, 2, 4, 8))
    rows = out.orderBy("n_merges").collect()
    ferts = [r["avg_fertility"] for r in rows]
    toks = [r["total_tokens"] for r in rows]
    vs = [r["vocab_size"] for r in rows]
    mono_f = all(ferts[i] >= ferts[i + 1] for i in range(len(ferts) - 1))
    mono_t = all(toks[i] >= toks[i + 1] for i in range(len(toks) - 1))
    mono_v = all(vs[i] <= vs[i + 1] for i in range(len(vs) - 1))
    base = rows[0]
    return spark.createDataFrame(
        [
            (
                int(base["total_tokens"]),
                int(base["total_words"]),
                int(len(rows)),
                bool(mono_f),
                bool(mono_t),
                bool(mono_v),
            )
        ],
        "char_tokens bigint, total_words bigint, "
        "n_checkpoints int, fertility_nonincreasing boolean, "
        "tokens_nonincreasing boolean, vocab_nondecreasing boolean",
    )


def doc_fineweb_filter(spark, sf_dir):
    """FineWeb-style composite quality filter (functions/text.py::
    fineweb_flags — Penedo et al. 2024's added line-shape heuristics +
    the Gopher repetition and C4 placeholder rules it retains — ANDed
    with gopher_quality_flags.keep; the `fineweb_filter` pipeline step
    runs the same conjunction). The synthetic corpus has no newlines, so
    the gate reshapes each doc with the SAME deterministic 7-word-line
    transform as doc_c4_filters (unpunctuated every 3rd line, injected
    lorem/brace lines on doc_id%17==3 / %19==7) so every line rule
    actually fires; the oracle replays the reshaping and every fraction
    with DuckDB list ops. Pure map-side predicate stack — no shuffle."""
    from nbdatatools_spark.functions.text import (
        fineweb_flags,
        gopher_quality_flags,
    )

    docs = _ts(spark, sf_dir, "documents")  # heavy line-reshape kernel (r10)
    w = F.split(F.trim(F.col("text")), r"\s+")
    nl = F.greatest(F.ceil(F.size(w) / F.lit(7)).cast("int"), F.lit(1))
    body = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.concat(
            F.when(i % 11 == 5, F.lit("javascript ")).otherwise(F.lit("")),
            F.concat_ws(" ", F.slice(w, i * 7 + 1, 7)),
            F.when(i % 3 == 0, F.lit("")).otherwise(F.lit(".")),
        ),
    )
    pre_lorem = F.when(
        F.col("doc_id") % 17 == 3, F.array(F.lit("lorem ipsum dolor."))
    ).otherwise(F.array().cast("array<string>"))
    pre_brace = F.when(
        F.col("doc_id") % 19 == 7, F.array(F.lit("code { sample."))
    ).otherwise(F.array().cast("array<string>"))
    shaped = docs.select(
        "doc_id",
        "text",
        F.concat_ws("\n", F.concat(pre_lorem, pre_brace, body)).alias("__shaped"),
    )
    fw = fineweb_flags(F.col("__shaped"))
    g = gopher_quality_flags(F.col("text"))
    return (
        shaped.select("doc_id", fw.alias("f"), g["keep"].alias("__gk"))
        .select(
            "doc_id",
            "f.ok_punct_lines",
            "f.ok_short_lines",
            "f.ok_dup_lines",
            "f.ok_dup_chars",
            "f.ok_placeholder",
            F.col("f.keep").alias("fineweb_keep"),
            (F.col("f.keep") & F.col("__gk")).alias("composite_keep"),
            "f.punct_line_frac",
            "f.short_line_frac",
            "f.dup_line_frac",
            "f.dup_char_frac",
            "f.n_lines",
        )
        .orderBy("doc_id")
    )


def doc_group_split(spark, sf_dir):
    """Leakage-safe group-keyed split assignment (sampling.py::
    group_split): hash the SOURCE key so every document of a source
    lands in the same split — near-duplicates (which cluster within
    sources/domains) can never straddle train/test. Pure projection;
    the gate aggregates to per-split doc and group counts, and the
    never-straddles invariant is structural (one hash per group).
    Oracle replays the md5-uint52 hash ranges per source."""
    from nbdatatools_spark.operators.sampling import group_split

    docs = _t(spark, sf_dir, "documents")
    out = group_split(
        docs, "source", fractions=(0.6, 0.2, 0.2), names=("train", "val", "test")
    )
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_groups"),
        )
        .orderBy("split")
    )


def doc_unimax_budget(spark, sf_dir):
    """UniMax mixture rates (sampling.py::unimax_rates, Chung et al.
    2023): distribute a char budget of floor(0.95 * total_chars) as
    uniformly as possible over sources at max_epochs=1 — small sources
    cap at one full pass (alloc = their size), the rest settle on the
    shared water level. With integer char weights and max_epochs=1
    every cap and cumulative sum is integer-exact, so the driver-side
    scan and the SQL window replay the same doubles; the oracle
    computes the water level with the sorted-cumsum closed form.
    Driver-side jobs during plan construction (two tiny aggregates) —
    stays mid-window per the shadowing rationale when rotated."""
    from nbdatatools_spark.operators.sampling import unimax_rates

    docs = _t(spark, sf_dir, "documents")
    total = docs.agg(F.sum("n_chars").alias("t")).first()["t"]
    budget = float(int(0.95 * float(total)))
    rates = unimax_rates(
        docs, budget=budget, strata_col="source", weight_col="n_chars",
        max_epochs=1.0,
    )
    w = {
        r["source"]: int(r["w"])
        for r in docs.groupBy("source")
        .agg(F.sum("n_chars").alias("w"))
        .collect()
    }
    rows = [
        (
            s,
            w[s],
            bool(abs(rates[s] * w[s] - w[s]) < 1e-9),
            round(rates[s] * w[s], 6),
            round(rates[s], 6),
        )
        for s in sorted(rates)
    ]
    return spark.createDataFrame(
        rows,
        "source string, w_chars bigint, capped boolean, "
        "alloc double, rate double",
    )


def doc_krippendorff(spark, sf_dir):
    """Krippendorff's alpha (evaluation.py::krippendorff_alpha,
    nominal) over the three filter raters WITH deterministic
    missingness — the agreement statistic that (unlike
    doc_fleiss_kappa) keeps partially-rated units: the quality rater
    rates every doc, the length rater skips doc_id%3==0, the lang
    rater skips doc_id%7==0, so doc_id%21==0 units carry a single
    rating and drop loudly while every other ragged unit participates.
    One (unit, category) aggregate + two bounded reduces."""
    from nbdatatools_spark.operators.evaluation import krippendorff_alpha

    docs = _t(spark, sf_dir, "documents")
    q = docs.select(
        F.col("doc_id").alias("unit"),
        (F.round(quality_score(F.col("text")), 6) >= 0.5)
        .cast("string")
        .alias("cat"),
    )
    ln = docs.where(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("unit"),
        (F.col("n_chars") >= 400).cast("string").alias("cat"),
    )
    lg = docs.where(F.col("doc_id") % 7 != 0).select(
        F.col("doc_id").alias("unit"),
        (F.col("lang") == "en").cast("string").alias("cat"),
    )
    return krippendorff_alpha(q.unionByName(ln).unionByName(lg), "unit", "cat")


def embedding_davies_bouldin(spark, sf_dir):
    """Davies-Bouldin cluster-separation index (clustering.py::
    davies_bouldin, Davies & Bouldin 1979) over the vec_id%6 synthetic
    clustering — the exact one-pass internal-quality companion to the
    sampled silhouette gate. 6dp group_centroids means, 9dp-DECIMAL
    Euclidean folds, per-cluster worst-R with (r, group) tie-break;
    avg(r_max) is the DB index. Oracle replays centroids, both distance
    passes, and the arg-max in DuckDB."""
    from nbdatatools_spark.operators.clustering import davies_bouldin

    emb = _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 6).cast("int").alias("cluster"), "embedding"
    )
    return davies_bouldin(emb, "cluster")


def corpus_wordpiece(spark, sf_dir):
    """WordPiece tokenizer training + greedy ## segmentation audit
    (wordpiece.py::learn_wordpiece — the BERT lineage: Schuster &
    Nakajima 2012; score = pair/(left*right), the public HF-tokenizers
    trainer formulation). Same distributed factorization as
    corpus_bpe_merges: ONE corpus pass builds the ##-symbol vocabulary;
    each of 8 merge steps runs over the vocabulary only.

    Pinned-invariant oracle gate (the corpus_bpe_merges pattern): the
    iterative loop is not SQL-expressible, but the FIRST merge is pure
    pair/symbol counting — the oracle replicates it exactly, including
    the score argmax, with real hash bite on (left, right, pair_count,
    left_count, right_count: the two symbol counts encode the winning
    score EXACTLY as integers, no float rounding in the hash) — and pins
    TRUE for the structural claims any correct WordPiece run satisfies:
    merge count bounded, every pair_count >= the min_count floor, every
    score in (0, 1] (pair <= min(left, right) counts), every merged
    token's character payload occurring at its claimed position class
    (word-initial for bare tokens, position > 1 for ##-continuations),
    and the greedy ## segmenter round-tripping EVERY vocabulary word
    under the learned vocab with no [UNK] and proper continuation
    discipline. The full merge table keeps its pure-Python differential
    in tests/test_wordpiece.py."""
    from nbdatatools_spark.operators.wordpiece import (
        learn_wordpiece,
        wordpiece_base_symbols,
        wordpiece_vocab,
        wordpiece_vocabulary,
        wordpiece_word_pieces,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = learn_wordpiece(docs, n_merges=8, min_count=2)
    counts = [m[3] for m in merges]
    scores = [m[4] for m in merges]
    first_l, first_r = merges[0][1], merges[0][2]
    wv = wordpiece_vocabulary(docs).localCheckpoint(eager=False)
    sym_counts = {
        r["s"]: int(r["n"])
        for r in (
            wv.select("count", F.explode("symbols").alias("s"))
            .where(F.col("s").isin([first_l, first_r]))
            .groupBy("s")
            .agg(F.sum("count").alias("n"))
            .collect()
        )
    }
    # positional containment: bare merged tokens must start some word;
    # ##-continuations must occur past position 1 of some word
    pos_checks = []
    for i, (_, left, right, _, _) in enumerate(merges):
        tok = left + (right[2:] if right.startswith("##") else right)
        if tok.startswith("##"):
            pay = tok[2:]
            cond = F.locate(pay, F.col("word"), 2) > 0
        else:
            cond = F.col("word").startswith(tok)
        pos_checks.append(F.max(cond.cast("int")).alias(f"t{i}"))
    in_pos = wv.agg(*pos_checks).first()
    vocab = wordpiece_vocab(merges, wordpiece_base_symbols(docs))
    segged = wordpiece_word_pieces(wv.select("word"), vocab)
    payload = F.concat_ws(
        "", F.transform("pieces", lambda p: F.regexp_replace(p, "^##", ""))
    )
    cont_ok = F.forall(
        F.slice("pieces", 2, F.greatest(F.size("pieces") - 1, F.lit(0))),
        lambda p: p.startswith("##"),
    )
    roundtrip = segged.agg(
        F.min(
            (
                (payload == F.col("word"))
                & ~F.array_contains("pieces", "[UNK]")
                & ~F.element_at("pieces", 1).startswith("##")
                & cont_ok
            ).cast("int")
        ).alias("ok")
    ).first()["ok"]
    row = [
        (
            first_l,
            first_r,
            int(merges[0][3]),
            sym_counts[first_l],
            sym_counts[first_r],
            bool(len(merges) <= 8),
            bool(all(c >= 2 for c in counts)),
            bool(all(0.0 < s <= 1.0 for s in scores)),
            bool(all(int(v) == 1 for v in in_pos)),
            bool(int(roundtrip) == 1),
        )
    ]
    return spark.createDataFrame(
        row,
        "first_left string, first_right string, first_count bigint, "
        "first_left_count bigint, first_right_count bigint, "
        "n_merges_bounded boolean, counts_ge_min boolean, "
        "scores_in_unit boolean, merged_tokens_positional boolean, "
        "vocab_roundtrip boolean",
    )


def _wordpiece_oracle() -> str:
    """DuckDB replica of corpus_wordpiece's FIRST merge: the ##-symbol
    vocabulary, pair and symbol counts weighted by word frequency, the
    min_count candidate floor, and the score argmax — with the winning
    pair's left/right symbol counts emitted as exact integers (they
    encode the score with no float in the hash)."""
    return f"""
        WITH nrm AS (SELECT {{norm}} AS t FROM documents),
        w AS (SELECT unnest(string_split(t, ' ')) AS word
              FROM nrm WHERE length(t) > 0),
        v AS (SELECT word, count(*) AS cnt FROM w
              WHERE word <> '' GROUP BY word),
        sy AS (SELECT word, cnt, i,
                      CASE WHEN i = 1 THEN substring(word, 1, 1)
                           ELSE '##' || substring(word, CAST(i AS INT), 1)
                      END AS s
               FROM (SELECT word, cnt,
                            unnest(generate_series(1, length(word))) AS i
                     FROM v)),
        symc AS (SELECT s, CAST(sum(cnt) AS BIGINT) AS sc
                 FROM sy GROUP BY s),
        p AS (SELECT a.s AS left_, b.s AS right_, a.cnt
              FROM sy a JOIN sy b
                ON a.word = b.word AND b.i = a.i + 1),
        agg AS (SELECT left_, right_, CAST(sum(cnt) AS BIGINT) AS c
                FROM p GROUP BY left_, right_
                HAVING sum(cnt) >= 2),
        scored AS (SELECT agg.left_, agg.right_, agg.c, l.sc AS lc, r.sc AS rc,
                          CAST(agg.c AS DOUBLE)
                              / (CAST(l.sc AS DOUBLE) * CAST(r.sc AS DOUBLE))
                              AS score
                   FROM agg JOIN symc l ON l.s = agg.left_
                            JOIN symc r ON r.s = agg.right_)
        SELECT left_ AS first_left, right_ AS first_right, c AS first_count,
               lc AS first_left_count, rc AS first_right_count,
               TRUE AS n_merges_bounded, TRUE AS counts_ge_min,
               TRUE AS scores_in_unit, TRUE AS merged_tokens_positional,
               TRUE AS vocab_roundtrip
        FROM scored ORDER BY score DESC, left_, right_ LIMIT 1
    """


def embedding_calinski_harabasz(spark, sf_dir):
    """Calinski-Harabasz variance-ratio criterion (clustering.py::
    calinski_harabasz, Calinski & Harabasz 1974) over the vec_id%6
    synthetic clustering — the GLOBAL variance-ratio companion to the
    davies_bouldin worst-pair gate: (B/(k-1))/(W/(n-k)) from 6dp
    group_centroids, a 6dp n_k-weighted global centroid, and 9dp-DECIMAL
    squared-distance folds. Oracle replays centroids, both dispersion
    sums, and the ratio in DuckDB."""
    from nbdatatools_spark.operators.clustering import calinski_harabasz

    emb = _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 6).cast("int").alias("cluster"), "embedding"
    )
    return calinski_harabasz(emb, "cluster")


def embedding_hopkins(spark, sf_dir):
    """Hopkins clusterability statistic (clustering.py::
    hopkins_statistic, Hopkins & Skellam 1954 / Lawson & Jurs 1990):
    1-NN distances of 20 uniform probes (md5-uint52 fractions of the
    per-dim bounding box, 6dp) vs 20 bottom-k-hash real probes
    (self-excluded), H = sum_u/(sum_u+sum_w) — the pre-flight "is there
    cluster structure at all" check before paying for k-means/DBSCAN.
    Both probe sets are m-row broadcast sides; 2 corpus scans, no
    corpus-keyed shuffle. Oracle replays the md5 probe construction,
    the bounding box, and both DECIMAL 1-NN sums in DuckDB."""
    from nbdatatools_spark.operators.clustering import hopkins_statistic

    return hopkins_statistic(
        _t(spark, sf_dir, "embeddings"), m=20, seed=42
    )


def embedding_lof(spark, sf_dir):
    """Local Outlier Factor (knn.py::lof_from_knn, Breunig et al. 2000)
    over the first 300 vectors with exact Euclidean 5-NN (knn.py::
    lof_scores — broadcast self-crossJoin + rank window with the
    WindowGroupLimit partial pushdown; the dbscan(method='exact')
    bounded-audit posture — corpus runs feed lof_from_knn from an ANN
    join). k-distance / reachability / lrd / LOF per the paper with the
    deterministic (dist, nbr) tie-break; 9dp distances and lrd, 6dp
    LOF. Oracle replays the pairwise ranks and all three ratio passes
    in DuckDB."""
    from nbdatatools_spark.operators.knn import lof_scores

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    return lof_scores(emb, k=5)


def events_link_prediction(spark, sf_dir):
    """Neighborhood link prediction (graph.py::link_prediction,
    Liben-Nowell & Kleinberg 2003) over the co-visitation graph: for
    distance-2 non-edges, common-neighbor count, Jaccard, and
    Adamic-Adar (DECIMAL-summed 9dp 1/ln(deg) terms); top 50 by
    (adamic_adar DESC, node_a, node_b). Candidates are generated
    through the shared-NEIGHBOR wedge join (the triangle_stats shape —
    cost sum deg^2) with the max_z_degree=100 hub-center cap applied
    BEFORE the self-join (at sf0.1 the hour-grain co-visitation graph
    is near-dense — mean degree ~184 — and the uncapped wedge join is
    54M rows / ~65s on BOTH engines; the cap bounds it to the low-degree
    centers, measured 384k wedges), never all-pairs; existing edges
    leave via one anti-join; top-50 is a TakeOrderedAndProject. Oracle
    replays the cap, the wedge join and both scores in DuckDB."""
    from nbdatatools_spark.operators.graph import (
        cooccurrence_edges,
        link_prediction,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        "h", F.date_trunc("hour", "ts")
    )
    edges = cooccurrence_edges(
        ev, ["event_type", "h"], "user_id", max_bucket=100, min_support=3
    )
    return link_prediction(edges, top_n=50, max_z_degree=100)


def doc_distinct_ngrams(spark, sf_dir):
    """Distinct-n diversity ratios (analysis.py::distinct_ngrams, Li et
    al. 2016): per (source, n<=3), unique n-gram types over n-gram
    tokens — the template-collapse readout the unigram-only
    lexical_diversity gate can't see. N-grams build JVM-side from the
    token array (transform over a position sequence + slice — no
    explode-then-window); one (group, gram) count aggregate per order.
    Oracle replays the normalized tokenizer and the positional n-gram
    construction in DuckDB."""
    from nbdatatools_spark.operators.analysis import distinct_ngrams

    return distinct_ngrams(_t(spark, sf_dir, "documents"))


def doc_temperature_scaling(spark, sf_dir):
    """Temperature scaling (evaluation.py::temperature_scaling, Guo et
    al. 2017) of the heuristic quality score against the long-document
    label: 5 fixed Newton steps on the logistic NLL in beta = 1/T, each
    a full-corpus DECIMAL aggregate cross-joined with the previous
    ONE-ROW scalar frame — the whole fit is one declarative Catalyst
    plan (no driver round-trips), beta re-rounded to 9dp per step so
    the oracle replays the optimization bit-for-bit as a 5-deep CTE
    chain. Reports beta, T, and mean NLL before/after."""
    from nbdatatools_spark.operators.evaluation import temperature_scaling

    return temperature_scaling(
        _scored_docs(spark, sf_dir), "score", "y", iterations=5
    )


def doc_ece(spark, sf_dir):
    """Expected / Maximum Calibration Error (evaluation.py::
    expected_calibration_error, Naeini et al. 2015 / Guo et al. 2017)
    of the heuristic quality score vs the long-document label over the
    same 10 fixed bins as doc_score_calibration — the one-number scalar
    that closes the calibration family (bins = diagnostic, ECE =
    scalar, temperature/isotonic = fixes). Per-bin DECIMAL confidence
    sums, 9dp gaps, n_b-weighted DECIMAL reduction."""
    from nbdatatools_spark.operators.evaluation import (
        expected_calibration_error,
    )

    return expected_calibration_error(
        _scored_docs(spark, sf_dir), "score", "y", n_bins=10, lo=0.0, hi=1.0
    )


def doc_sinkhorn_shift(spark, sf_dir):
    """Entropic-OT distribution distance (analysis.py::
    sinkhorn_distance, Cuturi 2013) between the even- and odd-doc_id
    halves' n_chars distributions: 12 fixed bins on [0, 2000], cost
    |i-j|/11, eps 0.25, 10 fixed Sinkhorn iterations as a declarative
    chain over B-row frames (the temperature_scaling discipline — u/v
    re-rounded to 9dp per half-step, K cells to 9dp, transport plan to
    12dp). ONE corpus aggregate builds both histograms (lazily
    checkpointed); everything after is B^2-bounded. Oracle replays the
    entire fixed-point loop as a GENERATED 10-deep CTE chain."""
    from nbdatatools_spark.operators.analysis import sinkhorn_distance

    docs = _t(spark, sf_dir, "documents").withColumn(
        "grp", (F.col("doc_id") % 2).cast("string")
    )
    return sinkhorn_distance(
        docs, "n_chars", "grp", "0", "1",
        n_bins=12, lo=0.0, hi=2000.0, eps=0.25, iterations=10,
    )


def corpus_sentencepiece(spark, sf_dir):
    """SentencePiece-style BPE trainer audit (bpe.py::
    learn_sentencepiece_bpe, Kudo & Richardson 2018 BPE mode): the
    Sennrich merge loop over U+2581-marked words — completing the
    deployed-tokenizer lineage (plain BPE, byte-level BPE, WordPiece,
    unigram LM, and now the SentencePiece whitespace-marker form).

    Pinned-invariant oracle gate (the corpus_bpe_merges pattern): the
    FIRST merge is pure pair counting over the marked vocabulary — the
    oracle replicates it exactly (left, right, exact integer count) —
    and pins TRUE for the structural claims any correct run satisfies:
    merge count bounded, every pair count >= the min_count floor, and
    the segmenter's LOSSLESS round-trip (concat tokens, map U+2581 back
    to space, trim == the normalized text) holding for EVERY document —
    the property that distinguishes the SentencePiece form from ##-style
    WordPiece. Full merge-table differential in
    tests/test_round10_batch4.py."""
    from nbdatatools_spark.operators.bpe import (
        SP_MARK,
        learn_sentencepiece_bpe,
        sentencepiece_segment,
    )
    from nbdatatools_spark.functions.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    merges = learn_sentencepiece_bpe(docs, n_merges=8, min_count=2)
    seg = sentencepiece_segment(docs, merges)
    detok = F.trim(
        F.regexp_replace(
            F.concat_ws("", F.col("sp_tokens")), SP_MARK, " "
        )
    )
    roundtrip = seg.agg(
        F.min(
            (
                detok
                == F.coalesce(normalize_text(F.col("text")), F.lit(""))
            ).cast("int")
        ).alias("rt")
    ).collect()[0]["rt"]
    row = [
        (
            merges[0][1],
            merges[0][2],
            int(merges[0][3]),
            bool(len(merges) <= 8),
            bool(all(int(m[3]) >= 2 for m in merges)),
            bool(int(roundtrip) == 1),
        )
    ]
    return spark.createDataFrame(
        row,
        "first_left string, first_right string, first_count bigint, "
        "n_merges_bounded boolean, counts_ge_min boolean, "
        "roundtrip_exact boolean",
    )


def doc_packing_efficiency(spark, sf_dir):
    """Packing-quality audit (packing.py::packing_efficiency) of the
    doc_pack_sequences configuration (concat-then-chunk at 2048,
    n_chars as the token count): split-document fraction
    (attention-contamination), mean documents touching a sequence, and
    tail padding waste. Two-phase partition-offset cumsum + ONE
    map-side aggregate; all-integer internals, 6dp ratios."""
    from nbdatatools_spark.operators.packing import packing_efficiency

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("n_tokens")
    )
    return packing_efficiency(docs, 2048)


def corpus_vocab_richness(spark, sf_dir):
    """Unseen-vocabulary estimators per source (analysis.py::
    vocab_richness): Chao1 lower bound (bias-corrected), Good-Turing
    missing mass V1/N, Herdan's C — what lexical_diversity measures
    about the OBSERVED vocabulary, these extrapolate about the unseen
    one (the "how much new vocabulary is left to crawl" planner). Two
    count aggregates -> exact-integer spectrum -> closed forms."""
    from nbdatatools_spark.operators.analysis import vocab_richness

    return vocab_richness(_t(spark, sf_dir, "documents"))


def doc_distinct_ngrams_hll(spark, sf_dir):
    """HLL scale path for distinct-n diversity (analysis.py::
    approx_distinct_ngrams): per (source, n<=3), the distinct n-gram
    TYPE count estimated by a 1024-register HyperLogLog — at 100 TB the
    exact (group, gram) table IS the corpus; this shuffles at most
    partitions x 1024 partial registers per slice. DETERMINISTIC
    (md5-uint52 registers, exact-integer harmonic sums), so the oracle
    replays the sketch itself bit-for-bit — the corpus_hll_distinct
    discipline at the (group, n) grain; relative error vs the exact
    operator pinned in tests/test_round10_batch5.py."""
    from nbdatatools_spark.operators.analysis import approx_distinct_ngrams

    return approx_distinct_ngrams(
        _t(spark, sf_dir, "documents"), precision=10
    )


def doc_hill_tail(spark, sf_dir):
    """Hill tail-index of the document-length distribution per source
    (analysis.py::hill_tail_index, Hill 1975) — the heavy-tail risk
    planner for the packing/batching family: alpha <= 2 means extreme
    documents dominate the token budget. k=20 largest order statistics
    per slice via ONE rank window (WindowGroupLimit partial pushdown),
    9dp DECIMAL log sums. Oracle replays the order statistics and the
    estimator in DuckDB (value-grain ordering, so boundary ties are
    multiset-deterministic)."""
    from nbdatatools_spark.operators.analysis import hill_tail_index

    return hill_tail_index(
        _t(spark, sf_dir, "documents"), "n_chars", "source", k=20
    )


def doc_rarity_scores(spark, sf_dir):
    """Per-document vocabulary-rarity score (analysis.py::
    rarity_scores): occurrence-weighted mean smoothed IDF — LOW =
    boilerplate/stopword soup, HIGH = specialized-or-noisy vocabulary;
    the curation signal between quality filters and dedup. One
    vocabulary-grain df aggregate + one token-keyed join + one
    doc-keyed reduce. Integer-nano discipline: BIGINT idf nanos and a
    pure-integer half-up micro mean — a float round(sum/n, 6) lands on
    6dp TIES for small round token counts and the two engines' tie
    paths differ (observed at sf0.1; see the operator docstring).
    Oracle replays the integer arithmetic in DuckDB."""
    from nbdatatools_spark.operators.analysis import rarity_scores

    return rarity_scores(_t(spark, sf_dir, "documents"))


# ============================================================================
# ROUND-11 CANDIDATE GATES (staged during round 10): KN perplexity
# apply-at-scale, per-slice score-PSI drift, dataset-card snapshot diff,
# LSH recall/cost tradeoff — the VERDICT r9 task-8 user-pull set.
# ============================================================================


def doc_kn_perplexity(spark, sf_dir):
    """Per-document interpolated Kneser-Ney bigram perplexity (lm.py::
    kn_perplexity_score, Chen & Goodman 1998) against a model trained
    on the held-in two thirds (doc_id % 3 != 0), scoring the held-out
    third — the apply-at-scale gate the KN family was missing
    (doc_kneser_ney reports the model's top bigrams; this SCORES
    documents with the model, the CCNet-style quality tier input with
    the production smoothing). Three LEFT digest joins onto the scored
    bigram stream, the three-way backoff CASE (known w1 / unseen w1 ->
    pure continuation / double-unseen -> KenLM-style 1e-9 floor),
    INTEGER-NANO logp mean (the rarity_scores 6dp-tie discipline).
    Oracle replays the model tables, backoff CASE, and integer mean."""
    from nbdatatools_spark.operators.lm import kn_perplexity_score

    docs = _t(spark, sf_dir, "documents")
    return kn_perplexity_score(
        docs.where(F.col("doc_id") % 3 != 0),
        docs.where(F.col("doc_id") % 3 == 0),
        discount=0.75,
        floor=1e-9,
    )


def doc_score_psi_drift(spark, sf_dir):
    """Per-source PSI of the 6dp heuristic quality score between the
    even-doc_id (baseline) and odd-doc_id (current) snapshots
    (evaluation.py::score_psi) — the calibration-drift composite the
    score_quantile_align family was missing: embedding_psi_drift
    watches the representation, THIS watches the decision variable
    itself per slice. 10 fixed bins on [0, 1], add-one smoothing, full
    per-group grid, 9dp DECIMAL-summed (p-q)ln(p/q) terms."""
    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.evaluation import score_psi

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.round(quality_score(F.col("text")), 6).alias("score"),
    )
    return score_psi(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        "score",
        "source",
        n_bins=10,
        lo=0.0,
        hi=1.0,
    )


def doc_card_diff(spark, sf_dir):
    """Dataset-card snapshot diff (analysis.py::dataset_card_diff):
    old = even doc_ids, new = odd doc_ids with source 'src0' relabeled
    'src0_v2' — so the gate exercises all four statuses (removed src0,
    added src0_v2, changed/unchanged elsewhere). Per-slice metric
    deltas are differences of already-6dp card metrics (no new float
    accumulation); one slice-grain full-outer join."""
    from nbdatatools_spark.operators.analysis import dataset_card_diff

    docs = _t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1).withColumn(
        "source",
        F.when(F.col("source") == "src0", F.lit("src0_v2")).otherwise(
            F.col("source")
        ),
    )
    return dataset_card_diff(old, new)


def embedding_lsh_tradeoff(spark, sf_dir):
    """LSH recall@k vs candidate-cost curve (similarity.py::
    lsh_tradeoff_report): ties the ANN tuning loop to a driver-oracled
    gate — for n_bits in {4, 8, 12}, recall of LSH top-10 against
    exact cosine top-10 (id-set comparison) and the mean bucket-join
    candidate count (the portable cost proxy; wall latency is a box
    artifact). The seeded hyperplanes inline as literals, so the
    oracle replays signatures, bucket joins, exact ranks, and both
    ratios bit-for-bit per setting."""
    from nbdatatools_spark.operators.similarity import lsh_tradeoff_report

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    return lsh_tradeoff_report(
        q, emb, k=10, dim=64, bits_list=(4, 8, 12), seed=42
    )


def doc_mink_prob(spark, sf_dir):
    """Min-K% Prob contamination/membership signal (lm.py::
    mink_prob_score, Shi et al. 2023): per held-out document, the mean
    log probability of its 20% least-probable bigrams under the
    held-in KN model — the memorization audit (a document the model
    knows has NO very-surprising spans). Shares the doc_kn_perplexity
    scored term stream; ONE per-doc rank window (ties value-grain
    deterministic) + integer half-up micro mean. Oracle replays the
    term CTEs, the rank, and the integer mean."""
    from nbdatatools_spark.operators.lm import mink_prob_score

    docs = _t(spark, sf_dir, "documents")
    return mink_prob_score(
        docs.where(F.col("doc_id") % 3 != 0),
        docs.where(F.col("doc_id") % 3 == 0),
        k_pct=0.2,
        discount=0.75,
        floor=1e-9,
    )


def doc_gwet_ac1(spark, sf_dir):
    """Gwet's AC1 agreement (evaluation.py::gwet_ac1, Gwet 2008) over
    the same three-rater ragged panel as doc_krippendorff (quality
    rates all, length skips doc_id%3==0, lang skips doc_id%7==0) —
    the prevalence-stable companion the kappa family needs: on skewed
    label splits kappa collapses toward 0 while AC1 tracks the
    observed agreement. Ragged items participate (>= 2 raters);
    single-rating items (doc_id%21==0) drop loudly. One (item,
    category) aggregate + two bounded reduces."""
    from nbdatatools_spark.operators.evaluation import gwet_ac1

    docs = _t(spark, sf_dir, "documents")
    q = docs.select(
        F.col("doc_id").alias("unit"),
        F.lit("q").alias("rater"),
        (F.round(quality_score(F.col("text")), 6) >= 0.5)
        .cast("string")
        .alias("cat"),
    )
    ln = docs.where(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("unit"),
        F.lit("len").alias("rater"),
        (F.col("n_chars") >= 400).cast("string").alias("cat"),
    )
    lg = docs.where(F.col("doc_id") % 7 != 0).select(
        F.col("doc_id").alias("unit"),
        F.lit("lang").alias("rater"),
        (F.col("lang") == "en").cast("string").alias("cat"),
    )
    return gwet_ac1(q.unionByName(ln).unionByName(lg), "unit", "rater", "cat")


def doc_auc_delong(spark, sf_dir):
    """ROC-AUC with the DeLong variance and 95% normal CI
    (evaluation.py::auc_delong_ci, DeLong et al. 1988 / Sun & Xu 2014
    midranks) for the heuristic quality score vs the long-document
    label — the error bar doc_quality_auc was missing. Placement
    values at the (score)-group grain over the ranking_auc two-phase
    partition-offset rank sums; 9dp DECIMAL-summed moments; one fixed
    double variance expression both engines replay."""
    from nbdatatools_spark.operators.evaluation import auc_delong_ci

    return auc_delong_ci(_scored_docs(spark, sf_dir), "score", "y")


def doc_sliced_ece(spark, sf_dir):
    """Per-source Expected/Maximum Calibration Error (evaluation.py::
    expected_calibration_error with group_col — Naeini et al. 2015) of
    the heuristic quality score vs the long-document label: the sliced
    calibration audit doc_sliced_auc has for ranking — a scorer can be
    globally calibrated (doc_ece) while badly mis-calibrated on
    individual slices, which is exactly how per-source curation bias
    hides. Same 10 fixed bins; one (source x bin) aggregate + one
    source-grain reduce."""
    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.evaluation import (
        expected_calibration_error,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "source",
        F.round(quality_score(F.col("text")), 6).alias("score"),
        (F.col("n_chars") >= 400).alias("y"),
    )
    return expected_calibration_error(
        docs, "score", "y", n_bins=10, lo=0.0, hi=1.0, group_col="source"
    )


def doc_filter_funnel(spark, sf_dir):
    """Cumulative filter-attrition funnel (plans/pipeline.py::
    filter_funnel): the curation-ablation table (C4/Gopher appendix
    attrition, RefinedWeb Table 2, FineWeb funnel) for the chain
    lang=en -> quality >= 0.3 -> 100 <= n_chars <= 20000 -> >= 20
    tokens. ONE corpus pass: cumulative boolean flags, one global
    aggregate, the k+1 report rows unfold declaratively; pcts are
    pure-integer half-up 6dp ratios (integer/integer quotients are
    exactly the cross-engine rounding-tie class)."""
    from nbdatatools_spark.functions.text import quality_score, token_count
    from nbdatatools_spark.plans.pipeline import filter_funnel

    docs = _t(spark, sf_dir, "documents")
    stages = [
        ("lang_en", F.col("lang") == "en"),
        ("quality_ge_030", F.round(quality_score(F.col("text")), 6) >= 0.3),
        ("len_100_20000", F.col("n_chars").between(100, 20000)),
        ("min_20_tokens", token_count(F.col("text")) >= 20),
    ]
    return filter_funnel(docs, stages)


def doc_source_perplexity(spark, sf_dir):
    """Per-source Kneser-Ney perplexity tiers (lm.py::
    kn_perplexity_by_slice): the CCNet domain-quality table — slice
    mean of the per-doc integer-micro KN means (train = doc_id%3 != 0,
    score = the held-out third, the doc_kn_perplexity split), ntile(3)
    head/middle/tail ordered by (mean micro, source). Both means are
    pure-integer half-up (doc and source counts are small round
    denominators — the 6dp-tie class); perplexity = exp at 6dp
    (off-grid, float-round safe)."""
    from nbdatatools_spark.operators.lm import kn_perplexity_by_slice

    docs = _t(spark, sf_dir, "documents")
    return kn_perplexity_by_slice(
        docs.where(F.col("doc_id") % 3 != 0),
        docs.where(F.col("doc_id") % 3 == 0),
        slice_col="source",
        discount=0.75,
        floor=1e-9,
    )


def embedding_label_drift(spark, sf_dir):
    """Per-label centroid drift between embedding snapshots
    (analysis.py::centroid_drift): even vec_ids = snapshot A, odd =
    snapshot B; per-label centroid cosine + L2 — the class-conditional
    companion to embedding_psi_drift's marginal histograms (a new
    encoder checkpoint moves class means first). round(,9) DECIMAL
    folds for every cross-partition sum; 6dp outputs."""
    from nbdatatools_spark.operators.analysis import centroid_drift

    emb = _t(spark, sf_dir, "embeddings")
    return centroid_drift(
        emb.where(F.col("vec_id") % 2 == 0),
        emb.where(F.col("vec_id") % 2 == 1),
        group_col="label",
        vec_col="embedding",
    )


def doc_dedup_savings(spark, sf_dir):
    """Token-weighted dedup impact report (dedup.py::dedup_savings):
    per near-dup cluster-size bucket, the documents and tokens a
    min-id-survivor transitive MinHash pass removes — the capacity
    answer ("how many tokens does the run buy?") behind
    doc_dedup_cluster_sizes' distribution. Same banded-LSH -> Jaccard ->
    components chain; the oracle replays it with the RECURSIVE
    reachability CTE plus arg_min survivor tokens. All-integer output."""
    from nbdatatools_spark.operators.dedup import dedup_savings

    return dedup_savings(
        _t(spark, sf_dir, "documents"),
        num_hashes=32,
        bands=8,
        shingle_size=5,
        threshold=0.5,
        impl="md5",
    )


def doc_source_contamination(spark, sf_dir):
    """Per-source contamination dashboard (dedup.py::
    contamination_by_slice): the domain-grain rollup of the 13-gram
    decontamination rule (Dodge et al. 2021 report C4 benchmark overlap
    by domain) — test = doc_id % 101 == 0 (the doc_contamination_frac
    split), per source the docs/tokens carrying any test 13-gram with
    integer half-up 6dp rates. Grams shuffle as 8-byte hashes; the
    oracle replays string grams (same parity precedent as
    doc_contamination_frac)."""
    from nbdatatools_spark.operators.dedup import contamination_by_slice

    docs = _t(spark, sf_dir, "documents")
    return contamination_by_slice(
        docs.where(F.col("doc_id") % 101 != 0),
        docs.where(F.col("doc_id") % 101 == 0),
        slice_col="source",
        n=13,
    )


def candidate_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Round-11 rotation candidates: same contract as queries(), kept out
    of the live window so the round-10 recording layout stays attested.
    The 23 round-10 candidates rotated into window slots 0-18 + 44-47 at
    the round-10 head (see the queries() docstring); new round-11 gates
    stage here with their oracles in candidate_oracles() until the
    round-11 rotation. Verify each at sf0.001, sf0.01, under 7 shuffle
    partitions, and (for anything join/explode-heavy) sf0.1 before it
    rotates — `python scripts/check_oracle.py <sf_dir> --candidates`.

    Round-11 rotation plan (all 13 candidates verified hash-exact at
    sf0.001/sf0.01/sf0.1 + 7 shuffle partitions this round): slots 0-9
    take the plan-light gates (score_psi_drift, card_diff,
    lsh_tradeoff, gwet_ac1, auc_delong, sliced_ece, filter_funnel,
    label_drift, dedup_savings, source_contamination); the three
    KN-family gates
    (kn_perplexity, mink_prob, source_perplexity) go LATE per the
    shadowing rationale — `_kn_model_tables` collects the n_types
    scalar during plan construction, which runs a driver job. Displace
    long-green head entries to the tail; keep fit_embeddings_model
    pinned at 49.
    """
    return {
        "doc_kn_perplexity": doc_kn_perplexity,
        "doc_score_psi_drift": doc_score_psi_drift,
        "doc_card_diff": doc_card_diff,
        "embedding_lsh_tradeoff": embedding_lsh_tradeoff,
        "doc_mink_prob": doc_mink_prob,
        "doc_gwet_ac1": doc_gwet_ac1,
        "doc_auc_delong": doc_auc_delong,
        "doc_sliced_ece": doc_sliced_ece,
        "doc_filter_funnel": doc_filter_funnel,
        "doc_source_perplexity": doc_source_perplexity,
        "embedding_label_drift": embedding_label_drift,
        "doc_dedup_savings": doc_dedup_savings,
        "doc_source_contamination": doc_source_contamination,
    }


# Shared SQL fragments for the round-8 candidate oracles: the repo's
# DECIMAL-sum convention and the tie-averaged per-(group, value) rank
# table (cum-count window on the COLLAPSED count table — the oracle may
# use plain windows; only the engine needs the two-phase discipline).
_DS = "CAST(sum(CAST(round({x}, 9) AS DECIMAL(30,9))) AS DOUBLE)"


def _rank_ctes(base_sql: str) -> str:
    """CTEs: base(g, c, s) -> cnt/rk (tie-averaged ranks per (g, s)) and
    tt (per-group sum of t^3 - t tie terms)."""
    return f"""
        base AS ({base_sql}),
        cnt AS (SELECT g, s, count(*) AS n FROM base GROUP BY g, s),
        rk AS (SELECT g, s, n,
                      CAST(coalesce(sum(n) OVER (PARTITION BY g ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS BIGINT) + (n + 1) / 2.0 AS avg_rank
               FROM cnt),
        tt AS (SELECT g, {_DS.format(x='n*n*n - n')} AS tt
               FROM rk GROUP BY g)
    """


# A-S 7.1.26 two-sided p-value from a z column named {z}: 4dp (the
# ks/ab_test libm discipline). {t} = 1/(1 + 0.3275911*|z|/sqrt(2)).
def _p2_sql(z: str) -> str:
    import math

    s2 = repr(math.sqrt(2.0))
    t = f"(1.0/(1.0 + 0.3275911*(abs({z})/{s2})))"
    poly = (
        f"(0.254829592*{t} - 0.284496736*power({t},2) + 1.421413741*power({t},3)"
        f" - 1.453152027*power({t},4) + 1.061405429*power({t},5))"
    )
    return (
        f"round(1.0 - (1.0 - {poly} * exp(-(abs({z})/{s2})*(abs({z})/{s2}))), 4) + 0.0"
    )


def _temperature_oracle(iterations: int = 5) -> str:
    """DuckDB replica of doc_temperature_scaling: the 5-step Newton
    chain as GENERATED CTEs — it_i cross-joins it_{i-1}'s one-row beta
    back over the logits, re-rounding beta to 9dp per step exactly as
    the engine does, so the whole optimization replays bit-for-bit."""
    dsum = (
        "CAST(CAST(sum(CAST(round({x}, 9) AS DECIMAL(30,9)))"
        " AS DECIMAL(38,9)) AS DOUBLE)"
    )

    def p(b: str) -> str:
        return f"(1.0/(1.0 + exp(-({b}) * l)))"

    def nll(b: str) -> str:
        pc = (
            f"least(greatest({p(b)}, {1e-12!r}), {1.0 - 1e-12!r})"
        )
        return dsum.format(
            x=f"-(y * ln({pc}) + (1 - y) * ln(1.0 - {pc}))"
        )

    ctes = [
        f"""sc AS (
            SELECT round(ln(s / (1.0 - s)), 9) AS l, y FROM (
                SELECT least(greatest({{q6}}, {1e-6!r}), {1.0 - 1e-6!r}) AS s,
                       CAST(n_chars >= 400 AS INT) AS y
                FROM documents))""",
        "it0 AS (SELECT 1.0 AS b)",
    ]
    for i in range(1, iterations + 1):
        pb = p("pv.b")
        ctes.append(
            f"""it{i} AS (
            SELECT CASE WHEN h > 0.0 THEN round(b0 - g / h, 9)
                        ELSE b0 END AS b
            FROM (SELECT max(pv.b) AS b0,
                         {dsum.format(x=f'({pb} - y) * l')} AS g,
                         {dsum.format(x=f'{pb} * (1.0 - {pb}) * l * l')} AS h
                  FROM sc CROSS JOIN it{i - 1} pv))"""
        )
    ctes.append(
        f"""base AS (
            SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
                   {nll('1.0')} AS nb
            FROM sc)"""
    )
    ctes.append(
        f"""fit AS (
            SELECT max(fv.b) AS bf, {nll('fv.b')} AS na
            FROM sc CROSS JOIN it{iterations} fv)"""
    )
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body}
        SELECT CAST(base.n AS BIGINT) AS n, base.n_pos,
               round(fit.bf, 6) + 0.0 AS beta,
               round(CASE WHEN fit.bf <> 0.0 THEN 1.0 / fit.bf END, 6)
                   + 0.0 AS temperature,
               round(base.nb / base.n, 6) + 0.0 AS nll_before,
               round(fit.na / base.n, 6) + 0.0 AS nll_after
        FROM base CROSS JOIN fit
    """


def _sinkhorn_oracle(
    n_bins: int = 12,
    lo: float = 0.0,
    hi: float = 2000.0,
    eps: float = 0.25,
    iterations: int = 10,
) -> str:
    """DuckDB replica of doc_sinkhorn_shift: histograms, the Gibbs
    kernel, and the ENTIRE fixed-point loop as a generated CTE chain
    (sa_t/v_t/sb_t/u_t per iteration), re-rounding u/v to 9dp per
    half-step exactly as the engine does."""
    B = n_bins
    width = (hi - lo) / B
    den = float(B - 1)
    dsum9 = (
        "CAST(CAST(sum(CAST(round({x}, 9) AS DECIMAL(30,9)))"
        " AS DECIMAL(38,9)) AS DOUBLE)"
    )
    ctes = [
        f"bins AS (SELECT CAST(unnest(generate_series(0, {B - 1})) AS INT)"
        " AS b)",
        f"""bv AS (
            SELECT CAST(doc_id % 2 AS VARCHAR) AS g,
                   least(greatest(CAST(floor((CAST(n_chars AS DOUBLE)
                       - {lo!r}) / {width!r}) AS INT), 0), {B - 1}) AS b
            FROM documents WHERE n_chars IS NOT NULL)""",
        "cnt AS (SELECT g, b, count(*) AS c FROM bv GROUP BY g, b)",
        "ta AS (SELECT sum(c) AS n FROM cnt WHERE g = '0')",
        "tb AS (SELECT sum(c) AS n FROM cnt WHERE g = '1')",
        """ha AS (SELECT bins.b,
                   round(coalesce(cnt.c, 0) / ta.n, 9) AS m
            FROM bins LEFT JOIN cnt ON cnt.b = bins.b AND cnt.g = '0'
                 CROSS JOIN ta)""",
        """hb AS (SELECT bins.b,
                   round(coalesce(cnt.c, 0) / tb.n, 9) AS m
            FROM bins LEFT JOIN cnt ON cnt.b = bins.b AND cnt.g = '1'
                 CROSS JOIN tb)""",
        f"""km AS (SELECT x.b AS i, y.b AS j,
                   round(abs(x.b - y.b) / {den!r}, 9) AS cst,
                   round(exp(-(abs(x.b - y.b) / {den!r}) / {eps!r}), 9) AS k
            FROM bins x CROSS JOIN bins y)""",
        "u0 AS (SELECT b AS i, CASE WHEN m > 0.0 THEN 1.0 ELSE 0.0 END AS u"
        " FROM ha)",
    ]
    # AS MATERIALIZED: DuckDB inlines plain CTEs, and v_t is referenced
    # twice per level (by sb_t and by the final plan), which makes the
    # inlined expression tree EXPONENTIAL in the iteration count — the
    # query never finishes at 10 iterations without materialization
    for t in range(1, iterations + 1):
        ctes.append(
            f"""sa{t} AS MATERIALIZED (
            SELECT km.j, {dsum9.format(x='km.k * u.u')} AS s
            FROM km JOIN u{t - 1} u ON u.i = km.i GROUP BY km.j)"""
        )
        ctes.append(
            f"""v{t} AS MATERIALIZED (SELECT hb.b AS j,
                   CASE WHEN s.s > 0.0 THEN round(hb.m / s.s, 9)
                        ELSE 0.0 END AS v
            FROM hb JOIN sa{t} s ON s.j = hb.b)"""
        )
        ctes.append(
            f"""sb{t} AS MATERIALIZED (
            SELECT km.i, {dsum9.format(x='km.k * v.v')} AS s
            FROM km JOIN v{t} v ON v.j = km.j GROUP BY km.i)"""
        )
        ctes.append(
            f"""u{t} AS MATERIALIZED (SELECT ha.b AS i,
                   CASE WHEN s.s > 0.0 THEN round(ha.m / s.s, 9)
                        ELSE 0.0 END AS u
            FROM ha JOIN sb{t} s ON s.i = ha.b)"""
        )
    ctes.append(
        f"""pl AS (SELECT km.j, km.cst, round(u.u * km.k * v.v, 12) AS p
            FROM km JOIN u{iterations} u ON u.i = km.i
                    JOIN v{iterations} v ON v.j = km.j)"""
    )
    ctes.append(
        f"tot AS (SELECT {dsum9.format(x='p * cst')} AS cost FROM pl)"
    )
    # column-marginal residual vs b: the loop ends on a u-update, so
    # row sums equal ha by construction — only the hb-side residual
    # reflects mixing (round-10 ADVICE fix, mirrors sinkhorn_distance)
    ctes.append(
        """re AS (SELECT j, CAST(CAST(sum(CAST(p AS DECIMAL(30,12)))
            AS DECIMAL(38,12)) AS DOUBLE) AS cs FROM pl GROUP BY j)"""
    )
    ctes.append(
        f"""me AS (SELECT {dsum9.format(x='abs(re.cs - hb.m)')} AS err
            FROM re JOIN hb ON hb.b = re.j)"""
    )
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body}
        SELECT CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
               round(tot.cost, 6) + 0.0 AS cost,
               round(me.err, 6) + 0.0 AS marginal_err
        FROM ta CROSS JOIN tb CROSS JOIN tot CROSS JOIN me
    """


def _kn_terms_ctes(discount: float = 0.75, floor: float = 1e-9) -> str:
    """Shared CTE chain for the KN scoring oracles (doc_kn_perplexity /
    doc_mink_prob): model tables from the held-in slice (string-keyed —
    grouping by strings equals grouping by their 1:1 md5 digests), the
    three-way backoff CASE, and the 9dp -ln(p) BIGINT nano terms."""
    d = repr(float(discount))
    fl = repr(float(floor))
    return f"""t AS (
            SELECT {_LTOKENS} AS a FROM documents
            WHERE doc_id % 3 <> 0 AND length(trim(text)) > 0),
        prs AS (
            SELECT unnest(list_transform(range(2, len(a) + 1),
                          i -> struct_pack(w1 := a[i - 1], w2 := a[i]))) AS p
            FROM t WHERE len(a) >= 2),
        pairs AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM prs),
        types AS (SELECT w1, w2, count(*) AS nb FROM pairs GROUP BY w1, w2),
        c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
        nf AS (SELECT w1, count(*) AS nf FROM types GROUP BY w1),
        np AS (SELECT w2, count(*) AS np FROM types GROUP BY w2),
        nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM types),
        s0 AS (
            SELECT doc_id, {_LTOKENS} AS a FROM documents
            WHERE doc_id % 3 = 0 AND length(trim(text)) > 0),
        sprs AS (
            SELECT doc_id,
                   unnest(list_transform(range(2, len(a) + 1),
                          i -> struct_pack(w1 := a[i - 1], w2 := a[i]))) AS p
            FROM s0 WHERE len(a) >= 2),
        spairs AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM sprs),
        jt AS (
            SELECT s.doc_id, ty.nb, c1.c1, nf.nf,
                   coalesce(np.np, 0) AS np, nt.nt
            FROM spairs s
            LEFT JOIN types ty ON ty.w1 = s.w1 AND ty.w2 = s.w2
            LEFT JOIN c1 ON c1.w1 = s.w1
            LEFT JOIN nf ON nf.w1 = s.w1
            LEFT JOIN np ON np.w2 = s.w2
            CROSS JOIN nt),
        pp AS (
            SELECT doc_id,
                   CASE WHEN c1 IS NOT NULL THEN
                       greatest(coalesce(nb, 0) - {d}, 0.0) / c1
                       + (({d} * nf) / c1) * (np / nt)
                   ELSE np / nt END AS praw,
                   CASE WHEN nb IS NULL THEN 1 ELSE 0 END AS u
            FROM jt),
        terms AS (
            SELECT doc_id,
                   CAST(round(round(-ln(CASE WHEN praw > 0.0 THEN praw
                                             ELSE {fl} END), 9)
                              * 1e9, 0) AS BIGINT) AS tn,
                   u
            FROM pp)"""


def _kn_perplexity_oracle(discount: float = 0.75, floor: float = 1e-9) -> str:
    """DuckDB replica of doc_kn_perplexity: the shared KN term CTEs +
    the pure-integer half-up micro mean."""
    return f"""
        WITH {_kn_terms_ctes(discount, floor)},
        ag AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(tn) AS BIGINT) AS s,
                   CAST(sum(u) AS BIGINT) AS nu
            FROM terms GROUP BY doc_id)
        SELECT doc_id, n AS n_bigrams, nu AS n_unseen,
               -(CAST((s + 500 * n) // (1000 * n) AS DOUBLE) / 1e6) + 0.0
                   AS mean_logp,
               round(exp(CAST((s + 500 * n) // (1000 * n) AS DOUBLE) / 1e6),
                     6) + 0.0 AS perplexity
        FROM ag ORDER BY doc_id
    """


def _mink_prob_oracle(
    k_pct: float = 0.2, discount: float = 0.75, floor: float = 1e-9
) -> str:
    """DuckDB replica of doc_mink_prob: the shared KN term CTEs, a
    per-doc rank on the nano term DESC (ties are value-grain
    deterministic — tied terms carry the identical value), keep
    max(1, floor(k_pct * n)), integer half-up micro mean."""
    kp = repr(float(k_pct))
    return f"""
        WITH {_kn_terms_ctes(discount, floor)},
        rk AS (
            SELECT doc_id, tn,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tn DESC) AS r,
                   count(*) OVER (PARTITION BY doc_id) AS n
            FROM terms),
        kept AS (
            SELECT doc_id, n, tn,
                   greatest(1, CAST(floor({kp} * n) AS INT)) AS k
            FROM rk
            WHERE r <= greatest(1, CAST(floor({kp} * n) AS INT))),
        ag AS (
            SELECT doc_id, CAST(max(n) AS BIGINT) AS n,
                   CAST(max(k) AS INT) AS k,
                   CAST(sum(tn) AS BIGINT) AS s
            FROM kept GROUP BY doc_id)
        SELECT doc_id, n AS n_bigrams, k AS k_used,
               -(CAST((s + 500 * k) // (1000 * k) AS DOUBLE) / 1e6) + 0.0
                   AS mink_logp
        FROM ag ORDER BY doc_id
    """


def _card_sql(where: str, relabel: bool = False) -> str:
    """The dataset_card oracle body parameterized by snapshot: WHERE
    clause + optional src0 -> src0_v2 relabel (the diff gate's 'added/
    removed' exercise). Mirrors the doc_dataset_card oracle exactly."""
    src = (
        "CASE WHEN source = 'src0' THEN 'src0_v2' ELSE source END"
        if relabel
        else "source"
    )
    return f"""(
        WITH doc AS (
            SELECT {src} AS slice, lang, {_NTOK} AS ntok,
                   md5({_NORM}) AS dig,
                   CAST(round({_PUNCT}, 9) AS DECIMAL(20,9)) AS punct
            FROM documents WHERE {where}),
        ps AS (
            SELECT slice, count(*) AS n_docs,
                   CAST(sum(ntok) AS BIGINT) AS total_tokens,
                   round(CAST(sum(ntok) AS DOUBLE) / count(*), 6)
                     AS mean_tokens,
                   round(quantile_cont(ntok, 0.5), 6) AS p50_tokens,
                   count(DISTINCT dig) AS nd,
                   round(CAST(CAST(sum(punct) AS DECIMAL(38,9)) AS DOUBLE)
                         / count(*), 6) AS mean_punct_ratio
            FROM doc GROUP BY slice),
        lc AS (SELECT slice, lang, count(*) AS nl
               FROM doc GROUP BY slice, lang),
        st AS (SELECT slice, CAST(sum(nl) AS BIGINT) AS n,
                      count(*) AS n_langs
               FROM lc GROUP BY slice),
        ent AS (
            SELECT lc.slice, st.n_langs,
                   round(-CAST(CAST(sum(CAST(round(
                         (CAST(nl AS DOUBLE) / n)
                         * ln(CAST(nl AS DOUBLE) / n), 12)
                         AS DECIMAL(24,12))) AS DECIMAL(38,12)) AS DOUBLE), 6)
                     AS lang_entropy
            FROM lc JOIN st ON lc.slice = st.slice
            GROUP BY lc.slice, st.n_langs)
        SELECT ps.slice, ps.n_docs, ps.total_tokens, ps.mean_tokens,
               ps.p50_tokens,
               round(1.0 - nd / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
               ent.n_langs, ent.lang_entropy, ps.mean_punct_ratio
        FROM ps JOIN ent ON ps.slice = ent.slice)"""


def _card_diff_oracle() -> str:
    metrics = [
        "n_docs",
        "total_tokens",
        "mean_tokens",
        "p50_tokens",
        "dup_rate",
        "n_langs",
        "lang_entropy",
        "mean_punct_ratio",
    ]
    deltas = ",\n               ".join(
        f"round(CAST(n.{m} AS DOUBLE) - CAST(o.{m} AS DOUBLE), 6) + 0.0"
        f" AS d_{m}"
        for m in metrics
    )
    changed = " OR ".join(
        f"(round(CAST(n.{m} AS DOUBLE) - CAST(o.{m} AS DOUBLE), 6) + 0.0)"
        f" <> 0.0"
        for m in metrics
    )
    return f"""
        WITH o AS {_card_sql("doc_id % 2 = 0")},
        n AS {_card_sql("doc_id % 2 = 1", relabel=True)}
        SELECT coalesce(o.slice, n.slice) AS slice,
               CASE WHEN o.n_docs IS NULL THEN 'added'
                    WHEN n.n_docs IS NULL THEN 'removed'
                    WHEN {changed} THEN 'changed'
                    ELSE 'unchanged' END AS status,
               CAST(o.n_docs AS BIGINT) AS n_docs_old,
               CAST(n.n_docs AS BIGINT) AS n_docs_new,
               {deltas}
        FROM o FULL OUTER JOIN n ON o.slice = n.slice
        ORDER BY slice
    """


def _lsh_sig_sql(dim: int, n_bits: int, seed: int, vec: str = "e") -> str:
    """Signature expression shared with _ann_lsh_oracle: the seeded
    hyperplanes inlined as literals, bit j set when dot > 0."""
    from nbdatatools_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_bits, seed)
    return " + ".join(
        "(CASE WHEN list_inner_product({v}, [{vals}]) > 0"
        " THEN {bit} ELSE 0 END)".format(
            v=vec,
            vals=", ".join(repr(float(x)) for x in plane),
            bit=1 << j,
        )
        for j, plane in enumerate(planes)
    )


def _lsh_tradeoff_oracle(
    k: int = 10, dim: int = 64, bits_list=(4, 8, 12), seed: int = 42
) -> str:
    """DuckDB replica of embedding_lsh_tradeoff: exact cosine top-k
    ground truth (same (dist, bid) tie-break as the engine), then per
    n_bits the signature bucket join, candidate count, LSH top-k, and
    the two exact-integer ratios."""
    cos = (
        "1 - list_inner_product(q.qe, {b})"
        " / (sqrt(list_inner_product(q.qe, q.qe))"
        " * sqrt(list_inner_product({b}, {b})))"
    )
    ctes = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e"
        " FROM embeddings)",
        "q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 20)",
        "nq AS (SELECT CAST(count(*) AS BIGINT) AS nq FROM q)",
        f"""ex AS (SELECT qid, bid FROM (
            SELECT q.qid, v.vec_id AS bid,
                   row_number() OVER (PARTITION BY q.qid
                       ORDER BY ({cos.format(b='v.e')}) ASC NULLS LAST,
                                v.vec_id ASC) AS rn
            FROM q CROSS JOIN v) WHERE rn <= {k})""",
    ]
    blocks = []
    for b in bits_list:
        sig = _lsh_sig_sql(dim, int(b), seed)
        ctes.append(
            f"s{b} AS (SELECT vec_id, e, ({sig}) AS sig FROM v)"
        )
        ctes.append(
            f"q{b} AS (SELECT vec_id AS qid, e AS qe, sig FROM s{b}"
            f" WHERE vec_id < 20)"
        )
        ctes.append(
            f"""p{b} AS (SELECT q.qid, s.vec_id AS bid,
                   ({cos.format(b='s.e')}) AS dist
            FROM q{b} q JOIN s{b} s ON q.sig = s.sig)"""
        )
        ctes.append(
            f"c{b} AS (SELECT CAST(count(*) AS BIGINT) AS c FROM p{b})"
        )
        ctes.append(
            f"""t{b} AS (SELECT qid, bid FROM (
                SELECT qid, bid, row_number() OVER (PARTITION BY qid
                    ORDER BY dist ASC NULLS LAST, bid ASC) AS rn
                FROM p{b}) WHERE rn <= {k})"""
        )
        ctes.append(
            f"m{b} AS (SELECT CAST(count(*) AS BIGINT) AS m"
            f" FROM t{b} JOIN ex USING (qid, bid))"
        )
        blocks.append(
            f"""SELECT {int(b)} AS n_bits, nq.nq AS n_queries,
                   round(m{b}.m / ({int(k)} * nq.nq), 6) AS recall_at_k,
                   round(c{b}.c / CAST(nq.nq AS DOUBLE), 6)
                       AS mean_candidates
            FROM nq CROSS JOIN m{b} CROSS JOIN c{b}"""
        )
    body = ",\n        ".join(ctes)
    union = "\n            UNION ALL\n            ".join(blocks)
    return f"""
        WITH {body}
        SELECT * FROM ({union}) ORDER BY n_bits
    """


def candidate_oracles() -> dict[str, str]:
    """DuckDB oracles for the round-11 staging candidates. Stays in
    lock-step with candidate_queries()."""
    return {
        "doc_kn_perplexity": _kn_perplexity_oracle(),
        "doc_score_psi_drift": f"""
            WITH sc AS (SELECT doc_id, source, {_QUALITY6} AS score
                        FROM documents),
            b AS (SELECT source AS g,
                         least(greatest(CAST(floor((score - 0.0) / 0.1)
                             AS INT), 0), 9) AS bin,
                         CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS side
                  FROM sc WHERE score IS NOT NULL),
            c AS (SELECT g, bin,
                         sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS cb,
                         sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cc
                  FROM b GROUP BY g, bin),
            t AS (SELECT g, CAST(sum(cb) AS BIGINT) AS nb,
                         CAST(sum(cc) AS BIGINT) AS nc
                  FROM c GROUP BY g),
            grid AS (SELECT t.g, t.nb, t.nc,
                            CAST(unnest(generate_series(0, 9)) AS INT)
                                AS bin
                     FROM t),
            fl AS (SELECT grid.g, grid.nb, grid.nc, grid.bin,
                          coalesce(c.cb, 0) AS cb, coalesce(c.cc, 0) AS cc
                   FROM grid LEFT JOIN c
                     ON c.g = grid.g AND c.bin = grid.bin),
            tm AS (SELECT g, nb, nc,
                          CAST(round(
                              (CAST(cb + 1 AS DOUBLE) / (nb + 10)
                               - CAST(cc + 1 AS DOUBLE) / (nc + 10))
                              * ln((CAST(cb + 1 AS DOUBLE) / (nb + 10))
                                   / (CAST(cc + 1 AS DOUBLE) / (nc + 10))),
                              9) AS DECIMAL(20,9)) AS term
                   FROM fl)
            SELECT g AS source,
                   CAST(max(nb) AS BIGINT) AS n_baseline,
                   CAST(max(nc) AS BIGINT) AS n_current,
                   round(CAST(CAST(sum(term) AS DECIMAL(38,9)) AS DOUBLE),
                         6) AS psi
            FROM tm GROUP BY g ORDER BY source
        """,
        "doc_card_diff": _card_diff_oracle(),
        "embedding_lsh_tradeoff": _lsh_tradeoff_oracle(),
        "doc_mink_prob": _mink_prob_oracle(),
        "doc_sliced_ece": f"""
            WITH sc AS (SELECT source, {_QUALITY6} AS s,
                               CAST(n_chars >= 400 AS INT) AS y
                        FROM documents),
            b AS (SELECT source,
                         least(greatest(CAST(floor((s - 0.0) / 0.1) AS INT),
                               0), 9) AS bin, s, y
                  FROM sc),
            pb AS (SELECT source, bin, count(*) AS n,
                          CAST(CAST(sum(CAST(round(s, 9) AS DECIMAL(20,9)))
                               AS DECIMAL(38,9)) AS DOUBLE) AS ss,
                          sum(y) AS ys
                   FROM b GROUP BY source, bin),
            g AS (SELECT source, n, round(abs(ys / n - ss / n), 9) AS gap
                  FROM pb)
            SELECT source, CAST(sum(n) AS BIGINT) AS n,
                   CAST(count(*) AS INT) AS n_bins_occupied,
                   round(CAST(CAST(sum(CAST(round(gap * n, 9)
                         AS DECIMAL(30,9))) AS DECIMAL(38,9)) AS DOUBLE)
                         / sum(n), 6) + 0.0 AS ece,
                   round(max(gap), 6) + 0.0 AS mce
            FROM g GROUP BY source ORDER BY source
        """,
        "doc_gwet_ac1": f"""
            WITH rr AS (
                SELECT doc_id AS i, 'q' AS r,
                       CAST({_QUALITY6} >= 0.5 AS VARCHAR) AS c
                FROM documents
                UNION ALL
                SELECT doc_id, 'len', CAST(n_chars >= 400 AS VARCHAR)
                FROM documents WHERE doc_id % 3 <> 0
                UNION ALL
                SELECT doc_id, 'lang', CAST(lang = 'en' AS VARCHAR)
                FROM documents WHERE doc_id % 7 <> 0),
            ic AS (SELECT i, c, count(*) AS n FROM rr GROUP BY i, c),
            rd AS (SELECT i, count(DISTINCT r) AS nd FROM rr GROUP BY i),
            per AS (SELECT ic.i, sum(n) AS ri, sum(n * (n - 1)) AS agr
                    FROM ic GROUP BY ic.i),
            tagged AS (SELECT per.*, rd.nd FROM per JOIN rd ON rd.i = per.i),
            kept AS (SELECT * FROM tagged WHERE nd = ri AND ri >= 2),
            drp AS (SELECT CAST(count(*) AS BIGINT) AS n_items_dropped
                    FROM tagged WHERE NOT (nd = ri AND ri >= 2)),
            ia AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
                          CAST(CAST(sum(CAST(round(CAST(agr AS DOUBLE)
                              / (ri * (ri - 1.0)), 9) AS DECIMAL(30,9)))
                              AS DECIMAL(38,9)) AS DOUBLE) AS sp
                   FROM kept),
            sh AS (SELECT ic.c,
                          CAST(CAST(sum(CAST(round(CAST(ic.n AS DOUBLE)
                              / kept.ri, 9) AS DECIMAL(30,9)))
                              AS DECIMAL(38,9)) AS DOUBLE) AS sc
                   FROM ic JOIN kept ON kept.i = ic.i GROUP BY ic.c),
            ca AS (SELECT CAST(count(*) AS INT) AS n_categories,
                          CAST(CAST(sum(CAST(round((sc / ia.n_items)
                              * (1.0 - sc / ia.n_items), 9)
                              AS DECIMAL(30,9))) AS DECIMAL(38,9))
                              AS DOUBLE) AS spq
                   FROM sh CROSS JOIN ia)
            SELECT ia.n_items, drp.n_items_dropped, ca.n_categories,
                   round(ia.sp / ia.n_items, 6) + 0.0 AS pa,
                   round(CASE WHEN ca.n_categories > 1
                              THEN ca.spq / (ca.n_categories - 1) END, 6)
                       + 0.0 AS pe,
                   round(CASE WHEN ca.n_categories > 1
                              AND ca.spq / (ca.n_categories - 1) < 1.0
                              THEN (ia.sp / ia.n_items
                                    - ca.spq / (ca.n_categories - 1))
                                   / (1.0 - ca.spq / (ca.n_categories - 1))
                         END, 6) + 0.0 AS ac1
            FROM ia CROSS JOIN ca CROSS JOIN drp
        """,
        "doc_auc_delong": f"""
            WITH sc AS (SELECT {_QUALITY6} AS s,
                               CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END
                                   AS y
                        FROM documents),
            g AS (SELECT s, count(*) AS n, sum(y) AS np,
                         count(*) - sum(y) AS nn
                  FROM sc GROUP BY s),
            r AS (SELECT s, n, np, nn,
                         CAST(coalesce(sum(n) OVER w, 0) AS BIGINT) AS ba,
                         CAST(coalesce(sum(np) OVER w, 0) AS BIGINT) AS bp,
                         CAST(coalesce(sum(nn) OVER w, 0) AS BIGINT) AS bm
                  FROM g
                  WINDOW w AS (ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
            t AS (SELECT CAST(sum(np) AS BIGINT) AS n1,
                         CAST(sum(nn) AS BIGINT) AS n0
                  FROM g),
            v AS (SELECT r.np, r.nn,
                         round(((ba + (n + 1) / 2.0)
                                - (bp + (np + 1) / 2.0))
                               / CAST(t.n0 AS DOUBLE), 9) AS v10,
                         round(1.0 - ((ba + (n + 1) / 2.0)
                                      - (bm + (nn + 1) / 2.0))
                                     / CAST(t.n1 AS DOUBLE), 9) AS v01,
                         t.n1, t.n0
                  FROM r CROSS JOIN t),
            a AS (SELECT CAST(max(n1) AS BIGINT) AS n_pos,
                         CAST(max(n0) AS BIGINT) AS n_neg,
                         CAST(CAST(sum(CAST(np * v10 AS DECIMAL(30,9)))
                             AS DECIMAL(38,9)) AS DOUBLE) AS s10,
                         CAST(CAST(sum(CAST(np * round(v10 * v10, 9)
                             AS DECIMAL(30,9))) AS DECIMAL(38,9))
                             AS DOUBLE) AS q10,
                         CAST(CAST(sum(CAST(nn * v01 AS DECIMAL(30,9)))
                             AS DECIMAL(38,9)) AS DOUBLE) AS s01,
                         CAST(CAST(sum(CAST(nn * round(v01 * v01, 9)
                             AS DECIMAL(30,9))) AS DECIMAL(38,9))
                             AS DOUBLE) AS q01
                  FROM v)
            SELECT n_pos, n_neg,
                   round(CASE WHEN n_pos > 0 AND n_neg > 0
                              THEN s10 / n_pos END, 6) + 0.0 AS auc,
                   round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
                       sqrt(greatest((q10 - n_pos * (s10 / n_pos)
                                      * (s10 / n_pos)) / (n_pos - 1.0),
                                     0.0) / n_pos
                            + greatest((q01 - n_neg * (s01 / n_neg)
                                        * (s01 / n_neg)) / (n_neg - 1.0),
                                       0.0) / n_neg)
                   END, 6) + 0.0 AS se,
                   round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
                       s10 / n_pos - 1.959963984540054 *
                       sqrt(greatest((q10 - n_pos * (s10 / n_pos)
                                      * (s10 / n_pos)) / (n_pos - 1.0),
                                     0.0) / n_pos
                            + greatest((q01 - n_neg * (s01 / n_neg)
                                        * (s01 / n_neg)) / (n_neg - 1.0),
                                       0.0) / n_neg)
                   END, 6) + 0.0 AS ci_lo,
                   round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
                       s10 / n_pos + 1.959963984540054 *
                       sqrt(greatest((q10 - n_pos * (s10 / n_pos)
                                      * (s10 / n_pos)) / (n_pos - 1.0),
                                     0.0) / n_pos
                            + greatest((q01 - n_neg * (s01 / n_neg)
                                        * (s01 / n_neg)) / (n_neg - 1.0),
                                       0.0) / n_neg)
                   END, 6) + 0.0 AS ci_hi
            FROM a
        """,
        "doc_filter_funnel": f"""
            WITH base AS (
                SELECT CAST({_NTOK} AS BIGINT) AS nt,
                       coalesce(lang = 'en', false) AS p1,
                       coalesce({_QUALITY6} >= 0.3, false) AS p2,
                       coalesce(n_chars BETWEEN 100 AND 20000, false) AS p3,
                       coalesce(CAST({_NTOK} AS BIGINT) >= 20, false) AS p4
                FROM documents),
            c AS (SELECT nt, p1 AS c1, p1 AND p2 AS c2,
                         (p1 AND p2) AND p3 AS c3,
                         ((p1 AND p2) AND p3) AND p4 AS c4
                  FROM base),
            a AS (SELECT CAST(count(*) AS BIGINT) AS d0,
                         CAST(coalesce(sum(nt), 0) AS BIGINT) AS t0,
                         CAST(coalesce(sum(CASE WHEN c1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d1,
                         CAST(coalesce(sum(CASE WHEN c1 THEN nt ELSE 0 END), 0) AS BIGINT) AS t1,
                         CAST(coalesce(sum(CASE WHEN c2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d2,
                         CAST(coalesce(sum(CASE WHEN c2 THEN nt ELSE 0 END), 0) AS BIGINT) AS t2,
                         CAST(coalesce(sum(CASE WHEN c3 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d3,
                         CAST(coalesce(sum(CASE WHEN c3 THEN nt ELSE 0 END), 0) AS BIGINT) AS t3,
                         CAST(coalesce(sum(CASE WHEN c4 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d4,
                         CAST(coalesce(sum(CASE WHEN c4 THEN nt ELSE 0 END), 0) AS BIGINT) AS t4
                  FROM c),
            s AS (
                SELECT 0 AS stage, 'input' AS name, d0 AS docs, t0 AS tokens,
                       d0 AS pdocs, t0 AS ptokens, d0, t0 FROM a
                UNION ALL SELECT 1, 'lang_en', d1, t1, d0, t0, d0, t0 FROM a
                UNION ALL SELECT 2, 'quality_ge_030', d2, t2, d1, t1, d0, t0 FROM a
                UNION ALL SELECT 3, 'len_100_20000', d3, t3, d2, t2, d0, t0 FROM a
                UNION ALL SELECT 4, 'min_20_tokens', d4, t4, d3, t3, d0, t0 FROM a)
            SELECT CAST(stage AS INT) AS stage, name, docs, tokens,
                   CAST(pdocs - docs AS BIGINT) AS drop_docs,
                   CAST(ptokens - tokens AS BIGINT) AS drop_tokens,
                   CASE WHEN d0 > 0 THEN
                       CAST((2 * CAST(docs AS HUGEINT) * 1000000 + d0)
                            // (2 * CAST(d0 AS HUGEINT)) AS DOUBLE) / 1e6 + 0.0
                   END AS pct_docs,
                   CASE WHEN t0 > 0 THEN
                       CAST((2 * CAST(tokens AS HUGEINT) * 1000000 + t0)
                            // (2 * CAST(t0 AS HUGEINT)) AS DOUBLE) / 1e6 + 0.0
                   END AS pct_tokens
            FROM s ORDER BY stage
        """,
        "doc_source_perplexity": f"""
            WITH {_kn_terms_ctes(0.75, 1e-9)},
            ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(tn) AS BIGINT) AS s
                   FROM terms GROUP BY doc_id),
            pm AS (SELECT doc_id, n, (s + 500 * n) // (1000 * n) AS mm
                   FROM ag),
            lab AS (SELECT pm.n, pm.mm, d.source
                    FROM pm JOIN documents d ON d.doc_id = pm.doc_id),
            sa AS (SELECT source, CAST(count(*) AS BIGINT) AS nd,
                          CAST(sum(n) AS BIGINT) AS nb,
                          CAST(sum(mm) AS HUGEINT) AS sm
                   FROM lab GROUP BY source),
            mi AS (SELECT source, nd, nb,
                          CAST((2 * sm + nd) // (2 * CAST(nd AS HUGEINT))
                               AS BIGINT) AS micro
                   FROM sa),
            ti AS (SELECT *, ntile(3) OVER (ORDER BY micro, source) AS t
                   FROM mi)
            SELECT source, nd AS n_docs, nb AS n_bigrams,
                   -(CAST(micro AS DOUBLE) / 1e6) + 0.0 AS mean_logp,
                   round(exp(CAST(micro AS DOUBLE) / 1e6), 6) + 0.0
                       AS perplexity,
                   CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                          ELSE 'tail' END AS tier
            FROM ti ORDER BY mean_logp DESC, source
        """,
        "embedding_label_drift": """
            WITH ea AS (
                SELECT label AS g,
                       CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
                       CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings WHERE vec_id % 2 = 0),
            eb AS (
                SELECT label AS g,
                       CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
                       CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings WHERE vec_id % 2 = 1),
            ma AS (SELECT g, d,
                          round(CAST(sum(CAST(round(x, 9) AS DECIMAL(30,9)))
                                     AS DOUBLE) / count(*), 9) AS m
                   FROM ea GROUP BY g, d),
            mb AS (SELECT g, d,
                          round(CAST(sum(CAST(round(x, 9) AS DECIMAL(30,9)))
                                     AS DOUBLE) / count(*), 9) AS m
                   FROM eb GROUP BY g, d),
            jm AS (SELECT ma.g,
                          CAST(sum(CAST(round(ma.m * mb.m, 9)
                                        AS DECIMAL(30,9))) AS DOUBLE) AS dot,
                          CAST(sum(CAST(round(ma.m * ma.m, 9)
                                        AS DECIMAL(30,9))) AS DOUBLE) AS aa,
                          CAST(sum(CAST(round(mb.m * mb.m, 9)
                                        AS DECIMAL(30,9))) AS DOUBLE) AS bb,
                          CAST(sum(CAST(round((ma.m - mb.m) * (ma.m - mb.m), 9)
                                        AS DECIMAL(30,9))) AS DOUBLE) AS l2
                   FROM ma JOIN mb ON mb.g = ma.g AND mb.d = ma.d
                   GROUP BY ma.g),
            ca AS (SELECT label AS g, CAST(count(*) AS BIGINT) AS n_a
                   FROM embeddings WHERE vec_id % 2 = 0 GROUP BY label),
            cb AS (SELECT label AS g, CAST(count(*) AS BIGINT) AS n_b
                   FROM embeddings WHERE vec_id % 2 = 1 GROUP BY label),
            cn AS (SELECT coalesce(ca.g, cb.g) AS g, ca.n_a, cb.n_b
                   FROM ca FULL OUTER JOIN cb ON cb.g = ca.g)
            SELECT cn.g AS label, cn.n_a, cn.n_b,
                   CASE WHEN jm.aa > 0 AND jm.bb > 0 THEN
                       round(jm.dot / (sqrt(jm.aa) * sqrt(jm.bb)), 6)
                   END + 0.0 AS cosine,
                   round(sqrt(jm.l2), 6) + 0.0 AS l2
            FROM cn LEFT JOIN jm ON jm.g = cn.g
            ORDER BY label
        """,
        "doc_dedup_savings": f"""
            WITH RECURSIVE {{mh}},
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM capped a JOIN capped b
                  ON a.band = b.band AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id),
            sets AS (
                SELECT doc_id,
                       list_distinct(
                           list_transform(range(1, greatest(length(t) - 4, 1) + 1),
                                          i -> substring(t, CAST(i AS INT), 5))) AS g
                FROM nrm),
            ver AS (
                SELECT c.id_a, c.id_b
                FROM cand c
                JOIN sets sa ON sa.doc_id = c.id_a
                JOIN sets sb ON sb.doc_id = c.id_b
                WHERE CAST(len(list_intersect(sa.g, sb.g)) AS DOUBLE)
                      / len(list_distinct(list_concat(sa.g, sb.g))) >= 0.5),
            edges AS (
                SELECT id_a AS s, id_b AS d FROM ver
                UNION
                SELECT id_b, id_a FROM ver),
            reach(id, r) AS (
                SELECT s, d FROM edges
                UNION
                SELECT w.id, e.d FROM reach w JOIN edges e ON e.s = w.r),
            comp AS (
                SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
            allc AS (
                SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp,
                       CAST({{nt}} AS BIGINT) AS nt
                FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
            pc AS (SELECT comp, count(*) AS cluster_size,
                          CAST(sum(nt) AS BIGINT) AS tok,
                          CAST(arg_min(nt, doc_id) AS BIGINT) AS kept
                   FROM allc GROUP BY comp)
            SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters,
                   CAST(sum(cluster_size) AS BIGINT) AS docs,
                   CAST(sum(cluster_size - 1) AS BIGINT) AS docs_removed,
                   CAST(sum(tok) AS BIGINT) AS tokens,
                   CAST(sum(tok - kept) AS BIGINT) AS tokens_removed
            FROM pc GROUP BY cluster_size ORDER BY cluster_size
        """.format(mh=_minhash_ctes(32, 8, 5, 2000), nt=_NTOK),
        "doc_source_contamination": f"""
            WITH nrm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents),
            toks AS (
                SELECT doc_id, string_split(t, ' ') AS w
                FROM nrm WHERE length(t) > 0),
            tg AS (
                SELECT DISTINCT array_to_string(w[i:i+12], ' ') AS gram
                FROM (SELECT w, unnest(generate_series(1, greatest(len(w)-12, 1))) AS i
                      FROM toks WHERE doc_id % 101 = 0)),
            trg AS (
                SELECT DISTINCT doc_id, array_to_string(w[i:i+12], ' ') AS gram
                FROM (SELECT doc_id, w,
                             unnest(generate_series(1, greatest(len(w)-12, 1))) AS i
                      FROM toks WHERE doc_id % 101 <> 0)),
            hitdocs AS (
                SELECT DISTINCT doc_id FROM trg
                WHERE gram IN (SELECT gram FROM tg)),
            base AS (
                SELECT d.source, CAST({{nt}} AS BIGINT) AS nt,
                       CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit
                FROM documents d LEFT JOIN hitdocs h USING (doc_id)
                WHERE d.doc_id % 101 <> 0),
            a AS (SELECT source, CAST(count(*) AS BIGINT) AS nd,
                         CAST(sum(hit) AS BIGINT) AS nc,
                         CAST(sum(nt) AS BIGINT) AS tok,
                         CAST(sum(CASE WHEN hit = 1 THEN nt ELSE 0 END)
                              AS BIGINT) AS tokc
                  FROM base GROUP BY source)
            SELECT source, nd AS n_docs, nc AS n_contaminated,
                   CASE WHEN nd > 0 THEN
                       CAST((2 * CAST(nc AS HUGEINT) * 1000000 + nd)
                            // (2 * CAST(nd AS HUGEINT)) AS DOUBLE) / 1e6 + 0.0
                   END AS doc_rate,
                   tok AS n_tokens, tokc AS tokens_contaminated,
                   CASE WHEN tok > 0 THEN
                       CAST((2 * CAST(tokc AS HUGEINT) * 1000000 + tok)
                            // (2 * CAST(tok AS HUGEINT)) AS DOUBLE) / 1e6 + 0.0
                   END AS token_rate
            FROM a ORDER BY source
        """.format(nt=_NTOK),
    }


def _rotated_round10_oracles() -> dict[str, str]:
    """DuckDB oracles for the 23 gates staged during round 9 and rotated
    into the live window at the round-10 head (merged into oracle_sql();
    no rows-only gates in this batch)."""
    return {
        "corpus_wordpiece": _wordpiece_oracle().format(norm=_NORM),
        # bottom-k sketch order on the shared md5-uint52 convention
        "doc_reservoir_sample": """
            SELECT doc_id, source, lang FROM (
                SELECT doc_id, source, lang,
                       ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':42'),
                                          1, 13))::BIGINT AS hv
                FROM documents
                ORDER BY hv ASC, doc_id LIMIT 40)
            ORDER BY doc_id
        """,
        # per-source rank over the same hash order, first 8 per stratum
        "doc_stratified_sample": """
            WITH h AS (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY ('0x' || substring(
                               md5(CAST(doc_id AS VARCHAR) || ':42'),
                               1, 13))::BIGINT ASC, doc_id ASC) AS r
                FROM documents)
            SELECT source, doc_id FROM h WHERE r <= 8
            ORDER BY source, doc_id
        """,
        # checkpoint-0 fertility as exact integers: char tokens = summed
        # word lengths, words = word occurrences, over the normalized text
        "corpus_fertility_sweep": f"""
            WITH nrm AS (SELECT {_NORM} AS t FROM documents),
            w AS (SELECT unnest(string_split(t, ' ')) AS word
                  FROM nrm WHERE length(t) > 0),
            v AS (SELECT word, count(*) AS cnt FROM w
                  WHERE word <> '' GROUP BY word)
            SELECT CAST(sum(length(word) * cnt) AS BIGINT) AS char_tokens,
                   CAST(sum(cnt) AS BIGINT) AS total_words,
                   4 AS n_checkpoints,
                   TRUE AS fertility_nonincreasing,
                   TRUE AS tokens_nonincreasing,
                   TRUE AS vocab_nondecreasing
            FROM v
        """,
        # FineWeb line-shape rules on the c4-reshaped text + the Gopher
        # page conjunction on the raw text (the doc_gopher_filter replica)
        "doc_fineweb_filter": """
            WITH base AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(text), '\\s+') AS w
                FROM documents),
            shaped AS (
                SELECT doc_id, text,
                       list_concat(list_concat(
                           CASE WHEN doc_id % 17 = 3
                                THEN ['lorem ipsum dolor.'] ELSE [] END,
                           CASE WHEN doc_id % 19 = 7
                                THEN ['code {{ sample.'] ELSE [] END),
                           list_transform(
                               range(0, greatest(CAST(ceil(len(w) / 7.0) AS INT), 1)),
                               i -> (CASE WHEN i % 11 = 5 THEN 'javascript ' ELSE '' END)
                                    || array_to_string(w[CAST(i*7+1 AS INT):CAST(i*7+7 AS INT)], ' ')
                                    || (CASE WHEN i % 3 = 0 THEN '' ELSE '.' END)))
                       AS raw_ls
                FROM base),
            l AS (
                SELECT doc_id, text,
                       array_to_string(raw_ls, chr(10)) AS sh,
                       list_filter(list_transform(raw_ls, x -> trim(x)),
                                   x -> length(x) > 0) AS ls
                FROM shaped),
            fw AS (
                SELECT doc_id, text, sh, ls, len(ls) AS nl,
                       CASE WHEN len(ls) = 0 THEN 0.0
                            ELSE CAST(len(list_filter(ls,
                                     x -> right(x, 1) IN ('.', '!', '?', '"')))
                                 AS DOUBLE) / len(ls) END AS punct_frac,
                       CASE WHEN len(ls) = 0 THEN 0.0
                            ELSE CAST(len(list_filter(ls, x -> length(x) < 30))
                                 AS DOUBLE) / len(ls) END AS short_frac,
                       CASE WHEN len(ls) = 0 THEN 0.0
                            ELSE CAST(len(ls) - len(list_distinct(ls))
                                 AS DOUBLE) / len(ls) END AS dlf,
                       CASE WHEN coalesce(list_sum(list_transform(ls,
                                     x -> length(x))), 0) = 0 THEN 0.0
                            ELSE CAST(coalesce(list_sum(list_transform(ls,
                                     x -> CASE WHEN len(list_filter(ls,
                                              y -> y = x)) > 1
                                          THEN length(x) ELSE 0 END)), 0)
                                 AS DOUBLE)
                                 / list_sum(list_transform(ls, x -> length(x)))
                       END AS dcf
                FROM l),
            gt AS (
                SELECT doc_id, text,
                       {tokens} AS toks,
                       {ntok} AS n,
                       list_filter(list_transform(string_split(text, chr(10)),
                                                  x -> trim(x)),
                                   x -> length(x) > 0) AS gls
                FROM documents),
            gm AS (
                SELECT doc_id,
                       (n >= 50 AND n <= 100000)
                       AND (CASE WHEN n = 0 THEN 0.0
                            ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
                                      AS DOUBLE) / n END BETWEEN 3.0 AND 10.0)
                       AND (CASE WHEN n = 0 THEN 0.0
                            ELSE CAST((length(text) - length(replace(text, '#', '')))
                                      + (length(text) - length(replace(text, '...', ''))) / 3
                                      AS DOUBLE) / n END <= 0.1)
                       AND (CASE WHEN len(gls) = 0 THEN 0.0
                            ELSE CAST(len(list_filter(gls,
                                          x -> starts_with(x, '-') OR starts_with(x, '*')
                                               OR starts_with(x, '•')))
                                      AS DOUBLE) / len(gls) END <= 0.9)
                       AND (CASE WHEN len(gls) = 0 THEN 0.0
                            ELSE CAST(len(list_filter(gls, x -> ends_with(x, '...')))
                                      AS DOUBLE) / len(gls) END <= 0.3)
                       AND (CASE WHEN n = 0 THEN 0.0
                            ELSE CAST(len(list_filter(toks,
                                          x -> regexp_matches(x, '[a-zA-Z]')))
                                      AS DOUBLE) / n END >= 0.8)
                       AND (len(list_intersect(
                           list_distinct(CASE WHEN length(trim(text)) = 0
                                              THEN CAST([] AS VARCHAR[])
                                              ELSE {ltokens} END),
                           [{stopwords}])) >= 2) AS gk
                FROM gt)
            SELECT fw.doc_id,
                   (punct_frac >= 0.12) AS ok_punct_lines,
                   (short_frac <= 0.67) AS ok_short_lines,
                   (dlf <= 0.3) AS ok_dup_lines,
                   (dcf <= 0.1) AS ok_dup_chars,
                   (NOT contains(lower(sh), 'lorem ipsum')
                    AND NOT contains(lower(sh), '{{')) AS ok_placeholder,
                   (punct_frac >= 0.12 AND short_frac <= 0.67
                    AND dlf <= 0.3 AND dcf <= 0.1
                    AND NOT contains(lower(sh), 'lorem ipsum')
                    AND NOT contains(lower(sh), '{{')) AS fineweb_keep,
                   (punct_frac >= 0.12 AND short_frac <= 0.67
                    AND dlf <= 0.3 AND dcf <= 0.1
                    AND NOT contains(lower(sh), 'lorem ipsum')
                    AND NOT contains(lower(sh), '{{')
                    AND gm.gk) AS composite_keep,
                   round(punct_frac, 6) AS punct_line_frac,
                   round(short_frac, 6) AS short_line_frac,
                   round(dlf, 6) AS dup_line_frac,
                   round(dcf, 6) AS dup_char_frac,
                   CAST(nl AS INT) AS n_lines
            FROM fw JOIN gm ON gm.doc_id = fw.doc_id
            ORDER BY fw.doc_id
        """.format(
            tokens=_TOKENS, ntok=_NTOK, ltokens=_LTOKENS,
            stopwords=_STOPWORD_SQL_LIST,
        ),
        # group-keyed split: one md5-uint52 hash per SOURCE, range cuts
        # at 0.6 / 0.8 (left-to-right double accumulation, = the engine's)
        "doc_group_split": """
            WITH g AS (
                SELECT source,
                       ('0x' || substring(md5(source || ':42'), 1, 13))::BIGINT
                           AS hv
                FROM (SELECT DISTINCT source FROM documents)),
            lab AS (
                SELECT source,
                       CASE WHEN hv < 0.6 * 4503599627370496.0 THEN 'train'
                            WHEN hv < 0.8 * 4503599627370496.0 THEN 'val'
                            ELSE 'test' END AS split
                FROM g)
            SELECT split, count(*) AS n_docs,
                   CAST(count(DISTINCT d.source) AS BIGINT) AS n_groups
            FROM documents d JOIN lab ON lab.source = d.source
            GROUP BY split ORDER BY split
        """,
        # UniMax water level via the sorted-cumsum closed form; integer
        # caps (max_epochs = 1) keep every share numerator exact
        "doc_unimax_budget": """
            WITH caps AS (
                SELECT source, CAST(sum(n_chars) AS BIGINT) AS w
                FROM documents GROUP BY source),
            tot AS (SELECT CAST(floor(0.95 * CAST(sum(w) AS DOUBLE)) AS BIGINT)
                        AS b FROM caps),
            ord AS (
                SELECT source, w,
                       row_number() OVER (ORDER BY w, source) AS rn,
                       CAST(coalesce(sum(w) OVER (
                           ORDER BY w, source
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS BIGINT) AS csum,
                       CAST(count(*) OVER () AS BIGINT) AS n
                FROM caps),
            lv AS (SELECT o.*, tot.b,
                          CAST(tot.b - o.csum AS DOUBLE)
                              / CAST(o.n - o.rn + 1 AS DOUBLE) AS share
                   FROM ord o CROSS JOIN tot),
            k AS (SELECT min(rn) AS krn FROM lv
                  WHERE CAST(w AS DOUBLE) > share),
            th AS (SELECT lv.share AS theta FROM lv JOIN k ON lv.rn = k.krn),
            al AS (SELECT lv.source, lv.w,
                          CASE WHEN k.krn IS NULL OR lv.rn < k.krn
                               THEN CAST(lv.w AS DOUBLE)
                               ELSE th.theta END AS alloc
                   FROM lv CROSS JOIN k LEFT JOIN th ON TRUE)
            SELECT source, w AS w_chars,
                   (abs(alloc - CAST(w AS DOUBLE)) < 1e-9) AS capped,
                   round(alloc, 6) AS alloc,
                   round(alloc / CAST(w AS DOUBLE), 6) AS rate
            FROM al ORDER BY source
        """,
        # Krippendorff alpha, nominal coincidence form, with the gate's
        # deterministic rater missingness
        "doc_krippendorff": f"""
            WITH v AS (
                SELECT doc_id AS u,
                       CAST(({_QUALITY6} >= 0.5) AS VARCHAR) AS c
                FROM documents
                UNION ALL
                SELECT doc_id, CAST((n_chars >= 400) AS VARCHAR)
                FROM documents WHERE doc_id % 3 <> 0
                UNION ALL
                SELECT doc_id, CAST((lang = 'en') AS VARCHAR)
                FROM documents WHERE doc_id % 7 <> 0),
            uc AS (SELECT u, c, count(*) AS n FROM v GROUP BY u, c),
            pu AS (SELECT u, CAST(sum(n) AS BIGINT) AS m,
                          CAST(sum(n * (n - 1)) AS BIGINT) AS aa
                   FROM uc GROUP BY u),
            kept AS (SELECT * FROM pu WHERE m >= 2),
            drp AS (SELECT CAST(count(*) AS BIGINT) AS n_units_dropped
                    FROM pu WHERE m < 2),
            ua AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
                          CAST(sum(m) AS BIGINT) AS nn,
                          {_DS.format(x='CAST(aa AS DOUBLE)/(CAST(m AS DOUBLE) - 1.0)')}
                              AS agree
                   FROM kept),
            nc AS (SELECT uc.c, CAST(sum(uc.n) AS BIGINT) AS ncv
                   FROM uc JOIN kept ON kept.u = uc.u GROUP BY uc.c),
            ca AS (SELECT CAST(count(*) AS INT) AS n_categories,
                          CAST(sum(ncv * ncv) AS BIGINT) AS nc2
                   FROM nc)
            SELECT ua.n_units, drp.n_units_dropped, ua.nn AS n_ratings,
                   ca.n_categories,
                   round((CAST(ua.nn AS DOUBLE) - ua.agree)
                         / CAST(ua.nn AS DOUBLE), 6) + 0.0 AS d_o,
                   round((CAST(ua.nn AS DOUBLE) * CAST(ua.nn AS DOUBLE)
                          - CAST(ca.nc2 AS DOUBLE))
                         / (CAST(ua.nn AS DOUBLE)
                            * (CAST(ua.nn AS DOUBLE) - 1.0)), 6) + 0.0 AS d_e,
                   round(CASE WHEN (CAST(ua.nn AS DOUBLE) * CAST(ua.nn AS DOUBLE)
                                    - CAST(ca.nc2 AS DOUBLE))
                                   / (CAST(ua.nn AS DOUBLE)
                                      * (CAST(ua.nn AS DOUBLE) - 1.0)) <= 0.0
                              THEN NULL
                              ELSE 1.0
                                   - ((CAST(ua.nn AS DOUBLE) - ua.agree)
                                      / CAST(ua.nn AS DOUBLE))
                                     / ((CAST(ua.nn AS DOUBLE)
                                         * CAST(ua.nn AS DOUBLE)
                                         - CAST(ca.nc2 AS DOUBLE))
                                        / (CAST(ua.nn AS DOUBLE)
                                           * (CAST(ua.nn AS DOUBLE) - 1.0)))
                         END, 6) + 0.0 AS alpha
            FROM ua CROSS JOIN ca CROSS JOIN drp
        """,
        # Davies-Bouldin over vec_id%6: 6dp centroids, 9dp DECIMAL
        # Euclidean folds, worst-R arg-max with (r, group) tie-break
        "embedding_davies_bouldin": """
            WITH e AS (
                SELECT vec_id, CAST(vec_id % 6 AS INT) AS g,
                       CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings),
            ex AS (SELECT g, vec_id,
                          CAST(generate_subscripts(emb, 1) - 1 AS INT) AS dim,
                          CAST(unnest(emb) AS DOUBLE) AS v
                   FROM e),
            cm AS (SELECT g, dim,
                          round(CAST(CAST(sum(CAST(round(v, 9) AS DECIMAL(20,9)))
                                AS DECIMAL(38,9)) AS DOUBLE) / count(*), 6) AS mean
                   FROM ex GROUP BY g, dim),
            d1 AS (SELECT ex.g, ex.vec_id,
                          CAST(round((ex.v - cm.mean) * (ex.v - cm.mean), 9)
                               AS DECIMAL(30,9)) AS t
                   FROM ex JOIN cm ON cm.g = ex.g AND cm.dim = ex.dim),
            dr AS (SELECT g, vec_id,
                          round(sqrt(CAST(CAST(sum(t) AS DECIMAL(38,9))
                                AS DOUBLE)), 9) AS dd
                   FROM d1 GROUP BY g, vec_id),
            s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                         CAST(CAST(sum(CAST(dd AS DECIMAL(30,9)))
                              AS DECIMAL(38,9)) AS DOUBLE) / count(*) AS sv
                  FROM dr GROUP BY g),
            cp AS (SELECT a.g AS gi, b.g AS gj,
                          sqrt(CAST(CAST(sum(CAST(round((a.mean - b.mean)
                                * (a.mean - b.mean), 9) AS DECIMAL(30,9)))
                                AS DECIMAL(38,9)) AS DOUBLE)) AS m
                   FROM cm a JOIN cm b ON a.dim = b.dim AND a.g <> b.g
                   GROUP BY a.g, b.g),
            r AS (SELECT cp.gi, cp.gj, (si.sv + sj.sv) / cp.m AS rr
                  FROM cp JOIN s si ON si.g = cp.gi
                          JOIN s sj ON sj.g = cp.gj
                  WHERE cp.m > 0.0),
            rm AS (SELECT gi, gj, rr,
                          row_number() OVER (PARTITION BY gi
                              ORDER BY rr DESC, gj DESC) AS k
                   FROM r)
            SELECT s.g AS cluster, s.n AS n_vectors,
                   round(s.sv, 6) + 0.0 AS s_intra,
                   rm.gj AS worst_other,
                   round(rm.rr, 6) + 0.0 AS r_max
            FROM s LEFT JOIN rm ON rm.gi = s.g AND rm.k = 1
            ORDER BY cluster
        """,
        # CH variance ratio: 6dp cluster + global centroids, DECIMAL
        # between/within dispersion folds, (B/(k-1))/(W/(n-k))
        "embedding_calinski_harabasz": """
            WITH e AS (
                SELECT vec_id, CAST(vec_id % 6 AS INT) AS g,
                       CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings),
            ex AS (SELECT g, vec_id,
                          CAST(generate_subscripts(emb, 1) - 1 AS INT) AS dim,
                          CAST(unnest(emb) AS DOUBLE) AS v
                   FROM e),
            cm AS (SELECT g, dim, count(*) AS nk,
                          round(CAST(CAST(sum(CAST(round(v, 9) AS DECIMAL(20,9)))
                                AS DECIMAL(38,9)) AS DOUBLE) / count(*), 6) AS mean
                   FROM ex GROUP BY g, dim),
            gm AS (SELECT dim,
                          round(CAST(CAST(sum(CAST(round(mean * nk, 9)
                                AS DECIMAL(30,9))) AS DECIMAL(38,9)) AS DOUBLE)
                                / sum(nk), 6) AS gmean
                   FROM cm GROUP BY dim),
            b AS (SELECT CAST(CAST(sum(CAST(round(cm.nk * (cm.mean - gm.gmean)
                              * (cm.mean - gm.gmean), 9) AS DECIMAL(30,9)))
                              AS DECIMAL(38,9)) AS DOUBLE) AS b,
                         count(DISTINCT cm.g) AS k
                  FROM cm JOIN gm ON gm.dim = cm.dim),
            wr AS (SELECT ex.g, ex.vec_id,
                          round(CAST(CAST(sum(CAST(round((ex.v - cm.mean)
                                * (ex.v - cm.mean), 9) AS DECIMAL(30,9)))
                                AS DECIMAL(38,9)) AS DOUBLE), 9) AS w
                   FROM ex JOIN cm ON cm.g = ex.g AND cm.dim = ex.dim
                   GROUP BY ex.g, ex.vec_id),
            w AS (SELECT CAST(CAST(sum(CAST(w AS DECIMAL(30,9)))
                              AS DECIMAL(38,9)) AS DOUBLE) AS w,
                         count(*) AS n
                  FROM wr)
            SELECT CAST(b.k AS INT) AS k, CAST(w.n AS BIGINT) AS n,
                   round(b.b, 6) + 0.0 AS between_ss,
                   round(w.w, 6) + 0.0 AS within_ss,
                   round(CASE WHEN b.k >= 2 AND w.n > b.k AND w.w > 0.0
                              THEN (b.b / (b.k - 1)) / (w.w / (w.n - b.k))
                         END, 6) + 0.0 AS ch_index
            FROM b CROSS JOIN w
        """,
        # Hopkins: md5-uint52 probe construction, per-dim bounding box,
        # DECIMAL 1-NN sums for uniform vs bottom-k-hash real probes
        "embedding_hopkins": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                       FROM embeddings),
            ex AS (SELECT vec_id,
                          CAST(generate_subscripts(emb, 1) - 1 AS INT) AS dim,
                          CAST(unnest(emb) AS DOUBLE) AS v
                   FROM e),
            box AS (SELECT dim, min(v) AS lo, max(v) AS hi
                    FROM ex GROUP BY dim),
            rp AS (SELECT vec_id AS pid FROM (
                       SELECT vec_id,
                              ('0x' || substring(md5(CAST(vec_id AS VARCHAR)
                                  || ':42'), 1, 13))::BIGINT AS hv
                       FROM e ORDER BY hv ASC, vec_id LIMIT 20)),
            rpx AS (SELECT rp.pid, ex.dim, ex.v AS p
                    FROM rp JOIN ex ON ex.vec_id = rp.pid),
            up AS (SELECT j.pid, box.dim,
                          round(box.lo + (('0x' || substring(md5('42:'
                                || CAST(j.pid AS VARCHAR) || ':'
                                || CAST(box.dim AS VARCHAR)), 1, 13))::BIGINT
                                / 4503599627370496.0) * (box.hi - box.lo),
                                6) AS p
                   FROM (SELECT unnest(generate_series(0, 19)) AS pid) j
                        CROSS JOIN box),
            ud AS (SELECT up.pid, ex.vec_id,
                          round(sqrt(CAST(CAST(sum(CAST(round((ex.v - up.p)
                                * (ex.v - up.p), 9) AS DECIMAL(30,9)))
                                AS DECIMAL(38,9)) AS DOUBLE)), 9) AS d
                   FROM up JOIN ex ON ex.dim = up.dim
                   GROUP BY up.pid, ex.vec_id),
            us AS (SELECT CAST(CAST(sum(CAST(nn AS DECIMAL(30,9)))
                              AS DECIMAL(38,9)) AS DOUBLE) AS su,
                          count(*) AS mu
                   FROM (SELECT pid, min(d) AS nn FROM ud GROUP BY pid)),
            wd AS (SELECT rpx.pid, ex.vec_id,
                          round(sqrt(CAST(CAST(sum(CAST(round((ex.v - rpx.p)
                                * (ex.v - rpx.p), 9) AS DECIMAL(30,9)))
                                AS DECIMAL(38,9)) AS DOUBLE)), 9) AS d
                   FROM rpx JOIN ex ON ex.dim = rpx.dim
                                   AND ex.vec_id <> rpx.pid
                   GROUP BY rpx.pid, ex.vec_id),
            ws AS (SELECT CAST(CAST(sum(CAST(nn AS DECIMAL(30,9)))
                              AS DECIMAL(38,9)) AS DOUBLE) AS sw,
                          count(*) AS mw
                   FROM (SELECT pid, min(d) AS nn FROM wd GROUP BY pid)),
            nt AS (SELECT count(*) AS n FROM e)
            SELECT CAST(least(us.mu, ws.mw) AS INT) AS m,
                   CAST(nt.n AS BIGINT) AS n,
                   round(us.su, 6) + 0.0 AS sum_u,
                   round(ws.sw, 6) + 0.0 AS sum_w,
                   round(CASE WHEN nt.n > ws.mw AND us.su + ws.sw > 0.0
                              THEN us.su / (us.su + ws.sw) END, 6)
                       + 0.0 AS hopkins
            FROM us CROSS JOIN ws CROSS JOIN nt
        """,
        # LOF: exact 5-NN ranks (9dp distance, nbr tie-break), then the
        # k-distance / reachability / lrd / ratio passes
        "embedding_lof": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                       FROM embeddings WHERE vec_id < 300),
            ex AS (SELECT vec_id,
                          CAST(generate_subscripts(emb, 1) - 1 AS INT) AS dim,
                          CAST(unnest(emb) AS DOUBLE) AS v
                   FROM e),
            pd AS (SELECT a.vec_id AS p, b.vec_id AS o,
                          round(sqrt(CAST(CAST(sum(CAST(round((a.v - b.v)
                                * (a.v - b.v), 9) AS DECIMAL(30,9)))
                                AS DECIMAL(38,9)) AS DOUBLE)), 9) AS d
                   FROM ex a JOIN ex b
                     ON a.dim = b.dim AND a.vec_id <> b.vec_id
                   GROUP BY a.vec_id, b.vec_id),
            nn AS (SELECT p, o, d FROM (
                       SELECT p, o, d,
                              row_number() OVER (PARTITION BY p
                                  ORDER BY d ASC, o ASC) AS rn
                       FROM pd) WHERE rn <= 5),
            kd AS (SELECT p, max(d) AS kd FROM nn GROUP BY p),
            -- LEFT joins mirror lof_from_knn's open-pair-list handling
            -- (n_missing_neighbors; 0 on this closed self-join set)
            lrd AS (SELECT p, miss, CASE WHEN rs > 0.0
                                   THEN round(nk / rs, 9) END AS lrd
                    FROM (SELECT nn.p,
                                 CAST(CAST(sum(CAST(CASE WHEN ko.p IS NULL
                                     THEN NULL
                                     ELSE greatest(nn.d, ko.kd) END
                                     AS DECIMAL(30,9))) AS DECIMAL(38,9))
                                     AS DOUBLE) AS rs,
                                 count(ko.p) AS nk,
                                 count(*) FILTER (WHERE ko.p IS NULL)
                                     AS miss
                          FROM nn LEFT JOIN kd ko ON ko.p = nn.o
                          GROUP BY nn.p)),
            rat AS (SELECT nn.p,
                           CAST(CAST(sum(CAST(lo.lrd AS DECIMAL(30,9)))
                               AS DECIMAL(38,9)) AS DOUBLE) AS ls,
                           count(lo.lrd) AS nk,
                           count(*) FILTER (WHERE lo.lrd IS NULL) AS nullo
                    FROM nn LEFT JOIN lrd lo ON lo.p = nn.o GROUP BY nn.p)
            SELECT kd.p AS id,
                   round(kd.kd, 6) + 0.0 AS k_distance,
                   round(lrd.lrd, 9) + 0.0 AS lrd,
                   round(CASE WHEN lrd.lrd IS NOT NULL AND rat.nullo = 0
                              THEN rat.ls / rat.nk / lrd.lrd END, 6)
                       + 0.0 AS lof,
                   lrd.lrd IS NULL AS coincident,
                   CAST(lrd.miss AS BIGINT) AS n_missing_neighbors
            FROM kd JOIN lrd ON lrd.p = kd.p JOIN rat ON rat.p = kd.p
            ORDER BY id
        """,
        # link prediction: the kcore/assortativity co-visitation edge
        # CTEs, wedge join through the shared neighbor, anti-join out
        # existing edges, top-50 on (6dp adamic-adar, a, b)
        "events_link_prediction": """
            WITH occ0 AS (
                SELECT DISTINCT event_type, date_trunc('hour', ts) AS h,
                       user_id
                FROM events),
            kept AS (
                SELECT event_type, h FROM occ0
                GROUP BY event_type, h HAVING count(*) <= 100),
            occ AS (
                SELECT o.event_type, o.h, o.user_id
                FROM occ0 o JOIN kept k
                  ON o.event_type = k.event_type AND o.h = k.h),
            edges AS (
                SELECT a.user_id AS a, b.user_id AS b
                FROM occ a JOIN occ b
                  ON a.event_type = b.event_type AND a.h = b.h
                 AND a.user_id < b.user_id
                GROUP BY a.user_id, b.user_id
                HAVING count(*) >= 3),
            deg AS (
                SELECT node, count(*) AS deg FROM (
                    SELECT a AS node FROM edges
                    UNION ALL SELECT b FROM edges) GROUP BY node),
            adj AS (SELECT a AS node, b AS nbr FROM edges
                    UNION ALL SELECT b, a FROM edges),
            keptz AS (SELECT node FROM deg WHERE deg <= 100),
            adjz AS (SELECT adj.node, adj.nbr FROM adj
                     JOIN keptz k ON k.node = adj.nbr),
            wed AS (SELECT za.node AS x, zb.node AS y, za.nbr AS z
                    FROM adjz za JOIN adjz zb
                      ON za.nbr = zb.nbr AND za.node < zb.node),
            sc AS (SELECT x, y, count(*) AS cn,
                          CAST(CAST(sum(CAST(round(1.0
                              / ln(CAST(d.deg AS DOUBLE)), 9)
                              AS DECIMAL(30,9))) AS DECIMAL(38,9))
                              AS DOUBLE) AS aa
                   FROM wed JOIN deg d ON d.node = wed.z
                   GROUP BY x, y),
            ne AS (SELECT sc.* FROM sc
                   LEFT JOIN edges e ON e.a = sc.x AND e.b = sc.y
                   WHERE e.a IS NULL)
            SELECT ne.x AS node_a, ne.y AS node_b,
                   CAST(ne.cn AS BIGINT) AS common_neighbors,
                   round(CAST(ne.cn AS DOUBLE)
                         / (dx.deg + dy.deg - ne.cn), 6) + 0.0 AS jaccard,
                   round(ne.aa, 6) + 0.0 AS adamic_adar
            FROM ne JOIN deg dx ON dx.node = ne.x
                    JOIN deg dy ON dy.node = ne.y
            ORDER BY round(ne.aa, 6) DESC, node_a, node_b LIMIT 50
        """,
        # distinct-n: normalized whitespace tokens, positional n-gram
        # lists, per-(source, n) type/token counts
        "doc_distinct_ngrams": f"""
            WITH nrm AS (SELECT source, {_NORM} AS t FROM documents),
            w AS (SELECT source, string_split(t, ' ') AS w
                  FROM nrm WHERE length(t) > 0),
            g AS (
                SELECT source, 1 AS n,
                       unnest(list_transform(range(0, len(w)),
                           i -> array_to_string(w[CAST(i + 1 AS INT)
                                :CAST(i + 1 AS INT)], ' '))) AS gram
                FROM w WHERE len(w) >= 1
                UNION ALL
                SELECT source, 2 AS n,
                       unnest(list_transform(range(0, len(w) - 1),
                           i -> array_to_string(w[CAST(i + 1 AS INT)
                                :CAST(i + 2 AS INT)], ' '))) AS gram
                FROM w WHERE len(w) >= 2
                UNION ALL
                SELECT source, 3 AS n,
                       unnest(list_transform(range(0, len(w) - 2),
                           i -> array_to_string(w[CAST(i + 1 AS INT)
                                :CAST(i + 3 AS INT)], ' '))) AS gram
                FROM w WHERE len(w) >= 3)
            SELECT source, CAST(n AS INT) AS n,
                   CAST(count(*) AS BIGINT) AS total_ngrams,
                   CAST(count(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
                   round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6)
                       + 0.0 AS distinct_ratio
            FROM g GROUP BY source, n
            ORDER BY source, n
        """,
        "doc_temperature_scaling": _temperature_oracle(5).format(
            q6=_QUALITY6
        ),
        # frequency-of-frequencies estimators (the lexical_diversity
        # spectrum + Chao1 / Good-Turing / Herdan closed forms)
        "corpus_vocab_richness": """
            WITH t AS (
                SELECT source,
                       unnest(string_split(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                           ' ')) AS token
                FROM documents),
            tok AS (SELECT source, token, count(*) AS m FROM t
                    WHERE length(token) > 0 GROUP BY source, token),
            fr AS (SELECT source, m, count(*) AS vm FROM tok
                   GROUP BY source, m),
            agg AS (SELECT source,
                           CAST(sum(m*vm) AS BIGINT) AS n,
                           CAST(sum(vm) AS BIGINT) AS v,
                           CAST(sum(CASE WHEN m = 1 THEN vm ELSE 0 END)
                                AS BIGINT) AS v1,
                           CAST(sum(CASE WHEN m = 2 THEN vm ELSE 0 END)
                                AS BIGINT) AS v2
                    FROM fr GROUP BY source)
            SELECT source, n AS n_tokens, v AS n_types, v1, v2,
                   round(CAST(v AS DOUBLE) + CAST(v1 AS DOUBLE)
                         * (CAST(v1 AS DOUBLE) - 1.0)
                         / (2.0 * (CAST(v2 AS DOUBLE) + 1.0)), 6)
                       + 0.0 AS chao1,
                   round(CAST(v1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
                       + 0.0 AS unseen_mass,
                   round(CASE WHEN n > 1
                              THEN ln(CAST(v AS DOUBLE))
                                   / ln(CAST(n AS DOUBLE)) END, 6)
                       + 0.0 AS herdan_c
            FROM agg ORDER BY source
        """,
        # deterministic HLL over (source, n)-keyed n-gram streams: the
        # corpus_hll_distinct register replica at precision 10
        "doc_distinct_ngrams_hll": f"""
            WITH nrm AS (SELECT source, {_NORM} AS t FROM documents),
            w AS (SELECT source, string_split(t, ' ') AS w
                  FROM nrm WHERE length(t) > 0),
            g AS (
                SELECT source, 1 AS n,
                       unnest(list_transform(range(0, len(w)),
                           i -> array_to_string(w[CAST(i + 1 AS INT)
                                :CAST(i + 1 AS INT)], ' '))) AS gram
                FROM w WHERE len(w) >= 1
                UNION ALL
                SELECT source, 2 AS n,
                       unnest(list_transform(range(0, len(w) - 1),
                           i -> array_to_string(w[CAST(i + 1 AS INT)
                                :CAST(i + 2 AS INT)], ' '))) AS gram
                FROM w WHERE len(w) >= 2
                UNION ALL
                SELECT source, 3 AS n,
                       unnest(list_transform(range(0, len(w) - 2),
                           i -> array_to_string(w[CAST(i + 1 AS INT)
                                :CAST(i + 3 AS INT)], ' '))) AS gram
                FROM w WHERE len(w) >= 3),
            hs AS (SELECT source, n,
                          ('0x' || substring(md5(gram), 1, 13))::BIGINT AS h
                   FROM g),
            rk AS (SELECT source, n, CAST(h % 1024 AS INT) AS reg,
                          CASE WHEN (h >> 10) = 0 THEN 43
                               ELSE 42 - length(bin(h >> 10)) + 1
                          END AS rank
                   FROM hs),
            regs AS (SELECT source, n, reg, max(rank) AS mx
                     FROM rk GROUP BY source, n, reg),
            sk AS (SELECT source, n, CAST(count(*) AS BIGINT) AS used,
                          CAST(sum(CAST(1 AS BIGINT) << (43 - mx))
                               AS BIGINT) AS hsum_used
                   FROM regs GROUP BY source, n),
            tot AS (SELECT source, n, CAST(count(*) AS BIGINT)
                               AS total_ngrams
                    FROM g GROUP BY source, n),
            o AS (SELECT tot.source, tot.n, tot.total_ngrams,
                         CAST(1024 - sk.used AS BIGINT) AS zero_regs,
                         CAST(sk.hsum_used + (1024 - sk.used)
                              * (CAST(1 AS BIGINT) << 43)
                              AS BIGINT) AS hsum
                  FROM tot JOIN sk
                    ON sk.source = tot.source AND sk.n = tot.n),
            e AS (SELECT *,
                         CAST({0.7213 / (1.0 + 1.079 / 1024)!r} AS DOUBLE)
                         * 1024 * 1024 * 8796093022208.0 / hsum AS raw
                  FROM o),
            est AS (SELECT source, n, total_ngrams,
                           CASE WHEN raw <= 2560.0 AND zero_regs > 0
                                THEN round(1024.0 * ln(1024.0
                                           / zero_regs), 6)
                                ELSE round(raw, 6) END AS distinct_estimate
                    FROM e)
            SELECT source, CAST(n AS INT) AS n, total_ngrams,
                   distinct_estimate,
                   round(distinct_estimate / total_ngrams, 6)
                       AS distinct_ratio
            FROM est ORDER BY source, n
        """,
        # ECE/MCE: calibration_bins' bin grain, 9dp |acc-conf| gaps,
        # n_b-weighted DECIMAL reduction
        "doc_ece": f"""
            WITH sc AS (SELECT {_QUALITY6} AS s,
                               CAST(n_chars >= 400 AS INT) AS y
                        FROM documents),
            b AS (SELECT least(greatest(CAST(floor((s - 0.0) / 0.1) AS INT),
                               0), 9) AS bin, s, y
                  FROM sc),
            pb AS (SELECT bin, count(*) AS n,
                          CAST(CAST(sum(CAST(round(s, 9) AS DECIMAL(20,9)))
                               AS DECIMAL(38,9)) AS DOUBLE) AS ss,
                          sum(y) AS ys
                   FROM b GROUP BY bin),
            g AS (SELECT n, round(abs(ys / n - ss / n), 9) AS gap FROM pb)
            SELECT CAST(sum(n) AS BIGINT) AS n,
                   CAST(count(*) AS INT) AS n_bins_occupied,
                   round(CAST(CAST(sum(CAST(round(gap * n, 9)
                         AS DECIMAL(30,9))) AS DECIMAL(38,9)) AS DOUBLE)
                         / sum(n), 6) + 0.0 AS ece,
                   round(max(gap), 6) + 0.0 AS mce
            FROM g
        """,
        "doc_sinkhorn_shift": _sinkhorn_oracle(),
        # Hill estimator: rank window -> k largest order statistics ->
        # DECIMAL log-ratio sum (boundary ties are value-grain, so the
        # kept MULTISET is engine-deterministic without an id tie-break)
        "doc_hill_tail": """
            WITH r AS (SELECT source, CAST(n_chars AS DOUBLE) AS x
                       FROM documents WHERE n_chars > 0),
            n AS (SELECT source, count(*) AS n FROM r GROUP BY source),
            t AS (SELECT source, x,
                         row_number() OVER (PARTITION BY source
                             ORDER BY x DESC) AS rk
                  FROM r),
            tk AS (SELECT * FROM t WHERE rk <= 21),
            th AS (SELECT source, max(rk) AS rmax, min(x) AS thr
                   FROM tk GROUP BY source),
            ls AS (SELECT tk.source,
                          CAST(CAST(sum(CAST(round(ln(tk.x / th.thr), 9)
                               AS DECIMAL(30,9))) AS DECIMAL(38,9))
                               AS DOUBLE) AS ls,
                          count(*) AS ku
                   FROM tk JOIN th ON th.source = tk.source
                   WHERE tk.rk < th.rmax GROUP BY tk.source)
            SELECT n.source AS source, CAST(n.n AS BIGINT) AS n,
                   CAST(coalesce(ls.ku, 0) AS INT) AS k_used,
                   round(th.thr, 6) + 0.0 AS x_threshold,
                   round(CASE WHEN ls.ku >= 1 AND ls.ls > 0.0
                              THEN ls.ku / ls.ls END, 6)
                       + 0.0 AS hill_alpha
            FROM n LEFT JOIN ls ON ls.source = n.source
                   LEFT JOIN th ON th.source = n.source
            ORDER BY source
        """,
        # occurrence-weighted mean smoothed IDF per document
        "doc_rarity_scores": f"""
            WITH nrm AS (SELECT doc_id, {_NORM} AS t FROM documents),
            tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS w
                    FROM nrm WHERE length(t) > 0),
            tk AS (SELECT doc_id, w FROM tok WHERE length(w) > 0),
            nd AS (SELECT count(*) AS nd FROM documents),
            dfq AS (SELECT w, count(*) AS dfc FROM (
                        SELECT DISTINCT doc_id, w FROM tk) GROUP BY w),
            j AS (SELECT tk.doc_id,
                         CAST(round(round(ln((nd.nd + 1.0)
                              / (dfq.dfc + 1.0)), 9) * 1e9, 0)
                              AS BIGINT) AS idf_nano
                  FROM tk JOIN dfq ON dfq.w = tk.w CROSS JOIN nd),
            a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                         CAST(sum(idf_nano) AS BIGINT) AS s
                  FROM j GROUP BY doc_id)
            SELECT doc_id, n_tokens,
                   CAST((s + 500 * n_tokens) // (1000 * n_tokens)
                        AS DOUBLE) / 1e6 AS rarity
            FROM a ORDER BY doc_id
        """,
        # SentencePiece BPE first merge over the U+2581-marked vocab;
        # structural claims pinned TRUE (roundtrip has a pytest
        # differential on the full merge table)
        "corpus_sentencepiece": f"""
            WITH nrm AS (SELECT {_NORM} AS t FROM documents),
            w AS (SELECT unnest(string_split(t, ' ')) AS w0
                  FROM nrm WHERE length(t) > 0),
            v AS (SELECT '▁' || w0 AS word, count(*) AS cnt FROM w
                  WHERE w0 <> '' GROUP BY w0),
            sy AS (SELECT word, cnt, i, substring(word, CAST(i AS INT), 1) AS s
                   FROM (SELECT word, cnt,
                                unnest(generate_series(1, length(word))) AS i
                         FROM v)),
            p AS (SELECT a.s AS left_, b.s AS right_, a.cnt
                  FROM sy a JOIN sy b
                    ON a.word = b.word AND b.i = a.i + 1),
            agg AS (SELECT left_, right_, CAST(sum(cnt) AS BIGINT) AS c
                    FROM p GROUP BY left_, right_
                    HAVING sum(cnt) >= 2)
            SELECT left_ AS first_left, right_ AS first_right,
                   c AS first_count,
                   TRUE AS n_merges_bounded, TRUE AS counts_ge_min,
                   TRUE AS roundtrip_exact
            FROM agg ORDER BY c DESC, left_, right_ LIMIT 1
        """,
        # packing audit: the doc_pack_sequences cumsum + one aggregate
        "doc_packing_efficiency": """
            WITH c AS (
                SELECT doc_id, n_chars,
                       CAST(COALESCE(sum(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
                FROM documents),
            p AS (SELECT n_chars, start_tok // 2048 AS sf,
                         CASE WHEN n_chars > 0
                              THEN (start_tok + n_chars - 1) // 2048
                              ELSE start_tok // 2048 END AS sl
                  FROM c),
            a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(CASE WHEN n_chars > 0 THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_nonempty,
                         CAST(sum(n_chars) AS BIGINT) AS total_tokens,
                         CAST(sum(CASE WHEN n_chars > 0 AND sl <> sf
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS split_docs,
                         CAST(sum(CASE WHEN n_chars > 0
                                       THEN sl - sf + 1 END)
                              AS BIGINT) AS touches
                  FROM p)
            SELECT n_docs, n_nonempty, total_tokens,
                   CAST(CASE WHEN total_tokens > 0
                             THEN (total_tokens + 2047) // 2048
                             ELSE 0 END AS BIGINT) AS n_seqs,
                   split_docs,
                   round(CASE WHEN n_nonempty > 0
                              THEN split_docs / CAST(n_nonempty AS DOUBLE)
                         END, 6) + 0.0 AS split_frac,
                   round(CASE WHEN total_tokens > 0
                              THEN touches / CAST((total_tokens + 2047)
                                   // 2048 AS DOUBLE)
                         END, 6) + 0.0 AS docs_per_seq_mean,
                   CAST(CASE WHEN total_tokens > 0
                             THEN (2048 - total_tokens % 2048) % 2048
                             ELSE 0 END AS BIGINT) AS tail_waste_tokens
            FROM a
        """,
    }


def _rotated_round9_oracles() -> dict[str, str]:
    """DuckDB oracles for the 28 round-9 rotated gates (rows-only gates
    omit their entry by design — events_kcore / embedding_dbscan are
    shrinking-set/iterative fixpoints, corpus_lsa_topics an
    eigendecomposition; each carries a pure-Python differential pytest).
    Staged as candidates in round 8, judge-verified, rotated into window
    slots 0-26 + 48 at the round-9 head."""
    ds = _DS.format
    mwu_base = """
        SELECT event_type AS g,
               'v' || CAST(user_id % 2 AS VARCHAR) AS c,
               CAST(value AS DOUBLE) AS s
        FROM events WHERE value IS NOT NULL"""
    kw_base = mwu_base.replace("user_id % 2", "user_id % 3")
    edges_ctes = """
        occ0 AS (
            SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
            FROM events),
        kept AS (
            SELECT event_type, h FROM occ0
            GROUP BY event_type, h HAVING count(*) <= 100),
        occ AS (
            SELECT o.event_type, o.h, o.user_id
            FROM occ0 o JOIN kept k
              ON o.event_type = k.event_type AND o.h = k.h),
        edges AS (
            SELECT a.user_id AS a, b.user_id AS b
            FROM occ a JOIN occ b
              ON a.event_type = b.event_type AND a.h = b.h
             AND a.user_id < b.user_id
            GROUP BY a.user_id, b.user_id
            HAVING count(*) >= 3),
        deg AS (
            SELECT node, count(*) AS deg FROM (
                SELECT a AS node FROM edges
                UNION ALL SELECT b FROM edges) GROUP BY node)"""
    return {
        # Mann-Whitney: tie-averaged rank sums over the collapsed count
        # table, DECIMAL R-sums, tie-corrected z, A-S-erf p
        "events_mann_whitney": f"""
            WITH {_rank_ctes(mwu_base)},
            cc AS (SELECT g, s, c, count(*) AS nc FROM base GROUP BY g, s, c),
            pc AS (SELECT cc.g, cc.c, CAST(sum(cc.nc) AS BIGINT) AS n,
                          {ds(x='cc.nc * rk.avg_rank')} AS r
                   FROM cc JOIN rk ON rk.g = cc.g AND rk.s = cc.s
                   GROUP BY cc.g, cc.c),
            two AS (SELECT g, count(*) AS k,
                           min(c) AS class_a, max(c) AS class_b,
                           arg_min(n, c) AS n_a, arg_max(n, c) AS n_b,
                           arg_min(r, c) AS ra
                    FROM pc GROUP BY g HAVING count(*) = 2),
            f AS (SELECT two.g, class_a, class_b, n_a, n_b,
                         CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
                         CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nn,
                         ra - CAST(n_a AS DOUBLE)*(CAST(n_a AS DOUBLE)+1)/2.0 AS ua,
                         tt.tt AS tv
                  FROM two JOIN tt ON tt.g = two.g),
            zc AS (SELECT *,
                          CASE WHEN na*nb/12.0*((nn + 1.0) - tv/(nn*(nn - 1.0))) <= 0.0
                               THEN 0.0
                               ELSE (ua - na*nb/2.0)
                                    / sqrt(na*nb/12.0*((nn + 1.0) - tv/(nn*(nn - 1.0))))
                          END AS z
                   FROM f)
            SELECT g AS event_type, class_a, class_b, n_a, n_b,
                   round(ua, 6) + 0.0 AS u_a,
                   round(2.0*ua/(na*nb) - 1.0, 6) + 0.0 AS cliffs_delta,
                   round(z, 6) + 0.0 AS z,
                   {_p2_sql('z')} AS p_value
            FROM zc ORDER BY event_type
        """,
        # Kruskal-Wallis: per-class DECIMAL rank sums, tie-corrected H
        "events_kruskal_wallis": f"""
            WITH {_rank_ctes(kw_base)},
            cc AS (SELECT g, s, c, count(*) AS nc FROM base GROUP BY g, s, c),
            pc AS (SELECT cc.g, cc.c, CAST(sum(cc.nc) AS BIGINT) AS n,
                          {ds(x='cc.nc * rk.avg_rank')} AS r
                   FROM cc JOIN rk ON rk.g = cc.g AND rk.s = cc.s
                   GROUP BY cc.g, cc.c),
            agg AS (SELECT g, CAST(count(*) AS INT) AS k,
                           CAST(sum(n) AS BIGINT) AS n0,
                           {ds(x='r*r/n')} AS rr
                    FROM pc GROUP BY g),
            hh AS (SELECT agg.g, agg.k, agg.n0,
                          CAST(agg.n0 AS DOUBLE) AS nn, agg.rr, tt.tt AS tv
                   FROM agg JOIN tt ON tt.g = agg.g),
            calc AS (SELECT g, k, n0,
                            12.0/(nn*(nn + 1.0)) * rr - 3.0*(nn + 1.0) AS h,
                            1.0 - tv/(nn*nn*nn - nn) AS corr
                     FROM hh)
            SELECT g AS event_type, k AS k_classes, n0 AS n,
                   round(h, 6) + 0.0 AS h_stat,
                   round(CASE WHEN corr <= 0.0 THEN h ELSE h/corr END, 6) + 0.0 AS h_adj,
                   CAST(k - 1 AS INT) AS dof
            FROM calc ORDER BY event_type
        """,
        # Brown-Forsythe: quantile_cont medians, DECIMAL z-moments, ANOVA F
        "events_levene_test": f"""
            WITH base AS ({kw_base}),
            med AS (SELECT g, c, quantile_cont(s, 0.5) AS m
                    FROM base GROUP BY g, c),
            zt AS (SELECT b.g, b.c, round(abs(b.s - med.m), 9) AS z
                   FROM base b JOIN med ON med.g = b.g AND med.c = b.c),
            pc AS (SELECT g, c, count(*) AS n,
                          {ds(x='z')} AS sz, {ds(x='z*z')} AS szz
                   FROM zt GROUP BY g, c),
            agg AS (SELECT g, CAST(count(*) AS INT) AS k,
                           CAST(sum(n) AS BIGINT) AS n0,
                           {ds(x='sz')} AS tz,
                           {ds(x='sz*sz/n')} AS bz,
                           {ds(x='szz - sz*sz/n')} AS wss
                    FROM pc GROUP BY g),
            calc AS (SELECT g, k, n0, wss,
                            CAST(k AS DOUBLE) AS kk, CAST(n0 AS DOUBLE) AS nn,
                            bz - tz*tz/CAST(n0 AS DOUBLE) AS bss
                     FROM agg)
            SELECT g AS event_type, k AS k_classes, n0 AS n,
                   round(CASE WHEN wss <= 0.0 OR k < 2 OR n0 <= k THEN NULL
                         ELSE (bss/(kk - 1.0))/(wss/(nn - kk)) END, 6) + 0.0 AS f_stat,
                   CAST(k - 1 AS INT) AS df1,
                   CAST(n0 - k AS BIGINT) AS df2
            FROM calc ORDER BY event_type
        """,
        # Spearman: two tie-averaged rank tables joined back row-level,
        # DECIMAL Pearson on the ranks
        "events_spearman_corr": f"""
            WITH base AS (
                SELECT event_type AS g,
                       CAST(date_part('day', ts) AS DOUBLE) AS x,
                       CAST(value AS DOUBLE) AS y
                FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
            cx AS (SELECT g, x, count(*) AS n FROM base GROUP BY g, x),
            rx AS (SELECT g, x,
                          CAST(coalesce(sum(n) OVER (PARTITION BY g ORDER BY x
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                              0) AS BIGINT) + (n + 1) / 2.0 AS rnk
                   FROM cx),
            cy AS (SELECT g, y, count(*) AS n FROM base GROUP BY g, y),
            ry AS (SELECT g, y,
                          CAST(coalesce(sum(n) OVER (PARTITION BY g ORDER BY y
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                              0) AS BIGINT) + (n + 1) / 2.0 AS rnk
                   FROM cy),
            rr AS (SELECT b.g, rx.rnk AS rxv, ry.rnk AS ryv
                   FROM base b
                   JOIN rx ON rx.g = b.g AND rx.x = b.x
                   JOIN ry ON ry.g = b.g AND ry.y = b.y),
            agg AS (SELECT g, CAST(count(*) AS DOUBLE) AS v,
                           {ds(x='rxv')} AS sx, {ds(x='ryv')} AS sy,
                           {ds(x='rxv*rxv')} AS sxx, {ds(x='rxv*ryv')} AS sxy,
                           {ds(x='ryv*ryv')} AS syy
                    FROM rr GROUP BY g),
            rhoc AS (SELECT g, v, rho, round(rho, 9) AS rho9 FROM (
                         SELECT g, v,
                            CASE WHEN sqrt(v*sxx - sx*sx)*sqrt(v*syy - sy*sy)
                                      <= 0.0 THEN NULL
                            ELSE (v*sxy - sx*sy)
                                 /(sqrt(v*sxx - sx*sx)*sqrt(v*syy - sy*sy))
                            END AS rho
                         FROM agg))
            SELECT g AS event_type, CAST(v AS BIGINT) AS n,
                   round(rho, 6) + 0.0 AS rho,
                   round(CASE WHEN v > 3.0 AND rho9 IS NOT NULL
                                   AND abs(rho9) < 1.0
                         THEN (exp(2.0*(0.5*ln((1.0 + rho9)/(1.0 - rho9))
                                        - 1.959964/sqrt(v - 3.0))) - 1.0)
                              /(exp(2.0*(0.5*ln((1.0 + rho9)/(1.0 - rho9))
                                        - 1.959964/sqrt(v - 3.0))) + 1.0)
                         END, 4) + 0.0 AS ci_lo,
                   round(CASE WHEN v > 3.0 AND rho9 IS NOT NULL
                                   AND abs(rho9) < 1.0
                         THEN (exp(2.0*(0.5*ln((1.0 + rho9)/(1.0 - rho9))
                                        + 1.959964/sqrt(v - 3.0))) - 1.0)
                              /(exp(2.0*(0.5*ln((1.0 + rho9)/(1.0 - rho9))
                                        + 1.959964/sqrt(v - 3.0))) + 1.0)
                         END, 4) + 0.0 AS ci_hi
            FROM rhoc ORDER BY event_type
        """,
        # Mann-Kendall: pairwise sign sum on the date-grain series,
        # tie-corrected variance, continuity-corrected z
        "events_mann_kendall": f"""
            WITH daily AS (
                SELECT event_type AS g,
                       CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS DOUBLE) AS x,
                       CAST(count(*) AS DOUBLE) AS y
                FROM events GROUP BY 1, CAST(ts AS DATE)),
            ss AS (SELECT a.g, CAST(sum(sign(b.y - a.y)) AS DOUBLE) AS s
                   FROM daily a JOIN daily b ON a.g = b.g AND a.x < b.x
                   GROUP BY a.g),
            np AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY g),
            tv AS (SELECT g, {ds(x='t*(t - 1.0)*(2.0*t + 5.0)')} AS tt
                   FROM (SELECT g, CAST(count(*) AS DOUBLE) AS t
                         FROM daily GROUP BY g, y) GROUP BY g),
            zc AS (SELECT np.g, np.n, coalesce(ss.s, 0.0) AS s,
                          CASE WHEN coalesce(ss.s, 0.0) = 0.0
                                 OR (CAST(np.n AS DOUBLE)*(CAST(np.n AS DOUBLE) - 1.0)
                                     *(2.0*CAST(np.n AS DOUBLE) + 5.0) - tv.tt)/18.0 <= 0.0
                               THEN 0.0
                               ELSE (ss.s - sign(ss.s))
                                    / sqrt((CAST(np.n AS DOUBLE)*(CAST(np.n AS DOUBLE) - 1.0)
                                            *(2.0*CAST(np.n AS DOUBLE) + 5.0) - tv.tt)/18.0)
                          END AS z
                   FROM np LEFT JOIN ss ON ss.g = np.g JOIN tv ON tv.g = np.g)
            SELECT g AS event_type, n AS n_points, CAST(s AS BIGINT) AS s_stat,
                   round(z, 6) + 0.0 AS z,
                   {_p2_sql('z')} AS p_value,
                   CASE WHEN {_p2_sql('z')} >= 0.05 THEN 'no_trend'
                        WHEN s > 0 THEN 'increasing'
                        ELSE 'decreasing' END AS trend
            FROM zc ORDER BY event_type
        """,
        # per-source en-rate z vs rest + BH step-up over the family
        "doc_source_fdr": f"""
            WITH per AS (SELECT source, count(*) AS n_docs,
                                CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                                     AS BIGINT) AS n_en
                         FROM documents GROUP BY source),
            tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tn,
                           CAST(sum(n_en) AS BIGINT) AS tk FROM per),
            calc AS (SELECT source, n_docs,
                            CAST(n_en AS DOUBLE)/CAST(n_docs AS DOUBLE) AS ps,
                            CAST(tk - n_en AS DOUBLE)/CAST(tn - n_docs AS DOUBLE) AS pr,
                            CAST(tk AS DOUBLE)/CAST(tn AS DOUBLE) AS pp,
                            CAST(n_docs AS DOUBLE) AS ns,
                            CAST(tn - n_docs AS DOUBLE) AS nr
                     FROM per CROSS JOIN tot),
            zt AS (SELECT source, n_docs, ps,
                          CASE WHEN sqrt(pp*(1.0 - pp)*(1.0/ns + 1.0/nr)) = 0.0
                               THEN 0.0
                               ELSE (ps - pr)/sqrt(pp*(1.0 - pp)*(1.0/ns + 1.0/nr))
                          END AS z
                   FROM calc),
            pt AS (SELECT source, n_docs, ps, z, {_p2_sql('z')} AS p FROM zt),
            rkd AS (SELECT *, CAST(row_number() OVER (ORDER BY p ASC, source ASC)
                                  AS INT) AS r,
                           CAST(count(*) OVER () AS BIGINT) AS m
                    FROM pt),
            adj AS (SELECT *, least(1.0, min(round(CAST(m AS DOUBLE)*p/r, 9))
                        OVER (ORDER BY r DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                        AS pa
                    FROM rkd)
            SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                   round(ps, 6) AS en_rate, round(z, 6) + 0.0 AS z,
                   round(p, 6) + 0.0 AS p_value, r AS p_rank,
                   round(pa, 6) + 0.0 AS p_adj,
                   round(pa, 6) + 0.0 <= 0.05 AS rejected
            FROM adj ORDER BY source
        """,
        # degree assortativity over the triangle-gate co-visitation edges
        "events_assortativity": f"""
            WITH {edges_ctes},
            ends AS (SELECT e.a AS u, e.b AS v FROM edges e
                     UNION ALL SELECT e.b, e.a FROM edges e),
            xy AS (SELECT CAST(d1.deg AS DOUBLE) AS x, CAST(d2.deg AS DOUBLE) AS y
                   FROM ends JOIN deg d1 ON d1.node = ends.u
                             JOIN deg d2 ON d2.node = ends.v),
            agg AS (SELECT CAST(count(*) AS DOUBLE) AS m,
                           {ds(x='x')} AS sx, {ds(x='y')} AS sy,
                           {ds(x='x*y')} AS sxy, {ds(x='x*x')} AS sxx,
                           {ds(x='y*y')} AS syy
                    FROM xy),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
            ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges)
            SELECT n_nodes, n_edges,
                   round(CASE WHEN sqrt(m*sxx - sx*sx)*sqrt(m*syy - sy*sy) <= 0.0
                         THEN NULL
                         ELSE (m*sxy - sx*sy)
                              /(sqrt(m*sxx - sx*sx)*sqrt(m*syy - sy*sy)) END,
                         6) + 0.0 AS assortativity
            FROM nn, ne, agg
        """,
        # Fleiss kappa over the three filter raters
        "doc_fleiss_kappa": f"""
            WITH v AS (
                SELECT doc_id, 'quality' AS rater,
                       CAST(({_QUALITY6} >= 0.5) AS VARCHAR) AS c FROM documents
                UNION ALL
                SELECT doc_id, 'length', CAST((n_chars >= 400) AS VARCHAR)
                FROM documents
                UNION ALL
                SELECT doc_id, 'lang', CAST((lang = 'en') AS VARCHAR)
                FROM documents),
            ic AS (SELECT doc_id, c, count(*) AS n FROM v GROUP BY doc_id, c),
            pi AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS ni,
                          CAST(sum(n*n) AS BIGINT) AS sq
                   FROM ic GROUP BY doc_id),
            modal AS (SELECT ni AS nr FROM (
                          SELECT ni, count(*) AS f FROM pi GROUP BY ni
                          ORDER BY f DESC, ni ASC LIMIT 1)),
            kept AS (SELECT pi.* FROM pi CROSS JOIN modal WHERE ni = nr),
            drp AS (SELECT CAST(count(*) AS BIGINT) AS n_items_dropped
                    FROM pi CROSS JOIN modal WHERE ni <> nr),
            ia AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
                          CAST(max(ni) AS INT) AS nrr,
                          {ds(x='(CAST(sq AS DOUBLE) - CAST(ni AS DOUBLE))'
                              '/(CAST(ni AS DOUBLE)*(CAST(ni AS DOUBLE) - 1.0))')}
                              AS sp
                   FROM kept),
            cc AS (SELECT ic.c, CAST(sum(ic.n) AS BIGINT) AS nc
                   FROM ic JOIN kept ON kept.doc_id = ic.doc_id
                   GROUP BY ic.c),
            ca AS (SELECT CAST(count(*) AS INT) AS n_categories,
                          {ds(x='(CAST(nc AS DOUBLE)/CAST(ia.n_items*ia.nrr AS DOUBLE))'
                              '*(CAST(nc AS DOUBLE)/CAST(ia.n_items*ia.nrr AS DOUBLE))')}
                              AS pe
                   FROM cc CROSS JOIN ia GROUP BY ia.n_items, ia.nrr)
            SELECT ia.n_items, drp.n_items_dropped, ia.nrr AS n_raters,
                   ca.n_categories,
                   round(ia.sp/CAST(ia.n_items AS DOUBLE), 6) + 0.0 AS p_bar,
                   round(ca.pe, 6) + 0.0 AS p_e,
                   round(CASE WHEN ca.pe >= 1.0 THEN NULL
                         ELSE (ia.sp/CAST(ia.n_items AS DOUBLE) - ca.pe)
                              /(1.0 - ca.pe) END, 6) + 0.0 AS kappa
            FROM ia CROSS JOIN ca CROSS JOIN drp
        """,
        # lexical diversity: frequency-of-frequencies closed forms
        "doc_lexical_diversity": """
            WITH t AS (
                SELECT source,
                       unnest(string_split(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                           ' ')) AS token
                FROM documents),
            tok AS (SELECT source, token, count(*) AS m FROM t
                    WHERE length(token) > 0 GROUP BY source, token),
            fr AS (SELECT source, m, count(*) AS vm FROM tok GROUP BY source, m),
            agg AS (SELECT source,
                           CAST(sum(m*vm) AS BIGINT) AS n,
                           CAST(sum(vm) AS BIGINT) AS v,
                           CAST(sum(CASE WHEN m = 1 THEN vm ELSE 0 END) AS BIGINT) AS h,
                           CAST(sum(m*m*vm) AS BIGINT) AS m2
                    FROM fr GROUP BY source)
            SELECT source, n AS n_tokens, v AS n_types,
                   round(CAST(v AS DOUBLE)/sqrt(CAST(n AS DOUBLE)), 6) AS root_ttr,
                   round(CAST(h AS DOUBLE)/CAST(v AS DOUBLE), 6) AS hapax_ratio,
                   round(1e4*(CAST(m2 AS DOUBLE) - CAST(n AS DOUBLE))
                         /(CAST(n AS DOUBLE)*CAST(n AS DOUBLE)), 6) AS yule_k
            FROM agg ORDER BY source
        """,
        # MMD^2 + energy distance: md5-ordered 64-samples, per-dim DECIMAL
        # squared distances, 9dp-quantized kernels, DECIMAL block sums
        "embedding_two_sample_shift": f"""
            WITH sa AS (
                SELECT 'a' AS side, CAST(vec_id AS VARCHAR) AS id,
                       CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE label < 5
                ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
                LIMIT 64),
            sb AS (
                SELECT 'b' AS side, CAST(vec_id AS VARCHAR) AS id,
                       CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE label >= 5
                ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
                LIMIT 64),
            u AS (SELECT * FROM sa UNION ALL SELECT * FROM sb),
            g AS (SELECT round(1.0/CAST(min(len(v)) AS DOUBLE), 9) AS gamma FROM u),
            pr AS (SELECT x.side AS s1, y.side AS s2, x.id AS xi, y.id AS yi,
                          x.v AS xv, y.v AS yv
                   FROM u x JOIN u y
                     ON (x.side < y.side)
                     OR (x.side = y.side AND x.id < y.id)),
            dd AS (SELECT s1, s2, xi, yi,
                          CAST(sum(CAST(round((a - b)*(a - b), 9)
                              AS DECIMAL(25,9))) AS DOUBLE) AS d2
                   FROM (SELECT s1, s2, xi, yi, unnest(xv) AS a, unnest(yv) AS b
                         FROM pr)
                   GROUP BY s1, s2, xi, yi),
            bl AS (SELECT s1, s2,
                          {ds(x='exp(-g.gamma*d2)')} AS ks,
                          {ds(x='sqrt(d2)')} AS dsm
                   FROM dd CROSS JOIN g GROUP BY s1, s2),
            pick AS (SELECT
                        max(CASE WHEN s1 = 'a' AND s2 = 'a' THEN ks END) AS kaa,
                        max(CASE WHEN s1 = 'b' AND s2 = 'b' THEN ks END) AS kbb,
                        max(CASE WHEN s1 = 'a' AND s2 = 'b' THEN ks END) AS kab,
                        max(CASE WHEN s1 = 'a' AND s2 = 'a' THEN dsm END) AS daa,
                        max(CASE WHEN s1 = 'b' AND s2 = 'b' THEN dsm END) AS dbb,
                        max(CASE WHEN s1 = 'a' AND s2 = 'b' THEN dsm END) AS dab
                     FROM bl),
            cn AS (SELECT CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END)
                              AS DOUBLE) AS na,
                          CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END)
                              AS DOUBLE) AS nb
                   FROM u)
            SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   g.gamma AS gamma,
                   round(2.0*kaa/(na*(na - 1.0)) + 2.0*kbb/(nb*(nb - 1.0))
                         - 2.0*kab/(na*nb), 6) + 0.0 AS mmd2,
                   round(2.0*dab/(na*nb) - 2.0*daa/(na*(na - 1.0))
                         - 2.0*dbb/(nb*(nb - 1.0)), 6) + 0.0 AS energy
            FROM pick CROSS JOIN cn CROSS JOIN g
        """,
        # Page-Hinkley: running mean, DECIMAL cumsum deviations, running min
        "events_page_hinkley": """
            WITH daily AS (
                SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
                FROM events GROUP BY 1),
            c AS (SELECT day, n_events,
                         CAST(sum(CAST(n_events AS DECIMAL(30,9))) OVER w
                              AS DOUBLE) / count(*) OVER w AS xbar
                  FROM daily
                  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)),
            d AS (SELECT day, n_events, xbar,
                         round(CAST(n_events AS DOUBLE) - xbar - 0.5, 9) AS dd
                  FROM c),
            m AS (SELECT day, n_events, xbar,
                         CAST(sum(CAST(dd AS DECIMAL(30,9))) OVER w AS DOUBLE)
                             AS mt
                  FROM d
                  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)),
            p AS (SELECT day, n_events, xbar, mt,
                         mt - min(mt) OVER w AS ph
                  FROM m
                  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW))
            SELECT day, n_events,
                   round(xbar, 6) AS running_mean,
                   round(mt, 6) AS m_t,
                   round(ph, 6) + 0.0 AS ph,
                   ph > 10.0 AS is_alarm
            FROM p ORDER BY day
        """,
        # trimmed/winsorized means: quantile_cont cuts, DECIMAL means
        "events_trimmed_mean": f"""
            WITH base AS (
                SELECT event_type AS g, CAST(value AS DOUBLE) AS s
                FROM events WHERE value IS NOT NULL),
            cuts AS (SELECT g, quantile_cont(s, 0.1) AS lo,
                            quantile_cont(s, 0.9) AS hi
                     FROM base GROUP BY g),
            j AS (SELECT b.g, b.s, c.lo, c.hi
                  FROM base b JOIN cuts c ON c.g = b.g),
            agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                           max(lo) AS lo_cut, max(hi) AS hi_cut,
                           {_DS.format(x='s')} AS ssum,
                           CAST(sum(CASE WHEN s >= lo AND s <= hi
                                    THEN 1 ELSE 0 END) AS BIGINT) AS nt,
                           {_DS.format(x='CASE WHEN s >= lo AND s <= hi THEN s END')}
                               AS tsum,
                           {_DS.format(x='least(greatest(s, lo), hi)')} AS wsum
                    FROM j GROUP BY g)
            SELECT g AS event_type, n,
                   round(lo_cut, 6) AS lo_cut, round(hi_cut, 6) AS hi_cut,
                   round(ssum/n, 6) AS mean,
                   round(tsum/nt, 6) AS trimmed_mean,
                   round(wsum/n, 6) AS winsorized_mean
            FROM agg ORDER BY event_type
        """,
        # Kish ESS: one aggregate, DECIMAL weight moments
        "doc_sampling_ess": f"""
            WITH base AS (
                SELECT source AS g, CAST(n_chars AS DOUBLE) AS w
                FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
            agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                           {_DS.format(x='w')} AS sw,
                           {_DS.format(x='w*w')} AS sww
                    FROM base GROUP BY g)
            SELECT g AS source, n,
                   round(sw, 6) AS sum_w,
                   round(sw*sw/sww, 6) AS ess,
                   round(sw*sw/sww/n, 6) AS ess_ratio,
                   round(n/(sw*sw/sww), 6) AS design_effect
            FROM agg ORDER BY source
        """,
        # Brier + Murphy decomposition over 10 fixed bins
        "doc_brier_decomposition": f"""
            WITH base AS (
                SELECT least(greatest(round({_QUALITY6}, 6), 0.0), 1.0) AS p,
                       CAST(CAST(n_chars >= 400 AS INT) AS DOUBLE) AS o
                FROM documents),
            b AS (SELECT least(9, CAST(floor(p*10) AS INT)) AS bin, p, o
                  FROM base),
            per AS (SELECT bin, count(*) AS nk,
                           {_DS.format(x='p')} AS sp,
                           {_DS.format(x='o')} AS so,
                           {_DS.format(x='(p - o)*(p - o)')} AS sq
                    FROM b GROUP BY bin),
            tot AS (SELECT CAST(sum(nk) AS BIGINT) AS n,
                           {_DS.format(x='so')} AS tto,
                           {_DS.format(x='sq')} AS ttq
                    FROM per),
            comps AS (SELECT max(n) AS n,
                             max(round(tto/CAST(n AS DOUBLE), 9)) AS obar,
                             max(round(ttq/CAST(n AS DOUBLE), 9)) AS brier,
                             {_DS.format(
                                 x='CAST(nk AS DOUBLE)*(sp/nk - so/nk)*(sp/nk - so/nk)')}
                                 AS rel_n,
                             {_DS.format(
                                 x='CAST(nk AS DOUBLE)*(so/nk - tto/CAST(n AS DOUBLE))'
                                 '*(so/nk - tto/CAST(n AS DOUBLE))')}
                                 AS res_n
                      FROM per CROSS JOIN tot)
            SELECT CAST(n AS BIGINT) AS n,
                   round(obar, 6) AS base_rate,
                   round(brier, 6) AS brier,
                   round(rel_n/CAST(n AS DOUBLE), 6) + 0.0 AS reliability,
                   round(res_n/CAST(n AS DOUBLE), 6) + 0.0 AS resolution,
                   round(obar*(1.0 - obar), 6) + 0.0 AS uncertainty,
                   round(brier - (rel_n/CAST(n AS DOUBLE)
                         - res_n/CAST(n AS DOUBLE)
                         + obar*(1.0 - obar)), 6) + 0.0 AS within_bin_var
            FROM comps
        """,
        # Welch ANOVA: per-class DECIMAL moments, weighted grand mean,
        # closed-form F + Welch-Satterthwaite df2
        "events_welch_anova": f"""
            WITH base AS ({kw_base}),
            per AS (SELECT g, c, CAST(count(*) AS BIGINT) AS n,
                           {_DS.format(x='s')} AS sx,
                           {_DS.format(x='s*s')} AS sxx
                    FROM base GROUP BY g, c),
            keyed AS (SELECT g, c, n,
                             sx/CAST(n AS DOUBLE) AS m,
                             CASE WHEN n >= 2 THEN
                                 (sxx - sx*sx/CAST(n AS DOUBLE))
                                     /(CAST(n AS DOUBLE) - 1.0) END AS v
                      FROM per),
            ok AS (SELECT *, CAST(n AS DOUBLE)/v AS w
                   FROM keyed WHERE n >= 2 AND v IS NOT NULL AND v > 0.0),
            dropped AS (SELECT g, CAST(count(*) AS INT) AS kd
                        FROM keyed
                        WHERE NOT coalesce(n >= 2 AND v IS NOT NULL AND v > 0.0,
                                           FALSE)
                        GROUP BY g),
            tot AS (SELECT g, CAST(count(*) AS BIGINT) AS k,
                           CAST(sum(n) AS BIGINT) AS nn,
                           {_DS.format(x='w')} AS ww,
                           {_DS.format(x='w*m')} AS wm
                    FROM ok GROUP BY g),
            agg AS (SELECT ok.g, max(tot.k) AS k2, max(tot.nn) AS nn2,
                           {_DS.format(x='ok.w*(ok.m - tot.wm/tot.ww)'
                               '*(ok.m - tot.wm/tot.ww)')} AS a_n,
                           {_DS.format(x='(1.0 - ok.w/tot.ww)'
                               '*(1.0 - ok.w/tot.ww)'
                               '/(CAST(ok.n AS DOUBLE) - 1.0)')} AS h
                    FROM ok JOIN tot ON tot.g = ok.g GROUP BY ok.g),
            calc AS (SELECT agg.g, k2, nn2, h,
                            CAST(k2 AS DOUBLE) AS kk,
                            a_n/(CAST(k2 AS DOUBLE) - 1.0) AS a
                     FROM agg)
            SELECT calc.g AS event_type,
                   CAST(k2 AS INT) AS k_classes,
                   CAST(coalesce(dropped.kd, 0) AS INT) AS k_dropped,
                   nn2 AS n,
                   round(CASE WHEN k2 < 2 OR h <= 0.0 THEN NULL
                         ELSE a/(1.0 + 2.0*(kk - 2.0)/(kk*kk - 1.0)*h) END,
                         6) + 0.0 AS f_stat,
                   CAST(k2 - 1 AS INT) AS df1,
                   round(CASE WHEN h > 0.0
                         THEN (kk*kk - 1.0)/(3.0*h) END, 6) + 0.0 AS df2
            FROM calc LEFT JOIN dropped ON dropped.g = calc.g
            ORDER BY event_type
        """,
        # Cramér's V: cell-table chi2 + closed-form zero-cell mass
        "doc_cramers_v": f"""
            WITH base AS (
                SELECT CAST(lang AS VARCHAR) AS a, CAST(source AS VARCHAR) AS b
                FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL),
            cells AS (SELECT a, b, count(*) AS n FROM base GROUP BY a, b),
            ra AS (SELECT a, CAST(sum(n) AS BIGINT) AS ra FROM cells GROUP BY a),
            cb AS (SELECT b, CAST(sum(n) AS BIGINT) AS cb FROM cells GROUP BY b),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS t,
                           CAST(count(DISTINCT a) AS BIGINT) AS r,
                           CAST(count(DISTINCT b) AS BIGINT) AS c
                    FROM cells),
            j AS (SELECT cells.n, ra.ra, cb.cb, tot.t, tot.r, tot.c,
                         CAST(ra.ra AS DOUBLE)*CAST(cb.cb AS DOUBLE)
                             /CAST(tot.t AS DOUBLE) AS e
                  FROM cells JOIN ra ON ra.a = cells.a
                             JOIN cb ON cb.b = cells.b
                             CROSS JOIN tot),
            chi AS (SELECT max(t) AS n, max(r) AS r_levels, max(c) AS c_levels,
                           {_DS.format(
                               x='(CAST(n AS DOUBLE) - e)*(CAST(n AS DOUBLE) - e)/e')}
                               AS chi2p,
                           {_DS.format(x='e')} AS se
                    FROM j),
            calc AS (SELECT n, r_levels, c_levels,
                            chi2p + (CAST(n AS DOUBLE) - se) AS chi2,
                            CAST(n AS DOUBLE) AS nn,
                            CAST(r_levels AS DOUBLE) AS rr,
                            CAST(c_levels AS DOUBLE) AS cc
                     FROM chi)
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(r_levels AS INT) AS r_levels,
                   CAST(c_levels AS INT) AS c_levels,
                   round(chi2, 6) + 0.0 AS chi2,
                   round(CASE WHEN least(rr - 1.0, cc - 1.0) <= 0.0 THEN NULL
                         ELSE sqrt(chi2/nn/least(rr - 1.0, cc - 1.0)) END,
                         6) + 0.0 AS v,
                   round(CASE WHEN least(rr - (rr-1.0)*(rr-1.0)/(nn-1.0) - 1.0,
                                        cc - (cc-1.0)*(cc-1.0)/(nn-1.0) - 1.0)
                                  <= 0.0 THEN NULL
                         ELSE sqrt(greatest(0.0, chi2/nn
                                   - (rr-1.0)*(cc-1.0)/(nn-1.0))
                              /least(rr - (rr-1.0)*(rr-1.0)/(nn-1.0) - 1.0,
                                     cc - (cc-1.0)*(cc-1.0)/(nn-1.0) - 1.0)) END,
                         6) + 0.0 AS v_corrected
            FROM calc
        """,
        # Cochran's Q over the three binary filter raters
        "doc_cochran_q": f"""
            WITH v AS (
                SELECT doc_id, 'quality' AS t,
                       CAST(({_QUALITY6} >= 0.5) AS INT) AS f FROM documents
                UNION ALL
                SELECT doc_id, 'length', CAST((n_chars >= 400) AS INT)
                FROM documents
                UNION ALL
                SELECT doc_id, 'lang', CAST((lang = 'en') AS INT)
                FROM documents),
            per_item AS (SELECT doc_id, count(*) AS k,
                                CAST(sum(f) AS BIGINT) AS r
                         FROM v GROUP BY doc_id),
            kept AS (SELECT * FROM per_item WHERE k = 3),
            drp AS (SELECT CAST(count(*) AS BIGINT) AS d
                    FROM per_item WHERE k <> 3),
            keptv AS (SELECT v.* FROM v JOIN kept ON kept.doc_id = v.doc_id),
            cols AS (SELECT t, CAST(sum(f) AS BIGINT) AS c
                     FROM keptv GROUP BY t),
            rws AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
                           CAST(sum(r) AS BIGINT) AS tt,
                           CAST(sum(r*r) AS BIGINT) AS rr
                    FROM kept),
            agg AS (SELECT max(n_items) AS n_items, max(tt) AS tt,
                           max(rr) AS rr, CAST(count(*) AS BIGINT) AS kk,
                           {_DS.format(
                               x='(CAST(c AS DOUBLE) - CAST(tt AS DOUBLE)/3)'
                               '*(CAST(c AS DOUBLE) - CAST(tt AS DOUBLE)/3)')}
                               AS num
                    FROM cols CROSS JOIN rws)
            SELECT n_items, drp.d AS n_items_dropped,
                   CAST(kk AS INT) AS k_treatments,
                   round(CASE WHEN CAST(kk AS DOUBLE)*CAST(tt AS DOUBLE)
                                   - CAST(rr AS DOUBLE) <= 0.0 THEN NULL
                         ELSE CAST(kk AS DOUBLE)*(CAST(kk AS DOUBLE) - 1.0)*num
                              /(CAST(kk AS DOUBLE)*CAST(tt AS DOUBLE)
                                - CAST(rr AS DOUBLE)) END, 6) + 0.0 AS q_stat,
                   CAST(kk - 1 AS INT) AS dof
            FROM agg CROSS JOIN drp
        """,
        # Friedman (Conover ties): within-block self-join ranks
        "doc_friedman_test": f"""
            WITH s AS (
                SELECT doc_id, 'quality' AS t,
                       CAST({_QUALITY6} AS DOUBLE) AS v FROM documents
                UNION ALL
                SELECT doc_id, 'length',
                       round(least(n_chars/1000.0, 1.0), 6) FROM documents
                UNION ALL
                SELECT doc_id, 'lang',
                       CAST(CAST((lang = 'en') AS INT) AS DOUBLE)
                FROM documents),
            rk AS (SELECT a.doc_id, a.t,
                          CAST(sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
                               AS BIGINT)
                          + (CAST(sum(CASE WHEN b.v = a.v THEN 1 ELSE 0 END)
                                  AS BIGINT) + 1)/2.0 AS r
                   FROM s a JOIN s b ON b.doc_id = a.doc_id
                   GROUP BY a.doc_id, a.t),
            per_t AS (SELECT t, {_DS.format(x='r')} AS rj FROM rk GROUP BY t),
            tot AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n,
                           {_DS.format(x='r*r')} AS rr FROM rk),
            agg AS (SELECT max(n) AS n2, max(rr) AS rr2,
                           CAST(count(*) AS BIGINT) AS kk,
                           {_DS.format(x='rj*rj')} AS rj2
                    FROM per_t CROSS JOIN tot),
            calc AS (SELECT n2, kk, rj2, rr2,
                            CAST(n2 AS DOUBLE) AS n, CAST(kk AS DOUBLE) AS k
                     FROM agg)
            SELECT n2 AS n_blocks,
                   CAST(0 AS BIGINT) AS n_blocks_dropped,
                   CAST(kk AS INT) AS k_treatments,
                   round(CASE WHEN rr2 - n*k*(k + 1.0)*(k + 1.0)/4.0 <= 0.0
                         THEN NULL
                         ELSE (k - 1.0)*(rj2 - n*(n*k*(k + 1.0)*(k + 1.0)/4.0))
                              /(rr2 - n*k*(k + 1.0)*(k + 1.0)/4.0) END,
                         6) + 0.0 AS chi2,
                   CAST(kk - 1 AS INT) AS dof
            FROM calc
        """,
        # Doksum shift function: per-class decile arrays zipped + joined
        "events_shift_function": """
            WITH base AS (
                SELECT event_type AS g,
                       'v' || CAST(user_id % 2 AS VARCHAR) AS c,
                       CAST(value AS DOUBLE) AS s
                FROM events WHERE value IS NOT NULL),
            two AS (SELECT g, min(c) AS class_a, max(c) AS class_b
                    FROM base GROUP BY g HAVING count(DISTINCT c) = 2),
            qa AS (SELECT g, c, quantile_cont(s,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
                   FROM base GROUP BY g, c),
            ex AS (SELECT g, c, unnest(qs) AS q,
                          unnest(CAST([0.1, 0.2, 0.3, 0.4, 0.5,
                                       0.6, 0.7, 0.8, 0.9] AS DOUBLE[])) AS p
                   FROM qa)
            SELECT two.g AS event_type, two.class_a, two.class_b,
                   round(a.p, 6) AS p,
                   round(a.q, 6) AS q_a, round(b.q, 6) AS q_b,
                   round(b.q - a.q, 6) + 0.0 AS shift
            FROM two
            JOIN ex a ON a.g = two.g AND a.c = two.class_a
            JOIN ex b ON b.g = two.g AND b.c = two.class_b AND b.p = a.p
            ORDER BY event_type, p
        """,
        # shard mixing: serpentine deal replay + per-shard entropy
        "doc_shard_mixing": f"""
            WITH idx AS (
                SELECT doc_id, source, n_chars,
                       row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)
                           - 1 AS i
                FROM documents),
            a AS (SELECT source,
                         CAST(CASE WHEN i % 16 < 8 THEN i % 16
                              ELSE 16 - 1 - (i % 16) END AS INT) AS shard
                  FROM idx),
            cells AS (SELECT shard, source AS g, count(*) AS n
                      FROM a GROUP BY shard, source),
            st AS (SELECT shard, CAST(sum(n) AS BIGINT) AS t
                   FROM cells GROUP BY shard),
            ps AS (SELECT c.shard, CAST(sum(c.n) AS BIGINT) AS n_rows,
                          CAST(count(*) AS INT) AS n_groups,
                          -{_DS.format(
                              x='CAST(c.n AS DOUBLE)/CAST(st.t AS DOUBLE)'
                              '*round(ln(CAST(c.n AS DOUBLE)'
                              '/CAST(st.t AS DOUBLE)), 9)')} AS entropy
                   FROM cells c JOIN st ON st.shard = c.shard
                   GROUP BY c.shard),
            cc AS (SELECT source AS g, count(*) AS n
                   FROM documents GROUP BY source),
            ct AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM cc),
            ch AS (SELECT -{_DS.format(
                       x='CAST(cc.n AS DOUBLE)/CAST(ct.t AS DOUBLE)'
                       '*round(ln(CAST(cc.n AS DOUBLE)'
                       '/CAST(ct.t AS DOUBLE)), 9)')} AS hc
                   FROM cc CROSS JOIN ct)
            SELECT ps.shard, ps.n_rows, ps.n_groups,
                   round(ps.entropy, 6) + 0.0 AS entropy,
                   round(CASE WHEN ch.hc > 0.0
                         THEN ps.entropy/ch.hc END, 6) + 0.0 AS mixing_ratio
            FROM ps CROSS JOIN ch ORDER BY ps.shard
        """,
        # two-sample KS: per-group cumulative class counts, ECDF gap max,
        # 100-term Kolmogorov series (round9 DECIMAL terms, p at 4dp)
        "events_ks_test": f"""
            WITH base AS (
                SELECT event_type AS g,
                       'v' || CAST(user_id % 2 AS VARCHAR) AS c,
                       CAST(value AS DOUBLE) AS s
                FROM events WHERE value IS NOT NULL),
            two AS (SELECT g, min(c) AS class_a, max(c) AS class_b
                    FROM base GROUP BY g HAVING count(DISTINCT c) = 2),
            grouped AS (
                SELECT b.g, b.s,
                       CAST(sum(CASE WHEN b.c = two.class_a THEN 1 ELSE 0 END)
                            AS BIGINT) AS na,
                       CAST(sum(CASE WHEN b.c <> two.class_a THEN 1 ELSE 0 END)
                            AS BIGINT) AS nb
                FROM base b JOIN two ON two.g = b.g GROUP BY b.g, b.s),
            cum AS (SELECT g, s,
                           CAST(sum(na) OVER w AS BIGINT) AS cuma,
                           CAST(sum(nb) OVER w AS BIGINT) AS cumb
                    FROM grouped
                    WINDOW w AS (PARTITION BY g ORDER BY s
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)),
            tot AS (SELECT g, CAST(sum(na) AS BIGINT) AS ta,
                           CAST(sum(nb) AS BIGINT) AS tb
                    FROM grouped GROUP BY g),
            gaps AS (SELECT cum.g, tot.ta, tot.tb,
                            abs(CAST(cuma AS DOUBLE)/CAST(ta AS DOUBLE)
                                - CAST(cumb AS DOUBLE)/CAST(tb AS DOUBLE))
                                AS gap
                     FROM cum JOIN tot ON tot.g = cum.g),
            dd AS (SELECT g, max(ta) AS na2, max(tb) AS nb2,
                          max(round(gap, 9)) AS d
                   FROM gaps GROUP BY g),
            lamt AS (SELECT g, na2, nb2, d,
                            d * sqrt(CAST(na2 AS DOUBLE)*CAST(nb2 AS DOUBLE)
                                     /(CAST(na2 AS DOUBLE)
                                       + CAST(nb2 AS DOUBLE))) AS lam
                     FROM dd),
            ser AS (SELECT g,
                           CAST(sum(CAST(round(
                               CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END
                               * exp(-2.0*k*k*lam*lam), 9)
                               AS DECIMAL(30,9))) AS DOUBLE) AS t
                    FROM lamt CROSS JOIN
                         (SELECT unnest(generate_series(1, 100)) AS k)
                    GROUP BY g)
            SELECT lamt.g AS event_type, two.class_a, two.class_b,
                   lamt.na2 AS n_a, lamt.nb2 AS n_b,
                   round(lamt.d, 6) + 0.0 AS d_stat,
                   round(CASE WHEN lamt.lam <= 0.0 THEN 1.0
                         ELSE least(1.0, greatest(0.0, 2.0*ser.t)) END,
                         4) + 0.0 AS p_value
            FROM lamt JOIN ser ON ser.g = lamt.g
                      JOIN two ON two.g = lamt.g
            ORDER BY event_type
        """,
        # semantic decontamination: planted-leakage cross cosines,
        # per-dim DECIMAL folds replayed exactly
        "embedding_decontaminate": """
            WITH tr AS (
                SELECT vec_id AS train_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 400),
            te AS (
                SELECT vec_id + 1000000 AS test_id,
                       CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 400 AND vec_id % 10 = 0),
            pr AS (SELECT train_id, test_id, tr.v AS vt, te.v AS ve
                   FROM tr CROSS JOIN te),
            d AS (SELECT train_id, test_id,
                         CAST(sum(CAST(round(a*b, 9) AS DECIMAL(25,9)))
                              AS DOUBLE) AS dot,
                         CAST(sum(CAST(round(a*a, 9) AS DECIMAL(25,9)))
                              AS DOUBLE) AS nt,
                         CAST(sum(CAST(round(b*b, 9) AS DECIMAL(25,9)))
                              AS DOUBLE) AS ne
                  FROM (SELECT train_id, test_id, unnest(vt) AS a,
                               unnest(ve) AS b FROM pr)
                  GROUP BY train_id, test_id)
            SELECT train_id, test_id,
                   round(round(dot/(sqrt(nt)*sqrt(ne)), 9), 6) AS cosine_sim
            FROM d WHERE round(dot/(sqrt(nt)*sqrt(ne)), 9) >= 0.95
            ORDER BY train_id, test_id
        """,
        # McNemar: 2x2 discordant cells, continuity-corrected chi2,
        # df=1 p via erf(sqrt(x/2))
        "doc_mcnemar": f"""
            WITH f AS (SELECT CAST({_QUALITY6} >= 0.5 AS INT) AS a,
                              CAST(n_chars >= 400 AS INT) AS b
                       FROM documents),
            c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(a*b) AS BIGINT) AS n11,
                         CAST(sum(a*(1 - b)) AS BIGINT) AS n10,
                         CAST(sum((1 - a)*b) AS BIGINT) AS n01,
                         CAST(sum((1 - a)*(1 - b)) AS BIGINT) AS n00
                  FROM f),
            x AS (SELECT *,
                         CASE WHEN CAST(n10 + n01 AS DOUBLE) <= 0.0 THEN NULL
                         ELSE greatest(0.0, abs(CAST(n10 - n01 AS DOUBLE)) - 1.0)
                              * greatest(0.0, abs(CAST(n10 - n01 AS DOUBLE)) - 1.0)
                              / CAST(n10 + n01 AS DOUBLE) END AS chi2
                  FROM c)
            SELECT n, n11, n10, n01, n00,
                   round(chi2, 6) + 0.0 AS chi2,
                   round(1.0 - (CASE WHEN sqrt(chi2/2.0) < 0 THEN -1.0
                                ELSE 1.0 END)
                         * (1.0 - (0.254829592*(1.0/(1.0 + 0.3275911*sqrt(chi2/2.0)))
                            - 0.284496736*power(1.0/(1.0 + 0.3275911*sqrt(chi2/2.0)), 2)
                            + 1.421413741*power(1.0/(1.0 + 0.3275911*sqrt(chi2/2.0)), 3)
                            - 1.453152027*power(1.0/(1.0 + 0.3275911*sqrt(chi2/2.0)), 4)
                            + 1.061405429*power(1.0/(1.0 + 0.3275911*sqrt(chi2/2.0)), 5))
                            * exp(-sqrt(chi2/2.0)*sqrt(chi2/2.0))),
                         4) + 0.0 AS p_value
            FROM x
        """,
        # Lin CCC: population moments, DECIMAL sums
        "doc_concordance": f"""
            WITH sc AS (SELECT source AS g,
                               CAST({_QUALITY6} AS DOUBLE) AS x,
                               round(least(n_chars/1000.0, 1.0), 6) AS y
                        FROM documents),
            agg AS (SELECT g, CAST(count(*) AS DOUBLE) AS v,
                           {_DS.format(x='x')} AS sx, {_DS.format(x='y')} AS sy,
                           {_DS.format(x='x*x')} AS sxx,
                           {_DS.format(x='x*y')} AS sxy,
                           {_DS.format(x='y*y')} AS syy
                    FROM sc GROUP BY g),
            m AS (SELECT g, v,
                         sx/v AS mx, sy/v AS my,
                         sxx/v - (sx/v)*(sx/v) AS vx,
                         syy/v - (sy/v)*(sy/v) AS vy,
                         sxy/v - (sx/v)*(sy/v) AS cxy
                  FROM agg),
            c AS (SELECT g, v, vx, vy, cxy, mx, my,
                         CASE WHEN vx + vy + (mx - my)*(mx - my) <= 0.0
                              THEN NULL
                         ELSE 2.0*cxy/(vx + vy + (mx - my)*(mx - my)) END
                             AS ccc,
                         CASE WHEN sqrt(vx)*sqrt(vy) <= 0.0 THEN NULL
                         ELSE cxy/(sqrt(vx)*sqrt(vy)) END AS r
                  FROM m)
            SELECT g AS source, CAST(v AS BIGINT) AS n,
                   round(r, 6) + 0.0 AS r,
                   round(ccc, 6) + 0.0 AS ccc,
                   round(CASE WHEN r IS NULL OR abs(r) <= 0.0 THEN NULL
                         ELSE ccc/r END, 6) + 0.0 AS c_b
            FROM c ORDER BY source
        """,
        # Bland-Altman: difference moments, 1.959964 sd band
        "doc_agreement_limits": f"""
            WITH sc AS (SELECT source AS g,
                               round(least(n_chars/1000.0, 1.0), 6)
                               - CAST({_QUALITY6} AS DOUBLE) AS d
                        FROM documents),
            agg AS (SELECT g, CAST(count(*) AS DOUBLE) AS v,
                           {_DS.format(x='round(d, 9)')} AS sd_,
                           {_DS.format(x='round(d, 9)*round(d, 9)')} AS sdd
                    FROM sc GROUP BY g),
            m AS (SELECT g, v, sd_/v AS bias,
                         CASE WHEN v >= 2.0 THEN
                             sqrt(greatest(0.0, sdd/v - (sd_/v)*(sd_/v)))
                         END AS sd
                  FROM agg)
            SELECT g AS source, CAST(v AS BIGINT) AS n,
                   round(bias, 6) + 0.0 AS bias,
                   round(sd, 6) + 0.0 AS sd_diff,
                   round(bias - 1.959964*sd, 6) + 0.0 AS loa_lo,
                   round(bias + 1.959964*sd, 6) + 0.0 AS loa_hi
            FROM m ORDER BY source
        """,
    }
