"""Structured Streaming: file-source stream over events parquet with
tumbling-window agg + watermark, and batch/stream agreement."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.streaming.events import (
    sessionize,
    stream_dedup,
    stream_events,
    tumbling_window_agg,
)


@pytest.fixture()
def events_dir(spark, tmp_path, sf_dir):
    """Copy the events table to a plain-timestamp parquet dir. Some driver
    data generations use TIMESTAMP(NANOS) (which the streaming source
    rejects) and others plain micros — mirror __spark_entry__._t: read nanos
    as long under the legacy conf and truncate, pass micros through."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # watermarks require TIMESTAMP (LTZ); micros-generated data reads as NTZ
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    out = str(tmp_path / "events_stream")
    df.coalesce(2).write.parquet(out)
    return out


def test_stream_tumbling_equals_batch(spark, events_dir, tmp_path):
    batch = spark.read.parquet(events_dir)
    expected = {
        (r["window_start"], r["n_events"])
        for r in tumbling_window_agg(batch, "1 hour").collect()
    }

    stream = stream_events(spark, events_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    agg = tumbling_window_agg(stream, "1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbled")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM tumbled").collect()
    }
    assert got == expected


def test_stateful_running_user_stats(spark, events_dir, tmp_path):
    """applyInPandasWithState custom operator: final per-user state after
    draining the stream equals the batch aggregate."""
    from nbdatatools_spark.streaming.stateful import running_user_stats

    batch = spark.read.parquet(events_dir).where(F.col("user_id") <= 10)
    expected = {
        (r["user_id"], r["n"]): round(r["s"], 6)
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    stream = stream_events(spark, events_dir).where(F.col("user_id") <= 10)
    out = running_user_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("userstate")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per user = final state
    rows = spark.sql(
        "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id "
        "ORDER BY n_events DESC) rn FROM userstate) WHERE rn = 1"
    ).collect()
    got = {(r["user_id"], r["n_events"]): round(r["sum_value"], 6) for r in rows}
    assert got == expected


def test_sessionize_batch_invariants(spark, events_dir):
    ev = spark.read.parquet(events_dir).where(F.col("user_id") <= 20)
    sess = sessionize(ev, gap="30 minutes").cache()
    rows = sess.collect()
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    # session event counts sum to the filtered event count
    assert sum(r["n_events"] for r in rows) == ev.count()
    # session ids are dense from 0 per user
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["session_id"])
    for sids in by_user.values():
        assert sorted(sids) == list(range(len(sids)))


def test_stream_dedup_drops_watermark_window_duplicates(spark, events_dir, tmp_path):
    """Duplicate events arriving within the watermark delay are dropped;
    output matches batch dropDuplicates on event_id."""
    src = spark.read.parquet(events_dir).where(F.col("user_id") <= 10)
    dup_dir = str(tmp_path / "events_dup")
    # two overlapping files: every event once, plus user<=5's events again
    src.coalesce(1).write.parquet(dup_dir)
    src.where(F.col("user_id") <= 5).coalesce(1).write.mode("append").parquet(dup_dir)

    batch = spark.read.parquet(dup_dir)
    n_all = batch.count()
    expected = stream_dedup(batch).count()  # batch path: plain dropDuplicates
    assert expected < n_all  # fixture really contains duplicates
    assert expected == src.count()

    stream = stream_events(spark, dup_dir)
    deduped = stream_dedup(stream, keys=["event_id"], watermark="10 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM dedup_stream").collect()[0]
    assert got["n"] == expected
    assert got["c"] == expected


def test_stream_interval_join_equals_batch(spark, events_dir, tmp_path):
    from nbdatatools_spark.streaming.events import stream_interval_join

    batch = spark.read.parquet(events_dir)
    purchases = batch.where(F.col("event_type") == "purchase")
    views = batch.where(F.col("event_type") == "view")
    expected = {
        (r["event_id"], r["r_event_id"])
        for r in stream_interval_join(
            purchases, views, lookback="10 minutes"
        ).collect()
    }
    assert expected  # fixture has view->purchase pairs within 10 min

    stream = stream_events(spark, events_dir, max_files_per_trigger=1)
    sp = stream.where(F.col("event_type") == "purchase")
    sv = stream.where(F.col("event_type") == "view")
    joined = stream_interval_join(sp, sv, lookback="10 minutes", watermark="2 hours")
    q = (
        joined.writeStream.format("memory")
        .queryName("ivjoin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ivckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM ivjoin").collect()
    }
    assert got == expected


def test_streaming_decayed_sum_equals_batch(spark, sf_dir, tmp_path):
    """Streaming EWMA state after draining an in-order stream equals the
    batch exp_decayed_sum: counts bit-exact, values within n*0.5e-9 (the
    batch operator rounds each term to 9dp for oracle portability; the
    streaming recurrence is exact)."""
    import os

    import __spark_entry__ as e
    from nbdatatools_spark.operators.temporal import exp_decayed_sum
    from nbdatatools_spark.streaming.stateful import running_decayed_sum

    ev = (
        e._t(spark, sf_dir, "events")
        .where(F.col("user_id") <= 10)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("value", F.round(F.col("value") * 4) / 4)
    )
    expected = {
        r.user_id: (r.n_events, r.decayed_sum)
        for r in exp_decayed_sum(ev, "user_id", "value", ["ts", "event_id"], decay=0.5).collect()
    }

    # 4 ts-contiguous slices written as f0..f3: file order == time order,
    # so cross-batch arrival respects event time
    src = str(tmp_path / "ewma_src")
    os.makedirs(src)
    ordered = ev.orderBy("ts", "event_id").collect()
    n = len(ordered)
    schema = ev.schema
    for i in range(4):
        lo, hi = i * n // 4, (i + 1) * n // 4
        spark.createDataFrame(ordered[lo:hi], schema).coalesce(1).write.parquet(
            os.path.join(src, f"slice={i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/slice=*")
    )
    out = running_decayed_sum(stream, decay=0.5)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ewma_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY key "
        "ORDER BY n_events DESC) rn FROM ewma_state) WHERE rn = 1"
    ).collect()
    got = {r.key: (r.n_events, r.decayed_sum) for r in rows}
    assert set(got) == set(expected)
    for k, (n, s_stream) in got.items():
        n_batch, s_batch = expected[k]
        assert n == n_batch, k
        assert abs(s_stream - s_batch) < 1e-6, (k, s_stream, s_batch)


def test_stream_enrich_equals_batch_and_broadcasts(spark, events_dir, tmp_path):
    from nbdatatools_spark.streaming.events import stream_enrich, stream_events

    batch = spark.read.parquet(events_dir)
    dim = (
        batch.select("user_id").distinct()
        .withColumn("segment", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
    )
    expected = {
        (r["event_id"], r["segment"])
        for r in stream_enrich(batch, dim, "user_id").select("event_id", "segment").collect()
    }
    # batch plan: broadcast hash join, stream side never shuffles
    plan = (
        stream_enrich(batch, dim, "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan

    stream = stream_events(spark, events_dir, max_files_per_trigger=1)
    out = stream_enrich(stream, dim, "user_id").select("event_id", "segment")
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["segment"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    assert got == expected

    import pytest as _pytest

    with _pytest.raises(ValueError):
        stream_enrich(batch, dim, "user_id", how="full")


def test_stream_apply_changes_equals_sequential_merge(spark, tmp_path):
    """Draining change batches through the foreachBatch MERGE sink equals
    applying the same batches sequentially with apply_changes."""
    import os
    import time

    from nbdatatools_spark.operators.cdc import apply_changes
    from nbdatatools_spark.streaming.events import stream_apply_changes

    target_dir = str(tmp_path / "snapshot")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id BIGINT, status STRING, amt DOUBLE",
    ).write.parquet(target_dir)

    batches = [
        [(2, "B", 21.0, "upsert"), (4, "d", 40.0, "upsert")],
        [(1, None, 0.0, "delete"), (4, "D", 41.0, "upsert")],
        [(5, "e", 50.0, "upsert"), (3, None, 0.0, "delete")],
    ]
    schema = "id BIGINT, status STRING, amt DOUBLE, op STRING"
    changes_dir = str(tmp_path / "changes")
    os.makedirs(changes_dir)
    for i, rows in enumerate(batches):
        # one file per batch; mtime order drives file-source batch order
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            changes_dir
        )
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(changes_dir)
    )
    q = stream_apply_changes(
        stream,
        target_dir,
        ["id"],
        checkpoint_dir=str(tmp_path / "ckpt_merge"),
    )
    q.awaitTermination(120)

    expected_df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id BIGINT, status STRING, amt DOUBLE",
    )
    for rows in batches:
        expected_df = apply_changes(
            expected_df, spark.createDataFrame(rows, schema), ["id"]
        )
    expected = {(r.id, r.status, r.amt) for r in expected_df.collect()}
    got = {
        (r.id, r.status, r.amt) for r in spark.read.parquet(target_dir).collect()
    }
    assert got == expected == {(2, "B", 21.0), (4, "D", 41.0), (5, "e", 50.0)}


def test_running_zscore_flags_equals_batch_expanding_window(spark, events_dir, tmp_path):
    """Drained stream == python expanding-window replica: each event scored
    against the PRIOR state; anomalies = |z| > 3 after 5 observations."""
    import math

    from nbdatatools_spark.streaming.events import stream_events
    from nbdatatools_spark.streaming.stateful import running_zscore_flags

    stream = stream_events(spark, events_dir, max_files_per_trigger=2)
    q = (
        running_zscore_flags(stream)
        .writeStream.format("memory")
        .queryName("zflags")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_z"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id: (r.z, r.is_anomaly) for r in spark.sql("SELECT * FROM zflags").collect()
    }

    batch = spark.read.parquet(events_dir).orderBy("ts", "event_id").collect()
    by_user: dict = {}
    expect = {}
    for r in batch:
        n, s, ss = by_user.get(r.user_id, (0, 0.0, 0.0))
        x = float(r.value)
        if n > 0:
            mean = s / n
            var = max(ss / n - mean * mean, 0.0)
        else:
            mean, var = 0.0, 0.0
        std = math.sqrt(var)
        z = (x - mean) / std if (n >= 5 and std > 0) else 0.0
        expect[r.event_id] = (round(z, 6), n >= 5 and std > 0 and abs(round(z, 6)) > 3.0)
        by_user[r.user_id] = (n + 1, s + x, ss + x * x)

    assert len(got) == len(expect)
    mismatched = [
        eid for eid in expect
        if got[eid][1] != expect[eid][1] or abs(got[eid][0] - expect[eid][0]) > 1e-6
    ]
    assert not mismatched, mismatched[:5]


def test_stream_drift_monitor_matches_batch_psi(spark, tmp_path, sf_dir):
    """Each micro-batch's PSI rows in the metrics sink equal embedding_psi
    of that batch against the baseline computed directly."""
    import os as _os

    from nbdatatools_spark.operators.analysis import embedding_psi
    from nbdatatools_spark.streaming.events import stream_drift_monitor

    emb = spark.read.parquet(_os.path.join(sf_dir, "embeddings.parquet"))
    baseline = emb.where(F.col("vec_id") < 30)
    current_dir = str(tmp_path / "incoming")
    emb.where(F.col("vec_id") >= 30).coalesce(1).write.parquet(current_dir)

    stream = spark.readStream.schema(emb.schema).parquet(current_dir)
    q = stream_drift_monitor(
        stream,
        baseline,
        metrics_dir=str(tmp_path / "metrics"),
        checkpoint_dir=str(tmp_path / "ckpt_psi"),
    )
    q.awaitTermination(120)

    got = {
        (r.batch_id, r.dim): (r.psi, r.n_baseline, r.n_current)
        for r in spark.read.parquet(str(tmp_path / "metrics")).collect()
    }
    expect = {
        r.dim: (r.psi, r.n_baseline, r.n_current)
        for r in embedding_psi(baseline, emb.where(F.col("vec_id") >= 30)).collect()
    }
    assert len(got) == len(expect)  # one micro-batch (single file)
    for (bid, dim), v in got.items():
        assert v == expect[dim]


def test_stream_cms_equals_batch(spark, sf_dir, tmp_path):
    """Running CMS sketch: draining the document stream leaves exactly the
    batch cms_cells counts in the (bounded, depth x width) aggregation
    state — and the sketch never underestimates."""
    from nbdatatools_spark.operators.lm import cms_cells
    from nbdatatools_spark.streaming.events import stream_cms_sketch

    src = os.path.join(sf_dir, "documents.parquet")
    docs = spark.read.parquet(src)
    expected = {
        (r["d"], r["pos"]): r["cnt"]
        for r in cms_cells(docs, depth=4, width=256).collect()
    }

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.dirname(src) if src.endswith(".parquet") and not os.path.isdir(src) else src)
    )
    cells = stream_cms_sketch(stream, depth=4, width=256)
    q = (
        cells.writeStream.format("memory")
        .queryName("cms_cells_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["d"], r["pos"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_cells_stream").collect()
    }
    assert got == expected
    assert len(got) <= 4 * 256  # bounded state


def test_stream_minhash_candidates_equals_batch(spark, sf_dir, tmp_path):
    """Streaming banded-LSH dedup: for buckets under the cap, draining the
    document stream emits EXACTLY the batch candidate pair set (pairs are
    the same 2-subsets, discovered incrementally across micro-batches)."""
    from nbdatatools_spark.operators.dedup import minhash_lsh_candidates
    from nbdatatools_spark.streaming.dedup_lsh import stream_minhash_candidates

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    src = str(tmp_path / "docs_stream")
    docs.coalesce(3).write.parquet(src)  # 3 files -> 3 micro-batches

    expected = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            docs, num_hashes=16, bands=4, shingle_size=5,
            impl="numpy", max_bucket=100000,
        ).collect()
    }

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cand = stream_minhash_candidates(
        stream, num_hashes=16, bands=4, shingle_size=5, max_bucket=100000
    )
    q = (
        cand.writeStream.format("memory")
        .queryName("lsh_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "lsh_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM lsh_stream").collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == expected and expected
    for r in rows:
        assert r["id_a"] < r["id_b"]


def test_stream_minhash_bucket_cap_saturates(spark, tmp_path):
    """Over-cap buckets stop emitting: 10 identical docs with cap 4 emit
    at most C(4,2) pairs per band and never grow state past the cap."""
    from nbdatatools_spark.streaming.dedup_lsh import stream_minhash_candidates

    docs = spark.createDataFrame(
        [(i, "identical boilerplate text repeated everywhere") for i in range(10)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "sat_stream")
    docs.coalesce(2).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cand = stream_minhash_candidates(
        stream, num_hashes=16, bands=4, shingle_size=5, max_bucket=4
    )
    q = (
        cand.writeStream.format("memory")
        .queryName("lsh_sat")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sat_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM lsh_sat").collect()
    per_band = {}
    for r in rows:
        per_band.setdefault(r["band"], set()).add((r["id_a"], r["id_b"]))
    assert per_band  # identical docs definitely collide
    for band, pairs in per_band.items():
        assert len(pairs) <= 6  # C(4,2) with cap 4


def test_stream_hll_equals_batch(spark, sf_dir, tmp_path):
    """Running HLL sketch: draining the document stream leaves exactly the
    batch hll_registers maxima in the (bounded, 2^p) aggregation state."""
    from nbdatatools_spark.operators.lm import hll_registers
    from nbdatatools_spark.streaming.events import stream_hll_sketch

    src = os.path.join(sf_dir, "documents.parquet")
    docs = spark.read.parquet(src)
    expected = {
        r["reg"]: r["mx"]
        for r in hll_registers(docs, precision=8).collect()
    }

    src_stream = str(tmp_path / "docs_hll_stream")
    docs.coalesce(3).write.parquet(src_stream)  # 3 files -> 3 micro-batches
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_stream)
    )
    regs = stream_hll_sketch(stream, precision=8)
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["reg"]: r["mx"]
        for r in spark.sql("SELECT * FROM hll_regs_stream").collect()
    }
    assert got == expected
    assert len(got) <= 256  # bounded state
