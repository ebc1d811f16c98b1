"""Sequence-packing tests: single-partition differential, partition
invariance, conservation, and boundary cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.packing import pack_sequences


def _reference_pack(rows, max_tokens):
    """Driver-side replica: lay out in order, slice every max_tokens."""
    out, cursor = {}, 0
    for doc_id, tok in sorted(rows):
        first = cursor // max_tokens
        last = (cursor + tok - 1) // max_tokens if tok > 0 else first
        out[doc_id] = (cursor, first, last, cursor % max_tokens)
        cursor += tok
    return out


@pytest.mark.parametrize("n_partitions", [1, 7])
def test_pack_matches_reference_and_is_partition_invariant(spark, n_partitions):
    rows = [(i, (i * 37) % 900 + 1) for i in range(500)]
    # include empties and a giant doc spanning many sequences
    rows += [(500, 0), (501, 10_000), (502, 0), (503, 1)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, n_tokens BIGINT").repartition(
        n_partitions
    )
    got = {
        r["doc_id"]: (r["start_tok"], r["seq_first"], r["seq_last"], r["seq_offset"])
        for r in pack_sequences(df, 2048).collect()
    }
    assert got == _reference_pack(rows, 2048)


def test_pack_conservation_and_no_gaps(spark):
    rows = [(i, (i * 13) % 300 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, n_tokens BIGINT")
    out = pack_sequences(df, 512).orderBy("doc_id").collect()
    cursor = 0
    for r in out:
        assert r["start_tok"] == cursor  # contiguous: no gaps, no overlap
        cursor += r["n_tokens"]
    assert cursor == sum(t for _, t in rows)


def test_pack_exact_boundary_fill(spark):
    # doc 0 fills sequence 0 exactly; doc 1 starts sequence 1 at offset 0
    df = spark.createDataFrame(
        [(0, 1024), (1, 10), (2, 1014), (3, 5)], "doc_id BIGINT, n_tokens BIGINT"
    )
    got = {
        r["doc_id"]: (r["seq_first"], r["seq_last"], r["seq_offset"])
        for r in pack_sequences(df, 1024).collect()
    }
    assert got[0] == (0, 0, 0)
    assert got[1] == (1, 1, 0)
    assert got[2] == (1, 1, 10)   # ends at 2048 exactly -> still sequence 1
    assert got[3] == (2, 2, 0)


def test_pack_rejects_nonpositive_budget(spark):
    df = spark.createDataFrame([(0, 1)], "doc_id BIGINT, n_tokens BIGINT")
    with pytest.raises(ValueError):
        pack_sequences(df, 0)


def test_exact_percent_rank_total_order_and_edges(spark):
    from nbdatatools_spark.operators.analysis import exact_percent_rank
    from pyspark.sql import functions as F

    # ties on value resolved by id tie-break; partition-invariant
    rows = [(i, float(i % 5)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, v DOUBLE")
    for parts in (1, 7):
        out = {
            r["doc_id"]: (r["rank"], r["percentile"])
            for r in exact_percent_rank(
                df.repartition(parts), [F.col("v").asc(), F.col("doc_id").asc()]
            ).collect()
        }
        expect_order = sorted(rows, key=lambda t: (t[1], t[0]))
        for rk, (i, _) in enumerate(expect_order):
            assert out[i] == (rk, rk / 49.0)
    # single row: percentile 0, no zero-division
    one = spark.createDataFrame([(0, 1.0)], "doc_id BIGINT, v DOUBLE")
    r = exact_percent_rank(one, [F.col("v"), F.col("doc_id")]).collect()[0]
    assert (r["rank"], r["percentile"]) == (0, 0.0)


def _reference_pack_bucketed(rows, max_tokens):
    """Driver-side replica: independent stream per bucket."""
    out, cursors = {}, {}
    for doc_id, bucket, tok in sorted(rows):
        cursor = cursors.get(bucket, 0)
        first = cursor // max_tokens
        last = (cursor + tok - 1) // max_tokens if tok > 0 else first
        out[doc_id] = (cursor, first, last, cursor % max_tokens)
        cursors[bucket] = cursor + tok
    return out


@pytest.mark.parametrize("n_partitions", [1, 5, 32])
def test_pack_bucketed_matches_reference(spark, n_partitions):
    from nbdatatools_spark.operators.packing import pack_sequences_bucketed

    # buckets of very different sizes, incl. docs > max_tokens and empties
    rows = [
        (i, i % 3, (i * 37) % 600) for i in range(400)
    ] + [(1000, 7, 0), (1001, 7, 2048)]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, bucket BIGINT, n_tokens BIGINT"
    ).repartition(n_partitions)
    got = {
        r["doc_id"]: (r["start_tok"], r["seq_first"], r["seq_last"], r["seq_offset"])
        for r in pack_sequences_bucketed(
            df, 512, bucket_col="bucket"
        ).collect()
    }
    want = _reference_pack_bucketed([(d, b, t) for d, b, t in rows], 512)
    assert got == want


def test_pack_bucketed_matches_global_pack_within_single_bucket(spark):
    from nbdatatools_spark.operators.packing import pack_sequences_bucketed

    rows = [(i, (i * 13) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, n_tokens BIGINT")
    single = df.withColumn("bucket", F.lit(0))
    a = {
        r["doc_id"]: (r["start_tok"], r["seq_first"], r["seq_last"], r["seq_offset"])
        for r in pack_sequences_bucketed(single, 256, "bucket").collect()
    }
    b = {
        r["doc_id"]: (r["start_tok"], r["seq_first"], r["seq_last"], r["seq_offset"])
        for r in pack_sequences(df, 256).collect()
    }
    assert a == b


def test_pack_bucketed_rejects_nonpositive_budget(spark):
    from nbdatatools_spark.operators.packing import pack_sequences_bucketed

    df = spark.createDataFrame([(1, 0, 5)], "doc_id BIGINT, bucket BIGINT, n_tokens BIGINT")
    with pytest.raises(ValueError):
        pack_sequences_bucketed(df, 0, "bucket")


def test_packing_report_closed_form(spark):
    import pytest as _pt

    from nbdatatools_spark.operators.packing import packing_report

    df = spark.createDataFrame(
        [(1, 10), (2, 25), (3, 7)], "doc_id BIGINT, n_tokens BIGINT"
    )
    out = {r.max_tokens: r for r in packing_report(df, [16, 64]).collect()}
    # total = 42; at 16: 3 sequences, 48 capacity, 6 padding; doc 2 oversized
    r16 = out[16]
    assert (r16.n_sequences, r16.total_tokens, r16.padding_tokens) == (3, 42, 6)
    assert r16.padding_frac == _pt.approx(round(6 / 48.0, 6), abs=1e-9)
    assert r16.n_oversized_docs == 1
    # at 64: one sequence, 22 padding, nothing oversized
    r64 = out[64]
    assert (r64.n_sequences, r64.padding_tokens, r64.n_oversized_docs) == (1, 22, 0)
    with _pt.raises(ValueError):
        packing_report(df, [])
    with _pt.raises(ValueError):
        packing_report(df, [0, 16])


def test_contrastive_negative_no_corpus_grain_window(spark, documents):
    """VERDICT r8 task #3: the 'next doc in id order' negative must route
    through the two-phase partition-offset index, not an unpartitioned
    lead() window over the corpus-grain doc-id table (one row per doc =
    one reducer at 100 TB). Plan assert: no lead(), and every window spec
    left in the plan is the sanctioned P-row __pid offset cumsum."""
    import re

    from nbdatatools_spark.operators.packing import contrastive_chunk_pairs

    plan = (
        contrastive_chunk_pairs(documents, chunk_size=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "lead(" not in plan
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "__pid" in spec, f"corpus-grain window survived: {spec}"
