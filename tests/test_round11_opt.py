"""Round-11 optimization equivalence pins.

- _learn_merges now batches provably-independent top-K merge candidates
  into one driver job: differential-tested against an independent
  pure-Python sequential BPE trainer (same leftmost-greedy fold, same
  (count DESC, pair ASC) argmax) on adversarial corpora — heavy ties,
  shared symbols, disjoint families.
- spearman_corr now ranks BOTH axes in one melted grouped_avg_ranks
  pass: the per-axis rank tables must be bit-identical to the direct
  per-axis passes.
- cooccurrence_edges / association_rules apply their bucket/basket cap
  BEFORE the collect aggregate (broadcast anti-join on over-cap keys):
  output equality on hub-heavy data is pinned here on top of the
  round-10 NULL/cap pins.
- connected_components materializes each round's labels lazily inside
  the convergence count (one job per round): chain-graph fixpoints are
  re-pinned.
"""

from __future__ import annotations

import random
from itertools import combinations

import pytest
from pyspark.sql import functions as F


# --- BPE batched-argmax differential ------------------------------------


def _py_learn_merges(words: dict[str, int], n_merges: int, min_count: int):
    """Independent sequential reference: one argmax per merge, pure
    Python, same semantics as the pre-round-11 one-job-per-merge loop."""
    vocab = {w: list(w) for w in words}
    merges = []
    for step in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            wc = words[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + wc
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_count:
            break
        merges.append((step, left, right, cnt))
        for w, syms in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            vocab[w] = out
    return merges


def _vocab_df(spark, words: dict[str, int]):
    rows = [(w, c, list(w)) for w, c in sorted(words.items())]
    return spark.createDataFrame(
        rows, "word string, count bigint, symbols array<string>"
    )


def _spark_learn(spark, words, n_merges, min_count):
    from nbdatatools_spark.operators.bpe import _learn_merges

    return _learn_merges(_vocab_df(spark, words), n_merges, min_count)


def test_bpe_batched_matches_sequential_random(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        words = {
            "".join(
                rng.choice("abcde") for _ in range(rng.randint(1, 8))
            ): rng.randint(1, 20)
            for _ in range(60)
        }
        for min_count in (1, 3):
            got = _spark_learn(spark, words, 12, min_count)
            want = _py_learn_merges(words, 12, min_count)
            assert got == want, f"seed={seed} min_count={min_count}"


def test_bpe_batched_matches_sequential_disjoint_families(spark):
    # disjoint alphabets with distinct counts: the batch should take
    # several merges per job and still match the sequential chain
    words = {"ababab": 50, "cdcdcd": 40, "efefef": 30, "ghghgh": 20}
    got = _spark_learn(spark, words, 8, 1)
    want = _py_learn_merges(words, 8, 1)
    assert got == want
    # several merges genuinely independent -> more merges than jobs is
    # possible; equality is the contract, job count is measured in the
    # optimization log


def test_bpe_batched_matches_sequential_tie_conflicts(spark):
    # equal counts with shared symbols: tie-break order must survive
    # batching (rule 3 — the later same-count sharing candidate)
    words = {"ab": 10, "bc": 10, "cd": 10, "aabb": 7, "abab": 5}
    got = _spark_learn(spark, words, 6, 1)
    want = _py_learn_merges(words, 6, 1)
    assert got == want


def test_bpe_batched_min_count_stop(spark):
    # min_count termination comes from a FRESH enumeration, never from a
    # stale batch (a new pair can out-rank a stale sub-threshold one)
    words = {"aaab": 3, "cd": 1}
    got = _spark_learn(spark, words, 10, 2)
    want = _py_learn_merges(words, 10, 2)
    assert got == want


# --- spearman fused two-axis ranks --------------------------------------


def test_spearman_fused_ranks_match_per_axis(spark):
    from nbdatatools_spark.operators.stats import grouped_avg_ranks

    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", float(rng.randint(0, 9)), float(rng.randint(0, 5)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    base = df.select("g", "x", "y")
    # direct per-axis passes (the pre-round-11 shape)
    direct_x = {
        (r["g"], r["x"]): (r["n"], r["avg_rank"])
        for r in grouped_avg_ranks(base, "g", "x").collect()
    }
    direct_y = {
        (r["g"], r["y"]): (r["n"], r["avg_rank"])
        for r in grouped_avg_ranks(base, "g", "y").collect()
    }
    # fused melted pass (what spearman_corr runs now)
    melted = base.select(
        "g", F.lit(0).alias("__ax"), F.col("x").alias("__s")
    ).unionAll(base.select("g", F.lit(1).alias("__ax"), F.col("y").alias("__s")))
    counts = (
        melted.groupBy("g", "__ax", "__s")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(F.struct("g", "__ax").alias("__ga"), "__s", "__n")
    )
    fused = grouped_avg_ranks(counts, "__ga", "__s", counts=counts).collect()
    fused_x = {
        (r["__ga"]["g"], r["__s"]): (r["n"], r["avg_rank"])
        for r in fused
        if r["__ga"]["__ax"] == 0
    }
    fused_y = {
        (r["__ga"]["g"], r["__s"]): (r["n"], r["avg_rank"])
        for r in fused
        if r["__ga"]["__ax"] == 1
    }
    assert fused_x == direct_x
    assert fused_y == direct_y


def test_spearman_corr_exact_small(spark):
    from nbdatatools_spark.operators.stats import spearman_corr

    # hand-checkable: within group "g", y = -x (perfect anti-correlation)
    rows = [("g", float(i), float(-i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = spearman_corr(df, "g", "x", "y").collect()
    assert len(out) == 1
    assert out[0]["n"] == 5
    assert out[0]["rho"] == -1.0


# --- cap-before-collect placement ---------------------------------------


def test_cooccurrence_hub_bucket_capped_equals_bruteforce(spark):
    from nbdatatools_spark.operators.graph import cooccurrence_edges

    # one viral hub bucket (40 nodes) + normal buckets: the hub must be
    # dropped by the cap and the rest must match brute force exactly
    rows = [("hub", i) for i in range(40)]
    rows += [(f"b{i % 6}", (i * 5) % 13) for i in range(70)]
    df = spark.createDataFrame(rows, "bk string, node bigint")
    out = {
        (r["src"], r["dst"]): r["weight"]
        for r in cooccurrence_edges(
            df, ["bk"], "node", max_bucket=10, min_support=1
        ).collect()
    }
    buckets: dict[str, set] = {}
    for bk, n in set(rows):
        buckets.setdefault(bk, set()).add(n)
    want: dict[tuple, int] = {}
    for bk, nodes in buckets.items():
        if len(nodes) > 10:
            continue
        for a, b in combinations(sorted(nodes), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert out == want


def test_association_rules_giant_basket_capped(spark):
    from nbdatatools_spark.operators.analysis import association_rules

    # giant basket (30 items, over cap) must not contribute pairs or
    # marginals; small baskets must be exact
    rows = [(999, f"i{k}") for k in range(30)]
    rows += [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(rows, "bk bigint, it string")
    out = {
        (r["item_a"], r["item_b"]): (r["n_a"], r["n_b"], r["n_ab"])
        for r in association_rules(
            df, "bk", "it", min_pair_count=1, max_basket_items=10
        ).collect()
    }
    # capped population: baskets 1..3 only -> n_baskets=3
    assert out == {("a", "b"): (3, 2, 2), ("a", "c"): (3, 1, 1)}


# --- spread guard: production-layout parquet is a plan no-op ------------


def test_spread_small_input_noop_on_production_layout(spark, tmp_path):
    """VERDICT r10 #9: on a parquet layout whose scan already yields
    >= defaultParallelism input splits (the 100-TB posture), the spread
    guard must return the SAME DataFrame — no Exchange added."""
    from nbdatatools_spark.session import spread_small_input

    path = str(tmp_path / "docs_multirg.parquet")
    spark.range(0, 20000).selectExpr(
        "id", "repeat('x', 64) as text"
    ).repartition(40).write.parquet(path)
    conf = spark.conf
    old_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    old_open = conf.get("spark.sql.files.openCostInBytes")
    try:
        # emulate the production ratio (many splits per scan) at test
        # data size: with tiny split packing, the 40-file scan yields
        # >= 32 partitions just as 100-TB files do at the 128MB default
        conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
        conf.set("spark.sql.files.openCostInBytes", "0")
        df = spark.read.parquet(path)
        n_in = df.rdd.getNumPartitions()
        assert n_in >= spark.sparkContext.defaultParallelism
        out = spread_small_input(df)
        assert out is df  # identity: no repartition node in the plan
        assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    finally:
        conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        conf.set("spark.sql.files.openCostInBytes", old_open)


# --- connected_components lazy-round pin --------------------------------


def test_connected_components_chain_fixpoint(spark):
    from nbdatatools_spark.operators.dedup import connected_components

    # 40-node chain: worst-case diameter for min-label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a bigint, id_b bigint"
    )
    got = {
        (r["id"], r["component"])
        for r in connected_components(pairs, max_iter=64).collect()
    }
    assert got == {(i, 0) for i in range(41)}
