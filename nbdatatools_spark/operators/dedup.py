"""Deduplication operators — reference U3 plus the training-data extensions.

Reference semantics: ``cleanup cleanfvec`` drops zero vectors and duplicate
vectors (README.md:97-99); deterministic survivor = lowest ordinal (the
reference keeps first occurrence in file order; ordinals are file order).

Extensions (SURVEY §7.8, first-class for 100TB text pipelines):
- exact text dedup (hash-groupBy on a portable md5 fingerprint)
- MinHash + LSH near-dup (shingle -> minhash signature -> band -> bucket join)
- SimHash (64-bit, hamming buckets)
- n-gram Jaccard verification of candidate pairs
- embedding-cosine near-dup via similarity.topk

Scale notes: every path is a groupBy/join on a hash key — uniform
distribution, no skew. The LSH band join shuffles only (doc_id, band_hash)
pairs, never the text. No driver-side collect anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nbdatatools_spark.functions.text import (
    char_ngrams_of_norm,
    doc_fingerprint,
    normalize_text,
    tokens,
)
from nbdatatools_spark.operators.analysis import is_zero_vector


def _shingle_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int,
    distinct: bool = True,
) -> DataFrame:
    """(id, sh) exploded shingles. Normalization is materialized in
    its own projection BEFORE the n-gram transform — inlining it into the
    transform lambda re-evaluates the regex per shingle (measured ~100x
    slower; see char_ngrams_of_norm).

    ``distinct=False`` skips the per-row ``array_distinct`` (a string
    hash-set build per document). Correct whenever the consumer is
    duplicate-insensitive — min() aggregation over a multiset equals min()
    over its set — and measurably cheaper on long documents."""
    norm = df.select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__norm")
    )
    grams = char_ngrams_of_norm(F.col("__norm"), shingle_size)
    if distinct:
        grams = F.array_distinct(grams)
    # explode_outer + null drop: inner explode's inferred size()>0 filter
    # would inline the normalize+ngram chain into an interpreted per-row
    # scan filter (the winnow_candidate_pairs trap); semantics unchanged.
    return (
        norm.select("id", F.explode_outer(grams).alias("sh"))
        .where(F.col("sh").isNotNull())
    )


# --- reference U3: vector cleanup ---------------------------------------

def clean_vectors(df: DataFrame, ordinal: str = "ordinal", vec: str = "vector") -> DataFrame:
    """``cleanup cleanfvec``: drop all-zero vectors, then keep the
    lowest-ordinal copy of each duplicate vector (README.md:97-99).
    Duplicate grouping keys on the exact array value."""
    nz = df.where(~is_zero_vector(F.col(vec)))
    w = Window.partitionBy(F.col(vec)).orderBy(F.col(ordinal).asc())
    return (
        nz.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# --- exact text dedup -----------------------------------------------------

def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest-id document per normalized-content fingerprint.

    Fingerprint = md5(normalized text): hash-groupBy shuffles 16-byte digests,
    not documents — at 100TB the shuffle payload is ~32B/row.
    """
    w = Window.partitionBy(doc_fingerprint(F.col(text_col))).orderBy(F.col(id_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def incremental_dedup(
    incoming: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dedup an incoming batch against an existing corpus, then within
    itself — the production incremental-ingest path (daily crawl deltas
    joining a standing corpus; re-crawled pages must not re-enter).

    Two stages, both digest-only on the shuffle/join path:

    1. within-batch exact dedup (keep the lowest-id row per fingerprint,
       same rule as ``exact_dedup``);
    2. anti-join the batch against the DISTINCT fingerprint set of the
       existing corpus — both sides shuffle 16-byte md5 digests, never
       documents. The join strategy is left to AQE (the existing-side
       digest set on a 100 TB corpus is far beyond broadcast range; cf.
       the paragraph_dedup forced-broadcast hazard, VERDICT r3 #3).
    """
    fp = doc_fingerprint(F.col(text_col))
    batch = exact_dedup(incoming, id_col=id_col, text_col=text_col)
    seen = existing.select(fp.alias("__fp")).distinct()
    return (
        batch.withColumn("__fp", fp)
        .join(seen, "__fp", "left_anti")
        .drop("__fp")
    )


def exact_dedup_keep_best(
    df: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup keeping the BEST duplicate instead of the lowest id:
    one map-side-combinable ``max_by`` aggregate per fingerprint, ordered
    by (quality, id) — deterministic on quality ties.

    The curation variant of ``exact_dedup``: when a page is crawled twice,
    keep the capture with the higher quality signal (longer render, later
    fetch, better extraction score), not whichever got the smaller id.
    Unlike the window/row_number formulation this is a single aggregate —
    partial max_by merges map-side, so the shuffle carries one candidate
    row per (partition, fingerprint), not every duplicate.
    """
    cols = df.columns
    best = F.max_by(
        F.struct(*[F.col(c) for c in cols]),
        F.struct(F.col(quality_col), F.col(id_col)),
    ).alias("__best")
    return (
        df.groupBy(doc_fingerprint(F.col(text_col)).alias("fingerprint"))
        .agg(best, F.count("*").alias("n_dups"))
        .select("fingerprint", "n_dups", *[F.col(f"__best.{c}").alias(c) for c in cols])
    )


# --- MinHash + LSH --------------------------------------------------------

def _mix64(h):
    """splitmix64 finalizer (public domain constant set): full-avalanche
    mix of a uint64 array. Raw polynomial rolling hashes have weak high
    bits (degree-k polynomial => top bits follow the first byte), which
    biases SimHash votes and MinHash minima; the finalizer fixes both."""
    import numpy as np

    h = h.copy()
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _minhash_numpy_udf(num_hashes: int, shingle_size: int):
    """Arrow-batched pandas UDF: normalized text -> minhash signature.

    Rolling polynomial shingle hashes computed fully vectorized in numpy
    (uint64 wraparound), two independent bases, then Kirsch–Mitzenmacher
    h1 + i*h2 minimums via one (num_hashes, n_shingles) broadcast. No
    per-shingle string objects exist at any point — this is why it beats
    the expression path ~10x on long documents. Shingles are over UTF-8
    bytes (not codepoints); minhash only needs A-vs-B consistency, not
    parity with the expression path's substring shingles.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    P1 = np.uint64(1099511628211)  # FNV prime
    P2 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
    I = np.arange(num_hashes, dtype=np.uint64)[:, None]
    k = shingle_size

    def sig_of(text) -> list:
        b = np.frombuffer(str(text).encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) == 0:
            b = np.zeros(1, dtype=np.uint64)
        n = max(len(b) - k + 1, 1)
        h1 = np.zeros(n, dtype=np.uint64)
        h2 = np.zeros(n, dtype=np.uint64)
        for j in range(min(k, len(b))):
            w = b[j : j + n]
            h1 = h1 * P1 + w
            h2 = h2 * P2 + (w + np.uint64(1))
        h1, h2 = _mix64(h1), _mix64(h2)
        mins = (h1[None, :] + I * h2[None, :]).min(axis=1)
        # >> 1: keep values in signed-long range for Spark's array<bigint>
        return (mins >> np.uint64(1)).astype(np.int64).tolist()

    # no type hints: `from __future__ import annotations` stringifies them
    # and pandas_udf can't resolve pd.Series from this nested scope
    return pandas_udf(lambda texts: texts.map(sig_of), "array<long>")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_size: int = 5,
    impl: str = "numpy",
) -> DataFrame:
    """(id, signature array<bigint>) per document.

    ``impl="numpy"`` (default): vectorized Arrow-batched kernel, the scale
    path — see _minhash_numpy_udf. ``impl="expr"``: pure Catalyst
    expression pipeline, useful where Python workers are unavailable.

    h_i(s) = h1(s) + i*h2(s) (Kirsch–Mitzenmacher double hashing over two
    xxhash64 seeds); signature[i] = min over shingles. KM preserves the
    min-wise independence LSH needs while hashing each shingle STRING only
    twice — the other 62 functions are long multiply-adds, not string
    hashes (measured ~3x cheaper than 64 independent xxhash64 calls).

    Physical shape: explode shingles once (duplicates kept — min() is
    duplicate-insensitive, so the per-row array_distinct hash-set build is
    pure overhead here), compute the num_hashes hash columns flat (plain
    codegen-able exprs, not nested array transforms), then ONE
    hash-aggregate on id with num_hashes min() aggregates — map-side
    partial aggregation shrinks the shuffle to one row per (doc,
    partition). Nested transform-per-seed forms blow past the JIT method
    limit and fall back to interpreted evaluation — 30x slower measured.
    """
    if impl == "numpy":
        # numpy path NOT spread (round 10): the vectorized kernel chews
        # the whole test corpus in ~1s on one task; the exchange + 32
        # Arrow worker spin-ups cost more than they buy (bench showed
        # minhash_candidate_pairs +0.7-1.4s with it), and at production
        # input layouts the spread is a no-op anyway
        sig = _minhash_numpy_udf(num_hashes, shingle_size)
        return df.select(
            F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__norm")
        ).select("id", sig("__norm").alias("signature"))
    from nbdatatools_spark.session import spread_small_input

    # expr/md5 path: the shingle explode + per-shingle hash is the
    # heaviest per-row kernel in the repo — spread an under-split scan
    # first (round 10; no-op on production layouts)
    exploded = _shingle_rows(
        spread_small_input(df), id_col, text_col, shingle_size, distinct=False
    )
    if impl == "md5":
        # Portable path: h1/h2 = two disjoint 13-hex-digit (52-bit) slices of
        # md5(shingle) — md5 renders identically in Spark and DuckDB, so the
        # whole signature is oracle-checkable. i*h2 + h1 < 2^58 for i <= 63:
        # no ANSI overflow in either engine. The KM combination is masked
        # back into the 52-bit domain below: WITHOUT the wrap, i*h2 dominates
        # for large i and every high band's argmin collapses onto the
        # min-h2 shingle — common shingles then produce massive spurious
        # band collisions (observed 23x candidate blowup at sf0.01).
        h1 = F.conv(F.substring(F.md5("sh"), 1, 13), 16, 10).cast("long")
        h2 = F.conv(F.substring(F.md5("sh"), 14, 13), 16, 10).cast("long")
        mask = F.lit((1 << 52) - 1)
    else:
        # shift into a 52-bit domain: i*h2 + h1 stays < 2^59 for i <= 63, so
        # the multiply-add never trips ANSI overflow (uniformity unaffected).
        h1 = F.shiftrightunsigned(F.xxhash64("sh"), 12)
        h2 = F.shiftrightunsigned(F.xxhash64("sh", F.lit(1)), 12)
        mask = F.lit((1 << 52) - 1)
    exploded = exploded.select("id", h1.alias("__h1"), h2.alias("__h2"))
    hashed = exploded.select(
        "id",
        *[
            (F.col("__h1") + F.lit(i) * F.col("__h2")).bitwiseAND(mask).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    agg = hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    max_bucket: int = 2000,
    impl: str = "numpy",
    side_col: str | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded LSH.

    Signature split into ``bands`` rows of ``num_hashes/bands``; documents
    sharing any band hash collide. Shuffle key = (band, band_hash): uniform.
    The self-join is bucket-to-bucket (equi-join on the band hash), never a
    cross join.

    ``side_col``: optional partition tag — when set, ONLY cross-side pairs
    are emitted (the cross-corpus restriction pushed INTO the bucket join,
    so same-side pairs never materialize — measured ~2x fewer candidate
    rows on the cross-corpus gate) and the output carries ``side_a`` /
    ``side_b`` so callers orient without re-joining the tag.

    ``max_bucket`` bounds worst-case blowup: a bucket of n docs emits
    n(n-1)/2 pairs, so one degenerate bucket (boilerplate, empty docs) can
    dominate the whole job at corpus scale. Buckets larger than the cap are
    dropped from THIS band — truly near-identical documents still collide in
    their other bands, and exact-dup handling belongs to exact_dedup anyway.
    The cap costs one extra aggregation on the (band, band_hash) key —
    map-side combinable, no extra pass over the text.

    ``signatures``: optional precomputed ``(id, signature)`` frame (the
    exact shape :func:`minhash_signatures` returns, same ``num_hashes``/
    ``shingle_size``/``impl``). Callers that need the signatures AGAIN
    downstream (minhash_calibration's estimator join) pass the shared
    frame here so the corpus-wide signature pass runs once, not twice
    (optimization round 10, guide §1.2 "remove unnecessary passes").
    """
    rows_per_band = num_hashes // bands
    sig = (
        signatures
        if signatures is not None
        else minhash_signatures(
            df, id_col, text_col, num_hashes, shingle_size, impl=impl
        )
    )

    def band_hash(b):
        joined = F.concat_ws(
            ",",
            F.transform(
                F.slice("signature", b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
        )
        if impl == "md5":
            # portable band key: md5 of "<band>:<m0>,<m1>,..." (DuckDB-identical)
            return F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{b}:"), joined)), 1, 15), 16, 10
            ).cast("long")
        return F.xxhash64(joined, F.lit(b))

    # localCheckpoint instead of persist(): both branches of the self-join
    # (plus the optional bucket-size semi-join) reuse the materialization, and
    # the checkpoint blocks are dropped by the ContextCleaner when the frame
    # is GC'd — persist() here leaked the cache for the session lifetime
    # (VERDICT r1, minor #7).
    banded = sig.select(
        "id",
        F.posexplode(F.array(*[band_hash(b) for b in range(bands)])).alias(
            "band", "band_hash"
        ),
    )
    if side_col is not None:
        tags = df.select(
            F.col(id_col).alias("id"), F.col(side_col).alias("__side")
        )
        banded = banded.join(tags, "id")
    banded = banded.localCheckpoint(eager=False)
    if max_bucket:
        sizes = banded.groupBy("band", "band_hash").agg(F.count("*").alias("__n"))
        banded = banded.join(
            sizes.where(F.col("__n") <= max_bucket).drop("__n"),
            ["band", "band_hash"],
            "left_semi",
        )
    a = banded.alias("a")
    bb = banded.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.id") < F.col("b.id"))
    )
    if side_col is not None:
        cond = cond & (F.col("a.__side") != F.col("b.__side"))
        return (
            a.join(bb, cond)
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.__side").alias("side_a"),
                F.col("b.__side").alias("side_b"),
            )
            .distinct()
        )
    return (
        a.join(bb, cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs; keeps pairs >= threshold.

    Joins shingle sets only for candidates (tiny vs corpus), computes
    |A∩B| / |A∪B| with array_intersect/array_union on distinct shingles.

    Physical shape (optimization round 10, guide §2.3/§2.4): shingle
    arrays are built ONLY for documents that appear in a candidate pair
    — a semi-join of the corpus against the candidate id set runs first,
    so the normalize+ngram+array_distinct work (the verify stage's
    dominant compute) and the join-side build are candidate-bounded, not
    corpus-sized. The restricted shingle table is then localCheckpointed
    once and read by BOTH pair-side joins; before, each side's join
    recomputed the full-corpus shingle table independently (2 full
    text passes + 2 corpus-sized broadcast builds per verify).
    Inner-join semantics are unchanged: rows whose ids are absent from
    ``df`` never produced output before either.

    Pair-stage shape (optimization round 11, guide §2.5/§4.4-analogue):
    profiling showed the per-pair ``array_intersect`` — not the joins
    (0.16 s) and not the md5 signature kernel (~1 s) — was the whole
    verify wall, for two fixable reasons. (1) The jaccard filter and
    the output projection both referenced the intersect expression, and
    Catalyst's project collapse re-evaluated it ~2x per row; the
    intersect count is now computed ONCE into a slim
    (id_a, id_b, na, nb, __i) frame behind a localCheckpoint barrier
    and the ratio/threshold read materialized integers. (2) AQE's
    byte-based partition coalescing squeezed the tiny candidate-pair
    exchange (~1 MB for 45k pairs) into a few partitions, silently
    single-threading the compute-heavy intersect stage — the classic
    under-split-input skew, but mid-plan; the slim pair list is
    round-robin repartitioned to defaultParallelism first, and when the
    candidate-doc set is provably small (<= 50k docs, counted from the
    already-checkpointed candidate frame) the shingle arrays attach via
    explicit broadcast joins so the wide partitioning survives into the
    intersect stage. Larger candidate sets keep the shuffled-join path
    (broadcasting an unbounded array table would be the real hazard).
    Measured on doc_cross_corpus_near_dups: verify stage 6.2 -> ~1.4 s,
    gate 16.5 -> ~10 s isolated median.
    """
    # the candidate frame feeds both the id-set semi-join and the pair
    # join below — materialize it once so an expensive upstream (the
    # banded LSH chain) is not computed twice
    candidates = candidates.localCheckpoint(eager=False)
    cand_ids = (
        candidates.select(F.col("id_a").alias("id"))
        .unionAll(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # broadcast the bounded candidate-id set so the semi-join is a
    # map-side filter — a shuffled semi-join here would move the TEXT
    # payloads across the network just to drop most of them (guide §2.3
    # "shuffle keys and metadata instead of payloads")
    from nbdatatools_spark.session import spread_small_input

    sh = spread_small_input(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .join(F.broadcast(cand_ids), "id", "left_semi")
    ).select(
        "id", normalize_text(F.col("__t")).alias("__norm")
    ).select(
        "id", F.array_distinct(char_ngrams_of_norm(F.col("__norm"), shingle_size)).alias("sh")
    ).select(
        "id", "sh", F.size("sh").alias("ns")
    ).localCheckpoint(eager=False)
    # |A u B| = |A| + |B| - |A n B| on the already-distinct shingle arrays:
    # same integers as size(array_union(...)) without materializing a new
    # union array per pair (the verify stage's dominant allocation)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    sc = candidates.sparkSession.sparkContext
    # slim pair list spread wide BEFORE the compute-heavy intersect stage
    # (AQE would coalesce the ~16B/row pair exchange by bytes and
    # single-thread the intersect); round-robin is retry-safe
    pairs = candidates.select("id_a", "id_b").repartition(
        sc.defaultParallelism
    )
    a_side = sh.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("ns").alias("na")
    )
    b_side = sh.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("ns").alias("nb")
    )
    if cand_ids.count() <= 50_000:
        # bounded candidate-doc set: broadcast the array table so the
        # attach joins keep the wide pair partitioning (guide §3.1)
        a_side, b_side = F.broadcast(a_side), F.broadcast(b_side)
    slim = (
        pairs.join(a_side, "id_a")
        .join(b_side, "id_b")
        .select("id_a", "id_b", "na", "nb", inter.alias("__i"))
        .localCheckpoint(eager=False)
    )
    return (
        slim.withColumn(
            "jaccard",
            F.col("__i").cast("double") / (F.col("na") + F.col("nb") - F.col("__i")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every id in the undirected edge list; component
    = the minimum id reachable (min-label propagation).

    Each round is one equi-join + min-aggregate keyed on the 8-byte id —
    shuffle payload is (id, label) pairs over the DUPLICATE-PAIR graph only
    (tiny vs the corpus), never the documents. Rounds needed = graph
    diameter, which for near-dup clusters is small (duplicate cliques have
    diameter 1-2; pathological chains are bounded by ``max_iter``). Each
    round localCheckpoints to cut lineage — without it the plan doubles per
    iteration and optimizer time dominates.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("__nbr_min"))
        .select(
            F.col("src").alias("id"),
            F.least("src", "__nbr_min").alias("component"),
        )
        .localCheckpoint()
    )
    for round_no in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("component").alias("__dc")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("__dc").alias("__nbr_comp"))
            .select(F.col("src").alias("id"), "__nbr_comp")
        )
        base = labels.join(nbr, "id", "left")
        upd = F.least(
            "component", F.coalesce("__nbr_comp", F.col("component"))
        )
        if round_no >= 3:
            # Pointer jumping (optimization round 11, VERDICT r10 #6):
            # past round 3 the graph has chains (dup cliques converge in
            # <= 3 rounds and never pay this join), so also fold in
            # component(component(v)) — the label a node's current label
            # points at. Reachability is transitive, so the shortcut
            # label is still a reachable id and the update stays a
            # monotone decrease toward the same min-reachable fixpoint;
            # propagation distance now doubles per round (O(log D)
            # rounds instead of O(D) on chain components). Measured:
            # the dbscan gate's component graph (339 edges, diameter
            # ~10) converges in 7 rounds instead of 11.
            jump = labels.select(
                F.col("id").alias("__jid"), F.col("component").alias("__jc")
            )
            base = base.join(
                jump, F.col("component") == F.col("__jid"), "left"
            )
            upd = F.least(upd, F.coalesce("__jc", F.col("component")))
        # carry the changed flag in the SAME update join (optimization
        # round 10): labels only ever decrease, so changed == (new <
        # old); the old per-round convergence check re-JOINED new vs old
        # labels — one extra join job every round.
        # Round 11 (VERDICT r10 #6): the checkpoint is LAZY and the
        # changed-count is a full (un-limited) count, so ONE job per
        # round both materializes the new label table into block
        # storage and answers convergence — the eager checkpoint +
        # separate count ran two driver jobs per round, and round
        # latency is what dominates the chain-shaped gates. The full
        # count computes every partition, so the lazy checkpoint is
        # fully persisted before the next round reads it.
        new_labels = (
            base.select(
                "id",
                upd.alias("component"),
                (upd < F.col("component")).alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where(F.col("__changed")).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    return labels


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    threshold: float = 0.7,
    transitive: bool = False,
    max_iter: int = 20,
    impl: str = "numpy",
) -> DataFrame:
    """Full near-dup removal: LSH candidates -> Jaccard verify -> drop
    confirmed duplicates. ``impl`` selects the signature kernel
    (see :func:`minhash_signatures`; "md5" is the DuckDB-replicable path
    the oracle gate runs).

    ``transitive=False`` (default, the hot path): drop the higher id of
    each confirmed pair — one-hop min-id union. Multi-hop chains (A~B~C
    where A!~C) can leave more than one survivor.

    ``transitive=True``: exact connected components over the verified-pair
    graph via :func:`connected_components` (bounded min-label propagation,
    O(diameter) rounds of 8-byte-key joins on the pair graph only); exactly
    one survivor — the minimum id — per duplicate cluster.
    """
    cands = minhash_lsh_candidates(
        df, id_col, text_col, num_hashes, bands, shingle_size, impl=impl
    )
    verified = jaccard_verify(cands, df, id_col, text_col, shingle_size, threshold)
    if transitive:
        dupes = (
            connected_components(verified, max_iter=max_iter)
            .where(F.col("id") != F.col("component"))
            .select(F.col("id").alias(id_col))
        )
    else:
        dupes = verified.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dupes, id_col, "left_anti")


# --- embedding-cosine near-dup -------------------------------------------

def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "lsh",
    dim: int | None = None,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, cosine_sim) with cosine similarity
    >= threshold — the embedding analogue of MinHash text dedup (SURVEY
    §7.8).

    ``method="exact"``: all-pairs self-join (id_a < id_b is a non-equi
    condition, so Catalyst plans a broadcast nested-loop — only for
    subsets / oracle checks).

    ``method="lsh"`` (scale path): block on ``n_tables`` independent
    random-hyperplane signatures — an equi-join per table on the signature
    key, unioned and de-duplicated, then the exact cosine filter. Two
    near-identical embeddings agree on every hyperplane with probability
    1 - theta/pi per bit, so multi-table signature equality has high
    recall at high thresholds while the join stays hash-partitioned; no
    cross join exists anywhere in the plan.

    SIZE ``n_bits`` WITH THE CORPUS: buckets = 2^n_bits per table and the
    bucket self-join is quadratic in bucket occupancy, so keep expected
    occupancy O(1-10) — n_bits=8 suits ~10^3-10^4 vectors, 16 suits
    ~10^5-10^6, etc. (measured: 200k vectors at n_bits=8 spilled a
    ~600M-pair bucket join to disk; n_bits=16 ran the same input in 22s).
    """
    from nbdatatools_spark.functions.distance import distance_expr
    from nbdatatools_spark.operators.similarity import random_hyperplane_signature

    sim = (1.0 - distance_expr("cosine", F.col("__va"), F.col("__vb"))).alias(
        "cosine_sim"
    )
    from nbdatatools_spark.session import spread_small_input

    df = spread_small_input(df)  # DECIMAL cosine folds / signatures: heavy per row
    if method == "exact":
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            raise ValueError("method='lsh' requires the embedding dimension (dim=)")
        sigs = [
            df.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("__v"),
                random_hyperplane_signature(
                    F.col(vec_col), dim=dim, n_bits=n_bits, seed=seed + 7919 * t
                ).alias("__sig"),
            )
            for t in range(n_tables)
        ]
        from functools import reduce

        def table_pairs(s: DataFrame) -> DataFrame:
            a = s.select(
                F.col("id").alias("id_a"),
                F.col("__v").alias("__va"),
                F.col("__sig").alias("__siga"),
            )
            b = s.select(
                F.col("id").alias("id_b"),
                F.col("__v").alias("__vb"),
                F.col("__sig").alias("__sigb"),
            )
            return a.join(
                b,
                (F.col("__siga") == F.col("__sigb")) & (F.col("id_a") < F.col("id_b")),
            ).select("id_a", "id_b", "__va", "__vb")

        pairs = reduce(
            DataFrame.unionByName, (table_pairs(s) for s in sigs)
        ).dropDuplicates(["id_a", "id_b"])
    return (
        pairs.select("id_a", "id_b", sim)
        .where(F.col("cosine_sim") >= threshold)
    )


# --- SimHash --------------------------------------------------------------

def _simhash_numpy_udf(shingle_size: int):
    """Arrow-batched pandas UDF: normalized text -> 64-bit SimHash.

    Same vectorized rolling-hash front end as the MinHash kernel; votes
    computed by broadcasting the shingle-hash array against the 64 bit
    positions — no per-shingle string objects, no 64-column aggregate.
    DISTINCT shingles vote once each (np.unique), matching the
    expression path's array_distinct semantics."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    P1 = np.uint64(1099511628211)
    BITS = np.arange(64, dtype=np.uint64)[:, None]
    k = shingle_size

    def sim_of(text) -> int:
        b = np.frombuffer(str(text).encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) == 0:
            b = np.zeros(1, dtype=np.uint64)
        n = max(len(b) - k + 1, 1)
        h = np.zeros(n, dtype=np.uint64)
        for j in range(min(k, len(b))):
            h = h * P1 + b[j : j + n]
        h = _mix64(np.unique(h))
        ones = ((h[None, :] >> BITS) & np.uint64(1)).sum(axis=1)  # (64,)
        sim = np.uint64(0)
        sim_bits = (2 * ones > len(h)).astype(np.uint64)
        sim = (sim_bits << BITS[:, 0]).sum(dtype=np.uint64)
        # map to signed long for Spark BIGINT
        return int(np.int64(sim))

    return pandas_udf(lambda texts: texts.map(sim_of), "long")


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 4,
    impl: str = "numpy",
) -> DataFrame:
    """64-bit SimHash per document, as (id, simhash BIGINT).

    Classic Charikar scheme: for each bit position, sum +1/-1 votes of
    the shingle-hash bits; bit = 1 when the vote is positive.

    ``impl="numpy"`` (default): vectorized Arrow-batched kernel (see
    _simhash_numpy_udf). ``impl="expr"``: higher-order array functions,
    fully JVM-side — 64 flat vote columns into one hash-aggregate.
    """
    from nbdatatools_spark.session import spread_small_input

    if impl != "numpy":
        # expr/md5 shingle-vote kernels are per-row heavy — spread an
        # under-split scan (r10). The numpy kernel is NOT spread: it
        # clears the test corpus in ~1s on one task and the exchange +
        # Arrow worker spin-ups cost more (the minhash-numpy finding).
        df = spread_small_input(df)
    if impl == "numpy":
        sim = _simhash_numpy_udf(shingle_size)
        return df.select(
            F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__norm")
        ).select("id", sim("__norm").alias("simhash"))
    if impl == "md5":
        # Portable 60-bit variant: shingle hash = 15-hex-digit md5 prefix,
        # reproducible verbatim in DuckDB ('0x'||substr(md5(sh),1,15))::BIGINT
        # — the whole SimHash becomes oracle-checkable.
        n_bits = 60
        h = F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long")
    else:
        n_bits = 64
        h = F.xxhash64("sh")
    exploded = _shingle_rows(df, id_col, text_col, shingle_size).select(
        "id", h.alias("h")
    )
    # one flat vote column per bit; single hash-aggregate on id
    votes = exploded.select(
        "id",
        *[
            F.when(
                F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1).alias(f"v{b}")
            for b in range(n_bits)
        ],
    )
    agg = votes.groupBy("id").agg(*[F.sum(f"v{b}").alias(f"s{b}") for b in range(n_bits)])
    sim = F.lit(0).cast("long")
    for b in range(n_bits):
        sim = sim + F.when(
            F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return agg.select("id", sim.alias("simhash"))


def hamming_near_dup_pairs(
    hashed: DataFrame,
    id_col: str = "id",
    hash_col: str = "simhash",
    max_hamming: int = 3,
    n_bits: int = 64,
) -> DataFrame:
    """Near-dup pairs over ANY 64-bit-packed fingerprint column (SimHash,
    image dHash/aHash, audio fingerprints...) by hamming distance <=
    ``max_hamming`` — the shared blocking engine behind simhash_near_dups
    and multimodal.media_near_dup_pairs.

    Blocking: split the hash into ``max_hamming + 1`` equal chunks; by
    pigeonhole any pair within ``max_hamming`` bit flips shares at least one
    unchanged chunk — join per chunk, then exact hamming via bit_count(xor).
    Never all-pairs: the join is equi-keyed on (chunk_idx, chunk value), so
    shuffle and candidate volume scale with chunk-bucket occupancy, not n^2.

    Returns (id_a, id_b, hamming INT), id_a < id_b, deduped across chunks.
    """
    n_chunks = max_hamming + 1
    # equal-width chunks; the last chunk absorbs the remainder bits
    width = n_bits // n_chunks
    # Break lineage: the signature table feeds BOTH sides of the self-join;
    # without this the upstream pipeline is recomputed per branch AND its
    # expression tree is re-analyzed by the optimizer for every join
    # subplan (planning dominated the runtime, measured). The materialized
    # table is tiny: 16 bytes/row.
    sh = hashed.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("__h")
    ).localCheckpoint()
    chunk_exprs = []
    for c in range(n_chunks):
        lo = c * width
        w = n_bits - lo if c == n_chunks - 1 else width
        chunk_exprs.append(
            F.shiftrightunsigned(F.col("__h"), lo).bitwiseAND(F.lit((1 << w) - 1))
        )
    chunks = sh.select(
        "id",
        "__h",
        F.posexplode(F.array(*chunk_exprs)).alias("chunk_idx", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.__h").bitwiseXOR(F.col("b.__h"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    shingle_size: int = 4,
    impl: str = "numpy",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming — the
    pigeonhole chunk blocking of :func:`hamming_near_dup_pairs` over
    :func:`simhash` signatures. (Round 1 hard-coded 4 chunks, silently
    losing recall for max_hamming > 3.) ``impl="md5"`` uses the portable
    60-bit simhash, DuckDB-replicable."""
    n_bits = 60 if impl == "md5" else 64
    sh = simhash(df, id_col, text_col, shingle_size, impl=impl)
    return hamming_near_dup_pairs(
        sh, id_col="id", hash_col="simhash", max_hamming=max_hamming, n_bits=n_bits
    )


# --- test-set decontamination ----------------------------------------------

def contaminated_ids(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Training documents sharing any word n-gram with the test set
    (the GPT-3 appendix-C 13-gram decontamination rule; Brown et al. 2020).

    Plan shape: both sides explode to n-grams and immediately project each
    gram to its ``xxhash64`` (8-byte long) — the raw 13-word strings
    (~80-100 bytes each) never leave the map side, so the train-side
    ``.distinct()`` and the contamination equi-join shuffle 8-byte keys,
    not gram text (VERDICT r3 "What's wrong" #4: at corpus scale the raw
    string distinct was the job's dominant shuffle). A 64-bit hash
    collision would take ~2^32 distinct grams per (id) group to matter and
    can only ever inflate n_hits by joining a train gram to a test gram it
    doesn't equal — vanishing at any realistic scale, and irrelevant to
    the kept/dropped decision in :func:`decontaminate` (a false hit needs
    a full 64-bit collision against the test-set gram table). Never a
    doc x doc comparison. The test side is tiny by construction (benchmark
    suites), so it broadcasts. Returns (id, n_hits) with the count of
    distinct contaminated n-grams per training doc.
    """
    from nbdatatools_spark.functions.text import word_shingles

    test_grams = (
        test.select(F.explode_outer(word_shingles(F.col(text_col), n)).alias("__gram"))
        .where(F.length("__gram") > 0)
        .select(F.xxhash64("__gram").alias("__gh"))
        .distinct()
    )
    train_grams = (
        train.select(
            F.col(id_col).alias("id"),
            F.explode_outer(word_shingles(F.col(text_col), n)).alias("__gram"),
        )
        .where(F.col("__gram").isNotNull())
        .select("id", F.xxhash64("__gram").alias("__gh"))
        .distinct()
    )
    return (
        train_grams.join(F.broadcast(test_grams), "__gh")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )


def contamination_fraction(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-document contamination score: of each training doc's DISTINCT
    word n-grams, the fraction also present in the test set — the graded
    companion to the boolean :func:`contaminated_ids` drop rule (PaLM /
    Chowdhery et al. 2022 §7 measure 70%-overlap contamination rather
    than any-overlap; this operator produces that dial).

    Same plan shape and shuffle discipline as :func:`contaminated_ids`:
    grams project to 8-byte ``xxhash64`` keys map-side (raw n-gram
    strings never shuffle), the tiny test-gram table broadcasts, and the
    per-doc aggregate combines map-side. The only addition is a LEFT
    join marker instead of an inner join, so uncontaminated docs report
    0.0 rather than vanishing. Returns (id, n_grams, n_contaminated,
    contamination_frac) — fraction rounded to 6dp for engine-exact
    comparison; docs with no grams report zero counts.
    """
    from nbdatatools_spark.functions.text import word_shingles

    test_grams = (
        test.select(F.explode_outer(word_shingles(F.col(text_col), n)).alias("__gram"))
        .where(F.length("__gram") > 0)
        .select(F.xxhash64("__gram").alias("__gh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    train_grams = (
        train.select(
            F.col(id_col).alias("id"),
            F.explode_outer(word_shingles(F.col(text_col), n)).alias("__gram"),
        )
        .where(F.length("__gram") > 0)
        .select("id", F.xxhash64("__gram").alias("__gh"))
        .distinct()
    )
    scored = (
        train_grams.join(F.broadcast(test_grams), "__gh", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("int").alias(
                "n_contaminated"
            ),
        )
    )
    ids = train.select(F.col(id_col).alias("id")).distinct()
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_grams", F.lit(0)).cast("int").alias("n_grams"),
        F.coalesce("n_contaminated", F.lit(0)).cast("int").alias("n_contaminated"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0)
        )
        .otherwise(
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_grams"), 6
            )
        )
        .alias("contamination_frac"),
    )


def edit_distance_pairs(
    df: DataFrame,
    block_cols: Sequence[str] = ("lang", "source"),
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str | None = "n_chars",
    max_len_delta: int = 3,
    prefix_len: int = 60,
    max_distance: int = 15,
) -> DataFrame:
    """Blocked edit-distance near-dup verification: within each
    ``block_cols`` group, compare id-ordered document pairs whose lengths
    differ by at most ``max_len_delta`` and keep pairs whose Levenshtein
    distance over the first ``prefix_len`` normalized chars is at most
    ``max_distance``. The character-level verify stage complementing the
    token-level :func:`jaccard_verify` — the classic fuzzy-dedup rule for
    short records (titles, citations, product names) where shingle
    methods are too coarse.

    Scale shape: the O(n²) comparison is confined to equi-join blocks —
    one hash shuffle on ``block_cols``, never a cross product (blocking
    is the standard entity-resolution discipline; pick blocks so group
    sizes stay executor-bounded, exactly like SemDeDup's per-cluster
    greedy). The length pre-filter prunes most in-block pairs before the
    O(prefix_len²) distance evaluates; ``levenshtein`` runs JVM-side in
    whole-stage codegen. Returns (id_a, id_b, edit_distance), id_a <
    id_b.
    """
    if prefix_len < 1:
        raise ValueError(f"prefix_len must be >= 1, got {prefix_len}")
    norm = F.substring(normalize_text(F.col(text_col)), 1, prefix_len)
    length = (
        F.col(len_col) if len_col is not None else F.length(F.col(text_col))
    )
    # The length prefilter is PROMOTED into the join key: rows bucket by
    # floor(len / (max_len_delta+1)); the right side replicates into its
    # bucket +/- 1, so any pair within max_len_delta meets on EXACTLY one
    # key (the left row's single bucket) and pairs further apart never
    # meet at all. Without this, block size — and the O(n²) inside each
    # block — grows linearly with the corpus even at fixed key
    # cardinality (measured 7.5x at a 10x sf step; bucketed it's the
    # per-length-range density that bounds the quadratic term instead).
    w = int(max_len_delta) + 1
    bucket = F.floor(length.cast("long") / F.lit(w)).cast("long")
    slim = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("__id"),
        norm.alias("__t"),
        length.cast("long").alias("__len"),
        bucket.alias("__bkt"),
    )
    right = slim.withColumn(
        "__bkt", F.explode(F.array(F.col("__bkt") - 1, F.col("__bkt"), F.col("__bkt") + 1))
    )
    a, b = slim.alias("a"), right.alias("b")
    cond = F.col("a.__bkt") == F.col("b.__bkt")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cond = (
        cond
        & (F.col("a.__id") < F.col("b.__id"))
        & (
            F.abs(F.col("a.__len") - F.col("b.__len"))
            <= F.lit(int(max_len_delta))
        )
    )
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.levenshtein(F.col("a.__t"), F.col("b.__t")).alias("edit_distance"),
        )
        .where(F.col("edit_distance") <= F.lit(int(max_distance)))
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Drop training docs that share any word n-gram with the test set —
    left_anti against :func:`contaminated_ids`. No forced broadcast: the
    hit list is bounded by the contaminated-doc count, which on a dirty
    web corpus can be a large fraction of the corpus — AQE converts the
    anti-join to broadcast at runtime when the hit list turns out small."""
    hits = contaminated_ids(train, test, id_col, text_col, n)
    return train.join(hits.withColumnRenamed("id", id_col), id_col, "left_anti")


def contamination_by_slice(
    train: DataFrame,
    test: DataFrame,
    slice_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-slice contamination dashboard — the domain-grain rollup of
    :func:`contaminated_ids` (Dodge et al. 2021 report C4 benchmark
    contamination BY DOMAIN; "which sources leak the eval set" is the
    remediation question after any contamination hit): per slice, the
    documents and tokens carrying at least one test-set word n-gram,
    with pure-integer half-up 6dp rates.

    Same shuffle discipline as the underlying rule (grams travel as
    8-byte hashes, the test gram table broadcasts) plus one slice-grain
    aggregate. Returns ``(slice_col, n_docs, n_contaminated, doc_rate,
    n_tokens, tokens_contaminated, token_rate)`` ordered by slice.
    """
    from nbdatatools_spark.functions.text import token_count

    hits = contaminated_ids(train, test, id_col, text_col, n).select(
        "id", F.lit(1).alias("__hit")
    )
    base = train.select(
        F.col(id_col).alias("id"),
        F.col(slice_col).alias("__g"),
        token_count(F.col(text_col)).cast("long").alias("__nt"),
    ).join(hits, "id", "left")
    agg = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        F.coalesce(F.sum("__nt"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("__hit") == 1, F.col("__nt")).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("tokens_contaminated"),
    )
    rate = lambda num, den: F.when(  # noqa: E731 — integer half-up 6dp
        F.col(den) > 0,
        F.expr(
            f"(2 * CAST({num} AS DECIMAL(38,0)) * 1000000 + {den})"
            f" div (2 * CAST({den} AS DECIMAL(38,0)))"
        ).cast("double")
        / 1e6,
    )
    return agg.select(
        F.col("__g").alias(slice_col),
        "n_docs",
        "n_contaminated",
        (rate("n_contaminated", "n_docs") + 0.0).alias("doc_rate"),
        "n_tokens",
        "tokens_contaminated",
        (rate("tokens_contaminated", "n_tokens") + 0.0).alias("token_rate"),
    ).orderBy(slice_col)


# --- paragraph-level dedup -------------------------------------------------

def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_dup_docs: int = 2,
    sep: str = "\n",
    broadcast_dup_hashes: bool = False,
) -> DataFrame:
    """Remove paragraphs that appear (normalized) in >= ``min_dup_docs``
    DISTINCT documents — the repeated-span removal step of RefinedWeb/Falcon
    (Penedo et al. 2023) and the line-level variant of C4's boilerplate rule.

    Plan shape: posexplode paragraphs -> md5 hash -> distinct-doc counts per
    hash (16-byte shuffle payload, map-side combinable) -> anti-join the
    duplicated-hash set back -> reassemble surviving paragraphs in original
    position order with one groupBy(doc_id). Documents whose every
    paragraph is boilerplate survive with empty text (callers drop or flag).

    The anti-join is NOT broadcast by default (VERDICT r3 "What's wrong"
    #3): on a 100TB web corpus the duplicated-paragraph hash set is
    millions of rows and an unconditional ``F.broadcast`` hint would
    overrun driver/executor broadcast limits. Left unhinted, AQE converts
    the shuffled anti-join to broadcast at runtime iff the built hash set
    actually fits (spark.sql.autoBroadcastJoinThreshold). Callers who KNOW
    the dup set is small (e.g. a curated boilerplate list) can force the
    old plan with ``broadcast_dup_hashes=True``.
    """
    from nbdatatools_spark.functions.text import normalize_text

    paras = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__para"),
    ).withColumn("__h", F.md5(normalize_text(F.col("__para"))))
    dup_hashes = (
        paras.where(F.length(F.trim("__para")) > 0)
        .groupBy("__h")
        .agg(F.countDistinct("__id").alias("__docs"))
        .where(F.col("__docs") >= min_dup_docs)
        .select("__h")
    )
    if broadcast_dup_hashes:
        dup_hashes = F.broadcast(dup_hashes)
    kept = paras.join(dup_hashes, "__h", "left_anti")
    rebuilt = (
        kept.groupBy("__id")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__para"))),
                    lambda s: s["__para"],
                ),
            ).alias("__text")
        )
    )
    others = [c for c in df.columns if c != text_col]
    return (
        df.select(*others)
        .join(rebuilt.withColumnRenamed("__id", id_col), id_col, "left")
        .select(*others, F.coalesce("__text", F.lit("")).alias(text_col))
    )


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 13,
    min_dup_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-span accounting — the per-document signal behind
    exact-substring dedup (Lee et al. 2022, arXiv:2107.06499: training-set
    substrings repeated verbatim across documents should be removed; the
    full suffix-array span-splice is a single-node algorithm, so the
    engine computes the distributed token-shingle form): for every
    document, the count and fraction of its ``span_tokens``-token windows
    that also occur verbatim in >= ``min_dup_docs`` distinct documents.
    Downstream, rows with high ``dup_span_ratio`` are dropped or sent to
    span-splicing.

    Plan: explode token shingles, md5 map-side (spans never shuffle as
    strings — 16-byte digests only), distinct-doc counts per digest
    (map-side combinable), join the over-threshold digest set back (AQE
    decides broadcast vs shuffle), one groupBy(doc). All keyed, nothing
    all-pairs.

    Returns ``(id_col, n_spans INT, n_dup_spans INT, dup_span_ratio
    DOUBLE)`` — ratio rounded 6dp, NULL for span-less (empty) docs.
    Documents shorter than ``span_tokens`` contribute one short span
    (word_shingles semantics), so near-empty exact duplicates still
    register."""
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")
    if min_dup_docs < 2:
        raise ValueError(f"min_dup_docs must be >= 2, got {min_dup_docs}")
    from nbdatatools_spark.functions.text import word_shingles

    from nbdatatools_spark.session import spread_small_input

    # spread the under-split scan so the explode + md5 kernel
    # parallelizes (round 10); deliberately NOT checkpointed — the
    # digest stream is corpus-token-sized and the source_dup_rate
    # measurement showed recompute beats materializing slim digest rows
    rows = spread_small_input(df).select(
        F.col(id_col).alias("__id"),
        F.explode_outer(word_shingles(F.col(text_col), span_tokens)).alias("__g"),
    ).where(F.col("__g").isNotNull()).select("__id", F.md5("__g").alias("__h"))
    dup = (
        rows.groupBy("__h")
        .agg(F.countDistinct("__id").alias("__docs"))
        .where(F.col("__docs") >= min_dup_docs)
        .select("__h", F.lit(1).alias("__dup"))
    )
    per_doc = (
        rows.join(dup, "__h", "left")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count("__dup").alias("__nd"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("__n"), F.lit(0)).cast("int").alias("n_spans"),
            F.coalesce(F.col("__nd"), F.lit(0)).cast("int").alias("n_dup_spans"),
            F.round(
                F.col("__nd").cast("double") / F.col("__n"), 6
            ).alias("dup_span_ratio"),
        )
    )


def minhash_quality_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    threshold: float = 0.7,
    sample_ids: int = 200,
    impl: str = "numpy",
) -> DataFrame:
    """Measured precision/recall of MinHash-LSH candidate generation against
    EXACT Jaccard ground truth on a bounded sample — the tuning readout for
    (num_hashes, bands, threshold): banding theory gives the s-curve, this
    gives the number on YOUR corpus before a 100-TB run commits to the
    parameters.

    Sample = the ``sample_ids`` lowest ids (deterministic); ground truth =
    exact all-pairs Jaccard WITHIN the sample (O(sample²) — bounded by
    construction, never corpus-sized). Returns one row:
    ``(n_sample, n_true_pairs, n_candidates, n_candidates_true, precision,
    recall)`` where precision/recall treat candidate-generation as the
    retrieval step for true pairs (>= threshold).
    """
    sample = df.where(F.col(id_col) < sample_ids) if str(df.schema[id_col].dataType) in (
        "LongType()", "IntegerType()"
    ) else df.limit(sample_ids)
    # localCheckpoint, not persist (repo policy / VERDICT r7 hygiene #1):
    # the returned frame is lazy, so a persist would be evicted by the
    # unpersist below and the candidate+truth joins would recompute the
    # sample; the checkpoint truncates lineage and stays materialized for
    # both the count here and the caller's later action.
    sample = sample.select(id_col, text_col).localCheckpoint(eager=False)

    cand = minhash_lsh_candidates(
        sample,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_size=shingle_size,
        impl=impl,
    ).select("id_a", "id_b")

    sh = sample.select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__n")
    ).select(
        "id",
        F.array_distinct(char_ngrams_of_norm(F.col("__n"), shingle_size)).alias("sh"),
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )
    joined = truth.withColumn("__t", F.lit(1)).join(
        cand.withColumn("__c", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    agg = joined.agg(
        F.sum(F.coalesce("__t", F.lit(0))).alias("n_true"),
        F.sum(F.coalesce("__c", F.lit(0))).alias("n_cand"),
        F.sum(
            F.when(F.col("__t").isNotNull() & F.col("__c").isNotNull(), 1).otherwise(0)
        ).alias("n_hit"),
    )
    n_sample = sample.count()
    return agg.select(
        F.lit(n_sample).alias("n_sample"),
        F.col("n_true").alias("n_true_pairs"),
        F.col("n_cand").alias("n_candidates"),
        F.col("n_hit").alias("n_candidates_true"),
        F.round(
            F.when(F.col("n_cand") == 0, F.lit(None)).otherwise(
                F.col("n_hit").cast("double") / F.col("n_cand")
            ),
            6,
        ).alias("precision"),
        F.round(
            F.when(F.col("n_true") == 0, F.lit(None)).otherwise(
                F.col("n_hit").cast("double") / F.col("n_true")
            ),
            6,
        ).alias("recall"),
    )


def sentence_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-sentence removal (the RefinedWeb /
    MassiveText line-dedup rule at sentence granularity): any sentence
    whose md5 digest occurs in >= ``min_docs`` DISTINCT documents is
    dropped from every document; the survivors are re-joined in original
    order. Complements paragraph_dedup (whole-unit drop) and
    remove_duplicate_spans (token windows) at the sentence grain —
    boilerplate lines, cookie banners and licence footers repeat across
    pages long before whole paragraphs do.

    Returns (id, n_sentences, n_removed, text_dedup) — empty/sentence-
    free docs survive with ''.

    100-TB shape: sentences shuffle as md5 digests (raw strings never
    leave their doc rows); the dup set is one digest-keyed aggregate
    (count DISTINCT doc) equi-joined back; the rebuild is one groupBy(id)
    with an array_sort on (position, sentence) — per-task state is one
    document's sentences.
    """
    from nbdatatools_spark.functions.text import sentences_of

    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    sents = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode_outer(sentences_of(F.col(text_col))).alias("pos", "s"),
        )
        .where(F.col("s").isNotNull())
        .select("id", "pos", "s", F.md5("s").alias("__h"))
    )
    dup = (
        sents.groupBy("__h")
        .agg(F.countDistinct("id").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__h", F.lit(True).alias("__dup"))
    )
    marked = sents.join(dup, "__h", "left")
    totals = sents.groupBy("id").agg(F.count(F.lit(1)).alias("__n"))
    rebuilt = (
        marked.where(F.col("__dup").isNull())
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("__kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda x: x["s"],
                ),
                " ",
            ).alias("__t"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(totals, "id", "left")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("__n", F.lit(0)).cast("int").alias("n_sentences"),
            (F.coalesce("__n", F.lit(0)) - F.coalesce("__kept", F.lit(0)))
            .cast("int")
            .alias("n_removed"),
            F.coalesce("__t", F.lit("")).alias("text_dedup"),
        )
        .orderBy(id_col)
    )


def containment_verify(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 5,
    threshold: float = 0.5,
    max_pairs: int | None = None,
) -> DataFrame:
    """Exact shingle-set CONTAINMENT on candidate pairs: c_ab =
    |A∩B| / |A|, c_ba = |A∩B| / |B|; keeps pairs with max(c_ab, c_ba)
    >= threshold — the asymmetric near-dup signal Jaccard misses (a
    short document fully embedded in a long one has low Jaccard but
    containment ~1: quote farms, wrapper pages, excerpt mirrors).

    DIGEST-KEYED shape (not jaccard_verify's array join): shingle sets
    explode once to slim (id, md5(gram)) rows; the intersection is one
    equi-join chain candidate->grams_a->grams_b + a pair-keyed count.
    Raw grams and wide arrays never shuffle — per-pair cost is
    |A| slim rows, not |A|+|B| bytes of array payload (measured 2x on
    75k candidates at sf0.1; at corpus scale the array form ships
    full shingle sets per pair, this ships 16-byte digests). Pairs with
    EMPTY intersection cannot clear a positive threshold, so dropping
    them in the join is semantics-preserving. Ratios are int/int
    divisions rounded to 6dp — engine-exact.

    ``max_pairs`` caps the exact-verify stage with the SAME deterministic
    md5 pair ranking as minhash_calibration — on dup-dense corpora the
    banded candidates grow quadratically inside duplicate cliques
    (measured 463s on the 10x replica whose clones stuff every bucket);
    a content-stable sample bounds the verify bill at any scale while
    staying oracle-replicable.
    """
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    if max_pairs is not None:
        rank = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("id_a").cast("string"),
                        F.lit(":"),
                        F.col("id_b").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        candidates = candidates.orderBy(
            rank.asc(), F.col("id_a").asc(), F.col("id_b").asc()
        ).limit(int(max_pairs))
    dg = (
        df.select(
            F.col(id_col).alias("id"),
            normalize_text(F.col(text_col)).alias("__norm"),
        )
        .select(
            "id",
            F.explode_outer(
                char_ngrams_of_norm(F.col("__norm"), shingle_size)
            ).alias("__g"),
        )
        .where(F.col("__g").isNotNull())
        .select("id", F.md5("__g").alias("__h"))
        .distinct()
    )
    sz = dg.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    ga = dg.select(F.col("id").alias("id_a"), "__h")
    gb = dg.select(F.col("id").alias("id_b"), "__h")
    inter = (
        candidates.join(ga, "id_a")
        .join(gb, ["id_b", "__h"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__ni"))
    )
    sa = sz.select(F.col("id").alias("id_a"), F.col("n").alias("__na"))
    sb = sz.select(F.col("id").alias("id_b"), F.col("n").alias("__nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("__ni").cast("double") / F.col("__na"), 6).alias("c_ab"),
            F.round(F.col("__ni").cast("double") / F.col("__nb"), 6).alias("c_ba"),
        )
        .withColumn("containment", F.greatest("c_ab", "c_ba"))
        .where(F.col("containment") >= threshold)
    )


def winnow_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int = 200,
    portable: bool = True,
) -> DataFrame:
    """Partial-duplicate candidate pairs via winnowing fingerprints
    (Schleimer/Wilkerson/Aiken SIGMOD'03 — the MOSS algorithm): two docs
    sharing >= ``min_shared`` selected fingerprints share a substring of
    length >= k + w - 1 per fingerprint; this is the detector for
    copy-with-edits (quotes, mirrored passages) that whole-document
    MinHash misses.

    Scale shape: the SAME banded-equi-join discipline as MinHash LSH —
    explode each doc's fingerprint set, equi-join on the fingerprint
    value, NEVER doc x doc. Fingerprints appearing in more than
    ``max_bucket`` docs are dropped before the self-join (boilerplate
    fingerprints, the stop-word analogue: their quadratic bucket would
    dominate cost while carrying no discriminative signal). Pair counting
    is one map-side-combinable aggregate on (id_a, id_b).
    """
    from nbdatatools_spark.functions.text import winnow_fingerprints

    # PERF (two traps, both measured on this exact pipeline):
    # 1. The repartition between the fingerprint projection and the explode
    #    keeps the staged normalize->kgram->window-minima projections on the
    #    map side of a shuffle, so the explode reads a plain attribute and
    #    the shuffle spreads docs across tasks — what 100 TB wants anyway.
    # 2. explode_outer, NOT explode: for inner explode, Catalyst's
    #    InferFiltersFromGenerate synthesizes `size(fingerprints) > 0` and
    #    predicate pushdown substitutes the WHOLE nested HOF chain into a
    #    per-row interpreted DataFilter at the parquet scan — the O(n*w)
    #    md5 tree evaluated twice per row, once interpreted (measured ~100x:
    #    292s -> 3s at sf0.01). The rule skips outer generate; the only
    #    cost is a null row per empty doc, dropped on the cheap exploded
    #    attribute below.
    arr = winnow_fingerprints(
        df.select(id_col, text_col), text_col=text_col, k=k, w=w, portable=portable
    ).repartition(id_col)
    fps = (
        arr.select(F.col(id_col).alias("__id"), F.explode_outer("fingerprints").alias("fp"))
        .where(F.col("fp").isNotNull())
    )
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") > max_bucket)
        .select("fp")
    )
    pruned = fps.join(hot, "fp", "left_anti")
    a = pruned.select(F.col("__id").alias("id_a"), "fp")
    b = pruned.select(F.col("__id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def source_overlap_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Cross-slice contamination matrix: for every pair of corpus slices
    (sources, dumps, domains), the number of distinct word ``n``-grams they
    share plus the gram-set Jaccard — the pre-mixing audit that catches one
    slice silently containing another (mirror dumps, re-crawls, benchmark
    leakage between sub-corpora). The pairwise face of the GPT-3 13-gram
    decontamination rule (contaminated_ids).

    Scale shape: grams project to ``xxhash64`` digests map-side (raw
    13-word strings never shuffle — the dedup-family rule); the corpus-
    sized shuffle is ONE distinct over (slice, digest); the overlap join
    is digest-keyed, and each digest's bucket is bounded by the number of
    slices (a gram shared by s slices yields <= s(s-1)/2 pair rows, s =
    |slices| ~ tens) — never doc x doc, never slice x slice on raw text.
    Per-slice gram totals ride the same distinct relation.

    Returns ``(slice_a, slice_b, n_shared, n_a, n_b, jaccard)`` for pairs
    with at least one shared gram, slice_a < slice_b.
    """
    from nbdatatools_spark.functions.text import word_shingles

    grams = (
        df.select(
            F.col(group_col).alias("__g"),
            F.explode_outer(word_shingles(F.col(text_col), n)).alias("__gram"),
        )
        .where(F.length("__gram") > 0)
        .select("__g", F.xxhash64("__gram").alias("__gh"))
        .distinct()
        # localCheckpoint, not persist: the returned frame is lazy, so a
        # persist here would leak the cache entry for the whole session
        # (the caller never sees `grams` to unpersist it) — the hazard the
        # minhash verify path documents above.
        .localCheckpoint(eager=False)
    )
    totals = grams.groupBy("__g").agg(F.count(F.lit(1)).alias("__tot"))
    a = grams.select(F.col("__g").alias("slice_a"), "__gh")
    b = grams.select(F.col("__g").alias("slice_b"), "__gh")
    shared = (
        a.join(b, "__gh")
        .where(F.col("slice_a") < F.col("slice_b"))
        .groupBy("slice_a", "slice_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = totals.select(F.col("__g").alias("slice_a"), F.col("__tot").alias("n_a"))
    tb = totals.select(F.col("__g").alias("slice_b"), F.col("__tot").alias("n_b"))
    return (
        shared.join(ta, "slice_a")
        .join(tb, "slice_b")
        .select(
            "slice_a",
            "slice_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 13,
    min_occurrences: int = 2,
) -> DataFrame:
    """ExactSubstr-style duplicated-span REMOVAL (Lee et al. 2022,
    arXiv:2107.06499 §3.1): any ``k``-token window occurring at least
    ``min_occurrences`` times across the corpus (counting intra-document
    repeats, as the suffix-array formulation does) is cut from every
    document, and the survivors' tokens are re-joined. The companion of
    duplicate_span_stats that actually produces the cleaned corpus.

    Scale shape: positional k-gram digests (``xxhash64``; raw gram strings
    never shuffle) -> ONE digest-keyed count to find duplicated grams ->
    one digest-keyed equi-join carries (doc, position) hits back -> per-doc
    covered-position mask built with array HOFs (array_except is a
    sort-based O(len log len) per row, not O(len * covered)). Per-doc state
    is bounded by the doc's own token count; nothing is ever doc x doc.

    Whitespace is canonicalized: output text is the kept tokens joined by
    single spaces (byte-identical tokens, original case). Returns
    ``(id_col, clean_text, n_tokens, n_removed)``.
    """
    from nbdatatools_spark.functions.text import _let, tokens

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_occurrences < 2:
        raise ValueError(f"min_occurrences must be >= 2, got {min_occurrences}")
    from nbdatatools_spark.session import spread_small_input

    toks = spread_small_input(df).select(
        F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__t")
    )
    # positional grams: (doc, start, digest); docs shorter than k emit none
    def gram_structs(t):
        return F.when(
            F.size(t) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (k - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.xxhash64(F.concat_ws(" ", F.slice(t, i, k))).alias("gh"),
                ),
            ),
        ).otherwise(F.expr("CAST(array() AS array<struct<pos:int,gh:bigint>>)"))

    # explode_outer, not explode: inner explode triggers Catalyst's
    # InferFiltersFromGenerate, whose size()>0 filter pushes the whole
    # tokenize+hash chain into an interpreted per-row scan filter (the
    # winnow_candidate_pairs trap). Null rows from gram-less docs drop on
    # the cheap exploded attribute instead.
    grams = (
        toks.select("__id", F.explode_outer(_let(F.col("__t"), gram_structs)).alias("__p"))
        .where(F.col("__p").isNotNull())
        .select("__id", F.col("__p.pos").alias("__pos"), F.col("__p.gh").alias("__gh"))
    )
    dup = (
        grams.groupBy("__gh")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") >= min_occurrences)
        .select("__gh")
    )
    starts = (
        grams.join(dup, "__gh")
        .groupBy("__id")
        .agg(F.collect_list("__pos").alias("__starts"))
    )
    joined = toks.join(starts, "__id", "left")
    t, s = F.col("__t"), F.coalesce(F.col("__starts"), F.expr("array()"))
    covered = F.array_distinct(
        F.flatten(
            F.transform(s, lambda i: F.sequence(i, F.least(i + (k - 1), F.size(t))))
        )
    )
    all_pos = F.when(F.size(t) > 0, F.sequence(F.lit(1), F.size(t))).otherwise(
        F.expr("CAST(array() AS array<int>)")
    )
    kept = F.array_except(all_pos, covered)
    return joined.select(
        F.col("__id").alias(id_col),
        F.concat_ws(
            " ", F.transform(kept, lambda p: F.element_at(t, p))
        ).alias("clean_text"),
        F.size(t).cast("int").alias("n_tokens"),
        (F.size(t) - F.size(kept)).cast("int").alias("n_removed"),
    )


def dedup_cluster_sizes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 5,
    threshold: float = 0.5,
    max_iter: int = 20,
    impl: str = "md5",
) -> DataFrame:
    """Near-dup cluster-size histogram — the BEFORE-the-run audit of a
    dedup pass: how much of the corpus sits in clusters of 2, of 10, of
    10,000 (one viral boilerplate page)? The size distribution decides
    whether plain survivor-keeping suffices or the corpus needs
    keep-best / downweighting, and a heavy tail is the first sign the
    threshold is catching template families rather than true duplicates.

    Composition of the gate-verified pieces: banded LSH candidates ->
    exact Jaccard verify -> connected components (min-label propagation
    over the pair graph only) -> every document joins its component
    (singletons are their own cluster of 1) -> two bounded aggregates.
    Shuffle keys are 8-byte ids throughout; the histogram output is
    bounded by the distinct cluster sizes, not the corpus.
    Returns ``(cluster_size, n_clusters)``.
    """
    cands = minhash_lsh_candidates(
        df, id_col, text_col, num_hashes, bands, shingle_size, impl=impl
    )
    verified = jaccard_verify(cands, df, id_col, text_col, shingle_size, threshold)
    comp = connected_components(verified, max_iter=max_iter)
    allc = (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    sizes = allc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )


def dedup_savings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 5,
    threshold: float = 0.5,
    max_iter: int = 20,
    impl: str = "md5",
) -> DataFrame:
    """Token-weighted dedup impact report — what a transitive MinHash
    dedup pass would actually SAVE, before committing to it: per
    cluster-size bucket, how many documents and how many tokens the
    min-id-survivor rule removes. :func:`dedup_cluster_sizes` answers
    "how does the duplicate mass distribute"; this answers the capacity
    question every dedup proposal gets asked first — "how many tokens
    does the run buy us?" (dedup ablations in Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" report
    exactly this table).

    Same composed chain as the gate-verified pieces (banded LSH ->
    Jaccard verify -> min-label components -> singletons join as their
    own cluster), plus each doc's whitespace token count carried through
    the component join and ``min_by(tokens, id)`` marking the survivor —
    8-byte shuffle keys throughout, output bounded by distinct cluster
    sizes. Returns ``(cluster_size, n_clusters, docs, docs_removed,
    tokens, tokens_removed)`` — all integers, ordered by size.
    """
    from nbdatatools_spark.functions.text import token_count

    cands = minhash_lsh_candidates(
        df, id_col, text_col, num_hashes, bands, shingle_size, impl=impl
    )
    verified = jaccard_verify(cands, df, id_col, text_col, shingle_size, threshold)
    comp = connected_components(verified, max_iter=max_iter)
    allc = (
        df.select(
            F.col(id_col).alias("id"),
            token_count(F.col(text_col)).cast("long").alias("__nt"),
        )
        .join(comp, "id", "left")
        .select(
            "id", "__nt", F.coalesce("component", F.col("id")).alias("component")
        )
    )
    per_comp = allc.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.sum("__nt").cast("long").alias("__tok"),
        F.expr("min_by(__nt, id)").cast("long").alias("__kept"),
    )
    return (
        per_comp.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("cluster_size").cast("long").alias("docs"),
            F.sum(F.col("cluster_size") - 1).cast("long").alias("docs_removed"),
            F.sum("__tok").cast("long").alias("tokens"),
            F.sum(F.col("__tok") - F.col("__kept")).cast("long").alias(
                "tokens_removed"
            ),
        )
        .select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            "n_clusters",
            "docs",
            "docs_removed",
            "tokens",
            "tokens_removed",
        )
        .orderBy("cluster_size")
    )


def winnow_verify(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int = 200,
    min_overlap: float = 0.5,
    portable: bool = True,
) -> DataFrame:
    """Winnowing detect -> verify, the MOSS two-stage mirror of the
    minhash_lsh_candidates -> jaccard_verify discipline: candidate pairs
    from the fingerprint equi-join (winnow_candidate_pairs) are scored by
    the fingerprint-set overlap coefficient |A∩B| / min(|A|,|B|)
    (functions.text.winnow_overlap) and kept at >= ``min_overlap`` — the
    containment-style score that catches a short document embedded
    inside a long one, which Jaccard dilutes.

    Scale shape: candidates are bucketed (never doc x doc); the verify
    join carries each candidate pair's two fingerprint ARRAYS (bounded by
    doc length), keyed by id — per-task state is one pair. Returns
    ``(id_a, id_b, n_shared, overlap)``.
    """
    from nbdatatools_spark.functions.text import winnow_fingerprints, winnow_overlap

    cands = winnow_candidate_pairs(
        df, id_col=id_col, text_col=text_col, k=k, w=w,
        min_shared=min_shared, max_bucket=max_bucket, portable=portable,
    )
    fps = winnow_fingerprints(
        df.select(id_col, text_col), text_col=text_col, k=k, w=w, portable=portable
    ).select(F.col(id_col).alias("__fid"), F.col("fingerprints").alias("__fp"))
    fa = fps.select(F.col("__fid").alias("id_a"), F.col("__fp").alias("__fpa"))
    fb = fps.select(F.col("__fid").alias("id_b"), F.col("__fp").alias("__fpb"))
    scored = (
        cands.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(winnow_overlap(F.col("__fpa"), F.col("__fpb")), 6).alias(
                "overlap"
            ),
        )
    )
    return scored.where(F.col("overlap") >= float(min_overlap))


def minhash_calibration(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 5,
    impl: str = "md5",
    max_pairs: int | None = None,
) -> DataFrame:
    """MinHash estimator calibration on the LSH candidate pairs: for each
    banded candidate, the estimated Jaccard (fraction of agreeing
    signature slots — the unbiased MinHash estimator) next to the exact
    distinct-shingle Jaccard, plus the absolute estimation error. The
    verification-ethos companion of jaccard_verify: it quantifies how
    tight ``num_hashes`` is for THIS corpus instead of assuming the
    1/sqrt(k) theory bound.

    Exactness: slot agreement and set sizes are integers; both ratios
    and the error are single double divisions rounded to 6dp; with
    ``impl="md5"`` the whole chain (signatures, banding, estimator) is
    DuckDB-replicable bit-for-bit.

    100-TB shape: candidates come from the banded equi-join (bucketed,
    never all-pairs); signature and shingle-set joins touch CANDIDATE
    ROWS only; signatures are num_hashes longs, shingle sets ride the
    same array-intersect bill as jaccard_verify.

    Returns ``(id_a, id_b, est_jaccard, exact_jaccard, abs_err)``.
    """
    # ONE corpus-wide signature pass shared between candidate generation
    # and the estimator join below (optimization round 10): before, the
    # banding chain and the estimator each ran their own full
    # minhash_signatures pass over the corpus — the single most
    # expensive stage in this operator, paid twice. localCheckpoint so
    # both consumers read the same materialization.
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_size, impl=impl
    ).localCheckpoint(eager=False)
    cands = minhash_lsh_candidates(
        df, id_col, text_col, num_hashes, bands, shingle_size, impl=impl,
        signatures=sigs,
    )
    if max_pairs is not None:
        # Calibration is a statistical readout — at corpus scale you sample
        # the candidates instead of exact-verifying millions of pairs. The
        # sample is a DETERMINISTIC md5 ranking over the pair key, so it is
        # content-stable across runs/partitionings and oracle-replicable.
        rank = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("id_a").cast("string"),
                        F.lit(":"),
                        F.col("id_b").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        cands = (
            cands.orderBy(rank.asc(), F.col("id_a").asc(), F.col("id_b").asc())
            .limit(int(max_pairs))
        )
    est = (
        cands.join(
            sigs.select(F.col("id").alias("id_a"), F.col("signature").alias("__sa")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), F.col("signature").alias("__sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "__sa", "__sb", lambda a, b: (a == b).cast("int")
                    ),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).cast("double")
                / F.lit(float(num_hashes)),
                6,
            ).alias("est_jaccard"),
        )
    )
    exact = jaccard_verify(
        est.select("id_a", "id_b"), df, id_col, text_col, shingle_size, threshold=0.0
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("exact_jaccard"))
    return (
        est.join(exact, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            "exact_jaccard",
            F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 6).alias(
                "abs_err"
            ),
        )
        .orderBy("id_a", "id_b")
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document n-gram novelty curve: for each document (in id
    order), the fraction of its DISTINCT word n-grams that no
    earlier-id document contains — the marginal-novelty signal dedup
    and data-valuation pipelines rank ingestion order by (a seen_frac
    near 1 means the doc is retreading the corpus).

    Scale shape: one distinct over (doc, gram-digest) — grams project to
    xxhash64 map-side, the dedup-family rule; first-owner is ONE min
    aggregate per digest; the per-doc fraction is one digest-keyed join
    + one doc-keyed aggregate. No windows over raw text, no all-pairs.

    Returns (doc_id, n_grams, n_novel, novel_frac) for docs with at
    least one n-gram.
    """
    from nbdatatools_spark.functions.text import word_shingles

    from nbdatatools_spark.session import spread_small_input

    grams = (
        spread_small_input(df).select(
            F.col(id_col).alias("__id"),
            F.explode_outer(word_shingles(F.col(text_col), n)).alias("__g"),
        )
        .where(F.length("__g") > 0)
        .select("__id", F.xxhash64("__g").alias("__gh"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    first_owner = grams.groupBy("__gh").agg(F.min("__id").alias("__first"))
    return (
        grams.join(first_owner, "__gh")
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("__first") == F.col("__id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .withColumn(
            "novel_frac",
            F.round(F.col("n_novel") / F.col("n_grams").cast("double"), 6),
        )
        .orderBy(id_col)
    )


# --- Bloom-filter decontamination prefilter --------------------------------

def _bloom_hash_cols(gram: "Column", m_bits: int, k: int):
    """The k portable Bloom bit positions of a gram string: Kirsch-
    Mitzenmacher double hashing ``(h1 + i*(2*h2+1)) % m`` over two 52-bit
    md5 prefixes (the repo's md5-uint52 convention, replicable in DuckDB;
    forcing the stride odd keeps it nonzero for every gram)."""
    h1 = F.conv(F.substring(F.md5(gram), 1, 13), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(gram), 14, 13), 16, 10).cast("long")
    return [(h1 + F.lit(i) * (F.lit(2) * h2 + F.lit(1))) % F.lit(m_bits) for i in range(k)]


def bloom_decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Bloom-prefiltered test-set decontamination: the 13-gram rule of
    :func:`contaminated_ids`, but the train side is screened map-side
    against a compact Bloom filter of the test-set grams BEFORE any join
    — the 100-TB pattern for membership tests against a reference set
    (cf. Bloom 1970; Broder & Mitzenmacher's double-hashing scheme via
    Kirsch-Mitzenmacher 2006: k positions from two hashes).

    Plan shape, and why it scales:

    - Test side: distinct grams -> k bit positions each (md5-uint52 double
      hashing) -> DISTINCT positions. Bounded by ``m_bits`` rows by
      construction; collected once (<= m_bits ints, ~2 MB at the 2^20
      default) and broadcast to executors as a packed numpy bitmap.
    - Train side: per-doc DISTINCT gram array stays inside one row
      (``array_distinct`` over the shingle expression — map-side); one
      Arrow-batched pandas UDF probes every gram against the broadcast
      bitmap. ZERO train-side shuffle up to the per-doc verdict — the
      expensive exact join runs only for the bloom-flagged subset.
    - Exact confirm: flagged docs explode grams, project to 8-byte
      ``xxhash64`` digests (raw gram strings never shuffle — the
      contaminated_ids discipline) and join the broadcast test-digest
      set; Bloom's no-false-negative guarantee makes the unflagged
      majority exactly clean, so skipping them is lossless.

    False-positive rate per gram ~= (1 - e^{-k*N/m})^k for N test grams.
    Returns one row per train doc: (id, n_grams, n_bloom_hits,
    bloom_flagged, n_exact_hits, contaminated, false_positive).
    """
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from nbdatatools_spark.functions.text import word_shingles

    test_grams = (
        test.select(F.explode_outer(word_shingles(F.col(text_col), n)).alias("__gram"))
        .where(F.length("__gram") > 0)
        .distinct()
    )
    positions = (
        test_grams.select(
            F.explode(F.array(*_bloom_hash_cols(F.col("__gram"), m_bits, k))).alias(
                "__pos"
            )
        )
        .distinct()
        .collect()
    )  # bounded by m_bits rows by construction
    bitmap = np.zeros(m_bits, dtype=bool)
    if positions:
        bitmap[np.array([r["__pos"] for r in positions], dtype=np.int64)] = True
    spark = train.sparkSession
    bc = spark.sparkContext.broadcast(np.packbits(bitmap))

    mb, kk = m_bits, k

    def _hits_batch(grams):
        bits = np.unpackbits(bc.value).astype(bool)
        out = np.empty(len(grams), dtype=np.int32)
        for i, gs in enumerate(grams):
            c = 0
            for g in gs if gs is not None else ():
                hx = hashlib.md5(g.encode("utf-8")).hexdigest()
                h1 = int(hx[:13], 16)
                stride = 2 * int(hx[13:26], 16) + 1
                if all(bits[(h1 + j * stride) % mb] for j in range(kk)):
                    c += 1
            out[i] = c
        return pd.Series(out)

    # no type hints: `from __future__ import annotations` stringifies them
    # and pandas_udf can't resolve pd.Series from this nested scope
    bloom_hits = pandas_udf(_hits_batch, "int")

    from nbdatatools_spark.session import spread_small_input

    # per-gram python md5 probes: the heaviest per-row kernel here —
    # spread an under-split train scan first (round 10; no-op at scale)
    per_doc = (
        spread_small_input(train).select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                F.filter(word_shingles(F.col(text_col), n), lambda g: F.length(g) > 0)
            ).alias("__grams"),
        )
        .select(
            "id",
            F.size("__grams").alias("n_grams"),
            bloom_hits(F.col("__grams")).alias("n_bloom_hits"),
            F.col("__grams"),
        )
        .withColumn("bloom_flagged", F.col("n_bloom_hits") > 0)
        .localCheckpoint(eager=False)
    )

    test_digests = test_grams.select(F.xxhash64("__gram").alias("__gh")).distinct()
    exact = (
        per_doc.where("bloom_flagged")
        .select("id", F.explode("__grams").alias("__gram"))
        .select("id", F.xxhash64("__gram").alias("__gh"))
        .join(F.broadcast(test_digests), "__gh")
        .groupBy("id")
        .agg(F.count("*").alias("__n_exact"))
    )
    return (
        per_doc.drop("__grams")
        .join(exact, "id", "left")
        .select(
            "id",
            "n_grams",
            "n_bloom_hits",
            "bloom_flagged",
            F.coalesce(F.col("__n_exact"), F.lit(0)).cast("int").alias("n_exact_hits"),
            (F.coalesce(F.col("__n_exact"), F.lit(0)) > 0).alias("contaminated"),
            (
                F.col("bloom_flagged")
                & (F.coalesce(F.col("__n_exact"), F.lit(0)) == 0)
            ).alias("false_positive"),
        )
    )


def boilerplate_prefixes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_tokens: int = 5,
    min_docs: int = 3,
    top_n: int = 50,
) -> DataFrame:
    """Boilerplate line-prefix mining: the most widespread first-k-token
    line openings across documents (cookie banners, nav bars, license
    headers all repeat their opening tokens long before the full line
    matches — this surfaces the templates paragraph_dedup then removes).

    Plan: lines explode map-side, each line projects to its normalized
    first-``k_tokens`` prefix; ONE groupBy(prefix) computes distinct-doc
    and occurrence counts (prefixes are short bounded strings — the one
    deliberate exception to the digest rule, since the output IS the
    prefix text and a TakeOrderedAndProject caps the result at
    ``top_n``). Distinct-doc counting dedups (id, prefix) first so a
    100x-repeated banner in one doc counts once.

    Returns (prefix, n_docs, n_lines) — top_n by (n_docs DESC, prefix).
    """
    from nbdatatools_spark.functions.text import lines_of, normalize_text

    lines = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(lines_of(F.col(text_col))).alias("line"),
    ).where(F.col("line").isNotNull())
    prefix = F.concat_ws(
        " ", F.slice(F.split(normalize_text(F.col("line")), " "), 1, k_tokens)
    )
    pl = lines.select("id", prefix.alias("prefix")).where(F.length("prefix") > 0)
    per_doc = pl.groupBy("id", "prefix").agg(F.count(F.lit(1)).alias("__n"))
    return (
        per_doc.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__n").cast("bigint").alias("n_lines"),
        )
        .where(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), "prefix")
        .limit(top_n)
    )


def cross_corpus_near_dups(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 5,
    threshold: float = 0.5,
    impl: str = "numpy",
) -> DataFrame:
    """Near-duplicate pairs BETWEEN two corpora (crawl delta vs standing
    corpus — the MinHash sibling of :func:`incremental_dedup`'s exact
    path): banded-LSH candidates restricted to cross-corpus pairs, then
    exact Jaccard verification at ``threshold``.

    Reuses the full LSH machinery on the tagged union (one pipeline, one
    banding pass); the cross-corpus restriction is a post-banding filter
    on the tag pair, so within-corpus duplicates never reach the verify
    join. Returns (id_a, id_b, jaccard) with id_a from ``a``, id_b from
    ``b``, ordered.

    Caller contract: ids must be unique ACROSS the two frames (same rule
    as incremental_dedup; shift one side's ids upstream if they collide).
    """
    ta = a.select(
        F.col(id_col).alias("__xid"), F.col(text_col).alias("__xtext"),
        F.lit(0).alias("__side"),
    )
    tb = b.select(
        F.col(id_col).alias("__xid"), F.col(text_col).alias("__xtext"),
        F.lit(1).alias("__side"),
    )
    u = ta.unionByName(tb)
    # cross-side restriction pushed INTO the bucket join (side_col): the
    # within-corpus pairs never materialize, and the returned side tags
    # orient the pair without re-joining the corpus tag (measured 2x fewer
    # candidate rows and two joins saved on the sf0.1 gate)
    cand = minhash_lsh_candidates(
        u, id_col="__xid", text_col="__xtext", num_hashes=num_hashes,
        bands=bands, shingle_size=shingle_size, impl=impl,
        side_col="__side",
    )
    cross = cand.select(
        # orient: id_a always the corpus-a doc
        F.when(F.col("side_a") == 0, F.col("id_a")).otherwise(F.col("id_b")).alias("id_a"),
        F.when(F.col("side_a") == 0, F.col("id_b")).otherwise(F.col("id_a")).alias("id_b"),
    ).distinct()
    verified = jaccard_verify(
        cross, u, id_col="__xid", text_col="__xtext",
        shingle_size=shingle_size, threshold=threshold,
    )
    return verified.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def source_dup_rate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-slice exact-duplicate pressure: for each source, how many of
    its documents have a normalized text that appears more than once
    ANYWHERE in the corpus — the triage readout that says which crawls /
    feeds are pumping in copies before a full dedup pass is scheduled.

    One md5-digest groupBy over the corpus (16-byte keys, never text),
    one join back, one per-source aggregate. Returns ``(group, n_docs,
    n_dup_docs, n_distinct_texts, dup_rate)`` ordered by group;
    dup_rate = dup docs / docs at 6dp.
    """
    from nbdatatools_spark.functions.text import normalize_text

    # base is read by both the digest counts and the join-back; the
    # normalize+md5 recompute is cheap codegen, measured FASTER than a
    # localCheckpoint of the digest rows (3.5s vs 4.2s at the 10x
    # replica), so no materialization here
    base = df.select(
        F.col(group_col).alias("g"),
        F.md5(normalize_text(F.col(text_col))).alias("__h"),
    )
    counts = base.groupBy("__h").agg(F.count(F.lit(1)).alias("__c"))
    return (
        base.join(counts, "__h")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("__c") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_docs"),
            F.countDistinct("__h").alias("n_distinct_texts"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            "n_dup_docs",
            "n_distinct_texts",
            F.round(F.col("n_dup_docs") / F.col("n_docs"), 6).alias(
                "dup_rate"
            ),
        )
        .orderBy(group_col)
    )


def cosine_threshold_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_posting: int | None = None,
) -> DataFrame:
    """EXACT all-pairs cosine-threshold similarity join over unit-
    normalized token-frequency vectors via prefix filtering (Bayardo,
    Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007) —
    the non-probabilistic sibling of MinHash-LSH: every pair with
    cosine >= threshold is returned, no recall loss, no banding tune.

    Prefix-filter guarantee: order every doc's tokens by the global
    (df ASC, digest ASC) total order (rarest first). With
    ``suffix2(t) = sum of w^2 from t onward``, the FIRST shared token t*
    of any pair with cos >= tau satisfies (Cauchy-Schwarz over the
    suffix) ``sqrt(suffix2(t*)) >= cos >= tau`` in BOTH docs — so
    indexing only tokens with ``suffix2 >= tau^2`` (a contiguous rarest-
    first head, typically a small fraction of each doc) finds every
    qualifying pair. Candidates then verify with the exact dot product.

    Scale shape (the LSH discipline, but exact): tokens shuffle as
    16-byte md5 digests only; candidate generation is ONE equi-join on
    PREFIX postings (rare tokens -> tiny buckets; the frequent-token
    quadratic blowup is exactly what the prefix cut removes); verify is
    candidate-keyed, never all-pairs. Per-doc prefix selection is a
    keyed window (parallel across docs).

    Exactness contract: ||tf|| = sqrt(INTEGER sum of tf^2); per-token
    weights w = tf/||tf|| double; w^2 and cross products round to 9dp
    and DECIMAL-sum (order-invariant); the prefix test keeps
    ``suffix2 >= tau^2 - 1e-6`` (slack absorbs the 9dp rounding so the
    guarantee stays sound); final filter on the DECIMAL-summed cosine.
    Engine-replayable bit-for-bit.

    ``max_posting`` (default None = EXACT): when set, prefix postings
    whose bucket exceeds the cap are dropped from CANDIDATE GENERATION —
    the LSH ``max_bucket`` escape hatch for degenerate tiny-vocabulary
    corpora where NO token is rare (a 41-token vocabulary over 50k docs
    puts every posting in the thousands and the exact candidate set in
    the billions; measured on the 10x scaling replica). This LOSES the
    exactness guarantee for pairs whose every shared prefix token is
    capped — on Zipfian real-text vocabularies the cap never binds
    because prefixes are rarest-first by construction. Leave None for
    the recall guarantee; set ~(expected dup-cluster size * 10) when a
    corpus audit (vocab_topk) shows a degenerate vocabulary.

    Returns ``(id_a, id_b, cosine)`` with id_a < id_b, cosine >=
    threshold rounded to 6dp.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0,1], got {threshold}")
    tau2 = threshold * threshold - 1e-6
    tf = (
        docs.select(
            F.col(id_col).alias("__id"),
            # explode_outer + explicit drop (the InferFiltersFromGenerate
            # scan-filter hazard -- see winnow_candidate_pairs)
            F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("__t"),
        )
        .where(F.col("__t").isNotNull() & (F.col("__t") != ""))
        .groupBy("__id", F.md5("__t").alias("__h"))
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    norms = tf.groupBy("__id").agg(
        F.sqrt(F.sum(F.col("__tf") * F.col("__tf")).cast("double")).alias("__nrm")
    )
    post = (
        tf.join(norms, "__id")
        .select(
            "__id", "__h", (F.col("__tf").cast("double") / F.col("__nrm")).alias("__w")
        )
        .localCheckpoint(eager=False)
    )
    dfreq = post.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    keyed = post.join(dfreq, "__h")
    w_order = Window.partitionBy("__id").orderBy(F.asc("__df"), F.asc("__h"))
    suffix2 = (
        F.sum(F.round(F.col("__w") * F.col("__w"), 9).cast("decimal(20,9)"))
        .over(w_order.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .cast("double")
    )
    prefix = (
        keyed.withColumn("__sfx", suffix2)
        .where(F.col("__sfx") >= F.lit(tau2))
        .select("__id", "__h")
    )
    if max_posting is not None:
        sizes = prefix.groupBy("__h").agg(F.count(F.lit(1)).alias("__pn"))
        prefix = prefix.join(
            sizes.where(F.col("__pn") <= max_posting).drop("__pn"),
            "__h",
            "left_semi",
        )
    cand = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), "__h")
        .where(F.col("pa.__id") < F.col("pb.__id"))
        .select(F.col("pa.__id").alias("__a"), F.col("pb.__id").alias("__b"))
        .distinct()
    )
    pa = post.select(
        F.col("__id").alias("__a"), "__h", F.col("__w").alias("__wa")
    )
    pb = post.select(
        F.col("__id").alias("__b"), "__h", F.col("__w").alias("__wb")
    )
    verified = (
        cand.join(pa, "__a")
        .join(pb, ["__b", "__h"])
        .groupBy("__a", "__b")
        .agg(
            F.sum(
                F.round(F.col("__wa") * F.col("__wb"), 9).cast("decimal(20,9)")
            )
            .cast("decimal(38,9)")
            .cast("double")
            .alias("__cos")
        )
        .where(F.col("__cos") >= F.lit(float(threshold)))
    )
    return verified.select(
        F.col("__a").alias("id_a"),
        F.col("__b").alias("id_b"),
        F.round("__cos", 6).alias("cosine"),
    )


def semantic_decontaminate(
    train: DataFrame,
    test: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "broadcast",
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-space test-set decontamination (the semantic sibling of
    the 13-gram ``contaminated_ids`` rule): flag every TRAIN vector whose
    cosine similarity to ANY test vector reaches ``threshold`` —
    paraphrased or re-tokenized eval leakage that exact n-gram matching
    cannot see.

    ``method="broadcast"`` (default): the test side is broadcast and the
    join predicate IS the cosine threshold — one scan over train, work
    linear in |train| x |test|. The right shape when the test bench is
    eval-set sized (the Bloom-decontamination convention: the small side
    rides with every executor). ``method="lsh"``: random-hyperplane
    blocking via ``embedding_near_dups`` on the tagged union for
    test sets too large to broadcast; candidates then verify exactly.

    Returns ``(train_id, test_id, cosine_sim)`` for every flagged pair
    at 6dp (a train row can match several test rows), ordered. Exact
    cosines ride the round(9)-DECIMAL fold (the isotropy/knn kernel
    convention) so a SQL oracle replays them bit-for-bit.
    """
    tr = train.select(
        F.col(id_col).alias("train_id"),
        F.col(vec_col).cast("array<double>").alias("__vt"),
    )
    te = test.select(
        F.col(id_col).alias("test_id"),
        F.col(vec_col).cast("array<double>").alias("__ve"),
    )

    def _fold(col):
        return F.aggregate(
            col,
            F.lit(0.0).cast("decimal(25,9)"),
            lambda acc, t: (acc + t.cast("decimal(25,9)")).cast("decimal(25,9)"),
        ).cast("double")

    dot = _fold(F.zip_with("__vt", "__ve", lambda x, y: F.round(x * y, 9)))
    nt = F.sqrt(_fold(F.transform("__vt", lambda x: F.round(x * x, 9))))
    ne = F.sqrt(_fold(F.transform("__ve", lambda x: F.round(x * x, 9))))
    cos = F.round(dot / (nt * ne), 9)
    if method == "broadcast":
        from nbdatatools_spark.session import spread_small_input

        pairs = spread_small_input(tr).join(
            F.broadcast(te), cos >= float(threshold)
        )
    elif method == "lsh":
        shifted = te.select(
            F.concat(F.lit("t:"), F.col("test_id").cast("string")).alias(
                id_col
            ),
            F.col("__ve").alias(vec_col),
        )
        tagged = tr.select(
            F.col("train_id").cast("string").alias(id_col),
            F.col("__vt").alias(vec_col),
        ).unionByName(shifted)
        dim = len(
            te.select("__ve").limit(1).collect()[0][0]
        )  # bounded driver scalar: one test row fixes the dimension
        cand = embedding_near_dups(
            tagged, id_col=id_col, vec_col=vec_col,
            threshold=threshold, method="lsh", dim=dim,
            n_bits=n_bits, n_tables=n_tables, seed=seed,
        )
        cross = cand.where(
            F.col("id_a").startswith("t:") != F.col("id_b").startswith("t:")
        ).select(
            F.when(
                F.col("id_b").startswith("t:"), F.col("id_a")
            ).otherwise(F.col("id_b")).alias("__tid"),
            F.when(
                F.col("id_b").startswith("t:"), F.col("id_b")
            ).otherwise(F.col("id_a")).alias("__eid"),
            F.col("cosine_sim"),
        )
        return cross.select(
            F.col("__tid").alias("train_id"),
            F.expr("substring(__eid, 3)").alias("test_id"),
            F.round("cosine_sim", 6).alias("cosine_sim"),
        ).orderBy("train_id", "test_id")
    else:
        raise ValueError(f"unknown method {method!r}")
    return pairs.select(
        "train_id",
        "test_id",
        F.round(cos, 6).alias("cosine_sim"),
    ).orderBy("train_id", "test_id")
