"""Streaming MinHash-LSH near-duplicate candidates (SURVEY §7.8 streaming
extension; the ingestion-time face of dedup.minhash_lsh_candidates).

A 100-TB corpus build ingests continuously — waiting for a nightly batch
dedup means a day of duplicated downstream compute. This operator finds
banded-LSH candidate pairs ON ARRIVAL:

- map side (stateless, stream-safe): per-document MinHash signature via
  the vectorized Arrow kernel (dedup._minhash_numpy_udf — row-local, no
  aggregation), split into band keys EXACTLY like the batch
  minhash_lsh_candidates(impl="numpy") path (xxhash64(joined, band)),
  so stream and batch collide on identical buckets;
- state side: one GroupState per (band, band_hash) bucket holding the
  sorted id list seen so far (bounded by ``max_bucket``); each arriving
  document emits its pairs against the bucket's residents immediately.

Semantics vs batch: for buckets whose lifetime size stays <= max_bucket,
the drained stream emits EXACTLY the batch pair set for that band (pairs
are the same 2-subsets, discovered incrementally). A bucket that crosses
the cap SATURATES: its state flags and stops emitting (and stops
growing) — the stream cannot retract already-emitted pairs, whereas the
batch cap drops the whole over-cap bucket; both treat over-cap buckets
as degenerate (boilerplate/empty-doc cliques) whose pairs are noise.
State is bounded: <= max_bucket ids + a flag per live bucket;
``ttl_minutes`` expires idle buckets for unbounded streams.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "band INT, id_a BIGINT, id_b BIGINT"
STATE_SCHEMA = "ids ARRAY<BIGINT>, saturated BOOLEAN"


def stream_minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 5,
    max_bucket: int = 256,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming banded-LSH candidate pairs: (band, id_a, id_b) with
    id_a < id_b, emitted the micro-batch the SECOND document of a pair
    arrives. Dedup across bands downstream (distinct on (id_a, id_b)) —
    same as the batch operator's final distinct."""
    from nbdatatools_spark.functions.text import normalize_text
    from nbdatatools_spark.operators.dedup import _minhash_numpy_udf

    if num_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    rows_per_band = num_hashes // bands
    sig_udf = _minhash_numpy_udf(num_hashes, shingle_size)
    sig = docs.select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__norm")
    ).select("id", sig_udf("__norm").alias("signature"))

    def band_hash(b):
        joined = F.concat_ws(
            ",",
            F.transform(
                F.slice("signature", b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
        )
        return F.xxhash64(joined, F.lit(b))

    banded = sig.select(
        "id",
        F.posexplode(F.array(*[band_hash(b) for b in range(bands)])).alias(
            "band", "band_hash"
        ),
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        band = int(key[0])
        if state.hasTimedOut:
            state.remove()
            return
        ids, saturated = state.get if state.exists else ([], False)
        ids = list(ids)
        known = set(ids)
        out_a, out_b = [], []
        for pdf in pdfs:
            if pdf.empty:
                continue
            # deterministic within-batch order; duplicates (same doc, same
            # bucket, re-delivered) are no-ops
            for new in sorted(set(int(x) for x in pdf["id"]) - known):
                if saturated or len(ids) >= max_bucket:
                    saturated = True
                    break
                for old in ids:
                    a, b = (old, new) if old < new else (new, old)
                    out_a.append(a)
                    out_b.append(b)
                ids.append(new)
                known.add(new)
        state.update((sorted(ids), saturated))
        if ttl_minutes is not None:
            state.setTimeoutDuration(int(ttl_minutes) * 60 * 1000)
        if out_a:
            yield pd.DataFrame(
                {"band": band, "id_a": out_a, "id_b": out_b}
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return banded.groupBy("band", "band_hash").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
