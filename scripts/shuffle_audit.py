"""Shuffle-volume audit for the operators whose 100-TB story is
"shuffles less" (VERDICT r9 task #5): local WALLS cannot see a shuffle
advantage (one box, no network — the round-9 HLL finding), but BYTES
SHUFFLED can. For each sketch/bounded operator, run it AND its exact
counterpart at the given SF and record shuffle write/read + scan input
bytes per run from the Spark status REST API, materializing through the
noop sink (full-column materialization, no driver collect).

Usage:
  python scripts/shuffle_audit.py [sf_dir] [--json OUT.json] [--md OUT.md]
  python scripts/shuffle_audit.py /root/testdata/sf0.1 --skip-uncapped

--skip-uncapped omits the deliberately-expensive uncapped link-
prediction run (~60-95 s at sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from nbdatatools_spark.session import get_spark


def _stage_totals(ui: str, app: str) -> dict[str, int]:
    out = {"shuffle_write": 0, "shuffle_read": 0, "input": 0}
    for status in ("COMPLETE", "FAILED"):
        url = f"{ui}/api/v1/applications/{app}/stages?status={status}"
        try:
            stages = json.load(urllib.request.urlopen(url))
        except Exception:
            continue
        for s in stages:
            out["shuffle_write"] += s.get("shuffleWriteBytes", 0)
            out["shuffle_read"] += s.get("shuffleReadBytes", 0)
            out["input"] += s.get("inputBytes", 0)
    return out


def _docs(spark, sf_dir):
    return entrymod._t(spark, sf_dir, "documents")


def _tokens(spark, sf_dir):
    from nbdatatools_spark.functions.text import normalize_text, tokens

    return (
        _docs(spark, sf_dir)
        .select(
            F.explode_outer(
                tokens(normalize_text(F.col("text")))
            ).alias("__t")
        )
        .where(F.col("__t").isNotNull() & (F.length("__t") > 0))
    )


def _exact_heavy_hitters(spark, sf_dir):
    # exact counterpart of corpus_cms_heavy_hitters: the full
    # vocabulary-sized count table shuffles; the CMS shuffles 4x1024
    # partial registers per partition
    return (
        _tokens(spark, sf_dir)
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "__t")
        .limit(20)
    )


def _exact_distinct_tokens(spark, sf_dir):
    # exact counterpart of corpus_hll_distinct (p=8, 256 registers)
    return (
        _tokens(spark, sf_dir)
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )


def _exact_quantiles(spark, sf_dir):
    # exact counterpart of events_histogram_quantiles: percentile()
    # buffers every value through the aggregation
    ev = entrymod._t(spark, sf_dir, "events")
    return ev.select(
        F.expr(
            "percentile(value, array(0.25, 0.5, 0.75, 0.9, 0.99))"
        ).alias("q")
    )


def _window_sample(spark, sf_dir):
    # exact counterpart of doc_reservoir_sample's bottom-k
    # TakeOrderedAndProject: a global row_number window drags the
    # whole table through a single-partition sort exchange
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("42"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    w = Window.orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", "lang")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 40)
        .drop("__rn")
    )


def _allpairs_capped(spark, sf_dir):
    from nbdatatools_spark.operators.dedup import cosine_threshold_pairs

    docs = _docs(spark, sf_dir)
    return cosine_threshold_pairs(docs, threshold=0.9, max_posting=400)


def _link_uncapped(spark, sf_dir):
    from nbdatatools_spark.operators.graph import (
        cooccurrence_edges,
        link_prediction,
    )

    ev = entrymod._t(spark, sf_dir, "events").withColumn(
        "h", F.date_trunc("hour", "ts")
    )
    edges = cooccurrence_edges(
        ev, ["event_type", "h"], "user_id", max_bucket=100, min_support=3
    )
    return link_prediction(edges, top_n=50, max_z_degree=None)


# (family, variant, posture, gate-name-or-callable)
AUDITS = [
    ("distinct_ngrams", "exact", "corpus-sized (group, gram) table",
     "doc_distinct_ngrams"),
    ("distinct_ngrams", "hll_sketch", "<= partitions * 2^10 registers",
     "doc_distinct_ngrams_hll"),
    ("heavy_hitters", "exact", "vocabulary-sized count table",
     _exact_heavy_hitters),
    ("heavy_hitters", "cms_sketch", "4x1024 partial registers/partition",
     "corpus_cms_heavy_hitters"),
    ("distinct_tokens", "exact", "vocabulary-sized distinct shuffle",
     _exact_distinct_tokens),
    ("distinct_tokens", "hll_sketch", "256 registers (p=8)",
     "corpus_hll_distinct"),
    ("quantiles", "exact", "every value through percentile() buffers",
     _exact_quantiles),
    ("quantiles", "histogram_sketch", "64 fixed bins",
     "events_histogram_quantiles"),
    ("decontaminate", "exact_13gram", "every train gram shuffles to join",
     "doc_decontaminate"),
    ("decontaminate", "bloom_prefilter", "map-side screen, survivors only",
     "doc_bloom_decontaminate"),
    # honest null result, kept deliberately: Catalyst's
    # LimitPushDownThroughWindow rewrites the naive global-row_number
    # form into the SAME TakeOrderedAndProject as the bottom-k sketch
    # (verified via explain) — the reservoir operator's value at this
    # shape is exact-k determinism, not shuffle savings
    ("uniform_sample", "window_sort", "Catalyst rewrites to bottom-k too",
     _window_sample),
    ("uniform_sample", "bottomk_sketch", "k rows/partition partial top-k",
     "doc_reservoir_sample"),
    ("link_prediction", "uncapped", "sum deg^2 wedges (54M at sf0.1)",
     _link_uncapped),
    ("link_prediction", "z_degree_cap", "cap*2m wedges (384k at sf0.1)",
     "events_link_prediction"),
    # the synthetic corpus has a BOUNDED (~257-type) vocabulary — the
    # documented degenerate case for AllPairs: no token is rare, prefix
    # postings reach ~3.8k docs at sf0.1, and the exact verify is
    # genuinely quadratic ON BOTH ENGINES (Spark ~282 s, DuckDB ~208 s
    # for the same 1776 pairs — an algorithmic cost, not a plan
    # failure). max_posting=400 is the operator's own escape hatch:
    # 0.9 s / 64 pairs (the lost 1712 are frequent-token-only
    # statistical near-collisions this corpus manufactures; Zipfian
    # real text never binds the cap). Both variants audited.
    ("allpairs_cosine", "exact_prefix", "rarest-first postings, no cap",
     "doc_cosine_threshold_pairs"),
    ("allpairs_cosine", "posting_cap", "max_posting=400 (degenerate-vocab lever)",
     _allpairs_capped),
    ("minhash_lsh", "banded", "32 hashes -> 8 band keys per doc",
     "minhash_candidate_pairs"),
]


def main():
    argv = sys.argv[1:]
    json_out = md_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--md" in argv:
        i = argv.index("--md")
        md_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    # --skip-uncapped / --fast: omit the two deliberately-expensive
    # exact variants (uncapped link prediction ~40-95 s; exact AllPairs
    # on the degenerate-vocab corpus ~280 s at sf0.1)
    skip_uncapped = "--skip-uncapped" in argv or "--fast" in argv
    argv = [a for a in argv if a not in ("--skip-uncapped", "--fast")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    spark = get_spark(
        "shuffle-audit", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0][
        "id"
    ]
    gates = entrymod.queries()

    rows = []
    for family, variant, posture, src in AUDITS:
        if skip_uncapped and variant in ("uncapped", "exact_prefix"):
            continue
        fn = gates[src] if isinstance(src, str) else src
        # settle any in-flight accounting, snapshot, run, snapshot
        before = _stage_totals(ui, app)
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        time.sleep(0.5)
        after = _stage_totals(ui, app)
        rec = {
            "family": family,
            "variant": variant,
            "posture": posture,
            "gate": src if isinstance(src, str) else f"inline:{src.__name__}",
            "wall_sec": round(wall, 2),
            "shuffle_write_bytes": after["shuffle_write"] - before["shuffle_write"],
            "shuffle_read_bytes": after["shuffle_read"] - before["shuffle_read"],
            "input_bytes": after["input"] - before["input"],
        }
        rows.append(rec)
        print(
            f"{family}/{variant}: shuffle_write="
            f"{rec['shuffle_write_bytes']:,} B, wall={wall:.1f}s"
        )

    result = {"sf_dir": sf_dir, "audits": rows}
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(result, fh, indent=1)
    if md_out:
        with open(md_out, "w") as fh:
            fh.write(
                "# Shuffle-volume audit (sketch vs exact)\n\n"
                f"SF dir: `{sf_dir}` — bytes from the Spark status API "
                "(stage shuffleWrite/shuffleRead/input deltas per run, "
                "noop-sink materialization). Local walls cannot see a "
                "shuffle advantage (one box, no network); bytes can — "
                "this is the cluster-shaped readout behind each "
                "operator's 100-TB posture claim.\n\n"
                "| family | variant | shuffle write | shuffle read | "
                "scan input | wall (s) | posture |\n"
                "|---|---|---|---|---|---|---|\n"
            )
            for r in rows:
                fh.write(
                    f"| {r['family']} | {r['variant']} | "
                    f"{r['shuffle_write_bytes']:,} | "
                    f"{r['shuffle_read_bytes']:,} | "
                    f"{r['input_bytes']:,} | {r['wall_sec']} | "
                    f"{r['posture']} |\n"
                )
    print(json.dumps({"n_audits": len(rows), "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
