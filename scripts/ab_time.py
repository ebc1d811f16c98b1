"""A/B timing harness for optimization evidence: time named queries via
the noop sink (guide §1.4), warm session, N repeats, print per-query
walls as JSON.

Usage: python scripts/ab_time.py <repo_root> <out.json> <reps> <query> [...]

Runs against the repo at <repo_root> (so an old git-archive copy and the
working tree can be timed with the identical protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root, out, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    sys.path.insert(0, root)
    os.chdir(root)
    import __spark_entry__ as entrymod
    from nbdatatools_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entrymod.queries())
    qs.update(entrymod.candidate_queries())

    # bench-side impl overrides that differ from the gate (bench.py 1:1)
    from pyspark.sql import functions as F

    def doc_minhash_calibration(spark, sf_dir):
        from nbdatatools_spark.operators.dedup import minhash_calibration

        docs = entrymod._t(spark, sf_dir, "documents")
        return minhash_calibration(
            docs, num_hashes=32, bands=8, shingle_size=5, impl="numpy",
            max_pairs=20_000,
        )

    qs["doc_minhash_calibration"] = doc_minhash_calibration

    def minhash_candidate_pairs(spark, sf_dir):
        from nbdatatools_spark.operators.dedup import minhash_lsh_candidates

        docs = entrymod._t(spark, sf_dir, "documents")
        return minhash_lsh_candidates(docs, num_hashes=32, bands=8, shingle_size=5)

    qs["minhash_candidate_pairs"] = minhash_candidate_pairs

    # warm: JVM codegen + Arrow workers (the bench.py warmup, abridged)
    qs["agg_priority_count"](spark, sf_dir).count()
    warm_udf = F.pandas_udf(lambda s: s, "long")
    spark.range(32).repartition(32).select(warm_udf("id")).count()

    walls: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"ab:{name}:{rep}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.time() - t0, 3))
            print(f"# {name} rep{rep}: {walls[name][-1]}s", file=sys.stderr)
    meds = {
        n: sorted(v)[len(v) // 2] for n, v in walls.items()
    }
    with open(out, "w") as fh:
        json.dump({"medians": meds, "walls": walls}, fh, indent=1)
    print(json.dumps(meds))


if __name__ == "__main__":
    main()
