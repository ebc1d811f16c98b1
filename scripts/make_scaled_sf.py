"""Build a scaled-up copy of a driver testdata dir for SCALING measurement
(VERDICT r3 next-round #7: turn the sf0.1 'would scale' arguments into a
measured sf1 data point).

Replicates every fact table FACTOR times with per-replica key shifts so
joins stay consistent within a replica and never match across replicas.
Content columns are decorrelated across replicas so data-dependent
operators keep realistic behavior instead of degenerating:

- documents.text gets a per-replica salt token prepended (otherwise every
  doc gains FACTOR exact copies and MinHash/exact-dedup pair counts grow
  quadratically, not linearly — measuring the blowup, not the scaling);
- embeddings.embedding gets a tiny deterministic per-replica rotation of
  its first component (otherwise KNN/semantic-dedup see FACTOR-way
  duplicate cliques);
- events.ts shifts by one hour per replica so windowed aggregations grow
  in both key cardinality and row count, as a real stream would.

Dimension tables (region, nation) are left as-is — their foreign keys stay
valid for every replica, exactly like TPC-H's fixed dims.

Usage: python scripts/make_scaled_sf.py SRC_DIR DST_DIR FACTOR
e.g.   python scripts/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nbdatatools_spark.session import get_spark

KEY_SHIFT = 1_000_000_000  # clears every key range in the generated data

# per-table: columns shifted by replica * KEY_SHIFT
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def scale_table(spark, src: str, dst: str, name: str, factor: int) -> int:
    df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
    if name in COPY_AS_IS:
        out = df
    else:
        rep = df.crossJoin(
            spark.range(factor).select(F.col("id").alias("__replica"))
        )
        for k in SHIFT_KEYS.get(name, []):
            rep = rep.withColumn(k, F.col(k) + F.col("__replica") * KEY_SHIFT)
        if name == "documents":
            rep = rep.withColumn(
                "text", F.concat(F.lit("r"), F.col("__replica"), F.lit(" "), F.col("text"))
            )
        if name == "embeddings":
            # perturb component 0 by replica * 1e-3: breaks exact duplicate
            # cliques while keeping the geometry realistic
            rep = rep.withColumn(
                "embedding",
                F.concat(
                    F.array(
                        (F.element_at("embedding", 1) + F.col("__replica") * F.lit(1e-3)).cast("float")
                    ),
                    F.slice("embedding", 2, 10_000),
                ),
            )
        if name == "events":
            # timestampadd preserves sub-second precision and NTZ-ness
            rep = rep.withColumn("ts", F.expr("timestampadd(HOUR, __replica, ts)"))
        out = rep.drop("__replica")
    path = os.path.join(dst, f"{name}.parquet")
    # multiple part files per table so scans split across tasks like real
    # multi-file layouts (the sf0.1 fixture is single-row-group)
    n_parts = 1 if name in COPY_AS_IS else max(4, factor)
    out.repartition(n_parts).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark("nbdt-scale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    for name in list(SHIFT_KEYS) + COPY_AS_IS:
        n = scale_table(spark, src, dst, name, factor)
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
