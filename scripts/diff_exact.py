"""Exact cell-level diff between Spark queries and DuckDB oracles — NO
rounding tolerance (mirrors the driver's hash gate more faithfully than
check_oracle.py's 9dp rounding). Prints the first differing cells with
full repr so the divergence mechanism is visible.

Usage: python scripts/diff_exact.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from nbdatatools_spark.session import get_spark


def canon(v):
    """Driver-style canonicalization: value as rendered string."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("diff-exact", shuffle_partitions=8)
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        oidx = sorted(range(len(ocols)), key=lambda i: ocols[i])
        snorm = sorted(tuple(canon(r[i]) for i in sidx) for r in srows)
        onorm = sorted(tuple(canon(r[i]) for i in oidx) for r in orows)
        if snorm == onorm:
            print(f"EXACT  {name} ({len(srows)} rows)")
            continue
        bad.append(name)
        print(f"DIFF   {name}")
        ncell = 0
        colnames = sorted(scols)
        for a, b in zip(snorm, onorm):
            if a != b:
                for c, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"    col={colnames[c]!r} spark={x!r} oracle={y!r}")
                        ncell += 1
                        if ncell >= 6:
                            break
            if ncell >= 6:
                break
    print(f"\nDIFFS: {bad}" if bad else "\nall exact")


if __name__ == "__main__":
    main()
