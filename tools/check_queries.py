#!/usr/bin/env python
"""Oracle-check specific queries at one or more SFs.

Usage: python tools/check_queries.py <q1> [<q2> ...] [--sfs sf0.001,sf0.01,sf0.1]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    args = sys.argv[1:]
    sfs = ["sf0.001", "sf0.01", "sf0.1"]
    if "--sfs" in args:
        i = args.index("--sfs")
        sfs = args[i + 1].split(",")
        del args[i : i + 2]
    names = args

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from tests.oracle import compare, duck_con

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duck_con(sf_dir)
        for name in names:
            fn = queries[name]
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                print(f"{sf} {name}: rows-only n={sdf.count()}")
                continue
            odf = con.execute(oracles[name]).fetchdf()
            errs = compare(sdf, odf, name)
            if errs:
                bad += 1
                print(f"{sf} {name}: FAIL")
                for e in errs[:5]:
                    print("   ", e)
            else:
                print(f"{sf} {name}: OK")
        con.close()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
