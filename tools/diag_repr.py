"""Diagnose driver hash mismatches: print Arrow-level schemas and exact
values for the Spark result and the DuckDB oracle result, side by side.

Usage: python tools/diag_repr.py [sf_dir] [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    import duckdb

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if not only:
        only = [n for n in qs if n in oracles]  # default: every oracle query
    unknown = [n for n in only if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}; available: {sorted(qs)}")
    for name in only:
        fn = qs[name]
        sdf = fn(spark, sf_dir)
        stbl = sdf.toArrow()
        res = con.execute(oracles[name])
        otbl = res.arrow()
        print(f"===== {name}")
        print("spark  arrow schema:", [(f.name, str(f.type)) for f in stbl.schema])
        print("oracle arrow schema:", [(f.name, str(f.type)) for f in otbl.schema])
        print("spark  pylist:", stbl.to_pylist()[:6])
        print("oracle pylist:", otbl.to_pylist()[:6])
        sp = stbl.to_pandas()
        op = otbl.to_pandas()
        print("spark  pandas dtypes:", dict(sp.dtypes.astype(str)))
        print("oracle pandas dtypes:", dict(op.dtypes.astype(str)))
        # row-level repr diff after sorting columns by name
        scols = sorted(stbl.column_names)
        ocols = sorted(otbl.column_names)
        srows = [tuple(repr(r[c]) for c in scols) for r in stbl.to_pylist()]
        orows = [tuple(repr(r[c]) for c in ocols) for r in otbl.to_pylist()]
        if len(srows) != len(orows):
            print(f"  ROW-COUNT MISMATCH: spark={len(srows)} oracle={len(orows)}")
        from itertools import zip_longest

        for i, (a, b) in enumerate(zip_longest(srows, orows)):
            if a != b:
                print(f"  repr-diff row {i}: spark={a} oracle={b}")
        if srows == orows:
            print("  repr-identical under sorted-col repr()")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
