"""Scan-throughput truth-teller: time the XML lineitem scan in isolation.

Measures, at $SPARK_GRAFT_SF_DIR (default sf0.1), min-of-N wall time of:
  a) full-scan count()            -- parse-everything floor
  b) scan+project+filter          -- the bench xml_scan shape
and prints rows/s for each, plus tier-adoption counters when the reader
instrumentation is enabled (SPARK_XML_TIER_STATS_DIR).

Usage: python tools/profile_scan.py [sf_dir] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    n = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    li = em._xml_table(spark, sf_dir, "lineitem", partitions=int(cpus))

    stats_dir = os.environ.get("SPARK_XML_TIER_STATS_DIR")

    def timed(label, thunk):
        best = None
        for _ in range(iters):
            t = time.time()
            thunk()
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best:.3f}s  ({n / best:,.0f} rows/s)")
        return best

    timed("warmup(count)", lambda: li.count())
    timed("full count()", lambda: li.count())
    timed(
        "scan+filter",
        lambda: li.filter(F.col("l_quantity") > 25)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .count(),
    )
    timed(
        "agg_q1 shape",
        lambda: li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.count("*"))
        .collect(),
    )

    if stats_dir and os.path.isdir(stats_dir):
        tiers: dict[str, int] = {}
        for fn in os.listdir(stats_dir):
            with open(os.path.join(stats_dir, fn)) as fh:
                for line in fh:
                    rec = json.loads(line)
                    tiers[rec["tier"]] = tiers.get(rec["tier"], 0) + rec["rows"]
        print("tier adoption:", json.dumps(tiers))
    spark.stop()


if __name__ == "__main__":
    main()
