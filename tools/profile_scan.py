"""Scan-throughput truth-teller: time the XML lineitem scan in isolation.

Measures, at $SPARK_GRAFT_SF_DIR (default sf0.1), min-of-N wall time of:
  a) full-scan count()            -- parse-everything floor
  b) scan+project+filter          -- the bench xml_scan shape
and prints rows/s for each, plus tier-adoption counters when the reader
instrumentation is enabled (SPARK_XML_TIER_STATS_DIR).

This IS the round's scan-yardstick protocol (VERDICT r12 task 4):
min-of-5 under a loadavg guard (wait for the 1-minute loadavg to drop
under $SPARK_GRAFT_LOADAVG_MAX, default 8, up to 180 s; the readings
are recorded either way, with the loadavg), provenance-stamped into
SCAN_YARDSTICK.json at the repo root. bench.py embeds that file in its
payload, and BASELINE.md's scan-throughput line must cite it — one
number per round, doc == artifact.

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

    # loadavg guard: a busy host halves the reading (documented 2x VM
    # band); wait for quiet, but never block forever — record the
    # loadavg either way so the provenance shows reading conditions
    load_cap = float(os.environ.get("SPARK_GRAFT_LOADAVG_MAX", "8"))
    deadline = time.time() + 180
    while True:
        try:
            load1 = os.getloadavg()[0]
        except OSError:
            load1 = None
            break
        if load1 <= load_cap or time.time() > deadline:
            break
        time.sleep(5)

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
    full_s = timed("full count()", lambda: li.count())
    # the PRUNED yardstick reads with a pruned schema (the BASELINE.md
    # "pruned rows/s" number) — column pruning must happen at the scan
    li_pruned = em._xml_table(
        spark, sf_dir, "lineitem", partitions=int(cpus),
        columns=["l_orderkey", "l_quantity", "l_extendedprice"],
    )
    li_pruned.count()  # warm
    pruned_s = timed("pruned count()", lambda: li_pruned.count())
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
    try:
        load_end = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_end = None
    yardstick = {
        "protocol": "profile_scan min-of-%d, loadavg guard <= %.1f"
        % (iters, load_cap),
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "lineitem_rows": n,
        "full_s": round(full_s, 4),
        "full_rows_per_s": int(n / full_s),
        "pruned_s": round(pruned_s, 4),
        "pruned_rows_per_s": int(n / pruned_s),
        "loadavg_at_guard": round(load1, 2) if load1 is not None else None,
        "loadavg_end": load_end,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCAN_YARDSTICK.json"), "w") as fh:
        json.dump(yardstick, fh, indent=1)
        fh.write("\n")
    print("yardstick:", json.dumps(yardstick))

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
