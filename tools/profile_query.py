"""Isolated per-query measurement — the r14 pinned protocol.

The suite bench times queries inside a shared, often contended run
(artifact builds, neighbouring JVMs, lagging loadavg), which made
per-query numbers irreproducible round to round (VERDICT r13 "What's
wrong" #1/#4: stream_simhash's cited 1.87 s vs 4.17 s committed vs
4.37 s judge). This tool is the scan yardstick's protocol applied to a
single driver query:

  - loadavg guard before starting (wait for 1-min loadavg <=
    $SPARK_GRAFT_LOADAVG_MAX, default 8, up to 180 s; recorded either
    way) AND a second sample after the warm-up — the 1-minute loadavg
    LAGS process churn, so the artifact stores both for the reader to
    judge;
  - fresh local[$SPARK_GRAFT_CPUS] session, shuffle partitions 32, UTC;
  - one UNTIMED warm-up run (workers fork + import pandas/pyarrow,
    stream-source caches build);
  - min-of-N (default 4) with the PLAN REBUILT inside every timed run
    (re-collecting a built DataFrame reuses shuffle map outputs and
    under-measures 10-40x);
  - results merged into ISOLATED.json at the repo root, keyed by query
    name, full provenance per entry. BASELINE.md/SURVEY.md isolated
    citations must point at this artifact — doc == artifact.

Usage: python tools/profile_query.py <query> [<query> ...] [--sf=DIR]
       [--iters=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = []
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = 4
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--iters="):
            iters = int(a.split("=", 1)[1])
        else:
            names.append(a)
    if not names:
        sys.exit("usage: profile_query.py <query> [...] [--sf=] [--iters=]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    load_cap = float(os.environ.get("SPARK_GRAFT_LOADAVG_MAX", "8"))
    deadline = time.time() + 180
    while True:
        try:
            load_guard = round(os.getloadavg()[0], 2)
        except OSError:
            load_guard = None
            break
        if load_guard <= load_cap or time.time() > deadline:
            break
        time.sleep(5)

    from pyspark.sql import SparkSession

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

    queries = em.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art_path = os.path.join(repo, "ISOLATED.json")
    art = {}
    if os.path.exists(art_path):
        with open(art_path) as fh:
            art = json.load(fh)

    for name in names:
        q = queries[name]
        t0 = time.time()
        rows = q(spark, sf_dir).count()  # warm-up, untimed
        warm_s = time.time() - t0
        try:
            load_warm = round(os.getloadavg()[0], 2)
        except OSError:
            load_warm = None
        runs = []
        for _ in range(iters):
            t0 = time.time()
            q(spark, sf_dir).count()  # plan rebuilt per run
            runs.append(round(time.time() - t0, 3))
        try:
            load_end = round(os.getloadavg()[0], 2)
        except OSError:
            load_end = None
        entry = {
            "protocol": "profile_query warm + min-of-%d, plan rebuilt "
            "per run, loadavg guard <= %.1f" % (iters, load_cap),
            "sf_dir": sf_dir,
            "cpus": int(cpus),
            "rows": rows,
            "warmup_s": round(warm_s, 3),
            "min_s": min(runs),
            "runs_s": runs,
            "loadavg_at_guard": load_guard,
            "loadavg_after_warmup": load_warm,
            "loadavg_end": load_end,
        }
        art[name] = entry
        print(f"isolated {name}: min {entry['min_s']:.2f}s "
              f"runs {runs} loadavg {load_guard}->{load_end}")

    with open(art_path, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("ISOLATED:", json.dumps({n: art[n]["min_s"] for n in names}))
    spark.stop()


if __name__ == "__main__":
    main()
