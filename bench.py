"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total query sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, ...extras}

The XML-ification cost (write + distributed infer) is reported separately
(prep_*): it is paid once per corpus in real use, while the queries run
against the cached XML tables (steady state).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    # ---- prep: XML-ify the big table (write path + distributed inference)
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    n_lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    t0 = time.time()
    try:
        em._xml_table(spark, sf_dir, "lineitem", partitions=int(cpus))
    except Exception as exc:  # noqa: BLE001  (queries rebuild their own caches)
        errors["prep_xmlify"] = repr(exc)[:300]
    prep_s = time.time() - t0  # ~0 when cache-hot; cold = write + infer

    def run(name: str) -> None:
        # three iterations, report the min: the first pays JVM codegen +
        # Python-worker spin-up + AQE planning (session warmup, not
        # per-query cost), and min-of-3 damps single-tenant VM noise.
        # One failing query must NOT abort the suite (a whole round's
        # performance evidence was lost that way once): record the error,
        # keep the remaining timings meaningful.
        fn = em.queries()[name]
        best = None
        n = 0
        try:
            for _ in range(3):
                t = time.time()
                df = fn(spark, sf_dir)
                n = df.count()
                dt = time.time() - t
                best = dt if best is None else min(best, dt)
        except Exception as exc:  # noqa: BLE001
            errors[name] = repr(exc)[:300]
            sys.stderr.write(f"bench {name}: ERROR {errors[name]}\n")
            return
        timings[name] = round(best, 3)
        sys.stderr.write(f"bench {name}: {timings[name]}s ({n} rows)\n")

    bench_queries = [
        "xml_scan_filter",
        "xml_pushdown",
        "xml_agg_q1",
        "xml_join_agg",
        "xml_window_rank",
        "xml_sort_limit",
        "xml_explode_nested",
        "xml_split_scan",
        "from_xml_parse",
        "to_xml_generate",
        "dedup_exact",
        "dedup_jaccard",
        "dedup_minhash",
        "dedup_simhash",
        "dedup_embedding",
        "ann_cosine_topk",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "text_tokens",
        "text_langid",
        "text_fingerprint",
        "multimodal_meta",
        "events_sessionize",
    ]
    for name in bench_queries:
        run(name)

    total = round(sum(timings.values()), 3)
    xml_scan_rows_per_s = (
        round(n_lineitem / timings["xml_scan_filter"]) if timings.get("xml_scan_filter") else None
    )
    print(
        json.dumps(
            {
                "metric": "spark_xml_graft_query_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
                "prep_xmlify_s": round(prep_s, 3),
                "lineitem_rows": n_lineitem,
                "xml_scan_rows_per_s": xml_scan_rows_per_s,
                **({"errors": errors} if errors else {}),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
