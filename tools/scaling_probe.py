"""Parallel-scaling probe at beyond-sf0.1 fixtures (VERDICT r16 task 3).

The sf0.1 suite cannot demonstrate parallel scaling: 100/117 queries run
as fast on 8 cores as 32 because per-query walls sit on fixed overheads
at that SF (driver verdict, r16). This probe re-asks the question where
it is answerable: the ~10 heaviest batch queries at the x10/x100/x2000
scratch replicas the trend harness already defines, each measured at 32
AND 8 cores in back-to-back settled sessions (min-of-3 after a warm run,
same `.count()` timed action as tools/ratio_trend.py). A per-session
pruned-scan yardstick proves each session's core count is real.

Writes SCALING_X10.json; tools/sync_board.py renders it into BOARD.md.

Usage: python tools/scaling_probe.py            # 32c then 8c
       SPARK_GRAFT_SCALING_CPUS="8,32" ...      # override pair/order
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import ratio_trend as rt  # noqa: E402

# query -> (fixture kind, x-factor note). "scale10" is the shared
# _build_scale10 scratch (documents/lineitem x10, customer x100,
# events x10, embeddings x100); "emb_big" is the persistent x2000
# embeddings fixture from the trend harness.
PROBE_QUERIES = {
    "xml_scan_filter": ("scale10", "customer x100"),
    "xml_agg_q1": ("scale10", "lineitem x10"),
    "xml_join_agg": ("scale10", "customer x100"),
    "text_tfidf": ("scale10", "documents x10"),
    "text_bm25": ("scale10", "documents x10"),
    "text_kmv": ("scale10", "documents x10"),
    "dedup_exact": ("scale10", "documents x10"),
    "events_rollup_once": ("scale10", "events x10"),
    "events_asof": ("scale10", "events x10"),
    "ann_cosine_topk": ("emb_big", "embeddings x2000"),
}


def _settle(cap1: float, cap5: float, deadline_s: float = 240) -> None:
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        try:
            la = os.getloadavg()
            if la[0] <= cap1 and la[1] <= cap5:
                return
        except OSError:
            return
        time.sleep(5)


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    sf01 = os.path.join(base, "sf0.1")
    cpus_pair = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALING_CPUS", "32,8").split(",")
    ]
    cap1 = float(os.environ.get("SPARK_GRAFT_LOADAVG_MAX", "1.5"))
    cap5 = float(os.environ.get("SPARK_GRAFT_LOADAVG5_MAX", "3.0"))
    scratch = os.environ.get(
        "SPARK_GRAFT_SCALEPROBE_DIR", "/tmp/xmlgraft_scaleprobe"
    )
    emb_big = os.environ.get(
        "SPARK_GRAFT_EMB_BIG_DIR", "/tmp/xmlgraft_emb_big"
    )

    rt._build_scale10(sf01, scratch)
    # the x2000 embeddings fixture (persistent, trend-owned): build if
    # missing, with the trend's row-count + row-group validity check
    os.makedirs(emb_big, exist_ok=True)
    e_src = os.path.join(sf01, "embeddings.parquet")
    e_dst = os.path.join(emb_big, "embeddings.parquet")
    if not (os.path.exists(e_dst)
            and rt._scaled_table_ok(e_src, e_dst, 2000, 32)):
        rt._replicate_table(e_src, e_dst, 2000, "vec_id", ["vec_id"], 16384)
    for t in rt.TABLES:
        sp_ = os.path.join(sf01, f"{t}.parquet")
        dp_ = os.path.join(emb_big, f"{t}.parquet")
        if t != "embeddings" and os.path.exists(sp_) \
                and not os.path.exists(dp_):
            os.symlink(sp_, dp_)

    out: dict = {
        "cpus_pair": cpus_pair,
        "protocol": "per-cpu settled session; warm 1 + min-of-3 .count(); "
                    "fixtures: trend scale10 scratch + x2000 embeddings",
        "queries": {},
        "yardstick": {},
        "loadavg": {},
    }
    for cpus in cpus_pair:
        _settle(cap1, cap5)
        try:
            out["loadavg"][str(cpus)] = [
                round(x, 2) for x in os.getloadavg()
            ]
        except OSError:
            pass
        spark = rt._spark_session(cpus)
        import __spark_entry__ as em

        qs = em.queries()
        try:
            # per-session scan yardstick: pruned parquet scan of the x10
            # documents replica — proves the session's parallelism is
            # real even if a query's wall is not
            ydf = spark.read.parquet(
                os.path.join(scratch, "documents.parquet")
            ).select("doc_id")
            n_docs = ydf.count()
            ys = rt._min_of(lambda: ydf.count(), n=3)
            out["yardstick"][str(cpus)] = {
                "pruned_scan_rows_per_s": int(n_docs / ys),
                "rows": n_docs,
            }
            for name, (fixture, note) in PROBE_QUERIES.items():
                d = scratch if fixture == "scale10" else emb_big
                fn = qs[name]
                spark.sparkContext.setJobDescription(
                    f"scaling_probe:{name}@{cpus}c"
                )
                try:
                    s = rt._min_of(lambda: fn(spark, d).count(), n=3)
                    rec = out["queries"].setdefault(
                        name, {"fixture": note}
                    )
                    rec[f"s{cpus}"] = round(s, 4)
                except Exception as exc:  # noqa: BLE001
                    out["queries"].setdefault(
                        name, {"fixture": note}
                    )[f"error_{cpus}"] = repr(exc)[:200]
                spark.sparkContext.setJobDescription(None)
        finally:
            spark.stop()
        sys.stderr.write(f"scaling_probe: {cpus}c session done\n")

    if len(cpus_pair) == 2:
        hi, lo = max(cpus_pair), min(cpus_pair)
        for name, rec in out["queries"].items():
            shi, slo = rec.get(f"s{hi}"), rec.get(f"s{lo}")
            if shi and slo:
                rec["speedup_hi_over_lo"] = round(slo / shi, 2)
        out["core_ratio"] = round(hi / lo, 2)

    if os.environ.get("SPARK_GRAFT_KEEP_SCALE10") != "1":
        shutil.rmtree(scratch, ignore_errors=True)
    path = os.path.join(REPO, "SCALING_X10.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out["queries"]))


if __name__ == "__main__":
    main()
