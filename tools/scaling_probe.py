"""Parallel-scaling probe at beyond-sf0.1 fixtures (VERDICT r16 task 3).

The sf0.1 suite cannot demonstrate parallel scaling: 100/117 queries run
as fast on 8 cores as 32 because per-query walls sit on fixed overheads
at that SF (driver verdict, r16). This probe re-asks the question where
it is answerable: heavy batch queries at scaled replicas, each measured
at 32 AND 8 cores in back-to-back settled sessions (min-of-3 after a
warm run, the same `.count()` timed action as tools/ratio_trend.py).

Fixture-layout lesson (first probe attempt, r17): a DuckDB COPY replica
is ONE parquet file, and a file under maxPartitionBytes is ONE Spark
scan split — so a "x10" documents replica (911 KB) ran every per-row
pipeline stage on a single core at both core counts and the probe
measured serial execution, not the engine. At 100 TB a scan always has
more splits than cores; the representative fixture is MULTI-FILE. The
documents/events/embeddings replicas here are therefore written by
Spark as 32-file directories (validated by row count + file count);
the XML-side fixtures stay DuckDB replicas because the xml-graft
materialization re-partitions to `partitions=cpus` regardless of the
source layout.

Writes SCALING_X10.json; tools/sync_board.py renders it into BOARD.md.

Usage: python tools/scaling_probe.py            # 32c then 8c
       SPARK_GRAFT_SCALING_CPUS="8,32" ...      # override pair/order
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import ratio_trend as rt  # noqa: E402

N_FILES = 32
# multi-file Spark-built replicas: table -> (factor, id column)
SPARK_REPLICAS = {
    "documents": (100, "doc_id"),
    "events": (100, "event_id"),
    "embeddings": (2000, "vec_id"),
}
# query -> fixture note (all run against the one probe scratch dir)
PROBE_QUERIES = {
    "xml_scan_filter": "customer x100 (duckdb replica; xml cache)",
    "xml_agg_q1": "lineitem x10 (duckdb replica; xml cache)",
    "xml_join_agg": "customer x100 (duckdb replica; xml cache)",
    "text_tfidf": "documents x100, 32 files",
    "text_bm25": "documents x100, 32 files",
    "text_kmv": "documents x100, 32 files",
    "dedup_exact": "documents x100, 32 files",
    "events_rollup_once": "events x100, 32 files",
    "events_asof": "events x100, 32 files",
    "ann_cosine_topk": "embeddings x2000, 32 files",
}


def _settle(cap1: float, cap5: float, deadline_s: float = 420) -> None:
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        try:
            la = os.getloadavg()
            if la[0] <= cap1 and la[1] <= cap5:
                return
        except OSError:
            return
        time.sleep(5)


def _replica_ok(src: str, dst_dir: str, factor: int) -> bool:
    """A pre-existing multi-file replica must prove itself: exact
    factor x source rows AND the intended file count (a partial write
    or an old single-file layout would otherwise be measured)."""
    try:
        import pyarrow.parquet as pq

        parts = glob.glob(os.path.join(dst_dir, "*.parquet"))
        if len(parts) != N_FILES:
            return False
        have = sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
        want = factor * pq.ParquetFile(src).metadata.num_rows
        return have == want
    except OSError:
        return False


def _build_fixtures(scratch: str, sf01: str) -> None:
    """Build every fixture into one drop-in sf_dir: DuckDB replicas for
    the XML-side tables (customer x100 / lineitem x10, SCALEUP spec),
    Spark-written 32-file replicas for documents/events/embeddings,
    symlinks for the rest."""
    os.makedirs(scratch, exist_ok=True)
    for t in ("customer", "lineitem"):
        s = os.path.join(sf01, f"{t}.parquet")
        d = os.path.join(scratch, f"{t}.parquet")
        factor, key, order = rt.SCALEUP[t]
        if not (os.path.exists(d)
                and rt._scaled_table_ok(s, d, factor, None)):
            rt._replicate_table(s, d, factor, key, order)
    for t in rt.TABLES:
        s = os.path.join(sf01, f"{t}.parquet")
        d = os.path.join(scratch, f"{t}.parquet")
        if (t in SPARK_REPLICAS or t in ("customer", "lineitem")
                or not os.path.exists(s)):
            continue
        if not os.path.exists(d):
            os.symlink(s, d)
    todo = {
        t: spec for t, spec in SPARK_REPLICAS.items()
        if not _replica_ok(
            os.path.join(sf01, f"{t}.parquet"),
            os.path.join(scratch, f"{t}.parquet"),
            spec[0],
        )
    }
    if not todo:
        return
    spark = rt._spark_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    from pyspark.sql import functions as F

    try:
        for t, (factor, key) in todo.items():
            src = os.path.join(sf01, f"{t}.parquet")
            dst = os.path.join(scratch, f"{t}.parquet")
            shutil.rmtree(dst, ignore_errors=True)
            (
                spark.read.parquet(src)
                .withColumn(
                    "_i",
                    F.explode(
                        F.sequence(
                            F.lit(0).cast("long"),
                            F.lit(factor - 1).cast("long"),
                        )
                    ),
                )
                .withColumn(
                    key,
                    F.col(key).cast("long")
                    + F.lit(10000000).cast("long") * F.col("_i"),
                )
                .drop("_i")
                .repartition(N_FILES)
                .write.mode("overwrite")
                .parquet(dst)
            )
            # drop non-data files so the file-count validity check and
            # the split count stay exactly N_FILES
            for p in glob.glob(os.path.join(dst, "*")):
                if not p.endswith(".parquet"):
                    os.remove(p)
    finally:
        spark.stop()


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

    _build_fixtures(scratch, sf01)

    out: dict = {
        "cpus_pair": cpus_pair,
        "protocol": "per-cpu settled session; warm 1 + min-of-3 .count(); "
                    "multi-file (32) spark replicas for "
                    "documents/events x100 + embeddings x2000; duckdb "
                    "replicas for customer x100 / lineitem x10",
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
            # per-session scan yardstick: pruned scan+sum over the
            # 32-file documents x100 replica — proves the session's
            # parallelism is real even where a query's wall is not
            from pyspark.sql import functions as F

            ydf = spark.read.parquet(
                os.path.join(scratch, "documents.parquet")
            ).select(F.length("text").alias("_l"))
            n_docs = ydf.count()
            ys = rt._min_of(
                lambda: ydf.agg(F.sum("_l")).collect(), n=3
            )
            out["yardstick"][str(cpus)] = {
                "text_len_rows_per_s": int(n_docs / ys),
                "rows": n_docs,
            }
            from spark_xml_spark.operators import retire_all

            for name, note in PROBE_QUERIES.items():
                fn = qs[name]
                spark.sparkContext.setJobDescription(
                    f"scaling_probe:{name}@{cpus}c"
                )
                try:
                    s = rt._min_of(lambda: fn(spark, scratch).count(), n=3)
                    rec = out["queries"].setdefault(
                        name, {"fixture": note}
                    )
                    rec[f"s{cpus}"] = round(s, 4)
                except Exception as exc:  # noqa: BLE001
                    out["queries"].setdefault(
                        name, {"fixture": note}
                    )[f"error_{cpus}"] = repr(exc)[:200]
                spark.sparkContext.setJobDescription(None)
                # a query's scoped MEMORY_AND_DISK intermediates stay
                # persisted until ITS next call (steady-state protocol)
                # — but here the next thing measured is a DIFFERENT
                # query, and at x100 with an 8g driver the leftovers
                # squeeze per-task execution memory hard enough to
                # invert scaling (r17: bm25-after-tfidf read 6.8 s at
                # 32c vs 4.3 s isolated, while 8c read 3.9 — the
                # "inversion" was tfidf's ~GB cached tf frame, not the
                # engine). retire_all() at the query boundary makes
                # each cell a per-query engine reading.
                retire_all()
                spark.catalog.clearCache()
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
