"""Scale-trend adjudication of the 2x-of-baseline gate (VERDICT r10
item 3 / r11 task 2).

The sf0.01 gate measurement shows most batch queries far above 2x of
DuckDB — but at 60k-row scale every Spark reading is dominated by fixed
per-query cost (job scheduling, codegen, Python-worker round-trips),
not per-row work. The claim that matters for the 100 TB pitch is about
MARGINAL cost: spark_s ~= floor + m_spark * rows while duck_s ~=
m_duck * rows (DuckDB's floor is ~1 ms), so ratio(sf) must FALL
monotonically with sf and converge to m_spark / m_duck. This script
measures that instead of arguing it:

  1. ~13 headline queries spanning xml_/dedup_/text_/events_/ann_ are
     timed isolated (min-of-5, one warm run first) at sf0.001 / 0.01 /
     0.1 against their DuckDB oracles (min-of-5, threads=cpus).
  2. The marginal-cost asymptote is estimated from the two largest
     scale points: m = (t(0.1) - t(0.01)) / (rows(0.1) - rows(0.01))
     per engine; asymptotic_ratio = m_spark / m_duck. Negative slopes
     (reading noise at these sizes) clamp to the floor-adjusted sf0.1
     ratio, never to an artificially flattering number.
  3. Corpora are scaled BEYOND sf0.1 into a scratch dir (re-keyed
     replication; /root/testdata is read-only): documents x10 for the
     pipeline operators, customer x100 + lineitem x10 for the XML
     headline queries (VERDICT r11 task 1 — the 172x/48x asymptotic
     entries had no beyond-sf0.1 point), embeddings x100 for
     ann_cosine_topk (2,000 vectors at sf0.1 is pure floor). Each
     query is re-measured there on both engines — the direct "does
     the ratio keep falling past the largest provided SF" check. The
     XML entries also record the isolated pruned scan+parse wall of
     the scaled table (xml_scan_s): XML parse is work the parquet
     baseline never pays, so the honest check is marginal query cost
     ~= marginal scan cost, not marginal ratio <= 2.

Writes RATIO_TREND.json at the repo root:
  {"summary": <compact block bench.py embeds in its payload>,
   "detail":  <per-query raw seconds per sf per engine>}

Run:  python tools/ratio_trend.py          (~6-8 min at local[32])
      python tools/ratio_trend.py --events-only
          (~1-2 min: re-measures ONLY the events x10 block, same-window
          sf0.1 walls included, and merges it into the existing
          RATIO_TREND.json — see events_only_main)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TREND_QUERIES = [
    "xml_scan_filter",
    "xml_agg_q1",
    "xml_join_agg",
    "dedup_exact",
    "dedup_simhash",
    "text_quality",
    "text_tokens",
    "text_kmv",
    "text_tfidf",
    "text_bm25",
    "events_asof",
    "events_rollup",
    "events_rollup_once",
    "ann_cosine_topk",
]
SFS = [0.001, 0.01, 0.1]
SCALE10_QUERIES = ["text_quality", "dedup_exact", "text_kmv", "text_tfidf"]
# tables replicated (re-keyed) beyond sf0.1 in the scratch dir:
# table -> (factor, rekeyed id column, deterministic output order)
SCALEUP = {
    "documents": (10, "doc_id", ["doc_id"]),
    "customer": (100, "c_custkey", ["c_custkey"]),
    "lineitem": (10, "l_orderkey", ["l_orderkey", "l_linenumber"]),
    "embeddings": (100, "vec_id", ["vec_id"]),
    "events": (10, "event_id", ["event_id"]),
}
# events-family queries measured at the x10 events corpus (replicas
# keep their timestamps, so bucket/asof key distributions scale in rows
# per key — the worst case for the rollup agg and the asof dedup).
# events_rollup_once is the adjudicating one-pass rollup shape; the
# events_rollup merge DEMO deliberately rolls the corpus up twice, so
# its marginal against the one-pass oracle over-reads by construction
# (VERDICT r12 task 3)
SCALE10_EVENTS = ["events_rollup", "events_rollup_once", "events_asof",
                  "events_funnel_windowed"]
# XML headline queries measured at the scaled corpus; value = the pruned
# (table, columns) read whose isolated scan wall is recorded alongside
SCALEUP_XML_QUERIES = {
    "xml_scan_filter": ("customer", ["c_custkey", "c_name", "c_acctbal"]),
    "xml_agg_q1": ("lineitem", ["l_returnflag", "l_linestatus",
                                "l_quantity", "l_extendedprice"]),
    "xml_join_agg": ("customer", ["c_nationkey", "c_acctbal"]),
}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _spark_session(cpus: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


# NEGATIVE RESULT (r14): idling the host between measurement sections
# ("settle" until loadavg <= 5) made readings WORSE, not better — the
# block following a ~2 min idle ran 2-3x slower (dedup_exact sf0.01
# 0.19s hot vs 0.56s post-idle; monotone_down_n fell 12 -> 8/14),
# consistent with CPU-frequency ramp-down on this VM. Run the sweep
# HOT and continuously; only guard the very start (above) against a
# PREVIOUS process's churn.
def _min_of(fn, n=5, warm=1):
    for _ in range(warm):
        fn()
    best = None
    for _ in range(n):
        t = time.time()
        fn()
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    return best


def _duck_con(sf_dir: str, cpus: int):
    import duckdb

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={cpus}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


# parquet layout floor (VERDICT r14 task 4): DuckDB's COPY default row
# group (~122k rows) left the 200k-row embeddings x100 replica with 2
# row groups — neither engine parallelizes below row-group granularity,
# so BOTH walls at that point measured LAYOUT, not compute (BASELINE.md:
# DuckDB itself ran 3.3x faster on the same bytes at 10 row groups).
# Tables listed here are written with an explicit ROW_GROUP_SIZE and a
# minimum group count the existing-file check enforces (a pre-task-4
# scratch file passes the row-count check but not this one).
ROW_GROUPS = {"embeddings": (6144, 32)}  # 200k rows -> ~33 groups


def _num_row_groups(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_row_groups


def _scaled_table_ok(src: str, dst: str, factor: int,
                     min_groups) -> bool:
    """A pre-existing scaled replica must PROVE itself: exact
    factor x source rows AND (when a layout floor applies) the required
    row-group count — a scratch file left by an older build (symlinked,
    unscaled, pre-task-4 2-row-group layout) or a killed COPY would
    otherwise be measured and published as x{factor}."""
    import duckdb

    con = duckdb.connect()
    try:
        have = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        want = factor * con.execute(
            f"SELECT count(*) FROM read_parquet('{src}')"
        ).fetchone()[0]
        ok = have == want
        if ok and min_groups is not None:
            ok = _num_row_groups(dst) >= min_groups
        return ok
    except (duckdb.Error, OSError):
        return False
    finally:
        con.close()


def _replicate_table(src: str, dst: str, factor: int, key: str,
                     order, row_group_size=None) -> None:
    """factor-x replica with re-keyed ids (replicas keep their payload
    bytes — per-row scan/parse cost is what the marginal fit prices);
    any stale file is removed first so a killed COPY never masquerades
    as a valid replica."""
    import duckdb

    if os.path.exists(dst):
        os.remove(dst)
    opts = "FORMAT parquet" + (
        f", ROW_GROUP_SIZE {row_group_size}"
        if row_group_size is not None else ""
    )
    con = duckdb.connect()
    try:
        con.execute(
            f"""
            COPY (
              SELECT src.* REPLACE ({key} + 10000000 * i AS {key})
              FROM read_parquet('{src}') src, range({factor}) t(i)
              ORDER BY {", ".join(order)}
            ) TO '{dst}' ({opts})
            """
        )
    finally:
        con.close()


def _build_scale10(src_sf_dir: str, dst: str, only=None) -> None:
    """A drop-in sf_dir scaled beyond sf0.1: every table in SCALEUP is
    replicated factor-x with re-keyed ids, every other table symlinked.
    ``only`` (a set of table names) restricts replication to those
    tables — the partial-rerun mode's scratch must not pay the full
    replica build for queries that touch a single table; everything
    else is symlinked at sf0.1 (measuring a query that reads an
    un-replicated table there would mislabel sf0.1 cost as x10, so
    partial modes must pass exactly the tables their queries read)."""
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        s = os.path.join(src_sf_dir, f"{t}.parquet")
        d = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(s):
            continue
        if t not in SCALEUP or (only is not None and t not in only):
            if not os.path.exists(d):
                os.symlink(s, d)
            continue
        factor, key, order = SCALEUP[t]
        rg, min_groups = ROW_GROUPS.get(t, (None, None))
        if os.path.exists(d) and _scaled_table_ok(s, d, factor,
                                                  min_groups):
            continue
        _replicate_table(s, d, factor, key, order, rg)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    # idle guard before the sweep (r14): when the board runs trend right
    # after another JVM-heavy step, the lagging 1-minute loadavg seeds
    # the by-sf baselines with churn the beyond-sf0.1 points don't see —
    # the same trap profile_scan guards against. Wait (bounded) for the
    # host to settle; record nothing, the per-record stamps carry it.
    load_cap = float(os.environ.get("SPARK_GRAFT_LOADAVG_MAX", "4"))
    # two-cap settle (ADVICE r16) — same rule as events_only_main
    load_cap5 = float(os.environ.get("SPARK_GRAFT_LOADAVG5_MAX", "4"))
    deadline = time.time() + 180
    while time.time() < deadline:
        try:
            la = os.getloadavg()
            if la[0] <= load_cap and la[1] <= load_cap5:
                break
        except OSError:
            break
        time.sleep(5)
    spark = _spark_session(cpus)

    import __spark_entry__ as em

    qs = em.queries()
    oracles = em.oracle_sql()

    detail: dict = {"cpus": cpus, "spark_s": {}, "duck_s": {}, "rows": {}}
    try:
        detail["loadavg_start"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass

    # rows(sf) proxy for the marginal-cost fit: the documents+lineitem
    # row counts scale linearly with sf, so sf itself is the abscissa
    for sf in SFS:
        sf_dir = os.path.join(base, f"sf{sf}")
        # XML caches for the xml_* queries: pay once, outside timing
        try:
            em._xml_table(spark, sf_dir, "lineitem", partitions=cpus)
        except Exception:  # noqa: BLE001
            pass
        con = _duck_con(sf_dir, cpus)
        for name in TREND_QUERIES:
            fn = qs[name]
            try:
                s = _min_of(lambda: fn(spark, sf_dir).count())
                detail["spark_s"].setdefault(name, {})[str(sf)] = round(s, 4)
            except Exception as exc:  # noqa: BLE001
                detail.setdefault("errors", {})[f"spark:{name}@{sf}"] = (
                    repr(exc)[:200]
                )
            sql = oracles.get(name)
            if not sql:
                continue
            try:
                d = _min_of(lambda: con.execute(sql).fetchall())
                detail["duck_s"].setdefault(name, {})[str(sf)] = round(d, 4)
            except Exception as exc:  # noqa: BLE001
                detail.setdefault("errors", {})[f"duck:{name}@{sf}"] = (
                    repr(exc)[:200]
                )
        con.close()
        sys.stderr.write(f"trend: sf{sf} done\n")

    # Spark's fixed per-query floor on this session (same probe as
    # bench.py): part of every reading that does not scale with rows
    floor = _min_of(
        lambda: spark.range(1000)
        .selectExpr("id % 7 AS k")
        .groupBy("k")
        .count()
        .collect()
    )
    detail["spark_floor_s"] = round(floor, 4)

    # ---- the 10x-beyond-sf0.1 point for the top pipeline operators ----
    scratch = os.environ.get(
        "SPARK_GRAFT_SCALE10_DIR", "/tmp/xmlgraft_scale10"
    )
    sf01_dir = os.path.join(base, "sf0.1")
    x10: dict = {}
    xml_x: dict = {}
    emb_x: dict = {}
    events_x: dict = {}

    # a marginal whose numerator or denominator is under this floor
    # divides measurement noise (VERDICT r13: ann_cosine's x100 marginal
    # flipped 1.3x <-> 5.0x because DuckDB's sub-second wall halved
    # between runs) — record the raw deltas instead of a ratio there
    MARGINAL_FLOOR_S = 0.05

    def _scaleup_rec(name: str, con, n: int = 3) -> dict:
        """One beyond-sf0.1 reading: both engines at the scratch corpus,
        plus the marginal ratio across the sf0.1 -> scaled step — the
        purest per-row cost comparison this host can produce. Every rec
        carries loadavg provenance and the raw deltas; the marginal is
        only emitted when BOTH deltas clear the noise floor."""
        fn = qs[name]
        rec: dict = {}
        try:
            rec["loadavg_start"] = round(os.getloadavg()[0], 2)
        except OSError:
            rec["loadavg_start"] = None
        try:
            rec["spark_s"] = round(
                _min_of(lambda: fn(spark, scratch).count(), n=n), 4
            )
            rec["duck_s"] = round(
                _min_of(lambda: con.execute(oracles[name]).fetchall(), n=n),
                4,
            )
            rec["n_runs"] = n
            rec["ratio"] = round(rec["spark_s"] / rec["duck_s"], 2)
            try:
                sf01_sp = detail["spark_s"][name]["0.1"]
                sf01_du = detail["duck_s"][name]["0.1"]
            except KeyError:
                # not in the by-sf sweep (events_funnel_windowed rides
                # only the x10 point — the r16 full run's record died
                # on exactly this lookup): measure the sf0.1 walls
                # inline, in the same load window as the scaled walls
                con01 = _duck_con(sf01_dir, cpus)
                try:
                    sf01_sp = round(
                        _min_of(lambda: fn(spark, sf01_dir).count(),
                                n=n), 4
                    )
                    sf01_du = round(
                        _min_of(
                            lambda: con01.execute(
                                oracles[name]
                            ).fetchall(),
                            n=n,
                        ),
                        4,
                    )
                finally:
                    con01.close()
                # one key pair for inline sf0.1 walls in BOTH run modes
                # (ADVICE r16: this path and events_only_main used to
                # record the same measurement under different keys)
                rec["sf01_spark_s"] = sf01_sp
                rec["sf01_duck_s"] = sf01_du
                rec["sf01_same_window"] = True
            rec["ratio_sf01"] = round(sf01_sp / sf01_du, 2)
            dsp = rec["spark_s"] - sf01_sp
            ddu = rec["duck_s"] - sf01_du
            rec["delta_spark_s"] = round(dsp, 4)
            rec["delta_duck_s"] = round(ddu, 4)
            if dsp >= MARGINAL_FLOOR_S and ddu >= MARGINAL_FLOOR_S:
                rec["marginal_ratio"] = round(dsp / ddu, 2)
            elif dsp > 0 and ddu > 0:
                rec["marginal_note"] = (
                    f"delta under the {MARGINAL_FLOOR_S}s noise floor on "
                    "at least one engine; ratio suppressed (raw deltas "
                    "recorded)"
                )
            try:
                rec["loadavg_end"] = round(os.getloadavg()[0], 2)
            except OSError:
                rec["loadavg_end"] = None
        except Exception as exc:  # noqa: BLE001
            rec["error"] = repr(exc)[:200]
        return rec

    try:
        _build_scale10(sf01_dir, scratch)
        con = _duck_con(scratch, cpus)
        for name in SCALE10_QUERIES:
            x10[name] = _scaleup_rec(name, con)
        # XML headline queries (VERDICT r11 task 1): customer x100 /
        # lineitem x10. marginal_ratio here prices XML parsing the
        # parquet oracle never pays, so the adjudicating number is
        # xml_scan_s: the isolated pruned scan+parse wall of the scaled
        # table with exactly the query's column set — marginal query
        # seconds at or under the scan wall mean the plan adds ~nothing
        # on top of the format cost.
        for name, (tbl, cols) in SCALEUP_XML_QUERIES.items():
            rec = _scaleup_rec(name, con)
            rec["x"] = SCALEUP[tbl][0]
            try:
                rec["xml_scan_s"] = round(
                    _min_of(
                        lambda: em._xml_table(
                            spark, scratch, tbl,
                            columns=cols, partitions=cpus,
                        ).count(),
                        n=3,
                    ),
                    4,
                )
            except Exception as exc:  # noqa: BLE001
                rec["xml_scan_error"] = repr(exc)[:200]
            xml_x[name] = rec
        # ann at embeddings x100: 2,000 vectors at sf0.1 is pure floor —
        # this is the first data point where per-row scoring cost is
        # visible at all (the r11 non-monotone entry was floor noise).
        # min-of-5 on BOTH engines (r14, VERDICT task 3): the x100
        # marginal had flipped 1.3x <-> 5.0x off single-run sub-second
        # DuckDB denominators
        rec = _scaleup_rec("ann_cosine_topk", con, n=5)
        # SAME-WINDOW sf0.1 re-baseline (r14): the stored sf0.1 walls
        # were measured minutes earlier in the by-sf sweep under
        # different host load, so the subtraction mixed two load
        # regimes — the r14 board pair read marginals 2.93x vs 4.4x
        # from exactly that. Re-measuring both engines' sf0.1 walls
        # immediately before the subtraction keeps numerator and
        # denominator in one load window; marginal_ratio_same_window
        # is the citable number.
        try:
            con01 = _duck_con(sf01_dir, cpus)
            try:
                sp01 = _min_of(
                    lambda: qs["ann_cosine_topk"](spark, sf01_dir).count(),
                    n=5,
                )
                du01 = _min_of(
                    lambda: con01.execute(
                        oracles["ann_cosine_topk"]
                    ).fetchall(),
                    n=5,
                )
            finally:
                con01.close()
            rec["sf01_same_window_spark_s"] = round(sp01, 4)
            rec["sf01_same_window_duck_s"] = round(du01, 4)
            dsp = rec["spark_s"] - sp01
            ddu = rec["duck_s"] - du01
            if dsp >= MARGINAL_FLOOR_S and ddu >= MARGINAL_FLOOR_S:
                rec["marginal_ratio_same_window"] = round(dsp / ddu, 2)
        except Exception as exc:  # noqa: BLE001
            rec["same_window_error"] = repr(exc)[:200]
        rec["x"] = SCALEUP["embeddings"][0]
        # layout provenance (task 4): the marginal is only computed-bound
        # when the corpus file has enough row groups to parallelize
        try:
            rec["fixture_row_groups"] = _num_row_groups(
                os.path.join(scratch, "embeddings.parquet")
            )
        except OSError:
            pass
        emb_x["ann_cosine_topk"] = rec
        # ---- embeddings x2000 (r15, VERDICT r14 task 4 follow-through):
        # the 33-row-group re-lay made the x100 point FLOOR-bound for
        # DuckDB (its x100 wall fell to ~0.04 s, delta vs sf0.1 under
        # the 0.05 s noise floor — the layout, not compute, was what the
        # old record measured), so the computed-bound adjudication moves
        # to 4M vectors, where both engines' walls and both deltas clear
        # the floor with margin (probed: duck ~0.085 s at 2M already).
        # Marginal = (x2000 - x100) deltas, both points measured
        # back-to-back in this session. The fixture lives OUTSIDE the
        # per-run scratch (own row-count + row-group validity check), so
        # its ~1 GB COPY is paid once, not per trend run.
        try:
            EMB_BIG_X = 2000
            scratch2k = os.environ.get(
                "SPARK_GRAFT_EMB_BIG_DIR", "/tmp/xmlgraft_emb_big"
            )
            os.makedirs(scratch2k, exist_ok=True)
            e_src = os.path.join(sf01_dir, "embeddings.parquet")
            e_dst = os.path.join(scratch2k, "embeddings.parquet")
            if not (os.path.exists(e_dst)
                    and _scaled_table_ok(e_src, e_dst, EMB_BIG_X, 32)):
                _replicate_table(e_src, e_dst, EMB_BIG_X, "vec_id",
                                 ["vec_id"], 16384)
            for t in TABLES:
                sp_ = os.path.join(sf01_dir, f"{t}.parquet")
                dp_ = os.path.join(scratch2k, f"{t}.parquet")
                if t != "embeddings" and os.path.exists(sp_) \
                        and not os.path.exists(dp_):
                    os.symlink(sp_, dp_)
            con2k = _duck_con(scratch2k, cpus)
            rec2k: dict = {"x": EMB_BIG_X}
            try:
                rec2k["spark_s"] = round(
                    _min_of(
                        lambda: qs["ann_cosine_topk"](
                            spark, scratch2k
                        ).count(),
                        n=5,
                    ),
                    4,
                )
                rec2k["duck_s"] = round(
                    _min_of(
                        lambda: con2k.execute(
                            oracles["ann_cosine_topk"]
                        ).fetchall(),
                        n=5,
                    ),
                    4,
                )
                rec2k["ratio"] = round(
                    rec2k["spark_s"] / rec2k["duck_s"], 2
                )
                rec2k["fixture_row_groups"] = _num_row_groups(e_dst)
                if "spark_s" in rec and "duck_s" in rec:
                    dsp = rec2k["spark_s"] - rec["spark_s"]
                    ddu = rec2k["duck_s"] - rec["duck_s"]
                    rec2k["delta_spark_s_vs_x100"] = round(dsp, 4)
                    rec2k["delta_duck_s_vs_x100"] = round(ddu, 4)
                    if dsp >= MARGINAL_FLOOR_S and ddu >= MARGINAL_FLOOR_S:
                        rec2k["marginal_ratio_vs_x100"] = round(
                            dsp / ddu, 2
                        )
            finally:
                con2k.close()
            emb_x[f"ann_cosine_topk_x{EMB_BIG_X}"] = rec2k
        except Exception as exc:  # noqa: BLE001
            detail.setdefault("errors", {})["emb_big"] = repr(exc)[:200]
        for name in SCALE10_EVENTS:
            rec = _scaleup_rec(name, con)
            rec["x"] = SCALEUP["events"][0]
            events_x[name] = rec
        con.close()
        # ---- documents x100 for dedup_exact (VERDICT r12 task 2): the
        # x10 point is still floor-dominated on the Spark side, so the
        # adjudicating marginal is the x10 -> x100 slope, where data
        # cost finally moves both engines ----
        scratch100 = scratch + "_docs100"
        os.makedirs(scratch100, exist_ok=True)
        import duckdb as _duck

        c100 = _duck.connect()
        s_doc = os.path.join(sf01_dir, "documents.parquet")
        d_doc = os.path.join(scratch100, "documents.parquet")
        n_src = c100.execute(
            f"SELECT count(*) FROM read_parquet('{s_doc}')"
        ).fetchone()[0]
        ok = False
        if os.path.exists(d_doc):
            try:
                ok = c100.execute(
                    f"SELECT count(*) FROM read_parquet('{d_doc}')"
                ).fetchone()[0] == 100 * n_src
            except _duck.Error:
                pass
            if not ok:
                os.remove(d_doc)
        if not ok:
            c100.execute(
                f"""
                COPY (
                  SELECT src.* REPLACE (doc_id + 10000000 * i AS doc_id)
                  FROM read_parquet('{s_doc}') src, range(100) t(i)
                  ORDER BY doc_id
                ) TO '{d_doc}' (FORMAT parquet)
                """
            )
        c100.close()
        for t in TABLES:
            sp = os.path.join(sf01_dir, f"{t}.parquet")
            dp = os.path.join(scratch100, f"{t}.parquet")
            if t != "documents" and os.path.exists(sp) and not os.path.exists(dp):
                os.symlink(sp, dp)
        con = _duck_con(scratch100, cpus)
        name = "dedup_exact"
        rec: dict = {"x": 100}
        try:
            rec["spark_s"] = round(
                _min_of(lambda: qs[name](spark, scratch100).count(), n=3), 4
            )
            rec["duck_s"] = round(
                _min_of(lambda: con.execute(oracles[name]).fetchall(), n=3), 4
            )
            rec["ratio"] = round(rec["spark_s"] / rec["duck_s"], 2)
            x10r = x10.get(name, {})
            # require REAL x10 readings: an errored x10 record would
            # default to 0 and mislabel the absolute x100 ratio as the
            # x10->x100 marginal
            if "spark_s" in x10r and "duck_s" in x10r:
                dsp = rec["spark_s"] - x10r["spark_s"]
                ddu = rec["duck_s"] - x10r["duck_s"]
                if dsp > 0 and ddu > 0:
                    rec["marginal_ratio_x10_to_x100"] = round(dsp / ddu, 2)
        except Exception as exc:  # noqa: BLE001
            rec["error"] = repr(exc)[:200]
        con.close()
        detail["docs_x100"] = {name: rec}
        if os.environ.get("SPARK_GRAFT_KEEP_SCALE10") != "1":
            shutil.rmtree(scratch100, ignore_errors=True)
    except Exception as exc:  # noqa: BLE001
        detail.setdefault("errors", {})["scale10"] = repr(exc)[:300]
    finally:
        if os.environ.get("SPARK_GRAFT_KEEP_SCALE10") != "1":
            shutil.rmtree(scratch, ignore_errors=True)
    detail["docs_x10"] = x10
    detail["xml_scaleup"] = xml_x
    detail["emb_x100"] = emb_x
    detail["events_x10"] = events_x

    # ---- summary: ratio per sf, monotonicity, asymptote ----------------
    ratio_by_sf: dict = {}
    asym: dict = {}
    mono_down = 0
    for name in TREND_QUERIES:
        sp = detail["spark_s"].get(name, {})
        du = detail["duck_s"].get(name, {})
        rs = []
        for sf in SFS:
            k = str(sf)
            rs.append(
                round(sp[k] / du[k], 2) if k in sp and k in du and du[k] > 0
                else None
            )
        ratio_by_sf[name] = rs
        if all(r is not None for r in rs) and rs[0] > rs[1] > rs[2]:
            mono_down += 1
        # marginal slope between the two largest scale points; sf is the
        # abscissa (row counts scale linearly with sf for every table)
        try:
            m_sp = (sp["0.1"] - sp["0.01"]) / (0.1 - 0.01)
            m_du = (du["0.1"] - du["0.01"]) / (0.1 - 0.01)
            if m_sp > 0 and m_du > 0:
                asym[name] = round(m_sp / m_du, 2)
            else:
                # noise-dominated slope: fall back to the floor-adjusted
                # largest-scale ratio (conservative, never flattering)
                asym[name] = round(
                    max(sp["0.1"] - floor, 0.001) / du["0.1"], 2
                )
        except (KeyError, ZeroDivisionError):
            pass
    summary = {
        "sfs": SFS,
        "ratio_by_sf": ratio_by_sf,
        "asymptotic_ratio": asym,
        "monotone_down_n": mono_down,
        "n": len(TREND_QUERIES),
        "spark_floor_s": round(floor, 3),
        "docs_x10": {
            n: {k: v for k, v in r.items() if k != "spark_s" and k != "duck_s"}
            for n, r in x10.items()
        },
        "xml_scaleup": xml_x,
        "emb_x100": emb_x,
        "events_x10": events_x,
        "docs_x100": detail.get("docs_x100", {}),
    }
    try:
        detail["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    out = {"summary": summary, "detail": detail}
    with open(os.path.join(REPO, "RATIO_TREND.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(summary))
    spark.stop()


def events_only_main() -> None:
    """Surgically re-measure the events x10 block and merge it into the
    committed RATIO_TREND.json, leaving every other section untouched.

    Exists because events_funnel_windowed rides only the x10 point (it
    is not in the by-sf sweep) and the r16 full run's record died on
    exactly that missing sf0.1 lookup AFTER ten minutes of healthy
    sweep — re-rolling every good record on a loaded host to fix one
    block is worse measurement protocol than a same-window partial
    re-measure. All four events records here re-measure their sf0.1
    walls inline (same load window as the x10 walls — the ann
    same-window rationale: subtracting walls from two load regimes
    manufactures marginals), so the block is internally consistent.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    # two-cap settle (ADVICE r16): the 1-minute average alone is the
    # exact one-window lag trap r16 documented in bench.py — require
    # the 5-minute window under its own cap too
    load_cap = float(os.environ.get("SPARK_GRAFT_LOADAVG_MAX", "4"))
    load_cap5 = float(os.environ.get("SPARK_GRAFT_LOADAVG5_MAX", "4"))
    deadline = time.time() + 180
    while time.time() < deadline:
        try:
            la = os.getloadavg()
            if la[0] <= load_cap and la[1] <= load_cap5:
                break
        except OSError:
            break
        time.sleep(5)
    spark = _spark_session(cpus)

    import __spark_entry__ as em  # noqa: F401  (registers queries)

    qs = em.queries()
    oracles = em.oracle_sql()
    sf01_dir = os.path.join(base, "sf0.1")
    scratch = os.environ.get(
        "SPARK_GRAFT_SCALE10_EVENTS_DIR", "/tmp/xmlgraft_scale10_events"
    )
    # the events queries read ONLY the events table (their oracles are
    # single-table SQL over events) — replicate just it, symlink the rest
    _build_scale10(sf01_dir, scratch, only={"events"})
    MARGINAL_FLOOR_S = 0.05
    events_x: dict = {}
    con = _duck_con(scratch, cpus)
    con01 = _duck_con(sf01_dir, cpus)
    try:
        for name in SCALE10_EVENTS:
            fn = qs[name]
            rec: dict = {"x": SCALEUP["events"][0],
                         "sf01_same_window": True}
            try:
                rec["loadavg_start"] = round(os.getloadavg()[0], 2)
            except OSError:
                rec["loadavg_start"] = None
            try:
                sp01 = _min_of(lambda: fn(spark, sf01_dir).count(), n=3)
                du01 = _min_of(
                    lambda: con01.execute(oracles[name]).fetchall(), n=3
                )
                rec["spark_s"] = round(
                    _min_of(lambda: fn(spark, scratch).count(), n=3), 4
                )
                rec["duck_s"] = round(
                    _min_of(
                        lambda: con.execute(oracles[name]).fetchall(),
                        n=3,
                    ),
                    4,
                )
                rec["n_runs"] = 3
                rec["ratio"] = round(rec["spark_s"] / rec["duck_s"], 2)
                rec["sf01_spark_s"] = round(sp01, 4)
                rec["sf01_duck_s"] = round(du01, 4)
                rec["ratio_sf01"] = round(sp01 / du01, 2)
                dsp = rec["spark_s"] - sp01
                ddu = rec["duck_s"] - du01
                rec["delta_spark_s"] = round(dsp, 4)
                rec["delta_duck_s"] = round(ddu, 4)
                if dsp >= MARGINAL_FLOOR_S and ddu >= MARGINAL_FLOOR_S:
                    rec["marginal_ratio"] = round(dsp / ddu, 2)
                elif dsp > 0 and ddu > 0:
                    rec["marginal_note"] = (
                        f"delta under the {MARGINAL_FLOOR_S}s noise "
                        "floor on at least one engine; ratio suppressed "
                        "(raw deltas recorded)"
                    )
                try:
                    rec["loadavg_end"] = round(os.getloadavg()[0], 2)
                except OSError:
                    rec["loadavg_end"] = None
            except Exception as exc:  # noqa: BLE001
                rec["error"] = repr(exc)[:200]
            events_x[name] = rec
    finally:
        con.close()
        con01.close()
        if os.environ.get("SPARK_GRAFT_KEEP_SCALE10") != "1":
            shutil.rmtree(scratch, ignore_errors=True)
    path = os.path.join(REPO, "RATIO_TREND.json")
    with open(path) as fh:
        out = json.load(fh)
    out["summary"]["events_x10"] = events_x
    out["detail"]["events_x10"] = events_x
    out["detail"].setdefault("partial_reruns", []).append("events_x10")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"events_x10": events_x}))
    spark.stop()


def xml_only_main() -> None:
    """Surgically re-measure the xml_scaleup block (customer x100 /
    lineitem x10) and merge it into the committed RATIO_TREND.json,
    leaving every other section untouched — the same partial protocol
    as events_only_main. Exists so a plan change to one XML headline
    query (r17: xml_join_agg's preagg-before-join shape) can get its
    adjudicating beyond-sf0.1 record without re-rolling the whole
    multi-hour sweep. All records re-measure their sf0.1 walls inline
    (same load window as the scaled walls) and carry the isolated
    pruned-scan wall (xml_scan_s) of exactly the query's column set."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    load_cap = float(os.environ.get("SPARK_GRAFT_LOADAVG_MAX", "4"))
    load_cap5 = float(os.environ.get("SPARK_GRAFT_LOADAVG5_MAX", "4"))
    deadline = time.time() + 180
    while time.time() < deadline:
        try:
            la = os.getloadavg()
            if la[0] <= load_cap and la[1] <= load_cap5:
                break
        except OSError:
            break
        time.sleep(5)
    spark = _spark_session(cpus)

    import __spark_entry__ as em

    qs = em.queries()
    oracles = em.oracle_sql()
    sf01_dir = os.path.join(base, "sf0.1")
    scratch = os.environ.get(
        "SPARK_GRAFT_SCALE10_XML_DIR", "/tmp/xmlgraft_scale10_xml"
    )
    tables = {t for t, _ in SCALEUP_XML_QUERIES.values()}
    _build_scale10(sf01_dir, scratch, only=tables)
    MARGINAL_FLOOR_S = 0.05
    xml_x: dict = {}
    con = _duck_con(scratch, cpus)
    con01 = _duck_con(sf01_dir, cpus)
    try:
        for name, (tbl, cols) in SCALEUP_XML_QUERIES.items():
            fn = qs[name]
            rec: dict = {"x": SCALEUP[tbl][0], "sf01_same_window": True}
            try:
                rec["loadavg_start"] = round(os.getloadavg()[0], 2)
            except OSError:
                rec["loadavg_start"] = None
            try:
                sp01 = _min_of(lambda: fn(spark, sf01_dir).count(), n=3)
                du01 = _min_of(
                    lambda: con01.execute(oracles[name]).fetchall(), n=3
                )
                rec["spark_s"] = round(
                    _min_of(lambda: fn(spark, scratch).count(), n=3), 4
                )
                rec["duck_s"] = round(
                    _min_of(
                        lambda: con.execute(oracles[name]).fetchall(), n=3
                    ),
                    4,
                )
                rec["n_runs"] = 3
                rec["ratio"] = round(rec["spark_s"] / rec["duck_s"], 2)
                rec["sf01_spark_s"] = round(sp01, 4)
                rec["sf01_duck_s"] = round(du01, 4)
                rec["ratio_sf01"] = round(sp01 / du01, 2)
                dsp = rec["spark_s"] - sp01
                ddu = rec["duck_s"] - du01
                rec["delta_spark_s"] = round(dsp, 4)
                rec["delta_duck_s"] = round(ddu, 4)
                if dsp >= MARGINAL_FLOOR_S and ddu >= MARGINAL_FLOOR_S:
                    rec["marginal_ratio"] = round(dsp / ddu, 2)
                elif dsp > 0 and ddu > 0:
                    rec["marginal_note"] = (
                        f"delta under the {MARGINAL_FLOOR_S}s noise "
                        "floor on at least one engine; ratio suppressed "
                        "(raw deltas recorded)"
                    )
                try:
                    rec["xml_scan_s"] = round(
                        _min_of(
                            lambda: em._xml_table(
                                spark, scratch, tbl,
                                columns=cols, partitions=cpus,
                            ).count(),
                            n=3,
                        ),
                        4,
                    )
                except Exception as exc:  # noqa: BLE001
                    rec["xml_scan_error"] = repr(exc)[:200]
                try:
                    rec["loadavg_end"] = round(os.getloadavg()[0], 2)
                except OSError:
                    rec["loadavg_end"] = None
            except Exception as exc:  # noqa: BLE001
                rec["error"] = repr(exc)[:200]
            xml_x[name] = rec
    finally:
        con.close()
        con01.close()
        if os.environ.get("SPARK_GRAFT_KEEP_SCALE10") != "1":
            shutil.rmtree(scratch, ignore_errors=True)
    path = os.path.join(REPO, "RATIO_TREND.json")
    with open(path) as fh:
        out = json.load(fh)
    out["summary"]["xml_scaleup"] = xml_x
    out["detail"]["xml_scaleup"] = xml_x
    out["detail"].setdefault("partial_reruns", []).append("xml_scaleup")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"xml_scaleup": xml_x}))
    spark.stop()


if __name__ == "__main__":
    if "--events-only" in sys.argv[1:]:
        events_only_main()
    elif "--xml-only" in sys.argv[1:]:
        xml_only_main()
    else:
        main()
