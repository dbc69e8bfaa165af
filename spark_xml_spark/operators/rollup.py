"""Hypertable-style time rollup: a materialized time-bucket aggregate
whose rows are MERGEABLE partial aggregates, so incremental refresh is
"roll up the new data, merge" — never a rescan of history.

The TimescaleDB continuous-aggregate shape re-expressed Spark-first:
``time_rollup`` is one map-side-combinable groupBy over (bucket, keys);
``merge_rollups`` unions partial rollups and re-combines per bucket —
count and sum add, min/max combine — touching O(buckets) rows, so a
daily refresh over 100 TB of history costs one scan of the NEW day plus
a bucket-sized merge. Sums accumulate in DECIMAL: exact and associative,
so merged-from-parts equals computed-from-scratch bit-for-bit (double
sums would drift with partitioning and break both the invariant and the
cross-engine oracle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROLLUP_COLS = ["n_rows", "sum_value", "min_value", "max_value"]


def time_rollup(
    df: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    bucket_seconds: int,
    value_col: str,
) -> DataFrame:
    """Aggregate ``df`` into ``bucket_seconds``-wide time buckets per
    ``group_cols``: count, exact DECIMAL(38,6) sum, min and max of
    ``value_col``. ``ts_col`` is epoch seconds (bigint); rows with NULL
    ts land in a NULL bucket rather than being dropped (observable, like
    a NULL group key). Output: bucket_start, group_cols..., n_rows,
    sum_value, min_value, max_value."""
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    clash = {"bucket_start", *_ROLLUP_COLS}.intersection(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with rollup outputs; "
            "rename them first"
        )
    w = F.lit(int(bucket_seconds))
    bucket = (F.floor(F.col(ts_col) / w) * w).cast("bigint")
    return (
        df.groupBy(bucket.alias("bucket_start"), *group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            # accumulate in decimal(38,6) from the start: summing
            # decimal(18,6) would overflow (to silent NULL, non-ANSI) at
            # 10^22 while the MERGE path's 38,6 partials would not —
            # breaking the merged == recomputed invariant exactly at the
            # scale this operator exists for
            F.sum(F.col(value_col).cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .alias("sum_value"),
            F.min(F.col(value_col)).alias("min_value"),
            F.max(F.col(value_col)).alias("max_value"),
        )
    )


def merge_rollups(
    rollups: Sequence[DataFrame], group_cols: Sequence[str]
) -> DataFrame:
    """Combine partial rollups (same schema, produced by time_rollup over
    DISJOINT slices of the fact stream) into one: counts and decimal
    sums ADD, min/max COMBINE. The row slices must not overlap — a fact
    row fed into two partials double-counts n_rows/sum_value (only
    min/max are idempotent); overlapping bucket/time RANGES from
    disjoint rows are fine. This is the incremental refresh:
    merge_rollups([existing, time_rollup(new_day)], keys). All
    aggregates here are algebraic, so merged == recomputed exactly."""
    if not rollups:
        raise ValueError("merge_rollups needs at least one rollup")
    u = rollups[0]
    for r in rollups[1:]:
        u = u.unionByName(r)
    return (
        u.groupBy("bucket_start", *group_cols)
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[str],
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel analysis: for each user, the longest PREFIX of ``steps``
    completable in order, with the EARLIEST timestamp each reached step
    completes at. A step counts when an event of its type occurs at or
    after the previous step's earliest completion (ties allowed — two
    events sharing a timestamp can satisfy consecutive steps; mirror
    ``>=`` in any replay). Earliest-first is OPTIMAL for unbounded
    funnels: completing step i as early as possible can only widen the
    choice for step i+1, so ``max_step`` is the true maximum. The
    bounded conversion-window report ("completed within W of step 1")
    needs per-chain-start search and lives in
    ``funnel_steps_windowed``.

    Output: one row per user that reached step 1 —
    (user_col, max_step bigint, step1_ts..stepN_ts, same type as
    ts_col, NULL past max_step). Events with a NULL timestamp cannot
    order within a funnel and are ignored entirely (so a user whose
    only step-1 events carry NULL ts is absent, keeping the
    one-row-per-reached-user contract exact).

    Scale shape (100 TB): one filtered aggregation for step 1, then per
    additional step ONE user-keyed join + min aggregation over ONLY
    that step's events — len(steps) is a small constant (3-5), so the
    plan is a bounded chain of keyed shuffles, each shrinking to
    one-row-per-user; no window over whole user histories, no
    collect_list of a user's events (a hot user costs nothing beyond
    their per-step event count). Each step frame references only its
    predecessor (never the running assembly), so the logical plan grows
    linearly in steps; the final assembly is one multi-way left join of
    the per-step one-row-per-user frames."""
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct event types")
    u, ts = user_col, ts_col
    reserved = {"_u", "_ts"} | {f"_s{i}" for i in range(1, len(steps) + 1)}
    if {u, ts, type_col} & reserved or reserved & set(df.columns):
        raise ValueError(
            f"funnel_steps reserves column names {sorted(reserved)}; "
            "rename the colliding input columns first"
        )
    base = df.filter(F.col(ts).isNotNull())
    frames = [
        base.filter(F.col(type_col) == steps[0])
        .groupBy(u)
        .agg(F.min(ts).alias("_s1"))
    ]
    for i, st in enumerate(steps[1:], start=2):
        ev = base.filter(F.col(type_col) == st).select(
            F.col(u).alias("_u"), F.col(ts).alias("_ts")
        )
        frames.append(
            ev.join(
                frames[-1].select(u, f"_s{i - 1}"),
                (F.col("_u") == F.col(u))
                & (F.col("_ts") >= F.col(f"_s{i - 1}")),
            )
            .groupBy("_u")
            .agg(F.min("_ts").alias(f"_s{i}"))
            .withColumnRenamed("_u", u)
        )
    ach = frames[0]
    for nxt in frames[1:]:
        ach = ach.join(nxt, u, "left")
    reached = [
        F.when(F.col(f"_s{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    ]
    max_step = reached[0]
    for r in reached[1:]:
        max_step = max_step + r
    return ach.select(
        u,
        max_step.cast("bigint").alias("max_step"),
        *[
            F.col(f"_s{i}").alias(f"step{i}_ts")
            for i in range(1, len(steps) + 1)
        ],
    )


def funnel_steps_windowed(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[str],
    window_seconds: int,
    type_col: str = "event_type",
) -> DataFrame:
    """Bounded-conversion-window funnel — the real funnel report shape
    ("completed within W of step 1"): for each user, the deepest prefix
    of ``steps`` completable in order with EVERY step inside
    ``[t1, t1 + window_seconds]`` for SOME step-1 event at t1. Unlike
    the unbounded ``funnel_steps``, earliest-first over the whole
    history is NOT optimal here (the earliest step-1 event's window may
    expire before a later chain start's would), so every step-1 event
    is a candidate CHAIN START; within a fixed chain start the greedy
    earliest-completion argument holds again (completing step i as
    early as possible only widens step i+1's remaining window), so per
    start one min-aggregation per step is exact.

    Winning chain per user: deepest ``max_step`` first, EARLIEST chain
    start breaking ties — deterministic, and an oracle can replay the
    same argmax. Output: one row per user that has a step-1 event —
    (user_col, max_step bigint, step1_ts..stepN_ts of the winning
    chain, NULL past max_step). NULL-timestamp events are ignored (the
    funnel_steps contract); exact-duplicate (user, ts) step-1 events
    collapse to one chain start (identical chains). ``ts_col`` may be
    numeric (``window_seconds`` in its own units — the driver queries
    use epoch seconds) or a timestamp (deadline via INTERVAL
    arithmetic).

    Scale shape (100 TB): per step beyond the first, ONE user-keyed
    join + min aggregation keyed by (user, chain_start) — the fan-out
    is bounded by each user's step-1 event count within the slice, not
    their whole history, and each frame shrinks back to
    one-row-per-chain. The final per-user argmax is a row_number window
    over CHAIN rows (one row per chain start, already reduced), never
    over raw events. A chain start whose window is empty of later
    steps costs one join probe and disappears."""
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct event types")
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    from pyspark.sql import types as T

    u, ts = user_col, ts_col
    reserved = {"_u", "_ts", "_fw_rn", "_fw_max"} | {
        f"_s{i}" for i in range(1, len(steps) + 1)
    }
    if {u, ts, type_col} & reserved or reserved & set(df.columns):
        raise ValueError(
            f"funnel_steps_windowed reserves column names "
            f"{sorted(reserved)}; rename the colliding input columns first"
        )
    base = df.filter(F.col(ts).isNotNull())
    is_time = isinstance(df.schema[ts].dataType, T.TimestampType)
    if is_time:
        deadline = F.col("_s1") + F.expr(
            f"INTERVAL {int(window_seconds)} SECONDS"
        )
    else:
        deadline = F.col("_s1") + F.lit(window_seconds)
    # every distinct step-1 (user, ts) is a candidate chain start
    chains = [
        base.filter(F.col(type_col) == steps[0])
        .select(F.col(u), F.col(ts).alias("_s1"))
        .distinct()
    ]
    for i, st in enumerate(steps[1:], start=2):
        ev = base.filter(F.col(type_col) == st).select(
            F.col(u).alias("_u"), F.col(ts).alias("_ts")
        )
        prev_cols = [u, "_s1"] + ([f"_s{i - 1}"] if i > 2 else [])
        chains.append(
            ev.join(
                chains[-1].select(*prev_cols),
                (F.col("_u") == F.col(u))
                & (F.col("_ts") >= F.col(f"_s{i - 1}"))
                & (F.col("_ts") <= deadline),
            )
            .groupBy(u, "_s1")
            .agg(F.min("_ts").alias(f"_s{i}"))
        )
    ach = chains[0]
    for nxt in chains[1:]:
        ach = ach.join(nxt, [u, "_s1"], "left")
    reached = [
        F.when(F.col(f"_s{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    ]
    max_step = reached[0]
    for r in reached[1:]:
        max_step = max_step + r
    ach = ach.withColumn("_fw_max", max_step.cast("bigint"))
    from pyspark.sql import Window

    w = Window.partitionBy(u).orderBy(
        F.col("_fw_max").desc(), F.col("_s1").asc()
    )
    best = ach.withColumn("_fw_rn", F.row_number().over(w)).filter(
        F.col("_fw_rn") == 1
    )
    return best.select(
        u,
        F.col("_fw_max").alias("max_step"),
        *[
            F.col(f"_s{i}").alias(f"step{i}_ts")
            for i in range(1, len(steps) + 1)
        ],
    )
