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
