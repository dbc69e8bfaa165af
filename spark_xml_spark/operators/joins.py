"""Join shapes Spark lacks as built-ins: as-of join and range join.

Both are expressed as compositions of DataFrame primitives chosen for the
100 TB case — no BroadcastNestedLoopJoin, no cartesian product, no
per-row Python:

- ``asof_join`` uses the union-and-window construction: tag both sides,
  union, and carry the last right-side value forward within each key
  partition ordered by time. ONE shuffle (the window's partitionBy) and
  one sort — the same cost as any per-key windowed aggregation, at any
  right-side size (a broadcast-based merge_asof would cap the right
  side). Skewed keys concentrate in hot partitions, the standard window
  caveat — salt or split hot keys upstream if a single key's history
  exceeds a task.
- ``range_join`` bins both sides to an equi-join key (interval
  containment joins on covered-bin, then an exact post-filter), so
  Catalyst plans a plain shuffled hash join on the bin instead of a
  nested-loop over the interval predicate. The interval side explodes to
  O((hi-lo)/bin_width) rows per interval — pick ``bin_width`` near the
  typical interval width.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
    tolerance: Optional[float] = None,
    suffix: str = "_asof",
    _keep_union: bool = False,
) -> DataFrame:
    """LEFT as-of join: for every left row, attach the right row with the
    LARGEST ``ts_col`` <= the left row's (''backward''; ties at equal ts
    match), NULL when no such row exists — the merge_asof / ASOF JOIN
    shape (DuckDB's ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``
    computes exactly this, which the driver oracle exploits).

    ``on`` are the equi keys (rows with a NULL key or NULL ts never
    match, per SQL join semantics); ``value_cols`` are the right columns
    to carry (default: all right columns except keys and ts), emitted as
    ``<name><suffix>`` plus ``ts<suffix>`` = the matched right timestamp.
    ``tolerance`` (same units as ts_col) unmatches rows whose gap
    exceeds it. The right side must be UNIQUE per (keys, ts): which
    duplicate wins is engine-dependent, so this operator leaves
    dedup to the caller (pre-aggregate, e.g. max value per key+ts).

    ``direction``: ``"backward"`` (largest right ts <= left ts, the
    default), ``"forward"`` (smallest right ts >= left ts — the same
    union-and-carry construction over a descending window; DuckDB's
    ``ASOF ... ON l.ts <= r.ts`` mirrors it for the oracle), or
    ``"nearest"`` (whichever of the two is closer; ties prefer backward,
    matching pandas merge_asof; ``tolerance`` bounds each side BEFORE
    the proximity choice). ``nearest`` costs one extra per-key sort over
    the same single exchange (two Window orders, one shuffle).

    Skew note: the window partitions by key, so one hyper-hot key's
    whole history lands in one task — use :func:`asof_join_bucketed`
    (identical semantics, equivalence-tested) when a key's history
    exceeds a task; it spreads each key over floor(ts / W) time buckets
    and repairs cross-bucket matches from a per-bucket rollup.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest', "
            f"got {direction!r}"
        )
    on = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on + [ts_col]]
    value_cols = list(value_cols)
    out_cols = [v + suffix for v in value_cols] + ["ts" + suffix]
    clash = set(out_cols + ["_asof_side"]).intersection(left.columns)
    if clash:
        raise ValueError(
            f"left columns {sorted(clash)} collide with asof_join outputs; "
            "pick another suffix or rename them first"
        )

    r = right.select(
        *on,
        F.col(ts_col).alias(ts_col),
        *[F.col(v).alias(v + suffix) for v in value_cols],
    ).withColumn("_asof_side", F.lit(0))
    l = left.withColumn("_asof_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # ts and values are carried in ONE struct from ONE right row — two
    # independent last(ignorenulls) calls would pair the matched ts with
    # a value from an OLDER row whenever the matched row's value is
    # NULL, and would let never-match NULL-ts right rows leak values
    right_struct = F.when(
        (F.col("_asof_side") == 0) & F.col(ts_col).isNotNull(),
        F.struct(
            F.col(ts_col).alias("_ts"),
            *[F.col(v + suffix) for v in value_cols],
        ),
    )

    def _carry(order_cols):
        # right rows (side 0) sort BEFORE left rows at equal ts, so an
        # equal-timestamp right row is visible to the left row (ties
        # match); NULL ts sorts first in BOTH orders, so NULL-ts left
        # rows see no right row. Both directions share one partitionBy
        # exchange; each adds a per-key sort.
        w = (
            Window.partitionBy(*on)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(right_struct, ignorenulls=True).over(w)

    ts = F.col(ts_col)
    if direction in ("backward", "nearest"):
        m_back = _carry([ts.asc_nulls_first(), F.col("_asof_side")])
    if direction in ("forward", "nearest"):
        m_fwd = _carry([ts.desc_nulls_first(), F.col("_asof_side")])

    tol = None if tolerance is None else F.lit(tolerance)
    if direction == "backward":
        matched = m_back
        if tol is not None:
            matched = F.when((ts - matched["_ts"]) <= tol, matched)
    elif direction == "forward":
        matched = m_fwd
        if tol is not None:
            matched = F.when((matched["_ts"] - ts) <= tol, matched)
    else:  # nearest: tolerance bounds each side, then pick the closer;
        # ties prefer backward (pandas merge_asof convention)
        b, f = m_back, m_fwd
        if tol is not None:
            b = F.when((ts - b["_ts"]) <= tol, b)
            f = F.when((f["_ts"] - ts) <= tol, f)
        matched = (
            F.when(
                b.isNotNull() & f.isNotNull(),
                F.when((ts - b["_ts"]) <= (f["_ts"] - ts), b).otherwise(f),
            )
            .when(b.isNotNull(), b)
            .otherwise(f)
        )

    matched_ts = matched["_ts"]
    null_key = F.lit(False)
    for k in on:
        null_key = null_key | F.col(k).isNull()
    no_match = null_key | F.col(ts_col).isNull() | matched.isNull()

    carried = {
        "ts" + suffix: F.when(no_match, F.lit(None)).otherwise(matched_ts)
    }
    for v in value_cols:
        carried[v + suffix] = F.when(no_match, F.lit(None)).otherwise(
            matched[v + suffix]
        )

    annotated = u.withColumns(carried)
    if _keep_union:
        # INTERNAL (asof_join_bucketed): hand back the annotated union
        # BEFORE the side filter/projection. Its output partitioning is
        # the window's hashpartitioning(on...) — persisting THIS frame
        # lets the caller derive both the left output (side==1) and a
        # per-key right rollup (side==0, columns v<suffix>/ts_col) off
        # one cache with zero further exchanges.
        return annotated
    return (
        annotated
        .filter(F.col("_asof_side") == 1)
        .select(*left.columns, *[v + suffix for v in value_cols], "ts" + suffix)
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Optional[Sequence[str]],
    bucket_width: float,
    direction: str = "backward",
    tolerance: Optional[float] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Skew-safe as-of join for HOT KEYS: identical semantics and output
    columns to :func:`asof_join` (backward/forward; ``nearest`` is not
    offered — compose two bucketed passes if needed), but no single task
    ever holds one key's whole history. ``ts_col`` must be numeric
    (epoch seconds etc.); ``bucket_width`` is in its units.

    Construction (the docstring recipe from asof_join, made concrete):

    1. Both sides gain ``bucket = floor(ts / W)`` and the plain asof
       runs on ``on + [bucket]`` — the window partitions by
       key x bucket, so a hyper-hot key spreads over its time range.
    2. Rows that found no match INSIDE their bucket are repaired from a
       per-(key, bucket) rollup of the right side (one ``max_by``/
       ``min_by`` struct per bucket — a map-side-combinable aggregate),
       carried across buckets by a second asof over the DISTINCT
       (key, bucket) pairs of the residual — a frame bounded by
       occupied buckets per key, never by rows — and equi-joined back
       on (key, bucket).

    Every shuffle is keyed by (key, bucket) except the two bounded
    bucket-level windows; with W chosen so a bucket holds ~one task's
    rows, the hot key's cost is spread across #buckets tasks. Tolerance
    applies to the final gap exactly as in asof_join."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            "asof_join_bucketed implements direction='backward'/'forward'"
            f", got {direction!r}"
        )
    if not bucket_width or bucket_width <= 0:
        raise ValueError("bucket_width must be a positive number")
    on = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on + [ts_col]]
    value_cols = list(value_cols)
    out_vals = [v + suffix for v in value_cols]
    internal = {"_bkt", "_qb", "_last", "_last" + suffix, "ts" + suffix}
    clash = internal.intersection(left.columns).union(
        internal.intersection(right.columns)
    )
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} collide with asof_join_bucketed "
            "internals; rename them first"
        )
    w = F.lit(float(bucket_width))
    back = direction == "backward"
    lb = left.withColumn("_bkt", F.floor(F.col(ts_col) / w).cast("bigint"))
    rb = right.withColumn("_bkt", F.floor(F.col(ts_col) / w).cast("bigint"))

    # The annotated pass-1 UNION feeds FOUR consumers (matched,
    # repaired, need.distinct, and the right rollup) — persist it or
    # the union+sort+window subtree re-evaluates per branch (the
    # subplan re-evaluation anti-pattern, quadrupling the dominant
    # stage's cost exactly where this operator promises scale).
    # Persisting the PRE-FILTER union (not the filtered left output) is
    # the exchange diet: the cache is hashpartitioned(on..., _bkt) by
    # the pass-1 window, so the side==1 filters, need.distinct() (alias
    # -preserved), the RESIDUAL side of the repair join, AND the
    # side==0 per-(key, bucket) rollup all come off it with ZERO new
    # exchanges — and the right side's upstream (a corpus read at
    # 100 TB) is never evaluated a second time.
    from spark_xml_spark.operators.dedup import (
        _persist_intermediate,
        _retire_intermediates,
    )

    _retire_intermediates("asof_join_bucketed")
    ann = _persist_intermediate(
        asof_join(
            lb, rb, on + ["_bkt"], ts_col, value_cols,
            direction=direction, suffix=suffix, _keep_union=True,
        ),
        "asof_join_bucketed",
    )
    pass1 = ann.filter(F.col("_asof_side") == 1).select(
        *lb.columns, *out_vals, "ts" + suffix
    )

    matched = pass1.filter(F.col("ts" + suffix).isNotNull())
    residual = pass1.filter(F.col("ts" + suffix).isNull()).drop(
        "ts" + suffix, *out_vals
    )

    # per-(key, bucket) right rollup off the SAME cache (side==0 rows
    # carry their values as <v><suffix> after pass 1's projection): the
    # LAST (backward) / FIRST (forward) right struct in the bucket. ts
    # is the struct's first field, so min/max order by ts; equal-ts
    # duplicates are the same caller-dedup contract as asof_join. The
    # cache partitioning satisfies this groupBy — no exchange.
    rstruct = F.struct(
        F.col(ts_col).alias("_ts"),
        *[F.col(v + suffix).alias(v) for v in value_cols],
    )
    key_ok = F.lit(True)
    for k in on:
        key_ok = key_ok & F.col(k).isNotNull()
    pb = (
        ann.filter(
            (F.col("_asof_side") == 0) & key_ok & F.col(ts_col).isNotNull()
        )
        .groupBy(*on, "_bkt")
        .agg((F.max(rstruct) if back else F.min(rstruct)).alias("_last"))
    )
    # shift so the carry asof matches STRICTLY earlier (later) buckets:
    # backward wants right _bkt < left _bkt  <=>  _bkt + 1 <= left _bkt
    shifted = pb.select(
        *on,
        (F.col("_bkt") + (1 if back else -1)).alias("_qb"),
        "_last",
    )
    need = residual.select(*on, F.col("_bkt").alias("_qb")).distinct()
    rep = asof_join(
        need, shifted, on, "_qb", ["_last"],
        direction=direction, suffix=suffix,
    ).select(
        *on,
        F.col("_qb").alias("_bkt"),
        F.col("_last" + suffix).alias("_last"),
    )
    repaired = (
        residual.join(rep, on + ["_bkt"], "left")
        .withColumns(
            {
                "ts" + suffix: F.col("_last")["_ts"],
                **{
                    v + suffix: F.col("_last")[v] for v in value_cols
                },
            }
        )
        .drop("_last")
    )
    out = matched.unionByName(repaired).drop("_bkt")
    if tolerance is not None:
        ts = F.col(ts_col)
        mts = F.col("ts" + suffix)
        gap = (ts - mts) if back else (mts - ts)
        keep = gap <= F.lit(tolerance)
        out = out.withColumns(
            {
                **{
                    v + suffix: F.when(keep, F.col(v + suffix))
                    for v in value_cols
                },
                "ts" + suffix: F.when(keep, mts),
            }
        )
    return out.select(
        *left.columns, *[v + suffix for v in value_cols], "ts" + suffix
    )


def range_join(
    df: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    right_closed: bool = True,
) -> DataFrame:
    """INNER interval-containment join: rows of ``df`` whose
    ``value_col`` falls inside an interval [lo, hi] (or [lo, hi) with
    ``right_closed=False``) of ``intervals`` gain that interval's
    columns. NULL values/bounds never match.

    Both sides map to covered-bin keys (floor(x / bin_width)) so the
    containment predicate becomes an EQUI join plus an exact
    post-filter — Catalyst plans a shuffled hash join, never a
    nested-loop. Each df row has exactly one bin and each interval
    covers a bin at most once, so no duplicate matches arise. The
    interval side explodes to O((hi-lo)/bin_width) rows per interval.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if "_bin" in set(df.columns) | set(intervals.columns):
        raise ValueError(
            "column '_bin' collides with range_join internals; rename it"
        )
    shared = set(df.columns).intersection(intervals.columns)
    if shared:
        raise ValueError(
            f"columns {sorted(shared)} exist on BOTH sides of range_join "
            "(ambiguous references / duplicate outputs); rename one side"
        )
    bw = F.lit(float(bin_width))
    binned = df.withColumn(
        "_bin", F.floor(F.col(value_col) / bw).cast("bigint")
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bw).cast("bigint"),
                F.floor(F.col(hi_col) / bw).cast("bigint"),
            )
        ),
    )
    v = F.col(value_col)
    contained = (v >= F.col(lo_col)) & (
        (v <= F.col(hi_col)) if right_closed else (v < F.col(hi_col))
    )
    return binned.join(iv, "_bin").filter(contained).drop("_bin")
