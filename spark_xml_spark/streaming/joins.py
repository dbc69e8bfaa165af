"""Stream-stream joins with event-time bounds.

The reference has no streaming surface (SURVEY.md §2.2); this is part of
the Spark-first extension (SURVEY.md §7 phase 6). Structured Streaming's
symmetric hash join already implements the hard parts (buffering both
sides, watermark-driven state eviction, outer-row emission after the
horizon closes); what this module adds is the CORRECT-BY-CONSTRUCTION
assembly: both sides watermarked, the time-range predicate shaped so the
engine can derive state-cleanup bounds, and the key/interval validation
that turns silent unbounded-state mistakes into loud errors.

Scale shape: both sides shuffle on the join key (one exchange each);
per-key state holds only rows inside the watermark horizon, so executor
memory is bounded by (arrival rate x horizon), not corpus size. Late
rows beyond the watermark are dropped by the engine on both sides;
outer-join null rows emit only once the horizon guarantees no match can
still arrive. At 100 TB the knobs that matter are the horizon (state
size) and key skew (same salting options as any keyed shuffle).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOW = {"inner", "leftOuter", "rightOuter", "fullOuter"}


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: Union[str, Sequence[str]],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = 0,
    upper_s: int = 3600,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: rows pair when the keys match and
    ``right_ts`` lies in ``[left_ts + lower_s, left_ts + upper_s]``.

    Both inputs MUST be streaming DataFrames; both get
    ``withWatermark(ts, watermark)`` (the engine needs BOTH horizons to
    bound the buffered state of each side — a one-sided watermark keeps
    the other side's state forever). The output keeps every input
    column under the aliases ``l`` and ``r`` — select with
    ``F.col("l.x")`` / ``F.col("r.y")``.

    ``watermark`` trades completeness for state: rows later than the
    horizon are dropped. For bounded replays (availableNow over a fixed
    corpus) pass a horizon wider than the corpus' time span to drop
    nothing while still exercising the stateful-join machinery.
    """
    if how not in _HOW:
        raise ValueError(f"how must be one of {sorted(_HOW)}, got {how!r}")
    if not (left.isStreaming and right.isStreaming):
        raise ValueError(
            "stream_stream_interval_join needs two STREAMING inputs; use "
            "a plain join (or operators.joins.range_join) for batch"
        )
    if upper_s < lower_s:
        raise ValueError(f"empty interval: [{lower_s}, {upper_s}]")
    keys = [key] if isinstance(key, str) else list(key)
    if not keys:
        raise ValueError("at least one join key is required")
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    # the range predicate in the exact shape Spark's analyzer recognizes
    # for watermark-based state cleanup on BOTH sides
    cond = (
        cond
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}")
            + F.expr(f"INTERVAL {int(lower_s)} SECONDS")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}")
            + F.expr(f"INTERVAL {int(upper_s)} SECONDS")
        )
    )
    return l.join(r, cond, how)
