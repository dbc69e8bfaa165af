"""Training-shard materialization — the sink stage of a training-data
pipeline: bounded-size parquet shards, split-partitioned layout, and a
reproducible within-shard order, so a trainer can mount `split=train/`,
stream shards of a known maximum size, and resume at a stable position.

No reference counterpart (spark-xml is a source/sink for XML, not a
training-layout writer); composes with train_val_test_split (membership)
and deterministic_shuffle (global order) from textstats.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def write_training_shards(
    df: DataFrame,
    path: str,
    records_per_shard: int,
    split_col: Optional[str] = None,
    order_col: Optional[str] = None,
    num_tasks: Optional[int] = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as bounded training shards under ``path``.

    - ``records_per_shard`` bounds EVERY output file via
      ``maxRecordsPerFile`` (the writer rolls greedily, so each task's
      shards hold exactly ``records_per_shard`` rows except its last).
    - ``split_col`` partitions the directory layout (``split=train/``
      ...), letting a trainer mount one split without listing the rest.
    - ``order_col`` makes the within-shard row order reproducible: rows
      sort within each task by (split_col, order_col) — the split prefix
      satisfies the dynamic-partition writer's required ordering, so no
      second sort is inserted to disturb it. Pair with
      ``deterministic_shuffle`` for a stable global training order.
    - ``num_tasks`` pins write parallelism with ``repartition(num_tasks,
      split_col)``: every row of a split hashes to ONE task, making the
      per-split shard count exactly ``ceil(rows / records_per_shard)``
      (and the largest shard ``min(rows, records_per_shard)``) —
      the accounting a shard manifest records. Leave ``None`` at scale
      to keep the upstream parallelism: shard SIZES stay bounded either
      way, only the count becomes layout-dependent.

    Scale shape: one optional keyed exchange (``num_tasks``), one
    task-local sort (``order_col``), then a straight file write — the
    scan dominates. Nothing collects, nothing is driver-side.
    """
    if records_per_shard <= 0:
        raise ValueError("records_per_shard must be positive")
    w = df
    if num_tasks is not None:
        w = (
            w.repartition(num_tasks, split_col)
            if split_col
            else w.repartition(num_tasks)
        )
    if order_col is not None:
        sort_cols = [split_col, order_col] if split_col else [order_col]
        w = w.sortWithinPartitions(*sort_cols)
    writer = w.write.mode(mode).option("maxRecordsPerFile", records_per_shard)
    if split_col:
        writer = writer.partitionBy(split_col)
    writer.format(fmt).save(path)
