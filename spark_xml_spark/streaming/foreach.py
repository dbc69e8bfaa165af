"""Exactly-once helpers for foreachBatch sinks.

Structured Streaming guarantees foreachBatch sees each batch_id at least
ONCE, not exactly once: after a crash between the user function and the
commit, the batch REPLAYS with the same batch_id. A naive
``df.write.mode("append")`` therefore duplicates the replayed batch's
rows. The canonical fix (Spark's own foreachBatch guidance) is an
idempotent write keyed on batch_id — each batch overwrites its own
deterministic location, so a replay converges instead of duplicating.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def idempotent_parquet_writer(out_dir: str):
    """Returns a ``foreachBatch`` function that writes each micro-batch to
    ``out_dir/b<batch_id>/`` with mode=overwrite — a crash-replayed batch
    overwrites its own directory rather than appending a duplicate copy.
    Directory names deliberately avoid '=' so readers do not mistake them
    for Hive partition columns."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"b{batch_id}")
        )

    return _write


def read_batches(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read everything an idempotent_parquet_writer sink produced (the
    union of all b<batch_id>/ directories)."""
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(out_dir)
    )
