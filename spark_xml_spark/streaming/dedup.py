"""Streaming deduplication for ingest pipelines.

The batch engine's exact_dedup (operators/dedup.py) keyed-shuffles the
whole corpus; on a stream that corpus is unbounded, so streaming dedup
needs BOUNDED state. Two idiomatic shapes, both pure Structured
Streaming (no custom state code):

- ``dedup_stream``: exact content dedup with state bounded by an
  event-time watermark via ``dropDuplicatesWithinWatermark`` — a
  duplicate arriving within the watermark window of its first sighting
  is dropped; state for older keys is evicted. This is the 100 TB shape:
  state size is O(arrival rate x watermark), independent of stream
  lifetime.
- ``dedup_stream_exact``: plain ``dropDuplicates`` for availableNow /
  replay jobs where the "stream" is a finite backlog and exact global
  dedup is wanted (state grows with distinct keys — bounded by the
  backlog, NOT safe for an unbounded stream; prefer the watermarked
  form there).

Content identity is a sha2-256 over the chosen columns, matching
exact_dedup's definition, so batch and streaming dedup agree on what
"duplicate" means.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_COL = "_content_hash"

# Content-hash encoding version. The dedup state keys on this encoding, so
# a checkpoint written under one version must never be resumed under
# another (the old state entries become unmatchable and one duplicate per
# pre-restart record leaks through SILENTLY). History:
#   1: concat_ws over raw casts (NULL hashed identically to '')
#   2: per-column null-flag + coalesced value, '\x1f'-joined (collided for
#      values containing the separator)
#   3: per-column sha2 of (null-flag + value), fixed-width digests
#      concatenated — injective up to sha2 collisions (current;
#      operators.dedup._content_hash_col parity)
ENCODING_VERSION = 3
_MARKER = "_sxs_dedup_encoding"


def check_checkpoint_encoding(checkpoint_dir: str) -> None:
    """Stamp/validate the content-hash encoding version on a dedup
    checkpoint. Call before ``writeStream.start`` with this checkpoint
    (the driver queries do). First use writes the marker; a resume under
    a DIFFERENT encoding raises instead of silently leaking duplicates —
    restart with a fresh checkpoint across encoding changes."""
    import os

    from spark_xml_spark.xmlcore import fs as _fs

    marker = checkpoint_dir.rstrip("/") + "/" + _MARKER
    try:
        with _fs.open_input(marker) as fh:
            seen = fh.read().decode().strip()
    except (OSError, FileNotFoundError):
        if not _fs.is_remote(checkpoint_dir):
            os.makedirs(_fs.strip_local_scheme(checkpoint_dir), exist_ok=True)
        with _fs.open_output(marker) as fh:
            fh.write(str(ENCODING_VERSION).encode())
        return
    if seen != str(ENCODING_VERSION):
        raise ValueError(
            f"dedup checkpoint {checkpoint_dir!r} was written with content-"
            f"hash encoding v{seen}, but this build uses "
            f"v{ENCODING_VERSION}: resuming would silently stop matching "
            "pre-restart state (one leaked duplicate per old record). "
            "Start a fresh checkpoint, or run the matching build."
        )


def _with_content_hash(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    # Per-column sha2 of (isnull flag + coalesced value) so NULL and ''
    # stay distinct, then one sha2 over the fixed-width digests — no
    # separator to forge, injective up to sha2 collisions. Must match
    # operators.dedup._content_hash_col exactly (ENCODING_VERSION 3).
    parts = [
        F.sha2(
            F.concat(
                F.when(F.col(c).isNull(), F.lit("0")).otherwise(F.lit("1")),
                F.coalesce(F.col(c).cast("string"), F.lit("")),
            ),
            256,
        )
        for c in cols
    ]
    return df.withColumn(_HASH_COL, F.sha2(F.concat(*parts), 256))


def dedup_stream(
    df: DataFrame,
    cols: Sequence[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermark-bounded exact dedup on a streaming DataFrame: keeps the
    first arrival of each content hash, drops duplicates that arrive
    within ``watermark`` (event time on ``ts_col``) of it. State is
    evicted once the watermark passes — bounded memory on an unbounded
    stream. Duplicates farther apart than the watermark are NOT caught
    (that is the explicit state/completeness trade; widen the watermark
    or run a batch exact_dedup downstream for stragglers).

    Checkpoint compatibility: the dedup state keys on the content-hash
    ENCODING. Changing the encoding (as the null-flag fix did) makes
    state entries from checkpoints written by older code unmatchable, so
    one duplicate per pre-restart record can leak through immediately
    after an upgrade-and-resume. Restart clean (new checkpoint) across
    encoding changes, or accept the one-time window."""
    hashed = _with_content_hash(df, cols)
    if df.isStreaming:
        hashed = hashed.withWatermark(ts_col, watermark)
        return hashed.dropDuplicatesWithinWatermark([_HASH_COL]).drop(
            _HASH_COL
        )
    # batch parity path (tests drive both): global exact dedup
    return hashed.dropDuplicates([_HASH_COL]).drop(_HASH_COL)


def dedup_stream_exact(
    df: DataFrame, cols: Sequence[str], id_col: Optional[str] = None
) -> DataFrame:
    """Global exact dedup for finite replays (availableNow backlogs):
    ``dropDuplicates`` over the content hash — first-arrival wins in
    stream order; with ``id_col`` on a BATCH frame, the minimum id wins
    (exact_dedup parity). State grows with distinct content; use
    dedup_stream for unbounded streams."""
    hashed = _with_content_hash(df, cols)
    if not df.isStreaming and id_col is not None:
        keep = hashed.groupBy(_HASH_COL).agg(F.min(id_col).alias(id_col))
        return (
            hashed.join(keep, [_HASH_COL, id_col], "left_semi")
            .dropDuplicates([_HASH_COL])
            .drop(_HASH_COL)
        )
    return hashed.dropDuplicates([_HASH_COL]).drop(_HASH_COL)
