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

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# --------------------------------------------------------------------------
# Streaming NEAR-duplicate detection (SimHash within an event-time window)
# --------------------------------------------------------------------------

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("hamming", T.LongType()),
    ]
)

_BUCKET_STATE = T.StructType(
    [
        T.StructField("bhs", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("tss", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.LongType())),
    ]
)


def _make_simhash60():
    """Portable 60-bit SimHash projection (md5-prefix word hash) as an
    Arrow-batched pandas UDF, created LAZILY with a DataType returnType:
    a module-level ``@pandas_udf("long")`` breaks the streaming SOURCE
    runner, which imports this package in a session-less worker where the
    string returnType cannot be parsed (found the hard way — the xml-graft
    stream reader failed to initialize once this module gained one).

    Byte-identical to operators.dedup.simhash(portable=True) and to the
    DuckDB SQL mirror: words = distinct(regexp \\s+ split of lower(text))
    — trailing/leading empties kept, matching Spark's split(limit=-1) and
    DuckDB's regexp_split_to_array; each word hashes to the first 15 hex
    chars of md5; bit i is set iff the +1/-1 vote sum over words is
    positive. Per-row Python (not the batch explode+groupBy shape)
    because it runs as a STATELESS projection inside a stream, where a
    blocking aggregation before the stateful operator is not allowed;
    the per-word bit votes are numpy-vectorized.
    NULL text -> NULL (the batch path's explode likewise drops such docs).
    """

    def _simhash60(texts: pd.Series) -> pd.Series:
        import hashlib
        import re as _re

        import numpy as np

        shifts = np.arange(60, dtype=np.uint64)
        weights = (np.uint64(1) << shifts).astype(np.int64)
        out = []
        for text in texts:
            if text is None:
                out.append(None)
                continue
            hs = np.fromiter(
                (
                    int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
                    for w in set(_re.split(r"\s+", text.lower()))
                ),
                dtype=np.uint64,
            )
            # (W x 60) bit matrix -> +-1 votes summed per bit, vectorized
            bits = (hs[:, None] >> shifts) & np.uint64(1)
            votes = 2 * bits.astype(np.int64).sum(axis=0) - len(hs)
            out.append(int(((votes > 0) * weights).sum()))
        return pd.Series(out, dtype="object").astype("Int64")

    return F.pandas_udf(_simhash60, T.LongType())


def simhash_stream_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    window_seconds: int = 1800,
    max_hamming: int = 3,
    watermark: str = "1 hour",
    max_bucket: int = 10000,
    state_shards: int = 256,
) -> DataFrame:
    """Streaming near-dup pairs: emits (id_a, id_b, hamming) for every doc
    pair with Hamming(simhash60) <= ``max_hamming`` AND event times within
    ``window_seconds`` of each other. The streaming counterpart of
    operators.dedup.simhash_near_dup_pairs — same portable signature, same
    4x15-bit band candidates (pigeonhole: Hamming <= 3 cannot change all
    four bands), so recall is complete within the time window.

    Scale shape: state is keyed by (band, band-hash mod ``state_shards``)
    — a COARSE shard holding many exact band buckets, each kept as a
    sub-index inside the shard's state arrays. Candidate pairs still
    require EXACT band-hash equality (the LSH pruning argument is
    untouched); the sharding only amortizes the stateful-operator's
    per-group framework cost (Arrow slice + pandas construction + state
    row round-trip, measured ~8 ms per group on local[32] — at 4x15-bit
    banding the exact keying makes millions of near-empty groups, and
    the framework overhead, not the pairing, dominates). The trade is
    state-write amplification: a trigger touching one doc re-serializes
    its whole shard, ~(buckets/shards) members, not one bucket —
    bounded by the knob; ``state_shards=0`` restores exact (band, bh)
    keying for write-amplification-critical deployments. Emitted pairs
    are IDENTICAL either way (same exact-bh candidates), and so is the
    DISTINCT set (pigeonhole: hamming <= 3 over 4 bands always shares a
    band). State holds only docs newer than (watermark - window) —
    O(arrival rate x window) per shard, independent of stream lifetime;
    eviction is driven by the event-time watermark (prune on every
    invocation, EventTimeTimeout sweep for quiescent shards). Each
    EXACT bucket caps at ``max_bucket`` members (newest kept — the
    boilerplate-collapse guard shared with the batch operator; an
    over-cap bucket would otherwise pair quadratically). A pair
    colliding in several bands is emitted once per band: distinct
    (id_a, id_b) downstream — streaming
    ``dropDuplicatesWithinWatermark`` or a batch DISTINCT over the sink.

    Checkpoint note: the state row gained a ``bhs`` array when sharding
    landed — Spark's state-schema check fails loudly on a resume from a
    pre-sharding checkpoint; restart clean across this upgrade.

    ``ts_col`` must be a timestamp column with event times strictly after
    the epoch: Spark's stateful late-row filter drops rows whose event
    time does not exceed the current watermark, and the watermark floor
    is 0 — a row at exactly 1970-01-01T00:00:00 is silently discarded by
    the engine (observed empirically; synthetic-timestamp callers must
    offset their base). ``watermark`` bounds how out-of-order arrivals
    may be and therefore state size.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if int(state_shards) < 0:
        # a negative value would silently fall into the exact-keying
        # branch (the only check below is > 0), disabling sharding with
        # no signal; 0 is the documented exact-keying opt-out
        raise ValueError(
            f"state_shards must be >= 0 (0 = exact (band, bh) keying), "
            f"got {state_shards}"
        )
    win = int(window_seconds)
    band_bits, n_bands = 15, 4
    band_mask = (1 << band_bits) - 1

    sig = (
        docs.withColumn("_sig", _make_simhash60()(F.col(text_col)))
        .filter(F.col("_sig").isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.col(ts_col).alias("_ts"),
            F.col("_sig"),
        )
    )
    if sig.isStreaming:
        sig = sig.withWatermark("_ts", watermark)
    bands = sig.select(
        "_id",
        "_ts",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("_sig", band_bits * i)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("bh"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("_bb"),
    ).select(
        "_id",
        F.col("_ts").cast("long").alias("_ts_sec"),
        F.col("_ts"),
        "_sig",
        F.col("_bb.band").alias("_band"),
        F.col("_bb.bh").alias("_bh"),
    )
    shard_key = (
        F.pmod(F.col("_bh"), F.lit(int(state_shards)))
        if state_shards > 0
        else F.col("_bh")
    ).alias("_shard")
    bands = bands.withColumn("_shard", shard_key)

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # quiescent shard: watermark passed every member's pair window
            state.remove()
            return
        bhs, ids, tss, sigs = ([], [], [], [])
        if state.exists:
            bhs, ids, tss, sigs = (list(x) for x in state.get)
        # exact-bucket sub-index over the shard: bh -> LIVE member
        # positions in append order (LSH candidate pruning is untouched
        # by sharding; cap-killed members leave the list immediately)
        index: dict = {}
        for pos, bh in enumerate(bhs):
            index.setdefault(bh, []).append(pos)
        dead: set = set()
        rows = []
        out_a, out_b, out_h = [], [], []
        for pdf in pdfs:
            for did, tsec, s, bh in zip(
                pdf["_id"], pdf["_ts_sec"], pdf["_sig"], pdf["_bh"]
            ):
                rows.append((int(tsec), int(did), int(s), int(bh)))
        # arrival order within a batch is nondeterministic across runs;
        # pairing is symmetric so the emitted SET does not depend on it
        for ts, did, s, bh in sorted(rows):
            bucket = index.setdefault(bh, [])
            for pos in bucket:
                oid, ots, osig = ids[pos], tss[pos], sigs[pos]
                if oid == did or abs(ots - ts) > win:
                    continue
                ham = bin(osig ^ s).count("1")
                if ham <= max_hamming:
                    a, b = (oid, did) if oid < did else (did, oid)
                    out_a.append(a)
                    out_b.append(b)
                    out_h.append(ham)
            bucket.append(len(ids))
            bhs.append(bh)
            ids.append(did)
            tss.append(ts)
            sigs.append(s)
            if len(bucket) > max_bucket:
                # newest kept (batch cap parity), per EXACT bucket
                dead.add(bucket.pop(0))
        # evict members that can no longer pair with any future arrival
        # (future event times are >= watermark once it advances past them)
        wm_ms = state.getCurrentWatermarkMs()
        floor = wm_ms // 1000 - win if wm_ms > 0 else None
        keep = [
            p
            for p in range(len(ids))
            if p not in dead and (floor is None or tss[p] >= floor)
        ]
        if keep:
            state.update(
                (
                    [bhs[p] for p in keep],
                    [ids[p] for p in keep],
                    [tss[p] for p in keep],
                    [sigs[p] for p in keep],
                )
            )
            # sweep the shard once the watermark passes its newest member's
            # pair window (event-time ms)
            state.setTimeoutTimestamp(
                (max(tss[p] for p in keep) + win) * 1000 + 1
            )
        elif state.exists:
            state.remove()
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

    grouped = bands.select(
        "_band", "_shard", "_bh", "_id", "_ts_sec", "_ts", "_sig"
    ).groupBy("_band", "_shard")
    return grouped.applyInPandasWithState(
        fn,
        PAIR_SCHEMA,
        _BUCKET_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
