"""Document deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All-pairs comparison is never materialized at scale: candidate generation is
always an equi-join on a derived key (content hash, LSH band bucket, simhash
band), so the shuffle is keyed and bounded, and Catalyst/AQE pick the join
strategy. The exact-Jaccard verifier joins only candidate pairs.

Scale notes (100 TB):
- exact_dedup: one content-keyed shuffle; map-side partial aggregation applies.
- ngram_jaccard_pairs: the inverted-index join shuffles on prefix shingles
  only (AllPairs/PPJoin prefix filtering): ultra-frequent shingles rank
  LAST under the ascending-document-frequency order and fall out of every
  prefix, so they never key the join — exactness preserved, quadratic
  bucket blowup impossible.
- minhash_lsh_candidates: b bands of r rows; collision probability
  ~ 1-(1-s^r)^b. Bucket-size cap guards pathological buckets (boilerplate).
- simhash: 64-bit signature from JVM-side xxhash64; near-dup = small Hamming
  distance, candidates via 4x16-bit band equality (any pair within Hamming
  distance 3 shares at least one of 4 bands — pigeonhole).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def capped_collect(banded: DataFrame, key_cols: Sequence[str], id_col,
                   list_alias: str, max_bucket: int,
                   observation=None, min_bucket: int = 2) -> DataFrame:
    """Shared LSH bucket gather + guard: drop buckets smaller than
    ``min_bucket`` members (default 2 — singletons make no pairs in a
    SELF-join; a CROSS-corpus join passes 1, since a lone member can
    still pair with the other side) and buckets larger than
    ``max_bucket`` members (a viral/boilerplate bucket must not go
    quadratic at scale), then collect the surviving buckets' member
    lists.

    Order matters at 100 TB: COUNT first (map-side combinable — a hot key
    collapses before its exchange), drop over-cap keys, and only then
    ``collect_list`` over the join-back — so no aggregation buffer ever
    materializes more than ``max_bucket`` ids. The previous
    collect-then-filter shape built a viral bucket's full member list in
    ONE buffer before discarding it, which is an executor OOM at scale.

    Dropping over-cap buckets loses recall, so the loss must be
    OBSERVABLE: pass a ``pyspark.sql.Observation`` and after the first
    action it reports ``dropped_buckets`` / ``dropped_members`` (on a
    cluster the same metrics reach any QueryExecutionListener). Stays
    fully in codegen — no accumulator UDF in the hot path.

    Conf scoping: passing an observation excludes
    ``AQEPropagateEmptyRelation`` from AQE session-wide so the metrics
    node cannot be optimized away; the prior ``excludedRules`` value is
    stashed on the observation and **restored by
    ``observed_drop_metrics``** once the metrics publish. Read the
    metrics (or call ``restore_aqe_conf(observation)``) after the action,
    or the exclusion stays for the session."""
    keys = list(key_cols)
    # one explicit hash-shuffle on the bucket keys, SHARED by the counts
    # branch and the gather branch: both subplans contain the identical
    # exchange, so Spark's exchange/stage reuse materializes the banded
    # lineage once; counts then aggregates without another exchange and
    # the final groupBy inherits the partitioning (no exchange either).
    # The count is over id_col, NOT COUNT(*): counting the id keeps the id
    # column in the counts branch's scan, so Catalyst prunes BOTH branches
    # to the same (keys, id) projection and the exchanges stay canonically
    # equal — count(*) pruned the id from one branch and silently broke
    # ReuseExchange, re-evaluating the banded lineage twice (asserted by
    # test_plan_hygiene). Semantics are unchanged: collect_list skips
    # NULL ids exactly as count(id) does, so the cap compares like with
    # like even on a null-bearing id column.
    banded = banded.repartition(*keys)
    counts = banded.groupBy(*keys).agg(F.count(id_col).alias("_bsz"))
    if observation is not None:
        # AQE's runtime empty-relation propagation can replace the subtree
        # holding the CollectMetrics node when the capped result is empty
        # (exactly the all-buckets-dropped case the metric exists to
        # expose) — exclude that one AQE rule so the metrics always
        # publish; the rest of AQE stays active
        spark = banded.sparkSession
        rule = (
            "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
        )
        key = "spark.sql.adaptive.optimizer.excludedRules"
        cur = spark.conf.get(key, "")
        if not getattr(observation, "_sxs_aqe_stash", None):
            # (spark, prior value) — restored by observed_drop_metrics /
            # restore_aqe_conf after the observed action has run
            observation._sxs_aqe_stash = (spark, cur)
        if not cur:
            spark.conf.set(key, rule)
        elif rule not in cur:
            spark.conf.set(key, cur + "," + rule)
        bsz = F.col("_bsz")
        counts = counts.observe(
            observation,
            F.count(F.when(bsz > max_bucket, 1)).alias("dropped_buckets"),
            F.coalesce(
                F.sum(F.when(bsz > max_bucket, bsz.cast("long"))), F.lit(0)
            ).alias("dropped_members"),
        )
    keep = counts.filter(
        (F.col("_bsz") >= min_bucket) & (F.col("_bsz") <= max_bucket)
    ).drop("_bsz")
    return (
        banded.join(keep, keys)
        .groupBy(*keys)
        .agg(F.collect_list(id_col).alias(list_alias))
    )


def restore_aqe_conf(observation) -> None:
    """Restore ``spark.sql.adaptive.optimizer.excludedRules`` to the value
    it had before ``capped_collect`` stashed it on this observation.
    Idempotent; no-op for observations never passed to capped_collect."""
    stash = getattr(observation, "_sxs_aqe_stash", None)
    if stash is not None:
        spark, prior = stash
        key = "spark.sql.adaptive.optimizer.excludedRules"
        if prior:
            spark.conf.set(key, prior)
        else:
            spark.conf.unset(key)
        observation._sxs_aqe_stash = None


def observed_drop_metrics(observation, timeout_s: float = 60.0) -> dict:
    """Read the capped_collect drop metrics from a ``pyspark.sql.
    Observation`` after an action has run on the returned DataFrame, then
    restore the AQE ``excludedRules`` conf capped_collect scoped for the
    query (see its docstring).

    Avoids ``Observation.get`` in this PySpark build: its JVM toPyRow
    conversion asserts on the schemaless row an unpublished observation
    returns. Polls the non-blocking JVM map accessor instead."""
    import time

    try:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            metrics = dict(observation._jo.getAsJava())
            if metrics:
                return metrics
            time.sleep(0.25)
        raise TimeoutError(
            "observed metrics not published; did an action run on the "
            "observed DataFrame?"
        )
    finally:
        restore_aqe_conf(observation)


def _word_shingles(col: Column, n: int) -> Column:
    """Word n-gram shingles as an array<string> (distinct).

    Built by zipping n staggered slices of the word array rather than a
    transform-over-sequence lambda: a lambda of the form
    ``i -> slice(split(text), i+1, n)`` re-evaluates the regex split for
    EVERY position (O(words^2) per row — measured 10ms/doc), while the
    staggered-slice form evaluates split O(n) times per row."""
    words = F.split(F.lower(col), r"\s+")
    cnt = F.size(words) - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice(words, i + 1, cnt).alias(f"w{i}") for i in range(n)]
    )
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{i}"] for i in range(n)])
    )
    return F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(
            F.array(F.concat_ws(" ", words))
        )
    )


def _hashed_shingles(col: Column, n: int) -> Column:
    """xxhash64 of each word n-gram shingle, as an array<long> (distinct).
    Bijective with ``_word_shingles`` up to 64-bit collisions, so set
    operations (Jaccard, minima) over it equal the string-array versions
    while moving 8-byte longs instead of n-word strings."""
    return F.transform(_word_shingles(col, n), lambda s: F.xxhash64(s))


def _hashed_shingle_frame(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(_id, _sh: array<long>) — the shared starting point of every
    shingle-based pipeline."""
    return df.select(
        F.col(id_col).alias("_id"),
        _hashed_shingles(F.col(text_col), n).alias("_sh"),
    )


# Shingle frames are consumed by SEVERAL plan branches (doc-freq +
# prefix + both verify sides); without caching, the scan+shingle
# projection re-evaluates once per branch — measured 2.19s vs 1.19s for
# the Jaccard pipeline at sf0.1, and at 100 TB each re-evaluation is a
# full corpus read. Frames persist MEMORY_AND_DISK (spill, LRU-evictable
# — eviction only costs recompute). Retirement is SCOPED PER OPERATOR:
# each operator retires only its OWN previous call's generation, so
# building operator B never unpersists operator A's not-yet-executed
# plan (a global drain would put A's multi-consumer subtree back on the
# re-evaluate-per-branch path — the exact anti-pattern the persist
# exists to prevent). At most one generation stays cached per operator;
# a caller interleaving two calls of the SAME operator before consuming
# the first result only loses the cache, never correctness.
_INTERMEDIATES: dict = {}


def _persist_intermediate(df: DataFrame, scope: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _INTERMEDIATES.setdefault(scope, []).append(df)
    return df


def _retire_intermediates(scope: str) -> None:
    frames = _INTERMEDIATES.pop(scope, [])
    while frames:
        try:
            frames.pop().unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to release


def retire_all() -> None:
    """Release EVERY cached dedup intermediate, across all operator
    scopes. Per-operator retirement keeps at most one MEMORY_AND_DISK
    generation alive per scope — correct, but in a long session that
    runs many different dedup operators the last generation of each
    scope stays cached until that same operator runs again (ADVICE r10).
    Call this at pipeline/session boundaries, after the operators'
    result DataFrames have been fully consumed; a not-yet-executed
    result plan that referenced a cached subtree simply recomputes it
    (correctness is never at stake — only the re-evaluate-per-branch
    cost the cache avoids)."""
    for scope in list(_INTERMEDIATES):
        _retire_intermediates(scope)


def _content_hash_col(cols: Sequence[str]) -> Column:
    """sha2-256 content hash over the given columns, INJECTIVE up to
    sha2 collisions: each column hashes separately (isnull flag + value,
    so NULL and '' stay distinct) and the fixed-width 64-hex digests
    concatenate — no separator can be forged by column values (a '\\x1f'
    join collides for values containing the separator: ('a\\x1f1b','c')
    vs ('a','b\\x1f1c')). Must match streaming.dedup._with_content_hash
    (ENCODING_VERSION) exactly."""
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
    return F.sha2(F.concat(*parts), 256)


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can ORDER values of this type (min/max/sort keys):
    maps cannot be ordered anywhere in the type tree."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def exact_dedup(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    id_col: Optional[str] = None,
) -> DataFrame:
    """Exact deduplication by content equality over the chosen columns.
    Keeps one row per distinct content: the row with the minimum
    ``id_col`` when given (deterministic), else an arbitrary one
    (``dropDuplicates`` semantics).

    ONE shuffle keyed by the content columns, ONE evaluation of the
    input: with id_col the keeper's NON-key columns travel through a
    map-side-combinable minimum aggregate — ``min(id)`` when the id is
    the only carried column, ``min(struct(flag, id, rest...))`` when
    more columns ride along, and ``min_by`` only for carry columns
    whose types Spark cannot order (maps) — while the content rides as
    the group key. (The groupBy-then-semi-join formulation reads the
    input in TWO plan branches — at 100 TB that is a second full scan —
    and its keep-list join is an extra shuffle.)

    Grouping is by the RAW columns, not a content hash (r13, from the
    docs-x100 profile): the sha2-256 grouping key cost ~1 us/doc — 65%
    of the query's marginal cost at 500k docs — purely to build a key
    that was dropped afterwards, and the ``min_by(struct(*all))`` then
    re-shipped the content a second time inside the value struct. Native
    grouping removes the hash CPU, ships the content ONCE, eliminates
    any hash-collision false-merge risk, and keeps SQL GROUP BY NULL
    semantics (NULLs group together; NULL != ''), matching the engine's
    oracle exactly. Fixed-size content keys are still the right call
    where the key itself persists — streaming dedup state and
    corpus_delta artifacts keep ``_content_hash_col``."""
    cols = list(cols) if cols else [c for c in df.columns if c != id_col]
    if id_col is None:
        return df.dropDuplicates(cols)
    carry = [c for c in df.columns if c not in cols]
    if not carry:
        # every output column is a group key: groups are whole rows
        return df.distinct()
    if carry == [id_col]:
        # the id is the ONLY non-key column: plain min(id) gives the
        # keeper exactly (min ignores NULL ids; an all-NULL group yields
        # NULL — one row either way) and, unlike any struct-buffered
        # aggregate, stays inside whole-stage-codegen HashAggregate —
        # the struct path below plans as SortAggregate, which at docs
        # x100 spent more sorting each partition by the content key
        # than the whole hash aggregation costs
        return (
            df.groupBy(*cols)
            .agg(F.min(id_col).alias(id_col))
            .select(*df.columns)
        )
    # keeper = min(struct(id IS NULL, id, rest...)): non-NULL ids win
    # with the minimum id; a group whose ids are ALL NULL still keeps
    # one real row (dropDuplicates semantics). min over an orderable
    # struct instead of min_by because Spark plans min_by as a
    # SortAggregate — sorting every partition by the content key cost
    # more than the whole hash aggregation at docs x100 — while
    # min(struct) stays inside whole-stage-codegen HashAggregate.
    # Ordering NULL-flag first also avoids min_by's phantom-row trap
    # (a bare min_by(_, id) skips NULL ordering values entirely).
    by_name = {f.name: f.dataType for f in df.schema.fields}
    if all(_orderable(by_name[c]) for c in carry):
        ordered = F.struct(
            F.col(id_col).isNull().alias("_idnull"),
            F.col(id_col).alias("_id"),
            *[F.col(c).alias(c) for c in carry if c != id_col],
        )
        return (
            df.groupBy(*cols)
            .agg(F.min(ordered).alias("_row"))
            .select(*[
                F.col(c) if c in cols
                else F.col("_row").getField("_id").alias(c) if c == id_col
                else F.col("_row").getField(c).alias(c)
                for c in df.columns
            ])
        )
    # non-orderable carry types (maps): min over their struct is an
    # analysis error — min_by orders on (flag, id) only and carries the
    # values opaquely; the SortAggregate plan is the price of map-typed
    # payload columns
    return (
        df.groupBy(*cols)
        .agg(
            F.min_by(
                F.struct(*carry),
                F.struct(F.col(id_col).isNull(), F.col(id_col)),
            ).alias("_row")
        )
        .select(*[
            F.col(c) if c in cols else F.col("_row").getField(c).alias(c)
            for c in df.columns
        ])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """N-gram Jaccard similarity pairs >= threshold via prefix filtering
    (the AllPairs/PPJoin family): under a global shingle order (ascending
    document frequency, rarest first), any pair with J(A,B) >= t shares at
    least one shingle inside both prefixes of length
    |X| - ceil(t*|X|) + 1, so the inverted-index join only needs those
    prefix shingles. Hot boilerplate shingles rank last and fall OUT of
    prefixes — the quadratic-bucket blowup of a naive shingle join cannot
    happen. Exact up to 64-bit hash collisions (~2^-64 per shingle pair):
    BOTH candidate generation and the verify run on xxhash64-hashed
    shingles — 8-byte longs through every shuffle, join, and
    intersect/union instead of n-word strings (verify over longs measured
    3.0s vs 5.1s at sf0.1/t=0.5 with 310k candidate pairs). A collision
    can (astronomically rarely) drop a candidate or nudge a verified
    Jaccard across the threshold; recomputing the verify over
    _word_shingles restores the strict never-admit property at the cost
    above.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    # candidate generation runs over HASHED shingles: 8-byte longs flow
    # through the shuffles and the inverted-index join instead of ~n-word
    # strings (4x+ shuffle bytes saved at scale). array_distinct AFTER
    # hashing: an in-document hash collision must not consume a prefix
    # slot (row_number counts every row), which would shorten the distinct
    # prefix below the AllPairs bound. _sz is size() BEFORE that distinct,
    # i.e. the string-distinct size, which is >= the hashed-distinct size,
    # so the prefix length is conservative (can only add candidates).
    _retire_intermediates("ngram_jaccard_pairs")
    harr = _persist_intermediate(
        _hashed_shingle_frame(df, id_col, text_col, n),
        "ngram_jaccard_pairs",
    )
    sh = harr.select(
        "_id",
        F.size("_sh").alias("_sz"),
        F.explode(F.array_distinct("_sh")).alias("_s"),
    )
    # document frequency via groupBy + join-back, NOT Window.partitionBy(_s):
    # a window over the exploded shingles sends a hot (boilerplate) shingle's
    # entire posting list to ONE task, and AQE cannot split a window
    # partition. The groupBy collapses hot keys map-side before its
    # exchange, and the join-back on _s is a plain equi-join that AQE
    # skew-join CAN split (the freq side is one row per distinct shingle,
    # typically small enough to broadcast anyway).
    freq = sh.groupBy("_s").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_id").orderBy(F.asc("_df"), F.asc("_s"))
    prefix = _persist_intermediate(
        sh.join(freq, "_s")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_sz") - F.ceil(F.lit(threshold) * F.col("_sz")) + 1)
        .select("_id", "_s", "_sz"),
        "ngram_jaccard_pairs",
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a._s") == F.col("b._s"))
            & (F.col("a._id") < F.col("b._id"))
            # length pruning (AllPairs): J(A,B) >= t requires
            # t*|A| <= |B| and t*|B| <= |A| — evaluated inside the join
            # before the distinct, not as a post-filter
            & (F.col("b._sz") >= threshold * F.col("a._sz"))
            & (F.col("a._sz") >= threshold * F.col("b._sz")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    # verify over hashed arrays (see docstring for the collision caveat);
    # set sizes equal the string-set sizes absent collisions, so the
    # Jaccard VALUE matches the string computation bit-for-bit
    fa = harr.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    fb = harr.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    return (
        cands.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _minhash_signature(df: DataFrame, id_col: str, text_col: str, n: int, num_hashes: int) -> DataFrame:
    """-> (_id, sig array<long>): per-document MinHash signature as one
    array column (see _minhash_sig_cols for the computation and its
    measured design rationale)."""
    sig = _minhash_sig_cols(df, id_col, text_col, n, num_hashes)
    return sig.select(
        "_id", F.array(*[f"_h{i}" for i in range(num_hashes)]).alias("sig")
    )


def _minhash_sig_cols(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    _hashed: Optional[DataFrame] = None,
) -> DataFrame:
    """-> (_id, _h0.._h{num_hashes-1}): the per-document minima as agg
    columns. Shingles are hashed to longs ONCE (one string hash each);
    the num_hashes functions are JVM re-hashes of that 8-byte long inside
    one groupBy's min aggregations (Broder's one-base-hash family) —
    whole-stage codegen end to end.

    Deliberately explode+groupBy, NOT a per-row higher-order-function
    fold: HOFs (aggregate/transform/array_min) do not participate in
    whole-stage codegen, and the 64x array_min(transform) formulation
    re-measured SLOWER end-to-end (5.5s vs 4.0s at sf0.1) despite saving
    this groupBy's exchange. (Careful measuring that yourself: count()
    over a projection PRUNES the signature expressions — time the
    aggregate, which cannot be pruned.) The shuffle this groupBy implies
    is negligible by construction — explode keeps each doc's shingles
    co-located, so map-side partial aggregation collapses them to final
    (id, num_hashes longs) rows BEFORE the exchange; only ~8x num_hashes
    bytes per document cross the network at any scale."""
    base = (
        _hashed
        if _hashed is not None
        else _hashed_shingle_frame(df, id_col, text_col, n)
    )
    sh = base.select("_id", F.explode("_sh").alias("_h"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("_h"))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("_id").agg(*aggs)


def _band_frame(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(_id, _band, _bh): one row per (document, band), where _bh hashes
    the band's r signature minima. Band hashes come straight from the
    materialized agg columns — no intermediate num_hashes-array to build
    and slice per band."""
    r = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[F.col(f"_h{b * r + j}").cast("string") for j in range(r)],
                )
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("_id", F.col("bb.band").alias("_band"), F.col("bb.bh").alias("_bh"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 200,
    observation=None,
    _hashed: Optional[DataFrame] = None,
) -> DataFrame:
    """Near-duplicate *candidate* pairs via banded MinHash-LSH.

    num_hashes minhashes split into ``bands`` bands of r = num_hashes/bands
    rows; documents sharing any band bucket become a candidate pair. The
    only shuffles are the signature groupBy and the band-bucket self-join —
    never all-pairs. Buckets larger than ``max_bucket`` docs are dropped
    (boilerplate guard; at 100 TB a single viral page must not create a
    quadratic bucket).

    Returns (id_a, id_b) distinct, id_a < id_b.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    sig = _minhash_sig_cols(df, id_col, text_col, n, num_hashes, _hashed)
    banded = _band_frame(sig, num_hashes, bands)
    # gather each band bucket's ids with the count-first cap (boilerplate
    # guard, observable, no unbounded collect buffer), then pair-generate
    # locally by double explode — no self-join
    buckets = capped_collect(
        banded, ["_band", "_bh"], "_id", "_ids", max_bucket, observation
    )
    return (
        buckets.select("_ids", F.explode("_ids").alias("id_a"))
        .select("id_a", F.explode("_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    max_bucket: int = 200,
    observation=None,
) -> DataFrame:
    """LSH candidates verified with exact n-gram Jaccard — the standard
    two-stage near-dup pipeline (candidates are a tiny fraction of all
    pairs, so the verify join is cheap). The verify runs over HASHED
    shingle arrays (8-byte longs through the two joins and the
    intersect/union instead of n-word strings); Jaccard over the hashed
    sets equals the string-set value up to 64-bit collisions, well below
    the banding miss probability this operator already carries.
    Returns (id_a, id_b, jaccard)."""
    # one persisted shingle frame feeds the signature aggregation AND both
    # verify sides — without it the scan+shingle projection evaluates
    # three times (once per branch), a triple corpus read at scale
    _retire_intermediates("minhash_near_dup_pairs")
    sh = _persist_intermediate(
        _hashed_shingle_frame(df, id_col, text_col, n),
        "minhash_near_dup_pairs",
    )
    cands = minhash_lsh_candidates(
        df, id_col, text_col, n, num_hashes, bands, max_bucket, observation,
        _hashed=sh,
    )
    return _jaccard_verify(cands, sh, sh, "id_a", "id_b", threshold)


def _jaccard_verify(
    cands: DataFrame,
    sh_a: DataFrame,
    sh_b: DataFrame,
    id_a: str,
    id_b: str,
    threshold: float,
) -> DataFrame:
    """Exact hashed-shingle Jaccard verify of a candidate pair list:
    join each side's shingle frame back, intersect/union JVM-side, keep
    pairs at/over ``threshold``. Shared by the self-join and cross-corpus
    minhash verifiers (one definition of the collision-caveat semantics)."""
    a = sh_a.select(F.col("_id").alias(id_a), F.col("_sh").alias("_sha"))
    b = sh_b.select(F.col("_id").alias(id_b), F.col("_sh").alias("_shb"))
    return (
        cands.join(a, id_a)
        .join(b, id_b)
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(id_a, id_b, "jaccard")
    )


def minhash_cross_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.8,
    max_bucket: int = 200,
    observation=None,
    observation_right=None,
) -> DataFrame:
    """Cross-corpus near-duplicate JOIN (corpus A vs corpus B): banded
    MinHash-LSH candidates BETWEEN the two sides, exact hashed-shingle
    Jaccard verify. The missing shape next to the self-join family — a
    new crawl deduped against the existing corpus, or fuzzy benchmark
    decontamination where exact n-gram overlap (contamination_check) is
    too strict. Returns (id_l, id_r, jaccard >= threshold); ids are NOT
    ordered against each other (they come from different corpora and may
    collide numerically).

    Scale shape: each side computes signatures from its own persisted
    shingle frame (reused by its verify side — one scan per corpus);
    candidates come from an equi-join of the two sides' band buckets on
    (band, band-hash) after a per-side count-first cap (a hot boilerplate
    bucket on BOTH sides would otherwise cross-multiply |L|x|R|; capped
    drops are observable PER SIDE via ``observation`` (left) and
    ``observation_right`` — when passing both, read/restore the right one
    first so the stacked AQE-conf stashes unwind in inverse order). Same
    recall algebra as the self-join: miss probability
    (1 - s^r)^bands — ~1e-14 at s >= 0.8 with r=2, bands=32. Exact up to
    64-bit shingle-hash collisions, like the whole minhash family."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    _retire_intermediates("minhash_cross_pairs")
    shl = _persist_intermediate(
        _hashed_shingle_frame(left, id_col, text_col, n),
        "minhash_cross_pairs",
    )
    shr = _persist_intermediate(
        _hashed_shingle_frame(right, id_col, text_col, n),
        "minhash_cross_pairs",
    )
    bl = _band_frame(
        _minhash_sig_cols(left, id_col, text_col, n, num_hashes, shl),
        num_hashes,
        bands,
    )
    br = _band_frame(
        _minhash_sig_cols(right, id_col, text_col, n, num_hashes, shr),
        num_hashes,
        bands,
    )
    # prune each side to the bucket-key INTERSECTION before any gather:
    # with min_bucket=1 the dominant cost would otherwise be collect_list
    # over each side's (overwhelmingly singleton, non-intersecting)
    # buckets, all thrown away by the cl-cr join below. The distinct key
    # sets are map-side-combinable and tiny next to the banded rows, and
    # the drop metrics then count only buckets that could have paired.
    keys_l = bl.select("_band", "_bh").distinct()
    keys_r = br.select("_band", "_bh").distinct()
    bl = bl.join(keys_r, ["_band", "_bh"], "left_semi")
    br = br.join(keys_l, ["_band", "_bh"], "left_semi")
    cl = capped_collect(bl, ["_band", "_bh"], "_id", "_ids_l", max_bucket,
                        observation, min_bucket=1)
    cr = capped_collect(br, ["_band", "_bh"], "_id", "_ids_r", max_bucket,
                        observation_right, min_bucket=1)
    cands = (
        cl.join(cr, ["_band", "_bh"])
        .select("_ids_r", F.explode("_ids_l").alias("id_l"))
        .select("id_l", F.explode("_ids_r").alias("id_r"))
        .distinct()
    )
    return _jaccard_verify(cands, shl, shr, "id_l", "id_r", threshold)


def simhash(
    df: DataFrame, id_col: str, text_col: str, portable: bool = False
) -> DataFrame:
    """SimHash per document -> (id_col, simhash long).

    Each word hashes to ``num_bits`` bits; bit i of the signature is 1 iff
    the sum over words of (+1 if bit set else -1) is positive. Expressed
    as num_bits conditional-sum aggregations in one groupBy — stays
    entirely in whole-stage codegen; no Python, no UDF.

    Deliberately explode+groupBy, NOT a per-row higher-order-function
    fold: HOFs skip whole-stage codegen and the interpreted fold measured
    7.7s vs 1.8s end-to-end at sf0.1 (the md5 path in particular).
    Map-side partial aggregation collapses each doc's word votes before
    the exchange (explode keeps a doc's words co-located), so the shuffle
    moves only (id, num_bits partial sums) per document at any scale.

    ``portable=False`` (default, the scale path): 64 bits from JVM
    xxhash64. ``portable=True``: 60 bits from the first 15 hex chars of
    md5 — slower per word, but byte-identical reproducible in any engine
    with md5 (the DuckDB oracle recomputes it), so the whole pipeline is
    cross-engine checkable.
    """
    num_bits = 60 if portable else 64
    words = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("_w"),
    )
    if portable:
        # the shared cross-engine 60-bit md5-prefix hash — ONE definition
        # (sketch.kmv_hash) so the DuckDB oracle mirrors can't drift
        from spark_xml_spark.operators.sketch import kmv_hash

        words = words.withColumn("_h", kmv_hash(F.col("_w")))
    else:
        words = words.withColumn("_h", F.xxhash64("_w"))
    aggs = [
        F.sum(
            F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(num_bits)
    ]
    bits = words.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(num_bits):
        sig = sig + F.when(
            F.col(f"_b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return bits.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket: int = 200,
    portable: bool = False,
    observation=None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Candidates via 4-band equality on the signature quarters (pigeonhole:
    Hamming <= 3 implies at least one of 4 bands identical), then exact
    popcount verify on the candidate pairs only. Band buckets larger than
    ``max_bucket`` docs are dropped before the self-join (same guard as
    minhash_lsh_candidates: boilerplate/empty-doc signatures collapse to
    one bucket, which must not go quadratic at scale).
    Returns (id_a, id_b, hamming).
    """
    band_bits = 15 if portable else 16
    band_mask = (1 << band_bits) - 1
    sig = simhash(df, id_col, text_col, portable=portable)
    # `simhash` here is an attribute out of an aggregation barrier, so the
    # repeated references below are cheap column reads, not expression
    # copies
    bands = sig.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", band_bits * i)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("bh"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("_id", "simhash", F.col("bb.band").alias("_band"), F.col("bb.bh").alias("_bh"))
    # bucket members (id + signature payload) gathered per band bucket
    # with the count-first cap (observable, no unbounded collect buffer),
    # pairs generated locally — no self-join
    buckets = capped_collect(
        bands, ["_band", "_bh"], F.struct("_id", "simhash"), "_ms",
        max_bucket, observation
    )
    cands = (
        buckets.select("_ms", F.explode("_ms").alias("a"))
        .select("a", F.explode("_ms").alias("b"))
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("_sa"),
            F.col("b.simhash").alias("_sb"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination — the training-data hygiene operator:
    fraction of each corpus document's DISTINCT word n-grams that appear
    anywhere in the benchmark set; documents at/over ``threshold`` are
    flagged for removal. Returns (id, n_shingles, n_contaminated,
    contamination) for flagged docs.

    Scale shape: the benchmark's distinct shingle set is tiny next to a
    100 TB corpus (eval suites are thousands of docs), so it BROADCASTS —
    the corpus side is one explode + broadcast-hash semi join + keyed
    count, no shuffle of corpus shingles, no all-pairs anything. Same
    shingle definition as the Jaccard/minhash family (_word_shingles:
    lowercase, \\s+ split, distinct n-grams, whole-text fallback)."""
    # ONE shingle computation per corpus doc (the dominant per-doc cost):
    # the shingle expression must sit INSIDE the explode — given a
    # pre-projected array column, InferFiltersFromGenerate adds a
    # size(arr)>0 guard that predicate pushdown then inlines BELOW the
    # fan-out exchange, re-evaluating the whole shingle expression per
    # doc a second time (the rule skips non-attribute generator
    # children, so inlining avoids it; verified in the r17 plan diff).
    # n_shingles is recovered as count(*) per doc — explode emits
    # exactly size(arr) rows and the broadcast-left-join probe matches
    # each row at most once (bs is distinct), so no size() projection
    # (which would force the array column back out of the explode) is
    # needed. Hits counted via the LEFT broadcast join so zero-hit docs
    # survive into the same keyed aggregation — no second corpus scan
    # and no totals-vs-hits shuffle join.
    ex = corpus.select(
        F.col(id_col).alias("_cid"),
        F.explode(_word_shingles(F.col(text_col), n)).alias("_s"),
    )
    bs = (
        benchmark.select(
            F.explode(_word_shingles(F.col(text_col), n)).alias("_s")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        ex.join(F.broadcast(bs), "_s", "left")
        .groupBy("_cid")
        .agg(
            F.count("*").cast("int").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
        .select(
            F.col("_cid").alias(id_col),
            "n_shingles",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_shingles")).alias(
                "contamination"
            ),
        )
        .filter(F.col("contamination") >= threshold)
    )


def corpus_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Snapshot diff for incremental corpus builds: classify every id as
    'added' (only in new), 'removed' (only in old), 'changed' (both, but
    content hash differs), or 'unchanged'. The re-crawl/re-ingest
    accounting stage: downstream incremental pipelines process only
    added+changed. Content identity is the sha2-256 hash of ``cols``
    (default: all shared non-id columns, in new's column order) with the
    same NULL-vs-'' encoding as exact_dedup and the streaming dedup.

    Scale shape: hashes are computed scan-side (map-only projection, so
    each snapshot scan moves only id + 32-byte hash — never content
    bytes); the classification is ONE full-outer shuffle join on the id,
    AQE-splittable. Assumes ids are unique per snapshot (a full-outer
    join over duplicated ids would cross-multiply them) — run exact_dedup
    upstream if they are not."""
    if cols is None:
        shared = [c for c in new.columns if c != id_col and c in old.columns]
        if not shared:
            raise ValueError("old and new share no non-id columns to hash")
        cols = shared
    o = old.select(
        F.col(id_col).alias("_id"), _content_hash_col(cols).alias("_ho")
    )
    n = new.select(
        F.col(id_col).alias("_id"), _content_hash_col(cols).alias("_hn")
    )
    status = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "_id", "full_outer").select(
        F.col("_id").alias(id_col), status.alias("status")
    )


def substring_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 7,
    min_fraction: float = 0.0,
) -> DataFrame:
    """Exact-substring duplication accounting (the span-level dedup signal
    of Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): for each document, the number and fraction of its tokens
    covered by k-token windows whose exact text occurs at >= 2 positions
    anywhere in the corpus — in another document or repeated within the
    same one. Returns (id, n_tokens, dup_tokens, dup_fraction) for
    documents with at least one duplicated window and
    ``dup_fraction >= min_fraction``; documents shorter than k tokens
    have no window and never appear.

    Distinct from the set-level family (Jaccard/minhash/simhash): those
    score whole-document similarity over DISTINCT shingles; this one is
    positional — it localizes verbatim reuse and prices it in tokens, the
    quantity a training-data pipeline actually removes.

    Scale shape: positional k-gram HASHES (xxhash64, 8-byte longs — up to
    64-bit collisions, same stance as the minhash/Jaccard family) explode
    once from a persisted gram frame; duplicated grams come from one
    map-side-combinable ``count >= 2`` aggregation; the join back is an
    INNER join on the hash against the DISTINCT duplicated-gram set
    (row-preserving — the right side is unique per hash by construction,
    so inner == left-semi row-for-row; no pair blowup, and hot
    boilerplate grams are AQE-splittable skew, not a cross product;
    measured constraint and the shape that satisfies it pinned by
    test_skew_matrix.test_substring_dup_join_back_is_aqe_skew_splittable);
    span
    coverage is a per-document fold over the sorted position list (no
    window function, one keyed aggregation; the collected list is bounded
    by the document's own token count). Nothing is all-pairs and no
    buffer exceeds one document's positions."""
    _retire_intermediates("substring_dup_spans")
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    cnt = F.size(words) - (k - 1)
    zipped = F.arrays_zip(
        *[F.slice(words, i + 1, cnt).alias(f"w{i}") for i in range(k)]
    )
    grams = F.transform(
        zipped,
        lambda s: F.xxhash64(F.concat_ws(" ", *[s[f"w{i}"] for i in range(k)])),
    )
    g = _persist_intermediate(
        df.select(
            F.col(id_col).alias("_id"),
            F.size(words).cast("long").alias("_nt"),
            F.when(F.size(words) >= k, grams)
            .otherwise(F.array().cast("array<bigint>"))
            .alias("_g"),
        ),
        "substring_dup_spans",
    )
    # grams hashed ONCE into the persisted frame; the two consumers below
    # (frequency count + position join-back) each re-explode it, which is
    # cheap next to re-reading and re-hashing the corpus
    e = g.select("_id", "_nt", F.posexplode("_g").alias("_pos", "_gh"))
    # the second grouping key is FUNCTIONALLY DEPENDENT on _gh (so counts
    # are still exact per-gram totals, and the map-side partial_count
    # still collapses a hot gram to one row per task before the
    # exchange); its only purpose is to keep the aggregate's exchange
    # from satisfying the join's hash(_gh) requirement, forcing an
    # ENSURE_REQUIREMENTS exchange of the (small) dup-gram set above the
    # agg. AQE's OptimizeSkewedJoin can only split a join whose inputs
    # are BARE ENSURE_REQUIREMENTS shuffle stages — with the agg inside
    # the right-hand stage (the default plan), the viral-gram skew on
    # the LEFT side is structurally unsplittable (measured on this Spark
    # build; pinned by test_skew_matrix)
    dupg = (
        e.groupBy("_gh", F.pmod("_gh", F.lit(64)).alias("_ds"))
        .count()
        .filter(F.col("count") >= 2)
        .select("_gh")
    )
    # fold over the sorted duplicated positions: each window [p, p+k-1]
    # contributes min(k, p - previous_p) new tokens (windows are fixed
    # length, so interval ends are monotone once starts are sorted)
    init = F.struct(
        F.lit(0).cast("long").alias("cov"),
        F.lit(-k).cast("long").alias("prev"),
    )
    # INNER, not LEFT SEMI: dupg is unique on _gh (groupBy output), so
    # the join is row-preserving either way; inner is the join type
    # OptimizeSkewedJoin supports most broadly, and a viral boilerplate
    # gram makes this exactly the join that needs the split
    folded = (
        e.join(dupg, "_gh", "inner")
        .groupBy("_id")
        .agg(
            F.first("_nt").alias("n_tokens"),
            F.collect_list("_pos").alias("_ps"),
        )
        .select(
            "_id",
            "n_tokens",
            F.aggregate(
                F.sort_array("_ps"),
                init,
                lambda acc, p: F.struct(
                    (
                        acc["cov"]
                        + F.least(
                            F.lit(k).cast("long"),
                            p.cast("long") - acc["prev"],
                        )
                    ).alias("cov"),
                    p.cast("long").alias("prev"),
                ),
            )["cov"].alias("dup_tokens"),
        )
    )
    return (
        folded.select(
            F.col("_id").alias(id_col),
            "n_tokens",
            "dup_tokens",
            (F.col("dup_tokens") / F.col("n_tokens")).alias("dup_fraction"),
        )
        .filter(F.col("dup_fraction") >= min_fraction)
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    out_id: str = "id",
    out_comp: str = "component",
) -> DataFrame:
    """Connected components over an undirected near-duplicate pair list:
    min-id label propagation. Returns (id, component) for every id that
    appears in ``pairs``; component = the minimum id reachable, i.e. the
    cluster's canonical representative — the principled version of
    pair-based removal (a transitive dup chain a~b~c collapses to ONE
    keeper even when (a,c) was never emitted as a pair).

    Scale shape: each iteration is one keyed join + map-side-combinable
    min-aggregation over the edge list — no adjacency materialization, no
    driver-side graph. Iterations needed = component diameter; near-dup
    graphs are star/clique-shaped (dups link through a common doc), so
    2-4 passes converge. Each iteration's labels are localCheckpoint-ed:
    persist() alone caches DATA but the logical plan still nests one level
    per iteration and the optimizer blows up exponentially (observed OOM
    at ~12 iterations) — checkpointing truncates the lineage, the standard
    discipline for iterative Spark. (On a cluster with executor loss,
    swap localCheckpoint for reliable checkpoint() with a checkpoint dir.)
    Non-convergence within ``max_iterations`` raises rather than returning
    silently-partial clusters."""
    # both orientations via one explode, NOT union(pairs, pairs.swapped):
    # union branches do not share subplans, so a union would evaluate the
    # (possibly expensive — e.g. a full Jaccard-verify pipeline) ``pairs``
    # plan twice in the materializing job
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    # fused first pass: with comp initialized to id, iteration 1's
    # neighbor-min is exactly min(id, min(dst)) — one aggregation over the
    # edge list, no join, no separate init checkpoint
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_m"))
        .select("id", F.least(F.col("id"), F.col("_m")).alias("comp"))
        .localCheckpoint(eager=True)
    )
    try:
        for it in range(1, max_iterations):
            nbr = edges.join(labels, edges.dst == labels.id).select(
                F.col("src").alias("id"),
                F.col("comp"),
                F.lit(False).alias("_old"),
            )
            # the convergence probe rides the propagate aggregation
            # itself (r17): labels carries exactly one _old=true row per
            # id into the union, so min(when(_old, comp)) recovers the
            # previous label inside the SAME min-aggregation and
            # "_chg = new < prev" (labels only ever DECREASE under
            # min-propagation) marks changed ids — the old per-iteration
            # O(V) probe join against the previous labels frame becomes
            # a local scan of the frame the checkpoint just materialized
            new_full = (
                labels.select(
                    "id", "comp", F.lit(True).alias("_old")
                )
                .union(nbr)
                .groupBy("id")
                .agg(
                    F.min("comp").alias("comp"),
                    F.min(F.when(F.col("_old"), F.col("comp"))).alias(
                        "_prev"
                    ),
                )
                .withColumn("_chg", F.col("comp") < F.col("_prev"))
                .localCheckpoint(eager=True)  # truncate iteration lineage
            )
            # pass 1 is fused into the label init above, so every loop
            # pass probes convergence (star/clique-shaped near-dup graphs
            # usually converge at the fused pass and exit here first)
            changed = new_full.filter(F.col("_chg")).limit(1).count()
            labels = new_full.select("id", "comp")
            if changed == 0:
                edges.unpersist()
                return labels.select(
                    F.col("id").alias(out_id), F.col("comp").alias(out_comp)
                )
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter exceeds the cap); raise "
            "max_iterations"
        )
    except Exception:
        edges.unpersist()
        raise
    # note: the converged labels frame stays locally checkpointed — the
    # returned DataFrame reads from it; blocks free when the RDD is GC'd
