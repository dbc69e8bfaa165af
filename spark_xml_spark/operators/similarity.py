"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan with a JVM-side
fold (`F.aggregate`/`F.zip_with`), no shuffle except the final top-k
(`orderBy ... limit`, which Spark executes as per-partition top-k +
driver merge via TakeOrderedAndProject — no full sort at scale).

Scale path: random-hyperplane LSH bucketing — sign-bit signature against
``p`` broadcast hyperplanes, candidates = vectors sharing the signature
prefix bucket (optionally multi-probe by flipping low bits); exact cosine
re-rank only within the probed buckets. An IVF variant would swap the
hyperplane bucket for a KMeans centroid id (pyspark.ml KMeans) — same
probe/re-rank shape.
"""

from __future__ import annotations

import math
import random
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.types import to_arrow_schema


def _dot_with_literal(vec_col: Column, q: Sequence[float]) -> Column:
    """JVM-side dot product of an array column with a literal query vector:
    fold over zip_with — whole-stage codegen, no UDF, no shuffle."""
    qcol = F.array(*[F.lit(float(x)).cast("double") for x in q])
    return F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), qcol, lambda a, b: a * b),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            vec_col.cast("array<double>"),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x * x,
        )
    )


def cosine_similarity_col(vec_col: Column, q: Sequence[float]) -> Column:
    """cosine(vec, q) as a Column (double), entirely JVM-side. A
    zero-norm (all-zero) vector yields NULL rather than an ANSI
    divide-by-zero error (Spark 4 default), so dirty rows sort last in a
    top-k instead of failing the query."""
    qn = math.sqrt(sum(float(x) * float(x) for x in q)) or 1.0
    denom = F.nullif(_norm(vec_col) * F.lit(qn), F.lit(0.0))
    return _dot_with_literal(vec_col, q) / denom


def _transport_vec(col: Column, dtype: T.DataType) -> Column:
    """The vector column as fed to the Arrow matmul scorer: float32 /
    float64 element types travel AS STORED and everything else casts to
    array<double> (the pre-r16 behavior). The scorer widens to float64
    inside the worker, and every float32 widens to float64 EXACTLY, so
    scores are bit-identical either way — but casting a float32 column
    to double before the exchange doubled the Arrow bytes crossing the
    JVM->Python boundary (guide §2.3 "narrower types" / §4.1: transport
    is ~2/3 of the brute-force wall at the x2000 trend point)."""
    if isinstance(dtype, T.ArrayType) and isinstance(
        dtype.elementType, (T.FloatType, T.DoubleType)
    ):
        return col
    return col.cast("array<double>")


def brute_force_cosine_topk(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    scoring: str = "matmul",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.
    Returns (id_col, cosine) sorted desc, deterministic tie-break on id.

    Two scoring engines, the same pair ``knn_join`` exposes:

    - ``'matmul'`` (default): one (batch x dim) @ (dim x 1) numpy matmul
      per Arrow corpus batch, fused with the per-partition top-k heap
      (``_matmul_score_rows`` with Q=1) — the exact flops of the fold in
      one BLAS call instead of an interpreted JVM fold per row
      (higher-order functions skip whole-stage codegen). Emits
      partitions*k candidates into the single keyed merge; no shuffle of
      the corpus.
    - ``'fold'``: the sequential JVM ``zip_with``/``aggregate`` fold +
      TakeOrderedAndProject (per-partition heap + driver merge of k rows
      — not a global sort). Bit-exact against a sequential-sum oracle;
      use it when last-ulp reproducibility of the cosine matters more
      than throughput. numpy's blocked sums can differ from the
      sequential fold in the last ulps, so ranks may flip only across
      cosine ties tighter than ~1e-12; NaN corpus components rank last
      (NULL) under matmul but first under the fold's raw NaN ordering.
    """
    if k <= 0:
        # the matmul engine's argpartition prefilter picks the wrong
        # pivot at kk=0 and crashes executor-side; fail loudly at the
        # entry point instead (the sketch family's contract)
        raise ValueError(f"k must be positive, got {k}")
    if scoring == "matmul":
        c = df.select(
            F.col(id_col).alias("_cid"),
            _transport_vec(
                F.col(vec_col), df.schema[vec_col].dataType
            ).alias("_cv"),
        )
        scored = _matmul_score_rows(
            c,
            [(0, [float(x) for x in query])],
            T.StructField("_qid", T.IntegerType()),
            k,
        )
        return (
            _topk_merge(scored, k, "_q", id_col)
            .select(F.col(id_col), F.col("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
        )
    if scoring != "fold":
        raise ValueError(f"scoring must be 'fold' or 'matmul', got {scoring!r}")
    return (
        df.select(
            F.col(id_col),
            cosine_similarity_col(F.col(vec_col), query).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _cosine_query_cols(vec: Column, qvec: Column) -> Column:
    """cosine(vec, query) for two array columns, entirely JVM-side (same
    sequential zip_with/aggregate fold as the literal-query variant, so
    batch and single-query results agree bit-for-bit) — including the
    asymmetric zero-norm handling of cosine_similarity_col: a zero-norm
    QUERY forces its norm to 1.0 (every corpus vector scores dot/norm =
    0.0, exactly `qn or 1.0`), while a zero-norm CORPUS vector yields
    NULL and sorts last. NaN vector components produce NaN here;
    knn_join normalizes that to NULL before ranking."""
    dot = F.aggregate(
        F.zip_with(vec, qvec, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    qn = _norm(qvec)
    qn1 = F.when(qn == 0.0, F.lit(1.0)).otherwise(qn)
    return dot / F.nullif(_norm(vec) * qn1, F.lit(0.0))


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: Optional[str] = None,
    k: int = 10,
    prereduce: bool = True,
    scoring: str = "fold",
) -> DataFrame:
    """Batch k-NN join: exact cosine top-k corpus neighbors for EVERY
    vector in a query set — the many-to-many shape behind retrieval-index
    bootstrapping and cross-corpus dedup (single-query search is
    ``brute_force_cosine_topk``). Returns (q_id, id, cosine, rank), rank
    1..k per query, cosine descending, ties broken on ascending id; NULL
    cosine (zero-norm or NaN-component corpus vectors) sorts last; a
    zero-norm QUERY scores every corpus vector 0.0 (matching
    brute_force_cosine_topk); rows with a NULL query id are dropped
    (unaddressable in the output).

    Scale shape: the query side BROADCASTS (query batches are bounded —
    thousands — next to a 100 TB corpus), so scoring is a JVM zip_with
    fold inside a broadcast nested-loop join and the corpus is scanned
    ONCE with no shuffle. The fold is JVM-side but INTERPRETED
    (higher-order functions skip whole-stage codegen), so scoring does
    real per-row work — partition the corpus scan accordingly; when
    Q*dim throughput dominates and bit-exactness with
    brute_force_cosine_topk is not required, IvfIndex.knn_join's
    Arrow-matmul probe path is the faster engine. An Arrow-batched per-partition heap reduce
    (``prereduce``, memory O(#queries * k); pure SELECTION — every cosine
    is computed JVM-side and round-trips Arrow bit-exact) cuts the
    candidate stream from N*Q rows to partitions*Q*k before the single
    keyed merge, whose per-query buffer is partitions*k structs via
    sort_array+slice — no global sort, no window, no N*Q shuffle."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    q = _prep_query_side(queries, q_id_col, id_col, q_vec_col or vec_col)
    if scoring == "matmul":
        # native-width transport (float widens exactly in the worker);
        # the fold path below keeps the array<double> cast — its JVM
        # zip_with fold must run in double, not float32
        c = corpus.select(
            F.col(id_col).alias("_cid"),
            _transport_vec(
                F.col(vec_col), corpus.schema[vec_col].dataType
            ).alias("_cv"),
        )
        scored = _matmul_score_topk(c, q, k)
        return _topk_merge(scored, k, q_id_col, id_col)
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    if scoring != "fold":
        raise ValueError(f"scoring must be 'fold' or 'matmul', got {scoring!r}")
    raw = _cosine_query_cols(F.col("_cv"), F.col("_qv"))
    # NaN (from NaN vector components) -> NULL up front, so both
    # prereduce settings rank dirty rows identically (NULL sorts last)
    scored = c.crossJoin(F.broadcast(q)).select(
        "_qid",
        "_cid",
        F.when(F.isnan(raw), F.lit(None).cast("double"))
        .otherwise(raw)
        .alias("_cos"),
    )
    if prereduce:
        scored = _prereduce_topk(scored, k)
    return _topk_merge(scored, k, q_id_col, id_col)


def _matmul_score_topk(c: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """knn_join's matmul engine: collect the bounded query side (the fold
    path broadcasts it) and delegate to the shared row-list scorer."""
    qrows = q.collect()
    return _matmul_score_rows(
        c, [(r["_qid"], r["_qv"]) for r in qrows], q.schema["_qid"], k
    )


def _matmul_score_rows(
    c: DataFrame, qrows: Sequence, qid_field: T.StructField, k: int
) -> DataFrame:
    """Vectorized k-NN scoring: one (batch x dim) @ (dim x Q) numpy
    matmul per Arrow batch of the corpus, fused with the per-partition
    top-k selection in the same mapInPandas pass (memory O(Q * k) per
    task, emitting partitions*Q*k candidate rows for the keyed merge).
    ``qrows`` is the already-local (qid, qvec) list — knn_join collects
    its query DataFrame; brute_force_cosine_topk passes its literal
    query directly (Q=1), so the single-query path launches no extra
    job.

    This is knn_join's large-Q scale path: the fold path does Q
    INTERPRETED JVM folds per corpus row (higher-order functions skip
    whole-stage codegen), while BLAS does the same flops in one call —
    measured 3.7x faster at sf0.1 (Q=21, single-row-group corpus on one
    core: 0.49s vs the fold's 1.83s), without needing the fold path's
    small-input fan-out exchange, and the gap grows linearly with Q.
    The trade is float summation ORDER: numpy's blocked
    sums differ from the sequential JVM/SQL fold in the last ulps, so
    ranks can flip only across cosine ties tighter than ~1e-12 — use
    scoring='fold' when bit-exactness with brute_force_cosine_topk or a
    sequential-fold oracle is required.

    Semantics mirror the fold path exactly, INCLUDING mixed dimensions:
    queries group by their own vector length and each group scores only
    same-length corpus vectors (zip_with pads length mismatches with
    nulls, so the fold yields NULL there — as does each group here).
    Zero-norm QUERY -> every same-length finite corpus vector scores
    0.0; zero-norm / null / empty / NaN-component CORPUS vector -> NULL
    cosine (sorts last); null / empty / null-element query vector ->
    NULL against everything; ties break on ascending corpus id."""
    nq = len(qrows)
    # per-dimension query groups: dim -> (ids, dim x Qd matrix, norms)
    by_dim: dict = {}
    bad_qids = []  # null/empty/null-element queries: all-NULL output
    for qid, v in qrows:
        if v is None or len(v) == 0 or any(x is None for x in v):
            bad_qids.append(qid)
        else:
            by_dim.setdefault(len(v), []).append((qid, v))
    groups = []
    for d, members in by_dim.items():
        gmat = np.array([v for _, v in members], dtype=np.float64).T
        gnorm = np.sqrt((gmat * gmat).sum(axis=0))
        # zero-norm query scores 0.0 (dot / (cnorm * 1.0))
        groups.append(
            ([qid for qid, _ in members], d, gmat,
             np.where(gnorm == 0.0, 1.0, gnorm))
        )

    out_schema = T.StructType(
        [
            qid_field,
            c.schema["_cid"],
            T.StructField("_cos", T.DoubleType()),
        ]
    )

    def _topk_cand(col: np.ndarray, cids_d: np.ndarray,
                   nan_cids: np.ndarray, kk: int):
        """Per-query candidate pruning BEFORE the pandas bookkeeping:
        the top-k finite cosines (cosine desc, cid asc — the exact
        _pandas_topk_update / _topk_merge tie-break) plus the k
        smallest-cid NULL-cosine rows (they can only win when a
        partition holds fewer than k rankable rows, and the final merge
        breaks NULL ties on cid asc). Feeding only these 2k rows into
        _pandas_topk_update yields the identical per-partition result
        as feeding every row — everything else is discarded there."""
        finite = ~np.isnan(col)
        fi = np.nonzero(finite)[0]
        if len(fi) > kk:
            # argpartition prefilter, then an exact lexsort over the
            # value-boundary-inclusive candidate set (boundary TIES all
            # survive the prefilter, so the cid tie-break stays exact)
            vals = col[fi]
            part = np.argpartition(-vals, kk - 1)[:kk]
            boundary = vals[part].min()
            cand = np.nonzero(vals >= boundary)[0]
            # primary: cosine desc; secondary: cid asc (lexsort's last
            # key is primary)
            order = np.lexsort((cids_d[fi[cand]], -vals[cand]))
            fi = fi[cand[order[:kk]]]
        nans = np.concatenate([cids_d[np.nonzero(~finite)[0]], nan_cids])
        if len(nans) > kk:
            nans = np.partition(nans, kk - 1)[:kk]
        return fi, nans

    def _score(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        kept: Optional[pd.DataFrame] = None
        for b in batches:
            nb = b.num_rows
            if not nb:
                continue
            cids = b.column(0).to_numpy(zero_copy_only=False)
            lv = b.column(1)
            # zero-copy list extraction: lengths via compute (null rows
            # -> -1), values via flatten (valid rows concatenated in
            # row order; null ELEMENTS -> NaN on conversion) — no
            # per-row Python, the old mapInPandas path paid ~4 us/row
            # just materializing object arrays
            lens = (
                pc.list_value_length(lv)
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            flat_pa = lv.flatten()
            flat = flat_pa.to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False
            )
            starts = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(np.maximum(lens, 0), out=starts[1:])
            # pruned candidate slices accumulate as numpy triples and
            # concatenate into ONE frame per batch: a frame per
            # (query x group) would pay ~50us of pandas constructor
            # overhead per query — linear in Q on knn_join's large-Q path
            qids_acc: list = []
            cids_acc: list = []
            cos_acc: list = []
            for gids, d, gmat, gnorm1 in groups:
                rows = np.nonzero(lens == d)[0]
                if len(rows) and d:
                    ix = starts[rows, None] + np.arange(d)[None, :]
                    cmat = flat[ix]
                    # einsum: no (n x d) temporary for the norms
                    cnorm = np.sqrt(np.einsum("ij,ij->i", cmat, cmat))
                    zero = cnorm == 0.0
                    with np.errstate(invalid="ignore", divide="ignore"):
                        cos = (cmat @ gmat) / np.outer(
                            np.where(zero, 1.0, cnorm), gnorm1
                        )
                    # zero-norm corpus vector -> NULL (NaN components
                    # already propagate NaN through the matmul)
                    cos[zero, :] = np.nan
                else:
                    rows = rows[:0]
                    cos = np.zeros((0, len(gids)))
                # length-mismatched corpus rows: NULL (fold pads nulls)
                other_cids = cids[np.nonzero(lens != d)[0]]
                cids_d = cids[rows]
                for j, qid in enumerate(gids):
                    fi, nans = _topk_cand(
                        cos[:, j] if len(rows) else np.zeros(0),
                        cids_d, other_cids, k,
                    )
                    n_cand = len(fi) + len(nans)
                    if not n_cand:
                        continue
                    qids_acc.append(np.repeat([qid], n_cand))
                    cids_acc.append(np.concatenate([cids_d[fi], nans]))
                    cos_acc.append(
                        np.concatenate(
                            [
                                cos[fi, j] if len(rows) else np.zeros(0),
                                np.full(len(nans), np.nan),
                            ]
                        )
                    )
            for qid in bad_qids:
                kk = min(k, len(cids))
                small = (
                    np.partition(cids, kk - 1)[:kk] if kk else cids[:0]
                )
                if len(small):
                    qids_acc.append(np.repeat([qid], len(small)))
                    cids_acc.append(small)
                    cos_acc.append(np.full(len(small), np.nan))
            if qids_acc:
                kept = _pandas_topk_update(
                    kept,
                    pd.DataFrame(
                        {
                            "_qid": np.concatenate(qids_acc),
                            "_cid": np.concatenate(cids_acc),
                            "_cos": np.concatenate(cos_acc),
                        }
                    ),
                    k,
                )
        if kept is not None and nq:
            yield pa.RecordBatch.from_pandas(
                kept.reset_index(drop=True),
                schema=to_arrow_schema(out_schema),
                preserve_index=False,
            )

    reduced = c.mapInArrow(_score, out_schema)
    return _nan_cos_to_null(reduced)


def _make_probe_udf(cmat: np.ndarray, nprobe: int):
    """Arrow-batched IVF probe-cell selection: one (batch x dim) @
    (dim x cells) numpy matmul per batch over the BOUNDED query side —
    a per-centroid zip_with fold would be an O(cells * dim)-node codegen
    expression tree, which blows whole-stage codegen at realistic cell
    counts (the same pathology _make_sig_udf avoids for LSH signatures).
    Ranks cells by squared euclidean distance (|c|^2 - 2 q.c; the |q|^2
    term is constant per row and cannot change the order), stable
    argsort so centroid-distance ties break on the lower cell id exactly
    like search()'s stable Python sort. Dirty query rows (null vector,
    null element, wrong dimension, NaN) probe the FIRST nprobe cells
    deterministically — their cosines score NULL downstream anyway."""
    from pyspark.sql.pandas.functions import pandas_udf

    nprobe = min(nprobe, len(cmat))
    norms = (cmat * cmat).sum(axis=1)
    fallback = list(range(nprobe))

    @pandas_udf("array<int>")
    def _probe(vecs: pd.Series) -> pd.Series:
        vals = list(vecs)
        try:
            m = np.asarray(vals, dtype=np.float64)
            if (
                m.ndim == 2
                and m.shape[1] == cmat.shape[1]
                and not np.isnan(m).any()
            ):
                d2 = norms[None, :] - 2.0 * (m @ cmat.T)
                idx = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
                return pd.Series([r.tolist() for r in idx])
        except (ValueError, TypeError):
            pass
        out = []
        for v in vals:
            try:
                a = np.asarray(v, dtype=np.float64)
                if a.shape == (cmat.shape[1],) and not np.isnan(a).any():
                    d2 = norms - 2.0 * (cmat @ a)
                    out.append(
                        np.argsort(d2, kind="stable")[:nprobe].tolist()
                    )
                    continue
            except (ValueError, TypeError):
                pass
            out.append(fallback)
        return pd.Series(out)

    return _probe


def _prep_query_side(
    queries: DataFrame, q_id_col: str, id_col: str, q_vec_col: str
) -> DataFrame:
    """Shared query-side prep for both batch k-NN joins: reject a
    q_id/id name collision, DROP NULL query ids (unaddressable in the
    output, and pandas groupby would silently lose them in only the
    prereduce path), normalize to (_qid, _qv double[])."""
    if q_id_col == id_col:
        raise ValueError(
            f"q_id_col and id_col are both {id_col!r}; rename the query "
            "id column so the output can hold both"
        )
    return queries.filter(F.col(q_id_col).isNotNull()).select(
        F.col(q_id_col).alias("_qid"),
        F.col(q_vec_col).cast("array<double>").alias("_qv"),
    )


def _pandas_topk_update(
    kept: Optional[pd.DataFrame], cands: pd.DataFrame, k: int
) -> pd.DataFrame:
    """THE per-partition top-k rule, shared by the fold prereduce and the
    matmul scorer so a tie-break or NULL-ordering change can never apply
    to one path only: cosine descending, corpus id ascending, NaN/NULL
    last, k rows per query."""
    both = cands if kept is None else pd.concat((kept, cands))
    return (
        both.sort_values(
            ["_qid", "_cos", "_cid"],
            ascending=[True, False, True],
            na_position="last",
        )
        .groupby("_qid", sort=False)
        .head(k)
    )


def _nan_cos_to_null(reduced: DataFrame) -> DataFrame:
    """Arrow surfaces NaN for both real NaN cosines and pandas NULLs;
    both mean "unrankable" — fold to NULL so every scoring/prereduce
    combination returns the same NULL-cosine rows."""
    return reduced.withColumn(
        "_cos",
        F.when(F.isnan("_cos"), F.lit(None).cast("double")).otherwise(
            F.col("_cos")
        ),
    )


def _prereduce_topk(scored: DataFrame, k: int) -> DataFrame:
    """Arrow-batched per-partition top-k over a (_qid, _cid, _cos)
    candidate stream: memory O(#queries * k) per task, pure SELECTION
    (cosines round-trip Arrow bit-exact), emitting partitions*Q*k rows
    for the keyed merge instead of the full candidate set."""
    schema = scored.schema

    def _partition_topk(batches):
        kept: Optional[pd.DataFrame] = None
        for b in batches:
            kept = _pandas_topk_update(kept, b, k)
        if kept is not None:
            yield kept

    return _nan_cos_to_null(scored.mapInPandas(_partition_topk, schema))


def _topk_merge(
    scored: DataFrame, k: int, q_id_col: str, id_col: str
) -> DataFrame:
    """Final exact per-query top-k over a (_qid, _cid, _cos) candidate
    stream via ONE keyed aggregation + sort_array + slice (no window, no
    global sort); NULL cosines key as +inf so they sort last."""
    key = F.struct(
        F.when(F.col("_cos").isNull(), F.lit(float("inf")))
        .otherwise(-F.col("_cos"))
        .alias("_nc"),
        F.col("_cid").alias("_i"),
        F.col("_cos").alias("_c"),
    )
    return (
        scored.groupBy("_qid")
        .agg(F.slice(F.sort_array(F.collect_list(key)), 1, k).alias("_top"))
        .select("_qid", F.posexplode("_top").alias("_r0", "_t"))
        .select(
            F.col("_qid").alias(q_id_col),
            F.col("_t._i").alias(id_col),
            F.col("_t._c").alias("cosine"),
            (F.col("_r0") + 1).cast("long").alias("rank"),
        )
    )


def _hyperplanes(dim: int, p: int, seed: int = 42) -> List[List[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(p)]


def signature_col(vec_col: Column, planes: List[List[float]]) -> Column:
    """Random-hyperplane sign signature as a long (bit i = sign of dot with
    plane i). JVM-side only."""
    sig = F.lit(0).cast("long")
    for i, pl in enumerate(planes):
        bit = F.when(
            _dot_with_literal(vec_col, pl) >= 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        sig = sig + bit
    return sig


def _make_sig_udf(pmat: np.ndarray, weights: np.ndarray):
    """Arrow-batched signature UDF: one (batch x dim) @ (dim x planes)
    numpy matmul per batch. Dirty rows (null vector, null element, wrong
    dimension) reproduce the JVM fold expression's semantics instead of
    failing the task: a null dot made every bit 0 (signature 0), and
    zip_with truncated to the shorter length."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def _sig_udf(vecs: pd.Series) -> pd.Series:
        vals = list(vecs)
        try:
            m = np.asarray(vals, dtype=np.float64)
            if m.ndim == 2 and m.shape[1] == len(pmat) and not np.isnan(m).any():
                bits = (m @ pmat >= 0).astype(np.int64)
                return pd.Series(bits @ weights)
        except (ValueError, TypeError):
            pass
        out = np.zeros(len(vals), dtype=np.int64)
        for ix, v in enumerate(vals):
            if v is None:
                continue
            try:
                a = np.asarray(v, dtype=np.float64)
            except (ValueError, TypeError):
                continue
            if a.ndim != 1 or np.isnan(a).any():
                continue
            n = min(len(a), len(pmat))
            bits = (a[:n] @ pmat[:n] >= 0).astype(np.int64)
            out[ix] = int(bits @ weights)
        return pd.Series(out)

    return _sig_udf


def _query_signature(query: Sequence[float], pmat: np.ndarray,
                     weights: np.ndarray) -> int:
    """Query signature via the same float64 matmul the corpus side uses, so
    rounding at a near-zero dot product cannot split q from its bucket."""
    return int(
        ((np.asarray(query, dtype=np.float64) @ pmat >= 0).astype(np.int64)
         @ weights)
    )


def _probe_set(qsig: int, multiprobe: int) -> set:
    probes = {qsig}
    for b in range(multiprobe):
        probes |= {s ^ (1 << b) for s in set(probes)}
    return probes


def lsh_bucketed_topk(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    num_planes: int = 8,
    multiprobe: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket prefilter + exact cosine
    re-rank inside the probed buckets — the SINGLE-SHOT form (signatures
    computed inline over this DataFrame). For search-many steady state use
    :class:`LshIndex`, which persists the signatures partitioned by bucket
    so each probe prunes partitions at the source instead of re-scanning
    the corpus.

    ``multiprobe`` additionally probes the buckets at Hamming distance 1 on
    the lowest ``multiprobe`` signature bits (recall knob). The bucket
    filter is a literal IN-list — partition-prunable and codegen'd; the
    re-rank touches only ~N/2^p of the data.
    """
    dim = len(query)
    planes = _hyperplanes(dim, num_planes, seed)
    pmat = np.asarray(planes, dtype=np.float64).T  # dim x num_planes
    weights = 1 << np.arange(num_planes, dtype=np.int64)
    probes = _probe_set(_query_signature(query, pmat, weights), multiprobe)

    # corpus signatures: one Arrow-batched numpy matmul per batch — the
    # num_planes JVM fold expressions of signature_col are O(planes*dim)
    # interpreted ops per row and dominated this query's runtime
    sig_udf = _make_sig_udf(pmat, weights)
    # native-width transport into the Arrow signature pass (guide §2.3 /
    # §4.1): the worker widens float32 -> float64 exactly (np.asarray
    # dtype=float64), so signatures are bit-identical while a float32
    # corpus ships half the bytes across the JVM->Python boundary
    sigged = df.withColumn(
        "_sig",
        sig_udf(_transport_vec(F.col(vec_col), df.schema[vec_col].dataType)),
    )
    return (
        sigged.filter(F.col("_sig").isin(*[F.lit(s) for s in sorted(probes)]))
        .select(
            F.col(id_col),
            cosine_similarity_col(F.col(vec_col), query).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


class LshIndex:
    """Persisted random-hyperplane LSH index: corpus signatures are computed
    ONCE (one Arrow-batched matmul pass), stored ``partitionBy(_sig)``, and
    every later query probes only its multiprobe bucket set — the probe
    filter compiles to parquet partition pruning, so a search touches
    ~|probes|/2^p of the files instead of re-scanning the corpus (the
    per-query O(corpus) signature pass of single-shot lsh_bucketed_topk).

    Same build-once/search-many shape as :class:`IvfIndex`; the sidecar
    stores the hyperplanes so a query signature is computed with the exact
    float64 matmul used for the corpus.
    """

    def __init__(self, assigned: DataFrame, planes: List[List[float]],
                 vec_col: str, id_col: str):
        self.assigned = assigned  # original columns + _sig
        self.planes = planes
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def build(
        cls,
        df: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        num_planes: int = 8,
        seed: int = 42,
        dim: Optional[int] = None,
    ) -> "LshIndex":
        if dim is None:
            first = df.select(F.size(F.col(vec_col)).alias("d")).first()
            dim = int(first["d"]) if first else 0
        planes = _hyperplanes(dim, num_planes, seed)
        pmat = np.asarray(planes, dtype=np.float64).T
        weights = 1 << np.arange(num_planes, dtype=np.int64)
        sig_udf = _make_sig_udf(pmat, weights)
        # the index build is the one O(corpus) pass of the steady state
        # (search() prunes partitions): ship float32 vectors AS STORED
        # into the Arrow signature matmul — the worker's float64 widening
        # is exact, signatures bit-identical (guide §2.3 / §4.1)
        assigned = df.withColumn(
            "_sig",
            sig_udf(
                _transport_vec(F.col(vec_col), df.schema[vec_col].dataType)
            ),
        )
        return cls(assigned, planes, vec_col, id_col)

    def save(self, path: str) -> None:
        """Persist: the signed table partitioned BY SIGNATURE (probes prune
        whole partitions at the parquet source) + hyperplanes sidecar."""
        import json

        self.assigned.write.mode("overwrite").partitionBy("_sig").parquet(path)
        from spark_xml_spark.xmlcore import fs as _fs

        with _fs.open_output(path.rstrip("/") + "/_lsh_meta.json") as fh:
            fh.write(
                json.dumps(
                    {
                        "planes": self.planes,
                        "vec_col": self.vec_col,
                        "id_col": self.id_col,
                    }
                ).encode()
            )

    @classmethod
    def load(cls, spark, path: str) -> "LshIndex":
        """Reopen a saved index; `_sig` comes back as a partition column, so
        search() filters compile to partition pruning (PartitionFilters in
        the scan node)."""
        import json

        from spark_xml_spark.xmlcore import fs as _fs

        with _fs.open_input(path.rstrip("/") + "/_lsh_meta.json") as fh:
            meta = json.loads(fh.read().decode())
        assigned = spark.read.parquet(path)
        return cls(assigned, meta["planes"], meta["vec_col"], meta["id_col"])

    def search(self, query: Sequence[float], k: int = 10,
               multiprobe: int = 1) -> DataFrame:
        """Exact cosine top-k within the probed signature buckets."""
        pmat = np.asarray(self.planes, dtype=np.float64).T
        weights = 1 << np.arange(len(self.planes), dtype=np.int64)
        probes = _probe_set(
            _query_signature(query, pmat, weights), multiprobe
        )
        q = [float(x) for x in query]
        return (
            self.assigned.filter(
                F.col("_sig").isin(*[F.lit(s) for s in sorted(probes)])
            )
            .select(
                F.col(self.id_col),
                cosine_similarity_col(F.col(self.vec_col), q).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc(self.id_col))
            .limit(k)
        )


class IvfIndex:
    """IVF (inverted-file) ANN index: KMeans centroids partition the vector
    space; each vector is assigned to its nearest centroid; a query probes
    only the ``nprobe`` nearest centroid cells and re-ranks exactly inside
    them.

    Scale shape: the index build is one KMeans fit (Spark ML, shuffle-light
    Lloyd iterations) + one projection; the indexed table can be
    ``partitionBy(centroid)``-written so a probe prunes whole partitions at
    the source. The query touches ~``nprobe/k`` of the data.
    """

    def __init__(self, assigned: DataFrame, centroids, vec_col: str, id_col: str):
        self.assigned = assigned  # original columns + _centroid
        self.centroids = centroids  # list[list[float]], index = centroid id
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def build(
        cls,
        df: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        k: int = 16,
        seed: int = 42,
        fit_sample: int = 1_000_000,
    ) -> "IvfIndex":
        """Fit KMeans on a bounded sample (<= ``fit_sample`` vectors), then
        assign the FULL corpus in one broadcast-centroid pass
        (model.transform — no shuffle). Lloyd iterations over 100 TB of
        vectors for a k-centroid fit would be O(corpus x iterations); the
        sample fit keeps the build O(corpus) single-pass with statistically
        equivalent centroids (k << sample)."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
        fit_df = feats
        # one count() to size the sample fraction: on parquet sources this
        # is a row-group-metadata read (no data scan); on other sources it
        # is one extra pass, amortized by the index's save/load persistence
        n = df.count()
        if n > fit_sample:
            # slight over-sample so the materialized sample is >= fit_sample
            # with high probability; exactness is irrelevant to a KMeans fit
            fit_df = feats.sample(min(1.0, 1.1 * fit_sample / n), seed=seed)
        model = KMeans(k=k, seed=seed, featuresCol="_features", predictionCol="_centroid").fit(
            fit_df
        )
        assigned = model.transform(feats).drop("_features")
        centroids = [list(map(float, c)) for c in model.clusterCenters()]
        return cls(assigned, centroids, vec_col, id_col)

    def save(self, path: str) -> None:
        """Persist the index: the assigned table partitioned BY CENTROID
        (a probe then prunes whole partitions at the parquet source — the
        100 TB read path touches ~nprobe/k of the files) plus the centroid
        vectors as a JSON sidecar."""
        import json

        self.assigned.write.mode("overwrite").partitionBy("_centroid").parquet(
            path
        )
        from spark_xml_spark.xmlcore import fs as _fs

        with _fs.open_output(path.rstrip("/") + "/_centroids.json") as fh:
            fh.write(
                json.dumps(
                    {
                        "centroids": self.centroids,
                        "vec_col": self.vec_col,
                        "id_col": self.id_col,
                    }
                ).encode()
            )

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        """Reopen a saved index; `_centroid` comes back as a partition
        column, so search() filters compile to partition pruning."""
        import json

        from spark_xml_spark.xmlcore import fs as _fs

        with _fs.open_input(path.rstrip("/") + "/_centroids.json") as fh:
            meta = json.loads(fh.read().decode())
        assigned = spark.read.parquet(path)
        idx = cls(
            assigned, meta["centroids"], meta["vec_col"], meta["id_col"]
        )
        return idx

    @classmethod
    def append_to(cls, spark, path: str, new_df: DataFrame) -> "IvfIndex":
        """Incremental index maintenance: assign ``new_df``'s vectors to the
        SAVED index's existing centroids (one Arrow-batched matmul pass,
        the same euclidean probe rule as search/knn_join — no KMeans
        refit, no shuffle) and append them into the partitioned layout;
        new files land inside the matching ``_centroid=`` directories, so
        probes keep pruning at the source. This is the daily-ingest path:
        O(new vectors), not O(corpus). Centroids stay FIXED — they drift
        from the true cluster means as the distribution shifts, degrading
        probe recall (never correctness: re-ranking inside probed cells is
        exact); rebuild periodically when appended volume rivals the
        original corpus. Duplicate ids are the caller's concern (append
        never reads the existing data). Returns the reloaded index."""
        import json

        from spark_xml_spark.xmlcore import fs as _fs

        with _fs.open_input(path.rstrip("/") + "/_centroids.json") as fh:
            meta = json.loads(fh.read().decode())
        cmat = np.asarray(meta["centroids"], dtype=np.float64)
        probe1 = _make_probe_udf(cmat, 1)
        # daily-ingest assignment pass: native-width Arrow transport —
        # _probe widens via np.asarray(dtype=float64), exact for float32
        assigned = new_df.withColumn(
            "_centroid",
            F.element_at(
                probe1(
                    _transport_vec(
                        F.col(meta["vec_col"]),
                        new_df.schema[meta["vec_col"]].dataType,
                    )
                ),
                1,
            ),
        )
        assigned.write.mode("append").partitionBy("_centroid").parquet(path)
        return cls.load(spark, path)

    def search(self, query: Sequence[float], k: int = 10, nprobe: int = 2) -> DataFrame:
        """Exact cosine top-k within the nprobe nearest centroid cells."""
        q = [float(x) for x in query]

        def dist2(c):
            return sum((a - b) * (a - b) for a, b in zip(c, q))

        order = sorted(range(len(self.centroids)), key=lambda i: dist2(self.centroids[i]))
        probes = order[: max(1, nprobe)]
        return (
            self.assigned.filter(F.col("_centroid").isin(probes))
            .select(
                F.col(self.id_col),
                cosine_similarity_col(F.col(self.vec_col), q).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc(self.id_col))
            .limit(k)
        )

    def knn_join(
        self,
        queries: DataFrame,
        q_id_col: str = "q_id",
        q_vec_col: Optional[str] = None,
        k: int = 10,
        nprobe: int = 2,
        prereduce: bool = True,
    ) -> DataFrame:
        """Approximate batch k-NN join over the inverted file — the
        large-Q scale path next to the exact ``knn_join`` (which scores
        every query against the FULL corpus). Each query probes its
        ``nprobe`` euclidean-nearest centroid cells (the same rule as
        ``search``, evaluated as ONE Arrow-batched numpy matmul over the
        bounded query side — see _make_probe_udf); candidates come
        from a broadcast hash join of (query, cell) pairs against the
        assigned table on the PARTITION column, so a ``load()``-ed index
        prunes unprobed cells at the parquet source; the exact cosine
        re-rank and the bounded per-partition/keyed top-k are shared
        with the exact join (same fold, same NULL/NaN policy, same
        output shape (q_id, id, cosine, rank)).

        Scale: corpus rows are touched only inside probed cells
        (~nprobe/k of the data, shared across queries probing the same
        cell); the broadcast side is #queries * nprobe rows; per-task
        memory is O(#queries * k)."""
        q = _prep_query_side(
            queries, q_id_col, self.id_col, q_vec_col or self.vec_col
        )
        probe_udf = _make_probe_udf(
            np.asarray(self.centroids, dtype=np.float64), max(1, nprobe)
        )
        qc = q.select(
            "_qid", "_qv", F.explode(probe_udf(F.col("_qv"))).alias("_centroid")
        )
        raw = _cosine_query_cols(
            F.col(self.vec_col).cast("array<double>"), F.col("_qv")
        )
        scored = (
            self.assigned.join(F.broadcast(qc), "_centroid")
            .select(
                "_qid",
                F.col(self.id_col).alias("_cid"),
                F.when(F.isnan(raw), F.lit(None).cast("double"))
                .otherwise(raw)
                .alias("_cos"),
            )
        )
        if prereduce:
            scored = _prereduce_topk(scored, k)
        return _topk_merge(scored, k, q_id_col, self.id_col)


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_planes: int = 16,
    bands: int = 8,
    seed: int = 42,
    dim: Optional[int] = None,
    max_bucket: int = 200,
    observation=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs >= threshold.

    Banded hyperplane LSH (the minhash-LSH shape, adapted to cosine):
    ``bands`` independent ``num_planes``-bit sign signatures; a pair is a
    candidate iff it agrees on EVERY bit of at least one band. With
    theta = arccos(threshold), per-band collision probability is
    (1 - theta/pi)^num_planes and recall ~= 1 - (1 - p_band)^bands — at
    threshold 0.99, 16 planes x 8 bands gives ~0.995 recall while a random
    pair (cos ~ 0) collides with probability ~8/65536.

    Buckets larger than ``max_bucket`` are dropped before the self-join
    (boilerplate/zero-vector guard: one degenerate bucket must not go
    quadratic at scale), matching minhash_lsh_candidates. Exact cosine
    verify runs on candidate pairs only — never an all-pairs cross join.
    Returns (id_a, id_b, cosine).
    """
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(first["d"]) if first else 0
    planes = _hyperplanes(dim, num_planes * bands, seed)

    # bands*num_planes sign bits per vector: as JVM fold expressions this is
    # O(bands*planes*dim) scalar ops through a codegen tree that blows the
    # whole-stage limit; a single Arrow-batched numpy matmul per batch is the
    # vectorized path (one (batch x dim) @ (dim x bands*planes) product).
    from pyspark.sql.pandas.functions import pandas_udf

    pmat = np.asarray(planes, dtype=np.float64).T  # dim x (bands*planes)
    weights = (1 << np.arange(num_planes, dtype=np.int64))  # bit weights

    @pandas_udf("array<long>")
    def _band_sigs(vecs: pd.Series) -> pd.Series:
        m = np.asarray(list(vecs), dtype=np.float64)  # batch x dim
        bits = (m @ pmat >= 0).astype(np.int64)  # batch x bands*planes
        sigs = bits.reshape(len(m), bands, num_planes) @ weights  # batch x bands
        return pd.Series(list(sigs))

    # one persisted cast-vector frame feeds the signature pass AND both
    # verify sides — three corpus evaluations otherwise (same shared-
    # intermediate discipline as the shingle pipelines)
    from spark_xml_spark.operators.dedup import (
        _persist_intermediate,
        _retire_intermediates,
        capped_collect,
    )

    _retire_intermediates("cosine_pairs")
    # persist at native width (float32 halves the persisted frame and the
    # Arrow bytes into the signature matmul, guide §2.3/§4.1); the verify
    # folds below widen to double AT THE JOIN — cast(float as double) is
    # exact per element, so cosines are bit-identical to the pre-r17
    # persist-as-double layout, and _band_sigs' np.asarray(dtype=float64)
    # widening keeps signatures bit-identical too
    vecs = _persist_intermediate(
        df.select(
            F.col(id_col).alias("_vid"),
            _transport_vec(F.col(vec_col), df.schema[vec_col].dataType)
            .alias("_v"),
        ),
        "cosine_pairs",
    )
    banded = vecs.select(
        F.col("_vid").alias("_id"),
        F.posexplode(_band_sigs(F.col("_v"))).alias("_band", "_bh"),
    )
    # gather each band bucket's ids with the count-first cap (observable
    # via capped_collect, no unbounded collect buffer), pair-generate
    # locally by double explode — no self-join
    buckets = capped_collect(
        banded, ["_band", "_bh"], "_id", "_ids", max_bucket, observation
    )
    cands = (
        buckets.select("_ids", F.explode("_ids").alias("id_a"))
        .select("id_a", F.explode("_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(F.col("_va"), F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    nb = F.sqrt(
        F.aggregate(F.col("_vb"), F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    return (
        cands.join(
            vecs.select(
                F.col("_vid").alias("id_a"),
                F.col("_v").cast("array<double>").alias("_va"),
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("_vid").alias("id_b"),
                F.col("_v").cast("array<double>").alias("_vb"),
            ),
            "id_b",
        )
        .select("id_a", "id_b", (dot / (na * nb)).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def normalize_quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    norm_col: str = "norm",
    unit_col: str = "unit",
    q_col: str = "q_int8",
) -> DataFrame:
    """L2-normalize an embedding column and scalar-quantize the unit
    vector to int8 — the standard storage/transport compression for
    vector indexes (4x smaller than float32, dot products stay within
    ~1e-2 of the float value at d>=16).

    Adds ``norm_col`` (double L2 norm), ``unit_col`` (unit vector,
    NULL for zero-norm or NULL input), and ``q_col``:
    ``clamp(floor(u_i * 127 + 0.5), -127, 127)`` per component.
    floor(x + 0.5) rather than round(): half-up-toward-+inf is the one
    rounding rule every SQL engine implements identically, so quantized
    bytes match bit-for-bit across Spark / DuckDB / a C++ serving stack
    and a content hash of q is a valid cross-engine fingerprint.

    Scale shape: pure per-row codegen (aggregate / transform) over the
    cast-to-double array — no shuffle, no UDF; composes with
    partitionBy writes for an index build."""
    v = F.col(vec_col).cast("array<double>")
    norm = _norm(F.col(vec_col))
    # reference the materialized norm column in BOTH the guard and the
    # division — repeating the O(d) aggregate fold here would double the
    # per-row normalization cost on wide embeddings
    unit = F.when(
        F.col(norm_col) > 0, F.transform(v, lambda x: x / F.col(norm_col))
    )
    q = F.transform(
        F.col(unit_col),
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x * 127 + F.lit(0.5)).cast("int")),
        ),
    )
    return (
        df.withColumn(norm_col, norm)
        .withColumn(unit_col, unit)
        .withColumn(q_col, q)
    )
