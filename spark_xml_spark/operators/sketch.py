"""KMV (k-minimum-values) distinct-count sketch — the deterministic,
cross-engine-verifiable cardinality estimator (Bar-Yossef et al. 2002;
the Theta-sketch family's simplest member).

Estimator: hash every item to a uniform 60-bit integer (md5 prefix —
portable: every engine computes the identical digest), keep the k
smallest DISTINCT hashes per group; if fewer than k exist the count is
exact, else D-hat = (k-1) / R_k with R_k = the kth smallest hash
normalized to (0,1). Relative error ~ 1/sqrt(k-2).

Why this next to approx_count_distinct: Spark's HLL gives no
cross-engine reproducibility (register layouts differ), so its answers
can't be value-checked against an independent engine. KMV's sketch IS a
set of hash values — two engines that agree on md5 agree on every
intermediate and the final estimate bit-for-bit, which is what the
driver oracle checks. The k-min sets are also mergeable (union, re-take
k smallest) for partial/incremental builds.

Scale shape: one map-side-combinable DISTINCT over (group, hash), then
a per-group sort to rank hashes (row_number <= k). The sort runs over
DISTINCT hashes only — bounded by cardinality, not corpus size — and is
the price of determinism; for unverifiable-but-O(1)-memory streaming
estimation use approx_count_distinct instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_BITS = 60  # 15 hex chars: fits a BIGINT in every engine


def kmv_hash(col: Column) -> Column:
    """Uniform 60-bit integer hash of a string column, portable across
    engines: first 15 hex chars of md5, parsed base-16."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate of ``item_col``. Output:
    group_cols..., ``n_distinct`` (exact distinct-HASH count — exact up
    to md5 collisions, identically in any engine), ``n_kept``
    (min(k, n_distinct) sketch size), ``est_distinct`` (double; equals
    n_distinct exactly when the group has fewer than k distinct values).
    NULL items are ignored (a NULL observation carries no identity)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    group_cols = list(group_cols)
    clash = {"n_distinct", "n_kept", "est_distinct", "_hv", "_rn"}.intersection(
        df.columns
    )
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with kmv_distinct "
            "internals/outputs; rename them first"
        )
    hashes = (
        df.filter(F.col(item_col).isNotNull())
        .select(*group_cols, kmv_hash(F.col(item_col)).alias("_hv"))
        .distinct()
    )
    # ONE pass after the rank: max(rn) is the exact distinct count, the
    # k-bounded conditionals are the sketch — no second aggregation over
    # the hashes frame, no join (which would also silently drop a NULL
    # group key on the equi keys; groupBy keeps it observable)
    w = Window.partitionBy(*group_cols).orderBy("_hv")
    agg = (
        hashes.withColumn("_rn", F.row_number().over(w))
        .groupBy(*group_cols)
        .agg(
            F.max("_rn").cast("bigint").alias("n_distinct"),
            F.sum(F.when(F.col("_rn") <= k, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.max(F.when(F.col("_rn") <= k, F.col("_hv"))).alias("_kth"),
        )
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_distinct").cast("double")
    ).otherwise(
        # operation ORDER matters for bit-exact cross-engine agreement:
        # kth -> double (one rounding), / 2^60 (exact), then divide
        F.lit(float(k - 1))
        / (F.col("_kth").cast("double") / F.lit(float(2**_HASH_BITS)))
    )
    return agg.withColumn("est_distinct", est).drop("_kth")
