"""Data-quality constraint validation for corpus pipelines.

``validate_corpus`` evaluates a declarative rule list (completeness,
uniqueness, bounds, set/regex compliance — the deequ/Great-Expectations
shape) over a DataFrame in ONE aggregation pass and returns a long-format
report: one row per (group, rule) with the observed metric and a pass
flag.

Scale shape: every rule compiles to conditional aggregate expressions
inside a single ``groupBy(...).agg(...)`` — map-side combinable, one
shuffle, output O(groups x rules) regardless of corpus size. ``unique``
rules add a count-distinct (Spark plans the standard two-phase distinct
aggregation); everything else is a plain sum/count/min/max. The per-rule
report rows are produced by exploding an array of structs AFTER the
aggregation, so the explode runs over O(groups) rows, not the corpus.

Metric arithmetic is chosen to be exactly reproducible across engines
(the driver hash-compares values against a DuckDB oracle): fractions are
integer-count sums divided once at the end, and means are sum/count of
integral columns — no order-dependent floating summation.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A rule is a tuple whose head selects the kind:
#   ("not_null", col, min_fraction)        fraction of non-null rows
#   ("unique", col)                        count(distinct col)/count(col);
#                                          vacuously 1.0 with no non-nulls
#   ("min", col, bound)                    min(col) >= bound
#   ("max", col, bound)                    max(col) <= bound
#   ("in_set", col, values, min_fraction)  fraction of rows with col in set
#                                          (NULL counts as out-of-set)
#   ("matches", col, regex, min_fraction)  fraction matching an (anchor it
#                                          yourself) regex; portable subset
#                                          of RE2 / java.util.regex only
#   ("mean_min", col, bound)               avg(col) >= bound
#   ("mean_max", col, bound)               avg(col) <= bound
#   ("fraction", label, predicate_sql, min_fraction)
#                                          fraction of rows satisfying an
#                                          arbitrary boolean SQL predicate
#                                          (NULL predicate counts as not
#                                          satisfied); label names the rule
#   ("count_min", n)                       group has >= n rows
#   ("count_max", n)                       group has <= n rows
Rule = Tuple


def _compile_rule(rule: Rule, i: int):
    """Returns (label, column_name, agg_exprs, metric_fn, passed_fn,
    threshold) where agg_exprs are aliased aggregate Columns and
    metric_fn/passed_fn map the post-aggregation row to the metric / pass
    flag."""
    kind = rule[0]
    a = f"_m{i}"
    if kind in ("count_min", "count_max"):
        bound = float(rule[1])
        cmp_ok = (
            (lambda m: F.coalesce(m >= F.lit(bound), F.lit(False)))
            if kind == "count_min"
            else (lambda m: F.coalesce(m <= F.lit(bound), F.lit(False)))
        )
        return (
            f"{kind}{'>=' if kind == 'count_min' else '<='}{bound}",
            "*",
            [F.count(F.lit(1)).alias(a)],
            # an expected-but-absent group joins in with a NULL count;
            # it HAS zero rows, so the count metric is 0 (count_min
            # fails, count_max passes vacuously)
            lambda r: F.coalesce(r[a], F.lit(0)),
            cmp_ok,
            bound,
        )
    col = rule[1]

    def frac(pred: Column) -> List[Column]:
        return [
            F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))).alias(a),
            F.count(F.lit(1)).alias(a + "n"),
        ]

    if kind == "not_null":
        thr = float(rule[2])
        return (
            f"not_null({col})>={thr}",
            col,
            frac(F.col(col).isNotNull()),
            lambda r: r[a].cast("double") / r[a + "n"],
            # empty frame -> metric NULL (0/0); an unmeasurable fraction
            # rule FAILS (zero admitted rows must not pass a gate)
            lambda m: F.coalesce(m >= F.lit(thr), F.lit(False)),
            thr,
        )
    if kind == "unique":
        return (
            f"unique({col})",
            col,
            [
                F.countDistinct(F.col(col)).alias(a),
                F.count(F.col(col)).alias(a + "n"),
            ],
            # no non-null values (incl. an expected-but-absent group,
            # whose aggregates are NULL) -> vacuously unique, like deequ
            lambda r: F.when(
                (r[a + "n"] == 0) | r[a + "n"].isNull(), F.lit(1.0)
            ).otherwise(r[a].cast("double") / r[a + "n"]),
            lambda m: F.coalesce(m >= F.lit(1.0), F.lit(False)),
            1.0,
        )
    if kind == "min":
        bound = float(rule[2])
        return (
            f"min({col})>={bound}",
            col,
            [F.min(F.col(col)).cast("double").alias(a)],
            lambda r: r[a],
            lambda m: F.coalesce(m >= F.lit(bound), F.lit(False)),
            bound,
        )
    if kind == "max":
        bound = float(rule[2])
        return (
            f"max({col})<={bound}",
            col,
            [F.max(F.col(col)).cast("double").alias(a)],
            lambda r: r[a],
            lambda m: F.coalesce(m <= F.lit(bound), F.lit(False)),
            bound,
        )
    if kind == "in_set":
        values, thr = list(rule[2]), float(rule[3])
        return (
            f"in_set({col})>={thr}",
            col,
            frac(F.col(col).isin(*values)),
            lambda r: r[a].cast("double") / r[a + "n"],
            lambda m: F.coalesce(m >= F.lit(thr), F.lit(False)),
            thr,
        )
    if kind == "matches":
        regex, thr = rule[2], float(rule[3])
        return (
            f"matches({col})>={thr}",
            col,
            frac(F.col(col).rlike(regex)),
            lambda r: r[a].cast("double") / r[a + "n"],
            lambda m: F.coalesce(m >= F.lit(thr), F.lit(False)),
            thr,
        )
    if kind == "fraction":
        # rule = ("fraction", label, predicate_sql, min_fraction): the
        # escape hatch for constraints the fixed kinds can't express;
        # the predicate is any boolean SQL expression over the row
        pred_sql, thr = rule[2], float(rule[3])
        return (
            f"fraction({col})>={thr}",
            col,
            frac(F.expr(pred_sql)),
            lambda r: r[a].cast("double") / r[a + "n"],
            lambda m: F.coalesce(m >= F.lit(thr), F.lit(False)),
            thr,
        )
    if kind in ("mean_min", "mean_max"):
        bound = float(rule[2])
        cmp_ok = (lambda m: F.coalesce(m >= F.lit(bound), F.lit(False))) if (
            kind == "mean_min"
        ) else (lambda m: F.coalesce(m <= F.lit(bound), F.lit(False)))
        return (
            f"{kind}({col}){'>=' if kind == 'mean_min' else '<='}{bound}",
            col,
            [
                F.sum(F.col(col)).alias(a),
                F.count(F.col(col)).alias(a + "n"),
            ],
            # sum/count of an integral column: exact, engine-portable
            # (avg() over doubles would be summation-order-dependent)
            lambda r: r[a].cast("double") / F.nullif(r[a + "n"], F.lit(0)),
            cmp_ok,
            bound,
        )
    raise ValueError(f"unknown rule kind: {kind!r}")


def validate_corpus(
    df: DataFrame,
    rules: Sequence[Rule],
    group_by: Optional[Sequence[str]] = None,
    expected_groups: Optional[Sequence] = None,
) -> DataFrame:
    """Evaluate ``rules`` over ``df`` (optionally per ``group_by`` group) in
    one aggregation pass. Output columns: ``group_by...``, ``rule`` (label
    string), ``col_name``, ``threshold``, ``metric`` (double, NULL when the
    group has no values to measure), ``passed`` (boolean, never NULL —
    an unmeasurable bound rule fails).

    A group ABSENT from ``df`` produces no aggregation row, so by default
    it produces no report rows either — a count_min floor cannot flag a
    source whose ingest yielded zero rows. Pass ``expected_groups`` (a
    list of group values, or tuples for composite keys) to pin the group
    universe: expected-but-absent groups then report with NULL metrics
    and FAILING bound/fraction rules (``unique`` stays vacuously true);
    observed-but-unexpected groups still report normally (the union, not
    the intersection — a rogue source must not vanish behind a stale
    universe list).

    No counterpart in the reference (spark-xml is I/O only); this is the
    corpus-admission gate a training pipeline runs before spending compute
    downstream of ingest.
    """
    if not rules:
        raise ValueError("validate_corpus needs at least one rule")
    if expected_groups is not None and not group_by:
        raise ValueError("expected_groups requires group_by")
    compiled = [_compile_rule(r, i) for i, r in enumerate(rules)]
    group_by = list(group_by or [])
    report_cols = {"rule", "col_name", "threshold", "metric", "passed"}
    clash = report_cols.intersection(group_by)
    clash.update(g for g in group_by if re.fullmatch(r"_m\d+n?", g))
    if clash:
        raise ValueError(
            f"group_by columns {sorted(clash)} collide with the report's "
            "output columns (rule/col_name/threshold/metric/passed) or "
            "the internal _m<i>/_m<i>n aggregate aliases; rename them first"
        )

    aggs: List[Column] = []
    for _, _, agg_exprs, _, _, _ in compiled:
        aggs.extend(agg_exprs)
    agg = (df.groupBy(*group_by) if group_by else df.groupBy()).agg(*aggs)
    if expected_groups is not None:
        rows = [
            tuple(v) if isinstance(v, (tuple, list)) else (v,)
            for v in expected_groups
        ]
        universe = df.sparkSession.createDataFrame(
            rows, df.select(*group_by).schema
        ).dropDuplicates()
        # FULL outer: expected-but-absent groups surface with all-NULL
        # aggregates (their report rows fail the bound/fraction rules),
        # and observed-but-UNEXPECTED groups still report — a rogue
        # source must not vanish from the gate just because the universe
        # list is stale. O(groups) x O(groups), broadcast-sized.
        # NULL-SAFE equality: a NULL group value in the universe must
        # match an observed NULL group — plain equality would emit two
        # contradictory rows for the same group (one observed, one
        # all-NULL 'absent' failing row); keys coalesce afterward.
        cond = F.lit(True)
        for c in group_by:
            cond = cond & universe[c].eqNullSafe(agg[c])
        joined = universe.join(F.broadcast(agg), cond, "full")
        agg = joined.select(
            *[
                F.coalesce(universe[c], agg[c]).alias(c)
                for c in group_by
            ],
            *[agg[c] for c in agg.columns if c not in group_by],
        )

    row = _RowProxy(agg)
    structs = []
    for label, col, _, metric_fn, passed_fn, thr in compiled:
        metric = metric_fn(row).cast("double")
        structs.append(
            F.struct(
                F.lit(label).alias("rule"),
                F.lit(col).alias("col_name"),
                F.lit(float(thr)).alias("threshold"),
                metric.alias("metric"),
                passed_fn(metric).alias("passed"),
            )
        )
    out = agg.select(
        *group_by, F.explode(F.array(*structs)).alias("_report")
    )
    return out.select(*group_by, "_report.*")


class _RowProxy:
    """Lets metric_fn address the aggregated frame's columns by alias via
    item access (r["_m0"]), keeping the rule compiler free of the frame."""

    def __init__(self, df: DataFrame):
        self._df = df

    def __getitem__(self, name: str) -> Column:
        return self._df[name]
