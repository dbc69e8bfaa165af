"""Skew fixture matrix (VERDICT r14 task 5): the 100 TB contracts lean on
caps, shards, and AQE skew handling whose other tests run on uniform
corpora. Every test here runs against an ACTUALLY-SKEWED fixture — a
viral boilerplate string at 20-30 % frequency, a hot group, a hot
stream bucket — and asserts the three cap/shard mechanisms do what the
contracts claim:

- ``capped_collect`` (operators/dedup.py): aggregation buffers stay
  bounded (no emitted bucket exceeds ``max_bucket``), the drop metrics
  fire and count the viral bucket exactly, and the emitted pair set is
  bit-identical to the uncapped run on everything the cap did not drop;
- ``simhash_stream_pairs`` state shards (streaming/dedup.py): exact and
  sharded keying emit bit-identical pair sets under a viral in-window
  bucket with the per-bucket cap firing;
- the mergeable sketches (operators/sketch.py): per-group state stays
  O(depth x width) / O(k) however hot the group, and hot-item estimates
  remain correct;
- the substring-dedup gram join-back: AQE's OptimizeSkewedJoin SPLITS
  the viral-gram partition. Engine constraint measured on this Spark
  build (4.1.2) and pinned here: the rule only fires when the join's
  inputs are bare ENSURE_REQUIREMENTS shuffle stages; an aggregate
  riding inside an input stage blocks the split structurally (its rows
  are not re-readable shuffle output, so the matching partitions cannot
  be duplicated) — which is why substring_dup_spans joins INNER against
  a distinct dup-gram set built with a functionally-dependent composite
  grouping key (forcing the join's own exchange above the agg).
"""

import pytest
from pyspark.sql import functions as F

VIRAL = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
         "eiusmod tempor incididunt ut labore et dolore magna aliqua")


def _viral_docs(spark, n_total=120, viral_every=4):
    """~25 % of docs are byte-identical boilerplate (doc_id % viral_every
    == 0); the rest are unique word soup, except two planted near-dup
    pairs (2001/2002 and 2003/2004) that the cap must NOT disturb."""
    rows = []
    for i in range(n_total):
        if i % viral_every == 0:
            rows.append((i, VIRAL))
        else:
            rows.append((i, " ".join(f"u{i}token{j}" for j in range(30))))
    near_a = " ".join(f"shared{j}" for j in range(40))
    rows += [
        (2001, near_a),
        (2002, near_a + " tailword"),
        (2003, "alpha " + near_a),
        (2004, "alpha " + near_a + " omega"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def skew_conf(spark):
    """Force AQE skew detection at toy sizes; restore after the test."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_substring_dup_join_back_is_aqe_skew_splittable(skew_conf):
    """One 7-token boilerplate repeated across 30k docs concentrates a
    single gram hash in one shuffle partition; under forced thresholds
    the executed plan must show the skew split (skew=true) AND the
    span accounting must stay exact for hot and unique docs alike."""
    from spark_xml_spark.operators.dedup import substring_dup_spans

    spark = skew_conf
    boiler = "the quick brown fox jumps over dog"  # 7 tokens -> 1 window
    rows = [(i, boiler) for i in range(30000)]
    rows += [(100_000 + i, " ".join(f"u{i}w{j}" for j in range(7)))
             for i in range(3000)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(8)
    out = substring_dup_spans(df, "doc_id", "text", k=7)
    res = out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, (
        "viral-gram join-back was not skew-split — the join shape "
        "regressed to something OptimizeSkewedJoin cannot handle "
        "(LeftSemi, or an agg riding inside an input stage)"
    )
    # only the 30k hot docs are fully duplicated windows; unique docs
    # must not appear (their single gram occurs once)
    assert len(res) == 30000
    assert all(r.dup_tokens == 7 and r.n_tokens == 7 for r in res)


def test_agg_inside_input_stage_blocks_skew_split(skew_conf):
    """The engine constraint behind the operator's composite grouping
    key, pinned so a Spark upgrade that lifts it (or a regression in
    our conf recipe) is visible: the SAME skewed inner join splits when
    the right side is a bare shuffle stage, and does NOT split when the
    right side is an aggregate riding inside its input stage (the agg's
    rows are not re-readable shuffle output, so AQE cannot duplicate
    the matching partitions for the split)."""
    spark = skew_conf
    left = spark.range(60000).select(
        F.when(F.col("id") < 55000, F.lit(0)).otherwise(F.col("id"))
        .alias("k"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )
    right_bare = spark.range(2000).select(F.col("id").alias("k"))
    # hash(k)-partitioned agg output: satisfies the join requirement, so
    # no ENSURE_REQUIREMENTS exchange is inserted and the agg rides
    # inside the join's right-hand stage
    right_agg = (
        left.groupBy("k").count()
        .filter(F.col("count") >= 1).select("k")
    )
    plans = {}
    for tag, right in (("bare", right_bare), ("agg", right_agg)):
        df = left.join(right, "k", "inner")
        df.collect()
        plans[tag] = df._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plans["bare"]
    assert "skew=true" not in plans["agg"]


def test_capped_collect_viral_bucket_bounded_and_observable(spark):
    """minhash LSH under a 25 %-frequency boilerplate: every emitted
    bucket stays <= max_bucket (the bounded-buffer contract), the drop
    metrics count the viral bucket in every band, and the capped pair
    set equals the uncapped pair set minus viral-doc pairs — the cap
    never perturbs survivors."""
    from pyspark.sql import Observation
    from spark_xml_spark.operators import observed_drop_metrics
    from spark_xml_spark.operators.dedup import (
        capped_collect,
        minhash_near_dup_pairs,
    )

    docs = _viral_docs(spark)
    n_viral = 30  # 120 docs, every 4th
    bands = 16

    # bounded buffers, asserted on the gather primitive directly: one
    # 50-member viral bucket, twenty 2-member buckets, one singleton
    rows = [(0, 777, i) for i in range(50)]
    rows += [(0, 100 + b, 1000 + 2 * b + d)
             for b in range(20) for d in (0, 1)]
    rows += [(1, 55, 4242)]
    banded = spark.createDataFrame(rows, "_band int, _bh long, _id long")
    obs = Observation("skew-drops-direct")
    out = capped_collect(banded, ["_band", "_bh"], "_id", "_ids", 10, obs)
    got = {(r["_band"], r["_bh"]): sorted(r["_ids"])
           for r in out.collect()}
    m = observed_drop_metrics(obs)
    assert got and max(len(v) for v in got.values()) <= 10
    assert m["dropped_buckets"] == 1 and m["dropped_members"] == 50
    assert (0, 777) not in got          # viral: dropped whole
    assert (1, 55) not in got           # singleton: below min_bucket
    assert got[(0, 100)] == [1000, 1001]

    # end-to-end through minhash: the byte-identical viral docs share
    # every band bucket, so all 16 band buckets over-cap and the drop
    # metrics price the loss exactly
    obs2 = Observation("skew-drops-minhash")

    def pairs(max_bucket, observation=None):
        return {
            (r.id_a, r.id_b)
            for r in minhash_near_dup_pairs(
                docs, "doc_id", "text", threshold=0.5,
                max_bucket=max_bucket, observation=observation,
            ).collect()
        }

    capped = pairs(10, obs2)
    m2 = observed_drop_metrics(obs2)
    assert m2["dropped_buckets"] == bands
    assert m2["dropped_members"] == bands * n_viral
    uncapped = pairs(10_000)
    viral_ids = {i for i in range(120) if i % 4 == 0}
    assert capped == {
        p for p in uncapped
        if not (p[0] in viral_ids and p[1] in viral_ids)
    }
    # the planted near-dup pairs survived the cap
    assert {(2001, 2002), (2003, 2004)} <= capped


def test_sketch_state_bounded_under_hot_group(spark):
    """One group holds ~95 % of rows and one token ~30 % of them: the
    CMS stays <= depth x width cells, the KMV sample stays <= k hashes,
    and the hot item's estimates remain correct (CMS >= true count,
    exact here because width >> distinct items in the cell row)."""
    from spark_xml_spark.operators import (
        cms_estimate,
        count_min_sketch,
        kmv_sketch,
    )

    rows = []
    for i in range(19000):
        tok = "viral-token" if i % 3 == 0 else f"tok{i % 700}"
        rows.append(("hot", tok))
    rows += [("cold", f"c{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "grp string, tok string")

    depth, width = 4, 64
    sk = count_min_sketch(df, ["grp"], "tok", depth=depth, width=width)
    got = {r.grp: r for r in sk.collect()}
    # state bound: sparse cell count can never exceed the matrix size,
    # however many rows the hot group absorbed
    assert len(got["hot"].cms) <= depth * width
    assert len(got["cold"].cms) <= depth * width
    true_hot = sum(1 for i in range(19000) if i % 3 == 0)
    est = {
        (r.grp, r.item): r.est_count
        for r in cms_estimate(sk, ["viral-token"]).collect()
    }
    assert est[("hot", "viral-token")] >= true_hot

    kmv = {r.grp: r for r in
           kmv_sketch(df, ["grp"], "tok", k=32).collect()}
    assert kmv["hot"].n_kept <= 32 and len(kmv["hot"].kmin_hashes) <= 32
    assert kmv["cold"].n_kept <= 32


def test_stream_simhash_sharded_matches_exact_under_viral_bucket(
    spark, tmp_path
):
    """Streaming near-dup state under a viral bucket (30 % of the stream
    is one boilerplate doc, all in-window) with the per-bucket cap
    firing: exact (state_shards=0) and sharded keying must emit
    bit-identical pair sets, and the cap must bound pair fan-out to the
    newest max_bucket members."""
    from spark_xml_spark.streaming.dedup import simhash_stream_pairs

    rows = []
    for i in range(1, 41):
        if i % 3 == 0:  # 13 of 40 docs viral, interleaved arrivals
            rows.append((i, VIRAL, 1_000_000 + i * 10))
        else:
            rows.append((
                i,
                " ".join(f"only{i}word{j}" for j in range(25)),
                1_000_000 + i * 10,
            ))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts_sec long"
    )
    src = str(tmp_path / "src")
    df.withColumn("ts", F.col("ts_sec").cast("timestamp")).drop(
        "ts_sec"
    ).coalesce(2).write.parquet(src)

    def run(tag, shards):
        stream = spark.readStream.schema(
            "doc_id long, text string, ts timestamp"
        ).parquet(src)
        pairs = simhash_stream_pairs(
            stream, window_seconds=3600, watermark="3650 days",
            max_bucket=6, state_shards=shards,
        )
        out = str(tmp_path / f"out{tag}")
        q = (
            pairs.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / f"ckpt{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.id_a, r.id_b)
            for r in spark.read.parquet(out).distinct().collect()
        }

    exact = run("ex", 0)
    sharded = run("sh", 5)
    assert exact == sharded
    viral_ids = [i for i in range(1, 41) if i % 3 == 0]
    viral_pairs = {
        p for p in exact
        if p[0] in set(viral_ids) and p[1] in set(viral_ids)
    }
    # cap fires: the oldest viral members age out of the bucket, so the
    # full quadratic set must NOT appear...
    full = {(a, b) for i, a in enumerate(viral_ids)
            for b in viral_ids[i + 1:]}
    assert viral_pairs < full
    # ...but every doc still pairs with the (up to 6) newest live
    # members at its arrival: the newest doc pairs with the previous 6
    newest = viral_ids[-1]
    got_for_newest = {p for p in viral_pairs if p[1] == newest}
    assert got_for_newest == {
        (a, newest) for a in viral_ids[-7:-1]
    }
    # no unique doc ever pairs
    assert all(
        p[0] in set(viral_ids) and p[1] in set(viral_ids) for p in exact
    )
