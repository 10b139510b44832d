"""Sketch invariants beyond the oracle rows: the one-sided count-min
guarantee over the WHOLE vocabulary (the driver row only hashes the
top-20), the KMV error envelope, and — the property that makes both
sketches usable at 100 TB — mergeability: summarizing two halves and
combining the summaries must equal summarizing the union."""

from pyspark.sql import functions as F

from aws_vpc_flow_log_appender_spark.ext.sketches import (
    _CM_D,
    _KMV_K,
    _cm_bucket_spark,
    agg_countmin_heavy_hitters,
    agg_kmv_distinct,
)
from aws_vpc_flow_log_appender_spark.operators.registry import load


def _cm_state(spark, docs):
    """(token true counts, sketch cells) for a documents frame."""
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    tc = toks.groupBy("tok").agg(F.count("*").alias("true_count"))
    js = spark.range(_CM_D).select(F.col("id").alias("j"))
    hb = tc.crossJoin(F.broadcast(js)).withColumn(
        "bucket", _cm_bucket_spark(F.col("j"), F.col("tok"))
    )
    sk = hb.groupBy("j", "bucket").agg(F.sum("true_count").alias("cnt"))
    return tc, sk


def test_countmin_one_sided_over_full_vocabulary(spark, sf_dir):
    """cm_estimate >= true_count must hold for EVERY token, not just the
    top-20 the registered query emits."""
    docs = load(spark, sf_dir, "documents")
    tc, sk = _cm_state(spark, docs)
    js = spark.range(_CM_D).select(F.col("id").alias("j"))
    hb = tc.crossJoin(F.broadcast(js)).withColumn(
        "bucket", _cm_bucket_spark(F.col("j"), F.col("tok"))
    )
    est = (
        hb.join(sk, ["j", "bucket"])
        .groupBy("tok", "true_count")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    n_violations = est.filter(
        F.col("cm_estimate") < F.col("true_count")
    ).count()
    assert n_violations == 0
    # and the registered query agrees with this reconstruction on its top-20
    top = agg_countmin_heavy_hitters(spark, sf_dir).collect()
    assert len(top) == 20
    assert all(r["overestimate"] >= 0 for r in top)


def test_countmin_sketches_merge(spark, sf_dir):
    """Cell-wise SUM of per-half sketches == the union's sketch — the
    map-side-combinable property the module docstring claims. Exact
    equality, not approximate: both sides are integer sums over the same
    multiset."""
    docs = load(spark, sf_dir, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    _, sk_union = _cm_state(spark, docs)
    _, sk_a = _cm_state(spark, half_a)
    _, sk_b = _cm_state(spark, half_b)
    merged = (
        sk_a.unionByName(sk_b)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = merged.join(sk_union, ["j", "bucket"], "full_outer").filter(
        ~(merged["cnt"].eqNullSafe(sk_union["cnt"]))
    )
    assert diff.count() == 0


def test_kmv_estimate_within_envelope(spark, sf_dir):
    """Bottom-k with k=64 has relative standard error ~1/sqrt(k-2) ~ 13%;
    assert a generous 3-sigma envelope so the test pins the estimator is
    WIRED correctly (a wrong numerator or an off-by-one rank blows this
    immediately) without flaking on hash luck."""
    rows = agg_kmv_distinct(spark, sf_dir).collect()
    assert rows, "every event_type should clear k distinct elements"
    for r in rows:
        rel_err = abs(r["kmv_estimate"] - r["true_distinct"]) / r["true_distinct"]
        assert rel_err < 0.40, (r["event_type"], rel_err)
        assert r["kth_hash"] > 0
    # k-th minimum is an ORDER STATISTIC of the union: merging two halves'
    # bottom-k lists and re-taking the k-th min must reproduce it exactly.
    e = load(spark, sf_dir, "events")
    k_union = {r["event_type"]: r["kth_hash"] for r in rows}
    halves = []
    for m in (0, 1):
        h = e.filter(F.col("event_id") % 2 == m)
        elem = F.concat(
            F.col("user_id").cast("string"),
            F.lit(":"),
            F.expr("unix_micros(ts) div 86400000000").cast("string"),
        )
        el = h.select("event_type", elem.alias("elem")).distinct()
        dh = el.select(
            "event_type",
            F.conv(
                F.substring(F.md5(F.encode("elem", "utf-8")), 1, 12), 16, 10
            ).cast("long").alias("h"),
        ).distinct()
        from pyspark.sql import Window as W

        w = W.partitionBy("event_type").orderBy("h")
        halves.append(
            dh.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _KMV_K)
            .select("event_type", "h")
        )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("h")
    remerged = (
        halves[0].unionByName(halves[1])
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == _KMV_K)
        .collect()
    )
    assert {r["event_type"]: r["h"] for r in remerged} == k_union
