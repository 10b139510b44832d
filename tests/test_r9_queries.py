"""Unit tests for the r9 additions: incremental IVF assignment + drift
(sim_ivf_incremental_assign), domain-mix token-budget allocation
(curation_domain_mix), and paragraph-level near dedup
(dedup_paragraphs_near). The oracle sweep proves end-to-end hashes; these
pin the SEMANTIC invariants each operator exists for. (The bloom
auto-sizing pins live in test_ext.py; the no-retraining plan pin in
test_plan_pins.py.)"""

from pyspark.sql import functions as F

import __spark_entry__ as entry


def _q(name):
    return entry.queries()[name]


def test_ivf_incremental_occupancy_and_drift(spark, sf_dir):
    """Every trained cell appears; occupancy splits into train/new exactly
    (n_total = n_train + n_new, totals match the residue-class sizes);
    drift is the difference of the two per-cell means wherever both sides
    are populated."""
    rows = _q("sim_ivf_incremental_assign")(spark, sf_dir).collect()
    assert rows
    from aws_vpc_flow_log_appender_spark.ext.similarity import KM_SCALE
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    e = load(spark, sf_dir, "embeddings")
    n_batch = e.filter(F.expr("vec_id % 4 = 1")).count()
    n_train = e.count() - n_batch
    assert sum(r["n_train"] for r in rows) == n_train
    assert sum(r["n_new"] for r in rows) == n_batch
    for r in rows:
        assert r["n_total"] == r["n_train"] + r["n_new"]
        if r["train_mean_d"] is not None and r["new_mean_d"] is not None:
            # drift = difference of the integer-scaled means, exactly
            got = round(r["drift_d"] * KM_SCALE)
            want = round(r["new_mean_d"] * KM_SCALE) - round(
                r["train_mean_d"] * KM_SCALE
            )
            assert got == want, r
    # the drift signal actually fires at fixture scale: at least one cell
    # has both populations and a nonzero drift
    both = [
        r for r in rows
        if r["train_mean_d"] is not None and r["new_mean_d"] is not None
    ]
    assert both and any(r["drift_d"] != 0.0 for r in both)


def test_domain_mix_budgets_sum_exactly_and_fit(spark, sf_dir):
    """The largest-remainder allocation sums EXACTLY to the derived target
    (the method's defining property), never exceeds a source's quality
    availability, and the greedy hash-rank selection fills each budget
    without overshooting."""
    rows = _q("curation_domain_mix")(spark, sf_dir).collect()
    assert rows
    target = rows[0]["target_tokens"]
    assert all(r["target_tokens"] == target for r in rows)
    assert sum(r["alloc_tokens"] for r in rows) == target
    # target is half the quality tokens, derived from the data
    assert target == sum(r["qtok"] for r in rows) // 2
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= r["qtok"], r
        assert r["sel_tokens"] <= r["alloc_tokens"], r
        assert (r["n_sel"] == 0) == (r["sel_tokens"] == 0)
    # selection is meaningful: budgets are mostly consumed (the next doc
    # just didn't fit), and at least one source selected something
    assert sum(r["sel_tokens"] for r in rows) > 0


def test_domain_mix_selection_is_rerun_stable(spark, sf_dir):
    """Hash-rank selection is a pure function of the rows: two independent
    runs produce identical frames (the sampling-module rule — no rand(),
    no execution-order dependence)."""
    a = sorted(map(tuple, _q("curation_domain_mix")(spark, sf_dir).collect()))
    b = sorted(map(tuple, _q("curation_domain_mix")(spark, sf_dir).collect()))
    assert a == b


def test_paragraphs_near_is_strictly_stricter_than_exact(spark, sf_dir):
    """Near dedup keeps a SUBSET of exact keep-first's survivors: every
    span kept by the near rule is kept by the exact rule (the near rule
    only ADDS drop reasons), and the near-only drop class is populated at
    fixture scale (the operator's reason to exist)."""
    exact = {
        (r["doc_id"], r["para_idx"]): r["kept"]
        for r in _q("dedup_paragraphs")(spark, sf_dir).collect()
    }
    near = {
        (r["doc_id"], r["para_idx"]): r["kept"]
        for r in _q("dedup_paragraphs_near")(spark, sf_dir).collect()
    }
    assert set(exact) == set(near)  # same span instances
    assert all(exact[k] == 1 for k, v in near.items() if v == 1)
    n_extra = sum(1 for k, v in near.items() if v == 0 and exact[k] == 1)
    assert n_extra > 0  # the near class fires


def test_paragraphs_near_first_occurrence_of_unique_span_survives(spark, sf_dir):
    """A span text with no earlier near-duplicate and copy count 1 must be
    kept — the near rule can only drop spans that have a band-sharing
    predecessor, never fresh content."""
    rows = _q("dedup_paragraphs_near")(spark, sf_dir).collect()
    uniq = [r for r in rows if r["n_copies"] == 1]
    assert uniq
    # kept uniques exist in bulk: most unique spans have no near twin
    kept_frac = sum(r["kept"] for r in uniq) / len(uniq)
    assert kept_frac > 0.5, kept_frac


def test_bloom_merge_equals_union_bloom(spark):
    """bloom_merge's defining property: the bit_or of two bitmaps IS the
    union's bitmap, bit for bit — the invariant that lets
    stream_incremental_dedup maintain its prefilter across batches without
    rebuilding from the full key history."""
    from pyspark.sql import functions as F

    from aws_vpc_flow_log_appender_spark.operators.joins import (
        bloom_build,
        bloom_merge,
    )

    a = spark.range(0, 300).select(F.concat(F.lit("k"), "id").alias("k"))
    b = spark.range(200, 500).select(F.concat(F.lit("k"), "id").alias("k"))
    u = a.unionByName(b).distinct()
    merged = bloom_merge(
        [bloom_build(a, "k", words=128), bloom_build(b, "k", words=128)]
    ).collect()[0]["bloom"]
    direct = bloom_build(u, "k", words=128).collect()[0]["bloom"]
    assert dict(merged) == dict(direct)


def test_stream_incremental_dedup_state_versions_and_epochs(spark, sf_dir):
    """The streaming run leaves the full epoch-versioned state chain on
    storage (keys_v0..v4, bloom_v0..v4, surv_v0..v3), survivors match the
    batch operator's exactly (same doc_id/content_key set — the streamed
    composition equals the single pass), the key set grows by exactly the
    survivor count each epoch, and the emitted epoch column matches the
    staged arrival schedule (doc_id % 4)."""
    import glob as _glob
    import os as _os

    from aws_vpc_flow_log_appender_spark.streaming import queries as sq

    out = sq.QUERY_REGISTRY["stream_incremental_dedup"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows and all(r["epoch"] == r["doc_id"] % 4 for r in rows)

    batch_q = sq.QUERY_REGISTRY["dedup_incremental_snapshot"].fn
    batch_set = {
        (r["doc_id"], r["content_key"])
        for r in batch_q(spark, sf_dir).collect()
    }
    assert {(r["doc_id"], r["content_key"]) for r in rows} == batch_set

    state = max(
        _glob.glob("/tmp/stream_incremental_dedup_sink_*"),
        key=_os.path.getmtime,
    )
    for v in range(5):
        assert _os.path.isdir(_os.path.join(state, f"keys_v{v}")), v
        assert _os.path.isdir(_os.path.join(state, f"bloom_v{v}")), v
    n_prev = spark.read.parquet(_os.path.join(state, "keys_v0")).count()
    for ep in range(4):
        n_surv = spark.read.parquet(
            _os.path.join(state, f"surv_v{ep}")
        ).count()
        n_next = spark.read.parquet(
            _os.path.join(state, f"keys_v{ep + 1}")
        ).count()
        assert n_next == n_prev + n_surv, (ep, n_prev, n_surv, n_next)
        n_prev = n_next
