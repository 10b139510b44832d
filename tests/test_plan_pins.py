"""Plan-fingerprint pins for the r7/r8 at-scale operators (VERDICT r7
"Next round" #8): the load-bearing physical-plan facts — broadcasts that
must stay broadcasts, Exchange counts that must not grow, checkpoints that
must actually cut recomputation — asserted over executedPlan text so a
Spark upgrade or refactor cannot silently regress the 100 TB posture.
(test_plans.py pins the r1-r6 surface; test_bucketed_join_has_no_exchange
there already covers the zero-Exchange bucketed join.)"""

import pytest

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def plan_of(spark, sf_dir):
    qs = entry.queries()

    def get(name):
        return (
            qs[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    return get


def test_lpm_routes_join_is_broadcast(plan_of):
    """join_ip_longest_prefix: the per-plen route join must be a broadcast
    of the bounded route table — a SortMergeJoin here would shuffle the
    per-address stats once per plen tier."""
    p = plan_of("join_ip_longest_prefix")
    assert p.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in p


def test_scd2_builds_all_windows_on_one_exchange(plan_of):
    """ts_scd2_intervals: lag-detect, lead-close and row_number versioning
    all partition by user_id — Catalyst must plan ONE Exchange, not one
    per window pass."""
    p = plan_of("ts_scd2_intervals")
    assert p.count("Exchange") == 1, p


def test_semdedup_self_join_reads_checkpoint_not_training(plan_of):
    """dedup_semantic: the decision self-join must read the CHECKPOINTED
    member relation on both sides (two ExistingRDD scans) and re-run the
    unrolled k-means training on neither (zero parquet scans below the
    join — the r7 plan-read found the training subtree under each join
    side before the checkpoint was added)."""
    p = plan_of("dedup_semantic")
    assert p.count("ExistingRDD") == 2, p
    assert "Scan parquet" not in p


def test_semdedup_capped_self_join_reads_checkpoint(plan_of):
    """dedup_semantic_capped: same discipline with the sub-bucket profile —
    the augmented member relation is checkpointed once, the sizes join and
    256-term bucket fold never run per join side."""
    p = plan_of("dedup_semantic_capped")
    assert p.count("ExistingRDD") == 2, p
    assert "Scan parquet" not in p


def test_cdc_merge_reuses_aggregate_partitioning(plan_of):
    """cdc_merge_snapshot: both latest-per-key aggregates hash on user_id
    and the full outer join must reuse that partitioning — exactly two
    Exchanges (one per input), none introduced by the join itself."""
    p = plan_of("cdc_merge_snapshot")
    assert p.count("Exchange") == 2, p


def test_incremental_dedup_anti_join_consumes_prefiltered_rows(plan_of):
    """dedup_incremental_snapshot: the snapshot anti-join must consume the
    CHECKPOINTED bloom-pass set, not the raw batch — without the lineage
    cut, Catalyst's PushLeftSemiLeftAntiThroughJoin pulls the anti-join
    below the probe and the full batch reaches the snapshot join (the r8
    plan-read that motivated the checkpoint). The fail-bloom branch must
    bypass the anti-join entirely via the union, with the probe visible
    in its join condition."""
    p = plan_of("dedup_incremental_snapshot")
    lines = p.splitlines()
    anti = next(i for i, l in enumerate(lines) if "LeftAnti" in l)
    assert p.count("LeftAnti") == 1
    assert p.count("Union") == 1
    # the bypass branch carries the (negated) probe, never the anti join:
    # xxhash64 appears only below the union's second branch (the checked
    # branch's probe was evaluated BEFORE its checkpoint, so no hash expr
    # survives in the anti subtree)
    probe_lines = [i for i, l in enumerate(lines) if "xxhash64" in l]
    assert probe_lines and all(i > anti for i in probe_lines)
    # the anti join's streamed side must be the frozen pass set: an
    # ExistingRDD (the checkpoint) appears INSIDE the anti-join's subtree —
    # between the LeftAnti line and the bypass branch's first probe line —
    # regardless of interposed Project/Filter/AQE wrapper lines (ADVICE r8
    # #3: matching the first ':-'/'+-' line was brittle against plan-text
    # drift)
    fresh_start = probe_lines[0]
    assert any(
        "ExistingRDD" in l for l in lines[anti + 1:fresh_start]
    ), p


def test_ivf_incremental_assign_has_no_retraining_stage(plan_of):
    """sim_ivf_incremental_assign (VERDICT r8 #6): the batch-assignment
    plan must consume the CHECKPOINTED trained state — two ExistingRDD
    scans (training stats + codebook), exactly ONE parquet scan (the new
    batch), and ZERO Lloyd update aggregates (no avg() anywhere above the
    checkpoint): assigning a new batch never retrains the quantizer."""
    p = plan_of("sim_ivf_incremental_assign")
    assert p.count("ExistingRDD") == 2, p
    assert p.count("Scan parquet") == 1, p
    assert "avg(" not in p, p
