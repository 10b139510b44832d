"""Unit tests for the r10 session-2 additions: cross-split near-dup leakage
(dedup_cross_split_leakage), PSI snapshot drift (dq_psi_drift), per-language
tokenizer fertility (text_tokenizer_fertility), and streaming heavy hitters
with mergeable count-min state (stream_heavy_hitters). The oracle sweep
proves end-to-end hashes; these pin the SEMANTIC invariants each operator
exists for — the leakage report never crosses its split the wrong way and
catches exact cross-split copies at full signature agreement, PSI is
non-negative and exactly zero for identical snapshots, fertility ratios are
the exact integer divisions of per-doc sums, and the streamed sketch keeps
the one-sided count-min guarantee with per-epoch cumulative monotonicity.
"""

import os

from pyspark.sql import functions as F

import __spark_entry__ as entry


def _q(name):
    return entry.queries()[name]


# --- dedup_cross_split_leakage -----------------------------------------------


def test_leakage_rows_respect_split_and_encoding(spark, sf_dir):
    """Every emitted row pairs an eval doc (doc_id % 10 >= 8) with a train
    doc (doc_id % 10 < 8), one row per eval doc, est_jaccard_ppm is the
    exact integer encoding of the agreement count, and candidate counts are
    positive."""
    rows = _q("dedup_cross_split_leakage")(spark, sf_dir).collect()
    assert rows, "fixture corpus contains near-dups; leakage rows expected"
    seen = set()
    for r in rows:
        assert r["eval_doc_id"] % 10 >= 8, r
        assert r["best_train_doc_id"] % 10 < 8, r
        assert r["est_jaccard_ppm"] == r["n_eq_best"] * 125000, r
        assert 0 <= r["n_eq_best"] <= 8, r
        assert r["n_candidates"] >= 1, r
        assert r["eval_doc_id"] not in seen
        seen.add(r["eval_doc_id"])


def test_leakage_exact_cross_split_copy_scores_full_agreement(spark, sf_dir):
    """An eval doc whose text is byte-identical to some train doc MUST be
    reported with full signature agreement (n_eq_best == 8): identical text
    -> identical shingles -> identical signature -> every band collides."""
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = d.filter(F.col("doc_id") % 10 < 8).select("text").distinct()
    e = d.filter(F.col("doc_id") % 10 >= 8).select("doc_id", "text")
    leaked_exact = {r["doc_id"] for r in e.join(t, "text").collect()}
    if not leaked_exact:
        import pytest

        pytest.skip("fixture has no exact cross-split copy at this sf")
    best = {
        r["eval_doc_id"]: r["n_eq_best"]
        for r in _q("dedup_cross_split_leakage")(spark, sf_dir).collect()
    }
    for doc_id in leaked_exact:
        assert best.get(doc_id) == 8, (doc_id, best.get(doc_id))


# --- dq_psi_drift ------------------------------------------------------------


def test_psi_nonnegative_flag_consistent_and_prev_subset(spark, sf_dir):
    """PSI is a sum of non-negative terms, the flag applies the 0.1 (ppb)
    threshold exactly, and the 'previous' snapshot is a subset of the
    current corpus (n_prev <= n_curr), one row per source."""
    rows = _q("dq_psi_drift")(spark, sf_dir).collect()
    assert rows
    assert len({r["source"] for r in rows}) == len(rows)
    for r in rows:
        assert r["psi_ppb"] >= 0, r
        assert r["drift_flag"] == (r["psi_ppb"] >= 100_000_000), r
        assert 0 <= r["n_prev"] <= r["n_curr"], r


def test_psi_identical_snapshots_is_exactly_zero(spark, sf_dir, tmp_path):
    """Self-drift is exactly zero: when every document sits in BOTH
    snapshots (no doc_id ≡ 1 mod 4), every bin has na == nb and ca == cb,
    so every smoothed term is ln(1) * 0 — integer zero, not epsilon."""
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    d = load(spark, sf_dir, "documents")
    stable = d.filter(F.col("doc_id") % 4 != 1)
    fixture = str(tmp_path / "selfdrift")
    os.makedirs(fixture, exist_ok=True)
    stable.write.mode("overwrite").parquet(
        os.path.join(fixture, "documents.parquet")
    )
    rows = _q("dq_psi_drift")(spark, fixture).collect()
    assert rows
    for r in rows:
        assert r["psi_ppb"] == 0, r
        assert r["n_prev"] == r["n_curr"], r
        assert not r["drift_flag"], r


# --- text_tokenizer_fertility ------------------------------------------------


def test_fertility_totals_match_per_doc_sums(spark, sf_dir):
    """The per-language totals are exactly the sums of the per-doc counts
    the sibling query (text_bpe_token_count) emits, and both ratios are the
    exact integer divisions of those totals."""
    per_doc = _q("text_bpe_token_count")(spark, sf_dir)
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    expect = {
        r["lang"]: (r["ws"], r["bpe"])
        for r in per_doc.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_ws_tokens").alias("ws"),
            F.sum("n_bpe_tokens").alias("bpe"),
        )
        .collect()
    }
    rows = _q("text_tokenizer_fertility")(spark, sf_dir).collect()
    assert {r["lang"] for r in rows} == set(expect)
    for r in rows:
        ws, bpe = expect[r["lang"]]
        assert r["total_ws_tokens"] == ws, r
        assert r["total_bpe_tokens"] == bpe, r
        assert r["bpe_per_kchar"] == r["total_bpe_tokens"] * 1000 // r["total_chars"]
        assert r["bpe_per_100_ws"] == r["total_bpe_tokens"] * 100 // r["total_ws_tokens"]
        assert r["n_docs"] > 0


# --- stream_heavy_hitters ----------------------------------------------------


def test_stream_heavy_hitters_one_sided_and_monotone(spark, sf_dir):
    """Per epoch: at most 10 rows with dense ranks in estimate order. The
    count-min guarantee holds against the TRUE prefix counts (estimate >=
    true count of that token among batches <= epoch), and a token's
    estimate never decreases across epochs (cell-wise merged state only
    grows)."""
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    rows = _q("stream_heavy_hitters")(spark, sf_dir).collect()
    assert rows
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == {0, 1, 2, 3}
    for ep, rs in by_epoch.items():
        assert len(rs) <= 10
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda r: (-r["cm_estimate"], r["tok"]))
        assert [r["tok"] for r in ordered] == [r["tok"] for r in rs]

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.expr("CAST(doc_id % 4 AS INT)").alias("b"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    true_counts = {
        (r["b"], r["tok"]): r["c"]
        for r in toks.groupBy("b", "tok").agg(F.count("*").alias("c")).collect()
    }
    for r in rows:
        true_prefix = sum(
            c for (b, tok), c in true_counts.items()
            if tok == r["tok"] and b <= r["epoch"]
        )
        assert r["cm_estimate"] >= true_prefix, r
    est = {(r["epoch"], r["tok"]): r["cm_estimate"] for r in rows}
    for (ep, tok), v in est.items():
        nxt = est.get((ep + 1, tok))
        if nxt is not None:
            assert nxt >= v, (ep, tok, v, nxt)


# --- stream_domain_mix -------------------------------------------------------


def test_stream_domain_mix_budget_fold(spark, sf_dir):
    """Per source: spend is the running sum of admitted tokens across
    epochs, never exceeds the allocation (remaining >= 0), admissions never
    exceed arrivals, and the budget genuinely BINDS somewhere (at least one
    batch rejects) while still admitting something — the controller
    controls, it neither rubber-stamps nor starves."""
    rows = _q("stream_domain_mix")(spark, sf_dir).collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        assert 0 <= r["n_admitted"] <= r["n_arrived"], r
        assert r["remaining_tokens"] >= 0, r
        by_source.setdefault(r["source"], []).append(r)
    for src, rs in by_source.items():
        rs.sort(key=lambda r: r["epoch"])
        run = 0
        for r in rs:
            run += r["tok_admitted"]
            assert r["spent_cum"] == run, (src, r)
    assert any(r["n_admitted"] < r["n_arrived"] for r in rows)
    assert any(r["n_admitted"] > 0 for r in rows)


def test_stream_domain_mix_spend_rule_not_global_cumsum(spark, sf_dir):
    """The controller spends only what it ADMITS: total admitted tokens
    per source equal the final spent_cum, and every source's final spend
    fits its allocation-implied bound (spent_cum + remaining constant
    across that source's epochs == alloc)."""
    rows = _q("stream_domain_mix")(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for src, rs in by_source.items():
        allocs = {r["spent_cum"] + r["remaining_tokens"] for r in rs}
        assert len(allocs) == 1, (src, allocs)
        total_admitted = sum(r["tok_admitted"] for r in rs)
        assert max(r["spent_cum"] for r in rs) == total_admitted
