"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "spread": {name: max-min}, "sf": ...}.

Each query is forced through the noop sink (full materialization, no collect
to driver, no output IO skew) — the honest distributed-execution cost.

Methodology (VERDICT_r03 "Next round #4"): min of N>=3 trials per query, with
the per-query spread (max - min over trials) carried in the artifact so a
noise smear can be read off the JSON instead of re-derived. Trials for one
query run back-to-back inside one warm JVM; min-of-N strips GC pauses and
one-off scheduling stalls, which at sf0.1 are the same order as the queries
themselves. A DISCARDED per-query warmup execution precedes the timed
trials (VERDICT_r08 "What's wrong #2": cold Python workers on a loaded host
left even min-of-3 polluted — ts_ewma trials [34, 6, 3] vs a 0.55 s local
min); set SPARK_GRAFT_BENCH_WARMUP=0 to skip.

Self-adjudication (VERDICT_r05 "Next round #3"): the full record carries
`loadavg` — os.getloadavg() sampled at start and end — and `trials`, the RAW
per-trial wall times for every query, so a reviewer can attribute a slow
total to host contention (load >> nproc-share, fat spreads, sign-flipping
deltas) straight from the JSON instead of re-running. The perf gate is
A/B-stated: any query whose captured min exceeds 1.25x its round-start
number gets an interleaved tools/ab_bench.py run (AB_rN.json) before being
called a regression.

Output split (VERDICT_r06 "Next round #1"): at 28 queries the single stdout
line with trials/spread/loadavg outgrew the driver's tail-capture window and
BENCH_r06.json landed `parsed: null`. Stdout now carries ONE COMPACT final
line (metric/value/value_r5_set/unit/queries/sf — per-query MINS only, ~1 KB)
that the driver can always parse; the FULL self-adjudication record
(trials/spread/loadavg/errors) is written to $SPARK_GRAFT_BENCH_FULL_OUT
(default <repo>/BENCH_full.json) and committed per-round as
BENCH_local_r{N}*.json. tools/ab_gate.py reads either form.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative mix: flagship pipeline, wide agg, star join, window, session,
# dedup family, ANN, text scan.
HEADLINE = [
    "flowlog_enrich",
    "flowlog_top_talkers",
    "agg_pricing_summary",
    "join_multiway_star",
    "scan_filter_project",
    "window_topk_per_group",
    "ts_tumbling_window",
    "ts_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_simhash_pair_stats",
    "dedup_clusters",
    "sim_bruteforce_topk",
    "sim_ivf_topk",
    "text_quality_score",
    "text_tfidf_top_terms",
    "text_contamination_check",
    "tpch_q8_market_share",
    "corpus_curation_pipeline",
    "graph_pagerank",
    "text_bm25_search",
    "ts_ewma",
    "text_entropy_by_source",
    "multimodal_bmp_decode",
    # session-4 additions (r6): the sketch family and the BFS primitive —
    # cheap queries, added for longitudinal visibility; absent from r5-era
    # artifacts, so the A/B gate simply has no ref number for them
    "agg_countmin_heavy_hitters",
    "agg_kmv_distinct",
    "graph_shortest_paths",
    # r7 additions: the two-stage ANN, the semantic dedup pair, and the
    # shard manifest — same longitudinal-visibility rationale
    "sim_ivfpq_rerank_topk",
    "dedup_semantic",
    "corpus_curation_semantic",
    "text_shard_manifest",
    # r7 session-5 additions (all six): LPM routing join, SCD2 intervals,
    # bloom semi-join reduction, salted skew join, Z-order layout stats,
    # exact decimal aggregation
    "join_ip_longest_prefix",
    "ts_scd2_intervals",
    "join_bloom_prefilter",
    "join_skew_salted",
    "sort_zorder_layout",
    "agg_decimal_exact",
    # r8 additions: span-level keep-first dedup + reassembly, incremental
    # snapshot dedup, CDC merge, capped SemDeDup — the batch additions
    # (the streaming sliding-append twin runs real micro-batches and is
    # bench-shaped like the other stream_* queries: excluded)
    "dedup_paragraphs",
    "dedup_paragraph_stats",
    "dedup_incremental_snapshot",
    "cdc_merge_snapshot",
    "dedup_semantic_capped",
    # r9 additions: incremental IVF assignment + drift, domain-mix budget
    # allocation, paragraph-level near dedup — same longitudinal-visibility
    # rationale as every prior round's additions
    "sim_ivf_incremental_assign",
    "curation_domain_mix",
    "dedup_paragraphs_near",
    # r10 additions (batch; the two new stream_* queries run real
    # micro-batches and are excluded like every prior stream query):
    # image dHash near-dedup, mini-batch codebook update, and the r9
    # orphan's per-source adaptive rank filter
    "multimodal_phash_dedup",
    "sim_ivf_minibatch_update",
    "curation_quality_rank_filter",
    # r10 session-2 additions (batch; stream_heavy_hitters runs real
    # micro-batches and is excluded like every prior stream query):
    # cross-split MinHash leakage, PSI snapshot drift, tokenizer fertility
    "dedup_cross_split_leakage",
    "dq_psi_drift",
    "text_tokenizer_fertility",
]


def main() -> None:
    from aws_vpc_flow_log_appender_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("bench")
    qs = entry.queries()

    # Warm up the JVM, codegen, parquet reader, and broadcast machinery
    # outside the timed region with a tiny-SF pass of the first query
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs[HEADLINE[0]](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    n_trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    raw_trials: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    # Per-query discarded warmup (VERDICT r8 "What's wrong" #2): the r8
    # driver artifact recorded decaying trial series (ts_ewma 34->6->3 s vs
    # a 0.55 s local min) — cold Python workers + first-touch parquet cache
    # on a loaded host polluted even the min of 3. One untimed execution per
    # query at the bench SF pays that cost outside the timed region.
    n_warmup = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1"))
    for name in HEADLINE:
        try:
            trials: list[float] = []
            for _ in range(n_warmup):
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            for _ in range(n_trials):
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                trials.append(time.perf_counter() - t0)
            timings[name] = round(min(trials), 3)
            spreads[name] = round(max(trials) - min(trials), 3)
            raw_trials[name] = [round(t, 3) for t in trials]
        except Exception as exc:  # noqa: BLE001 - one bad query must not kill the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
    load_end = os.getloadavg()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # queries added to the headline set AFTER the r5 artifacts were captured:
    # excluded from `value_r5_set` so the longitudinal total stays
    # apples-to-apples (the full `value` includes them; the A/B gate keys on
    # per-query numbers and ignores names absent from the reference artifact)
    post_r5 = {
        "agg_countmin_heavy_hitters", "agg_kmv_distinct",
        "graph_shortest_paths",
        "sim_ivfpq_rerank_topk", "dedup_semantic",
        "corpus_curation_semantic", "text_shard_manifest",
        "join_ip_longest_prefix", "ts_scd2_intervals",
        "join_bloom_prefilter", "join_skew_salted",
        "sort_zorder_layout", "agg_decimal_exact",
    }
    compact = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "value_r5_set": round(
            sum(v for k, v in timings.items() if k not in post_r5), 3
        ),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if errors:
        compact["errors"] = errors
    full = dict(compact)
    full.update(
        spread=spreads,
        trials=raw_trials,
        loadavg={
            "start": [round(x, 2) for x in load_start],
            "end": [round(x, 2) for x in load_end],
            "nproc": os.cpu_count(),
        },
    )
    full_out = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json"),
    )
    with open(full_out, "w") as f:
        json.dump(full, f, indent=2)
    print(f"bench: full self-adjudication record -> {full_out}", file=sys.stderr)
    # the compact line MUST be the last stdout line (driver tail-capture)
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
