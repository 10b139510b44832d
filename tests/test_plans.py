"""Plan-property regression tests: the PLANS.md claims as assertions, so a
refactor that silently loses pushdown / broadcast / partial-agg / top-k
pushdown fails CI — the scale posture is tested, not just documented."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from aws_vpc_flow_log_appender_spark.operators.skew import (
    hot_keys,
    salted_join,
    salted_sum_count,
)


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = entry.queries()

    def plan_of(name):
        return qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()

    return plan_of


def test_filter_and_projection_pushdown(plans):
    p = plans("scan_filter_project")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    # column pruning: the scan's bracketed column list must be the 6
    # referenced columns, not all 11 lineitem columns
    scan_line = next(l for l in p.splitlines() if "FileScan parquet" in l)
    cols = scan_line.split("[", 1)[1].split("]", 1)[0].split(",")
    assert len(cols) == 6, cols


def test_dim_filter_pushed_before_broadcast(plans):
    p = plans("join_inner_broadcast")
    assert "BroadcastHashJoin" in p
    scan_lines = [l for l in p.splitlines() if "FileScan parquet" in l]
    cust_scan = next(l for l in scan_lines if "c_mktsegment" in l)
    assert "BUILDING" in cust_scan  # filter inside the dim scan, not after


def test_flagship_joins_are_broadcast(plans):
    p = plans("flowlog_enrich")
    assert p.count("BroadcastHashJoin") >= 2  # ENI join + bucketed geo join
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" not in p  # the naive range-join shape


def test_flatten_geo_dim_has_no_nested_loop(spark):
    """The de-overlap sweep must plan as an equi join (bucketed containment),
    not BroadcastNestedLoopJoin/CartesianProduct — at a few-million-row GeoIP
    dim the pure-containment join is O(n*m) on one core."""
    from aws_vpc_flow_log_appender_spark import fixtures
    from aws_vpc_flow_log_appender_spark.enrich import flatten_geo_dim

    p = (
        flatten_geo_dim(fixtures.geo_dim_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_agg_has_partial_phase(plans):
    p = plans("agg_pricing_summary")
    assert "partial_sum" in p  # map-side combine before the exchange


def test_window_topk_uses_group_limit(plans):
    p = plans("window_topk_per_group")
    assert "WindowGroupLimit" in p  # partial top-k before the shuffle


def test_global_topk_avoids_full_sort(plans):
    p = plans("sort_limit_topk")
    assert "TakeOrderedAndProject" in p


def test_salted_sum_matches_plain_groupby(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        r["l_returnflag"]: (round(r["s"], 6), r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (round(r["qty"], 6), r["n_rows"])
        for r in salted_sum_count(
            li, ["l_returnflag"], {"l_quantity": "qty"}, n_salts=8
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = o.join(c, on="o_custkey").count()
    salted = salted_join(o, c, "o_custkey", n_salts=4).count()
    assert plain == salted


def test_hot_keys_profile(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    top = hot_keys(li, ["l_returnflag"], top_n=2).collect()
    assert len(top) == 2
    assert top[0]["n_rows"] >= top[1]["n_rows"]


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both sides on the join key pre-shuffles at write time; the
    join plan must then have no Exchange on either input."""
    # default warehouse dir (spark-warehouse/, gitignored); tables dropped below
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("o_b")
    try:
        j = spark.table("li_b").join(
            spark.table("o_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).withColumn("x", F.col("l_quantity") * F.col("o_totalprice"))
        # disable auto-broadcast so the co-located join is actually exercised
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")

def test_holdout_split_has_no_shuffle(plans):
    """Hash-based split assignment must stay a narrow projection — an
    Exchange here would mean splitting a 100 TB corpus pays a shuffle."""
    p = plans("sample_holdout_split")
    assert "Exchange" not in p


def test_q6_predicates_reach_scan(plans):
    p = plans("tpch_q6_forecast_revenue")
    scan_line = next(l for l in p.splitlines() if "FileScan parquet" in l)
    assert "PushedFilters" in scan_line
    assert "l_shipdate" in scan_line and "l_quantity" in scan_line


def test_q5_dims_broadcast(plans):
    """Every dimension in Q5 must broadcast; only the fact-fact join may
    shuffle (AQE's call at real scale)."""
    p = plans("tpch_q5_local_supplier_volume")
    assert p.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q3_topk_and_segment_pushdown(plans):
    """Q3's LIMIT must plan as TakeOrderedAndProject (never a global sort of
    all groups) and the segment filter must reach the customer scan."""
    p = plans("tpch_q3_shipping_priority")
    assert "TakeOrderedAndProject" in p
    cust_scan = next(
        l for l in p.splitlines() if "FileScan parquet" in l and "c_mktsegment" in l
    )
    assert "BUILDING" in cust_scan


def test_q8_star_is_all_broadcast(plans):
    """Q8 joins five dims around lineitem-orders: every dim must broadcast
    (no SMJ fan-out), and the OR-of-nation-pairs predicate must not have
    degraded any join to a nested loop."""
    p = plans("tpch_q8_market_share")
    assert p.count("BroadcastHashJoin") >= 5
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_chunk_windows_no_shuffle(plans):
    """Chunking is tokenize -> explode -> slice: one scan, zero Exchange —
    the property that lets a 100 TB corpus chunk without a shuffle."""
    p = plans("text_chunk_windows")
    assert "Exchange" not in p
    assert "Generate explode" in p  # the explode runs inline, not post-shuffle


def test_stratified_sample_no_shuffle(plans):
    """Per-stratum hash sampling must stay a narrow filter."""
    p = plans("sample_stratified")
    assert "Exchange" not in p


def test_contamination_probe_is_broadcast(plans):
    """The benchmark shingle set must broadcast into the corpus-side probe;
    an SMJ here would shuffle every corpus shingle by string key."""
    p = plans("text_contamination_check")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_runtime_bloom_filter_injects_on_shuffle_join(spark, sf_dir):
    """When a fact-fact join is too big to broadcast, Spark's runtime bloom
    filter must inject a might_contain probe from the selective side into
    the large side's scan — the 100 TB semi-join pushdown that saves reading
    unjoinable rows. Default thresholds (10 GB application side) are tuned
    for real clusters; the test lowers them to fixture scale to pin the
    mechanism itself."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in p
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_triangle_count_wedge_joins_are_equi(plans):
    # the ordered-wedge formulation must stay equi-keyed: the wedge join
    # (on the shared node) and the closing join (on the (a, c) pair) are
    # hash joins — the only nested-loop joins allowed are the final
    # 1-row x 1-row scalar-aggregate cross joins
    p = plans("graph_triangle_count")
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p
    for i, line in enumerate(p.splitlines()):
        if "BroadcastNestedLoopJoin" in line:
            # both inputs of any BNLJ must be scalar aggregates (count(1))
            assert "Cross" in line


def test_bm25_stats_are_broadcast(plans):
    # r10 single-pass shape: the dl/tf/df relations and their joins
    # collapsed into one groupBy(doc_id) over one tokenize pass (per-doc
    # checkpoint) — the ONLY join left is the 1-row stats broadcast
    # (Cross, by design); no shuffle join may reappear
    p = plans("text_bm25_search")
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" not in p
    assert "CartesianProduct" not in p
    bnlj = [l for l in p.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert len(bnlj) == 1  # the 1-row corpus-stats attach
    for line in bnlj:
        assert "Cross" in line


def test_rolling_distinct_is_equi_join(plans):
    # the 7-day window is expressed as an explode fan-out + equi-join on
    # day, NOT an interval join (which would be a nested loop at scale)
    p = plans("ts_rolling_distinct")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_skyline_window_runs_on_distinct_prices(plans):
    # the sweep's window must sit above the per-price aggregate (dim-sized
    # input), and the join back to parts must be a broadcast
    p = plans("skyline_pareto_2d")
    assert "BroadcastHashJoin" in p
    win_seen_after_agg = False
    lines = p.splitlines()
    for i, l in enumerate(lines):
        if "Window" in l:
            win_seen_after_agg = any(
                "HashAggregate" in l2 for l2 in lines[i:]
            )
    assert win_seen_after_agg


def test_pagerank_mass_conservation(spark, sf_dir):
    # scaled-integer PageRank: total rank stays within floor-loss of the
    # scale, and every rank is positive — the invariants that survive any
    # partitioning (order-independence is what the oracle hash checks)
    import __spark_entry__ as entry

    df = entry.queries()["graph_pagerank"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 25
    assert all(r.rank > 0 for r in rows)
    ranks = [r.pr_rank for r in rows]
    assert ranks == sorted(ranks)


def test_pii_scrub_is_narrow(plans):
    """PII redaction must stay a pure projection: no Exchange at all, and
    the regexes run inside whole-stage codegen."""
    p = plans("text_pii_scrub")
    assert "Exchange" not in p
    # '*(1)' is the codegen-stage marker in executedPlan().toString()
    assert "*(1) Project" in p


def test_temperature_rates_join_is_broadcast(plans):
    """The |langs|-row rate table must broadcast onto the corpus scan; the
    doc-side join must never shuffle on lang."""
    p = plans("sample_temperature")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_blast_radius_frontier_is_broadcast(plans):
    """Frontier BFS: the hop-1 neighbor set is broadcast into the edge
    probe — no cartesian shape, no shuffle of the edge list for the probe."""
    p = plans("flowlog_blast_radius")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_stateful_folds_shuffle_once_per_key(plans):
    """CUSUM / EWMA: one exchange keyed by the fold key feeding a single
    partition-fold MapInPandas pass (NOT per-group FlatMapGroupsInPandas,
    which pays a Python round-trip per key and lets AQE serialize the whole
    keyspace through one worker)."""
    for name in ("flowlog_cusum_drift", "ts_ewma"):
        p = plans(name)
        assert "MapInPandas" in p, name
        assert "FlatMapGroupsInPandas" not in p, name
        exchanges = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
        assert len(exchanges) == 1, (name, exchanges)


@pytest.mark.parametrize(
    "name",
    # graph_pagerank left this list in r10: its top-25 is now computed in
    # the driver fold (bounded 15k-edge graph), so there is no window to
    # rewrite — test_pagerank_mass_conservation still pins its output shape
    ["text_bm25_search", "flowlog_beaconing",
     "events_top_paths"],
)
def test_global_topk_rank_compiles_to_group_limit(plans, name):
    """The global row_number()+filter<=k top-k queries must keep compiling to
    WindowGroupLimit / TakeOrderedAndProject (Spark 4.1 rewrites them into a
    k-row limit feeding a k-row window, so the single partition in their
    `WindowExec: No Partition Defined` warning holds <= k rows). A refactor
    that breaks the rewrite (e.g. rank over a derived column Spark can't
    push) would regress them into a true global-window full sort."""
    p = plans(name)
    assert "WindowGroupLimit" in p or "TakeOrderedAndProject" in p, name


def test_interpolate_carry_windows_are_chunk_partitioned(plans):
    """ts_interpolate_linear (round-2 VERDICT "weak" fix): no unpartitioned
    unbounded-frame window may scan the spine. Spine-level carries must be
    partitioned by the day chunk; the only unpartitioned window specs allowed
    are the boundary-stitch carries ordering by `chunk` over the
    one-row-per-chunk summary (timespan/86400 rows)."""
    import re

    p = plans("ts_interpolate_linear")
    specs = re.findall(r"windowspecdefinition\((.*?)specifiedwindowframe", p)
    assert specs, "expected window specs in the interpolation plan"
    for s in specs:
        first = s.split(",")[0].strip()
        if "ASC" in first or "DESC" in first:  # no partition cols -> ORDER BY first
            assert first.startswith("chunk#"), f"unpartitioned spine window: {s}"


def test_q20_single_fact_scan(plans):
    """Q20's part total must come from the partkey window over the
    aggregated pairs — the groupBy+join formulation scans and shuffles
    lineitem twice (the DataFrame API doesn't share subplans)."""
    p = plans("tpch_q20_dominant_supplier")
    fact_scans = [
        l for l in p.splitlines()
        if "Scan parquet" in l and "lineitem" in l
    ]
    assert len(fact_scans) == 1, f"{len(fact_scans)} lineitem scans"


def test_q2_min_cost_is_broadcast_star(plans):
    """Q2: every dim broadcast, one fact aggregate shuffle, correlated min
    as a partkey window, LIMIT via TakeOrderedAndProject (no global sort)."""
    p = plans("tpch_q2_min_cost_supplier")
    assert p.count("BroadcastHashJoin") >= 4
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p


def test_sessionize_shares_one_sort(plans):
    """ts_sessionize's lag and cumsum windows must share one sort: both
    order by the PROJECTED (t_us, event_id) attribute — ordering by the
    unix_micros(ts) expression inline mints a separate attribute per window
    and inserts a second sort between them."""
    p = plans("ts_sessionize")
    sorts = [l for l in p.splitlines() if "- Sort " in l]
    assert len(sorts) == 1, sorts
    assert p.count("Exchange hashpartitioning") == 1


# --- Broadcast-boundedness audit (VERDICT r5 #2) -----------------------------
# Every explicit F.broadcast hint DISABLES AQE's size-based fallback, so each
# site must carry a documented cardinality bound that holds at 100 TB. The
# manifest below is the audit: key = (module-relative file, broadcast
# argument name), value = the bound argument. The test fails in BOTH
# directions — a new F.broadcast site not in the manifest (forces an audit
# before merge) and a stale manifest entry whose site was removed.
_BROADCAST_BOUNDS = {
    # sketches: the strongest bounds there are — compile-time constants
    ("ext/sketches.py", "js"): "d-row literal (d = 4 count-min rows)",
    ("ext/sketches.py", "sk"): "count-min sketch, <= d x w = 2048 cells",
    ("ext/sketches.py", "theta"): "1-row scalar aggregate",
    # flagship / enrichment: GeoIP + ENI dims are few-million-row dimension
    # tables; spine is the /16 bucket spine (<= 65536 rows)
    ("enrich.py", "dim"): "ENI dimension table",
    ("enrich.py", "spine"): "/16 bucket spine, <= 65536 rows",
    ("enrich.py", "exploded"): "GeoIP dim x bucket fan-out (dimension-sized)",
    ("enrich.py", "bucketed"): "GeoIP dimension table",
    ("flagship.py", "h1"): "hop-1 neighbor set of ONE seed (seeded BFS)",
    ("sinks.py", "bounds"): "range-partition bounds, #partitions rows",
    # TPC-H dims: region/nation/supplier/part/customer are dimension tables
    # by the spec's scaling rules (customer = SF*150k, the largest; the spec
    # fact tables are lineitem/orders, never broadcast here)
    ("operators/tpch.py", "r"): "region dim (5 rows)",
    ("operators/tpch.py", "n"): "nation dim (25 rows)",
    ("operators/tpch.py", "n1"): "nation dim (25 rows)",
    ("operators/tpch.py", "n2"): "nation dim (25 rows)",
    ("operators/tpch.py", "s"): "supplier dim (SF*10k rows)",
    ("operators/tpch.py", "p"): "part dim (SF*200k rows)",
    ("operators/tpch.py", "c"): "customer dim (SF*150k rows)",
    ("operators/tpch.py", "top"): "1-row max aggregate",
    ("operators/tpch.py", "thr"): "1-row threshold aggregate",
    ("operators/tpch.py", "threshold"): "per-(supp,part) avg, dim-sized",
    ("operators/joins.py", "c"): "customer dim",
    ("operators/joins.py", "n"): "nation dim",
    ("operators/joins.py", "r"): "region dim",
    ("operators/joins.py", "b"): "5-row tagged literal set",
    ("operators/joins.py", "bands"): "range-band dim (#bands rows)",
    ("operators/joins.py", "bloom"): "1-row bloom bitmap (<=1024 map entries, 8 KB)",
    ("ext/dedup.py", "bloom"): "1-row snapshot bloom bitmap (<=1024 map entries, 8 KB)",
    ("ext/similarity.py", "y"): (
        "SemDeDup closer-member side, hint applied ONLY under the "
        "_sem_spread_broadcast gate: the source's parquet-footer estimate "
        "must clear SEMDEDUP_BROADCAST_SRC_CAP (16 MB), so the broadcast "
        "relation is size-capped by construction; above the cap the join "
        "stays unhinted (AQE chooses, the sample_dedup_weights discipline)"
    ),
    ("streaming/queries.py", "bounds"): "1-row min/max event-time aggregate",
    ("streaming/queries.py", "cb"): (
        "checkpointed codebook, KM_K rows (read from stored state, "
        "never derived in-plan)"
    ),
    ("streaming/queries.py", "bprev"): (
        "1-row snapshot bloom bitmap (bloom_words_for caps at 2^18 words "
        "~= 4 MB; auto-sized at ~10 bits/key)"
    ),
    ("streaming/queries.py", "js"): "count-min row-index literal (_CM_D=4 rows)",
    ("streaming/queries.py", "cm_cells"): (
        "count-min cell matrix (<= _CM_D x _CM_W = 2048 rows by "
        "construction)"
    ),
    ("operators/profiling.py", "bins"): "PSI bin spine literal (_PSI_BINS=8 rows)",
    ("flagship.py", "routes"): "route table literal (len(_ROUTE_TABLE)=13 rows)",
    ("operators/relational.py", "box"): "1-row box-count aggregate",
    ("operators/aggregates.py", "c"): "customer dim",
    ("operators/aggregates.py", "n"): "nation dim",
    ("operators/aggregates.py", "r"): "region dim",
    ("operators/advanced.py", "c"): "customer dim",
    ("operators/analytics.py", "model"): "Markov model, #states^2 rows",
    ("operators/timeseries.py", "stats"): "per-event_type stats (dim-sized)",
    ("operators/timeseries.py", "dev"): "per-event_type stddev (dim-sized)",
    ("operators/timeseries.py", "carry"): "per-chunk summary (timespan/day rows)",
    ("operators/timeseries.py", "lags"): "literal lag list (3 rows)",
    ("operators/profiling.py", "frontier"): "hop-bounded frontier of ONE seed",
    ("ext/similarity.py", "q"): "query point set (user-supplied, small)",
    ("ext/similarity.py", "sizes"): "per-cell counts, #cells rows",
    ("ext/similarity.py", "cent"): "centroid table, #cells rows",
    ("ext/similarity.py", "probes"): "query x nprobe fan-out",
    ("ext/similarity.py", "eval_set"): "eval suite (bounded by definition)",
    ("ext/similarity.py", "lut"): "ADC lookup, query-batch x PQ_M x PQ_K rows",
    ("ext/similarity.py", "p_tbl"): "probe x ADC LUT, query-batch x N_PROBE x PQ_M x PQ_K rows",
    ("ext/similarity.py", "cand"): "re-rank candidate pairs, query-batch x RERANK_C rows",
    ("ext/curation.py", "tot"): "1-row quality-token total + target",
    ("ext/curation.py", "leftover"): "1-row largest-remainder count",
    ("ext/curation.py", "alloc"): "per-source allocations, #sources rows",
    ("ext/dedup.py", "off"): "1-row derived re-crawl offset scalar",
    ("ext/similarity.py", "codebook"): "trained codebook, KM_K rows",
    ("ext/sampling.py", "tot"): "1-row total",
    ("ext/sampling.py", "n_min"): "1-row min-count scalar",
    ("ext/sampling.py", "mx"): "1-row max scalar",
    ("ext/sampling.py", "rates"): "per-language rates, #langs rows",
    ("ext/textanalysis.py", "n"): "1-row corpus count",
    ("ext/textanalysis.py", "total"): "1-row token total",
    ("ext/textanalysis.py", "totals"): "per-source totals, #sources rows",
    ("ext/textanalysis.py", "stats"): "1-row BM25 corpus stats + per-term df",
    ("ext/textanalysis.py", "bench"): "benchmark shingles (eval-suite-sized)",
}


def test_every_broadcast_hint_has_documented_bound():
    """Sweep the package for F.broadcast( sites; each (file, argument) must
    appear in _BROADCAST_BOUNDS with a non-empty bound, and vice versa.
    Vocabulary-sized tables (tf-idf df, unigram vocab) and corpus-fraction
    tables (dedup cluster membership) must NOT appear here — their hints were
    removed in r6 so AQE can fall back to SMJ at scale."""
    import re
    from pathlib import Path

    import aws_vpc_flow_log_appender_spark as pkg

    root = Path(pkg.__file__).parent
    found = set()
    for py in root.rglob("*.py"):
        rel = py.relative_to(root).as_posix()
        text = py.read_text()
        # \s* tolerates formatter-wrapped arguments; the count cross-check
        # below guarantees NO call shape escapes the audit (code-review r6:
        # the old identifier-only regex silently skipped wrapped or
        # expression arguments — the exact direction this test exists to
        # block)
        idents = re.findall(
            r"F\.broadcast\(\s*([A-Za-z_][A-Za-z_0-9]*)", text
        )
        n_calls = len(re.findall(r"F\.broadcast\(", text))
        assert n_calls == len(idents), (
            f"{rel}: {n_calls - len(idents)} F.broadcast call(s) whose "
            f"argument is not a bare identifier — bind the broadcast side "
            f"to a name so the boundedness audit can key it"
        )
        for ident in idents:
            found.add((rel, ident))
    documented = set(_BROADCAST_BOUNDS)
    assert found - documented == set(), (
        f"undocumented F.broadcast sites (add a cardinality bound to "
        f"_BROADCAST_BOUNDS or drop the hint): {sorted(found - documented)}"
    )
    assert documented - found == set(), (
        f"stale _BROADCAST_BOUNDS entries: {sorted(documented - found)}"
    )
    assert all(v.strip() for v in _BROADCAST_BOUNDS.values())


def test_sample_dedup_weights_joinback_not_forced_broadcast(spark, sf_dir):
    """VERDICT r5 #1: the cluster-membership table is corpus-fraction-sized
    on real web corpora (30-50 % dup rates), so the join back onto the corpus
    must carry NO broadcast hint — AQE picks broadcast at fixture scale and
    falls back to SMJ at scale. The analyzed plan must contain zero
    ResolvedHint nodes anywhere in this query tree."""
    df = entry.queries()["sample_dedup_weights"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed


@pytest.mark.parametrize("name", ["text_tfidf_top_terms", "text_unigram_logprob"])
def test_vocab_joins_not_forced_broadcast(spark, sf_dir, name):
    """VERDICT r5 #2: the term-df / vocabulary probe joins are Heaps'-law
    sized (1e8+ tokens on a 100 TB corpus) so they carry no hint; the only
    permitted ResolvedHint in these trees is the 1-row corpus-count scalar."""
    df = entry.queries()[name](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") <= 1, name


def test_lsh_bucket_stats_never_joins(plans):
    """The pre-flight occupancy artifact must stay a pure two-level
    aggregation — its whole point is costing a corpus WITHOUT a pair join,
    so any Join node in this plan is a design regression."""
    p = plans("dedup_lsh_bucket_stats")
    assert "Join" not in p
    assert "partial_count" in p or "partial_sum" in p  # map-side combine


def test_pair_stats_final_step_is_aggregate_not_window(plans):
    """dedup_simhash_pair_stats' per-Hamming rollup must be a partial-
    aggregable groupBy: the first cut used a partitionBy(hamming) window,
    which funnels every fingerprint pair through <= 8 partitions (profiled
    3x slower than the exact enumeration at 10x)."""
    p = plans("dedup_simhash_pair_stats")
    assert "Window" not in p


def test_spread_input_noop_when_tiny(spark, sf_dir):
    """Size gate: at sf0.001/sf0.01 the documents scan is far below the
    per-task byte floor, so _spread_input must NOT insert an Exchange —
    the shuffle would cost more than single-task hashing saves."""
    from aws_vpc_flow_log_appender_spark.ext.dedup import _spread_input
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    docs = load(spark, sf_dir, "documents")
    out = _spread_input(docs)
    assert out is docs  # identity no-op, no repartition node at all


def test_spread_input_noop_when_prepartitioned(spark, tmp_path):
    """A corpus that already arrives in >= defaultParallelism files (or
    splits) is left untouched — the scan itself is parallel."""
    from aws_vpc_flow_log_appender_spark.ext.dedup import (
        _MIN_SPREAD_BYTES_PER_TASK,
        _spread_input,
    )

    par = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "prepart")
    # incompressible text so the SIZE gate passes and the no-op must come
    # from the file-count branch; written as `par` files
    spark.range(par * _MIN_SPREAD_BYTES_PER_TASK // 16).selectExpr(
        "id AS doc_id",
        "concat(md5(string(id)), md5(string(id + 1)), md5(string(id + 2))) AS text",
    ).repartition(par).write.parquet(path)
    docs = spark.read.parquet(path)
    out = _spread_input(docs)
    assert out is docs


def test_spread_input_spreads_large_single_split(spark, tmp_path):
    """A single-file input big enough to amortize the shuffle IS spread to
    cluster parallelism (the sf0.1+ single-split fixture shape)."""
    from aws_vpc_flow_log_appender_spark.ext.dedup import (
        _MIN_SPREAD_BYTES_PER_TASK,
        _spread_input,
    )

    par = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "single")
    # incompressible text so the on-disk size (what the stats report) clears
    # the byte floor — repeat('x', n) dictionary-compresses to ~nothing
    spark.range(par * _MIN_SPREAD_BYTES_PER_TASK // 16).selectExpr(
        "id AS doc_id",
        "concat(md5(string(id)), md5(string(id + 1)), md5(string(id + 2))) AS text",
    ).coalesce(1).write.parquet(path)
    docs = spark.read.parquet(path)
    out = _spread_input(docs)
    assert out is not docs
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange RoundRobinPartitioning" in plan


def test_fan_out_derived_gated_on_source_size(spark, sf_dir, tmp_path):
    """The derived-table fan-out (LSH bands / shingle profiles) is gated on
    the SOURCE corpus scan size (AB_r06_session2.json: the unconditional
    repartition cost dedup_minhash_lsh 1.36x at bench scale; the gated form
    is 1.095x, AB_r06_minhash_fix.json): below the per-core byte floor the
    derived frame passes through untouched, above it a round-robin
    Repartition is inserted; a non-introspectable source keeps the old
    unconditional-spread behavior."""
    from aws_vpc_flow_log_appender_spark.ext.dedup import (
        _MIN_FANOUT_BYTES_PER_TASK,
        _fan_out_derived,
    )
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    derived = spark.range(10).selectExpr("id AS doc_id", "id % 3 AS band_id")

    # small corpus (sf0.001/sf0.01 documents): identity, no Exchange at all
    small = load(spark, sf_dir, "documents")
    assert _fan_out_derived(derived, small) is derived

    # corpus above the floor: the derived frame IS round-robin repartitioned
    par = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "big_corpus")
    spark.range(par * _MIN_FANOUT_BYTES_PER_TASK // 16).selectExpr(
        "id AS doc_id",
        "concat(md5(string(id)), md5(string(id + 1)), md5(string(id + 2))) AS text",
    ).coalesce(1).write.parquet(path)
    big = spark.read.parquet(path)
    spread = _fan_out_derived(derived, big)
    assert spread is not derived
    assert "RoundRobinPartitioning" in spread._jdf.queryExecution().toString() \
        or "Repartition" in spread._jdf.queryExecution().toString()

    # no source to introspect: conservative unconditional spread
    assert _fan_out_derived(derived, None) is not derived


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """The storage-bucketed co-located join's whole point: both sides are
    written bucketBy(join_key), so the SortMergeJoin consumes the bucketed
    scans' hash distribution directly — ZERO Exchange anywhere in the join
    plan (at 100 TB this is the difference between re-shuffling the fact
    table per join and never shuffling it at all). Both scans must show
    bucket selection."""
    from aws_vpc_flow_log_appender_spark.operators.joins import (
        bucketed_join_frame,
    )

    plan = (
        bucketed_join_frame(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert plan.count("SelectedBucketsCount") == 2


def test_countmin_sketch_is_broadcast_and_partial_agged(plans):
    """The sketch build must absorb map-side (partial HashAggregate over
    the 2048-cell key space) and the estimate lookup must broadcast the
    SKETCH, never shuffle the token table for it — the constant-state
    claim of ext/sketches.py as plan properties."""
    p = plans("agg_countmin_heavy_hitters")
    assert "BroadcastHashJoin" in p
    # partial aggregation on the (j, bucket) sketch build
    assert "partial_sum" in p or "HashAggregate" in p
    # the token table is never broadcast (only the 4-row j spine and the
    # sketch are) — a broadcast of tc would be the unbounded direction
    assert p.count("BroadcastExchange") <= 3


def test_bfs_rounds_are_lineage_cut(spark, sf_dir):
    """graph_shortest_paths references its prior label table twice per
    round (anti-join + union), which doubles the recompute DAG per hop if
    left lazy (measured: 33 exchanges at H=3). The per-round lazy
    localCheckpoint must keep the FINAL plan small — the visible plan
    reads cached frontiers instead of re-deriving three rounds of
    anti-joins."""
    from aws_vpc_flow_log_appender_spark.operators.graphs import (
        graph_shortest_paths,
    )

    plan = (
        graph_shortest_paths(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 4, (
        f"BFS final plan carries {n_exchanges} exchanges — per-round "
        f"lineage cut lost?"
    )


def test_kmv_order_statistic_is_per_group_window(plans):
    """The k-th-min rank must run as a per-event_type partitioned window
    (parallel across groups, Exchange hashpartitioning(event_type)), never
    a single-partition global sort — the shape that keeps the order
    statistic group-parallel at any group count."""
    p = plans("agg_kmv_distinct")
    assert "Window" in p
    assert "hashpartitioning(event_type" in p
    assert "Exchange SinglePartition" not in p
