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

from ..operators.registry import query
from .dedup import _SQL_BANDS, _SQL_MINHASH_SIG, _SQL_SHINGLED, dedup_minhash_lsh


def connected_components(edges: DataFrame, max_iter: int = 64) -> DataFrame:
    """(doc_a, doc_b) undirected edges -> (doc_id, cluster_id = min id in
    component). Nodes = every endpoint.

    Each round does neighbor-min propagation PLUS pointer jumping
    (comp <- comp(comp)), so convergence is O(log diameter) rounds, not
    O(diameter) — a 1M-node chain needs ~20 rounds, not 1M. The loop runs to
    a verified fixpoint; exhausting ``max_iter`` without convergence raises
    instead of silently returning partial labels (which would disagree with
    the exact transitive-closure oracle).
    """
    sym = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        sym.select(F.col("src").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(max_iter):
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
        cur_sum = updated.agg(F.sum("comp")).collect()[0][0]
        nodes = updated
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
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
