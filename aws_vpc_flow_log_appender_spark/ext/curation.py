"""Capstone: the full training-data curation pipeline as one composed query.

The individual operators (quality scoring, exact dedup, MinHash-LSH, connected
components) exist as separately-verified queries; this composes them the way a
real corpus-prep job runs them:

    documents
      -> quality gate      (length band + mean word length)
      -> exact dedup       (content-hash, keep lowest doc_id)
      -> near-dup clusters (MinHash-LSH pairs -> connected components)
      -> keep one representative per cluster (the cluster_id doc)
      -> per-language corpus stats

Oracle: the same composition in SQL, reusing the exact shared fragments
(shingle/minhash/band CTEs + the recursive-CTE closure) — so the composition
itself is hash-verified, not just the pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.registry import load, query
from .dedup import _SQL_BANDS, _SQL_MINHASH_SIG
from .graph import connected_components
from . import dedup as dedup_mod

_SQL_QUALITY_GATE = """
    length(text) BETWEEN 100 AND 500
    AND (length(replace(text, ' ', '')) + 0.0)
        / (length(text) - length(replace(text, ' ', '')) + 1) BETWEEN 3 AND 8
"""


def curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving documents after the full gate chain (doc_id, lang, n_chars)."""
    d = load(spark, sf_dir, "documents")
    text = F.col("text")
    n_tokens = (F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit("")))) + 1
    avg_word_len = F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("double") / n_tokens
    quality = d.filter(
        F.length(text).between(100, 500) & avg_word_len.between(3, 8)
    )

    # exact dedup: keep the lowest doc_id per content hash
    h = F.md5(F.encode("text", "utf-8"))
    exact_kept = (
        quality.withColumn("__h", h)
        .withColumn(
            "__keep",
            F.col("doc_id") == F.min("doc_id").over(W.partitionBy("__h")),
        )
        .filter("__keep")
        .drop("__h", "__keep")
        # consumed twice (shingle source + final survivor join) and the CC
        # loop would otherwise re-derive it per round through the pair graph
        .localCheckpoint()
    )

    # near-dup clusters over the quality-surviving corpus
    pairs = _minhash_pairs_for(exact_kept)
    clusters = connected_components(pairs)
    joined = exact_kept.join(clusters, "doc_id", "left")
    survivors = joined.filter(
        F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id"))
    )
    return survivors.select("doc_id", "lang", "n_chars")


# MinHash-LSH candidate pairs over an arbitrary documents-shaped frame:
# the shared implementation in dedup.py (the registered dedup_minhash_lsh
# reads the full table; the pipeline runs it over the gated subset)
_minhash_pairs_for = dedup_mod._minhash_pairs_for


# The lexical curation chain as DuckDB CTEs (gated -> exact_kept -> LSH
# pairs -> recursive closure -> survivors) — shared verbatim by the two
# capstone oracles below.
_CURATION_CTES = f"""
    WITH RECURSIVE gated AS (
      SELECT * FROM documents WHERE {_SQL_QUALITY_GATE}
    ),
    exact_kept AS (
      SELECT * FROM (
        SELECT g.*, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM gated g
      ) WHERE doc_id = keep_id
    ),
    shingled AS (
      SELECT doc_id, unnest(list_distinct({dedup_mod._SQL_SHINGLES})) AS sh
      FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM exact_kept)
    ),
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
    survivors AS (
      SELECT e.doc_id, e.lang, e.n_chars
      FROM exact_kept e LEFT JOIN clusters c ON e.doc_id = c.doc_id
      WHERE c.cluster_id IS NULL OR c.cluster_id = e.doc_id
    )"""


@query(
    "corpus_curation_pipeline",
    oracle=_CURATION_CTES + """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM survivors GROUP BY lang
    """,
    tags=("curation", "capstone", "dedup", "iterative"),
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stats of the curated corpus — the composed quality ->
    exact-dedup -> near-dup-cluster -> representative chain, hash-verified
    end to end."""
    survivors = curate(spark, sf_dir)
    return survivors.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


def _semantic_capstone_oracle() -> str:
    """The full modern curation stack in one statement: the lexical chain's
    CTEs, then the surviving docs' embeddings re-seed the unrolled k-means
    training (src='semsrc' — the codebook is trained on what SURVIVED
    lexical dedup, exactly as a real pipeline orders the stages), then the
    SemDeDup decision, then per-language stats of both stages."""
    from .similarity import _km_oracle_train_parts, _semantic_decision_ctes

    parts = [_CURATION_CTES]
    parts.append("""
    , semsrc AS (
      SELECT e.vec_id, e.embedding
      FROM embeddings e JOIN survivors s ON e.vec_id = s.doc_id
    )""")
    parts.extend(_km_oracle_train_parts(src="semsrc", with_prefix=False))
    parts.append(_semantic_decision_ctes(spark_dialect=False))
    parts.append("""
    SELECT s.lang,
           CAST(count(*) AS BIGINT) AS n_docs_lexical,
           CAST(sum(d.kept) AS BIGINT) AS n_docs_final,
           CAST(sum(CASE WHEN d.kept = 1 THEN s.n_chars ELSE 0 END) AS BIGINT)
             AS total_chars_final,
           CAST(min(CASE WHEN d.kept = 1 THEN s.doc_id END) AS BIGINT)
             AS first_kept_doc
    FROM survivors s JOIN semdecision d ON d.vec_id = s.doc_id
    GROUP BY s.lang
    """)
    return "".join(parts)


@query(
    "corpus_curation_semantic",
    oracle=_semantic_capstone_oracle(),
    tags=("curation", "capstone", "semantic", "kmeans", "dedup"),
)
def corpus_curation_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full modern curation stack, composed and hash-verified end to
    end: quality gate -> exact dedup -> MinHash-LSH near-dup clusters ->
    one representative per cluster -> SEMANTIC prune of the survivors
    (dedup_semantic's trained-quantizer SemDeDup, re-trained on exactly
    the lexical survivors' embeddings — the stage order a real pipeline
    runs, since semantic pruning after lexical dedup is what SemDeDup
    prescribes). Output is the per-language before/after ledger: lexical
    survivor count, final count after semantic pruning, surviving bytes,
    and the first kept doc as a determinism witness.

    Composition shape at 100 TB: every stage is the independently-proven
    bucketed piece (hash dedup: one shuffle; LSH: banded pair join; CC:
    pointer-jumping; SemDeDup: broadcast-codebook training + per-cell
    pair join), glued by one doc_id equi-join into the embeddings table —
    co-partitionable end to end. The k-means seeds (KM_K smallest
    surviving vec_ids) make the trained codebook a pure function of the
    survivor set, so the whole five-stage composition is deterministic
    and the oracle replays it in one SQL statement."""
    from .similarity import _semantic_decisions, _train_mem

    surv = curate(spark, sf_dir)
    e = load(spark, sf_dir, "embeddings")
    efilt = e.join(
        surv.select(F.col("doc_id").alias("vec_id")), "vec_id"
    ).select("vec_id", "embedding")
    sem = _semantic_decisions(_train_mem(efilt, "semcur"))
    kept_chars = F.when(F.col("kept") == 1, F.col("n_chars")).otherwise(F.lit(0))
    kept_doc = F.when(F.col("kept") == 1, F.col("doc_id"))
    return (
        surv.join(sem, surv.doc_id == sem.vec_id)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs_lexical"),
            F.sum("kept").cast("long").alias("n_docs_final"),
            F.sum(kept_chars).cast("long").alias("total_chars_final"),
            F.min(kept_doc).cast("long").alias("first_kept_doc"),
        )
    )
