"""Deterministic sampling / splitting operators for training-data pipelines.

The cardinal rule at corpus scale: splits must be a pure function of the
ROW, never of execution order — `df.sample()` or `rand()` assignments change
under retries, repartitioning, or reruns, silently leaking holdout data into
training. Hash-based assignment (split = f(md5(key))) is stable across runs,
engines, and cluster layouts, and never shuffles: both operators here are
narrow transformations (plus one aggregation keyed by the output grouping).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import round_half_up
from ..operators.registry import load, query

# train fraction 0.9 expressed as an integer threshold over the first 32
# hash bits: floor(0.9 * 2^32). Integer compare, no float boundary to drift.
TRAIN_THRESHOLD = 3865470566
HASH_SPACE = 4294967296  # 2^32


def _hash_prefix_sql(expr: str, salt: str, n_hex: int = 8) -> str:
    """First ``n_hex`` hex chars of md5('<salt>:' || expr) as BIGINT
    (DuckDB). Width-parameterized so the 32-bit split hash and the 24-bit
    temperature hash share ONE definition (code-review r6: two hand-copied
    variants could drift and silently decorrelate Spark from the oracle)."""
    return (f"CAST('0x' || substr(md5('{salt}:' || CAST({expr} AS VARCHAR)),"
            f" 1, {n_hex}) AS BIGINT)")


def _hash32_sql(expr: str, salt: str) -> str:
    return _hash_prefix_sql(expr, salt, 8)


def hash_prefix(col, salt: str, n_hex: int = 8):
    """Spark twin of _hash_prefix_sql: first n_hex hex chars of the salted
    md5 as long — engine-portable, row-pure (the salt namespaces
    independent splits so a second split of the same corpus is
    uncorrelated with the first)."""
    return F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit(f"{salt}:"), col.cast("string")),
                           "utf-8")),
            1, n_hex,
        ),
        16,
        10,
    ).cast("long")


def hash32(col, salt: str):
    return hash_prefix(col, salt, 8)


@query(
    "sample_holdout_split",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN {_hash32_sql('doc_id', 'split')} < {TRAIN_THRESHOLD}
                THEN 'train' ELSE 'val' END AS split
    FROM documents
    """,
    tags=("sampling", "split"),
)
def sample_holdout_split(spark, sf_dir):
    """Deterministic 90/10 train/val holdout: split = md5(doc_id) bucket
    compared against an integer threshold. Row-pure (stable under retry,
    rerun, engine change), no shuffle at all — the assignment is a narrow
    projection, so splitting a 100 TB corpus costs one scan."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.when(hash32(F.col("doc_id"), "split") < TRAIN_THRESHOLD, "train")
        .otherwise("val")
        .alias("split"),
    )


@query(
    "sample_split_rates",
    oracle=f"""
    SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs
    FROM (
      SELECT lang,
             CASE WHEN {_hash32_sql('doc_id', 'split')} < {TRAIN_THRESHOLD}
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    )
    GROUP BY lang, split
    """,
    tags=("sampling", "split", "agg"),
)
def sample_split_rates(spark, sf_dir):
    """Per-language split occupancy — the monitoring view over
    sample_holdout_split (hash splits are only per-stratum ~90/10 in
    expectation; this is the query that verifies no stratum drifted).
    One shuffle keyed by (lang, split) — 10 groups, partial-aggregated."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            F.when(hash32(F.col("doc_id"), "split") < TRAIN_THRESHOLD, "train")
            .otherwise("val")
            .alias("split"),
        )
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


PACK_BUDGET = 512  # tokens per packed training sequence


@query(
    "text_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tok
      FROM documents
    ),
    offsets AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
               AS start_off
      FROM toks
    )
    SELECT source,
           CAST(start_off // {PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM offsets
    GROUP BY source, CAST(start_off // {PACK_BUDGET} AS BIGINT)
    """,
    tags=("sampling", "packing", "window"),
)
def text_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing (the standard LLM pretraining
    batching step): per source, documents concatenate in doc_id order into a
    token stream chopped every PACK_BUDGET tokens; a document belongs to the
    sequence its first token lands in. Expressed as a running-sum window per
    source + integer division — one shuffle on source, no Python. At 100 TB
    the window partitions by source, so parallelism = #sources; a single
    giant source would be range-partitioned on (source, doc_id) instead."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    n_tok = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    ).cast("long")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    toks = d.select("doc_id", "source", n_tok.alias("n_tok"))
    offsets = toks.withColumn(
        "start_off", F.sum("n_tok").over(w) - F.col("n_tok")
    )
    return (
        offsets.groupBy(
            "source",
            F.floor(F.col("start_off") / PACK_BUDGET).cast("long").alias("seq_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


SHARD_BYTES = 4096  # fixture-scale shard target; production uses ~256 MB


@query(
    "text_shard_manifest",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, source, text, CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM documents WHERE text IS NOT NULL
    ),
    offsets AS (
      SELECT doc_id, source, text, n_bytes,
             sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_bytes AS start_off
      FROM sized
    )
    SELECT source,
           CAST(start_off // {SHARD_BYTES} AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
           CAST(min(doc_id) AS BIGINT) AS first_doc_id,
           CAST(max(doc_id) AS BIGINT) AS last_doc_id,
           CAST(sum(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                          1, 12) AS BIGINT)) AS BIGINT) AS content_sum
    FROM offsets
    GROUP BY 1, 2
    """,
    tags=("sampling", "packing", "manifest"),
)
def text_shard_manifest(spark, sf_dir):
    """Deterministic output-shard manifest (VERDICT r6 "Next round" #8) —
    the last step a training-data pipeline runs before handoff: per
    source, documents pack in doc_id order into shards of SHARD_BYTES
    target size (a document belongs to the shard its first byte lands in,
    the text_pack_sequences rule at byte granularity), and each shard row
    carries the invariants a consumer re-verifies without trusting the
    producer: doc count, byte total, the [first, last] doc_id range, and
    an order-insensitive content digest (exact integer sum of 48-bit
    md5-slices over 'doc_id:text' — the sketches' engine-portable hash
    idiom, overflow-free at any real shard size: 2^48 x millions of docs
    << 2^63). NULL-text documents carry no shardable payload and are
    excluded by contract.

    Shape: one running-sum window per source + one grouped aggregation —
    a single shuffle keyed by source, no Python, no driver state. At
    100 TB the window parallelism is #sources; a single giant source
    range-partitions on (source, doc_id) exactly as text_pack_sequences
    documents."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sized = d.select(
        "doc_id", "source", "text",
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = sized.withColumn(
        "start_off", F.sum("n_bytes").over(w) - F.col("n_bytes")
    )
    doc_h = (
        F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit(":"),
                            F.col("text"),
                        ),
                        "utf-8",
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
    )
    return (
        offsets.groupBy(
            "source",
            F.floor(F.col("start_off") / SHARD_BYTES).cast("long").alias("shard_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
            F.sum(doc_h).alias("content_sum"),
        )
    )


# per-stratum keep fractions expressed as integer thresholds over the first
# 32 hash bits (floor(frac * 2^32)): integer compare, no float boundary.
STRATA_FRACTIONS = {
    "en": 0.05,  # downsample the dominant language hard
    "es": 0.2,
    "de": 0.3,
    "zh": 0.5,
    "fr": 1.0,  # keep all of the rarest stratum
}
STRATA_THRESHOLDS = {
    lang: int(frac * HASH_SPACE) for lang, frac in STRATA_FRACTIONS.items()
}


def _strata_case_sql() -> str:
    arms = " ".join(
        f"WHEN '{lang}' THEN {thr}" for lang, thr in STRATA_THRESHOLDS.items()
    )
    return f"CASE lang {arms} ELSE 0 END"


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_hash32_sql('doc_id', 'strata')} < ({_strata_case_sql()})
    """,
    tags=("sampling", "stratified"),
)
def sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling: each language stratum keeps a
    different fraction (rebalancing a language-skewed corpus is the #1
    sampling job in multilingual training pipelines). Keep/drop is a pure
    function of md5(doc_id) against a per-stratum integer threshold — stable
    across runs, retries and engines, and a narrow filter: sampling 100 TB
    is one scan with zero shuffle, and the filter pushes below any
    downstream join. The salt ('strata') de-correlates this decision from
    the train/val split above."""
    d = load(spark, sf_dir, "documents")
    thr = F.lit(0)
    for lang, t in STRATA_THRESHOLDS.items():
        thr = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thr)
    return d.filter(hash32(F.col("doc_id"), "strata") < thr).select(
        "doc_id", "lang", "source"
    )


# --- temperature resampling --------------------------------------------------
# Multilingual corpora are heavily skewed toward the head language;
# temperature sampling (the standard alpha-exponent reweighting) raises the
# probability of rare languages. With alpha = 0.5 the per-language keep-rate
# is rate_l = sqrt(n_min / n_l): exactly 1.0 for the rarest language,
# shrinking as 1/sqrt for bigger strata. alpha = 0.5 is deliberate — the
# whole computation is then one IEEE-exact sqrt of one correctly-rounded
# double division, bit-identical across engines (pow(x, 0.7) would not be),
# and the rate is quantized to integer parts-per-million before the
# comparison so selection is pure integer arithmetic.
TEMP_HASH_SPACE = 16777216  # 2^24: first 6 hex chars of md5


def _hash24_sql(expr: str, salt: str) -> str:
    return _hash_prefix_sql(expr, salt, 6)


@query(
    "sample_temperature",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
    ), rates AS (
      SELECT lang, n_docs,
             CAST(floor(sqrt(CAST((SELECT min(n_docs) FROM counts) AS DOUBLE) / n_docs)
                        * 1000000 + 0.5) AS BIGINT) AS rate_ppm
      FROM counts
    )
    SELECT r.lang, r.n_docs, r.rate_ppm,
           CAST(sum(CASE WHEN {_hash24_sql('d.doc_id', 'temp')} * 1000000
                              < r.rate_ppm * {TEMP_HASH_SPACE}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents d JOIN rates r USING (lang)
    GROUP BY r.lang, r.n_docs, r.rate_ppm
    """,
    tags=("sampling", "multilingual"),
)
def sample_temperature(spark, sf_dir):
    """Temperature-based language rebalancing (alpha = 0.5): per-language
    keep-rate sqrt(n_min/n_l), membership decided by a row-pure hash
    threshold — stable under retries and engine changes, like every sampler
    here. Plan shape: one partial-aggregated shuffle for the per-language
    counts (|langs| rows), the rate table broadcast back onto the corpus
    scan, then one aggregating shuffle for the report — the actual document
    selection is a narrow projection, so the 100 TB path is two scans with
    nothing but lang-cardinality state moving."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_docs",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n_docs")) * 1000000 + 0.5
        ).cast("long").alias("rate_ppm"),
    )
    hash24 = hash_prefix(F.col("doc_id"), "temp", 6)
    selected = F.when(hash24 * 1000000 < F.col("rate_ppm") * TEMP_HASH_SPACE, 1).otherwise(0)
    return (
        d.join(F.broadcast(rates), "lang")
        .select("lang", "n_docs", "rate_ppm", selected.alias("sel"))
        .groupBy("lang", "n_docs", "rate_ppm")
        .agg(F.sum("sel").cast("long").alias("n_sampled"))
    )


MAX_EPOCHS = 4  # repetition cap — past ~4 epochs repetition hurts quality


@query(
    "sample_mix_epochs",
    oracle=f"""
    WITH tok AS (
      SELECT source,
             CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_tokens,
           least({MAX_EPOCHS},
                 greatest(1, (SELECT max(n_tokens) FROM tok) // n_tokens))
             AS epochs,
           n_tokens * least({MAX_EPOCHS},
                 greatest(1, (SELECT max(n_tokens) FROM tok) // n_tokens))
             AS effective_tokens
    FROM tok
    """,
    tags=("sampling", "mixture"),
)
def sample_mix_epochs(spark, sf_dir):
    """Data-mixture epoch planner: repeat each source up to the largest
    source's token budget, capped at MAX_EPOCHS — the standard recipe for
    upweighting small high-quality sources in a training mix. All integer
    arithmetic (token counts, floor-division epochs), so the plan is
    reproducible to the byte. One partial-aggregated shuffle keyed by
    source; the 1-row max broadcasts — token-counting 100 TB is the scan,
    the planning math is free."""
    d = load(spark, sf_dir, "documents")
    n_tok = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    tok = d.groupBy("source").agg(F.sum(n_tok).cast("long").alias("n_tokens"))
    mx = tok.agg(F.max("n_tokens").alias("max_tokens"))
    # exact integer `div`, not floor(double /): a true quotient just below
    # an epoch boundary rounds UP across the integer once token counts pass
    # ~2^52, diverging from the oracle's exact `//` (code-review r6 — the
    # same hazard ADVICE r4 fixed in the Markov NLL)
    epochs = F.least(
        F.lit(MAX_EPOCHS),
        F.greatest(F.lit(1), F.expr("max_tokens div n_tokens")),
    ).cast("long")
    return (
        tok.crossJoin(F.broadcast(mx))
        .select(
            "source",
            "n_tokens",
            epochs.alias("epochs"),
            (F.col("n_tokens") * epochs).alias("effective_tokens"),
        )
    )


RESERVOIR_K = 100


@query(
    "sample_weighted_reservoir",
    oracle=f"""
    SELECT doc_id, lang, n_chars, sample_key, rank FROM (
      SELECT doc_id, lang, n_chars, sample_key,
             CAST(row_number() OVER (ORDER BY sample_key DESC, doc_id)
                  AS INTEGER) AS rank
      FROM (
        SELECT doc_id, lang, n_chars,
               floor((ln(({_hash32_sql('doc_id', 'ares')} + 1) / 4294967296.0)
                      / n_chars) * 1000000.0 + 0.5) / 1000000.0 AS sample_key
        FROM documents WHERE n_chars > 0
      )
    ) WHERE rank <= {RESERVOIR_K}
    """,
    tags=("sampling", "weighted", "reservoir"),
)
def sample_weighted_reservoir(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): each doc draws key = ln(u)/w with weight w = n_chars
    and u derived from a salted content hash instead of an RNG, and the
    global top-K keys are the sample. Hash-derived u makes the draw
    REPRODUCIBLE — the same corpus yields the same sample on any engine,
    any partitioning, any retry — which is what a training-mix pipeline
    needs from 'random' subsetting (Spark's rand() is neither retry- nor
    engine-stable). u = (hash32+1)/2^32 is an exact dyadic double, so both
    engines see bit-identical u; ln() may differ in the last ulp across
    libms, so the key is rounded to 1e-6 BEFORE ranking (house discipline)
    with doc_id as the tiebreak. Plan shape: narrow projection + global
    top-K (WindowGroupLimit: per-partition top-K then merge of K x
    partitions rows) — one scan, no full sort, at any corpus size."""
    u = (hash32(F.col("doc_id"), "ares") + 1).cast("double") / F.lit(
        float(2 ** 32)
    )
    key = round_half_up(F.log(u) / F.col("n_chars").cast("double"), 6)
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", "n_chars", key.alias("sample_key"))
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("sample_key"), F.asc("doc_id"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RESERVOIR_K)
        .select("doc_id", "lang", "n_chars", "sample_key", "rank")
    )


# ---------------------------------------------------------------------------
# Domain-mixture rebalancing (r5): the per-source sampling weights that turn
# the corpus's ACTUAL source mix into a uniform TARGET mix — the data-mixture
# step (DoReMi/Pile-style, with a fixed uniform target) that sits between
# curation and epoch sampling in a training pipeline. weight > 1e6 means the
# source is under-represented and gets oversampled (its docs repeat across
# an epoch in expectation); < 1e6 means downsampled.
# ---------------------------------------------------------------------------


@query(
    "sample_domain_mix",
    oracle="""
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS n_sources
      FROM per
    )
    SELECT p.source, p.n_docs,
           CAST((1000000 * p.n_docs) // t.n_total AS BIGINT)
             AS actual_share_micro,
           CAST((1000000 * t.n_total) // (t.n_sources * p.n_docs) AS BIGINT)
             AS weight_micro
    FROM per p, tot t
    """,
    tags=("sampling", "mixture"),
)
def sample_domain_mix(spark, sf_dir):
    """Per-source mixture weights for a uniform target: each source's actual
    corpus share and the sampling weight (x 1e6) that equalizes expected
    per-source mass — weight = target_share / actual_share = N / (S * n_s),
    computed with exact integer floor division (no doubles anywhere, so the
    artifact is bit-identical at any corpus size).

    Scale shape: one partial-aggregated count per source (shuffle carries
    #sources rows), the totals attach as a broadcast 1-row scalar — the
    whole operator reads the corpus once."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr("(1000000 * n_docs) div n_total").cast("long")
        .alias("actual_share_micro"),
        F.expr("(1000000 * n_total) div (n_sources * n_docs)").cast("long")
        .alias("weight_micro"),
    )
