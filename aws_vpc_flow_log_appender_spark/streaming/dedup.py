"""Streaming deduplication — the ingestion-side twin of ext/dedup.py.

A streaming corpus pipeline can't run batch global dedup (state would grow
with the whole stream); the scalable contract is "drop duplicates arriving
within an event-time horizon". Spark 4's ``dropDuplicatesWithinWatermark``
implements exactly that: state per key is kept only until the watermark
passes the key's last-seen event time plus the delay, so state is
(horizon x duplicate-key arrival rate), independent of stream length —
the same bounded-state argument as the windowed aggregates in windows.py.

Two keying strategies, mirroring the batch family:
 - exact:   key = md5(payload) — byte-identical duplicates;
 - near:    key = 64-bit SimHash bucket (batch twin ext/dedup.py:270) —
   near-identical duplicates collapse to the same key; banding is NOT
   needed here because streaming dedup only equi-matches keys, it never
   joins candidate pairs.

Contrast with ``stateful.dedup_first_occurrence_stream``: that operator is
exactly-once-by-recordId with UNBOUNDED state (reference retry-model parity,
ingestor/index.js:137-140, where the key space is the delivery id and must
never expire); these operators dedup by CONTENT with watermark-bounded
state — the right contract when the key space grows with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_within_watermark(docs: DataFrame, ts_col: str = "ts",
                                 text_col: str = "text",
                                 delay: str = "10 minutes") -> DataFrame:
    """Keep the first arrival of each exact payload within the watermark
    horizon; re-arrivals inside the horizon are dropped, and state for a
    hash is evicted once the watermark passes its event time + delay.

    The content hash is computed JVM-side (one md5 per row, no Python);
    adding it BEFORE the watermark keeps the plan a single stateful
    operator over (key, event-time).

    NULL payloads get a unique per-row fallback key: md5(NULL) is NULL and
    ``dropDuplicatesWithinWatermark`` treats NULL keys as equal, so without
    the guard every null-text document in the horizon would silently
    collapse to one survivor. A fresh uuid per row means null-text rows are
    never deduped against each other (uuid's per-retry nondeterminism is
    harmless here — every value is unique, so the operator drops nothing
    either way)."""
    keyed = docs.withColumn(
        "__content_key",
        F.coalesce(
            F.md5(F.encode(text_col, "utf-8")),
            F.concat(F.lit("null-text:"), F.uuid()),
        ),
    )
    return (
        keyed.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["__content_key"])
        .drop("__content_key")
    )


def dedup_simhash_within_watermark(docs: DataFrame, ts_col: str = "ts",
                                   text_col: str = "text",
                                   delay: str = "10 minutes",
                                   key_bits: int = 64,
                                   word_hash: str = "xxhash64") -> DataFrame:
    """Near-dup streaming dedup: documents whose SimHash key collides within
    the horizon collapse to the first arrival. Same sign-sum sketch family
    as the batch dedup_simhash (ext/dedup.py:270) but computed per-row with
    F.aggregate over the word array (xxhash64 bit votes) instead of
    explode+groupBy — a streaming plan must not put an aggregation before
    the stateful dedup operator, and the per-row fold keeps it one
    codegen'd projection.

    What equi-key matching can and cannot catch: with the full 64-bit key
    (default) only token-multiset-equivalent docs collide (reorderings,
    whitespace/framing variants — the bulk of scrape-time duplicates);
    docs differing by a few tokens land in Hamming-NEAR keys, which a
    streaming key-equality operator cannot match — that recall belongs to
    the batch banded pair join (dedup_simhash_pairs). ``key_bits < 64``
    keys on the top SimHash bits instead: aggressive small-edit collapse
    at the cost of some false merges (prefix bits each flip independently
    with low probability under small edits).

    ``word_hash``: 'xxhash64' (default — the production key: one 64-bit
    JVM hash per word, empty tokens filtered) or 'md5' — the EXACT per-row
    twin of the batch dedup_simhash sketch (ext/dedup.py: md5 hex chunks
    c0/c1, bit j of 64 taken MSB-first, every split token votes including
    empties). The md5 mode exists so the streaming key is reproducible by
    the DuckDB oracle AND provably equal to the batch fingerprint — the
    registered stream_simhash_dedup query's group structure is computed
    with the batch explode+groupBy machinery and its drops are decided by
    this per-row fold; a hash-green row means the two formulations agree
    on every document."""
    if not 1 <= key_bits <= 64:
        raise ValueError(f"key_bits must be in [1, 64], got {key_bits}")
    hashes, counts, simhash = simhash_fold_exprs(text_col, word_hash)
    if key_bits < 64:
        simhash = F.shiftright(simhash, 64 - key_bits)
    # NULL-payload guard (same rationale as dedup_exact_within_watermark),
    # keyed on the text column itself: split(NULL) makes the whole fold
    # NULL, and a NULL key would collapse every null-text doc together —
    # give them unique pass-through keys instead.
    keyed = (
        docs.withColumn("__sh_hashes", hashes)
        .withColumn("__sh_counts", counts)
        .withColumn(
            "__simhash_key",
            F.when(
                F.col(text_col).isNull(),
                F.concat(F.lit("null-text:"), F.uuid()),
            ).otherwise(simhash.cast("string")),
        )
        .drop("__sh_hashes", "__sh_counts")
    )
    return (
        keyed.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["__simhash_key"])
        .drop("__simhash_key")
    )


def simhash_fold_exprs(text_col: str, word_hash: str):
    """(hashes, counts, simhash) Column expressions for the per-row SimHash
    fold, staged as __sh_hashes -> __sh_counts -> key. Exposed separately so
    tests can apply the EXACT production expressions to a batch frame and
    cross-check the md5 mode against the batch explode+groupBy sketch
    exhaustively (the oracle-parity claim of stream_simhash_dedup).

    Hash each word ONCE, then run all 64 bit votes over the precomputed
    hash array (code-review r6: the previous formulation was 64
    independent F.aggregate folds each recomputing xxhash64(word) inside
    its lambda — Spark does not CSE across higher-order-function lambdas,
    so every ingested row paid 64x the necessary hashing). Staged
    withColumns keep each expensive alias referenced exactly once;
    CollapseProject declines to inline non-cheap aliases, so each stage
    evaluates once per row (verified against the optimized plan)."""
    if word_hash not in ("xxhash64", "md5"):
        raise ValueError(f"word_hash must be 'xxhash64' or 'md5', got {word_hash!r}")
    if word_hash == "xxhash64":
        hashes = F.expr(
            f"transform(filter(split({text_col}, ' '), w -> length(w) > 0), "
            "w -> xxhash64(w))"
        )
        # one traversal: fold the hash array into a 64-long vote-count array
        # (zip_with does the 64 +/-1 votes per word; shiftright takes a
        # COLUMN shift amount in SQL, which python F.shiftright does not)
        counts = F.expr(
            "aggregate(__sh_hashes, array_repeat(0L, 64), "
            "(acc, h) -> zip_with(acc, sequence(0, 63), "
            "(a, i) -> a + IF((shiftright(h, i) & 1) = 1, 1L, -1L)))"
        )
        # majority votes -> bits -> one BIGINT key (disjoint bits, OR-fold)
        simhash = F.expr(
            "aggregate(zip_with(__sh_counts, sequence(0, 63), "
            "(c, i) -> IF(c > 0, shiftleft(1L, i), 0L)), 0L, (a, b) -> a | b)"
        )
    else:  # md5 — batch-sketch parity (no empty-token filter: batch votes
        # md5('') for double spaces; bit j in 1..64 MSB-first from hex
        # chunks c0 = bits 1-32, c1 = bits 33-64, exactly _SIMHASH_POS)
        hashes = F.expr(
            f"transform(split({text_col}, ' '), w -> named_struct("
            "'c0', cast(conv(substring(md5(encode(w, 'utf-8')), 1, 8), 16, 10) as bigint), "
            "'c1', cast(conv(substring(md5(encode(w, 'utf-8')), 9, 8), 16, 10) as bigint)))"
        )
        counts = F.expr(
            "aggregate(__sh_hashes, array_repeat(0L, 64), "
            "(acc, s) -> zip_with(acc, sequence(1, 64), "
            "(a, j) -> a + IF((IF(j <= 32, shiftright(s.c0, 32 - j), "
            "shiftright(s.c1, 64 - j)) & 1) = 1, 1L, -1L)))"
        )
        # shiftleft(1L, 63) IS java Long.MIN_VALUE, so the j=1 sign-bit case
        # needs no special weight (matches _SPARK_SQL_SIMHASH_VAL's -2^63)
        simhash = F.expr(
            "aggregate(zip_with(__sh_counts, sequence(1, 64), "
            "(c, j) -> IF(c > 0, shiftleft(1L, 64 - j), 0L)), 0L, (a, b) -> a | b)"
        )
    return hashes, counts, simhash
