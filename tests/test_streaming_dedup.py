"""Streaming dedup (dropDuplicatesWithinWatermark): first-arrival-kept
semantics within the horizon, bounded state, and near-dup key collapse."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_vpc_flow_log_appender_spark.streaming.dedup import (
    dedup_exact_within_watermark,
    dedup_simhash_within_watermark,
)

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
])

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_docs(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _run(spark, stream_df, name):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    spark.catalog.dropTempView(name)
    return rows


def test_exact_dedup_drops_in_horizon_duplicates(spark, tmp_path):
    m = dt.timedelta(minutes=1)
    rows = [
        (1, BASE + 0 * m, "alpha beta gamma"),
        (2, BASE + 1 * m, "alpha beta gamma"),   # dup inside horizon -> drop
        (3, BASE + 2 * m, "something different"),
        (4, BASE + 3 * m, "alpha beta gamma"),   # still inside -> drop
    ]
    src = str(tmp_path / "src")
    _mk_docs(spark, rows, src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    got = _run(
        spark, dedup_exact_within_watermark(stream, delay="10 minutes"),
        "sdedup_exact",
    )
    assert sorted(r["doc_id"] for r in got) == [1, 3]
    # payload column survives untouched; helper key column is dropped
    assert set(got[0].asDict()) == {"doc_id", "ts", "text"}


def test_exact_dedup_readmits_after_horizon(spark, tmp_path):
    """A duplicate arriving after the watermark evicted its key's state is
    kept again — the documented horizon semantics (state is bounded, so
    cross-horizon dedup is explicitly out of contract)."""
    import time

    h = dt.timedelta(hours=1)
    m = dt.timedelta(minutes=1)
    src = str(tmp_path / "src2")
    # the watermark a batch runs with comes from the PREVIOUS batch, and
    # state eviction needs a batch to run under the advanced watermark —
    # hence two clock-advancing batches between original and re-arrival
    _mk_docs(spark, [(1, BASE, "dup text here")], src + "/f1")
    time.sleep(1.1)
    _mk_docs(spark, [(2, BASE + 3 * h, "advance the clock")], src + "/f2")
    time.sleep(1.1)
    _mk_docs(spark, [(3, BASE + 3 * h + 1 * m, "advance again")], src + "/f3")
    time.sleep(1.1)
    # same payload, 3h later — key state evicted (10 min delay long passed)
    _mk_docs(spark, [(4, BASE + 3 * h + 2 * m, "dup text here")], src + "/f4")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    got = _run(
        spark, dedup_exact_within_watermark(stream, delay="10 minutes"),
        "sdedup_readmit",
    )
    assert sorted(r["doc_id"] for r in got) == [1, 2, 3, 4]


def test_simhash_dedup_collapses_multiset_equivalents(spark, tmp_path):
    """Full-key (64-bit) streaming simhash dedup collapses token-multiset
    equivalents — reordered words, extra whitespace — while keeping
    genuinely different docs. (Small-EDIT collapse is the batch banded
    pair join's job; key equality can't see Hamming-near keys.)"""
    m = dt.timedelta(minutes=1)
    words = [f"word{i}" for i in range(200)]
    base_text = " ".join(words)
    reordered = "  ".join(reversed(words))  # same multiset, order+whitespace
    distinct = " ".join(f"other{i}" for i in range(200))
    rows = [
        (1, BASE + 0 * m, base_text),
        (2, BASE + 1 * m, reordered),       # same simhash key -> drop
        (3, BASE + 2 * m, distinct),
    ]
    src = str(tmp_path / "src3")
    _mk_docs(spark, rows, src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    got = _run(
        spark, dedup_simhash_within_watermark(stream, delay="10 minutes"),
        "sdedup_near",
    )
    kept = sorted(r["doc_id"] for r in got)
    assert kept == [1, 3], kept


def test_simhash_stream_plan_is_single_projection(spark, tmp_path):
    """The 64-bit fold must stay one codegen'd projection feeding the
    stateful dedup — no aggregation/exchange before the watermark."""
    src = str(tmp_path / "src4")
    _mk_docs(spark, [(1, BASE, "a b c")], src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    dd = dedup_simhash_within_watermark(stream)
    plan = dd._jdf.queryExecution().analyzed().toString()
    assert "Aggregate" not in plan
    assert "DeduplicateWithinWatermark" in plan


def test_null_text_rows_all_pass_through(spark, tmp_path):
    """NULL payloads must NOT collapse: md5(NULL)/fold-over-split(NULL) are
    NULL, and NULL keys compare equal in the dedup state store — the guard
    gives each null-text row a unique fallback key (ADVICE r3)."""
    m = dt.timedelta(minutes=1)
    rows = [
        (1, BASE + 0 * m, None),
        (2, BASE + 1 * m, None),
        (3, BASE + 2 * m, "real text"),
        (4, BASE + 3 * m, None),
    ]
    for fn, name in (
        (dedup_exact_within_watermark, "sdedup_null_exact"),
        (dedup_simhash_within_watermark, "sdedup_null_simhash"),
    ):
        src = str(tmp_path / name)
        _mk_docs(spark, rows, src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        got = _run(spark, fn(stream, delay="10 minutes"), name)
        assert sorted(r["doc_id"] for r in got) == [1, 2, 3, 4]


def test_stream_content_dedup_classes_on_synthetic_corpus(spark, tmp_path):
    """Pins the registered stream_content_dedup's drop/evict/survive classes
    end-to-end on a 20-doc corpus (every doc_id%10 class populated twice):
    each emitted row carries its staged arrival epoch, and append-mode
    emission is same-batch, so the result set itself is the per-batch
    witness — epoch 0 = all first deliveries, epochs 1 and 2 EMPTY (the
    in-horizon, watermark-lag, and eviction-lag drop classes), epoch 3 =
    exactly the %10==5 post-eviction re-deliveries. This is the permanent
    pin for the eviction-is-physical-at-batch-end behavior the query's
    slice schedule is built around."""
    from aws_vpc_flow_log_appender_spark.streaming.queries import (
        stream_content_dedup,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", f"src{i % 3}", 10) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = stream_content_dedup(spark, str(tmp_path)).collect()
    by_epoch: dict[int, list[int]] = {}
    for r in got:
        by_epoch.setdefault(r["epoch"], []).append(r["doc_id"])
    assert sorted(by_epoch.pop(0)) == list(range(20))  # every first delivery
    assert sorted(by_epoch.pop(3)) == [5, 15]          # post-eviction survivors
    assert by_epoch == {}  # epochs 1/2 (both drop classes) emitted nothing


def test_md5_fold_key_matches_batch_sketch_exhaustively(spark):
    """The stream_simhash_dedup parity claim, pinned: the per-row md5 fold
    (the production expressions via simhash_fold_exprs) computes the SAME
    64-bit fingerprint as the batch explode+groupBy sketch for EVERY sf0.01
    document — any divergence (chunk order, sign-bit weight, empty-token
    handling) would silently re-group the streaming dedup."""
    from aws_vpc_flow_log_appender_spark.ext.dedup import dedup_simhash
    from aws_vpc_flow_log_appender_spark.operators.registry import load
    from aws_vpc_flow_log_appender_spark.streaming.dedup import (
        simhash_fold_exprs,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    hashes, counts, key = simhash_fold_exprs("text", "md5")
    per_row = (
        load(spark, sf, "documents")
        .withColumn("__sh_hashes", hashes)
        .withColumn("__sh_counts", counts)
        .select("doc_id", key.alias("fold_key"))
    )
    batch = dedup_simhash(spark, sf)
    joined = batch.join(per_row, "doc_id")
    n = joined.count()
    assert n == batch.count()  # every batch-fingerprinted doc compared
    assert joined.filter(F.col("simhash") != F.col("fold_key")).count() == 0


def test_stream_simhash_dedup_merges_colliding_docs(spark):
    """At sf0.01 the corpus contains at least one genuine SimHash collision
    (token-multiset-equivalent near-dups): the survivor set must be SMALLER
    than the document count, and every surviving (epoch 0) fingerprint
    unique — byte-hash dedup could never merge these rows."""
    from aws_vpc_flow_log_appender_spark.streaming.queries import (
        stream_simhash_dedup,
    )
    from aws_vpc_flow_log_appender_spark.operators.registry import load
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    got = stream_simhash_dedup(spark, sf)
    originals = got.filter(F.col("epoch") == 0)
    n_docs = load(spark, sf, "documents").count()
    n_orig = originals.count()
    assert n_orig < n_docs  # at least one near-dup group merged
    assert originals.select("simhash").distinct().count() == n_orig
