"""Unit tests for the r8 additions: CDC MERGE snapshot reconciliation,
incremental snapshot dedup (bloom routing — in test_ext.py), paragraph
keep-first dedup (in test_ext.py), capped SemDeDup, and the append-mode
sliding window. The oracle sweep proves end-to-end hashes; these pin the
SEMANTIC branches each operator exists for."""

import datetime as dt

from pyspark.sql import functions as F

from aws_vpc_flow_log_appender_spark.operators.relational import cdc_merge_snapshot


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_cdc_merge_snapshot_all_four_branches(spark, tmp_path):
    """Planted changelog hitting every MERGE branch: carry (no change row),
    update (op=U on existing key, latest change wins), insert (op=U on a
    key absent from base), delete (op=D removes the key), and delete-of-
    missing (no-op, key absent from output)."""
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: base only (event_id % 4 != 0) -> carry
        (1, t(0), 1, "view", 1.0, "{}"),
        # user 2: base + TWO changes (%4 == 0); the later change wins
        (2, t(0), 2, "view", 2.0, "{}"),
        (4, t(1), 2, "click", 2.5, "{}"),
        (8, t(2), 2, "signup", 2.75, "{}"),
        # user 3: base + delete marker
        (3, t(0), 3, "view", 3.0, "{}"),
        (12, t(1), 3, "error", 3.5, "{}"),
        # user 4: change only, op=U -> insert
        (16, t(0), 4, "purchase", 4.0, "{}"),
        # user 5: change only, op=D -> no-op (delete of a missing key)
        (20, t(0), 5, "error", 5.0, "{}"),
        # user 6: base latest-per-key — later base event wins, then carries
        (5, t(0), 6, "view", 6.0, "{}"),
        (9, t(3), 6, "click", 6.5, "{}"),
    ]
    d = str(tmp_path / "cdc")
    _write_events(spark, d, rows)

    out = {r["user_id"]: r for r in cdc_merge_snapshot(spark, d).collect()}
    assert set(out) == {1, 2, 4, 6}  # 3 deleted, 5 never existed
    assert out[1]["action"] == "carry" and out[1]["state"] == "view"
    assert out[2]["action"] == "update"
    assert out[2]["state"] == "signup" and out[2]["value"] == 2.75
    assert out[4]["action"] == "insert" and out[4]["state"] == "purchase"
    assert out[6]["action"] == "carry" and out[6]["state"] == "click"
    assert out[6]["value"] == 6.5


def test_dedup_semantic_capped_monotone_and_cap_active(spark, sf_dir):
    """Capping only removes CHALLENGERS, so every vector dedup_semantic
    keeps is also kept by the capped variant (per-vector monotonicity);
    and the cap must be genuinely ACTIVE on the fixture — hot cells with
    real sub-buckets AND cold cells still on the exact path — or the
    driver row would prove nothing about the safety valve."""
    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        SEMDEDUP_CELL_CAP,
        dedup_semantic,
        dedup_semantic_capped,
    )

    plain = {r["vec_id"]: r for r in dedup_semantic(spark, sf_dir).collect()}
    capped = {
        r["vec_id"]: r for r in dedup_semantic_capped(spark, sf_dir).collect()
    }
    assert set(plain) == set(capped)  # every member decided in both
    for vid, p in plain.items():
        c = capped[vid]
        assert c["cluster_id"] == p["cluster_id"]
        if p["kept"] == 1:
            assert c["kept"] == 1  # monotone: capping never drops more

    # cap engaged: hot cells produce nonzero sub-buckets…
    subs = {}
    for r in capped.values():
        subs.setdefault(r["cluster_id"], set()).add(r["sub_bucket"])
    assert any(s - {0} for s in subs.values())
    # …and at least one cell stays on the exact path at sf<=0.01
    from collections import Counter

    cell_n = Counter(r["cluster_id"] for r in capped.values())
    assert any(n <= SEMDEDUP_CELL_CAP for n in cell_n.values())
    for cid, n in cell_n.items():
        if n <= SEMDEDUP_CELL_CAP:
            assert subs[cid] == {0}


def test_stream_cdc_merge_across_epochs(spark, tmp_path):
    """Planted change stream spanning all four time-quarter micro-batches:
    delete removes across batches, delete-then-reinsert survives, carried
    rows keep the epoch of their LAST change (proving the snapshot really
    is built batch over batch, not in one pass)."""
    from aws_vpc_flow_log_appender_spark.streaming.queries import (
        stream_cdc_merge,
    )

    t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    # span 00:00..04:00; quarter = ceil((4h+1us)/4) = 1h + 1us, so the hour-k
    # event lands in epoch floor(k*1h / (1h+1us)) = max(k-1, 0)... except
    # t(0) -> 0 and t(4) -> 3: epochs are 0,0,1,2,3 for hours 0..4
    rows = [
        # user 1: upserted e0, deleted e1 -> absent
        (1, t(0), 1, "view", 1.0, "{}"),
        (2, t(2), 1, "error", 1.5, "{}"),
        # user 2: inserted e0 (t1h), updated e2 (t3h) -> present at e2 value
        (3, t(1), 2, "click", 2.0, "{}"),
        (4, t(3), 2, "signup", 2.5, "{}"),
        # user 3: only e0 -> carried through three merges, last_epoch 0
        (5, t(0), 3, "view", 3.0, "{}"),
        # user 4: delete-of-missing in e0 (no-op), inserted e1
        (6, t(1), 4, "error", 4.0, "{}"),
        (7, t(2), 4, "purchase", 4.5, "{}"),
        # user 5: pins the span end (t(4) -> epoch 3)
        (8, t(4), 5, "view", 5.0, "{}"),
    ]
    d = str(tmp_path / "cdcstream")
    _write_events(spark, d, rows)

    out = {r["user_id"]: r for r in stream_cdc_merge(spark, d).collect()}
    assert set(out) == {2, 3, 4, 5}
    assert out[2]["state"] == "signup" and out[2]["value"] == 2.5
    assert out[2]["last_epoch"] == 2
    assert out[3]["state"] == "view" and out[3]["last_epoch"] == 0
    assert out[4]["state"] == "purchase" and out[4]["last_epoch"] == 1
    assert out[5]["last_epoch"] == 3
