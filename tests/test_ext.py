"""Extension-operator tests: dedup candidate quality, ANN recall of the
pruned tiers vs the brute-force baseline, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from aws_vpc_flow_log_appender_spark.ext import multimodal
from aws_vpc_flow_log_appender_spark.ext.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)
from aws_vpc_flow_log_appender_spark.ext.similarity import (
    sim_bruteforce_topk,
    sim_ivf_topk,
    sim_rp_lsh_topk,
)


def test_minhash_finds_prefix_dups(spark, sf_dir):
    """The corpus contains near-duplicate documents (shared long prefixes);
    banded MinHash must surface candidate pairs with real shingle overlap."""
    pairs = dedup_minhash_lsh(spark, sf_dir).collect()
    assert pairs, "no candidate pairs found"
    jacc = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup_ngram_jaccard(spark, sf_dir).collect()}
    verified = [p for p in pairs if jacc.get((p["doc_a"], p["doc_b"]), 0) > 0.2]
    # most banded candidates should be genuine near-dups (bands of 2 of 8
    # minhashes target jaccard ~>0.5; allow LSH false positives)
    assert len(verified) >= len(pairs) * 0.5


def test_ann_pruned_recall(spark, sf_dir):
    base = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_bruteforce_topk(spark, sf_dir).collect()
    }
    assert len(base) == 50  # 10 queries x top-5
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_ivf_topk(spark, sf_dir).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_rp_lsh_topk(spark, sf_dir).collect()
    }
    # pruned tiers return subsets of the corpus scored identically, so any
    # pair they emit that is also in base must agree; recall just needs to be
    # non-degenerate (data-dependent: random embeddings cluster weakly)
    assert ivf and lsh
    assert len(ivf & base) > 0 or len(lsh & base) > 0


def test_multimodal_feature_plumbing(spark, sf_dir):
    media = multimodal.documents_as_media(spark, sf_dir)
    feats = multimodal.decode_and_featurize(media)
    rows = feats.collect()
    try:
        import PIL  # noqa: F401
        # with PIL, image/* payloads attempt real decode; the utf-8 fixture
        # bytes are not valid images so they fall back row-wise
        ok = {"stub-decoded", "decoded", "decode-failed-synthetic"}
        assert all(r["status"] in ok for r in rows)
    except ImportError:
        assert all(r["status"] == "stub-decoded" for r in rows)
    assert all(len(r["feature"]) == 8 for r in rows if r["feature"] is not None)
    n_media = media.count()
    assert len(rows) == n_media

    frames = multimodal.sample_frames(media, every_n_bytes=64)
    f = frames.collect()
    assert len(f) > n_media  # 1-to-many explode
    # frame_idx dense from 0 per media_id
    per = {}
    for r in f:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == list(range(len(v))) for v in per.values())


def test_multimodal_resize_degrades_without_pil(spark, sf_dir):
    """Without PIL the resize kernel must DEGRADE to the deterministic
    synthetic byte-resample — same schema and 1-to-1 row shape as the real
    decode path — not fail the job."""
    media = multimodal.documents_as_media(spark, sf_dir).limit(5)
    rows = multimodal.resize_image(media, 8, 4).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["status"] == "synthetic-resized"
        assert len(r["payload"]) == 8 * 4
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4
        assert r["meta"]["n_bytes"] == 8 * 4
    # deterministic: same input -> same bytes
    again = multimodal.resize_image(media, 8, 4).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in rows} == {
        r["media_id"]: bytes(r["payload"]) for r in again
    }


def test_exact_dedup_counts(spark, sf_dir):
    from aws_vpc_flow_log_appender_spark.ext.dedup import dedup_exact

    df = dedup_exact(spark, sf_dir)
    total = df.count()
    keepers = df.filter(F.col("dup_rank") == 1).count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total == docs
    assert keepers <= total


def test_hot_cell_cap_bounds_candidates(spark):
    """A cell above CELL_CAP must split into multiple RP-sketch sub-buckets
    (bounding the per-cell pair join below cell^2); a cell at/below the cap
    must keep sub_bucket == 0 everywhere, i.e. the capped path is inactive
    and per-cell semantics — and the driver oracle — are exact."""
    import random

    from aws_vpc_flow_log_appender_spark.ext.similarity import with_capped_cell

    rng = random.Random(7)
    rows = [(i, 0, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(128)]
    e = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )

    capped = with_capped_cell(e, "label", cell_cap=32, n_sub_bits=3, dim=8)
    sizes = [r["n"] for r in capped.groupBy("sub_bucket").agg(
        F.count("*").alias("n")).collect()]
    assert len(sizes) > 1, "hot cell was not split"
    assert sum(n * n for n in sizes) < 128 * 128  # candidate bound tightened

    inactive = with_capped_cell(e, "label", cell_cap=128, n_sub_bits=3, dim=8)
    assert inactive.select("sub_bucket").distinct().collect()[0]["sub_bucket"] == 0
    assert inactive.filter(F.col("sub_bucket") != 0).count() == 0


def test_embedding_nn_capped_stays_within_sub_buckets(spark):
    """With a small cap, every emitted nearest neighbor must share the
    query's sub-bucket — the join shape that bounds a hot cell."""
    import random

    from aws_vpc_flow_log_appender_spark.ext.dedup import _embedding_nn
    from aws_vpc_flow_log_appender_spark.ext.similarity import with_capped_cell

    rng = random.Random(11)
    rows = [(i, 0, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)]
    e = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    nn = {r["vec_id"]: r["nn_id"]
          for r in _embedding_nn(e, cell_cap=16, n_sub_bits=2, dim=8).collect()}
    assert nn, "no neighbors found"
    bucket = {r["vec_id"]: r["sub_bucket"]
              for r in with_capped_cell(e, "label", 16, 2, dim=8).collect()}
    for v, n in nn.items():
        assert bucket[v] == bucket[n]


def test_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    """Multi-probe IVF exists to fix the single-probe recall trade: against
    the brute-force ground truth it must never recall fewer true neighbors
    than probing only the query's own cell."""
    from aws_vpc_flow_log_appender_spark.ext.similarity import sim_ivf_multiprobe

    base = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_bruteforce_topk(spark, sf_dir).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_ivf_topk(spark, sf_dir).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_ivf_multiprobe(spark, sf_dir).collect()
    }
    assert len(multi & base) >= len(single & base)
    assert len(multi) == 50  # 10 queries x top-5, cells always non-empty


def test_holdout_split_is_deterministic_and_near_rate(spark, sf_dir):
    """Hash-based splits must be row-pure (identical across runs) and close
    to the target 90/10 in aggregate."""
    from aws_vpc_flow_log_appender_spark.ext.sampling import sample_holdout_split

    a = {r["doc_id"]: r["split"] for r in sample_holdout_split(spark, sf_dir).collect()}
    b = {r["doc_id"]: r["split"] for r in sample_holdout_split(spark, sf_dir).collect()}
    assert a == b
    train_frac = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.84 <= train_frac <= 0.96  # 500 docs, binomial(0.9) tolerance


def test_pack_sequences_conserves_tokens_and_is_dense(spark, sf_dir):
    """Packing must conserve the token stream (no doc dropped or double
    packed) and produce dense sequence ids per source."""
    from aws_vpc_flow_log_appender_spark.ext.sampling import text_pack_sequences
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    packed = text_pack_sequences(spark, sf_dir).collect()
    d = load(spark, sf_dir, "documents")
    total_tokens = d.select(
        F.sum(
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).alias("t")
    ).collect()[0]["t"]
    assert sum(r["n_tokens"] for r in packed) == total_tokens
    per_source = {}
    for r in packed:
        per_source.setdefault(r["source"], []).append(r["seq_id"])
    for seqs in per_source.values():
        assert sorted(seqs) == list(range(len(seqs)))


def test_simhash_hot_bucket_rebanding_preserves_output(spark):
    """Hot-bucket re-banding is candidate pruning only: on a corpus whose
    band-0 bucket exceeds the cap, the capped join must emit EXACTLY the
    pairs of the direct join (pigeonhole recall proof in _simhash_pairs)."""
    import random

    from aws_vpc_flow_log_appender_spark.ext.dedup import _simhash_pairs

    rng = random.Random(13)

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = []
    doc = 0
    for _ in range(150):
        # all fingerprints share byte 0 (0xAA) -> one hot band-0 bucket
        base = (rng.getrandbits(56) << 8) | 0xAA
        rows.append((doc, signed(base))); doc += 1
        # partner at Hamming 3 within the residual bits -> qualifying pair
        flipped = base
        for bit in rng.sample(range(8, 64), 3):
            flipped ^= 1 << bit
        rows.append((doc, signed(flipped))); doc += 1
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")

    direct = {(r["doc_a"], r["doc_b"], r["hamming"])
              for r in _simhash_pairs(sig, hot_cap=10**9).collect()}
    capped = {(r["doc_a"], r["doc_b"], r["hamming"])
              for r in _simhash_pairs(sig, hot_cap=100).collect()}
    assert len(direct) >= 150  # the planted partners all qualify
    assert capped == direct


def test_simhash_pair_stats_match_exact_enumeration(spark, sf_dir):
    """The bounded-output stats query must agree EXACTLY with the full pair
    enumeration: per-Hamming counts equal the histogram of
    dedup_simhash_pairs, and each sample is a real pair at its distance."""
    from aws_vpc_flow_log_appender_spark.ext.dedup import (
        dedup_simhash_pair_stats,
        dedup_simhash_pairs,
    )

    exact = dedup_simhash_pairs(spark, sf_dir).collect()
    hist: dict[int, int] = {}
    pairs = set()
    for r in exact:
        hist[r["hamming"]] = hist.get(r["hamming"], 0) + 1
        pairs.add((r["doc_a"], r["doc_b"], r["hamming"]))
    stats = dedup_simhash_pair_stats(spark, sf_dir).collect()
    assert {r["hamming"]: r["n_pairs"] for r in stats} == hist
    for r in stats:
        assert (r["sample_doc_a"], r["sample_doc_b"], r["hamming"]) in pairs


def test_simhash_pair_stats_bounded_on_saturated_corpus(spark):
    """On a dup-saturated corpus (one content unit copied n times) the exact
    enumeration is output-quadratic — C(n,2) rows — while the stats query
    returns ONE row carrying the same count in closed form. This pins the
    capped mode's contract at the shape that cost 1354 s in the r5 100x
    smoke."""
    from aws_vpc_flow_log_appender_spark.ext.dedup import _simhash_pairs
    from pyspark.sql import Window as W

    n = 400
    sig = spark.createDataFrame(
        [(i, 123456789) for i in range(n)], "doc_id long, simhash long"
    )
    # stats path: groups collapse to ONE fingerprint row; no pair join runs
    groups = sig.groupBy("simhash").agg(
        F.count("*").alias("cnt"), F.min("doc_id").alias("m1")
    )
    g = groups.collect()
    assert len(g) == 1 and g[0]["cnt"] == n
    assert n * (n - 1) // 2 == 79800  # the closed-form count the query emits
    # exact path on the same input really is quadratic output
    assert _simhash_pairs(sig).count() == 79800


def test_bmp_parser_golden_bytes(spark):
    """The pure-stdlib BMP decoder must parse a REFERENCE file built
    byte-by-byte from the spec (not by our own encoder): 2x2 24bpp
    bottom-up, stride 8 (2 bytes padding per 6-byte row). Proves the kernel
    is a real decoder, and that malformed payloads degrade to
    header_ok=false rather than failing the batch."""
    import struct

    from aws_vpc_flow_log_appender_spark.ext.multimodal import decode_bmp_stats

    # rows bottom-up: bottom row pixels (1,2,3)(4,5,6), top row (7,8,9)(10,11,12)
    pix = bytes([1, 2, 3, 4, 5, 6, 0, 0, 7, 8, 9, 10, 11, 12, 0, 0])
    golden = (
        struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
        + pix
    )
    media = spark.createDataFrame(
        [(1, bytearray(golden)), (2, bytearray(b"not a bmp at all....")), (3, None)],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_bmp_stats(media).collect()}
    g = rows[1]
    assert (g["magic"], g["width"], g["height"], g["bpp"]) == ("BM", 2, 2, 24)
    assert g["compression"] == 0 and g["file_size"] == 54 + 16
    assert g["n_pixels"] == 4
    assert g["pixel_byte_sum"] == sum(range(1, 13))  # padding stripped
    assert g["header_ok"] is True
    assert rows[2]["header_ok"] is False and rows[2]["pixel_byte_sum"] is None
    assert rows[3]["header_ok"] is False


def test_bmp_encode_decode_roundtrip_values(spark):
    """encode_bmp -> decode_bmp_stats round-trip on a known string: dims,
    file size, and the cycled pixel byte sum match hand computation."""
    from aws_vpc_flow_log_appender_spark.ext.multimodal import (
        decode_bmp_stats,
        encode_bmp,
    )

    data = b"hello bmp decode"  # n=16 -> w=17, h=17 (recomputed below)
    n = len(data)
    w, h = 1 + n % 31, 1 + n % 17
    k = 3 * w * h
    exp_sum = (k // n) * sum(data) + sum(data[: k % n])
    pad = (4 - (3 * w) % 4) % 4
    media = spark.createDataFrame(
        [(7, bytearray(encode_bmp(data)))], "media_id long, payload binary"
    )
    r = decode_bmp_stats(media).collect()[0]
    assert (r["width"], r["height"]) == (w, h)
    assert r["file_size"] == 54 + (3 * w + pad) * h
    assert r["pixel_byte_sum"] == exp_sum and r["header_ok"] is True


def test_wav_parser_golden_bytes(spark):
    """The pure-stdlib WAV decoder against a spec-built reference file the
    encoder did NOT produce: an extra LIST chunk before data (chunk-walk
    must skip it), an odd-length chunk (padding byte must be honored), and
    a NEGATIVE 16-bit sample (signed decode). Malformed payloads degrade
    to header_ok=false."""
    import struct

    from aws_vpc_flow_log_appender_spark.ext.multimodal import decode_wav_stats

    pcm = struct.pack("<4h", 1000, -2000, 32767, -32768)
    odd_chunk = b"junk" + struct.pack("<I", 3) + b"abc\x00"  # 3-byte body + pad
    list_chunk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    body = odd_chunk + fmt + list_chunk + data
    golden = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    media = spark.createDataFrame(
        [(1, bytearray(golden)), (2, bytearray(b"RIFFxxxxAVI notwave")), (3, None)],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_wav_stats(media).collect()}
    g = rows[1]
    assert (g["riff"], g["fmt_tag"], g["n_channels"]) == ("RIFF", 1, 1)
    assert (g["sample_rate"], g["bits_per_sample"]) == (8000, 16)
    assert g["n_frames"] == 4 and g["duration_ms"] == 0
    assert g["sample_abs_sum"] == 1000 + 2000 + 32767 + 32768
    assert g["header_ok"] is True
    assert rows[2]["header_ok"] is False
    assert rows[3]["header_ok"] is False


def test_wav_truncated_data_chunk_fails_validation(spark):
    """A data chunk DECLARING more bytes than the file holds must fail
    structural validation (header_ok=false, NULL stats) — not silently
    decode the truncation (code-review r6: the chunk slice shortened the
    body without tripping any check). A fmt chunk truncated below 16 bytes
    must degrade the same way instead of crashing the batch."""
    import struct

    from aws_vpc_flow_log_appender_spark.ext.multimodal import decode_wav_stats

    pcm = struct.pack("<4h", 1, 2, 3, 4)
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    # data chunk claims 100 bytes but only 8 follow
    lying = b"data" + struct.pack("<I", 100) + pcm
    body = fmt + lying
    truncated = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    # fmt chunk itself cut off mid-header
    short_fmt = b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00"
    body2 = short_fmt
    cut_fmt = b"RIFF" + struct.pack("<I", 4 + len(body2)) + b"WAVE" + body2
    media = spark.createDataFrame(
        [(1, bytearray(truncated)), (2, bytearray(cut_fmt))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_wav_stats(media).collect()}
    assert rows[1]["header_ok"] is False
    assert rows[1]["n_frames"] is None and rows[1]["sample_abs_sum"] is None
    assert rows[2]["header_ok"] is False


def test_bmp_unsupported_depth_preserves_parsed_header(spark):
    """A structurally valid BMP at an unsupported depth (32bpp) must keep
    its PARSED header fields with header_ok=false — distinguishable from
    the all-NULL not-a-BMP row — and file_size must be the DECLARED header
    field on every parsed path (code-review r6)."""
    import struct

    from aws_vpc_flow_log_appender_spark.ext.multimodal import decode_bmp_stats

    pix32 = bytes(16)  # 2x2 BGRA, no stride padding at 32bpp
    bmp32 = (
        struct.pack("<2sIHHI", b"BM", 54 + len(pix32), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 32, 0, len(pix32),
                      2835, 2835, 0, 0)
        + pix32
    )
    media = spark.createDataFrame(
        [(1, bytearray(bmp32))], "media_id long, payload binary"
    )
    r = decode_bmp_stats(media).collect()[0]
    assert (r["magic"], r["width"], r["height"], r["bpp"]) == ("BM", 2, 2, 32)
    assert r["file_size"] == 54 + 16
    assert r["header_ok"] is False
    assert r["n_pixels"] is None and r["pixel_byte_sum"] is None


def test_minhash_lsh_recall_vs_exact_jaccard(spark, sf_dir):
    """Semantic guard for the windowed (2-md5) MinHash family: on the
    deterministic fixture, every candidate pair whose EXACT 3-shingle
    Jaccard is >= 0.8 must be produced by the banded LSH (4 bands of 2:
    P(detect | J=0.8) = 1-(1-0.64)^4 = 0.983 per pair — with the fixed
    corpus and fixed hashes this is a deterministic property, not a
    flake), and no pair with Jaccard < 0.2 may surface (band collisions
    of unrelated docs would mean the windows are correlated/too narrow)."""
    lsh = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    jac = {(r.doc_a, r.doc_b): r.jaccard
           for r in dedup_ngram_jaccard(spark, sf_dir).collect()}
    high = {p for p, j in jac.items() if j >= 0.8}
    assert high, "fixture lost its high-similarity pairs"
    assert high <= lsh, f"missed near-dups: {sorted(high - lsh)[:5]}"
    low_hits = {p for p, j in jac.items() if j < 0.2} & lsh
    assert not low_hits, f"low-similarity band collisions: {sorted(low_hits)[:5]}"


def test_connected_components_rejects_null_endpoints(spark):
    """NULL edge endpoints must fail FAST with a clear message on both
    execution paths (ADVICE r5): the small path would otherwise die inside
    createDataFrame, and the distributed path would silently drop the
    NULL-keyed rows in its joins — losing labels without any signal."""
    import pytest as _pytest

    from aws_vpc_flow_log_appender_spark.ext.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, None)], "doc_a long, doc_b long"
    )
    for cap in (1 << 18, 0):  # driver union-find path, distributed path
        with _pytest.raises(ValueError, match="NULL endpoint"):
            connected_components(edges, small_edge_cap=cap).collect()


def test_connected_components_string_ids_both_paths(spark):
    """String node ids through BOTH execution paths (code-review r6: the
    distributed loop's convergence probe was F.sum("comp") — numeric-only,
    so string-id graphs either "converged" after one round with wrong
    labels under lenient casting or threw under ANSI, a silent behavioral
    fork the operator's own docstring forbids). A 5-node chain needs
    several propagation rounds, so a premature round-1 exit would be
    caught here."""
    from aws_vpc_flow_log_appender_spark.ext.graph import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "doc_a string, doc_b string",
    )
    fast = {
        (r.doc_id, r.cluster_id) for r in connected_components(edges).collect()
    }
    distributed = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(edges, small_edge_cap=0).collect()
    }
    assert fast == distributed
    assert fast == {("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
                    ("e", "a"), ("x", "x"), ("y", "x")}


def test_connected_components_paths_agree(spark):
    """The driver union-find fast path and the distributed pointer-jumping
    loop must label identically. The fixture-scale sweeps only ever exercise
    the fast path (candidate graphs are far below SMALL_GRAPH_EDGE_CAP), so
    this test forces BOTH paths over a graph with a long chain (exercises
    pointer jumping across rounds), a star, a 2-cycle with a bridge, and
    isolated-pair components."""
    from aws_vpc_flow_log_appender_spark.ext.graph import connected_components

    edges = (
        # chain 1-2-3-4-5-6-7 (min label 1)
        [(i, i + 1) for i in range(1, 7)]
        # star centered at 20 (min label 20)
        + [(20, x) for x in (21, 22, 23, 24)]
        # cycle 30-31-32-30 bridged to 33
        + [(30, 31), (31, 32), (32, 30), (32, 33)]
        # isolated pair
        + [(40, 41)]
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(df).collect()
    }
    distributed = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(df, small_edge_cap=0).collect()
    }
    assert fast == distributed
    expected_clusters = {1: set(range(1, 8)), 20: {20, 21, 22, 23, 24},
                         30: {30, 31, 32, 33}, 40: {40, 41}}
    got = {}
    for node, label in fast:
        got.setdefault(label, set()).add(node)
    assert got == expected_clusters


def test_dq_expectations_catch_injected_violations(spark, sf_dir, tmp_path):
    """The expectation suite must actually trip: corrupt a copy of the
    fixture tables (orphan lineitem FK, out-of-range discount, empty text)
    and check the exact violation counts and pass flags flip."""
    from aws_vpc_flow_log_appender_spark.operators.profiling import dq_expectations
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    corrupt = str(tmp_path / "corrupt")
    for t in ["orders", "customer", "documents", "lineitem"]:
        df = load(spark, sf_dir, t)
        if t == "lineitem":
            df = df.withColumn(
                "l_orderkey",
                F.when(F.col("l_linenumber") == 1, F.lit(-999)).otherwise(
                    F.col("l_orderkey")
                ),
            ).withColumn(
                "l_discount",
                F.when(F.col("l_linenumber") == 2, F.lit(0.9)).otherwise(
                    F.col("l_discount")
                ),
            )
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 100 == 0, F.lit("")).otherwise(
                    F.col("text")
                ),
            )
        df.write.mode("overwrite").parquet(f"{corrupt}/{t}.parquet")

    report = {r["expectation"]: r for r in dq_expectations(spark, corrupt).collect()}
    li = load(spark, corrupt, "lineitem")
    n_orphans = li.filter(F.col("l_orderkey") == -999).count()
    n_bad_disc = li.filter(F.col("l_discount") == 0.9).count()
    n_empty = load(spark, corrupt, "documents").filter(F.length("text") == 0).count()
    assert n_orphans > 0 and n_bad_disc > 0 and n_empty > 0  # injection worked
    r = report["lineitem.orderkey_references_orders"]
    assert (r["n_violations"], r["pass"]) == (n_orphans, 0)
    r = report["lineitem.discount_in_0_to_0.1"]
    assert (r["n_violations"], r["pass"]) == (n_bad_disc, 0)
    r = report["documents.text_not_empty"]
    assert (r["n_violations"], r["pass"]) == (n_empty, 0)
    # untouched expectations still pass
    assert report["orders.custkey_references_customer"]["pass"] == 1
    assert report["orders.orderdate_not_null"]["pass"] == 1


def test_dedup_segments_scrub_identity_for_unique_docs(spark, sf_dir):
    """A doc with zero duplicated segments must rebuild EXACTLY to its own
    text (the scrub is the identity there) — pinned via the md5 contract."""
    import hashlib

    from aws_vpc_flow_log_appender_spark.ext.dedup import dedup_segments_scrub
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    out = {r["doc_id"]: r for r in dedup_segments_scrub(spark, sf_dir).collect()}
    docs = {r["doc_id"]: r["text"] for r in load(spark, sf_dir, "documents").collect()}
    assert set(out) == set(docs)
    checked = 0
    for did, text in docs.items():
        if out[did]["n_dup_segments"] == 0 and "  " not in text:
            assert out[did]["kept_md5"] == hashlib.md5(text.encode()).hexdigest()
            checked += 1
    assert checked > 0  # the property actually fired on the fixture
    # and every doc's counts are consistent
    for r in out.values():
        assert 0 <= r["n_dup_segments"] <= r["n_segments"]


def test_embed_decontaminate_contract(spark, sf_dir):
    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        DECON_TAU,
        EVAL_LABEL,
        embed_decontaminate,
    )

    rows = embed_decontaminate(spark, sf_dir).collect()
    assert rows  # the fixture has semantic near-hits at the chosen tau
    for r in rows:
        assert r["label"] != EVAL_LABEL  # eval vectors are never flagged
        assert r["max_cos"] >= DECON_TAU
        assert r["n_eval_hits"] >= 1


def test_sample_domain_mix_mass_balance(spark, sf_dir):
    from aws_vpc_flow_log_appender_spark.ext.sampling import sample_domain_mix
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    rows = sample_domain_mix(spark, sf_dir).collect()
    n_total = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    s = len(rows)
    for r in rows:
        # weight * n_docs reconstructs the uniform per-source target mass
        # up to the integer floor (strictly within one unit of 1e6*N/S)
        got = r["weight_micro"] * r["n_docs"]
        target = 1_000_000 * n_total / s
        assert target - r["n_docs"] < got <= target + 1


def test_dedup_segments_scrub_removes_planted_duplicate(spark, tmp_path):
    """Planted cross-doc duplicate: the shared 8-token segment must be
    dropped from BOTH docs (and only it); an untouched doc is the identity."""
    import hashlib

    from aws_vpc_flow_log_appender_spark.ext.dedup import (
        SEGMENT_TOKENS,
        dedup_segments_scrub,
    )

    shared = " ".join(f"dup{i}" for i in range(SEGMENT_TOKENS))
    tail_a = " ".join(f"a{i}" for i in range(SEGMENT_TOKENS))
    tail_b = " ".join(f"b{i}" for i in range(SEGMENT_TOKENS))
    uniq_c = " ".join(f"c{i}" for i in range(2 * SEGMENT_TOKENS))
    rows = [
        (1, shared + " " + tail_a, "en", "s0", 0),
        (2, shared + " " + tail_b, "en", "s0", 0),
        (3, uniq_c, "en", "s0", 0),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    out = {r["doc_id"]: r for r in dedup_segments_scrub(spark, d).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out[1]["n_segments"] == 2 and out[1]["n_dup_segments"] == 1
    assert out[1]["kept_md5"] == md5(tail_a)
    assert out[2]["kept_md5"] == md5(tail_b)
    assert out[3]["n_dup_segments"] == 0 and out[3]["kept_md5"] == md5(uniq_c)


def test_capped_cell_path_matches_oracle_when_active(spark, sf_dir):
    """Code-review r6 closure: the hot-cell sub-bucket path must match its
    DuckDB oracle WITH THE CAP ENGAGED (the registered queries only prove
    the cap-inactive fixture path; previously the oracle joined on label
    alone and the safety valve broke the correctness gate the moment it
    activated). Force a tiny cap so every fixture cell is 'hot', run the
    Spark plan and the parametric oracle SQL, and compare rows exactly."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent / "tools"))
    from verify_local import compare, duck_connect, normalize  # noqa: F401

    from aws_vpc_flow_log_appender_spark.ext.dedup import (
        _embedding_pairs,
        _embedding_pairs_oracle_sql,
    )
    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        _ivf_oracle_sql,
        _ivf_topk,
        load,
    )

    cap = 16  # far below fixture cell sizes -> every cell sub-bucketed
    con = duck_connect(sf_dir)

    e = load(spark, sf_dir, "embeddings")
    spark_ivf = _ivf_topk(e, cell_cap=cap).toPandas()
    duck_ivf = con.execute(_ivf_oracle_sql(cell_cap=cap)).df()
    assert len(spark_ivf) > 0  # non-vacuous
    assert compare("ivf_capped", spark_ivf, duck_ivf) == []

    spark_pairs = _embedding_pairs(e, cell_cap=cap).toPandas()
    duck_pairs = con.execute(_embedding_pairs_oracle_sql(cell_cap=cap)).df()
    assert compare("pairs_capped", spark_pairs, duck_pairs) == []
    # the cap must actually bite: fewer candidate pairs than uncapped
    uncapped = con.execute(_embedding_pairs_oracle_sql()).df()
    assert len(spark_pairs) <= len(uncapped)


def test_null_text_dedup_contracts(spark):
    """NULL-text docs (code-review r6 pair): (a) dedup_exact must give each
    NULL-text doc its OWN group — md5(NULL) is NULL and window partitioning
    groups NULLs together, so without the per-doc fallback key k NULL docs
    silently collapsed to one survivor (the exact bug the streaming twin
    guards); (b) the shingle path must DROP NULL-text docs entirely,
    matching DuckDB's list_distinct (Spark's array_distinct keeps a NULL,
    which minted phantom NULL band buckets the oracle never sees)."""
    from aws_vpc_flow_log_appender_spark.ext.dedup import (
        _minhash_bands_for,
        _shingled_for,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None), (3, None),
         (4, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    # (b) shingles: NULL-text docs contribute nothing
    sh = _shingled_for(docs)
    assert sh.filter(F.col("doc_id").isin(2, 3)).count() == 0
    assert sh.filter(F.col("sh").isNull()).count() == 0
    bands = _minhash_bands_for(docs)
    assert bands.filter(F.col("doc_id").isin(2, 3)).count() == 0

    # (a) exact dedup: the two NULL docs are separate singleton groups,
    # while the two identical texts form one group of 2
    from aws_vpc_flow_log_appender_spark.operators.registry import QUERY_REGISTRY
    import tempfile, shutil
    tmp = tempfile.mkdtemp(prefix="nulldedup_")
    try:
        docs.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")).withColumn("n_chars", F.length("text")
        ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        out = {r["doc_id"]: (r["dup_rank"], r["group_size"])
               for r in QUERY_REGISTRY["dedup_exact"].fn(spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out[2] == (1, 1) and out[3] == (1, 1)  # never collapse
    assert out[1] == (1, 2) and out[4] == (2, 2)


def test_ip_to_int_rejects_out_of_range_octets(spark):
    """'1.2.3.300' is regex-valid but must yield NULL, not alias onto
    1.2.4.44's integer and geolocate to a concrete WRONG range (the
    reference's geocoder gets no data for it and degrades to defaults)."""
    from aws_vpc_flow_log_appender_spark.enrich import ip_to_int

    rows = [("1.2.3.300",), ("1.2.4.44",), ("256.1.1.1",), ("0.0.0.0",),
            ("255.255.255.255",)]
    got = {r["ip"]: r["n"] for r in spark.createDataFrame(rows, ["ip"])
           .select("ip", ip_to_int("ip").alias("n")).collect()}
    assert got["1.2.3.300"] is None
    assert got["256.1.1.1"] is None
    assert got["1.2.4.44"] == (1 << 24) + (2 << 16) + (4 << 8) + 44
    assert got["0.0.0.0"] == 0
    assert got["255.255.255.255"] == (1 << 32) - 1


def test_sim_kmeans_cells_partitions_corpus(spark, sf_dir):
    """Lloyd's invariants: the final assignment partitions the corpus (cell
    counts sum to the vector count), cells are a subset of the K seeded
    ids, inertia is non-negative, and the whole training run is
    deterministic on re-execution (fixed seeds, fixed rounds, rounded
    boundaries — no rand(), no arrival-order dependence)."""
    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        KM_K,
        sim_kmeans_cells,
    )

    out = sim_kmeans_cells(spark, sf_dir)
    rows = {r["cluster_id"]: r for r in out.collect()}
    n_vecs_total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n_vecs"] for r in rows.values()) == n_vecs_total
    assert set(rows) <= set(range(KM_K))
    assert all(r["inertia"] >= 0.0 for r in rows.values())
    assert all(r["centroid_norm"] > 0.0 for r in rows.values())
    rows2 = {r["cluster_id"]: r for r in sim_kmeans_cells(spark, sf_dir).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in rows2.items()
    }


def test_sim_ivf_trained_topk_search_invariants(spark, sf_dir):
    """Trained-IVF invariants: results only for the query set, ranks are a
    dense 1..k prefix per query, every (query, neighbor) pair shares the
    trained cell's top-k contract (cos_sim non-increasing with rank), and
    re-execution is deterministic (fixed seeds, rounded boundaries)."""
    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        N_QUERIES,
        TOP_K,
        sim_ivf_trained_topk,
    )

    rows = sim_ivf_trained_topk(spark, sf_dir).collect()
    assert rows, "trained IVF returned nothing"
    by_q = {}
    for r in rows:
        assert r["query_id"] < N_QUERIES
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_sim"]))
    for q, rk in by_q.items():
        rk.sort()
        assert [x[0] for x in rk] == list(range(1, len(rk) + 1))
        assert len(rk) <= TOP_K
        sims = [x[1] for x in rk]
        assert sims == sorted(sims, reverse=True)
    rows2 = sim_ivf_trained_topk(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_png_parser_golden_bytes_all_filters(spark):
    """The pure-stdlib PNG decoder must decode a REFERENCE file built
    byte-by-byte from the spec (not by our own encoder), using the two
    filter types the engine's encoder never emits (Average=3, Paeth=4) —
    proving the kernel is a real decoder for any compliant 8-bit grayscale
    PNG. Malformed payloads (bad CRC, truncation, garbage, NULL) degrade
    to header_ok=false; unsupported color types keep their parsed header."""
    import struct
    import zlib

    from aws_vpc_flow_log_appender_spark.ext.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png_stats,
    )

    # 3x2 grayscale; true pixel rows chosen so Average and Paeth predictors
    # both take non-trivial branches
    rows = [bytes([10, 20, 30]), bytes([40, 60, 90])]
    # row 0: Average filter (up = 0): filt[i] = x - (left + 0)//2
    r0 = bytes([(rows[0][0] - 0) & 255,
                (rows[0][1] - (rows[0][0] // 2)) & 255,
                (rows[0][2] - (rows[0][1] // 2)) & 255])
    # row 1: Paeth filter: pred = paeth(left, up, upleft)
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)
    r1 = bytes([
        (rows[1][0] - paeth(0, rows[0][0], 0)) & 255,
        (rows[1][1] - paeth(rows[1][0], rows[0][1], rows[0][0])) & 255,
        (rows[1][2] - paeth(rows[1][1], rows[0][2], rows[0][1])) & 255,
    ])
    filtered = bytes([3]) + r0 + bytes([4]) + r1
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    golden = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
              + _png_chunk(b"IDAT", zlib.compress(filtered))
              + _png_chunk(b"IEND", b""))
    # corrupt ONE payload byte inside the IDAT data so its CRC fails
    bad_crc = bytearray(golden)
    bad_crc[len(_PNG_SIG) + 25 + 10] ^= 0xFF
    # RGB (color type 2) header: parsed fields preserved, header_ok false
    rgb = (_PNG_SIG
           + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0))
           + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
           + _png_chunk(b"IEND", b""))
    media = spark.createDataFrame(
        [(1, bytearray(golden)), (2, bytes(bad_crc)),
         (3, bytearray(golden[:40])), (4, bytearray(b"not a png")),
         (5, None), (6, bytearray(rgb))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in decode_png_stats(media).collect()}
    g = got[1]
    assert (g["magic"], g["width"], g["height"]) == ("PNG", 3, 2)
    assert (g["bit_depth"], g["color_type"], g["n_chunks"]) == (8, 0, 3)
    assert g["n_pixels"] == 6
    assert g["pixel_byte_sum"] == sum(rows[0]) + sum(rows[1])
    assert g["header_ok"] is True
    assert got[2]["header_ok"] is False and got[2]["pixel_byte_sum"] is None
    assert got[3]["header_ok"] is False
    assert got[4]["header_ok"] is False
    assert got[5]["header_ok"] is False
    r6 = got[6]
    assert (r6["width"], r6["height"], r6["color_type"]) == (5, 4, 2)
    assert r6["header_ok"] is False and r6["n_pixels"] is None


def test_png_hostile_payloads_degrade_not_crash(spark):
    """Adversarial PNGs must degrade PER-ROW, never fail the Arrow batch
    (code-review r6): (a) an IHDR declaring width >= 2^31 overflows the
    int32 schema column unless NULLed; (b) a decompression bomb (tiny dims,
    IDAT inflating far past them) must be rejected by the BOUNDED inflate,
    not fully expanded first; (c) dims past the decode cap keep their
    parsed header. A valid row rides in the same batch to prove isolation."""
    import struct
    import zlib

    from aws_vpc_flow_log_appender_spark.ext.multimodal import (
        _PNG_DECODE_CAP,
        _PNG_SIG,
        _png_chunk,
        decode_png_stats,
        encode_png,
    )

    def png(ihdr_fields, idat_raw):
        return (_PNG_SIG
                + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
                + _png_chunk(b"IDAT", idat_raw)
                + _png_chunk(b"IEND", b""))

    # (a) unsigned width 2^31: valid CRCs, hostile header
    overflow = png((0x80000000, 2, 8, 0, 0, 0, 0), zlib.compress(b"\x00" * 8))
    # (b) bomb: declares 4x4 but IDAT inflates to 8 MiB of zeros
    bomb = png((4, 4, 8, 0, 0, 0, 0), zlib.compress(b"\x00" * (8 << 20), 9))
    assert len(bomb) < 20_000  # the whole point: tiny payload, huge inflate
    # (c) in-int32-range dims whose decode exceeds the cap
    big_w = _PNG_DECODE_CAP  # h*(w+1) = 2*(cap+1) > cap
    big = png((big_w, 2, 8, 0, 0, 0, 0), zlib.compress(b"\x00" * 8))
    media = spark.createDataFrame(
        [(1, bytearray(overflow)), (2, bytearray(bomb)),
         (3, bytearray(big)), (4, bytearray(encode_png(b"ok")))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in decode_png_stats(media).collect()}
    assert got[1]["width"] is None and got[1]["height"] == 2
    assert got[1]["header_ok"] is False
    assert got[2]["header_ok"] is False and got[2]["width"] == 4
    assert got[3]["header_ok"] is False and got[3]["width"] == big_w
    assert got[4]["header_ok"] is True  # batch survived the hostile rows


def test_png_encode_decode_roundtrip_values(spark):
    """encode_png -> decode_png_stats round-trip on a known string: dims,
    chunk count, and the cycled pixel byte sum match hand computation —
    through real DEFLATE compression and per-row None/Sub/Up filtering."""
    from aws_vpc_flow_log_appender_spark.ext.multimodal import (
        decode_png_stats,
        encode_png,
    )

    data = b"hello png inflate"
    n = len(data)
    w, h = 1 + n % 23, 1 + n % 11
    k = w * h
    exp_sum = (k // n) * sum(data) + sum(data[: k % n])
    media = spark.createDataFrame(
        [(7, bytearray(encode_png(data)))], "media_id long, payload binary"
    )
    r = decode_png_stats(media).collect()[0]
    assert (r["width"], r["height"], r["n_chunks"]) == (w, h, 3)
    assert r["n_pixels"] == k
    assert r["pixel_byte_sum"] == exp_sum and r["header_ok"] is True


def test_sim_kmeans_sub_k_corpus(spark, tmp_path):
    """Corpus SMALLER than K: Lloyd's degenerates gracefully — each distinct
    vector seeds its own centroid and keeps it, so every cell is a
    singleton with zero inertia, and the trained in-cell search finds no
    neighbors (empty result, not an error). Pinned because LIMIT K with
    fewer rows is the classic off-by-one edge for unrolled plans."""
    import pandas as pd

    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        KM_K,
        sim_ivf_trained_topk,
        sim_kmeans_cells,
    )

    n = KM_K - 3
    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(64)], f"s{i % 2}")
        for i in range(n)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    cells = sim_kmeans_cells(spark, str(tmp_path)).collect()
    assert len(cells) == n
    assert all(r["n_vecs"] == 1 for r in cells)
    assert all(r["inertia"] == 0.0 for r in cells)
    assert sim_ivf_trained_topk(spark, str(tmp_path)).count() == 0
    # multiprobe on the same degenerate corpus DISCRIMINATES from in-cell:
    # probe rank 1 is the query's own singleton (self excluded), rank 2 is
    # the nearest OTHER singleton — exactly one neighbor per query
    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        sim_ivf_trained_multiprobe,
    )

    mp = sim_ivf_trained_multiprobe(spark, str(tmp_path)).collect()
    assert len(mp) == n
    assert {r["query_id"] for r in mp} == set(range(n))
    assert all(r["rank"] == 1 and r["neighbor_id"] != r["query_id"] for r in mp)


def test_sim_trained_multiprobe_dominates_in_cell(spark, sf_dir):
    """Probe rank 1 under the (d, cid) order IS the training assignment, so
    the multiprobe candidate set is a superset of the in-cell one — at
    every (query, rank) the multiprobe cosine must be >= the in-cell
    cosine, and per-query row counts never shrink. Pinned because it is
    the entire point of nprobe > 1: recall can only go up."""
    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        sim_ivf_trained_multiprobe,
        sim_ivf_trained_topk,
    )

    one = {}
    for r in sim_ivf_trained_topk(spark, sf_dir).collect():
        one.setdefault(r["query_id"], {})[r["rank"]] = r["cos_sim"]
    multi = {}
    for r in sim_ivf_trained_multiprobe(spark, sf_dir).collect():
        multi.setdefault(r["query_id"], {})[r["rank"]] = r["cos_sim"]
    assert set(one) <= set(multi)
    for qid, ranks in one.items():
        assert len(multi[qid]) >= len(ranks)
        for rank, cs in ranks.items():
            assert multi[qid][rank] >= cs


def test_sim_pq_adc_two_pattern_corpus(spark, tmp_path):
    """End-to-end PQ quality on a corpus where the right answer is exact:
    two strongly separated vector patterns, interleaved so the codebook
    seeds see both. Training must converge to one centroid per pattern in
    every subspace (empties drop out), so codes collapse to the pattern
    id, ADC distance between same-pattern vectors is exactly 0, and every
    query's full top-k is same-pattern. Pinned because it exercises the
    whole train -> encode -> LUT -> scaled-integer-sum path with verifiable
    values, not just oracle agreement."""
    import pandas as pd

    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        TOP_K,
        sim_pq_adc,
    )

    pat = {
        0: [5.0 if j % 2 == 0 else -3.0 for j in range(64)],
        1: [-4.0 if j % 3 == 0 else 2.0 for j in range(64)],
    }
    n = 16  # 8 per pattern: every query has 7 same-pattern others (> TOP_K)
    rows = [(i, pat[i % 2], f"s{i % 2}") for i in range(n)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = sim_pq_adc(spark, str(tmp_path)).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(10))
    for qid, rs in by_q.items():
        assert len(rs) == TOP_K
        for r in rs:
            assert r["neighbor_id"] % 2 == qid % 2
            assert r["adc_dist"] == 0.0


def test_sim_pq_adc_sub_k_corpus(spark, tmp_path):
    """Corpus smaller than PQ_K: every subspace codebook degenerates to one
    singleton centroid per vector (LIMIT-K with fewer rows — the unrolled
    plan's classic off-by-one edge). Search still returns each query's
    n-1 ranked neighbors rather than erroring."""
    import pandas as pd

    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        PQ_K,
        sim_pq_adc,
    )

    n = PQ_K - 1
    rows = [
        (i, [float((i * 13 + j * 5) % 17) - 8.0 for j in range(64)], "s0")
        for i in range(n)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = sim_pq_adc(spark, str(tmp_path)).collect()
    assert len(got) == n * (n - 1)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["rank"])
    assert all(ranks == set(range(1, n)) for ranks in by_q.values())


def test_sim_ivfpq_pruning_dominance_vs_exhaustive(spark, sf_dir):
    """IVF-PQ scores the SAME compressed codes as exhaustive ADC but over a
    pruned candidate set, so at every (query, rank) its ADC distance must
    be >= the exhaustive scan's — pruning can only push better candidates
    out, never conjure closer ones. Both must return full result sets on
    the fixture. Pinned as the composition contract between the coarse
    prune and the PQ scorer."""
    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        TOP_K,
        sim_ivfpq_topk,
        sim_pq_adc,
    )

    ex, pruned = {}, {}
    for r in sim_pq_adc(spark, sf_dir).collect():
        ex.setdefault(r["query_id"], {})[r["rank"]] = r["adc_dist"]
    for r in sim_ivfpq_topk(spark, sf_dir).collect():
        pruned.setdefault(r["query_id"], {})[r["rank"]] = r["adc_dist"]
    assert set(pruned) == set(ex)
    for qid, ranks in pruned.items():
        assert len(ranks) == TOP_K and len(ex[qid]) == TOP_K
        for rank, dist in ranks.items():
            assert dist >= ex[qid][rank]


def test_rerank_recall_dominates_unreranked(spark, sf_dir):
    """Two-stage retrieval's guarantee (VERDICT r6 "Next round" #4): within
    any candidate pool a true exact-top-k member can be outranked only by
    other true members, so re-ranked recall@k >= un-reranked recall@k PER
    QUERY — and the candidate pool (RERANK_C >= TOP_K, same ADC order)
    always contains the un-reranked top-k, so no hit can be lost. Also
    pins that re-ranked output distances are exact (match the recall
    harness's ground-truth metric by construction): each query returns a
    full, strictly rank-ordered result set."""
    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        TOP_K,
        sim_ivfpq_rerank_topk,
        sim_recall_eval,
        sim_rerank_recall_eval,
    )

    plain = {r["query_id"]: r["n_hits"]
             for r in sim_recall_eval(spark, sf_dir).collect()}
    rer = {r["query_id"]: r["n_hits"]
           for r in sim_rerank_recall_eval(spark, sf_dir).collect()}
    assert set(rer) == set(plain)
    for qid, hits in rer.items():
        assert hits >= plain[qid], (qid, hits, plain[qid])
    by_q = {}
    for r in sim_ivfpq_rerank_topk(spark, sf_dir).collect():
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == TOP_K
        rs.sort(key=lambda r: r["rank"])
        dists = [r["exact_dist"] for r in rs]
        assert dists == sorted(dists)


def test_dedup_semantic_invariants(spark, sf_dir):
    """SemDeDup decision contract, checked against an independent numpy
    recomputation of the within-cell geometry: (a) every DROPPED vector
    has a strictly-closer-to-centroid same-cell member at cosine >=
    SEMDEDUP_TAU (its max_closer_sim says so and numpy agrees some closer
    member clears tau); (b) every KEPT vector has NO closer member above
    tau; (c) each cell's centroid-closest member is always kept (nothing
    outranks it); (d) both classes are populated on the fixture."""
    import numpy as np

    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        SEMDEDUP_TAU,
        dedup_semantic,
    )
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    rows = dedup_semantic(spark, sf_dir).collect()
    assert {r["kept"] for r in rows} == {0, 1}
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault(r["cluster_id"], []).append(r)
    for cell, members in by_cell.items():
        # the engine's own d_i order is (distance, vec_id); recompute the
        # ORDER-RELEVANT part from the audit columns: max_closer_sim is
        # NULL iff the member is the cell's rank-1 (no closer member)
        rank1 = [m for m in members if m["max_closer_sim"] is None]
        assert len(rank1) == 1, (cell, len(rank1))
        assert rank1[0]["kept"] == 1
        for m in members:
            sims = []
            v = emb[m["vec_id"]]
            for o in members:
                if o["vec_id"] == m["vec_id"]:
                    continue
                w = emb[o["vec_id"]]
                sims.append(
                    float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w)))
                )
            if m["kept"] == 0:
                assert m["max_closer_sim"] >= SEMDEDUP_TAU
                # numpy sees a qualifying neighbor within rounding slack
                assert sims and max(sims) >= SEMDEDUP_TAU - 1e-5
            elif m["max_closer_sim"] is not None:
                assert m["max_closer_sim"] < SEMDEDUP_TAU


def test_sim_ivfpq_two_pattern_corpus(spark, tmp_path):
    """On the interleaved two-pattern corpus the coarse codebook collapses
    to one surviving cell per pattern (empties drop out), so probing
    nprobe=2 covers the whole corpus and IVF-PQ must agree with the exact
    expectation: every query's full top-k is same-pattern at ADC distance
    exactly 0."""
    import pandas as pd

    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        TOP_K,
        sim_ivfpq_topk,
    )

    pat = {
        0: [5.0 if j % 2 == 0 else -3.0 for j in range(64)],
        1: [-4.0 if j % 3 == 0 else 2.0 for j in range(64)],
    }
    rows = [(i, pat[i % 2], f"s{i % 2}") for i in range(16)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = sim_ivfpq_topk(spark, str(tmp_path)).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(10))
    for qid, rs in by_q.items():
        assert len(rs) == TOP_K
        for r in rs:
            assert r["neighbor_id"] % 2 == qid % 2
            assert r["adc_dist"] == 0.0


def test_sim_pq_distortion_two_pattern_corpus(spark, tmp_path):
    """On the interleaved two-pattern corpus every subspace codebook
    converges to one centroid per pattern (empties drop out), so every
    subvector sits exactly on its centroid and the distortion metric must
    report 0 everywhere — pinning that the metric reads the training's own
    assignment distances rather than recomputing anything."""
    import pandas as pd

    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        PQ_M,
        sim_pq_distortion,
    )

    pat = {
        0: [5.0 if j % 2 == 0 else -3.0 for j in range(64)],
        1: [-4.0 if j % 3 == 0 else 2.0 for j in range(64)],
    }
    n = 16
    rows = [(i, pat[i % 2], f"s{i % 2}") for i in range(n)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = sim_pq_distortion(spark, str(tmp_path)).collect()
    assert {r["m"] for r in got} == set(range(PQ_M))
    for r in got:
        assert r["n_vecs"] == n
        assert r["total_distortion"] == 0.0
        assert r["avg_distortion"] == 0.0
        assert r["max_distortion"] == 0.0


def test_sim_pq_distortion_consistency(spark, sf_dir):
    """On the fixture: per-subspace invariants — counts cover the corpus,
    avg * n == total within the 1e-6 grid, max >= avg >= 0."""
    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        PQ_M,
        sim_pq_distortion,
    )

    got = sim_pq_distortion(spark, sf_dir).collect()
    assert len(got) == PQ_M
    for r in got:
        assert r["n_vecs"] > 0
        assert 0.0 <= r["avg_distortion"] <= r["max_distortion"]
        assert abs(r["avg_distortion"] * r["n_vecs"] - r["total_distortion"]) < 1e-3


def test_sim_recall_eval_two_pattern_corpus(spark, tmp_path):
    """On the two-pattern corpus the exact L2 top-k and the IVF-PQ top-k
    coincide: same-pattern vectors are at raw distance 0 AND ADC distance 0,
    both sides break ties by neighbor_id, and each pattern has more members
    than TOP_K — so recall must be exactly 1.0 for every query."""
    import pandas as pd

    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        TOP_K,
        sim_recall_eval,
    )

    pat = {
        0: [5.0 if j % 2 == 0 else -3.0 for j in range(64)],
        1: [-4.0 if j % 3 == 0 else 2.0 for j in range(64)],
    }
    rows = [(i, pat[i % 2], f"s{i % 2}") for i in range(16)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = sim_recall_eval(spark, str(tmp_path)).collect()
    assert {r["query_id"] for r in got} == set(range(10))
    for r in got:
        assert r["n_hits"] == TOP_K
        assert r["recall_at_k"] == 1.0


def test_sim_recall_eval_bounds(spark, sf_dir):
    """On the fixture: one row per query, n_hits in [0, TOP_K], and the
    recall column is exactly n_hits / TOP_K."""
    from aws_vpc_flow_log_appender_spark.ext.similarity import (
        N_QUERIES,
        TOP_K,
        sim_recall_eval,
    )

    got = sim_recall_eval(spark, sf_dir).collect()
    assert len(got) == N_QUERIES
    for r in got:
        assert 0 <= r["n_hits"] <= TOP_K
        assert abs(r["recall_at_k"] - r["n_hits"] / TOP_K) < 1e-9


def test_dedup_minhash_est_jaccard_identical_docs(spark, tmp_path):
    """Identical documents must audit perfectly: all 8 signature components
    agree (est 1.0), true Jaccard 1.0, error exactly 0 — while a pair of
    disjoint docs can never appear at all (no shared band)."""
    import pandas as pd

    from aws_vpc_flow_log_appender_spark.ext.dedup import (
        dedup_minhash_est_jaccard,
    )

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "completely different words describing some other topic entirely here"
    rows = [
        (1, text_a, "s0", "2024-01-01"),
        (2, text_a, "s0", "2024-01-02"),
        (3, text_b, "s1", "2024-01-03"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source", "crawl_date"])
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = dedup_minhash_est_jaccard(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["n_eq"] == 8
    assert r["est_jaccard"] == 1.0
    assert r["true_jaccard"] == 1.0
    assert r["abs_err"] == 0.0


def test_dedup_minhash_est_jaccard_error_formula(spark, sf_dir):
    """On the fixture: every row's abs_err recomputes from its own integer
    columns (|n_eq*u - 8*n_common| / (8u), 1e-6 grid) and the estimate is
    n_eq/8 — pinning the integer-exact error discipline against silent
    drift, and est/true both in [0, 1]."""
    import math

    from aws_vpc_flow_log_appender_spark.ext.dedup import (
        dedup_minhash_est_jaccard,
    )

    got = dedup_minhash_est_jaccard(spark, sf_dir).collect()
    assert got, "fixture corpus has near-dup candidates"
    for r in got:
        assert r["est_jaccard"] == r["n_eq"] / 8.0
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["true_jaccard"] <= 1.0
        # reconstruct u from the rounded true jaccard is lossy; instead use
        # the row's n_common with the fixture's shingle profile implied by
        # true_jaccard: u = n_common / true_jaccard on the same grid
        if r["true_jaccard"] > 0:
            u = r["n_common"] / r["true_jaccard"]
            want = abs(r["n_eq"] * u - 8 * r["n_common"]) / (8.0 * u)
            assert math.isclose(r["abs_err"], want, abs_tol=5e-4)


def test_text_dsir_importance_separates_domains(spark, tmp_path):
    """Target-exclusive documents must score strictly positive,
    rest-exclusive documents strictly negative, and every score must
    reconstruct from the add-0.5-smoothed per-bucket log-ratio formula
    within the 1e-6-per-token quantization — pinning the DSIR math, the
    min(source) target selection, and the hashed-bucket counting."""
    import math

    import pandas as pd

    from aws_vpc_flow_log_appender_spark.ext.textanalysis import (
        DSIR_BUCKETS,
        text_dsir_importance,
    )

    rows = [
        (1, "alpha alpha alpha", "a", "2024-01-01"),
        (2, "alpha alpha alpha", "a", "2024-01-02"),
        (3, "beta beta beta", "b", "2024-01-03"),
        (4, "beta beta beta", "b", "2024-01-04"),
        (5, "alpha beta alpha", "b", "2024-01-05"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source", "crawl_date"])
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: r for r in text_dsir_importance(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert all(got[i]["n_tokens"] == 3 for i in got)

    # recompute the expected per-bucket log-ratios: target = min(source)='a'
    # alpha: 6 target occurrences, 2 rest (doc 5); beta: 0 target, 7 rest
    half_b = DSIR_BUCKETS / 2.0
    tot_t, tot_r = 6.0, 9.0

    def dq(cnt_t, cnt_r):
        return math.log((cnt_t + 0.5) / (tot_t + half_b)) - math.log(
            (cnt_r + 0.5) / (tot_r + half_b)
        )

    d_alpha, d_beta = dq(6, 2), dq(0, 7)
    assert d_alpha > 0 > d_beta
    want = {
        1: 3 * d_alpha,
        2: 3 * d_alpha,
        3: 3 * d_beta,
        4: 3 * d_beta,
        5: 2 * d_alpha + d_beta,
    }
    for i, w in want.items():
        assert math.isclose(got[i]["dsir_logratio"], w, abs_tol=5e-6)
    assert got[1]["dsir_logratio"] > 0 > got[3]["dsir_logratio"]
    assert got[3]["dsir_logratio"] < got[5]["dsir_logratio"] < got[1]["dsir_logratio"]


def test_dedup_paragraphs_keep_first_planted(spark, tmp_path):
    """Keep-first span dedup: the FIRST occurrence (corpus (doc_id, pos)
    order) of a repeated span survives, later copies drop — across docs AND
    within one doc — and the stats query reassembles exactly the survivors."""
    import hashlib

    from aws_vpc_flow_log_appender_spark.ext.dedup import (
        SEGMENT_TOKENS,
        dedup_paragraph_stats,
        dedup_paragraphs,
    )

    shared = " ".join(f"dup{i}" for i in range(SEGMENT_TOKENS))
    tail_a = " ".join(f"a{i}" for i in range(SEGMENT_TOKENS))
    tail_b = " ".join(f"b{i}" for i in range(SEGMENT_TOKENS))
    rep = " ".join(f"r{i}" for i in range(SEGMENT_TOKENS))
    rows = [
        (1, shared + " " + tail_a, "en", "s0", 0),
        (2, shared + " " + tail_b, "en", "s0", 0),
        (3, rep + " " + rep, "en", "s0", 0),  # within-doc repeat
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    out = {
        (r["doc_id"], r["para_idx"]): r
        for r in dedup_paragraphs(spark, d).collect()
    }
    # doc 1 owns both first occurrences
    assert out[(1, 0)]["kept"] == 1 and out[(1, 0)]["n_copies"] == 2
    assert out[(1, 1)]["kept"] == 1 and out[(1, 1)]["n_copies"] == 1
    # doc 2's shared span is the later copy; its tail is unique
    assert out[(2, 0)]["kept"] == 0 and out[(2, 0)]["n_copies"] == 2
    assert out[(2, 0)]["para_hash"] == md5(shared)
    assert out[(2, 1)]["kept"] == 1
    # within-doc repeat: first kept, second dropped
    assert out[(3, 0)]["kept"] == 1 and out[(3, 1)]["kept"] == 0
    assert out[(3, 0)]["n_copies"] == 2

    stats = {r["doc_id"]: r for r in dedup_paragraph_stats(spark, d).collect()}
    assert stats[1]["n_kept"] == 2 and stats[1]["kept_md5"] == md5(
        shared + " " + tail_a
    )
    assert stats[2]["n_kept"] == 1 and stats[2]["kept_md5"] == md5(tail_b)
    assert stats[3]["n_paras"] == 2 and stats[3]["n_kept"] == 1
    assert stats[3]["kept_md5"] == md5(rep)
    assert stats[3]["kept_frac"] == 0.5


def test_dedup_incremental_snapshot_drops_recrawls_and_bloom_prunes(spark, sf_dir):
    """Every re-crawl (snapshot content under a fresh doc_id) is dropped,
    every genuinely-new doc survives, and the bloom split actually routes:
    the definitely-new branch (bloom miss, skips the snapshot join) holds
    most of the batch while the checked branch stays near the true
    re-crawl count (~1% FP design point)."""
    from pyspark.sql import functions as F

    from aws_vpc_flow_log_appender_spark.ext.dedup import (
        _RECRAWL_OFFSET,
        _incremental_split,
        _snapshot_bloom_words,
        dedup_incremental_snapshot,
    )
    from aws_vpc_flow_log_appender_spark.operators.joins import (
        bloom_build,
        bloom_probe_sql,
    )

    out = dedup_incremental_snapshot(spark, sf_dir).collect()
    ids = {r["doc_id"] for r in out}
    # at fixture SFs max(doc_id) < 1e6, so the derived offset IS the floor
    assert ids and all(i < _RECRAWL_OFFSET for i in ids)  # no re-crawl survives
    assert all(i % 5 == 4 for i in ids)  # exactly the new-doc class

    snap_keys, batch = _incremental_split(spark, sf_dir)
    n_recrawl = batch.filter(F.col("doc_id") >= _RECRAWL_OFFSET).count()
    n_new = batch.count() - n_recrawl
    assert n_recrawl > 0  # the drop class is populated at every SF
    assert len(ids) == n_new

    # bloom routing: misses (definitely new) skip the join; passers are the
    # re-crawls plus a small FP tail. words auto-sized to the snapshot
    # (VERDICT r8 #1).
    words = _snapshot_bloom_words(spark, sf_dir)
    bloom = bloom_build(snap_keys, "content_key", words=words)
    probe = bloom_probe_sql("content_key", words=words)
    firsts = batch.groupBy("content_key").agg(F.min("doc_id").alias("doc_id"))
    probed = firsts.join(F.broadcast(bloom))
    n_pass = probed.filter(F.expr(probe)).count()
    n_total = firsts.count()
    assert n_pass >= n_recrawl  # soundness: every member passes
    assert n_pass - n_recrawl <= max(3, n_total // 20)  # FP tail stays small


def test_incremental_bloom_words_scale_with_snapshot(spark):
    """VERDICT r8 #1 / next-round #9: the bloom sizing can never regress to
    a constant — words must GROW with the build side. Pinned two ways:
    pure sizing arithmetic (power-of-two, ~10 bits/key, clamped) and the
    snapshot-derived words differing between two fixture SFs whose
    snapshot relations are 10x apart."""
    from aws_vpc_flow_log_appender_spark.ext.dedup import _snapshot_bloom_words
    from aws_vpc_flow_log_appender_spark.operators.joins import bloom_words_for

    # arithmetic pins: 100x more keys -> strictly more words (until clamp)
    assert bloom_words_for(400) == 64          # min clamp region
    assert bloom_words_for(40_000) == 8192     # 10 bits/key, pow-2 round-up
    assert bloom_words_for(40_000) > bloom_words_for(400)
    for n in (1, 500, 5_000, 500_000):
        w = bloom_words_for(n)
        assert w & (w - 1) == 0                # power of two
        assert 64 <= w <= 1 << 18              # clamps hold
    assert bloom_words_for(10**9) == 1 << 18   # graceful-degrade cap

    # fixture pin: sf0.01 snapshot (400 rows) vs sf0.1 (4000 rows)
    w_small = _snapshot_bloom_words(spark, "/root/testdata/sf0.01")
    w_big = _snapshot_bloom_words(spark, "/root/testdata/sf0.1")
    assert w_small < w_big, (w_small, w_big)
