"""Property tests (SURVEY §5.2.3): parse/unparse round-trip, RFC1918
classifier vs an integer-CIDR reimplementation, and the ok+failed=total
packaging invariant — hypothesis-generated inputs, one Spark job per example
list to keep runtime sane."""

import ipaddress

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aws_vpc_flow_log_appender_spark import fixtures
from aws_vpc_flow_log_appender_spark.enrich import is_rfc1918
from aws_vpc_flow_log_appender_spark.parse import parse_lines
from aws_vpc_flow_log_appender_spark.pipeline import decorate_lines

ip_octet = st.integers(0, 255)
ips = st.builds(lambda a, b, c, d: f"{a}.{b}.{c}.{d}", ip_octet, ip_octet, ip_octet, ip_octet)

flow_fields = st.fixed_dictionaries({
    "version": st.just(2),
    "account": st.integers(10**11, 10**12 - 1),
    "eni": st.from_regex(r"eni-[0-9a-f]{8}", fullmatch=True),
    "src": ips,
    "dst": ips,
    "srcport": st.integers(0, 65535),
    "dstport": st.integers(0, 65535),
    "protocol": st.sampled_from([1, 6, 17]),
    "packets": st.integers(0, 10**6),
    "bytes": st.integers(0, 10**9),
    "start": st.integers(1_000_000_000, 2_000_000_000),
    "dur": st.integers(0, 3600),
    "action": st.sampled_from(["ACCEPT", "REJECT"]),
    "status": st.sampled_from(["OK", "NODATA", "SKIPDATA"]),
})


def _unparse(f: dict) -> str:
    return (
        f"{f['version']} {f['account']} {f['eni']} {f['src']} {f['dst']} "
        f"{f['srcport']} {f['dstport']} {f['protocol']} {f['packets']} "
        f"{f['bytes']} {f['start']} {f['start'] + f['dur']} {f['action']} {f['status']}"
    )


@settings(max_examples=5, deadline=None)
@given(st.lists(flow_fields, min_size=1, max_size=30))
def test_parse_unparse_roundtrip(spark, field_dicts):
    lines = [_unparse(f) for f in field_dicts]
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    out = parse_lines(df).collect()
    got = {r["raw"]: r for r in out}
    for f in field_dicts:
        r = got[_unparse(f)]
        assert r["error"] is False, f"valid line parsed as error: {_unparse(f)!r}"
        assert r["version"] == f["version"]
        assert r["account-id"] == f["account"]
        assert r["interface-id"] == f["eni"]
        assert r["srcaddr"] == f["src"] and r["destaddr"] == f["dst"]
        assert (r["srcport"], r["dstport"]) == (f["srcport"], f["dstport"])
        assert (r["packets"], r["bytes"]) == (f["packets"], f["bytes"])
        assert (r["start"], r["end"]) == (f["start"], f["start"] + f["dur"])
        assert (r["action"], r["log-status"]) == (f["action"], f["status"])


def _reference_rfc1918(ip: str) -> bool:
    """Integer-CIDR reimplementation of decorator/index.js:149-153, including
    its quirks: 127/8 counted as private, 172.16/12 and nothing else."""
    addr = int(ipaddress.IPv4Address(ip))
    ranges = [
        ("127.0.0.0", 8), ("10.0.0.0", 8), ("172.16.0.0", 12), ("192.168.0.0", 16),
    ]
    return any(
        addr >> (32 - bits) == int(ipaddress.IPv4Address(net)) >> (32 - bits)
        for net, bits in ranges
    )


@settings(max_examples=5, deadline=None)
@given(st.lists(ips, min_size=1, max_size=200))
def test_rfc1918_matches_integer_reimplementation(spark, ip_list):
    df = spark.createDataFrame([(ip,) for ip in ip_list], ["ip"])
    got = {
        r["ip"]: r["priv"]
        for r in df.select("ip", is_rfc1918("ip").alias("priv")).collect()
    }
    for ip in ip_list:
        assert got[ip] == _reference_rfc1918(ip), ip


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.one_of(flow_fields.map(_unparse), st.text(max_size=40)),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_ok_plus_failed_equals_total(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    out = decorate_lines(df, fixtures.eni_dim_df(spark), fixtures.geo_dim_df(spark))
    counts = {r["result"]: r["n"] for r in
              out.groupBy("result").agg(F.count("*").alias("n")).collect()}
    # the invariant the reference logs per batch (decorator/index.js:232)
    assert counts.get("Ok", 0) + counts.get("ProcessingFailed", 0) == len(lines)

@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=50))
def test_hash32_split_matches_reference_md5(spark, keys):
    """Split stability is a data-integrity invariant: the hash32 bucket that
    drives train/val and stratified sampling must equal a from-scratch
    md5-based reimplementation for ARBITRARY unicode keys — if the Spark
    expression tree ever drifted (encoding, substring base, endianness), the
    holdout assignment of a 100 TB corpus would silently reshuffle."""
    import hashlib

    from aws_vpc_flow_log_appender_spark.ext.sampling import hash32

    def reference(key: str, salt: str) -> int:
        return int(hashlib.md5(f"{salt}:{key}".encode("utf-8")).hexdigest()[:8], 16)

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["k"]: r["h"]
        for r in df.select("k", hash32(F.col("k"), "split").alias("h")).collect()
    }
    for k in keys:
        assert got[k] == reference(k, "split"), repr(k)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "cat", "dog", "x y", "ü"]),
                min_size=1, max_size=60))
def test_countmin_matches_reference_and_is_one_sided(spark, toks):
    """The count-min bucket/accumulate math must equal a from-scratch
    pure-Python sketch for ARBITRARY token multisets (tiny alphabet so the
    same token recurs and cells accumulate), and every estimate must sit at
    or above its true count — the one-sided guarantee as a property, not a
    fixture fact."""
    import hashlib
    from collections import Counter

    from aws_vpc_flow_log_appender_spark.ext.sketches import (
        _CM_D,
        _CM_W,
        _cm_bucket_spark,
    )

    true = Counter(toks)
    cells: Counter = Counter()
    for tok, n in true.items():
        for j in range(_CM_D):
            b = int(hashlib.md5(f"{j}:{tok}".encode()).hexdigest()[:8], 16) % _CM_W
            cells[(j, b)] += n
    ref_est = {
        tok: min(
            cells[(j, int(hashlib.md5(f"{j}:{tok}".encode()).hexdigest()[:8], 16) % _CM_W)]
            for j in range(_CM_D)
        )
        for tok in true
    }

    df = spark.createDataFrame([(t,) for t in toks], ["tok"])
    tc = df.groupBy("tok").agg(F.count("*").alias("true_count"))
    js = spark.range(_CM_D).select(F.col("id").alias("j"))
    hb = tc.crossJoin(F.broadcast(js)).withColumn(
        "bucket", _cm_bucket_spark(F.col("j"), F.col("tok"))
    )
    sk = hb.groupBy("j", "bucket").agg(F.sum("true_count").alias("cnt"))
    got = {
        r["tok"]: r["est"]
        for r in hb.join(sk, ["j", "bucket"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est"))
        .collect()
    }
    for tok, n in true.items():
        assert got[tok] == ref_est[tok], (tok, got[tok], ref_est[tok])
        assert got[tok] >= n


@settings(max_examples=5, deadline=None)
@given(st.sets(st.text(min_size=1, max_size=12), min_size=8, max_size=80))
def test_kmv_order_statistic_matches_reference(spark, elems):
    """The KMV 48-bit hash and k-th-smallest order statistic must equal a
    pure-Python reimplementation for arbitrary unicode element sets (k
    scaled to the set so the statistic always exists) — the estimator is
    only as portable as this hash slice and this rank."""
    import hashlib

    k = min(8, len(elems))
    ref_hashes = sorted(
        int(hashlib.md5(e.encode("utf-8")).hexdigest()[:12], 16) for e in elems
    )
    # distinct hashes: collisions collapse, mirroring the engine's distinct
    ref_kth = sorted(set(ref_hashes))[k - 1]

    from pyspark.sql import Window as W

    df = spark.createDataFrame([(e,) for e in elems], ["elem"])
    dh = df.select(
        F.conv(F.substring(F.md5(F.encode("elem", "utf-8")), 1, 12), 16, 10)
        .cast("long")
        .alias("h")
    ).distinct()
    got_kth = (
        dh.withColumn("rn", F.row_number().over(W.orderBy("h")))
        .filter(F.col("rn") == k)
        .collect()[0]["h"]
    )
    assert got_kth == ref_kth
