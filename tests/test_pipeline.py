"""Golden tests for the flagship parse->enrich->package pipeline, mirroring the
reference's only fixture (decorator/event.json) plus branch-coverage corpus."""

import base64
import json

from pyspark.sql import functions as F

from aws_vpc_flow_log_appender_spark import fixtures
from aws_vpc_flow_log_appender_spark.enrich import (
    ip_to_int,
    is_rfc1918,
    project_eni_dim,
)
from aws_vpc_flow_log_appender_spark.parse import parse_records
from aws_vpc_flow_log_appender_spark.pipeline import decorate, enrich_flow_logs
from aws_vpc_flow_log_appender_spark.schema import EC2_ENI_RAW_SCHEMA


def _event_json_records(spark):
    return fixtures.firehose_records_df(spark, fixtures.EVENT_JSON_LINES)


def test_parse_event_json_records(spark):
    out = parse_records(_event_json_records(spark)).collect()
    assert len(out) == 2
    r = out[0].asDict()
    assert r["error"] is False
    assert r["version"] == 2
    assert r["account-id"] == 123456789010
    assert r["interface-id"] == "eni-1854f949"
    assert r["srcaddr"] == "72.21.196.65"
    assert r["destaddr"] == "172.31.16.21"
    assert (r["srcport"], r["dstport"], r["protocol"]) == (20641, 22, 6)
    assert (r["packets"], r["bytes"]) == (20, 4249)
    assert (r["start"], r["end"]) == (1418530010, 1418530070)
    assert (r["action"], r["log-status"]) == ("ACCEPT", "OK")
    assert r["@timestamp"] is not None


def test_malformed_line_error_routing(spark):
    recs = fixtures.firehose_records_df(
        spark, ["garbage not a flow log", fixtures.EVENT_JSON_LINES[0]]
    )
    out = {r["recordId"]: r.asDict() for r in parse_records(recs).collect()}
    bad = out["rec-000000"]
    assert bad["error"] is True
    assert bad["raw"] == "garbage not a flow log"
    assert bad["version"] is None and bad["@timestamp"] is None
    assert out["rec-000001"]["error"] is False


def test_ansi_hostile_records_never_fail_the_batch(spark):
    """The ANSI crash class (code-review r6): under Spark 4 ANSI defaults a
    single hostile record used to RAISE and kill the whole batch in three
    places — unbase64 on corrupt base64, cast('long') on a regex-valid line
    whose numeric token overflows int64, and ip_to_int on an overflowing
    octet. All three must instead degrade per record (dead-letter /
    NULL-field / geo-default), matching the reference's record-level
    error model (decorator/index.js:100-139, Number() floats and flows)."""
    overflow_line = (
        "2 123456789010 eni-1854f949 72.21.196.65 172.31.16.21 "
        "99999999999999999999 22 6 20 4249 1418530010 1418530070 ACCEPT OK"
    )
    recs = spark.createDataFrame(
        [("rec-b64", "not_base64!!!"),
         ("rec-ovf", base64.b64encode(overflow_line.encode()).decode()),
         ("rec-ok", base64.b64encode(
             fixtures.EVENT_JSON_LINES[0].encode()).decode())],
        "recordId string, data string",
    )
    out = {r["recordId"]: r.asDict() for r in parse_records(recs).collect()}
    # corrupt base64 -> NULL raw -> dead-lettered, batch survives
    assert out["rec-b64"]["error"] is True
    # regex-valid overflow line flows through with the field NULLed
    assert out["rec-ovf"]["error"] is False
    assert out["rec-ovf"]["srcport"] is None
    assert out["rec-ovf"]["dstport"] == 22
    assert out["rec-ok"]["error"] is False

    # ip_to_int on an overflowing octet: NULL, not a raised cast error
    huge = spark.createDataFrame(
        [("99999999999999999999.1.1.1",), ("1.2.3.4",)], "ip string"
    )
    got = {r["ip"]: r["n"] for r in huge.select(
        "ip", ip_to_int("ip").alias("n")).collect()}
    assert got["99999999999999999999.1.1.1"] is None
    assert got["1.2.3.4"] == (1 << 24) + (2 << 16) + (3 << 8) + 4


def test_eni_empty_primary_ip_array_is_outbound(spark):
    """An ENI whose jmespath [?Primary] projection yields an EMPTY ipAddress
    array (IPv6-only interface) must give direction='outbound' — the JS
    `[] == destaddr` comparison is false (decorator/index.js:169-173) —
    not raise INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI (code-review
    r6)."""
    from aws_vpc_flow_log_appender_spark.enrich import join_eni

    parsed = parse_records(_event_json_records(spark))
    eni = spark.createDataFrame(
        [("eni-1854f949", ["sg-1"], [])],
        "interfaceId string, securityGroupIds array<string>, "
        "ipAddress array<string>",
    )
    rows = join_eni(parsed, eni).collect()
    assert all(r["direction"] == "outbound" for r in rows
               if r["interface-id"] == "eni-1854f949")


def test_enrich_event_json_golden(spark):
    parsed = parse_records(_event_json_records(spark))
    enriched = enrich_flow_logs(
        parsed, fixtures.eni_dim_df(spark), fixtures.geo_dim_df(spark)
    )
    rows = {r["srcaddr"]: r.asDict() for r in enriched.collect()}

    pub = rows["72.21.196.65"]
    # ENI match: sg ids + direction (destaddr == primary ip -> inbound)
    assert pub["security-group-ids"] == ["sg-aaaa1111", "sg-bbbb2222"]
    assert pub["direction"] == "inbound"
    # public source in geo range -> Seattle
    assert pub["source-country-code"] == "US"
    assert pub["source-city"] == "Seattle"
    assert pub["source-location"].asDict() == {"lat": 47.6062, "lon": -122.3321}

    priv = rows["10.3.45.44"]
    # RFC1918 source: geo skipped, ''/0 defaults (decorator/index.js:182-190)
    assert priv["source-country-code"] == ""
    assert priv["source-city"] == ""
    assert priv["source-location"].asDict() == {"lat": 0.0, "lon": 0.0}
    assert priv["direction"] == "inbound"


def test_eni_miss_keeps_nulls(spark):
    line = "2 123456789010 eni-miss0001 8.8.8.8 172.31.16.21 1 2 6 1 40 1418530010 1418530070 ACCEPT OK"
    parsed = parse_records(fixtures.firehose_records_df(spark, [line]))
    enriched = enrich_flow_logs(
        parsed, fixtures.eni_dim_df(spark), fixtures.geo_dim_df(spark)
    )
    r = enriched.collect()[0].asDict()
    # no ENI match -> direction and sg-ids stay NULL (decorator/index.js:171-173)
    assert r["direction"] is None
    assert r["security-group-ids"] is None
    # 8.8.8.8 not covered by geo table -> ''/0 defaults, never NULL
    assert r["source-country-code"] == ""
    assert r["source-location"].asDict() == {"lat": 0.0, "lon": 0.0}


def test_geolocation_disabled_static_prune(spark):
    parsed = parse_records(_event_json_records(spark))
    enriched = enrich_flow_logs(
        parsed,
        fixtures.eni_dim_df(spark),
        fixtures.geo_dim_df(spark),
        geolocation_enabled=False,
    )
    rows = enriched.collect()
    assert all(r["source-country-code"] == "" for r in rows)
    # the geo join must be pruned from the plan entirely
    assert "start_ip_int" not in enriched._jdf.queryExecution().executedPlan().toString()


def test_packaged_output_roundtrip(spark):
    recs = fixtures.firehose_records_df(spark)  # seeded 200-line corpus
    out = decorate(recs, fixtures.eni_dim_df(spark), fixtures.geo_dim_df(spark))
    rows = out.collect()
    assert len(rows) == 200  # count(ok) + count(failed) == count(in)
    by_result = {}
    for r in rows:
        by_result.setdefault(r["result"], []).append(r)
    assert set(by_result) == {"Ok", "ProcessingFailed"}
    ok = json.loads(base64.b64decode(by_result["Ok"][0]["data"]))
    assert "interface-id" in ok and "source-location" in ok and "@timestamp" in ok
    # failed payloads pass the original data through unchanged
    failed = by_result["ProcessingFailed"][0]
    assert base64.b64decode(failed["data"]).decode() in {
        "CONTROL line not a flow log",
        "2 123456789010 broken",
        "1 12345 eni-xyz not-an-ip 1.2.3.4 1 2 3 4 5 6 7 DROP OK",
        "",
    }


def test_first_match_join_semantics(spark):
    dup_dim = fixtures.eni_dim_df(spark).unionByName(
        fixtures.eni_dim_df(spark).withColumn(
            "securityGroupIds", F.array(F.lit("sg-DUPLICATE"))
        )
    )
    parsed = parse_records(_event_json_records(spark))
    enriched = enrich_flow_logs(parsed, dup_dim, fixtures.geo_dim_df(spark))
    rows = enriched.collect()
    assert len(rows) == 2  # no fanout from duplicate build-side keys


def test_rfc1918_predicate_parity(spark):
    # replicate the reference regex's behavior incl. the 127/8 quirk
    cases = {
        "10.0.0.1": True, "172.16.0.1": True, "172.31.255.255": True,
        "192.168.1.1": True, "127.0.0.1": True,
        "172.32.0.1": False, "11.0.0.1": False, "8.8.8.8": False,
        "192.169.0.1": False,
    }
    df = spark.createDataFrame([(ip,) for ip in cases], ["ip"])
    got = {r["ip"]: r["priv"] for r in df.select("ip", is_rfc1918("ip").alias("priv")).collect()}
    assert got == cases


def test_ip_to_int(spark):
    df = spark.createDataFrame([("0.0.0.0",), ("255.255.255.255",), ("72.21.196.65",)], ["ip"])
    got = [r[0] for r in df.select(ip_to_int("ip")).collect()]
    assert got == [0, 4294967295, (72 << 24) + (21 << 16) + (196 << 8) + 65]


def test_jmespath_projection_equivalent(spark):
    raw = spark.createDataFrame(
        [(
            "eni-1854f949",
            [("sg-1", "web"), ("sg-2", "db")],
            [(False, "10.0.0.9"), (True, "172.31.16.21")],
        )],
        EC2_ENI_RAW_SCHEMA,
    )
    r = project_eni_dim(raw).collect()[0]
    assert r["interfaceId"] == "eni-1854f949"
    assert r["securityGroupIds"] == ["sg-1", "sg-2"]
    assert r["ipAddress"] == ["172.31.16.21"]  # [?Primary] filter keeps a list
