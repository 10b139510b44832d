"""Source/sink adapter tests with injected fake AWS clients (S5/S8/S9/S10)."""

import pytest
from pyspark.sql import functions as F

from aws_vpc_flow_log_appender_spark.sources.aws import (
    eni_dimension_from_ec2,
    firehose_sink,
    get_parameter,
)
from aws_vpc_flow_log_appender_spark.sources.geocode_udf import make_geocode_udf


def test_firehose_sink_chunks_at_500(spark, tmp_path):
    # the sink runs on executors (separate worker processes) — capture each
    # put_record_batch call as a file the driver-side test can read back
    calls_dir = tmp_path / "calls"
    calls_dir.mkdir()

    def make_client(calls_dir=str(calls_dir)):
        import os
        import uuid

        class FakeFirehose:
            def put_record_batch(self, DeliveryStreamName, Records):
                path = os.path.join(calls_dir, uuid.uuid4().hex)
                with open(path, "w") as f:
                    f.write(f"{DeliveryStreamName},{len(Records)}")
                return {"FailedPutCount": 0}

        return FakeFirehose()

    df = spark.createDataFrame([(str(i),) for i in range(1200)], ["Data"]).coalesce(1)
    sink = firehose_sink("test-stream", client_factory=make_client)
    sink(df, epoch_id=0)
    calls = [p.read_text().split(",") for p in calls_dir.iterdir()]
    assert sorted(int(n) for _, n in calls) == [200, 500, 500]  # 500-flush + remainder
    assert all(s == "test-stream" for s, _ in calls)


def test_firehose_sink_refuses_inconsistent_failed_count(spark, tmp_path):
    """A Firehose response claiming FailedPutCount > 0 whose per-record
    entries carry NO ErrorCode must raise, not return success — the old
    code filtered the retry chunk to empty and silently dropped the
    records AWS reported failed (code-review r6)."""

    def make_client():
        class LyingFirehose:
            def put_record_batch(self, DeliveryStreamName, Records):
                return {
                    "FailedPutCount": 1,
                    "RequestResponses": [
                        {"RecordId": str(i)} for i in range(len(Records))
                    ],
                }

        return LyingFirehose()

    df = spark.createDataFrame([(str(i),) for i in range(10)], ["Data"]).coalesce(1)
    sink = firehose_sink("test-stream", client_factory=make_client)
    with pytest.raises(Exception, match="inconsistent|ErrorCode"):
        sink(df, epoch_id=0)


class FakeEC2:
    def describe_network_interfaces(self, **kwargs):
        if "NextToken" not in kwargs:
            return {
                "NetworkInterfaces": [{
                    "NetworkInterfaceId": "eni-page1",
                    "Groups": [{"GroupId": "sg-1", "GroupName": "web"}],
                    "PrivateIpAddresses": [
                        {"Primary": True, "PrivateIpAddress": "10.0.0.1"},
                        {"Primary": False, "PrivateIpAddress": "10.0.0.2"},
                    ],
                }],
                "NextToken": "t1",
            }
        return {
            "NetworkInterfaces": [{
                "NetworkInterfaceId": "eni-page2",
                "Groups": [],
                "PrivateIpAddresses": [{"Primary": True, "PrivateIpAddress": "10.0.1.1"}],
            }],
        }


def test_eni_dimension_paginates_and_projects(spark):
    dim = eni_dimension_from_ec2(spark, client_factory=FakeEC2)
    rows = {r["interfaceId"]: r for r in dim.collect()}
    assert set(rows) == {"eni-page1", "eni-page2"}
    assert rows["eni-page1"]["securityGroupIds"] == ["sg-1"]
    assert rows["eni-page1"]["ipAddress"] == ["10.0.0.1"]  # [?Primary] filter
    assert rows["eni-page2"]["securityGroupIds"] == []


def test_get_parameter_memoizes():
    calls = {"n": 0}

    class FakeSSM:
        def get_parameter(self, Name, WithDecryption):
            calls["n"] += 1
            return {"Parameter": {"Value": f"secret-{Name}"}}

    cache = {}
    assert get_parameter("k1", FakeSSM, _cache=cache) == "secret-k1"
    assert get_parameter("k1", FakeSSM, _cache=cache) == "secret-k1"
    assert calls["n"] == 1  # memoized like geocode.js:31,:57


def test_geocode_udf_memoizes_and_degrades(spark, tmp_path):
    # the resolver runs on executors: count invocations via marker files
    calls_dir = tmp_path / "geo_calls"
    calls_dir.mkdir()

    def resolver(ip, calls_dir=str(calls_dir)):
        import os
        import uuid

        with open(os.path.join(calls_dir, f"{ip}-{uuid.uuid4().hex}"), "w"):
            pass
        if ip == "1.1.1.1":
            return {"country_code": "AU", "country_name": "Australia",
                    "region_code": "", "region_name": "", "city": "",
                    "latitude": -33.8, "longitude": 151.2}
        raise RuntimeError("quota exceeded")

    geocode = make_geocode_udf(resolver)
    df = spark.createDataFrame(
        [("1.1.1.1",), ("9.9.9.9",), ("1.1.1.1",), ("9.9.9.9",),
         ("9.9.9.9",), (None,)], ["ip"]
    ).coalesce(1)
    out = df.select("ip", geocode(F.col("ip")).alias("geo")).collect()
    by_ip = {}
    for r in out:
        by_ip.setdefault(r["ip"], r["geo"])
    assert by_ip["1.1.1.1"]["country_code"] == "AU"
    assert by_ip["9.9.9.9"] is None  # degrade-don't-fail (README.md:145 fix)
    assert by_ip[None] is None
    calls = [p.name.rsplit("-", 1)[0] for p in calls_dir.iterdir()]
    # positive result resolved once (memoized); the persistently-FAILING
    # hot IP also resolved once per batch (negative cache, code-review r6:
    # one RPC per row would deepen the quota exhaustion being handled)
    assert calls.count("1.1.1.1") == 1
    assert calls.count("9.9.9.9") == 1


def test_geocode_default_resolver_is_stubbed(spark):
    geocode = make_geocode_udf()
    df = spark.createDataFrame([("8.8.8.8",)], ["ip"])
    # resolver raises inside the UDF -> degrade path yields NULL, not failure
    row = df.select(geocode(F.col("ip")).alias("geo")).collect()[0]
    assert row["geo"] is None


def test_elasticsearch_sink_injectable_writer(spark):
    """S11: the sink delivers through an injected transport (the es-hadoop
    jar is absent here); the wrapper must hand the writer the exact frame
    and addressing it would give the connector."""
    from aws_vpc_flow_log_appender_spark.sources.aws import (
        elasticsearch_sink,
        elasticsearch_stream_sink,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "record_id long, payload string"
    )
    seen = []
    elasticsearch_sink(
        df, "flowlogs/enriched", "es:9200",
        writer=lambda d, res, nodes: seen.append(
            (res, nodes, sorted(r["record_id"] for r in d.collect()))
        ),
    )
    assert seen == [("flowlogs/enriched", "es:9200", [1, 2])]

    # streaming shape: the foreachBatch body routes through the same writer
    batches = []
    sink = elasticsearch_stream_sink(
        "flowlogs/enriched", "es:9200",
        writer=lambda d, res, nodes: batches.append(d.count()),
    )
    sink(df, epoch_id=0)
    sink(df, epoch_id=1)
    assert batches == [2, 2]


def test_elasticsearch_sink_without_jar_raises_not_implemented(spark):
    """Without an injected writer and without the connector jar, the failure
    must be the clear capability error, not an opaque ClassNotFound."""
    from aws_vpc_flow_log_appender_spark.sources.aws import elasticsearch_sink

    df = spark.createDataFrame([(1,)], "record_id long")
    with pytest.raises(NotImplementedError, match="elasticsearch"):
        elasticsearch_sink(df, "idx/doc", "localhost:9200")
