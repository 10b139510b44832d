"""AWS-facing source/sink adapters (SURVEY §2.1 S5/S8/S9/S11).

boto3 and the elasticsearch-hadoop jar are not in this container, so every
adapter takes an injectable client factory and degrades to a clear error (or
a provided fixture) when the real dependency is absent — the Spark-side
logic (batching, projection, foreachBatch wiring) is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from ..enrich import project_eni_dim
from ..schema import EC2_ENI_RAW_SCHEMA

try:  # pragma: no cover - not present in this container
    import boto3  # type: ignore
except ImportError:
    boto3 = None

FIREHOSE_MAX_BATCH = 500  # putRecordBatch API max (ingestor/index.js:84)


def firehose_sink(stream_name: str,
                  client_factory: Callable | None = None) -> Callable[[DataFrame, int], None]:
    """foreachBatch body that ships a ``Data`` column to Kinesis Firehose in
    500-record chunks (the reference's flush threshold, ingestor/index.js:84-87,
    which equals the API max).

    The putRecordBatch calls happen on the EXECUTORS via foreachPartition —
    no collect to driver; each partition chunks independently.
    """

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        if client_factory is None and boto3 is None:
            raise NotImplementedError(
                "firehose_sink needs boto3 or an injected client_factory"
            )
        factory = client_factory or (lambda: boto3.client("firehose"))

        def put_with_retry(client, chunk: list[dict], max_attempts: int = 5) -> None:
            """Firehose partial failures arrive as HTTP 200 + FailedPutCount;
            retry only the failed records (per-record ErrorCode) with backoff.
            The reference's whole-batch retry (ingestor/index.js:137-140)
            re-sends everything; this re-sends only what failed."""
            import time as _time

            attempt = 0
            while chunk:
                resp = client.put_record_batch(
                    DeliveryStreamName=stream_name, Records=chunk
                )
                if not resp.get("FailedPutCount"):
                    return
                responses = resp.get("RequestResponses", [])
                if len(responses) != len(chunk):
                    # can't tell WHICH records failed -> never silently drop
                    raise RuntimeError(
                        "firehose reported FailedPutCount="
                        f"{resp['FailedPutCount']} but returned "
                        f"{len(responses)} responses for {len(chunk)} records"
                    )
                chunk = [
                    rec for rec, r in zip(chunk, responses) if r.get("ErrorCode")
                ]
                # the per-record ErrorCodes must account for EVERY failure
                # the batch header claims — if they don't (entries missing
                # ErrorCode), records AWS reported failed would be neither
                # retried nor surfaced (code-review r6: same never-silently-
                # drop rule as the length-mismatch guard above)
                if len(chunk) != resp["FailedPutCount"]:
                    raise RuntimeError(
                        "firehose response inconsistent: FailedPutCount="
                        f"{resp['FailedPutCount']} but {len(chunk)} entries "
                        "carry an ErrorCode — refusing to silently drop"
                    )
                attempt += 1
                if attempt >= max_attempts:
                    raise RuntimeError(
                        f"firehose put_record_batch: {len(chunk)} records still "
                        f"failing after {max_attempts} attempts"
                    )
                _time.sleep(min(2 ** attempt * 0.1, 5.0))

        def ship(rows: Iterable) -> None:
            client = factory()  # one client per partition (executor-local)
            chunk: list[dict] = []
            for row in rows:
                if row["Data"] is None:
                    continue  # never build an invalid Firehose record
                chunk.append({"Data": row["Data"]})
                if len(chunk) >= FIREHOSE_MAX_BATCH:
                    put_with_retry(client, chunk)
                    chunk = []
            if chunk:
                put_with_retry(client, chunk)

        batch_df.select("Data").foreachPartition(ship)

    return write


def eni_dimension_from_ec2(spark: SparkSession,
                           client_factory: Callable | None = None,
                           fixture: DataFrame | None = None) -> DataFrame:
    """S8: the ENI dimension from EC2 DescribeNetworkInterfaces
    (decorator/index.js:52-55, 82-93), as a driver-side fetch -> small
    DataFrame -> jmespath-equivalent projection (enrich.project_eni_dim).

    ``fixture`` short-circuits for tests / offline runs.
    """
    if fixture is not None:
        return fixture
    if client_factory is None and boto3 is None:
        raise NotImplementedError(
            "eni_dimension_from_ec2 needs boto3 or an injected client_factory"
        )
    factory = client_factory or (lambda: boto3.client("ec2"))
    client = factory()
    pages: list[dict] = []
    token: str | None = None
    while True:  # paginate the full account listing like the reference does
        kwargs = {"NextToken": token} if token else {}
        resp = client.describe_network_interfaces(**kwargs)
        pages.extend(resp.get("NetworkInterfaces", []))
        token = resp.get("NextToken")
        if not token:
            break
    raw = spark.createDataFrame(
        [
            (
                eni.get("NetworkInterfaceId"),
                [(g.get("GroupId"), g.get("GroupName")) for g in eni.get("Groups", [])],
                [
                    (p.get("Primary"), p.get("PrivateIpAddress"))
                    for p in eni.get("PrivateIpAddresses", [])
                ],
            )
            for eni in pages
        ],
        EC2_ENI_RAW_SCHEMA,
    )
    return project_eni_dim(raw)


def get_parameter(name: str, client_factory: Callable | None = None,
                  _cache: dict = {}) -> str:  # noqa: B006 - intentional module cache
    """S9: SSM parameter fetch with module-scope memoization (the reference
    caches the ipstack API key per container, geocode.js:31,:57). Driver-side
    config — never a dataflow op."""
    if name in _cache:
        return _cache[name]
    if client_factory is None and boto3 is None:
        raise NotImplementedError("get_parameter needs boto3 or an injected client_factory")
    factory = client_factory or (lambda: boto3.client("ssm"))
    value = factory().get_parameter(Name=name, WithDecryption=True)["Parameter"]["Value"]
    _cache[name] = value
    return value


def elasticsearch_sink(df: DataFrame, resource: str, nodes: str,
                       mapping_id: str | None = None,
                       extra_options: dict[str, str] | None = None,
                       writer: Callable[[DataFrame, str, str], None] | None = None):
    """S11: Elasticsearch terminal sink (the reference's terminal store —
    Firehose-managed ES delivery, README.md:5,91).

    A thin ``df.write.format("org.elasticsearch.spark.sql")`` wrapper:
    ``es.nodes``/``es.resource`` addressing, optional ``es.mapping.id`` for
    idempotent upserts (re-delivery writes the same doc id instead of a
    duplicate — the es-hadoop equivalent of the reference's at-least-once
    Firehose delivery), and passthrough options.

    ``writer`` injects the transport for tests / alternative connectors;
    the NotImplementedError translation fires only when the es-hadoop jar is
    genuinely absent from the classpath.
    """
    if writer is not None:
        return writer(df, resource, nodes)
    try:
        w = (
            df.write.format("org.elasticsearch.spark.sql")
            .option("es.nodes", nodes)
            .option("es.resource", resource)
        )
        if mapping_id is not None:
            w = w.option("es.mapping.id", mapping_id)
        for k, v in (extra_options or {}).items():
            w = w.option(k, v)
        return w.save()
    except Exception as exc:  # pragma: no cover
        # only translate the missing-connector case; genuine write failures
        # (unreachable nodes, mapping/auth errors) must propagate untouched
        msg = str(exc)
        if "Failed to find data source" in msg or "ClassNotFound" in msg:
            raise NotImplementedError(
                "elasticsearch sink requires the elasticsearch-hadoop connector jar"
            ) from exc
        raise


def elasticsearch_stream_sink(resource: str, nodes: str,
                              mapping_id: str | None = None,
                              writer: Callable[[DataFrame, str, str], None] | None = None,
                              ) -> Callable[[DataFrame, int], None]:
    """S11 streaming shape: a ``foreachBatch`` body delivering each micro-batch
    through ``elasticsearch_sink`` — the Spark-native replacement for the
    reference's Firehose->ES managed delivery, reusing the same injectable
    transport so checkpointed re-delivery stays idempotent via mapping_id."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        elasticsearch_sink(
            batch_df, resource, nodes, mapping_id=mapping_id, writer=writer
        )

    return write
