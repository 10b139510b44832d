"""aws_vpc_flow_log_appender_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of amazon-archives/aws-vpc-flow-log-appender.

The reference (/root/reference) is a serverless streaming-ETL pipeline:
CloudWatch Logs -> Lambda ingestor -> Kinesis Firehose -> Lambda decorator
(parse + enrich with security groups and geolocation) -> Elasticsearch.

This package re-expresses those capabilities Spark-first:

- ``schema``    declared StructTypes (the reference's schemas are implicit)
- ``parse``     decode/tokenize/cast/validity-split (decorator/index.js:100-139)
- ``enrich``    ENI broadcast join + geo range join   (decorator/index.js:163-197)
- ``package``   Ok/ProcessingFailed tagging + payload (decorator/index.js:206-234)
- ``pipeline``  the composed flagship query, batch + streaming
- ``sources``   ingest-side decoding (CloudWatch envelope, Firehose records)
- ``operators`` the generic relational operator surface (joins/aggs/windows/...)
- ``functions`` scalar function helpers shared across operators
- ``ext``       scale extensions: dedup, similarity search, text analysis,
                multimodal column plumbing
- ``streaming`` Structured Streaming wrappers (windows, watermarks,
                stream-static joins, foreachBatch sinks)
"""

__version__ = "0.1.0"
