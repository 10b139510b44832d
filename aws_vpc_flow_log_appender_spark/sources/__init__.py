from .ingest import (  # noqa: F401
    decode_cloudwatch_events,
    extract_log_lines,
    frame_firehose_batches,
)
