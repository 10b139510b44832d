from .flowlog import stream_decorate  # noqa: F401
from .windows import (  # noqa: F401
    sessionized_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)
