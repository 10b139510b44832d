from .dedup import (  # noqa: F401
    dedup_exact_within_watermark,
    dedup_simhash_within_watermark,
)
from .flowlog import stream_decorate  # noqa: F401
from .joins import stream_stream_interval_join  # noqa: F401
from .stateful import (  # noqa: F401
    dedup_first_occurrence_stream,
    running_totals_stream,
)
from .windows import (  # noqa: F401
    sessionized_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)
