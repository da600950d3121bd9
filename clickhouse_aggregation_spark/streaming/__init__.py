from .maintainer import (  # noqa: F401
    INCREMENTAL_ROLLUPS, IncrementalRollup, run_maintainer_stream,
    streaming_dedup_24h,
)
from .stateful import sessionize_batch, sessionize_stream  # noqa: F401
