from .maintainer import (  # noqa: F401
    INCREMENTAL_ROLLUPS, IncrementalRollup, run_maintainer_stream,
    streaming_dedup_24h,
)
