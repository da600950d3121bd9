from .bucketing import (  # noqa: F401
    block_range_day, block_hour, block_partition, to_day,
    to_start_of_hour, to_yyyymm, to_yyyymmdd, size_bucket,
)
from .misc import format_readable_size, multi_if  # noqa: F401
