from .tiering import (  # noqa: F401
    archive_old_transfers, transfers_complete_view, write_partitioned,
)
