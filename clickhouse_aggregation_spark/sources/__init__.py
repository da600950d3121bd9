from .tables import load_table, register_views  # noqa: F401
from .transfers import transfers_df, TRANSFERS_ORACLE_CTE, with_transfers  # noqa: F401
