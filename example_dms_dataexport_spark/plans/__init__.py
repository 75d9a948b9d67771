"""Physical-plan introspection helpers (the .explain() feedback loop) and
table statistics collection (the ANALYZE surface)."""

from .stats import profile, sql_profile  # noqa: F401
from .introspect import (  # noqa: F401
    broadcast_hint_count,
    broadcast_join_count,
    exchange_count,
    physical_plan,
    pushed_filters,
    scan_columns,
)
