"""Session-level API (placeholder; filled in with the SQL front end).

Analog of reference src/parse_sql.rs: session config + SQL -> physical plan.
"""

from __future__ import annotations

from .ops.hash_table import JoinStrategy


class SessionConfig:
    def __init__(self, target_partitions: int = 1,
                 join_strategy: JoinStrategy = JoinStrategy.CSR,
                 replacement_required: bool = True):
        self.target_partitions = target_partitions
        self.join_strategy = join_strategy
        self.replacement_required = replacement_required


class SessionContext:
    """Filled in once the planner lands."""

    def __init__(self, config: SessionConfig | None = None):
        self.config = config or SessionConfig()
        self.tables = {}

    def register_table(self, name: str, table):
        self.tables[name] = table
