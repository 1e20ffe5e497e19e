"""Session-level API: config + SQL -> executable query.

Analog of reference src/parse_sql.rs (`make_session_state_with_config`,
`parse_sql`): a SessionConfig carrying the join strategy (our analog of the
`JoinReplacement` version enum, parse_sql.rs:12-24), `target_partitions`,
and `replacement_required` (parse_sql.rs:40), plus a SessionContext that
registers tables with optional synthetic Statistics and plans SQL.
"""

from __future__ import annotations

from typing import Optional

from .models.planner import Planner
from .models.sql_parser import parse_sql
from .ops.hash_table import JoinStrategy
from .runtime.executor import QueryHandle
from .utils.catalog import Catalog, Statistics
from .utils.columnar import HostTable


class SessionConfig:
    def __init__(self, target_partitions: int = 1,
                 join_strategy: JoinStrategy = JoinStrategy.CSR,
                 replacement_required: bool = True,
                 broadcast_threshold: int = 4096,
                 skew_salting: Optional[bool] = None,
                 skew_factor: float = 8.0,
                 skew_threshold: float = 4.0,
                 distributed_staged: Optional[bool] = None):
        self.target_partitions = target_partitions
        self.join_strategy = join_strategy
        self.replacement_required = replacement_required
        # distributed-mode knobs (the reference's broadcast-join threshold +
        # the salted replacement for work stealing). skew_salting: None =
        # automatic from statistics (a join salts itself when the probe
        # side's hottest key would load one device at >= skew_threshold x
        # the balanced share); True/False force it on/off.
        self.broadcast_threshold = broadcast_threshold
        self.skew_salting = skew_salting
        self.skew_factor = skew_factor
        self.skew_threshold = skew_threshold
        # None = auto: multi-join plans over large inputs execute staged
        # (per-join shard_map programs with materialized boundaries) so each
        # launch's per-device working set stays bounded
        self.distributed_staged = distributed_staged


class SessionContext:
    def __init__(self, config: Optional[SessionConfig] = None):
        self.config = config or SessionConfig()
        self.catalog = Catalog()

    def register_table(self, name: str, table: HostTable,
                       statistics: Optional[Statistics] = None):
        self.catalog.register(name, table, statistics)

    def register_pydict(self, name: str, data: dict, dtypes=None,
                        statistics: Optional[Statistics] = None):
        self.register_table(name, HostTable.from_pydict(data, dtypes),
                            statistics)

    def register_parquet(self, name: str, path: str,
                         statistics: Optional[Statistics] = None):
        """Register a parquet file, directory of part files, or glob (the
        reference registers tpchgen parquet dirs, tpc/src/main.rs:196-224)."""
        from .utils.parquet_io import read_parquet
        self.register_table(name, read_parquet(path), statistics)

    def sql(self, query: str) -> QueryHandle:
        stmt = parse_sql(query)
        planner = Planner(self.catalog, self.config)
        planned = planner.plan(stmt)
        if self.config.target_partitions > 1:
            from .runtime.distributed_executor import DistributedQueryHandle
            return DistributedQueryHandle(planned.plan, self.catalog,
                                          planned.scalar_subqueries,
                                          self.config)
        return QueryHandle(planned.plan, self.catalog,
                           planned.scalar_subqueries, self.config)
