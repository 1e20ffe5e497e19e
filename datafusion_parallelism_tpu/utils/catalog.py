"""Table catalog with statistics (analog of reference StaticTable, which
carries exact synthetic Statistics to steer the optimizer —
reference src/utils/static_table.rs:45-140 and the fake-statistics planner
test trick in src/lib.rs:519-547)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

from .columnar import DeviceTable, HostTable, round_capacity


@dataclass
class Statistics:
    row_count: int
    distinct: Dict[str, int] = field(default_factory=dict)


class RegisteredTable:
    def __init__(self, name: str, host: HostTable,
                 statistics: Optional[Statistics] = None):
        self.name = name
        self.host = host
        self.statistics = statistics or Statistics(row_count=host.num_rows)
        self._device: Optional[DeviceTable] = None

    def distinct_of(self, col: str) -> int:
        """Distinct count for a column; computed once (np.unique over the
        host data) unless the registration supplied it. Join ordering keys
        off this (reference steers its planner with exact synthetic
        Statistics the same way, static_table.rs:45-140)."""
        d = self.statistics.distinct.get(col)
        if d is None:
            import numpy as np
            vals, valid = self.host.columns[col]
            d = max(int(np.unique(vals[valid]).size), 1)
            self.statistics.distinct[col] = d
        return d

    def device(self) -> DeviceTable:
        if self._device is None:
            self._device = self.host.to_device()
        return self._device


class Catalog:
    def __init__(self):
        self.tables: Dict[str, RegisteredTable] = {}

    def register(self, name: str, host: HostTable,
                 statistics: Optional[Statistics] = None):
        self.tables[name] = RegisteredTable(name, host, statistics)

    def get(self, name: str) -> RegisteredTable:
        if name not in self.tables:
            raise KeyError(f"table {name!r} is not registered; "
                           f"have {sorted(self.tables)}")
        return self.tables[name]
