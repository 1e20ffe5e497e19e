"""Filter operator: predicate -> compaction (NULL predicate rejects, SQL WHERE)."""

from __future__ import annotations

from ..utils.columnar import DeviceTable, filter_rows
from .expressions import Expr


def filter_table(t: DeviceTable, predicate: Expr) -> DeviceTable:
    import jax.numpy as jnp
    v, valid, _ = predicate.eval(t)
    mask = t.row_mask() & valid & v.astype(jnp.bool_)
    return filter_rows(t, mask)
