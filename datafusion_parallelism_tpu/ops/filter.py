"""Filter operator: predicate -> compaction (NULL predicate rejects, SQL WHERE).

With `out_cap`, the surviving rows compact into a SMALLER static capacity —
the engine's adaptive-capacity mechanism: selective filters shrink every
downstream operator's working set (capacities are static under jit, so the
executor guesses from statistics and grows on overflow, exactly like join
output capacities). Returns the true match count for that overflow check.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..utils.columnar import (DeviceTable, filter_rows, pack_table,
                              compact_rows, unpack_table)
from .expressions import Expr


def filter_table(t: DeviceTable, predicate: Expr,
                 out_cap: Optional[int] = None
                 ) -> Tuple[DeviceTable, jnp.ndarray]:
    v, valid, _ = predicate.eval(t)
    mask = t.row_mask() & valid & v.astype(jnp.bool_)
    if out_cap is None or out_cap >= t.capacity:
        out = filter_rows(t, mask)
        return out, out.num_rows
    (pt,), n = compact_rows([pack_table(t)], mask, out_cap)
    return unpack_table(pt, t.schema, jnp.minimum(n, out_cap)), n
