"""pack_table/unpack_table round-trip across every column kind."""

import numpy as np

from datafusion_parallelism_tpu.utils.columnar import (HostTable, pack_table,
                                                       unpack_table)


def test_pack_roundtrip_all_kinds():
    t = HostTable.from_pydict({
        "i": [1, None, -3, 2**40],            # int64
        "f": [1.5, 2.5, None, -0.25],         # float64
        "s": ["a", "b", None, "a"],           # string codes
        "b": [True, False, None, True],       # bool
    }).to_device()
    pt = pack_table(t)
    assert pt.packed.shape[1] == t.capacity  # [W, cap]: W on the major axis
    out = unpack_table(pt, t.schema, t.num_rows)
    assert out.to_host().to_pylist() == t.to_host().to_pylist()


def test_pack_gather_rows():
    import jax.numpy as jnp
    t = HostTable.from_pydict({
        "x": [10, 20, 30, 40],
        "y": [1.0, 2.0, None, 4.0],
    }).to_device()
    pt = pack_table(t).take_rows(jnp.asarray([3, 1, 0, 2], jnp.int32))
    out = unpack_table(pt, t.schema, 4)
    rows = out.to_host().to_pylist()
    assert [r["x"] for r in rows] == [40, 20, 10, 30]
    assert rows[3]["y"] is None
