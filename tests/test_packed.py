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


def test_replicate_rows_exact_bit_exact():
    """Scatter + diff-cumsum replication reproduces each source row exactly
    over its [base, base+count) output segment, including float words and
    extreme int32 values (wrap-around arithmetic must be bit-exact)."""
    import numpy as np
    import jax.numpy as jnp
    from datafusion_parallelism_tpu.utils.columnar import replicate_rows_exact

    rng = np.random.default_rng(7)
    m, out_cap = 64, 256
    # adversarial words: full-range int32 incl. INT_MIN/INT_MAX and float bits
    words = rng.integers(-2**31, 2**31, size=(5, m), dtype=np.int64).astype(np.int32)
    words[0, :8] = [-2**31, 2**31 - 1, 0, -1, 2**31 - 1, -2**31, 1, -2]
    count = rng.integers(0, 5, size=m).astype(np.int32)
    count[::7] = 0                      # interleaved empty segments
    base = np.cumsum(count) - count
    total = int(count.sum())
    assert total <= out_cap
    rep = np.asarray(replicate_rows_exact(jnp.asarray(words),
                                          jnp.asarray(base.astype(np.int32)),
                                          jnp.asarray(count), out_cap))
    expect = np.repeat(words, count, axis=1)
    np.testing.assert_array_equal(rep[:, :total], expect)


def test_take_rows_fused_matches_separate():
    import numpy as np
    import jax.numpy as jnp
    from datafusion_parallelism_tpu.utils.columnar import (
        HostTable, pack_table, take_rows_fused, unpack_table)

    a = HostTable.from_pydict({"x": [1, 2, None, 4], "f": [0.5, None, 2.5, 3.5]}).to_device()
    b = HostTable.from_pydict({"y": ["p", "q", "r", None], "g": [9.0, 8.0, 7.0, 6.0]}).to_device()
    idx = jnp.asarray(np.array([3, 0, 0, 2], np.int32))
    pa, pb = pack_table(a), pack_table(b)
    fa, fb = take_rows_fused([pa, pb], idx)
    sa, sb = pa.take_rows(idx), pb.take_rows(idx)
    np.testing.assert_array_equal(np.asarray(fa.packed), np.asarray(sa.packed))
    np.testing.assert_array_equal(np.asarray(fb.packed), np.asarray(sb.packed))
    for k in pa.f64s:
        np.testing.assert_array_equal(np.asarray(fa.f64s[k]), np.asarray(sa.f64s[k]))
    ta = unpack_table(fa, a.schema, 4)
    assert ta.to_host().to_pylist()[1]["x"] == 1
