"""Join-core tests: every join type x every strategy against a brute-force
oracle, with duplicates, nulls, and no-match cases (the analog of reference
src/lib.rs multi_tests! matrix + per-map unit tests)."""

import random

import jax
import numpy as np
import pytest

from datafusion_parallelism_tpu.utils.columnar import HostTable
from datafusion_parallelism_tpu.ops.join import JoinType, hash_join
from datafusion_parallelism_tpu.ops.hash_table import JoinStrategy

from oracle import oracle_join, assert_rows_equal

ALL_TYPES = list(JoinType)
STRATEGIES = [JoinStrategy.CSR, JoinStrategy.SORT, JoinStrategy.OA]


def run_join(build_rows, probe_rows, bkeys, pkeys, jt, strategy, residual=None,
             residual_dev=None, out_cap=None):
    bnames = sorted({k for r in build_rows for k in r})
    pnames = sorted({k for r in probe_rows for k in r})
    bt = HostTable.from_pydict({n: [r.get(n) for r in build_rows] for n in bnames}).to_device()
    pt = HostTable.from_pydict({n: [r.get(n) for r in probe_rows] for n in pnames}).to_device()
    cap = out_cap or max(128, 4 * (len(build_rows) + 1) * (len(probe_rows) + 1))
    result, total = hash_join(bt, pt, bkeys, pkeys, jt, cap,
                              strategy=strategy, residual=residual_dev)
    assert int(total) <= cap, "candidate overflow in test sizing"
    return result.to_host().to_pylist()


def make_rows(n, key_space, seed, nulls=False, extra="v"):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randrange(key_space)
        key = None if (nulls and rng.random() < 0.15) else k
        rows.append({"k": key, extra: i})
    return rows


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.parametrize("jt", ALL_TYPES)
def test_join_types_random(jt, strategy):
    build = [{"bk": r["k"], "bv": r["v"]} for r in make_rows(57, 20, 1, nulls=True)]
    probe = [{"pk": r["k"], "pv": r["v"]} for r in make_rows(91, 20, 2, nulls=True)]
    actual = run_join(build, probe, ["bk"], ["pk"], jt, strategy)
    expected = oracle_join(build, probe, ["bk"], ["pk"], jt.value)
    assert_rows_equal(actual, expected)


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.parametrize("jt", ALL_TYPES)
def test_join_no_matches(jt, strategy):
    build = [{"bk": i, "bv": i} for i in range(10)]
    probe = [{"pk": i + 100, "pv": i} for i in range(14)]
    actual = run_join(build, probe, ["bk"], ["pk"], jt, strategy)
    expected = oracle_join(build, probe, ["bk"], ["pk"], jt.value)
    assert_rows_equal(actual, expected)


@pytest.mark.parametrize("jt", ALL_TYPES)
def test_join_heavy_duplicates(jt):
    # skewed: one hot key with many duplicates on both sides
    build = [{"bk": 7 if i % 3 else i, "bv": i} for i in range(40)]
    probe = [{"pk": 7 if i % 4 else i, "pv": i} for i in range(60)]
    actual = run_join(build, probe, ["bk"], ["pk"], jt, JoinStrategy.CSR)
    expected = oracle_join(build, probe, ["bk"], ["pk"], jt.value)
    assert_rows_equal(actual, expected)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_multi_key_join(strategy):
    rng = random.Random(3)
    build = [{"a": rng.randrange(4), "b": rng.randrange(4), "bv": i} for i in range(30)]
    probe = [{"c": rng.randrange(4), "d": rng.randrange(4), "pv": i} for i in range(30)]
    actual = run_join(build, probe, ["a", "b"], ["c", "d"], JoinType.INNER, strategy)
    expected = oracle_join(build, probe, ["a", "b"], ["c", "d"], "inner")
    assert_rows_equal(actual, expected)


@pytest.mark.parametrize("jt", [JoinType.INNER, JoinType.FULL, JoinType.LEFT])
def test_join_with_residual_filter(jt):
    build = [{"bk": i % 5, "bv": i} for i in range(20)]
    probe = [{"pk": i % 5, "pv": i} for i in range(20)]

    def residual_dev(pair_tbl):
        bv, bvalid = pair_tbl.column("bv")
        pv, pvalid = pair_tbl.column("pv")
        return (bv + pv) % 2 == 0, bvalid & pvalid

    actual = run_join(build, probe, ["bk"], ["pk"], jt, JoinStrategy.CSR,
                      residual_dev=residual_dev)
    expected = oracle_join(build, probe, ["bk"], ["pk"], jt.value,
                           residual=lambda r: (r["bv"] + r["pv"]) % 2 == 0)
    assert_rows_equal(actual, expected)


def test_string_key_join():
    build = [{"bk": k, "bv": i} for i, k in enumerate(["a", "b", "c", None, "a"])]
    probe = [{"pk": k, "pv": i} for i, k in enumerate(["a", "c", "c", None, "x"])]
    # string joins need a shared dictionary; re-encode probe with build's dict
    bnames, pnames = ["bk", "bv"], ["pk", "pv"]
    bt_host = HostTable.from_pydict({n: [r.get(n) for r in build] for n in bnames})
    d = bt_host.schema.field("bk").dictionary
    codes = np.array([d.code_of(r["pk"]) if r["pk"] is not None else 0 for r in probe],
                     dtype=np.int32)
    valid = np.array([r["pk"] is not None and d.code_of(r["pk"]) >= 0 for r in probe])
    from datafusion_parallelism_tpu.utils.columnar import STRING, INT32
    pt_host = HostTable.from_numpy(
        {"pk": codes, "pv": np.arange(len(probe), dtype=np.int32)},
        dtypes={"pk": STRING, "pv": INT32},
        dictionaries={"pk": d}, validity={"pk": valid})
    res, total = hash_join(bt_host.to_device(), pt_host.to_device(),
                           ["bk"], ["pk"], JoinType.INNER, 256)
    expected = oracle_join(build, probe, ["bk"], ["pk"], "inner")
    # 'x' not in dict -> validity False -> never matches: matches oracle
    assert_rows_equal(res.to_host().to_pylist(), expected)


def test_jit_join_is_traceable():
    build = [{"bk": i % 5, "bv": i} for i in range(16)]
    probe = [{"pk": i % 7, "pv": i} for i in range(16)]
    bt = HostTable.from_pydict({"bk": [r["bk"] for r in build],
                                "bv": [r["bv"] for r in build]}).to_device()
    pt = HostTable.from_pydict({"pk": [r["pk"] for r in probe],
                                "pv": [r["pv"] for r in probe]}).to_device()

    @jax.jit
    def run(bt, pt):
        return hash_join(bt, pt, ["bk"], ["pk"], JoinType.INNER, 128)

    result, total = run(bt, pt)
    expected = oracle_join(build, probe, ["bk"], ["pk"], "inner")
    assert_rows_equal(result.to_host().to_pylist(), expected)
