"""Native C++ .tbl parser vs the pure-Python fallback: identical tables."""

import numpy as np
import pytest

from datafusion_parallelism_tpu.native import tbl_library
from datafusion_parallelism_tpu.tpch.tbl_loader import (_load_tbl_python,
                                                        load_tbl)


@pytest.fixture
def tbl_file(tmp_path):
    rows = [
        "1|96|3|4|17.00|24710.35|0.04|0.02|N|O|1996-03-13|1996-02-12|1996-03-22|DELIVER IN PERSON|TRUCK|egular courts above the|",
        "1|68|9|2|36.00|56688.12|0.09|0.06|N|O|1996-04-12|1996-02-28|1996-04-20|TAKE BACK RETURN|MAIL|ly final dependencies: slyly bold |",
        "2|107|2|1|38.00|44694.46|0.00|0.05|N|O|1997-01-28|1997-01-14|1997-02-02|TAKE BACK RETURN|RAIL|ven requests. deposits breach a|",
        "3|5|10|3|-45.00|54058.05|0.06|0.00|R|F|1994-02-02|1994-01-04|1994-02-23|NONE|AIR|ongside of the furiously brave acco|",
    ]
    p = tmp_path / "lineitem.tbl"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def _table_dict(t):
    return t.to_pylist()


def test_python_parser(tbl_file):
    t = _load_tbl_python(tbl_file, "lineitem")
    rows = t.to_pylist()
    assert len(rows) == 4
    assert rows[0]["l_quantity"] == 17.0
    assert rows[0]["l_shipmode"] == "TRUCK"
    assert rows[3]["l_quantity"] == -45.0  # sign handling
    assert rows[2]["l_discount"] == 0.0
    # 1996-03-13 = 9568 days since epoch
    assert rows[0]["l_shipdate"] == 9568


def test_native_matches_python(tbl_file):
    if tbl_library() is None:
        pytest.skip("no native toolchain")
    native = load_tbl(tbl_file, "lineitem")
    python = _load_tbl_python(tbl_file, "lineitem")
    assert _table_dict(native) == _table_dict(python)


def test_native_large_roundtrip(tmp_path):
    if tbl_library() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    n = 5000
    lines = []
    for i in range(n):
        lines.append(f"{i}|{rng.integers(0, 100)}|{rng.integers(0, 10)}|1|"
                     f"{rng.integers(1, 50)}.00|{rng.integers(1, 10 ** 6)}.1{i % 10}|0.0{i % 10}|0.02|"
                     f"{'RAN'[i % 3]}|{'OF'[i % 2]}|199{i % 7}-0{i % 9 + 1}-1{i % 9}|"
                     f"1995-06-17|1995-07-01|NONE|MAIL|word{i % 97} word{i % 31}|")
    p = tmp_path / "lineitem.tbl"
    p.write_text("\n".join(lines) + "\n")
    native = load_tbl(str(p), "lineitem")
    python = _load_tbl_python(str(p), "lineitem")
    assert native.num_rows == n
    na, pa = native.to_pylist(), python.to_pylist()
    assert na == pa
