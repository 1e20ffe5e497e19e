"""Parquet ingestion: HostTable -> parquet -> HostTable round-trips every
column kind (strings re-dictionary-encode sorted+unique, decimals stay in
the scaled-int64 domain), and the TPC-H CLI --data-path flag loads a
directory of parquet files and still matches the oracle."""

import numpy as np
import pytest

pa = pytest.importorskip("pyarrow")

from datafusion_parallelism_tpu import SessionContext
from datafusion_parallelism_tpu.tpch.cli import apply_config_file, run
from datafusion_parallelism_tpu.tpch.datagen import generate_tables
from datafusion_parallelism_tpu.utils.columnar import DECIMAL, HostTable
from datafusion_parallelism_tpu.utils.parquet_io import (read_parquet,
                                                         write_parquet)


def test_roundtrip_all_kinds(tmp_path):
    t = HostTable.from_pydict({
        "i": [1, None, 3, 4],
        "big": [2**40, 5, None, 7],
        "f": [1.5, 2.5, None, 4.0],
        "s": ["b", None, "a", "b"],
        "b": [True, False, None, True],
        "d": [1.25, -4.56, None, 0.01],
    }, dtypes={"d": DECIMAL(2)})
    p = str(tmp_path / "t.parquet")
    write_parquet(t, p)
    back = read_parquet(p)
    assert back.to_pylist() == t.to_pylist()
    # dictionary invariant: sorted + unique
    f = next(f for f in back.schema.fields if f.name == "s")
    vals = list(f.dictionary.values)
    assert vals == sorted(set(vals))
    # decimals stayed exact scaled ints
    d = next(f for f in back.schema.fields if f.name == "d")
    assert d.dtype.scale == 2
    assert back.columns["d"][0].tolist()[:2] == [125, -456]


def test_query_over_parquet(tmp_path):
    t = HostTable.from_pydict({
        "k": [1, 2, 2, 3], "v": [10.0, 20.0, 30.0, None]})
    p = str(tmp_path / "t.parquet")
    write_parquet(t, p)
    ctx = SessionContext()
    ctx.register_parquet("t", p)
    rows = ctx.sql("SELECT k, SUM(v) AS s FROM t GROUP BY k ORDER BY k"
                   ).collect().to_pylist()
    assert rows == [{"k": 1, "s": 10.0}, {"k": 2, "s": 50.0},
                    {"k": 3, "s": None}]


def test_cli_data_path_parquet(tmp_path):
    tables = generate_tables(sf=0.001)
    for name, t in tables.items():
        write_parquet(t, str(tmp_path / f"{name}.parquet"))
    res = run(["--data-path", str(tmp_path), "--query", "6",
               "--iterations", "1", "--check"])
    assert res["checked"][6] is True


def test_config_file(tmp_path):
    from datafusion_parallelism_tpu import SessionConfig
    p = tmp_path / "cfg"
    p.write_text("broadcast_threshold = 128  # comment\nskew_salting=True\n")
    cfg = SessionConfig()
    apply_config_file(cfg, str(p))
    assert cfg.broadcast_threshold == 128
    assert cfg.skew_salting is True
    p.write_text("not_a_key=1\n")
    with pytest.raises(KeyError):
        apply_config_file(cfg, str(p))


def test_generate_cli_roundtrip(tmp_path):
    """generate CLI -> --data-path load -> oracle check, both formats."""
    from datafusion_parallelism_tpu.tpch.generate import run as gen
    out_pq = str(tmp_path / "pq")
    gen(["--scale-factor", "0.001", "--output", out_pq])
    res = run(["--data-path", out_pq, "--query", "1",
               "--iterations", "1", "--check"])
    assert res["checked"][1] is True
    out_tbl = str(tmp_path / "tbl")
    gen(["--scale-factor", "0.001", "--output", out_tbl, "--format", "tbl",
         "--tables", "region", "nation"])
    import os
    assert os.path.exists(os.path.join(out_tbl, "region.tbl"))
