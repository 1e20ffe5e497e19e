# Diagnose the SF1 distributed leak: drive Q1 through the same path with
# stage prints + faulthandler timeout dumps.
import faulthandler, sys, os
faulthandler.dump_traceback_later(240, repeat=True)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import datafusion_parallelism_tpu as dfp
from datafusion_parallelism_tpu import SessionConfig
from datafusion_parallelism_tpu.tpch.cli import load_data_path
from datafusion_parallelism_tpu.tpch.queries import QUERIES
print("loading tables...", flush=True)
tables = load_data_path("/root/data/sf1_bin")
ctx = dfp.SessionContext(SessionConfig(target_partitions=8))
for n, t in tables.items():
    ctx.register_table(n, t)
print("planning...", flush=True)
h = ctx.sql(QUERIES[1])
print("plan done; collecting...", flush=True)
rows = h.collect().to_pylist()
print("rows:", len(rows), "compiles:", h.metrics.compile_count, flush=True)
