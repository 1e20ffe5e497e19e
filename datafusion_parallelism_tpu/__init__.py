"""datafusion_parallelism_tpu — a TPU-native vectorized query-execution engine.

Brand-new design (not a port) with the capabilities of the reference
`jamesfer/datafusion-parallelism` (Rust): parallel hash join (build + probe,
all eight join types), filter, hash aggregate, sort, a SQL front end lowered
to a static operator DAG, and multi-chip scaling via `jax.sharding.Mesh` +
`shard_map` with an all-to-all hash shuffle and salted repartitioning for
skewed keys.

Reference parity map (see SURVEY.md):
  - reference L5 `src/parse_sql.rs`          -> models/sql_parser.py + api.py
  - reference L4 optimizer rules             -> models/optimizer.py
  - reference L3 ParallelHashJoin            -> models/physical.py + runtime/executor.py
  - reference L2a build versions 1..10       -> ops/hash_table.py (+ ops/pallas/)
  - reference L2b probe (8 join types)       -> ops/join.py
  - reference L2c shared kernels             -> ops/hashing.py, ops/expressions.py
  - reference L1 concurrency substrate       -> utils/columnar.py (XLA replaces it)
  - work-stealing repartition                -> parallel/skew.py (salted repartition)
"""

import os as _os

import jax

# Explicit 64-bit support: TPC-H keys/decimal-cents columns are int64. All hot
# kernels use explicit 32-bit dtypes; this only widens what is representable.
jax.config.update("jax_enable_x64", True)

# Honor JAX_PLATFORMS even when a platform plugin overrode it: this image's
# axon sitecustomize sets jax_platforms="axon,cpu" PROGRAMMATICALLY at
# interpreter start, which silently wins over the env var — `JAX_PLATFORMS=cpu
# pytest` was running every default-device computation on the remote TPU.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# Persistent XLA compilation cache: query plans recompile identically across
# runs (tests, CLI iterations); disable with DFP_NO_COMPILE_CACHE=1.
if not _os.environ.get("DFP_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "DFP_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "dfp_xla_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .api import SessionContext, SessionConfig, JoinStrategy  # noqa: E402,F401
from .utils.columnar import DeviceTable, HostTable, Schema, Field, DType  # noqa: E402,F401

__version__ = "0.1.0"
