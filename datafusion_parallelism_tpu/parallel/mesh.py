"""Device mesh construction for partition-parallel query execution.

The reference scales with N tokio worker streams over `target_partitions`
(reference src/parse_sql.rs:46-48, src/operator/parallel_hash_join.rs:140-152).
The TPU-native equivalent is SPMD over a 1-D `jax.sharding.Mesh` of chips:
one logical partition per chip, collectives over ICI instead of in-process
channels (SURVEY.md §2.9, §5.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

# The single mesh axis: table rows are hash-partitioned over it. The name is
# shared by every collective in the engine.
PARTITION_AXIS = "p"


def make_mesh(n_devices: Optional[int] = None, axis: str = PARTITION_AXIS,
              platform: Optional[str] = None) -> Mesh:
    """1-D mesh over the first `n_devices` devices (all by default).

    If the default platform has too few devices, falls back to the CPU
    platform (where `--xla_force_host_platform_device_count` provides a
    virtual multi-chip mesh for sharding tests)."""
    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None and n_devices > len(devices) and platform is None:
        try:
            devices = jax.devices("cpu")
        except RuntimeError:
            pass
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))
