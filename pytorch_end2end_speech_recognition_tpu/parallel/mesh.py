"""Device mesh construction and multi-host bring-up.

Capability parity: the reference genre's `torch.distributed.launch` + NCCL
process groups (SURVEY.md §3.3, §5.8). TPU-native: one logical mesh with
'data' (DP) and 'model' (TP) axes; GSPMD emits collectives over ICI/DCN.
Multi-host: `jax.distributed.initialize` then the same single-program code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. dp defaults to n_devices // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host rendezvous (the genre's init_process_group('nccl'))."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard_info() -> tuple[int, int]:
    """(shard_index, num_shards) for the per-host input pipeline."""
    return jax.process_index(), jax.process_count()
