"""Device mesh management.

The reference's parallelism is NCCL-implicit (torch DataParallel scatter/gather,
vLLM tensor-parallel, HF Trainer DDP — SURVEY.md §2.4).  Here a single
``jax.sharding.Mesh`` is the one source of truth: encoders run data-parallel
over the ``data`` axis, generators shard attention heads / MLP over ``model``
(TP over ICI), and corpus embedding shards live partitioned over ``data``.
XLA inserts the collectives.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_count() -> int:
    return len(jax.devices())


@functools.lru_cache(maxsize=None)
def get_mesh(data: int | None = None, model: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over all local devices.

    data=None → use all devices / model.  model>1 carves a tensor-parallel
    axis (adjacent devices share the model axis so TP collectives ride the
    fastest ICI links).
    """
    devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Place a host array with its leading dim sharded over `axis`."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_batch_to_devices(x: np.ndarray, n_shards: int) -> tuple[np.ndarray, int]:
    """Pad the leading dim so it divides n_shards; returns (padded, orig_len)."""
    n = x.shape[0]
    rem = (-n) % n_shards
    if rem:
        pad = np.repeat(x[-1:], rem, axis=0)
        x = np.concatenate([x, pad], axis=0)
    return x, n
