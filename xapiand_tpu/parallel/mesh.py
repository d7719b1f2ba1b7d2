"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_shards: int | None = None, n_dp: int | None = None,
              devices=None) -> Mesh:
    """2D mesh ('dp', 'shard'): shard axis holds index shards, dp axis
    data-parallelises query batches."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_shards is None:
        n_shards = n if n_dp is None else n // n_dp
    if n_dp is None:
        n_dp = n // n_shards
    if n_dp * n_shards != n:
        raise ValueError(f"mesh {n_dp}x{n_shards} != {n} devices")
    arr = np.asarray(devices).reshape(n_dp, n_shards)
    return Mesh(arr, ("dp", "shard"))
