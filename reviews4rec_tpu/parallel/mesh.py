"""Device mesh construction and sharding rules.

The reference has no distributed runtime at all (single-GPU torch /
single-session TF1 / OpenMP threads — SURVEY.md §2.8); every axis here
is new design:

- `data` axis: batch (data-parallel); gradients are psummed by sharded
  autodiff under jit.
- `model` axis: user/item embedding + bias tables are row-sharded
  (`P("model", None)`); ID lookups into a row-sharded table lower to
  an all-gather/all-to-all exchange inserted by GSPMD (the explicit
  Pallas all-to-all lookup is the optimized alternative in
  parallel/embedding.py). Dense review towers are small (latent 10-64)
  and stay replicated.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axes: Tuple[str, ...] = ("data", "model")) -> Mesh:
    devices = jax.devices()
    n = len(devices)
    if shape is None:
        # Widest data axis; model axis 2 when we have the chips for it.
        mp = 2 if n % 2 == 0 and n >= 4 else 1
        shape = (n // mp, mp)
    grid = mesh_utils.create_device_mesh(shape, devices=devices[:int(np.prod(shape))])
    return Mesh(grid, axes)


# Parameter-name suffixes that hold per-entity rows and get sharded over
# the `model` axis. Everything else is replicated.
_ROW_SHARDED_2D = ("embedding",)
_ROW_SHARDED_1D = ("user_bias", "item_bias")


def param_spec(path, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    last = names[-1] if names else ""
    if leaf.ndim == 2 and any(last.endswith(s) for s in _ROW_SHARDED_2D):
        return P("model", None)
    if leaf.ndim == 1 and last in _ROW_SHARDED_1D:
        return P("model")
    return P()


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh according to the row-sharding
    rules. Table row counts need not divide the axis size (GSPMD pads)."""

    def place(path, x):
        return jax.device_put(x, NamedSharding(mesh, param_spec(path, x)))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shard every batch array over the data axis on its leading dim."""

    def place(x):
        return jax.device_put(x, NamedSharding(mesh, P("data")))

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
