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


def mesh_from_hp(hp) -> Optional[Mesh]:
    """The product-path mesh: built from `hp.mesh_shape`/`hp.mesh_axes`
    (config.py), or None for the default single-device configuration so
    1-chip runs skip mesh machinery entirely. This is what
    `train_complete`/`api.run` call — the training path is mesh-driven,
    not just the tests (SURVEY.md §2.8)."""
    if int(np.prod(hp.mesh_shape)) <= 1:
        return None
    n_data = int(hp.mesh_shape[0])
    if hp.batch_size % n_data:
        raise ValueError(
            f"batch_size {hp.batch_size} must divide over the data axis "
            f"({n_data} shards); pick a multiple of {n_data}")
    return make_mesh(tuple(hp.mesh_shape), tuple(hp.mesh_axes))


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


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """Shard every batch array over the data axis on dim `axis` (0 for a
    plain [B, ...] batch; 1 for a scan-stacked [S, B, ...] super-batch,
    whose scan dim stays unsharded).

    Multi-host: each process holds only its slice of the global batch
    (see `host_slice`); `jax.make_array_from_process_local_data`
    assembles the global array from the per-host shards, so batch rows
    never cross DCN. Single-host: a plain device_put scatter over ICI.
    """
    sharding = NamedSharding(mesh, P(*([None] * axis), "data"))
    if jax.process_count() > 1:
        def place(x):
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
    else:
        def place(x):
            return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


def host_slice(batch, axis: int = 0):
    """This process's contiguous row range of a global batch (rows on
    dim `axis`). Identity on a single host; under `jax.distributed`
    each host feeds only its rows to `shard_batch` (per-host input
    sharding)."""
    p = jax.process_count()
    if p == 1:
        return batch
    pid = jax.process_index()

    def sl(x):
        per = x.shape[axis] // p
        idx = tuple([slice(None)] * axis
                    + [slice(pid * per, (pid + 1) * per)])
        return x[idx]

    return jax.tree_util.tree_map(sl, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_cache(cache, mesh: Mesh):
    """Row-shard a device-resident record cache (train/loop.py::
    build_doc_cache) over the data axis: every array's dim 0 is the
    example row, so P("data") splits the cache's HBM footprint across
    the axis. Rows are padded to a multiple of the axis size (pad rows
    are never indexed — row indices come from arange(n) batchers).

    The in-jit batch gather (make_cached_train_step) indexes this with
    GLOBAL row ids sharded P("data") on the batch dim; GSPMD lowers it
    to the owner-computes masked-gather + psum exchange over ICI —
    expected (n-1)/n of a shuffled batch's rows cross the interconnect,
    the unavoidable cost of a shuffled stream over a sharded store.

    An EntityCache (train/loop.py, hp.cache_entity) shards its
    per-example arrays the same way while REPLICATING the canonical doc
    tables: they are entity-scaled (~MBs-to-sub-GB), and a replicated
    table turns the second-level doc gather into a local read on every
    shard — no ICI exchange for the bulk bytes."""
    import jax.numpy as jnp

    from ..train.loop import EntityCache

    if isinstance(cache, EntityCache):
        return EntityCache(example=shard_cache(cache.example, mesh),
                           tables=replicate(cache.tables, mesh))

    n_data = mesh.shape[mesh.axis_names[0]]
    out = {}
    for k, v in cache.items():
        pad = (-v.shape[0]) % n_data
        if pad:
            v = jnp.concatenate(
                [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)], axis=0)
        spec = P(mesh.axis_names[0], *([None] * (v.ndim - 1)))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
