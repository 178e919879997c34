"""Row-sharded embedding lookup with explicit collectives.

The model axis row-shards the user/item tables (SURVEY.md §2.8: the
recsys analogue of expert parallelism). Two lookup paths:

1. GSPMD (default): models call `jnp.take` on a row-sharded table under
   jit; XLA partitions the gather and inserts the collective. Zero code,
   good for small tables.
2. Explicit (`sharded_lookup`): a `shard_map` owner-computes kernel —
   each shard gathers the rows it owns (ids outside its range produce
   zeros) and a `psum` over the model axis combines partial rows. This
   pins the collective to one all-reduce of [batch, dim] over ICI, which
   beats GSPMD's choices once tables are large and the batch is the
   small side.
3. All-to-all bucketing (`sharded_lookup_a2a`): the ID-partitioned
   exchange from SURVEY.md §2.8 — the batch is split over the model
   axis, each shard buckets its local ids by owner shard, one
   `all_to_all` ships the id buckets to their owners, owners gather
   their rows locally, a second `all_to_all` ships the rows back. Per
   ICI link this moves 2·(batch/n)·dim instead of psum's batch·dim —
   the win grows with the axis size. Bucket capacity equals the local
   slice length (a shard holds only batch/n ids, so no bucket can
   overflow): shapes stay static with zero drop risk, unlike
   MoE-style capacity-factor routing.

All paths are bitwise-identical to the single-device gather (tested in
tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_lookup(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh,
                   axis: str = "model") -> jnp.ndarray:
    """Gather rows of a [R, D] table sharded P(axis, None) by replicated
    int ids of any shape; returns ids.shape + (D,) replicated. R must be
    a multiple of the axis size (HyperParams.row_multiple guarantees
    this for model tables)."""
    n_shards = mesh.shape[axis]
    rows = table.shape[0]
    assert rows % n_shards == 0, (rows, n_shards)
    per = rows // n_shards

    def kernel(local_table, ids):
        # local_table: [per, D] this shard's rows; ids replicated
        shard = jax.lax.axis_index(axis)
        lo = shard * per
        local_ids = ids - lo
        owned = (local_ids >= 0) & (local_ids < local_table.shape[0])
        safe = jnp.where(owned, local_ids, 0)
        part = jnp.take(local_table, safe, axis=0)
        part = jnp.where(owned[..., None], part, 0)
        return jax.lax.psum(part, axis)

    spec_t = P(axis, None)
    spec_ids = P()
    return shard_map(kernel, mesh=mesh,
                     in_specs=(spec_t, spec_ids), out_specs=P())(table, ids)


def sharded_lookup_a2a(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh,
                       axis: str = "model") -> jnp.ndarray:
    """ID-partitioned all-to-all lookup: rows of a [R, D] table sharded
    P(axis, None), flat int ids sharded P(axis). Returns ids.shape + (D,)
    with the same P(axis) sharding. len(ids) and R must be divisible by
    the axis size.

    Per shard (m = len(ids)/n local ids): sort local ids by owner shard,
    scatter them into an [n, m] bucket matrix (bucket d = ids owned by
    shard d, padded with id 0 — masked on return), `all_to_all` the
    buckets to their owners, gather owned rows, `all_to_all` back, then
    undo the sort. Two all-to-alls of m ids / m·D floats per link replace
    the psum path's full [batch, D] ring all-reduce."""
    n = mesh.shape[axis]
    rows = table.shape[0]
    assert rows % n == 0, (rows, n)
    assert ids.ndim == 1 and ids.shape[0] % n == 0, ids.shape
    per = rows // n

    def kernel(local_table, local_ids):
        m = local_ids.shape[0]
        owner = local_ids // per                       # destination shard
        order = jnp.argsort(owner, stable=True)
        s_ids = local_ids[order]
        s_owner = owner[order]
        # rank within each owner bucket: position minus the bucket start
        start = jnp.searchsorted(s_owner, jnp.arange(n))
        rank = jnp.arange(m) - start[s_owner]
        send = jnp.zeros((n, m), local_ids.dtype) \
            .at[s_owner, rank].set(s_ids)

        # buckets to owners: recv[s] = the ids shard s wants from me
        recv = jax.lax.all_to_all(send, axis, 0, 0)    # [n, m]
        local = jnp.clip(recv - jax.lax.axis_index(axis) * per, 0,
                         local_table.shape[0] - 1)
        rows_out = jnp.take(local_table, local, axis=0)  # [n, m, D]
        back = jax.lax.all_to_all(rows_out, axis, 0, 0)  # [n, m, D]

        # undo: sorted id j came back at back[s_owner[j], rank[j]];
        # bucket padding (id 0) is gathered and shipped but never read
        got = back[s_owner, rank]                        # [m, D]
        return jnp.zeros_like(got).at[order].set(got)

    return shard_map(kernel, mesh=mesh,
                     in_specs=(P(axis, None), P(axis)),
                     out_specs=P(axis))(table, ids)


def make_lookup(strategy: str, mesh: Mesh, axis: str = "model"):
    """Config-selected embedding gather (hp.embedding_lookup): a
    callable (table [R, D], ids any-shape int) -> ids.shape + (D,).
    All three strategies are bitwise-identical in value and table
    gradient; they differ only in which collective moves the rows."""
    if strategy == "gspmd":
        return lambda table, ids: jnp.take(table, ids, axis=0)
    if mesh is None or mesh.shape[axis] < 2:
        raise ValueError(
            f"embedding_lookup={strategy!r} needs a mesh with {axis!r} "
            f"axis > 1; got {None if mesh is None else dict(mesh.shape)}")
    if strategy == "psum":
        return lambda table, ids: sharded_lookup(table, ids, mesh, axis)
    if strategy == "a2a":
        n = mesh.shape[axis]

        def lookup(table, ids):
            flat = ids.reshape(-1)
            pad = (-flat.shape[0]) % n
            if pad:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((pad,), flat.dtype)])
            out = sharded_lookup_a2a(table, flat, mesh, axis)
            if pad:
                out = out[:-pad]
            return out.reshape(ids.shape + (table.shape[1],))

        return lookup
    raise ValueError(f"unknown embedding_lookup {strategy!r} "
                     f"(expected gspmd | psum | a2a)")
