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
   small side; it is also the hook point for a future Pallas
   all-to-all bucketing kernel.

Both paths are bitwise-identical to the single-device gather (tested in
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
