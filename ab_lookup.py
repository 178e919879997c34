"""A/B the three embedding-lookup strategies (hp.embedding_lookup =
gspmd | psum | a2a) on a virtual 8-device mesh: forward+backward time of
the gather alone, and the full MF_dot train step through the product
path.

Run: python ab_lookup.py  (forces an 8-virtual-CPU mesh, so the numbers
show the relative collective cost — per-link bytes — not TPU absolutes;
on a real multi-chip slice the same script runs unchanged and the a2a's
2·(batch/n)·dim per link vs psum's batch·dim shows up on ICI.)
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from reviews4rec_tpu.parallel.embedding import make_lookup
from reviews4rec_tpu.parallel.mesh import make_mesh

ROWS, DIM, BATCH, STEPS = 1 << 17, 64, 4096, 30


def time_fn(f, *args):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else \
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / STEPS * 1e3  # ms


def main():
    mesh = make_mesh((1, 8))  # all-model-axis: collectives dominate
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(ROWS, DIM)), jnp.float32)
    sharded = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids = jax.device_put(
        jnp.asarray(rng.integers(0, ROWS, BATCH).astype(np.int32)),
        NamedSharding(mesh, P()))
    w = jax.device_put(jnp.asarray(rng.normal(size=(BATCH, DIM)),
                                   jnp.float32), NamedSharding(mesh, P()))

    print(f"table [{ROWS}, {DIM}] sharded 8-way, batch {BATCH}, "
          f"fwd+bwd gather time (ms/step, {STEPS} steps):")
    for strat in ("gspmd", "psum", "a2a"):
        lk = make_lookup(strat, mesh)

        @jax.jit
        def step(t, i):
            loss, g = jax.value_and_grad(
                lambda tt: jnp.sum(lk(tt, i) * w))(t)
            return loss, g

        ms = time_fn(step, sharded, ids)
        print(f"  {strat:6s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
