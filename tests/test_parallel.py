"""Multi-device tests on the 8-virtual-CPU mesh: sharded numerics must
equal single-device numerics (SURVEY.md §4's multi-host test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from reviews4rec_tpu.data.batcher import Batcher
from reviews4rec_tpu.models import build_model
from reviews4rec_tpu.parallel.embedding import sharded_lookup
from reviews4rec_tpu.parallel.mesh import (make_mesh, param_spec,
                                           shard_batch, shard_params)
from reviews4rec_tpu.train.evaluate import make_apply_fn
from reviews4rec_tpu.train.loop import (TrainState, make_optimizer,
                                        make_train_step)


def test_eight_devices():
    assert len(jax.devices()) == 8


def test_sharded_lookup_matches_gather():
    mesh = make_mesh((2, 4))
    rows, dim = 48, 16
    table = jnp.asarray(np.random.default_rng(0).normal(size=(rows, dim)),
                        jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, rows, (5, 7)))
    expect = jnp.take(table, ids, axis=0)

    table_sharded = jax.device_put(table, NamedSharding(mesh,
                                                        P("model", None)))
    got = sharded_lookup(table_sharded, ids, mesh)
    assert np.allclose(np.asarray(got), np.asarray(expect))


def test_param_spec_rules(dataset, hp_base):
    hp = hp_base.replace(model_type="MF_dot")
    model = build_model(hp)
    batch = next(iter(Batcher(dataset.materialize(hp, "train"), 8)))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch,
                        train=False)["params"]
    specs = jax.tree_util.tree_map_with_path(param_spec, params)
    assert specs["user_embedding"] == P("model", None)
    assert specs["user_bias"] == P("model")
    assert specs["global_bias"] == P()


@pytest.mark.parametrize("mt", ["MF_dot", "deepconn"])
def test_sharded_step_matches_single_device(dataset, hp_base, mt):
    """One train step on a 4x2 data x model mesh must produce the same
    params as single-device execution (same batch, same rng)."""
    hp = hp_base.replace(model_type=mt, batch_size=16)
    model = build_model(hp, dataset.word_vectors)
    recs = dataset.materialize(hp, "train")
    batch = next(iter(Batcher(recs, hp.batch_size)))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch,
                        train=False)["params"]
    optimizer = make_optimizer(hp)
    step = make_train_step(make_apply_fn(model), optimizer, hp.model_type)
    step_rng = jax.random.PRNGKey(42)

    # single device
    state0 = TrainState(params, optimizer.init(params),
                        jnp.zeros((), jnp.int32))
    ref, m_ref = step(state0, batch, step_rng)

    # sharded
    mesh = make_mesh((4, 2))
    with jax.set_mesh(mesh):
        p = shard_params(params, mesh)
        st = TrainState(p, optimizer.init(p), jnp.zeros((), jnp.int32))
        sb = shard_batch(batch, mesh)
        out, m_sh = step(st, sb, step_rng)

    assert np.allclose(float(m_ref["loss"]), float(m_sh["loss"]),
                       rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(ref.params),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(out.params),
                   key=lambda t: str(t[0]))):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5), ka


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # must not raise


@pytest.mark.parametrize("window", [1, 3, 5])
def test_seq_sharded_textcnn_matches_single_device(window):
    """Halo-exchange sequence parallelism (SURVEY.md §2.8): the
    time-sharded fused conv+relu+maxpool must reproduce the
    single-device TextCNN pre-FC pooled output."""
    from reviews4rec_tpu.parallel.sequence import textcnn_pool_seq

    mesh = make_mesh((2, 4))
    rng = np.random.default_rng(0)
    b, t, e, f = 4, 64, 8, 12
    x = jnp.asarray(rng.normal(size=(b, t, e)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(window * e, f)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(f,)), jnp.float32)

    # single-device reference: torch-style both-ends padding
    xp = jnp.pad(x, ((0, 0), (window - 1, window - 1), (0, 0)))
    idx = jnp.arange(t + window - 1)[:, None] + jnp.arange(window)[None, :]
    win = xp[:, idx, :].reshape(b, t + window - 1, window * e)
    expect = jnp.max(jax.nn.relu(win @ kernel + bias), axis=1)

    got = textcnn_pool_seq(x, kernel, bias, window, mesh, axis="model")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)


def test_seq_sharded_textcnn_under_jit_and_grad():
    """The halo kernel must compose with jit and autodiff (training
    path)."""
    from reviews4rec_tpu.parallel.sequence import textcnn_pool_seq

    mesh = make_mesh((1, 8))
    rng = np.random.default_rng(1)
    b, t, e, f, w = 2, 40, 4, 6, 3
    x = jnp.asarray(rng.normal(size=(b, t, e)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(w * e, f)), jnp.float32)
    bias = jnp.zeros((f,), jnp.float32)

    def loss(kern):
        return jnp.sum(textcnn_pool_seq(x, kern, bias, w, mesh) ** 2)

    g = jax.jit(jax.grad(loss))(kernel)
    assert g.shape == kernel.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
