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


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # must not raise


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_api_run_on_mesh_matches_single_device(dataset, hp_base,
                                               mesh_shape):
    """The PRODUCT path: api.run with hp.mesh_shape != (1,1) must train
    on the mesh and reproduce single-device metrics (same data, same
    seed). Sharded autodiff only reorders reductions, so MSE agrees to
    float tolerance and the discrete HR@k exactly."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="MF_dot", epochs=2, batch_size=32)
    ref, ucm_ref, icm_ref = run(hp, dataset)
    got, ucm, icm = run(hp.replace(mesh_shape=mesh_shape), dataset)
    assert np.isclose(got["MSE"], ref["MSE"], atol=3e-4)
    assert got["HR@1"] == ref["HR@1"]
    assert set(ucm) == set(ucm_ref)
    for c in ucm_ref:
        np.testing.assert_allclose(np.sort(ucm[c]), np.sort(ucm_ref[c]),
                                   rtol=1e-3, atol=1e-4)


def test_api_run_mesh_review_model(dataset, hp_base):
    """Full-run mesh parity for a review tower (VERDICT r4 #8): api.run
    (train + val selection + test eval + ranking) for deepconn on a 4x2
    mesh reproduces the single-device metrics — same tolerance contract
    as the MF_dot case above (sharded autodiff reorders reductions;
    discrete HR@k must agree exactly)."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="deepconn", epochs=1, batch_size=16,
                         save_model=False)
    ref, ucm_ref, _ = run(hp, dataset)
    got, ucm, _ = run(hp.replace(mesh_shape=(4, 2)), dataset)
    assert np.isclose(got["MSE"], ref["MSE"], atol=3e-4)
    assert got["HR@1"] == ref["HR@1"]
    assert got["HR@10"] == ref["HR@10"]
    assert set(ucm) == set(ucm_ref)


def test_mesh_from_hp_validates_batch():
    from reviews4rec_tpu.config import HyperParams
    from reviews4rec_tpu.parallel.mesh import mesh_from_hp

    assert mesh_from_hp(HyperParams()) is None  # (1,1) -> no mesh
    with pytest.raises(ValueError):
        mesh_from_hp(HyperParams(mesh_shape=(8, 1), batch_size=12))
    mesh = mesh_from_hp(HyperParams(mesh_shape=(4, 2), batch_size=16))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


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


def test_sharded_lookup_a2a_matches_gather():
    """ID-partitioned all-to-all exchange (SURVEY.md §2.8): bucket ids
    by owner shard, a2a out, local gather, a2a back, unsort — must be
    bitwise the plain gather."""
    from reviews4rec_tpu.parallel.embedding import sharded_lookup_a2a
    mesh = make_mesh((2, 4))
    rows, dim, n_ids = 64, 16, 40
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(rows, dim)), jnp.float32)
    # include duplicates and skewed owners (all shards' rows hit)
    ids = jnp.asarray(np.concatenate([
        rng.integers(0, rows, n_ids - 8),
        np.array([0, 0, 63, 63, 17, 17, 5, 5])]).astype(np.int32))
    expect = np.asarray(jnp.take(table, ids, axis=0))

    table_sharded = jax.device_put(table, NamedSharding(mesh,
                                                        P("model", None)))
    got = sharded_lookup_a2a(table_sharded, ids, mesh)
    assert np.array_equal(np.asarray(got), expect)


@pytest.mark.slow
def test_sharded_lookup_a2a_grad_flows_to_table():
    """Training row-sharded tables through the a2a exchange: the table
    gradient must equal the dense gather's scatter-add gradient."""
    from reviews4rec_tpu.parallel.embedding import sharded_lookup_a2a
    mesh = make_mesh((2, 4))
    rows, dim = 32, 8
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(rows, dim)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, rows, 16).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(16, dim)), jnp.float32)

    def loss_dense(t):
        return jnp.sum(jnp.take(t, ids, axis=0) * w)

    def loss_a2a(t):
        return jnp.sum(sharded_lookup_a2a(t, ids, mesh) * w)

    g_dense = jax.grad(loss_dense)(table)
    table_sharded = jax.device_put(table, NamedSharding(mesh,
                                                        P("model", None)))
    g_a2a = jax.grad(loss_a2a)(table_sharded)
    assert np.allclose(np.asarray(g_a2a), np.asarray(g_dense))


@pytest.mark.slow
def test_api_run_seq_parallel_matches_default(dataset, hp_base):
    """hp.seq_parallel=True in the PRODUCT path: every TextCNN runs the
    halo-exchange time-sharded conv on the model axis, composed with
    data parallelism, and reproduces the default path's metrics."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="deepconn", epochs=1, batch_size=16,
                         mesh_shape=(4, 2))
    ref, _, _ = run(hp, dataset)
    got, _, _ = run(hp.replace(seq_parallel=True), dataset)
    assert np.isclose(got["MSE"], ref["MSE"], atol=3e-4)
    assert got["HR@1"] == ref["HR@1"]


def test_seq_parallel_requires_model_axis(dataset, hp_base):
    from reviews4rec_tpu.models import build_model

    hp = hp_base.replace(model_type="deepconn", seq_parallel=True)
    with pytest.raises(ValueError):
        build_model(hp, dataset.word_vectors, mesh=None)


@pytest.mark.slow
@pytest.mark.parametrize("strategy", ["psum", "a2a"])
def test_make_lookup_matches_take_value_and_grad(strategy):
    """hp.embedding_lookup strategies (parallel/embedding.make_lookup):
    value and table gradient must be bitwise the plain gather, for both
    flat [B] ids and [B, C] candidate grids (ranking eval layout)."""
    from reviews4rec_tpu.parallel.embedding import make_lookup

    mesh = make_mesh((2, 4))
    lk = make_lookup(strategy, mesh)
    rows, dim = 64, 16
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(rows, dim)), jnp.float32)
    sharded = jax.device_put(table, NamedSharding(mesh, P("model", None)))

    for shape in [(24,), (5, 6)]:
        ids = jnp.asarray(rng.integers(0, rows, shape).astype(np.int32))
        w = jnp.asarray(rng.normal(size=shape + (dim,)), jnp.float32)
        expect = np.asarray(jnp.take(table, ids, axis=0))
        got = lk(sharded, ids)
        assert np.array_equal(np.asarray(got), expect), shape

        g_ref = jax.grad(lambda t: jnp.sum(jnp.take(t, ids, axis=0) * w))(
            table)
        g_got = jax.grad(lambda t: jnp.sum(lk(t, ids) * w))(sharded)
        assert np.allclose(np.asarray(g_got), np.asarray(g_ref)), shape


def test_make_lookup_requires_model_axis():
    from reviews4rec_tpu.parallel.embedding import make_lookup

    with pytest.raises(ValueError):
        make_lookup("psum", None)
    with pytest.raises(ValueError):
        make_lookup("a2a", make_mesh((8, 1)))
    with pytest.raises(ValueError):
        make_lookup("bogus", make_mesh((2, 4)))


@pytest.mark.slow
@pytest.mark.parametrize("strategy", ["psum", "a2a"])
def test_api_run_embedding_lookup_matches_gspmd(dataset, hp_base,
                                                strategy):
    """The PRODUCT path: hp.embedding_lookup selects the explicit
    collective lookups inside the MF-family gathers, and full training +
    eval through api.run reproduces the GSPMD path's metrics."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="MF_dot", epochs=2, batch_size=32,
                         mesh_shape=(4, 2))
    ref, ucm_ref, _ = run(hp, dataset)
    got, ucm, _ = run(hp.replace(embedding_lookup=strategy), dataset)
    assert np.isclose(got["MSE"], ref["MSE"], atol=3e-4)
    assert got["HR@1"] == ref["HR@1"]
    assert set(ucm) == set(ucm_ref)
