"""Review-tower model tests: shapes, leading-dim handling, gradient
routing (TransNet), pointer semantics (MPCN), and a short training run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reviews4rec_tpu.data.batcher import Batcher
from reviews4rec_tpu.models import build_model
from reviews4rec_tpu.train.evaluate import make_apply_fn
from reviews4rec_tpu.train.loop import (TrainState, make_optimizer,
                                        make_train_step)

REVIEW_TYPES = ["deepconn", "deepconn++", "NARRE", "transnet", "transnet++",
                "MPCN"]


def _setup(dataset, hp_base, mt, split="train"):
    hp = hp_base.replace(model_type=mt)
    model = build_model(hp, dataset.word_vectors)
    recs = dataset.materialize(hp, split)
    batch = next(iter(Batcher(recs, 8)))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch,
                        train=False)["params"]
    return hp, model, params, batch


@pytest.mark.parametrize("mt", REVIEW_TYPES)
def test_forward_shapes(dataset, hp_base, mt):
    hp, model, params, batch = _setup(dataset, hp_base, mt)
    out = model.apply({"params": params}, batch, train=False)
    if mt.startswith("transnet"):
        src, tgt, tl = out
        assert src.shape == (8,) and tgt.shape == (8,)
        assert np.isfinite(float(tl))
    else:
        assert out.shape == (8,)
        assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("mt", ["deepconn", "NARRE", "MPCN"])
def test_candidate_grid(dataset, hp_base, mt):
    """[B, C] candidate layout must score per candidate (the ranking
    eval path)."""
    hp = hp_base.replace(model_type=mt)
    model = build_model(hp, dataset.word_vectors)
    negs = dataset.materialize_negs(hp)
    batch = next(iter(Batcher(negs, 4)))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch,
                        train=False)["params"]
    out = model.apply({"params": params}, batch, train=False)
    if mt.startswith("transnet"):
        out = out[0]
    assert out.shape == (4, 6)


@pytest.mark.parametrize("mt", ["deepconn", "transnet", "MPCN"])
def test_train_step_decreases_loss(dataset, hp_base, mt):
    hp, model, params, batch = _setup(dataset, hp_base, mt)
    optimizer = make_optimizer(hp)
    state = TrainState(params, optimizer.init(params),
                       jnp.zeros((), jnp.int32))
    step = make_train_step(make_apply_fn(model), optimizer, hp.model_type)
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits one batch


def test_transnet_gradient_routing(dataset, hp_base):
    """The stop_gradient routing must hold: target-MSE gradients reach
    only target params; transform-loss gradients reach only source
    towers; source-MSE gradients reach only the FM (+ embeds in ++).
    Derivation in models/transnet.py docstring."""
    hp, model, params, batch = _setup(dataset, hp_base, "transnet++")
    apply_fn = make_apply_fn(model)
    rng = jax.random.PRNGKey(0)

    def split_losses(params):
        src, tgt, tl = apply_fn(params, batch, True, rng)
        y, w = batch["rating"], batch["weight"]
        l_src = jnp.sum((src - y) ** 2 * w) / jnp.sum(w)
        l_tgt = jnp.sum((tgt - y) ** 2 * w) / jnp.sum(w)
        return l_src, l_tgt, tl

    def norm(tree):
        return {k: float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), v, 0.0))
            for k, v in tree.items()}

    g_src = norm(jax.grad(lambda p: split_losses(p)[0])(params))
    g_tgt = norm(jax.grad(lambda p: split_losses(p)[1])(params))
    g_tl = norm(jax.grad(lambda p: split_losses(p)[2])(params))

    # source MSE -> only source_fm + id embeddings
    assert g_src["source_fm"] > 0
    assert g_src["user_embedding"] > 0
    assert g_src["source_user_conv"] == 0
    assert g_src["target_conv"] == 0
    # target MSE -> only target net
    assert g_tgt["target_conv"] > 0 and g_tgt["target_fm"] > 0
    assert g_tgt["source_user_conv"] == 0 and g_tgt["source_fm"] == 0
    # transform loss -> only source towers/projection
    assert g_tl["source_user_conv"] > 0 and g_tl["project_fc0"] > 0
    assert g_tl["target_conv"] == 0 and g_tl["source_fm"] == 0


def test_mpcn_pointer_is_onehot(dataset, hp_base):
    """At eval the review pointer must be an exact one-hot; prediction
    is clipped to [1, 5] (model.py:831-833)."""
    from reviews4rec_tpu.models.mpcn import hard_argmax
    logits = jnp.array([[0.1, 2.0, -1.0], [3.0, 3.0, 0.0]])
    p = np.asarray(hard_argmax(logits))
    assert p[0].tolist() == [0, 1, 0]
    assert p.sum(-1)[0] == 1

    hp, model, params, batch = _setup(dataset, hp_base, "MPCN", "test")
    out = np.asarray(model.apply({"params": params}, batch, train=False))
    assert (out >= 1.0).all() and (out <= 5.0).all()


def test_deepconn_uses_frozen_word_vectors(dataset, hp_base):
    """Word vectors are frozen (DeepCoNN.py:14-16): declared as a param
    so the table enters jit as a traced argument (not a jaxpr constant),
    but stop_gradient + the optimizer mask keep it bitwise unchanged by
    training."""
    from reviews4rec_tpu.train.evaluate import make_apply_fn
    from reviews4rec_tpu.train.loop import (TrainState, make_optimizer,
                                            make_train_step)

    hp, model, params, batch = _setup(dataset, hp_base, "deepconn")
    assert "word_vectors" in params
    np.testing.assert_array_equal(np.asarray(params["word_vectors"]),
                                  dataset.word_vectors)
    opt = make_optimizer(hp)
    step = make_train_step(make_apply_fn(model), opt, hp.model_type)
    state = TrainState(jax.tree_util.tree_map(jnp.copy, params),
                       opt.init(params), jnp.zeros((), jnp.int32))
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(state.params["word_vectors"]),
                                  dataset.word_vectors)
    # everything else trained
    assert not np.allclose(np.asarray(state.params["fm"]["V"]),
                           np.asarray(params["fm"]["V"]))
