"""Co-attention library + MPCN variant-space + loss-library tests
(reference surface: MPCN/tylib/lib/att_op.py, tf_models/model.py
:170-406, :701-733)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reviews4rec_tpu.data.batcher import Batcher
from reviews4rec_tpu.models import build_model
from reviews4rec_tpu.models.att import (AFFINITIES, POOLINGS, CoAttention,
                                        DualAttention, IntraAttention,
                                        gumbel_softmax, hard_argmax)
from reviews4rec_tpu.train import losses


def _pair(b=2, la=5, lb=7, d=8, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, (b, la, d)),
            jax.random.normal(k2, (b, lb, d)))


@pytest.mark.parametrize("att_type", AFFINITIES)
@pytest.mark.parametrize("pooling", ["MAX", "MIN", "SUM", "MEAN"])
def test_coattention_shapes(att_type, pooling):
    a, b = _pair()
    mod = CoAttention(att_type=att_type, pooling=pooling)
    params = mod.init(jax.random.PRNGKey(0), a, b)
    fa, fb, wa, wb, y = mod.apply(params, a, b)
    assert fa.shape == a.shape and fb.shape == b.shape
    assert wa.shape == (2, 5) and wb.shape == (2, 7)
    assert y.shape == (2, 5, 7)
    # pooled weights are softmax distributions
    np.testing.assert_allclose(np.asarray(wa).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(wb).sum(-1), 1.0, rtol=1e-5)
    assert np.isfinite(np.asarray(fa)).all()


def test_coattention_matrix_pooling_alignment():
    """MATRIX pooling is alignment attention (att_op.py:317-336):
    outputs take the *other* side's length."""
    a, b = _pair()
    mod = CoAttention(att_type="SOFT", pooling="MATRIX")
    params = mod.init(jax.random.PRNGKey(0), a, b)
    fa, fb, wa, wb, y = mod.apply(params, a, b)
    assert fa.shape == (2, 7, 8)   # each b-position aligned over a
    assert fb.shape == (2, 5, 8)
    np.testing.assert_allclose(np.asarray(wa).sum(-1), 1.0, rtol=1e-5)


def test_coattention_soft_is_parameter_free_affinity():
    """SOFT affinity with no transform layers is the raw dot product."""
    a, b = _pair()
    mod = CoAttention(att_type="SOFT", pooling="MEAN", transform_layers=0)
    params = mod.init(jax.random.PRNGKey(0), a, b)
    *_, y = mod.apply(params, a, b)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(a @ jnp.swapaxes(b, -1, -2)),
                               rtol=1e-5)


def test_coattention_gumbel_pointer_gradients_flow():
    """Straight-through pointer: eval weights are one-hot; train-mode
    gradients reach the inputs through the soft sample."""
    a, b = _pair()
    mod = CoAttention(att_type="SOFT", pooling="MAX", gumbel=True)
    params = mod.init(jax.random.PRNGKey(0), a, b)
    _, _, wa, wb, _ = mod.apply(params, a, b, False)
    assert set(np.unique(np.asarray(wa))) <= {0.0, 1.0}
    assert np.asarray(wa).sum(-1).max() == 1.0

    def f(x):
        fa, *_ = mod.apply(params, x, b, True,
                           rngs={"gumbel": jax.random.PRNGKey(3),
                                 "dropout": jax.random.PRNGKey(4)})
        return jnp.sum(fa ** 2)

    g = jax.grad(f)(a)
    assert float(jnp.abs(g).sum()) > 0


def test_invalid_variants_raise():
    a, b = _pair()
    with pytest.raises(ValueError):
        CoAttention(att_type="NOPE").init(jax.random.PRNGKey(0), a, b)
    with pytest.raises(ValueError):
        CoAttention(pooling="NOPE").init(jax.random.PRNGKey(0), a, b)


def test_intra_attention():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 6, 8))
    mod = IntraAttention(dim=8)
    params = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(params, x)
    assert out.shape == (3, 6, 16)   # concat([proj, attended])
    # the distance-bias table must exist and be used
    assert "dist_bias" in params["params"]


def test_dual_attention_datt():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 12, 8))
    mod = DualAttention(features=9, dropout_rate=0.2)
    params = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(params, x)
    assert out.shape == (3, 9)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------
# MPCN variant space, end-to-end through the model
# ---------------------------------------------------------------------

def _mpcn_forward(dataset, hp_base, **variants):
    hp = hp_base.replace(model_type="MPCN", **variants)
    model = build_model(hp, dataset.word_vectors)
    batch = next(iter(Batcher(dataset.materialize(hp, "train"), 8)))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch,
                        train=False)["params"]
    out = model.apply({"params": params}, batch, train=False)
    assert out.shape == (8,)
    assert np.isfinite(np.asarray(out)).all()
    return model, params, batch


@pytest.mark.parametrize("affinity", ["BILINEAR", "TENSOR", "MLP", "MD"])
def test_mpcn_affinity_variants(dataset, hp_base, affinity):
    _mpcn_forward(dataset, hp_base, mpcn_affinity=affinity)


@pytest.mark.parametrize("head", ["DOT", "MLP", "MF"])
def test_mpcn_head_variants(dataset, hp_base, head):
    _mpcn_forward(dataset, hp_base, mpcn_head=head)


def test_mpcn_cnn_encoder(dataset, hp_base):
    model, params, _ = _mpcn_forward(dataset, hp_base, mpcn_encoder="CNN")
    assert "cnn_kernel" in params


def test_mpcn_datt_joint(dataset, hp_base):
    model, params, _ = _mpcn_forward(dataset, hp_base, mpcn_joint="D_ATT")
    assert "dual_att" in params


def test_mpcn_variants_train(dataset, hp_base):
    """One gradient step through a non-default variant stays finite."""
    from reviews4rec_tpu.train.evaluate import make_apply_fn
    from reviews4rec_tpu.train.loop import (TrainState, make_optimizer,
                                            make_train_step)
    hp = hp_base.replace(model_type="MPCN", mpcn_affinity="BILINEAR",
                         mpcn_head="MLP", mpcn_encoder="CNN")
    model = build_model(hp, dataset.word_vectors)
    batch = next(iter(Batcher(dataset.materialize(hp, "train"), 8)))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch,
                        train=False)["params"]
    optimizer = make_optimizer(hp)
    state = TrainState(params, optimizer.init(params),
                       jnp.zeros((), jnp.int32))
    step = make_train_step(make_apply_fn(model), optimizer, hp.model_type)
    state, m = step(state, batch, rng)
    assert np.isfinite(float(m["loss"]))


# ---------------------------------------------------------------------
# Loss library (model.py:701-733)
# ---------------------------------------------------------------------

def test_raw_mse_masked():
    p = jnp.array([1.0, 2.0, 100.0])
    t = jnp.array([1.0, 4.0, 0.0])
    w = jnp.array([1.0, 1.0, 0.0])
    assert float(losses.raw_mse(p, t, w)) == pytest.approx(2.0)


def test_softmax_ce_prefers_correct_candidate():
    logits = jnp.array([[4.0, 0.0, 0.0], [0.0, 4.0, 0.0]])
    onehot0 = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    good = float(losses.softmax_ce(logits[:1], onehot0[:1]))
    bad = float(losses.softmax_ce(logits[1:], onehot0[1:]))
    assert good < bad


def test_sigmoid_ce_matches_bce():
    logits = jnp.array([0.5, -1.0, 2.0])
    labels = jnp.array([1.0, 0.0, 1.0])
    got = float(losses.sigmoid_ce_point(logits, labels))
    import math
    want = np.mean([-math.log(1 / (1 + math.exp(-0.5))),
                    -math.log(1 - 1 / (1 + math.exp(1.0))),
                    -math.log(1 / (1 + math.exp(-2.0)))])
    assert got == pytest.approx(want, rel=1e-5)


def test_bpr_and_hinge_ranking_order():
    pos = jnp.array([2.0, 2.0])
    neg_close = jnp.array([1.9, 1.9])
    neg_far = jnp.array([0.0, 0.0])
    assert float(losses.bpr(pos, neg_far)) < float(losses.bpr(pos, neg_close))
    assert float(losses.hinge(pos, neg_far, margin=0.2)) == 0.0
    assert float(losses.hinge(pos, neg_close, margin=0.2)) > 0.0


def test_gumbel_softmax_straight_through():
    logits = jnp.array([[1.0, 3.0, 0.0]])
    y = gumbel_softmax(logits, jax.random.PRNGKey(0), 0.5, hard=True)
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}
    assert np.asarray(y).sum() == 1.0
    # backward flows (nonzero grad through the soft path)
    g = jax.grad(lambda l: jnp.sum(
        gumbel_softmax(l, jax.random.PRNGKey(0), 0.5) * jnp.array([1., 2., 3.])
    ))(logits[0])
    assert float(jnp.abs(g).sum()) > 0


# ---------------------------------------------------------------------
# NN library (tylib/lib/nn.py): highway, layer norm, positional
# encoding, point-wise FFN
# ---------------------------------------------------------------------

def test_highway_gate_convexity():
    """highway_layer (nn.py:128-143): output = g*relu(Wx) + (1-g)*x is a
    per-unit convex combination, so with same-dim input it lies between
    the carry and the transform elementwise."""
    from reviews4rec_tpu.models.layers import Highway
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6))
    mod = Highway(6)
    params = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(params, x)
    assert out.shape == x.shape
    trans = jax.nn.relu(x @ params["params"]["trans"]["kernel"]
                        + params["params"]["trans"]["bias"])
    lo = jnp.minimum(trans, x)
    hi = jnp.maximum(trans, x)
    assert bool(jnp.all(out >= lo - 1e-5)) and bool(jnp.all(out <= hi + 1e-5))
    # dim-changing carry projection exists only when widths differ
    assert "carry" not in params["params"]
    p2 = Highway(3).init(jax.random.PRNGKey(1), x)
    assert "carry" in p2["params"]


def test_layer_norm_moments():
    """normalize (nn.py:334-361): unit-init gamma/zero beta gives
    zero-mean unit-variance rows."""
    from reviews4rec_tpu.models.layers import LayerNorm
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 16)) * 3.0 + 2.0
    mod = LayerNorm()
    params = mod.init(jax.random.PRNGKey(1), x)
    out = np.asarray(mod.apply(params, x))
    np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.var(-1), 1.0, atol=1e-3)


def test_positional_encoding_matches_formula():
    """positional_encoding (nn.py:11-73): sin on even cols, cos on odd,
    angle pos/10000^(2i/dim); zero_pad zeroes row 0, scale multiplies by
    sqrt(dim)."""
    from reviews4rec_tpu.models.layers import positional_encoding
    t = np.asarray(positional_encoding(7, 6))
    ref = np.array([[p / np.power(10000.0, 2.0 * i / 6) for i in range(6)]
                    for p in range(7)])
    ref[:, 0::2] = np.sin(ref[:, 0::2])
    ref[:, 1::2] = np.cos(ref[:, 1::2])
    np.testing.assert_allclose(t, ref, rtol=1e-5, atol=1e-6)
    zp = np.asarray(positional_encoding(7, 6, zero_pad=True))
    assert (zp[0] == 0).all() and np.allclose(zp[1:], ref[1:], rtol=1e-5)
    sc = np.asarray(positional_encoding(7, 6, scale=True))
    np.testing.assert_allclose(sc, ref * np.sqrt(6.0), rtol=1e-5)


def test_pos_ffn_residual_shape():
    """pos_feedforward (nn.py:363-393): residual + layer-norm block
    keeps the input shape; zero inner/readout weights reduce it to
    LayerNorm(x) exactly."""
    from reviews4rec_tpu.models.layers import LayerNorm, PosFFN
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    mod = PosFFN(hidden=16)
    params = mod.init(jax.random.PRNGKey(1), x)
    assert mod.apply(params, x).shape == x.shape
    p = jax.tree_util.tree_map(jnp.copy, params)
    p["params"]["inner"]["kernel"] = jnp.zeros_like(
        p["params"]["inner"]["kernel"])
    p["params"]["inner"]["bias"] = jnp.zeros_like(
        p["params"]["inner"]["bias"])
    ln = LayerNorm()
    lp = ln.init(jax.random.PRNGKey(2), x)
    np.testing.assert_allclose(np.asarray(mod.apply(p, x)),
                               np.asarray(ln.apply(lp, x)), atol=1e-6)


def test_mpcn_highway_projection(dataset, hp_base):
    """'HP' variant (model.py:184-188): translate_proj becomes a highway
    layer shared across both sides."""
    model, params, _ = _mpcn_forward(dataset, hp_base,
                                     mpcn_projection="HIGH")
    assert "trans_proj_hw" in params
    with pytest.raises(ValueError):
        _mpcn_forward(dataset, hp_base, mpcn_projection="BOGUS")
