"""Golden-value and structural tests for the embedding-dot family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reviews4rec_tpu.models import build_model, neumf_warm_start
from reviews4rec_tpu.train.evaluate import make_apply_fn


def _init(model, batch, seed=0):
    rng = jax.random.PRNGKey(seed)
    return model.init({"params": rng, "dropout": rng}, batch, train=False)[
        "params"]


def _mini_batch(b=4):
    return {
        "user": np.arange(b, dtype=np.int32),
        "item": np.arange(b, dtype=np.int32)[::-1].copy(),
        "rating": np.full(b, 4.0, np.float32),
        "weight": np.ones(b, np.float32),
    }


def test_bias_only_golden(hp_base):
    """Fresh bias_only must predict exactly 0.1 + 0.1 + 4.0 = 4.2
    (init constants from reference MF.py:14-16)."""
    hp = hp_base.replace(model_type="bias_only")
    model = build_model(hp)
    batch = _mini_batch()
    params = _init(model, batch)
    out = model.apply({"params": params}, batch, train=False)
    assert np.allclose(np.asarray(out), 4.2, atol=1e-6)


def test_mf_dot_matches_manual(hp_base):
    hp = hp_base.replace(model_type="MF_dot")
    model = build_model(hp)
    batch = _mini_batch()
    params = _init(model, batch)
    out = model.apply({"params": params}, batch, train=False)
    ue = params["user_embedding"][batch["user"]]
    ie = params["item_embedding"][batch["item"]]
    manual = 4.2 + (ue * ie).sum(-1)
    assert np.allclose(np.asarray(out), np.asarray(manual), atol=1e-5)


@pytest.mark.parametrize("mt", ["bias_only", "MF_dot", "MF", "GMF", "MLP",
                                "NeuMF"])
def test_leading_dims(hp_base, mt):
    """Models must handle [B, 6] candidate grids (the ranking-eval
    layout, reference MF.py:44-46)."""
    hp = hp_base.replace(model_type=mt)
    model = build_model(hp)
    flat = _mini_batch(12)
    params = _init(model, flat)
    grid = {
        "user": flat["user"].reshape(2, 6),
        "item": flat["item"].reshape(2, 6),
        "rating": flat["rating"].reshape(2, 6),
    }
    out_flat = model.apply({"params": params}, flat, train=False)
    out_grid = model.apply({"params": params}, grid, train=False)
    assert out_grid.shape == (2, 6)
    assert np.allclose(np.asarray(out_flat).reshape(2, 6),
                       np.asarray(out_grid), atol=1e-6)


def test_fm_golden():
    """FM forward equals the closed form on a crafted example."""
    from reviews4rec_tpu.models.layers import FM
    x = jnp.array([[1.0, 2.0, 3.0]])
    model = FM(factors=2)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    v = params["V"]
    w = params["lin"]["kernel"]
    b = params["lin"]["bias"]
    xv = x @ v
    x2v2 = (x ** 2) @ (v ** 2)
    expect = 0.5 * (xv ** 2 - x2v2).sum() + (x @ w)[0, 0] + b[0]
    got = model.apply({"params": params}, x)
    assert np.allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_neumf_warm_start(hp_base):
    hp = hp_base.replace(model_type="NeuMF")
    batch = _mini_batch()
    gmf = build_model(hp.replace(model_type="GMF"))
    mlp = build_model(hp.replace(model_type="MLP"))
    neumf = build_model(hp)
    gp = _init(gmf, batch, 1)
    mp = _init(mlp, batch, 2)
    np_ = _init(neumf, batch, 3)
    warm = neumf_warm_start(np_, gp, mp)
    assert np.allclose(warm["gmf_user_embedding"], gp["user_embedding"])
    assert np.allclose(warm["mlp_item_embedding"], mp["item_embedding"])
    assert np.allclose(warm["user_bias"],
                       0.5 * (gp["user_bias"] + mp["user_bias"]))
    # final kernel: concat along feature axis -> shape [2*latent, 1]
    assert warm["final"]["kernel"].shape[0] == 2 * hp.latent_size
    # warm-started model still runs
    out = neumf.apply({"params": warm}, batch, train=False)
    assert out.shape == (4,)


def test_textcnn_shapes(hp_base):
    from reviews4rec_tpu.models.layers import TextCNN
    x = jnp.ones((3, 20, 16))
    model = TextCNN(latent_size=8, dropout=0.5)
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (3, 8)


def test_textcnn_matches_torch_conv():
    """The windowed-matmul formulation must equal a reference 2D conv
    (torch Conv2d with padding (window-1, 0), common_pytorch_models.py:14-17)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    B, T, E, Fn, W = 2, 11, 8, 5, 3
    x = rng.normal(size=(B, T, E)).astype(np.float32)
    k = rng.normal(size=(Fn, 1, W, E)).astype(np.float32)
    bias = rng.normal(size=(Fn,)).astype(np.float32)

    tx = torch.from_numpy(x).unsqueeze(1)  # [B,1,T,E]
    ty = F.conv2d(tx, torch.from_numpy(k), torch.from_numpy(bias),
                  padding=(W - 1, 0))
    ty = torch.relu(ty.squeeze(-1))          # [B,F,T+W-1]
    ty = torch.max_pool1d(ty, ty.shape[2]).squeeze(-1)  # [B,F]

    # our formulation
    xp = np.pad(x, ((0, 0), (W - 1, W - 1), (0, 0)))
    idx = np.arange(T + W - 1)[:, None] + np.arange(W)[None, :]
    windows = xp[:, idx, :].reshape(B, T + W - 1, W * E)
    kernel = k[:, 0].reshape(Fn, W * E).T  # [W*E, F]
    ours = np.maximum(windows @ kernel + bias, 0).max(axis=1)

    assert np.allclose(ours, ty.numpy(), atol=1e-5)
