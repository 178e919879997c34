"""Pallas kernel tests (interpret mode on CPU): forward parity with the
XLA reference formulation and gradient correctness via finite checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reviews4rec_tpu.ops.textcnn_pallas import textcnn_pool


def reference_conv_pool(x, kernel, bias, window=3):
    b, t, e = x.shape
    xp = jnp.pad(x, ((0, 0), (window - 1, window - 1), (0, 0)))
    idx = jnp.arange(t + window - 1)[:, None] + jnp.arange(window)[None, :]
    windows = xp[:, idx, :].reshape(b, t + window - 1, window * e)
    y = jax.nn.relu(windows @ kernel + bias)
    return jnp.max(y, axis=1)


# E=64 exercises the paired fast path (2E == one lane tile), the other
# shapes the generic fallback
@pytest.mark.parametrize("shape", [(4, 37, 8), (2, 130, 16), (3, 260, 8),
                                   (2, 100, 64), (3, 257, 64),
                                   (5, 1000, 64)])
def test_forward_parity(shape):
    b, t, e = shape
    f = 16 if e < 64 else 100
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, e)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3 * e, f)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(f,)), jnp.float32)

    expect = reference_conv_pool(x, k, bias)
    got = textcnn_pool(x, k, bias, 3, True)
    assert np.allclose(np.asarray(got), np.asarray(expect), atol=1e-4)


@pytest.mark.parametrize("shape", [(2, 50, 8, 8), (2, 150, 64, 100)])
def test_gradients_match_reference(shape):
    b, t, e, f = shape
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b, t, e)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3 * e, f)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(f,)), jnp.float32)

    def loss_ref(x, k, bias):
        return jnp.sum(reference_conv_pool(x, k, bias) ** 2)

    def loss_pal(x, k, bias):
        return jnp.sum(textcnn_pool(x, k, bias, 3, True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, bias)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(x, k, bias)
    for a, b_ in zip(g_ref, g_pal):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_textcnn_module_pallas_flag(dataset, hp_base):
    """TextCNN(use_pallas=True) must equal the XLA path."""
    from reviews4rec_tpu.models.layers import TextCNN
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 40, 8)),
                    jnp.float32)
    m_x = TextCNN(latent_size=8, dropout=0.0, use_pallas=False)
    m_p = TextCNN(latent_size=8, dropout=0.0, use_pallas=True,
                  pallas_interpret=True)
    params = m_x.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    out_x = m_x.apply({"params": params}, x)
    out_p = m_p.apply({"params": params}, x)
    assert np.allclose(np.asarray(out_x), np.asarray(out_p), atol=1e-4)
