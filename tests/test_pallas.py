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


def test_fused_gather_matches_unfused_fwd_and_grads():
    """textcnn_pool_embed (gather fused into the kernel input, frozen
    table) must match textcnn_pool(take(table, ids)) in value and in
    kernel/bias gradients, paired layout."""
    from reviews4rec_tpu.ops.textcnn_pallas import (textcnn_pool,
                                                    textcnn_pool_embed)

    rng = np.random.default_rng(7)
    v, e, f, b, t, w = 300, 64, 100, 4, 70, 3
    table = jnp.asarray(rng.normal(size=(v, e)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, v, (b, t)).astype(np.int32))
    kernel = jnp.asarray(rng.normal(size=(w * e, f)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(f,)), jnp.float32)

    x = jnp.take(table, ids, axis=0)
    ref = textcnn_pool(x, kernel, bias, w, True)
    got = textcnn_pool_embed(ids, table, kernel, bias, w, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    def loss_ref(k, bb):
        return jnp.sum(textcnn_pool(x, k, bb, w, True) ** 2)

    def loss_fused(k, bb):
        return jnp.sum(textcnn_pool_embed(ids, table, k, bb, w, True) ** 2)

    gk_ref, gb_ref = jax.grad(loss_ref, argnums=(0, 1))(kernel, bias)
    gk, gb = jax.grad(loss_fused, argnums=(0, 1))(kernel, bias)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_gather_generic_layout():
    """E != 64 falls back to the generic kernel geometry with the same
    fused-gather API."""
    from reviews4rec_tpu.ops.textcnn_pallas import (textcnn_pool,
                                                    textcnn_pool_embed)

    rng = np.random.default_rng(8)
    v, e, f, b, t, w = 120, 16, 24, 3, 40, 3
    table = jnp.asarray(rng.normal(size=(v, e)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, v, (b, t)).astype(np.int32))
    kernel = jnp.asarray(rng.normal(size=(w * e, f)), jnp.float32)
    bias = jnp.zeros((f,), jnp.float32)
    ref = textcnn_pool(jnp.take(table, ids, axis=0), kernel, bias, w, True)
    got = textcnn_pool_embed(ids, table, kernel, bias, w, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_deepconn_fuse_gather_matches_unfused(dataset, hp_base):
    """Product path: deepconn with use_pallas trains identically with
    the gather fused or unfused (interpret mode keeps f32 everywhere, so
    the paths are numerically identical)."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="deepconn", epochs=1, batch_size=16,
                         use_pallas=True)
    ref, _, _ = run(hp.replace(pallas_fuse_gather=False), dataset)
    got, _, _ = run(hp.replace(pallas_fuse_gather=True), dataset)
    assert got["MSE"] == ref["MSE"]
    assert got["HR@1"] == ref["HR@1"]


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-TPU parity; run with R4R_TEST_TPU=1")
def test_tpu_parity_production_shape():
    """On-hardware parity at the production geometry (B=256, T=1000,
    E=64, bf16 operands): compiled paired kernel and fused-gather kernel
    vs the XLA windowed-matmul reference, forward and kernel/bias grads.
    XLA's f32 conv runs single-pass bf16 on v5e, so tolerances cover
    bf16 rounding only."""
    from reviews4rec_tpu.ops.textcnn_pallas import (textcnn_pool,
                                                    textcnn_pool_embed)

    rng = np.random.default_rng(0)
    v, e, f, b, t, w = 2000, 64, 100, 256, 1000, 3
    table = jnp.asarray(rng.normal(size=(v, e)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, (b, t)).astype(np.int32))
    kernel = jnp.asarray(
        (rng.normal(size=(w * e, f)) / np.sqrt(w * e)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))
    x = jnp.take(table, ids, axis=0)

    # XLA reference (same math as models/layers.py TextCNN default path)
    xp = jnp.pad(x, ((0, 0), (w - 1, w - 1), (0, 0)))
    widx = jnp.arange(t + w - 1)[:, None] + jnp.arange(w)[None, :]
    windows = xp[:, widx, :].reshape(b, t + w - 1, w * e)
    ref = jnp.max(jax.nn.relu(
        jax.lax.dot_general(windows, kernel,
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bias),
        axis=1)

    for name, out in [
        ("paired", textcnn_pool(x, kernel, bias, w, False, jnp.bfloat16)),
        ("fused", textcnn_pool_embed(ids, table, kernel, bias, w, False,
                                     jnp.bfloat16)),
    ]:
        err = np.abs(np.asarray(out) - np.asarray(ref))
        scale = np.abs(np.asarray(ref)).max()
        assert err.max() / scale < 2e-2, (name, err.max(), scale)

    # grads: fused vs unfused must agree bitwise-tight (identical math)
    def loss_fused(k, bb):
        return jnp.sum(textcnn_pool_embed(ids, table, k, bb, w, False,
                                          jnp.bfloat16) ** 2)

    def loss_pal(k, bb):
        return jnp.sum(textcnn_pool(x, k, bb, w, False,
                                    jnp.bfloat16) ** 2)

    gk_f, gb_f = jax.grad(loss_fused, argnums=(0, 1))(kernel, bias)
    gk_p, gb_p = jax.grad(loss_pal, argnums=(0, 1))(kernel, bias)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_p),
                               rtol=1e-4, atol=1e-4)
    kscale = np.abs(np.asarray(gk_p)).max()
    assert np.abs(np.asarray(gk_f) - np.asarray(gk_p)).max() / kscale \
        < 2e-2


def test_prepaired_matches_unpaired_fwd_and_grads():
    """textcnn_pool_paired over paired_operand's cached layout must
    match textcnn_pool on the raw docs in value and kernel/bias grads
    (the relayout is hoisted, not changed)."""
    from reviews4rec_tpu.ops.textcnn_pallas import (paired_operand,
                                                    textcnn_pool,
                                                    textcnn_pool_paired)

    rng = np.random.default_rng(11)
    b, t, e, f, w = 5, 70, 64, 100, 3
    x = jnp.asarray(rng.normal(size=(b, t, e)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(w * e, f)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    xp = paired_operand(x, w, jnp.float32)

    ref = textcnn_pool(x, kernel, bias, w, True, jnp.float32, False)
    got = textcnn_pool_paired(xp, kernel, bias, t, w, True, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    def loss_ref(k, bb):
        return jnp.sum(textcnn_pool(x, k, bb, w, True, jnp.float32,
                                    False) ** 2)

    def loss_pp(k, bb):
        return jnp.sum(textcnn_pool_paired(xp, k, bb, t, w, True,
                                           jnp.float32) ** 2)

    gk_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(kernel, bias)
    gk_p, gb_p = jax.grad(loss_pp, argnums=(0, 1))(kernel, bias)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-TPU parity; run with R4R_TEST_TPU=1")
def test_tpu_prepaired_production_shape():
    """On-hardware parity for the paired-operand entry (the doc-cache
    hot path) at the production geometry, forward + kernel/bias grads
    vs the unpaired compiled kernel — identical math, so tight
    tolerances."""
    from reviews4rec_tpu.ops.textcnn_pallas import (paired_operand,
                                                    textcnn_pool,
                                                    textcnn_pool_paired)

    rng = np.random.default_rng(2)
    b, t, e, f, w = 256, 1000, 64, 100, 3
    x = jnp.asarray((rng.normal(size=(b, t, e)) / 8).astype(np.float32))
    kernel = jnp.asarray(
        (rng.normal(size=(w * e, f)) / np.sqrt(w * e)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))
    xp = paired_operand(x, w, jnp.bfloat16)

    ref = textcnn_pool(x, kernel, bias, w, False, jnp.bfloat16, False)
    got = textcnn_pool_paired(xp, kernel, bias, t, w, False, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_ref(k, bb):
        return jnp.sum(textcnn_pool(x, k, bb, w, False, jnp.bfloat16,
                                    False) ** 2)

    def loss_pp(k, bb):
        return jnp.sum(textcnn_pool_paired(xp, k, bb, t, w, False,
                                           jnp.bfloat16) ** 2)

    gk_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(kernel, bias)
    gk_p, gb_p = jax.grad(loss_pp, argnums=(0, 1))(kernel, bias)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r),
                               rtol=1e-4, atol=1e-4)
    kscale = max(np.abs(np.asarray(gk_r)).max(), 1e-9)
    assert np.abs(np.asarray(gk_p) - np.asarray(gk_r)).max() / kscale \
        < 1e-3


def test_need_dx_false_same_kernel_grads():
    """need_dx=False (frozen-table inputs) must produce identical
    kernel/bias gradients to the full backward, paired + generic."""
    from reviews4rec_tpu.ops.textcnn_pallas import textcnn_pool

    rng = np.random.default_rng(9)
    for e, t in [(64, 70), (16, 40)]:
        b, f, w = 4, 100, 3
        x = jnp.asarray(rng.normal(size=(b, t, e)), jnp.float32)
        kernel = jnp.asarray(rng.normal(size=(w * e, f)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(f,)), jnp.float32)

        def loss(k, bb, need_dx):
            return jnp.sum(
                textcnn_pool(x, k, bb, w, True, jnp.float32, need_dx) ** 2)

        gk1, gb1 = jax.grad(lambda k, bb: loss(k, bb, True),
                            argnums=(0, 1))(kernel, bias)
        gk0, gb0 = jax.grad(lambda k, bb: loss(k, bb, False),
                            argnums=(0, 1))(kernel, bias)
        np.testing.assert_allclose(np.asarray(gk0), np.asarray(gk1),
                                   rtol=1e-5, atol=1e-5), e
        np.testing.assert_allclose(np.asarray(gb0), np.asarray(gb1),
                                   rtol=1e-6, atol=1e-6)


def test_paired_skip_mask_matches_zeroed_input():
    """The in-kernel leakage mask (entity cache, hp.cache_entity):
    textcnn_pool_paired with skip=(start, len) must equal the unmasked
    op on an input whose word span is zeroed at value level — forward
    bitwise, dkernel bitwise (the mask applies before tap staging in
    both kernels)."""
    import jax.numpy as jnp
    from reviews4rec_tpu.ops.textcnn_pallas import (paired_operand,
                                                    textcnn_pool,
                                                    textcnn_pool_paired)

    rng = np.random.default_rng(7)
    b, t, e, f, w = 5, 70, 64, 9, 3
    x = jnp.asarray(rng.normal(size=(b, t, e)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(w * e, f)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    # spans: none, interior, whole doc, tail-overhang, single word
    skip = jnp.asarray([[0, 0], [3, 7], [0, 70], [65, 20], [10, 1]],
                       jnp.int32)
    ts = jnp.arange(t)[None, :]
    m = (ts >= skip[:, :1]) & (ts < skip[:, :1] + skip[:, 1:2])
    xz = jnp.where(m[..., None], 0.0, x)

    ref = textcnn_pool(xz, kern, bias, w, True, jnp.float32, False)
    xp = paired_operand(x, w, jnp.float32)
    got = textcnn_pool_paired(xp, kern, bias, t, w, True, jnp.float32,
                              skip)
    assert np.array_equal(np.asarray(ref), np.asarray(got))

    gr = jax.grad(lambda k: jnp.sum(
        textcnn_pool(xz, k, bias, w, True, jnp.float32, False) ** 2))(kern)
    gp = jax.grad(lambda k: jnp.sum(
        textcnn_pool_paired(xp, k, bias, t, w, True, jnp.float32,
                            skip) ** 2))(kern)
    assert np.array_equal(np.asarray(gr), np.asarray(gp))


def test_rows_kernel_matches_take_path():
    """Fused row-gather kernels (textcnn_pool_rows: scalar-prefetched
    rows, per-row double-buffered HBM->VMEM DMA) must match
    take(table, rows) + textcnn_pool_paired bitwise — forward and
    dkernel, with and without the leakage mask."""
    import jax.numpy as jnp
    from reviews4rec_tpu.ops.textcnn_pallas import (paired_operand,
                                                    textcnn_pool_paired,
                                                    textcnn_pool_rows)

    rng = np.random.default_rng(3)
    n, b, t, e, f, w = 11, 5, 70, 64, 9, 3
    docs = jnp.asarray(rng.normal(size=(n, t, e)), jnp.float32)
    table = paired_operand(docs, w, jnp.float32)
    rows = jnp.asarray([3, 0, 10, 7, 3], jnp.int32)
    kern = jnp.asarray(rng.normal(size=(w * e, f)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    for skip in (None, jnp.asarray([[0, 0], [3, 7], [0, 70], [65, 20],
                                    [10, 1]], jnp.int32)):
        ref = textcnn_pool_paired(table[rows], kern, bias, t, w, True,
                                  jnp.float32, skip)
        got = textcnn_pool_rows(table, rows, kern, bias, t, w, True,
                                jnp.float32, skip)
        assert np.array_equal(np.asarray(ref), np.asarray(got))
        gr = jax.grad(lambda k: jnp.sum(textcnn_pool_paired(
            table[rows], k, bias, t, w, True, jnp.float32,
            skip) ** 2))(kern)
        gp = jax.grad(lambda k: jnp.sum(textcnn_pool_rows(
            table, rows, k, bias, t, w, True, jnp.float32,
            skip) ** 2))(kern)
        assert np.array_equal(np.asarray(gr), np.asarray(gp))
