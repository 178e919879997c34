"""Co-attention / attention library.

TPU-native counterpart of the reference's attention toolbox
(`MPCN/tylib/lib/att_op.py`):

- `CoAttention` — the general co-attention mechanism
  (att_op.py:139-373): affinity types SOFT / BILINEAR / TENSOR / MLP /
  MD over a pair of sequence batches, pooled row/col-wise by
  MAX / MIN / SUM / MEAN into per-position weights (softmax or
  straight-through Gumbel pointer), or alignment-style 'MATRIX'
  pooling (att_op.py:311-336).
- `gumbel_softmax` — straight-through hard attention
  (att_op.py:374-390).
- `IntraAttention` — self-alignment with learned clipped-distance
  biases (att_op.py:37-78, `get_distance_biases` att_op.py:89-123).
- `ConvAttention` / `LocalAttention` / `DualAttention` — the D-ATT
  dual (local+global) attention encoder (att_op.py:392-441), built on
  1-D convs expressed as windowed matmuls so XLA tiles them onto the
  MXU.

Everything is fixed-shape and branch-free under `jit`; the attention
variant is selected at construction (a Python-level static), never by
device-side control flow.

Deviations from the reference, by design rather than translation:
- TENSOR affinity is the clean einsum `max_s a_i U_s b_j^T`; the
  reference realizes the same k-slice bilinear max through a pair of
  reshapes that scramble the (len, slice) axes (att_op.py:258-268) —
  immaterial to learning since U is trained from scratch, but not
  worth reproducing bit-for-bit.
- MLP/MD affinities build the all-pairs [a_i ; b_j] features by
  broadcasting instead of `tf.tile` (the reference's tile pattern
  repeats whole blocks; the intended all-pairs semantics is what is
  implemented here).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import xavier_uniform

AFFINITIES = ("SOFT", "BILINEAR", "TENSOR", "MLP", "MD")
POOLINGS = ("MAX", "MIN", "SUM", "MEAN", "MATRIX")


def gumbel_softmax(logits, rng, temperature: float, hard: bool = True):
    """Straight-through Gumbel softmax (att_op.py:374-390): forward is
    one-hot argmax of the perturbed logits, backward flows through the
    soft sample."""
    u = jax.random.uniform(rng, logits.shape, minval=1e-20, maxval=1.0)
    g = -jnp.log(-jnp.log(u))
    y = jax.nn.softmax((logits + g) / temperature, axis=-1)
    if hard:
        y_hard = (y == jnp.max(y, axis=-1, keepdims=True)).astype(y.dtype)
        y = jax.lax.stop_gradient(y_hard - y) + y
    return y


def hard_argmax(logits):
    """Deterministic pointer for eval: one-hot of the max logit (the
    noise-free temperature->0 limit of the Gumbel estimator)."""
    return (logits == jnp.max(logits, axis=-1, keepdims=True)) \
        .astype(logits.dtype)


class CoAttention(nn.Module):
    """Co-attention over two sequence batches a:[B, la, d], b:[B, lb, d]
    (att_op.py:139-373).

    Returns (final_a, final_b, w_a, w_b, affinity):
    - pooling in {MAX,MIN,SUM,MEAN}: w_a:[B, la] weights over a's
      positions (col-pooled), w_b:[B, lb] (row-pooled); final_* are the
      weighted inputs (position-wise scaling, not a sum — callers sum
      when they want a vector, exactly like mpcn.py:92-137).
    - pooling == 'MATRIX' (alignment attention, att_op.py:317-336):
      w_a:[B, lb, la], w_b:[B, la, lb] row-softmaxed alignments and
      final_a:[B, lb, d] = w_a @ a, final_b:[B, la, d] = w_b @ b.
    """

    att_type: str = "SOFT"          # parser.py:122 default
    pooling: str = "MAX"
    k: int = 10                     # TENSOR slices / MD hidden width
    transform_layers: int = 1       # shared relu projection of both sides
    gumbel: bool = False            # hard pointer on the pooled weights
    temperature: float = 0.5
    dropout_rate: float = 0.0

    def setup(self):
        if self.att_type not in AFFINITIES:
            raise ValueError(f"affinity {self.att_type!r} not in {AFFINITIES}")
        if self.pooling not in POOLINGS:
            raise ValueError(f"pooling {self.pooling!r} not in {POOLINGS}")

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray, jnp.ndarray]:
        d = a.shape[-1]
        orig_a, orig_b = a, b
        for layer in range(self.transform_layers):
            # one projection shared by both sides (att_op.py:229-250)
            proj = nn.Dense(d, kernel_init=xavier_uniform(),
                            name=f"att_proj{layer}")
            a = jax.nn.relu(proj(a))
            b = jax.nn.relu(proj(b))

        if self.att_type == "SOFT":
            # parameter-free dot-product match (att_op.py:269-273)
            y = a @ jnp.swapaxes(b, -1, -2)
        elif self.att_type == "BILINEAR":
            # y_ij = a_i U b_j (att_op.py:248-257)
            u = self.param("weights_U", xavier_uniform(), (d, d))
            y = (a @ u) @ jnp.swapaxes(b, -1, -2)
        elif self.att_type == "TENSOR":
            # k bilinear slices, max over slices (att_op.py:258-268)
            u = self.param("weights_T", xavier_uniform(), (d, self.k, d))
            y = jnp.einsum("bid,dke,bje->bijk", a, u, b)
            y = jnp.max(y, axis=-1)
        else:  # MLP / MD: scored all-pairs concat (att_op.py:274-297)
            la, lb = a.shape[-2], b.shape[-2]
            pair = jnp.concatenate(
                [jnp.broadcast_to(a[..., :, None, :], (*a.shape[:-2], la, lb, d)),
                 jnp.broadcast_to(b[..., None, :, :], (*b.shape[:-2], la, lb, d))],
                axis=-1)
            if self.att_type == "MLP":
                y = nn.Dense(1, kernel_init=xavier_uniform(),
                             name="co_att")(pair)[..., 0]
            else:  # MD
                h = jax.nn.relu(nn.Dense(self.k, kernel_init=xavier_uniform(),
                                         name="co_att_md")(pair))
                y = nn.Dense(1, kernel_init=xavier_uniform(),
                             name="co_att_md_out")(h)[..., 0]

        drop = nn.Dropout(self.dropout_rate, deterministic=not train)

        if self.pooling == "MATRIX":
            # alignment attention (att_op.py:317-336): each b-position
            # attends over a and vice versa
            w_a = jax.nn.softmax(jnp.swapaxes(y, -1, -2), axis=-1)  # [B,lb,la]
            w_b = jax.nn.softmax(y, axis=-1)                        # [B,la,lb]
            final_a = drop(w_a @ orig_a)
            final_b = drop(w_b @ orig_b)
            return final_a, final_b, w_a, w_b, y

        if self.pooling == "MAX":
            att_row, att_col = jnp.max(y, -2), jnp.max(y, -1)
        elif self.pooling == "MIN":
            att_row, att_col = jnp.min(y, -2), jnp.min(y, -1)
        elif self.pooling == "SUM":
            att_row, att_col = jnp.sum(y, -2), jnp.sum(y, -1)
        else:  # MEAN
            att_row, att_col = jnp.mean(y, -2), jnp.mean(y, -1)

        if self.gumbel:
            if train:
                r1, r2 = jax.random.split(self.make_rng("gumbel"))
                w_a = gumbel_softmax(att_col, r1, self.temperature)
                w_b = gumbel_softmax(att_row, r2, self.temperature)
            else:
                # eval uses the deterministic limit (the reference's TF
                # graph keeps sampling at eval; see mpcn.py module doc)
                w_a, w_b = hard_argmax(att_col), hard_argmax(att_row)
        else:
            w_a = jax.nn.softmax(att_col, axis=-1)
            w_b = jax.nn.softmax(att_row, axis=-1)

        final_a = drop(w_a[..., None] * a)
        final_b = drop(w_b[..., None] * b)
        return final_a, final_b, w_a, w_b, y


class IntraAttention(nn.Module):
    """Self-alignment intra-attention (att_op.py:37-78, after the IA
    model of Parikh et al.): 2-layer projection, dot-product affinity
    plus a learned bias per clipped token distance
    (`get_distance_biases`, att_op.py:89-123), row softmax, concat of
    the projection and its attended counterpart.

    LIBRARY-PARITY-ONLY: no reference-runner config reaches intra-
    attention (the MPCN runner never sets att_op's intra flags), so no
    model config here wires it either — it exists, tested, to cover the
    attention library's full surface for external callers."""

    dim: int
    dist_bias: int = 10

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        t = x.shape[-2]
        for layer in range(2):
            x = nn.Dense(self.dim, kernel_init=xavier_uniform(),
                         name=f"intra_proj{layer}")(x)
            x = jax.nn.relu(x)
        table = self.param("dist_bias", nn.initializers.zeros,
                           (self.dist_bias,))
        rel = jnp.arange(t)[None, :] - jnp.arange(t)[:, None]
        bias = jnp.take(table, jnp.clip(rel, 0, self.dist_bias - 1), axis=0)
        att = jax.nn.softmax(x @ jnp.swapaxes(x, -1, -2) + bias, axis=-1)
        return jnp.concatenate([x, att @ x], axis=-1)


class _Conv1D(nn.Module):
    """SAME-padded 1-D conv as a windowed matmul (MXU-shaped)."""

    features: int
    window: int
    name_prefix: str = "conv"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, e = x.shape
        w = self.window
        kernel = self.param(f"{self.name_prefix}_kernel", xavier_uniform(),
                            (w * e, self.features))
        bias = self.param(f"{self.name_prefix}_bias",
                          nn.initializers.constant(0.1), (self.features,))
        lo = (w - 1) // 2
        xp = jnp.pad(x, ((0, 0), (lo, w - 1 - lo), (0, 0)))
        idx = jnp.arange(t)[:, None] + jnp.arange(w)[None, :]
        windows = xp[:, idx, :].reshape(b, t, w * e)
        return windows @ kernel + bias


class ConvAttention(nn.Module):
    """Sliding sigmoid-gate attention (`convolutional_attention`,
    att_op.py:424-441): a width-5 conv to one channel, sigmoid, gate."""

    window: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gate = jax.nn.sigmoid(_Conv1D(1, self.window, "gate")(x))
        return x * gate


class _PooledCNN(nn.Module):
    """conv -> relu -> max-over-time per window size, concatenated
    (`build_cnn`, tylib/lib/cnn.py:71-154)."""

    features: int
    windows: Tuple[int, ...] = (3,)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        per = self.features // len(self.windows)
        outs = [jnp.max(jax.nn.relu(_Conv1D(per, w, f"cnn{w}")(x)), axis=1)
                for w in self.windows]
        return jnp.concatenate(outs, axis=-1)


class DualAttention(nn.Module):
    """D-ATT dual attention encoder (`dual_attention`, att_op.py:392-407):
    a *local* branch — sliding sigmoid gate then a window-3 pooled CNN
    (att_op.py:409-422) — concatenated with a *global* branch — pooled
    CNN over windows {2,3,4} — then a 2-layer relu FFN."""

    features: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        local = _PooledCNN(self.features, (3,), name="local")(
            ConvAttention(name="local_gate")(x))
        glob = _PooledCNN(self.features, (2, 3, 4), name="global")(x)
        h = jnp.concatenate([local, glob], axis=-1)
        drop = nn.Dropout(self.dropout_rate, deterministic=not train)
        for layer in range(2):
            h = jax.nn.relu(nn.Dense(self.features,
                                     kernel_init=xavier_uniform(),
                                     name=f"ffn{layer}")(drop(h)))
        return h
