"""Shared neural blocks: factorization machine, text CNN, MLP towers.

TPU-first re-designs of the reference's shared PyTorch blocks
(`pytorch_models/common_pytorch_models.py`): the TextCNN is expressed as
a single windowed matmul so XLA tiles it onto the MXU, and the FM uses
the same (xV)^2 - (x^2 V^2) contraction trick (two matmuls, fused
elementwise tail).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def xavier_uniform():
    return nn.initializers.xavier_uniform()


class FM(nn.Module):
    """Rendle factorization machine head without global bias
    (reference `TorchFM`, common_pytorch_models.py:41-57).

    score(x) = 0.5 * sum_k[(x V)_k^2 - (x^2 V^2)_k] + w.x + b
    """

    factors: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[-1]
        # V is declared as torch.randn in the reference, but main_pytorch
        # applies xavier_init over every dim>1 parameter after
        # construction (utils.py:65-68, main.py:377), so the trained-from
        # state is xavier-uniform.
        v = self.param("V", xavier_uniform(), (n, self.factors))
        xv = x @ v                                    # [..., k]
        x2v2 = (x * x) @ (v * v)                      # [..., k]
        inter = 0.5 * jnp.sum(xv * xv - x2v2, axis=-1)
        lin = nn.Dense(1, kernel_init=xavier_uniform(), name="lin")(x)[..., 0]
        return inter + lin


class TextCNN(nn.Module):
    """Review-document encoder (reference `TextCNN`,
    common_pytorch_models.py:6-39): conv window 3 over the full word-embed
    width with 100 filters, ReLU, max-pool-over-time, FC to latent,
    dropout.

    The conv contracts the entire embedding dimension, so it is lowered
    as a [B*T, W*E] x [W*E, F] matmul (MXU-shaped) instead of a spatial
    convolution.
    """

    latent_size: int
    dropout: float = 0.6
    num_filters: int = 100
    window: int = 3
    use_pallas: bool = False       # fused conv+relu+maxpool kernel
    pallas_interpret: bool = False  # interpreter mode (CPU tests)
    # with use_pallas and a `table` argument: fuse the word-embedding
    # gather into the kernel's input (ops/textcnn_pallas.py
    # textcnn_pool_embed) — one gather emits the padded paired bf16
    # operand, and no doc-tensor gradient is ever materialized
    fuse_gather: bool = True
    # conv operand dtype (hp.compute_dtype): bf16 halves the HBM
    # traffic of the conv inputs; accumulation stays f32
    compute_dtype: jnp.dtype = jnp.float32
    # with use_pallas + the device doc cache: the cache stores the
    # PADDED PAIRED operand (ops/textcnn_pallas.py::paired_operand), so
    # the per-step relayout pass disappears; this is the original doc
    # length (0 = cache not pre-paired)
    prepaired_t: int = 0
    # sequence parallelism (hp.seq_parallel): shard the time axis over
    # `seq_axis` of `seq_mesh` with a ppermute halo exchange
    # (parallel/sequence.py); takes precedence over use_pallas — the two
    # paths partition the same conv differently
    seq_mesh: object = None
    seq_axis: str = "model"
    seq_batch_axis: Optional[str] = None  # DP axis of the batch dim

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 table: Optional[jnp.ndarray] = None,
                 skip: Optional[jnp.ndarray] = None,
                 rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # x: [B, T, E] embedded words, or int [B, T] token ids plus a
        # `table` [V, E] to embed with (the fused-gather path). A FLOAT
        # x alongside a table is a pre-embedded doc from the device
        # cache (hp.cache_doc_embeds): the gather is skipped and, since
        # the rows came from the frozen table, the input cotangent is
        # dead exactly as in the in-step-gather case.
        #
        # `skip` ([B, 2] int32 (start, len) or None) zeros that word
        # span of each doc — the entity-cache leakage MASK
        # (hp.cache_entity): canonical per-entity docs with the train
        # pair's own review zeroed in place. Applied in-kernel on the
        # prepaired Pallas path, at value level elsewhere (XLA fuses
        # the select into the adjacent relayout/conv).
        #
        # `rows` ([B] int32 or None): x is then the WHOLE per-entity doc
        # table and each example reads row `rows[b]`
        # (hp.pallas_fuse_rows) — the prepaired Pallas path gathers the
        # rows inside the kernels' DMA (textcnn_pool_rows); other paths
        # fall back to an explicit take (bitwise identical).
        w = self.window
        pre_embedded = (table is not None
                        and jnp.issubdtype(x.dtype, jnp.floating))
        prepaired = (pre_embedded and self.prepaired_t > 0
                     and self.use_pallas and self.seq_mesh is None)
        if rows is not None and not (prepaired and x.ndim == 3):
            x = jnp.take(x, rows, axis=0)
            rows = None
        frozen_input = table is not None
        # the fused-gather kernel has no mask input: with a skip span,
        # embed via take() and mask at value level instead
        fused = (frozen_input and not pre_embedded and self.use_pallas
                 and self.fuse_gather and self.seq_mesh is None
                 and skip is None)
        if frozen_input and not fused and not pre_embedded:
            x = jnp.take(table, x, axis=0)
        b, t = x.shape[:2]
        if skip is not None and not prepaired:
            ts = jnp.arange(x.shape[1])[None, :]
            st = skip[:, :1].astype(jnp.int32)
            ln = skip[:, 1:2].astype(jnp.int32)
            x = jnp.where(((ts >= st) & (ts < st + ln))[..., None],
                          jnp.zeros((), x.dtype), x)
        e = (table.shape[1] if fused else
             x.shape[2] // 2 if prepaired else x.shape[2])
        kernel = self.param("conv_kernel", xavier_uniform(),
                            (w * e, self.num_filters))
        bias = self.param("conv_bias", nn.initializers.zeros,
                          (self.num_filters,))
        if prepaired and rows is not None:
            from ..ops.textcnn_pallas import textcnn_pool_rows
            dot_dtype = jnp.float32 if self.pallas_interpret \
                else jnp.bfloat16
            y = textcnn_pool_rows(x, rows, kernel, bias,
                                  self.prepaired_t, w,
                                  self.pallas_interpret, dot_dtype, skip)
        elif prepaired:
            from ..ops.textcnn_pallas import textcnn_pool_paired
            dot_dtype = jnp.float32 if self.pallas_interpret \
                else jnp.bfloat16
            y = textcnn_pool_paired(x, kernel, bias, self.prepaired_t, w,
                                    self.pallas_interpret, dot_dtype,
                                    skip)
        elif fused:
            from ..ops.textcnn_pallas import textcnn_pool_embed
            dot_dtype = jnp.float32 if self.pallas_interpret \
                else jnp.bfloat16
            y = textcnn_pool_embed(x, table, kernel, bias, w,
                                   self.pallas_interpret, dot_dtype)
        elif self.seq_mesh is not None:
            from ..parallel.sequence import textcnn_pool_seq
            y = textcnn_pool_seq(x, kernel, bias, w, self.seq_mesh,
                                 self.seq_axis, self.seq_batch_axis)
        elif self.use_pallas:
            from ..ops.textcnn_pallas import textcnn_pool
            # bf16 operand storage on real TPU: numerically identical to
            # the default-precision f32 path (XLA lowers f32 matmuls to
            # single-pass bf16 on v5e), half the HBM traffic. Interpret
            # mode (CPU tests) keeps true f32 to match the XLA branch.
            dot_dtype = jnp.float32 if self.pallas_interpret \
                else jnp.bfloat16
            # table-embedded inputs come from a FROZEN word table, so
            # their cotangent is dead: compile the backward without dx
            y = textcnn_pool(x, kernel, bias, w, self.pallas_interpret,
                             dot_dtype, need_dx=not frozen_input)
        else:
            # torch Conv2d pads (window-1) on both ends -> T+w-1 outputs
            xp = jnp.pad(x.astype(self.compute_dtype),
                         ((0, 0), (w - 1, w - 1), (0, 0)))
            # windows [B, T+w-1, w, E] -> flat tap axis -> one big matmul
            idx = (jnp.arange(t + w - 1)[:, None] + jnp.arange(w)[None, :])
            windows = xp[:, idx, :].reshape(b, t + w - 1, w * e)
            y = jax.lax.dot_general(
                windows, kernel.astype(self.compute_dtype),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = jax.nn.relu(y + bias)                  # [B, T+w-1, F]
            y = jnp.max(y, axis=1)                     # pool over time
        y = nn.Dense(self.latent_size, kernel_init=xavier_uniform(),
                     name="fc")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


class MLPTower(nn.Module):
    """Dropout -> Dense -> ReLU -> Dense (reference `projection`
    sub-networks, e.g. MF.py:27-33, NeuMF.py:90-95)."""

    sizes: Sequence[int]
    dropout: float = 0.6
    dropout_first: bool = True
    final_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.dropout_first:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for j, size in enumerate(self.sizes):
            x = nn.Dense(size, kernel_init=xavier_uniform(), name=f"fc{j}")(x)
            if j < len(self.sizes) - 1:
                x = jax.nn.relu(x)
        if self.final_activation is not None:
            x = self.final_activation(x)
        return x


class ScorerMLP(nn.Module):
    """Dense -> ReLU -> Dropout -> Dense(1): the attention scorers and
    final heads used by DeepCoNN++/NARRE (DeepCoNN.py:22-27,
    NARRE.py:25-37)."""

    hidden: int
    dropout: float = 0.6

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden, kernel_init=xavier_uniform(), name="fc0")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(1, kernel_init=xavier_uniform(), name="fc1")(x)
        return x[..., 0]


class Highway(nn.Module):
    """Highway layer (reference `highway_layer`, tylib/lib/nn.py:128-143):
    gate * relu(trans(x)) + (1 - gate) * x, with an extra linear carry
    projection when the output width differs from the input's. Selected
    in the reference by 'HP' in rnn_type (tf_models/model.py:184-188)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        trans = jax.nn.relu(nn.Dense(self.dim, kernel_init=xavier_uniform(),
                                     name="trans")(x))
        gate = jax.nn.sigmoid(nn.Dense(self.dim, kernel_init=xavier_uniform(),
                                       name="gate")(x))
        if x.shape[-1] != self.dim:
            x = nn.Dense(self.dim, kernel_init=xavier_uniform(),
                         name="carry")(x)
        return gate * trans + (1.0 - gate) * x


class LayerNorm(nn.Module):
    """Layer normalization over the last axis (reference `normalize`,
    tylib/lib/nn.py:334-361: moments over [-1], learned gamma/beta,
    eps inside the sqrt)."""

    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return gamma * (x - mean) * jax.lax.rsqrt(var + self.epsilon) + beta


def positional_encoding(length: int, dim: int, zero_pad: bool = False,
                        scale: bool = False) -> jnp.ndarray:
    """Sinusoidal positional-encoding table [length, dim] (reference
    `positional_encoding`, tylib/lib/nn.py:11-73): sin on even columns,
    cos on odd, angle pos / 10000^(2i/dim); optional zeroed row 0 and
    sqrt(dim) scaling. Static-shape: built at trace time, constant-folded
    by XLA."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    i = jnp.arange(dim, dtype=jnp.float32)[None, :]
    # the reference uses 2*i/dim with i the raw column index, so even and
    # odd columns share (almost) the same frequency pairwise
    angle = pos / jnp.power(10000.0, 2.0 * i / dim)
    table = jnp.where(jnp.arange(dim) % 2 == 0, jnp.sin(angle),
                      jnp.cos(angle))
    if zero_pad:
        table = table.at[0].set(0.0)
    if scale:
        table = table * jnp.sqrt(jnp.asarray(dim, jnp.float32))
    return table


class PosFFN(nn.Module):
    """Point-wise feed-forward block with residual + layer norm
    (reference `pos_feedforward`, tylib/lib/nn.py:363-393): two 1x1
    convolutions — position-wise Dense on TPU, where a kernel-1 conv IS
    a matmul — relu between, residual add, LayerNorm.

    LIBRARY-PARITY-ONLY: unreachable from the reference runner's config
    space (like `positional_encoding` below) — kept, tested, for the NN
    library's full surface."""

    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jax.nn.relu(nn.Dense(self.hidden, kernel_init=xavier_uniform(),
                                 name="inner")(x))
        h = nn.Dense(x.shape[-1], kernel_init=xavier_uniform(),
                     name="readout")(h)
        return LayerNorm(name="ln")(x + h)


def doc_shape(doc: jnp.ndarray, ndims: int):
    """(lead, tail) split of a doc tensor whose layout trails with
    `ndims` dims when integer ids ([..., T] or [..., R, W]) — float docs
    from the device embedding cache carry one extra trailing E axis."""
    if jnp.issubdtype(doc.dtype, jnp.floating):
        ndims += 1
    return doc.shape[:-ndims], doc.shape[-ndims:]


def frozen_word_table(mod: nn.Module, word_vectors) -> jnp.ndarray:
    """Frozen word2vec table declared as a module parameter named
    `word_vectors` instead of a closed-over array: a closed-over table
    is baked into the jaxpr as an HLO constant (12.8 MB per tower at the
    real 50k x 64 scale), while a param is a traced jit argument —
    shardable, donated, checkpointed. `stop_gradient` freezes it (the
    reference's requires_grad=False, DeepCoNN.py:14-16) and
    `train.loop.make_optimizer` masks it out of Adam state and weight
    decay, matching torch semantics where frozen params never reach the
    optimizer."""
    wv = mod.param("word_vectors", lambda _rng: jnp.asarray(word_vectors))
    return jax.lax.stop_gradient(wv)


def bias_lookup(bias_table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(bias_table, ids, axis=0)


def embed_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Row gather; the sharded variant lives in parallel/embedding.py."""
    return jnp.take(table, ids, axis=0)
