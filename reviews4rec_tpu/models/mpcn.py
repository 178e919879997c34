"""MPCN: Multi-Pointer Co-Attention Networks (reference
`MPCN/tf_models/mpcn.py:31-178` + `tylib/lib/att_op.py:139-390`,
configuration 'RAW_MSE_MPCN_FN_FM' as driven by reviews4rec's runner
`run_MPCN_in_p2.sh`).

Pipeline per the reference defaults (MPCN/parser.py): reviews encoded as
sums of word embeddings (NBOW, model.py:344-347), a shared relu
projection (translate_proj, model.py:671-695), then per head:
 1. review-level co-attention: SOFT (dot-product) affinity over
    projected review reps, MAX-pooled per side, **hard Gumbel pointer**
    selecting one review each side (att_op.py:311-390, mpcn.py:71-81);
 2. the selected review's word embeddings recovered by the pointer-
    weighted sum over the review axis (mpcn.py:92-109);
 3. word-level co-attention: SOFT affinity, MEAN-pooled, soft softmax
    weights, summed over words (mpcn.py:128-137).
Head outputs plus the summed review reps are merged by a shared FFN
('FN', mpcn.py:149-160) and scored by an FM head on [u; i]
(model.py:361-406 'FM' branch).

Deviation from the reference: TF samples Gumbel noise at eval time too
(the graph is shared); here eval uses the deterministic temperature->0
limit (hard argmax pointer, no noise), which is the noise-free mean of
the same estimator.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import xavier_uniform


def gumbel_softmax(logits, rng, temperature: float, hard: bool = True):
    """Straight-through Gumbel softmax (att_op.py:379-390)."""
    u = jax.random.uniform(rng, logits.shape, minval=1e-20, maxval=1.0)
    g = -jnp.log(-jnp.log(u))
    y = jax.nn.softmax((logits + g) / temperature, axis=-1)
    if hard:
        y_hard = (y == jnp.max(y, axis=-1, keepdims=True)).astype(y.dtype)
        y = jax.lax.stop_gradient(y_hard - y) + y
    return y


def hard_argmax(logits):
    """Deterministic pointer for eval: one-hot of the max logit."""
    return (logits == jnp.max(logits, axis=-1, keepdims=True)) \
        .astype(logits.dtype)


class MPCN(nn.Module):
    num_user_rows: int
    num_item_rows: int
    hidden: int                       # hdim == rnn_size == latent_size
    word_vectors: jnp.ndarray         # used for vocab size + init
    num_heads: int = 1
    temperature: float = 0.5
    factors: int = 10                 # FM factors (parser.py factor=10)
    dropout_keep: float = 0.8         # TF keep-prob (parser.py dropout=0.8)

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lead = batch["user"].shape
        dmax, smax = batch["user_doc"].shape[-2:]
        udoc = batch["user_doc"].reshape(-1, dmax, smax)
        idoc = batch["item_doc"].reshape(-1, dmax, smax)
        b = udoc.shape[0]
        rate = 1.0 - self.dropout_keep
        drop = nn.Dropout(rate, deterministic=not train)

        # Trainable word embeddings (MPCN trains its own table from
        # scratch; experiment.py loads pretrained vectors only when
        # --pretrained=1, which reviews4rec's runner leaves off). The
        # shared word2vec array only fixes vocab/embedding size here.
        vocab = self.word_vectors.shape[0]
        emb_size = self.word_vectors.shape[1]
        table = self.param("word_embedding", xavier_uniform(),
                           (vocab, emb_size))

        def nbow(doc):
            e = jnp.take(table, doc.reshape(b * dmax, smax), axis=0)
            reps = jnp.sum(e, axis=1).reshape(b, dmax, emb_size)
            return reps, e.reshape(b, dmax, smax * emb_size)

        q1, o1 = nbow(udoc)   # [B, dmax, E], [B, dmax, smax*E]
        q2, o2 = nbow(idoc)

        # translate_proj: shared relu FC E -> hidden (model.py:671-695)
        proj = nn.Dense(self.hidden, kernel_init=xavier_uniform(),
                        name="trans_proj")
        q1 = jax.nn.relu(proj(q1))
        q2 = jax.nn.relu(proj(q2))

        def co_attention(a, bb, name, pooling, pointer=False):
            """SOFT-affinity co-attention (att_op.py:139-373): a shared
            relu projection, dot-product affinity, row/col pooling."""
            tp = nn.Dense(a.shape[-1], kernel_init=xavier_uniform(),
                          name=f"{name}_proj")
            pa, pb = jax.nn.relu(tp(a)), jax.nn.relu(tp(bb))
            y = pa @ jnp.swapaxes(pb, -1, -2)     # [B, la, lb]
            if pooling == "MAX":
                att_row = jnp.max(y, axis=1)      # over a -> weights for b
                att_col = jnp.max(y, axis=2)      # over b -> weights for a
            else:  # MEAN
                att_row = jnp.mean(y, axis=1)
                att_col = jnp.mean(y, axis=2)
            if pointer:                           # gumbel hard pointer
                if train:
                    r1, r2 = jax.random.split(self.make_rng("gumbel"))
                    w_a = gumbel_softmax(att_col, r1, self.temperature)
                    w_b = gumbel_softmax(att_row, r2, self.temperature)
                else:
                    w_a, w_b = hard_argmax(att_col), hard_argmax(att_row)
            else:
                w_a = jax.nn.softmax(att_col, axis=-1)
                w_b = jax.nn.softmax(att_row, axis=-1)
            fa = drop(w_a[..., None] * pa)
            fb = drop(w_b[..., None] * pb)
            return fa, fb, w_a, w_b

        f1 = []
        f2 = []
        for h in range(self.num_heads):
            _, _, a1, a2 = co_attention(q1, q2, f"mpcn_{h}", "MAX",
                                        pointer=True)
            # pointer-select one review's words per side (mpcn.py:92-109)
            sel1 = jnp.sum(o1 * a1[..., None], axis=1) \
                .reshape(b, smax, emb_size)
            sel2 = jnp.sum(o2 * a2[..., None], axis=1) \
                .reshape(b, smax, emb_size)
            z1, z2, _, _ = co_attention(sel1, sel2, f"inner_{h}", "MEAN")
            f1.append(jnp.sum(z1, axis=1))
            f2.append(jnp.sum(z2, axis=1))

        f1.append(jnp.sum(q1, axis=1))   # mpcn.py:150-151
        f2.append(jnp.sum(q2, axis=1))

        # 'FN' merge: shared FFN -> emb_size (mpcn.py:153-166)
        ffn = nn.Dense(emb_size, kernel_init=xavier_uniform(),
                       name="final_proj")
        u = jax.nn.relu(ffn(jnp.concatenate(f1, axis=-1)))
        i = jax.nn.relu(ffn(jnp.concatenate(f2, axis=-1)))
        u, i = drop(u), drop(i)

        # FM head on [u; i] (model.py:393-403)
        x = drop(jnp.concatenate([u, i], axis=-1))
        n = x.shape[-1]
        v = self.param("fm_V", xavier_uniform(), (n, self.factors))
        xv = x @ v
        x2v2 = (x * x) @ (v * v)
        inter = 0.5 * jnp.sum(xv * xv - x2v2, axis=-1)
        lin = nn.Dense(1, kernel_init=xavier_uniform(),
                       name="fm_lin")(x)[..., 0]
        out = inter + lin
        if not train:
            # predict_op clips to the rating scale (model.py:831-833)
            out = jnp.clip(out, 1.0, 5.0)
        return out.reshape(lead)
