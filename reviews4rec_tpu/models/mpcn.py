"""MPCN: Multi-Pointer Co-Attention Networks (reference
`MPCN/tf_models/mpcn.py:31-178` + `tylib/lib/att_op.py:139-390`,
configuration 'RAW_MSE_MPCN_FN_FM' as driven by reviews4rec's runner
`run_MPCN_in_p2.sh`).

Pipeline per the reference defaults (MPCN/parser.py): reviews encoded as
sums of word embeddings (NBOW, model.py:344-347), a shared relu
projection (translate_proj, model.py:671-695), then per head:
 1. review-level co-attention: affinity over projected review reps,
    MAX-pooled per side, **hard Gumbel pointer** selecting one review
    each side (att_op.py:311-390, mpcn.py:71-81);
 2. the selected review's word embeddings recovered by the pointer-
    weighted sum over the review axis (mpcn.py:92-109);
 3. word-level co-attention: same affinity, MEAN-pooled, soft softmax
    weights, summed over words (mpcn.py:128-137).
Head outputs plus the summed review reps are merged by a shared FFN
('FN', mpcn.py:149-160) and scored by a rec head (model.py:361-406).

Beyond the runner-fixed configuration this module exposes the
reference's full variant space as static construction options:
- `affinity`: SOFT (default, parser.py:122) / BILINEAR / TENSOR /
  MLP / MD (att_op.py:247-297) for both co-attention stages;
- `encoder`: 'NBOW' (default) or 'CNN' review encoding
  (learn_single_repr, model.py:338-359);
- `head`: 'FM' (default) / 'DOT' / 'MLP' / 'MF' final scorer
  (_rec_output, model.py:361-406);
- `joint`: 'MPCN' (default) or 'D_ATT' — the dual-attention joint
  representation (model.py:170-336 dispatch; dual_attention
  att_op.py:392-441) over the flattened review document.

Deviation from the reference: TF samples Gumbel noise at eval time too
(the graph is shared); here eval uses the deterministic temperature->0
limit (hard argmax pointer, no noise), which is the noise-free mean of
the same estimator.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .att import (CoAttention, DualAttention, gumbel_softmax,  # noqa: F401
                  hard_argmax)
from .layers import Highway, xavier_uniform

HEADS = ("FM", "DOT", "MLP", "MF")
ENCODERS = ("NBOW", "CNN")
JOINTS = ("MPCN", "D_ATT")
PROJECTIONS = ("FC", "HIGH")


class MPCN(nn.Module):
    num_user_rows: int
    num_item_rows: int
    hidden: int                       # hdim == rnn_size == latent_size
    word_vectors: jnp.ndarray         # used for vocab size + init
    num_heads: int = 1
    temperature: float = 0.5
    factors: int = 10                 # FM factors (parser.py factor=10)
    dropout_keep: float = 0.8         # TF keep-prob (parser.py dropout=0.8)
    rating_min: float = 1.0           # predict_op clip (model.py:831-833)
    rating_max: float = 5.0
    affinity: str = "SOFT"
    encoder: str = "NBOW"
    head: str = "FM"
    joint: str = "MPCN"
    # initialize the trainable word table from the shared word2vec
    # vectors instead of xavier (the reference's --pretrained=1 path,
    # MPCN/tylib/exp/experiment.py:154-177; the runner leaves it off).
    # The table stays TRAINABLE either way, as in the reference.
    pretrained_words: bool = False
    # translate_proj mode: 'FC' (runner default) or 'HIGH' — review-level
    # highway projection, the reference's 'HP' rnn_type flag
    # (model.py:184-188 -> projection_layer use_mode='HIGH')
    projection: str = "FC"

    @nn.compact
    def __call__(self, batch, train: bool = False):
        if self.head not in HEADS:
            raise ValueError(f"head {self.head!r} not in {HEADS}")
        if self.encoder not in ENCODERS:
            raise ValueError(f"encoder {self.encoder!r} not in {ENCODERS}")
        if self.joint not in JOINTS:
            raise ValueError(f"joint {self.joint!r} not in {JOINTS}")
        if self.projection not in PROJECTIONS:
            raise ValueError(
                f"projection {self.projection!r} not in {PROJECTIONS}")
        lead = batch["item"].shape
        dmax, smax = batch["user_doc"].shape[-2:]
        udoc_in = batch["user_doc"]
        if udoc_in.shape[:-2] != lead:
            # candidate grids carry the user side at lead [B, 1]
            # (corpus._grid_text_records); co-attention couples each
            # candidate pair, so the user docs are broadcast up front
            udoc_in = jnp.broadcast_to(udoc_in, lead + (dmax, smax))
        udoc = udoc_in.reshape(-1, dmax, smax)
        idoc = batch["item_doc"].reshape(-1, dmax, smax)
        b = udoc.shape[0]
        rate = 1.0 - self.dropout_keep
        drop = nn.Dropout(rate, deterministic=not train)

        # Trainable word embeddings (MPCN trains its own table from
        # scratch; experiment.py loads pretrained vectors only when
        # --pretrained=1 — exposed here as `pretrained_words` /
        # hp.mpcn_pretrained, which seeds the table from the shared
        # word2vec vectors but keeps it trainable either way). With
        # pretrained off, the shared word2vec array only fixes
        # vocab/embedding size.
        vocab = self.word_vectors.shape[0]
        emb_size = self.word_vectors.shape[1]
        if self.pretrained_words:
            wv = self.word_vectors
            table = self.param("word_embedding",
                               lambda _rng: jnp.asarray(wv))
        else:
            table = self.param("word_embedding", xavier_uniform(),
                               (vocab, emb_size))

        if self.joint == "D_ATT":
            # dual local+global attention over the flat review document
            datt = DualAttention(self.hidden, dropout_rate=rate,
                                 name="dual_att")
            eu = jnp.take(table, udoc.reshape(b, dmax * smax), axis=0)
            ei = jnp.take(table, idoc.reshape(b, dmax * smax), axis=0)
            u, i = datt(eu, train=train), datt(ei, train=train)
            out = self._rec_output(u, i, drop)
            if not train:
                out = jnp.clip(out, self.rating_min, self.rating_max)
            return out.reshape(lead)

        if self.encoder == "CNN":
            # shared conv params: embed_reviews runs on both sides
            kern = self.param("cnn_kernel", xavier_uniform(),
                              (3 * emb_size, self.hidden))
            cbias = self.param("cnn_bias", nn.initializers.constant(0.1),
                               (self.hidden,))

        def embed_reviews(doc):
            e = jnp.take(table, doc.reshape(b * dmax, smax), axis=0)
            if self.encoder == "CNN":
                # conv window 3, relu, max-over-time per review
                # (learn_single_repr CNN branch, model.py:349-356)
                ep = jnp.pad(e, ((0, 0), (1, 1), (0, 0)))
                idx = jnp.arange(smax)[:, None] + jnp.arange(3)[None, :]
                win = ep[:, idx, :].reshape(b * dmax, smax, 3 * emb_size)
                reps = jnp.max(jax.nn.relu(win @ kern + cbias), axis=1)
            else:
                reps = jnp.sum(e, axis=1)          # NBOW (model.py:344-347)
            return (reps.reshape(b, dmax, -1),
                    e.reshape(b, dmax, smax * emb_size))

        q1, o1 = embed_reviews(udoc)   # [B, dmax, H|E], [B, dmax, smax*E]
        q2, o2 = embed_reviews(idoc)

        # translate_proj: shared projection -> hidden (model.py:671-695);
        # FC = relu Dense, HIGH = highway (the 'HP' variant)
        if self.projection == "HIGH":
            proj = Highway(self.hidden, name="trans_proj_hw")
            q1, q2 = proj(q1), proj(q2)
        else:
            proj = nn.Dense(self.hidden, kernel_init=xavier_uniform(),
                            name="trans_proj")
            q1 = jax.nn.relu(proj(q1))
            q2 = jax.nn.relu(proj(q2))

        f1 = []
        f2 = []
        for h in range(self.num_heads):
            # review-level pointer co-attention (mpcn.py:71-81)
            _, _, a1, a2, _ = CoAttention(
                att_type=self.affinity, pooling="MAX", gumbel=True,
                temperature=self.temperature, dropout_rate=rate,
                name=f"mpcn_{h}")(q1, q2, train=train)
            # pointer-select one review's words per side (mpcn.py:92-109)
            sel1 = jnp.sum(o1 * a1[..., None], axis=1) \
                .reshape(b, smax, emb_size)
            sel2 = jnp.sum(o2 * a2[..., None], axis=1) \
                .reshape(b, smax, emb_size)
            # word-level co-attention (mpcn.py:128-137)
            z1, z2, _, _, _ = CoAttention(
                att_type=self.affinity, pooling="MEAN", dropout_rate=rate,
                name=f"inner_{h}")(sel1, sel2, train=train)
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

        out = self._rec_output(u, i, drop)
        if not train:
            # predict_op clips to the rating scale (model.py:831-833)
            out = jnp.clip(out, self.rating_min, self.rating_max)
        return out.reshape(lead)

    def _rec_output(self, u, i, drop):
        """Final rec scorer (_rec_output, model.py:361-406)."""
        if self.head == "DOT":
            return jnp.sum(u * i, axis=-1)
        if self.head == "MF":
            h = self.param("mf_hidden", xavier_uniform(), (u.shape[-1], 1))
            return ((u * i) @ h)[..., 0]
        if self.head == "MLP":
            x = jnp.concatenate([u, i, u * i], axis=-1)
            for layer in range(2):
                x = jax.nn.relu(nn.Dense(self.hidden,
                                         kernel_init=xavier_uniform(),
                                         name=f"mlp{layer}")(drop(x)))
            return nn.Dense(1, kernel_init=xavier_uniform(),
                            name="mlp_out")(x)[..., 0]
        # FM head on [u; i] (model.py:393-403)
        x = drop(jnp.concatenate([u, i], axis=-1))
        n = x.shape[-1]
        v = self.param("fm_V", xavier_uniform(), (n, self.factors))
        xv = x @ v
        x2v2 = (x * x) @ (v * v)
        inter = 0.5 * jnp.sum(xv * xv - x2v2, axis=-1)
        lin = nn.Dense(1, kernel_init=xavier_uniform(),
                       name="fm_lin")(x)[..., 0]
        return inter + lin
