"""NARRE: Neural Attentional Rating Regression with Review-level
Explanations (reference `pytorch_models/NARRE.py`).

Per-review TextCNN features attended with neighbor-id embeddings as
attention context (NARRE.py:53-64, 99-113), added to id embeddings, then
a hadamard-product MLP head plus biases (NARRE.py:115-124). The
per-review layout is [num_reviews=10, num_words=100]; review slot j of
the user aligns with neighbor-id slot j (both lists are emitted in the
same order by the data pipeline).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (MLPTower, ScorerMLP, TextCNN, doc_shape,
                     frozen_word_table, xavier_uniform)


class NARRE(nn.Module):
    num_user_rows: int
    num_item_rows: int
    latent_size: int
    word_vectors: jnp.ndarray
    dropout: float = 0.6
    use_pallas: bool = False       # fused conv+relu+maxpool kernel
    pallas_interpret: bool = False
    fuse_gather: bool = True       # fold the word gather into the kernel
    compute_dtype: jnp.dtype = jnp.float32
    prepaired_t: int = 0           # cache stores paired operands (layers.py)
    seq_mesh: object = None        # time-sharded TextCNN (hp.seq_parallel)
    seq_axis: str = "model"
    seq_batch_axis: object = None

    def _attend(self, feats, ctx_emb, scorer, train, skip_row=None):
        # feats: [B, R, L]; ctx_emb: [B, R, L] neighbor-id embeddings.
        # skip_row ([B] int32, -1 = none): the entity-cache leakage
        # mask's rows>1 form (hp.cache_entity) — the pair's own review
        # row is ZEROED at the feature level (its content contributes
        # nothing; only softmax normalization mass remains), the mask
        # deviation documented at data/corpus.py::_entity_rows_docs.
        if skip_row is not None:
            r_iota = jnp.arange(feats.shape[1])[None, :, None]
            hit = r_iota == skip_row[:, None, None]
            feats = jnp.where(hit, 0.0, feats)
            ctx_emb = jnp.where(hit, 0.0, ctx_emb)
        scores = scorer(jnp.concatenate([feats, ctx_emb], axis=-1),
                        train=train)               # [B, R]
        att = jax.nn.softmax(scores, axis=-1)
        return jnp.sum(att[..., None] * feats, axis=1)  # [B, L]

    @nn.compact
    def __call__(self, batch, train: bool = False):
        # candidate grids: user-side tensors at lead [B, 1] (identical
        # across candidates), item side [B, C]; user-side encoding +
        # attention run once per row, broadcast after
        lead = batch["item"].shape
        # docs: int ids [..., R, W] or pre-embedded float [..., R, W, E]
        # (hp.cache_doc_embeds)
        u_lead, u_tail = doc_shape(batch["user_doc"], 2)
        _, i_tail = doc_shape(batch["item_doc"], 2)
        r, w = u_tail[0], u_tail[1]
        udoc = batch["user_doc"].reshape((-1,) + u_tail)
        idoc = batch["item_doc"].reshape((-1,) + i_tail)
        ub_rows = udoc.shape[0]
        b = idoc.shape[0]
        user_id = batch["user"].reshape(-1)
        item_id = batch["item"].reshape(-1)
        who_gave = batch["users_who_gave"].reshape(b, -1)[:, :r]
        reviewed = batch["items_reviewed"].reshape(ub_rows, -1)[:, :r]

        ue = self.param("user_embedding", xavier_uniform(),
                        (self.num_user_rows, self.latent_size))
        ie = self.param("item_embedding", xavier_uniform(),
                        (self.num_item_rows, self.latent_size))

        # Per-review encoding: fold reviews into the batch axis
        # (NARRE.py:99-104), one TextCNN per side.
        cnn = dict(use_pallas=self.use_pallas,
                   pallas_interpret=self.pallas_interpret,
                   fuse_gather=self.fuse_gather,
                   compute_dtype=self.compute_dtype,
                   prepaired_t=self.prepaired_t,
                   seq_mesh=self.seq_mesh, seq_axis=self.seq_axis,
                   seq_batch_axis=self.seq_batch_axis)
        wv = frozen_word_table(self, self.word_vectors)
        uf = TextCNN(self.latent_size, self.dropout, name="user_conv",
                     **cnn)(udoc.reshape((ub_rows * r,) + u_tail[1:]),
                            train=train, table=wv).reshape(ub_rows, r, -1)
        itf = TextCNN(self.latent_size, self.dropout, name="item_conv",
                      **cnn)(idoc.reshape((b * r,) + i_tail[1:]),
                             train=train, table=wv).reshape(b, r, -1)

        # Review-level attention with neighbor ids as context
        # (NARRE.py:110-113): the user's reviews attend over the items
        # they were written about, and vice versa.
        u_skip = batch.get("user_skip")
        i_skip = batch.get("item_skip")
        u_att = self._attend(
            uf, jnp.take(ie, reviewed, axis=0),
            ScorerMLP(self.latent_size, self.dropout, name="att_user"),
            train, skip_row=u_skip)
        i_att = self._attend(
            itf, jnp.take(ue, who_gave, axis=0),
            ScorerMLP(self.latent_size, self.dropout, name="att_item"),
            train, skip_row=i_skip)

        if u_lead != lead:
            u_att = jnp.broadcast_to(
                u_att.reshape(u_lead + u_att.shape[-1:]),
                lead + u_att.shape[-1:]).reshape(-1, u_att.shape[-1])

        drop = nn.Dropout(self.dropout, deterministic=not train)
        u = u_att + drop(jnp.take(ue, user_id, axis=0))
        i = i_att + drop(jnp.take(ie, item_id, axis=0))

        rating = MLPTower((self.latent_size, 1), dropout=self.dropout,
                          name="final")(u * i, train=train)[..., 0]

        ub = self.param("user_bias", nn.initializers.constant(0.1),
                        (self.num_user_rows,))
        ib = self.param("item_bias", nn.initializers.constant(0.1),
                        (self.num_item_rows,))
        gb = self.param("global_bias", nn.initializers.constant(4.0), (1,))
        out = (rating + jnp.take(ub, user_id, axis=0)
               + jnp.take(ib, item_id, axis=0) + gb[0])
        return out.reshape(lead)
