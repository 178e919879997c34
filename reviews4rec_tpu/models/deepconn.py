"""DeepCoNN / DeepCoNN++ (reference `pytorch_models/DeepCoNN.py`).

Two TextCNN towers over the user's and item's concatenated review
documents (leakage-removed, frozen word2vec embeddings), joined by
either an FM head plus global bias ('deepconn', DeepCoNN.py:64-66) or
an MLP head plus per-entity biases ('deepconn++', DeepCoNN.py:69-72).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import FM, ScorerMLP, TextCNN, doc_shape, frozen_word_table


class DeepCoNN(nn.Module):
    num_user_rows: int
    num_item_rows: int
    latent_size: int
    word_vectors: jnp.ndarray  # [V, E] frozen (DeepCoNN.py:14-16)
    dropout: float = 0.6
    use_fm: bool = True  # True = 'deepconn', False = 'deepconn++'
    use_pallas: bool = False       # fused conv+relu+maxpool kernel
    pallas_interpret: bool = False
    fuse_gather: bool = True       # fold the word gather into the kernel
    compute_dtype: jnp.dtype = jnp.float32
    prepaired_t: int = 0           # cache stores paired operands (layers.py)
    seq_mesh: object = None        # time-sharded TextCNN (hp.seq_parallel)
    seq_axis: str = "model"
    seq_batch_axis: object = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        # candidate grids carry the user side at lead [B, 1] (identical
        # across candidates — corpus._grid_text_records) while item-side
        # tensors are [B, C]; the user tower runs once per row and its
        # features broadcast across candidates
        lead = batch["item"].shape
        # docs are int token ids [..., T], pre-embedded float
        # [..., T, E] from the device cache (hp.cache_doc_embeds), or —
        # under hp.pallas_fuse_rows — the WHOLE per-entity doc table
        # ('<side>__table' keys) read by entity id inside the kernels
        u_rows = i_rows = None
        if "user_doc__table" in batch:
            udoc = batch["user_doc__table"]
            u_rows = batch["user"].reshape(-1)
            u_lead = lead
        else:
            u_lead, u_tail = doc_shape(batch["user_doc"], 1)
            udoc = batch["user_doc"].reshape((-1,) + u_tail)
        if "item_doc__table" in batch:
            idoc = batch["item_doc__table"]
            i_rows = batch["item"].reshape(-1)
        else:
            _, i_tail = doc_shape(batch["item_doc"], 1)
            idoc = batch["item_doc"].reshape((-1,) + i_tail)

        cnn = dict(use_pallas=self.use_pallas,
                   pallas_interpret=self.pallas_interpret,
                   fuse_gather=self.fuse_gather,
                   compute_dtype=self.compute_dtype,
                   prepaired_t=self.prepaired_t,
                   seq_mesh=self.seq_mesh, seq_axis=self.seq_axis,
                   seq_batch_axis=self.seq_batch_axis)
        # entity-cache leakage masks ([B, 2] (start, len) spans of the
        # pair's own review inside the canonical docs — hp.cache_entity)
        u_skip = batch.get("user_skip")
        i_skip = batch.get("item_skip")
        if u_skip is not None:
            u_skip = u_skip.reshape(-1, 2)
        if i_skip is not None:
            i_skip = i_skip.reshape(-1, 2)
        wv = frozen_word_table(self, self.word_vectors)
        u = TextCNN(self.latent_size, self.dropout, name="user_conv",
                    **cnn)(udoc, train=train, table=wv, skip=u_skip,
                           rows=u_rows)
        i = TextCNN(self.latent_size, self.dropout, name="item_conv",
                    **cnn)(idoc, train=train, table=wv, skip=i_skip,
                           rows=i_rows)
        if u_lead != lead:
            u = jnp.broadcast_to(u.reshape(u_lead + u.shape[-1:]),
                                 lead + u.shape[-1:]) \
                .reshape(-1, u.shape[-1])
        cat = jnp.concatenate([u, i], axis=-1)

        gb = self.param("global_bias", nn.initializers.constant(4.0), (1,))
        if self.use_fm:
            rating = gb[0] + FM(8, name="fm")(cat)
            return rating.reshape(lead)

        ub = self.param("user_bias", nn.initializers.constant(0.1),
                        (self.num_user_rows,))
        ib = self.param("item_bias", nn.initializers.constant(0.1),
                        (self.num_item_rows,))
        rating = ScorerMLP(self.latent_size, self.dropout, name="final")(
            cat, train=train)
        rating = (rating
                  + jnp.take(ub, batch["user"].reshape(-1), axis=0)
                  + jnp.take(ib, batch["item"].reshape(-1), axis=0)
                  + gb[0])
        return rating.reshape(lead)
