"""TransNet / TransNet++ (reference `pytorch_models/TransNet.py`).

Source net: TextCNNs on the user/item review docs -> 2-layer transform
-> `source_ir` (TransNet.py:9-37). Target net: TextCNN on the held-out
(u, i) review -> `target_ir` -> FM (TransNet.py:39-61). Forward returns
[source_pred, target_pred, transform-L2 loss] (TransNet.py:114-122).
'++' adds 5-d id embeddings to the source FM input (TransNet.py:74-77,
107-110).

Training-dynamics parity: the reference steps three Adam optimizers on
disjoint parameter groups from three backward passes off one forward
(`main.py:35-53`, `utils.py:70-92`). Because all gradients are taken at
the same parameter point, each partition receives only its own loss's
gradient, and stale cross-gradients are zeroed next batch, the schedule
is equivalent to a single Adam step on a combined loss with
stop_gradient routing (derivation in train/loop.py):
  - target conv+FM       <- d MSE(target_pred)
  - source convs+project <- d ||source_ir - sg(target_ir)||^2
  - source FM (+ 5-d id embeddings in '++') <- d MSE(source_pred)
    with sg(source_ir) as the FM input.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FM, TextCNN, doc_shape, frozen_word_table, xavier_uniform


class TransNet(nn.Module):
    num_user_rows: int
    num_item_rows: int
    latent_size: int
    word_vectors: jnp.ndarray
    dropout: float = 0.6
    plus: bool = False
    id_embed_size: int = 5  # TransNet.py:75-76
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
        # candidate grids: user-side docs at lead [B, 1] (identical
        # across candidates), item side [B, C]; the source user tower
        # runs once per row and broadcasts
        lead = batch["item"].shape
        # docs: int ids [..., T] or pre-embedded float [..., T, E]
        # (hp.cache_doc_embeds)
        u_lead, u_tail = doc_shape(batch["user_doc"], 1)
        _, i_tail = doc_shape(batch["item_doc"], 1)
        _, t_tail = doc_shape(batch["this_doc"], 1)
        udoc = batch["user_doc"].reshape((-1,) + u_tail)
        idoc = batch["item_doc"].reshape((-1,) + i_tail)
        tdoc = batch["this_doc"].reshape((-1,) + t_tail)
        user_id = batch["user"].reshape(-1)
        item_id = batch["item"].reshape(-1)
        w = batch.get("weight")
        if w is None:
            w = jnp.ones(udoc.shape[0], jnp.float32)
        else:
            w = jnp.broadcast_to(w.reshape(w.shape + (1,) * (len(lead) - 1)),
                                 lead).reshape(-1)

        wv = frozen_word_table(self, self.word_vectors)
        drop = nn.Dropout(self.dropout, deterministic=not train)
        cnn = dict(use_pallas=self.use_pallas,
                   pallas_interpret=self.pallas_interpret,
                   fuse_gather=self.fuse_gather,
                   compute_dtype=self.compute_dtype,
                   prepaired_t=self.prepaired_t,
                   seq_mesh=self.seq_mesh, seq_axis=self.seq_axis,
                   seq_batch_axis=self.seq_batch_axis)

        # ---- source net ----
        # entity-cache leakage masks (hp.cache_entity): the pair's own
        # review span is zeroed inside the source towers; the target
        # tower reads this_doc (the held-out review itself) unmasked
        u_skip = batch.get("user_skip")
        i_skip = batch.get("item_skip")
        if u_skip is not None:
            u_skip = u_skip.reshape(-1, 2)
        if i_skip is not None:
            i_skip = i_skip.reshape(-1, 2)
        u = TextCNN(self.latent_size, self.dropout, **cnn,
                    name="source_user_conv")(udoc, train=train, table=wv,
                                             skip=u_skip)
        i = TextCNN(self.latent_size, self.dropout, **cnn,
                    name="source_item_conv")(idoc, train=train, table=wv,
                                             skip=i_skip)
        if u_lead != lead:
            u = jnp.broadcast_to(u.reshape(u_lead + u.shape[-1:]),
                                 lead + u.shape[-1:]) \
                .reshape(-1, u.shape[-1])
        cat = jnp.concatenate([u, i], axis=-1)
        ir = nn.Dense(self.latent_size, kernel_init=xavier_uniform(),
                      name="project_fc0")(cat)
        ir = jax.nn.relu(ir)
        ir = nn.Dense(self.latent_size, kernel_init=xavier_uniform(),
                      name="project_fc1")(ir)
        source_ir = drop(ir)

        # ---- target net ----
        t = TextCNN(self.latent_size, self.dropout, **cnn,
                    name="target_conv")(tdoc, train=train, table=wv)
        target_ir = drop(t)
        target_out = FM(8, name="target_fm")(target_ir)

        # ---- transform loss (masked mean of per-example L2) ----
        diff = source_ir - jax.lax.stop_gradient(target_ir)
        trans_loss = (jnp.sum(jnp.sum(diff * diff, axis=-1) * w)
                      / jnp.maximum(jnp.sum(w), 1.0))

        # ---- source prediction off sg(source_ir) ----
        fm_in = jax.lax.stop_gradient(source_ir)
        if self.plus:
            ue = self.param("user_embedding", xavier_uniform(),
                            (self.num_user_rows, self.id_embed_size))
            ie = self.param("item_embedding", xavier_uniform(),
                            (self.num_item_rows, self.id_embed_size))
            fm_in = jnp.concatenate(
                [drop(jnp.take(ue, user_id, axis=0)),
                 drop(jnp.take(ie, item_id, axis=0)), fm_in], axis=-1)
        source_out = FM(8, name="source_fm")(fm_in)

        return (source_out.reshape(lead), target_out.reshape(lead),
                trans_loss)
