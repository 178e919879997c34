"""Embedding-dot model family: bias_only, MF_dot, MF, GMF, MLP, NeuMF.

Re-designs of the reference PyTorch modules (`pytorch_models/MF.py`,
`pytorch_models/NeuMF.py`) as pure flax functions. All share the
reference's score decomposition: user_bias + item_bias + global_bias +
interaction, with bias tables initialized to 0.1 and the global bias to
4.0 (MF.py:14-16). Ids may arrive with any leading shape (the ranking
evaluator feeds [B, 6] candidate grids, MF.py:44-46); scores keep that
shape.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FM, MLPTower, embed_lookup, xavier_uniform


def _bias_tables(mod: nn.Module, num_user_rows: int, num_item_rows: int):
    ub = mod.param("user_bias", nn.initializers.constant(0.1),
                   (num_user_rows,))
    ib = mod.param("item_bias", nn.initializers.constant(0.1),
                   (num_item_rows,))
    gb = mod.param("global_bias", nn.initializers.constant(4.0), (1,))
    return ub, ib, gb


class BiasOnly(nn.Module):
    """b_u + b_i + mu (reference MF.py:48-49)."""

    num_user_rows: int
    num_item_rows: int

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ub, ib, gb = _bias_tables(self, self.num_user_rows,
                                  self.num_item_rows)
        return (jnp.take(ub, batch["user"], axis=0)
                + jnp.take(ib, batch["item"], axis=0) + gb[0])


class MFDot(nn.Module):
    """Biases + dot(user_emb, item_emb) (reference MF.py:56-58)."""

    num_user_rows: int
    num_item_rows: int
    latent_size: int
    dropout: float = 0.6
    # embedding gather strategy (hp.embedding_lookup via
    # parallel.embedding.make_lookup); None = plain jnp.take (GSPMD)
    lookup: object = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ub, ib, gb = _bias_tables(self, self.num_user_rows,
                                  self.num_item_rows)
        ue = self.param("user_embedding", xavier_uniform(),
                        (self.num_user_rows, self.latent_size))
        ie = self.param("item_embedding", xavier_uniform(),
                        (self.num_item_rows, self.latent_size))
        drop = nn.Dropout(self.dropout, deterministic=not train)
        lk = self.lookup or embed_lookup
        u = drop(lk(ue, batch["user"]))
        i = drop(lk(ie, batch["item"]))
        dot = jnp.sum(u * i, axis=-1)
        return (jnp.take(ub, batch["user"], axis=0)
                + jnp.take(ib, batch["item"], axis=0) + gb[0] + dot)


class MF(nn.Module):
    """The reference's "MLP version" of MF (MF.py:60-68): hadamard
    product concatenated with an MLP projection of [u; i], scored by an
    FM head."""

    num_user_rows: int
    num_item_rows: int
    latent_size: int
    dropout: float = 0.6
    # embedding gather strategy (hp.embedding_lookup via
    # parallel.embedding.make_lookup); None = plain jnp.take (GSPMD)
    lookup: object = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ub, ib, gb = _bias_tables(self, self.num_user_rows,
                                  self.num_item_rows)
        ue = self.param("user_embedding", xavier_uniform(),
                        (self.num_user_rows, self.latent_size))
        ie = self.param("item_embedding", xavier_uniform(),
                        (self.num_item_rows, self.latent_size))
        drop = nn.Dropout(self.dropout, deterministic=not train)
        lk = self.lookup or embed_lookup
        u = drop(lk(ue, batch["user"]))
        i = drop(lk(ie, batch["item"]))

        mf_vec = u * i
        mlp_vec = MLPTower((self.latent_size, self.latent_size),
                           dropout=self.dropout, name="projection")(
            jnp.concatenate([u, i], axis=-1), train=train)
        rating = FM(self.latent_size, name="final")(
            jnp.concatenate([mlp_vec, mf_vec], axis=-1))
        return (jnp.take(ub, batch["user"], axis=0)
                + jnp.take(ib, batch["item"], axis=0) + gb[0] + rating)


class GMF(nn.Module):
    """Hadamard -> linear (reference NeuMF.py:9-35)."""

    num_user_rows: int
    num_item_rows: int
    latent_size: int
    dropout: float = 0.6
    # embedding gather strategy (hp.embedding_lookup via
    # parallel.embedding.make_lookup); None = plain jnp.take (GSPMD)
    lookup: object = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ub, ib, gb = _bias_tables(self, self.num_user_rows,
                                  self.num_item_rows)
        ue = self.param("user_embedding", xavier_uniform(),
                        (self.num_user_rows, self.latent_size))
        ie = self.param("item_embedding", xavier_uniform(),
                        (self.num_item_rows, self.latent_size))
        drop = nn.Dropout(self.dropout, deterministic=not train)
        lk = self.lookup or embed_lookup
        u = drop(lk(ue, batch["user"]))
        i = drop(lk(ie, batch["item"]))
        rating = nn.Dense(1, kernel_init=xavier_uniform(),
                          name="final")(u * i)[..., 0]
        return (jnp.take(ub, batch["user"], axis=0)
                + jnp.take(ib, batch["item"], axis=0) + gb[0] + rating)


class MLPModel(nn.Module):
    """concat -> 2-layer MLP -> linear (reference NeuMF.py:37-70)."""

    num_user_rows: int
    num_item_rows: int
    latent_size: int
    dropout: float = 0.6
    # embedding gather strategy (hp.embedding_lookup via
    # parallel.embedding.make_lookup); None = plain jnp.take (GSPMD)
    lookup: object = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ub, ib, gb = _bias_tables(self, self.num_user_rows,
                                  self.num_item_rows)
        ue = self.param("user_embedding", xavier_uniform(),
                        (self.num_user_rows, self.latent_size))
        ie = self.param("item_embedding", xavier_uniform(),
                        (self.num_item_rows, self.latent_size))
        drop = nn.Dropout(self.dropout, deterministic=not train)
        lk = self.lookup or embed_lookup
        u = drop(lk(ue, batch["user"]))
        i = drop(lk(ie, batch["item"]))
        joint = MLPTower((self.latent_size, self.latent_size),
                         dropout=self.dropout, name="project")(
            jnp.concatenate([u, i], axis=-1), train=train)
        rating = nn.Dense(1, kernel_init=xavier_uniform(),
                          name="final")(joint)[..., 0]
        return (jnp.take(ub, batch["user"], axis=0)
                + jnp.take(ib, batch["item"], axis=0) + gb[0] + rating)


class NeuMF(nn.Module):
    """Dual-embedding fusion of GMF and MLP towers
    (reference NeuMF.py:72-138)."""

    num_user_rows: int
    num_item_rows: int
    latent_size: int
    dropout: float = 0.6
    # embedding gather strategy (hp.embedding_lookup via
    # parallel.embedding.make_lookup); None = plain jnp.take (GSPMD)
    lookup: object = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ub, ib, gb = _bias_tables(self, self.num_user_rows,
                                  self.num_item_rows)
        gue = self.param("gmf_user_embedding", xavier_uniform(),
                         (self.num_user_rows, self.latent_size))
        gie = self.param("gmf_item_embedding", xavier_uniform(),
                         (self.num_item_rows, self.latent_size))
        mue = self.param("mlp_user_embedding", xavier_uniform(),
                         (self.num_user_rows, self.latent_size))
        mie = self.param("mlp_item_embedding", xavier_uniform(),
                         (self.num_item_rows, self.latent_size))
        drop = nn.Dropout(self.dropout, deterministic=not train)

        lk = self.lookup or embed_lookup
        gu = drop(lk(gue, batch["user"]))
        gi = drop(lk(gie, batch["item"]))
        gmf_joint = gu * gi

        mu = drop(lk(mue, batch["user"]))
        mi = drop(lk(mie, batch["item"]))
        mlp_joint = MLPTower((self.latent_size, self.latent_size),
                             dropout=self.dropout, name="project")(
            jnp.concatenate([mu, mi], axis=-1), train=train)

        final = jnp.concatenate([gmf_joint, mlp_joint], axis=-1)
        rating = nn.Dense(1, kernel_init=xavier_uniform(),
                          name="final")(final)[..., 0]
        return (jnp.take(ub, batch["user"], axis=0)
                + jnp.take(ib, batch["item"], axis=0) + gb[0] + rating)


def neumf_warm_start(neumf_params, gmf_params, mlp_params):
    """NeuMF 3-phase pretrain weight surgery (reference NeuMF.init,
    NeuMF.py:96-114): copy GMF/MLP embeddings and MLP projection, concat
    the two final-layer weights, and average the bias tables."""
    p = jax.tree_util.tree_map(lambda x: x, neumf_params)  # shallow copy
    p["gmf_user_embedding"] = gmf_params["user_embedding"]
    p["gmf_item_embedding"] = gmf_params["item_embedding"]
    p["mlp_user_embedding"] = mlp_params["user_embedding"]
    p["mlp_item_embedding"] = mlp_params["item_embedding"]
    p["project"] = jax.tree_util.tree_map(lambda x: x, mlp_params["project"])
    p["final"] = {
        "kernel": jnp.concatenate(
            [gmf_params["final"]["kernel"], mlp_params["final"]["kernel"]],
            axis=0),
        "bias": 0.5 * (gmf_params["final"]["bias"]
                       + mlp_params["final"]["bias"]),
    }
    p["user_bias"] = 0.5 * (gmf_params["user_bias"] + mlp_params["user_bias"])
    p["item_bias"] = 0.5 * (gmf_params["item_bias"] + mlp_params["item_bias"])
    return p
