"""Model registry: config -> flax module.

The reference dispatches on `model_type` strings across four back-ends
(`main.py:401-431`); here every gradient model is a flax module behind
one constructor. HFT and the neighborhood (surprise-equivalent) models
have their own fit() drivers (see hft.py / neighbors.py) because their
training procedures are not SGD-on-MSE.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import HyperParams
from .mf import MF, BiasOnly, GMF, MFDot, MLPModel, NeuMF, neumf_warm_start


TEXTCNN_MODELS = ("deepconn", "deepconn++", "NARRE", "transnet",
                  "transnet++")


def build_model(hp: HyperParams, word_vectors=None, mesh=None):
    common = dict(num_user_rows=hp.num_user_rows,
                  num_item_rows=hp.num_item_rows)
    mt = hp.model_type
    if hp.seq_parallel and mt not in TEXTCNN_MODELS:
        # fail loudly instead of silently running the default path
        raise ValueError(
            f"seq_parallel=True shards the TextCNN time axis and is only "
            f"supported for {TEXTCNN_MODELS}; {mt!r} has no such axis")
    if hp.seq_parallel and hp.use_pallas:
        import warnings
        warnings.warn(
            "seq_parallel and use_pallas are both set; the two paths "
            "partition the same conv differently, seq_parallel takes "
            "precedence and the Pallas kernel will NOT run",
            stacklevel=2)
    if mt == "bias_only":
        return BiasOnly(**common)
    if hp.embedding_lookup != "gspmd" and mt in ("MF_dot", "MF", "GMF",
                                                 "MLP", "NeuMF"):
        from ..parallel.embedding import make_lookup
        common["lookup"] = make_lookup(hp.embedding_lookup, mesh,
                                       hp.mesh_axes[1])
    if mt == "MF_dot":
        return MFDot(latent_size=hp.latent_size, dropout=hp.dropout, **common)
    if mt == "MF":
        return MF(latent_size=hp.latent_size, dropout=hp.dropout, **common)
    if mt == "GMF":
        return GMF(latent_size=hp.latent_size, dropout=hp.dropout, **common)
    if mt == "MLP":
        return MLPModel(latent_size=hp.latent_size, dropout=hp.dropout,
                        **common)
    if mt == "NeuMF":
        return NeuMF(latent_size=hp.latent_size, dropout=hp.dropout, **common)

    wv = None if word_vectors is None else jnp.asarray(word_vectors)
    if mt in TEXTCNN_MODELS:
        common.update(compute_dtype=jnp.dtype(hp.compute_dtype))
        if hp.seq_parallel:
            # time-sharded TextCNN (halo-exchange conv); needs a real
            # model axis to shard over
            seq_axis = hp.mesh_axes[1]
            if mesh is None or mesh.shape[seq_axis] < 2:
                raise ValueError(
                    "seq_parallel=True needs a mesh with model axis > 1 "
                    f"(mesh_shape={hp.mesh_shape})")
            data_axis = hp.mesh_axes[0]
            common.update(
                seq_mesh=mesh, seq_axis=seq_axis,
                seq_batch_axis=(data_axis if mesh.shape[data_axis] > 1
                                else None))
        elif hp.use_pallas:
            import jax
            # the fused TextCNN kernel runs natively on TPU; elsewhere
            # it runs through the Pallas interpreter (numerics-identical,
            # slow) so `use_pallas=True` configs stay testable on CPU
            common.update(use_pallas=True,
                          pallas_interpret=jax.default_backend() != "tpu",
                          fuse_gather=hp.pallas_fuse_gather)
            if hp.cache_doc_embeds:
                from ..train.loop import paired_window_for
                if paired_window_for(hp) is not None:
                    # the device cache stores paired kernel operands;
                    # the TextCNN needs the original doc length back
                    common["prepaired_t"] = (hp.narre_num_words
                                             if mt == "NARRE"
                                             else hp.input_length)
    if mt in ("deepconn", "deepconn++"):
        from .deepconn import DeepCoNN
        return DeepCoNN(latent_size=hp.latent_size, dropout=hp.dropout,
                        word_vectors=wv, use_fm=(mt == "deepconn"), **common)
    if mt == "NARRE":
        from .narre import NARRE
        return NARRE(latent_size=hp.latent_size, dropout=hp.dropout,
                     word_vectors=wv, **common)
    if mt in ("transnet", "transnet++"):
        from .transnet import TransNet
        return TransNet(latent_size=hp.latent_size, dropout=hp.dropout,
                        word_vectors=wv, plus=(mt == "transnet++"), **common)
    if mt == "MPCN":
        from .mpcn import MPCN
        return MPCN(hidden=hp.latent_size, dropout_keep=hp.mpcn_dropout_keep,
                    word_vectors=wv, num_heads=hp.mpcn_heads,
                    pretrained_words=hp.mpcn_pretrained,
                    temperature=hp.mpcn_temperature,
                    factors=hp.mpcn_factor,
                    rating_min=hp.rating_min, rating_max=hp.rating_max,
                    affinity=hp.mpcn_affinity, encoder=hp.mpcn_encoder,
                    head=hp.mpcn_head, joint=hp.mpcn_joint,
                    projection=hp.mpcn_projection, **common)
    raise ValueError(
        f"{mt!r} is not an SGD model; use hft.HFTTrainer or "
        f"neighbors.fit_predict for it")


__all__ = ["build_model", "neumf_warm_start", "BiasOnly", "MFDot", "MF",
           "GMF", "MLPModel", "NeuMF"]
