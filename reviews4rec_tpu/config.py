"""Unified configuration for the whole framework.

The reference drives four separate back-ends from one mutable dict
(`/root/reference/hyper_params.py:50-80`); here a single frozen dataclass
covers every model family, with the same defaults, plus TPU-specific
sections (mesh axes, precision) the reference has no equivalent for.

The `common_path` scheme (artifact names embedding every hyper-parameter,
reference `hyper_params.py:3-48`) is reproduced by `run_tag()`.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

# Model family groupings (reference `hyper_params.py:68-73`).
ID_MODELS = ("bias_only", "MF", "MF_dot", "GMF", "MLP", "NeuMF")
NEIGHBOR_MODELS = ("SVD", "kNN", "NMF", "SVD++", "baseline")
REVIEW_MODELS = ("deepconn", "deepconn++", "NARRE", "transnet", "transnet++", "MPCN")
TOPIC_MODELS = ("HFT",)
ALL_MODELS = ID_MODELS + NEIGHBOR_MODELS + REVIEW_MODELS + TOPIC_MODELS


@dataclass(frozen=True)
class HyperParams:
    # ---- data ----
    dataset: str = "synthetic"
    k_core: int = 5
    percent_reviews_to_keep: int = 100
    data_root: str = "data"

    # ---- optimization (reference `hyper_params.py:56-63`) ----
    weight_decay: float = 1e-6
    lr: float = 0.002
    epochs: int = 2
    batch_size: int = 128
    shuffle_data_every_epoch: bool = False
    seed: int = 0

    # ---- model geometry (reference `hyper_params.py:65-80`) ----
    latent_size: int = 10
    word_embed_size: int = 64
    input_length: int = 1000
    dropout: float = 0.6
    model_type: str = "bias_only"

    # ---- data path ----
    # Out-of-core record store (the reference's chunked/memoised HDF5
    # fast loader, data_fast.py:24-119): materialized doc tensors are
    # written chunk-by-chunk to .npy files under data_dir()/records and
    # memory-mapped, so training never holds a full split's [N, 1000]
    # tensors in RAM; the OS page cache plays the memoiser role.
    out_of_core: bool = False
    materialize_chunk_rows: int = 8192

    # ---- training objective ----
    # RAW_MSE trains pointwise on ratings (the reviews4rec runner's
    # fixed objective). CE / BPR / HINGE train on sampled candidate
    # grids (1 train positive + num_negs sampled unrated items) with
    # the reference MPCN stack's ranking losses
    # (MPCN/tf_models/model.py:701-733; see train/losses.py); epoch
    # selection then uses validation HR@1 instead of MSE.
    loss: str = "RAW_MSE"       # RAW_MSE | CE | BPR | HINGE
    hinge_margin: float = 0.2   # MPCN/parser.py margin default

    # ---- training control ----
    # Early-stop patience in epochs without validation improvement
    # (reference MPCN `--early_stop`, MPCN/parser.py; select-test-by-dev
    # semantics of experiment.py:231-309 — test metrics are always
    # computed with the best-validation parameters). 0 disables.
    early_stop: int = 0
    # Persist the best-validation checkpoint at model_path() during
    # api.run (reference main.py:123-126 always saves best-val state).
    save_model: bool = True
    # Resume mid-training from an existing checkpoint at model_path()
    # (new capability; the reference cannot resume, SURVEY.md §5).
    resume: bool = False

    narre_num_reviews: int = 10
    narre_num_words: int = 100

    # ---- HFT (reference `hyper_params.py:75-77`, HFT/language.cpp:703-750) ----
    lamda: float = 0.1          # topic-model coupling weight
    latent_reg: float = 0.0     # L2 on latent factors
    hft_em_iters: int = 20
    hft_grad_iters: int = 20
    hft_vocab: int = 5000       # HFT/common.hpp:150-162 keeps top-5000 words

    # ---- MPCN (reference MPCN/parser.py defaults) ----
    mpcn_dmax: int = 20         # reviews per entity
    mpcn_smax: int = 30         # words per review
    mpcn_heads: int = 1
    mpcn_temperature: float = 0.5
    mpcn_factor: int = 10       # FM factors
    mpcn_l2: float = 1e-8
    mpcn_lr: float = 1e-3
    mpcn_clip_norm: float = 1.0
    mpcn_dropout_keep: float = 0.8
    # seed MPCN's trainable word table from the shared word2vec vectors
    # (reference --pretrained=1, MPCN/tylib/exp/experiment.py:154-177;
    # the reviews4rec runner default leaves it off)
    mpcn_pretrained: bool = False
    # variant space of the reference MPCN stack (runner defaults first;
    # MPCN/parser.py:122, tf_models/model.py:170-406)
    mpcn_affinity: str = "SOFT"   # SOFT | BILINEAR | TENSOR | MLP | MD
    mpcn_encoder: str = "NBOW"    # NBOW | CNN
    mpcn_head: str = "FM"         # FM | DOT | MLP | MF
    mpcn_joint: str = "MPCN"      # MPCN | D_ATT
    mpcn_projection: str = "FC"   # FC | HIGH (highway, the 'HP' variant)

    # ---- neighbor/surprise-equivalents (surprise library defaults) ----
    surprise_epochs: int = 20
    surprise_lr: float = 0.005
    surprise_reg: float = 0.02
    knn_k: int = 10
    nmf_epochs: int = 50
    rating_min: float = 1.0
    rating_max: float = 5.0

    # ---- eval ----
    num_negs: int = 5           # candidates = 1 pos + num_negs
    # HR@k / NDCG@k cutoffs (reference protocol is k=1 over 6
    # candidates, eval.py:64-91; k=10 is the BASELINE.md target).
    eval_ks: Tuple[int, ...] = (1, 10)
    # Wide eval candidate sets: > 0 additionally scores each stored
    # neg-set positive against this many items sampled OUTSIDE the
    # user's train/val/test interactions (the standard 1+99 protocol),
    # and the k>1 cutoffs in eval_ks are computed on those sets — with
    # the reference's 1+5 sets HR@10 saturates at 100 by construction.
    # HR@1 always stays on the reference 1+5 protocol
    # (make_negative_sets.py:42-68 — num_negs is a parameter there too).
    eval_num_negs: int = 0

    # ---- populated by data loading (reference data.py:468-470) ----
    total_users: int = 0
    total_items: int = 0
    total_words: int = 0

    # ---- TPU runtime (new; the reference is single-device) ----
    mesh_shape: Tuple[int, ...] = (1, 1)     # (data, model)
    mesh_axes: Tuple[str, ...] = ("data", "model")
    # Conv/matmul operand dtype for the review towers ("float32" or
    # "bfloat16"). On TPU, f32 matmuls already run as single-pass bf16
    # (XLA default precision), so bf16 here changes bandwidth, not MXU
    # numerics; the accumulator stays f32 either way.
    compute_dtype: str = "float32"
    use_pallas: bool = False                  # A/B switch for Pallas kernels
    # With use_pallas: fuse the word-embedding gather into the TextCNN
    # kernel's input (one gather emits the padded paired bf16 operand;
    # the backward regathers only the winning taps). Measured on v5e
    # this LOSES to the default path: the gather is row-bound (~4.5
    # ns/row — bf16 rows cost the same as f32+fused-cast), so the fusion
    # saves no time on the input side while its backward adds a
    # scattered [B, F, W]-row tap regather that the paired dG matmul
    # kernel beats. Kept as an A/B switch (bench.py measures both); the
    # default path instead drops the dead dx computation entirely
    # (textcnn_pool need_dx=False — the word table is frozen).
    pallas_fuse_gather: bool = False
    # Gather strategy for the row-sharded user/item embedding tables of
    # the MF family (parallel/embedding.py; SURVEY.md §2.8 row 3):
    #   "gspmd" — plain jnp.take, XLA partitions the gather (default)
    #   "psum"  — owner-computes shard_map kernel, one all-reduce of
    #             [batch, dim] over the model axis
    #   "a2a"   — ID-partitioned all-to-all exchange, 2·(batch/n)·dim
    #             per link; the win grows with the model-axis size
    # psum/a2a require mesh_shape[1] > 1. Review towers keep GSPMD for
    # their id/bias side lookups (tiny next to the text encoders).
    embedding_lookup: str = "gspmd"
    # Micro-batch scan (SURVEY.md §7.2): >1 groups that many consecutive
    # batches into one [S, B, ...] super-batch and runs the SGD updates
    # inside a single jitted `lax.scan` dispatch — identical numerics
    # and update order to per-step dispatch (tested bitwise), but one
    # host->device dispatch per S steps. This amortizes dispatch latency,
    # the dominant cost for sub-millisecond steps (the MF family) and
    # visible for every model on remote/tunneled TPUs. A trailing group
    # smaller than S runs through the per-step path (no zero-weight
    # padding batches: a padded batch would still apply weight decay).
    scan_steps: int = 1
    # Device-resident embedded-doc cache for review towers (except MPCN,
    # whose word embeddings are trained): the word table is FROZEN, so
    # each example's [T, E] doc embedding is static across the whole run.
    # True precomputes the split's doc tensors through the table ONCE
    # into device arrays and the train step gathers [B] whole-doc rows
    # by index — eliminating the per-step [B*T]-row word gather (row-
    # bound, ~40% of the flagship step) and the per-step host->device
    # batch transfer (the step's only host input becomes the [B] row
    # indices). Bitwise-identical to the uncached path (tested). Memory:
    # ~2 * N * T * E * dtype bytes of HBM — opt in where the split fits
    # (e.g. 100k x 1000 x 64 bf16 = 12.8 GB/side does NOT fit v5e;
    # 20k-example splits do). Composes with the mesh: the cache is
    # row-sharded over the data axis (parallel.mesh.shard_cache).
    cache_doc_embeds: bool = False
    # Which doc sides the cache PRE-EMBEDS
    # ("both" | "item" | "user" | "ids"): a split too large to cache
    # both [N, T, E] sides (see the budget above) can cache one side as
    # floats while the other stays raw int ids on device (the models
    # embed int docs through the frozen table in-jit, so the result is
    # bitwise-identical either way) — halving cache HBM for ~half the
    # gather saving. "item" also covers transnet's this_doc (the
    # held-out review is item-side data). "ids" caches EVERY side as
    # raw int32 ids (~4 bytes/word, ~0.6 GB for a 100k-interaction
    # corpus vs ~20 GB float): no per-step host transfer for any
    # review model at the cost of an in-jit word gather per step.
    cache_sides: str = "both"
    # Entity-level doc cache (with cache_doc_embeds, deepconn/deepconn++
    # only): store ONE canonical doc per user / per item instead of one
    # per EXAMPLE, so cache HBM scales with entities (~0.6 GB float for
    # a 100k-interaction corpus) instead of examples (~20 GB) — both
    # sides fit as floats at any realistic corpus size, and the train
    # step's host input stays [B] row indices. Train-time leakage
    # removal becomes an in-kernel MASK of the pair's own review span
    # (zeroed in place, pad-word semantics) — a documented deviation
    # from the reference's remove-and-shift (data.py:212-248): the
    # ~tail words the removal would pull into the truncation window
    # stay out. Eval splits remove nothing, so eval metrics are
    # IDENTICAL to every other path (tested).
    cache_entity: bool = False
    # With cache_entity + use_pallas: fold the per-batch doc-row gather
    # into the Pallas kernels' DMA (ops/textcnn_pallas.py
    # textcnn_pool_rows — scalar-prefetched row ids, per-row
    # double-buffered HBM->VMEM copies). The gathered [B, L2, 2E] HBM
    # copy the take()-path writes (and both kernels re-read) never
    # exists. Bitwise-identical (tested); A/B measured in bench.py.
    pallas_fuse_rows: bool = False
    # shard the review-doc time axis of every TextCNN over the model
    # axis (ppermute halo exchange, parallel/sequence.py) — the scaling
    # path for input_length beyond one chip's HBM; requires
    # mesh_shape[1] > 1 and input_length % mesh_shape[1] == 0
    seq_parallel: bool = False
    log_dir: str = "saved_logs"
    model_dir: str = "saved_models"

    # ------------------------------------------------------------------
    def replace(self, **kw) -> "HyperParams":
        return dataclasses.replace(self, **kw)

    @property
    def family(self) -> str:
        if self.model_type in ID_MODELS:
            return "id"
        if self.model_type in NEIGHBOR_MODELS:
            return "neighbor"
        if self.model_type in TOPIC_MODELS:
            return "topic"
        if self.model_type in REVIEW_MODELS:
            return "review"
        raise ValueError(f"unknown model_type {self.model_type!r}")

    @property
    def uses_reviews(self) -> bool:
        return self.family in ("review", "topic")

    @property
    def num_candidates(self) -> int:
        return 1 + self.num_negs

    # Sentinel ids used to pad the 10-slot neighbor lists
    # (reference data.py:274-279 pads with `total + 1`).
    @property
    def user_pad_id(self) -> int:
        return self.total_users + 1

    @property
    def item_pad_id(self) -> int:
        return self.total_items + 1

    # Embedding-table row counts. The reference uses +1 rows for id models
    # (`MF.py:14-15`) and +2 for review models (`DeepCoNN.py:28-29`) so the
    # sentinel id fits; we use +2 uniformly — one real-id range plus pad
    # row — then round up to `row_multiple` so tables divide evenly over
    # the model mesh axis (and align to TPU sublane tiles). Extra rows are
    # never indexed.
    row_multiple: int = 16

    @property
    def num_user_rows(self) -> int:
        return -(-(self.total_users + 2) // self.row_multiple) \
            * self.row_multiple

    @property
    def num_item_rows(self) -> int:
        return -(-(self.total_items + 2) // self.row_multiple) \
            * self.row_multiple

    @property
    def vocab_rows(self) -> int:
        return self.total_words + 1  # word id 0 is UNK/pad

    # ------------------------------------------------------------------
    def data_dir(self) -> str:
        """Per-dataset artifact directory (reference hyper_params.py:90-95)."""
        p = os.path.join(self.data_root, self.dataset, f"{self.k_core}_core")
        if self.percent_reviews_to_keep != 100:
            p = os.path.join(p, f"{self.percent_reviews_to_keep}_percent")
        return p

    def run_tag(self) -> str:
        """Config-derived artifact name (reference `get_common_path`,
        hyper_params.py:3-48): every hyper-parameter that affects the run is
        baked into log/checkpoint filenames."""
        parts = [
            self.model_type,
            self.dataset,
            f"{self.k_core}core",
            f"ls{self.latent_size}",
        ]
        if self.uses_reviews:
            parts += [f"we{self.word_embed_size}",
                      f"pct{self.percent_reviews_to_keep}"]
        if self.model_type == "NARRE":
            parts += [f"nr{self.narre_num_reviews}", f"nw{self.narre_num_words}"]
        if self.model_type == "HFT":
            parts += [f"lam{self.lamda}", f"lreg{self.latent_reg}"]
        parts += [f"wd{self.weight_decay}", f"lr{self.lr}",
                  f"do{self.dropout}", f"il{self.input_length}"]
        return "_".join(str(p) for p in parts)

    def log_file(self) -> str:
        return os.path.join(self.log_dir, self.run_tag() + ".log")

    def model_path(self) -> str:
        return os.path.join(self.model_dir, self.run_tag() + ".ckpt")
