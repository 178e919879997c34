"""Serving / inference API for trained gradient models.

The reference persists per-split predictions as text artifacts (HFT
`savePredictions`, `HFT/language.cpp:624-654` -> `HFT_{split}_results`;
MPCN `save_preds`, `MPCN/train.py:637-644`) but has no programmatic
scoring surface at all — every use beyond training requires re-parsing
those text files. Here inference is a first-class API over the shared
runtime:

- `predict()`: per-example predictions for any rating split, restored
  from the best-validation checkpoint `api.run` saved.
- `save_predictions()`: the reference's per-split artifact layout for
  every gradient model (superset of the HFT/MPCN-only artifacts).
- `recommend()`: top-k item retrieval per user — full-catalog (or
  candidate-list) scoring, chunked over items with an on-device running
  top-k merge so the full [users, catalog] score matrix never exists in
  HBM or host RAM.

HFT and the neighborhood models keep their own drivers (`models/hft.py`
writes richer artifacts; `models/neighbors.py::fit_predict` returns
per-split predictions directly).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import HyperParams
from .data.batcher import Batcher
from .data.corpus import ReviewDataset
from .train.evaluate import make_apply_fn, make_eval_step


def _gradient_only(hp: HyperParams, what: str) -> None:
    if hp.family == "topic":
        raise ValueError(
            f"{what} for HFT: use models/hft.py — run_hft/save_artifacts "
            f"already persist per-split predictions")
    if hp.family == "neighbor":
        raise ValueError(
            f"{what} for {hp.model_type}: use "
            f"models/neighbors.py::fit_predict, which returns per-split "
            f"predictions directly")


def restore_model(hp: HyperParams, dataset: ReviewDataset,
                  checkpoint_path: Optional[str] = None):
    """(model, best-validation params) from the checkpoint `api.run`
    saved at `hp.model_path()` (reference reloads the best state_dict
    the same way before test eval, `main.py:131-134`)."""
    from .models import build_model
    from .train.checkpoint import load_checkpoint, restore_like

    _gradient_only(hp, "restore_model")
    hp = dataset.apply_to(hp)
    path = checkpoint_path or hp.model_path()
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no checkpoint at {path}; train first (api.run with "
            f"hp.save_model=True, the default)")
    model = build_model(hp, dataset.word_vectors)
    sample = next(iter(Batcher(dataset.materialize(hp, "train"),
                               min(hp.batch_size, 8))))
    rng = jax.random.PRNGKey(0)
    template = model.init({"params": rng, "dropout": rng}, sample,
                          train=False)["params"]
    payload = load_checkpoint(path)
    params = restore_like(template,
                          payload["best_params"] or payload["params"])
    return model, params


def predict(hp: HyperParams, dataset: ReviewDataset, split: str = "test",
            params=None, model=None) -> np.ndarray:
    """Predicted ratings for every example of `split`, in split order.
    `params`/`model` default to the best-validation checkpoint.

    With hp.cache_doc_embeds + hp.cache_entity (supported review
    towers) the split scores DEVICE-RESIDENT through the entity doc
    tables — no host materialization of the split's doc tensors (the
    train split's would be ~20 GB at a 100k-interaction corpus).
    Val/test predictions are IDENTICAL to the host path (eval removes
    nothing — tested); train predictions use the entity mode's
    mask-leakage semantics (the pair's own review zeroed in place)
    where the host path remove-and-shifts — the same documented
    deviation as entity training."""
    _gradient_only(hp, "predict")
    hp = dataset.apply_to(hp)
    if model is None or params is None:
        model, params = restore_model(hp, dataset)
    apply_fn = make_apply_fn(model)

    from .train.loop import (EntityCache, build_entity_tables,
                             entity_supported)
    use_ent = (hp.cache_doc_embeds and hp.cache_entity
               and hp.family == "review" and entity_supported(hp)
               and jax.process_count() == 1)
    if use_ent:
        from .train.evaluate import make_cached_eval_step
        recs = dataset.materialize_entity(hp, split)
        cache = EntityCache(
            example={k: jnp.asarray(np.asarray(v))
                     for k, v in recs.items()},
            tables=build_entity_tables(hp, dataset))
        step = make_cached_eval_step(apply_fn, hp.model_type)
        n = len(recs["user"])
        outs, weights = [], []
        for batch in Batcher({"row": np.arange(n)}, hp.batch_size):
            outs.append(step(params, cache,
                             jnp.asarray(batch["row"].astype(np.int32)),
                             jnp.asarray(batch["weight"]))["pred"])
            weights.append(batch["weight"].astype(bool))
        outs = jax.device_get(outs)
        preds = [np.asarray(p)[w] for p, w in zip(outs, weights)]
        return (np.concatenate(preds) if preds
                else np.zeros(0, np.float32))

    eval_step = make_eval_step(apply_fn, hp.model_type)
    outs, weights = [], []
    for batch in Batcher(dataset.materialize(hp, split), hp.batch_size):
        placed = jax.tree_util.tree_map(jnp.asarray, batch)
        outs.append(eval_step(params, placed)["pred"])
        weights.append(batch["weight"].astype(bool))
    outs = jax.device_get(outs)          # one blocking fetch per split
    preds = [np.asarray(p)[w] for p, w in zip(outs, weights)]
    return np.concatenate(preds) if preds else np.zeros(0, np.float32)


def save_predictions(hp: HyperParams, dataset: ReviewDataset,
                     splits: Tuple[str, ...] = ("train", "test", "val"),
                     out_dir: Optional[str] = None
                     ) -> Dict[str, str]:
    """Write `<tag>_{split}_results` text artifacts — `prediction rating`
    per line in split order, the reference's prediction-artifact format
    (`HFT/language.cpp:643-651`, `MPCN/train.py:637-644`) — for any
    gradient model. Returns {split: path}."""
    hp = dataset.apply_to(hp)
    model, params = restore_model(hp, dataset)
    d = out_dir or hp.log_dir
    os.makedirs(d, exist_ok=True)
    paths = {}
    for split in splits:
        preds = predict(hp, dataset, split, params=params, model=model)
        ratings = dataset.splits[split].rating
        path = os.path.join(d, f"{hp.run_tag()}_{split}_results")
        with open(path, "w") as f:
            for p, r in zip(preds, ratings):
                f.write(f"{float(p):.6f} {float(r):.6f}\n")
        paths[split] = path
    return paths


@partial(jax.jit, static_argnums=(4,))
def _merge_topk(top_s, top_i, scores, ids, k: int):
    """Running top-k merge: fold one item-chunk's [U, C] scores into the
    [U, k] accumulators on device."""
    cat_s = jnp.concatenate([top_s, scores], axis=1)
    cat_i = jnp.concatenate(
        [top_i, jnp.broadcast_to(ids[None], scores.shape)], axis=1)
    vals, idx = jax.lax.top_k(cat_s, k)
    return vals, jnp.take_along_axis(cat_i, idx, axis=1)


class Recommender:
    """Reusable top-k retrieval engine for one trained model.

    Construct ONCE per (model, dataset); every `topk` call reuses the
    same jitted scorer, so repeated serving calls never recompile (the
    r3 `recommend()` defined its jit inside the call). Catalog chunks
    are PADDED to exactly `item_chunk` candidates, so the scorer sees
    one static shape regardless of catalog size — one compile per
    (users, item_chunk) geometry, tail chunks included.

    The grid records come from the public
    `ReviewDataset.candidate_grid_records`; `exclude_seen` masking uses
    the vectorized `ReviewDataset.train_pair_mask` (no per-user Python
    sets).

    `entity=True` (review models): candidate grids are ID-ONLY and the
    doc tensors are gathered IN-JIT from the canonical entity doc
    tables (train/loop.py::build_entity_tables) — no host doc-grid
    materialization or transfer per call. Scores are identical (no
    leakage removal at serving time, so canonical docs ARE the grid
    docs — tested). This is the fast grid path for models without an
    exact two-tower factorization (MPCN)."""

    def __init__(self, hp: HyperParams, dataset: ReviewDataset,
                 params=None, model=None, item_chunk: int = 512,
                 entity: bool = False):
        _gradient_only(hp, "Recommender")
        hp = dataset.apply_to(hp)
        if model is None or params is None:
            model, params = restore_model(hp, dataset)
        self.hp = hp
        self.dataset = dataset
        self.model = model
        self.params = params
        self.item_chunk = int(item_chunk)
        apply_fn = make_apply_fn(model)
        model_type = hp.model_type
        self._entity_tables = None
        if entity:
            if hp.family != "review":
                raise ValueError(
                    "entity=True gathers review docs from entity "
                    f"tables; {hp.model_type!r} has none")
            from .train.loop import build_entity_tables
            self._entity_tables = build_entity_tables(hp, dataset)
        tdw = (hp.input_length
               if model_type in ("transnet", "transnet++") else 0)

        @jax.jit
        def score_step(params, batch, tables=None):
            if tables is not None:
                from .train.evaluate import assemble_entity_grid
                batch = assemble_entity_grid(batch, tables, tdw)
            preds = apply_fn(params, batch, False, jax.random.PRNGKey(0))
            if model_type in ("transnet", "transnet++"):
                preds = preds[0]         # rank by the source net
            return jnp.where(batch.pop("mask"), -jnp.inf, preds)

        self._score_step = score_step

    def topk(self, users: np.ndarray, k: int = 10,
             items: Optional[np.ndarray] = None,
             exclude_seen: bool = True
             ) -> Tuple[np.ndarray, np.ndarray]:
        """(item ids [U, k], scores [U, k]), highest first, per user.
        The catalog (or `items` candidate list) is scored in
        `item_chunk`-wide grid batches with a jitted running top-k
        merge, so peak memory is one [U, item_chunk] chunk regardless
        of catalog size."""
        hp, dataset = self.hp, self.dataset
        users = np.asarray(users, np.int32)
        if items is None:
            items = np.arange(dataset.num_items, dtype=np.int32)
        items = np.asarray(items, np.int32)
        k = min(k, len(items))
        cw = self.item_chunk

        top_s = jnp.full((len(users), k), -jnp.inf)
        top_i = jnp.full((len(users), k), -1, jnp.int32)
        for start in range(0, len(items), cw):
            chunk = items[start:start + cw]
            pad = cw - len(chunk)
            if pad:  # static shape: tail chunk padded + masked out
                chunk = np.concatenate(
                    [chunk, np.zeros(pad, np.int32)])
            recs = dataset.candidate_grid_records(
                hp, users, chunk,
                include_text=False if self._entity_tables is not None
                else None)
            mask = (dataset.train_pair_mask(users[:, None], chunk[None])
                    if exclude_seen
                    else np.zeros((len(users), cw), bool))
            if pad:
                mask[:, len(chunk) - pad:] = True
            recs["mask"] = mask
            placed = jax.tree_util.tree_map(jnp.asarray, recs)
            if self._entity_tables is not None:
                scores = self._score_step(self.params, placed,
                                          self._entity_tables)
            else:
                scores = self._score_step(self.params, placed)
            top_s, top_i = _merge_topk(top_s, top_i, scores,
                                       jnp.asarray(chunk), k)
        return np.asarray(top_i), np.asarray(top_s)

    def compiled_variants(self) -> int:
        """Number of compiled scorer specializations (1 after any number
        of same-geometry calls — tested)."""
        return self._score_step._cache_size()


def recommend(hp: HyperParams, dataset: ReviewDataset,
              users: np.ndarray, k: int = 10,
              items: Optional[np.ndarray] = None,
              exclude_seen: bool = True, item_chunk: int = 512,
              params=None, model=None
              ) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot convenience wrapper over `Recommender` (which is the
    serving API — hold one instance to amortize compilation across
    calls)."""
    rec = Recommender(hp, dataset, params=params, model=model,
                      item_chunk=item_chunk)
    return rec.topk(users, k=k, items=items, exclude_seen=exclude_seen)


class FactorizedRecommender:
    """Two-tower serving index for models whose head factorizes exactly
    into per-user and per-item terms: full-catalog scoring becomes one
    [U, C] matmul on the MXU instead of U x C joint forward passes.

    Supported models:
    - bias_only / MF_dot: score = us(u) + is(i) (+ u.i) trivially
    - deepconn (FM head): Rendle's FM over cat(u_feat, i_feat) splits as
        0.5*sum[(au+bi)^2 - cu - di] = su + si + au.bi
      with au = u V_u, bi = i V_i, cu = u^2 V_u^2, di = i^2 V_i^2,
      su/si their per-side halves — ALGEBRAICALLY identical to the
      pairwise FM (floating-point reassociation only; verified vs the
      grid Recommender at 1e-4).
    - deepconn++ (MLP head + id biases): the TOWERS are per-side, so
      item features [C, L] are precomputed at index build and only the
      tiny pairwise ScorerMLP head runs per query over the broadcast
      [U, C, 2L] features (~100 MFLOP at catalog 10k) — exact, since
      the head consumes nothing but tower outputs and id biases.
    - NARRE: the per-review encoders AND the review-level attention are
      per-side (each side attends over its OWN reviews with its OWN
      neighbor ids — models/narre.py:86-105), so u = u_att + ue[u] and
      i = i_att + ie[i] precompute per entity; per pair only the
      hadamard MLP head relu((u*i)W0 + b0).w1 runs — exact.
    - transnet / transnet++: the serving score is the SOURCE net
      (models/transnet.py:82-120, the rank-by-source convention of
      eval.py:72) whose transform splits per side exactly like
      deepconn++'s head: relu(cat(u, i) @ W0 + b0) =
      relu(u @ W0[:L] + i @ W0[L:] + b0), so each side's half
      precomputes and per pair only relu(add) @ W1 + the tiny FM runs
      ('++' appends the 5-d id embeddings to the FM input) — exact.

    Only MPCN remains grid-bound: its word-level co-attention is
    intrinsically pairwise.

    The catalog's item tower runs ONCE at construction (`item_chunk`
    docs at a time); `topk` then encodes only the query users and
    scores the whole catalog with one matmul (or one feature-level MLP
    head) per score-chunk — the serving design the pairwise grid path
    cannot reach. Intrinsically pairwise models (MPCN's co-attention,
    transnet's joint transform over both docs) raise; use
    `Recommender`."""

    SUPPORTED = ("bias_only", "MF_dot", "deepconn", "deepconn++",
                 "NARRE", "transnet", "transnet++")

    def __init__(self, hp: HyperParams, dataset: ReviewDataset,
                 params=None, model=None, item_chunk: int = 1024,
                 items: Optional[np.ndarray] = None):
        _gradient_only(hp, "FactorizedRecommender")
        hp = dataset.apply_to(hp)
        if hp.model_type not in self.SUPPORTED:
            raise ValueError(
                f"{hp.model_type!r} has no exact two-tower "
                f"factorization (supported: {self.SUPPORTED}); use "
                f"Recommender")
        if model is None or params is None:
            model, params = restore_model(hp, dataset)
        self.hp = hp
        self.dataset = dataset
        self.params = params
        if items is None:
            items = np.arange(dataset.num_items, dtype=np.int32)
        self.items = np.asarray(items, np.int32)

        if hp.model_type == "NARRE":
            self._build_narre(hp, dataset, params, item_chunk)
        elif hp.model_type in ("transnet", "transnet++"):
            self._build_transnet(hp, dataset, params, item_chunk)
        elif hp.model_type in ("deepconn", "deepconn++"):
            self._build_deepconn(hp, dataset, params, item_chunk)
        else:
            self._build_mf(hp, params)
        if getattr(self, "_score_chunk", None) is None:
            self._score_chunk = jax.jit(
                lambda uv, us, iv, isc: us[:, None] + isc[None, :]
                + (uv @ iv.T if uv is not None else 0.0))

    # ---- index builders ------------------------------------------------
    def _build_mf(self, hp: HyperParams, params):
        ub = jnp.asarray(params["user_bias"])
        ib = jnp.asarray(params["item_bias"])
        gb = float(np.asarray(params["global_bias"])[0])
        ids = jnp.asarray(self.items)
        self.item_scal = jnp.take(ib, ids, axis=0) + gb
        if hp.model_type == "MF_dot":
            ie = jnp.asarray(params["item_embedding"])
            self.item_vec = jnp.take(ie, ids, axis=0)
            ue = jnp.asarray(params["user_embedding"])
            self._user_enc = lambda users: (
                jnp.take(ue, jnp.asarray(users), axis=0),
                jnp.take(ub, jnp.asarray(users), axis=0))
        else:
            self.item_vec = None
            self._user_enc = lambda users: (
                None, jnp.take(ub, jnp.asarray(users), axis=0))

    def _build_deepconn(self, hp: HyperParams, dataset, params,
                        item_chunk: int):
        from .models.layers import TextCNN

        L = hp.latent_size
        wv = jnp.asarray(params["word_vectors"])
        gb = float(np.asarray(params["global_bias"])[0])
        cnn = TextCNN(hp.latent_size, hp.dropout)
        plus = hp.model_type == "deepconn++"

        if plus:
            ub = jnp.asarray(params["user_bias"])
            ib = jnp.asarray(params["item_bias"])
            w0 = jnp.asarray(params["final"]["fc0"]["kernel"])  # [2L, H]
            b0 = jnp.asarray(params["final"]["fc0"]["bias"])
            w1 = jnp.asarray(params["final"]["fc1"]["kernel"])[:, 0]
            b1 = float(np.asarray(params["final"]["fc1"]["bias"])[0])

            # split the head's first Dense per side: cat @ W0 =
            # u_feat @ W0[:L] + i_feat @ W0[L:], so the stored index
            # carries the PRE-ACTIVATION item half [C, H] and the
            # per-pair work is relu(add) @ w1 — no [U, C, 2L] concat
            @jax.jit
            def item_enc(docs, ids):
                f = cnn.apply({"params": params["item_conv"]}, docs,
                              train=False, table=wv)
                return f @ w0[L:] + b0, jnp.take(ib, ids, axis=0) + gb

            @jax.jit
            def score_chunk(uv, us, iv, isc):
                hidden = jax.nn.relu(uv[:, None, :] + iv[None, :, :])
                return hidden @ w1 + b1 + us[:, None] + isc[None, :]

            self._score_chunk = score_chunk

            def finish_user(f, users):
                return f @ w0[:L], jnp.take(ub, jnp.asarray(users),
                                            axis=0)
        else:
            v = jnp.asarray(params["fm"]["V"])            # [2L, k]
            w = jnp.asarray(params["fm"]["lin"]["kernel"])[:, 0]
            b = float(np.asarray(params["fm"]["lin"]["bias"])[0])
            vu, vi = v[:L], v[L:]
            wu, wi = w[:L], w[L:]

            @jax.jit
            def item_enc(docs, ids):
                f = cnn.apply({"params": params["item_conv"]}, docs,
                              train=False, table=wv)
                bi = f @ vi
                si = 0.5 * jnp.sum(bi * bi - (f * f) @ (vi * vi),
                                   axis=-1)
                return bi, si + f @ wi + b + gb

            def finish_user(f, users):
                au = f @ vu
                su = 0.5 * jnp.sum(au * au - (f * f) @ (vu * vu),
                                   axis=-1)
                return au, su + f @ wu

        @jax.jit
        def user_tower(docs):
            return cnn.apply({"params": params["user_conv"]}, docs,
                             train=False, table=wv)

        vecs, scals = [], []
        for s in range(0, len(self.items), item_chunk):
            chunk = self.items[s:s + item_chunk]
            recs = dataset.candidate_grid_records(
                hp, np.zeros(1, np.int32), chunk)
            docs = jnp.asarray(recs["item_doc"][0])   # [C, T]
            bi, isc = item_enc(docs, jnp.asarray(chunk))
            vecs.append(bi)
            scals.append(isc)
        self.item_vec = jnp.concatenate(vecs)
        self.item_scal = jnp.concatenate(scals)

        def user_enc(users):
            recs = dataset.candidate_grid_records(
                hp, np.asarray(users, np.int32), np.zeros(1, np.int32))
            docs = jnp.asarray(recs["user_doc"][:, 0])  # [U, T]
            return finish_user(user_tower(docs), users)

        self._user_enc = user_enc

    def _build_narre(self, hp: HyperParams, dataset, params,
                     item_chunk: int):
        """NARRE two-tower index (VERDICT r4 #9): per-review encode +
        neighbor-context attention run per ENTITY at build/query time;
        the pairwise work is the hadamard MLP head only (cites
        models/narre.py:86-117 for the per-side structure)."""
        from .models.layers import ScorerMLP, TextCNN

        r = hp.narre_num_reviews
        wv = jnp.asarray(params["word_vectors"])
        ue = jnp.asarray(params["user_embedding"])
        ie = jnp.asarray(params["item_embedding"])
        ub = jnp.asarray(params["user_bias"])
        ib = jnp.asarray(params["item_bias"])
        gb = float(np.asarray(params["global_bias"])[0])
        w0 = jnp.asarray(params["final"]["fc0"]["kernel"])      # [L, L]
        b0 = jnp.asarray(params["final"]["fc0"]["bias"])
        w1 = jnp.asarray(params["final"]["fc1"]["kernel"])[:, 0]
        b1 = float(np.asarray(params["final"]["fc1"]["bias"])[0])
        cnn = TextCNN(hp.latent_size, hp.dropout)
        scorer = ScorerMLP(hp.latent_size, hp.dropout)

        def attend(feats, ctx, att_params):
            s = scorer.apply({"params": att_params},
                             jnp.concatenate([feats, ctx], axis=-1),
                             train=False)                        # [B, R]
            att = jax.nn.softmax(s, axis=-1)
            return jnp.sum(att[..., None] * feats, axis=1)

        @jax.jit
        def item_enc(docs, who_gave, ids):
            b, rr, wlen = docs.shape
            f = cnn.apply({"params": params["item_conv"]},
                          docs.reshape(b * rr, wlen), train=False,
                          table=wv).reshape(b, rr, -1)
            i_att = attend(f, jnp.take(ue, who_gave, axis=0),
                           params["att_item"])
            return (i_att + jnp.take(ie, ids, axis=0),
                    jnp.take(ib, ids, axis=0) + gb)

        @jax.jit
        def user_enc_dev(docs, reviewed, ids):
            b, rr, wlen = docs.shape
            f = cnn.apply({"params": params["user_conv"]},
                          docs.reshape(b * rr, wlen), train=False,
                          table=wv).reshape(b, rr, -1)
            u_att = attend(f, jnp.take(ie, reviewed, axis=0),
                           params["att_user"])
            return (u_att + jnp.take(ue, ids, axis=0),
                    jnp.take(ub, ids, axis=0))

        @jax.jit
        def score_chunk(uv, us, iv, isc):
            hidden = jax.nn.relu((uv[:, None, :] * iv[None, :, :]) @ w0
                                 + b0)
            return hidden @ w1 + b1 + us[:, None] + isc[None, :]

        self._score_chunk = score_chunk

        vecs, scals = [], []
        for s in range(0, len(self.items), item_chunk):
            chunk = self.items[s:s + item_chunk]
            recs = dataset.candidate_grid_records(
                hp, np.zeros(1, np.int32), chunk)
            docs = jnp.asarray(recs["item_doc"][0])        # [C, R, W]
            who = jnp.asarray(
                np.asarray(recs["users_who_gave"]).reshape(
                    len(chunk), -1)[:, :r])
            iv, isc = item_enc(docs, who, jnp.asarray(chunk))
            vecs.append(iv)
            scals.append(isc)
        self.item_vec = jnp.concatenate(vecs)
        self.item_scal = jnp.concatenate(scals)

        def user_enc(users):
            users = np.asarray(users, np.int32)
            recs = dataset.candidate_grid_records(
                hp, users, np.zeros(1, np.int32))
            docs = jnp.asarray(recs["user_doc"][:, 0])     # [U, R, W]
            reviewed = jnp.asarray(
                np.asarray(recs["items_reviewed"]).reshape(
                    len(users), -1)[:, :r])
            return user_enc_dev(docs, reviewed, jnp.asarray(users))

        self._user_enc = user_enc

    def _build_transnet(self, hp: HyperParams, dataset, params,
                        item_chunk: int):
        """Transnet two-tower index: the SOURCE net's transform splits
        per side (models/transnet.py:82-120); per pair only
        relu(u_half + i_half + b0) @ W1 and the FM head run. Eval-mode
        dropout is identity, so the served score equals the model's
        rank-by-source prediction exactly."""
        from .models.layers import TextCNN

        L = hp.latent_size
        plus = hp.model_type == "transnet++"
        wv = jnp.asarray(params["word_vectors"])
        w0 = jnp.asarray(params["project_fc0"]["kernel"])   # [2L, L]
        b0 = jnp.asarray(params["project_fc0"]["bias"])
        w1 = jnp.asarray(params["project_fc1"]["kernel"])   # [L, L]
        b1 = jnp.asarray(params["project_fc1"]["bias"])
        v = jnp.asarray(params["source_fm"]["V"])
        wl = jnp.asarray(params["source_fm"]["lin"]["kernel"])[:, 0]
        bl = float(np.asarray(params["source_fm"]["lin"]["bias"])[0])
        ue = (jnp.asarray(params["user_embedding"]) if plus else None)
        ie = (jnp.asarray(params["item_embedding"]) if plus else None)
        cnn = TextCNN(hp.latent_size, hp.dropout)

        @jax.jit
        def item_enc(docs, ids):
            f = cnn.apply({"params": params["source_item_conv"]}, docs,
                          train=False, table=wv)
            half = f @ w0[L:]
            if plus:
                half = jnp.concatenate(
                    [half, jnp.take(ie, ids, axis=0)], axis=-1)
            return half, jnp.zeros(ids.shape[0])

        @jax.jit
        def user_enc_dev(docs, ids):
            f = cnn.apply({"params": params["source_user_conv"]}, docs,
                          train=False, table=wv)
            half = f @ w0[:L]
            if plus:
                half = jnp.concatenate(
                    [half, jnp.take(ue, ids, axis=0)], axis=-1)
            return half, jnp.zeros(ids.shape[0])

        @jax.jit
        def score_chunk(uv, us, iv, isc):
            uh, uemb = uv[:, :L], uv[:, L:]
            ih, iemb = iv[:, :L], iv[:, L:]
            hidden = jax.nn.relu(uh[:, None, :] + ih[None, :, :] + b0)
            ir = hidden @ w1 + b1                      # [U, C, L]
            if plus:
                u_b = jnp.broadcast_to(uemb[:, None, :],
                                       (uemb.shape[0], iemb.shape[0],
                                        uemb.shape[1]))
                i_b = jnp.broadcast_to(iemb[None, :, :],
                                       (uemb.shape[0], iemb.shape[0],
                                        iemb.shape[1]))
                x = jnp.concatenate([u_b, i_b, ir], axis=-1)
            else:
                x = ir
            xv = x @ v
            x2v2 = (x * x) @ (v * v)
            inter = 0.5 * jnp.sum(xv * xv - x2v2, axis=-1)
            return (inter + x @ wl + bl
                    + us[:, None] + isc[None, :])

        self._score_chunk = score_chunk

        vecs, scals = [], []
        for s in range(0, len(self.items), item_chunk):
            chunk = self.items[s:s + item_chunk]
            recs = dataset.candidate_grid_records(
                hp, np.zeros(1, np.int32), chunk)
            docs = jnp.asarray(recs["item_doc"][0])        # [C, T]
            iv, isc = item_enc(docs, jnp.asarray(chunk))
            vecs.append(iv)
            scals.append(isc)
        self.item_vec = jnp.concatenate(vecs)
        self.item_scal = jnp.concatenate(scals)

        def user_enc(users):
            users = np.asarray(users, np.int32)
            recs = dataset.candidate_grid_records(
                hp, users, np.zeros(1, np.int32))
            docs = jnp.asarray(recs["user_doc"][:, 0])     # [U, T]
            return user_enc_dev(docs, jnp.asarray(users))

        self._user_enc = user_enc

    # ---- queries -------------------------------------------------------
    def topk(self, users: np.ndarray, k: int = 10,
             exclude_seen: bool = True, score_items: int = 16384
             ) -> Tuple[np.ndarray, np.ndarray]:
        """Scores the catalog in `score_items`-wide feature chunks with
        the on-device running top-k merge, so peak memory is one
        [U, score_items(, H)] block regardless of catalog size."""
        users = np.asarray(users, np.int32)
        k = min(k, len(self.items))
        uv, us = self._user_enc(users)
        top_s = jnp.full((len(users), k), -jnp.inf)
        top_i = jnp.full((len(users), k), -1, jnp.int32)
        for start in range(0, len(self.items), score_items):
            end = min(start + score_items, len(self.items))
            chunk_ids = self.items[start:end]
            iv = (self.item_vec[start:end]
                  if self.item_vec is not None else None)
            scores = self._score_chunk(uv, us, iv,
                                       self.item_scal[start:end])
            if exclude_seen:
                mask = self.dataset.train_pair_mask(users[:, None],
                                                    chunk_ids[None])
                scores = jnp.where(jnp.asarray(mask), -jnp.inf, scores)
            top_s, top_i = _merge_topk(top_s, top_i, scores,
                                       jnp.asarray(chunk_ids), k)
        return np.asarray(top_i), np.asarray(top_s)
