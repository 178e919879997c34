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
    `params`/`model` default to the best-validation checkpoint."""
    _gradient_only(hp, "predict")
    hp = dataset.apply_to(hp)
    if model is None or params is None:
        model, params = restore_model(hp, dataset)
    eval_step = make_eval_step(make_apply_fn(model), hp.model_type)
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


def _candidate_records(dataset: ReviewDataset, hp: HyperParams,
                       users: np.ndarray, items: np.ndarray
                       ) -> Dict[str, np.ndarray]:
    """[U, C] scoring-grid records for users x candidate items — the
    same layout the rank evaluator consumes (materialize_negs), with no
    leakage removal (unseen pairs have no shared review to drop)."""
    u, c = len(users), len(items)
    user = np.repeat(users, c).reshape(u, c).astype(np.int32)
    item = np.broadcast_to(np.asarray(items, np.int32)[None],
                           (u, c)).copy()
    recs = {"user": user, "item": item,
            "rating": np.zeros((u, c), np.float32),
            "weight": np.ones(u, np.float32)}
    if hp.family == "review":
        neg1 = np.full(u * c, -1, np.int32)
        recs.update(dataset._grid_text_records(
            hp, users.astype(np.int32), item.reshape(-1), neg1, neg1,
            neg1, u, c))
    return recs


@partial(jax.jit, static_argnums=(4,))
def _merge_topk(top_s, top_i, scores, ids, k: int):
    """Running top-k merge: fold one item-chunk's [U, C] scores into the
    [U, k] accumulators on device."""
    cat_s = jnp.concatenate([top_s, scores], axis=1)
    cat_i = jnp.concatenate(
        [top_i, jnp.broadcast_to(ids[None], scores.shape)], axis=1)
    vals, idx = jax.lax.top_k(cat_s, k)
    return vals, jnp.take_along_axis(cat_i, idx, axis=1)


def recommend(hp: HyperParams, dataset: ReviewDataset,
              users: np.ndarray, k: int = 10,
              items: Optional[np.ndarray] = None,
              exclude_seen: bool = True, item_chunk: int = 512,
              params=None, model=None
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k item retrieval: returns (item ids [U, k], scores [U, k]),
    highest first, for each user — the serving operation the reference
    has no equivalent of. The catalog (or `items` candidate list) is
    scored in `item_chunk`-wide grid batches with a jitted running
    top-k merge, so peak memory is one [U, item_chunk] chunk regardless
    of catalog size. `exclude_seen` masks each user's train-set items."""
    _gradient_only(hp, "recommend")
    hp = dataset.apply_to(hp)
    if model is None or params is None:
        model, params = restore_model(hp, dataset)
    users = np.asarray(users, np.int32)
    if items is None:
        items = np.arange(dataset.num_items, dtype=np.int32)
    items = np.asarray(items, np.int32)
    k = min(k, len(items))
    apply_fn = make_apply_fn(model)

    @jax.jit
    def score_step(params, batch):
        preds = apply_fn(params, batch, False, jax.random.PRNGKey(0))
        if hp.model_type in ("transnet", "transnet++"):
            preds = preds[0]             # rank by the source net
        return jnp.where(jnp.asarray(batch["mask"]), -jnp.inf, preds)

    seen = None
    if exclude_seen:
        tr = dataset.splits["train"]
        seen = [set() for _ in range(dataset.num_users)]
        for uu, ii in zip(tr.user, tr.item):
            seen[int(uu)].add(int(ii))

    neg_inf = jnp.full((len(users), k), -jnp.inf)
    top_s, top_i = neg_inf, jnp.full((len(users), k), -1, jnp.int32)
    for start in range(0, len(items), item_chunk):
        chunk = items[start:start + item_chunk]
        recs = _candidate_records(dataset, hp, users, chunk)
        mask = np.zeros((len(users), len(chunk)), bool)
        if seen is not None:
            for ui, uu in enumerate(users):
                mask[ui] = np.isin(chunk, list(seen[int(uu)]),
                                   assume_unique=False)
        recs["mask"] = mask
        placed = jax.tree_util.tree_map(jnp.asarray, recs)
        scores = score_step(params, placed)
        top_s, top_i = _merge_topk(top_s, top_i, scores,
                                   jnp.asarray(chunk), k)
    return np.asarray(top_i), np.asarray(top_s)
