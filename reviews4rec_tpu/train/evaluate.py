"""Evaluation: rating MSE (+ cold-start count maps) and negative-set
ranking (HR@k / NDCG@k).

Protocol parity with the reference:
- MSE is computed per-example then averaged over the whole split
  (`eval.py:36-57`).
- count-vs-MSE maps bucket each test example's squared error by its
  user's / item's train-set frequency (`eval.py:42-53`, research output
  documented at `main.py:417-429`).
- Ranking uses the stored negative sets: per user, 1 positive (column 0)
  + 5 sampled test negatives; HR@1 = argmax lands on column 0
  (`eval.py:64-91`). We additionally report HR@k and NDCG@k for any k as
  batched on-device sorts (superset of the reference's k=1).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HyperParams
from ..data.batcher import Batcher


def make_apply_fn(model) -> Callable:
    """Uniform functional interface over a flax module."""

    def apply_fn(params, batch, train: bool, rng):
        if train:
            d, g = jax.random.split(rng)
            rngs = {"dropout": d, "gumbel": g}
        else:
            rngs = {}
        return model.apply({"params": params}, batch, train=train, rngs=rngs)

    return apply_fn


def _replicated_out(mesh):
    """Under `jax.distributed` the per-example eval outputs must be
    fetchable by every process: force replicated output sharding (one
    all-gather per batch over the data axis, eval-only). Single-process
    runs keep GSPMD's choice."""
    if mesh is None or jax.process_count() == 1:
        return {}
    from jax.sharding import NamedSharding, PartitionSpec as P
    return {"out_shardings": NamedSharding(mesh, P())}


def make_eval_step(apply_fn: Callable, model_type: str, mesh=None):
    """Jitted per-batch scorer returning per-example squared errors (and
    transnet auxiliary metrics)."""

    @partial(jax.jit, **_replicated_out(mesh))
    def eval_step(params, batch):
        preds = apply_fn(params, batch, False, jax.random.PRNGKey(0))
        y = batch["rating"]
        if model_type in ("transnet", "transnet++"):
            source, target, trans_loss = preds
            return {
                "sq": (source - y) ** 2,
                "pred": source,
                "sq_right": (target - y) ** 2,
                "trans": trans_loss,
            }
        return {"sq": (preds - y) ** 2, "pred": preds}

    return eval_step


def _count_mse_maps(counts: np.ndarray, sq: np.ndarray
                    ) -> Dict[int, list]:
    """{train-frequency: [squared errors]} without a per-example Python
    loop (reference eval.py:42-53 builds the same dict per example):
    bincount-style segment sums keyed by the count value, then one
    Python entry per *distinct* count (few dozen, not per-example)."""
    out: Dict[int, list] = {}
    if counts.size == 0:
        return out
    order = np.argsort(counts, kind="stable")
    counts_s = counts[order]
    sq_s = sq[order]
    uniq, starts = np.unique(counts_s, return_index=True)
    for j, c in enumerate(uniq):
        end = starts[j + 1] if j + 1 < len(uniq) else len(sq_s)
        out[int(c)] = sq_s[starts[j]:end].tolist()
    return out


def evaluate(eval_step, params, batcher: Batcher, hp: HyperParams,
             user_count: np.ndarray, item_count: np.ndarray,
             mesh=None) -> Tuple[Dict, Dict, Dict]:
    """Split MSE + per-train-frequency MSE maps (reference evaluate(),
    eval.py:11-62). With a mesh, batches are sharded over the data axis;
    under multi-host each process feeds its slice and the per-example
    outputs come back replicated (`_replicated_out`)."""
    from ..train.loop import make_placer

    place = make_placer(mesh)
    # Dispatch every batch without blocking, then fetch the whole
    # split's outputs in ONE device_get: a per-batch np.asarray would
    # sync the device every step and serialize dispatch (the same
    # pitfall train_epoch's on-device accumulators avoid). Per-example
    # errors are needed on host anyway for the count-MSE maps, so the
    # single bulk fetch costs nothing extra.
    outs, weights, users_l, items_l = [], [], [], []
    for batch in batcher:
        outs.append(eval_step(params, place(batch)))
        w = batch["weight"].astype(bool)
        weights.append(w)
        users_l.append(batch["user"][w])
        items_l.append(batch["item"][w])
    outs = jax.device_get(outs)          # one blocking fetch per split
    return _reduce_eval(outs, weights, users_l, items_l, user_count,
                        item_count)


def make_cached_eval_step(apply_fn: Callable, model_type: str, mesh=None):
    """Eval step over a device-resident record cache (hp.cache_doc_embeds,
    train/loop.py::build_doc_cache): the batch is gathered in-jit from
    cached rows, so per-epoch validation costs no host transfer and no
    per-word table gather. Under multi-host the per-example outputs are
    forced replicated (`_replicated_out`) so every process can fetch
    them."""

    @partial(jax.jit, **_replicated_out(mesh))
    def eval_step(params, cache, rows, weight):
        from .loop import gather_cached_batch
        # the Batcher's padding mask ("weight") matters: padded tail
        # rows gather row 0's records, and without the mask they would
        # enter the model's own weight-masked terms (transnet's
        # trans_loss) with weight 1, breaking the 'identical metrics'
        # contract with `evaluate`
        batch = gather_cached_batch(cache, rows, weight)
        preds = apply_fn(params, batch, False, jax.random.PRNGKey(0))
        y = batch["rating"]
        if model_type in ("transnet", "transnet++"):
            source, target, trans_loss = preds
            return {"sq": (source - y) ** 2, "pred": source,
                    "sq_right": (target - y) ** 2, "trans": trans_loss}
        return {"sq": (preds - y) ** 2, "pred": preds}

    return eval_step


def evaluate_cached(eval_step, params, cache, records, hp: HyperParams,
                    user_count: np.ndarray, item_count: np.ndarray,
                    mesh=None) -> Tuple[Dict, Dict, Dict]:
    """`evaluate` over the device cache: identical metrics/maps, with
    only [B] row indices crossing the host boundary per batch. `records`
    supplies the host-side user/item ids for the count-MSE maps. With a
    mesh, the row/weight batches shard over the data axis (the cache is
    row-sharded by parallel.mesh.shard_cache)."""
    from ..train.loop import make_placer

    place = make_placer(mesh)
    n = int(next(iter(records.values())).shape[0])
    rec_u = np.asarray(records["user"])
    rec_i = np.asarray(records["item"])
    outs, weights, users_l, items_l = [], [], [], []
    for batch in Batcher({"row": np.arange(n)}, hp.batch_size):
        placed = place({"row": batch["row"].astype(np.int32),
                        "weight": batch["weight"]})
        outs.append(eval_step(params, cache, placed["row"],
                              placed["weight"]))
        w = batch["weight"].astype(bool)
        weights.append(w)
        sel = batch["row"][w]
        users_l.append(rec_u[sel])
        items_l.append(rec_i[sel])
    outs = jax.device_get(outs)          # one blocking fetch per split
    return _reduce_eval(outs, weights, users_l, items_l, user_count,
                        item_count)


def _reduce_eval(outs, weights, users_l, items_l, user_count,
                 item_count) -> Tuple[Dict, Dict, Dict]:
    """Host-side reduction shared by `evaluate` / `evaluate_cached`."""
    total_sq, total_n = 0.0, 0.0
    right_sq, trans_sum, batches = 0.0, 0.0, 0.0
    all_sq = []
    for out, w in zip(outs, weights):
        sq = out["sq"][w]
        total_sq += float(sq.sum())
        total_n += float(w.sum())
        if "sq_right" in out:
            right_sq += float(out["sq_right"][w].mean())
            trans_sum += float(out["trans"])
            batches += 1.0
        all_sq.append(sq)

    sq = np.concatenate(all_sq) if all_sq else np.zeros(0)
    users = np.concatenate(users_l) if users_l else np.zeros(0, int)
    items = np.concatenate(items_l) if items_l else np.zeros(0, int)
    metrics = {"MSE": round(total_sq / max(total_n, 1.0), 4)}
    if batches:
        metrics["MSE_right"] = round(right_sq / batches, 4)
        metrics["MSE_transform"] = round(trans_sum / batches, 4)
    return (metrics, _count_mse_maps(user_count[users], sq),
            _count_mse_maps(item_count[items], sq))


def make_rank_step(apply_fn: Callable, model_type: str, mesh=None):
    @partial(jax.jit, **_replicated_out(mesh))
    def rank_step(params, batch):
        preds = apply_fn(params, batch, False, jax.random.PRNGKey(0))
        if model_type in ("transnet", "transnet++"):
            preds = preds[0]  # rank by the source net (eval.py:72)
        # preds: [B, C]; positive is column 0. Rank of the positive =
        # number of candidates scoring strictly higher (ties resolved in
        # favour of lower index, matching argmax semantics).
        pos = preds[:, :1]
        higher = jnp.sum((preds[:, 1:] > pos), axis=1)
        return higher  # [B] rank position of the positive (0-based)

    return rank_step


def assemble_entity_grid(batch: Dict, tables: Dict,
                         this_doc_words: int = 0) -> Dict:
    """In-jit doc assembly for an ID-ONLY [B, C] candidate grid from
    the canonical ENTITY doc tables (train/loop.py::
    build_entity_tables): user-side rows gather once per grid row
    ([B, 1, ...], the models' broadcast convention), item side per
    candidate; NARRE's neighbor lists come along; transnet's
    `this_doc` is zeros (`this_rev=-1` semantics of materialize_negs).
    Eval grids carry no removal, so canonical docs are exactly the
    per-example eval docs (tested). Shared by the entity rank step and
    serve.Recommender's entity mode."""
    b = dict(batch)
    u2 = b["user"]
    i2 = b["item"]
    if "user_doc" in tables:
        b["user_doc"] = jnp.take(tables["user_doc"], u2[:, 0],
                                 axis=0)[:, None]
    if "item_doc" in tables:
        b["item_doc"] = jnp.take(tables["item_doc"], i2, axis=0)
    if "items_reviewed" in tables:
        b["items_reviewed"] = jnp.take(tables["items_reviewed"],
                                       u2[:, 0], axis=0)[:, None]
        b["users_who_gave"] = jnp.take(tables["users_who_gave"],
                                       i2, axis=0)
    if this_doc_words:
        b["this_doc"] = jnp.zeros(i2.shape + (this_doc_words,),
                                  jnp.int32)
    return b


def make_entity_rank_step(apply_fn: Callable, model_type: str,
                          this_doc_words: int = 0, mesh=None):
    """Rank step over ID-ONLY candidate grids + entity doc tables: the
    [B, C] doc grids are assembled IN-JIT (`assemble_entity_grid`)
    instead of being materialized on host and shipped over the wire."""

    @partial(jax.jit, **_replicated_out(mesh))
    def rank_step(params, batch, tables):
        b = assemble_entity_grid(batch, tables, this_doc_words)
        preds = apply_fn(params, b, False, jax.random.PRNGKey(0))
        if model_type in ("transnet", "transnet++"):
            preds = preds[0]
        pos = preds[:, :1]
        return jnp.sum((preds[:, 1:] > pos), axis=1)

    return rank_step


def ranks_to_metrics(ranks: np.ndarray, ks) -> Dict[str, float]:
    """HR@k / NDCG@k from 0-based positive ranks (shared by the
    gradient, HFT and neighbor evaluators; NDCG emitted for k > 1)."""
    metrics: Dict[str, float] = {}
    total = max(len(ranks), 1)
    for k in ks:
        hr = float((ranks < k).sum()) / total
        metrics[f"HR@{k}"] = round(100.0 * hr, 2)
        if k > 1:
            ndcg = float(np.where(ranks < k, 1.0 / np.log2(ranks + 2),
                                  0.0).sum()) / total
            metrics[f"NDCG@{k}"] = round(100.0 * ndcg, 2)
    return metrics


def split_eval_ks(hp: HyperParams) -> Tuple[Tuple[int, ...],
                                            Tuple[int, ...]]:
    """(narrow_ks, wide_ks): with hp.eval_num_negs > 0, cutoffs above
    num_negs move to wide 1+eval_num_negs candidate sets — on the
    reference 1+5 layout HR@10 saturates at 100 by construction."""
    if hp.eval_num_negs <= 0:
        return tuple(hp.eval_ks), ()
    wide = tuple(k for k in hp.eval_ks if k > hp.num_negs)
    bad = [k for k in wide if hp.eval_num_negs < k]
    if bad:
        raise ValueError(
            f"eval_num_negs={hp.eval_num_negs} gives 1+{hp.eval_num_negs}"
            f"-candidate wide sets, on which HR@{bad[0]} saturates at 100 "
            f"by construction — the degeneracy wide sets exist to fix; "
            f"set eval_num_negs >= {max(bad)}")
    return tuple(k for k in hp.eval_ks if k <= hp.num_negs), wide


def eval_ranking(rank_step, params, neg_records, hp: HyperParams,
                 batch_size: int = 0, mesh=None,
                 entity_tables=None) -> Dict:
    """HR@k / NDCG@k over per-user candidate sets (reference
    eval_ranking(), eval.py:64-91: k=1, hit iff argmax is the
    positive). With `entity_tables` the records are ID-ONLY grids and
    `rank_step` must be `make_entity_rank_step`'s (docs gathered
    in-jit from the tables)."""
    from ..train.loop import make_placer

    place = make_placer(mesh)
    bs = batch_size or hp.batch_size
    batcher = Batcher(neg_records, bs)
    ranks_d, weights = [], []
    for batch in batcher:
        if entity_tables is not None:
            ranks_d.append(rank_step(params, place(batch),
                                     entity_tables))
        else:
            ranks_d.append(rank_step(params, place(batch)))
        weights.append(batch["weight"].astype(bool))
    ranks_d = jax.device_get(ranks_d)    # one blocking fetch per split
    ranks = [r[w] for r, w in zip(ranks_d, weights)]
    ranks = np.concatenate(ranks) if ranks else np.zeros(0, np.int64)
    return ranks_to_metrics(ranks, hp.eval_ks)
