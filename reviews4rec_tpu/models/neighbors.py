"""Surprise-equivalent models: baseline, SVD, SVD++, NMF, kNN.

The reference wraps the scikit-surprise library (`surprise_models.py:8-21`)
with its default hyper-parameters:
  - baseline: BaselineOnly, SGD, 20 epochs (lr .005, reg .02)
  - SVD:      biased MF, SGD 20 epochs, lr_all .005, reg_all .02,
              init N(0, 0.1)
  - SVD++:    + implicit-feedback item factors |I_u|^-1/2 sum y_j,
              lr_all .007
  - NMF:      unbiased, 50 epochs, multiplicative updates,
              reg_pu = reg_qi = .06, init U(0, 1)
  - kNN:      KNNBasic user-based, k = 10, MSD similarity

Re-implemented from the published algorithm definitions (Koren 2008 for
SVD/SVD++; Luo et al. 2014 for the NMF update; Ricci et al. handbook for
user-kNN), not ported from surprise. Parity points kept: per-example SGD
in train insertion order, "unknown" entities (zero train ratings) fall
back to partial/global-mean predictions, and predictions clip to the
rating scale.

TPU mapping: the per-example SGD recurrence is inherently sequential, so
it runs as a `lax.scan` over the train stream inside jit (compiles to a
rolled device loop; the epoch axis is a second scan). kNN similarity is
three dense [U, I] matmuls (MXU) and prediction is a batched top-k.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HyperParams
from ..data.corpus import ReviewDataset


def _train_arrays(dataset: ReviewDataset):
    tr = dataset.splits["train"]
    return (jnp.asarray(tr.user), jnp.asarray(tr.item),
            jnp.asarray(tr.rating))


# ----------------------------------------------------------------------
# baseline / SVD / SVD++ : per-example SGD via lax.scan
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=("epochs", "variant", "factors",
                                  "num_users", "num_items"))
def _sgd_fit(users, items, ratings, num_users, num_items, mu, *,
             epochs: int, variant: str, factors: int, lr: float,
             reg: float, seed: int, rated_pad=None, rated_count=None):
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    state = {
        "bu": jnp.zeros(num_users),
        "bi": jnp.zeros(num_items),
    }
    if variant in ("SVD", "SVD++"):
        state["p"] = 0.1 * jax.random.normal(k1, (num_users, factors))
        state["q"] = 0.1 * jax.random.normal(k2, (num_items, factors))
    if variant == "SVD++":
        state["y"] = 0.1 * jax.random.normal(k3, (num_items, factors))

    def example_step(state, ex):
        u, i, r = ex
        u = u.astype(jnp.int32)
        i = i.astype(jnp.int32)
        est = mu + state["bu"][u] + state["bi"][i]
        if variant == "SVD":
            pu = state["p"][u]
            qi = state["q"][i]
            est = est + jnp.dot(pu, qi)
        elif variant == "SVD++":
            pu = state["p"][u]
            qi = state["q"][i]
            # implicit feedback: |I_u|^-1/2 sum_{j in I_u} y_j over the
            # user's train items (padded gather)
            items_u = rated_pad[u]                     # [maxI]
            mask = (jnp.arange(items_u.shape[0]) <
                    rated_count[u]).astype(jnp.float32)
            yj = state["y"][items_u] * mask[:, None]
            sqrt_iu = jax.lax.rsqrt(jnp.maximum(rated_count[u], 1.0))
            imp = jnp.sum(yj, axis=0) * sqrt_iu
            est = est + jnp.dot(qi, pu + imp)
        err = r - est
        new = dict(state)
        new["bu"] = state["bu"].at[u].add(lr * (err - reg * state["bu"][u]))
        new["bi"] = state["bi"].at[i].add(lr * (err - reg * state["bi"][i]))
        if variant == "SVD":
            new["p"] = state["p"].at[u].add(lr * (err * qi - reg * pu))
            new["q"] = state["q"].at[i].add(lr * (err * pu - reg * qi))
        elif variant == "SVD++":
            new["p"] = state["p"].at[u].add(lr * (err * qi - reg * pu))
            new["q"] = state["q"].at[i].add(
                lr * (err * (pu + imp) - reg * qi))
            upd = lr * (err * sqrt_iu * qi - reg * state["y"][items_u]) \
                * mask[:, None]
            new["y"] = state["y"].at[items_u].add(upd)
        return new, ()

    def epoch_step(state, _):
        state, _ = jax.lax.scan(example_step, state,
                                (users, items, ratings))
        return state, ()

    state, _ = jax.lax.scan(epoch_step, state, None, length=epochs)
    return state


# ----------------------------------------------------------------------
# NMF : multiplicative updates (per-epoch accumulators)
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=("epochs", "factors",
                                  "num_users", "num_items"))
def _nmf_fit(users, items, ratings, num_users, num_items, *,
             epochs: int, factors: int, reg_pu: float = 0.06,
             reg_qi: float = 0.06, seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(rng)
    p = jax.random.uniform(k1, (num_users, factors))
    q = jax.random.uniform(k2, (num_items, factors))
    n_u = jnp.zeros(num_users).at[users].add(1.0)
    n_i = jnp.zeros(num_items).at[items].add(1.0)

    def epoch(carry, _):
        p, q = carry
        est = jnp.sum(p[users] * q[items], axis=-1)
        # user_num[u] = sum_i q_i * r ; user_denom[u] = sum_i q_i * est
        user_num = jnp.zeros_like(p).at[users].add(
            q[items] * ratings[:, None])
        user_den = jnp.zeros_like(p).at[users].add(q[items] * est[:, None])
        item_num = jnp.zeros_like(q).at[items].add(
            p[users] * ratings[:, None])
        item_den = jnp.zeros_like(q).at[items].add(p[users] * est[:, None])
        p = p * user_num / (user_den + n_u[:, None] * reg_pu * p + 1e-12)
        q = q * item_num / (item_den + n_i[:, None] * reg_qi * q + 1e-12)
        return (p, q), ()

    (p, q), _ = jax.lax.scan(epoch, (p, q), None, length=epochs)
    return p, q


# ----------------------------------------------------------------------
# user-kNN with MSD similarity
# ----------------------------------------------------------------------

# Above this many dense-similarity cells the [U, I]/[U, U] matmul path
# switches to the nnz-scaling blocked path (`_knn_predict_chunked`) —
# ~0.4 GB of f32 at the default, the point where dense stops being the
# obviously-right trade on a 16 GB chip shared with the caller.
KNN_DENSE_CELL_LIMIT = 100_000_000


def _knn_predict_chunked(dataset: ReviewDataset, hp: HyperParams,
                         test_u: np.ndarray, test_i: np.ndarray,
                         block: int = 128) -> np.ndarray:
    """User-kNN MSD predictions in BOUNDED memory (VERDICT r4 #6: the
    dense path materializes [U, I] and [U, U] — 40+ GB at a real Amazon
    category's 100k users). Identical estimates to `_knn_predict`
    (tested); memory is O(block * max(U, nnz)) — never a dense [U, U]
    or [U, I].

    Per block of `block` test PAIRS, every [*, U] row is built by
    column-scatter over the train COO stream instead of a matmul
    against a dense [U, I] operand:
      common[p, v] = sum_j Mb[p, j] M[v, j]
                   = scatter_add_v( Mb[:, tr.item] )
    and likewise for the three MSD terms and the per-pair rater mask
    (M's column i_p). Scatter operands are [block, nnz] — nnz-scaling,
    like the CSR formulation of the same sums."""
    tr = dataset.splits["train"]
    U, I = dataset.num_users, dataset.num_items
    tu_all = np.asarray(test_u, np.int64)
    ti_all = np.asarray(test_i, np.int64)
    mu = float(tr.rating.mean())
    k = min(hp.knn_k, U)

    tr_u = jnp.asarray(tr.user.astype(np.int32))
    tr_i = jnp.asarray(tr.item.astype(np.int32))
    tr_r = jnp.asarray(tr.rating)

    @partial(jax.jit, static_argnames=())
    def block_predict(bu, bi):
        p = bu.shape[0]
        # dense rows of the block's USERS only: [p, I]
        hit = bu[:, None] == tr_u[None, :]              # [p, nnz]
        prow = jnp.broadcast_to(jnp.arange(p)[:, None], hit.shape)
        icol = jnp.broadcast_to(tr_i[None], hit.shape)
        Rb = jnp.zeros((p, I)).at[prow, icol].add(
            jnp.where(hit, tr_r[None, :], 0.0))
        Mb = jnp.minimum(jnp.zeros((p, I)).at[prow, icol].add(
            jnp.where(hit, 1.0, 0.0)), 1.0)

        # gather per-nnz contributions and scatter into user columns
        gb_r = Rb[:, tr_i]                               # [p, nnz]
        gb_m = Mb[:, tr_i]
        z = jnp.zeros((p, U))
        common = z.at[:, tr_u].add(gb_m)
        cross = z.at[:, tr_u].add(gb_r * tr_r[None, :])
        sq_a = z.at[:, tr_u].add((gb_r * gb_r))
        sq_b = z.at[:, tr_u].add(gb_m * (tr_r * tr_r)[None, :])
        sd = sq_a + sq_b - 2.0 * cross
        sim = jnp.where(common > 0, common / (sd + common), 0.0)
        sim = sim.at[jnp.arange(p), bu].set(0.0)         # no self-vote

        # per-pair rater mask: M's column i_p, again by scatter
        is_i = (bi[:, None] == tr_i[None, :]).astype(jnp.float32)
        mcol = jnp.minimum(z.at[:, tr_u].add(is_i), 1.0)
        rcol = z.at[:, tr_u].add(is_i * tr_r[None, :])
        w = sim * mcol
        topw, topidx = jax.lax.top_k(w, k)
        vals = jnp.take_along_axis(rcol, topidx, axis=1)
        denom = jnp.sum(topw, axis=1)
        est = jnp.where(denom > 0,
                        jnp.sum(topw * vals, axis=1) / denom, mu)
        return jnp.clip(est, hp.rating_min, hp.rating_max)

    out = np.empty(len(tu_all), np.float64)
    for s in range(0, len(tu_all), block):
        e = min(s + block, len(tu_all))
        bu = np.full(block, 0, np.int32)
        bi = np.full(block, 0, np.int32)
        bu[:e - s] = tu_all[s:e]
        bi[:e - s] = ti_all[s:e]
        out[s:e] = np.asarray(block_predict(jnp.asarray(bu),
                                            jnp.asarray(bi)))[:e - s]
    return out


def _knn_predict(dataset: ReviewDataset, hp: HyperParams,
                 test_u: np.ndarray, test_i: np.ndarray) -> np.ndarray:
    tr = dataset.splits["train"]
    U, I = dataset.num_users, dataset.num_items
    if max(U * I, U * U) > KNN_DENSE_CELL_LIMIT:
        return _knn_predict_chunked(dataset, hp, test_u, test_i)
    R = jnp.zeros((U, I)).at[jnp.asarray(tr.user),
                             jnp.asarray(tr.item)].set(
        jnp.asarray(tr.rating))
    M = jnp.zeros((U, I)).at[jnp.asarray(tr.user),
                             jnp.asarray(tr.item)].set(1.0)

    @jax.jit
    def sims():
        # sum over common items of (r_a - r_b)^2, via three matmuls
        common = M @ M.T                                   # [U, U]
        sq = (R * R) @ M.T
        cross = R @ R.T
        sd = sq + sq.T - 2 * cross
        # MSD similarity: n_common / (sd + n_common); zero when no
        # common items (min_support)
        sim = jnp.where(common > 0, common / (sd + common), 0.0)
        return sim * (1 - jnp.eye(U))

    S = sims()
    mu = float(tr.rating.mean())
    k = min(hp.knn_k, U)

    @jax.jit
    def predict(u, i):
        # neighbors of u that rated i
        w = S[u] * M[:, i]                                 # [U]
        topw, topidx = jax.lax.top_k(w, k)
        vals = R[topidx, i]
        denom = jnp.sum(topw)
        est = jnp.where(denom > 0, jnp.sum(topw * vals) / denom, mu)
        return jnp.clip(est, hp.rating_min, hp.rating_max)

    return np.asarray(jax.vmap(predict)(jnp.asarray(test_u),
                                        jnp.asarray(test_i)))


# ----------------------------------------------------------------------
# unified runner (reference surprise Model.__call__,
# surprise_models.py:27-58)
# ----------------------------------------------------------------------

def fit(hp: HyperParams, dataset: ReviewDataset):
    """Fit once; returns predict(u_ids, i_ids) -> np.ndarray."""
    users, items, ratings = _train_arrays(dataset)
    mu = float(dataset.splits["train"].rating.mean())
    mt = hp.model_type
    U, I = dataset.num_users, dataset.num_items
    known_u = jnp.asarray(dataset.user_count > 0)
    known_i = jnp.asarray(dataset.item_count > 0)

    if mt == "kNN":
        return lambda tu, ti: _knn_predict(dataset, hp, tu, ti)

    if mt == "NMF":
        p, q = _nmf_fit(users, items, ratings, U, I,
                        epochs=hp.nmf_epochs, factors=hp.latent_size,
                        seed=hp.seed)

        def predict_nmf(test_u, test_i):
            tu, ti = jnp.asarray(test_u), jnp.asarray(test_i)
            est = jnp.sum(p[tu] * q[ti], axis=-1)
            # unknown user/item -> global mean (PredictionImpossible)
            est = jnp.where(known_u[tu] & known_i[ti], est, mu)
            return np.asarray(jnp.clip(est, hp.rating_min, hp.rating_max))

        return predict_nmf

    variant = {"baseline": "baseline", "SVD": "SVD", "SVD++": "SVD++"}[mt]
    lr = 0.007 if variant == "SVD++" else hp.surprise_lr
    kw = {}
    if variant == "SVD++":
        # padded per-user item lists for the implicit term, built by a
        # stable sort + segment-relative column index (no Python loop;
        # within-user order stays the train-split order)
        maxI = max(1, int(dataset.user_count.max()))
        pad = np.zeros((U, maxI), np.int32)
        tr = dataset.splits["train"]
        order = np.argsort(tr.user, kind="stable")
        su = tr.user[order].astype(np.int64)
        si = tr.item[order].astype(np.int32)
        counts = np.bincount(su, minlength=U)
        col = np.arange(len(su)) - np.repeat(np.cumsum(counts) - counts,
                                             counts)
        pad[su, col] = si
        cnt = counts.astype(np.float32)
        kw = {"rated_pad": jnp.asarray(pad), "rated_count": jnp.asarray(cnt)}

    state = _sgd_fit(users, items, ratings, U, I, mu,
                     epochs=hp.surprise_epochs, variant=variant,
                     factors=hp.latent_size, lr=lr, reg=hp.surprise_reg,
                     seed=hp.seed, **kw)

    def predict_sgd(test_u, test_i):
        tu, ti = jnp.asarray(test_u), jnp.asarray(test_i)
        est = mu + jnp.where(known_u[tu], state["bu"][tu], 0.0) \
            + jnp.where(known_i[ti], state["bi"][ti], 0.0)
        if variant in ("SVD", "SVD++"):
            inter = jnp.sum(state["p"][tu] * state["q"][ti], axis=-1)
            if variant == "SVD++":
                pad, cnt = kw["rated_pad"], kw["rated_count"]
                mask = (jnp.arange(pad.shape[1])[None, :]
                        < cnt[tu][:, None]).astype(jnp.float32)
                imp = jnp.sum(state["y"][pad[tu]] * mask[..., None],
                              axis=1) \
                    * jax.lax.rsqrt(jnp.maximum(cnt[tu], 1.0))[:, None]
                inter = jnp.sum(state["q"][ti] * (state["p"][tu] + imp),
                                axis=-1)
            est = est + jnp.where(known_u[tu] & known_i[ti], inter, 0.0)
        return np.asarray(jnp.clip(est, hp.rating_min, hp.rating_max))

    return predict_sgd


def run_neighbor(hp: HyperParams, dataset: ReviewDataset):
    """Fit + test-set evaluation with count maps + HR@1 ranking.

    The reference surprise path reports MSE and count maps only
    (surprise_models.py:27-58, no eval_ranking); we additionally score
    the negative sets with the same predictor for a complete metric row.
    """
    predict = fit(hp, dataset)
    te = dataset.splits["test"]
    preds = predict(te.user, te.item)
    err = (preds - te.rating) ** 2
    metrics = {"MSE": round(float(err.mean()), 4)}

    ucm: Dict[int, list] = {}
    icm: Dict[int, list] = {}
    ucnt = dataset.user_count[te.user]
    icnt = dataset.item_count[te.item]
    for c, e in zip(ucnt, err):
        ucm.setdefault(int(c), []).append(float(e))
    for c, e in zip(icnt, err):
        icm.setdefault(int(c), []).append(float(e))

    from ..train.evaluate import ranks_to_metrics, split_eval_ks

    narrow_ks, wide_ks = split_eval_ks(hp)

    def grid_ranks(users_2d, items_2d):
        m = items_2d.shape[0]
        scores = predict(np.asarray(users_2d).reshape(-1),
                         np.asarray(items_2d).reshape(-1)).reshape(m, -1)
        return (scores[:, 1:] > scores[:, :1]).sum(axis=1)

    m = dataset.neg_cands.shape[0]
    users = np.repeat(dataset.neg_users,
                      dataset.neg_cands.shape[1]).reshape(m, -1)
    metrics.update(ranks_to_metrics(grid_ranks(users, dataset.neg_cands),
                                    narrow_ks))
    if wide_ks:
        wide = dataset.materialize_wide_negs(hp, hp.eval_num_negs,
                                             seed=hp.seed)
        metrics.update(ranks_to_metrics(
            grid_ranks(wide["user"], wide["item"]), wide_ks))
    return metrics, ucm, icm
