"""Trainer + evaluator behavior: bias_only converges toward the
closed-form bias solution; ranking metrics on crafted candidate sets."""

import jax
import numpy as np
import pytest

from reviews4rec_tpu.data.batcher import Batcher
from reviews4rec_tpu.models import build_model
from reviews4rec_tpu.train.evaluate import (eval_ranking, evaluate,
                                            make_apply_fn, make_eval_step,
                                            make_rank_step)
from reviews4rec_tpu.train.loop import train_complete


def test_bias_only_learns(dataset, hp_base):
    hp = hp_base.replace(model_type="bias_only", epochs=12, lr=0.05)
    model = build_model(hp)
    params, best_mse = train_complete(hp, model, dataset)
    # global mean predictor MSE on this synthetic corpus
    tr = dataset.splits["train"].rating
    va = dataset.splits["val"].rating
    naive = float(((va - tr.mean()) ** 2).mean())
    assert best_mse < naive + 0.05  # must at least match the mean predictor


def test_eval_count_maps(dataset, hp_base):
    hp = hp_base.replace(model_type="bias_only")
    model = build_model(hp)
    recs = dataset.materialize(hp, "test")
    b = Batcher(recs, hp.batch_size)
    sample = next(iter(b))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, sample,
                        train=False)["params"]
    step = make_eval_step(make_apply_fn(model), hp.model_type)
    metrics, ucm, icm = evaluate(step, params, b, hp, dataset.user_count,
                                 dataset.item_count)
    n_test = len(dataset.splits["test"])
    assert sum(len(v) for v in ucm.values()) == n_test
    assert sum(len(v) for v in icm.values()) == n_test
    # keys are train frequencies
    for c in ucm:
        assert 0 <= c <= dataset.user_count.max()
    flat = [e for v in ucm.values() for e in v]
    assert np.isclose(np.mean(flat), metrics["MSE"], atol=1e-3)


def test_hr1_crafted(hp_base):
    """HR@1 on a crafted scorer: positive wins iff its score is the
    strict max of the 6 candidates (reference eval.py:74-90)."""
    hp = hp_base.replace(model_type="bias_only", eval_ks=(1, 3))

    def fake_rank_step(params, batch):
        preds = batch["scores"]
        pos = preds[:, :1]
        return np.asarray((preds[:, 1:] > pos).sum(axis=1))

    scores = np.array([
        [5.0, 1, 1, 1, 1, 1],   # hit, rank 0
        [2.0, 3, 1, 1, 1, 1],   # miss, rank 1
        [2.0, 3, 4, 1, 1, 1],   # miss, rank 2
        [2.0, 2, 1, 1, 1, 1],   # tie -> argmax takes index 0 -> hit
    ], np.float32)
    recs = {
        "user": np.zeros((4, 6), np.int32),
        "item": np.zeros((4, 6), np.int32),
        "rating": np.zeros((4, 6), np.float32),
        "scores": scores,
    }
    m = eval_ranking(fake_rank_step, None, recs, hp, batch_size=3)
    assert m["HR@1"] == 50.0   # 2 of 4
    assert m["HR@3"] == 100.0
    assert "NDCG@3" in m


def test_rank_step_model(dataset, hp_base):
    hp = hp_base.replace(model_type="MF_dot")
    model = build_model(hp)
    negs = dataset.materialize_negs(hp)
    b = Batcher(negs, 8)
    sample = next(iter(b))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, sample,
                        train=False)["params"]
    rank_step = make_rank_step(make_apply_fn(model), hp.model_type)
    m = eval_ranking(rank_step, params, negs, hp)
    assert 0.0 <= m["HR@1"] <= 100.0


def test_full_run_api(dataset, hp_base):
    from reviews4rec_tpu.api import run
    hp = hp_base.replace(model_type="MF_dot", epochs=2)
    metrics, ucm, icm = run(hp, dataset)
    assert "MSE" in metrics and "HR@1" in metrics
    assert len(ucm) > 0


@pytest.mark.parametrize("mt", ["deepconn", "NARRE", "transnet", "MPCN"])
def test_grid_user_dedup_matches_tiled(dataset, hp_base, mt):
    """Candidate grids store the user side once per row ([B, 1, ...])
    and the models broadcast it; scores must match feeding fully tiled
    [B, C, ...] user tensors (the pre-dedup layout)."""
    import jax
    from reviews4rec_tpu.data.batcher import Batcher
    from reviews4rec_tpu.models import build_model
    from reviews4rec_tpu.train.evaluate import make_apply_fn, make_rank_step

    hp = hp_base.replace(model_type=mt)
    model = build_model(hp, dataset.word_vectors)
    neg = dataset.materialize_negs(hp)
    batch = next(iter(Batcher(neg, 8)))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng, "gumbel": rng},
                        batch, train=False)["params"]
    rank_step = make_rank_step(make_apply_fn(model), mt)

    c = batch["item"].shape[1]
    tiled = dict(batch)
    for k in ("user_doc", "items_reviewed"):
        v = batch[k]
        assert v.shape[1] == 1, (k, v.shape)
        tiled[k] = np.broadcast_to(v, (v.shape[0], c) + v.shape[2:])
    r_dedup = np.asarray(rank_step(params, batch))
    r_tiled = np.asarray(rank_step(params, tiled))
    assert np.array_equal(r_dedup, r_tiled)


def test_wide_negs_layout_and_sampling(dataset, hp_base):
    """materialize_wide_negs keeps each row's positive in column 0 and
    samples candidates outside the user's train/val/test interactions
    (bounded rejection keeps rare collisions)."""
    hp = hp_base.replace(model_type="MF_dot", eval_num_negs=8)
    recs = dataset.materialize_wide_negs(hp, hp.eval_num_negs, seed=0)
    m = dataset.neg_users.shape[0]
    assert recs["item"].shape == (m, 9)
    assert np.array_equal(recs["item"][:, 0], dataset.neg_cands[:, 0])
    seen = [set() for _ in range(dataset.num_users)]
    for s in dataset.splits.values():
        for u, i in zip(s.user, s.item):
            seen[int(u)].add(int(i))
    clean = sum(int(v not in seen[int(dataset.neg_users[x])])
                for x in range(m) for v in recs["item"][x, 1:])
    # most sampled candidates must be un-interacted (rejection works)
    assert clean >= 0.8 * m * 8


def test_eval_num_negs_wide_hr10(dataset, hp_base):
    """hp.eval_num_negs splits the protocol: HR@1 from the reference
    1+5 sets, HR@10/NDCG@10 from wide 1+N sets — no more degenerate
    HR@10 == 100-by-construction."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="MF_dot", epochs=1,
                         eval_num_negs=15, save_model=False)
    m, _, _ = run(hp, dataset)
    assert "HR@1" in m and "HR@10" in m and "NDCG@10" in m
    # over 16 candidates HR@10 is a real measurement (rank >= 10 is
    # possible); the untrained-ish model should miss at least sometimes
    assert 0.0 <= m["HR@10"] <= 100.0

    # review grids go through the same path (small shapes)
    hp2 = hp_base.replace(model_type="deepconn", epochs=1,
                          eval_num_negs=15, save_model=False)
    m2, _, _ = run(hp2, dataset)
    assert "HR@10" in m2 and "NDCG@10" in m2
