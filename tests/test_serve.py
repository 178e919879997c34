"""Serving API (serve.py): checkpoint-restored prediction, prediction
artifacts (reference HFT/MPCN prediction-file format), and chunked
top-k recommendation."""

import numpy as np
import pytest

from reviews4rec_tpu.api import run
from reviews4rec_tpu.serve import (predict, recommend, restore_model,
                                   save_predictions)


@pytest.fixture(scope="module")
def trained(tmp_path_factory, dataset, hp_base):
    d = tmp_path_factory.mktemp("serve")
    hp = hp_base.replace(model_type="MF_dot", epochs=2,
                         model_dir=str(d / "models"),
                         log_dir=str(d / "logs"))
    metrics, _, _ = run(hp, dataset)
    return hp, metrics


def test_predict_matches_eval(trained, dataset):
    """predict() restores the best-val checkpoint api.run saved; its MSE
    must reproduce the reported test MSE."""
    hp, metrics = trained
    preds = predict(hp, dataset, "test")
    sp = dataset.splits["test"]
    assert preds.shape == (len(sp),)
    mse = float(np.mean((preds - sp.rating) ** 2))
    assert abs(mse - metrics["MSE"]) < 1e-3


def test_save_predictions_artifacts(trained, dataset):
    hp, _ = trained
    paths = save_predictions(hp, dataset)
    for split, path in paths.items():
        lines = open(path).read().splitlines()
        assert len(lines) == len(dataset.splits[split])
        p, r = lines[0].split()
        float(p), float(r)


def test_recommend_chunked_matches_single_shot(trained, dataset):
    """The running top-k merge over item chunks equals one full-catalog
    pass, and scores come back sorted."""
    hp, _ = trained
    users = np.array([0, 3, 7])
    model, params = restore_model(hp, dataset)
    i1, s1 = recommend(hp, dataset, users, k=5, item_chunk=7,
                       params=params, model=model)
    i2, s2 = recommend(hp, dataset, users, k=5,
                       item_chunk=dataset.num_items,
                       params=params, model=model)
    assert np.array_equal(i1, i2)
    assert np.allclose(s1, s2)
    assert np.all(np.diff(s1, axis=1) <= 1e-6)


def test_recommend_excludes_seen(trained, dataset):
    hp, _ = trained
    users = np.array([0, 1])
    items, _ = recommend(hp, dataset, users, k=5)
    tr = dataset.splits["train"]
    for ui, u in enumerate(users):
        seen = set(int(i) for uu, i in zip(tr.user, tr.item)
                   if int(uu) == int(u))
        assert not (set(items[ui].tolist()) & seen)


def test_recommend_review_model(tmp_path, dataset, hp_base):
    """Review-tower models recommend through the same grid layout the
    rank evaluator uses (user side broadcast over candidates)."""
    hp = hp_base.replace(model_type="deepconn", epochs=1,
                         model_dir=str(tmp_path / "m"),
                         log_dir=str(tmp_path / "l"))
    run(hp, dataset)
    items, scores = recommend(hp, dataset, np.array([2, 5]), k=3,
                              item_chunk=11)
    assert items.shape == (2, 3) and np.isfinite(scores).all()


def test_serve_rejects_non_gradient(dataset, hp_base):
    with pytest.raises(ValueError):
        predict(hp_base.replace(model_type="HFT"), dataset)
    with pytest.raises(ValueError):
        recommend(hp_base.replace(model_type="SVD"), dataset,
                  np.array([0]))


def test_recommender_reuses_compilation(trained, dataset):
    """The serving engine compiles its scorer once per geometry: a
    second topk call (and tail chunks, which are padded to the chunk
    width) adds no new specializations."""
    from reviews4rec_tpu.serve import Recommender

    hp, _ = trained
    rec = Recommender(hp, dataset, item_chunk=8)
    users = np.array([0, 1, 2])
    i1, s1 = rec.topk(users, k=4)     # catalog 30 -> 3 full + 1 padded
    n = rec.compiled_variants()
    assert n == 1                     # padding keeps one static shape
    i2, s2 = rec.topk(users, k=4)
    assert rec.compiled_variants() == n
    assert np.array_equal(i1, i2) and np.array_equal(s1, s2)

    # and it agrees with the one-shot wrapper
    i3, s3 = recommend(hp, dataset, users, k=4, item_chunk=8)
    assert np.array_equal(i1, i3)


def test_factorized_matches_grid_mf(trained, dataset):
    """Two-tower factorized index == pairwise grid scoring for MF_dot
    (identical math, different evaluation order)."""
    from reviews4rec_tpu.serve import FactorizedRecommender, Recommender

    hp, _ = trained
    users = np.array([0, 3, 7])
    gi, gs = Recommender(hp, dataset, item_chunk=8).topk(users, k=5)
    fi, fs = FactorizedRecommender(hp, dataset).topk(users, k=5)
    assert np.allclose(gs, fs, atol=1e-4)
    assert np.array_equal(gi, fi)


def test_factorized_matches_grid_deepconn(tmp_path, dataset, hp_base):
    """The FM head's per-side split (su + si + au.bi) reproduces the
    joint FM over cat(u, i) — full-catalog serving via one matmul."""
    from reviews4rec_tpu.api import run
    from reviews4rec_tpu.serve import FactorizedRecommender, Recommender

    hp = hp_base.replace(model_type="deepconn", epochs=1,
                         model_dir=str(tmp_path / "m"),
                         log_dir=str(tmp_path / "l"))
    run(hp, dataset)
    users = np.array([1, 4])
    gi, gs = Recommender(hp, dataset, item_chunk=16).topk(users, k=5)
    fi, fs = FactorizedRecommender(hp, dataset, item_chunk=16).topk(
        users, k=5)
    assert np.allclose(gs, fs, atol=1e-4)
    assert np.array_equal(gi, fi)


def test_factorized_rejects_nonfactorizable(dataset, hp_base):
    from reviews4rec_tpu.serve import FactorizedRecommender

    with pytest.raises(ValueError, match="factorization"):
        FactorizedRecommender(hp_base.replace(model_type="MPCN"),
                              dataset)


def test_factorized_matches_grid_deepconnpp(tmp_path, dataset, hp_base):
    """deepconn++ (MLP head + id biases): item tower features are
    precomputed at index build; only the pairwise ScorerMLP head runs
    per query — must reproduce the grid path's top-k exactly."""
    from reviews4rec_tpu.api import run
    from reviews4rec_tpu.serve import FactorizedRecommender, Recommender

    hp = hp_base.replace(model_type="deepconn++", epochs=1,
                         model_dir=str(tmp_path / "m"),
                         log_dir=str(tmp_path / "l"))
    run(hp, dataset)
    users = np.array([0, 2, 6])
    gi, gs = Recommender(hp, dataset, item_chunk=16).topk(users, k=5)
    fi, fs = FactorizedRecommender(hp, dataset, item_chunk=16).topk(
        users, k=5)
    assert np.allclose(gs, fs, atol=1e-4)
    assert np.array_equal(gi, fi)


def test_factorized_score_chunking_invariant(trained, dataset):
    """topk over score_items-wide chunks (running top-k merge) equals
    single-chunk scoring."""
    from reviews4rec_tpu.serve import FactorizedRecommender

    hp, _ = trained
    rec = FactorizedRecommender(hp, dataset)
    users = np.array([1, 5, 9])
    i1, s1 = rec.topk(users, k=6)                    # one chunk
    i2, s2 = rec.topk(users, k=6, score_items=7)     # 5 chunks
    assert np.array_equal(i1, i2)
    assert np.allclose(s1, s2)


def test_factorized_matches_grid_narre(tmp_path, dataset, hp_base):
    """NARRE (VERDICT r4 #9): per-review encode + neighbor attention
    are per-side, so the two-tower index with the hadamard-MLP pairwise
    head must reproduce the joint grid scorer's top-k exactly."""
    from reviews4rec_tpu.api import run
    from reviews4rec_tpu.serve import FactorizedRecommender, Recommender

    hp = hp_base.replace(model_type="NARRE", epochs=1,
                         model_dir=str(tmp_path / "m"),
                         log_dir=str(tmp_path / "l"))
    run(hp, dataset)
    users = np.array([1, 4, 9])
    gi, gs = Recommender(hp, dataset, item_chunk=16).topk(users, k=5)
    fi, fs = FactorizedRecommender(hp, dataset, item_chunk=16).topk(
        users, k=5)
    assert np.allclose(gs, fs, atol=1e-4)
    assert np.array_equal(gi, fi)


@pytest.mark.parametrize("mt", ["transnet", "transnet++"])
def test_factorized_matches_grid_transnet(tmp_path, dataset, hp_base,
                                          mt):
    """Transnet's SOURCE-net transform splits per side, so the
    two-tower index must reproduce the joint grid scorer's top-k."""
    from reviews4rec_tpu.api import run
    from reviews4rec_tpu.serve import FactorizedRecommender, Recommender

    hp = hp_base.replace(model_type=mt, epochs=1,
                         model_dir=str(tmp_path / "m"),
                         log_dir=str(tmp_path / "l"))
    run(hp, dataset)
    users = np.array([2, 6])
    gi, gs = Recommender(hp, dataset, item_chunk=16).topk(users, k=5)
    fi, fs = FactorizedRecommender(hp, dataset, item_chunk=16).topk(
        users, k=5)
    assert np.allclose(gs, fs, atol=1e-4)
    assert np.array_equal(gi, fi)


@pytest.mark.parametrize("mt", ["MPCN", "deepconn"])
def test_entity_recommender_matches_host_grids(tmp_path, dataset,
                                               hp_base, mt):
    """Recommender(entity=True): id-only grids + in-jit doc gathers
    from the canonical entity tables must score identically to the
    host-materialized grid path — the fast grid route for MPCN, the
    one model with no exact two-tower factorization."""
    from reviews4rec_tpu.api import run
    from reviews4rec_tpu.serve import Recommender

    hp = hp_base.replace(model_type=mt, epochs=1,
                         model_dir=str(tmp_path / "m"),
                         log_dir=str(tmp_path / "l"))
    run(hp, dataset)
    users = np.array([1, 5, 8])
    gi, gs = Recommender(hp, dataset, item_chunk=16).topk(users, k=5)
    ei, es = Recommender(hp, dataset, item_chunk=16,
                         entity=True).topk(users, k=5)
    assert np.allclose(gs, es, atol=1e-5)
    assert np.array_equal(gi, ei)


@pytest.mark.parametrize("mt", ["deepconn++", "transnet++"])
def test_predict_entity_matches_host(tmp_path, dataset, hp_base, mt):
    """Device-resident predict() (entity tables, no host doc grids):
    val/test predictions equal the host path's EXACTLY (eval removes
    nothing); train predictions differ only by the documented
    mask-vs-remove leakage deviation (and stay close)."""
    from reviews4rec_tpu.api import run
    from reviews4rec_tpu.serve import predict

    hp = hp_base.replace(model_type=mt, epochs=1,
                         model_dir=str(tmp_path / "m"),
                         log_dir=str(tmp_path / "l"))
    run(hp, dataset)
    hp_ent = hp.replace(cache_doc_embeds=True, cache_entity=True)
    for split in ("val", "test"):
        host = predict(hp, dataset, split)
        ent = predict(hp_ent, dataset, split)
        assert np.array_equal(host, ent), (mt, split)
    host = predict(hp, dataset, "train")
    ent = predict(hp_ent, dataset, "train")
    assert host.shape == ent.shape
    assert np.mean(np.abs(host - ent)) < 0.2   # deviation, not drift
