"""Checkpoint round-trip + best-val persistence during training."""

import os

import jax
import numpy as np

from reviews4rec_tpu.data.batcher import Batcher
from reviews4rec_tpu.models import build_model
from reviews4rec_tpu.train.checkpoint import (load_checkpoint,
                                              restore_like,
                                              restore_params,
                                              save_checkpoint)
from reviews4rec_tpu.train.loop import train_complete


def test_roundtrip(tmp_path, dataset, hp_base):
    hp = hp_base.replace(model_type="MF_dot")
    model = build_model(hp)
    batch = next(iter(Batcher(dataset.materialize(hp, "train"), 8)))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch,
                        train=False)["params"]
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, params, step=7, epoch=2, extra={"val_mse": 1.5})

    payload = load_checkpoint(path)
    assert payload["step"] == 7 and payload["epoch"] == 2
    assert payload["extra"]["val_mse"] == 1.5

    restored = restore_params(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    out1 = model.apply({"params": restored}, batch, train=False)
    out2 = model.apply({"params": params}, batch, train=False)
    assert np.allclose(np.asarray(out1), np.asarray(out2))


def test_train_complete_persists_best(tmp_path, dataset, hp_base):
    hp = hp_base.replace(model_type="bias_only", epochs=3, lr=0.05)
    model = build_model(hp)
    path = str(tmp_path / "best.msgpack")
    best_params, best_mse = train_complete(hp, model, dataset,
                                           checkpoint_path=path)
    assert os.path.exists(path)
    payload = load_checkpoint(path)
    assert abs(payload["extra"]["val_mse"] - best_mse) < 1e-9
    restored = restore_like(best_params, payload["best_params"])
    assert np.allclose(np.asarray(restored["user_bias"]),
                       np.asarray(best_params["user_bias"]))


def test_early_stop_patience(tmp_path, dataset, hp_base):
    # lr=0 -> params never change -> epoch 1 sets best (from inf), every
    # later epoch is a tie (no improvement); patience 2 stops at epoch 3
    # instead of running all 30 (reference MPCN --early_stop semantics,
    # MPCN/train.py:746-760)
    hp = hp_base.replace(model_type="MF_dot", epochs=30, lr=0.0,
                         early_stop=2, log_dir=str(tmp_path / "logs"))
    model = build_model(hp)
    path = str(tmp_path / "es.msgpack")
    train_complete(hp, model, dataset, checkpoint_path=path)
    payload = load_checkpoint(path)
    assert payload["epoch"] == 3
    assert payload["extra"]["since_improve"] == 2


def test_resume_matches_uninterrupted(tmp_path, dataset, hp_base):
    # 2 epochs + resume to 4 must be bitwise-identical to a straight
    # 4-epoch run: per-epoch RNG and shuffle streams are keyed by the
    # absolute epoch, and optimizer state round-trips the checkpoint
    hp4 = hp_base.replace(model_type="MF_dot", epochs=4, lr=0.01,
                          shuffle_data_every_epoch=True,
                          log_dir=str(tmp_path / "logs"))
    model = build_model(hp4)
    straight, straight_mse = train_complete(hp4, model, dataset)

    path = str(tmp_path / "resume.msgpack")
    hp2 = hp4.replace(epochs=2)
    train_complete(hp2, model, dataset, checkpoint_path=path)
    resumed, resumed_mse = train_complete(
        hp4.replace(resume=True), model, dataset, checkpoint_path=path)

    assert resumed_mse == straight_mse
    for a, b in zip(jax.tree_util.tree_leaves(straight),
                    jax.tree_util.tree_leaves(resumed)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
