"""Runtime-level guarantees: determinism, NeuMF 3-phase pipeline,
throughput counters (the aux-subsystem replacements for the reference's
nonexistent race detection / tracing, SURVEY.md §5)."""

import jax
import numpy as np
import pytest

from reviews4rec_tpu.api import run
from reviews4rec_tpu.models import build_model
from reviews4rec_tpu.train.loop import train_complete


def test_training_is_deterministic(dataset, hp_base):
    """Same seed -> bitwise-identical params (JAX functional PRNG; the
    reference has no such guarantee)."""
    hp = hp_base.replace(model_type="MF", epochs=2, seed=7)
    p1, m1 = train_complete(hp, build_model(hp), dataset)
    p2, m2 = train_complete(hp, build_model(hp), dataset)
    assert m1 == m2
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_seed_changes_results(dataset, hp_base):
    hp = hp_base.replace(model_type="MF", epochs=1, seed=1)
    p1, _ = train_complete(hp, build_model(hp), dataset)
    hp2 = hp.replace(seed=2)
    p2, _ = train_complete(hp2, build_model(hp2), dataset)
    diffs = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree_util.tree_leaves(p1),
                             jax.tree_util.tree_leaves(p2))]
    assert any(diffs)


def test_neumf_three_phase(dataset, hp_base):
    """NeuMF end-to-end: GMF pretrain -> MLP pretrain -> surgery -> final
    train (reference main_NeuMF, main.py:289-338)."""
    hp = hp_base.replace(model_type="NeuMF", epochs=1, latent_size=4)
    metrics, ucm, icm = run(hp, dataset)
    assert "MSE" in metrics and "HR@1" in metrics
    assert sum(len(v) for v in ucm.values()) == len(dataset.splits["test"])


def test_throughput_counters(dataset, hp_base):
    from reviews4rec_tpu.data.batcher import Batcher
    from reviews4rec_tpu.train.evaluate import make_apply_fn
    from reviews4rec_tpu.train.loop import (TrainState, make_optimizer,
                                            make_train_step, train_epoch)

    hp = hp_base.replace(model_type="bias_only")
    model = build_model(hp)
    b = Batcher(dataset.materialize(hp, "train"), hp.batch_size)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, next(iter(b)),
                        train=False)["params"]
    opt = make_optimizer(hp)
    state = TrainState(params, opt.init(params), np.zeros((), np.int32))
    step = make_train_step(make_apply_fn(model), opt, hp.model_type)
    _, metrics = train_epoch(step, state, b, rng)
    assert metrics["examples_per_s"] > 0
    assert metrics["ms_per_step"] > 0


def test_profiler_trace_smoke(tmp_path, dataset, hp_base):
    from reviews4rec_tpu.train.profiler import annotate, trace
    with trace(str(tmp_path / "tb")):
        with annotate("smoke"):
            _ = jax.jit(lambda x: x * 2)(np.ones(8))
    # trace directory created with an xplane dump
    assert (tmp_path / "tb").exists()


def test_keyboard_interrupt_returns_best_params(dataset, hp_base,
                                                monkeypatch, tmp_path):
    """Ctrl-C mid-training ends the run gracefully with the
    best-validation snapshot (reference main.py:128)."""
    from reviews4rec_tpu.models import build_model
    from reviews4rec_tpu.train import loop as loop_mod
    from reviews4rec_tpu.train.loop import train_complete

    hp = hp_base.replace(model_type="MF_dot", epochs=5,
                         log_dir=str(tmp_path))
    calls = {"n": 0}
    orig = loop_mod.train_epoch

    def interrupting(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt
        return orig(*a, **k)

    monkeypatch.setattr(loop_mod, "train_epoch", interrupting)
    params, best = train_complete(hp, build_model(hp), dataset)
    assert calls["n"] == 3            # interrupted on epoch 3 of 5
    assert np.isfinite(best)          # epochs 1-2 validated fine
    assert params is not None


def test_mpcn_pretrained_words_seed_table(dataset, hp_base):
    """hp.mpcn_pretrained seeds MPCN's trainable word table from the
    shared word2vec vectors (reference --pretrained=1)."""
    import jax
    from reviews4rec_tpu.data.batcher import Batcher
    from reviews4rec_tpu.models import build_model

    hp = hp_base.replace(model_type="MPCN", mpcn_pretrained=True)
    model = build_model(hp, dataset.word_vectors)
    sample = next(iter(Batcher(dataset.materialize(hp, "train"), 8)))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng,
                         "gumbel": rng}, sample, train=False)["params"]
    assert np.array_equal(np.asarray(params["word_embedding"]),
                          dataset.word_vectors)

    hp2 = hp.replace(mpcn_pretrained=False)
    model2 = build_model(hp2, dataset.word_vectors)
    params2 = model2.init({"params": rng, "dropout": rng,
                           "gumbel": rng}, sample, train=False)["params"]
    assert not np.array_equal(np.asarray(params2["word_embedding"]),
                              dataset.word_vectors)
