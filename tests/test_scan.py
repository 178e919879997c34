"""Scan-over-microbatches training path (hp.scan_steps,
train/loop.py::make_scan_train_step): one `lax.scan` dispatch per S
batches must be bitwise-identical to S per-step dispatches — same
updates, same order, same RNG stream (SURVEY.md §7.2)."""

import jax
import numpy as np

from reviews4rec_tpu.data.batcher import Batcher
from reviews4rec_tpu.models import build_model
from reviews4rec_tpu.train.evaluate import make_apply_fn
from reviews4rec_tpu.train.loop import (TrainState, make_optimizer,
                                        make_placer, make_scan_train_step,
                                        make_train_step, train_complete,
                                        train_epoch)


def _epoch(dataset, hp, scan_steps):
    model = build_model(hp, dataset.word_vectors)
    b = Batcher(dataset.materialize(hp, "train"), hp.batch_size)
    rng = jax.random.PRNGKey(3)
    params = model.init({"params": rng, "dropout": rng}, next(iter(b)),
                        train=False)["params"]
    opt = make_optimizer(hp)
    state = TrainState(params, opt.init(params), np.zeros((), np.int32))
    apply_fn = make_apply_fn(model)
    step = make_train_step(apply_fn, opt, hp.model_type)
    scan = (make_scan_train_step(apply_fn, opt, hp.model_type)
            if scan_steps > 1 else None)
    state, metrics = train_epoch(step, state, b, rng,
                                 scan_step=scan, scan_steps=scan_steps)
    return state, metrics


def test_scan_bitwise_equals_per_step(dataset, hp_base):
    """Full scan groups + a smaller tail group (len(batcher) chosen not
    a multiple of S) produce the identical parameter trees and epoch
    metrics as the per-step path."""
    hp = hp_base.replace(model_type="MF_dot", batch_size=16)
    n_batches = len(Batcher(dataset.materialize(hp, "train"),
                            hp.batch_size))
    scan_steps = 3
    assert n_batches > scan_steps and n_batches % scan_steps != 0, \
        "fixture must exercise both the scan groups and the tail path"
    s1, m1 = _epoch(dataset, hp, 1)
    s2, m2 = _epoch(dataset, hp, scan_steps)
    assert m1["MSE"] == m2["MSE"]
    assert int(s1.step) == int(s2.step)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_scan_review_model_matches(dataset, hp_base):
    """The dropout/gumbel RNG threading survives the scan (review tower
    with real dropout)."""
    hp = hp_base.replace(model_type="deepconn", batch_size=16, epochs=1)
    s1, _ = _epoch(dataset, hp, 1)
    s2, _ = _epoch(dataset, hp, 2)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_scan_through_train_complete_on_mesh(dataset, hp_base):
    """Product path: hp.scan_steps on a (4, 2) mesh — stacked batches
    shard over `data` on dim 1 (make_placer(stacked=True)) and match the
    per-step mesh run bitwise."""
    hp = hp_base.replace(model_type="MF_dot", epochs=1, batch_size=32,
                         mesh_shape=(4, 2))
    p1, m1 = train_complete(hp, build_model(hp), dataset)
    hp2 = hp.replace(scan_steps=2)
    p2, m2 = train_complete(hp2, build_model(hp2), dataset)
    assert m1 == m2
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
