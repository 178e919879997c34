"""hp.loss wiring: the ranking losses (train/losses.py, reference
MPCN/tf_models/model.py:701-733) are reachable from config and
converge on the planted synthetic structure."""

import numpy as np
import pytest

from reviews4rec_tpu.models import build_model
from reviews4rec_tpu.train.loop import train_complete


def test_train_negs_layout(dataset, hp_base):
    hp = hp_base.replace(model_type="MF_dot")
    recs = dataset.materialize_train_negs(hp, "train", seed=0)
    sp = dataset.splits["train"]
    n, c = recs["item"].shape
    assert n == len(sp) and c == hp.num_candidates
    # column 0 is the real train positive with its real rating
    assert np.array_equal(recs["item"][:, 0], sp.item)
    assert np.array_equal(recs["rating"][:, 0], sp.rating)
    assert np.all(recs["rating"][:, 1:] == 0.0)
    # users are repeated across the candidate axis
    assert np.array_equal(recs["user"][:, 3], sp.user)

    # sampled negatives avoid the user's train items (bounded rejection)
    pos = {}
    for u, i in zip(sp.user, sp.item):
        pos.setdefault(int(u), set()).add(int(i))
    hits = sum(int(recs["item"][x, j]) in pos[int(sp.user[x])]
               for x in range(n) for j in range(1, c))
    assert hits / (n * (c - 1)) < 0.05


def test_train_negs_review_leakage_removed(dataset, hp_base):
    hp = hp_base.replace(model_type="deepconn")
    recs = dataset.materialize_train_negs(hp, "train", seed=0)
    plain = dataset.materialize(hp, "train")
    # the positive column's docs match the leakage-removed pointwise
    # records exactly
    assert np.array_equal(recs["user_doc"][:, 0], plain["user_doc"])
    assert np.array_equal(recs["item_doc"][:, 0], plain["item_doc"])


@pytest.mark.parametrize("loss", ["CE", "BPR", "HINGE"])
def test_ranking_loss_converges(dataset, hp_base, loss, tmp_path):
    hp = hp_base.replace(model_type="MF_dot", loss=loss, epochs=6,
                         lr=0.02, log_dir=str(tmp_path))
    model = build_model(hp)
    _, neg_hr = train_complete(hp, model, dataset)
    # returned scalar is -best_val_HR@1; random guessing over 6
    # candidates sits at ~16.7
    assert -neg_hr > 25.0, f"{loss}: best val HR@1 {-neg_hr} <= random"


def test_ranking_loss_rejected_for_transnet(dataset, hp_base):
    hp = hp_base.replace(model_type="transnet", loss="BPR")
    model = build_model(hp, dataset.word_vectors)
    with pytest.raises(ValueError):
        train_complete(hp, model, dataset)
