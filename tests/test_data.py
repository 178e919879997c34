"""Data-pipeline invariants: leakage removal, padding layouts, negative
sets, persistence round-trip."""

import numpy as np
import pytest

from reviews4rec_tpu.data.corpus import ReviewDataset
from reviews4rec_tpu.data.batcher import Batcher
from reviews4rec_tpu.data.synthetic import make_synthetic


def test_split_sizes(dataset):
    n = sum(len(dataset.splits[s]) for s in ("train", "test", "val"))
    assert len(dataset.splits["train"]) == int(0.8 * n) or \
        abs(len(dataset.splits["train"]) - 0.8 * n) <= 1
    assert dataset.user_count.sum() == len(dataset.splits["train"])


def test_review_maps_consistent(dataset):
    # u_to_i aligned with user_reviews; this_index points at the right slot
    for (u, i), (ui, iu) in dataset.this_index.items():
        assert dataset.u_to_i[u][ui] == i
        assert dataset.i_to_u[i][iu] == u
        # the same review object appears in both lists
        assert np.array_equal(dataset.user_reviews[u][ui],
                              dataset.item_reviews[i][iu])


def test_leakage_removal(dataset, hp_base):
    """For a train pair (u,i), the pair's own review must appear in
    this_doc and NOT in user_doc/item_doc (reference data.py:212-248)."""
    hp = hp_base.replace(model_type="deepconn", input_length=4096)
    recs = dataset.materialize(hp, "train")
    tr = dataset.splits["train"]
    for x in range(min(10, len(tr))):
        u, i = int(tr.user[x]), int(tr.item[x])
        ui, iu = dataset.this_index[(u, i)]
        own = dataset.user_reviews[u][ui]
        this = recs["this_doc"][x][:len(own)]
        assert np.array_equal(this, own)
        # user_doc = concat of all reviews except `own`
        expect = [r for j, r in enumerate(dataset.user_reviews[u]) if j != ui]
        flat = np.concatenate(expect) if expect else np.zeros(0, np.int32)
        assert np.array_equal(recs["user_doc"][x][:len(flat)],
                              flat[:hp.input_length])
        # neighbor list excludes the item itself
        reviewed = recs["items_reviewed"][x]
        own_items = [dataset.u_to_i[u][j]
                     for j in range(len(dataset.u_to_i[u])) if j != ui]
        n = min(len(own_items), 10)
        assert i not in reviewed[:n] or i in own_items[:n]


def test_test_split_no_removal(dataset, hp_base):
    hp = hp_base.replace(model_type="deepconn", input_length=4096)
    recs = dataset.materialize(hp, "test")
    te = dataset.splits["test"]
    x = 0
    u, i = int(te.user[x]), int(te.item[x])
    flat = (np.concatenate(dataset.user_reviews[u])
            if dataset.user_reviews[u] else np.zeros(0, np.int32))
    assert np.array_equal(recs["user_doc"][x][:len(flat)],
                          flat[:hp.input_length])
    # this_doc is the held-out test review
    own = dataset.test_reviews[(u, i)]
    assert np.array_equal(recs["this_doc"][x][:len(own)], own)


def test_narre_layout(dataset, hp_base):
    hp = hp_base.replace(model_type="NARRE")
    recs = dataset.materialize(hp, "train")
    assert recs["user_doc"].shape[1:] == (hp.narre_num_reviews,
                                          hp.narre_num_words)
    # per-review structure: row j holds review j (truncated), zero-padded
    u = int(dataset.splits["train"].user[0])
    i = int(dataset.splits["train"].item[0])
    ui, _ = dataset.this_index[(u, i)]
    kept = [r for j, r in enumerate(dataset.user_reviews[u]) if j != ui]
    if kept:
        r0 = kept[0][:hp.narre_num_words]
        assert np.array_equal(recs["user_doc"][0, 0, :len(r0)], r0)


def test_neighbor_padding(dataset, hp_base):
    hp = hp_base.replace(model_type="deepconn")
    recs = dataset.materialize(hp, "train")
    assert recs["users_who_gave"].shape[1] == 10
    assert recs["users_who_gave"].max() <= hp.user_pad_id
    assert recs["items_reviewed"].max() <= hp.item_pad_id


def test_negatives(dataset):
    users, cands = dataset.neg_users, dataset.neg_cands
    assert cands.shape[1] == 6
    te = dataset.splits["test"]
    test_pairs = {(int(u), int(i)): float(r)
                  for u, i, r in zip(te.user, te.item, te.rating)}
    assert len(users) > 1  # generator found eligible users
    for x in range(len(users)):
        u = int(users[x])
        pos = int(cands[x, 0])
        assert (u, pos) in test_pairs and test_pairs[(u, pos)] >= 4.9
        for j in range(1, 6):
            ng = int(cands[x, j])
            assert ng != pos
            if (u, ng) in test_pairs:
                assert test_pairs[(u, ng)] < 4.9


def test_batcher_padding(dataset, hp_base):
    recs = dataset.materialize(hp_base, "test")
    b = Batcher(recs, 33)
    batches = list(b)
    assert len(batches) == len(b)
    total = sum(int(x["weight"].sum()) for x in batches)
    assert total == len(dataset.splits["test"])
    for x in batches:
        assert x["user"].shape == (33,)


def test_save_load_roundtrip(tmp_path, dataset, hp_base):
    path = str(tmp_path / "ds")
    dataset.save(path)
    loaded = ReviewDataset.load(path)
    assert loaded.num_users == dataset.num_users
    for s in ("train", "test", "val"):
        assert np.array_equal(loaded.splits[s].user, dataset.splits[s].user)
        assert np.allclose(loaded.splits[s].rating,
                           dataset.splits[s].rating)
    hp = hp_base.replace(model_type="deepconn")
    a = dataset.materialize(hp, "val")
    b = loaded.materialize(hp, "val")
    for k in a:
        assert np.array_equal(a[k], b[k]), k
