"""Entity-level doc cache (hp.cache_entity): canonical per-entity docs
+ in-place leakage MASK of the train pair's own review. Cache HBM scales
with entities instead of examples; eval-time docs are identical to the
per-example materialization; train-time semantics are the documented
mask deviation (corpus.py entity-store docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reviews4rec_tpu.models import build_model
from reviews4rec_tpu.train.loop import train_complete


def _assert_bitwise(p1, p2):
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_entity_docs_eval_identity(dataset, hp_base):
    """Eval splits remove nothing, so canonical entity docs ARE the
    per-example docs."""
    hp = hp_base.replace(model_type="deepconn")
    (ud, _), (it, _) = dataset._entity_spans(hp.input_length)
    for split in ("val", "test"):
        ev = dataset.materialize(hp, split)
        assert np.array_equal(ud[ev["user"]], ev["user_doc"])
        assert np.array_equal(it[ev["item"]], ev["item_doc"])


def test_entity_spans_point_at_own_review(dataset, hp_base):
    """The masked span holds exactly the pair's own review's (clipped)
    words, and the words before the span match the remove-and-shift
    reference docs (removal only shifts what FOLLOWS the span)."""
    hp = hp_base.replace(model_type="deepconn")
    T = hp.input_length
    (ud, _), (it, _) = dataset._entity_spans(T)
    tr = dataset.materialize(hp, "train")
    ent = dataset.materialize_entity(hp, "train")
    checked = 0
    for x in range(len(ent["user"])):
        u = ent["user"][x]
        st, ln = ent["user_skip"][x]
        assert np.array_equal(ud[u][:st], tr["user_doc"][x][:st])
        if ln > 0:
            assert np.array_equal(ud[u][st:st + min(ln, 5)],
                                  tr["this_doc"][x][:min(ln, 5)])
            checked += 1
    assert checked > 0


def test_entity_cached_step_matches_masked_batch(dataset, hp_base):
    """One cached train step over the EntityCache == one plain train
    step over a hand-built batch whose doc spans are zeroed at value
    level (the mask semantics, end to end through loss + Adam)."""
    from reviews4rec_tpu.train.evaluate import make_apply_fn
    from reviews4rec_tpu.train.loop import (EntityCache, TrainState,
                                            build_entity_cache,
                                            make_cached_train_step,
                                            make_optimizer,
                                            make_train_step)

    hp = hp_base.replace(model_type="deepconn++", batch_size=16)
    T = hp.input_length
    model = build_model(hp, dataset.word_vectors)
    ent = dataset.materialize_entity(hp, "train")
    (ud, _), (it, _) = dataset._entity_spans(T)
    bs = hp.batch_size
    rows = np.arange(bs)

    # hand-built masked batch (floats via frozen table is the model's
    # own job; here docs stay ints and the model masks post-embed)
    def zeroed(docs, ids, skips):
        out = docs[ids].copy()
        for j, (st, ln) in enumerate(skips):
            out[j, st:st + ln] = 0
        return out

    batch = {k: np.asarray(v)[rows] for k, v in ent.items()}
    plain = dict(batch)
    plain["user_doc"] = zeroed(ud, batch["user"], batch["user_skip"])
    plain["item_doc"] = zeroed(it, batch["item"], batch["item_skip"])
    del plain["user_skip"], plain["item_skip"]
    plain["weight"] = np.ones(bs, np.float32)

    rng = jax.random.PRNGKey(0)
    init_b = dict(plain)
    params = model.init({"params": rng, "dropout": rng}, init_b,
                        train=False)["params"]
    # int-doc masking zeroes IDS (word 0 has a real vector), which is
    # NOT the float mask; so compare through the float path: pass skips
    # with the raw canonical docs instead
    plain2 = dict(batch)
    plain2["user_doc"] = ud[batch["user"]]
    plain2["item_doc"] = it[batch["item"]]
    plain2["weight"] = np.ones(bs, np.float32)

    apply_fn = make_apply_fn(model)
    opt = make_optimizer(hp)
    step = make_train_step(apply_fn, opt, hp.model_type)
    cache = build_entity_cache(ent, {"user_doc": ud, "item_doc": it},
                               dataset.word_vectors, jnp.float32,
                               keys=("user_doc", "item_doc"))
    cstep = make_cached_train_step(apply_fn, opt, hp.model_type)

    def fresh():
        p = jax.tree_util.tree_map(jnp.copy, params)
        return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

    key = jax.random.PRNGKey(7)
    s1, m1 = step(fresh(), {k: jnp.asarray(v) for k, v in plain2.items()},
                  key)
    s2, m2 = cstep(fresh(), cache, jnp.asarray(rows, jnp.int32),
                   jnp.ones(bs, jnp.float32), key)
    assert float(m1["loss"]) == float(m2["loss"])
    _assert_bitwise(s1.params, s2.params)


@pytest.mark.parametrize("model_type", ["deepconn", "deepconn++"])
def test_entity_cache_pallas_xla_scan_agree(dataset, hp_base, model_type,
                                            tmp_path):
    """Entity-cached training: the XLA and Pallas (interpret, f32)
    paths agree on metrics (the conv contraction orders differ in the
    last float bits, as everywhere else in the suite); Pallas and
    Pallas+scan agree BITWISE (identical kernel, identical update
    stream)."""
    hp = hp_base.replace(model_type=model_type, epochs=1, batch_size=16,
                         cache_doc_embeds=True, cache_entity=True,
                         shuffle_data_every_epoch=True,
                         log_dir=str(tmp_path))
    runs = []
    for variant in (hp, hp.replace(use_pallas=True),
                    hp.replace(use_pallas=True, scan_steps=3)):
        runs.append(train_complete(
            variant, build_model(variant, dataset.word_vectors), dataset))
    (p0, m0), (p1, m1), (p2, m2) = runs
    assert m0 == m1 == m2
    _assert_bitwise(p1, p2)


def test_entity_cache_mesh_matches_single_device(dataset, hp_base,
                                                 tmp_path):
    """Entity cache composes with the mesh (example rows sharded, doc
    tables replicated): full api.run metrics match single-device."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="deepconn++", epochs=1,
                         batch_size=32, cache_doc_embeds=True,
                         cache_entity=True, save_model=False,
                         log_dir=str(tmp_path))
    m1, _, _ = run(hp, dataset)
    m2, _, _ = run(hp.replace(mesh_shape=(4, 2)), dataset)
    strip = lambda m: {k: v for k, v in m.items()
                       if "examples_per_s" not in k}
    assert strip(m1) == strip(m2)


def test_entity_cache_rejected_outside_frozen_towers(dataset, hp_base):
    with pytest.raises(ValueError, match="ids-only"):
        hp = hp_base.replace(model_type="MPCN", cache_doc_embeds=True,
                             cache_entity=True)
        train_complete(hp, build_model(hp, dataset.word_vectors), dataset)
    with pytest.raises(ValueError, match="pointwise|RAW_MSE"):
        hp = hp_base.replace(model_type="deepconn", loss="BPR",
                             cache_doc_embeds=True, cache_entity=True)
        train_complete(hp, build_model(hp, dataset.word_vectors), dataset)


def test_entity_fuse_rows_bitwise(dataset, hp_base, tmp_path):
    """hp.pallas_fuse_rows (row gather folded into the kernels' DMA)
    trains bitwise-identically to the take()-based entity path."""
    hp = hp_base.replace(model_type="deepconn++", epochs=1,
                         batch_size=16, use_pallas=True,
                         cache_doc_embeds=True, cache_entity=True,
                         shuffle_data_every_epoch=True,
                         log_dir=str(tmp_path))
    p1, m1 = train_complete(hp, build_model(hp, dataset.word_vectors),
                            dataset)
    hp2 = hp.replace(pallas_fuse_rows=True)
    p2, m2 = train_complete(hp2, build_model(hp2, dataset.word_vectors),
                            dataset)
    assert m1 == m2
    _assert_bitwise(p1, p2)


def test_entity_rows_docs_eval_identity(dataset, hp_base):
    """NARRE layout: canonical per-review entity docs + neighbor lists
    equal the per-example eval materialization (eval removes nothing)."""
    hp = hp_base.replace(model_type="NARRE")
    ud, it, wg, rv = dataset._entity_rows_docs(
        hp.narre_num_reviews, hp.narre_num_words, 10, hp.user_pad_id,
        hp.item_pad_id)
    for split in ("val", "test"):
        ev = dataset.materialize(hp, split)
        assert np.array_equal(ud[ev["user"]], ev["user_doc"])
        assert np.array_equal(it[ev["item"]], ev["item_doc"])
        assert np.array_equal(wg[ev["item"]], ev["users_who_gave"])
        assert np.array_equal(rv[ev["user"]], ev["items_reviewed"])


def test_narre_entity_mask_blocks_leakage(dataset, hp_base):
    """The rows>1 leakage mask: with `user_skip`/`item_skip` row
    indices set, CHANGING the masked review row's words and its aligned
    neighbor id must not change the prediction — the pair's own review
    cannot flow into the score."""
    from reviews4rec_tpu.data.batcher import Batcher

    hp = hp_base.replace(model_type="NARRE", batch_size=8)
    model = build_model(hp, dataset.word_vectors)
    ent = dataset.materialize_entity(hp, "train")
    ud, it, wg, rv = dataset._entity_rows_docs(
        hp.narre_num_reviews, hp.narre_num_words, 10, hp.user_pad_id,
        hp.item_pad_id)
    bs = 8
    sel = np.where(ent["user_skip"][:200] >= 0)[0][:bs]
    assert len(sel) == bs
    batch = {k: np.asarray(v)[sel] for k, v in ent.items()}
    batch.update(user_doc=ud[batch["user"]].copy(),
                 item_doc=it[batch["item"]].copy(),
                 users_who_gave=wg[batch["item"]].copy(),
                 items_reviewed=rv[batch["user"]].copy(),
                 weight=np.ones(bs, np.float32))
    import jax
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch,
                        train=False)["params"]
    p1 = model.apply({"params": params}, batch, train=False)

    # scramble the masked rows' content + aligned neighbor slots
    poisoned = {k: (v.copy() if hasattr(v, "copy") else v)
                for k, v in batch.items()}
    for j in range(bs):
        a = int(batch["user_skip"][j])
        poisoned["user_doc"][j, a] = 7  # arbitrary word everywhere
        poisoned["items_reviewed"][j, a] = 3
        b = int(batch["item_skip"][j])
        if b >= 0:
            poisoned["item_doc"][j, b] = 7
            poisoned["users_who_gave"][j, b] = 3
    p2 = model.apply({"params": params}, poisoned, train=False)
    assert np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)

    # control: WITHOUT the skip keys the same scramble must change
    # the prediction (the mask is doing the work)
    b1 = {k: v for k, v in batch.items()
          if k not in ("user_skip", "item_skip")}
    b2 = {k: v for k, v in poisoned.items()
          if k not in ("user_skip", "item_skip")}
    q1 = model.apply({"params": params}, b1, train=False)
    q2 = model.apply({"params": params}, b2, train=False)
    assert not np.allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)


def test_narre_entity_trains_and_matches_eval(dataset, hp_base,
                                              tmp_path):
    """NARRE entity-cached training runs end to end (XLA + pallas
    interpret agree on metrics) and the api.run mesh variant matches
    single-device."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="NARRE", epochs=1, batch_size=16,
                         cache_doc_embeds=True, cache_entity=True,
                         save_model=False, log_dir=str(tmp_path))
    m1, _, _ = run(hp, dataset)
    m2, _, _ = run(hp.replace(use_pallas=True), dataset)
    strip = lambda m: {k: v for k, v in m.items()
                       if "examples_per_s" not in k}
    assert strip(m1) == strip(m2)
    m3, _, _ = run(hp.replace(mesh_shape=(4, 2)), dataset)
    assert strip(m1) == strip(m3)


@pytest.mark.parametrize("model_type", ["transnet", "transnet++"])
def test_transnet_entity_trains(dataset, hp_base, model_type, tmp_path):
    """Transnet entity mode: user/item sides from entity tables with
    source-tower span masks; this_doc stays per-example ids. XLA and
    pallas-interpret agree on metrics; mesh matches single-device."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type=model_type, epochs=1, batch_size=16,
                         cache_doc_embeds=True, cache_entity=True,
                         save_model=False, log_dir=str(tmp_path))
    m1, _, _ = run(hp, dataset)
    m2, _, _ = run(hp.replace(use_pallas=True), dataset)
    strip = lambda m: {k: v for k, v in m.items()
                       if "examples_per_s" not in k}
    assert strip(m1) == strip(m2)
    m3, _, _ = run(hp.replace(mesh_shape=(4, 2)), dataset)
    assert strip(m1) == strip(m3)


def test_transnet_entity_this_doc_matches_per_example(dataset, hp_base):
    """this_doc in the entity records equals the per-example
    materialization for every split (it is per-example data)."""
    hp = hp_base.replace(model_type="transnet")
    for split in ("train", "val", "test"):
        ent = dataset.materialize_entity(hp, split)
        ref = dataset.materialize(hp, split)
        assert np.array_equal(ent["this_doc"], ref["this_doc"])


@pytest.mark.parametrize("model_type",
                         ["deepconn++", "NARRE", "transnet++"])
def test_entity_finalize_matches_host_grids(dataset, hp_base,
                                            model_type, tmp_path):
    """The device-resident finalize pass (entity test-MSE cache +
    id-only rank grids with in-jit doc gathers) must reproduce the
    host-materialized path's metrics EXACTLY for the same trained
    params — eval removes nothing, so canonical docs are the eval
    docs."""
    from reviews4rec_tpu.api import _finalize

    hp = hp_base.replace(model_type=model_type, epochs=1, batch_size=16,
                         eval_num_negs=20, eval_ks=(1, 10),
                         log_dir=str(tmp_path))
    model = build_model(hp, dataset.word_vectors)
    params, _ = train_complete(hp, model, dataset)

    m_host, ucm_h, _ = _finalize(hp, model, params, dataset, True)
    hp_ent = hp.replace(cache_doc_embeds=True, cache_entity=True)
    m_ent, ucm_e, _ = _finalize(hp_ent, model, params, dataset, True)
    assert m_host == m_ent
    assert set(ucm_h) == set(ucm_e)
