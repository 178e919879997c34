"""Device-resident embedded-doc cache (hp.cache_doc_embeds): the frozen
word table is applied once up front; the train step gathers whole cached
rows by index. Must be bitwise-identical to the uncached path — same
shuffle stream, same RNG stream, same masked-padding semantics."""

import jax
import numpy as np
import pytest

from reviews4rec_tpu.models import build_model
from reviews4rec_tpu.train.loop import train_complete


def _train(dataset, hp):
    return train_complete(hp, build_model(hp, dataset.word_vectors),
                          dataset)


def _assert_bitwise(p1, p2):
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("model_type", ["deepconn", "NARRE", "transnet"])
def test_cached_bitwise_equals_uncached(dataset, hp_base, model_type):
    hp = hp_base.replace(model_type=model_type, epochs=1, batch_size=16,
                         shuffle_data_every_epoch=True)
    p1, m1 = _train(dataset, hp)
    p2, m2 = _train(dataset, hp.replace(cache_doc_embeds=True))
    assert m1 == m2
    _assert_bitwise(p1, p2)


def test_cached_pallas_interpret_parity(dataset, hp_base):
    """The Pallas path consumes the cache in its dot dtype (f32 in
    interpret mode) — cached == uncached bitwise there too."""
    hp = hp_base.replace(model_type="deepconn", epochs=1, batch_size=16,
                         use_pallas=True)
    p1, m1 = _train(dataset, hp)
    p2, m2 = _train(dataset, hp.replace(cache_doc_embeds=True))
    assert m1 == m2
    _assert_bitwise(p1, p2)


@pytest.mark.slow
@pytest.mark.parametrize("model_type", ["NARRE", "transnet"])
def test_cached_pallas_prepaired_other_towers(dataset, hp_base,
                                              model_type):
    """The paired-operand cache layout (per-review for NARRE, three
    towers for transnet) stays bitwise with the uncached Pallas path."""
    hp = hp_base.replace(model_type=model_type, epochs=1, batch_size=16,
                         use_pallas=True)
    p1, m1 = _train(dataset, hp)
    p2, m2 = _train(dataset, hp.replace(cache_doc_embeds=True))
    assert m1 == m2
    _assert_bitwise(p1, p2)


def test_cached_eval_masks_padded_tail(dataset, hp_base):
    """Regression: a batch size that does NOT divide the val split makes
    the row Batcher pad the tail batch; the padded rows gather row 0's
    records, and without the weight mask they entered transnet's
    trans_loss with weight 1 — cached val metrics diverged from
    uncached (2.0204 vs 2.0159 observed)."""
    hp = hp_base.replace(model_type="transnet", epochs=1, batch_size=13)
    p1, m1 = _train(dataset, hp)
    p2, m2 = _train(dataset, hp.replace(cache_doc_embeds=True))
    assert m1 == m2
    _assert_bitwise(p1, p2)


def test_doc_cache_drops_unread_docs(dataset, hp_base):
    """deepconn never reads this_doc: the cache must not carry it
    (ADVICE r3: an unused [T, E] float per example is ~50% extra HBM)."""
    from reviews4rec_tpu.train.loop import (build_doc_cache,
                                            doc_cache_keys)
    hp = hp_base.replace(model_type="deepconn")
    recs = dataset.materialize(hp, "train")
    ck, idk = doc_cache_keys("deepconn")
    cache = build_doc_cache(recs, dataset.word_vectors, "float32",
                            keys=ck, id_keys=idk)
    assert "this_doc" not in cache
    assert cache["user_doc"].ndim == 3  # pre-embedded [N, T, E]
    ck, idk = doc_cache_keys("transnet")
    full = build_doc_cache(recs, dataset.word_vectors, "float32",
                           keys=ck, id_keys=idk)
    assert "this_doc" in full

    # cache_sides="item": item docs pre-embedded, user docs raw ids
    ck, idk = doc_cache_keys("deepconn", "item")
    assert ck == ("item_doc",) and idk == ("user_doc",)
    half = build_doc_cache(recs, dataset.word_vectors, "float32",
                           keys=ck, id_keys=idk)
    assert half["item_doc"].ndim == 3           # [N, T, E] floats
    assert half["user_doc"].dtype == np.int32   # raw ids
    ck, idk = doc_cache_keys("transnet", "item")
    assert set(ck) == {"item_doc", "this_doc"} and idk == ("user_doc",)


def test_cached_sides_item_bitwise(dataset, hp_base):
    """Partial cache (cache_sides='item'): item docs gathered from the
    float cache, user docs embedded in-jit from cached ids — still
    bitwise-identical to the uncached run."""
    hp = hp_base.replace(model_type="deepconn", epochs=1, batch_size=16,
                         shuffle_data_every_epoch=True)
    p1, m1 = _train(dataset, hp)
    p2, m2 = _train(dataset, hp.replace(cache_doc_embeds=True,
                                        cache_sides="item"))
    assert m1 == m2
    _assert_bitwise(p1, p2)


def test_cached_sides_ids_bitwise(dataset, hp_base):
    """Ids-only cache (cache_sides='ids'): every doc side stays raw
    int32 on device (~4 bytes/word), the models embed in-jit — still
    bitwise-identical to the uncached run, with and without Pallas."""
    hp = hp_base.replace(model_type="deepconn", epochs=1, batch_size=16,
                         shuffle_data_every_epoch=True)
    p1, m1 = _train(dataset, hp)
    p2, m2 = _train(dataset, hp.replace(cache_doc_embeds=True,
                                        cache_sides="ids"))
    assert m1 == m2
    _assert_bitwise(p1, p2)

    hpp = hp.replace(use_pallas=True)
    p3, m3 = _train(dataset, hpp)
    p4, m4 = _train(dataset, hpp.replace(cache_doc_embeds=True,
                                         cache_sides="ids"))
    assert m3 == m4
    _assert_bitwise(p3, p4)


def test_doc_cache_ids_keys(dataset, hp_base):
    from reviews4rec_tpu.train.loop import build_doc_cache, doc_cache_keys

    ck, idk = doc_cache_keys("deepconn", "ids")
    assert ck == () and set(idk) == {"user_doc", "item_doc"}
    ck, idk = doc_cache_keys("transnet", "ids")
    assert ck == () and set(idk) == {"user_doc", "item_doc", "this_doc"}

    hp = hp_base.replace(model_type="deepconn")
    recs = dataset.materialize(hp, "train")
    ck, idk = doc_cache_keys("deepconn", "ids")
    cache = build_doc_cache(recs, dataset.word_vectors, "float32",
                            keys=ck, id_keys=idk)
    assert cache["user_doc"].dtype == np.int32
    assert cache["item_doc"].dtype == np.int32


def test_cached_scan_parity(dataset, hp_base):
    """cache + scan_steps: scanned cached groups plus the per-batch
    trailing group reproduce the plain path exactly."""
    hp = hp_base.replace(model_type="deepconn", epochs=2, batch_size=16)
    p1, m1 = _train(dataset, hp)
    p2, m2 = _train(dataset, hp.replace(cache_doc_embeds=True,
                                        scan_steps=3))
    assert m1 == m2
    _assert_bitwise(p1, p2)


def test_cached_ranking_loss_parity(dataset, hp_base):
    """Candidate-grid training (hp.loss) caches the [N, C, ...] grids
    (user side [N, 1, ...]) and matches the uncached run."""
    hp = hp_base.replace(model_type="deepconn", epochs=1, batch_size=16,
                         loss="BPR", num_negs=2)
    p1, m1 = _train(dataset, hp)
    p2, m2 = _train(dataset, hp.replace(cache_doc_embeds=True))
    assert m1 == m2
    _assert_bitwise(p1, p2)


def test_cache_rejected_outside_frozen_towers(dataset, hp_base):
    # MPCN: pre-embedded caches rejected (trained word table), but the
    # ids-only cache is allowed and bitwise-identical
    with pytest.raises(ValueError, match="ids-only"):
        _train(dataset, hp_base.replace(model_type="MPCN",
                                        cache_doc_embeds=True))
    with pytest.raises(ValueError, match="review"):
        _train(dataset, hp_base.replace(model_type="MF_dot",
                                        cache_doc_embeds=True))


def test_mpcn_ids_cache_bitwise(dataset, hp_base):
    """MPCN + cache_sides='ids': the int docs live on device (killing
    the per-step host doc transfer, MPCN's measured product bottleneck)
    while the TRAINED embedding still happens in-jit — bitwise-identical
    to the uncached run."""
    hp = hp_base.replace(model_type="MPCN", epochs=1, batch_size=16,
                         shuffle_data_every_epoch=True)
    p1, m1 = _train(dataset, hp)
    p2, m2 = _train(dataset, hp.replace(cache_doc_embeds=True,
                                        cache_sides="ids"))
    assert m1 == m2
    _assert_bitwise(p1, p2)


def _strip_timing(m):
    """api.run metrics minus wall-clock throughput (not deterministic)."""
    return {k: v for k, v in m.items() if "examples_per_s" not in k}


@pytest.mark.slow
def test_cached_mesh_matches_single_device(dataset, hp_base):
    """cache_doc_embeds composes with the mesh: the cache is row-sharded
    over the data axis (parallel.mesh.shard_cache) and the full product
    path (api.run: train + cached val eval + test eval + ranking)
    bitwise-matches the single-device cached run."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="deepconn", epochs=1, batch_size=32,
                         cache_doc_embeds=True, save_model=False,
                         shuffle_data_every_epoch=True)
    m1, _, _ = run(hp, dataset)
    m2, _, _ = run(hp.replace(mesh_shape=(4, 2)), dataset)
    assert _strip_timing(m1) == _strip_timing(m2)


def test_cached_scan_mesh_matches_single_device(dataset, hp_base):
    """cache + scan_steps + mesh: the stacked [S, B] row batches shard
    P(None, 'data') and still reproduce the single-device run."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="deepconn", epochs=1, batch_size=16,
                         cache_doc_embeds=True, scan_steps=2,
                         save_model=False)
    m1, _, _ = run(hp, dataset)
    m2, _, _ = run(hp.replace(mesh_shape=(4, 2), batch_size=16), dataset)
    assert _strip_timing(m1) == _strip_timing(m2)


def test_chunked_cache_build_bitwise(dataset, hp_base):
    """The chunked device cache build (donated dynamic_update_slice
    writer — transient HBM = buffer + one chunk, not 2x the buffer)
    produces the identical arrays to a one-shot build, padding/paired
    layout included."""
    import jax.numpy as jnp
    from reviews4rec_tpu.train.loop import build_doc_cache

    hp = hp_base.replace(model_type="deepconn")
    recs = dataset.materialize(hp, "train")
    one = build_doc_cache(recs, dataset.word_vectors, jnp.float32,
                          paired_window=3)
    few = build_doc_cache(recs, dataset.word_vectors, jnp.float32,
                          paired_window=3, chunk_words=7 * 64)
    for k in one:
        assert np.array_equal(np.asarray(one[k]), np.asarray(few[k])), k
