"""Preprocessing pipeline: tokenizer goldens, k-core fixpoint property,
end-to-end CLI run on a generated raw corpus, word2vec signal."""

import json
import os

import numpy as np
import pytest

from reviews4rec_tpu.data.preprocess import (build_negatives, k_core_filter,
                                             load_amazon_json, preprocess)
from reviews4rec_tpu.data.tokenizer import build_vocab, tokenize
from reviews4rec_tpu.data.corpus import ReviewDataset, Split


def test_tokenizer_golden():
    assert tokenize("I LOVED it! Don't you?") == \
        ["i", "loved", "it", "don", "t", "you"]
    assert tokenize("great-sounding strings, really") == \
        ["great", "sounding", "strings", "really"]
    assert tokenize("") == []


def test_tokenizer_matches_reference_semantics():
    """Pins against the reference tokenize() on sample strings: its first
    regex `[^A-Za-z] -> space` (preprocess_random_split.py:35) strips
    digits/punctuation entirely, then splits on whitespace — so every
    later apostrophe rule is a no-op."""
    cases = {
        "win 100 strings now!": ["win", "strings", "now"],
        "5-star product, A+ quality": ["star", "product", "a", "quality"],
        "it's the BEST (really)": ["it", "s", "the", "best", "really"],
        "won't    break": ["won", "t", "break"],
        "2020": [],
    }
    for text, want in cases.items():
        assert tokenize(text) == want, text


def test_vocab_threshold_matches_reference():
    """Reference get_word_map uses the count at sorted-desc index
    min(total-1, cap) as the survival threshold
    (preprocess_random_split.py:95-99)."""
    # 5 words with counts 5,4,3,2,1; cap=2 -> threshold = count at
    # index 2 = 3 -> exactly three words survive
    lists = [["a"] * 5 + ["b"] * 4 + ["c"] * 3 + ["d"] * 2 + ["e"]]
    wm, n = build_vocab(lists, cap=2)
    assert n == 3
    assert wm["a"] == 1 and wm["b"] == 2 and wm["c"] == 3
    assert wm["d"] == 0 and wm["e"] == 0
    # vocab within cap: threshold is the min count, everything survives
    wm2, n2 = build_vocab(lists, cap=10)
    assert n2 == 5


def test_vocab_unk_and_order():
    lists = [["a", "b", "a"], ["c", "a", "b"]]
    wm, num_words = build_vocab(lists, cap=50000)
    # ids assigned in first-appearance order starting at 1
    assert wm["a"] == 1 and wm["b"] == 2 and wm["c"] == 3
    assert num_words == 3
    # cap: only words with count >= count of the cap-th word survive
    wm2, n2 = build_vocab(lists, cap=1)
    assert wm2["a"] == 1      # most frequent survives
    assert wm2["c"] == 0      # rare word -> UNK
    assert n2 >= 1


def _raw_corpus(num_users=30, num_items=20, per_user=8, seed=0):
    rng = np.random.default_rng(seed)
    words = ["guitar", "strings", "sound", "great", "cheap", "broke",
             "love", "quality", "bad", "amp"]
    recs = []
    for u in range(num_users):
        items = rng.choice(num_items, size=per_user, replace=False)
        for i in items:
            recs.append({
                "reviewerID": f"u{u}",
                "asin": f"i{i}",
                "overall": float(rng.integers(1, 6)),
                "reviewText": " ".join(rng.choice(words, size=12)),
            })
    return recs


def test_kcore_fixpoint():
    recs = _raw_corpus()
    # remove most of user u0's interactions so it falls below the core
    recs = [r for r in recs if r["reviewerID"] != "u0"][:-3]
    kept, umap, imap = k_core_filter(recs, k_core=5)
    ucnt, icnt = {}, {}
    for r in kept:
        ucnt[r["reviewerID"]] = ucnt.get(r["reviewerID"], 0) + 1
        icnt[r["asin"]] = icnt.get(r["asin"], 0) + 1
    assert all(c >= 5 for c in ucnt.values())
    assert all(c >= 5 for c in icnt.values())
    # dense id ranges
    assert sorted(umap.values()) == list(range(len(umap)))


def test_preprocess_end_to_end(tmp_path):
    recs = _raw_corpus(num_users=40, num_items=25, per_user=10)
    ds = preprocess(recs, k_core=3, w2v_epochs=2,
                    verbose=lambda *_: None)
    n = len(ds.splits["train"]) + len(ds.splits["test"]) + \
        len(ds.splits["val"])
    assert abs(len(ds.splits["train"]) - 0.8 * n) <= 1
    assert ds.word_vectors.shape == (ds.num_words + 1, 64)
    # review maps consistent
    for (u, i), (ui, iu) in list(ds.this_index.items())[:20]:
        assert ds.u_to_i[u][ui] == i
        assert ds.i_to_u[i][iu] == u
    # persists + reloads
    path = str(tmp_path / "mi")
    ds.save(path)
    ds2 = ReviewDataset.load(path)
    assert ds2.num_users == ds.num_users


def test_percent_reviews_dropout():
    recs = _raw_corpus(num_users=40, num_items=25, per_user=10)
    ds100 = preprocess(recs, k_core=3, w2v_epochs=1,
                       verbose=lambda *_: None)
    ds10 = preprocess(recs, k_core=3, percent_reviews_to_keep=10,
                      w2v_epochs=1, verbose=lambda *_: None)
    n100 = sum(len(r) for revs in ds100.user_reviews for r in revs)
    n10 = sum(len(r) for revs in ds10.user_reviews for r in revs)
    assert n10 < n100 * 0.35
    # ratings identical: dropout touches text only
    assert np.array_equal(ds100.splits["train"].rating,
                          ds10.splits["train"].rating)


def test_build_negatives_strict():
    test = Split.from_triples(
        [[0, 1, 5.0], [0, 2, 3.0], [0, 3, 2.0], [0, 4, 1.0], [0, 5, 3.5],
         [0, 6, 2.5], [0, 7, 4.0],
         [1, 1, 5.0], [1, 2, 3.0]])  # user 1 lacks 5 negatives
    users, cands = build_negatives(test, num_negs=5, seed=0)
    assert list(users) == [0]
    assert cands[0, 0] == 1
    assert set(cands[0, 1:]) <= {2, 3, 4, 5, 6, 7}


def test_cli(tmp_path):
    from reviews4rec_tpu.data.preprocess import main
    raw = tmp_path / "raw.json"
    with open(raw, "w") as f:
        for r in _raw_corpus(num_users=35, num_items=20, per_user=9):
            f.write(json.dumps(r) + "\n")
    out = tmp_path / "data"
    main(["mini", str(raw), "--k-core", "3", "--out", str(out),
          "--w2v-epochs", "1"])
    assert (out / "mini" / "3_core" / "corpus.npz").exists()
    ds = ReviewDataset.load(str(out / "mini" / "3_core"))
    assert ds.num_users > 0


def test_load_ratebeer_format(tmp_path):
    """RateBeer multi-line records (preprocess_random_split.py:119-140):
    blank-line separated key:value fields, rating N/20 keeps the
    numerator, latin-1 text."""
    from reviews4rec_tpu.data.preprocess import load_ratebeer
    raw = (
        "beer/name: Test Ale\n"
        "beer/beerId: 101\n"
        "review/profileName: alice\n"
        "review/overall: 13/20\n"
        "review/text: pours a hazy caf\xe9 amber\n"
        "\n"
        "beer/beerId: 102\n"
        "review/profileName: bob\n"
        "review/overall: 20/20\n"
        "review/text: perfect\n"
        "\n"
        "beer/beerId: 103\n"
        "review/profileName: carol\n"
        "review/overall: 7/20\n"
    )
    p = tmp_path / "beer.txt"
    p.write_bytes(raw.encode("latin-1"))
    recs = load_ratebeer(str(p))
    assert len(recs) == 3
    assert recs[0] == {"asin": "101", "reviewerID": "alice",
                       "overall": 13.0,
                       "reviewText": "pours a hazy caf\xe9 amber"}
    assert recs[1]["overall"] == 20.0
    assert recs[2]["reviewText"] == ""   # missing text tolerated


def test_ratebeer_rating_scale_flows_to_runtime():
    """api.run widens the clip range to 1..20 for ratebeer
    (reference data.py:101-102)."""
    from reviews4rec_tpu.api import run
    from reviews4rec_tpu.config import HyperParams
    from reviews4rec_tpu.data.synthetic import make_synthetic
    ds = make_synthetic(num_users=25, num_items=20, vocab=80, seed=5)
    m, _, _ = run(HyperParams(model_type="bias_only", epochs=1,
                              dataset="ratebeer"), ds)
    assert "MSE" in m


def test_sgns_jax_backend_learns_signal():
    """The on-device SGNS (train_word2vec backend='jax') must learn the
    same co-occurrence signal as the numpy path: words that co-occur
    (consecutive ids in the same sequences) end up more similar than
    words that never do."""
    from reviews4rec_tpu.data.preprocess import train_word2vec

    rng = np.random.default_rng(0)
    # two disjoint word communities; sequences stay inside one community
    k = 100
    seqs = []
    for _ in range(400):
        com = rng.integers(0, 2)
        base = 1 + com * k
        seqs.append(base + rng.integers(0, k, size=30))
    vecs = train_word2vec(seqs, num_words=2 * k, epochs=20,
                          backend="jax", seed=0)
    assert vecs.shape == (2 * k + 1, 64)
    assert np.all(vecs[0] == 0.0)
    assert np.isfinite(vecs).all()

    # centered cosine: SGNS with many negatives grows a large shared
    # direction; the co-occurrence signal lives in the residual
    v = vecs[1:]
    vc = v - v.mean(0)
    nv = vc / (np.linalg.norm(vc, axis=1, keepdims=True) + 1e-9)
    sim = nv @ nv.T
    within = (sim[:k, :k].mean() + sim[k:, k:].mean()) / 2
    across = sim[:k, k:].mean()
    assert within > across + 0.1, (within, across)


def test_vocab_persists_and_encodes_new_text(tmp_path):
    """The word->id map survives save/load so serving can tokenize NEW
    review text (encode_text); unknown words map to UNK 0."""
    recs = _raw_corpus(num_users=40, num_items=25, per_user=10)
    ds = preprocess(recs, k_core=3, w2v_epochs=1,
                    verbose=lambda *_: None)
    assert ds.vocab and all(j > 0 for j in ds.vocab.values())
    path = str(tmp_path / "v")
    ds.save(path)
    ds2 = ReviewDataset.load(path)
    assert ds2.vocab == ds.vocab
    some_word = next(iter(ds.vocab))
    ids = ds2.encode_text(f"{some_word} zzzzunknownzzzz {some_word.upper()}")
    assert ids.tolist() == [ds.vocab[some_word], 0, ds.vocab[some_word]]


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_sgns_planted_synonyms_land_close(backend):
    """Planted-co-occurrence guard (VERDICT r4 #10) for BOTH backends:
    word 2j and 2j+1 always appear adjacent (synonym pairs in distinct
    sentences of zipfian filler); after training, a pair's centered
    cosine must beat random pairs by a clear margin — the signal the
    batched scatter-mean updates and the mean-centering deviation must
    preserve, since every review tower consumes these vectors frozen."""
    from reviews4rec_tpu.data.preprocess import train_word2vec

    rng = np.random.default_rng(1)
    n_pairs, n_fill = 30, 200
    fill_base = 1 + 2 * n_pairs
    zipf = 1.0 / np.arange(1, n_fill + 1)
    zipf /= zipf.sum()
    seqs = []
    for _ in range(600):
        j = rng.integers(0, n_pairs)
        fills = fill_base + rng.choice(n_fill, size=12, p=zipf)
        pos = rng.integers(0, 11)
        s = np.concatenate([fills[:pos], [1 + 2 * j, 2 + 2 * j],
                            fills[pos:]])
        seqs.append(s.astype(np.int64))
    V = fill_base + n_fill - 1
    vecs = train_word2vec(seqs, num_words=V, epochs=10, backend=backend,
                          seed=0)
    v = vecs[1:]
    vc = v - v.mean(0)
    nv = vc / (np.linalg.norm(vc, axis=1, keepdims=True) + 1e-9)
    pair_cos = np.mean([nv[2 * j] @ nv[2 * j + 1]
                        for j in range(n_pairs)])
    rand = rng.integers(0, len(nv), size=(500, 2))
    rand_cos = np.mean([nv[a] @ nv[b] for a, b in rand if a != b])
    assert pair_cos > rand_cos + 0.25, (backend, pair_cos, rand_cos)
