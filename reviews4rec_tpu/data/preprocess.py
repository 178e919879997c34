"""Offline preprocessing: raw Amazon-style JSON -> ReviewDataset.

Semantics mirror the reference pipeline
(`data_scripts/preprocess_random_split.py` + `make_negative_sets.py` +
`prep_all_data.sh`), re-architected as one pass emitting the array-
record corpus instead of six scripts and a pickle zoo:

- iterative k-core filtering to a fixpoint (reference `get_map`
  recursion, preprocess_random_split.py:67-86);
- tokenization + 50k-capped vocab with UNK=0 (`:30-48`, `:88-118`);
- 80/10/10 shuffle split (`:174-175`, `:226-241`);
- `percent_reviews_to_keep` review-text dropout on train only
  (`:186-191`) — ratings untouched;
- 64-d skip-gram word vectors trained on train reviews (the reference
  uses gensim Word2Vec(size=64, sg=1, window=1), `:244-253`; here a
  self-contained SGNS so the framework has zero extra deps);
- per-user negative candidate sets from the test split
  (`make_negative_sets.py:42-68`).
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .corpus import ReviewDataset, Split
from .tokenizer import build_vocab, tokenize


def load_amazon_json(path: str) -> List[Dict]:
    """JSON-lines Amazon review dumps (optionally .gz): one object per
    line with reviewerID/asin/overall/reviewText."""
    opener = gzip.open if path.endswith(".gz") else open
    recs = []
    with opener(path, "rt") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            recs.append({
                "reviewerID": r["reviewerID"],
                "asin": r["asin"],
                "overall": float(r["overall"]),
                "reviewText": r.get("reviewText", "") or "",
            })
    return recs


def load_ratebeer(path: str) -> List[Dict]:
    """RateBeer multi-line records (reference `load_beer`,
    preprocess_random_split.py:119-140): latin-1 text, one `key: value`
    field per line, blank line terminates a record. Ratings are
    "overall: N/20" — the numerator is kept, so the scale is 1..20
    (pass dataset name 'ratebeer' so the runtime picks rating_max=20,
    reference data.py:101-102)."""
    opener = gzip.open if path.endswith(".gz") else open
    recs: List[Dict] = []
    cur: Dict = {}
    with opener(path, "rb") as f:
        for raw in f:
            line = raw.strip().decode("latin-1")
            if not line:
                if cur:
                    recs.append(cur)
                cur = {}
                continue
            if line.startswith("beer/beerId"):
                cur["asin"] = line.split(":")[-1].strip()
            elif line.startswith("review/profileName"):
                cur["reviewerID"] = line.split(":")[-1].strip()
            elif line.startswith("review/overall"):
                cur["overall"] = float(line.split(":")[-1].split("/")[0])
            elif line.startswith("review/text"):
                cur["reviewText"] = line.split(":", 1)[-1].strip()
    if cur:
        recs.append(cur)
    out = []
    for r in recs:
        if not {"asin", "reviewerID", "overall"} <= r.keys():
            continue
        r.setdefault("reviewText", "")
        out.append(r)
    return out


def k_core_filter(recs: Sequence[Dict], k_core: int
                  ) -> Tuple[List[Dict], Dict[str, int], Dict[str, int]]:
    """Drop users/items with < k interactions until a fixpoint, then
    densify ids in first-appearance order (reference
    preprocess_random_split.py:67-86)."""
    kept = list(recs)
    while True:
        ucnt: Dict[str, int] = {}
        icnt: Dict[str, int] = {}
        for r in kept:
            ucnt[r["reviewerID"]] = ucnt.get(r["reviewerID"], 0) + 1
            icnt[r["asin"]] = icnt.get(r["asin"], 0) + 1
        nxt = [r for r in kept
               if ucnt[r["reviewerID"]] >= k_core
               and icnt[r["asin"]] >= k_core]
        if len(nxt) == len(kept):
            break
        kept = nxt

    umap: Dict[str, int] = {}
    imap: Dict[str, int] = {}
    for r in kept:
        if r["reviewerID"] not in umap:
            umap[r["reviewerID"]] = len(umap)
        if r["asin"] not in imap:
            imap[r["asin"]] = len(imap)
    return kept, umap, imap


# ----------------------------------------------------------------------
# Self-contained skip-gram-with-negative-sampling word vectors.
# ----------------------------------------------------------------------

def _sigmoid(x: np.ndarray) -> np.ndarray:
    """Overflow-free logistic: exp() only ever sees non-positive args."""
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def _train_sgns_jax(centers_a: np.ndarray, contexts_a: np.ndarray,
                    probs: np.ndarray, vec_in0: np.ndarray,
                    dim: int, epochs: int, negatives: int, lr: float,
                    seed: int) -> np.ndarray:
    """On-device SGNS: the same mini-batch updates as the numpy path
    (scatter-adds applied per batch), run as a `lax.scan` over batches —
    one jit per epoch. Negatives are drawn by inverse-CDF search against
    the unigram^0.75 table (a categorical over the 50k vocab would
    materialize a [batch, negs, V] gumbel). Deterministic under the jax
    PRNG; not bitwise the numpy path (different RNG streams)."""
    import jax
    import jax.numpy as jnp

    V = vec_in0.shape[0]
    n = len(centers_a)
    # adaptive batch: guarantee >= 64 updates/epoch on small corpora
    # (batched scatter-mean updates learn per-BATCH, not per-pair)
    bs = int(np.clip(n // 64, 256, 4096))
    n_batches = -(-n // bs)
    pad = n_batches * bs - n
    centers = jnp.asarray(
        np.concatenate([centers_a, np.zeros(pad)]).astype(np.int32))
    contexts = jnp.asarray(
        np.concatenate([contexts_a, np.zeros(pad)]).astype(np.int32))
    weight = jnp.asarray(
        (np.arange(n_batches * bs) < n).astype(np.float32))
    cdf = jnp.asarray(np.cumsum(probs).astype(np.float32))

    total_steps = max(epochs, 1) * n_batches

    @jax.jit
    def run_epoch(vin, vout, key, epoch_idx, centers, contexts, weight,
                  cdf):
        key, pk, nk = jax.random.split(key, 3)
        order = jax.random.permutation(pk, centers.shape[0])

        def body(state, i):
            vin, vout = state
            # linear lr decay over the whole run (gensim alpha ->
            # min_alpha schedule)
            step = epoch_idx * n_batches + i
            lr_t = jnp.maximum(lr * (1.0 - step / total_steps), 1e-4)
            sel = jax.lax.dynamic_slice(order, (i * bs,), (bs,))
            c = centers[sel]
            pos = contexts[sel]
            w = weight[sel]
            u = jax.random.uniform(jax.random.fold_in(nk, i),
                                   (bs, negatives))
            neg = jnp.clip(jnp.searchsorted(cdf, u, side="right"),
                           0, V - 1).astype(jnp.int32)
            targets = jnp.concatenate([pos[:, None], neg], 1)
            vi = vin[c]                                   # [b, d]
            vo = vout[targets]                            # [b, 1+k, d]
            score = jnp.einsum("bd,bkd->bk", vi, vo)
            label = jnp.zeros_like(score).at[:, 0].set(1.0)
            g = (jax.nn.sigmoid(score) - label) * lr_t * w[:, None]
            gi = jnp.einsum("bk,bkd->bd", g, vo)
            go = g[..., None] * vi[:, None, :]
            # scatter-MEAN over in-batch duplicates: summing overshoots
            # by the row's multiplicity and diverges on small vocabs
            # (multiplicity ~1 at real vocab scale, so this matches the
            # plain accumulate there)
            tflat = targets.reshape(-1)
            ci = jnp.zeros((V,)).at[c].add(1.0)
            co = jnp.zeros((V,)).at[tflat].add(1.0)
            vin = vin - jnp.zeros_like(vin).at[c].add(gi) \
                / jnp.maximum(ci, 1.0)[:, None]
            vout = vout - jnp.zeros_like(vout).at[tflat].add(
                go.reshape(-1, dim)) / jnp.maximum(co, 1.0)[:, None]
            return (vin, vout), None

        (vin, vout), _ = jax.lax.scan(body, (vin, vout),
                                      jnp.arange(n_batches))
        return vin, vout, key

    vin = jnp.asarray(vec_in0)
    vout = jnp.zeros_like(vin)
    key = jax.random.PRNGKey(seed)
    for ep in range(max(epochs, 1)):
        vin, vout, key = run_epoch(vin, vout, key, jnp.asarray(ep),
                                   centers, contexts, weight, cdf)
    return np.array(vin, np.float32)  # writable copy


def _center_table(vecs: np.ndarray) -> np.ndarray:
    """Zero the UNK/pad row and remove the common mean from the rest
    (see train_word2vec docstring)."""
    vecs = vecs.astype(np.float32)
    vecs[1:] -= vecs[1:].mean(axis=0, keepdims=True)
    vecs[0] = 0.0
    return vecs


def train_word2vec(token_lists: Sequence[np.ndarray], num_words: int,
                   dim: int = 64, epochs: int = 20, window: int = 1,
                   negatives: int = 64, lr: float = 0.05,
                   seed: int = 0, backend: str = "auto",
                   sample: float = 1e-3) -> np.ndarray:
    """SGNS over word-id sequences; returns [num_words + 1, dim] with
    row 0 (UNK/pad) zeroed. Defaults match the reference's gensim call
    Word2Vec(size=64, sg=1, window=1, negative=64, iter=20)
    (preprocess_random_split.py:245). Backends: "numpy" (mini-batched
    host loop, default for small corpora — deterministic across
    machines), "jax" (on-device lax.scan, the TPU path for real
    corpora), "auto" = jax once the pair count makes the host loop the
    preprocessing bottleneck.

    The returned table is MEAN-CENTERED (rows 1:): SGNS with 64
    negatives grows a large direction shared by every vector (the
    negative-sampling background; on a zipfian corpus the raw vectors
    reach pairwise cosine ~0.99, drowning the lexical signal the conv
    towers consume in a ~6% residual). Removing the common mean is the
    mean-only variant of all-but-the-top postprocessing (Mu &
    Viswanath 2018) and restores the co-occurrence geometry the
    downstream frozen-table models need — a deliberate deviation from
    raw gensim output, which carries the same artifact more mildly."""
    rng = np.random.default_rng(seed)
    V = num_words + 1
    vec_in = (rng.random((V, dim), np.float32) - 0.5) / dim
    vec_out = np.zeros((V, dim), np.float32)

    # frequent-word subsampling (gensim default sample=1e-3, which the
    # reference's Word2Vec call leaves ON): p_keep = (sqrt(f/s)+1)*s/f.
    # Besides fidelity, this caps in-batch duplicate multiplicity so the
    # batched scatter updates stay close to sequential SGD.
    if sample and sample > 0:
        total = sum(int(np.count_nonzero(np.asarray(t))) 
                    for t in token_lists) or 1
        cnt = np.zeros(V, np.int64)
        for t in token_lists:
            a = np.asarray(t, np.int64)
            cnt += np.bincount(a[a > 0], minlength=V)
        f = cnt / total
        with np.errstate(divide="ignore", invalid="ignore"):
            keep = (np.sqrt(f / sample) + 1.0) * (sample / np.maximum(f, 1e-12))
        keep = np.clip(np.nan_to_num(keep, nan=1.0), 0.0, 1.0)
        keep[0] = 0.0
    else:
        keep = np.ones(V)

    centers: List[np.ndarray] = []
    contexts: List[np.ndarray] = []
    for toks in token_lists:
        t = np.asarray(toks, np.int64)
        t = t[t > 0]
        if sample and sample > 0 and len(t):
            t = t[rng.random(len(t)) < keep[t]]
        for off in range(1, window + 1):
            if len(t) > off:
                centers.append(t[:-off])
                contexts.append(t[off:])
                centers.append(t[off:])
                contexts.append(t[:-off])
    if not centers:
        return _center_table(vec_in)
    centers_a = np.concatenate(centers)
    contexts_a = np.concatenate(contexts)

    # unigram^(3/4) negative-sampling table
    freq = np.bincount(contexts_a, minlength=V).astype(np.float64)
    probs = freq ** 0.75
    probs[0] = 0.0
    probs /= probs.sum()

    n = len(centers_a)
    if backend == "jax" or (backend == "auto" and n >= 500_000):
        return _center_table(
            _train_sgns_jax(centers_a, contexts_a, probs, vec_in,
                            dim, epochs, negatives, lr, seed))

    bs = int(np.clip(n // 64, 256, 4096))
    total_steps = max(epochs, 1) * (-(-n // bs))
    step = 0
    for _ in range(max(epochs, 1)):
        order = rng.permutation(n)
        for s in range(0, n, bs):
            lr_t = max(lr * (1.0 - step / total_steps), 1e-4)
            step += 1
            sel = order[s:s + bs]
            c = centers_a[sel]
            pos = contexts_a[sel]
            neg = rng.choice(V, size=(len(sel), negatives), p=probs)
            vi = vec_in[c]                                   # [b, d]
            targets = np.concatenate([pos[:, None], neg], 1)  # [b, 1+k]
            vo = vec_out[targets]                            # [b, 1+k, d]
            score = np.einsum("bd,bkd->bk", vi, vo)
            label = np.zeros_like(score)
            label[:, 0] = 1.0
            g = (_sigmoid(score) - label) * lr_t             # [b, 1+k]
            gi = np.einsum("bk,bkd->bd", g, vo)
            go = g[..., None] * vi[:, None, :]
            # scatter-MEAN over in-batch duplicates (see jax path)
            tflat = targets.reshape(-1)
            upd_i = np.zeros_like(vec_in)
            np.add.at(upd_i, c, gi)
            ci = np.bincount(c, minlength=V)[:, None]
            vec_in -= upd_i / np.maximum(ci, 1)
            upd_o = np.zeros_like(vec_out)
            np.add.at(upd_o, tflat, go.reshape(-1, dim))
            co = np.bincount(tflat, minlength=V)[:, None]
            vec_out -= upd_o / np.maximum(co, 1)
    return _center_table(vec_in)


# ----------------------------------------------------------------------

def build_negatives(test: Split, num_negs: int = 5, seed: int = 0
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-user candidate rows from the TEST split: column 0 = one
    positive (rating >= 4.9), columns 1..num_negs = distinct sampled
    items the user rated < 4.9; users lacking either are skipped
    (reference make_negative_sets.py:42-68)."""
    rng = np.random.default_rng(seed)
    by_user: Dict[int, List[Tuple[int, float]]] = {}
    for u, i, r in zip(test.user, test.item, test.rating):
        by_user.setdefault(int(u), []).append((int(i), float(r)))

    users: List[int] = []
    cands: List[List[int]] = []
    for u in sorted(by_user):
        pos = [i for i, r in by_user[u] if r >= 4.9]
        neg = [i for i, r in by_user[u] if r < 4.9]
        if not pos or len(neg) < num_negs:
            continue
        p = int(rng.choice(pos))
        ns = rng.choice(len(neg), size=num_negs, replace=False)
        users.append(u)
        cands.append([p] + [neg[j] for j in ns])
    if not users:
        return np.zeros(0, np.int32), np.zeros((0, 1 + num_negs), np.int32)
    return (np.asarray(users, np.int32),
            np.asarray(cands, np.int32))


def preprocess(recs: Sequence[Dict], k_core: int = 5,
               percent_reviews_to_keep: int = 100,
               vocab_cap: int = 50000, w2v_epochs: int = 20,
               w2v_backend: str = "auto",
               seed: int = 0, verbose=print) -> ReviewDataset:
    """Full offline pipeline; see module docstring."""
    rng = np.random.default_rng(seed)
    kept, umap, imap = k_core_filter(recs, k_core)
    verbose(f"k-core({k_core}): {len(kept)}/{len(recs)} interactions, "
            f"{len(umap)} users, {len(imap)} items")

    # dedup (u, i) keeping the first occurrence
    seen = set()
    uniq = []
    for r in kept:
        key = (umap[r["reviewerID"]], imap[r["asin"]])
        if key in seen:
            continue
        seen.add(key)
        uniq.append((key[0], key[1], float(r["overall"]),
                     tokenize(r["reviewText"])))

    word_map, num_words = build_vocab([t for *_, t in uniq], cap=vocab_cap)
    verbose(f"vocab: {num_words} words")
    token_ids = [np.asarray([word_map[w] for w in toks], np.int32)
                 for *_, toks in uniq]

    n = len(uniq)
    order = rng.permutation(n)
    n_train = int(0.8 * n)
    n_test = (n - n_train + 1) // 2
    idx = {"train": order[:n_train],
           "test": order[n_train:n_train + n_test],
           "val": order[n_train + n_test:]}
    splits = {
        s: Split(np.asarray([uniq[j][0] for j in ix], np.int32),
                 np.asarray([uniq[j][1] for j in ix], np.int32),
                 np.asarray([uniq[j][2] for j in ix], np.float32))
        for s, ix in idx.items()}

    num_users, num_items = len(umap), len(imap)
    user_reviews: List[List[np.ndarray]] = [[] for _ in range(num_users)]
    item_reviews: List[List[np.ndarray]] = [[] for _ in range(num_items)]
    u_to_i: List[List[int]] = [[] for _ in range(num_users)]
    i_to_u: List[List[int]] = [[] for _ in range(num_items)]
    this_index: Dict[Tuple[int, int], Tuple[int, int]] = {}
    train_texts: List[np.ndarray] = []
    for j in idx["train"]:
        u, i, _, _ = uniq[j]
        toks = token_ids[j]
        # review-text dropout, train only (ratings untouched;
        # preprocess_random_split.py:186-191)
        if percent_reviews_to_keep < 100 and \
                rng.random() * 100 >= percent_reviews_to_keep:
            toks = np.zeros(0, np.int32)
        this_index[(u, i)] = (len(user_reviews[u]), len(item_reviews[i]))
        user_reviews[u].append(toks)
        item_reviews[i].append(toks)
        u_to_i[u].append(i)
        i_to_u[i].append(u)
        train_texts.append(toks)

    test_reviews = {(uniq[j][0], uniq[j][1]): token_ids[j]
                    for s in ("test", "val") for j in idx[s]}

    word_vectors = train_word2vec(train_texts, num_words,
                                  epochs=w2v_epochs, seed=seed,
                                  backend=w2v_backend)
    neg_users, neg_cands = build_negatives(splits["test"], seed=seed)
    verbose(f"split sizes train/test/val = {len(splits['train'])}/"
            f"{len(splits['test'])}/{len(splits['val'])}; "
            f"{len(neg_users)} users with negative sets")

    return ReviewDataset.build(
        num_users=num_users, num_items=num_items, num_words=num_words,
        splits=splits, user_reviews=user_reviews,
        item_reviews=item_reviews, u_to_i=u_to_i, i_to_u=i_to_u,
        this_index=this_index, test_reviews=test_reviews,
        neg_users=neg_users, neg_cands=neg_cands,
        word_vectors=word_vectors,
        vocab={w: j for w, j in word_map.items() if j > 0})


def main(argv: Optional[List[str]] = None) -> None:
    """CLI equivalent of `./prep_all_data.sh <name> <file.json>`
    (reference prep_all_data.sh:4-5)."""
    p = argparse.ArgumentParser(description="preprocess a raw review dump")
    p.add_argument("name", help="dataset name")
    p.add_argument("raw", help="path to JSON-lines review dump (.json/.gz)")
    p.add_argument("--k-core", type=int, default=5)
    p.add_argument("--format", choices=("amazon", "ratebeer"), default=None,
                   help="raw format; default: ratebeer iff name is "
                        "'ratebeer' (reference preprocess_random_split.py"
                        ":148-150)")
    p.add_argument("--percent", type=int, default=100,
                   help="percent of train review text to keep")
    p.add_argument("--out", default="data", help="output data root")
    p.add_argument("--w2v-epochs", type=int, default=20)
    p.add_argument("--w2v-backend", choices=("auto", "numpy", "jax"),
                   default="auto",
                   help="SGNS backend: numpy host loop or on-device "
                        "lax.scan; auto picks jax for large corpora")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    # honor JAX_PLATFORMS under sitecustomize-forced platforms (same
    # rationale as the training CLI)
    if os.environ.get("JAX_PLATFORMS"):
        try:
            import jax
            jax.config.update("jax_platforms",
                              os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    fmt = args.format or ("ratebeer" if args.name == "ratebeer" else "amazon")
    loader = load_ratebeer if fmt == "ratebeer" else load_amazon_json
    ds = preprocess(loader(args.raw), k_core=args.k_core,
                    percent_reviews_to_keep=args.percent,
                    w2v_epochs=args.w2v_epochs, seed=args.seed,
                    w2v_backend=args.w2v_backend)
    out = os.path.join(args.out, args.name, f"{args.k_core}_core")
    if args.percent != 100:
        out = os.path.join(out, f"{args.percent}_percent")
    ds.save(out)
    print(f"saved {out}/corpus.npz")


if __name__ == "__main__":
    main()
