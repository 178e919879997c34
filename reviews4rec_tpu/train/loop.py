"""Unified training loop.

One jit-compiled train step + one epoch driver serves every gradient
model family, replacing the reference's per-family loops
(`main.py:8-136`). Matches the reference dynamics:

- Adam with additive (non-decoupled) L2 weight decay, the torch
  `Adam(weight_decay=...)` semantics (`main.py:95-97`).
- per-batch loss = mean squared error over real examples (padding rows
  are masked out; the reference instead shrinks the final batch).
- best-validation-MSE parameter snapshot per epoch (`main.py:123-126`).
- TransNet's three interleaved optimizers (`main.py:35-53`,
  `utils.py:70-92`) are re-derived as a single step with stop_gradient
  routing: each parameter partition receives exactly the gradient of the
  loss whose optimizer stepped it in the reference (target net <- target
  MSE; source towers <- transform L2; source FM + id embeddings <-
  source MSE). Because the reference zeroes all grads every batch and
  never steps `optimizer_all`, and Adam is elementwise, a single Adam
  over the routed combined loss computes identical updates.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import HyperParams
from ..data.batcher import Batcher
from ..utils.logging import file_write, log_end_epoch


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _trainable_mask(params):
    """False for the frozen `word_vectors` tables (layers.py
    frozen_word_table): like torch params with requires_grad=False they
    never reach the optimizer — no Adam moments, no weight decay. Their
    gradients are zero (stop_gradient), and optax.masked passes the
    zero update through untouched."""
    def trainable(path, _leaf):
        last = path[-1]
        name = getattr(last, "key", getattr(last, "name", str(last)))
        return name != "word_vectors"
    return jax.tree_util.tree_map_with_path(trainable, params)


def make_optimizer(hp: HyperParams) -> optax.GradientTransformation:
    if hp.model_type == "MPCN":
        # The MPCN stack trains with Adam(1e-3), global-norm clip 1 and
        # L2 1e-8 (MPCN/parser.py:92-99,160-163; model.py:735-741 adds
        # l2_reg * sum(l2_loss(w)) to the cost, whose gradient is
        # l2_reg * w, i.e. additive decay before clipping).
        inner = optax.chain(
            optax.add_decayed_weights(hp.mpcn_l2),
            optax.clip_by_global_norm(hp.mpcn_clip_norm),
            optax.adam(hp.mpcn_lr),
        )
    else:
        inner = optax.chain(
            optax.add_decayed_weights(hp.weight_decay),
            optax.adam(hp.lr),
        )
    return optax.masked(inner, _trainable_mask)


def _batch_loss(preds, batch, model_type: str, loss_name: str = "RAW_MSE",
                hinge_margin: float = 0.2):
    """Masked per-batch loss + squared-error accumulators.

    RAW_MSE operates on pointwise rating batches; CE/BPR/HINGE (the
    reference MPCN loss surface, model.py:701-733, via train/losses.py)
    operate on [B, C] candidate-grid batches with the positive in
    column 0 (data/corpus.py::materialize_train_negs). For ranking
    losses the "sq" accumulators carry the loss itself, so the epoch
    banner reports mean training loss."""
    w = batch["weight"]
    y = batch["rating"]
    if model_type in ("transnet", "transnet++"):
        source, target, trans_loss = preds
        sq_src = (source - y) ** 2
        # Routed multi-loss (see module docstring). `trans_loss` and the
        # stop_gradient routing are computed inside the model.
        loss = (jnp.sum(sq_src * w) / jnp.maximum(jnp.sum(w), 1.0)
                + jnp.sum((target - y) ** 2 * w) / jnp.maximum(jnp.sum(w), 1.0)
                + trans_loss)
        sq = sq_src
    elif loss_name == "RAW_MSE":
        sq = (preds - y) ** 2
        loss = jnp.sum(sq * w) / jnp.maximum(jnp.sum(w), 1.0)
    else:
        from .losses import bpr, hinge, softmax_ce
        pos, neg = preds[:, :1], preds[:, 1:]
        wn = jnp.broadcast_to(w[:, None], neg.shape)
        if loss_name == "CE":
            labels = jax.nn.one_hot(jnp.zeros(preds.shape[0], jnp.int32),
                                    preds.shape[1])
            loss = softmax_ce(preds, labels, w)
        elif loss_name == "BPR":
            loss = bpr(pos, neg, wn)
        elif loss_name == "HINGE":
            # reference hinge reduces by sum (model.py:727-733);
            # normalize by batch rows to keep lr scale-independent
            loss = hinge(pos, neg, hinge_margin, wn) \
                / jnp.maximum(jnp.sum(w), 1.0)
        else:
            raise ValueError(f"unknown loss {loss_name!r}")
        wsum = jnp.sum(w)
        return loss, (loss * wsum, wsum)
    return loss, (jnp.sum(sq * w), jnp.sum(w))


def _make_update(apply_fn: Callable,
                 optimizer: optax.GradientTransformation,
                 model_type: str, loss_name: str, hinge_margin: float):
    """The single SGD update shared by every step builder (per-step,
    scanned, cached): loss + grads + optimizer apply on one batch."""

    def update(state: TrainState, batch, rng):
        def loss_fn(params):
            preds = apply_fn(params, batch, True, rng)
            return _batch_loss(preds, batch, model_type, loss_name,
                               hinge_margin)

        (loss, (sq_sum, n)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                (loss, sq_sum, n))

    return update


def _donate():
    # donate_argnums=0: the previous TrainState's buffers are dead after
    # the update, so XLA reuses them in place — halves HBM traffic for
    # params/opt state. Snapshots of params that must outlive a step are
    # copied first (see train_complete). CPU has no donation support, so
    # skip it there to avoid per-compile warnings in tests.
    return (0,) if jax.default_backend() != "cpu" else ()


def make_train_step(apply_fn: Callable, optimizer: optax.GradientTransformation,
                    model_type: str, loss_name: str = "RAW_MSE",
                    hinge_margin: float = 0.2):
    update = _make_update(apply_fn, optimizer, model_type, loss_name,
                          hinge_margin)

    @partial(jax.jit, donate_argnums=_donate())
    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        state, (loss, sq_sum, n) = update(state, batch, rng)
        return state, {"loss": loss, "sq_sum": sq_sum, "n": n}

    return train_step


def make_scan_train_step(apply_fn: Callable,
                         optimizer: optax.GradientTransformation,
                         model_type: str, loss_name: str = "RAW_MSE",
                         hinge_margin: float = 0.2):
    """Scanned multi-batch train step (SURVEY.md §7.2): one dispatch
    executes S sequential SGD updates via `lax.scan` over a stacked
    [S, B, ...] super-batch — the identical per-batch computation and
    update order as S `train_step` dispatches (tested bitwise), at one
    host->device dispatch instead of S. Dispatch latency dominates
    sub-millisecond steps (the MF family) and is visible for every model
    through a remote/tunneled TPU."""
    update = _make_update(apply_fn, optimizer, model_type, loss_name,
                          hinge_margin)

    @partial(jax.jit, donate_argnums=_donate())
    def scan_step(state: TrainState, batches, rngs) -> Tuple[TrainState,
                                                             Dict]:
        def body(st, xs):
            batch, rng = xs
            return update(st, batch, rng)

        state, (losses, sqs, ns) = jax.lax.scan(body, state,
                                                (batches, rngs))
        return state, {"loss": losses[-1], "sq_sum": jnp.sum(sqs),
                       "n": jnp.sum(ns)}

    return scan_step


# Doc tensors that embed through the FROZEN word table — the keys the
# device cache pre-embeds (hp.cache_doc_embeds).
DOC_KEYS = ("user_doc", "item_doc", "this_doc")


def doc_cache_keys(model_type: str, sides: str = "both"
                   ) -> Tuple[Tuple[str, ...], Tuple[str, ...]]:
    """(embed_keys, id_keys) for the device cache.

    embed_keys are pre-embedded through the frozen table; id_keys stay
    raw int32 ids on device (embedded in-jit by the model — bitwise
    identical, but the cache costs 4 bytes/word instead of 2*E).
    deepconn/NARRE never consume `this_doc` (models/deepconn.py:42-45,
    narre.py:52-56) so it is dropped from the cache entirely — caching
    it would carry an unused [T, E]/[R, W, E] float array per example.
    `sides` (hp.cache_sides) restricts pre-embedding to one doc side
    for splits whose full float cache exceeds HBM; `this_doc` (the
    held-out review) counts as item-side. "ids" pre-embeds NOTHING:
    every doc side stays raw int32 on device (~4 bytes/word — the
    whole split's docs fit HBM at any realistic scale), so the train
    step still consumes only [B] row indices from the host while the
    models embed in-jit; this is the reference's own "kill host work"
    tier (data_fast.py:24-119) at its cheapest memory point."""
    read = (DOC_KEYS if model_type in ("transnet", "transnet++")
            else ("user_doc", "item_doc"))
    side_of = {"user_doc": "user", "item_doc": "item", "this_doc": "item"}
    if sides == "both":
        embed = read
    elif sides == "ids":
        embed = ()
    elif sides in ("item", "user"):
        embed = tuple(k for k in read if side_of[k] == sides)
    else:
        raise ValueError(f"cache_sides must be both|item|user|ids, "
                         f"got {sides!r}")
    return embed, tuple(k for k in read if k not in embed)


def build_doc_cache(records: Dict, word_vectors, dtype,
                    paired_window: Optional[int] = None,
                    keys: Tuple[str, ...] = DOC_KEYS,
                    id_keys: Tuple[str, ...] = (),
                    chunk_words: int = 4_096_000) -> Dict:
    """Device-resident record cache with the frozen-table doc tensors
    PRE-EMBEDDED (int ids [..., T] -> float [..., T, E]): the word table
    never changes, so each example's doc embedding is static for the
    whole run; one up-front gather replaces one per step. Every other
    record array is device_put as-is; the per-step host input shrinks to
    the [B] row indices. `dtype` must match what the consuming conv
    branch would cast to (bf16 for the TPU Pallas path, hp.compute_dtype
    for the XLA path) so cached and uncached runs are bitwise-identical.

    With `paired_window` (the Pallas paired-layout path,
    `paired_window_for`), docs are stored as the kernel's PADDED PAIRED
    operand ([..., T, E] -> [..., L2, 2E], textcnn_pallas.paired_operand)
    so the per-step relayout pass — as expensive as the kernel itself,
    and otherwise built twice per tower (forward + backward) — is
    hoisted out of the step entirely.

    `keys` limits which DOC_KEYS are pre-embedded and `id_keys` which
    stay raw int ids on device (doc_cache_keys / hp.cache_sides); a doc
    tensor in neither set is dropped from the cache entirely — no HBM,
    no per-step gather bandwidth.

    The embedding is built CHUNKED on device: embedding a whole split in
    one op needs transient HBM ≈ 2x the final array (gather output +
    relayout copy), which OOMs exactly the large splits the cache is
    for (e2e: 10.2 GB final, >20 GB transient). Instead chunks of
    examples are embedded and written into one preallocated buffer via
    a donated dynamic_update_slice — peak HBM = buffer + one chunk."""
    table = jnp.asarray(word_vectors).astype(dtype)

    def embed(ids: np.ndarray):
        emb = jnp.take(table, jnp.asarray(ids), axis=0)
        if paired_window is not None:
            from ..ops.textcnn_pallas import paired_operand
            lead, tail = emb.shape[:-2], emb.shape[-2:]
            pp = paired_operand(emb.reshape((-1,) + tail),
                                paired_window, dtype)
            emb = pp.reshape(lead + pp.shape[1:])
        return emb.astype(dtype)

    @partial(jax.jit, donate_argnums=_donate())
    def write(buf, chunk, start):
        # traced start: ONE compile per chunk shape (full + tail), not
        # one per offset; donation makes the update in-place
        idx = (start,) + (jnp.zeros((), jnp.int32),) * (buf.ndim - 1)
        return jax.lax.dynamic_update_slice(buf, chunk, idx)

    cache = {}
    for k, v in records.items():
        if k in DOC_KEYS and k not in keys and k not in id_keys:
            continue
        if k in DOC_KEYS and k in keys:
            ids = np.asarray(v)
            n = ids.shape[0]
            step = max(1, chunk_words // max(
                int(np.prod(ids.shape[1:])), 1))
            first = embed(ids[:min(step, n)])
            if n <= step:
                cache[k] = first
                continue
            buf = jnp.zeros((n,) + first.shape[1:], first.dtype)
            buf = write(buf, first, start=0)
            for s in range(step, n, step):
                e = min(s + step, n)
                buf = write(buf, embed(ids[s:e]), start=s)
            cache[k] = buf
        else:
            cache[k] = jnp.asarray(np.asarray(v))
    return cache


class EntityCache(NamedTuple):
    """Device-resident ENTITY doc cache (hp.cache_entity): `example`
    holds the small per-example arrays (ids, rating, leakage-mask
    spans), `tables` the canonical per-entity doc stores keyed by the
    record name they materialize into ("user_doc" -> [U, ...],
    "item_doc" -> [I, ...]; float prepaired/plain or raw ids per
    hp.cache_sides). Both parts are ordinary device arrays, so the
    tuple flows through jit as a pytree."""

    example: Dict
    tables: Dict


ENTITY_ID_KEY = {"user_doc": "user", "item_doc": "item",
                 # NARRE neighbor-id context lists: users who reviewed
                 # the ITEM / items the USER reviewed (narre.py:59-62)
                 "users_who_gave": "item", "items_reviewed": "user"}


def gather_cached_batch(cache, rows, weight) -> Dict:
    """In-jit batch assembly shared by the cached train and eval steps:
    gather [B] example rows; with an EntityCache additionally gather
    each doc side's canonical row by the example's entity id (a second
    bandwidth-trivial whole-row gather). Tables stored under a
    `<doc>__table` key (hp.pallas_fuse_rows) are passed through WHOLE —
    the model's fused kernels gather rows inside their own DMA."""
    if isinstance(cache, EntityCache):
        batch = {k: jnp.take(v, rows, axis=0)
                 for k, v in cache.example.items()}
        for dk, table in cache.tables.items():
            if dk.endswith("__table"):
                batch[dk] = table
            else:
                batch[dk] = jnp.take(table, batch[ENTITY_ID_KEY[dk]],
                                     axis=0)
    else:
        batch = {k: jnp.take(v, rows, axis=0) for k, v in cache.items()}
    batch["weight"] = weight
    return batch


def build_entity_cache(records: Dict, entity_docs: Dict, word_vectors,
                       dtype, paired_window: Optional[int] = None,
                       keys: Tuple[str, ...] = (),
                       id_keys: Tuple[str, ...] = (),
                       fuse_rows: bool = False) -> EntityCache:
    """EntityCache from per-example `records` (materialize_entity) and
    canonical `entity_docs` ({"user_doc": [U, T], "item_doc": [I, T]}
    int32). Doc tables embed/pair exactly like the per-example cache
    (`build_doc_cache` machinery, so cached bytes are bitwise the same
    function of the docs). `fuse_rows` stores the float tables under
    `<doc>__table` keys so the batch carries the WHOLE table and the
    models' fused kernels gather rows in their own DMA
    (hp.pallas_fuse_rows)."""
    tables = build_doc_cache(entity_docs, word_vectors, dtype,
                             paired_window=paired_window, keys=keys,
                             id_keys=id_keys)
    if fuse_rows:
        tables = {(k + "__table" if k in keys else k): v
                  for k, v in tables.items()}
    example = {k: jnp.asarray(np.asarray(v)) for k, v in records.items()}
    return EntityCache(example=example, tables=tables)


def entity_supported(hp: HyperParams) -> bool:
    """Whether `hp.model_type` has an entity doc store (the towers the
    entity cache/eval applies to)."""
    return hp.model_type in ("deepconn", "deepconn++", "NARRE",
                             "transnet", "transnet++")


def build_entity_tables(hp: HyperParams, dataset) -> Dict:
    """The canonical per-entity doc (and, for NARRE, neighbor) tables
    as device arrays in the model's consumption form (float
    prepaired/plain or raw ids per hp.cache_sides) — the shared builder
    for the entity TRAIN cache and the entity EVAL/serving paths.
    MPCN's tables are always raw ids (its word table is TRAINED; the
    embedding happens in-jit)."""
    from ..data.corpus import _doc_layout

    pw = paired_window_for(hp)
    sides = "ids" if hp.model_type == "MPCN" else hp.cache_sides
    ck, idk = doc_cache_keys(hp.model_type, sides)
    # this_doc is per-example (transnet) — never a table
    ck = tuple(k for k in ck if k != "this_doc")
    idk = tuple(k for k in idk if k != "this_doc")
    rows, words = _doc_layout(hp)
    if rows > 1:
        udocs, idocs, who_gave, reviewed = dataset._entity_rows_docs(
            rows, words, 10, hp.user_pad_id, hp.item_pad_id)
        entity_docs = {"user_doc": udocs, "item_doc": idocs}
        if hp.model_type == "NARRE":
            entity_docs.update(users_who_gave=who_gave,
                               items_reviewed=reviewed)
    else:
        (udocs, _), (idocs, _) = dataset._entity_spans(words)
        entity_docs = {"user_doc": udocs, "item_doc": idocs}
    return build_doc_cache(entity_docs, dataset.word_vectors,
                           cache_dtype_for(hp), paired_window=pw,
                           keys=ck, id_keys=idk)


def paired_window_for(hp: HyperParams) -> Optional[int]:
    """Conv window when the doc cache should store Pallas paired
    operands; None when the plain [..., T, E] layout applies (XLA path,
    fused-gather A/B, or a word width the paired layout can't take)."""
    if (hp.use_pallas and hp.word_embed_size == 64
            and not hp.pallas_fuse_gather and not hp.seq_parallel):
        return 3  # the TextCNN window (reference geometry)
    return None


def make_cached_train_step(apply_fn: Callable,
                           optimizer: optax.GradientTransformation,
                           model_type: str, loss_name: str = "RAW_MSE",
                           hinge_margin: float = 0.2,
                           scan_steps: int = 1):
    """Train step over a device-resident cache: the batch is assembled
    IN-JIT by gathering [B] whole rows from the cached record arrays
    (rows are 100s of KB — the gather is bandwidth-trivial, unlike the
    per-word table gather it replaces). With `scan_steps` > 1 the rows
    come stacked [S, B] and the updates run under `lax.scan`."""
    update = _make_update(apply_fn, optimizer, model_type, loss_name,
                          hinge_margin)
    gather = gather_cached_batch

    if scan_steps > 1:
        @partial(jax.jit, donate_argnums=_donate())
        def cached_scan_step(state, cache, rows, weights, rngs):
            def body(st, xs):
                r, w, k = xs
                return update(st, gather(cache, r, w), k)

            state, (losses, sqs, ns) = jax.lax.scan(
                body, state, (rows, weights, rngs))
            return state, {"loss": losses[-1], "sq_sum": jnp.sum(sqs),
                           "n": jnp.sum(ns)}

        return cached_scan_step

    @partial(jax.jit, donate_argnums=_donate())
    def cached_step(state, cache, rows, weight, rng):
        state, (loss, sq_sum, n) = update(state,
                                          gather(cache, rows, weight),
                                          rng)
        return state, {"loss": loss, "sq_sum": sq_sum, "n": n}

    return cached_step


def make_placer(mesh, stacked: bool = False) -> Callable:
    """Host batch -> device batch. With a mesh: shard rows over the data
    axis (each host contributes only its slice under multi-host);
    without: a plain transfer. `stacked=True` places a scan-stacked
    [S, B, ...] super-batch (rows on dim 1, scan dim unsharded)."""
    if mesh is None:
        return lambda batch: jax.tree_util.tree_map(jnp.asarray, batch)
    from ..parallel.mesh import host_slice, shard_batch
    axis = 1 if stacked else 0
    return lambda batch: shard_batch(host_slice(batch, axis=axis), mesh,
                                     axis=axis)


def _epoch_keys(rng, n: int) -> np.ndarray:
    """All of an epoch's per-step RNG keys from ONE batched split,
    fetched to host once. The previous sequential `rng, k = split(rng)`
    chain issued one tiny device op PER BATCH — on a tunneled chip each
    occupies a dispatch slot, so a scan-10 epoch paid ~11 dispatches
    per group instead of 1. Every epoch driver (plain, scanned, cached)
    derives its keys from this same array, so cross-path bitwise parity
    is preserved (the stream itself differs from the r4 sequential
    chain — a one-time, documented change)."""
    if n <= 0:
        return np.zeros((0, 2), np.uint32)
    return np.asarray(jax.random.split(rng, n))


def _lookahead(it, depth: int = 2):
    """Run the (eagerly-placing) iterator `depth` items ahead of
    consumption so host->device copies overlap the previous step's
    compute (the tunneled TPU makes transfer latency visible)."""
    import collections

    buf = collections.deque()
    for item in it:
        buf.append(item)
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def _prefetch(batcher, place: Callable, depth: int = 2):
    """Move batches to device `depth` steps ahead of consumption."""
    return _lookahead((place(batch) for batch in batcher), depth)


def train_epoch(train_step, state: TrainState, batcher: Batcher,
                rng, place: Optional[Callable] = None, *,
                scan_step=None, scan_steps: int = 1,
                place_stacked: Optional[Callable] = None
                ) -> Tuple[TrainState, Dict]:
    """One epoch of SGD. With `scan_step`/`scan_steps` > 1, consecutive
    batches are stacked into [S, B, ...] super-batches and each group
    runs as ONE `lax.scan` dispatch (make_scan_train_step) — the same
    updates in the same order as the per-step path (the per-batch RNG
    split stream is reproduced exactly), so the two paths are bitwise
    interchangeable; a trailing group smaller than S falls back to
    `train_step` (zero-weight padding batches would still apply weight
    decay)."""
    from .profiler import Throughput, annotate

    tp = Throughput()
    if place is None:
        place = make_placer(None)
    # Accumulate metrics as device scalars: a float() per step would
    # block on the device and serialize dispatch; one sync per epoch
    # keeps the step pipeline full.
    sq_sum = jnp.zeros(())
    n = jnp.zeros(())
    bs = batcher.batch_size
    n_steps = -(-batcher.n // max(bs, 1))
    keys = _epoch_keys(rng, n_steps)
    use_scan = scan_step is not None and scan_steps > 1
    if not use_scan:
        remaining = batcher.n
        for i, batch in enumerate(_prefetch(batcher, place)):
            with annotate("train_step"):
                state, m = train_step(state, batch, keys[i])
            sq_sum = sq_sum + m["sq_sum"]
            n = n + m["n"]
            tp.add(min(bs, remaining))  # host-side count, no device sync
            remaining -= bs
        sq_sum = float(sq_sum)
        n = float(n)
        return state, {"MSE": round(sq_sum / max(n, 1.0), 4),
                       **tp.metrics()}

    if place_stacked is None:
        place_stacked = make_placer(None)

    def grouped():
        group, grngs, counts, left, i = [], [], [], batcher.n, 0
        for batch in batcher:
            group.append(batch)
            grngs.append(keys[i])
            i += 1
            counts.append(min(bs, left))
            left -= bs
            if len(group) == scan_steps:
                stacked = {k: np.stack([b[k] for b in group])
                           for k in group[0]}
                yield (scan_step, place_stacked(stacked),
                       jnp.asarray(np.stack(grngs)), sum(counts))
                group, grngs, counts = [], [], []
        for batch, step_rng, c in zip(group, grngs, counts):
            yield (train_step, place(batch), step_rng, c)

    for step_fn, placed, step_rng, count in _lookahead(grouped()):
        with annotate("train_step"):
            state, m = step_fn(state, placed, step_rng)
        sq_sum = sq_sum + m["sq_sum"]
        n = n + m["n"]
        tp.add(count)
    sq_sum = float(sq_sum)
    n = float(n)
    return state, {"MSE": round(sq_sum / max(n, 1.0), 4), **tp.metrics()}


def train_epoch_cached(cached_step, cached_scan_step, state: TrainState,
                       cache: Dict, batcher: Batcher, rng,
                       scan_steps: int = 1,
                       place: Optional[Callable] = None,
                       place_stacked: Optional[Callable] = None
                       ) -> Tuple[TrainState, Dict]:
    """One epoch over the device-resident cache. `batcher` iterates
    {"row": [B] indices, "weight": [B]} (a Batcher over
    {"row": arange(n)}), so the shuffle stream is the record Batcher's
    exactly and the cached path is bitwise-interchangeable with the
    uncached one. Padded tail rows gather row 0's records instead of
    zeros — their weight is 0, so loss and gradients are exactly the
    padded-batch values (every loss term is weight-masked). Full scan
    groups run as one dispatch; a smaller trailing group falls back to
    the per-batch cached step.

    With a mesh, `place`/`place_stacked` shard the {"row", "weight"}
    batches over the data axis (make_placer) — the cache itself is
    row-sharded by parallel.mesh.shard_cache."""
    from .profiler import Throughput, annotate

    if place is None:
        place = make_placer(None)
    if place_stacked is None:
        place_stacked = make_placer(None)
    tp = Throughput()
    sq_sum = jnp.zeros(())
    n = jnp.zeros(())
    bs = batcher.batch_size
    remaining = batcher.n
    keys = _epoch_keys(rng, -(-batcher.n // max(bs, 1)))
    group = []
    for i, batch in enumerate(batcher):
        group.append((batch["row"].astype(np.int32), batch["weight"],
                      keys[i], min(bs, remaining)))
        remaining -= bs
        if scan_steps > 1 and len(group) == scan_steps:
            placed = place_stacked(
                {"row": np.stack([g[0] for g in group]),
                 "weight": np.stack([g[1] for g in group])})
            ks = jnp.asarray(np.stack([g[2] for g in group]))
            with annotate("train_step"):
                state, m = cached_scan_step(state, cache, placed["row"],
                                            placed["weight"], ks)
            sq_sum = sq_sum + m["sq_sum"]
            n = n + m["n"]
            tp.add(sum(g[3] for g in group))
            group = []
        elif scan_steps <= 1:
            r, w, k, count = group.pop()
            placed = place({"row": r, "weight": w})
            with annotate("train_step"):
                state, m = cached_step(state, cache, placed["row"],
                                       placed["weight"], k)
            sq_sum = sq_sum + m["sq_sum"]
            n = n + m["n"]
            tp.add(count)
    for r, w, k, count in group:  # trailing sub-scan group
        placed = place({"row": r, "weight": w})
        with annotate("train_step"):
            state, m = cached_step(state, cache, placed["row"],
                                   placed["weight"], k)
        sq_sum = sq_sum + m["sq_sum"]
        n = n + m["n"]
        tp.add(count)
    sq_sum = float(sq_sum)
    n = float(n)
    return state, {"MSE": round(sq_sum / max(n, 1.0), 4), **tp.metrics()}


def cache_dtype_for(hp: HyperParams):
    """The dtype the consuming conv branch casts doc embeddings to —
    caching in that dtype keeps cached == uncached bitwise (the cast of
    a frozen-table row commutes with the gather)."""
    if hp.use_pallas:
        return (jnp.bfloat16 if jax.default_backend() == "tpu"
                else jnp.float32)       # interpret mode stays f32
    return jnp.dtype(hp.compute_dtype)


def train_complete(hp: HyperParams, model, dataset, *,
                   params=None, quiet: bool = True,
                   checkpoint_path: Optional[str] = None, mesh=None,
                   stats: Optional[Dict] = None):
    """Full training run with per-epoch validation, best-val snapshot
    and early stopping (reference `train_complete` main.py:73-136 +
    MPCN's `--early_stop` patience, MPCN/train.py:746-760). Returns
    (best_params, best_val_mse); test metrics computed with the returned
    params implement select-test-by-dev (experiment.py:231-309).

    `hp.loss` other than RAW_MSE trains on sampled candidate grids with
    the corresponding ranking loss and selects epochs by validation
    HR@1; the returned scalar is then -best_HR@1 (lower-is-better kept
    uniform).

    When `checkpoint_path` is set, every epoch persists latest params +
    optimizer state + best-val params in one file; `hp.resume` restores
    the latest state and continues where the run stopped (per-epoch RNG
    and shuffle streams are keyed by the absolute epoch number, so a
    resumed run is bitwise-identical to an uninterrupted one).

    Mesh-driven: `hp.mesh_shape` other than (1, 1) builds the
    data x model mesh (parallel/mesh.py), row-shards the embedding/bias
    tables over `model`, shards every batch over `data`, and lets
    sharded autodiff insert the gradient psums. Pass `mesh` explicitly
    to reuse one across phases (NeuMF).

    `stats` (optional dict) receives product-path training throughput:
    per-epoch examples/s from the epoch banners, plus their median —
    the number BASELINE.md's examples/s/chip target is about."""
    import contextlib
    import os

    from ..parallel.mesh import mesh_from_hp, shard_params
    from .checkpoint import load_checkpoint, restore_like, save_checkpoint
    from .evaluate import (eval_ranking, evaluate, make_apply_fn,
                           make_eval_step, make_rank_step)

    if mesh is None:
        mesh = mesh_from_hp(hp)

    apply_fn = make_apply_fn(model)
    optimizer = make_optimizer(hp)

    ranking = hp.loss != "RAW_MSE"
    if ranking and hp.model_type in ("transnet", "transnet++"):
        raise ValueError("ranking losses are not defined for transnet's "
                         "routed 3-loss objective; use loss='RAW_MSE'")

    use_cache = hp.cache_doc_embeds
    use_entity = use_cache and hp.cache_entity
    if use_cache:
        if hp.family != "review":
            raise ValueError(
                "cache_doc_embeds caches review doc tensors and only "
                f"applies to the review family; {hp.model_type!r} has "
                f"no doc tensors")
        if hp.model_type == "MPCN" and hp.cache_sides != "ids":
            # MPCN's word table is TRAINED, so pre-EMBEDDED caches are
            # wrong — but an ids-only cache never touches the table:
            # the int docs are static data, the (trained) embedding
            # happens in-jit either way. Caching them on device kills
            # the per-step host transfer ([S, B, 2, dmax, smax] ints
            # per scan dispatch), MPCN's measured product bottleneck.
            raise ValueError(
                "MPCN trains its word embeddings; only the ids-only "
                "cache applies (cache_sides='ids') — pre-embedded "
                "caches would freeze a trained table")
        if not use_entity and mesh is not None and jax.process_count() > 1:
            raise ValueError(
                "per-example cache_doc_embeds + multi-host is "
                "unsupported (one global device array per split); use "
                "cache_entity=True (entity tables replicate per host) "
                "or drop the cache")
        # an epochs=0 run (smoke/eval-only) never trains: skip the
        # (HBM-expensive) cache build entirely
        use_cache = use_cache and hp.epochs > 0
        use_entity = use_entity and hp.epochs > 0
    if use_entity:
        if hp.model_type not in ("deepconn", "deepconn++", "NARRE",
                                 "transnet", "transnet++"):
            raise ValueError(
                "cache_entity applies to the frozen-table review towers "
                f"(deepconn/deepconn++/NARRE/transnet); "
                f"{hp.model_type!r} has no entity doc store")
        if ranking:
            raise ValueError(
                "cache_entity trains pointwise (RAW_MSE); candidate-grid "
                "ranking losses use the per-example cache")

    if ranking:
        # candidate-grid training: [N, C] grids with the positive in
        # column 0; validation selects by HR@1 over val grids
        train_recs = dataset.materialize_train_negs(hp, "train",
                                                    seed=hp.seed)
        val_recs = dataset.materialize_train_negs(hp, "val",
                                                  seed=hp.seed + 1)
    elif use_entity:
        # no per-example doc tensors at all: ids + rating + mask spans
        train_recs = dataset.materialize_entity(hp, "train")
        val_recs = dataset.materialize_entity(hp, "val")
    else:
        train_recs = dataset.materialize(hp, "train")
        val_recs = dataset.materialize(hp, "val")
    train_b = Batcher(train_recs, hp.batch_size,
                      shuffle=hp.shuffle_data_every_epoch, seed=hp.seed)
    val_b = Batcher(val_recs, hp.batch_size)

    if use_cache:
        pw = paired_window_for(hp)
        ck, idk = doc_cache_keys(hp.model_type, hp.cache_sides)
        if use_entity:
            tables = build_entity_tables(hp, dataset)
            # fused in-kernel row gather: concatenated-doc towers only
            # (NARRE/transnet read the gathered doc keys directly)
            if (hp.pallas_fuse_rows and pw is not None
                    and hp.model_type in ("deepconn", "deepconn++")):
                tables = {(k + "__table" if k in ck else k): v
                          for k, v in tables.items()}
            train_cache = EntityCache(
                example={k: jnp.asarray(np.asarray(v))
                         for k, v in train_recs.items()},
                tables=tables)
            # val shares the SAME doc tables (eval removes nothing);
            # only the tiny per-example arrays differ
            val_cache = EntityCache(
                example={k: jnp.asarray(np.asarray(v))
                         for k, v in val_recs.items()},
                tables=train_cache.tables)
        else:
            train_cache = build_doc_cache(
                train_recs, dataset.word_vectors, cache_dtype_for(hp),
                paired_window=pw, keys=ck, id_keys=idk)
            # ranking mode validates by HR@1 over candidate grids
            # through eval_ranking (uncached — one [N, C] pass per
            # epoch); only the pointwise val eval consumes a cache
            val_cache = (build_doc_cache(val_recs, dataset.word_vectors,
                                         cache_dtype_for(hp),
                                         paired_window=pw, keys=ck,
                                         id_keys=idk)
                         if not ranking else None)
        # identical shuffle stream to `train_b` (same seed/epoch keying),
        # but yielding row indices into the device cache
        row_b = Batcher({"row": np.arange(train_b.n)}, hp.batch_size,
                        shuffle=hp.shuffle_data_every_epoch, seed=hp.seed)
        if mesh is not None:
            # compose the cache with the mesh: row-shard every cache
            # array over the data axis; the jitted gather then exchanges
            # batch rows over ICI (see parallel.mesh.shard_cache).
            # EntityCache: example rows shard, doc tables replicate.
            from ..parallel.mesh import shard_cache
            train_cache = shard_cache(train_cache, mesh)
            if val_cache is not None:
                val_cache = shard_cache(val_cache, mesh)

    resume_payload = None
    if checkpoint_path and hp.resume and os.path.exists(checkpoint_path):
        resume_payload = load_checkpoint(checkpoint_path)

    ctx = jax.set_mesh(mesh) if mesh is not None else \
        contextlib.nullcontext()
    with ctx:
        # fold_in (not split) keys the per-epoch streams by the absolute
        # epoch number, so a resumed run replays the identical RNGs
        root_rng = jax.random.PRNGKey(hp.seed)
        if params is None:
            init_rng = jax.random.fold_in(root_rng, 0)
            sample = next(iter(train_b))
            if use_entity:
                # entity records carry no doc tensors; init only needs
                # shapes — gather int docs host-side from the canonical
                # store (params are identical whichever doc form the
                # model later consumes)
                if hp.model_type == "NARRE":
                    ud_i, id_i, wg_i, rv_i = dataset._entity_rows_docs(
                        hp.narre_num_reviews, hp.narre_num_words,
                        10, hp.user_pad_id, hp.item_pad_id)
                    sample = dict(sample,
                                  user_doc=ud_i[sample["user"]],
                                  item_doc=id_i[sample["item"]],
                                  users_who_gave=wg_i[sample["item"]],
                                  items_reviewed=rv_i[sample["user"]])
                else:
                    (udocs, _), (idocs, _) = dataset._entity_spans(
                        hp.input_length)
                    sample = dict(sample,
                                  user_doc=udocs[sample["user"]],
                                  item_doc=idocs[sample["item"]])
            params = model.init({"params": init_rng, "dropout": init_rng},
                                sample, train=False)["params"]
        if mesh is not None:
            params = shard_params(params, mesh)

        state = TrainState(params, optimizer.init(params),
                           jnp.zeros((), jnp.int32))

        start_epoch = 1
        best_mse = float("inf")
        # copy, not alias: state.params' buffers get donated to epoch
        # 1's first train_step, and if validation never improves (NaN
        # MSE) the aliased tree would be returned with deleted buffers
        best_params = jax.tree_util.tree_map(jnp.copy, state.params)
        since_improve = 0
        if resume_payload is not None:
            state = TrainState(
                restore_like(state.params, resume_payload["params"]),
                restore_like(state.opt_state, resume_payload["opt_state"]),
                jnp.asarray(resume_payload["step"], jnp.int32))
            if resume_payload["best_params"]:
                best_params = restore_like(best_params,
                                           resume_payload["best_params"])
            start_epoch = int(resume_payload["epoch"]) + 1
            best_mse = float(resume_payload["extra"].get("val_mse",
                                                         best_mse))
            since_improve = int(resume_payload["extra"].get(
                "since_improve", 0))
        train_b.set_epoch(start_epoch - 1)
        if use_cache:
            row_b.set_epoch(start_epoch - 1)
            cached_step = make_cached_train_step(
                apply_fn, optimizer, hp.model_type, hp.loss,
                hp.hinge_margin)
            cached_scan_step = (make_cached_train_step(
                apply_fn, optimizer, hp.model_type, hp.loss,
                hp.hinge_margin, scan_steps=hp.scan_steps)
                if hp.scan_steps > 1 else None)

        train_step = make_train_step(apply_fn, optimizer, hp.model_type,
                                     hp.loss, hp.hinge_margin)
        scan_step = (make_scan_train_step(apply_fn, optimizer,
                                          hp.model_type, hp.loss,
                                          hp.hinge_margin)
                     if hp.scan_steps > 1 and not use_cache else None)
        place_stacked = (make_placer(mesh, stacked=True)
                         if hp.scan_steps > 1 else None)
        if use_cache and not ranking:
            from .evaluate import evaluate_cached, make_cached_eval_step
            cached_eval_step = make_cached_eval_step(apply_fn,
                                                     hp.model_type,
                                                     mesh=mesh)
        eval_step = make_eval_step(apply_fn, hp.model_type, mesh=mesh)
        rank_step = (make_rank_step(apply_fn, hp.model_type, mesh=mesh)
                     if ranking else None)
        place = make_placer(mesh)

        log = hp.log_file()
        try:
            for epoch in range(start_epoch, hp.epochs + 1):
                t0 = time.time()
                epoch_rng = jax.random.fold_in(root_rng, epoch)
                if use_cache:
                    state, train_metrics = train_epoch_cached(
                        cached_step, cached_scan_step, state, train_cache,
                        row_b, epoch_rng, scan_steps=hp.scan_steps,
                        place=place, place_stacked=place_stacked)
                else:
                    state, train_metrics = train_epoch(
                        train_step, state, train_b, epoch_rng, place,
                        scan_step=scan_step, scan_steps=hp.scan_steps,
                        place_stacked=place_stacked)
                if ranking:
                    rank = eval_ranking(rank_step, state.params, val_recs,
                                        hp, batch_size=hp.batch_size,
                                        mesh=mesh)
                    # negated HR@1, so lower-is-better selection is shared
                    metrics = {"train_loss": train_metrics["MSE"], **rank,
                               "MSE": -rank["HR@1"]}
                elif use_cache:
                    metrics, _, _ = evaluate_cached(
                        cached_eval_step, state.params, val_cache,
                        val_recs, hp, dataset.user_count,
                        dataset.item_count, mesh=mesh)
                else:
                    metrics, _, _ = evaluate(eval_step, state.params,
                                             val_b, hp,
                                             dataset.user_count,
                                             dataset.item_count,
                                             mesh=mesh)
                metrics["examples_per_s"] = \
                    train_metrics["examples_per_s"]
                if stats is not None:
                    import statistics
                    eps_l = stats.setdefault("epoch_examples_per_s", [])
                    eps_l.append(train_metrics["examples_per_s"])
                    stats["train_examples_per_s"] = round(
                        statistics.median(eps_l), 1)
                log_end_epoch(log, {k: v for k, v in metrics.items()
                                    if not (ranking and k == "MSE")},
                              epoch, time.time() - t0, quiet=quiet)
                if metrics["MSE"] < best_mse:
                    best_mse = metrics["MSE"]
                    since_improve = 0
                    # deep copy: the live params' buffers get donated to
                    # the next epoch's first train_step
                    best_params = jax.tree_util.tree_map(jnp.copy,
                                                         state.params)
                else:
                    since_improve += 1
                if checkpoint_path:
                    save_checkpoint(checkpoint_path, state.params,
                                    opt_state=state.opt_state,
                                    step=int(state.step), epoch=epoch,
                                    extra={"val_mse": best_mse,
                                           "since_improve":
                                               since_improve},
                                    best_params=best_params)
                if hp.early_stop and since_improve >= hp.early_stop:
                    file_write(log,
                               f"early stop at epoch {epoch}: no val "
                               f"improvement for {since_improve} epochs",
                               quiet=quiet)
                    break
        except KeyboardInterrupt:
            # reference main.py:128: Ctrl-C ends training gracefully and
            # the run proceeds to test eval with the best-val snapshot
            # (checkpoints make a killed run resumable regardless)
            file_write(log, "KeyboardInterrupt: stopping training; "
                            "returning best-validation parameters",
                       quiet=quiet)

    return best_params, best_mse
