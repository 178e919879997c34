"""Attribute the flagship cached+scan step's time to its components
(VERDICT r3 #3: the step modeled ~332 GB/s vs the ~820 GB/s v5e HBM
roofline — 2.4x unexplained headroom).

Methodology: the exact bench flagship setup (deepconn, B=256, T=1000,
pallas + paired doc cache), with each component isolated as its own
jitted function and timed by the bench's sync-by-fetch slope protocol
(the tunneled chip returns from block_until_ready without waiting, so
every window fetches a scalar that depends on the timed computation,
and two window sizes are differenced to cancel the round trip).

Components:
  gather        jnp.take of [B] cached rows, both doc sides
  conv_fwd      both paired conv kernels on pre-gathered operands
  conv_fwd_bwd  value_and_grad of sum(conv) (adds the dG kernels)
  fwd           full model forward (adds FC towers + FM head)
  fwd_bwd       full value_and_grad (loss)
  step          full cached train step (adds Adam + weight decay)
  scan10        the production scan-over-microbatches step, per update

Writes examples/ROOFLINE_LAST_RUN.md with the raw table; the curated
analysis (with the MXU-vs-HBM conclusion) lives in examples/ROOFLINE.md.

Run (on the real chip): python examples/roofline_attribution.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 256
INPUT_LEN = 1000
LATENT = 10


def slope(run, steps=24, rounds=5):
    """Median positive (hi - lo)/(steps - lo_steps) across rounds."""
    import statistics
    k_lo = max(steps // 4, 2)
    ss = []
    for _ in range(rounds):
        lo = run(k_lo)
        hi = run(steps)
        s = (hi - lo) / (steps - k_lo)
        if s > 0:
            ss.append(s)
    if not ss:
        raise RuntimeError("non-positive slope in every round")
    return statistics.median(ss), (max(ss) - min(ss)) / statistics.median(ss)


def main():
    import jax
    import jax.numpy as jnp

    from reviews4rec_tpu.config import HyperParams
    from reviews4rec_tpu.data.batcher import Batcher
    from reviews4rec_tpu.data.synthetic import make_synthetic
    from reviews4rec_tpu.models import build_model
    from reviews4rec_tpu.train.evaluate import make_apply_fn
    from reviews4rec_tpu.train.loop import (TrainState, build_doc_cache,
                                            cache_dtype_for,
                                            doc_cache_keys,
                                            make_cached_train_step,
                                            make_optimizer,
                                            paired_window_for)

    ds = make_synthetic(num_users=300, num_items=200, vocab=2000,
                        interactions_per_user=(10, 20), seed=0)
    hp = ds.apply_to(HyperParams(model_type="deepconn", batch_size=BATCH,
                                 input_length=INPUT_LEN,
                                 latent_size=LATENT, use_pallas=True,
                                 cache_doc_embeds=True, scan_steps=10))
    model = build_model(hp, ds.word_vectors)
    recs = ds.materialize(hp, "train")
    ck, idk = doc_cache_keys(hp.model_type)
    cache = build_doc_cache(recs, ds.word_vectors, cache_dtype_for(hp),
                            paired_window=paired_window_for(hp),
                            keys=ck, id_keys=idk)
    n = int(next(iter(recs.values())).shape[0])
    rows = jnp.asarray(np.arange(BATCH) % n, jnp.int32)
    weight = jnp.ones((BATCH,), jnp.float32)
    b0 = {k: jnp.asarray(v) for k, v in
          next(iter(Batcher(recs, BATCH))).items()}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, b0,
                        train=False)["params"]
    apply_fn = make_apply_fn(model)
    opt = make_optimizer(hp)

    def fresh_state():
        # deep copy: the jitted steps DONATE their TrainState arg, and
        # sharing `params` would delete the buffers the pure component
        # fns keep using between interleaved measurement rounds
        p = jax.tree_util.tree_map(jnp.copy, params)
        return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

    # ---- component functions; the cache is an ARGUMENT everywhere
    # (a closure would bake it into the HLO as constants — over the
    # tunnel that upload exceeds the compile-request size limit) ----
    def gathered(cache, rows):
        return {k: jnp.take(v, rows, axis=0) for k, v in cache.items()}

    @jax.jit
    def f_gather(cache, rows):
        # sum over the FULL gathered arrays: slicing would let XLA
        # narrow the gather to the touched rows and measure nothing
        b = gathered(cache, rows)
        return (jnp.sum(b["user_doc"].astype(jnp.float32))
                + jnp.sum(b["item_doc"].astype(jnp.float32)))

    from reviews4rec_tpu.ops.textcnn_pallas import textcnn_pool_paired

    kparams = params
    uconv = kparams["user_conv"]
    # TextCNN param tree: conv kernel under the TextCNN submodule.
    def conv_both(p, b):
        outs = []
        for side, name in (("user_doc", "user_conv"),
                           ("item_doc", "item_conv")):
            sub = p[name]
            outs.append(textcnn_pool_paired(
                b[side], sub["conv_kernel"], sub["conv_bias"],
                INPUT_LEN, 3, False, jnp.bfloat16))
        return sum(jnp.sum(o) for o in outs)

    names = set(uconv.keys())
    have_conv = {"conv_kernel", "conv_bias"} <= names

    @jax.jit
    def f_conv_fwd(p, cache, rows):
        return conv_both(p, gathered(cache, rows))

    @jax.jit
    def f_conv_fwd_bwd(p, cache, rows):
        v, g = jax.value_and_grad(
            lambda pp: conv_both(pp, gathered(cache, rows)))(p)
        return v + jnp.sum(g["user_conv"]["conv_kernel"])

    @jax.jit
    def f_fwd(p, cache, rows, weight):
        b = gathered(cache, rows)
        b["weight"] = weight
        preds = apply_fn(p, b, False, jax.random.PRNGKey(0))
        return jnp.sum(preds)

    def loss_fn(p, cache, rows, weight, key):
        b = gathered(cache, rows)
        b["weight"] = weight
        preds = apply_fn(p, b, True, key)
        sq = (preds - b["rating"]) ** 2
        return jnp.sum(sq * weight) / jnp.maximum(jnp.sum(weight), 1.0)

    @jax.jit
    def f_fwd_bwd(p, cache, rows, weight, key):
        v, g = jax.value_and_grad(loss_fn)(p, cache, rows, weight, key)
        return v + jnp.sum(g["fm"]["V"])

    step1 = make_cached_train_step(apply_fn, opt, hp.model_type)
    step10 = make_cached_train_step(apply_fn, opt, hp.model_type,
                                    scan_steps=10)
    rows10 = jnp.broadcast_to(rows[None], (10, BATCH))
    w10 = jnp.broadcast_to(weight[None], (10, BATCH))

    def timer_pure(fn, *args):
        out = fn(*args)
        float(jnp.sum(out) if hasattr(out, "shape") else out)

        def run(k):
            t0 = time.perf_counter()
            acc = None
            for i in range(k):
                acc = fn(*args)
            float(jnp.sum(acc) if hasattr(acc, "shape") else acc)
            return time.perf_counter() - t0
        return run

    def timer_step(step, s0, *args):
        s, m = step(s0, cache, *args)
        float(m["loss"])
        hold = {"s": s}

        def run(k):
            s = hold["s"]
            t0 = time.perf_counter()
            for i in range(k):
                s, m = step(s, cache, *args)
            float(m["loss"])
            hold["s"] = s
            return time.perf_counter() - t0
        return run

    runs = {
        "gather": timer_pure(f_gather, cache, rows),
        "fwd": timer_pure(f_fwd, params, cache, rows, weight),
        "fwd_bwd": timer_pure(f_fwd_bwd, params, cache, rows, weight,
                              rng),
    }
    if have_conv:
        runs["conv_fwd"] = timer_pure(f_conv_fwd, params, cache, rows)
        runs["conv_fwd_bwd"] = timer_pure(f_conv_fwd_bwd, params, cache,
                                          rows)
    runs["step"] = timer_step(step1, fresh_state(), rows, weight, rng)
    runs["scan10"] = timer_step(step10, fresh_state(), rows10, w10,
                                jax.random.split(rng, 10))

    results = {}
    for name, run in runs.items():
        s, spread = slope(run)
        per_update = s / 10 if name == "scan10" else s
        results[name] = (per_update, spread)
        print(f"{name:14s} {per_update * 1e6:10.1f} us/update "
              f"(spread {spread * 100:.0f}%)", flush=True)

    # traffic accounting for the conv path (bf16 paired operand)
    l2 = 512  # pair rows at T=1000 (tp=128, 4 chunks)
    side_bytes = BATCH * l2 * 128 * 2
    notes = []
    if "conv_fwd" in results:
        t_fwd = results["conv_fwd"][0] - results["gather"][0]
        if t_fwd > 0:
            gbps = 2 * side_bytes / t_fwd / 1e9
            notes.append(f"conv fwd kernels alone stream ~{gbps:.0f} "
                         f"GB/s of operand reads")
        else:
            notes.append("conv_fwd - gather differencing came out "
                         "non-positive this session (tunnel noise); "
                         "kernel-only bandwidth not reportable")
    md = os.path.join(REPO, "examples", "ROOFLINE_LAST_RUN.md")
    with open(md, "w") as f:
        f.write("# Flagship step attribution (cached+scan deepconn, "
                "B=256, T=1000, v5e)\n\n")
        f.write("Per-update time by component (sync-by-fetch slope, "
                "median of rounds; see examples/roofline_attribution.py "
                "for the protocol):\n\n")
        f.write("| component | us/update | spread |\n|---|---|---|\n")
        for name, (s, spread) in results.items():
            f.write(f"| {name} | {s * 1e6:.1f} | {spread * 100:.0f}% |\n")
        f.write(f"\nper-side cached operand: {side_bytes / 1e6:.1f} MB; "
                f"two sides, fwd+bwd kernel reads = "
                f"{4 * side_bytes / 1e6:.0f} MB/update minimum.\n")
        for n_ in notes:
            f.write(f"\n- {n_}\n")
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
