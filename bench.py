"""Benchmark suite: steady-state training throughput across the model
zoo, Pallas-vs-XLA A/B for the flagship, batch-size sweep, and an MFU
estimate.

Prints a human-readable table to STDERR and ONE JSON line to STDOUT:
  {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": R, ...}

Timing methodology (matters on this tunneled TPU): `block_until_ready`
through the axon tunnel returns without waiting, so every measurement
here synchronizes by FETCHING a scalar that depends on the timed
computation. Warmup also fetches, so remote compiles land outside the
timed region.

`vs_baseline` is the speedup over a faithful torch (CPU) implementation
of the flagship on this host — the reference's own stack is torch-based
and publishes no numbers (BASELINE.md), so the measured torch throughput
is the baseline anchor.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 256
STEPS = 40
INPUT_LEN = 1000
LATENT = 10

# v5e peak dense bf16 matmul throughput; the MFU denominator.
PEAK_BF16_FLOPS = 197e12


def log(s: str) -> None:
    print(s, file=sys.stderr, flush=True)


def _dataset():
    from reviews4rec_tpu.data.synthetic import make_synthetic
    return make_synthetic(num_users=300, num_items=200, vocab=2000,
                          interactions_per_user=(10, 20), seed=0)


def time_sgd_model(ds, model_type: str, use_pallas: bool = False,
                   batch: int = BATCH, steps: int = STEPS,
                   fuse_gather: bool = False) -> float:
    """Steady-state examples/s of the jitted train step."""
    import jax
    import jax.numpy as jnp

    from reviews4rec_tpu.config import HyperParams
    from reviews4rec_tpu.data.batcher import Batcher
    from reviews4rec_tpu.models import build_model
    from reviews4rec_tpu.train.evaluate import make_apply_fn
    from reviews4rec_tpu.train.loop import (TrainState, make_optimizer,
                                            make_train_step)

    hp = HyperParams(model_type=model_type, batch_size=batch,
                     input_length=INPUT_LEN, latent_size=LATENT,
                     use_pallas=use_pallas, pallas_fuse_gather=fuse_gather)
    hp = ds.apply_to(hp)
    model = build_model(hp, ds.word_vectors)
    b = {k: jnp.asarray(v) for k, v in
         next(iter(Batcher(ds.materialize(hp, "train"), batch))).items()}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, b,
                        train=False)["params"]
    opt = make_optimizer(hp)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(make_apply_fn(model), opt, hp.model_type)

    state, m = step(state, b, rng)
    float(m["loss"])                       # compile + real execution

    def run(k: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        for i in range(k):
            state, mm = step(state, b, jax.random.fold_in(rng, i))
        float(mm["loss"])                  # fetch = the only real sync
        return time.perf_counter() - t0

    # slope timing: one tunnel round-trip (~23 ms) sits inside every
    # timed window; differencing two step counts removes it. Min-of-3
    # per window: the shared tunneled chip shows one-sided contention
    # noise (a window occasionally stalls by 100s of ms), and min is
    # the contention-free estimator. A non-positive slope after that is
    # a measurement failure — re-measure once, then fail loudly rather
    # than clamp (a 1e-9 clamp silently fabricates ~1e11 examples/s).
    k_lo = max(steps // 4, 2)
    for attempt in range(2):
        lo = min(run(k_lo) for _ in range(3))
        hi = min(run(steps) for _ in range(3))
        if hi > lo:
            return batch * (steps - k_lo) / (hi - lo)
    raise RuntimeError(
        f"non-positive slope (lo={lo:.4f}s hi={hi:.4f}s) after retry; "
        f"timing is unusable for this config")


def time_hft(ds, iters: int = 4) -> float:
    """Train votes/s of one full HFT EM iteration (M-step L-BFGS scan +
    Gibbs E-step + normalization)."""
    import jax

    from reviews4rec_tpu.config import HyperParams
    from reviews4rec_tpu.models.hft import (HFTTrainer, e_step,
                                            init_params,
                                            normalize_word_weights)

    hp = HyperParams(model_type="HFT", latent_size=8)
    hp = ds.apply_to(hp)
    tr = HFTTrainer(hp, ds)
    params, background = init_params(tr.data, hp)
    rng = jax.random.PRNGKey(0)
    counts = e_step(params, background, tr.data.tok_word,
                    tr.data.tok_item, hp.latent_size, rng)

    def em_iter(params, background, counts, r):
        params, energy = tr.m_step(params, counts, background)
        counts = e_step(params, background, tr.data.tok_word,
                        tr.data.tok_item, hp.latent_size, r)
        params, background = normalize_word_weights(params, background)
        return params, background, counts, energy

    params, background, counts, e = em_iter(params, background, counts,
                                            jax.random.fold_in(rng, 0))
    float(e)
    n_votes = tr.data.eval_sets["train"][0].shape[0]

    def run(k: int) -> float:
        nonlocal params, background, counts
        t0 = time.perf_counter()
        for i in range(k):
            params, background, counts, e = em_iter(
                params, background, counts, jax.random.fold_in(rng, i + 1))
        float(e)
        return time.perf_counter() - t0

    # slope timing with min-of-3 at each point: one EM iteration is tens
    # of ms, the same order as the tunnel round-trip jitter, so a single
    # (hi - lo) difference can go negative on noise
    for attempt in range(2):
        lo = min(run(1) for _ in range(3))
        hi = min(run(iters) for _ in range(3))
        if hi > lo:
            return n_votes * (iters - 1) / (hi - lo)
    raise RuntimeError("non-positive HFT slope after retry")


def bench_torch_baseline() -> float:
    """Reference-style torch implementation of the flagship on CPU
    (reference DeepCoNN.py semantics), forward+backward+Adam."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)
    vocab, emb = 2000, 64
    y = torch.rand(BATCH) * 4 + 1
    udoc = torch.randint(0, vocab, (BATCH, INPUT_LEN))
    idoc = torch.randint(0, vocab, (BATCH, INPUT_LEN))

    class TorchDeepCoNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(vocab, emb)
            self.emb.weight.requires_grad = False
            self.uconv = nn.Conv2d(1, 100, (3, emb), padding=(2, 0))
            self.iconv = nn.Conv2d(1, 100, (3, emb), padding=(2, 0))
            self.ufc = nn.Linear(100, LATENT)
            self.ifc = nn.Linear(100, LATENT)
            self.V = nn.Parameter(torch.randn(2 * LATENT, 8))
            self.lin = nn.Linear(2 * LATENT, 1)
            self.gb = nn.Parameter(torch.tensor([4.0]))

        def tower(self, doc, conv, fc):
            x = self.emb(doc).unsqueeze(1)
            x = F.relu(conv(x)).squeeze(-1)
            x = F.max_pool1d(x, x.size(2)).squeeze(-1)
            return fc(x)

        def forward(self, udoc, idoc):
            u = self.tower(udoc, self.uconv, self.ufc)
            i = self.tower(idoc, self.iconv, self.ifc)
            x = torch.cat([u, i], -1)
            inter = 0.5 * ((x @ self.V).pow(2).sum(1)
                           - (x ** 2 @ self.V ** 2).sum(1))
            return self.gb + inter + self.lin(x)[:, 0]

    model = TorchDeepCoNN()
    opt = torch.optim.Adam(model.parameters(), lr=0.002, weight_decay=1e-6)
    loss = F.mse_loss(model(udoc, idoc), y)
    loss.backward()
    opt.step()

    steps = 4
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = F.mse_loss(model(udoc, idoc), y)
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return BATCH * steps / dt


def flagship_mfu(eps: float) -> float:
    """MFU estimate for deepconn: two TextCNN convs dominate. Per
    example, fwd conv FLOPs = 2 towers * 2 * (T+W-1) * (W*E) * F; the
    train step runs fwd + weight-grad (the input-grad is compiled out —
    the word table is frozen, textcnn_pool need_dx=False), ~2x fwd."""
    t_out = INPUT_LEN + 2
    conv = 2 * 2 * t_out * (3 * 64) * 100
    return 2 * conv * eps / PEAK_BF16_FLOPS * 100.0


def flagship_bandwidth(eps: float) -> float:
    """Modeled HBM GB/s for the default pallas flagship step (the op is
    bandwidth-bound; this is the roofline companion to MFU). Per tower
    per step, in units of B*T*E bytes: fwd = f32 gather write (4) +
    pad/cast read (4) + bf16 write (2) + kernel read (2); bwd (dG only,
    need_dx=False) = pad/cast read (4) + bf16 write (2) + kernel read
    (2) => 20 * B*T*E bytes * 2 towers."""
    bytes_per_example = 20 * INPUT_LEN * 64 * 2
    return bytes_per_example * eps / 1e9


def main():
    import jax
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    ds = _dataset()
    log(f"backend: {backend}; batch {BATCH}; input_length {INPUT_LEN}; "
        f"sync-by-fetch slope timing, min-of-3 windows")

    rows = {}
    table = [("MF_dot", {}), ("NeuMF", {}), ("deepconn", {}),
             ("NARRE", {}), ("transnet", {}), ("MPCN", {})]
    if on_tpu:
        table.insert(3, ("deepconn+pallas",
                         {"model_type": "deepconn", "use_pallas": True}))
        table.insert(4, ("deepconn+pallas+fusedgather",
                         {"model_type": "deepconn", "use_pallas": True,
                          "fuse_gather": True}))
    for name, kw in table:
        mt = kw.get("model_type", name)
        try:
            eps = time_sgd_model(ds, mt,
                                 use_pallas=kw.get("use_pallas", False),
                                 fuse_gather=kw.get("fuse_gather", False))
            rows[name] = round(eps, 1)
            log(f"{name:28s} {eps:12,.0f} examples/s")
        except Exception as exc:  # keep the suite alive per-model
            rows[name] = None
            log(f"{name:28s} FAILED: {exc}")

    try:
        hft_eps = time_hft(ds)
        rows["HFT"] = round(hft_eps, 1)
        log(f"{'HFT':28s} {hft_eps:12,.0f} votes/s (full EM iteration)")
    except Exception as exc:
        rows["HFT"] = None
        log(f"{'HFT':28s} FAILED: {exc}")

    # flagship = the fastest deepconn path at the protocol batch; the
    # HEADLINE is this number (matched protocol: same batch, same step
    # count as the table and the torch baseline). The batch sweep is
    # reported separately and never promoted to the headline.
    candidates = {k: v for k, v in rows.items()
                  if k.startswith("deepconn") and v}
    flag_key = max(candidates, key=candidates.get) if candidates \
        else "deepconn"
    flagship_eps = rows.get(flag_key) or 0.0
    flag_pallas = "pallas" in flag_key
    flag_fuse = "fusedgather" in flag_key

    sweep = {}
    for bsz in (128, 256, 512):
        try:
            eps = time_sgd_model(ds, "deepconn", use_pallas=flag_pallas,
                                 fuse_gather=flag_fuse, batch=bsz,
                                 steps=STEPS)
            sweep[bsz] = round(eps, 1)
            log(f"flagship sweep B={bsz:4d}: {eps:12,.0f} examples/s")
        except Exception as exc:
            log(f"flagship sweep B={bsz}: FAILED {exc}")

    # protocol check: the sweep's B=256 point re-measures the headline
    # config; disagreement beyond ~10% means the chip was noisy and the
    # numbers should be read with that error bar
    noise_pct = None
    if sweep.get(BATCH) and flagship_eps:
        noise_pct = round(abs(sweep[BATCH] - flagship_eps)
                          / flagship_eps * 100.0, 1)
        log(f"protocol agreement (table vs sweep at B={BATCH}): "
            f"{noise_pct}% spread")
        if noise_pct > 10:
            log("WARNING: >10% spread between identical configs — "
                "treat this run's numbers as +-{:.0f}%".format(noise_pct))

    mfu = round(flagship_mfu(flagship_eps), 2)
    gbps = round(flagship_bandwidth(flagship_eps), 1)
    log(f"flagship ({flag_key}) MFU estimate: {mfu}% of "
        f"{PEAK_BF16_FLOPS/1e12:.0f} TFLOP/s peak; modeled HBM traffic "
        f"{gbps} GB/s vs ~820 GB/s v5e peak (the op is bandwidth-bound: "
        f"the roofline, not the MXU, is the binding constraint)")
    if rows.get("deepconn") and rows.get("deepconn+pallas"):
        log(f"pallas speedup over XLA: "
            f"{rows['deepconn+pallas']/rows['deepconn']:.2f}x")

    try:
        # matched batch: the torch baseline runs at BATCH, the headline
        # is measured at BATCH — same protocol on both sides
        torch_eps = bench_torch_baseline()
        ratio = flagship_eps / torch_eps
        log(f"torch-CPU baseline (B={BATCH}): {torch_eps:,.0f} examples/s")
    except Exception:
        ratio = 1.0

    print(json.dumps({
        "metric": "train_examples_per_s_per_chip",
        "value": round(flagship_eps, 1),
        "unit": "examples/s",
        "vs_baseline": round(ratio, 2),
        "flagship": flag_key,
        "headline_batch": BATCH,
        "mfu_pct": mfu,
        "modeled_hbm_gbps": gbps,
        "noise_pct": noise_pct,
        "models": rows,
        "batch_sweep": sweep,
        "sweep_best": max([v for v in sweep.values() if v], default=None),
    }))


if __name__ == "__main__":
    main()
