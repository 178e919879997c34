"""Sequence parallelism for the review-document CNN encoders.

The reference caps review documents at 1000 tokens
(`hyper_params.py:65`) and truncates beyond that (`data.py:198-202`) —
sequence length is never a scaling axis there. This module makes it one
(SURVEY.md §2.8): the TextCNN conv is *local* in the time axis, so a
document sharded over devices only needs a halo exchange of the
(window-1) boundary tokens between neighbors, done with
`jax.lax.ppermute` over ICI, followed by a `pmax` to combine the local
max-over-time partials. No ring attention is required at any reference
scale; this is the capability for scaled-up `input_length`.

Semantics match `models/layers.py::TextCNN` exactly (torch Conv2d pads
window-1 zeros on BOTH ends, common_pytorch_models.py:26-37):
- `ppermute` leaves non-receiving edge shards with zeros, which *is*
  the zero padding of the global ends;
- neighboring shards recompute the (window-1) overlapping windows;
  duplicates are harmless under max-pooling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def textcnn_pool_seq(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray, window: int, mesh: Mesh,
                     axis: str = "model",
                     batch_axis: str | None = None) -> jnp.ndarray:
    """Sequence-sharded fused conv+relu+max-over-time.

    x:      [B, T, E] with T sharded over `axis` (T % axis size == 0)
    kernel: [window*E, F] replicated
    bias:   [F] replicated
    batch_axis: mesh axis the batch dim is sharded over (None =
        replicated) — lets SP compose with data parallelism without
        gathering activations over the data axis
    Returns [B, F] sharded P(batch_axis) — identical to the
    single-device `TextCNN` pre-FC pooled output.
    """
    w = window
    n = mesh.shape[axis]
    b, t, e = x.shape
    assert t % n == 0, (t, n)
    # The halo pulls from ONE neighbor only; a shard chunk shorter than
    # the halo would make `xs[:, c-(w-1):, :]` a clamped slice and the
    # gather below would silently read garbage.
    assert t // n >= w - 1, (
        f"per-shard chunk {t // n} < window-1 ({w - 1}); shard the "
        f"sequence over fewer devices or grow input_length")

    def local(xs, kern, bia):
        # xs: [b_local, C, E] — this shard's chunk of the time axis
        bl, c = xs.shape[0], xs.shape[1]
        if w > 1:
            fwd = [(j, j + 1) for j in range(n - 1)]
            bwd = [(j + 1, j) for j in range(n - 1)]
            # halo exchange over ICI; edge shards receive zeros, which
            # doubles as the global zero padding
            left = jax.lax.ppermute(xs[:, c - (w - 1):, :], axis, fwd)
            right = jax.lax.ppermute(xs[:, :w - 1, :], axis, bwd)
            ext = jnp.concatenate([left, xs, right], axis=1)
        else:
            ext = xs
        # all windows whose start lies in this shard's halo-extended
        # range: union over shards covers every padded global window
        idx = jnp.arange(c + w - 1)[:, None] + jnp.arange(w)[None, :]
        win = ext[:, idx, :].reshape(bl, c + w - 1, w * e)
        y = jax.nn.relu(win @ kern + bia)
        y = jnp.max(y, axis=1)                  # local max-over-time
        # combine shard partials; all_gather+max instead of pmax so the
        # kernel is differentiable (pmax has no VJP rule) — the gather
        # is [n, B, F], tiny next to the conv
        return jnp.max(jax.lax.all_gather(y, axis), axis=0)

    # check_vma=False: the output IS replicated over `axis` (same
    # all_gather+max on every shard) but the static varying-axes checker
    # cannot infer replication through all_gather; pmax would satisfy it
    # but has no VJP rule, and this kernel must be differentiable.
    return shard_map(local, mesh=mesh,
                     in_specs=(P(batch_axis, axis, None), P(), P()),
                     out_specs=P(batch_axis), check_vma=False)(x, kernel,
                                                               bias)
