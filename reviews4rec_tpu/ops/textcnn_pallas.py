"""Pallas TPU kernel: fused windowed-conv + ReLU + max-over-time.

The TextCNN encoder (models/layers.py, reference
common_pytorch_models.py:26-37) is the hot op of every review tower:
conv window W=3 over [B, T~1000, E=64] with F=100 filters, ReLU, max
over time. Lowered naively, XLA materializes the windowed unfold
([B, T+W-1, W*E], 3x the activations) and the conv output
([B, T+W-1, F]) in HBM; this kernel streams time tiles through the
standard Pallas pipeline (Mosaic double-buffers the block DMAs), runs
the conv as W shifted [bt*tt, E] x [E, F] MXU matmuls, and folds ReLU +
running max (and argmax, for the VJP) into VMEM accumulators — only
[B, F] ever returns to HBM.

Cross-tile windows are handled with a VMEM halo carry (the last W-1
time rows of the previous tile) instead of overlapping DMA slices,
which Mosaic cannot express for sub-128-lane feature dims.

Backward (custom VJP): the forward emits the winning time index per
(b, f); the backward gathers the winning taps and reuses two standard
matmuls (XLA — the backward is matmul-bound, not bandwidth-bound).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, k_ref, b_ref, out_ref, idx_ref,
            carry_ref, acc_ref, iacc_ref, *,
            window: int, t_tile: int, t_out: int):
    """Grid: (batch_tiles, time_tiles), time minor. Each step consumes a
    non-overlapping [bt, t_tile, E] block; an 8-row sublane-aligned VMEM
    carry supplies the (W-1)-row halo from the previous block (Mosaic
    cannot store sub-8-row slices, so the carry keeps the block's last 8
    rows and the read slices the needed tail at value level). Window
    start s in block c covers output position t = c*t_tile + s - halo."""
    c = pl.program_id(1)
    n_c = pl.num_programs(1)
    halo = window - 1
    cr = carry_ref.shape[1]  # >= 8, multiple of 8

    neg = jnp.float32(-3.0e38)

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, neg)
        iacc_ref[:] = jnp.zeros_like(iacc_ref)
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = x_ref[:]                                  # [bt, t_tile, E]
    bt, tt, e = x.shape
    f = out_ref.shape[1]
    z = jnp.concatenate([carry_ref[:][:, cr - halo:, :], x], axis=1)
    carry_ref[:] = x[:, tt - cr:, :]

    y = jnp.zeros((bt * tt, f), jnp.float32)
    for w in range(window):
        xw = z[:, w:w + tt, :].reshape(bt * tt, e)
        y = y + jax.lax.dot_general(
            xw, k_ref[pl.ds(w * e, e), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b_ref[:], 0.0).reshape(bt, tt, f)

    # Window start s in this tile covers output position
    # t = c*t_tile + s - halo (the carry shifts coordinates by halo);
    # mask t outside [0, t_out).
    tpos = (c * tt - halo
            + jax.lax.broadcasted_iota(jnp.int32, (bt, tt, 1), 1))
    y = jnp.where((tpos >= 0) & (tpos < t_out), y, neg)

    tile_max = jnp.max(y, axis=1)
    # first-max index via where+min (Mosaic has no argmax lowering)
    pos = jnp.where(y == tile_max[:, None, :], tpos,
                    jnp.int32(1 << 30))
    tile_arg = jnp.min(pos, axis=1)
    better = tile_max > acc_ref[:]
    iacc_ref[:] = jnp.where(better, tile_arg, iacc_ref[:])
    acc_ref[:] = jnp.where(better, tile_max, acc_ref[:])

    @pl.when(c == n_c - 1)
    def _emit():
        out_ref[:] = acc_ref[:]
        idx_ref[:] = iacc_ref[:]


def _forward(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
             window: int, interpret: bool) -> Tuple[jnp.ndarray,
                                                    jnp.ndarray]:
    b, t, e = x.shape
    f = kernel.shape[1]
    halo = window - 1
    t_out = t + halo                  # torch pads (W-1) on both sides
    b_tile = min(b, 64)
    t_tile = 128
    carry_rows = -(-halo // 8) * 8    # sublane-aligned carry depth

    bt_pad = -(-b // b_tile) * b_tile
    # window starts run to t_out + halo - 1 in shifted coordinates
    n_chunks = -(-(t_out + halo) // t_tile)
    # left conv pad (W-1) + right pad up to the chunk multiple
    xp = jnp.pad(x, ((0, bt_pad - b),
                     (halo, n_chunks * t_tile - t - halo),
                     (0, 0)))

    out, idx = pl.pallas_call(
        functools.partial(_kernel, window=window, t_tile=t_tile,
                          t_out=t_out),
        grid=(bt_pad // b_tile, n_chunks),
        in_specs=[
            pl.BlockSpec((b_tile, t_tile, e), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((window * e, f), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_tile, f), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, f), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt_pad, f), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, f), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_tile, carry_rows, e), jnp.float32),  # halo carry
            pltpu.VMEM((b_tile, f), jnp.float32),              # max acc
            pltpu.VMEM((b_tile, f), jnp.int32),                # argmax acc
        ],
        interpret=interpret,
    )(xp, kernel, bias.reshape(1, f))
    return out[:b], idx[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def textcnn_pool(x, kernel, bias, window: int = 3,
                 interpret: bool = False):
    """max_t relu(conv1d_(W-1)pad(x) @ kernel + bias): [B,T,E] -> [B,F].
    kernel: [W*E, F] (tap-major rows)."""
    out, _ = _forward(x, kernel, bias, window, interpret)
    return out


def _fwd(x, kernel, bias, window, interpret):
    out, idx = _forward(x, kernel, bias, window, interpret)
    return out, (x, kernel, out, idx)


def _bwd(window, interpret, res, g):
    x, kernel, out, idx = res
    b, t, e = x.shape
    f = kernel.shape[1]
    # ReLU gate: a clamped-to-zero max contributes no gradient
    g = jnp.where(out > 0, g, 0.0)

    # winning windows: for (b, f) the taps are xp[b, idx+w], w < W,
    # where xp carries the same (W-1)-left padding as the forward
    xp = jnp.pad(x, ((0, 0), (window - 1, window - 1), (0, 0)))
    tap_t = idx[:, :, None] + jnp.arange(window)[None, None, :]  # [B,F,W]
    bidx = jnp.arange(b)[:, None, None]
    taps = xp[bidx, tap_t, :]                                    # [B,F,W,E]

    dkernel = jnp.einsum("bfwe,bf->wef", taps, g).reshape(window * e, f)
    dbias = jnp.sum(g, axis=0)

    kmat = kernel.reshape(window, e, f)
    contrib = jnp.einsum("bf,wef->bfwe", g, kmat)                # [B,F,W,E]
    dxp = jnp.zeros_like(xp).at[bidx, tap_t, :].add(contrib)
    dx = dxp[:, window - 1:window - 1 + t, :]
    return dx, dkernel, dbias


textcnn_pool.defvjp(_fwd, _bwd)
