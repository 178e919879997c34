"""Pallas TPU kernel: fused windowed-conv + ReLU + max-over-time.

The TextCNN encoder (models/layers.py, reference
common_pytorch_models.py:26-37) is the hot op of every review tower:
conv window W=3 over [B, T~1000, E=64] with F=100 filters, ReLU, max
over time. Lowered naively, XLA materializes the windowed unfold
([B, T+W-1, W*E], 3x the activations) and the conv output
([B, T+W-1, F]) in HBM; this kernel streams time tiles through the
standard Pallas pipeline (Mosaic double-buffers the block DMAs) and
folds conv + ReLU + running max (and argmax, for the VJP) into VMEM
accumulators — only [B, F] ever returns to HBM.

Layout is the crux (measured on v5e): blocks with E=64 on the lane
dimension DMA at ~110 GB/s (sub-128-lane rows stride badly), while the
same bytes as [B, T/2, 2E=128] stream at full HBM rate (~980 GB/s). So
for 2E == 128 the kernel consumes x in the *paired* layout — a free
bitwise reshape of the row-major [B, T, E] array — and decomposes the
conv over even/odd window starts: window start t = 2r+phase reads tap w
from pair-row r + (phase+w)//2, lane half (phase+w)%2. Both phases and
both row-shifts collapse into ONE [bt*tp, 2*2E] x [2*2E, 2*F] MXU
matmul against a scattered kernel matrix G built once outside
(`_build_g`), with the row-(r+1) taps staged into a VMEM scratch by a
sublane-shifted store. `dot_dtype=bfloat16` runs that matmul at the
native MXU rate with f32 accumulation.

Cross-tile windows are handled with a VMEM halo carry (the last
pair-row of the previous tile) instead of overlapping DMA slices, which
Mosaic cannot express at this granularity. A generic (any E, any W)
un-paired fallback keeps the op universal.

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
            carry_ref, win_ref, acc_ref, iacc_ref, *,
            window: int, t_tile: int, t_out: int, dot_dtype):
    """Grid: (batch_tiles, time_tiles), time minor. Each step consumes a
    non-overlapping [bt, t_tile, E] block; an 8-row sublane-aligned VMEM
    carry supplies the (W-1)-row halo from the previous block (Mosaic
    cannot store sub-8-row slices, so the carry keeps the block's last 8
    rows and the read slices the needed tail at value level). Window
    start s in block c covers output position t = c*t_tile + s - halo.

    The W taps are concatenated in VMEM into one [bt*tt, W*E] operand so
    the conv is a single K=W*E matmul (full MXU depth; the K=E-per-tap
    form leaves 2/3 of the systolic array idle at E=64). `dot_dtype`
    bf16 halves the operand bytes and engages the native MXU path; the
    accumulator stays f32 either way."""
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

    # Stage the W shifted taps into a scratch buffer (stores relayout
    # the sublane-offset slices; Mosaic cannot concat them directly),
    # giving one [bt*tt, W*E] operand for a single full-depth matmul.
    for w in range(window):
        win_ref[:, :, w * e:(w + 1) * e] = \
            z[:, w:w + tt, :].astype(dot_dtype)
    y = jax.lax.dot_general(
        win_ref[:].reshape(bt * tt, window * e),
        k_ref[:].astype(dot_dtype),
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


def _build_g(kernel: jnp.ndarray, window: int, e: int,
             f_pad: int) -> jnp.ndarray:
    """Scattered conv matrix for the paired layout: G[d*128 + 64*h + j,
    phase*f_pad + o] = kernel[w*e + j, o] with w = 2d + h - phase, so
    z_pairs @ G computes every (phase, row-shift d) tap contribution in
    one contraction. Zero blocks (invalid w) waste ~1/4 of the matmul —
    cheaper than the relayout shuffles they replace."""
    f = kernel.shape[1]
    g = jnp.zeros((2, 2 * e, 2, f_pad), kernel.dtype)
    for d in (0, 1):
        for h in (0, 1):
            for phase in (0, 1):
                w = 2 * d + h - phase
                if 0 <= w < window:
                    g = g.at[d, e * h:e * (h + 1), phase, :f].set(
                        kernel[w * e:(w + 1) * e, :])
    return g.reshape(4 * e, 2 * f_pad)


def _input_mask(x, skip_ref, c, tp, halo):
    """Zero the word span [start, start+len) of each example's doc in a
    paired-layout block (the entity-cache leakage mask, hp.cache_entity):
    skip_ref is [bt, 2] (start, len) word indices; block element (j,
    lane) holds padded timestep 2*(c*tp + j) + (lane >= E), i.e. word
    index that minus halo. A len of 0 masks nothing."""
    bt, tp_b, lanes = x.shape
    e = lanes // 2
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (bt, tp_b, lanes), 1)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (bt, tp_b, lanes), 2)
    ts = 2 * (c * tp + rows_i) + (lane_i >= e).astype(jnp.int32) - halo
    sk = skip_ref[:]
    st = sk[:, 0].reshape(bt, 1, 1)
    ln = sk[:, 1].reshape(bt, 1, 1)
    return jnp.where((ts >= st) & (ts < st + ln),
                     jnp.zeros((), x.dtype), x)


def _paired_kernel(x_ref, g_ref, b_ref, skip_ref, out_ref, idx_ref,
                   carry_ref, zw_ref, acc_ref, iacc_ref, *,
                   t_out: int, tp: int, dot_dtype, masked: bool,
                   halo: int):
    """Grid: (batch_tiles, pair_chunks), pairs minor. Each step consumes
    a [bt, tp, 128] block of pair-rows; window starts covered are
    t = 2*(c*tp - 1 + j) + phase for j in [0, tp) (the -1 is the carry
    row from the previous block).

    Why ONE scattered-G dot and not two per-phase [bt*tp, W*E] x
    [W*E, F] dots against the plain kernel matrix (which would skip the
    ~25% structurally-zero G blocks): the MXU consumes K in 128-lane
    tiles, so K = W*E = 192 rounds up to 256 anyway — both forms
    execute the identical 4 tile-passes per operand row — while the
    phase dots need lane-offset-64 operand slices that Mosaic lowers to
    extra VPU relayouts. Measured on v5e (interleaved A/B, B=256,
    T=1000): phase-split fwd 229 us vs single-dot 138 us; fwd+dG 342 vs
    305. The zero blocks and the F=100->128 padding are MXU
    tile-granularity floors, not recoverable FLOPs (r5 measurement;
    see examples/ROOFLINE.md)."""
    c = pl.program_id(1)
    n_c = pl.num_programs(1)
    neg = jnp.float32(-3.0e38)

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, neg)
        iacc_ref[:] = jnp.zeros_like(iacc_ref)
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = x_ref[:]                                  # [bt, tp, 128]
    if masked:
        x = _input_mask(x, skip_ref, c, tp, halo)
    bt = x.shape[0]
    lanes = x.shape[2]
    f2 = g_ref.shape[1]
    f_pad = f2 // 2
    cr = carry_ref.shape[1]

    z = jnp.concatenate([carry_ref[:][:, cr - 1:, :], x], axis=1)
    carry_ref[:] = x[:, tp - cr:, :]

    # stage [row r | row r+1] into one K=2*lanes operand (x, g and the
    # scratch are already dot_dtype — the cast happens in HBM outside
    # the kernel, halving DMA bytes for bf16; an in-kernel astype would
    # be elided by excess-precision folding)
    zw_ref[:, :, :lanes] = z[:, :tp, :]
    zw_ref[:, :, lanes:] = z[:, 1:tp + 1, :]
    y = jax.lax.dot_general(
        zw_ref[:].reshape(bt * tp, 2 * lanes), g_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(bt, tp, f2)

    for phase in (0, 1):
        yp = jnp.maximum(
            y[:, :, phase * f_pad:(phase + 1) * f_pad] + b_ref[:], 0.0)
        tpos = (2 * (c * tp - 1) + phase
                + 2 * jax.lax.broadcasted_iota(jnp.int32, (bt, tp, 1), 1))
        yp = jnp.where((tpos >= 0) & (tpos < t_out), yp, neg)
        tile_max = jnp.max(yp, axis=1)
        pos = jnp.where(yp == tile_max[:, None, :], tpos,
                        jnp.int32(1 << 30))
        tile_arg = jnp.min(pos, axis=1)
        better = tile_max > acc_ref[:]
        iacc_ref[:] = jnp.where(better, tile_arg, iacc_ref[:])
        acc_ref[:] = jnp.where(better, tile_max, acc_ref[:])

    @pl.when(c == n_c - 1)
    def _emit():
        out_ref[:] = acc_ref[:]
        idx_ref[:] = iacc_ref[:]


def _paired_geometry(b: int, t: int, window: int):
    """Shared tiling of the paired layout (see _forward_paired)."""
    halo = window - 1
    t_out = t + halo
    b_tile = min(b, 32)
    tp = 128                           # pair rows/chunk = 256 timesteps
    bt_pad = -(-b // b_tile) * b_tile
    # chunk c covers starts [2(c*tp - 1), 2((c+1)*tp - 1)); chunk 0's
    # first two (negative) starts are masked, so cover t_out + 2
    n_chunks = -(-(t_out + 2) // (2 * tp))
    l_pad = 2 * n_chunks * tp          # total padded timesteps
    return halo, t_out, b_tile, tp, bt_pad, n_chunks, l_pad


def _paired_call(xp: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                 b: int, window: int, t_out: int, b_tile: int, tp: int,
                 interpret: bool, dot_dtype, skip=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the paired-layout kernel over a pre-padded pair-row operand
    xp [bt_pad, n_chunks*tp, 2E] (already dot_dtype). `skip` is an
    optional [b, 2] (start, len) per-example word span to zero in the
    input (the entity-cache leakage mask)."""
    e = xp.shape[2] // 2
    f = kernel.shape[1]
    f_pad = max(-(-f // 128) * 128, 128)
    bt_pad = xp.shape[0]
    n_chunks = xp.shape[1] // tp
    carry_rows = 8
    masked = skip is not None

    g = _build_g(kernel, window, e, f_pad).astype(dot_dtype)
    bp = jnp.pad(bias.reshape(1, f), ((0, 0), (0, f_pad - f)))
    sk = (jnp.zeros((bt_pad, 2), jnp.int32) if skip is None
          else jnp.pad(skip.astype(jnp.int32),
                       ((0, bt_pad - skip.shape[0]), (0, 0))))

    out, idx = pl.pallas_call(
        functools.partial(_paired_kernel, t_out=t_out, tp=tp,
                          dot_dtype=dot_dtype, masked=masked,
                          halo=window - 1),
        grid=(bt_pad // b_tile, n_chunks),
        in_specs=[
            pl.BlockSpec((b_tile, tp, 2 * e), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * e, 2 * f_pad), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 2), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_tile, f_pad), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, f_pad), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, f_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_tile, carry_rows, 2 * e), dot_dtype),
            pltpu.VMEM((b_tile, tp, 4 * e), dot_dtype),   # staged taps
            pltpu.VMEM((b_tile, f_pad), jnp.float32),     # max acc
            pltpu.VMEM((b_tile, f_pad), jnp.int32),       # argmax acc
        ],
        interpret=interpret,
    )(xp, g, bp, sk)
    return out[:b, :f], idx[:b, :f]


def _forward_paired(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: jnp.ndarray, window: int, interpret: bool,
                    dot_dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, t, e = x.shape
    halo, t_out, b_tile, tp, bt_pad, n_chunks, l_pad = \
        _paired_geometry(b, t, window)
    xp = jnp.pad(x, ((0, bt_pad - b), (halo, l_pad - t - halo), (0, 0)))
    xp = xp.reshape(bt_pad, n_chunks * tp, 2 * e).astype(dot_dtype)
    return _paired_call(xp, kernel, bias, b, window, t_out, b_tile, tp,
                        interpret, dot_dtype)


def _forward(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
             window: int, interpret: bool,
             dot_dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # paired fast path: 2E == one 128-lane tile and the window spans at
    # most two pair rows (W <= 3, the reference geometry)
    if 2 * x.shape[2] == 128 and window <= 3:
        return _forward_paired(x, kernel, bias, window, interpret,
                               dot_dtype)
    return _forward_generic(x, kernel, bias, window, interpret,
                            dot_dtype)


def _forward_generic(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray, window: int, interpret: bool,
                     dot_dtype=jnp.float32) -> Tuple[jnp.ndarray,
                                                     jnp.ndarray]:
    b, t, e = x.shape
    f = kernel.shape[1]
    halo = window - 1
    t_out = t + halo                  # torch pads (W-1) on both sides
    # F=100 leaves 28 MXU lanes idle; pad the (tiny) kernel/bias to the
    # 128-lane boundary once and slice the padded columns off the output
    f_pad = max(-(-f // 128) * 128, 128)
    b_tile = min(b, 32)
    t_tile = 128
    carry_rows = -(-halo // 8) * 8    # sublane-aligned carry depth

    bt_pad = -(-b // b_tile) * b_tile
    # window starts run to t_out + halo - 1 in shifted coordinates
    n_chunks = -(-(t_out + halo) // t_tile)
    # left conv pad (W-1) + right pad up to the chunk multiple
    xp = jnp.pad(x, ((0, bt_pad - b),
                     (halo, n_chunks * t_tile - t - halo),
                     (0, 0)))
    kp = jnp.pad(kernel, ((0, 0), (0, f_pad - f)))
    bp = jnp.pad(bias.reshape(1, f), ((0, 0), (0, f_pad - f)))

    out, idx = pl.pallas_call(
        functools.partial(_kernel, window=window, t_tile=t_tile,
                          t_out=t_out, dot_dtype=dot_dtype),
        grid=(bt_pad // b_tile, n_chunks),
        in_specs=[
            pl.BlockSpec((b_tile, t_tile, e), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((window * e, f_pad), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_tile, f_pad), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, f_pad), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, f_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_tile, carry_rows, e), jnp.float32),  # halo carry
            pltpu.VMEM((b_tile, t_tile, window * e), dot_dtype),  # taps
            pltpu.VMEM((b_tile, f_pad), jnp.float32),          # max acc
            pltpu.VMEM((b_tile, f_pad), jnp.int32),            # argmax acc
        ],
        interpret=interpret,
    )(xp, kp, bp)
    return out[:b, :f], idx[:b, :f]


def _paired_bwd_kernel(x_ref, g_ref, i_ref, gmat_ref, dx_ref, dg_ref,
                       carry_ref, zw_ref, gm_ref, spill_ref, dgacc_ref,
                       *, tp: int, dot_dtype):
    """Backward over the same (batch_tiles, pair_chunks) grid. The
    winner mask is reconstructed from positions alone (tpos == idx —
    nothing from the forward conv is recomputed); per tile one matmul
    accumulates dG = taps^T @ gmask and one computes the tap gradients
    dzw = gmask @ G^T, whose row-(r+1) half spills into the next chunk
    through a carry (the grid is sequential, pairs minor)."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_c = pl.num_programs(1)

    @pl.when(jnp.logical_and(i == 0, c == 0))
    def _init_dg():
        dgacc_ref[:] = jnp.zeros_like(dgacc_ref)

    @pl.when(c == 0)
    def _init_row():
        spill_ref[:] = jnp.zeros_like(spill_ref)
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = x_ref[:]                                   # [bt, tp, 2e]
    bt, _, lanes = x.shape
    f_pad = g_ref.shape[1]
    cr = carry_ref.shape[1]

    # staged taps, identical to the forward
    z = jnp.concatenate([carry_ref[:][:, cr - 1:, :], x], axis=1)
    carry_ref[:] = x[:, tp - cr:, :]
    zw_ref[:, :, :lanes] = z[:, :tp, :]
    zw_ref[:, :, lanes:] = z[:, 1:tp + 1, :]

    # winner mask per phase: route g[b, f] to the single window start
    # the forward recorded
    gv = g_ref[:]                                  # [bt, f_pad] f32
    iv = i_ref[:]                                  # [bt, f_pad] int32
    rows = jax.lax.broadcasted_iota(jnp.int32, (bt, tp, 1), 1)
    pos_e = 2 * (c * tp - 1 + rows)                # even-phase starts
    gm_ref[:, :, :f_pad] = jnp.where(
        pos_e == iv[:, None, :], gv[:, None, :], 0.0).astype(dot_dtype)
    gm_ref[:, :, f_pad:] = jnp.where(
        pos_e + 1 == iv[:, None, :], gv[:, None, :], 0.0).astype(dot_dtype)
    gmask = gm_ref[:].reshape(bt * tp, 2 * f_pad)

    # dG += taps^T @ gmask : [4e, 2f]
    dgacc_ref[:] = dgacc_ref[:] + jax.lax.dot_general(
        zw_ref[:].reshape(bt * tp, 2 * lanes), gmask,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # tap gradients back onto pair rows: gmask @ G^T -> [bt*tp, 4e];
    # lanes [0, 2e) land on row r, lanes [2e, 4e) on row r+1
    dzw = jax.lax.dot_general(
        gmask, gmat_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(bt, tp, 2 * lanes)
    prev = spill_ref[:][:, cr - 1:, :]             # last row's spill
    shifted = jnp.concatenate([prev, dzw[:, :tp - 1, lanes:]], axis=1)
    dx_ref[:] = dzw[:, :, :lanes] + shifted
    spill_ref[:] = dzw[:, tp - cr:, lanes:]

    @pl.when(jnp.logical_and(i == n_i - 1, c == n_c - 1))
    def _emit():
        dg_ref[:] = dgacc_ref[:]


def _paired_bwd_dg_kernel(x_ref, g_ref, i_ref, skip_ref, dg_ref,
                          carry_ref, zw_ref, gm_ref, dgacc_ref, *,
                          tp: int, dot_dtype, masked: bool,
                          halo: int):
    """dkernel-only backward (need_dx=False): when the conv input is an
    embedding of a FROZEN word table (every review tower here —
    reference DeepCoNN.py:14-16), dx is dead code, so the dzw matmul,
    its [B, T, E] f32 HBM write and the spill carry are all dropped;
    only the dG accumulation remains. (Same single scattered-G dot as
    the forward — the phase-split alternative executes the same MXU
    tile-passes and measured slower; see `_paired_kernel`.)"""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_c = pl.num_programs(1)

    @pl.when(jnp.logical_and(i == 0, c == 0))
    def _init_dg():
        dgacc_ref[:] = jnp.zeros_like(dgacc_ref)

    @pl.when(c == 0)
    def _init_row():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = x_ref[:]                                   # [bt, tp, 2e]
    if masked:
        x = _input_mask(x, skip_ref, c, tp, halo)
    bt, _, lanes = x.shape
    f_pad = g_ref.shape[1]
    cr = carry_ref.shape[1]

    z = jnp.concatenate([carry_ref[:][:, cr - 1:, :], x], axis=1)
    carry_ref[:] = x[:, tp - cr:, :]
    zw_ref[:, :, :lanes] = z[:, :tp, :]
    zw_ref[:, :, lanes:] = z[:, 1:tp + 1, :]

    gv = g_ref[:]
    iv = i_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bt, tp, 1), 1)
    pos_e = 2 * (c * tp - 1 + rows)
    gm_ref[:, :, :f_pad] = jnp.where(
        pos_e == iv[:, None, :], gv[:, None, :], 0.0).astype(dot_dtype)
    gm_ref[:, :, f_pad:] = jnp.where(
        pos_e + 1 == iv[:, None, :], gv[:, None, :], 0.0).astype(dot_dtype)

    dgacc_ref[:] = dgacc_ref[:] + jax.lax.dot_general(
        zw_ref[:].reshape(bt * tp, 2 * lanes),
        gm_ref[:].reshape(bt * tp, 2 * f_pad),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(i == n_i - 1, c == n_c - 1))
    def _emit():
        dg_ref[:] = dgacc_ref[:]


def _backward_paired_dg_only(x, kernel, g, idx, window, interpret,
                             dot_dtype):
    """dkernel from the paired backward with the dx path compiled out."""
    b, t, e = x.shape
    halo = window - 1
    t_out = t + halo
    tp = 64
    n_chunks = -(-(t_out + 2) // (2 * tp))
    l_pad = 2 * n_chunks * tp
    b_tile = min(b, 32)
    bt_pad = -(-b // b_tile) * b_tile
    xp = jnp.pad(x, ((0, bt_pad - b), (halo, l_pad - t - halo), (0, 0)))
    xp = xp.reshape(bt_pad, n_chunks * tp, 2 * e).astype(dot_dtype)
    return _dg_only_from_xp(xp, kernel, g, idx, window, interpret,
                            dot_dtype)


def _dg_only_from_xp(xp, kernel, g, idx, window, interpret, dot_dtype,
                     skip=None):
    """dkernel from an already padded/paired flat operand xp
    [bt_pad, L2, 2E] (the layout `paired_operand` caches; bt_pad is a
    b_tile multiple): the tp=64 chunking is a pure view of the same
    flat array the tp=128 forward reads — trailing pair-rows past the
    backward's own l_pad only emit all-zero gmask contributions."""
    bt_pad, L2, lanes = xp.shape
    e = lanes // 2
    f = kernel.shape[1]
    b = g.shape[0]
    f_pad = max(-(-f // 128) * 128, 128)
    b_tile = min(bt_pad, 32)
    tp = 64
    carry_rows = 8
    n_chunks = L2 // tp

    gp = jnp.pad(g, ((0, bt_pad - b), (0, f_pad - f)))
    ip = jnp.pad(idx, ((0, bt_pad - b), (0, f_pad - f)),
                 constant_values=-1)
    sk = (jnp.zeros((bt_pad, 2), jnp.int32) if skip is None
          else jnp.pad(skip.astype(jnp.int32),
                       ((0, bt_pad - skip.shape[0]), (0, 0))))

    dg = pl.pallas_call(
        functools.partial(_paired_bwd_dg_kernel, tp=tp,
                          dot_dtype=dot_dtype, masked=skip is not None,
                          halo=window - 1),
        grid=(bt_pad // b_tile, n_chunks),
        in_specs=[
            pl.BlockSpec((b_tile, tp, 2 * e), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, f_pad), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, f_pad), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 2), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4 * e, 2 * f_pad), lambda i, c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * e, 2 * f_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b_tile, carry_rows, 2 * e), dot_dtype),
            pltpu.VMEM((b_tile, tp, 4 * e), dot_dtype),      # taps
            pltpu.VMEM((b_tile, tp, 2 * f_pad), dot_dtype),  # gmask
            pltpu.VMEM((4 * e, 2 * f_pad), jnp.float32),     # dG acc
        ],
        interpret=interpret,
    )(xp, gp, ip, sk)

    # invert the _build_g scatter: sum every (d, h, phase) block that
    # carried tap w
    dg4 = dg.reshape(2, 2, e, 2, f_pad)
    dkernel = jnp.zeros((window * e, f), dg.dtype)
    for d in (0, 1):
        for h in (0, 1):
            for phase in (0, 1):
                w = 2 * d + h - phase
                if 0 <= w < window:
                    dkernel = dkernel.at[w * e:(w + 1) * e, :].add(
                        dg4[d, h, :, phase, :f])
    return dkernel


def _backward_paired(x, kernel, g, idx, window, interpret, dot_dtype):
    """Paired-layout backward driver: (dx, dkernel) from the gated
    output cotangent g and the winning window starts idx."""
    b, t, e = x.shape
    f = kernel.shape[1]
    halo = window - 1
    t_out = t + halo
    f_pad = max(-(-f // 128) * 128, 128)
    b_tile = min(b, 32)
    tp = 64
    carry_rows = 8

    bt_pad = -(-b // b_tile) * b_tile
    n_chunks = -(-(t_out + 2) // (2 * tp))
    l_pad = 2 * n_chunks * tp
    xp = jnp.pad(x, ((0, bt_pad - b), (halo, l_pad - t - halo), (0, 0)))
    xp = xp.reshape(bt_pad, n_chunks * tp, 2 * e).astype(dot_dtype)
    gmat = _build_g(kernel, window, e, f_pad).astype(dot_dtype)
    gp = jnp.pad(g, ((0, bt_pad - b), (0, f_pad - f)))
    # pad idx with -1: no position matches (their g is 0 anyway)
    ip = jnp.pad(idx, ((0, bt_pad - b), (0, f_pad - f)),
                 constant_values=-1)

    dxp, dg = pl.pallas_call(
        functools.partial(_paired_bwd_kernel, tp=tp, dot_dtype=dot_dtype),
        grid=(bt_pad // b_tile, n_chunks),
        in_specs=[
            pl.BlockSpec((b_tile, tp, 2 * e), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, f_pad), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, f_pad), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * e, 2 * f_pad), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_tile, tp, 2 * e), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * e, 2 * f_pad), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt_pad, n_chunks * tp, 2 * e),
                                 jnp.float32),
            jax.ShapeDtypeStruct((4 * e, 2 * f_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_tile, carry_rows, 2 * e), dot_dtype),
            pltpu.VMEM((b_tile, tp, 4 * e), dot_dtype),      # taps
            pltpu.VMEM((b_tile, tp, 2 * f_pad), dot_dtype),  # gmask
            pltpu.VMEM((b_tile, carry_rows, 2 * e), jnp.float32),
            pltpu.VMEM((4 * e, 2 * f_pad), jnp.float32),     # dG acc
        ],
        interpret=interpret,
    )(xp, gp, ip, gmat)

    # the kernel writes block c as the pair rows [c*tp - 1, (c+1)*tp - 1)
    # (the d=0 tap half of tile row r belongs to global pair row
    # r0 - 1 + r), i.e. the whole array is one pair row early: global
    # timestep u lives at flat position u + 2. The dropped final row is
    # always padding (l_pad >= t + halo + 2).
    dx = dxp.reshape(bt_pad, l_pad, e)[:b, halo + 2:halo + 2 + t, :]
    # invert the _build_g scatter: sum every (d, h, phase) block that
    # carried tap w
    dg4 = dg.reshape(2, 2, e, 2, f_pad)
    dkernel = jnp.zeros((window * e, f), dg.dtype)
    for d in (0, 1):
        for h in (0, 1):
            for phase in (0, 1):
                w = 2 * d + h - phase
                if 0 <= w < window:
                    dkernel = dkernel.at[w * e:(w + 1) * e, :].add(
                        dg4[d, h, :, phase, :f])
    return dx, dkernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def textcnn_pool(x, kernel, bias, window: int = 3,
                 interpret: bool = False, dot_dtype=jnp.float32,
                 need_dx: bool = True):
    """max_t relu(conv1d_(W-1)pad(x) @ kernel + bias): [B,T,E] -> [B,F].
    kernel: [W*E, F] (tap-major rows). `dot_dtype=bf16` runs the conv
    matmul in bf16 (f32 accumulation) for the native MXU path.
    `need_dx=False` (the input embeds a FROZEN word table, so its
    cotangent is dead) compiles the backward without the dx matmul and
    its [B, T, E] f32 HBM write — the backward's dominant traffic."""
    out, _ = _forward(x, kernel, bias, window, interpret, dot_dtype)
    return out


def _fwd(x, kernel, bias, window, interpret, dot_dtype, need_dx):
    out, idx = _forward(x, kernel, bias, window, interpret, dot_dtype)
    return out, (x, kernel, out, idx)


def _bwd(window, interpret, dot_dtype, need_dx, res, g):
    x, kernel, out, idx = res
    b, t, e = x.shape
    f = kernel.shape[1]
    # ReLU gate: a clamped-to-zero max contributes no gradient
    g = jnp.where(out > 0, g, 0.0)

    if 2 * e == 128 and window <= 3:
        # paired Pallas backward (XLA's gather/scatter lowering of the
        # index form is pathologically slow on TPU)
        if not need_dx:
            dkernel = _backward_paired_dg_only(x, kernel, g, idx, window,
                                               interpret, dot_dtype)
            # symbolic zeros: consumed only by the frozen table's dead
            # scatter, DCE'd with it
            return jnp.zeros_like(x), dkernel, jnp.sum(g, axis=0)
        dx, dkernel = _backward_paired(x, kernel, g, idx, window,
                                       interpret, dot_dtype)
        return dx, dkernel, jnp.sum(g, axis=0)

    # winning windows: for (b, f) the taps are xp[b, idx+w], w < W,
    # where xp carries the same (W-1)-left padding as the forward
    xp = jnp.pad(x, ((0, 0), (window - 1, window - 1), (0, 0)))
    tap_t = idx[:, :, None] + jnp.arange(window)[None, None, :]  # [B,F,W]
    bidx = jnp.arange(b)[:, None, None]
    taps = xp[bidx, tap_t, :]                                    # [B,F,W,E]

    dkernel = jnp.einsum("bfwe,bf->wef", taps, g).reshape(window * e, f)
    dbias = jnp.sum(g, axis=0)
    if not need_dx:
        return jnp.zeros_like(x), dkernel, dbias

    kmat = kernel.reshape(window, e, f)
    contrib = jnp.einsum("bf,wef->bfwe", g, kmat)                # [B,F,W,E]
    dxp = jnp.zeros_like(xp).at[bidx, tap_t, :].add(contrib)
    dx = dxp[:, window - 1:window - 1 + t, :]
    return dx, dkernel, dbias


textcnn_pool.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------
# Fused gather + conv + relu + maxpool: the doc-embedding round trip is
# the flagship's dominant HBM traffic (~4 full [B, T, E] passes per
# tower: f32 gather write + read + bf16 cast write + kernel read). Here
# ONE XLA gather — from a zero-row-padded table, with conv-padded ids —
# emits the kernel's padded paired bf16 operand directly, and the
# backward never materializes dx at all: the word table is frozen
# (reference DeepCoNN.py:14-16), so only dkernel is needed, recovered by
# regathering the W winning taps per (b, f) — [B, F, W, E] bytes, ~7%
# of a full doc tensor at the reference geometry.
# ---------------------------------------------------------------------

def _embed_xp(ids: jnp.ndarray, table: jnp.ndarray, window: int,
              dot_dtype):
    """Padded paired-layout operand from one gather: row V of the
    augmented table is the zero conv-pad token, ids are padded with V,
    and the gather emits dot_dtype — the intermediate [B, T, E] f32 doc
    tensor never touches HBM."""
    b, t = ids.shape
    v, e = table.shape
    halo, t_out, b_tile, tp, bt_pad, n_chunks, l_pad = \
        _paired_geometry(b, t, window)
    tab = jnp.concatenate(
        [table, jnp.zeros((1, e), table.dtype)]).astype(dot_dtype)
    idsp = jnp.pad(ids, ((0, bt_pad - b), (halo, l_pad - t - halo)),
                   constant_values=v)
    xp = jnp.take(tab, idsp, axis=0).reshape(bt_pad, n_chunks * tp, 2 * e)
    return xp, t_out, b_tile, tp


def _forward_embed(ids, table, kernel, bias, window, interpret,
                   dot_dtype):
    b = ids.shape[0]
    if 2 * table.shape[1] != 128 or window > 3:
        # generic geometry: gather plain and reuse the un-paired kernel
        x = jnp.take(table, ids, axis=0)
        return _forward_generic(x, kernel, bias, window, interpret,
                                dot_dtype)
    xp, t_out, b_tile, tp = _embed_xp(ids, table, window, dot_dtype)
    return _paired_call(xp, kernel, bias, b, window, t_out, b_tile, tp,
                        interpret, dot_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def textcnn_pool_embed(ids, table, kernel, bias, window: int = 3,
                       interpret: bool = False, dot_dtype=jnp.float32):
    """max_t relu(conv1d_(W-1)pad(table[ids]) @ kernel + bias):
    ids [B, T] int32, table [V, E] (FROZEN — its cotangent is zero by
    construction), kernel [W*E, F] -> [B, F]."""
    out, _ = _forward_embed(ids, table, kernel, bias, window, interpret,
                            dot_dtype)
    return out


def _fwd_embed(ids, table, kernel, bias, window, interpret, dot_dtype):
    out, idx = _forward_embed(ids, table, kernel, bias, window,
                              interpret, dot_dtype)
    return out, (ids, table, out, idx)


def _bwd_embed(window, interpret, dot_dtype, res, g):
    import numpy as np

    ids, table, out, idx = res
    b, t = ids.shape
    v, e = table.shape
    f = idx.shape[1]
    halo = window - 1
    # ReLU gate: a clamped-to-zero max contributes no gradient
    g = jnp.where(out > 0, g, 0.0)

    # regather only the winning taps: window start idx covers padded
    # positions idx + w (same coordinates as the un-fused backward)
    idsp = jnp.pad(ids, ((0, 0), (halo, halo)), constant_values=v)
    tab = jnp.concatenate([table, jnp.zeros((1, e), table.dtype)])
    tap_t = idx[:, :, None] + jnp.arange(window)[None, None, :]  # [B,F,W]
    bidx = jnp.arange(b)[:, None, None]
    taps = jnp.take(tab, idsp[bidx, tap_t], axis=0)              # [B,F,W,E]
    dkernel = jnp.einsum("bfwe,bf->wef", taps.astype(jnp.float32),
                         g).reshape(window * e, f)
    dbias = jnp.sum(g, axis=0)
    # ids are integral (float0 cotangent); the frozen table's zero
    # cotangent is DCE'd behind the caller's stop_gradient
    dids = np.zeros(ids.shape, dtype=jax.dtypes.float0)
    return dids, jnp.zeros_like(table), dkernel, dbias


textcnn_pool_embed.defvjp(_fwd_embed, _bwd_embed)


# ---------------------------------------------------------------------
# Pre-paired operand entry: with the device embedding cache
# (hp.cache_doc_embeds) the [B, T, E] doc tensor is static for the whole
# run, so its padded paired relayout — measured as expensive as the
# kernel itself, and built TWICE per tower (forward + dG backward) — is
# hoisted out of the step entirely: the cache stores `paired_operand`'s
# output and both kernels consume it directly (the tp=64 backward
# chunking is a pure view of the same flat array as the tp=128 forward).
# ---------------------------------------------------------------------

def paired_operand(x: jnp.ndarray, window: int, dot_dtype) -> jnp.ndarray:
    """[B, T, E] float docs -> the flat padded paired operand
    [B, L2, 2E] (L2 = l_pad/2) that `textcnn_pool_paired` consumes.
    Identical bytes to what `_forward_paired` builds in-step (pad ->
    pair-reshape -> cast), computed once at cache-build time. Requires
    2E == 128 and window <= 3 (the paired-layout condition)."""
    b, t, e = x.shape
    assert 2 * e == 128 and window <= 3, (e, window)
    halo, _, _, tp, _, n_chunks, l_pad = _paired_geometry(b, t, window)
    xp = jnp.pad(x, ((0, 0), (halo, l_pad - t - halo), (0, 0)))
    return xp.reshape(b, l_pad // 2, 2 * e).astype(dot_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def textcnn_pool_paired(xp, kernel, bias, t: int, window: int = 3,
                        interpret: bool = False, dot_dtype=jnp.float32,
                        skip=None):
    """`textcnn_pool` over a pre-paired operand (`paired_operand`):
    [B, L2, 2E] -> [B, F]. `t` is the original (unpadded) doc length.
    The operand comes from the FROZEN word table, so its cotangent is
    dead (dG-only backward, no relayout pass). `skip` (None or [B, 2]
    int32 (start, len)) zeros that word span of each doc inside the
    kernel — the entity-cache leakage mask (hp.cache_entity): canonical
    per-entity docs with the train pair's own review masked in place."""
    out, _ = _forward_prepaired(xp, kernel, bias, t, window,
                                interpret, dot_dtype, skip)
    return out


def _forward_prepaired(xp, kernel, bias, t, window, interpret,
                       dot_dtype, skip=None):
    b = xp.shape[0]
    halo, t_out, b_tile, tp, bt_pad, n_chunks, l_pad = \
        _paired_geometry(b, t, window)
    assert 2 * xp.shape[1] == l_pad, (xp.shape, l_pad)
    if bt_pad != b:
        xp = jnp.pad(xp, ((0, bt_pad - b), (0, 0), (0, 0)))
    return _paired_call(xp.astype(dot_dtype), kernel, bias, b, window,
                        t_out, b_tile, tp, interpret, dot_dtype,
                        skip=skip)


def _fwd_prepaired(xp, kernel, bias, t, window, interpret, dot_dtype,
                   skip=None):
    out, idx = _forward_prepaired(xp, kernel, bias, t, window,
                                  interpret, dot_dtype, skip)
    return out, (xp, kernel, skip, out, idx)


def _bwd_prepaired(t, window, interpret, dot_dtype, res, g):
    import numpy as np

    xp, kernel, skip, out, idx = res
    b = xp.shape[0]
    b_tile = min(b, 32)
    bt_pad = -(-b // b_tile) * b_tile
    if bt_pad != b:
        xp = jnp.pad(xp, ((0, bt_pad - b), (0, 0), (0, 0)))
    # ReLU gate: a clamped-to-zero max contributes no gradient
    g = jnp.where(out > 0, g, 0.0)
    dkernel = _dg_only_from_xp(xp.astype(dot_dtype), kernel, g, idx,
                               window, interpret, dot_dtype, skip=skip)
    dskip = (None if skip is None
             else np.zeros(skip.shape, dtype=jax.dtypes.float0))
    # frozen-table operand: zero cotangent, DCE'd behind stop_gradient
    return jnp.zeros_like(xp), dkernel, jnp.sum(g, axis=0), dskip


textcnn_pool_paired.defvjp(_fwd_prepaired, _bwd_prepaired)


# ---------------------------------------------------------------------
# Row-gather fused INTO the kernel DMA (the r4 roofline's remaining
# memory lever): with the entity/doc cache, each batch row's prepaired
# operand lives at table[row] in HBM. The take()-based path writes the
# gathered [B, L2, 2E] copy to HBM and the kernels read it back (and
# the backward reads it again); here the kernels DMA the scattered rows
# HBM->VMEM directly — per grid step, b_tile per-row async copies,
# double-buffered across the chunk axis — so the gather copy never
# exists and each direction reads each byte once.
# ---------------------------------------------------------------------

def _rowgather_pipeline(table_ref, rows_ref, xbuf, sems, b_tile, tp,
                        n_c, body):
    """Shared manual-DMA pipeline: iterate the (i-fixed) chunk axis via
    the grid, with block (i, c) = table[rows[i*b_tile + j], c*tp:(c+1)*tp]
    for j < b_tile, fetched into xbuf slot (i*n_c + c) % 2 one chunk
    ahead. `body(x)` consumes the current [b_tile, tp, 2E] block."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_i = pl.num_programs(0)
    flat = i * n_c + c

    def dma(slot, ii, cc, j):
        return pltpu.make_async_copy(
            table_ref.at[rows_ref[ii * b_tile + j],
                         pl.ds(cc * tp, tp), :],
            xbuf.at[slot, j], sems.at[slot, j])

    def start_all(slot, ii, cc):
        for j in range(b_tile):
            dma(slot, ii, cc, j).start()

    @pl.when(flat == 0)
    def _warm():
        start_all(0, 0, 0)

    # prefetch the NEXT grid step's rows while this one computes
    nxt = flat + 1
    ni = nxt // n_c
    nc = nxt % n_c

    @pl.when(nxt < n_i * n_c)
    def _ahead():
        start_all(nxt % 2, ni, nc)

    for j in range(b_tile):
        dma(flat % 2, i, c, j).wait()
    body(xbuf[flat % 2])


def _gathered_paired_kernel(rows_ref, table_ref, g_ref, b_ref, skip_ref,
                            out_ref, idx_ref, xbuf, sems, carry_ref,
                            zw_ref, acc_ref, iacc_ref, *, t_out: int,
                            tp: int, n_c: int, dot_dtype, masked: bool,
                            halo: int):
    """`_paired_kernel` with the row gather fused into its DMA."""
    c = pl.program_id(1)
    neg = jnp.float32(-3.0e38)

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, neg)
        iacc_ref[:] = jnp.zeros_like(iacc_ref)
        carry_ref[:] = jnp.zeros_like(carry_ref)

    def body(x):
        if masked:
            x = _input_mask(x, skip_ref, c, tp, halo)
        bt, _, lanes = x.shape
        f2 = g_ref.shape[1]
        f_pad = f2 // 2
        cr = carry_ref.shape[1]
        z = jnp.concatenate([carry_ref[:][:, cr - 1:, :], x], axis=1)
        carry_ref[:] = x[:, tp - cr:, :]
        zw_ref[:, :, :lanes] = z[:, :tp, :]
        zw_ref[:, :, lanes:] = z[:, 1:tp + 1, :]
        y = jax.lax.dot_general(
            zw_ref[:].reshape(bt * tp, 2 * lanes), g_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(bt, tp, f2)
        for phase in (0, 1):
            yp = jnp.maximum(
                y[:, :, phase * f_pad:(phase + 1) * f_pad] + b_ref[:],
                0.0)
            tpos = (2 * (c * tp - 1) + phase
                    + 2 * jax.lax.broadcasted_iota(jnp.int32,
                                                   (bt, tp, 1), 1))
            yp = jnp.where((tpos >= 0) & (tpos < t_out), yp, neg)
            tile_max = jnp.max(yp, axis=1)
            pos = jnp.where(yp == tile_max[:, None, :], tpos,
                            jnp.int32(1 << 30))
            tile_arg = jnp.min(pos, axis=1)
            better = tile_max > acc_ref[:]
            iacc_ref[:] = jnp.where(better, tile_arg, iacc_ref[:])
            acc_ref[:] = jnp.where(better, tile_max, acc_ref[:])

    b_tile = out_ref.shape[0]
    _rowgather_pipeline(table_ref, rows_ref, xbuf, sems, b_tile, tp,
                        n_c, body)

    @pl.when(c == n_c - 1)
    def _emit():
        out_ref[:] = acc_ref[:]
        idx_ref[:] = iacc_ref[:]


def _gathered_bwd_dg_kernel(rows_ref, table_ref, g_ref, i_ref, skip_ref,
                            dg_ref, xbuf, sems, carry_ref, zw_ref,
                            gm_ref, dgacc_ref, *, tp: int, n_c: int,
                            dot_dtype, masked: bool, halo: int):
    """`_paired_bwd_dg_kernel` with the row gather fused into its DMA."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_i = pl.num_programs(0)

    @pl.when(jnp.logical_and(i == 0, c == 0))
    def _init_dg():
        dgacc_ref[:] = jnp.zeros_like(dgacc_ref)

    @pl.when(c == 0)
    def _init_row():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    def body(x):
        if masked:
            x = _input_mask(x, skip_ref, c, tp, halo)
        bt, _, lanes = x.shape
        f_pad = g_ref.shape[1]
        cr = carry_ref.shape[1]
        z = jnp.concatenate([carry_ref[:][:, cr - 1:, :], x], axis=1)
        carry_ref[:] = x[:, tp - cr:, :]
        zw_ref[:, :, :lanes] = z[:, :tp, :]
        zw_ref[:, :, lanes:] = z[:, 1:tp + 1, :]
        gv = g_ref[:]
        iv = i_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (bt, tp, 1), 1)
        pos_e = 2 * (c * tp - 1 + rows)
        gm_ref[:, :, :f_pad] = jnp.where(
            pos_e == iv[:, None, :], gv[:, None, :],
            0.0).astype(dot_dtype)
        gm_ref[:, :, f_pad:] = jnp.where(
            pos_e + 1 == iv[:, None, :], gv[:, None, :],
            0.0).astype(dot_dtype)
        dgacc_ref[:] = dgacc_ref[:] + jax.lax.dot_general(
            zw_ref[:].reshape(bt * tp, 2 * lanes),
            gm_ref[:].reshape(bt * tp, 2 * f_pad),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    b_tile = g_ref.shape[0]
    _rowgather_pipeline(table_ref, rows_ref, xbuf, sems, b_tile, tp,
                        n_c, body)

    @pl.when(jnp.logical_and(i == n_i - 1, c == n_c - 1))
    def _emit():
        dg_ref[:] = dgacc_ref[:]


def _gathered_call(table, rows, kernel, bias, b, window, t_out, b_tile,
                   tp, interpret, dot_dtype, skip):
    e = table.shape[2] // 2
    f = kernel.shape[1]
    f_pad = max(-(-f // 128) * 128, 128)
    bt_pad = -(-b // b_tile) * b_tile
    n_chunks = table.shape[1] // tp
    carry_rows = 8
    masked = skip is not None

    g = _build_g(kernel, window, e, f_pad).astype(dot_dtype)
    bp = jnp.pad(bias.reshape(1, f), ((0, 0), (0, f_pad - f)))
    rp = jnp.pad(rows.astype(jnp.int32), (0, bt_pad - b))
    sk = (jnp.zeros((bt_pad, 2), jnp.int32) if skip is None
          else jnp.pad(skip.astype(jnp.int32),
                       ((0, bt_pad - skip.shape[0]), (0, 0))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bt_pad // b_tile, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # table in HBM
            pl.BlockSpec((4 * e, 2 * f_pad), lambda i, c, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad), lambda i, c, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 2), lambda i, c, r: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_tile, f_pad), lambda i, c, r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, f_pad), lambda i, c, r: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b_tile, tp, 2 * e), dot_dtype),   # DMA slots
            pltpu.SemaphoreType.DMA((2, b_tile)),
            pltpu.VMEM((b_tile, carry_rows, 2 * e), dot_dtype),
            pltpu.VMEM((b_tile, tp, 4 * e), dot_dtype),      # staged taps
            pltpu.VMEM((b_tile, f_pad), jnp.float32),        # max acc
            pltpu.VMEM((b_tile, f_pad), jnp.int32),          # argmax acc
        ],
    )
    out, idx = pl.pallas_call(
        functools.partial(_gathered_paired_kernel, t_out=t_out, tp=tp,
                          n_c=n_chunks, dot_dtype=dot_dtype,
                          masked=masked, halo=window - 1),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bt_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, f_pad), jnp.int32),
        ],
        interpret=interpret,
    )(rp, table, g, bp, sk)
    return out[:b, :f], idx[:b, :f]


def _gathered_dg(table, rows, kernel, g, idx, window, interpret,
                 dot_dtype, skip):
    e = table.shape[2] // 2
    f = kernel.shape[1]
    b = g.shape[0]
    f_pad = max(-(-f // 128) * 128, 128)
    b_tile = min(b, 32)
    bt_pad = -(-b // b_tile) * b_tile
    tp = 64
    n_chunks = table.shape[1] // tp           # L2 pair rows / tp
    carry_rows = 8

    gp = jnp.pad(g, ((0, bt_pad - b), (0, f_pad - f)))
    ip = jnp.pad(idx, ((0, bt_pad - b), (0, f_pad - f)),
                 constant_values=-1)
    rp = jnp.pad(rows.astype(jnp.int32), (0, bt_pad - b))
    sk = (jnp.zeros((bt_pad, 2), jnp.int32) if skip is None
          else jnp.pad(skip.astype(jnp.int32),
                       ((0, bt_pad - skip.shape[0]), (0, 0))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bt_pad // b_tile, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((b_tile, f_pad), lambda i, c, r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, f_pad), lambda i, c, r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 2), lambda i, c, r: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4 * e, 2 * f_pad),
                               lambda i, c, r: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, b_tile, tp, 2 * e), dot_dtype),
            pltpu.SemaphoreType.DMA((2, b_tile)),
            pltpu.VMEM((b_tile, carry_rows, 2 * e), dot_dtype),
            pltpu.VMEM((b_tile, tp, 4 * e), dot_dtype),
            pltpu.VMEM((b_tile, tp, 2 * f_pad), dot_dtype),
            pltpu.VMEM((4 * e, 2 * f_pad), jnp.float32),
        ],
    )
    dg = pl.pallas_call(
        functools.partial(_gathered_bwd_dg_kernel, tp=tp, n_c=n_chunks,
                          dot_dtype=dot_dtype, masked=skip is not None,
                          halo=window - 1),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4 * e, 2 * f_pad), jnp.float32),
        interpret=interpret,
    )(rp, table, gp, ip, sk)

    dg4 = dg.reshape(2, 2, e, 2, f_pad)
    dkernel = jnp.zeros((window * e, f), dg.dtype)
    for d in (0, 1):
        for h in (0, 1):
            for phase in (0, 1):
                w = 2 * d + h - phase
                if 0 <= w < window:
                    dkernel = dkernel.at[w * e:(w + 1) * e, :].add(
                        dg4[d, h, :, phase, :f])
    return dkernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def textcnn_pool_rows(table, rows, kernel, bias, t: int,
                      window: int = 3, interpret: bool = False,
                      dot_dtype=jnp.float32, skip=None):
    """`textcnn_pool_paired` with the batch-row gather fused into the
    kernels' DMA: `table` is the FULL prepaired doc store
    ([N, L2, 2E], `paired_operand` layout, resident in HBM) and `rows`
    [B] selects each example's doc. The gathered [B, L2, 2E] copy that
    the take()-based path writes to HBM (and both kernels re-read)
    never exists — forward and backward each DMA the scattered rows
    HBM->VMEM exactly once, per-row async copies double-buffered across
    the chunk axis. The table comes from the frozen word table, so the
    backward is dG-only. `skip` masks per-example word spans as in
    `textcnn_pool_paired`."""
    out, _ = _forward_rows(table, rows, kernel, bias, t, window,
                           interpret, dot_dtype, skip)
    return out


def _forward_rows(table, rows, kernel, bias, t, window, interpret,
                  dot_dtype, skip=None):
    b = rows.shape[0]
    halo, t_out, b_tile, tp, bt_pad, n_chunks, l_pad = \
        _paired_geometry(b, t, window)
    assert 2 * table.shape[1] == l_pad, (table.shape, l_pad)
    return _gathered_call(table.astype(dot_dtype), rows, kernel, bias,
                          b, window, t_out, b_tile, tp, interpret,
                          dot_dtype, skip)


def _fwd_rows(table, rows, kernel, bias, t, window, interpret,
              dot_dtype, skip=None):
    out, idx = _forward_rows(table, rows, kernel, bias, t, window,
                             interpret, dot_dtype, skip)
    return out, (table, rows, kernel, skip, out, idx)


def _bwd_rows(t, window, interpret, dot_dtype, res, g):
    import numpy as np

    table, rows, kernel, skip, out, idx = res
    g = jnp.where(out > 0, g, 0.0)
    dkernel = _gathered_dg(table.astype(dot_dtype), rows, kernel, g,
                           idx, window, interpret, dot_dtype, skip)
    dskip = (None if skip is None
             else np.zeros(skip.shape, dtype=jax.dtypes.float0))
    drows = np.zeros(rows.shape, dtype=jax.dtypes.float0)
    return (jnp.zeros_like(table), drows, dkernel, jnp.sum(g, axis=0),
            dskip)


textcnn_pool_rows.defvjp(_fwd_rows, _bwd_rows)
