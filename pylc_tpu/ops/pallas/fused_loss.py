"""Pallas kernel: CE + Dice + Focal multi-loss fused into a single pass.

The jnp implementation (pylc_tpu/ops/losses.py) already shares one
softmax; this kernel goes further:

  forward   — one streaming pass over the pixel-logit matrix producing
      the scalar/per-class partials all three losses need (nll sum,
      weight sum, focal sum, per-class intersection, per-class prob
      mass, per-class target count).  Probabilities are never
      materialized in HBM.
  backward  — an analytic custom-VJP kernel: given the forward's reduced
      partials, d(total)/d(logits) for all three terms is a local
      per-pixel expression, so the backward is one more streaming pass —
      no stored softmax residuals (jax.grad of the jnp version keeps a
      full log-softmax in HBM for the backward).

      dCE/dx    = (w_y / W) (p - onehot)
      dFocal/dx = (1/N) f'(p_y+eps) p_y (onehot - p),  f(q) = -a(1-q)^g log q
      dDice/dx  = p ⊙ (g - <g, p>),
                  g_c = [ (2 I_c + s) - 2 t_c (U_c + s) ] / (C (U_c + s)^2)

Memory layout (the round-2 rework): the kernel operates on the
TRANSPOSED [C, N] matrix — classes on the sublane axis (padded to the
8-sublane granule: 9 -> 16), pixels on the 128-lane axis.  Round 1 kept
[N, C] and padded the class dim to the 128-lane width, which blew a
[2.1M, 9] f32 logit matrix up to 1.07 GB *in HBM* and cost ~12 ms/step
of pure padding traffic in the DeepLab train program; the transposed
layout stores only 16/9 of the real bytes and the per-pixel softmax
becomes a sublane reduction, which the VPU does natively.

Numerics match pylc_tpu.ops.losses.multi_loss (tests/test_pallas_loss.py
checks values and gradients on the interpret backend and vs jax.grad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pylc_tpu.ops.losses import LossWeights

BLOCK_N = 4096   # pixels (lanes) per grid step
SUBLANE = 8      # f32 sublane granule: class dim padded to a multiple

# accumulator lane columns (see _fwd_kernel)
_INTER, _SUMP, _CNT, _SCALAR = 0, 1, 2, 3
# scalar sublane rows within the _SCALAR column
_NLL, _WSUM, _FOCAL, _COUNT = 0, 1, 2, 3
# backward stats lane columns
_NUM, _DEN, _SWSUM, _SCOUNT, _SCT = 0, 1, 2, 3, 4


def _fwd_kernel(x_ref, t_ref, w_ref, acc_ref, *, n_valid: int,
                w: LossWeights):
    """Grid step: accumulate partials for BLOCK_N pixels.

    x_ref: [Cp, BLOCK_N] logits (classes on sublanes);
    t_ref: [1, BLOCK_N] int32 targets;  w_ref: [Cp, 1] CE class weights
    (zero on padded classes);  acc_ref: [Cp, 128] f32 accumulator:
      lane _INTER : intersection_c  (sum p_c over target-c pixels)
      lane _SUMP  : prob mass sum_c (sum p_c over all pixels)
      lane _CNT   : target count_c  (one-hot count)
      lane _SCALAR: rows _NLL/_WSUM/_FOCAL/_COUNT hold the 4 scalars
    """
    step = pl.program_id(0)
    Cp = x_ref.shape[0]

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)          # [Cp, B]
    t = t_ref[:]                              # [1, B]
    base = step * BLOCK_N
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK_N), 1) + base
    valid = (cols < n_valid).astype(jnp.float32)      # [1, B]

    # one softmax over the class (sublane) axis
    m = jnp.max(x, axis=0, keepdims=True)
    ex = jnp.exp(x - m)
    se = jnp.sum(ex, axis=0, keepdims=True)
    p = ex / se                                        # [Cp, B]
    logp = (x - m) - jnp.log(se)

    onehot = (jax.lax.broadcasted_iota(jnp.int32, (Cp, BLOCK_N), 0)
              == t).astype(jnp.float32) * valid        # [Cp, B]

    # CE partials
    nll = -jnp.sum(onehot * logp, axis=0, keepdims=True)   # [1, B]
    cw = w_ref[:]                                          # [Cp, 1]
    px_w = jnp.sum(onehot * cw, axis=0, keepdims=True)     # [1, B]
    if not w.weighted:
        px_w = valid
    nll_sum = jnp.sum(nll * px_w)
    wsum = jnp.sum(px_w)

    # focal partials (target class only)
    p_y = jnp.sum(onehot * p, axis=0, keepdims=True) + w.eps
    focal_px = -w.fl_alpha * jnp.power(1.0 - p_y, w.fl_gamma) * jnp.log(p_y)
    focal_sum = jnp.sum(focal_px * valid)

    # dice partials — per-class sublane vectors [Cp, 1]
    inter = jnp.sum(p * onehot, axis=1, keepdims=True)
    sum_p = jnp.sum(p * valid, axis=1, keepdims=True)
    cnt_t = jnp.sum(onehot, axis=1, keepdims=True)

    # pack into the [Cp, 128] accumulator without scatter: lane/sublane
    # iota masks select the destination cells
    lane = jax.lax.broadcasted_iota(jnp.int32, (Cp, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (Cp, 128), 0)
    upd = ((lane == _INTER) * inter + (lane == _SUMP) * sum_p +
           (lane == _CNT) * cnt_t +
           (lane == _SCALAR) * ((sub == _NLL) * nll_sum +
                                (sub == _WSUM) * wsum +
                                (sub == _FOCAL) * focal_sum +
                                (sub == _COUNT) * jnp.sum(valid)))
    acc_ref[:] += upd.astype(jnp.float32)


def _fused_forward(xT, tT, cw, w: LossWeights, n_valid: int):
    """Run the forward kernel.  xT: [Cp, N_pad] f32; tT: [1, N_pad]
    int32; cw: [Cp, 1].  Returns acc [Cp, 128]."""
    Cp, N_pad = xT.shape
    n_blocks = N_pad // BLOCK_N

    acc = pl.pallas_call(
        functools.partial(_fwd_kernel, n_valid=n_valid, w=w),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((Cp, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Cp, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cp, 128), jnp.float32),
        interpret=_interpret(),
    )(xT, tT, cw)
    return acc


def _losses_from_acc(acc, n_classes: int, w: LossWeights):
    nll_sum = acc[_NLL, _SCALAR]
    wsum = acc[_WSUM, _SCALAR]
    focal_sum = acc[_FOCAL, _SCALAR]
    count = acc[_COUNT, _SCALAR]
    inter = acc[:n_classes, _INTER]
    sum_p = acc[:n_classes, _SUMP]
    cnt_t = acc[:n_classes, _CNT]
    ce = nll_sum / wsum
    card = sum_p + cnt_t
    dice = jnp.mean(1.0 - (2.0 * inter + w.dice_smooth)
                    / (card + w.dice_smooth))
    focal = focal_sum / count
    total = w.ce * ce + w.dice * dice + w.focal * focal
    return total, ce, dice, focal


def _bwd_kernel(x_ref, t_ref, w_ref, stat_ref, dx_ref, *, n_valid: int,
                n_classes: int, w: LossWeights):
    """Analytic d(total)/d(logits) for one pixel block (transposed
    layout, see _fwd_kernel).

    stat_ref: [Cp, 128] — lane _NUM: (2 I_c + s); lane _DEN: (U_c + s);
    lanes _SWSUM/_SCOUNT/_SCT: wsum / count / upstream cotangent
    broadcast along sublanes.
    """
    step = pl.program_id(0)
    Cp = x_ref.shape[0]
    x = x_ref[:].astype(jnp.float32)
    t = t_ref[:]
    base = step * BLOCK_N
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK_N), 1) + base
    valid = (cols < n_valid).astype(jnp.float32)

    m = jnp.max(x, axis=0, keepdims=True)
    ex = jnp.exp(x - m)
    se = jnp.sum(ex, axis=0, keepdims=True)
    p = ex / se

    onehot = (jax.lax.broadcasted_iota(jnp.int32, (Cp, BLOCK_N), 0)
              == t).astype(jnp.float32)

    wsum = stat_ref[0, _SWSUM]
    count = stat_ref[0, _SCOUNT]
    ct = stat_ref[0, _SCT]
    num_c = stat_ref[:, _NUM:_NUM + 1]      # [Cp, 1]
    den_c = stat_ref[:, _DEN:_DEN + 1]      # [Cp, 1]
    cw = w_ref[:]                           # [Cp, 1]

    # --- CE ---
    if w.weighted:
        px_w = jnp.sum(onehot * cw, axis=0, keepdims=True)
    else:
        px_w = jnp.ones_like(valid)
    d_ce = (px_w / wsum) * (p - onehot)

    # --- Focal (target class only) ---
    p_y = jnp.sum(onehot * p, axis=0, keepdims=True)
    q = p_y + w.eps
    fprime = -w.fl_alpha * (
        -w.fl_gamma * jnp.power(1.0 - q, w.fl_gamma - 1.0) * jnp.log(q)
        + jnp.power(1.0 - q, w.fl_gamma) / q)
    d_focal = (fprime / count) * p_y * (onehot - p)

    # --- Dice ---
    g = (num_c - 2.0 * onehot * den_c) / (n_classes * den_c ** 2)
    gp = jnp.sum(g * p, axis=0, keepdims=True)
    d_dice = p * (g - gp)

    dx = (w.ce * d_ce + w.focal * d_focal + w.dice * d_dice) * \
        valid * ct
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_multi_loss(logits, target, class_weights, w: LossWeights,
                     axis_name=None):
    """Drop-in for multi_loss(...) with Pallas forward/backward.

    logits [B, H, W, C]; target [B, H, W] int; class_weights [C] or None.
    Returns (total, aux) like multi_loss; gradients flow only through
    total.

    axis_name: when called per-shard inside shard_map/pmap over a data
    axis, pass that axis name — the forward partials are psum'd across
    shards so all three losses are computed over the GLOBAL batch, and
    the analytic backward needs no further collectives (it only reads
    the global reduced statistics).
    """
    total, aux = _fused_fwd(logits, target, class_weights, w, axis_name)[0]
    return total, aux


def _prep(logits, target, class_weights):
    """Flatten + transpose to [Cp, N_pad]: classes on sublanes (padded
    to the 8-granule with -1e30 logits / zero CE weight so padding
    contributes nothing), pixels on lanes (padded to BLOCK_N)."""
    C = logits.shape[-1]
    assert C <= 128, f"n_classes {C} > 128 unsupported by the kernel"
    Cp = max(SUBLANE, -(-C // SUBLANE) * SUBLANE)
    N = int(np.prod(logits.shape[:-1]))
    n_blocks = -(-N // BLOCK_N)
    N_pad = n_blocks * BLOCK_N

    xT = jnp.moveaxis(logits, -1, 0).reshape(C, N).astype(jnp.float32)
    xT = jnp.pad(xT, ((0, Cp - C), (0, N_pad - N)),
                 constant_values=-1e30)
    tT = jnp.pad(target.reshape(1, N).astype(jnp.int32),
                 ((0, 0), (0, N_pad - N)), constant_values=0)
    cw = jnp.ones((C,), jnp.float32) if class_weights is None else \
        jnp.asarray(class_weights, jnp.float32).reshape(C)
    cw = jnp.pad(cw, (0, Cp - C)).reshape(Cp, 1)
    return xT, tT, cw, N


def _fused_fwd(logits, target, class_weights, w: LossWeights,
               axis_name=None):
    xT, tT, cw, N = _prep(logits, target, class_weights)
    acc = _fused_forward(xT, tT, cw, w, N)
    if axis_name is not None:
        acc = jax.lax.psum(acc, axis_name)
    total, ce, dice, focal = _losses_from_acc(
        acc, logits.shape[-1], w)
    aux = {"ce": ce, "dice": dice, "focal": focal}
    out = (total, jax.tree_util.tree_map(jax.lax.stop_gradient, aux))
    residual = (logits, target, class_weights, acc)
    return out, residual


def _fused_bwd(w: LossWeights, axis_name, residual, cotangent):
    ct_total, _ct_aux = cotangent
    if axis_name is not None:
        # under shard_map the replicated-output transpose hands each
        # shard ct/axis_size; the analytic dx is already per-shard-local
        # w.r.t. the global loss, so undo that split
        ct_total = ct_total * jax.lax.psum(1, axis_name)
    logits, target, class_weights, acc = residual
    xT, tT, cw, N = _prep(logits, target, class_weights)
    Cp, N_pad = xT.shape
    n_blocks = N_pad // BLOCK_N

    Creal = logits.shape[-1]
    inter = acc[:, _INTER]
    sum_p = acc[:, _SUMP]
    cnt_t = acc[:, _CNT]
    lane = jax.lax.broadcasted_iota(jnp.int32, (Cp, 128), 1)
    stats = ((lane == _NUM) * (2.0 * inter + w.dice_smooth)[:, None] +
             (lane == _DEN) * (sum_p + cnt_t + w.dice_smooth)[:, None] +
             (lane == _SWSUM) * acc[_WSUM, _SCALAR] +
             (lane == _SCOUNT) * acc[_COUNT, _SCALAR] +
             (lane == _SCT) * ct_total.astype(jnp.float32)
             ).astype(jnp.float32)

    dxT = pl.pallas_call(
        functools.partial(_bwd_kernel, n_valid=N, n_classes=Creal, w=w),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((Cp, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Cp, BLOCK_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cp, N_pad), jnp.float32),
        interpret=_interpret(),
    )(xT, tT, cw, stats)
    dlogits = jnp.moveaxis(
        dxT[:Creal, :N].reshape((Creal,) + logits.shape[:-1]), 0, -1
    ).astype(logits.dtype)
    dt = np.zeros(target.shape, jax.dtypes.float0)
    dcw = None if class_weights is None else jnp.zeros_like(class_weights)
    return dlogits, dt, dcw


fused_multi_loss.defvjp(_fused_fwd, _fused_bwd)
