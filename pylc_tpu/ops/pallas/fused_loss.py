"""Pallas kernel: CE + Dice + Focal multi-loss fused into a single pass.

The jnp implementation (pylc_tpu/ops/losses.py) already shares one
softmax; this kernel goes further:

  forward   — one streaming pass over the [N, C] pixel-logit matrix
      producing the scalar/per-class partials all three losses need
      (nll sum, weight sum, focal sum, per-class intersection, per-class
      prob mass, per-class target count).  The [N, C] probabilities are
      never materialized in HBM.
  backward  — an analytic custom-VJP kernel: given the forward's reduced
      partials, d(total)/d(logits) for all three terms is a local
      per-pixel expression, so the backward is one more streaming pass —
      no stored softmax residuals (jax.grad of the jnp version keeps a
      full [N, C] log-softmax in HBM for the backward).

      dCE/dx    = (w_y / W) (p - onehot)
      dFocal/dx = (1/N) f'(p_y+eps) p_y (onehot - p),  f(q) = -a(1-q)^g log q
      dDice/dx  = p ⊙ (g - <g, p>),
                  g_c = [ (2 I_c + s) - 2 t_c (U_c + s) ] / (C (U_c + s)^2)

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

BLOCK_N = 1024  # pixels per grid step


def _fwd_kernel(x_ref, t_ref, w_ref, acc_ref, *, n_valid: int,
                w: LossWeights):
    """Grid step: accumulate partials for BLOCK_N pixels.

    x_ref: [BLOCK_N, C] logits;  t_ref: [BLOCK_N, 1] int32 targets;
    w_ref: [1, C] CE class weights;  acc_ref: [8, C] f32 accumulator:
      row 0: [nll_sum, wsum, focal_sum, count, 0...]
      row 1: intersection_c       (sum p_c over target-c pixels)
      row 2: prob mass sum_c      (sum p_c over all pixels)
      row 3: target count_c       (one-hot count)
    """
    step = pl.program_id(0)
    C = x_ref.shape[1]

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    t = t_ref[:]  # [BLOCK_N, 1]
    # row validity mask (last block may be padded)
    base = step * BLOCK_N
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, 1), 0) + base
    valid = (rows < n_valid).astype(jnp.float32)  # [BLOCK_N, 1]

    # one softmax
    m = jnp.max(x, axis=1, keepdims=True)
    ex = jnp.exp(x - m)
    se = jnp.sum(ex, axis=1, keepdims=True)
    p = ex / se
    logp = (x - m) - jnp.log(se)

    onehot = (jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, C), 1)
              == t).astype(jnp.float32) * valid

    # CE partials
    nll = -jnp.sum(onehot * logp, axis=1, keepdims=True)  # [BLOCK_N, 1]
    cw = w_ref[0, :]  # [C]
    px_w = jnp.sum(onehot * cw[None, :], axis=1, keepdims=True)
    if not w.weighted:
        px_w = valid
    nll_sum = jnp.sum(nll * px_w)
    wsum = jnp.sum(px_w)

    # focal partials (target class only)
    p_y = jnp.sum(onehot * p, axis=1, keepdims=True) + w.eps
    focal_px = -w.fl_alpha * jnp.power(1.0 - p_y, w.fl_gamma) * jnp.log(p_y)
    focal_sum = jnp.sum(focal_px * valid)

    # dice partials
    inter = jnp.sum(p * onehot, axis=0)           # [C]
    sum_p = jnp.sum(p * valid, axis=0)            # [C]
    cnt_t = jnp.sum(onehot, axis=0)               # [C]

    # pack the four scalars into lanes 0..3 of row 0 (no scatter —
    # Mosaic has no scatter lowering; build with iota masks)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    row0 = ((col == 0) * nll_sum + (col == 1) * wsum +
            (col == 2) * focal_sum + (col == 3) * jnp.sum(valid))
    acc_ref[0:1, :] += row0.astype(jnp.float32)
    acc_ref[1, :] += inter
    acc_ref[2, :] += sum_p
    acc_ref[3, :] += cnt_t


def _fused_forward(x2d: jnp.ndarray, t2d: jnp.ndarray,
                   cw: jnp.ndarray, w: LossWeights):
    """Run the forward kernel. x2d: [N, C] f32; t2d: [N, 1] int32.
    Returns acc [8, C]."""
    N, C = x2d.shape
    n_blocks = -(-N // BLOCK_N)
    N_pad = n_blocks * BLOCK_N
    if N_pad != N:
        x2d = jnp.pad(x2d, ((0, N_pad - N), (0, 0)))
        t2d = jnp.pad(t2d, ((0, N_pad - N), (0, 0)), constant_values=0)

    acc = pl.pallas_call(
        functools.partial(_fwd_kernel, n_valid=N, w=w),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_N, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
        interpret=_interpret(),
    )(x2d, t2d, cw)
    return acc


def _losses_from_acc(acc, n_classes: int, w: LossWeights):
    nll_sum, wsum, focal_sum, count = (acc[0, 0], acc[0, 1], acc[0, 2],
                                       acc[0, 3])
    inter = acc[1, :n_classes]
    sum_p = acc[2, :n_classes]
    cnt_t = acc[3, :n_classes]
    ce = nll_sum / wsum
    card = sum_p + cnt_t
    dice = jnp.mean(1.0 - (2.0 * inter + w.dice_smooth)
                    / (card + w.dice_smooth))
    focal = focal_sum / count
    total = w.ce * ce + w.dice * dice + w.focal * focal
    return total, ce, dice, focal


def _bwd_kernel(x_ref, t_ref, w_ref, stat_ref, dx_ref, *, n_valid: int,
                n_classes: int, w: LossWeights):
    """Analytic d(total)/d(logits) for one pixel block.

    stat_ref: [8, C] — row 0: [wsum, count, ct (upstream cotangent), 0..];
    row 1: g_c dice coefficient pieces (2I_c + s); row 2: (U_c + s).
    """
    step = pl.program_id(0)
    C = x_ref.shape[1]
    x = x_ref[:].astype(jnp.float32)
    t = t_ref[:]
    base = step * BLOCK_N
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, 1), 0) + base
    valid = (rows < n_valid).astype(jnp.float32)

    m = jnp.max(x, axis=1, keepdims=True)
    ex = jnp.exp(x - m)
    se = jnp.sum(ex, axis=1, keepdims=True)
    p = ex / se

    onehot = (jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, C), 1)
              == t).astype(jnp.float32)

    wsum = stat_ref[0, 0]
    count = stat_ref[0, 1]
    ct = stat_ref[0, 2]
    num_c = stat_ref[1, :]     # (2 I_c + s)
    den_c = stat_ref[2, :]     # (U_c + s)
    cw = w_ref[0, :]

    # --- CE ---
    if w.weighted:
        px_w = jnp.sum(onehot * cw[None, :], axis=1, keepdims=True)
    else:
        px_w = jnp.ones_like(valid)
    d_ce = (px_w / wsum) * (p - onehot)

    # --- Focal (target class only) ---
    p_y = jnp.sum(onehot * p, axis=1, keepdims=True)
    q = p_y + w.eps
    fprime = -w.fl_alpha * (
        -w.fl_gamma * jnp.power(1.0 - q, w.fl_gamma - 1.0) * jnp.log(q)
        + jnp.power(1.0 - q, w.fl_gamma) / q)
    d_focal = (fprime / count) * p_y * (onehot - p)

    # --- Dice ---
    g = (num_c[None, :] - 2.0 * onehot * den_c[None, :]) / \
        (n_classes * den_c[None, :] ** 2)
    gp = jnp.sum(g * p, axis=1, keepdims=True)
    d_dice = p * (g - gp)

    dx = (w.ce * d_ce + w.focal * d_focal + w.dice * d_dice) * \
        valid * ct
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_multi_loss(logits, target, class_weights, w: LossWeights,
                     axis_name=None):
    """Drop-in for multi_loss(...)[0] with Pallas forward/backward.

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


LANE = 128


def _prep(logits, target, class_weights):
    """Flatten + pad the class dim to the 128-lane width.  Padded
    classes get -1e30 logits (zero probability) and zero CE weight, so
    they contribute nothing to any term."""
    C = logits.shape[-1]
    Cp = -(-C // LANE) * LANE
    x2d = logits.reshape(-1, C).astype(jnp.float32)
    if Cp != C:
        x2d = jnp.pad(x2d, ((0, 0), (0, Cp - C)), constant_values=-1e30)
    t2d = target.reshape(-1, 1).astype(jnp.int32)
    cw = jnp.ones((C,), jnp.float32) if class_weights is None else \
        jnp.asarray(class_weights, jnp.float32).reshape(C)
    cw = jnp.pad(cw, (0, Cp - C)).reshape(1, Cp)
    return x2d, t2d, cw


def _fused_fwd(logits, target, class_weights, w: LossWeights,
               axis_name=None):
    x2d, t2d, cw = _prep(logits, target, class_weights)
    acc = _fused_forward(x2d, t2d, cw, w)
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
    x2d, t2d, cw = _prep(logits, target, class_weights)
    N, C = x2d.shape
    n_blocks = -(-N // BLOCK_N)
    N_pad = n_blocks * BLOCK_N
    if N_pad != N:
        x2d = jnp.pad(x2d, ((0, N_pad - N), (0, 0)))
        t2d = jnp.pad(t2d, ((0, N_pad - N), (0, 0)), constant_values=0)

    Creal = logits.shape[-1]
    inter, sum_p, cnt_t = acc[1], acc[2], acc[3]
    stats = jnp.zeros((8, C), jnp.float32)
    stats = stats.at[0, 0].set(acc[0, 1])          # wsum
    stats = stats.at[0, 1].set(acc[0, 3])          # count
    stats = stats.at[0, 2].set(ct_total.astype(jnp.float32))
    stats = stats.at[1, :].set(2.0 * inter + w.dice_smooth)
    stats = stats.at[2, :].set(sum_p + cnt_t + w.dice_smooth)

    dx2d = pl.pallas_call(
        functools.partial(_bwd_kernel, n_valid=N, n_classes=Creal, w=w),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_N, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_pad, C), jnp.float32),
        interpret=_interpret(),
    )(x2d, t2d, cw, stats)
    dlogits = dx2d[:N, :Creal].reshape(logits.shape).astype(logits.dtype)
    dt = np.zeros(target.shape, jax.dtypes.float0)
    dcw = None if class_weights is None else jnp.zeros_like(class_weights)
    return dlogits, dt, dcw


fused_multi_loss.defvjp(_fused_fwd, _fused_bwd)
