"""Fused multi-loss: weighted Cross-Entropy + soft Dice + Focal.

The reference computes three separate softmaxes over the logits
(models/modules/loss.py:107-194: CrossEntropyLoss internally, softmax for
dice at :138, softmax for focal at :174).  Here one ``log_softmax`` is
shared by all three terms, so XLA emits a single normalization pass over
the [B, H, W, C] logits; everything else is cheap elementwise/reduce work
fused behind it.

Numerics match the reference exactly (tests/test_losses.py golden-checks
against hand-computed values and the torch formulas):

  CE     mean over pixels of -log p[y]; class-weighted variant divides by
         the sum of per-pixel weights (torch CrossEntropyLoss semantics).
  Dice   per-class 1 - (2 I + s) / (U + s), I/U summed over (B, H, W),
         mean over classes; smooth s = 1.0 (reference loss.py:116-146).
  Focal  -alpha (1 - p)^gamma log(p + eps) summed over the target class,
         mean over pixels; alpha=.25, gamma=2, eps=1e-8 (loss.py:148-194).

Loss = ce_w * CE + dice_w * Dice + focal_w * Focal (all 0.5 by default,
reference config.py:201-208).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class LossWeights(NamedTuple):
    ce: float = 0.5
    dice: float = 0.5
    focal: float = 0.5
    weighted: bool = False
    dice_smooth: float = 1.0
    fl_alpha: float = 0.25
    fl_gamma: float = 2.0
    eps: float = 1e-8


def multi_loss(logits: jnp.ndarray, target: jnp.ndarray,
               class_weights: Optional[jnp.ndarray] = None,
               w: LossWeights = LossWeights(),
               sample_mask: Optional[jnp.ndarray] = None):
    """Fused CE + Dice + Focal.

    Parameters
    ----------
    logits: [B, H, W, C] raw model outputs (NHWC — TPU-native layout;
        the reference uses NCHW).
    target: [B, H, W] integer class map.
    class_weights: [C] CE class weights (profile inverse-log weights,
        reference utils/profile.py:129-130), used when ``w.weighted``.
    sample_mask: optional [B] 0/1 weights excluding padded samples from
        every reduction — equal, for mask = [1]*n + [0]*pad, to calling
        multi_loss on the first n samples.  Used by validation so padded
        partial batches don't bias the metrics (and hence best-dice
        checkpoint gating).

    Returns (total, aux) with aux = dict(ce, dice, focal).
    """
    C = logits.shape[-1]
    target = target.astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)  # single softmax pass
    p = jnp.exp(logp)
    onehot = jax.nn.one_hot(target, C, dtype=logits.dtype)

    if sample_mask is not None:
        m = sample_mask.astype(logits.dtype)[:, None, None]  # [B,1,1]
        hw = logits.shape[1] * logits.shape[2]
        n_px = jnp.sum(m) * hw
    else:
        m = None
        n_px = None

    # --- cross entropy ---
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    if w.weighted and class_weights is not None:
        cw = class_weights.astype(logits.dtype)
        px_w = jnp.take(cw, target)
        if m is not None:
            px_w = px_w * m
        ce = jnp.sum(nll * px_w) / jnp.sum(px_w)
    elif m is not None:
        ce = jnp.sum(nll * m) / n_px
    else:
        ce = jnp.mean(nll)

    # --- soft dice ---
    p_d = p if m is None else p * m[..., None]
    oh_d = onehot if m is None else onehot * m[..., None]
    intersection = jnp.sum(p_d * oh_d, axis=(0, 1, 2))  # [C]
    cardinality = jnp.sum(p_d + oh_d, axis=(0, 1, 2))  # [C]
    dice = 1.0 - (2.0 * intersection + w.dice_smooth) / (
        cardinality + w.dice_smooth)
    dice = jnp.mean(dice)

    # --- focal ---
    p_eps = p + w.eps
    focal_map = -w.fl_alpha * jnp.power(1.0 - p_eps, w.fl_gamma) * \
        jnp.log(p_eps)
    focal_px = jnp.sum(onehot * focal_map, axis=-1)
    if m is not None:
        focal = jnp.sum(focal_px * m) / n_px
    else:
        focal = jnp.mean(focal_px)

    total = w.ce * ce + w.dice * dice + w.focal * focal
    return total, {"ce": ce, "dice": dice, "focal": focal}
