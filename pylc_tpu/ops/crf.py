"""Dense-CRF mean-field refinement (Krähenbühl & Koltun 2011).

The reference README advertises an "optional Conditional Random Fields
(CRF) filter" but ships no CRF code (SURVEY.md headline facts); the
classical CPU implementation (pydensecrf) uses a permutohedral lattice —
a gather/scatter structure hostile to TPU vectorization.  This module
implements mean-field inference with *local-window* message passing
(ConvCRF-style, Teichmann & Cipolla 2018): with a truncated (2r+1)^2
Gaussian window the two K&K kernels become

  appearance (bilateral):  w(x,d) = exp(-|d|^2 / 2s_sp^2
                                        - |I(x) - I(x+d)|^2 / 2s_col^2)
  smoothness (spatial):    w(x,d) = exp(-|d|^2 / 2s_g^2)

and each mean-field iteration is (2r+1)^2 - 1 shifted multiply-adds over
the [H, W, C] label distribution — pure VPU work that XLA fuses, no
scatter.  With the Potts compatibility, subtracting the full-window sum
is a per-pixel constant across labels, so the update reduces to
``Q <- softmax(unary + w_app * m_app + w_sm * m_sm)``.

Deviation from the classical formulation (docs/DEVIATIONS.md): messages
use a truncated window (default r=4 at inference resolution) instead of
the global permutohedral approximation.  For high-resolution photographs
the effective pairwise support of the published σ values is local, and
window CRFs match or beat lattice CRFs on segmentation benchmarks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CRFParams(NamedTuple):
    n_iters: int = 5
    radius: int = 4
    w_appearance: float = 3.0
    sigma_spatial_app: float = 3.0
    sigma_color: float = 13.0
    w_smoothness: float = 1.0
    sigma_spatial_sm: float = 1.5
    eps: float = 1e-8


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """x shifted by (dy, dx) with edge replication, shape-preserving."""
    H, W = x.shape[0], x.shape[1]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))] + \
          [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad, mode="edge")
    return xp[max(-dy, 0):max(-dy, 0) + H, max(-dx, 0):max(-dx, 0) + W]


@functools.partial(jax.jit, static_argnums=(2,))
def mean_field(probs: jnp.ndarray, guide: jnp.ndarray,
               params: CRFParams = CRFParams()) -> jnp.ndarray:
    """Run mean-field iterations.

    probs: [H, W, C] initial label distribution (stitched softmax — the
        unary potentials are log(probs)).
    guide: [H, W, G] guidance image (uint8 RGB or grayscale).
    Returns refined [H, W, C] distribution.
    """
    g = guide.astype(jnp.float32)
    if g.ndim == 2:
        g = g[..., None]
    unary = jnp.log(probs.astype(jnp.float32) + params.eps)

    r = params.radius
    offsets = [(dy, dx)
               for dy in range(-r, r + 1)
               for dx in range(-r, r + 1)
               if not (dy == 0 and dx == 0)]

    # precompute per-offset bilateral weights (shared across iterations)
    inv2_sp_app = 1.0 / (2.0 * params.sigma_spatial_app ** 2)
    inv2_col = 1.0 / (2.0 * params.sigma_color ** 2)
    inv2_sp_sm = 1.0 / (2.0 * params.sigma_spatial_sm ** 2)

    app_w = []
    sm_w = []
    for dy, dx in offsets:
        d2 = float(dy * dy + dx * dx)
        col = jnp.sum(jnp.square(g - _shift(g, dy, dx)), axis=-1)
        app_w.append(jnp.exp(-d2 * inv2_sp_app - col * inv2_col))
        sm_w.append(jnp.exp(jnp.asarray(-d2 * inv2_sp_sm)))
    app_norm = sum(app_w) + params.eps

    def body(i, q):
        m_app = jnp.zeros_like(q)
        m_sm = jnp.zeros_like(q)
        for (dy, dx), aw, sw in zip(offsets, app_w, sm_w):
            qs = _shift(q, dy, dx)
            m_app = m_app + aw[..., None] * qs
            m_sm = m_sm + sw * qs
        m_app = m_app / app_norm[..., None]
        logits = unary + params.w_appearance * m_app + \
            params.w_smoothness * m_sm
        return jax.nn.softmax(logits, axis=-1)

    q = jax.lax.fori_loop(0, params.n_iters, body, probs.astype(jnp.float32))
    return q


def make_crf(cfg=None, **overrides):
    """CRF callable (canvas_probs, guide_img) -> refined probs, matching
    the Segmenter's crf hook signature."""
    params = CRFParams(**overrides)

    def crf(canvas, guide):
        return mean_field(canvas, guide, params)

    return crf
