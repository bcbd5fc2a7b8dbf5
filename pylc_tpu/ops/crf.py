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

Memory/bandwidth design: bilateral weights are recomputed from the
shifted guide inside the loop (a few VPU ops) instead of materializing
(2r+1)^2 full-resolution weight maps (~3 GB at 10 MP); and by default
message passing runs on a ``downsample``d grid (mean-pooled
probabilities, subsampled guide) and the refined distribution is
upsampled bilinearly — the classical σ values make pairwise support
span many pixels, so half/quarter resolution loses nothing visually
while cutting HBM traffic 4-16x.

Deviations from the classical formulation are recorded in
docs/DEVIATIONS.md (D4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CRFParams(NamedTuple):
    n_iters: int = 5
    radius: int = 3
    w_appearance: float = 3.0
    sigma_spatial_app: float = 3.0
    sigma_color: float = 13.0
    w_smoothness: float = 1.0
    sigma_spatial_sm: float = 1.5
    downsample: int = 2        # message-passing grid subsampling
    backend: str = "auto"      # auto|pallas|xla — message-passing impl
    eps: float = 1e-8


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """x shifted by (dy, dx) with edge replication, shape-preserving."""
    H, W = x.shape[0], x.shape[1]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))] + \
          [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad, mode="edge")
    return xp[max(-dy, 0):max(-dy, 0) + H, max(-dx, 0):max(-dx, 0) + W]


def _pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mean-pool [H, W, C] by factor k (pads to a multiple)."""
    H, W, C = x.shape
    Hp, Wp = -(-H // k) * k, -(-W // k) * k
    x = jnp.pad(x, ((0, Hp - H), (0, Wp - W), (0, 0)), mode="edge")
    return x.reshape(Hp // k, k, Wp // k, k, C).mean(axis=(1, 3))


def _upsample(x: jnp.ndarray, H: int, W: int, k: int) -> jnp.ndarray:
    from pylc_tpu.models.layers import resize_bilinear_align_corners
    up = resize_bilinear_align_corners(x, x.shape[0] * k, x.shape[1] * k)
    return up[:H, :W]


@functools.partial(jax.jit, static_argnums=(2,))
def mean_field(probs: jnp.ndarray, guide: jnp.ndarray,
               params: CRFParams = CRFParams()) -> jnp.ndarray:
    """Run mean-field iterations.

    probs: [H, W, C] initial label distribution (stitched softmax — the
    unary potentials are log(probs)).
    guide: [H, W, G] guidance image (uint8 RGB or grayscale).
    Returns refined [H, W, C] distribution at full resolution.
    """
    H, W, C = probs.shape
    g = guide.astype(jnp.float32)
    if g.ndim == 2:
        g = g[..., None]

    k = max(1, params.downsample)
    q0 = _pool(probs.astype(jnp.float32), k) if k > 1 else \
        probs.astype(jnp.float32)
    gd = _pool(g, k) if k > 1 else g

    unary = jnp.log(q0 + params.eps)

    r = params.radius
    use_pallas = params.backend == "pallas" or (
        params.backend == "auto" and jax.default_backend() == "tpu")
    if use_pallas:
        # VMEM-blocked Pallas message passing: one HBM round-trip per
        # iteration instead of ~(2r+1)^2 shifted-array passes
        from pylc_tpu.ops.pallas.crf_kernel import crf_iteration
        q_cf = jnp.transpose(q0, (2, 0, 1))
        g_cf = jnp.transpose(gd, (2, 0, 1))
        u_cf = jnp.transpose(unary, (2, 0, 1))
        interp = jax.default_backend() != "tpu"
        for _ in range(params.n_iters):
            q_cf = crf_iteration(
                q_cf, g_cf, u_cf, r,
                params.sigma_spatial_app, params.sigma_color,
                params.sigma_spatial_sm, params.w_appearance,
                params.w_smoothness, params.eps, interpret=interp)
        q = jnp.transpose(q_cf, (1, 2, 0))
        if k > 1:
            q = _upsample(q, H, W, k)
            q = q / jnp.sum(q, axis=-1, keepdims=True)
        return q

    offsets = [(dy, dx)
               for dy in range(-r, r + 1)
               for dx in range(-r, r + 1)
               if not (dy == 0 and dx == 0)]
    inv2_sp_app = 1.0 / (2.0 * params.sigma_spatial_app ** 2)
    inv2_col = 1.0 / (2.0 * params.sigma_color ** 2)
    inv2_sp_sm = 1.0 / (2.0 * params.sigma_spatial_sm ** 2)

    def body(i, q):
        m_app = jnp.zeros_like(q)
        m_sm = jnp.zeros_like(q)
        wsum = jnp.zeros(q.shape[:2] + (1,), jnp.float32)
        for dy, dx in offsets:
            d2 = float(dy * dy + dx * dx)
            # bilateral weight recomputed on the fly (no stored maps)
            col = jnp.sum(jnp.square(gd - _shift(gd, dy, dx)), axis=-1,
                          keepdims=True)
            aw = jnp.exp(-d2 * inv2_sp_app - col * inv2_col)
            sw = float(np_exp(-d2 * inv2_sp_sm))
            qs = _shift(q, dy, dx)
            m_app = m_app + aw * qs
            m_sm = m_sm + sw * qs
            wsum = wsum + aw
        m_app = m_app / (wsum + params.eps)
        logits = unary + params.w_appearance * m_app + \
            params.w_smoothness * m_sm
        return jax.nn.softmax(logits, axis=-1)

    q = jax.lax.fori_loop(0, params.n_iters, body, q0)
    if k > 1:
        q = _upsample(q, H, W, k)
        q = q / jnp.sum(q, axis=-1, keepdims=True)
    return q


def np_exp(v: float) -> float:
    import math
    return math.exp(v)


def make_crf(cfg=None, **overrides):
    """CRF callable (canvas_probs, guide_img) -> refined probs, matching
    the Segmenter's crf hook signature.

    Parameters come from the Config's ``crf_*`` fields (reachable from
    the CLI: ``test --crf --crf_iters ... --crf_downsample ...``), with
    keyword ``overrides`` taking precedence; defaults sit on the
    measured accuracy/throughput frontier (docs/CRF_TUNING.md)."""
    kw = {}
    if cfg is not None:
        kw = dict(n_iters=cfg.crf_iters, radius=cfg.crf_radius,
                  downsample=cfg.crf_downsample,
                  w_appearance=cfg.crf_w_app,
                  sigma_spatial_app=cfg.crf_sigma_app,
                  sigma_color=cfg.crf_sigma_color,
                  w_smoothness=cfg.crf_w_smooth,
                  sigma_spatial_sm=cfg.crf_sigma_smooth)
    kw.update(overrides)
    params = CRFParams(**kw)

    def crf(canvas, guide):
        return mean_field(canvas, guide, params)

    # exposed so mesh-aware callers (Segmenter._build) can rebuild the
    # hook with a GSPMD-partitionable backend
    crf.params = params
    return crf
