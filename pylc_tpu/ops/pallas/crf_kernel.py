"""Pallas kernel: one dense-CRF mean-field iteration.

The jnp mean-field (pylc_tpu/ops/crf.py) expresses each iteration as
(2r+1)^2-1 shifted multiply-adds; XLA materializes the shifted arrays,
so every offset re-reads the full [H, W, C] distribution from HBM
(~50 passes/iteration).  This kernel blocks the canvas into VMEM tiles
with an r-pixel halo and runs the whole offset loop in-register: per
iteration each canvas byte moves HBM->VMEM once and back once.

Layout: channel-major [C, H, W] so the lane (last) axis is the aligned
W dimension — with C=9 a channel-last layout would waste 119/128 lanes.

The driver (crf.py) keeps q/guide/unary channel-major across iterations
and edge-pads by r before each call, so the kernel reads pure interior
windows (replicated-edge semantics match the jnp version's `_shift`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:  # Element block dims: index_map returns element offsets, allowing
    # overlapping (halo) windows
    from jax.experimental.pallas import Element
except ImportError:  # pragma: no cover
    from jax._src.pallas.core import Element

BH = 64   # default block rows
BW = 256  # default block cols (lane axis; multiple of 128)


def _iter_kernel(q_ref, g_ref, u_ref, out_ref,
                 m_app_ref, m_sm_ref, wsum_ref, *, r: int, BH: int, BW: int,
                 inv2_sp_app: float, inv2_col: float, inv2_sp_sm: float,
                 w_app: float, w_sm: float, eps: float):
    """One block of one mean-field iteration.

    q_ref: [C, WH, WW] padded distribution window (halo >= r)
    g_ref: [G, WH, WW] padded guide window
    u_ref: [C, BH, BW] unary block
    out_ref: [C, BH, BW]
    m_app_ref/m_sm_ref/wsum_ref: VMEM scratch accumulators — the offset
    loop is statically unrolled but accumulates through refs so Mosaic's
    live set stays at one offset's temporaries (a functional unrolled
    chain kept every product live: 296 MB of scoped VMEM).
    """
    g_c = g_ref[:, r:r + BH, r:r + BW]
    m_app_ref[:] = jnp.zeros_like(m_app_ref)
    m_sm_ref[:] = jnp.zeros_like(m_sm_ref)
    wsum_ref[:] = jnp.zeros_like(wsum_ref)

    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            d2 = float(dy * dy + dx * dx)
            qs = q_ref[:, r + dy:r + dy + BH, r + dx:r + dx + BW]
            gs = g_ref[:, r + dy:r + dy + BH, r + dx:r + dx + BW]
            col = jnp.sum(jnp.square(g_c - gs), axis=0, keepdims=True)
            aw = math.exp(-d2 * inv2_sp_app) * jnp.exp(-col * inv2_col)
            m_app_ref[:] += aw * qs
            m_sm_ref[:] += math.exp(-d2 * inv2_sp_sm) * qs
            wsum_ref[:] += aw

    u = u_ref[:].astype(jnp.float32)
    logits = u + w_app * m_app_ref[:] / (wsum_ref[:] + eps) + \
        w_sm * m_sm_ref[:]
    # softmax over the channel (leading) axis
    m = jnp.max(logits, axis=0, keepdims=True)
    ex = jnp.exp(logits - m)
    out_ref[:] = (ex / jnp.sum(ex, axis=0, keepdims=True)).astype(
        out_ref.dtype)


def crf_iteration(q_cf: jnp.ndarray, g_cf: jnp.ndarray, unary_cf: jnp.ndarray,
                  r: int, sigma_spatial_app: float, sigma_color: float,
                  sigma_spatial_sm: float, w_app: float, w_sm: float,
                  eps: float = 1e-8, interpret: bool = False,
                  BH: int = BH, BW: int = BW) -> jnp.ndarray:
    """One mean-field iteration, channel-major.

    q_cf/unary_cf: [C, H, W] f32; g_cf: [G, H, W] f32.
    H, W are padded to BH/BW multiples internally.
    """
    C, H, W = q_cf.shape
    G = g_cf.shape[0]
    Hp = -(-H // BH) * BH
    Wp = -(-W // BW) * BW
    # halo window dims rounded up to the (8, 128) f32 tiling grid
    WH = -(-(BH + 2 * r) // 8) * 8
    WW = -(-(BW + 2 * r) // 128) * 128

    def pad_to(x, extra_h, extra_w):
        return jnp.pad(x, ((0, 0), (0, extra_h), (0, extra_w)), mode="edge")

    qp = pad_to(q_cf, Hp - H, Wp - W)
    gp = pad_to(g_cf, Hp - H, Wp - W)
    up = pad_to(unary_cf, Hp - H, Wp - W)
    # halo pad: r rows/cols of edge replication on top/left (matching
    # the jnp `_shift` semantics) and enough on bottom/right that the
    # last grid block's rounded window stays in bounds
    qp = jnp.pad(qp, ((0, 0), (r, WH - BH - r), (r, WW - BW - r)),
                 mode="edge")
    gp = jnp.pad(gp, ((0, 0), (r, WH - BH - r), (r, WW - BW - r)),
                 mode="edge")

    kernel = functools.partial(
        _iter_kernel, r=r, BH=BH, BW=BW,
        inv2_sp_app=1.0 / (2.0 * sigma_spatial_app ** 2),
        inv2_col=1.0 / (2.0 * sigma_color ** 2),
        inv2_sp_sm=1.0 / (2.0 * sigma_spatial_sm ** 2),
        w_app=w_app, w_sm=w_sm, eps=eps)

    out = pl.pallas_call(
        kernel,
        grid=(Hp // BH, Wp // BW),
        in_specs=[
            # overlapping halo windows via Element dims: the block shape
            # exceeds the grid stride by 2r (rounded to the tiling grid)
            # and index_map returns element offsets into the padded array
            pl.BlockSpec((Element(C), Element(WH), Element(WW)),
                         lambda i, j: (0, i * BH, j * BW),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Element(G), Element(WH), Element(WW)),
                         lambda i, j: (0, i * BH, j * BW),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, BH, BW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, BH, BW), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, BH, BW), jnp.float32),
            pltpu.VMEM((C, BH, BW), jnp.float32),
            pltpu.VMEM((1, BH, BW), jnp.float32),
        ],
        # Mosaic hoists the 48 unrolled window loads; the default 16 MB
        # scoped-vmem limit can't hold them — raise it (v5e has 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(qp, gp, up)
    return out[:, :H, :W]
