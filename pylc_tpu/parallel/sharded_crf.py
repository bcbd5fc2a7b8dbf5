"""Spatially-sharded dense-CRF mean-field with ICI halo exchange.

Completes the multi-chip inference program (SURVEY.md §5.7): tile
forward is batch-sharded, the overlap stitch is canvas-sharded
(parallel/sharded_stitch.py) — and with this module the CRF refinement
stays sharded too, running the VMEM-blocked Pallas kernel
(ops/pallas/crf_kernel.py, ~12x the XLA shifted-add form per chip) on
each chip's row band instead of falling back to the GSPMD-partitioned
XLA form (GSPMD cannot partition a pallas_call over a sharded operand —
the same limitation train_state._select_loss documents for the loss).

Mechanics: the message-passing grid (canvas, optionally downsampled) is
row-sharded over the mesh axis.  Mean-field messages reach ``radius``
rows, so before every iteration each band exchanges r boundary rows
with its neighbours — two ``lax.ppermute`` over ICI — and runs the
kernel on the (h_loc + 2r)-row extended band; the r halo output rows
are discarded.  The global top/bottom bands substitute edge-replicated
rows for the missing neighbour, matching the kernel's own replicated-
edge boundary semantics, so the result equals the single-device kernel
bit-for-bit on the interior and at the edges.

Cost per iteration per chip: compute and HBM traffic scale 1/n_devices
(plus the 2r recomputed halo rows); the exchange is O(r · W · C) —
independent of the canvas height.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pylc_tpu.ops.crf import CRFParams, _pool, _upsample


def can_shard_crf(H: int, params: CRFParams, n_dev: int) -> bool:
    """Whether the sharded CRF supports this geometry: every band must
    hold at least ``radius`` rows of the (downsampled) grid, so the
    halo reaches only the immediate neighbour; and the uniform-band
    padding must fit inside the LAST band (pad < h_loc), because the
    per-iteration edge re-pinning only corrects pad rows there."""
    Hk = -(-H // max(1, params.downsample))
    h_loc = -(-Hk // n_dev)
    return (n_dev >= 1 and h_loc >= max(1, params.radius)
            and h_loc * (n_dev - 1) < Hk)


def mean_field_sharded(probs: jnp.ndarray, guide: jnp.ndarray,
                       params: CRFParams, mesh: Mesh,
                       axis_name: str = "data",
                       interpret: bool | None = None) -> jnp.ndarray:
    """Row-sharded mean-field refinement.

    probs: [H, W, C] stitched label distribution (may be sharded).
    guide: [H, W, G] or [H, W] guidance image.
    Returns the refined [H, W, C] distribution (row-sharded under
    GSPMD).  Numerically equal to ``ops.crf.mean_field`` with the
    pallas backend (tests/test_sharded_infer.py).
    """
    from pylc_tpu.ops.pallas.crf_kernel import crf_iteration

    H, W, C = probs.shape
    g = guide.astype(jnp.float32)
    if g.ndim == 2:
        g = g[..., None]

    k = max(1, params.downsample)
    q0 = _pool(probs.astype(jnp.float32), k) if k > 1 else \
        probs.astype(jnp.float32)
    gd = _pool(g, k) if k > 1 else g
    unary = jnp.log(q0 + params.eps)

    n = mesh.shape[axis_name]
    r = params.radius
    Hk = q0.shape[0]
    h_loc = -(-Hk // n)
    pad = h_loc * n - Hk
    if h_loc < max(1, r) or pad >= h_loc:
        raise ValueError(
            f"grid of {Hk} rows cannot shard over {n} devices with "
            f"radius {r} (band {h_loc}, pad {pad}); use can_shard_crf "
            "and fall back to ops.crf.mean_field.")

    def pad_h(x):  # edge rows: their outputs are sliced off at the end
        return jnp.pad(x, ((0, pad), (0, 0), (0, 0)), mode="edge")

    # channel-major [C, H, W] — the kernel's layout (lane axis = W)
    q_cf = jnp.transpose(pad_h(q0), (2, 0, 1))
    g_cf = jnp.transpose(pad_h(gd), (2, 0, 1))
    u_cf = jnp.transpose(pad_h(unary), (2, 0, 1))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # halo plumbing: my top halo = up-neighbour's bottom r rows
    # (ppermute i -> i+1), my bottom halo = down-neighbour's top r rows
    # (ppermute i+1 -> i); the global edges use replicated own edge
    # rows, matching the kernel's replicated-edge semantics
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]

    def halos(x, idx):
        top_h = jax.lax.ppermute(x[:, -r:, :], axis_name, fwd)
        bot_h = jax.lax.ppermute(x[:, :r, :], axis_name, bwd)
        top_h = jnp.where(idx == 0,
                          jnp.repeat(x[:, :1, :], r, axis=1), top_h)
        bot_h = jnp.where(idx == n - 1,
                          jnp.repeat(x[:, -1:, :], r, axis=1), bot_h)
        return top_h, bot_h

    def band(q, gb, u):
        # q/u: [C, h_loc, W]; gb: [G, h_loc, W] — this chip's band
        idx = jax.lax.axis_index(axis_name)
        gt, gb_ = halos(gb, idx)
        g_ext = jnp.concatenate([gt, gb, gb_], axis=1)
        # halo-row outputs are discarded, so their unary values are
        # irrelevant — zero-pad instead of exchanging
        u_ext = jnp.pad(u, ((0, 0), (r, r), (0, 0)))
        for _ in range(params.n_iters):
            qt, qb = halos(q, idx)
            q_ext = jnp.concatenate([qt, q, qb], axis=1)
            out = crf_iteration(
                q_ext, g_ext, u_ext, r,
                params.sigma_spatial_app, params.sigma_color,
                params.sigma_spatial_sm, params.w_appearance,
                params.w_smoothness, params.eps, interpret=interpret)
            q = out[:, r:r + h_loc, :]
            if pad:
                # the unsharded kernel re-pads the grid tail from the
                # CURRENT edge row every iteration; the global pad rows
                # (last band's tail) must track the last real row, not
                # evolve as independent rows, or edge messages diverge
                core_last = q[:, h_loc - pad - 1:h_loc - pad, :]
                pinned = jnp.concatenate(
                    [q[:, :h_loc - pad, :],
                     jnp.repeat(core_last, pad, axis=1)], axis=1)
                q = jnp.where(idx == n - 1, pinned, q)
        return q

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the checker requires
    q_cf = shard_map(band, mesh=mesh,
                     in_specs=(P(None, axis_name, None),) * 3,
                     out_specs=P(None, axis_name, None),
                     check_vma=False)(q_cf, g_cf, u_cf)

    q = jnp.transpose(q_cf, (1, 2, 0))[:Hk]
    if k > 1:
        q = _upsample(q, H, W, k)
        q = q / jnp.sum(q, axis=-1, keepdims=True)
    return q
