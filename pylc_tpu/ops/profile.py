"""Dataset statistical profiler — one fused device pass.

The reference profiles the dataset with a per-sample Python loop doing a
one-hot + histogram per tile (utils/profile.py:98-111).  Here the whole
profile (per-tile class histograms, pixel mean/std, class weights, M2,
JSD) is computed in chunked device passes: each chunk of tiles is a
single jitted program doing a bincount-style one-hot matmul reduce.

Semantics parity notes (vs utils/profile.py:21-150):
  - px_mean / px_std are the *mean of per-tile means / per-tile stds*
    (the reference accumulates torch.mean/std per sample then divides by
    n_samples — not a global pixel std).  torch.std uses the unbiased
    (n-1) estimator; reproduced here.
  - class weights = 1 / log(1.02 + probs), normalized by max
    (utils/profile.py:129-130).
  - m2 / jsd per utils/metrics.py:90-132.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pylc_tpu.utils.balance import jsd as jsd_metric, m2 as m2_metric


@functools.partial(jax.jit, static_argnums=(2,))
def _profile_chunk(imgs: jnp.ndarray, masks: jnp.ndarray, n_classes: int):
    """Profile one chunk.

    imgs: [N, H, W, C] uint8; masks: [N, H, W] uint8.
    Returns (px_dist [N, n_classes] f32, tile_means [N, C], tile_stds [N, C]).
    """
    x = imgs.astype(jnp.float32)
    tile_means = jnp.mean(x, axis=(1, 2))
    # unbiased std to match torch.std (utils/profile.py:103)
    n = x.shape[1] * x.shape[2]
    var = jnp.var(x, axis=(1, 2)) * (n / (n - 1))
    tile_stds = jnp.sqrt(var)
    onehot = jax.nn.one_hot(masks.astype(jnp.int32), n_classes,
                            dtype=jnp.float32)
    px_dist = jnp.sum(onehot, axis=(1, 2))  # [N, C]
    return px_dist, tile_means, tile_stds


def profile_tiles(chunks: Iterable[Tuple[np.ndarray, np.ndarray]],
                  n_classes: int, tile_size: int) -> Dict:
    """Profile an iterable of (img_chunk [N,H,W,C] or [N,C,H,W] uint8,
    mask_chunk [N,H,W] uint8) pairs.

    Returns a dict of metadata fields with the reference's names
    (px_dist, px_mean, px_std, dset_px_dist, dset_px_count, probs,
    weights, m2, jsd, n_samples, tile_px_count).
    """
    px_dists = []
    means = []
    stds = []
    n_samples = 0
    for imgs, masks in chunks:
        imgs = np.asarray(imgs)
        if imgs.ndim == 4 and imgs.shape[1] in (1, 3) and \
                imgs.shape[1] != imgs.shape[-1]:
            imgs = np.transpose(imgs, (0, 2, 3, 1))  # NCHW -> NHWC
        d, m, s = _profile_chunk(jnp.asarray(imgs), jnp.asarray(masks),
                                 n_classes)
        px_dists.append(np.asarray(d))
        means.append(np.asarray(m))
        stds.append(np.asarray(s))
        n_samples += imgs.shape[0]

    px_dist = np.concatenate(px_dists, axis=0)
    px_mean = np.sum(np.concatenate(means, axis=0), axis=0) / n_samples
    px_std = np.sum(np.concatenate(stds, axis=0), axis=0) / n_samples

    dset_px_dist = np.sum(px_dist, axis=0)
    dset_px_count = float(np.sum(dset_px_dist))
    probs = dset_px_dist / dset_px_count

    weights = 1.0 / np.log(1.02 + probs)
    weights = weights / np.max(weights)

    balanced = np.full(n_classes, 1.0 / n_classes)

    return {
        "n_samples": int(n_samples),
        "px_mean": px_mean.tolist(),
        "px_std": px_std.tolist(),
        "px_dist": px_dist.tolist(),
        "tile_px_count": tile_size * tile_size,
        "dset_px_dist": dset_px_dist.tolist(),
        "dset_px_count": int(dset_px_count),
        "probs": probs.tolist(),
        "weights": weights.tolist(),
        "m2": float(m2_metric(probs, n_classes)),
        "jsd": float(jsd_metric(probs, balanced)),
    }
