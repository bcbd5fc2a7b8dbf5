"""Device-side augmentation distortions (vmapped over the batch).

The reference applies cv2 perspective warps + brightness shifts one tile
at a time in a Python loop (utils/tools.py:452-594, utils/augment.py:
203-220).  Here the homography solve is tiny host math and the warps run
as one vmapped ``map_coordinates`` program over a whole batch of tiles:
image sampled bilinearly, mask nearest, both with mirror (reflect-101)
borders, then the reference's 30px crop + resize-back and the +U(10,20)
channel shift — all fused into a single device program.

Interpolation parity note: the reference warps the image with
cv2.INTER_AREA; on device we use bilinear (INTER_LINEAR).  For a
non-scaling perspective warp the two are near-identical, and the
transform is stochastic data augmentation — recorded in
docs/DEVIATIONS.md.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# The reference's fixed source quad (utils/tools.py:582) for a 512 tile.
REF_PTS1 = np.float32([[56, 65], [368, 52], [28, 387], [389, 390]])


def solve_homography(pts_src: np.ndarray, pts_dst: np.ndarray) -> np.ndarray:
    """3x3 perspective transform mapping src -> dst (host, 8x8 solve)."""
    A = []
    b = []
    for (x, y), (u, v) in zip(pts_src, pts_dst):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y]); b.append(u)
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y]); b.append(v)
    h = np.linalg.solve(np.asarray(A, np.float64), np.asarray(b, np.float64))
    return np.concatenate([h, [1.0]]).reshape(3, 3).astype(np.float32)


def random_homographies(rng: np.random.Generator, n: int, size: int,
                        alpha_frac: float = 0.06) -> np.ndarray:
    """n inverse homographies for warping ``size``-px tiles, with the
    reference's perturbation model: dst = src + U(-alpha, alpha),
    alpha = 0.06 * size (utils/tools.py:578-584)."""
    pts1 = REF_PTS1 * (size / 512.0)
    alpha = alpha_frac * size
    out = np.empty((n, 3, 3), np.float32)
    for i in range(n):
        pts2 = pts1 + rng.uniform(-alpha, alpha, pts1.shape).astype(np.float32)
        # warp samples with the inverse map (dst pixel -> src coordinate)
        out[i] = np.linalg.inv(solve_homography(pts1, pts2)).astype(np.float32)
    return out


def _warp_coords(h_inv: jnp.ndarray, size: int):
    """Source sampling coordinates for each destination pixel."""
    ys, xs = jnp.mgrid[0:size, 0:size]
    ones = jnp.ones_like(xs)
    pts = jnp.stack([xs, ys, ones], axis=0).reshape(3, -1).astype(jnp.float32)
    src = h_inv @ pts
    sx = src[0] / src[2]
    sy = src[1] / src[2]
    return sy.reshape(size, size), sx.reshape(size, size)


@functools.partial(jax.jit, static_argnums=(3,))
def warp_tiles(imgs: jnp.ndarray, masks: jnp.ndarray, h_inv: jnp.ndarray,
               crop: int = 30) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Perspective-warp a batch of tiles + masks.

    imgs: [N, H, W, C] uint8; masks: [N, H, W] uint8;
    h_inv: [N, 3, 3] inverse homographies.
    Warps, crops ``crop`` px borders, resizes back (image bilinear, mask
    nearest) — reference utils/tools.py:585-594 semantics (the 30px crop
    is for 512px tiles; callers scale it for other tile sizes).
    """
    from jax.scipy.ndimage import map_coordinates

    N, H, W, C = imgs.shape
    size = H
    crop = min(crop, (size - 2) // 2)

    def one(img, mask, hm):
        sy, sx = _warp_coords(hm, size)
        img_w = jnp.stack([
            map_coordinates(img[..., c].astype(jnp.float32), [sy, sx],
                            order=1, mode="mirror")
            for c in range(C)], axis=-1)
        mask_w = map_coordinates(mask.astype(jnp.float32), [sy, sx],
                                 order=0, mode="mirror")
        # crop 30px border and resize back
        img_c = img_w[crop:size - crop, crop:size - crop]
        mask_c = mask_w[crop:size - crop, crop:size - crop]
        img_r = jax.image.resize(img_c, (size, size, C), method="linear")
        mask_r = jax.image.resize(mask_c, (size, size), method="nearest")
        return img_r, mask_r

    img_out, mask_out = jax.vmap(one)(imgs, masks, h_inv)
    return img_out, mask_out


@jax.jit
def channel_shift(imgs: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """Add a per-tile brightness shift, clip to [0, 255]
    (reference utils/tools.py:533-554)."""
    x = imgs.astype(jnp.int32) + shifts[:, None, None, None].astype(jnp.int32)
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


def augment_batch(imgs_u8: np.ndarray, masks_u8: np.ndarray,
                  rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """Full distortion pipeline for a batch of NHWC uint8 tiles:
    perspective shift then brightness shift (reference augment_transform,
    utils/tools.py:452-493)."""
    n, size = imgs_u8.shape[0], imgs_u8.shape[1]
    h_inv = random_homographies(rng, n, size)
    shifts = rng.integers(10, 20, size=n)
    crop = max(1, round(size * 30 / 512))  # reference's 30px at 512
    img_w, mask_w = warp_tiles(jnp.asarray(imgs_u8), jnp.asarray(masks_u8),
                               jnp.asarray(h_inv), crop)
    img_w = jnp.clip(img_w, 0, 255).astype(jnp.uint8)
    img_w = channel_shift(img_w, jnp.asarray(shifts))
    return np.asarray(img_w), np.asarray(mask_w).astype(np.uint8)
