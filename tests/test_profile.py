import numpy as np
import torch

from pylc_tpu.ops.profile import profile_tiles
from pylc_tpu.utils.balance import jsd, m2


def test_profile_matches_reference_semantics(rng):
    """Golden-check against the reference's torch computation
    (utils/profile.py:98-148)."""
    N, H, W, C, K = 7, 32, 32, 3, 5
    imgs = rng.integers(0, 256, size=(N, C, H, W)).astype(np.uint8)
    masks = rng.integers(0, K, size=(N, H, W)).astype(np.uint8)

    # reference computation (per-sample torch mean/std accumulation)
    px_mean = torch.zeros(C)
    px_std = torch.zeros(C)
    px_dist = []
    for i in range(N):
        img = torch.tensor(imgs[i:i + 1]).float()
        mask = torch.tensor(masks[i:i + 1]).long()
        px_mean += torch.mean(img, (0, 2, 3))
        px_std += torch.std(img, (0, 2, 3))
        oh = torch.nn.functional.one_hot(mask, num_classes=K).permute(
            0, 3, 1, 2)
        px_dist.append(np.sum(oh.numpy(), axis=(2, 3)))
    px_mean /= N
    px_std /= N
    px_dist = np.concatenate(px_dist)
    dset_px_dist = np.sum(px_dist, axis=0)
    probs = dset_px_dist / np.sum(dset_px_dist)
    weights = 1 / np.log(1.02 + probs)
    weights = weights / np.max(weights)

    # our fused device pass, chunked in 3s
    chunks = [(imgs[i:i + 3], masks[i:i + 3]) for i in range(0, N, 3)]
    prof = profile_tiles(chunks, n_classes=K, tile_size=H)

    np.testing.assert_allclose(prof["px_mean"], px_mean.numpy(), rtol=1e-5)
    np.testing.assert_allclose(prof["px_std"], px_std.numpy(), rtol=1e-4)
    np.testing.assert_allclose(prof["px_dist"], px_dist, rtol=1e-6)
    np.testing.assert_allclose(prof["probs"], probs, rtol=1e-6)
    np.testing.assert_allclose(prof["weights"], weights, rtol=1e-6)
    assert prof["dset_px_count"] == N * H * W
    assert prof["n_samples"] == N
    balanced = np.full(K, 1 / K)
    np.testing.assert_allclose(prof["m2"], m2(probs, K), rtol=1e-6)
    np.testing.assert_allclose(prof["jsd"], jsd(probs, balanced), rtol=1e-6)
