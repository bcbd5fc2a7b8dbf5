import numpy as np
import torch
import torch.nn.functional as F

from pylc_tpu.ops.losses import multi_loss, LossWeights


def torch_reference_losses(logits_nchw, target, n_classes, weights=None,
                           dice_smooth=1.0, fl_alpha=0.25, fl_gamma=2.0,
                           eps=1e-8):
    """The reference's three loss formulas (models/modules/loss.py:107-194)
    computed with torch as the golden oracle."""
    pred = torch.tensor(logits_nchw)
    tgt = torch.tensor(target, dtype=torch.long)
    if weights is not None:
        ce = F.cross_entropy(pred, tgt, weight=torch.tensor(weights).float())
    else:
        ce = F.cross_entropy(pred, tgt)
    onehot = F.one_hot(tgt, num_classes=n_classes).permute(0, 3, 1, 2)
    probs = F.softmax(pred, dim=1)
    inter = torch.sum(probs * onehot, dim=(0, 2, 3))
    card = torch.sum(probs + onehot, dim=(0, 2, 3))
    dice = (1 - (2 * inter + dice_smooth) / (card + dice_smooth)).mean()
    soft = F.softmax(pred, dim=1) + eps
    w = torch.pow(1.0 - soft, fl_gamma)
    focal_map = -fl_alpha * w * torch.log(soft)
    focal = torch.sum(onehot * focal_map, dim=1).mean()
    return float(ce), float(dice), float(focal)


def test_multi_loss_matches_torch_reference(rng):
    B, H, W, C = 2, 16, 16, 9
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    target = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
    ce_t, dice_t, focal_t = torch_reference_losses(
        np.transpose(logits, (0, 3, 1, 2)), target, C)
    total, aux = multi_loss(logits, target)
    np.testing.assert_allclose(float(aux["ce"]), ce_t, rtol=1e-5)
    np.testing.assert_allclose(float(aux["dice"]), dice_t, rtol=1e-5)
    np.testing.assert_allclose(float(aux["focal"]), focal_t, rtol=1e-4)
    np.testing.assert_allclose(
        float(total), 0.5 * (ce_t + dice_t + focal_t), rtol=1e-4)


def test_weighted_ce_matches_torch(rng):
    B, H, W, C = 2, 8, 8, 5
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    target = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
    cw = rng.random(C).astype(np.float32) + 0.1
    ce_t, _, _ = torch_reference_losses(
        np.transpose(logits, (0, 3, 1, 2)), target, C, weights=cw)
    _, aux = multi_loss(logits, target, class_weights=np.asarray(cw),
                        w=LossWeights(weighted=True))
    np.testing.assert_allclose(float(aux["ce"]), ce_t, rtol=1e-5)


def test_loss_gradients_finite(rng):
    import jax
    import jax.numpy as jnp
    B, H, W, C = 1, 8, 8, 4
    logits = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, C, size=(B, H, W)))
    g = jax.grad(lambda x: multi_loss(x, target)[0])(logits)
    assert np.all(np.isfinite(np.asarray(g)))
