"""Flagship multi-chip config (BASELINE config 4): DeepLabV3+/ResNet101
data-parallel training with cross-replica sync-BN and the shard_map
Pallas fused loss, validated on the 8-device virtual mesh against the
single-device step (round-1 gap: dryrun only exercised a 64 px U-Net).

Supersedes the reference's disabled DataParallel path
(reference models/model.py:186-188) and its thread-pipe
SynchronizedBatchNorm (models/sync_batchnorm/batchnorm.py:38-282).
"""

import jax
import numpy as np
import pytest

from pylc_tpu.config import Config
from pylc_tpu.parallel.mesh import batch_sharding, get_mesh
from pylc_tpu.train_state import init_state, make_train_step


@pytest.mark.slow
def test_deeplab_dp_train_step_matches_single_device(rng):
    """One DeepLab DP train step on 8 devices (sync-BN stats + shard_map
    Pallas loss + GSPMD grad all-reduce) must match the same step on one
    device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    tile = 64
    # SGD keeps the one-step update proportional to the gradient so
    # cross-device reduction-order float noise stays small (see
    # test_syncbn.py::test_sharded_train_step_matches_single_device)
    cfg = Config().replace(arch="deeplab", backbone="resnet", ch=3,
                           tile_size=tile, batch_size=8,
                           norm_type="syncbatch", optim_type="sgd",
                           fused_loss="on", compute_dtype="float32")
    img = rng.integers(0, 255, (8, tile, tile, 3)).astype(np.uint8)
    mask = rng.integers(0, cfg.n_classes, (8, tile, tile)).astype(np.uint8)
    key = jax.random.PRNGKey(3)

    def run(n_dev):
        state, model = init_state(cfg, jax.random.PRNGKey(0), 10)
        mesh = get_mesh(n_dev)
        step = make_train_step(cfg, model, mesh=mesh if n_dev > 1 else None)
        xi = jax.device_put(img, batch_sharding(mesh, 4))
        yi = jax.device_put(mask, batch_sharding(mesh, 3))
        state, metrics = step(state, xi, yi, key)
        return (jax.device_get(state.params),
                jax.device_get(state.batch_stats),
                float(np.asarray(metrics["total"])))

    p1, bs1, l1 = run(1)
    p8, bs8, l8 = run(8)
    np.testing.assert_allclose(l1, l8, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)
    # BN running stats must also agree (the sync-BN payload); atol
    # covers cross-device reduction-order noise on near-zero means
    # (observed max |diff| 4.6e-5 on O(0.1) momentum-scaled stats)
    for a, b in zip(jax.tree_util.tree_leaves(bs1),
                    jax.tree_util.tree_leaves(bs8)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-4)
