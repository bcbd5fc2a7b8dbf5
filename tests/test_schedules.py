"""LR schedules vs the torch schedulers the reference configures
(models/model.py:256-280)."""

import numpy as np
import torch

from pylc_tpu.config import Config
from pylc_tpu.train_state import make_lr_schedule, make_optimizer


def test_step_lr_matches_torch():
    """StepLR(step_size=1/epoch, gamma=0.9)."""
    spe = 10
    cfg = Config().replace(sched_type="step_lr", lr=1e-4, gamma=0.9)
    sched = make_lr_schedule(cfg, spe)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=1e-4)
    tsched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.9)
    for epoch in range(5):
        want = opt.param_groups[0]["lr"]
        for k in range(spe):
            got = float(sched(np.int32(epoch * spe + k)))
            np.testing.assert_allclose(got, want, rtol=1e-6)
        tsched.step()


def test_cyclic_lr_matches_torch():
    """CyclicLR(1e-6, 0.1, step_size_up=2000) triangular."""
    cfg = Config().replace(sched_type="cyclic_lr", lr_min=1e-6, lr_max=0.1)
    sched = make_lr_schedule(cfg, 100)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1e-6)
    tsched = torch.optim.lr_scheduler.CyclicLR(
        opt, 1e-6, 0.1, step_size_up=2000)
    for step in range(0, 5000, 137):
        # torch steps the scheduler; ours is a pure function of step
        while tsched.last_epoch < step:
            tsched.step()
        want = opt.param_groups[0]["lr"]
        got = float(sched(np.int32(step)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-9)


def test_optimizer_choices():
    import optax
    for opt_type in ("adam", "sgd"):
        cfg = Config().replace(optim_type=opt_type)
        tx = make_optimizer(cfg, 10)
        assert isinstance(tx, optax.GradientTransformation)
    try:
        make_optimizer(Config().replace(optim_type="nope"), 10)
        assert False
    except ValueError:
        pass
