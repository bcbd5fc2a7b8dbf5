"""Training loop: epochs over a tile DB with validation + checkpointing.

Loop parity with reference train.py:22-174 — train/valid partitions
(0, 0.8)/(0.8, 1.0), initial validation at epoch 0, per-epoch validate +
checkpoint, best-model gating on mean val Dice — rebuilt around one
jitted SPMD train step:

  - batches are sharded over the mesh 'data' axis (gradient all-reduce
    and global BN stats come from GSPMD);
  - the LR schedule is a function of the step counter traced into the
    program (the reference steps a host-side scheduler per epoch);
  - the host loop only feeds uint8 batches and pulls metrics every
    ``report`` steps (the reference syncs losses to host every batch).

Fixed vs reference (docs/DEVIATIONS.md): resume epoch range — the
reference trains ``range(epoch_offset, n_epochs - epoch_offset)``
(train.py:72), silently shrinking total epochs by 2x the offset; here a
resumed run completes exactly ``n_epochs``.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from pylc_tpu.checkpoint import Checkpoint, RunningLoss
from pylc_tpu.config import Config
from pylc_tpu.db.database import TileDB
from pylc_tpu.db.dataset import TileDataset
from pylc_tpu.parallel.mesh import batch_sharding, get_mesh
from pylc_tpu.train_state import (
    init_state, make_eval_step, make_lr_schedule, make_step_key,
    make_train_step,
)
from pylc_tpu.models.registry import build_model


def _pad_to(batch, n):
    """Pad the batch's leading dim up to a multiple of n (repeat-edge) so
    it shards evenly over the mesh."""
    b = batch.shape[0]
    if b == 0:
        # an exhausted validation shard feeds an all-padding block
        return np.zeros((n,) + batch.shape[1:], batch.dtype)
    if b % n == 0:
        return batch
    pad = n - b % n
    # repeat the last row: batch[-pad:] would under-fill when pad > b
    return np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)],
                          axis=0)


def train(cfg: Config, db_path: str, n_devices: Optional[int] = None,
          verbose: bool = True) -> dict:
    """Run the full training job. Returns summary dict."""
    # datasets (partition fractions per reference train.py:37-46)
    part = cfg.partition
    tr_db = TileDB(db_path, partition=(0.0, 1.0 - part), clip=cfg.clip)
    va_db = TileDB(db_path, partition=(1.0 - part, 1.0), clip=cfg.clip)

    # metadata rehydration: DB data facts -> config (pure, no global
    # mutation; user-chosen network settings like --arch win over DB meta)
    cfg = tr_db.get_meta(base=cfg, data_only=True)
    model_id = cfg.gen_model_id()
    cfg.id = model_id

    mesh = get_mesh(n_devices)
    n_mesh = mesh.devices.size
    # multi-host (DCN): each process reads only its shard of the train
    # split and contributes its rows of the global batch (the TileDB
    # shard math reproduces the reference's per-worker range split,
    # db/database.py).
    n_proc = jax.process_count()
    proc_i = jax.process_index()
    # validation is SHARDED too when the split is big enough: each host
    # reads + feeds only its balanced slice, and the metric reductions
    # run over the global batch under GSPMD (psum over ICI/DCN), so the
    # best-dice gate agrees across hosts by construction with 1/n the
    # per-host IO (round-2 review: replicated validation was O(hosts)
    # redundant work).  A split smaller than the host count falls back
    # to the replicated full-split walk.
    va_sharded = n_proc > 1 and va_db.partition_size >= n_proc
    va_shard = (proc_i, n_proc) if va_sharded else (0, 1)
    # the global batch must divide over the mesh (n_proc divides n_mesh:
    # every process owns >=1 chip) — validation pads partial batches up
    # to `batch`, so `batch` itself has to shard evenly
    batch = max(cfg.batch_size, n_mesh)
    if batch % n_mesh:
        batch += n_mesh - batch % n_mesh
    if batch != cfg.batch_size and verbose:
        # the adjustment changes LR/step semantics — make it visible
        print(f"Global batch rounded {cfg.batch_size} -> {batch} to shard "
              f"evenly over the {n_mesh}-device mesh.")

    tr_ds = TileDataset(tr_db, batch_size=batch // n_proc,
                        shuffle=cfg.shuffle, drop_last=True,
                        chunk_size=cfg.buffer_size,
                        shard=(proc_i, n_proc))
    # validation keeps partial batches — with a small DB the valid
    # split can be smaller than one batch, and dropping it would starve
    # validation entirely (stale metrics, best-model never saved).
    # When sharded, each host pulls batch/n_proc rows per step from a
    # remainder-distributing split (drop_tail=False: shard sizes differ
    # by <=1, NO row dropped — the best-dice gate must see the full
    # split); every host runs the same fixed step count, feeding an
    # all-padding batch once its shard is exhausted.
    va_rows = batch // n_proc if va_sharded else batch
    va_local = va_db.shard_range(va_shard, drop_tail=False)
    va_ds = TileDataset(
        va_db,
        batch_size=va_rows if va_sharded else
        (min(va_rows, va_local[1] - va_local[0]) or 1),
        shuffle=False, drop_last=False, chunk_size=cfg.buffer_size,
        shard=va_shard, drop_tail=False)
    if va_sharded:
        per, tail = divmod(va_db.partition_size, n_proc)
        # deterministic split -> every host knows every shard's size
        va_sizes = [per + (1 if j < tail else 0) for j in range(n_proc)]
        va_steps = -(-va_sizes[0] // va_rows)  # shard 0 is the largest
    steps_per_epoch = max(1, tr_ds.n_batches)

    # resolve pretrained-encoder request BEFORE the (expensive) model
    # init so a bad path fails fast (reference models/backbone/
    # resnet.py:149-158 loads resnet101-5d3b4d8f.pth; xception.py:
    # 253-284 INTENDS to load the zoo xception — its loop is a no-op
    # bug, DEVIATIONS F13)
    pretrained_path = None
    if cfg.arch == "deeplab" and cfg.pretrained:
        default_paths = {
            "resnet": "./data/models/resnet101-5d3b4d8f.pth",
            "xception": "./data/models/xception-b5690688.pth",
            # zoo names from reference mobilenet.py:131 / drn.py:22
            "mobilenet": "./data/models/mobilenet_v2-6a65762b.pth",
            "drn": "./data/models/drn_d_54-0e0534ff.pth",
        }
        path = cfg.pretrained if isinstance(cfg.pretrained, str) else \
            default_paths[cfg.backbone]
        if path == default_paths["resnet"] and cfg.backbone != "resnet":
            path = default_paths[cfg.backbone]  # class default, wrong bb
        # fail loudly when the user ASKED for pretraining (the boolean
        # --pretrained flag, or a custom path that isn't the config
        # class default); a silently-missing default path is the normal
        # train-from-scratch case
        explicit = cfg.pretrained is True or (
            isinstance(cfg.pretrained, str)
            and cfg.pretrained not in default_paths.values())
        if os.path.exists(path):
            pretrained_path = path
        elif explicit:
            raise FileNotFoundError(
                f"pretrained encoder requested but {path} does not "
                "exist; place the ImageNet checkpoint there or drop "
                "the flag.")

    # model + state
    rng = jax.random.PRNGKey(0)
    state, model = init_state(cfg, rng, steps_per_epoch)

    if pretrained_path:
        from pylc_tpu import convert
        loader = {"resnet": convert.load_resnet101_imagenet,
                  "xception": convert.load_xception_imagenet,
                  "mobilenet": convert.load_mobilenet_imagenet,
                  "drn": convert.load_drn_imagenet}[cfg.backbone]
        state = loader(pretrained_path, state)
        if verbose:
            print(f"Loaded pretrained encoder from {pretrained_path}")
    model_eval = build_model(cfg, train=False)
    train_step = make_train_step(cfg, model,
                                 mesh=mesh if n_mesh > 1 else None)
    eval_step = make_eval_step(cfg, model_eval)
    lr_sched = make_lr_schedule(cfg, steps_per_epoch)

    ckpt = Checkpoint(model_id, cfg.save_dir)
    loss = RunningLoss(model_id, cfg.save_dir, resume=cfg.resume_checkpoint)

    epoch0 = 0
    if cfg.resume_checkpoint:
        restored = ckpt.load(state)
        if restored is not None:
            state = restored["state"]
            epoch0 = restored["epoch"]
            if verbose:
                print(f"Resumed from epoch {epoch0} "
                      f"(iter {int(state.step)}).")
    else:
        ckpt.reset()
    it = int(state.step)  # host-side step mirror (avoids per-step sync)

    sharding = batch_sharding(mesh, 4)
    mask_sharding = batch_sharding(mesh, 3)

    def _place(arr, shd, n, local_rows):
        if n_proc == 1:
            return jax.device_put(_pad_to(arr, n), shd)
        if local_rows:
            # train: arr holds THIS process's rows of the global batch
            arr = _pad_to(arr, n // n_proc)
            return jax.make_array_from_process_local_data(shd, arr)
        # validation: every host holds the identical full batch; each
        # addressable shard is sliced out of it
        arr = _pad_to(arr, n)
        return jax.make_array_from_callback(
            arr.shape, shd, lambda idx: arr[idx])

    def put(img, mask, pad_to=None, local_rows=False):
        n = pad_to or n_mesh
        return (_place(img, sharding, n, local_rows),
                _place(mask, mask_sharding, n, local_rows))

    valid_sharding = batch_sharding(mesh, 1)

    def validate(state, it, epoch):
        """Validate + checkpoint (the reference saves at every
        validation, train.py:146-151)."""
        n_val = 0
        if va_sharded:
            # every host runs exactly va_steps psum'd eval steps even
            # though shard sizes differ by <=1 (tail rows distributed):
            # an exhausted host feeds an all-padding batch (n_loc=0).
            # Padding sits at each host block's tail, so validity is a
            # [batch] mask sharded like the batch; at least shard 0
            # still holds rows at every step, so the global mask is
            # never all-zero.
            va_iter = iter(va_ds)
            for s in range(va_steps):
                try:
                    img, mask = next(va_iter)
                except StopIteration:
                    img = np.zeros((0,) + tuple(va_db.img_shape[1:]),
                                   np.uint8)
                    mask = np.zeros((0,) + tuple(va_db.mask_shape[1:]),
                                    np.uint8)
                n_loc = img.shape[0]
                vmask = (np.arange(batch // n_proc) < n_loc
                         ).astype(np.float32)
                gmask = jax.make_array_from_process_local_data(
                    valid_sharding, vmask)
                metrics = eval_step(
                    state, *put(img, mask, pad_to=batch, local_rows=True),
                    gmask)
                # global sample count this step — computable host-side
                # from the deterministic split, identical on every host
                weight = float(sum(
                    min(va_rows, max(0, sz - s * va_rows))
                    for sz in va_sizes))
                loss.push(metrics, weight=weight)
                n_val += 1
        else:
            for img, mask in va_ds:
                # pad partial batches to the full batch shape so the
                # jitted eval step compiles once; the valid count keeps
                # the padding out of the metric reductions
                n_loc = img.shape[0]
                metrics = eval_step(state, *put(img, mask, pad_to=batch),
                                    np.int32(n_loc))
                # weight by real sample count so a partial final batch
                # doesn't carry full-batch influence on best-dice gating
                loss.push(metrics, weight=float(n_loc))
                n_val += 1
        if n_val == 0 and verbose:
            print("  warning: validation split is empty")
        loss.log(it, training=False)
        # only process 0 writes artifacts: every host computes identical
        # metrics (global-batch GSPMD reductions are replicated), and
        # concurrent writers would race on the shared .tmp path
        if proc_i == 0:
            ckpt.save(state, cfg, epoch, is_best=loss.is_best)
            loss.save()
        if verbose:
            print(loss.status("valid"))

    t_start = time.time()
    step_rng = make_step_key(1234, cfg.rng_impl)
    for epoch in range(epoch0, cfg.n_epochs):
        if verbose:
            lr_now = float(lr_sched(state.step))
            print(f"\nEpoch {epoch + 1}/{cfg.n_epochs}  "
                  f"(steps/epoch {steps_per_epoch}, lr {lr_now:.2e}, "
                  f"mesh {n_mesh})")
        loss.lr.append((int(state.step), float(lr_sched(state.step))))

        if epoch == epoch0:
            validate(state, it, epoch)

        for img, mask in tr_ds:
            step_rng, sub = jax.random.split(step_rng)
            state, metrics = train_step(
                state, *put(img, mask, local_rows=True), sub)
            it += 1
            loss.push(metrics)
            if it % cfg.report == 0:
                loss.log(it, training=True)
                if proc_i == 0:
                    loss.save()
                if verbose:
                    print(f"  step {it}: {loss.status('train')}")
        loss.log(it, training=True)

        validate(state, it, epoch + 1)

    dt = time.time() - t_start
    return {
        "model_id": model_id,
        "epochs": cfg.n_epochs - epoch0,
        "steps": int(state.step),
        "best_dice": loss.best_dice,
        "wall_s": dt,
        "state": state,
        "config": cfg,
    }
