"""Checkpointing and loss tracking.

Logical content parity with the reference Checkpoint
(models/modules/checkpoint.py:20-66): a resumable training checkpoint
{epoch, iter/step, model params, optimizer state, meta} written every
validation, plus a best-model artifact gated on best mean validation
Dice (models/modules/loss.py:290-293).  Differences (deliberate):

  - atomic writes (tmp + os.replace) so a preempted job never leaves a
    torn checkpoint (the reference torch.saves in place);
  - flax msgpack + JSON meta instead of pickle;
  - ``.pth`` import/export for published-model parity lives in
    pylc_tpu/convert.py.

RunningLoss mirrors models/modules/loss.py:218-327: interval-averaged
(ce, dice, focal) per train/valid phase, best-dice tracking driving
``is_best``, lr trace, persisted as JSON (``losses.json``) instead of a
torch pickle.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization

from pylc_tpu.config import Config


def _atomic_write(path: str, data: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


class Checkpoint:
    """Checkpoint manager for one model directory."""

    def __init__(self, model_id: str, save_dir: str):
        self.model_dir = os.path.join(save_dir, model_id)
        os.makedirs(self.model_dir, exist_ok=True)
        self.checkpoint_file = os.path.join(self.model_dir, "checkpoint.ckpt")
        self.model_file = os.path.join(self.model_dir, model_id + ".ckpt")

    def save(self, state, cfg: Config, epoch: int, is_best: bool = False):
        payload = {
            "epoch": epoch,
            "iter": int(state.step),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        blob = serialization.to_bytes(payload)
        meta = cfg.to_meta_json().encode()
        _atomic_write(self.checkpoint_file, blob)
        _atomic_write(self.checkpoint_file + ".meta", meta)
        if is_best:
            best = serialization.to_bytes({
                "params": state.params,
                "batch_stats": state.batch_stats,
            })
            _atomic_write(self.model_file, best)
            _atomic_write(self.model_file + ".meta", meta)

    def load(self, state) -> Optional[Dict[str, Any]]:
        """Restore a checkpoint into the template ``state``.

        Returns {'state', 'epoch', 'meta'} or None if no checkpoint.
        """
        if not os.path.exists(self.checkpoint_file):
            return None
        template = {
            "epoch": 0,
            "iter": 0,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        with open(self.checkpoint_file, "rb") as f:
            payload = serialization.from_bytes(template, f.read())
        meta = None
        if os.path.exists(self.checkpoint_file + ".meta"):
            with open(self.checkpoint_file + ".meta") as f:
                meta = json.load(f)
        new_state = state.replace(
            step=np.int32(payload["iter"]),
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"])
        return {"state": new_state, "epoch": payload["epoch"], "meta": meta}

    def reset(self):
        for p in (self.checkpoint_file, self.checkpoint_file + ".meta"):
            if os.path.exists(p):
                os.remove(p)


def load_model_file(path: str, state):
    """Load a best-model .ckpt (params + batch_stats) into ``state``.

    Returns (state, meta dict or None)."""
    template = {"params": state.params, "batch_stats": state.batch_stats}
    with open(path, "rb") as f:
        payload = serialization.from_bytes(template, f.read())
    meta = None
    if os.path.exists(path + ".meta"):
        with open(path + ".meta") as f:
            meta = json.load(f)
    return state.replace(params=payload["params"],
                         batch_stats=payload["batch_stats"]), meta


class RunningLoss:
    """Interval-averaged loss tracker with best-dice checkpoint gating."""

    def __init__(self, model_id: str, save_dir: str, resume: bool = False):
        self.train = []
        self.valid = []
        self.intv = []
        self.lr = []
        self.avg_ce = 0.0
        self.avg_dice = 1.0
        self.avg_fl = 0.0
        self.best_dice = 1.0
        self.is_best = False
        self.model_dir = os.path.join(save_dir, model_id)
        os.makedirs(self.model_dir, exist_ok=True)
        self.log_file = os.path.join(self.model_dir, "losses.json")
        if os.path.exists(self.log_file):
            if resume:
                with open(self.log_file) as f:
                    d = json.load(f)
                self.train = d.get("train", [])
                self.valid = d.get("valid", [])
                self.best_dice = d.get("best_dice", 1.0)
                self.lr = d.get("lr", [])
            else:
                os.remove(self.log_file)

    def push(self, metrics: Dict[str, Any], weight: float = 1.0):
        """Buffer one step's metrics.  Device scalars are stored as-is —
        JAX's async dispatch keeps the accelerator pipeline full; the
        host sync happens once per interval in log() (the reference
        syncs losses to host every batch, models/model.py:319).

        ``weight``: relative weight of this batch in the interval
        average — validation passes its real (unpadded) sample count so
        a partial final batch doesn't get full-batch influence on the
        best-dice gate."""
        self.intv.append((metrics["ce"], metrics["dice"], metrics["focal"],
                          weight))

    def log(self, iteration: int, training: bool):
        """Fold the interval buffer into a weighted average; update
        best-dice on validation (reference loss.py:270-293)."""
        if not self.intv:
            if not training:
                # an empty validation must not re-trigger a stale best
                self.is_best = False
            return
        self.intv = [tuple(float(x) for x in row) for row in self.intv]
        wsum = sum(row[3] for row in self.intv) or 1.0
        ce, dice, fl = (sum(v * row[3] for v, row in
                            zip(col, self.intv)) / wsum
                        for col in zip(*(r[:3] for r in self.intv)))
        self.avg_ce, self.avg_dice, self.avg_fl = ce, dice, fl
        self.intv = []
        row = (iteration, ce, dice, fl)
        if training:
            self.train.append(row)
        else:
            self.valid.append(row)
            self.is_best = self.avg_dice < self.best_dice
            if self.is_best:
                self.best_dice = self.avg_dice

    def save(self):
        blob = json.dumps({
            "train": self.train, "valid": self.valid,
            "best_dice": self.best_dice, "lr": self.lr,
        }).encode()
        _atomic_write(self.log_file, blob)

    def status(self, mode: str) -> str:
        return (f"[{mode}] ce {self.avg_ce:.4f}  dice {self.avg_dice:.4f}  "
                f"focal {self.avg_fl:.4f}  best-dice {self.best_dice:.4f}")
