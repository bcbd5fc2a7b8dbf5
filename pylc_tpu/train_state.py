"""Train state, optimizers, LR schedules, and jitted step functions.

The reference's per-batch hot loop is host Python around a torch
forward/backward (models/model.py:282-336: flip + normalize on host,
.to(device) per batch, three separate loss softmaxes, clip, step).  Here
the whole step — uint8 batch in, new state + metrics out — is ONE jitted
XLA program: flip, normalize, forward, fused multi-loss, grad, global
clip(0.5), optimizer update.  Donated state buffers keep HBM flat.

Optimizer/scheduler parity (reference models/model.py:238-280):
  - adam  -> AdamW(lr=1e-4, weight_decay=5e-5)  [decoupled, as torch]
  - sgd   -> SGD(momentum=0.9)
  - step_lr   -> lr * 0.9^epoch (StepLR step_size=1)
  - cyclic_lr -> triangular 1e-6 -> 0.1, 2000 steps up (CyclicLR default)
  - anneal    -> constant (reference returns None)
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from pylc_tpu.config import Config
from pylc_tpu.models.registry import build_model
from pylc_tpu.ops.losses import LossWeights, multi_loss
from pylc_tpu.ops.normalize import normalize_image


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    base = cfg.lr
    if cfg.sched_type == "step_lr":
        spe = max(1, steps_per_epoch)

        def sched(step):
            epoch = step // spe
            return base * jnp.power(cfg.gamma, epoch.astype(jnp.float32))
        return sched
    if cfg.sched_type == "cyclic_lr":
        up = 2000.0

        def sched(step):
            cycle = jnp.floor(1 + step / (2 * up))
            x = jnp.abs(step / up - 2 * cycle + 1)
            return cfg.lr_min + (cfg.lr_max - cfg.lr_min) * \
                jnp.maximum(0.0, 1.0 - x)
        return sched
    if cfg.sched_type == "anneal":
        return lambda step: jnp.asarray(base)
    raise ValueError(f"Scheduler '{cfg.sched_type}' is not defined.")


def make_optimizer(cfg: Config, steps_per_epoch: int
                   ) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg, steps_per_epoch)

    def base(mult: float) -> optax.GradientTransformation:
        s = sched if mult == 1.0 else (lambda step: sched(step) * mult)
        if cfg.optim_type == "adam":
            return optax.adamw(s, weight_decay=cfg.weight_decay)
        if cfg.optim_type == "sgd":
            return optax.sgd(s, momentum=cfg.momentum)
        raise ValueError(f"Optimizer '{cfg.optim_type}' is not defined.")

    if cfg.head_lr_mult != 1.0:
        # backbone at lr, everything else (ASPP+decoder head) at
        # lr * head_lr_mult — the reference's get_1x/get_10x_lr_params
        # split (deeplab.py:57-79), which its Model never uses.  For
        # archs without a 'backbone' subtree (unet/res_unet) every
        # param is 'head', i.e. the multiplier scales the whole net.
        opt = optax.multi_transform(
            {"backbone": base(1.0), "head": base(cfg.head_lr_mult)},
            param_labels=lambda params: {
                k: ("backbone" if k == "backbone" else "head")
                for k in params})
    else:
        opt = base(1.0)
    # in-place gradient norm clip at 0.5 (reference models/model.py:326)
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)


def make_step_key(seed: int, impl: str = "rbg") -> jax.Array:
    """Per-step RNG key for the train loop's dropout/flip draws.

    'rbg' keys lower jax.random.split/bernoulli to the TPU-native XLA
    RngBitGenerator instead of threefry2x32 custom-calls — measured
    45.0 vs 48.4 ms/step device on v5e at batch 8 because the threefry
    ops pollute the conv fusion schedule (docs/PERF_ROUND3.md).
    Parameter init (init_state) deliberately keeps the threefry
    default so checkpoints and golden tests reproduce bit-for-bit."""
    if impl in (None, "threefry2x32"):
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)


def init_state(cfg: Config, rng: jax.Array, steps_per_epoch: int = 100
               ) -> Tuple[TrainState, Any]:
    """Initialize model params/batch_stats and optimizer state."""
    model = build_model(cfg, train=True)
    in_ch = 3 if cfg.arch == "deeplab" else cfg.ch
    dummy = jnp.zeros((1, cfg.tile_size, cfg.tile_size, in_ch), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params),
                       tx=tx)
    return state, model


def _prepare_batch(cfg: Config, img, mask, flip: Optional[jnp.ndarray]):
    """Flip + normalize + target crop + channel stack, traced into the
    step program (reference does all of this on host per batch,
    models/model.py:295-311)."""
    x = img.astype(jnp.float32)
    if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[1] != x.shape[-1]:
        x = jnp.transpose(x, (0, 2, 3, 1))  # accept NCHW input
    if flip is not None:
        # batch-level horizontal (width) flip — the reference flips
        # dim 3 of NCHW = width (models/model.py:296-298)
        xf = x[:, :, ::-1, :]
        x = jnp.where(flip, xf, x)
        if mask is not None:
            mask = jnp.where(flip, mask[:, :, ::-1], mask)
    x = normalize_image(x, cfg.px_mean or cfg.px_rgb_mean,
                        cfg.px_std or cfg.px_rgb_std, cfg.ch,
                        default=cfg.normalize_default)
    if cfg.ch == 1 and cfg.arch == "deeplab":
        x = jnp.concatenate([x, x, x], axis=-1)
    if mask is not None and cfg.arch in ("unet", "resunet"):
        # valid-conv geometry: target cropped to the output window.
        # The reference crops only for 'unet' (models/model.py:306),
        # leaving its ResUNet train path shape-broken — same valid-conv
        # geometry, same crop (docs/DEVIATIONS.md F2).
        lo, hi = cfg.crop_window
        mask = mask[:, lo:hi, lo:hi]
    return x, mask


def _select_loss(cfg: Config, mesh=None):
    """Pick the loss implementation: the Pallas fused kernel (forward
    partials + analytic-VJP backward, pylc_tpu/ops/pallas/fused_loss.py)
    on TPU, the XLA-fused jnp version elsewhere.

    Multi-chip: GSPMD cannot partition a pallas_call over a sharded
    batch, so with a mesh of >1 devices the kernel runs per-shard under
    shard_map with its partials psum'd over the 'data' axis
    (tests/test_pallas_loss.py::test_fused_loss_sharded_matches_global).
    """
    use_pallas = cfg.fused_loss == "on" or (
        cfg.fused_loss == "auto" and jax.default_backend() == "tpu")
    if not use_pallas:
        return lambda logits, y, class_weights, w: multi_loss(
            logits, y, class_weights=class_weights, w=w)

    from pylc_tpu.ops.pallas.fused_loss import fused_multi_loss

    if mesh is not None and mesh.devices.size > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def loss(logits, y, class_weights, w):
            def inner(lg, yy):
                return fused_multi_loss(lg, yy, class_weights, w,
                                        axis_name="data")
            return shard_map(inner, mesh=mesh,
                             in_specs=(P("data"), P("data")),
                             out_specs=(P(), P()),
                             check_vma=False)(logits, y)
        return loss

    if jax.device_count() > 1:
        # no mesh handle: fall back to the jnp loss under plain GSPMD
        return lambda logits, y, class_weights, w: multi_loss(
            logits, y, class_weights=class_weights, w=w)

    def loss(logits, y, class_weights, w):
        return fused_multi_loss(logits, y, class_weights, w)
    return loss


def make_train_step(cfg: Config, model, mesh=None):
    """Build the jitted train step: (state, img u8, mask u8, rng) ->
    (state, metrics).  Pass the mesh when training data-parallel so the
    Pallas loss runs per-shard under shard_map."""
    lw = LossWeights(ce=cfg.ce_weight, dice=cfg.dice_weight,
                     focal=cfg.focal_weight, weighted=cfg.weighted,
                     dice_smooth=cfg.dice_smooth, fl_alpha=cfg.fl_alpha,
                     fl_gamma=cfg.fl_gamma)
    cw = jnp.asarray(np.asarray(cfg.weights, dtype=np.float32)) \
        if cfg.weights is not None else None
    has_bn = cfg.norm_type in ("batch", "syncbatch")
    loss_impl = _select_loss(cfg, mesh)

    def step(state: TrainState, img, mask, rng):
        flip_rng, drop_rng = jax.random.split(rng)
        flip = jax.random.bernoulli(flip_rng)
        x, y = _prepare_batch(cfg, img, mask.astype(jnp.int32), flip)

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                logits, new_vars = model.apply(
                    variables, x, train=True,
                    rngs={"dropout": drop_rng}, mutable=["batch_stats"])
            else:
                # passing mutable=[] would STILL switch apply to the
                # (out, vars) tuple return — norm types without running
                # stats must call apply without the kwarg
                logits = model.apply(variables, x, train=True,
                                     rngs={"dropout": drop_rng})
                new_vars = {}
            total, aux = loss_impl(logits, y, cw, lw)
            return total, (aux, new_vars.get("batch_stats", state.batch_stats))

        (total, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        metrics = dict(aux, total=total)
        return state, metrics

    from pylc_tpu.utils.compopts import tpu_compiler_options
    return jax.jit(step, donate_argnums=(0,),
                   compiler_options=tpu_compiler_options())


def make_eval_step(cfg: Config, model_eval):
    """Jitted validation step: (state, img, mask, valid) -> metrics.

    ``valid`` excludes padded samples from every loss reduction, so
    partial validation batches padded up to the compiled batch shape
    don't bias the metrics that gate the best-dice checkpoint
    (reference train.py:146-151 never pads because it recompiles
    nothing).  Either a traced scalar count (padding at the batch
    tail) or a [B] 0/1 mask — the mask form supports multi-host
    sharded validation, where each host contributes its own block of
    the global batch and the padding sits at each block's tail.
    Metrics include ``n_valid`` (the mask sum — under GSPMD a global,
    replicated reduction) for sample-count weighting."""
    lw = LossWeights(ce=cfg.ce_weight, dice=cfg.dice_weight,
                     focal=cfg.focal_weight, weighted=cfg.weighted,
                     dice_smooth=cfg.dice_smooth, fl_alpha=cfg.fl_alpha,
                     fl_gamma=cfg.fl_gamma)
    cw = jnp.asarray(np.asarray(cfg.weights, dtype=np.float32)) \
        if cfg.weights is not None else None
    has_bn = cfg.norm_type in ("batch", "syncbatch")

    def step(state: TrainState, img, mask, valid):
        x, y = _prepare_batch(cfg, img, mask.astype(jnp.int32), None)
        variables = {"params": state.params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        logits = model_eval.apply(variables, x, train=False)
        valid = jnp.asarray(valid)
        sm = (jnp.arange(img.shape[0]) < valid).astype(jnp.float32) \
            if valid.ndim == 0 else valid.astype(jnp.float32)
        total, aux = multi_loss(logits, y, class_weights=cw, w=lw,
                                sample_mask=sm)
        return dict(aux, total=total, n_valid=jnp.sum(sm))

    from pylc_tpu.utils.compopts import tpu_compiler_options
    return jax.jit(step, compiler_options=tpu_compiler_options())


def make_predict(cfg: Config, model_eval):
    """Jitted inference: (state, img u8 [B,H,W,C]) -> logits [B,H,W,K].

    Uses normalize_default per checkpoint meta (reference
    models/model.py:367-382)."""
    has_bn = cfg.norm_type in ("batch", "syncbatch")

    def predict(state: TrainState, img):
        x, _ = _prepare_batch(cfg, img, None, None)
        variables = {"params": state.params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        return model_eval.apply(variables, x, train=False)

    # NO compiler_options here: the Segmenter calls this jit NESTED
    # inside its canvas program, and JAX rejects compiler_options on a
    # non-top-level jit.  The canvas programs (infer.py _build) apply
    # the options at their own top level.
    return jax.jit(predict)
