"""Post-training int8 quantization (PTQ) of the inference path.

TPU v5e's MXU runs int8xint8->int32 at 394 TOPS — 2x the 197 TFLOP/s
bf16 peak — the hypothesis was that a conv-bound inference program
(65.6 % bf16 conv MFU, docs/PERF_ROUND5.md) had headroom from
quantized convs.  **Measured outcome: negative** — the quantize/
dequantize chains around every conv are full-tensor VPU/HBM passes
that cost more than the int8 MXU saves (0.9x compute vs bf16, and
per-tensor absmax activation scales flip ~5 % of argmax pixels on the
low-margin parity checkpoint); see docs/PERF_ROUND5.md §4 for the
numbers and the compiled-HLO mechanism.  bf16 remains the shipping
inference path; this module is the recorded experiment + tooling.

The implementation quantizes WITHOUT touching the model definitions: a
flax method interceptor (``nn.intercept_methods``) swaps every
``nn.Conv`` call in the eval model for an int8 kernel at apply time,
so the same module tree serves bf16 and int8.

Scheme (standard symmetric PTQ):
  - weights: per-output-channel int8, scale = absmax/127 over (H,W,I);
  - activations: per-conv-instance per-tensor int8, scale calibrated
    from real dataset tiles (absmax over N calibration batches);
  - conv computed as int8xint8 -> int32 (``preferred_element_type``),
    dequantized with the product scale, bias added in f32, cast back to
    the surrounding compute dtype.  BN/ReLU/resize stay in bf16 — XLA
    fuses the (de)quantize chains into the neighbouring ops.

The reference has no quantization story at all (torch fp32 end-to-end,
models/model.py:29-120); this is TPU-serving tooling, not a port.

Flow (scripts/quant_experiment.py, tests/test_quant.py):
  scales = calibrate_absmax(model_eval, state, batches)  # eager, once
  predict_q = make_predict_int8(cfg, model_eval, scales)
  seg = Segmenter(cfg, state, predict_q)                 # drop-in
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable

import jax
import jax.numpy as jnp

from pylc_tpu.config import Config

Q_MAX = 127.0


def _conv_path(module) -> str:
    return "/".join(module.path)


def _as_pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _conv_dims(mod, x, kernel):
    """Replicate flax nn.Conv's lax.conv_general_dilated arguments
    (NHWC/HWIO/NHWC, the only layout this package builds models in)."""
    if x.ndim != 4 or kernel.ndim != 4:
        raise NotImplementedError(
            f"int8 PTQ covers 2D convs only (got x{x.shape})")
    padding = mod.padding
    if isinstance(padding, str):
        if padding not in ("SAME", "VALID"):
            raise NotImplementedError(f"padding {padding!r}")
    else:
        padding = [_as_pair(p) for p in padding]
    return dict(
        window_strides=_as_pair(mod.strides),
        padding=padding,
        rhs_dilation=_as_pair(mod.kernel_dilation),
        feature_group_count=mod.feature_group_count,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def calibrate_absmax(model_eval, variables, batches: Iterable,
                     **apply_kwargs) -> Dict[str, float]:
    """Run calibration batches through the eval model, recording each
    conv instance's input absmax (keyed by module path).

    The per-batch pass is JITTED — the interceptor collects traced
    absmax values into a dict the jitted function returns, so one
    compile covers all batches and one device round-trip per batch
    fetches every conv's statistic (an eager pass would dispatch each
    op over the tunnel individually: minutes instead of seconds).

    ``batches`` are prepared model inputs (the output of the predict
    path's normalize — see make_predict's _prepare_batch); a handful of
    dataset tiles suffices for the band-structured activations here."""
    import flax.linen as nn

    def one_batch(b):
        stats = {}

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if isinstance(m, nn.Conv) and context.method_name == "__call__":
                p = _conv_path(m)
                mx = jnp.abs(args[0].astype(jnp.float32)).max()
                stats[p] = jnp.maximum(stats[p], mx) if p in stats else mx
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model_eval.apply(variables, b, **apply_kwargs)
        return stats

    one = jax.jit(one_batch)
    out: Dict[str, float] = {}
    for b in batches:
        per = jax.device_get(one(b))
        for k, v in per.items():
            out[k] = max(out.get(k, 0.0), float(v))
    return out


def _quantized_conv(mod, x, act_scale: float):
    """int8 x int8 -> int32 conv with per-out-channel weight scales,
    numerically standing in for mod's own f32/bf16 conv."""
    kernel = mod.variables["params"]["kernel"]
    bias = mod.variables["params"].get("bias") if mod.use_bias else None

    kf = kernel.astype(jnp.float32)
    w_scale = jnp.max(jnp.abs(kf), axis=(0, 1, 2), keepdims=True) / Q_MAX
    w_scale = jnp.maximum(w_scale, 1e-12)
    qw = jnp.clip(jnp.round(kf / w_scale), -Q_MAX, Q_MAX).astype(jnp.int8)

    s_x = max(act_scale, 1e-12) / Q_MAX
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                  -Q_MAX, Q_MAX).astype(jnp.int8)

    y = jax.lax.conv_general_dilated(
        qx, qw, preferred_element_type=jnp.int32, **_conv_dims(mod, x, qw))
    y = y.astype(jnp.float32) * (w_scale.reshape(1, 1, 1, -1) * s_x)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def int8_interceptor(scales: Dict[str, float]):
    """A flax method interceptor replacing every calibrated nn.Conv with
    the int8 kernel; convs absent from ``scales`` (never seen during
    calibration) run unquantized."""
    import flax.linen as nn

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if isinstance(m, nn.Conv) and context.method_name == "__call__":
            s = scales.get(_conv_path(m))
            if s is not None and s > 0.0:
                return _quantized_conv(m, args[0], s)
        return next_fun(*args, **kwargs)

    return interceptor


def make_predict_int8(cfg: Config, model_eval,
                      scales: Dict[str, float]) -> Callable:
    """Drop-in replacement for train_state.make_predict whose forward
    runs calibrated convs as int8 (Segmenter/export compatible)."""
    import flax.linen as nn

    from pylc_tpu.train_state import _prepare_batch

    has_bn = cfg.norm_type in ("batch", "syncbatch")
    ic = int8_interceptor(scales)

    def predict(state, img):
        x, _ = _prepare_batch(cfg, img, None, None)
        variables = {"params": state.params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        with nn.intercept_methods(ic):
            return model_eval.apply(variables, x, train=False)

    # same nesting contract as make_predict: no compiler_options here
    # (the Segmenter canvas jit owns the top level)
    return jax.jit(predict)


def calibration_batches_from_db(db_path: str, cfg: Config, n_tiles: int = 32,
                                batch: int = 8):
    """Prepared calibration inputs straight from a tile DB: the first
    ``n_tiles`` images (class-band coverage comes from extraction's
    coshuffle), run through the SAME normalize the predict path uses."""
    import numpy as np

    from pylc_tpu.db.database import TileDB
    from pylc_tpu.train_state import _prepare_batch

    dbase = TileDB(db_path)
    imgs, _ = dbase.read_chunk(0, min(n_tiles, dbase.size))  # [N,C,H,W] u8
    imgs = np.transpose(imgs, (0, 2, 3, 1))                  # NHWC
    out = []
    for i in range(0, len(imgs), batch):
        x, _ = _prepare_batch(cfg, jnp.asarray(imgs[i:i + batch]),
                              None, None)
        out.append(x)
    return out
