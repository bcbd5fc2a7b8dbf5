"""Architecture dispatch (reference models/model.py:139-179)."""

from __future__ import annotations

from flax import linen as nn

from pylc_tpu.config import Config
from pylc_tpu.models.deeplab import DeepLab
from pylc_tpu.models.layers import get_activation, make_norm
from pylc_tpu.models.res_unet import ResUNet
from pylc_tpu.models.unet import UNet


def build_model(cfg: Config, train: bool = False,
                axis_name: str | None = None) -> nn.Module:
    """Instantiate the configured architecture.

    The normalizer factory is bound to the train/eval phase here (flax
    BatchNorm needs ``use_running_average`` at construction, unlike
    torch's mode flag).

    ``axis_name`` is only for explicit shard_map/pmap contexts where a
    named mesh axis is in scope.  Under the default GSPMD ``jit`` path it
    MUST stay ``None``: a bound axis name makes flax BatchNorm call
    ``pmean`` against an axis that plain jit never binds (unbound-axis
    NameError), and GSPMD already reduces batch statistics globally over
    a batch-sharded input, so ``norm_type='syncbatch'`` coincides with
    ``'batch'`` there (see models/layers.py docstring and
    tests/test_syncbn.py).
    """
    import jax.numpy as jnp

    act = get_activation(cfg.activ_type)
    # conv compute dtype: bf16 keeps the MXU in its native precision;
    # params stay f32.  Normalizers get the same compute dtype so
    # activations stay bf16 across conv->BN->relu chains (flax computes
    # BN statistics in float32 internally regardless — see
    # flax.linen.normalization._compute_stats); BN in f32 cost ~11
    # ms/step of convert_reduce fusions in the v5e train profile.
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    norm = make_norm(cfg.norm_type, train=train, dtype=dtype,
                     axis_name=axis_name)

    if cfg.arch == "unet":
        return UNet(n_classes=cfg.n_classes, up_mode=cfg.up_mode,
                    dropout=cfg.dropout, norm=norm, act=act,
                    depth=cfg.unet_depth, wf=cfg.unet_wf, dtype=dtype)
    if cfg.arch == "resunet":
        return ResUNet(n_classes=cfg.n_classes, up_mode=cfg.up_mode, act=act,
                       norm=norm, depth=cfg.unet_depth, wf=cfg.unet_wf,
                       dtype=dtype)
    if cfg.arch == "deeplab":
        # remat backbone blocks during training: recompute activations
        # in the backward pass, trading ~30% FLOPs for the HBM that
        # otherwise caps the batch size
        return DeepLab(n_classes=cfg.n_classes, backbone=cfg.backbone,
                       norm=norm, dtype=dtype,
                       remat=train and cfg.remat_backbone)
    raise ValueError(f"Model '{cfg.arch}' not available. "
                     f"Options: {cfg.arch_options}")


def model_input_channels(cfg: Config) -> int:
    """DeepLab always takes 3 channels (grayscale stacked x3, reference
    models/model.py:310-311); U-Nets take the raw channel count."""
    return 3 if cfg.arch == "deeplab" else cfg.ch
