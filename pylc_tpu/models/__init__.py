"""JAX/Flax model zoo for PyLC-TPU: U-Net, ResUNet, DeepLabV3+."""

from pylc_tpu.models.registry import build_model  # noqa
