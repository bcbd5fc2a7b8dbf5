"""Device-side (JAX/XLA/Pallas) data ops for PyLC-TPU."""

from pylc_tpu.ops.palette import class_encode, colourize, map_palette  # noqa
from pylc_tpu.ops.tiles import (  # noqa
    adjust_to_tile_dims, unfold_tiles, stitch_probs, grid_dims,
)
from pylc_tpu.ops.normalize import normalize_image  # noqa
from pylc_tpu.ops.losses import multi_loss, LossWeights  # noqa
