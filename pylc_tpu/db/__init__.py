"""Tile database (HDF5) and host->HBM feeding pipeline."""

from pylc_tpu.db.database import TileDB  # noqa
from pylc_tpu.db.dataset import TileDataset  # noqa
