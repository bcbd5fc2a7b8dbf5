"""PyLC-TPU: TPU-native landscape-segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the PyLC (Python Landscape
Classifier) capability set: tile extraction, threshold-optimized
augmentation, U-Net / ResUNet / DeepLabV3+ semantic segmentation,
multi-loss training, overlapping-tile inference with device-side
stitching, dense-CRF refinement, and evaluation — designed for TPU
hardware (SPMD over device meshes, fused XLA programs, Pallas kernels
on the hot paths).
"""

__version__ = "0.1.0"
