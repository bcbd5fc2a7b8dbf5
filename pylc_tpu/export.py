"""Hermetic serving artifacts: serialize a compiled canvas program
(weights inlined as constants) to a single file, loadable WITHOUT the
model zoo, flax, or a checkpoint.

The reference has no serving story beyond unpickling the full torch
module from a ``.pth`` (reference models/model.py:29-120 rebuilds the
Python model class, then test.py drives it) — deployment needs the
whole training codebase importable.  Production TPU serving wants the
opposite: a closed artifact whose only runtime dependency is the XLA
runtime.  ``jax.export`` gives exactly that — the jitted
tile→forward→stitch[→CRF]→argmax program is lowered to StableHLO with
the trained parameters folded in as constants, serialized with a
versioned calling convention, and can be deserialized and executed by
any same-or-newer JAX on the target platform (including platforms the
exporting host doesn't have, via cross-platform lowering).

Artifact layout (single file, magic ``PYLCX\\x01``):

    6 bytes   magic
    4 bytes   big-endian header length
    N bytes   header JSON (shape contract, palette, schema labels,
              versions — everything serving needs besides the program)
    rest      jax.export serialized module

The program is specialized to one (H, W, stride) canvas geometry —
the same unit the Segmenter compiles and caches per shape.  A serving
fleet fronting heterogeneous cameras exports one artifact per fitted
geometry (fitted shapes are few: ``adjust_to_tile`` snaps every source
to tile multiples).
"""

from __future__ import annotations

import json
import struct
from typing import Dict, Optional, Sequence

import numpy as np

_MAGIC = b"PYLCX\x01"


def export_segmenter(seg, H: int, W: int, stride: Optional[int] = None,
                     platforms: Optional[Sequence[str]] = None):
    """Export one canvas program from a live :class:`Segmenter`.

    Returns a ``jax.export.Exported``.  The Segmenter must be
    single-device (mesh=None): a serving replica is one chip; scale-out
    is replica-parallel, not program-sharded (docs/DEPLOY.md).

    platforms: lowering targets (e.g. ``("tpu", "cpu")``) — defaults to
    the exporting host's backend.  Cross-platform lowering requires
    every op to have a platform-independent lowering; the Pallas CRF
    kernel does not, so export CRF-bearing programs on the target
    platform (or use ``crf_backend='xla'``).
    """
    import jax

    if seg.mesh is not None:
        raise ValueError(
            "export requires a single-device Segmenter (mesh=None); "
            "serving scale-out is replica-parallel (docs/DEPLOY.md)")
    stride = stride or seg.cfg.tile_size // 2
    run, _plan = seg._program(H, W, stride)
    # unwrap the canvas jit: it carries top-level-only compiler_options
    # (infer.py _build), and nesting it under the export jit would be
    # rejected; PJRT options are a compile-time hint for THIS host's
    # executable, not part of the portable artifact anyway
    run = getattr(run, "__wrapped__", run)

    def serve(img):
        class_map, _probs = run(seg.state, img)
        return class_map

    img_spec = jax.ShapeDtypeStruct((H, W, seg.cfg.ch), np.uint8)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax.export.export(jax.jit(serve), **kwargs)(img_spec)


def _header(seg, H: int, W: int, stride: int, exported) -> Dict:
    import jax
    cfg = seg.cfg
    return {
        "h": H, "w": W, "ch": cfg.ch, "stride": stride,
        "tile_size": cfg.tile_size,
        "n_classes": cfg.n_classes,
        "schema_name": cfg.schema_name,
        "class_labels": list(cfg.class_labels),
        "palette_rgb": [list(c) for c in cfg.palette_rgb],
        "model_id": cfg.id,
        "arch": cfg.arch, "backbone": cfg.backbone,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "calling_convention": exported.calling_convention_version,
    }


def save_artifact(path: str, seg, H: int, W: int,
                  stride: Optional[int] = None,
                  platforms: Optional[Sequence[str]] = None) -> Dict:
    """Export + write a ``.pylcx`` serving artifact; returns its header."""
    stride = stride or seg.cfg.tile_size // 2
    exported = export_segmenter(seg, H, W, stride, platforms)
    header = _header(seg, H, W, stride, exported)
    hdr = json.dumps(header).encode()
    blob = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack(">I", len(hdr)))
        f.write(hdr)
        f.write(blob)
    import os
    os.replace(tmp, path)  # atomic, same discipline as checkpoint.py
    return header


class ServingModel:
    """A loaded ``.pylcx`` artifact: bytes → segmenting callable.

    Imports no model code — only the artifact, JAX, and the host
    colourize LUT.  The program is shape-specialized; ``segment``
    validates the contract and raises with the expected geometry.
    """

    def __init__(self, meta: Dict, exported):
        self.meta = meta
        self._exported = exported
        self._fn = exported.call

    @classmethod
    def load(cls, path: str) -> "ServingModel":
        import jax

        with open(path, "rb") as f:
            magic = f.read(len(_MAGIC))
            if magic != _MAGIC:
                raise ValueError(f"{path}: not a PYLCX artifact")
            (n,) = struct.unpack(">I", f.read(4))
            meta = json.loads(f.read(n).decode())
            blob = f.read()
        return cls(meta, jax.export.deserialize(blob))

    def segment(self, img: np.ndarray) -> Dict:
        """Segment a fitted [H, W, ch] uint8 image (exact artifact
        geometry).  Returns ``class_map`` [H, W] u8 and ``mask_rgb``
        [H, W, 3] u8."""
        m = self.meta
        if img.ndim == 2:
            img = img[..., None]
        want = (m["h"], m["w"], m["ch"])
        if tuple(img.shape) != want or img.dtype != np.uint8:
            raise ValueError(
                f"artifact expects uint8 {want}, got "
                f"{img.dtype} {tuple(img.shape)} — fit the source with "
                f"adjust_to_tile(tile_size={m['tile_size']}) first")
        class_map = np.asarray(self._fn(img))
        from pylc_tpu import native
        mask_rgb = native.colourize(
            class_map, np.asarray(m["palette_rgb"], np.uint8))
        return {"class_map": class_map, "mask_rgb": mask_rgb}
