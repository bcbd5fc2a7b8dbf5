"""Full-image inference: tile -> batched forward -> stitch -> (CRF) ->
palette decode.  This is the benchmark surface (Megapixels/sec/chip).

The reference runs this as host tiling -> per-batch device forward ->
host sequential stitch -> Python-loop colourize (test.py:23-115,
utils/tools.py:209-319).  Here the whole chain after decode is ONE
jitted XLA program per canvas shape (cached):

  host decode -> ONE device_put of the fitted image
    -> XLA unfold (layout moves only)
    -> lax.scan of the batched forward over tile batches (MXU, bf16)
    -> softmax + overlap-add stitch (k^2 shifted adds, no scatter)
    -> optional dense-CRF mean-field refinement
    -> argmax + palette LUT
  -> ONE device_get of the final [H, W, 3] uint8 mask.

U-Net note: the reference's own test path is broken for U-Net (its
stitcher assumes model output == tile_size, but valid-conv U-Net emits
324px; reconstruct would raise).  Defined semantics here: valid-conv
logits are upsampled to tile size (align-corners bilinear) before
stitching.  Recorded in docs/DEVIATIONS.md.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pylc_tpu.config import Config
from pylc_tpu.ops.tiles import grid_dims, stitch_probs, unfold_tiles
from pylc_tpu.models.layers import resize_bilinear_align_corners
from pylc_tpu.utils.imageio import adjust_to_tile, get_image


class Segmenter:
    """Batched tile->mask inference engine for one loaded model.

    Compiles one fused program per (H, W, stride) canvas shape and
    caches it, so repeated same-camera photographs (the 100-photo batch
    pipeline) pay compilation once.
    """

    #: max compiled canvas programs retained (LRU): segment_stream over
    #: a heterogeneous archive must not grow device memory without bound
    CACHE_SIZE = 8

    def __init__(self, cfg: Config, state, predict_fn: Callable,
                 batch_size: int = 16, crf: Optional[Callable] = None,
                 mesh=None, cache_size: Optional[int] = None):
        """mesh: optional jax.sharding.Mesh — when given, the tile batch
        is sharded over the mesh's 'data' axis (spatial scale-out: the
        convnet analogue of sequence parallelism, SURVEY.md §5.7), each
        chip runs its share of the forward, and the overlap stitch runs
        canvas-sharded with ppermute halo exchange
        (parallel/sharded_stitch.py) so stitch memory/compute scale
        1/n_devices; geometries the halo exchange can't cover fall back
        to the single-device stitch (see ``can_shard``)."""
        self.cfg = cfg
        self.state = state
        self.predict = predict_fn
        self.batch_size = batch_size
        self.crf = crf
        self.mesh = mesh
        if cache_size is not None and cache_size < 1:
            raise ValueError("cache_size must be >= 1 (the current "
                             "canvas program must be retained)")
        self.cache_size = self.CACHE_SIZE if cache_size is None \
            else cache_size
        self._cache: "OrderedDict[Tuple[int, int, int], Callable]" = \
            OrderedDict()

    def _program(self, H: int, W: int, stride: int):
        """Compiled canvas program for (H, W, stride), LRU-cached.

        Returns (run, band_plan): band_plan is None for single-device /
        replicated programs; for banded mesh programs it describes the
        host-side row-band split the caller must apply (see
        :meth:`_put_input`)."""
        key = (H, W, stride)
        entry = self._cache.get(key)
        if entry is None:
            entry = self._build(H, W, stride)
            self._cache[key] = entry
            if len(self._cache) > self.cache_size:
                self._cache.popitem(last=False)  # evict least-recent
        else:
            self._cache.move_to_end(key)
        return entry

    def _put_input(self, img: np.ndarray, plan):
        """Place a fitted [H, W, C] image for its program: replicated
        device_put normally; per-device overlapping row bands (H2D
        bytes ~ 1/n per chip) for banded mesh programs."""
        if plan is None:
            return jax.device_put(img)
        from pylc_tpu.parallel import banded_infer as BI
        return jax.device_put(BI.split_bands(img, plan),
                              BI.band_sharding(self.mesh))

    # ------------------------------------------------------------------ #

    def _build(self, H: int, W: int, stride: int) -> Callable:
        cfg = self.cfg
        # measured-win PJRT options belong on the TOP-LEVEL canvas jit
        # only (docs/PERF_ROUND4.md); self.predict runs nested inside it
        # and must stay options-free (JAX rejects nested options)
        from functools import partial

        from pylc_tpu.utils.compopts import tpu_compiler_options
        jit_top = partial(jax.jit, compiler_options=tpu_compiler_options())
        tile = cfg.tile_size
        n_rows, n_cols = grid_dims(W, H, tile, stride)
        n_tiles = n_rows * n_cols
        crf = self.crf
        mesh = self.mesh
        if mesh is not None and crf is not None:
            # GSPMD cannot partition a pallas_call over a sharded
            # operand (same limitation the loss documents and works
            # around in train_state._select_loss), and in the mesh
            # program the canvas is 'data'-sharded.  Run the Pallas
            # kernel per row band under shard_map with explicit halo
            # exchange (parallel/sharded_crf.py — bit-identical to the
            # single-device kernel); geometries whose bands can't hold
            # the message radius fall back to the XLA shifted-add form,
            # which GSPMD partitions with automatic halo exchange.
            p = getattr(crf, "params", None)
            if p is not None and p.backend != "xla":
                from pylc_tpu.parallel.sharded_crf import (
                    can_shard_crf, mean_field_sharded)
                if can_shard_crf(H, p, mesh.devices.size):
                    def crf(canvas, guide, _p=p, _m=mesh):
                        return mean_field_sharded(canvas, guide, _p, _m)
                else:
                    from pylc_tpu.ops.crf import mean_field
                    xla_params = p._replace(backend="xla")

                    def crf(canvas, guide, _p=xla_params):
                        return mean_field(canvas, guide, _p)
        if mesh is not None:
            # per-chip sub-batches: pad the tile count to a multiple of
            # (mesh_size * batch) so every chip scans the same length
            group = mesh.devices.size * self.batch_size
        else:
            group = self.batch_size
        n_pad = (-n_tiles) % group
        n_batches = (n_tiles + n_pad) // group

        use_sharded_stitch = False
        if mesh is not None:
            from pylc_tpu.parallel.sharded_stitch import can_shard
            use_sharded_stitch = can_shard(
                n_rows, tile, stride, mesh.devices.size)

        # probs leave the scan in bf16 when the full tile set is large
        # (10MP = ~1.1 GB in f32); the stitch accumulates in f32, and
        # bf16 holds ~3 decimal digits on [0,1] — argmax-stable
        probs_dtype = jnp.bfloat16 if \
            n_tiles * tile * tile * cfg.n_classes * 4 > 256 * 2 ** 20 \
            else jnp.float32

        def forward_probs(state, batch_tiles):
            logits = self.predict(state, batch_tiles)
            if logits.shape[1] != tile:  # valid-conv U-Net
                logits = resize_bilinear_align_corners(logits, tile, tile)
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return p.astype(probs_dtype)

        if use_sharded_stitch:
            # FULLY-BANDED mesh program (round 4, VERDICT r3 item 6):
            # the host uploads per-device overlapping row bands (H2D
            # bytes ~ total/n per chip instead of a replicated full
            # image), and unfold + forward + stitch all run per-band
            # under one shard_map — nothing left in the program scales
            # with the full image on a single chip.
            from pylc_tpu.parallel import banded_infer as BI
            plan = BI.plan_bands(H, W, tile, stride, mesh.devices.size)

            @jit_top
            def run_b(state, bands):
                canvas = BI.run_banded(
                    state, bands, forward_probs, n_cols, tile, stride,
                    mesh, self.batch_size, plan)
                if crf is not None:
                    canvas = crf(canvas, BI.banded_guide(bands, plan))
                class_map = jnp.argmax(canvas, axis=-1).astype(jnp.uint8)
                return class_map, canvas

            return run_b, plan

        @jit_top
        def run(state, img):
            tiles = unfold_tiles(img, tile, stride)  # [N, t, t, ch]
            if mesh is not None:
                # Pin the unfold replicated: its layout moves are a few
                # image-sized copies (cheap), and partitioning them
                # would make GSPMD hunt for a sharded transpose plan it
                # can't find — it falls back to replicate-then-partition
                # anyway, with an "involuntary full rematerialization"
                # warning.  Stating the plan keeps it deterministic and
                # silent; the batch constraint below then shards with a
                # plain slice.
                from jax.sharding import NamedSharding, PartitionSpec as P
                tiles = jax.lax.with_sharding_constraint(
                    tiles, NamedSharding(mesh, P()))
            if n_pad:
                tiles = jnp.concatenate(
                    [tiles, jnp.repeat(tiles[-1:], n_pad, axis=0)], axis=0)
            tiles = tiles.reshape((n_batches, group) + tiles.shape[1:])
            if mesh is not None:
                tiles = jax.lax.with_sharding_constraint(
                    tiles, NamedSharding(mesh, P(None, "data")))

            def body(carry, batch_tiles):
                # softmax per tile inside the scan keeps live memory at
                # one batch of logits instead of the full tile set
                return carry, forward_probs(state, batch_tiles)

            _, probs = jax.lax.scan(body, 0, tiles)
            probs = probs.reshape((-1,) + probs.shape[2:])[:n_tiles]
            if use_sharded_stitch:
                # canvas-sharded overlap stitch: tile rows and the
                # stitched canvas stay distributed over the mesh, halo
                # spills ride one ppermute over ICI (VERDICT r2 item 1:
                # canvas memory/compute scale 1/n instead of gathering
                # the full canvas onto every chip)
                from pylc_tpu.parallel.sharded_stitch import \
                    stitch_probs_sharded
                canvas = stitch_probs_sharded(
                    probs, n_rows, n_cols, tile, stride, mesh)
            else:
                canvas = stitch_probs(probs, n_rows, n_cols, tile, stride)
            if crf is not None:
                canvas = crf(canvas, img)
            class_map = jnp.argmax(canvas, axis=-1).astype(jnp.uint8)
            return class_map, canvas

        return run, None

    def segment_array(self, img: np.ndarray, stride: Optional[int] = None
                      ) -> Dict:
        """Segment a fitted [H, W, C] uint8 image (H, W tile multiples).

        Returns dict with 'mask_rgb' [H, W, 3] u8, 'class_map' [H, W] u8,
        'probs' (device array), and timing."""
        cfg = self.cfg
        stride = stride or cfg.tile_size // 2  # test default (test.py:63)
        if img.ndim == 2:
            img = img[..., None]
        H, W = img.shape[:2]
        run, plan = self._program(H, W, stride)

        t0 = time.perf_counter()
        class_map, canvas = run(self.state, self._put_input(img, plan))
        # fetch the 1-byte/px class map (3x less than RGB over the
        # host link) and colourize with the native host LUT
        class_map = np.asarray(class_map)
        from pylc_tpu import native
        mask_rgb = native.colourize(
            class_map, np.asarray(self.cfg.palette_rgb, np.uint8))
        dt = time.perf_counter() - t0
        return {
            "mask_rgb": mask_rgb,
            "class_map": class_map,
            "probs": canvas,
            "seconds": dt,
            "megapixels": H * W / 1e6,
        }

    def segment_array_staged(self, img: np.ndarray,
                             stride: Optional[int] = None) -> Dict:
        """segment_array with a per-stage wall breakdown: 'h2d' (host ->
        HBM upload), 'compute' (tile->forward->stitch[->CRF] program),
        'd2h' (class-map fetch), 'colourize' (host LUT).  Each stage
        syncs at its boundary via a real fetch (jax.block_until_ready
        does not synchronize on the tunneled axon backend), so 'compute'
        here pays one extra tiny round-trip that the unstaged path
        overlaps — use segment_array for the headline number and this
        for the decomposition behind it."""
        cfg = self.cfg
        stride = stride or cfg.tile_size // 2
        if img.ndim == 2:
            img = img[..., None]
        H, W = img.shape[:2]
        run, plan = self._program(H, W, stride)

        stages = {}
        t0 = time.perf_counter()
        dev = self._put_input(img, plan)
        np.asarray(dev[(0,) * (dev.ndim - 1)])  # sync the upload
        stages["h2d"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        class_map_dev, canvas = run(self.state, dev)
        np.asarray(class_map_dev[0, 0])  # sync compute, ~1-elt fetch
        stages["compute"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        class_map = np.asarray(class_map_dev)
        stages["d2h"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        from pylc_tpu import native
        mask_rgb = native.colourize(
            class_map, np.asarray(cfg.palette_rgb, np.uint8))
        stages["colourize"] = time.perf_counter() - t0
        return {
            "mask_rgb": mask_rgb,
            "class_map": class_map,
            "probs": canvas,
            "stages": stages,
            "seconds": sum(stages.values()),
            "megapixels": H * W / 1e6,
        }

    def segment_many(self, imgs, stride: Optional[int] = None):
        """Software-pipelined segmentation of a sequence of fitted images
        of the same shape (the 100-photo batch pipeline): uploads,
        compute, and downloads overlap via JAX async dispatch — fetches
        are deferred until every program is enqueued.

        Returns a list of dicts like segment_array (without 'probs')."""
        cfg = self.cfg
        stride = stride or cfg.tile_size // 2
        if not imgs:
            return []
        H, W = imgs[0].shape[:2]
        run, plan = self._program(H, W, stride)

        t0 = time.perf_counter()
        pending = []
        for i, img in enumerate(imgs):
            if img.ndim == 2:
                img = img[..., None]
            if img.shape[:2] != (H, W):
                raise ValueError(
                    f"segment_many requires uniform shapes: imgs[{i}] is "
                    f"{img.shape[:2]}, imgs[0] is {(H, W)} — use "
                    "segment_stream for mixed-shape batches.")
            dev = self._put_input(img, plan)  # async H2D
            class_map, _ = run(self.state, dev)
            pending.append(class_map)  # no sync — keep the pipe full
        pal = np.asarray(cfg.palette_rgb, np.uint8)
        from pylc_tpu import native
        out = []
        prev = t0
        for cm in pending:
            cm = np.asarray(cm)  # sync point for THIS item
            now = time.perf_counter()
            out.append({
                "class_map": cm,
                "mask_rgb": native.colourize(cm, pal),
                "megapixels": H * W / 1e6,
                # marginal wall time: previous item's completion -> this
                # one's (first item carries the pipeline fill); keeps
                # sum(seconds) == total wall without erasing tail latency
                "seconds": now - prev,
                # completion timestamp since batch start (tail latency)
                "completed_s": now - t0,
            })
            prev = now
        return out

    def segment_stream(self, items, stride: Optional[int] = None):
        """Generator over (tag, fitted_image) pairs with one-image device
        lookahead: image k+1's program is enqueued before image k's
        class map is fetched, so H2D/compute/D2H overlap even when every
        photo has a different canvas shape.

        Yields (tag, result-dict) in order."""
        cfg = self.cfg
        stride = stride or cfg.tile_size // 2
        pal = np.asarray(cfg.palette_rgb, np.uint8)
        from pylc_tpu import native

        def enqueue(tag, img):
            if img.ndim == 2:
                img = img[..., None]
            H, W = img.shape[:2]
            run, plan = self._program(H, W, stride)
            t0 = time.perf_counter()
            class_map, canvas = run(self.state,
                                    self._put_input(img, plan))
            return (tag, class_map, canvas, H, W, t0)

        def finish(pending):
            tag, class_map, canvas, H, W, t0 = pending
            cm = np.asarray(class_map)  # sync point
            return tag, {
                "mask_rgb": native.colourize(cm, pal),
                "class_map": cm,
                "probs": canvas,
                "seconds": time.perf_counter() - t0,
                "megapixels": H * W / 1e6,
            }

        pending = None
        for tag, img in items:
            nxt = enqueue(tag, img)
            if pending is not None:
                yield finish(pending)
            pending = nxt
        if pending is not None:
            yield finish(pending)

    def segment_file(self, img_path: str, scale: Optional[float] = None,
                     stride: Optional[int] = None) -> Dict:
        """Full reference test-path flow for one image file: decode ->
        scale -> fit to tile grid -> segment -> resize back to scaled
        dims (reference utils/tools.py:316-317, nearest)."""
        import cv2

        cfg = self.cfg
        stride = stride or cfg.tile_size // 2
        img, w_full, h_full, w_scaled, h_scaled = get_image(
            img_path, cfg.ch, scale=scale or cfg.scale,
            tile_size=cfg.tile_size)
        fitted, w_fit, h_fit, offset = adjust_to_tile(
            img, cfg.tile_size, stride)
        res = self.segment_array(fitted, stride)
        # resize predicted mask back to the scaled (pre-fit) dimensions
        res["mask_rgb"] = cv2.resize(
            res["mask_rgb"], (w_scaled, h_scaled),
            interpolation=cv2.INTER_NEAREST)
        n_rows, n_cols = grid_dims(w_fit, h_fit, cfg.tile_size, stride)
        res["extract"] = {
            "fid": (img_path.split("/")[-1].replace(".", "_")
                    + "_scale_" + str(scale or cfg.scale)),
            "n": n_rows * n_cols,
            "w_full": w_full, "h_full": h_full,
            "w_scaled": w_scaled, "h_scaled": h_scaled,
            "w_fitted": w_fit, "h_fitted": h_fit, "offset": offset,
        }
        return res
