"""HTTP serving daemon for segmentation (``pylc.py serve``).

The reference has no serving story at all — its only inference surface
is the batch CLI (reference test.py:23-115, one process per
invocation, model re-unpickled every run).  Production TPU serving
wants a resident process: the model stays on-device, canvas programs
stay compiled (Segmenter's per-geometry LRU cache), and photos stream
through one H2D/compute/D2H pipe.

Two backends, same endpoint contract:

- **checkpoint-backed** (``.ckpt`` / reference ``.pth``): full
  Segmenter — any photo geometry (programs compile per fitted canvas
  shape and are cached), optional CRF.
- **artifact-backed** (``.pylcx``): a hermetic exported program
  (pylc_tpu/export.py) — fixed geometry contract, no model zoo
  import.

Endpoints:

    GET  /healthz            -> 200 JSON: model info + geometry contract
    POST /segment            -> body = image bytes (jpg/png/tif);
                                response = colour mask PNG
                                (?format=json -> JSON with base64 PNG,
                                timing, and geometry metadata)

Device work is single-flight behind a lock: JAX dispatch is not
thread-safe per se, and a serving replica is one chip — concurrency
comes from running replicas, not threads (docs/DEPLOY.md).  The HTTP
layer is a stdlib ThreadingHTTPServer so health checks never queue
behind a long segment.

The request decode path reuses ``utils.imageio.get_image`` via a temp
file so served photos get byte-identical treatment to the CLI path
(8-bit forcing, BGR->RGB, grayscale detection, min-dim clamp —
reference utils/tools.py:77-148 semantics).
"""

from __future__ import annotations

import base64
import json
import os
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


class ServiceError(ValueError):
    """Client-side request problem -> HTTP 400 with a JSON message."""


def _png_bytes(mask_rgb: np.ndarray) -> bytes:
    import cv2
    ok, buf = cv2.imencode(".png", cv2.cvtColor(mask_rgb,
                                                cv2.COLOR_RGB2BGR))
    if not ok:
        raise RuntimeError("PNG encoding failed")
    return buf.tobytes()


class SegmentationService:
    """Presenter: request bytes -> mask PNG + metadata.

    HTTP-free so the logic is unit-testable headless (the same split
    gui.py uses); the handler below is a thin transport shell.
    """

    def __init__(self, segmenter=None, serving_model=None,
                 scale: Optional[float] = None, model_path: str = ""):
        if (segmenter is None) == (serving_model is None):
            raise ValueError(
                "exactly one of segmenter / serving_model required")
        self.seg = segmenter
        self.artifact = serving_model
        self.scale = scale
        self.model_path = model_path
        self._lock = threading.Lock()  # single-flight device work
        self.n_served = 0

    # ------------------------------------------------------------- #

    def info(self) -> Dict:
        if self.artifact is not None:
            m = self.artifact.meta
            return {
                "backend": "pylcx",
                "model": os.path.basename(self.model_path),
                "geometry": {"h": m["h"], "w": m["w"], "ch": m["ch"],
                             "tile_size": m["tile_size"],
                             "stride": m["stride"]},
                "n_classes": m["n_classes"],
                "class_labels": m["class_labels"],
                "n_served": self.n_served,
            }
        cfg = self.seg.cfg
        return {
            "backend": "checkpoint",
            "model": os.path.basename(self.model_path),
            "model_id": cfg.id,
            "arch": cfg.arch,
            "ch": cfg.ch,
            "tile_size": cfg.tile_size,
            "crf": self.seg.crf is not None,
            "n_classes": cfg.n_classes,
            "class_labels": list(cfg.class_labels),
            "n_served": self.n_served,
        }

    def segment_bytes(self, data: bytes, suffix: str = ".jpg") -> Dict:
        """Decode request bytes and segment.  Returns
        {'mask_png': bytes, 'seconds', 'megapixels', ...geometry}."""
        if not data:
            raise ServiceError("empty request body")
        # temp file keeps decode byte-identical to the CLI path
        # (cv2.imread handles jpg/png/tif uniformly from a path)
        fd, tmp = tempfile.mkstemp(suffix=suffix)
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            return self._segment_file(tmp)
        finally:
            os.unlink(tmp)

    def _segment_file(self, path: str) -> Dict:
        t0 = time.perf_counter()
        with self._lock:
            if self.artifact is not None:
                res = self._segment_artifact(path)
            else:
                try:
                    res = self.seg.segment_file(path, scale=self.scale)
                except (ValueError, OSError) as e:
                    raise ServiceError(f"cannot decode image: {e}")
        out = {
            "mask_png": _png_bytes(res["mask_rgb"]),
            "megapixels": res["megapixels"],
            "seconds": round(time.perf_counter() - t0, 4),
        }
        if "extract" in res:
            out["geometry"] = {
                k: res["extract"][k]
                for k in ("w_full", "h_full", "w_scaled", "h_scaled",
                          "w_fitted", "h_fitted")}
        self.n_served += 1
        return out

    def _segment_artifact(self, path: str) -> Dict:
        from pylc_tpu.utils.imageio import adjust_to_tile, get_image

        m = self.artifact.meta
        try:
            img, *_ = get_image(path, m["ch"], scale=self.scale or 1.0,
                                tile_size=m["tile_size"])
        except (ValueError, OSError) as e:
            raise ServiceError(f"cannot decode image: {e}")
        fitted, w_fit, h_fit, _off = adjust_to_tile(
            img, m["tile_size"], m["stride"])
        if (h_fit, w_fit) != (m["h"], m["w"]):
            raise ServiceError(
                f"artifact serves a fixed {m['h']}x{m['w']} fitted "
                f"geometry; this photo fits to {h_fit}x{w_fit} — "
                "re-export for this camera or serve a checkpoint")
        res = self.artifact.segment(fitted)
        res["megapixels"] = h_fit * w_fit / 1e6
        return res


def make_handler(service: SegmentationService):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        # quiet per-request stderr lines (observability is /healthz)
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code: int, obj: Dict):
            self._reply(code, json.dumps(obj).encode(),
                        "application/json")

        def do_GET(self):
            path = urlparse(self.path).path
            if path in ("/", "/healthz"):
                self._reply_json(200, service.info())
            else:
                self._reply_json(404, {"error": f"no route {path}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/segment":
                self._reply_json(404, {"error": f"no route {url.path}"})
                return
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n) if n else b""
            suffix = {"image/png": ".png", "image/tiff": ".tif"}.get(
                self.headers.get("Content-Type", ""), ".jpg")
            try:
                res = service.segment_bytes(data, suffix=suffix)
            except ServiceError as e:
                self._reply_json(400, {"error": str(e)})
                return
            except Exception as e:  # pragma: no cover - server fault
                self._reply_json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            q = parse_qs(url.query)
            if q.get("format", [""])[0] == "json":
                png = res.pop("mask_png")
                res["mask_png_base64"] = base64.b64encode(png).decode()
                self._reply_json(200, res)
            else:
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length",
                                 str(len(res["mask_png"])))
                self.send_header("X-Pylc-Seconds", str(res["seconds"]))
                self.send_header("X-Pylc-Megapixels",
                                 str(res["megapixels"]))
                self.end_headers()
                self.wfile.write(res["mask_png"])

    return Handler


def build_service(model_path: str, cfg=None, use_crf: bool = False,
                  scale: Optional[float] = None,
                  batch_size: int = 16) -> SegmentationService:
    """Construct the service for a .pylcx artifact or a checkpoint."""
    if model_path.endswith(".pylcx"):
        if use_crf:
            print("serve: --crf ignored for .pylcx artifacts — CRF is "
                  "baked (or not) at export time (pylc.py export --crf)")
        from pylc_tpu.export import ServingModel
        return SegmentationService(
            serving_model=ServingModel.load(model_path),
            scale=scale, model_path=model_path)

    from pylc_tpu.infer import Segmenter
    from pylc_tpu.tester import load_model
    cfg, state, predict = load_model(model_path, cfg)
    crf = None
    if use_crf:
        from pylc_tpu.ops.crf import make_crf
        crf = make_crf(cfg)
    seg = Segmenter(cfg, state, predict, batch_size=batch_size, crf=crf)
    return SegmentationService(segmenter=seg, scale=scale,
                               model_path=model_path)


def serve(service: SegmentationService, host: str = "127.0.0.1",
          port: int = 8917, ready_event: Optional[threading.Event] = None,
          verbose: bool = True) -> ThreadingHTTPServer:
    """Run the HTTP server (blocking).  ``ready_event`` is set once the
    socket is bound — used by tests and wrappers to avoid races."""
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    if ready_event is not None:
        ready_event.set()
    if verbose:
        info = service.info()
        print(f"pylc serve: {info['backend']} backend "
              f"({info['model']}) on http://{host}:{httpd.server_port}"
              f"  — POST /segment, GET /healthz", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return httpd
