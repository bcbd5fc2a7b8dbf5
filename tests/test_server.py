"""HTTP serving daemon (`pylc.py serve`, pylc_tpu/server.py).

The reference has no serving surface (its inference is the one-shot
batch CLI, reference test.py:23-115); this is net-new TPU-serving
tooling.  The presenter (SegmentationService) is exercised directly
and through a real ThreadingHTTPServer on a loopback socket.
"""

import base64
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import cv2
import numpy as np
import pytest

from pylc_tpu.config import Config
from pylc_tpu.infer import Segmenter
from pylc_tpu.models.registry import build_model
from pylc_tpu.server import (SegmentationService, ServiceError,
                             build_service, make_handler)
from pylc_tpu.train_state import init_state, make_predict

TILE = 64


@pytest.fixture(scope="module")
def tiny_seg():
    import jax
    cfg = Config().replace(arch="unet", ch=3, tile_size=TILE,
                           input_size=TILE, output_size=24,
                           unet_depth=3, unet_wf=3, dropout=0.0,
                           compute_dtype="float32", id="tiny-serve")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    predict = make_predict(cfg, build_model(cfg, train=False))
    return cfg, Segmenter(cfg, state, predict, batch_size=2)


def _photo_bytes(rng, h=128, w=192, ext=".png"):
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    ok, buf = cv2.imencode(ext, img)
    assert ok
    return buf.tobytes()


# --------------------------------------------------------------------- #
# presenter (no HTTP)
# --------------------------------------------------------------------- #

def test_service_segments_bytes(tiny_seg, rng):
    cfg, seg = tiny_seg
    svc = SegmentationService(segmenter=seg, model_path="m.ckpt")
    res = svc.segment_bytes(_photo_bytes(rng), suffix=".png")
    mask = cv2.imdecode(np.frombuffer(res["mask_png"], np.uint8),
                        cv2.IMREAD_COLOR)
    assert mask.shape == (128, 192, 3)
    # every mask colour is an exact schema palette entry (BGR here)
    pal = {tuple(c[::-1]) for c in cfg.palette_rgb}
    seen = {tuple(px) for px in mask.reshape(-1, 3)[::37]}
    assert seen <= pal
    assert res["megapixels"] == pytest.approx(128 * 192 / 1e6)
    assert res["geometry"]["w_fitted"] == 192
    assert svc.n_served == 1


def test_service_rejects_garbage(tiny_seg):
    _, seg = tiny_seg
    svc = SegmentationService(segmenter=seg)
    with pytest.raises(ServiceError):
        svc.segment_bytes(b"")
    with pytest.raises(ServiceError):
        svc.segment_bytes(b"not an image at all", suffix=".png")


def test_service_requires_exactly_one_backend(tiny_seg):
    _, seg = tiny_seg
    with pytest.raises(ValueError):
        SegmentationService()
    with pytest.raises(ValueError):
        SegmentationService(segmenter=seg, serving_model=object())


def test_artifact_backend_geometry_contract(tiny_seg, rng, tmp_path):
    from pylc_tpu.export import save_artifact
    cfg, seg = tiny_seg
    path = str(tmp_path / "tiny.pylcx")
    save_artifact(path, seg, 128, 192)

    svc = build_service(path)
    assert svc.info()["backend"] == "pylcx"
    assert svc.info()["geometry"] == {
        "h": 128, "w": 192, "ch": 3,
        "tile_size": TILE, "stride": TILE // 2}

    res = svc.segment_bytes(_photo_bytes(rng), suffix=".png")
    mask = cv2.imdecode(np.frombuffer(res["mask_png"], np.uint8),
                        cv2.IMREAD_COLOR)
    assert mask.shape == (128, 192, 3)

    # photo fitting to a different canvas -> explicit 400-class error
    with pytest.raises(ServiceError, match="fixed 128x192"):
        svc.segment_bytes(_photo_bytes(rng, h=256, w=256), suffix=".png")


def test_artifact_matches_checkpoint_backend(tiny_seg, rng, tmp_path):
    """Both backends produce the identical mask for the same photo."""
    from pylc_tpu.export import save_artifact
    cfg, seg = tiny_seg
    path = str(tmp_path / "tiny.pylcx")
    save_artifact(path, seg, 128, 192)
    photo = _photo_bytes(rng)
    m_ckpt = SegmentationService(segmenter=seg).segment_bytes(
        photo, suffix=".png")["mask_png"]
    m_art = build_service(path).segment_bytes(
        photo, suffix=".png")["mask_png"]
    assert m_ckpt == m_art


# --------------------------------------------------------------------- #
# HTTP layer (real loopback server)
# --------------------------------------------------------------------- #

@pytest.fixture()
def http_server(tiny_seg):
    _, seg = tiny_seg
    svc = SegmentationService(segmenter=seg, model_path="m.ckpt")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}", svc
    httpd.shutdown()
    httpd.server_close()
    t.join(timeout=5)


def test_http_healthz(http_server):
    url, _svc = http_server
    with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["backend"] == "checkpoint"
    assert info["arch"] == "unet"
    assert info["n_classes"] == 9


def test_http_segment_png(http_server, rng):
    url, svc = http_server
    req = urllib.request.Request(f"{url}/segment",
                                 data=_photo_bytes(rng),
                                 headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "image/png"
        assert float(r.headers["X-Pylc-Seconds"]) > 0
        mask = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                            cv2.IMREAD_COLOR)
    assert mask.shape == (128, 192, 3)
    assert svc.n_served == 1


def test_http_segment_json(http_server, rng):
    url, _svc = http_server
    req = urllib.request.Request(
        f"{url}/segment?format=json", data=_photo_bytes(rng),
        headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    assert set(out) >= {"mask_png_base64", "seconds", "megapixels",
                        "geometry"}
    mask = cv2.imdecode(
        np.frombuffer(base64.b64decode(out["mask_png_base64"]), np.uint8),
        cv2.IMREAD_COLOR)
    assert mask.shape == (128, 192, 3)


def test_http_errors(http_server):
    url, _svc = http_server
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            urllib.request.Request(f"{url}/segment", data=b"junk"),
            timeout=30)
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{url}/nope", timeout=30)
    assert e.value.code == 404


def test_cli_registers_serve(tmp_path):
    """`pylc.py serve` parses and dispatches to run_serve."""
    from pylc_tpu.cli import get_parser
    args = get_parser().parse_args(
        ["serve", "-l", "m.ckpt", "--port", "0", "--crf"])
    assert args.func.__name__ == "run_serve"
    assert args.port == 0 and args.crf and args.model == "m.ckpt"
