"""torch .pth <-> JAX pytree checkpoint conversion.

Published PyLC artifacts are torch pickles: 9 pretrained DeepLab models
(README "Pretrained Models", Zenodo DOI 10.5281/zenodo.4275008) saved as
{'model': state_dict, 'optim': ..., 'meta': Parameters}
(models/modules/checkpoint.py:53-66), plus the ImageNet
``resnet101-5d3b4d8f.pth`` encoder (models/backbone/resnet.py:149-158).
This module maps those state_dicts onto pylc_tpu's flax parameter trees
(and back) so converted checkpoints produce identical logits:

  - conv kernels:  torch OIHW -> flax HWIO (depthwise: OIHW with I=1 ->
    HWIO with O=multiplier);
  - BatchNorm:     weight/bias -> scale/bias (params) and
    running_mean/var -> mean/var (batch_stats);
  - the reference pickle's ``meta`` (a config.Parameters instance) is
    unpickled against a stub class — reference code is never imported.
"""

from __future__ import annotations

import pickle
import re
import sys
import types
from typing import Any, Dict, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------- #
# safe-ish unpickling of reference checkpoints
# --------------------------------------------------------------------- #

class _StubParameters:
    """Attribute-bag stand-in for the reference's config.Parameters so
    its pickles load without importing reference code."""

    def __setstate__(self, state):
        self.__dict__.update(state)


def load_reference_pth(path: str) -> Dict[str, Any]:
    """torch.load a reference .pth with config.Parameters stubbed out.

    Returns the raw dict (state_dict tensors stay torch CPU tensors).
    """
    import torch

    stub = types.ModuleType("config")
    stub.Parameters = _StubParameters
    had = sys.modules.get("config")
    sys.modules["config"] = stub
    try:
        data = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        if had is not None:
            sys.modules["config"] = had
        else:
            del sys.modules["config"]
    return data


def _t2n(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy())


def _conv_kernel(t, depthwise: bool = False) -> np.ndarray:
    """torch conv weight -> flax kernel: OIHW -> HWIO.

    The same transpose also covers depthwise weights: torch groups=C
    stores [C, 1, H, W], and (2, 3, 1, 0) yields [H, W, 1, C] — exactly
    flax's feature_group_count kernel layout.  The ``depthwise`` flag
    is kept for call-site readability only."""
    del depthwise  # same transpose either way (see docstring)
    return _t2n(t).transpose(2, 3, 1, 0)


# --------------------------------------------------------------------- #
# state_dict -> nested tree assembly
# --------------------------------------------------------------------- #

def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = value


def _put_bn(params: Dict, stats: Dict, flax_path: Tuple[str, ...],
            sd: Dict, torch_prefix: str):
    _set(params, flax_path + ("scale",), _t2n(sd[torch_prefix + ".weight"]))
    _set(params, flax_path + ("bias",), _t2n(sd[torch_prefix + ".bias"]))
    _set(stats, flax_path + ("mean",),
         _t2n(sd[torch_prefix + ".running_mean"]))
    _set(stats, flax_path + ("var",),
         _t2n(sd[torch_prefix + ".running_var"]))


def _put_conv(params: Dict, flax_path: Tuple[str, ...], sd: Dict,
              torch_prefix: str, depthwise: bool = False):
    _set(params, flax_path + ("kernel",),
         _conv_kernel(sd[torch_prefix + ".weight"], depthwise))
    if torch_prefix + ".bias" in sd:
        _set(params, flax_path + ("bias",), _t2n(sd[torch_prefix + ".bias"]))


def convert_resnet_backbone(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference ResNet101 state_dict (models/backbone/resnet.py naming)
    -> (params, batch_stats) subtrees for pylc_tpu ResNet101."""
    p: Dict = {}
    s: Dict = {}
    _put_conv(p, ("conv1",), sd, prefix + "conv1")
    _put_bn(p, s, ("bn1",), sd, prefix + "bn1")

    # layers: torch 'layerL.<i>.convK/bnK(+downsample.0/1)'
    pat = re.compile(re.escape(prefix) + r"layer(\d)\.(\d+)\.")
    blocks = sorted({(int(m.group(1)), int(m.group(2)))
                     for k in sd for m in [pat.match(k)] if m})
    for L, i in blocks:
        tp = f"{prefix}layer{L}.{i}."
        fp = f"layer{L}_{i}"
        for k in (1, 2, 3):
            _put_conv(p, (fp, f"conv{k}"), sd, tp + f"conv{k}")
            _put_bn(p, s, (fp, f"bn{k}"), sd, tp + f"bn{k}")
        if tp + "downsample.0.weight" in sd:
            _put_conv(p, (fp, "downsample_conv"), sd, tp + "downsample.0")
            _put_bn(p, s, (fp, "downsample_bn"), sd, tp + "downsample.1")
    return p, s


def convert_xception_backbone(sd: Dict, prefix: str = "",
                              strict: bool = True) -> Tuple[Dict, Dict]:
    """Reference AlignedXception state_dict -> pylc_tpu subtrees.

    ``strict=False`` skips missing source keys (partial zoo-format
    checkpoints expanded by ``expand_zoo_xception_state_dict`` lack the
    aligned variant's separable-internal BNs and conv4)."""
    p: Dict = {}
    s: Dict = {}

    def put_conv(*args, **kw):
        try:
            _put_conv(*args, **kw)
        except KeyError:
            if strict:
                raise

    def put_bn(*args, **kw):
        try:
            _put_bn(*args, **kw)
        except KeyError:
            if strict:
                raise

    def put_separable(pp, ss, flax_path, sdd, torch_prefix):
        put_conv(pp, flax_path + ("depthwise",), sdd,
                 torch_prefix + ".conv1", depthwise=True)
        put_bn(pp, ss, flax_path + ("bn",), sdd, torch_prefix + ".bn")
        put_conv(pp, flax_path + ("pointwise",), sdd,
                 torch_prefix + ".pointwise")

    put_conv(p, ("conv1",), sd, prefix + "conv1")
    put_bn(p, s, ("bn1",), sd, prefix + "bn1")
    put_conv(p, ("conv2",), sd, prefix + "conv2")
    put_bn(p, s, ("bn2",), sd, prefix + "bn2")

    # blocks 1..20: walk 'blockN.rep.<i>' modules in index order; each
    # index is either a SeparableConv2d ('.pointwise.' keys) or a BN.
    for n in range(1, 21):
        bp = f"{prefix}block{n}."
        idxs = sorted({int(m.group(1))
                       for k in sd if k.startswith(bp + "rep.")
                       for m in [re.match(re.escape(bp) + r"rep\.(\d+)\.", k)]
                       if m})
        sep_i = 0
        bn_i = 0
        for i in idxs:
            tp = f"{bp}rep.{i}"
            if tp + ".pointwise.weight" in sd:
                put_separable(p, s, (f"block{n}", f"sep{sep_i}"), sd, tp)
                sep_i += 1
            elif tp + ".running_mean" in sd:
                put_bn(p, s, (f"block{n}", f"sepbn{bn_i}"), sd, tp)
                bn_i += 1
        if bp + "skip.weight" in sd:
            put_conv(p, (f"block{n}", "skip"), sd, bp + "skip")
            put_bn(p, s, (f"block{n}", "skipbn"), sd, bp + "skipbn")

    for i in (3, 4, 5):
        put_separable(p, s, (f"conv{i}",), sd, f"{prefix}conv{i}")
        put_bn(p, s, (f"bn{i}",), sd, f"{prefix}bn{i}")
    return p, s


def convert_mobilenet_backbone(sd: Dict, prefix: str = ""
                               ) -> Tuple[Dict, Dict]:
    """Reference MobileNetV2 state_dict (models/backbone/mobilenet.py
    naming: ``features.<i>.conv.<j>``) -> pylc_tpu MobileNetV2 subtrees.

    features[0] is the stem conv_bn; block i>=1 layouts differ by
    expand ratio — expand==1 (block 1 only): [dw conv, bn, relu6,
    pw conv, bn]; else: [pw, bn, relu6, dw, bn, relu6, pw, bn]
    (reference mobilenet.py:43-66)."""
    p: Dict = {}
    s: Dict = {}
    _put_conv(p, ("stem_conv",), sd, prefix + "features.0.0")
    _put_bn(p, s, ("stem_bn",), sd, prefix + "features.0.1")
    pat = re.compile(re.escape(prefix) + r"features\.(\d+)\.conv\.")
    blocks = sorted({int(m.group(1))
                     for k in sd for m in [pat.match(k)] if m})
    for i in blocks:
        tp = f"{prefix}features.{i}.conv."
        fp = f"block{i}"
        if tp + "6.weight" in sd:  # expanded block
            _put_conv(p, (fp, "expand_conv"), sd, tp + "0")
            _put_bn(p, s, (fp, "expand_bn"), sd, tp + "1")
            _put_conv(p, (fp, "dw_conv"), sd, tp + "3", depthwise=True)
            _put_bn(p, s, (fp, "dw_bn"), sd, tp + "4")
            _put_conv(p, (fp, "project_conv"), sd, tp + "6")
            _put_bn(p, s, (fp, "project_bn"), sd, tp + "7")
        else:  # expand==1: no pointwise-expand stage
            _put_conv(p, (fp, "dw_conv"), sd, tp + "0", depthwise=True)
            _put_bn(p, s, (fp, "dw_bn"), sd, tp + "1")
            _put_conv(p, (fp, "project_conv"), sd, tp + "3")
            _put_bn(p, s, (fp, "project_bn"), sd, tp + "4")
    return p, s


def convert_drn_backbone(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference DRN-D-54 state_dict (models/backbone/drn.py arch-D
    naming) -> pylc_tpu DRN54 subtrees.

    layer0 is conv_bn ('layer0.0'/'layer0.1'); layer1/2/7/8 are plain
    conv stages ('layerN.<3j>' conv / '<3j+1>' bn per conv-bn-relu
    triple); layer3..6 are bottleneck stages with the ResNet key
    shape ('layerN.<i>.convK/bnK' + 'downsample.0/1')."""
    p: Dict = {}
    s: Dict = {}
    _put_conv(p, ("layer0_conv",), sd, prefix + "layer0.0")
    _put_bn(p, s, ("layer0_bn",), sd, prefix + "layer0.1")
    for L in (1, 2, 7, 8):
        j = 0
        while f"{prefix}layer{L}.{3 * j}.weight" in sd:
            _put_conv(p, (f"layer{L}", f"conv{j}"), sd,
                      f"{prefix}layer{L}.{3 * j}")
            _put_bn(p, s, (f"layer{L}", f"bn{j}"), sd,
                    f"{prefix}layer{L}.{3 * j + 1}")
            j += 1
    pat = re.compile(re.escape(prefix) + r"layer([3-6])\.(\d+)\.")
    blocks = sorted({(int(m.group(1)), int(m.group(2)))
                     for k in sd for m in [pat.match(k)] if m})
    for L, i in blocks:
        tp = f"{prefix}layer{L}.{i}."
        fp = f"layer{L}_{i}"
        for k in (1, 2, 3):
            _put_conv(p, (fp, f"conv{k}"), sd, tp + f"conv{k}")
            _put_bn(p, s, (fp, f"bn{k}"), sd, tp + f"bn{k}")
        if tp + "downsample.0.weight" in sd:
            _put_conv(p, (fp, "downsample_conv"), sd, tp + "downsample.0")
            _put_bn(p, s, (fp, "downsample_bn"), sd, tp + "downsample.1")
    return p, s


def convert_deeplab_state_dict(sd: Dict, backbone: str = "resnet"
                               ) -> Tuple[Dict, Dict]:
    """Full reference DeepLab state_dict -> (params, batch_stats) trees
    matching pylc_tpu.models.deeplab.DeepLab's flax naming."""
    params: Dict = {}
    stats: Dict = {}

    if backbone == "resnet":
        bb_p, bb_s = convert_resnet_backbone(sd, "backbone.")
    else:
        bb_p, bb_s = convert_xception_backbone(sd, "backbone.")
    params["backbone"] = bb_p
    stats["backbone"] = bb_s

    ap: Dict = {}
    as_: Dict = {}
    for i in (1, 2, 3, 4):
        _put_conv(ap, (f"aspp{i}", "conv"), sd, f"aspp.aspp{i}.atrous_conv")
        _put_bn(ap, as_, (f"aspp{i}", "bn"), sd, f"aspp.aspp{i}.bn")
    _put_conv(ap, ("gap_conv",), sd, "aspp.global_avg_pool.1")
    _put_bn(ap, as_, ("gap_bn",), sd, "aspp.global_avg_pool.2")
    _put_conv(ap, ("proj",), sd, "aspp.conv1")
    _put_bn(ap, as_, ("proj_bn",), sd, "aspp.bn1")
    params["aspp"] = ap
    stats["aspp"] = as_

    dp: Dict = {}
    ds: Dict = {}
    _put_conv(dp, ("ll_conv",), sd, "decoder.conv1")
    _put_bn(dp, ds, ("ll_bn",), sd, "decoder.bn1")
    _put_conv(dp, ("conv1",), sd, "decoder.last_conv.0")
    _put_bn(dp, ds, ("bn1",), sd, "decoder.last_conv.1")
    _put_conv(dp, ("conv2",), sd, "decoder.last_conv.4")
    _put_bn(dp, ds, ("bn2",), sd, "decoder.last_conv.5")
    _put_conv(dp, ("head",), sd, "decoder.last_conv.8")
    params["decoder"] = dp
    stats["decoder"] = ds
    return params, stats


# --------------------------------------------------------------------- #
# high-level loaders
# --------------------------------------------------------------------- #

def load_pth_model(model_path: str, base_cfg=None):
    """Load a published pylc .pth DeepLab model -> (cfg, state, predict).

    The checkpoint's pickled meta rehydrates the config (arch, ch,
    schema palette, normalization stats) exactly as the reference does
    at models/model.py:100-115."""
    import jax

    from pylc_tpu.config import Config
    from pylc_tpu.train_state import init_state, make_predict
    from pylc_tpu.models.registry import build_model

    data = load_reference_pth(model_path)
    assert "model" in data, "Loaded model missing 'model' state_dict."
    meta_obj = data.get("meta")
    meta = dict(meta_obj.__dict__) if hasattr(meta_obj, "__dict__") else \
        (meta_obj or {})
    cfg = Config.from_meta(meta, base=base_cfg)
    if cfg.arch != "deeplab":
        raise NotImplementedError(
            f".pth conversion implemented for deeplab (got {cfg.arch}); "
            "the reference cannot construct UNet/ResUNet checkpoints "
            "(see docs/DEVIATIONS.md F1/F2).")

    sd = data["model"]
    params, stats = convert_deeplab_state_dict(sd, cfg.backbone)

    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    state = _graft(state, params, stats)
    model_eval = build_model(cfg, train=False)
    return cfg, state, make_predict(cfg, model_eval)


def load_resnet101_imagenet(pth_path: str, state):
    """Overlay ImageNet resnet101 weights onto a DeepLab state's backbone
    (key-filtered like reference models/backbone/resnet.py:149-158)."""
    data = load_reference_pth(pth_path)
    if isinstance(data, dict):
        sd = data if "conv1.weight" in data else data.get("state_dict", data)
    else:
        raise ValueError(
            f"{pth_path}: expected a state_dict pickle, got "
            f"{type(data).__name__} — not an ImageNet resnet101 checkpoint.")
    # drop the fc head; keep conv/bn keys that exist in our tree
    sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}
    params, stats = convert_resnet_backbone(sd, "")
    return _graft_subtree(state, ("backbone",), params, stats)


def expand_zoo_xception_state_dict(sd: Dict) -> Dict:
    """Model-zoo ``xception-b5690688`` keys -> AlignedXception keys.

    This is the block-replication mapping the reference INTENDS at
    models/backbone/xception.py:258-283 (zoo middle block11 replicated
    into aligned blocks 11-19, block12 -> exit block20, bn3 doubled into
    bn4, conv4/bn4 -> conv5/bn5, 2-d pointwise weights unsqueezed to
    [O,I,1,1]).  As written the reference loop tests ``k in model_dict``
    against an *empty* dict, so it silently loads nothing — documented
    as DEVIATIONS F13; here the intended semantics are implemented.
    """
    import torch

    out: Dict = {}
    for k, v in sd.items():
        if k.startswith("fc."):
            continue
        if "pointwise" in k and v.ndim == 2:
            v = v.unsqueeze(-1).unsqueeze(-1)
        if k.startswith("block11"):
            out[k] = v
            for n in range(12, 20):
                out[k.replace("block11", f"block{n}")] = v
        elif k.startswith("block12"):
            out[k.replace("block12", "block20")] = v
        elif k.startswith("bn3"):
            out[k] = v
            out[k.replace("bn3", "bn4")] = v
        elif k.startswith("conv4"):
            out[k.replace("conv4", "conv5")] = v
        elif k.startswith("bn4"):
            out[k.replace("bn4", "bn5")] = v
        else:
            out[k] = v
    return out


def load_xception_imagenet(pth_path: str, state, verbose: bool = False):
    """Overlay ImageNet AlignedXception weights onto a DeepLab state's
    backbone from a zoo-format ``xception-b5690688.pth``.

    The zoo checkpoint covers only part of the aligned architecture
    (its SeparableConv2d has no internal BN; aligned conv4 has no zoo
    source), so the overlay is partial: present, shape-compatible
    leaves are grafted; the rest keep their fresh init.  Raises if
    nothing at all maps (a wrong file should fail loudly, not train
    from scratch silently)."""
    data = load_reference_pth(pth_path)
    if isinstance(data, dict):
        sd = data if "conv1.weight" in data else data.get("state_dict", data)
    else:
        sd = {}  # pickled nn.Module etc. -> the loud no-keys-mapped error
    sd = expand_zoo_xception_state_dict(sd)
    params, stats = convert_xception_backbone(sd, "", strict=False)

    # drop leaves whose shapes disagree with the target tree (zoo entry
    # flow differs from the aligned variant in a few places)
    import jax

    def prune(src: Dict, dst, path=""):
        kept = 0
        for k in list(src.keys()):
            v = src[k]
            if isinstance(v, dict):
                if k not in dst:
                    del src[k]
                    continue
                kept += prune(v, dst[k], f"{path}/{k}")
                if not v:
                    del src[k]
            else:
                if k not in dst or tuple(dst[k].shape) != tuple(v.shape):
                    if verbose:
                        print(f"  skip {path}/{k} (shape "
                              f"{getattr(v, 'shape', None)})")
                    del src[k]
                else:
                    kept += 1
        return kept

    tgt_p = _unfreeze(jax.device_get(state.params))["backbone"]
    tgt_s = _unfreeze(jax.device_get(state.batch_stats))["backbone"]
    n_p = prune(params, tgt_p)
    n_s = prune(stats, tgt_s)
    if n_p == 0:
        raise ValueError(
            f"{pth_path}: no xception backbone weights mapped — not a "
            "zoo xception state_dict?")
    if verbose:
        print(f"  xception pretrained: {n_p} param + {n_s} stat leaves")
    return _graft_subtree(state, ("backbone",), params, stats)


def load_mobilenet_imagenet(pth_path: str, state):
    """Overlay ImageNet MobileNetV2 weights onto a DeepLab state's
    backbone.

    The reference loads ``mobilenet_v2-6a65762b.pth`` key-filtered into
    its backbone (models/backbone/mobilenet.py:130-138); that checkpoint
    uses the same ``features.<i>.conv.<j>`` naming the converter scans,
    and any ``classifier.*`` head keys fall outside the scan."""
    data = load_reference_pth(pth_path)
    sd = data.get("state_dict", data) if isinstance(data, dict) else {}
    try:
        params, stats = convert_mobilenet_backbone(sd)
    except KeyError as e:
        raise ValueError(
            f"{pth_path}: missing key {e} — not a MobileNetV2 "
            "state_dict?") from None
    return _graft_subtree(state, ("backbone",), params, stats)


def load_drn_imagenet(pth_path: str, state):
    """Overlay ImageNet DRN-D-54 weights onto a DeepLab state's
    backbone.

    The reference loads ``drn_d_54-*.pth`` with the ``fc.*`` head keys
    deleted (models/backbone/drn.py:355-361); the converter's
    ``layer*`` scan ignores them anyway."""
    data = load_reference_pth(pth_path)
    sd = data.get("state_dict", data) if isinstance(data, dict) else {}
    try:
        params, stats = convert_drn_backbone(sd)
    except KeyError as e:
        raise ValueError(
            f"{pth_path}: missing key {e} — not a DRN-D state_dict?"
        ) from None
    return _graft_subtree(state, ("backbone",), params, stats)


def _merge(dst: Dict, src: Dict, path=""):
    """Recursively overlay src onto dst, checking shapes."""
    for k, v in src.items():
        if isinstance(v, dict):
            if k not in dst:
                raise KeyError(f"Unknown module '{path}/{k}' in conversion.")
            _merge(dst[k], v, f"{path}/{k}")
        else:
            if k not in dst:
                raise KeyError(f"Unknown param '{path}/{k}'.")
            if tuple(dst[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"Shape mismatch at {path}/{k}: "
                    f"{dst[k].shape} vs {v.shape}")
            dst[k] = v.astype(np.asarray(dst[k]).dtype)


def _graft(state, params: Dict, stats: Dict):
    import jax
    p = jax.tree_util.tree_map(np.asarray, jax.device_get(
        jax.tree_util.tree_map(lambda x: x, state.params)))
    s = jax.device_get(state.batch_stats)
    p = _unfreeze(p)
    s = _unfreeze(s)
    _merge(p, params)
    _merge(s, stats)
    return state.replace(params=p, batch_stats=s)


def _graft_subtree(state, path: Tuple[str, ...], params: Dict, stats: Dict):
    import jax
    p = _unfreeze(jax.device_get(state.params))
    s = _unfreeze(jax.device_get(state.batch_stats))
    dp = p
    ds = s
    for key in path:
        dp = dp[key]
        ds = ds[key]
    _merge(dp, params)
    _merge(ds, stats)
    return state.replace(params=p, batch_stats=s)


def _unfreeze(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _unfreeze(v) for k, v in tree.items()}
    return tree


# --------------------------------------------------------------------- #
# export (jax -> .pth)
# --------------------------------------------------------------------- #

def export_deeplab_pth(state, cfg, out_path: str,
                       backbone: Optional[str] = None):
    """Write a reference-schema .pth ({'model': state_dict, 'meta': dict})
    from a pylc_tpu DeepLab state, inverting the conversion maps
    (reference checkpoint schema: models/modules/checkpoint.py:53-66).
    Covers both backbones; round-trip tested in tests/test_convert.py."""
    import torch

    backbone = backbone or getattr(cfg, "backbone", "resnet")
    params = _unfreeze(_to_np(state.params))
    stats = _unfreeze(_to_np(state.batch_stats))
    sd: Dict[str, Any] = {}

    def put_conv(torch_key, arr):
        # HWIO -> OIHW; the same transpose covers depthwise kernels
        # (see _conv_kernel)
        sd[torch_key + ".weight"] = torch.tensor(arr.transpose(3, 2, 0, 1))

    def put_bias(torch_key, arr):
        sd[torch_key + ".bias"] = torch.tensor(arr)

    def put_bn(torch_key, p_sub, s_sub):
        sd[torch_key + ".weight"] = torch.tensor(p_sub["scale"])
        sd[torch_key + ".bias"] = torch.tensor(p_sub["bias"])
        sd[torch_key + ".running_mean"] = torch.tensor(s_sub["mean"])
        sd[torch_key + ".running_var"] = torch.tensor(s_sub["var"])

    bp, bs = params["backbone"], stats["backbone"]
    if backbone == "resnet":
        put_conv("backbone.conv1", bp["conv1"]["kernel"])
        put_bn("backbone.bn1", bp["bn1"], bs["bn1"])
        for name in sorted(k for k in bp if k.startswith("layer")):
            L, i = name.replace("layer", "").split("_")
            tp = f"backbone.layer{L}.{i}"
            for k in (1, 2, 3):
                put_conv(f"{tp}.conv{k}", bp[name][f"conv{k}"]["kernel"])
                put_bn(f"{tp}.bn{k}", bp[name][f"bn{k}"], bs[name][f"bn{k}"])
            if "downsample_conv" in bp[name]:
                put_conv(f"{tp}.downsample.0",
                         bp[name]["downsample_conv"]["kernel"])
                put_bn(f"{tp}.downsample.1", bp[name]["downsample_bn"],
                       bs[name]["downsample_bn"])
    elif backbone == "xception":
        _export_xception_backbone(sd, bp, bs, put_conv, put_bn)
    else:
        # mobilenet/drn: the reference cannot construct these models
        # (models/architectures/deeplab.py:23-26 wires only resnet and
        # xception), so there is no reference .pth schema to target.
        raise ValueError(
            f"no reference .pth schema exists for backbone '{backbone}' "
            "(the reference only builds resnet/xception DeepLab models)")

    ap, as_ = params["aspp"], stats["aspp"]
    for i in (1, 2, 3, 4):
        put_conv(f"aspp.aspp{i}.atrous_conv", ap[f"aspp{i}"]["conv"]["kernel"])
        put_bn(f"aspp.aspp{i}.bn", ap[f"aspp{i}"]["bn"], as_[f"aspp{i}"]["bn"])
    put_conv("aspp.global_avg_pool.1", ap["gap_conv"]["kernel"])
    put_bn("aspp.global_avg_pool.2", ap["gap_bn"], as_["gap_bn"])
    put_conv("aspp.conv1", ap["proj"]["kernel"])
    put_bn("aspp.bn1", ap["proj_bn"], as_["proj_bn"])

    dp, ds = params["decoder"], stats["decoder"]
    put_conv("decoder.conv1", dp["ll_conv"]["kernel"])
    put_bn("decoder.bn1", dp["ll_bn"], ds["ll_bn"])
    put_conv("decoder.last_conv.0", dp["conv1"]["kernel"])
    put_bn("decoder.last_conv.1", dp["bn1"], ds["bn1"])
    put_conv("decoder.last_conv.4", dp["conv2"]["kernel"])
    put_bn("decoder.last_conv.5", dp["bn2"], ds["bn2"])
    put_conv("decoder.last_conv.8", dp["head"]["kernel"])
    put_bias("decoder.last_conv.8", dp["head"]["bias"])

    meta = cfg.to_meta()
    # Sanitize training-pipeline fields that poison the reference's
    # INFERENCE path when replayed from the checkpoint meta: the
    # reference scales every dataset — including the test-photo tile
    # stream — by meta.clip (db/database.py:71 `int(clip * len)`), so a
    # model trained with clip<1 makes its own `pylc.py test` drop
    # (1-clip) of the tiles and crash in reconstruct
    # (utils/tools.py:261 IndexError).  Found by
    # tests/test_pth_interchange.py; recorded as F15 in docs/PARITY.md.
    # An exported inference artifact must never clip the tile stream.
    meta["clip"] = 1.0
    torch.save({"model": sd, "meta": meta}, out_path)
    return out_path


def _export_xception_backbone(sd: Dict, bp: Dict, bs: Dict,
                              put_conv, put_bn):
    """Inverse of convert_xception_backbone: flax AlignedXception
    subtrees -> reference state_dict keys.

    The reference Block builds its ``rep`` Sequential as repeated
    [ReLU, SeparableConv2d, BatchNorm] units, dropping the leading ReLU
    when start_with_relu=False (models/backbone/xception.py:42-89), so
    separable j sits at rep index 3j (blocks 1-2) or 3j+1 (blocks 3-20),
    and its trailing BN one index later.  Every aligned block has
    exactly 3 units."""
    def put_separable(torch_prefix, p_sub, s_sub):
        put_conv(torch_prefix + ".conv1", p_sub["depthwise"]["kernel"])
        put_bn(torch_prefix + ".bn", p_sub["bn"], s_sub["bn"])
        put_conv(torch_prefix + ".pointwise", p_sub["pointwise"]["kernel"])

    put_conv("backbone.conv1", bp["conv1"]["kernel"])
    put_bn("backbone.bn1", bp["bn1"], bs["bn1"])
    put_conv("backbone.conv2", bp["conv2"]["kernel"])
    put_bn("backbone.bn2", bp["bn2"], bs["bn2"])

    for n in range(1, 21):
        blk_p, blk_s = bp[f"block{n}"], bs[f"block{n}"]
        base = 0 if n <= 2 else 1  # start_with_relu=False strips rep.0
        j = 0
        while f"sep{j}" in blk_p:
            i = 3 * j + base
            put_separable(f"backbone.block{n}.rep.{i}",
                          blk_p[f"sep{j}"], blk_s[f"sep{j}"])
            put_bn(f"backbone.block{n}.rep.{i + 1}",
                   blk_p[f"sepbn{j}"], blk_s[f"sepbn{j}"])
            j += 1
        if "skip" in blk_p:
            put_conv(f"backbone.block{n}.skip", blk_p["skip"]["kernel"])
            put_bn(f"backbone.block{n}.skipbn", blk_p["skipbn"],
                   blk_s["skipbn"])

    for i in (3, 4, 5):
        put_separable(f"backbone.conv{i}", bp[f"conv{i}"], bs[f"conv{i}"])
        put_bn(f"backbone.bn{i}", bp[f"bn{i}"], bs[f"bn{i}"])


def _to_np(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
