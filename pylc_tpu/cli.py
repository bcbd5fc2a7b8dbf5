"""CLI: extract / augment / merge / grayscale / profile / train / test.

Flag-name parity with reference utils/argparse.py:22-337 (same
subcommands and option spellings so existing invocations keep working),
plus the ``profile`` mode the reference README promises but never
registers (docs/DEVIATIONS.md).
"""

from __future__ import annotations

import argparse
import os
import sys

from pylc_tpu.config import Config


def _base(sub):
    sub.add_argument("--schema", type=str, metavar="SCHEMA_PATH",
                     default=None,
                     help="Categorization schema (JSON file, default: "
                          "schema_a.json).")


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="PyLC-TPU",
        description="TPU-native deep-learning land-cover classification.")
    sub = p.add_subparsers(title="Modes", dest="mode", required=True)

    # ------------------------- extract -------------------------------- #
    ex = sub.add_parser("extract", help="Extract tiles from input images.")
    _base(ex)
    ex.add_argument("-i", "--img", type=str, required=True,
                    metavar="IMAGE_PATH")
    ex.add_argument("-m", "--mask", type=str, default=None,
                    metavar="MASKS_PATH")
    ex.add_argument("--ch", type=int, required=True, choices=(1, 3),
                    metavar="N_CHANNELS")
    ex.add_argument("--batch_size", type=int, default=None)
    ex.add_argument("--output", type=str, default=None,
                    help="Output directory for the .h5 database.")
    ex.set_defaults(func=run_extract)

    # ------------------------- augment -------------------------------- #
    au = sub.add_parser("augment", help="Data augmentation for database.")
    _base(au)
    au.add_argument("--db", type=str, required=True, metavar="DATABASE_PATH")
    au.add_argument("--output", type=str, default=None)
    au.set_defaults(func=run_augment)

    # ------------------------- merge ---------------------------------- #
    me = sub.add_parser("merge", help="Combine multiple databases.")
    _base(me)
    me.add_argument("--dbs", type=str, nargs="+", required=True,
                    metavar="DATABASE_PATHS")
    me.add_argument("--output", type=str, default=None)
    me.set_defaults(func=run_merge)

    # ------------------------- grayscale ------------------------------ #
    gs = sub.add_parser("grayscale", help="Convert database to grayscale.")
    _base(gs)
    gs.add_argument("--db", type=str, required=True, metavar="DATABASE_PATH")
    gs.add_argument("--output", type=str, default=None)
    gs.set_defaults(func=run_grayscale)

    # ------------------------- profile -------------------------------- #
    pr = sub.add_parser("profile", help="Print database profile metadata.")
    _base(pr)
    pr.add_argument("--db", type=str, required=True, metavar="DATABASE_PATH")
    pr.set_defaults(func=run_profile)

    # ------------------------- train ---------------------------------- #
    tr = sub.add_parser("train", help="Train model on input database.")
    _base(tr)
    tr.add_argument("--db", type=str, required=True, metavar="DATABASE_PATH")
    tr.add_argument("--arch", type=str, default=None,
                    choices=("deeplab", "unet", "resunet"))
    tr.add_argument("--backbone", type=str, default=None,
                    choices=("resnet", "xception", "mobilenet", "drn"))
    tr.add_argument("--weighted", action="store_true",
                    help="Class-weighted CE loss.")
    tr.add_argument("--ce_weight", type=float, default=None)
    tr.add_argument("--dice_weight", type=float, default=None)
    tr.add_argument("--focal_weight", type=float, default=None)
    tr.add_argument("--optim", type=str, default=None,
                    choices=("adam", "sgd"))
    tr.add_argument("--sched", type=str, default=None,
                    choices=("step_lr", "cyclic_lr", "anneal"))
    tr.add_argument("--normalize", type=str, default=None,
                    choices=("batch", "instance", "layer", "syncbatch"))
    tr.add_argument("--activation", type=str, default=None,
                    choices=("relu", "lrelu", "selu", "gelu"))
    tr.add_argument("--up_mode", type=str, default=None,
                    choices=("upconv", "upsample"))
    tr.add_argument("--lr", type=float, default=None)
    tr.add_argument("--batch_size", type=int, default=None)
    tr.add_argument("--n_epochs", type=int, default=None)
    tr.add_argument("--pretrained", action="store_true")
    tr.add_argument("--n_workers", type=int, default=None)
    tr.add_argument("--report", type=int, default=None)
    tr.add_argument("--resume", action="store_true")
    tr.add_argument("--clip", type=float, default=None)
    tr.add_argument("--head_lr_mult", type=float, default=None,
                    help="LR multiplier for the ASPP+decoder head vs "
                         "the backbone (the reference's unwired "
                         "get_1x/get_10x_lr_params split; try 10).")
    tr.add_argument("--n_devices", type=int, default=None,
                    help="Restrict the device mesh size.")
    tr.add_argument("--multihost", action="store_true",
                    help="Initialize jax.distributed (multi-host DCN) so "
                         "the data axis spans every host's chips.")
    tr.set_defaults(func=run_train)

    # ------------------------- test ----------------------------------- #
    te = sub.add_parser("test", help="Generate segmentation maps.")
    _base(te)
    te.add_argument("-l", "--model", type=str, required=True,
                    metavar="MODEL_PATH")
    te.add_argument("-i", "--img", type=str, required=True,
                    metavar="IMAGE_PATH")
    te.add_argument("-m", "--mask", type=str, default=None,
                    metavar="MASKS_PATH")
    te.add_argument("--scale", type=float, default=None)
    te.add_argument("--save_logits", action="store_true")
    te.add_argument("--aggregate_metrics", action="store_true")
    te.add_argument("--crf", action="store_true",
                    help="Apply dense-CRF mean-field refinement.")
    te.add_argument("--crf_iters", type=int, default=None,
                    help="Mean-field iterations (default 5).")
    te.add_argument("--crf_radius", type=int, default=None,
                    help="Message-passing window radius (default 3).")
    te.add_argument("--crf_downsample", type=int, default=None,
                    help="Message-passing grid subsampling: 1 = full "
                         "resolution, 2 (default) halves it — see "
                         "docs/CRF_TUNING.md for the quality/speed "
                         "frontier.")
    te.add_argument("--crf_w_app", type=float, default=None,
                    help="Appearance (bilateral) kernel weight.")
    te.add_argument("--crf_sigma_app", type=float, default=None,
                    help="Appearance spatial sigma (grid px).")
    te.add_argument("--crf_sigma_color", type=float, default=None,
                    help="Appearance colour sigma (intensity units).")
    te.add_argument("--crf_w_smooth", type=float, default=None,
                    help="Smoothness (Gaussian) kernel weight.")
    te.add_argument("--crf_sigma_smooth", type=float, default=None,
                    help="Smoothness spatial sigma (grid px).")
    te.add_argument("--n_devices", type=int, default=None,
                    help="Restrict the inference mesh size (default: "
                         "all visible chips; 1 = single-chip).")
    te.set_defaults(func=run_test)

    # ------------------------- export --------------------------------- #
    xp = sub.add_parser(
        "export",
        help="Export a hermetic serving artifact (.pylcx): the compiled "
             "tile->forward->stitch program with weights inlined, "
             "loadable without the model zoo (pylc_tpu/export.py).")
    _base(xp)
    xp.add_argument("-l", "--model", type=str, required=True,
                    metavar="MODEL_PATH")
    xp.add_argument("--size", type=str, required=True, metavar="HxW",
                    help="Fitted canvas geometry, e.g. 1024x1536 (must be "
                         "tile multiples; one artifact per geometry).")
    xp.add_argument("--stride", type=int, default=None,
                    help="Tile stride (default tile_size/2, the test "
                         "path's overlap).")
    xp.add_argument("--crf", action="store_true",
                    help="Bake dense-CRF refinement into the program.")
    xp.add_argument("--platforms", type=str, default=None,
                    help="Comma-separated lowering targets (e.g. "
                         "'tpu,cpu'); default: this host's backend.")
    xp.add_argument("-o", "--output", type=str, default=None)
    xp.set_defaults(func=run_export)

    # ------------------------- serve ---------------------------------- #
    sv = sub.add_parser(
        "serve",
        help="Resident HTTP segmentation daemon (pylc_tpu/server.py): "
             "POST /segment with image bytes -> colour mask PNG; "
             "GET /healthz.  Serves a checkpoint (.ckpt/.pth, any "
             "photo geometry) or a hermetic .pylcx artifact (fixed "
             "geometry, no model zoo).")
    _base(sv)
    sv.add_argument("-l", "--model", type=str, required=True,
                    metavar="MODEL_PATH",
                    help=".ckpt / .pth checkpoint or .pylcx artifact")
    sv.add_argument("--host", type=str, default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8917)
    sv.add_argument("--scale", type=float, default=None,
                    help="Pre-fit scale applied to every photo "
                         "(reference --scale semantics).")
    sv.add_argument("--batch_size", type=int, default=16,
                    help="Tile batch per forward (16 is "
                         "measured-optimal, docs/PERF_ROUND5.md).")
    sv.add_argument("--crf", action="store_true",
                    help="Apply dense-CRF refinement (checkpoint "
                         "backend; .pylcx bakes CRF at export).")
    sv.set_defaults(func=run_serve)

    return p


def _cfg_from_args(args) -> Config:
    cfg = Config() if not getattr(args, "schema", None) else \
        Config(schema=args.schema)
    remap = {"optim": "optim_type", "sched": "sched_type",
             "normalize": "norm_type", "activation": "activ_type",
             "resume": "resume_checkpoint"}
    updates = {}
    for k, v in vars(args).items():
        if k in ("func", "mode", "schema") or v is None or v is False:
            continue
        updates[remap.get(k, k)] = v
    return cfg.replace(**updates)


# -------------------------- handlers ---------------------------------- #

def run_extract(args):
    from pylc_tpu.extract import Extractor
    cfg = _cfg_from_args(args)
    print(f"Extracting tiles from:\n\t{args.img}\n\t{args.mask}")
    ex = Extractor(cfg).load(args.img, args.mask)
    ex.extract().coshuffle().profile()
    path = ex.save(args.output)
    print(f"Saved {ex.meta.n_tiles} tiles to {path}")


def run_augment(args):
    from pylc_tpu.augment import Augmentor
    cfg = _cfg_from_args(args)
    print(f"Augmenting database:\n\t{args.db}")
    aug = Augmentor(cfg).load(args.db).optimize()
    om = aug.optim_meta
    print(f"  optimal threshold {om['threshold']:.2f}, rate_coef "
          f"{om['rate_coef']:.0f}, +{om['aug_n_samples']} samples, "
          f"JSD {om['jsd']:.4f}")
    aug.oversample()
    path = aug.save(args.output)
    print(f"Saved augmented DB to {path}")


def run_merge(args):
    from pylc_tpu.augment import merge_dbs
    cfg = _cfg_from_args(args)
    out = args.output or os.path.join(cfg.db_dir, "merged.h5")
    path = merge_dbs(args.dbs, out, cfg)
    print(f"Merged {len(args.dbs)} databases into {path}")


def run_grayscale(args):
    from pylc_tpu.augment import grayscale_db
    cfg = _cfg_from_args(args)
    out = args.output or os.path.splitext(args.db)[0] + "_gs.h5"
    path = grayscale_db(args.db, out, cfg)
    print(f"Grayscaled database saved to {path}")


def run_profile(args):
    from pylc_tpu.db.database import TileDB
    from pylc_tpu.ops.profile import profile_tiles
    cfg = _cfg_from_args(args)
    db = TileDB(args.db)
    meta = db.get_meta(base=cfg)
    prof = profile_tiles(db.iter_chunks(512), meta.n_classes,
                         meta.tile_size)
    meta = meta.replace(**prof)
    print_profile(meta)


def run_train(args):
    if getattr(args, "multihost", False):
        # must run before the first jax device query (SURVEY §5.8 DCN)
        from pylc_tpu.parallel.mesh import init_distributed
        init_distributed()
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # a stale coordinator env var without --multihost would make
        # jax.distributed block on a coordinator that may not exist;
        # require the explicit flag and say why we ignored the env var
        print("JAX_COORDINATOR_ADDRESS is set but --multihost was not "
              "given; running single-host (pass --multihost to "
              "initialize jax.distributed).")
    from pylc_tpu.trainer import train
    cfg = _cfg_from_args(args)
    summary = train(cfg, args.db, n_devices=getattr(args, "n_devices", None))
    print(f"\nTraining done: {summary['steps']} steps, best dice "
          f"{summary['best_dice']:.4f}, {summary['wall_s']:.1f}s")


def run_test(args):
    from pylc_tpu.tester import test
    cfg = _cfg_from_args(args)
    test(cfg, args.model, args.img, mask_path=args.mask, scale=args.scale,
         save_logits=args.save_logits,
         aggregate_metrics=args.aggregate_metrics,
         use_crf=getattr(args, "crf", False),
         n_devices=getattr(args, "n_devices", None))


def run_export(args):
    from pylc_tpu.export import save_artifact
    from pylc_tpu.infer import Segmenter
    from pylc_tpu.tester import load_model
    cfg = _cfg_from_args(args)
    try:
        H, W = (int(v) for v in args.size.lower().split("x"))
    except ValueError:
        raise SystemExit(f"--size must be HxW (got {args.size!r})")
    cfg, state, predict = load_model(args.model, cfg)
    if H % cfg.tile_size or W % cfg.tile_size:
        raise SystemExit(f"--size {H}x{W} must be multiples of the "
                         f"model's tile size ({cfg.tile_size})")
    crf = None
    if getattr(args, "crf", False):
        from pylc_tpu.ops.crf import make_crf
        crf = make_crf(cfg)
    seg = Segmenter(cfg, state, predict, batch_size=16, crf=crf)
    platforms = args.platforms.split(",") if args.platforms else None
    out = args.output or os.path.join(
        cfg.save_dir, f"{cfg.id or 'model'}_{H}x{W}.pylcx")
    header = save_artifact(out, seg, H, W, stride=args.stride,
                           platforms=platforms)
    size_mb = os.path.getsize(out) / 2 ** 20
    print(f"Exported serving artifact: {out} ({size_mb:.1f} MB)\n"
          f"  geometry {H}x{W} ch={header['ch']} stride="
          f"{header['stride']}, platforms {header['platforms']}, "
          f"calling convention v{header['calling_convention']}")


def run_serve(args):
    from pylc_tpu.server import build_service, serve
    cfg = _cfg_from_args(args)
    service = build_service(
        args.model, cfg=cfg, use_crf=getattr(args, "crf", False),
        scale=args.scale, batch_size=args.batch_size)
    serve(service, host=args.host, port=args.port)


def print_profile(meta: Config):
    print(f"\nProfile Metadata\n{'-' * 60}")
    print(f"{'ID':24s}{meta.id}")
    print(f"{'Channels':24s}{meta.ch} ({meta.ch_label})")
    print(f"{'Classes':24s}{meta.n_classes}")
    print(f"{'Samples':24s}{meta.n_samples}")
    print(f"{'Tile size':24s}{meta.tile_size}px")
    print(f"{'Pixel mean':24s}{meta.px_mean}")
    print(f"{'Pixel std':24s}{meta.px_std}")
    print(f"{'M2':24s}{meta.m2:.4f}")
    print(f"{'JSD':24s}{meta.jsd:.4f}")
    print(f"\n{'Class':28s}{'Probs':>10s}{'Weights':>10s}")
    for i, lbl in enumerate(meta.class_labels):
        print(f"{lbl:28s}{meta.probs[i]:>10.4f}{meta.weights[i]:>10.4f}")


def _slow_backend_notice(warn_after_s: float = 90.0):
    """Warn (without aborting) when accelerator-backend init stalls.

    On a tunneled TPU a lost relay grant makes the first jax backend
    touch block indefinitely in a retry loop with no output; a healthy
    tunnel initializes in seconds.  The CLI keeps waiting (unlike
    bench.py's hard watchdog) because a slow-but-alive link should
    still complete — but the user gets told what the silence means.
    Returns a callable that cancels the notice."""
    import threading

    done = threading.Event()

    def warn():
        if not done.wait(warn_after_s):
            print(
                f"[pylc] accelerator backend init has not completed in "
                f"{warn_after_s:.0f}s (JAX_PLATFORMS="
                f"{os.environ.get('JAX_PLATFORMS', 'default')!r}).  If "
                "this never finishes, the device/tunnel is unreachable "
                "— retry, or run on CPU with JAX_PLATFORMS=cpu.",
                file=sys.stderr)

    threading.Thread(target=warn, daemon=True).start()
    return done.set


def main(argv=None):
    parser = get_parser()
    args = parser.parse_args(argv)
    # ensure data dirs exist (reference pylc.py:33-37)
    cfg = Config()
    for d in (cfg.root, cfg.db_dir, cfg.save_dir, cfg.model_dir,
              cfg.output_dir):
        os.makedirs(d, exist_ok=True)
    # every mode touches the device; initialize the backend up front so
    # a stalled tunnel produces a diagnostic instead of silence
    cancel = _slow_backend_notice()
    try:
        import jax
        jax.devices()
    finally:
        cancel()
    # persistent XLA compilation cache: repeat CLI invocations reload
    # their compiled programs in seconds instead of re-paying the
    # ~500 s tunnel compile (docs/PERF_ROUND3.md); CPU runs cache under
    # a per-host-fingerprint subdir (compcache._host_fingerprint)
    from pylc_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache(allow_cpu=True)
    args.func(args)


if __name__ == "__main__":
    main()
