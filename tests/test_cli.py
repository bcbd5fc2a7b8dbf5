"""CLI parser surface: flag-name parity with the reference
(utils/argparse.py:22-337) and arg->config mapping."""

import pytest

from pylc_tpu.cli import get_parser, _cfg_from_args


def test_all_reference_modes_registered():
    p = get_parser()
    modes = p._subparsers._group_actions[0].choices.keys()
    for m in ("extract", "augment", "merge", "grayscale", "train", "test"):
        assert m in modes
    assert "profile" in modes  # promised by the reference README, missing there


def test_train_flags_map_to_config():
    p = get_parser()
    args = p.parse_args([
        "train", "--db", "x.h5", "--arch", "unet", "--backbone", "xception",
        "--optim", "sgd", "--sched", "cyclic_lr", "--normalize", "syncbatch",
        "--activation", "lrelu", "--lr", "0.01", "--batch_size", "4",
        "--n_epochs", "3", "--weighted", "--resume", "--clip", "0.5",
        "--up_mode", "upconv", "--ce_weight", "0.3",
    ])
    cfg = _cfg_from_args(args)
    assert cfg.arch == "unet"
    assert cfg.backbone == "xception"
    assert cfg.optim_type == "sgd"
    assert cfg.sched_type == "cyclic_lr"
    assert cfg.norm_type == "syncbatch"
    assert cfg.activ_type == "lrelu"
    assert cfg.lr == 0.01
    assert cfg.batch_size == 4
    assert cfg.n_epochs == 3
    assert cfg.weighted is True
    assert cfg.resume_checkpoint is True
    assert cfg.clip == 0.5
    assert cfg.up_mode == "upconv"
    assert cfg.ce_weight == 0.3


def test_syncbatch_spelling_accepted():
    """The reference's 'synbatch' option KeyErrors at model build
    (config.py:219 vs model.py:75) — ours accepts the correct spelling
    and rejects the typo."""
    p = get_parser()
    p.parse_args(["train", "--db", "x", "--normalize", "syncbatch"])
    with pytest.raises(SystemExit):
        p.parse_args(["train", "--db", "x", "--normalize", "synbatch"])


def test_test_mode_flags():
    p = get_parser()
    args = p.parse_args(["test", "-l", "m.ckpt", "-i", "img.jpg",
                         "-m", "mask.png", "--scale", "0.5",
                         "--save_logits", "--aggregate_metrics", "--crf"])
    assert args.model == "m.ckpt"
    assert args.scale == 0.5
    assert args.save_logits and args.aggregate_metrics and args.crf


def test_schema_flag_resolves_bare_name():
    from pylc_tpu.config import Config
    cfg = Config(schema="schema_b")
    assert cfg.n_classes == 11


def test_multihost_flag_parses_and_stays_out_of_config():
    """--multihost triggers jax.distributed init in run_train (SURVEY
    §5.8); it must parse and must not leak into Config fields."""
    from pylc_tpu.cli import _cfg_from_args
    p = get_parser()
    args = p.parse_args(["train", "--db", "x", "--multihost"])
    assert args.multihost is True
    cfg = _cfg_from_args(args)
    assert not hasattr(cfg, "multihost") or cfg.multihost is True
    args2 = p.parse_args(["train", "--db", "x"])
    assert args2.multihost is False


def test_slow_backend_notice_fires_and_cancels(capsys):
    """The CLI's backend-init stall notice must fire when init hangs
    past the threshold and stay silent when init completes first."""
    import time
    from pylc_tpu.cli import _slow_backend_notice

    cancel = _slow_backend_notice(warn_after_s=0.2)
    time.sleep(0.6)
    cancel()
    assert "has not completed" in capsys.readouterr().err

    cancel = _slow_backend_notice(warn_after_s=0.5)
    cancel()
    time.sleep(0.7)
    assert capsys.readouterr().err == ""
