#!/usr/bin/env python3
"""Inspect the TPU-compiled HLO of the int8 PTQ forward vs bf16.

Answers the mechanism question behind the PTQ timing result
(docs/PERF_ROUND5.md §4): does XLA:TPU keep the
``convolution(s8, s8) -> s32`` ops on the MXU's int8 path, or does it
rewrite/upcast them — and how much (de)quantize elementwise work rides
along?  Compiles the same jits scripts/quant_experiment.py measures
(cache-warm after that script has run) and greps the optimized HLO.

Usage: python scripts/quant_hlo_inspect.py
"""

import collections
import re
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def conv_signature_counts(hlo_text: str):
    """{(lhs_dtype, rhs_dtype, out_dtype): count} over convolution ops."""
    sig = collections.Counter()
    for m in re.finditer(
            r"(\w+)\[[\d,]*\][^=]*= convolution\(", hlo_text):
        out_dt = m.group(1)
        line = hlo_text[m.start():hlo_text.index("\n", m.start())]
        args = re.findall(r"(\w+)\[[\d,]*\]\{[^}]*\} %", line)
        sig[(tuple(args[:2]), out_dt)] += 1
    if not sig:  # fallback: count by dtype mention on conv lines
        for line in hlo_text.splitlines():
            if "= convolution(" in line or " convolution(" in line:
                out_dt = line.strip().split("[")[0].split()[-1]
                sig[(("?", "?"), out_dt)] += 1
    return sig


def main():
    from bench import _init_backend_or_die
    _init_backend_or_die()

    import jax
    import jax.numpy as jnp

    import ref_pipeline as rp
    from pylc_tpu.config import Config
    from pylc_tpu.convert import load_pth_model
    from pylc_tpu.models.registry import build_model
    from pylc_tpu.quant import (calibrate_absmax,
                                calibration_batches_from_db,
                                make_predict_int8)
    from pylc_tpu.train_state import make_predict

    ref = rp.run()  # cached
    cfg, state, _ = load_pth_model(ref["model_pth"], Config())
    model_eval = build_model(cfg, train=False)

    calib = calibration_batches_from_db(ref["db"], cfg, n_tiles=16, batch=8)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    scales = calibrate_absmax(model_eval, variables, calib, train=False)

    x = jnp.zeros((16, 512, 512, 3), jnp.float32)
    for name, fn in (("bf16", make_predict(cfg, model_eval)),
                     ("int8", make_predict_int8(cfg, model_eval, scales))):
        compiled = jax.jit(fn).lower(state, x).compile()
        txt = compiled.as_text()
        sigs = conv_signature_counts(txt)
        n_convert = txt.count(" convert(")
        n_round = txt.count(" round-nearest-even(") + txt.count(
            " round_nearest_even")
        print(f"== {name}: {sum(sigs.values())} convolutions, "
              f"{n_convert} converts, {n_round} rounds")
        for (args, out), c in sorted(sigs.items()):
            print(f"   conv {args} -> {out}: {c}")
        # per-dtype fusion count gives a feel for elementwise overhead
        fus = collections.Counter(
            re.findall(r"= (\w+)\[[\d,]*\][^=]*fusion\(", txt))
        print(f"   fusions by out dtype: {dict(fus)}")


if __name__ == "__main__":
    main()
