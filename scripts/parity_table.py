"""Generate the docs/PARITY.md results table from the differential
parity experiments (VERDICT r4 item 3 / missing #2).

Mirrors tests/test_full_pipeline_parity.py exactly — cached reference
legs (scripts/ref_pipeline.py, /tmp/pylc_ref_run/DONE*.json) vs our
pipeline on the same trained `.pth` — but RECORDS the numbers instead
of only asserting thresholds: per-image pixel agreement, differing
pixel count, and each evaluator's weighted F1 / IoU on its own mask.

Usage:  python scripts/parity_table.py [ch3 ch1 fit]
Prints a markdown table (stdout) + writes /tmp/parity_table.json.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from pylc_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache(allow_cpu=True)


def run_experiment(name: str) -> list[dict]:
    import cv2

    import ref_pipeline as rp
    from pylc_tpu.config import Config
    from pylc_tpu.tester import test

    ref = {"ch3": rp.run, "ch1": rp.run_ch1, "fit": rp.run_fit}[name]()
    model_id = ("pylc_deeplab_ch1_schema_a" if name == "ch1"
                else "pylc_deeplab_ch3_schema_a")
    rows = []
    with tempfile.TemporaryDirectory(prefix=f"parity_{name}_") as out_root:
        cwd = os.getcwd()
        os.chdir(out_root)
        try:
            cfg = Config().replace(compute_dtype="float32")
            for img, ref_out in ref["outputs"].items():
                res = test(
                    cfg, ref["model_pth"],
                    os.path.join(ref["raw_images"], f"{img}.jpg"),
                    mask_path=os.path.join(ref["raw_masks"], f"{img}.png"),
                    verbose=False)
                our_mask_p = os.path.join(
                    out_root, "data", "outputs", model_id,
                    "masks", f"{img}_jpg_scale_1.0.png")
                ref_mask = cv2.imread(ref_out["mask"])
                our_mask = cv2.imread(our_mask_p)
                assert ref_mask is not None and our_mask is not None
                assert ref_mask.shape == our_mask.shape
                same = (ref_mask == our_mask).all(axis=-1)
                ref_eval = (json.load(open(ref_out["eval"]))
                            if ref_out["eval"] and
                            os.path.exists(ref_out["eval"]) else {})
                got = res[0]["metrics"]
                rows.append({
                    "experiment": name, "image": img,
                    "mp": round(same.size / 1e6, 2),
                    "agree_pct": round(100.0 * float(same.mean()), 4),
                    "diff_px": int((~same).sum()),
                    "f1_ours": float(got["f1"]),
                    "f1_ref": float(ref_eval.get("f1", float("nan"))),
                    "iou_ours": float(got["iou"]),
                    "iou_ref": float(ref_eval.get("iou", float("nan"))),
                })
                print(f"  {name}/{img}: {rows[-1]['agree_pct']:.4f}% "
                      f"({rows[-1]['diff_px']} px differ)", flush=True)
        finally:
            os.chdir(cwd)
    return rows


def main():
    names = sys.argv[1:] or ["ch3", "ch1", "fit"]
    all_rows = []
    for name in names:
        print(f"== {name} ==", flush=True)
        all_rows += run_experiment(name)

    with open("/tmp/parity_table.json", "w") as f:
        json.dump(all_rows, f, indent=1)

    print("\n| Exp | Image | Pixel agreement | differing px "
          "| F1 ours / ref | IoU ours / ref |")
    print("|---|---|---|---|---|---|")
    for r in all_rows:
        print(f"| {r['experiment']} | {r['image']} ({r['mp']} MP) "
              f"| **{r['agree_pct']:.4f} %** | {r['diff_px']} "
              f"| {r['f1_ours']:.6f} / {r['f1_ref']:.6f} "
              f"| {r['iou_ours']:.6f} / {r['iou_ref']:.6f} |")


if __name__ == "__main__":
    main()
