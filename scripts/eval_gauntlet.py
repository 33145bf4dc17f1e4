"""Quality gauntlet for serving variants: IoU/box-hit/e2e accuracy that the
models can FAIL (VERDICT r1 #3): held-out content seeds, held-out fonts,
photographic perturbation levels (twinvoice_tpu.eval.gauntlet).

Usage:
  python scripts/eval_gauntlet.py [--n 25] [--e2e] \
      [--variant name=weights.npz:width[:grid]] ...

Default variants: every segmenter_synth_*.npz bundled under
twinvoice_tpu/models/weights. Prints one JSON line per (variant, level) and
a markdown summary table for docs/PERFORMANCE.md.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WEIGHTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "twinvoice_tpu", "models", "weights",
)

# (level, base-set): "std" = train fonts, "heldout" = held-out fonts,
# "dot" = dot-matrix printhead rendering (the physical TW invoice medium,
# VERDICT r4 #7) on train fonts — isolates the print-medium axis
LEVEL_SETS = [
    ("clean", "std"), ("mild", "std"), ("hard", "std"),
    ("clean", "heldout"), ("mild", "heldout"),
    # real-photo scenario tiers (eval/gauntlet.SCENARIOS)
    ("printscan", "std"), ("screenshot", "std"),
    ("crumple", "std"), ("thermal", "std"),
    ("clean", "dot"), ("mild", "dot"),
]

_BASE_SUFFIX = {"std": "", "heldout": "+heldoutfont", "dot": "+dotprint"}


def discover_variants():
    out = []
    for f in sorted(os.listdir(WEIGHTS_DIR)):
        m = re.match(r"segmenter_synth_w(\d+)(?:_g(\d+))?\.npz$", f)
        if m:
            out.append((f.removesuffix(".npz"), os.path.join(WEIGHTS_DIR, f),
                        int(m.group(1)), int(m.group(2) or 512)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=25)
    ap.add_argument("--e2e", action="store_true",
                    help="also run full-pipeline field accuracy (slow)")
    ap.add_argument("--variant", action="append", default=[],
                    help="name=weights.npz:width[:grid]")
    ap.add_argument("--int8", action="store_true",
                    help="also evaluate each variant's int8-quantized serving "
                         "mode (calibrated on clean renders)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from twinvoice_tpu.config import InferConfig, UNetConfig
    from twinvoice_tpu.eval import (
        make_base_cases, perturb_cases, run_segmenter_gauntlet, run_e2e_gauntlet,
    )
    from twinvoice_tpu.infer.pipeline import Segmenter
    from twinvoice_tpu.train.checkpoint import load_params_npz

    variants = []
    for spec in args.variant:
        name, rest = spec.split("=", 1)
        parts = rest.split(":")
        variants.append((name, parts[0], int(parts[1]),
                         int(parts[2]) if len(parts) > 2 else 512))
    if not variants:
        variants = discover_variants()
    if not variants:
        print(json.dumps({"error": "no segmenter weights found"}))
        return

    bases = {
        "std": make_base_cases(args.n, use_heldout_fonts=False),
        "heldout": make_base_cases(args.n, seed=888_000, use_heldout_fonts=True),
        "dot": make_base_cases(args.n, seed=999_000, dot_print=True),
    }
    case_sets = {}
    for level, base in LEVEL_SETS:
        case_sets[(level, base)] = perturb_cases(bases[base], level, seed=7)

    def calib_batches(grid, k=8):
        """Clean in-distribution renders, resized to the serving grid —
        the activation-scale calibration set for int8 mode."""
        import numpy as np

        from twinvoice_tpu.eval.gauntlet import _resize_case

        cases = case_sets[("clean", "std")][:k]
        imgs = np.stack([_resize_case(c, grid)[0] for c in cases])
        return [imgs.astype(np.uint8)]

    seg_modes = [("", None)]
    if args.int8:
        seg_modes.append(("+int8", "int8"))

    rows = []
    for name, path, width, grid in variants:
        if not os.path.exists(path):
            # a queued retrain may have timed out before exporting its npz;
            # evaluate everything else rather than aborting the whole table
            print(json.dumps({"variant": name, "error": f"missing {path}"}),
                  flush=True)
            continue
        params, bn = load_params_npz(path, UNetConfig(base_width=width))
        for suffix, mode in seg_modes:
            kw = {"int8_calib": calib_batches(grid)} if mode == "int8" else {}
            seg = Segmenter(params, bn, UNetConfig(base_width=width),
                            InferConfig(img_size=grid), dtype=jnp.bfloat16, **kw)
            _eval_variant(name + suffix, seg, grid, width, args, case_sets, rows)

    _print_summary(rows)


def _eval_variant(name, seg, grid, width, args, case_sets, rows):
    from twinvoice_tpu.eval import run_segmenter_gauntlet, run_e2e_gauntlet

    row = {"variant": name, "width": width, "grid": grid}
    for (level, base), cases in case_sets.items():
        key = f"{level}{_BASE_SUFFIX[base]}"
        res = run_segmenter_gauntlet(seg, cases)
        row[key] = {"iou": round(res["iou_mean"], 3),
                    "box_hit": round(res["box_hit_mean"], 3)}
        print(json.dumps({"variant": name, "level": key, **res}), flush=True)
    if args.e2e:
        from twinvoice_tpu.config import FusionConfig
        from twinvoice_tpu.fusion.extract import InvoiceExtractor
        from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

        engine = JaxOcrEngine()
        if engine.available():
            ex = InvoiceExtractor(
                seg, None, engines=[engine],
                cfg=FusionConfig(use_qr=False, auto_rotate=False),
            )
            for level in ("clean", "mild"):
                res = run_e2e_gauntlet(ex, case_sets[(level, "std")])
                row[f"e2e_{level}"] = res
                print(json.dumps({"variant": name, "e2e": level, **res}),
                      flush=True)
    rows.append(row)


def _print_summary(rows):
    keys = [f"{lv}{_BASE_SUFFIX[b]}" for lv, b in LEVEL_SETS]
    print("\n| variant | grid | " + " | ".join(f"{k} IoU/hit" for k in keys) + " |")
    print("|" + "---|" * (len(keys) + 2))
    for row in rows:
        cells = [f"{row[k]['iou']:.2f}/{row[k]['box_hit']:.2f}" for k in keys]
        print(f"| {row['variant']} | {row['grid']} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
