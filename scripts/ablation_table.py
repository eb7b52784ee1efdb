"""Render results/roughness_ablation.json as the PERF.md matrix + per-class
fit table (round-5 task #3 artifact)."""

import json
import sys

import numpy as np


def main(path="results/roughness_ablation.json"):
    d = json.load(open(path))
    print("| seg weight \\ spp | 16 | 64 |")
    print("|---|---|---|")
    for w in ("1", "0.3", "0"):
        row = [f"| {w}x "]
        for s in ("16", "64"):
            c = d.get(f"ab_w{w}_s{s}")
            row.append(
                f"| {c['roughness_psnr_mapped']:.2f} "
                f"(rr {c['rerender_psnr']:.2f}) " if c else "| — "
            )
        print("".join(row) + "|")

    print("\nPer-class roughness fit (pred mean vs GT vs prior target):")
    base = d.get("ab_w1_s16")
    if base:
        fit = base["per_class_fit"]
        print("| GT rough | pred (w=1,16) | pred (w=0,16) | pred (w=1,64) |")
        print("|---|---|---|---|")
        for k in sorted(fit):
            g = fit[k]["gt"]
            cells = []
            for tag in ("ab_w1_s16", "ab_w0_s16", "ab_w1_s64"):
                c = d.get(tag, {}).get("per_class_fit", {}).get(k)
                cells.append(f"{c['pred_mean']:.3f}" if c else "—")
            print(f"| {g:.2f} | " + " | ".join(cells) + " |")
    for tag, c in sorted(d.items()):
        t = c.get("prior_quantile_targets")
        if t:
            print(f"\n{tag} prior quantile targets: " + ", ".join(
                f"{k}={v['quantile_target']:.3f}({v['highlight_px']}px)"
                for k, v in sorted(t.items())
            ))


if __name__ == "__main__":
    main(*sys.argv[1:])
