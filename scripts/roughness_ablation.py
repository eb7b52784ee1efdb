"""Roughness attribution: prior-weight x training-spp ablation matrix
(VERDICT r5 task #3).

Round 4 left the ~15.7 dB mapped-roughness ceiling explained by
elimination ("prior-dominated likelihood") — the spp-64 run refuted the
low-spp-bias mechanism (+0.06 dB only) but no run ever VARIED the seg-prior
weight.  This script measures the attribution directly: MatSyn runs over

    seg_weight_scale in {1.0, 0.3, 0.0}  x  specular spp in {16, 64}

on the apartment quality dataset (same IRRF/IrT artifacts as the published
table; --skip-export semantics — the dataset must already exist), each cell
recording mapped roughness PSNR plus the per-class roughness fit:

    per seg class c: mean predicted roughness on mapped texels of c,
    the GT value, and the stage-1 prior's delta-quantile target computed
    from the trained womipmap roughness in c's highlight region
    (reference models/loss.py:256-272 is the mechanism under test).

seg_weight_scale multiplies ONLY the stage-1/2 roughness prior terms
(models/losses.py::render_loss), leaving stage-0 albedo untouched; 1.0 is
reference parity, 0.0 is pure likelihood.

Usage: python scripts/roughness_ablation.py [--cells all|WxS,...]
       [--out results/roughness_ablation.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WEIGHTS = (1.0, 0.3, 0.0)
SPPS = (16, 64)


def per_class_fit(runner):
    """Per-seg-class roughness fit on mapped texels: (pred mean, gt, n).

    Classes are recovered from the GT roughness values — the synthetic
    atlas assigns one GT roughness per wall class (data/synthetic.py)."""
    ds = runner.dataset
    gt_r = ds.gt_roughness
    rough = np.asarray(runner.params.roughness)
    # resample prediction to GT resolution (nearest, as the eval does)
    rows = (np.arange(gt_r.shape[0]) * rough.shape[0]) // gt_r.shape[0]
    cols = (np.arange(gt_r.shape[1]) * rough.shape[1]) // gt_r.shape[1]
    rough = rough[rows][:, cols]
    valid = runner._valid_mask(gt_r.shape[0])

    out = {}
    gtr = gt_r[..., 0]
    for g in np.unique(np.round(gtr[valid], 3)):
        m = valid & (np.abs(gtr - g) < 1e-3)
        out[f"gt_{g:.2f}"] = {
            "gt": float(g),
            "pred_mean": float(rough[..., 0][m].mean()),
            "pred_std": float(rough[..., 0][m].std()),
            "n_texels": int(m.sum()),
        }
    return out


def prior_quantile_targets(runner):
    """The stage-1 prior's per-class delta-quantile targets at convergence
    (reference models/loss.py:256-272): quantile(0.4) of the trained
    womipmap roughness inside each class's VHL-highlight image region,
    view-averaged weighted by the class's highlight pixel count."""
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.models.losses import masked_quantile_per_class
    from texir_code_tpu.train.material import NUM_SEG_CLASSES

    nc = NUM_SEG_CLASSES + 1
    acc = np.zeros(nc)
    wgt = np.zeros(nc)
    for i in runner._train_indices():
        item = runner.dataset[i]
        m = runner.masks[item["id"]]
        out = runner.model.forward(
            runner.params, jnp.asarray(item["cam_to_world"]),
            jnp.asarray(item["cam_position"]), 1,
            jax.random.fold_in(runner.key, 60_000 + i),
        )
        womip = np.asarray(out["roughness_womipmap"])
        pix = womip.size
        vals = jnp.asarray(womip.reshape(pix))
        seg = jnp.asarray(m["seg_id"].reshape(pix).astype(np.int32))
        hi = jnp.asarray((m["highlight"].reshape(pix) > 0).astype(np.float32))
        target, counts = masked_quantile_per_class(
            vals, seg, hi, nc, jnp.full((nc,), 0.4)
        )
        t, c = np.asarray(target), np.asarray(counts)
        acc += t * c
        wgt += c
    with np.errstate(invalid="ignore"):
        mean_t = np.where(wgt > 0, acc / np.maximum(wgt, 1), np.nan)
    return {
        f"class_{c}": {"quantile_target": float(mean_t[c]),
                       "highlight_px": int(wgt[c])}
        for c in range(nc) if wgt[c] > 0
    }


def run_cell(weight, spp, expname):
    from texir_code_tpu.config import parse_file
    from texir_code_tpu.train.material_syn import MatTrainSynRunner

    conf_path = "configs/mat_synthetic.conf"
    conf = parse_file(conf_path)
    conf.put("render_loss.seg_weight_scale", weight)
    conf.put("train.sample_light", [32, spp])
    t0 = time.time()
    runner = MatTrainSynRunner(
        conf, expname=expname, exps_root="exps", conf_path=conf_path
    )
    runner.run()
    mats = runner.evaluate_materials()
    rr = runner.render_calculate(2)
    fit = per_class_fit(runner)
    targets = prior_quantile_targets(runner)
    return {
        "rerender_psnr": rr.get("psnr"),
        "seg_weight_scale": weight,
        "spp": spp,
        "wall_s": time.time() - t0,
        "roughness_psnr_mapped": mats.get("roughness_psnr_mapped"),
        "roughness_psnr": mats.get("roughness_psnr"),
        "albedo_psnr_mapped": mats.get("albedo_psnr_mapped"),
        "per_class_fit": fit,
        "prior_quantile_targets": targets,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/roughness_ablation.json")
    ap.add_argument("--cells", default="all",
                    help='"all" or comma list like "1.0x16,0.0x64"')
    args = ap.parse_args()
    os.chdir(REPO)

    if args.cells == "all":
        cells = [(w, s) for s in SPPS for w in WEIGHTS]
    else:
        cells = []
        for c in args.cells.split(","):
            w, s = c.split("x")
            cells.append((float(w), int(s)))

    results = {}
    for w, s in cells:
        tag = f"ab_w{w:g}_s{s}"
        print(f"=== cell seg_weight={w} spp={s} ({tag})", flush=True)
        results[tag] = run_cell(w, s, tag)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"=== {tag}: mapped roughness PSNR "
              f"{results[tag]['roughness_psnr_mapped']}", flush=True)
    print("ABLATION_RESULTS " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
