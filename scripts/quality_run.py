"""Converged-quality run (VERDICT #9): full synthetic pipeline on TPU.

Exports the two-room apartment scene in the reference on-disk layout (GT
albedo/roughness + a held-out novel view), then drives the real CLI stages:

    IRRF  (irradiance field, full epochs)      configs/irrf_synthetic.conf
    IrrT  (irradiance texture bake + denoise)  configs/irt_synthetic.conf
    MatSyn (Mat 3-substage train + GT metrics) configs/mat_synthetic.conf

and prints the material-eval / novel-view metric lines MatSyn emits.
Artifacts land in ./exps and ./results (gitignored); record the metric
table in PERF.md / README.

Usage: python scripts/quality_run.py [--fast]   (--fast caps epochs for a
smoke test of the plumbing at full resolutions)
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "demo_data")


def export_dataset():
    import numpy as np

    from texir_code_tpu.data.export import export_reference_layout
    from texir_code_tpu.data.synthetic import make_apartment_scene

    scene = make_apartment_scene(atlas_res=256, subdiv=24)
    # material-consistent GT photos (view-dependent specular from the GT
    # atlases): plain radiance panos carry no roughness signal at all —
    # the round-2 roughness PSNR 8.22 was unrecoverable-by-construction,
    # not an optimizer failure (PERF.md round 3 quality section)
    path_mesh = export_reference_layout(
        scene, DATA, n_views=5, pano_res=(256, 512),
        gt_render="material", gt_spp=512, irt_spp=1024,
    )
    # hold out the last view for novel-view eval (reference info/novel.txt)
    with open(os.path.join(DATA, "info", "novel.txt"), "w") as f:
        f.write("view004\n")
    print(f"dataset exported: {path_mesh}", flush=True)


def run_stage(stage, conf, extra=(), expname="quality"):
    cmd = [
        sys.executable, "-m", "texir_code_tpu.cli", "train",
        "--conf", conf, "--expname", expname, "--trainstage", stage,
        *extra,
    ]
    print(f"== {stage}: {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, cwd=REPO, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="cap epochs: plumbing smoke test at full shapes")
    ap.add_argument("--skip-export", action="store_true")
    ap.add_argument("--irrf-epochs", type=int, default=None,
                    help="cap IRRF epochs (the Mat metrics depend on IrT, "
                         "which bakes from the TBL, not on the IRRF field; "
                         "capping IRRF only shortens the wall-clock)")
    ap.add_argument("--mat-epochs", type=int, default=None)
    ap.add_argument("--stages", default="IRRF,IrrT,MatSyn",
                    help="comma-separated subset of IRRF,IrrT,MatSyn (a "
                         "MatSyn-only rerun reuses the baked irt.hdr)")
    ap.add_argument("--expname", default="quality")
    ap.add_argument("--mat-conf", default="configs/mat_synthetic.conf",
                    help="e.g. configs/mat_synthetic_exact.conf for the "
                         "exact-trilinear (mip_stochastic=false) ablation")
    args = ap.parse_args()

    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    if not args.skip_export:
        export_dataset()

    irrf_extra = ["--max_epochs", "40"] if args.fast else []
    mat_extra = ["--max_epochs", "2"] if args.fast else []
    if args.irrf_epochs:
        irrf_extra = ["--max_epochs", str(args.irrf_epochs)]
    if args.mat_epochs:
        mat_extra = ["--max_epochs", str(args.mat_epochs)]
    irt_res = ["--irt_res", "512"]

    if "IRRF" in stages:
        run_stage("IRRF", "configs/irrf_synthetic.conf", irrf_extra,
                  args.expname)
    if "IrrT" in stages:
        run_stage("IrrT", "configs/irt_synthetic.conf", irt_res, args.expname)
    if "MatSyn" in stages:
        run_stage("MatSyn", args.mat_conf, mat_extra, args.expname)
    print("quality run complete", flush=True)


if __name__ == "__main__":
    main()
