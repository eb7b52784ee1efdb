"""Scan-scale quality run with real rooms (VERDICT r5 task #2).

Exports the 104k-triangle 3x3-room building (the bench `big_scene` mesh) in
the reference on-disk layout INCLUDING the roomseg occupancy-grid assets
(reference utils/general.py:115-125), with one camera per room plus a
held-out novel view, then drives the real CLI stages:

    IRRF (capped — the flagship's Mat metrics depend on IrT, which bakes
          from the TBL; the cap is recorded, and IRRF's own convergence is
          measured separately by its val PSNR)
    IrrT (512^2 bake at the big-scene kernel shape: fan_block 16,
          exit_rows 8, two-pass 0.25 + occluders — bench.py's config)
    MatSyn (3-substage train + GT metrics)

This is the first end-to-end exercise of the mode-2 (room x class) seg
prior with >1 room (reference models/loss.py:286-293) and of material
quality at the mesh class the reference targets.  The MatSyn log must show
n_rooms > 1 (printed below from the runner's masks).

Usage: python scripts/building_quality.py [--skip-export]
       [--irrf-epochs 60] [--out results/building_quality.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "demo_data_big")
ROOMS = (3, 3)
ROOM_SIZE = (5.0, 3.0, 5.0)


def building_cameras():
    """One camera per room center (every room photographed + every room id
    exercised by the mode-2 prior) plus one offset novel view."""
    cams = []
    for j in range(ROOMS[1]):
        for i in range(ROOMS[0]):
            cams.append([(i + 0.5) * ROOM_SIZE[0], 1.5, (j + 0.5) * ROOM_SIZE[2]])
    cams.append([1.2 * ROOM_SIZE[0], 1.6, 1.35 * ROOM_SIZE[2]])  # novel
    return np.asarray(cams, np.float32)


def export_dataset():
    from texir_code_tpu.data.export import export_reference_layout
    from texir_code_tpu.data.synthetic import make_building_scene

    scene = make_building_scene(atlas_res=256, subdiv=28)
    print(f"building mesh: {scene.mesh.num_faces} triangles", flush=True)
    cams = building_cameras()
    path_mesh = export_reference_layout(
        scene, DATA, pano_res=(256, 512),
        gt_render="material", gt_spp=512, irt_spp=1024,
        cameras=cams,
    )
    with open(os.path.join(DATA, "info", "novel.txt"), "w") as f:
        f.write(f"view{len(cams) - 1:03d}\n")
    assert os.path.exists(os.path.join(DATA, "roomseg", "roomSegs_uchar_f0.png"))
    print(f"dataset exported: {path_mesh}", flush=True)


def run_stage(stage, conf, extra=()):
    path_set = f"--set=train.path_mesh_open3d={DATA}/mesh/out1.obj"
    cmd = [
        sys.executable, "-m", "texir_code_tpu.cli", "train",
        "--conf", conf, "--expname", "building", "--trainstage", stage,
        path_set, *extra,
    ]
    print(f"== {stage}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    subprocess.run(cmd, cwd=REPO, check=True)
    print(f"== {stage} wall-clock: {time.time() - t0:.0f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-export", action="store_true")
    ap.add_argument("--irrf-epochs", type=int, default=60)
    ap.add_argument("--mat-epochs", type=int, default=None)
    ap.add_argument("--stages", default="IRRF,IrrT,MatSyn")
    args = ap.parse_args()
    os.chdir(REPO)

    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    if not args.skip_export:
        export_dataset()

    if "IRRF" in stages:
        run_stage("IRRF", "configs/irrf_synthetic.conf",
                  ["--max_epochs", str(args.irrf_epochs)])
    if "IrrT" in stages:
        run_stage("IrrT", "configs/irt_synthetic.conf", [
            "--irt_res", "512",
            "--set=train.bake_fan_block=16",
            "--set=train.bake_exit_rows=8",
            "--set=train.two_pass_cut=0.25",
        ])
    if "MatSyn" in stages:
        extra = []
        if args.mat_epochs:
            extra = ["--max_epochs", str(args.mat_epochs)]
        run_stage("MatSyn", "configs/mat_synthetic.conf", extra)
    print("building quality run complete", flush=True)


if __name__ == "__main__":
    main()
