"""TPU sweep: Mat stage-2 step on the 104k-tri building (VERDICT r3 #5).

The reference Mat workload runs on scan meshes
(/root/reference/models/mat_nvdiffrast.py:234-239); the apartment-only
mat_step bench hides the specular-trace decay at scan scale.  Sweeps the
spec-kernel knobs (including the occluder PVS and stochastic bilinear) on
the building and prints iters/s per config.

    python scripts/sweep_mat_big.py [--scene big|apartment]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="big")
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of config labels")
    args = ap.parse_args()

    from bench import _mat_step
    from texir_code_tpu.data.synthetic import (
        make_apartment_scene,
        make_building_scene,
    )

    if args.scene == "big":
        syn = make_building_scene(atlas_res=256, subdiv=28)
        # camera inside room (2, 1), clear of walls/clutter
        cam = (12.0, 1.5, 7.2)
    else:
        syn = make_apartment_scene(atlas_res=256, subdiv=24)
        cam = None

    base = {"mip_stochastic": True}
    cfgs = [
        ("defaults (apartment knobs)", dict(base)),
        ("+occluders", dict(base, use_occluders=True)),
        ("+occ +two-pass 0.25", dict(base, use_occluders=True,
                                     spec_two_pass_cut=0.25)),
        ("+occ +bilinear_stoch", dict(base, use_occluders=True,
                                      bilinear_stochastic=True)),
        ("+occ rw=512", dict(base, use_occluders=True, spec_row_width=512)),
        ("+occ er=2 rw=1024", dict(base, use_occluders=True,
                                   spec_exit_rows=2)),
        ("bilinear_stoch only", dict(base, bilinear_stochastic=True)),
    ]
    if args.configs:
        want = [w.strip() for w in args.configs.split(",")]
        cfgs = [c for c in cfgs if any(w in c[0] for w in want)]

    for label, knobs in cfgs:
        try:
            ips, pre = _mat_step(syn, render_knobs=knobs, cam_position=cam)
            print(f"{label:32s} {ips:6.3f} iters/s (precompute {pre:.3f}s)",
                  flush=True)
        except Exception as e:
            print(f"{label:32s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
