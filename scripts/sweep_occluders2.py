"""Refinement sweep: occluder PVS composed with cut/exit-shape variants.

Round-4 second pass: the first sweep showed occluders pay everywhere
(apartment 16.3->18.8, big single-pass 2.97->5.36, two-pass 4.83->5.53,
huge ladder 1.0->2.38 at n_meas=1); this sweep refines the composition.

    python scripts/sweep_occluders2.py --scene big|huge
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sweep_occluders import bake_mrays  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="big")
    args = ap.parse_args()

    from texir_code_tpu.data.synthetic import make_building_scene
    from texir_code_tpu.geometry.occluders import extract_occluders

    if args.scene == "big":
        syn = make_building_scene(atlas_res=256, subdiv=28)
        occ = extract_occluders(syn.mesh)
        cfgs = [
            ("tp 0.30 +occ er8 fb16", dict(two_pass_cut=0.3)),
            ("tp 0.35 +occ er8 fb16", dict(two_pass_cut=0.35)),
            ("tp 0.25 +occ er4 fb16", dict(two_pass_cut=0.25, exit_rows=4)),
            ("tp 0.25 +occ er16 fb16", dict(two_pass_cut=0.25, exit_rows=16)),
            ("tp 0.25 +occ er8 fb8", dict(two_pass_cut=0.25, fan_block=8)),
            ("single +occ er4 fb16", dict(exit_rows=4)),
            ("single +occ er16 fb16", dict(exit_rows=16)),
            ("tp 0.25 cap 0.25 +occ", dict(two_pass_cut=0.25,
                                           two_pass_cap=0.25)),
        ]
    else:
        syn = make_building_scene(atlas_res=256, rooms=(6, 5), subdiv=28)
        occ = extract_occluders(syn.mesh)
        cfgs = [
            ("tp 0.08 +occ", dict(two_pass_cut=0.08)),
            ("tp 0.12 +occ (rerun)", dict(two_pass_cut=0.12)),
            ("tp 0.16 +occ", dict(two_pass_cut=0.16)),
            ("tp 0.12 +occ er4", dict(two_pass_cut=0.12, exit_rows=4)),
            ("single +occ er4", dict(exit_rows=4)),
            ("ladder (.08,.2) cap.45 +occ", dict(
                two_pass_cut=0.08, two_pass_cut2=0.2, two_pass_cap=0.45)),
        ]

    print(f"== {args.scene}: tris={syn.mesh.num_faces} "
          f"K={occ.num_occluders if occ else 0}", flush=True)
    for label, kw in cfgs:
        kw.setdefault("n_meas", 2)
        kw["occluders"] = occ
        try:
            m = bake_mrays(syn, **kw)
            print(f"  {label:30s} {m:6.2f} Mrays/s", flush=True)
        except Exception as e:
            print(f"  {label:30s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
