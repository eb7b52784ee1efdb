"""Mat full-shape stage-2 step: knob sweep on TPU (round 3).

Reuses bench._mat_step (production scanned dispatch, best-of-3, seed
varies per call).  Targets VERDICT r2 #4: mat_step >= 5.0 iters/s honest.

Usage: python scripts/sweep_mat_knobs.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    from texir_code_tpu.data.synthetic import make_apartment_scene

    syn = make_apartment_scene(atlas_res=256, subdiv=24)
    for knobs in [
        None,                                   # production defaults
        {"mip_stochastic": True},
        {"mip_stochastic": True, "spec_row_width": 512},
        {"spec_row_width": 768},
        {"mip_stochastic": True, "proxy_k": 512},
    ]:
        ips, pre = bench._mat_step(syn, render_knobs=knobs)
        print(f"{knobs} -> {ips:.3f} iters/s (first-epoch {pre:.3f} s/view)",
              flush=True)


if __name__ == "__main__":
    main()
