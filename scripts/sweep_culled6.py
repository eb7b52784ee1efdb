"""Post-per-group-lists sweep: lb=4 clusters (finer exit granularity on
occlusion-heavy scenes) and wedges=8 (narrower cones, retested now that
candidate lists are per-group)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    from texir_code_tpu.data.synthetic import (
        make_apartment_scene,
        make_building_scene,
    )

    apt = make_apartment_scene(atlas_res=256, subdiv=24)
    for fb_, lb_, er_, w_ in [(32, 8, 16, 8), (32, 4, 16, 4), (16, 8, 8, 4)]:
        saved = bench.WEDGES
        bench.WEDGES = w_
        try:
            mrays, _ = bench._bake_scene(
                apt, fan_block=fb_, lb=lb_, exit_rows=er_
            )
        finally:
            bench.WEDGES = saved
        print(f"apt w{w_} fb{fb_} lb{lb_} er{er_}: {mrays:.2f} Mrays/s",
              flush=True)

    big = make_building_scene(atlas_res=256, subdiv=28)
    for fb_, lb_, er_, w_ in [(16, 4, 0, 4), (16, 4, 8, 4), (16, 8, 8, 8)]:
        saved = bench.WEDGES
        bench.WEDGES = w_
        try:
            mrays, _ = bench._bake_scene(
                big, n_meas=2, fan_block=fb_, lb=lb_, exit_rows=er_
            )
        finally:
            bench.WEDGES = saved
        print(f"big w{w_} fb{fb_} lb{lb_} er{er_}: {mrays:.2f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()
