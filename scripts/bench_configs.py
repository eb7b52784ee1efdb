"""Best-of-3 superbatch timing (bench.py methodology) of candidate kernel
configs — the per-config single-shot sweeps are too exposed to relay noise
for 5-10% decisions."""

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
    for fb_, lb_, er_ in [(32, 8, 16), (32, 16, 16), (64, 8, 32)]:
        mrays, _ = bench._bake_scene(apt, fan_block=fb_, lb=lb_, exit_rows=er_)
        print(f"apt fb{fb_} lb{lb_} er{er_}: {mrays:.2f} Mrays/s", flush=True)

    big = make_building_scene(atlas_res=256, subdiv=28)
    for fb_, lb_, er_ in [(16, 8, 0), (16, 8, 16), (32, 8, 16)]:
        mrays, _ = bench._bake_scene(
            big, n_meas=2, fan_block=fb_, lb=lb_, exit_rows=er_
        )
        print(f"big fb{fb_} lb{lb_} er{er_}: {mrays:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
