"""TPU sweep: proven rectangular occluders (geometry/occluders.py) on the
bench bake scenes (VERDICT r3 #2 — the host-precomputed PVS attack on
scan-scale candidate lists).

Measures the culled bake with/without occluders, single-pass and composed
with the two-pass/ladder configurations bench.py ships.  Run on TPU:

    python scripts/sweep_occluders.py [--scene big|huge|apartment|all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
TEXEL_BATCH = 4096
WEDGES = 4


def bake_mrays(syn, n_meas=2, batch=TEXEL_BATCH, fan_block=16, lb=4,
               exit_rows=8, two_pass_cut=None, two_pass_cut2=None,
               two_pass_cap=0.125, two_pass_cap2=0.25, occluders=None):
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.models.tbl import build_tbl_from_flat
    from texir_code_tpu.models.tracer_irt import (
        bake_geometry_textures,
        morton_order,
    )
    from texir_code_tpu.ops.fan_raycast import FanScene
    from texir_code_tpu.ops.pallas_culled import ClusterScene
    from texir_code_tpu.parallel.bake import ShardedIrradianceBaker
    from texir_code_tpu.parallel.mesh import make_device_mesh

    fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
    tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
    fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
    clusters = ClusterScene.from_fan(fan, lb=lb, dense=True)
    geom = bake_geometry_textures(syn.mesh, 128)

    baker = ShardedIrradianceBaker(
        tbl, spp=SPP, texel_batch=batch, mesh=make_device_mesh(),
        cluster_scene=clusters, wedges=WEDGES,
    )
    baker.fan_block = fan_block
    baker.exit_rows = exit_rows
    baker.two_pass_cut = two_pass_cut
    baker.two_pass_cut2 = two_pass_cut2
    baker.two_pass_cap = two_pass_cap
    baker.two_pass_cap2 = two_pass_cap2
    baker.occluders = occluders

    vr, vc = np.nonzero(geom.valid)
    order = morton_order(geom.position[vr, vc])
    vr, vc = vr[order], vc[order]
    pts = geom.position[vr, vc]
    nrm = geom.normal[vr, vc]
    n = len(pts)
    repeats = 3
    need = batch * n_meas * (repeats + 1)
    reps = (need + n - 1) // n
    pts = np.tile(pts, (reps, 1))[:need]
    nrm = np.tile(nrm, (reps, 1))[:need]

    def run(i0, k):
        sl = slice(i0 * batch, (i0 + k) * batch)
        ids = jnp.arange(sl.start, sl.stop, dtype=jnp.int32).reshape(k, batch)
        return baker._sharded_super(
            jnp.asarray(pts[sl]).reshape(k, batch, 3),
            jnp.asarray(nrm[sl]).reshape(k, batch, 3),
            ids, jnp.int32(7 + i0),
        )

    out = run(0, n_meas)
    jax.block_until_ready(out)
    dt = float("inf")
    for r in range(repeats):
        t0 = time.time()
        out = run((r + 1) * n_meas, n_meas)
        jax.block_until_ready(out)
        dt = min(dt, time.time() - t0)
    return n_meas * batch * SPP / dt / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="all")
    args = ap.parse_args()

    from texir_code_tpu.data.synthetic import (
        make_apartment_scene,
        make_building_scene,
    )
    from texir_code_tpu.geometry.occluders import extract_occluders

    scenes = {}
    if args.scene in ("big", "all"):
        scenes["big"] = make_building_scene(atlas_res=256, subdiv=28)
    if args.scene in ("huge", "all"):
        scenes["huge"] = make_building_scene(
            atlas_res=256, rooms=(6, 5), subdiv=28
        )
    if args.scene in ("apartment", "all"):
        scenes["apartment"] = make_apartment_scene(atlas_res=256, subdiv=24)

    for name, syn in scenes.items():
        t0 = time.time()
        occ = extract_occluders(syn.mesh)
        print(f"== {name}: tris={syn.mesh.num_faces} "
              f"occluders={occ.num_occluders if occ else 0} "
              f"(extract {time.time()-t0:.1f}s)", flush=True)
        if name == "apartment":
            # bench config: fb32 / er16 / lb4 single-pass
            cfgs = [
                ("bench single-pass", dict(fan_block=32, exit_rows=16,
                                           n_meas=3)),
                ("+occluders", dict(fan_block=32, exit_rows=16, n_meas=3,
                                    occluders=occ)),
            ]
        elif name == "big":
            cfgs = [
                ("bench two-pass 0.25", dict(two_pass_cut=0.25)),
                ("single-pass +occ", dict(occluders=occ)),
                ("two-pass 0.25 +occ", dict(two_pass_cut=0.25, occluders=occ)),
                ("two-pass 0.15 +occ", dict(two_pass_cut=0.15, occluders=occ)),
                ("ladder (.06,.16) +occ", dict(
                    two_pass_cut=0.06, two_pass_cut2=0.16, two_pass_cap=0.45,
                    occluders=occ)),
            ]
        else:
            cfgs = [
                ("bench ladder (.06,.16)", dict(
                    two_pass_cut=0.06, two_pass_cut2=0.16, two_pass_cap=0.45,
                    n_meas=1)),
                ("single-pass +occ", dict(n_meas=1, occluders=occ)),
                ("two-pass 0.12 +occ", dict(two_pass_cut=0.12, n_meas=1,
                                            occluders=occ)),
                ("ladder (.06,.16) +occ", dict(
                    two_pass_cut=0.06, two_pass_cut2=0.16, two_pass_cap=0.45,
                    n_meas=1, occluders=occ)),
            ]
        for label, kw in cfgs:
            try:
                m = bake_mrays(syn, **kw)
                print(f"  {label:28s} {m:6.2f} Mrays/s", flush=True)
            except Exception as e:  # OOM etc: record and continue
                print(f"  {label:28s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
