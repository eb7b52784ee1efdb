"""Measure the streamed-candidate-window kernel: the er<8 ladder on real
hardware (round-5 task #4's 'attack the SMEM wall').

The exit-group visit ladder (scripts/huge_bound.py) showed finer exit
groups carry x1.41 (big) / x1.66 (huge) ideal headroom at er=4 — but the
SMEM-table kernel cannot compile er=4 on the huge scene (2 x ng x C
candidate tables exceed SMEM).  cast_fans_culled(stream_cands=W) now
streams the tables from HBM through W-entry double-buffered SMEM windows
(bit-exact; tests/test_pallas_culled.py).  This script measures, per
scene:

  1. TPU bit-equality of the streamed vs SMEM-table kernel (one batch),
  2. single-pass + occluders at er=8 (SMEM), er=8 (streamed — prices the
     streaming overhead at equal schedule), er=4 / er=2 (streamed),
  3. the scene's shipped two-pass at the best streamed er.

Usage (TPU): python scripts/stream_er_sweep.py [--scene big|huge|both]
             [--out results/stream_er.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bit_check(syn):
    """Streamed == SMEM-table hits on a real TPU batch."""
    import jax.numpy as jnp

    import bench
    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.geometry.occluders import extract_occluders
    from texir_code_tpu.models.tbl import build_tbl_from_flat
    from texir_code_tpu.models.tracer_irt import (
        IrradianceTextureBaker,
        bake_geometry_textures,
        morton_order,
    )
    from texir_code_tpu.ops.fan_raycast import FanScene
    from texir_code_tpu.ops.pallas_culled import (
        ClusterScene,
        cast_fans_culled,
        sort_dirs_octant,
        tile_rows,
        wedge_rows,
    )

    fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
    tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
    fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
    clusters = ClusterScene.from_fan(fan, lb=4, dense=True)
    occ = extract_occluders(syn.mesh)
    geom = bake_geometry_textures(syn.mesh, 64)
    vr, vc = np.nonzero(geom.valid)
    order = morton_order(geom.position[vr, vc])
    vr, vc = vr[order], vc[order]
    pts = geom.position[vr, vc][:256]
    nrm = geom.normal[vr, vc][:256]
    baker = IrradianceTextureBaker(
        tbl, spp=512, texel_batch=256, cluster_scene=clusters, wedges=4
    )
    pts_j = jnp.asarray(pts)
    nrm_j = jnp.asarray(nrm)
    nrm_t = tuple(nrm_j[:, k] for k in range(3))
    ids = jnp.arange(256, dtype=jnp.int32)
    dirs = baker._fan_dirs(nrm_t, ids, jnp.int32(3))
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, 4) for a in ds)
    origins = tuple(
        pts_j[:, k] + baker.surface_eps * nrm_j[:, k] for k in range(3)
    )
    rows_o = tuple(tile_rows(a, 4) for a in origins)
    base = cast_fans_culled(
        clusters, rows_o, rows_d, fan_block=16, exit_rows=8,
        occluders=occ, stream_cands=0,
    )
    got = cast_fans_culled(
        clusters, rows_o, rows_d, fan_block=16, exit_rows=8,
        occluders=occ, stream_cands=1024,
    )
    np.testing.assert_array_equal(np.asarray(base.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(base.prim), np.asarray(got.prim))
    print("TPU bit-equality: streamed == SMEM-table ok", flush=True)


def main():
    import bench
    from texir_code_tpu.data.synthetic import make_building_scene

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="both", choices=["big", "huge", "both"])
    ap.add_argument("--out", default="results/stream_er.json")
    ap.add_argument("--skip-bitcheck", action="store_true")
    args = ap.parse_args()
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    scenes = []
    if args.scene in ("big", "both"):
        scenes.append(("big", make_building_scene(atlas_res=256, subdiv=28),
                       0.25))
    if args.scene in ("huge", "both"):
        scenes.append(
            ("huge",
             make_building_scene(atlas_res=256, rooms=(6, 5), subdiv=28),
             0.16))

    results = {}
    first = True
    for name, syn, cut in scenes:
        if first and not args.skip_bitcheck:
            bit_check(syn)
            first = False
        r = {}
        for tag, kw in (
            ("er8_smem", dict(exit_rows=8, stream_cands=0)),
            ("er8_stream", dict(exit_rows=8, stream_cands=1024)),
            ("er4_stream", dict(exit_rows=4, stream_cands=1024)),
            ("er2_stream", dict(exit_rows=2, stream_cands=1024)),
            ("er4_stream_twopass",
             dict(exit_rows=4, stream_cands=1024, two_pass_cut=cut)),
        ):
            try:
                mrays, _ = bench._bake_scene(
                    syn, n_meas=2, fan_block=16, occluders=True, **kw
                )
                r[tag] = round(float(mrays), 3)
            except Exception as e:  # compile failures recorded, not fatal
                r[tag] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"
            print(f"{name} {tag}: {r[tag]}", flush=True)
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            results[name] = r
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
    print("STREAM_ER " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
