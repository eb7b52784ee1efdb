"""TPU sweep: occlusion-proxy seeding on the big-scene bake.

Seeds the culled kernel's hit state from a pre-trace against the scene's
k largest triangles (ClusterScene.proxy_from_fan) — per-ray t upper bounds
that fire the occlusion exit from the first visit and truncate candidate
lists at cull time.  Sweeps proxy_k x {single-pass, two-pass} on the
104k-tri building (the scan-scale workload where round 2 sat at 0.32x the
baseline envelope) and checks the apartment headline config.

Usage: python scripts/sweep_proxy.py [building|apartment|both]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bake_mrays(syn, *, fan_block, lb, exit_rows, two_pass_cut=None,
               proxy_k=0, n_meas=2, batch=4096, spp=2048, wedges=4,
               two_pass_cut2=None, two_pass_cap=0.125, two_pass_cap2=0.25):
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.models.tbl import build_tbl_from_flat
    from texir_code_tpu.models.tracer_irt import (
        IrradianceTextureBaker,
        bake_geometry_textures,
        morton_order,
    )
    from texir_code_tpu.ops.fan_raycast import FanScene
    from texir_code_tpu.ops.pallas_culled import ClusterScene

    fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
    tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
    fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
    clusters = ClusterScene.from_fan(fan, lb=lb, dense=True)
    geom = bake_geometry_textures(syn.mesh, 128)

    baker = IrradianceTextureBaker(
        tbl, spp=spp, texel_batch=batch, cluster_scene=clusters,
        wedges=wedges,
    )
    baker.fan_block = fan_block
    baker.exit_rows = exit_rows
    baker.two_pass_cut = two_pass_cut
    baker.two_pass_cut2 = two_pass_cut2
    baker.two_pass_cap = two_pass_cap
    baker.two_pass_cap2 = two_pass_cap2
    if proxy_k:
        baker.proxy_scene = ClusterScene.proxy_from_fan(fan, k=proxy_k)

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
        return baker._bake_superbatch_culled(
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
    return n_meas * batch * spp / dt / 1e6


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "building"
    from texir_code_tpu.data.synthetic import (
        make_apartment_scene,
        make_building_scene,
    )

    if which in ("building", "both"):
        syn = make_building_scene(atlas_res=256, subdiv=28)
        print(f"building: {syn.mesh.num_faces} tris", flush=True)
        cfgs = [
            # round-2 shipped config (reference point)
            dict(fan_block=16, lb=4, exit_rows=8, two_pass_cut=0.25),
            # single-pass + proxy
            dict(fan_block=16, lb=4, exit_rows=8, proxy_k=1024),
            dict(fan_block=16, lb=4, exit_rows=8, proxy_k=4096),
            dict(fan_block=16, lb=4, exit_rows=8, proxy_k=256),
            # proxy + two-pass compose
            dict(fan_block=16, lb=4, exit_rows=8, proxy_k=1024,
                 two_pass_cut=0.25),
            # proxy with other kernel shapes
            dict(fan_block=32, lb=4, exit_rows=16, proxy_k=1024),
            dict(fan_block=16, lb=8, exit_rows=8, proxy_k=1024),
        ]
        for cfg in cfgs:
            m = bake_mrays(syn, **cfg)
            print(f"  {cfg} -> {m:.2f} Mrays/s", flush=True)

    if which == "shape":
        # broad kernel-shape sweep on the building (round-3: binning and
        # largest-K proxies both lose; remaining levers are block shape and
        # two-pass composition)
        syn = make_building_scene(atlas_res=256, subdiv=28)
        print(f"building: {syn.mesh.num_faces} tris", flush=True)
        for cfg in [
            dict(fan_block=8, lb=4, exit_rows=8),
            dict(fan_block=8, lb=2, exit_rows=8),
            dict(fan_block=16, lb=2, exit_rows=8),
            dict(fan_block=8, lb=4, exit_rows=8, wedges=8),
            dict(fan_block=16, lb=4, exit_rows=8, wedges=8),
            dict(fan_block=8, lb=4, exit_rows=8, two_pass_cut=0.25),
            dict(fan_block=8, lb=2, exit_rows=8, two_pass_cut=0.25),
            dict(fan_block=8, lb=4, exit_rows=8, wedges=8,
                 two_pass_cut=0.25),
            dict(fan_block=16, lb=4, exit_rows=8, wedges=8,
                 two_pass_cut=0.25),
            dict(fan_block=16, lb=2, exit_rows=8, two_pass_cut=0.25),
        ]:
            m = bake_mrays(syn, **cfg)
            print(f"  {cfg} -> {m:.2f} Mrays/s", flush=True)

    if which == "ladder":
        # 3-pass cut ladders on the building + the >=300k-tri 30-room scene
        syn = make_building_scene(atlas_res=256, subdiv=28)
        print(f"building: {syn.mesh.num_faces} tris", flush=True)
        for cfg in [
            dict(fan_block=16, lb=4, exit_rows=8, two_pass_cut=0.25),
            dict(fan_block=16, lb=4, exit_rows=8, two_pass_cut=0.1,
                 two_pass_cut2=0.3, two_pass_cap=0.35),
            dict(fan_block=16, lb=4, exit_rows=8, two_pass_cut=0.15,
                 two_pass_cut2=0.35, two_pass_cap=0.3),
            dict(fan_block=16, lb=4, exit_rows=8, two_pass_cut=0.15,
                 two_pass_cut2=0.3, two_pass_cap=0.25),
            dict(fan_block=16, lb=4, exit_rows=8, two_pass_cut=0.2,
                 two_pass_cut2=0.45, two_pass_cap=0.25),
            dict(fan_block=16, lb=4, exit_rows=8, two_pass_cut=0.12,
                 two_pass_cut2=0.3, two_pass_cap=0.35, two_pass_cap2=0.3),
        ]:
            m = bake_mrays(syn, **cfg)
            print(f"  {cfg} -> {m:.2f} Mrays/s", flush=True)

    if which == "huge":
        syn = make_building_scene(atlas_res=256, rooms=(6, 5), subdiv=28)
        print(f"30-room building: {syn.mesh.num_faces} tris", flush=True)
        for cfg in [
            dict(fan_block=16, lb=4, exit_rows=8, two_pass_cut=0.05,
                 two_pass_cut2=0.15, two_pass_cap=0.45, n_meas=1),
            dict(fan_block=16, lb=4, exit_rows=8, two_pass_cut=0.06,
                 two_pass_cut2=0.16, two_pass_cap=0.45, n_meas=1),
            dict(fan_block=16, lb=4, exit_rows=8, two_pass_cut=0.08,
                 two_pass_cut2=0.16, two_pass_cap=0.4, n_meas=1),
            dict(fan_block=16, lb=4, exit_rows=8, two_pass_cut=0.1,
                 two_pass_cut2=0.25, two_pass_cap=0.4, n_meas=1),
        ]:
            m = bake_mrays(syn, **cfg)
            print(f"  {cfg} -> {m:.2f} Mrays/s", flush=True)

    if which in ("apartment", "both"):
        syn = make_apartment_scene(atlas_res=256, subdiv=24)
        print(f"apartment: {syn.mesh.num_faces} tris", flush=True)
        for cfg in [
            dict(fan_block=32, lb=4, exit_rows=16, n_meas=3),
            dict(fan_block=32, lb=4, exit_rows=16, proxy_k=256, n_meas=3),
            dict(fan_block=32, lb=4, exit_rows=16, proxy_k=1024, n_meas=3),
        ]:
            m = bake_mrays(syn, **cfg)
            print(f"  {cfg} -> {m:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
