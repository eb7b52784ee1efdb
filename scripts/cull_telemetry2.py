"""Deeper cull telemetry: per-block max hit t vs candidate distance curve.

For each kernel block: visited (from the kernel), candidates, and the
host-side count of candidates with dist-bound < the block's final max hit t
(the asymptotic early-exit point).  visited >> below_maxt would indicate an
exit bug; visited ~= below_maxt means max-t is genuinely large (e.g.
doorway rays) and the lever is tighter wedges/blocks."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
BATCH = 4096
FB = 32
LB = 16
G = 4


def main():
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.data.synthetic import (
        make_apartment_scene,
        make_building_scene,
    )
    from texir_code_tpu.geometry.bvh import build_bvh
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
        cull_blocks,
        sort_dirs_octant,
        tile_rows,
        wedge_rows,
    )

    for name, syn in [
        ("apt", make_apartment_scene(atlas_res=256, subdiv=24)),
        ("big", make_building_scene(atlas_res=256, subdiv=28)),
    ]:
        fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
        tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
        fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
        clusters = ClusterScene.from_fan(fan, lb=LB)
        geom = bake_geometry_textures(syn.mesh, 128)

        vr, vc = np.nonzero(geom.valid)
        order = morton_order(geom.position[vr, vc])
        vr, vc = vr[order], vc[order]
        pts = geom.position[vr, vc][:BATCH]
        nrm = geom.normal[vr, vc][:BATCH]

        baker = IrradianceTextureBaker(
            tbl, spp=SPP, texel_batch=BATCH, cluster_scene=clusters, wedges=G
        )
        pts_j = jnp.asarray(pts)
        nrm_j = jnp.asarray(nrm)
        ids = jnp.arange(BATCH, dtype=jnp.int32)
        nrm_t = tuple(nrm_j[:, k] for k in range(3))
        dirs = baker._fan_dirs(nrm_t, ids, jnp.int32(7))
        ds = sort_dirs_octant(dirs)
        rows_d = tuple(wedge_rows(a, G) for a in ds)
        origins = tuple(
            pts_j[:, k] + baker.surface_eps * nrm_j[:, k] for k in range(3)
        )
        rows_o = tuple(tile_rows(a, G) for a in origins)

        # kernel run (visited) + a plain run (hit t)
        hit_dbg = cast_fans_culled(
            clusters, rows_o, rows_d, fan_block=FB, debug_emit_visits=True
        )
        hit = cast_fans_culled(clusters, rows_o, rows_d, fan_block=FB)
        visited = np.asarray(hit_dbg.u[:, 0])[::FB]          # per block
        cand = np.asarray(hit_dbg.v[:, 0])[::FB]
        maxt = np.asarray(hit.t).reshape(-1, FB * hit.t.shape[1])
        maxt = np.asarray(hit.t).reshape(len(visited), -1).max(axis=1)

        _, count, dist = cull_blocks(clusters, rows_o, rows_o, rows_d, FB)
        dist = np.asarray(dist[:, 0, :])
        below = (dist < maxt[:, None]).sum(axis=1)

        print(f"{name}: blocks={len(visited)} cand mean={cand.mean():.0f} "
              f"visited mean={visited.mean():.0f} "
              f"below_maxt mean={below.mean():.0f} "
              f"maxt p50={np.percentile(maxt, 50):.1f} "
              f"p90={np.percentile(maxt, 90):.1f} max={maxt.max():.1f}",
              flush=True)

        # what if doorway rays were capped: counterfactual max-t at p90
        t90 = np.percentile(np.asarray(hit.t), 90, axis=1)
        t90b = t90.reshape(len(visited), -1).max(axis=1)
        below90 = (dist < t90b[:, None]).sum(axis=1)
        print(f"{name}: counterfactual visited if exit used per-row p90 t: "
              f"{below90.mean():.0f}", flush=True)


if __name__ == "__main__":
    main()
