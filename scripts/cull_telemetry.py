"""Cull/early-exit telemetry: clusters visited vs candidates vs total,
per kernel block, on the apartment and building scenes (TPU)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
BATCH = 4096


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
        sort_dirs_octant,
        tile_rows,
        wedge_rows,
    )

    for name, syn, lb in [
        ("apt", make_apartment_scene(atlas_res=256, subdiv=24), 16),
        ("big", make_building_scene(atlas_res=256, subdiv=28), 16),
    ]:
        fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
        tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
        fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
        clusters = ClusterScene.from_fan(fan, lb=lb)
        geom = bake_geometry_textures(syn.mesh, 128)

        vr, vc = np.nonzero(geom.valid)
        order = morton_order(geom.position[vr, vc])
        vr, vc = vr[order], vc[order]
        pts = geom.position[vr, vc][:BATCH]
        nrm = geom.normal[vr, vc][:BATCH]

        baker = IrradianceTextureBaker(
            tbl, spp=SPP, texel_batch=BATCH, cluster_scene=clusters, wedges=4
        )
        g = baker.wedges

        pts_j = jnp.asarray(pts)
        nrm_j = jnp.asarray(nrm)
        ids = jnp.arange(BATCH, dtype=jnp.int32)
        nrm_t = tuple(nrm_j[:, k] for k in range(3))
        dirs = baker._fan_dirs(nrm_t, ids, jnp.int32(7))
        ds = sort_dirs_octant(dirs)
        rows_d = tuple(wedge_rows(a, g) for a in ds)
        origins = tuple(
            pts_j[:, k] + baker.surface_eps * nrm_j[:, k] for k in range(3)
        )
        rows_o = tuple(tile_rows(a, g) for a in origins)
        hit = cast_fans_culled(
            clusters, rows_o, rows_d, fan_block=32, debug_emit_visits=True
        )
        visited = np.asarray(hit.u[:, 0])   # per row; same across block
        cand = np.asarray(hit.v[:, 0])
        miss = float(np.mean(~np.isfinite(np.asarray(hit.t))))
        c = clusters.num_clusters
        print(f"{name}: clusters={c} "
              f"cand/blk mean={cand.mean():.0f} p90={np.percentile(cand, 90):.0f} "
              f"visited mean={visited.mean():.0f} "
              f"p90={np.percentile(visited, 90):.0f} max={visited.max():.0f} "
              f"miss_frac={miss:.4f}", flush=True)


if __name__ == "__main__":
    main()
