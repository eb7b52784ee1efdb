"""Third-phase sweep: top configs under the direction-projected t bound,
on both the apartment and the 104k-tri building scene."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
BATCH = 4096
N = 3


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
    from texir_code_tpu.ops.pallas_culled import ClusterScene

    def scene_setup(syn):
        fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
        tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
        fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
        geom = bake_geometry_textures(syn.mesh, 128)
        vr, vc = np.nonzero(geom.valid)
        order = morton_order(geom.position[vr, vc])
        vr, vc = vr[order], vc[order]
        return tbl, fan, geom.position[vr, vc], geom.normal[vr, vc]

    def run_cfg(tbl, fan, pts0, nrm0, wedges, fan_block, lb):
        need = BATCH * (N + 1)
        reps = (need + len(pts0) - 1) // len(pts0)
        pts = np.tile(pts0, (reps, 1))[:need]
        nrm = np.tile(nrm0, (reps, 1))[:need]
        clusters = ClusterScene.from_fan(fan, lb=lb)
        baker = IrradianceTextureBaker(
            tbl, spp=SPP, texel_batch=BATCH, cluster_scene=clusters,
            wedges=wedges,
        )
        baker.fan_block = fan_block

        def inputs(i):
            sl = slice(i * BATCH, (i + 1) * BATCH)
            ids = jnp.arange(sl.start, sl.stop, dtype=jnp.int32)
            return (jnp.asarray(pts[sl]), jnp.asarray(nrm[sl]), ids,
                    jnp.int32(7 + i))

        out = baker.bake_batch(*inputs(0))
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [baker.bake_batch(*inputs(i)) for i in range(1, N + 1)]
        jax.block_until_ready(outs)
        dt = time.time() - t0
        return N * BATCH * SPP / dt / 1e6

    apt = scene_setup(make_apartment_scene(atlas_res=256, subdiv=24))
    for fb_, lb in [(32, 8), (32, 16), (16, 8), (32, 4), (64, 8)]:
        m = run_cfg(*apt, wedges=4, fan_block=fb_, lb=lb)
        print(f"apt fan_block={fb_} lb={lb}: {m:.2f} Mrays/s", flush=True)

    big = scene_setup(make_building_scene(atlas_res=256, subdiv=28))
    for fb_, lb in [(32, 8), (32, 16), (32, 32)]:
        m = run_cfg(*big, wedges=4, fan_block=fb_, lb=lb)
        print(f"big fan_block={fb_} lb={lb}: {m:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
