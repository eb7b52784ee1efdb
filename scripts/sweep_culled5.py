"""Sweep fan_block x lb x exit_rows for the shared-stream culled kernel.

The SMEM-threshold exit groups decouple exit granularity from DMA cost, so
configs that were DMA-bound in the round-2 sweeps (big fan blocks, big
clusters) are worth re-measuring: fb=64 halves the number of candidate
streams, lb=16 halves the per-stream DMA count at the same bytes.
"""

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

    caches = {}

    def mk_baker(tbl, fan, wedges, fan_block, lb, exit_rows):
        key = (id(fan), lb)
        if key not in caches:
            caches[key] = ClusterScene.from_fan(fan, lb=lb)
        baker = IrradianceTextureBaker(
            tbl, spp=SPP, texel_batch=BATCH, cluster_scene=caches[key],
            wedges=wedges,
        )
        baker.fan_block = fan_block
        baker.exit_rows = exit_rows
        return baker

    def inputs(pts, nrm, i):
        sl = slice(i * BATCH, (i + 1) * BATCH)
        ids = jnp.arange(sl.start, sl.stop, dtype=jnp.int32)
        return (jnp.asarray(pts[sl]), jnp.asarray(nrm[sl]), ids,
                jnp.int32(7 + i))

    def tile(pts0, nrm0):
        need = BATCH * (N + 1)
        reps = (need + len(pts0) - 1) // len(pts0)
        return (np.tile(pts0, (reps, 1))[:need],
                np.tile(nrm0, (reps, 1))[:need])

    def timed(baker, pts, nrm, tag):
        out = baker.bake_batch(*inputs(pts, nrm, 0))
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [baker.bake_batch(*inputs(pts, nrm, i))
                for i in range(1, N + 1)]
        jax.block_until_ready(outs)
        dt = time.time() - t0
        print(f"{tag}: {N * BATCH * SPP / dt / 1e6:.2f} Mrays/s", flush=True)
        return np.asarray(out)

    apt = scene_setup(make_apartment_scene(atlas_res=256, subdiv=24))
    tbl, fan, pts0, nrm0 = apt
    pts, nrm = tile(pts0, nrm0)
    for fb_, lb_, er_ in [
        (32, 8, 16), (64, 8, 16), (64, 8, 32),
        (32, 16, 16), (64, 16, 16), (32, 16, 8), (128, 8, 16),
    ]:
        timed(mk_baker(tbl, fan, 4, fb_, lb_, er_), pts, nrm,
              f"apt w4 fb{fb_} lb{lb_} er{er_}")

    big = scene_setup(make_building_scene(atlas_res=256, subdiv=28))
    tblb, fanb, bpts0, bnrm0 = big
    bpts, bnrm = tile(bpts0, bnrm0)
    for fb_, lb_, er_ in [
        (16, 8, 0), (16, 16, 0), (32, 8, 16), (32, 16, 16), (16, 8, 8),
    ]:
        timed(mk_baker(tblb, fanb, 4, fb_, lb_, er_), bpts, bnrm,
              f"big w4 fb{fb_} lb{lb_} er{er_}")


if __name__ == "__main__":
    main()
