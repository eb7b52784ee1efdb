"""Second-phase sweep around the best config (emit_uv=True, wedges=4,
fan_block=32, lb=16): smaller clusters, batch size, azimuth chunking."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
N = 3


def main():
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.data.synthetic import make_apartment_scene
    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.models.tbl import build_tbl_from_flat
    from texir_code_tpu.models.tracer_irt import (
        IrradianceTextureBaker,
        bake_geometry_textures,
        morton_order,
    )
    from texir_code_tpu.ops.fan_raycast import FanScene
    from texir_code_tpu.ops.pallas_culled import ClusterScene

    syn = make_apartment_scene(atlas_res=256, subdiv=24)
    fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
    tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
    fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
    geom = bake_geometry_textures(syn.mesh, 128)

    vr, vc = np.nonzero(geom.valid)
    order = morton_order(geom.position[vr, vc])
    vr, vc = vr[order], vc[order]
    pts0 = geom.position[vr, vc]
    nrm0 = geom.normal[vr, vc]

    clusters_by_lb = {}

    def run_cfg(wedges, fan_block, lb, batch, chunk_mode="octant"):
        need = batch * (N + 1)
        reps = (need + len(pts0) - 1) // len(pts0)
        pts = np.tile(pts0, (reps, 1))[:need]
        nrm = np.tile(nrm0, (reps, 1))[:need]
        if lb not in clusters_by_lb:
            clusters_by_lb[lb] = ClusterScene.from_fan(fan, lb=lb)
        baker = IrradianceTextureBaker(
            tbl, spp=SPP, texel_batch=batch,
            cluster_scene=clusters_by_lb[lb], wedges=wedges,
        )
        baker.fan_block = fan_block
        baker.chunk_mode = chunk_mode

        def inputs(i):
            sl = slice(i * batch, (i + 1) * batch)
            ids = jnp.arange(sl.start, sl.stop, dtype=jnp.int32)
            return (jnp.asarray(pts[sl]), jnp.asarray(nrm[sl]), ids,
                    jnp.int32(7 + i))

        out = baker.bake_batch(*inputs(0))
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [baker.bake_batch(*inputs(i)) for i in range(1, N + 1)]
        jax.block_until_ready(outs)
        dt = time.time() - t0
        return N * batch * SPP / dt / 1e6

    cfgs = [
        dict(wedges=4, fan_block=32, lb=16, batch=4096),   # current best
        dict(wedges=4, fan_block=32, lb=8, batch=4096),
        dict(wedges=4, fan_block=16, lb=16, batch=4096),
        dict(wedges=4, fan_block=32, lb=16, batch=8192),
        dict(wedges=8, fan_block=32, lb=16, batch=4096),
        dict(wedges=4, fan_block=32, lb=16, batch=4096, chunk_mode="azimuth"),
    ]
    for cfg in cfgs:
        m = run_cfg(**cfg)
        print(f"{cfg}: {m:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
