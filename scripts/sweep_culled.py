"""Parameter sweep for the culled bake on TPU.

Times the full _bake_batch_culled (prep + cast + radiance + estimator) for
combinations of (emit_uv, wedges, fan_block, cluster lb) on the apartment
bench scene, printing Mrays/s for each.  Fresh baker per config (jitted
methods are keyed on object identity).
"""

import itertools
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
    need = BATCH * (N + 1)
    reps = (need + len(pts0) - 1) // len(pts0)
    pts = np.tile(pts0, (reps, 1))[:need]
    nrm = np.tile(nrm0, (reps, 1))[:need]

    clusters_by_lb = {}

    def run_cfg(emit_uv, wedges, fan_block, lb):
        if lb not in clusters_by_lb:
            clusters_by_lb[lb] = ClusterScene.from_fan(fan, lb=lb)
        baker = IrradianceTextureBaker(
            tbl, spp=SPP, texel_batch=BATCH,
            cluster_scene=clusters_by_lb[lb], wedges=wedges,
        )
        baker.fan_block = fan_block
        baker.emit_uv = emit_uv

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

    cfgs = []
    # phase 1: emit_uv on/off at current defaults
    cfgs += [(False, 4, 32, 32), (True, 4, 32, 32)]
    # phase 2: wedges sweep with emit_uv
    cfgs += [(True, 2, 32, 32), (True, 8, 32, 32)]
    # phase 3: fan_block sweep
    cfgs += [(True, 4, 8, 32), (True, 4, 16, 32), (True, 4, 64, 32)]
    # phase 4: cluster size sweep
    cfgs += [(True, 4, 32, 16), (True, 4, 32, 64)]

    for cfg in cfgs:
        m = run_cfg(*cfg)
        print(f"emit_uv={cfg[0]} wedges={cfg[1]} fan_block={cfg[2]} "
              f"lb={cfg[3]}: {m:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
