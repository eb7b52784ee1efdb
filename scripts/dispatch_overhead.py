"""Measure per-dispatch overhead: N separate bake_batch dispatches vs one
jitted lax.map over the same N batches (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
BATCH = 4096
N = 4


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
    clusters = ClusterScene.from_fan(fan, lb=8)
    geom = bake_geometry_textures(syn.mesh, 128)

    vr, vc = np.nonzero(geom.valid)
    order = morton_order(geom.position[vr, vc])
    vr, vc = vr[order], vc[order]
    pts0 = geom.position[vr, vc]
    nrm0 = geom.normal[vr, vc]
    need = BATCH * 2 * N
    reps = (need + len(pts0) - 1) // len(pts0)
    pts = np.tile(pts0, (reps, 1))[:need]
    nrm = np.tile(nrm0, (reps, 1))[:need]

    baker = IrradianceTextureBaker(
        tbl, spp=SPP, texel_batch=BATCH, cluster_scene=clusters, wedges=4
    )
    baker.fan_block = 32
    baker.exit_rows = 16

    def inputs(i):
        sl = slice(i * BATCH, (i + 1) * BATCH)
        ids = jnp.arange(sl.start, sl.stop, dtype=jnp.int32)
        return (jnp.asarray(pts[sl]), jnp.asarray(nrm[sl]), ids,
                jnp.int32(7 + i))

    # A: N separate dispatches
    out = baker.bake_batch(*inputs(0))
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [baker.bake_batch(*inputs(i)) for i in range(1, N + 1)]
    jax.block_until_ready(outs)
    dt = time.time() - t0
    print(f"separate: {N * BATCH * SPP / dt / 1e6:.2f} Mrays/s "
          f"({dt / N * 1e3:.0f} ms/batch)", flush=True)

    # B: one dispatch, lax.map over N batches
    @jax.jit
    def mapped(p, n, ids, seed):
        return jax.lax.map(
            lambda a: baker._bake_culled_impl(a[0], a[1], a[2], seed),
            (p, n, ids),
        )

    def minputs(i0):
        sl = slice(i0 * BATCH, (i0 + N) * BATCH)
        p = jnp.asarray(pts[sl]).reshape(N, BATCH, 3)
        n = jnp.asarray(nrm[sl]).reshape(N, BATCH, 3)
        ids = jnp.arange(sl.start, sl.stop, dtype=jnp.int32).reshape(N, BATCH)
        return p, n, ids, jnp.int32(9)

    out = mapped(*minputs(0))
    jax.block_until_ready(out)
    t0 = time.time()
    out = mapped(*minputs(1))
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"lax.map x{N}: {N * BATCH * SPP / dt / 1e6:.2f} Mrays/s "
          f"({dt / N * 1e3:.0f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
