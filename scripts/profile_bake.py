"""Phase-by-phase profile of the culled IrT bake on TPU.

Times, per 4096-texel x 2048-spp batch (8.4M rays):
  prep    — dirs gen + octant sort + wedge tiling
  cast    — prep + culled Pallas wedge kernel
  full    — single-chip bake_batch (prep + cast + RGBE radiance + estimator)
  sharded — the ShardedIrradianceBaker bench path (1 local device)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
BATCH = 4096
WEDGES = 4
FAN_BLOCK = 32
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
    from texir_code_tpu.ops.pallas_culled import (
        ClusterScene,
        cast_fans_culled,
        sort_dirs_octant,
        tile_rows,
        wedge_rows,
    )
    from texir_code_tpu.parallel.bake import ShardedIrradianceBaker
    from texir_code_tpu.parallel.mesh import make_device_mesh

    syn = make_apartment_scene(atlas_res=256, subdiv=24)
    fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
    tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
    fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
    clusters = ClusterScene.from_fan(fan, lb=32)
    geom = bake_geometry_textures(syn.mesh, 128)

    vr, vc = np.nonzero(geom.valid)
    order = morton_order(geom.position[vr, vc])
    vr, vc = vr[order], vc[order]
    pts0 = geom.position[vr, vc]
    nrm0 = geom.normal[vr, vc]
    n = len(pts0)
    need = BATCH * (N + 1)
    reps = (need + n - 1) // n
    pts = np.tile(pts0, (reps, 1))[:need]
    nrm = np.tile(nrm0, (reps, 1))[:need]

    baker = IrradianceTextureBaker(
        tbl, spp=SPP, texel_batch=BATCH, cluster_scene=clusters, wedges=WEDGES
    )
    baker.fan_block = FAN_BLOCK
    sharded = ShardedIrradianceBaker(
        tbl, spp=SPP, texel_batch=BATCH, mesh=make_device_mesh(),
        cluster_scene=clusters, wedges=WEDGES,
    )
    sharded.fan_block = FAN_BLOCK

    def inputs(i):
        sl = slice(i * BATCH, (i + 1) * BATCH)
        ids = jnp.arange(sl.start, sl.stop, dtype=jnp.int32)
        return jnp.asarray(pts[sl]), jnp.asarray(nrm[sl]), ids, jnp.int32(7 + i)

    @jax.jit
    def prep_fn(points, normals, texel_ids, seed):
        nrm_t = tuple(normals[:, k] for k in range(3))
        dirs = baker._fan_dirs(nrm_t, texel_ids, seed)
        ds = sort_dirs_octant(dirs)
        rows_d = tuple(wedge_rows(a, WEDGES) for a in ds)
        origins = tuple(
            points[:, k] + baker.surface_eps * normals[:, k] for k in range(3)
        )
        rows_o = tuple(tile_rows(a, WEDGES) for a in origins)
        return rows_o, rows_d

    @jax.jit
    def cast_fn(points, normals, texel_ids, seed):
        rows_o, rows_d = prep_fn(points, normals, texel_ids, seed)
        return cast_fans_culled(
            clusters, rows_o, rows_d, emit_uv=False, fan_block=FAN_BLOCK
        ).t

    def timeit(fn, tag):
        out = fn(*inputs(0))
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [fn(*inputs(i)) for i in range(1, N + 1)]
        jax.block_until_ready(outs)
        dt = time.time() - t0
        print(f"{tag}: {N * BATCH * SPP / dt / 1e6:.2f} Mrays/s "
              f"({dt / N * 1e3:.0f} ms/batch)")

    timeit(prep_fn, "prep (dirs+sort+wedge)")
    timeit(cast_fn, "prep+cast")
    timeit(baker.bake_batch, "full bake_batch")
    timeit(sharded.bake_batch, "sharded bake_batch")


if __name__ == "__main__":
    main()
