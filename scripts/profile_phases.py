"""Clean sub-phase profile of the culled bake (run with an IDLE host).

All variants in one process, N=6 varied batches each, same config
(emit_uv, wedges=4, fan_block=32, lb=8, exit_rows=16).  Phases are cumulative jits:
  dirs       — generate_dir_soa only
  sort       — dirs + octant sort
  prep       — dirs + sort + wedge/tile rows
  cast       — prep + culled kernel (emit_uv)
  rgbe       — cast + RGBE bilinear fetch (no estimator)
  full       — _bake_culled_impl (cast + radiance + estimator + fold)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
BATCH = 4096
N = 6


def main():
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.data.synthetic import make_apartment_scene
    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.models.tbl import bilinear_rgbe, build_tbl_from_flat
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
    from texir_code_tpu.ops.shading import irradiance_estimator_soa

    syn = make_apartment_scene(atlas_res=256, subdiv=24)
    fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
    tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
    fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
    clusters = ClusterScene.from_fan(fan, lb=8, dense=True)
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

    baker = IrradianceTextureBaker(
        tbl, spp=SPP, texel_batch=BATCH, cluster_scene=clusters, wedges=4
    )
    baker.fan_block = 32
    baker.exit_rows = 16
    G = 4

    def inputs(i):
        sl = slice(i * BATCH, (i + 1) * BATCH)
        ids = jnp.arange(sl.start, sl.stop, dtype=jnp.int32)
        return (jnp.asarray(pts[sl]), jnp.asarray(nrm[sl]), ids,
                jnp.int32(7 + i))

    def dirs_fn(points, normals, texel_ids, seed):
        nrm_t = tuple(normals[:, k] for k in range(3))
        return baker._fan_dirs(nrm_t, texel_ids, seed)

    def sort_fn(points, normals, texel_ids, seed):
        return sort_dirs_octant(dirs_fn(points, normals, texel_ids, seed))

    def prep_fn(points, normals, texel_ids, seed):
        ds = sort_fn(points, normals, texel_ids, seed)
        rows_d = tuple(wedge_rows(a, G) for a in ds)
        origins = tuple(
            points[:, k] + baker.surface_eps * normals[:, k] for k in range(3)
        )
        rows_o = tuple(tile_rows(a, G) for a in origins)
        return rows_o, rows_d

    def cast_fn(points, normals, texel_ids, seed):
        rows_o, rows_d = prep_fn(points, normals, texel_ids, seed)
        hit = cast_fans_culled(
            clusters, rows_o, rows_d, emit_uv=True, fan_block=32, exit_rows=16
        )
        return hit, rows_d

    def rgbe_fn(points, normals, texel_ids, seed):
        hit, rows_d = cast_fn(points, normals, texel_ids, seed)
        return bilinear_rgbe(
            baker._rgbe, jnp.clip(hit.u, 0.0, 1.0), jnp.clip(hit.v, 0.0, 1.0)
        )[0]

    variants = [
        ("dirs", lambda *a: dirs_fn(*a)[0]),
        ("sort", lambda *a: sort_fn(*a)[0]),
        ("prep", lambda *a: prep_fn(*a)[1][0]),
        ("cast", lambda *a: cast_fn(*a)[0].t),
        ("rgbe", rgbe_fn),
        ("full", baker._bake_culled_impl),
    ]
    for tag, fn in variants:
        jfn = jax.jit(fn)
        out = jfn(*inputs(0))
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [jfn(*inputs(i)) for i in range(1, N + 1)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / N
        print(f"{tag}: {dt * 1e3:.0f} ms/batch "
              f"({BATCH * SPP / dt / 1e6:.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
