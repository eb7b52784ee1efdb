"""Sub-phase profile of the culled bake's radiance stage on TPU.

Per 4096x2048-ray batch, times:
  uvlerp   — 6-gather per-corner uv interpolation only
  rgbe     — 4-gather RGBE bilinear fetch only (from precomputed uv)
  estim    — estimator arithmetic only (from precomputed lighting)
  radiance — the full _fan_estimate_prim_rgbe
  cast_uv  — culled cast with emit_uv=True (kernel-side uv interp)
  cast     — culled cast emit_uv=False (baseline)
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
    clusters = ClusterScene.from_fan(fan, lb=32)
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
        tbl, spp=SPP, texel_batch=BATCH, cluster_scene=clusters, wedges=WEDGES
    )
    baker.fan_block = FAN_BLOCK

    def inputs(i):
        sl = slice(i * BATCH, (i + 1) * BATCH)
        ids = jnp.arange(sl.start, sl.stop, dtype=jnp.int32)
        return jnp.asarray(pts[sl]), jnp.asarray(nrm[sl]), ids, jnp.int32(7 + i)

    def prep(points, normals, texel_ids, seed):
        nrm_t = tuple(normals[:, k] for k in range(3))
        dirs = baker._fan_dirs(nrm_t, texel_ids, seed)
        ds = sort_dirs_octant(dirs)
        rows_d = tuple(wedge_rows(a, WEDGES) for a in ds)
        origins = tuple(
            points[:, k] + baker.surface_eps * normals[:, k] for k in range(3)
        )
        rows_o = tuple(tile_rows(a, WEDGES) for a in origins)
        rows_n = tuple(tile_rows(a, WEDGES) for a in nrm_t)
        return rows_o, rows_d, rows_n

    jprep = jax.jit(prep)

    def timed(make_fn, tag):
        fn = jax.jit(make_fn)
        out = fn(*inputs(0))
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [fn(*inputs(i)) for i in range(1, N + 1)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / N
        print(f"{tag}: {dt * 1e3:.0f} ms/batch "
              f"({BATCH * SPP / dt / 1e6:.2f} Mrays/s)")

    def cast(points, normals, texel_ids, seed, emit_uv=False):
        rows_o, rows_d, rows_n = prep(points, normals, texel_ids, seed)
        hit = cast_fans_culled(
            clusters, rows_o, rows_d, emit_uv=emit_uv, fan_block=FAN_BLOCK
        )
        return hit, rows_d, rows_n

    timed(lambda *a: cast(*a)[0].t, "cast (emit_uv=False)")
    timed(lambda *a: cast(*a, emit_uv=True)[0].t, "cast (emit_uv=True)")

    def uvlerp(hit):
        valid = jnp.isfinite(hit.t) & (hit.t > 1e-4)
        prim = jnp.where(valid, hit.prim, 0)
        u = jnp.clip(hit.u, 0.0, 1.0)
        v = jnp.clip(hit.v, 0.0, 1.0)
        w0 = 1.0 - u - v
        base = prim * 3
        uu = (jnp.take(tbl.uv_u, base) * w0
              + jnp.take(tbl.uv_u, base + 1) * u
              + jnp.take(tbl.uv_u, base + 2) * v)
        vv = (jnp.take(tbl.uv_v, base) * w0
              + jnp.take(tbl.uv_v, base + 1) * u
              + jnp.take(tbl.uv_v, base + 2) * v)
        return uu, vv, valid

    def full_radiance(*a):
        hit, rows_d, rows_n = cast(*a)
        return baker._fan_estimate_prim_rgbe(
            hit.t, hit.prim, hit.u, hit.v, rows_d, rows_n
        )

    timed(full_radiance, "cast+radiance (prim path)")

    def uv_radiance(*a):
        hit, rows_d, rows_n = cast(*a, emit_uv=True)
        return baker._fan_estimate_uv(hit.t, hit.u, hit.v, rows_d, rows_n)

    timed(uv_radiance, "cast+radiance (emit_uv path)")

    def lerp_only(*a):
        hit, _, _ = cast(*a)
        return uvlerp(hit)[0]

    timed(lerp_only, "cast+uvlerp only")

    def rgbe_only(*a):
        hit, _, _ = cast(*a)
        uu = jnp.clip(jnp.abs(hit.u), 0.0, 1.0)
        vv = jnp.clip(jnp.abs(hit.v), 0.0, 1.0)
        return bilinear_rgbe(baker._rgbe, uu, vv)[0]

    timed(rgbe_only, "cast+rgbe only (fake uv)")

    def estim_only(*a):
        hit, rows_d, rows_n = cast(*a)
        z = jnp.maximum(hit.u, 0.0)
        lighting = (z, z, z)
        return jnp.stack(
            irradiance_estimator_soa(lighting, rows_d, rows_n, SPP), axis=-1
        )

    timed(estim_only, "cast+estimator only (fake lighting)")


if __name__ == "__main__":
    main()
