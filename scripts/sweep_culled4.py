"""Prefiltered-fetch validation + config retest (idle host, TPU).

1. Bake 4096 apartment texels with exact-bilinear vs prefiltered fetch:
   report rel-error stats + PSNR (fetch-approximation quality bound).
2. Re-sweep (wedges, fan_block, lb) with the prefiltered fetch on the
   apartment and the 104k-tri building.
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

    def mk_baker(tbl, fan, wedges, fan_block, lb, supersample=2,
                 _cache={}):
        key = (id(fan), lb)
        if key not in _cache:
            _cache[key] = ClusterScene.from_fan(fan, lb=lb)
        baker = IrradianceTextureBaker(
            tbl, spp=SPP, texel_batch=BATCH, cluster_scene=_cache[key],
            wedges=wedges,
        )
        baker.fan_block = fan_block
        baker.rgbe_supersample = supersample
        return baker

    def inputs(pts, nrm, i):
        sl = slice(i * BATCH, (i + 1) * BATCH)
        ids = jnp.arange(sl.start, sl.stop, dtype=jnp.int32)
        return (jnp.asarray(pts[sl]), jnp.asarray(nrm[sl]), ids,
                jnp.int32(7 + i))

    def tile(pts0, nrm0):
        need = BATCH * (N + 1)
        reps = (need + len(pts0) - 1) // len(pts0)
        return (np.tile(pts0, (reps, 1))[:need], np.tile(nrm0, (reps, 1))[:need])

    apt = scene_setup(make_apartment_scene(atlas_res=256, subdiv=24))
    tbl, fan, pts0, nrm0 = apt
    pts, nrm = tile(pts0, nrm0)

    # 1. error of prefiltered vs exact fetch on one baked batch
    exact = mk_baker(tbl, fan, 4, 32, 16, supersample=0)
    pre = mk_baker(tbl, fan, 4, 32, 16, supersample=2)
    a = np.asarray(exact.bake_batch(*inputs(pts, nrm, 0)))
    b = np.asarray(pre.bake_batch(*inputs(pts, nrm, 0)))
    denom = np.maximum(np.abs(a), 1e-3)
    rel = np.abs(a - b) / denom
    mse = float(np.mean((a - b) ** 2))
    peak = float(np.maximum(a.max(), 1e-9))
    psnr = 10 * np.log10(peak**2 / max(mse, 1e-20))
    print(f"prefilter error: rel mean={rel.mean():.2e} p99="
          f"{np.percentile(rel, 99):.2e} max={rel.max():.2e} "
          f"PSNR={psnr:.1f} dB", flush=True)

    def timed(baker, pts, nrm, tag):
        out = baker.bake_batch(*inputs(pts, nrm, 0))
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [baker.bake_batch(*inputs(pts, nrm, i)) for i in range(1, N + 1)]
        jax.block_until_ready(outs)
        dt = time.time() - t0
        print(f"{tag}: {N * BATCH * SPP / dt / 1e6:.2f} Mrays/s", flush=True)

    timed(exact, pts, nrm, "apt exact-bilinear w4 fb32 lb16")
    timed(pre, pts, nrm, "apt prefiltered  w4 fb32 lb16")
    for w, fb_, lb in [(4, 32, 8), (8, 32, 16), (8, 16, 8), (4, 16, 8)]:
        timed(mk_baker(tbl, fan, w, fb_, lb), pts, nrm,
              f"apt prefiltered  w{w} fb{fb_} lb{lb}")

    big = scene_setup(make_building_scene(atlas_res=256, subdiv=28))
    tblb, fanb, bpts0, bnrm0 = big
    bpts, bnrm = tile(bpts0, bnrm0)
    for w, fb_, lb in [(4, 32, 16), (8, 32, 16), (8, 16, 8), (16, 16, 8)]:
        timed(mk_baker(tblb, fanb, w, fb_, lb), bpts, bnrm,
              f"big prefiltered  w{w} fb{fb_} lb{lb}")


if __name__ == "__main__":
    main()
