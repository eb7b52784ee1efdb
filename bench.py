"""Benchmark: IrT bake ray throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference pipeline's heaviest stage — Monte-Carlo irradiance
baking at 2048 uniform hemisphere samples/texel (reference
models/tracer_o3d_irt.py:156-174, configs/hdrhouse_ir_texture.conf:24) — on
a two-room synthetic apartment (24k+ triangles, doorway + clutter occlusion;
see texir_code_tpu/data/synthetic.py) using the shared-origin fan tracer
with exact overflow fallback.

vs_baseline: ratio against BASELINE_MRAYS = 15.0 Mrays/s — an estimate of
the reference implementation's ray engine on comparable host hardware:
Embree (Open3D RaycastingScene) sustains ~1-2 Mrays/s per core·GHz for
incoherent secondary rays; the reference runs it on the trainer host's CPU
with a GPU→CPU→GPU tensor round trip per batch
(models/mat_nvdiffrast.py:292-320).  On this container's 4 cores that bounds
the reference path well under ~15 Mrays/s; the constant is fixed here so the
ratio is comparable across rounds.  (No Embree build exists in this image to
measure directly; the reference publishes no numbers — BASELINE.md.)
"""

import json
import sys
import time

import numpy as np

BASELINE_MRAYS = 15.0
SPP = 2048
TEXEL_BATCH = 4096
ATLAS_GEOM_RES = 128
SUBDIV = 24
MEASURE_BATCHES = 3


def main():
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.data.synthetic import make_apartment_scene
    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.models.tbl import build_tbl
    from texir_code_tpu.models.tracer_irt import (
        IrradianceTextureBaker,
        bake_geometry_textures,
    )
    from texir_code_tpu.ops.fan_raycast import FanScene

    scene = make_apartment_scene(atlas_res=256, subdiv=SUBDIV)
    fb = build_bvh(scene.mesh.vertices, scene.mesh.faces)
    tbl = build_tbl(scene.mesh, scene.hdr_texture)
    fan = FanScene.from_flat(fb, triangle_uvs=scene.mesh.triangle_uvs())
    geom = bake_geometry_textures(scene.mesh, ATLAS_GEOM_RES)

    # exhaustive leaf budget: exact with zero overflow logic — conservative
    # beam culling cannot capture occlusion in closed scenes, so the honest
    # configuration streams every leaf (the workload is VPU-flop-bound)
    baker = IrradianceTextureBaker(
        tbl, spp=SPP, texel_batch=TEXEL_BATCH, fan_scene=fan,
        max_leaves=fan.num_leaves,
    )

    vr, vc = np.nonzero(geom.valid)
    pts = geom.position[vr, vc]
    nrm = geom.normal[vr, vc]
    n = len(pts)
    reps = (TEXEL_BATCH * (MEASURE_BATCHES + 1) + n - 1) // n
    pts = np.tile(pts, (reps, 1))[: TEXEL_BATCH * (MEASURE_BATCHES + 1)]
    nrm = np.tile(nrm, (reps, 1))[: TEXEL_BATCH * (MEASURE_BATCHES + 1)]
    seed = jnp.int32(7)

    def run_batch(i):
        sl = slice(i * TEXEL_BATCH, (i + 1) * TEXEL_BATCH)
        ids = jnp.arange(i * TEXEL_BATCH, (i + 1) * TEXEL_BATCH, dtype=jnp.int32)
        return baker.bake_batch(
            jnp.asarray(pts[sl]), jnp.asarray(nrm[sl]), ids, seed
        )

    # warmup/compile
    out = run_batch(0)
    jax.block_until_ready(out)

    t0 = time.time()
    for i in range(1, MEASURE_BATCHES + 1):
        out = run_batch(i)
    jax.block_until_ready(out)
    dt = time.time() - t0

    rays = MEASURE_BATCHES * TEXEL_BATCH * SPP
    mrays = rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "irt_bake_throughput",
                "value": round(mrays, 2),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
