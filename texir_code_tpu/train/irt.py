"""IrrT stage runner — one-shot irradiance-texture bake.

Rebuild of reference trainer/generate_ir_texture.py:31-82 plus the offline
padding/denoise tool (tools/padding_texture.py:49-87), fused into one runner:
bake → seam padding (distance transform) → denoise (à-trous) → write both
`0_irr_texture.hdr` (raw, next to the mesh, like the reference) and `irt.hdr`
(the padded/denoised texture the Mat stage loads,
models/mat_nvdiffrast.py:73).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from texir_code_tpu.config import Config
from texir_code_tpu.data import hdrio
from texir_code_tpu.train.exp import ExperimentDir, seed_everything


class IrrTextureRunner:
    def __init__(
        self,
        conf: Config,
        expname: str = "default",
        exps_root: str = "exps",
        is_continue: bool = False,
        timestamp: Optional[str] = None,
        conf_path: Optional[str] = None,
        texture_res: int = 1024,
        use_fan: bool = True,
        denoise: bool = True,
    ):
        from texir_code_tpu.geometry import load_obj
        from texir_code_tpu.geometry.bvh import build_bvh
        from texir_code_tpu.models.tbl import build_tbl
        from texir_code_tpu.models.tracer_irt import (
            IrradianceTextureBaker,
            bake_geometry_textures,
        )
        from texir_code_tpu.ops.fan_raycast import FanScene

        self.conf = conf
        self.exp = ExperimentDir(
            exps_root, "IrrT", expname, is_continue, timestamp, conf_path
        )
        self.key = seed_everything(666)
        self.denoise = denoise

        self.path_mesh = conf.get_string("train.path_mesh_open3d")
        hdr_exposure = conf.get_float("train.hdr_exposure", default=0.0)
        self.mesh = load_obj(self.path_mesh)
        tex = hdrio.read_hdr(
            self.path_mesh.replace("out1.obj", "hdr_texture.hdr"), flip=True
        )
        self.tbl = build_tbl(self.mesh, tex, hdr_exposure)

        spp = conf.get_list("train.sample_light", default=[2048, 16])[0]
        # conf-tunable kernel-shape knobs (VERDICT r2 #7) with the measured
        # per-scene defaults documented in PERF.md: the apartment optimum is
        # lb=4 / fan_block=32 / exit_rows=16 / single-pass; multi-room scans
        # prefer fan_block=16 + two_pass_cut~0.25 (PERF.md round 3).
        lb = conf.get_int("train.bake_cluster_lb", default=4)
        fan_block = conf.get_int("train.bake_fan_block", default=32)
        exit_rows = conf.get_int("train.bake_exit_rows", default=16)
        two_pass_cut = conf.get("train.two_pass_cut", None)
        two_pass_cap = conf.get_float("train.two_pass_cap", default=0.125)
        # 3-pass ladder (pays on very large multi-room scans, PERF.md r3)
        two_pass_cut2 = conf.get("train.two_pass_cut2", None)
        two_pass_cap2 = conf.get_float("train.two_pass_cap2", default=0.25)
        # occlusion proxy: pre-trace against the scene's k largest triangles
        # to seed per-ray t bounds (exact; pays on multi-room scans)
        proxy_k = conf.get_int("train.bake_proxy_k", default=0)
        texel_batch = conf.get_int("train.texel_batch", default=4096)
        # batches folded into ONE lax.map dispatch (numerically identical;
        # amortizes the tunneled relay's per-dispatch tail, which degrades
        # to tens of seconds when the pool is loaded — PERF.md round 5)
        kd = conf.get_int("train.bake_batches_per_dispatch", default=0)
        wedges = conf.get_int("train.bake_wedges", default=4)
        fan = None
        clusters = None
        if use_fan:
            from texir_code_tpu.ops.pallas_culled import ClusterScene

            fb = build_bvh(self.mesh.vertices, self.mesh.faces)
            fan = FanScene.from_flat(fb, triangle_uvs=self.mesh.triangle_uvs())
            # culled wedge kernel (sub-linear in scene size); the fan scene
            # stays as the CPU/interpret fallback path
            clusters = ClusterScene.from_fan(fan, lb=lb, dense=True)
        # multi-device: shard the texel axis across local chips by default
        # (VERDICT r2 missing #1 — --num_processes used to duplicate the
        # bake; the sharded baker also owns the per-process batch split +
        # allgather merge, parallel/bake.py).  train.spmd = false disables.
        import jax

        spmd = conf.get("train.spmd", "auto")
        multi = (
            spmd is True
            or (spmd == "auto"
                and (len(jax.local_devices()) > 1 or jax.process_count() > 1))
        )
        baker_kw = dict(
            spp=int(spp), texel_batch=texel_batch,
            cluster_scene=clusters, wedges=wedges,
        )
        if multi:
            from texir_code_tpu.parallel.bake import ShardedIrradianceBaker
            from texir_code_tpu.parallel.mesh import make_device_mesh

            self.baker = ShardedIrradianceBaker(
                self.tbl, mesh=make_device_mesh(), **baker_kw
            )
            self.baker.fan_scene = fan
            self.baker.max_leaves = fan.num_leaves if fan is not None else 768
        else:
            self.baker = IrradianceTextureBaker(
                self.tbl, fan_scene=fan,
                max_leaves=fan.num_leaves if fan is not None else 768,
                **baker_kw,
            )
        if kd > 0:
            self.baker.batches_per_dispatch = kd
        self.baker.fan_block = fan_block
        self.baker.exit_rows = exit_rows
        self.baker.two_pass_cut = two_pass_cut
        self.baker.two_pass_cap = two_pass_cap
        self.baker.two_pass_cut2 = two_pass_cut2
        self.baker.two_pass_cap2 = two_pass_cap2
        if proxy_k and fan is not None:
            from texir_code_tpu.ops.pallas_culled import ClusterScene

            self.baker.proxy_scene = ClusterScene.proxy_from_fan(
                fan, k=proxy_k
            )
        # proven rectangular occluders (geometry/occluders.py): exact
        # host-precomputed PVS — the behind-wall candidate fix for
        # multi-room scans (PERF.md round 4); conf train.bake_occluders
        if conf.get("train.bake_occluders", True) and clusters is not None:
            from texir_code_tpu.geometry.occluders import extract_occluders

            self.baker.occluders = extract_occluders(self.mesh)
        self.texture_res = texture_res
        self._geom = bake_geometry_textures(self.mesh, texture_res)

    def run(self) -> np.ndarray:
        from texir_code_tpu.ops.postprocess import atrous_denoise, pad_texture
        import jax.numpy as jnp

        t0 = time.time()
        tex = self.baker.bake(self._geom, self.key, progress=True)
        texels = int(self._geom.valid.sum())
        rays = texels * self.baker.spp
        dt = time.time() - t0
        if rays >= 10**6:
            print(
                f"IrT bake: {rays/1e6:.1f} Mrays in {dt:.1f}s "
                f"({rays/dt/1e6:.2f} Mrays/s)"
            )
        else:
            # tiny bakes (dryrun/tests) would round to "0.0 Mrays"
            print(
                f"IrT bake: {texels} texels x {self.baker.spp} spp "
                f"({rays} rays) in {dt:.1f}s"
            )
        # raw bake next to the mesh, as the reference writes it (:78-82)
        raw_path = self.path_mesh.replace("out1.obj", "0_irr_texture.hdr")
        hdrio.write_hdr(raw_path, tex, flip=True)

        padded = pad_texture(tex, self._geom.valid)
        if self.denoise:
            padded = np.asarray(atrous_denoise(jnp.asarray(padded)))
        out_path = self.path_mesh.replace("out1.obj", "irt.hdr")
        hdrio.write_hdr(out_path, padded, flip=True)
        print(f"IrT written: {raw_path} and {out_path}")
        return padded
