"""MaterialModel — the TexIR SVBRDF texture optimizer (the flagship model).

TPU-native rebuild of reference models/mat_nvdiffrast.py:35-320.  One jitted
function per stage computes, entirely on device:

    G-buffer (ray-cast cube faces)                 [was dr.rasterize+interp]
    mip-sampled albedo / roughness / IrT fetches   [was dr.texture ×4]
    diffuse  = IrT · albedo / π
    specular = GGX importance MC against the TBL   [was query_irf CPU round
               (16 rays/px by default)              trip + BRDF math]

Stage schedule (reference forward, models/mat_nvdiffrast.py:141-190):
    -1: VHL pass — emitter restricted to light-source texels, albedo=0,
        roughness=0.01 → virtual-highlight image used to build masks.
     0: Lambertian-only albedo init: rgb = irr·albedo/π.
     1: roughness-only: albedo detached, *non-mipmapped* roughness drives
        shading, highlight-masked loss.
     2: joint: both live, mipmapped.

Only the texture fetches and the BRDF chain are differentiable; G-buffers
and light directions are stop_gradient-ed exactly where the reference
detaches (:149,179,182,239).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.models.tbl import TBL, build_tbl, query_tbl_soa, vhl_texture
from texir_code_tpu.ops import shading
from texir_code_tpu.ops.gbuffer import DeviceMesh, GBuffer, render_gbuffer
from texir_code_tpu.ops.sampling import generate_dir_soa, reflect_soa
from texir_code_tpu.ops.texture import (
    build_mip_pyramid,
    bilinear_sample,
    compute_lod,
    texture_sample,
)


@dataclasses.dataclass
class MaterialParams:
    """Learnable SVBRDF atlases (an optax-compatible pytree)."""

    albedo: jnp.ndarray     # [Ra, Ra, 3], init 0.5 (reference :68)
    roughness: jnp.ndarray  # [Rr, Rr, 1], init 0.1 (reference :69)


jax.tree_util.register_pytree_node(
    MaterialParams,
    lambda p: ((p.albedo, p.roughness), None),
    lambda _, l: MaterialParams(*l),
)


def init_material_params(
    albedo_res: int = 2048, roughness_res: int = 4096
) -> MaterialParams:
    return MaterialParams(
        albedo=jnp.full((albedo_res, albedo_res, 3), 0.5, jnp.float32),
        roughness=jnp.full((roughness_res, roughness_res, 1), 0.1, jnp.float32),
    )


def clamp_material_params(
    params: MaterialParams,
    rough_min: float = 1e-2,
    rough_max: float = 0.8,
) -> MaterialParams:
    """Post-step projection (reference trainer/train_material.py:458,592):
    roughness ∈ [1e-2, 0.8], albedo ≥ 0."""
    return MaterialParams(
        albedo=jnp.maximum(params.albedo, 0.0),
        roughness=jnp.clip(params.roughness, rough_min, rough_max),
    )


class MaterialModel:
    """Differentiable cube-map SVBRDF renderer over a fixed scene.

    Host-side object holding device scene constants; `forward` is pure in
    (params, mvp, cam_position, key) and jitted per stage.
    """

    def __init__(
        self,
        mesh,
        hdr_texture: np.ndarray,
        irt_texture: np.ndarray,
        pano_res: Tuple[int, int] = (256, 512),
        sample_light: Tuple[int, int] = (32, 16),
        sample_type: Tuple[str, str] = ("uniform", "importance"),
        hdr_exposure: float = 0.0,
        max_mip_level: Optional[int] = None,
        leaf_width: int = 4,
    ):
        """Args mirror the reference config knobs:

        pano_res: train.pano_img_res; cube_res = pano_res[1]//4 (reference :45)
        sample_light: (diffuse spp, specular spp) — diffuse unused with IrT
        hdr_exposure: train.hdr_exposure (scales the TBL atlas)
        max_mip_level: defaults to get_mip_level(8192)=13 (reference :65)
        """
        self.cube_res = int(pano_res[1] // 4)
        self.sample_light = tuple(sample_light)
        self.sample_type = tuple(sample_type)
        self.hdr_exposure = float(hdr_exposure)
        self.max_mip_level = (
            max_mip_level if max_mip_level is not None else shading.get_mip_level(8192)
        )

        self.mesh = mesh
        self.device_mesh = DeviceMesh.from_mesh(mesh)
        from texir_code_tpu.geometry.bvh import build_bvh
        from texir_code_tpu.models.tbl import build_tbl_from_flat
        from texir_code_tpu.ops.fan_raycast import FanScene

        flat = build_bvh(mesh.vertices, mesh.faces, leaf_width=leaf_width)
        self.tbl = build_tbl_from_flat(flat, mesh, hdr_texture, hdr_exposure)
        self.tbl_vhl = self.tbl.with_texture(
            vhl_texture(self.tbl.texture, hdr_exposure)
        )
        self.fan_scene = FanScene.from_flat(flat)
        self.irt = jnp.asarray(irt_texture)

        # On TPU, primary visibility and specular rays run on the Pallas
        # leaf-stream kernels (see ops/pallas_fan.py and PERF.md); the XLA
        # skip-link traversal remains the CPU/test path.
        import jax as _jax

        self.use_pallas = _jax.default_backend() != "cpu"

        self._jitted = {}

    # -- public API --------------------------------------------------------

    def forward(
        self,
        params: MaterialParams,
        mvp: jnp.ndarray,
        cam_position: jnp.ndarray,
        stage: int,
        key: jax.Array,
    ) -> Dict[str, jnp.ndarray]:
        """Render one camera's 6 cube faces at `cube_res`.

        Args:
            params: MaterialParams.
            mvp: [6, 4, 4] transposed MVPs.
            cam_position: [3].
            stage: -1 (VHL) / 0 / 1 / 2.
            key: PRNG key for the specular sample shift.
        Returns:
            dict with rgb, albedo, roughness, roughness_womipmap, normal,
            position, empty_mask — shapes [6, res, res, C].
        """
        fn = self._jitted.get(stage)
        if fn is None:
            fn = jax.jit(partial(self._forward, stage=stage))
            self._jitted[stage] = fn
        return fn(params, mvp, cam_position, key)

    # -- implementation ----------------------------------------------------

    def _sample_materials(self, params: MaterialParams, uv_img: jnp.ndarray):
        """The reference's four dr.texture calls (:128-139)."""
        alb_pyr = build_mip_pyramid(params.albedo, self.max_mip_level)
        rgh_pyr = build_mip_pyramid(params.roughness, self.max_mip_level)
        irt_pyr = build_mip_pyramid(self.irt, self.max_mip_level)

        lod_a = compute_lod(uv_img, params.albedo.shape[0], params.albedo.shape[1])
        lod_r = compute_lod(uv_img, params.roughness.shape[0], params.roughness.shape[1])
        lod_i = compute_lod(uv_img, self.irt.shape[0], self.irt.shape[1])

        albedo = texture_sample(alb_pyr, uv_img, lod_a)
        roughness = texture_sample(rgh_pyr, uv_img, lod_r)
        roughness_womip = bilinear_sample(params.roughness, uv_img)
        irr = texture_sample(irt_pyr, uv_img, lod_i)
        return albedo, roughness, roughness_womip, irr

    def _forward(
        self,
        params: MaterialParams,
        mvp: jnp.ndarray,
        cam_position: jnp.ndarray,
        key: jax.Array,
        stage: int,
    ) -> Dict[str, jnp.ndarray]:
        g = render_gbuffer(
            self.device_mesh, self.tbl.bvh, mvp, cam_position, self.cube_res,
            fan_scene=self.fan_scene if self.use_pallas else None,
        )
        # G-buffers are non-differentiable by construction here (ray cast),
        # matching the reference's detach discipline.
        normal = jax.lax.stop_gradient(g.normal)
        position = jax.lax.stop_gradient(g.position)
        uv_img = jax.lax.stop_gradient(g.uv)
        mask = g.mask

        albedo, roughness, roughness_womip, irr = self._sample_materials(
            params, uv_img
        )

        if stage == -1:
            res = self._render(
                normal,
                jnp.zeros_like(albedo),
                jnp.full_like(roughness, 0.01),
                position + 1e-2 * normal,
                cam_position,
                irr,
                key,
                tbl=self.tbl_vhl,
            )
        elif stage == 0:
            res = {
                "rgb": shading.lambertian_diffuse(irr, albedo),
                "albedo": albedo,
                "normal": normal,
                "position": position + 1e-1 * normal,
            }
        elif stage == 1:
            res = self._render(
                normal,
                jax.lax.stop_gradient(albedo),
                roughness_womip,
                position + 1e-2 * normal,
                cam_position,
                irr,
                key,
            )
        elif stage == 2:
            res = self._render(
                normal, albedo, roughness, position + 1e-2 * normal,
                cam_position, irr, key,
            )
        else:
            raise ValueError(f"unknown stage: {stage}")

        res.update(
            {
                "empty_mask": mask,
                "roughness_womipmap": roughness_womip,
                "roughness": roughness,
            }
        )
        return res

    def _render(
        self,
        normal: jnp.ndarray,
        albedo: jnp.ndarray,
        roughness: jnp.ndarray,
        points: jnp.ndarray,
        cam_position: jnp.ndarray,
        irr: jnp.ndarray,
        key: jax.Array,
        tbl: Optional[TBL] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Physically based shading of flattened G-buffers
        (reference models/mat_nvdiffrast.py:201-249)."""
        tbl = tbl if tbl is not None else self.tbl
        face, h, w, _ = normal.shape
        b = face * h * w
        # SoA hot path: component [B] / [B, S] arrays (see ops.raycast for
        # the TPU layout rationale)
        n = tuple(normal[..., k].reshape(b) for k in range(3))
        pts = tuple(points[..., k].reshape(b) for k in range(3))
        rgh = roughness.reshape(b)
        alb = albedo.reshape(b, 3)
        ir = irr.reshape(b, 3)

        view = tuple(cam_position[k] - pts[k] for k in range(3))
        vnorm = jnp.maximum(
            jnp.sqrt(view[0] ** 2 + view[1] ** 2 + view[2] ** 2), 1e-4
        )
        view = tuple(view[k] / vnorm for k in range(3))

        diffuse = shading.lambertian_diffuse(ir, alb)

        s_spec = self.sample_light[1]
        half = generate_dir_soa(
            n, s_spec, key, mode=self.sample_type[1], roughness=rgh
        )
        light_dirs, _ = reflect_soa(view, half)
        spec_origins = tuple(
            jnp.broadcast_to(p[:, None], (b, s_spec)) for p in pts
        )
        # per-pixel-origin specular rays: Pallas stream kernel on TPU,
        # skip-link traversal on CPU
        from texir_code_tpu.models.tbl import query_tbl_auto

        lighting = query_tbl_auto(
            tbl,
            self.fan_scene if self.use_pallas else None,
            spec_origins,
            tuple(jax.lax.stop_gradient(d) for d in light_dirs),
        )
        spec = shading.specular_estimator_soa(
            lighting, half, n, view, light_dirs, rgh
        )
        specular = jnp.stack(spec, axis=-1) / s_spec

        return {
            "rgb": (diffuse + specular).reshape(face, h, w, 3),
            "albedo": alb.reshape(face, h, w, 3),
            "normal": normal,
            "position": jax.lax.stop_gradient(
                points + 2e-2 * normal
            ),
        }
